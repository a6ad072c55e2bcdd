package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the harness parquet tables (TESTDATA.md / FIXTURES.md).
  *
  * All tables live as single parquet files under an sf-dir
  * (`/root/testdata/sf{0.001,0.01,0.1}`). Schemas are carried by parquet;
  * we read schema-on-storage (SURVEY §1.3). At 100 TB these would be
  * partitioned directories — `spark.read.parquet` handles both shapes, so
  * every operator written against these loaders scales unchanged.
  */
object Tables {
  /** All harness table names. */
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def region(s: SparkSession, d: String): DataFrame = table(s, d, "region")
  def nation(s: SparkSession, d: String): DataFrame = table(s, d, "nation")
  def customer(s: SparkSession, d: String): DataFrame = table(s, d, "customer")
  def supplier(s: SparkSession, d: String): DataFrame = table(s, d, "supplier")
  def part(s: SparkSession, d: String): DataFrame = table(s, d, "part")
  def orders(s: SparkSession, d: String): DataFrame = table(s, d, "orders")
  def lineitem(s: SparkSession, d: String): DataFrame = table(s, d, "lineitem")
  /** events.ts has drifted across fixture generations: older fixtures
    * store parquet TIMESTAMP(NANOS) (which Spark 4.x rejects unless read
    * as a long via the legacy conf), newer ones plain timestamp[us]
    * (loaded as TIMESTAMP_NTZ). Dispatch on the loaded dtype so both
    * shapes work: ns→µs integer truncation on the nanos path matches
    * DuckDB's floor; the µs path only normalizes NTZ→LTZ, which with the
    * UTC session timezone preserves every instant and keeps the
    * downstream column type identical across fixture generations.
    *
    * Scale note: the NTZ→LTZ cast sits above the scan, so a LITERAL ts
    * range predicate would not reach the parquet reader as a pushed
    * filter (no current key filters ts by literal — the as-of/interval/
    * stream joins compare ts across rows, which never pushes). A 100 TB
    * deployment that slices events by time should instead disable NTZ
    * inference session-wide (spark.sql.parquet.inferTimestampNTZ.enabled
    * = false, making the scan itself produce LTZ) and partition the
    * table by date, so time slicing is partition pruning rather than a
    * row filter — DEMONSTRATED end-to-end by q_scan_timeslice
    * (relational/ScaleOps.scala, round 14): date-partitioned events
    * layout, the 5-of-30-day slice lands in the scan's PartitionFilters
    * and the numPartitions metric proves only the sliced directories are
    * read (PlanSpec pin). This closes the carried debt: the flat-table
    * non-pushdown is permanent-by-construction on the NTZ fixture shape,
    * and the partitioned layout is the at-scale answer, in-repo. */
  def events(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.functions.{col, expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    val df =
      try table(s, d, "events")
      catch {
        // ONLY the illegal-nanos-type analysis error triggers the legacy
        // retry — any other AnalysisException (missing path, corrupt
        // footer) must surface as-is, without mutating session conf.
        // Dispatch on the error CLASS (getCondition), the stable API;
        // the rendered-message substring is only a fallback for the
        // hypothetical case of an unclassified rethrow (ADVICE r12).
        case e: org.apache.spark.sql.AnalysisException
            if e.getCondition == "PARQUET_TYPE_ILLEGAL" ||
              (e.getCondition == null && e.getMessage != null &&
                e.getMessage.contains("PARQUET_TYPE_ILLEGAL")) =>
          // scope the legacy flag to THIS read: restore the previous
          // value after the DataFrame's schema is resolved, so one nanos
          // fixture doesn't permanently change how the shared session
          // treats TIMESTAMP(NANOS) in every later parquet read — that
          // would hide exactly the drift the schema probe exists to
          // catch (ADVICE r12)
          val key = "spark.sql.legacy.parquet.nanosAsLong"
          val prev = s.conf.getOption(key)
          s.conf.set(key, "true")
          try table(s, d, "events")
          finally prev match {
            case Some(v) => s.conf.set(key, v)
            case None => s.conf.unset(key)
          }
      }
    df.schema("ts").dataType match {
      case LongType =>
        df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        df.withColumn("ts", col("ts").cast(TimestampType))
      case _ => df
    }
  }
  def documents(s: SparkSession, d: String): DataFrame = table(s, d, "documents")
  def embeddings(s: SparkSession, d: String): DataFrame =
    table(s, d, "embeddings")

  /** Loader for a harness table by name (events gets the adaptive ts
    * normalization; everything else is a plain parquet read). */
  def loader(name: String): (SparkSession, String) => DataFrame =
    if (name == "events") events else (s, d) => table(s, d, name)

  /** Post-LOADER schema contract per table: column → allowed Spark
    * `DataType.simpleString`s, in expected column order. This is what the
    * operators downstream assume — the round-11 events drift (fixture
    * regenerated TIMESTAMP(NANOS) → timestamp[us] under a loader
    * hard-wired to nanos) took out 26 keys with one analysis error each;
    * this probe exists so the NEXT drift surfaces as one readable message
    * naming the column instead. Columns whose loaders provably adapt to
    * multiple physical encodings list every adapted outcome (orders/
    * lineitem timestamps pass through as either LTZ or NTZ and every
    * consumer is oracle-green under both; events.ts must come out LTZ
    * because the adaptive loader normalizes it). */
  val expectedSchemas: Seq[(String, Seq[(String, Set[String])])] = Seq(
    "region" -> Seq(
      "r_regionkey" -> Set("int"), "r_name" -> Set("string")),
    "nation" -> Seq(
      "n_nationkey" -> Set("int"), "n_name" -> Set("string"),
      "n_regionkey" -> Set("int")),
    "customer" -> Seq(
      "c_custkey" -> Set("bigint"), "c_name" -> Set("string"),
      "c_nationkey" -> Set("int"), "c_acctbal" -> Set("double"),
      "c_mktsegment" -> Set("string")),
    "supplier" -> Seq(
      "s_suppkey" -> Set("bigint"), "s_name" -> Set("string"),
      "s_nationkey" -> Set("int"), "s_acctbal" -> Set("double")),
    "part" -> Seq(
      "p_partkey" -> Set("bigint"), "p_name" -> Set("string"),
      "p_brand" -> Set("string"), "p_type" -> Set("string"),
      "p_size" -> Set("int"), "p_retailprice" -> Set("double")),
    "orders" -> Seq(
      "o_orderkey" -> Set("bigint"), "o_custkey" -> Set("bigint"),
      "o_orderstatus" -> Set("string"), "o_totalprice" -> Set("double"),
      "o_orderdate" -> Set("timestamp", "timestamp_ntz"),
      "o_orderpriority" -> Set("string")),
    "lineitem" -> Seq(
      "l_orderkey" -> Set("bigint"), "l_partkey" -> Set("bigint"),
      "l_suppkey" -> Set("bigint"), "l_linenumber" -> Set("int"),
      "l_quantity" -> Set("double"), "l_extendedprice" -> Set("double"),
      "l_discount" -> Set("double"), "l_tax" -> Set("double"),
      "l_returnflag" -> Set("string"), "l_linestatus" -> Set("string"),
      "l_shipdate" -> Set("timestamp", "timestamp_ntz")),
    "events" -> Seq(
      "event_id" -> Set("bigint"), "ts" -> Set("timestamp"),
      "user_id" -> Set("bigint"), "event_type" -> Set("string"),
      "value" -> Set("double"), "props" -> Set("string")),
    "documents" -> Seq(
      "doc_id" -> Set("bigint"), "text" -> Set("string"),
      "lang" -> Set("string"), "source" -> Set("string"),
      "n_chars" -> Set("bigint")),
    "embeddings" -> Seq(
      "vec_id" -> Set("bigint"), "embedding" -> Set("array<float>"),
      "label" -> Set("int")))

  /** Fixture-drift probe: load every harness table through its real
    * loader and diff the resulting schema against [[expectedSchemas]].
    * Returns one human-readable message per drifted / missing /
    * unexpected column (empty = no drift). Cheap — schema-only, no data
    * is read. Verify prints these at startup; TablesSpec asserts none. */
  def schemaDrift(s: SparkSession, d: String): Seq[String] =
    expectedSchemas.flatMap { case (name, expected) =>
      scala.util.Try(loader(name)(s, d).schema) match {
        case scala.util.Failure(e) =>
          val msg = Option(e.getMessage)
            .flatMap(_.linesIterator.find(_.nonEmpty))
            .getOrElse(e.getClass.getSimpleName)
          Seq(s"$name: loader failed: $msg")
        case scala.util.Success(actual) =>
          val actualByName = actual.fields.map(f =>
            f.name -> f.dataType.simpleString).toMap
          val expectedNames = expected.map(_._1).toSet
          val colDrift = expected.flatMap { case (colName, allowed) =>
            actualByName.get(colName) match {
              case None =>
                Some(s"$name.$colName: MISSING (expected " +
                  s"${allowed.mkString("|")})")
              case Some(t) if !allowed(t) =>
                Some(s"$name.$colName: expected ${allowed.mkString("|")}, " +
                  s"found $t — fixture drifted; adapt the loader in " +
                  "Tables.scala")
              case _ => None
            }
          } ++ actual.fields.collect {
            case f if !expectedNames(f.name) =>
              s"$name.${f.name}: unexpected new column " +
                s"(${f.dataType.simpleString})"
          }
          // column ORDER is part of the contract too: positional
          // accessors (Row.getX(i)) and column-ordered output hashes
          // break on an order-only drift that name/type checks miss
          val actualKnown = actual.fields.map(_.name).filter(expectedNames)
          val expectedOrder = expected.map(_._1).filter(actualByName.contains)
          val orderDrift =
            if (actualKnown.toSeq != expectedOrder)
              Seq(s"$name: column order drifted — expected " +
                s"${expectedOrder.mkString(",")}, found " +
                s"${actualKnown.mkString(",")}")
            else Seq.empty
          colDrift ++ orderDrift
      }
    }
}
