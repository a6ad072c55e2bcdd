package graft.relational

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.{Q, Tables}

/** Scalar function families (SURVEY §2.8). Each key exercises one family
  * breadth-first over a keyed projection, so a single oracle hash covers
  * many functions.
  *
  * Scale notes: all of these are stateless projections — whole-stage
  * codegen fuses them into the scan, columns are pruned to what each query
  * touches, and there is no shuffle except the final presentation sort
  * (which exists only for the oracle's total-order contract).
  *
  * Dialect discipline (SURVEY §7.4.4): regex patterns stay in the
  * Java∩RE2 common subset (char classes, anchors, no lookaround); DuckDB
  * `regexp_replace` is single-occurrence by default so the oracle passes
  * 'g'; DuckDB `dayofweek` is 0=Sunday where Spark is 1=Sunday (+1 in the
  * oracle); rounding is only applied where the true value is either on the
  * rounding grid or irrational (transcendentals) — never at a decimal
  * boundary where the two engines' decimal-vs-binary rounding could split.
  */
object Scalars {

  /** q_str_funcs — string family over part. */
  def qStrFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        upper(col("p_name")).as("up"),
        lower(col("p_brand")).as("lo"),
        length(col("p_name")).as("len"),
        trim(concat(lit("  "), col("p_name"), lit("  "))).as("trimmed"),
        ltrim(concat(lit("xx"), col("p_name")), "x").as("ltrimmed"),
        rtrim(concat(col("p_name"), lit("yy")), "y").as("rtrimmed"),
        substring(col("p_name"), 1, 5).as("sub5"),
        concat(col("p_name"), lit("-"), col("p_brand")).as("cat"),
        concat_ws(":", col("p_brand"), col("p_type")).as("catws"),
        lpad(col("p_brand"), 12, "*").as("lpadded"),
        rpad(col("p_brand"), 12, "*").as("rpadded"),
        regexp_replace(col("p_name"), lit(" "), lit("_")).as("replaced"),
        reverse(col("p_name")).as("rev"),
        instr(col("p_name"), "a").as("pos_a"),
        element_at(split(col("p_name"), " "), 1).as("first_word"),
        col("p_name").substr(lit(1), lit(3)).as("left3"),
        substring(col("p_name"), -3, 3).as("right3"))
      .orderBy("p_partkey")

  /** q_str_regex — regex family (Java∩RE2-safe patterns). */
  def qStrRegex(s: SparkSession, dir: String): DataFrame =
    Tables.part(s, dir)
      .select(col("p_partkey"),
        regexp_extract(col("p_name"), "^([a-z]+)", 1).as("first_word"),
        regexp_extract(col("p_brand"), "([0-9]+)$", 1).as("brand_num"),
        regexp_replace(col("p_name"), "[aeiou]", "*").as("no_vowels"),
        col("p_name").rlike("r.*g").cast("int").as("matches_rg"))
      .orderBy("p_partkey")

  /** q_date_funcs — date/time family over orders (UTC session). */
  def qDateFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        month(col("o_orderdate")).as("mo"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        quarter(col("o_orderdate")).as("qtr"),
        date_trunc("month", col("o_orderdate")).as("month_start"),
        date_add(col("o_orderdate"), 30).as("plus30"),
        add_months(col("o_orderdate"), 2).as("plus2mo"),
        datediff(col("o_orderdate"), to_date(lit("1995-01-01")))
          .as("days_since_95"),
        last_day(col("o_orderdate")).as("month_end"),
        unix_timestamp(col("o_orderdate")).as("epoch_s"),
        to_date(col("o_orderdate")).as("as_date"))
      .orderBy("o_orderkey")

  /** q_math_funcs — math family over lineitem. Transcendentals rounded at
    * 6dp (irrational true values → no boundary risk); integral powers and
    * mods are exact. Spark floor/ceil return BIGINT while DuckDB's return
    * DECIMAL (→ float in the driver's compare) — the oracle casts them to
    * BIGINT so the value representations match. */
  def qMathFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        floor(col("l_extendedprice")).as("price_floor"),
        ceil(col("l_extendedprice")).as("price_ceil"),
        abs(col("l_quantity") - 25).as("qty_dev"),
        round(sqrt(col("l_quantity")), 6).as("qty_sqrt"),
        round(exp(col("l_discount")), 6).as("disc_exp"),
        round(log(col("l_extendedprice")), 6).as("price_ln"),
        round(log10(col("l_extendedprice")), 6).as("price_log10"),
        pow(col("l_quantity"), 2).cast("long").as("qty_sq"),
        pmod(col("l_linenumber"), lit(3)).as("line_mod3"),
        signum(col("l_quantity") - 25).cast("int").as("qty_sign"),
        greatest(col("l_quantity"), lit(25.0)).as("qty_hi"),
        least(col("l_quantity"), lit(25.0)).as("qty_lo"))
      .orderBy("l_orderkey", "l_linenumber", "l_quantity",
        "price_floor", "disc_exp")

  /** q_cond_funcs — conditional family over orders. */
  def qCondFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.orders(s, dir)
      .select(col("o_orderkey"),
        when(col("o_totalprice") > 300000, "big")
          .when(col("o_totalprice") > 150000, "mid")
          .otherwise("small").as("bucket"),
        coalesce(nullif(col("o_orderstatus"), lit("P")), lit("non-P"))
          .as("status_np"),
        when(col("o_orderpriority").startsWith("1"), 1).otherwise(0)
          .as("is_urgent"),
        nvl(nullif(col("o_orderstatus"), lit("O")), lit("?")).as("nvl_demo"))
      .orderBy("o_orderkey")

  /** q_hash_funcs — md5/sha256 of document text (feeds q_dedup_exact);
    * identical on UTF-8 bytes across engines. */
  def qHashFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        md5(col("text")).as("text_md5"),
        sha2(col("text"), 256).as("text_sha256"))
      .orderBy("doc_id")

  /** q_array_funcs — array family over whitespace-tokenized documents. */
  def qArrayFuncs(s: SparkSession, dir: String): DataFrame = {
    val tokens = split(col("text"), " ")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(tokens).as("n_tokens"),
        array_contains(tokens, "spark").cast("int").as("has_spark"),
        size(array_distinct(tokens)).as("n_distinct"),
        array_join(slice(sort_array(array_distinct(tokens)), 1, 5), "-")
          .as("first5_sorted"),
        element_at(tokens, 1).as("first_tok"),
        element_at(tokens, -1).as("last_tok"))
      .orderBy("doc_id")
  }

  /** q_explode — generator surface: one row per token with corpus counts
    * (explode ≡ DuckDB unnest). */
  def qExplode(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), explode(split(col("text"), " ")).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("cnt"), countDistinct(col("doc_id")).as("df"))
      .orderBy("token")

  /** q_json_funcs — parse events.props JSON two ways (path extraction and
    * schema-projected from_json); both must agree. */
  def qJsonFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .select(col("event_id"),
        get_json_object(col("props"), "$.k").cast("int").as("k_path"),
        from_json(col("props"),
          org.apache.spark.sql.types.StructType.fromDDL("k INT"))
          .getField("k").as("k_struct"))
      .orderBy("event_id")

  /** q_map_funcs — build a per-user event_type→count map, then look it up.
    * Output re-projected to scalars/sorted arrays for a dialect-safe
    * oracle (SURVEY §2.8 map row). */
  def qMapFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.events(s, dir)
      .groupBy("user_id", "event_type").agg(count(lit(1)).as("cnt"))
      .groupBy("user_id")
      .agg(map_from_arrays(collect_list(col("event_type")),
        collect_list(col("cnt"))).as("m"))
      .select(col("user_id"),
        coalesce(element_at(col("m"), "click"), lit(0L)).as("clicks"),
        coalesce(element_at(col("m"), "error"), lit(0L)).as("errors"),
        size(col("m")).as("n_types"),
        array_join(sort_array(map_keys(col("m"))), ",").as("types_csv"))
      .orderBy("user_id")

  /** q_bit_funcs — bitwise scalar family on the integer keys: AND/OR/XOR,
    * shifts, popcount, complement. All codegen'd built-ins; the family
    * backs hash-partitioning and bitmap/bloom-filter idioms at scale.
    * Types follow Spark coercion: BIGINT ops stay BIGINT, INT ops stay
    * INT (oracle casts DuckDB's TINYINT bit_count up to INT). */
  def qBitFuncs(s: SparkSession, dir: String): DataFrame =
    Tables.lineitem(s, dir)
      .select(col("l_orderkey"), col("l_linenumber"),
        col("l_orderkey").bitwiseAND(lit(255L)).as("band"),
        col("l_linenumber").bitwiseOR(lit(8)).as("bor"),
        col("l_orderkey").bitwiseXOR(col("l_linenumber")).as("bxor"),
        shiftleft(col("l_linenumber"), 3).as("shl"),
        shiftright(col("l_orderkey"), 2).as("shr"),
        bit_count(col("l_orderkey")).as("bcnt"),
        bitwise_not(col("l_linenumber")).as("bnot"))
      .orderBy("l_orderkey", "l_linenumber")

  val queries: Map[String, Q] = Map(
    "q_str_funcs" -> (qStrFuncs _),
    "q_str_regex" -> (qStrRegex _),
    "q_date_funcs" -> (qDateFuncs _),
    "q_math_funcs" -> (qMathFuncs _),
    "q_cond_funcs" -> (qCondFuncs _),
    "q_hash_funcs" -> (qHashFuncs _),
    "q_array_funcs" -> (qArrayFuncs _),
    "q_explode" -> (qExplode _),
    "q_json_funcs" -> (qJsonFuncs _),
    "q_map_funcs" -> (qMapFuncs _),
    "q_bit_funcs" -> (qBitFuncs _))

  val oracle: Map[String, String] = Map(
    "q_str_funcs" ->
      """SELECT p_partkey,
        |  upper(p_name) AS up,
        |  lower(p_brand) AS lo,
        |  length(p_name) AS len,
        |  trim('  ' || p_name || '  ') AS trimmed,
        |  ltrim('xx' || p_name, 'x') AS ltrimmed,
        |  rtrim(p_name || 'yy', 'y') AS rtrimmed,
        |  substring(p_name, 1, 5) AS sub5,
        |  p_name || '-' || p_brand AS cat,
        |  concat_ws(':', p_brand, p_type) AS catws,
        |  lpad(p_brand, 12, '*') AS lpadded,
        |  rpad(p_brand, 12, '*') AS rpadded,
        |  replace(p_name, ' ', '_') AS replaced,
        |  reverse(p_name) AS rev,
        |  instr(p_name, 'a') AS pos_a,
        |  string_split(p_name, ' ')[1] AS first_word,
        |  left(p_name, 3) AS left3,
        |  right(p_name, 3) AS right3
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_str_regex" ->
      """SELECT p_partkey,
        |  regexp_extract(p_name, '^([a-z]+)', 1) AS first_word,
        |  regexp_extract(p_brand, '([0-9]+)$', 1) AS brand_num,
        |  regexp_replace(p_name, '[aeiou]', '*', 'g') AS no_vowels,
        |  CAST(regexp_matches(p_name, 'r.*g') AS INT) AS matches_rg
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q_date_funcs" ->
      """SELECT o_orderkey,
        |  year(o_orderdate) AS yr,
        |  month(o_orderdate) AS mo,
        |  dayofmonth(o_orderdate) AS dom,
        |  dayofweek(o_orderdate) + 1 AS dow,
        |  quarter(o_orderdate) AS qtr,
        |  CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
        |  o_orderdate::DATE + 30 AS plus30,
        |  (o_orderdate::DATE + INTERVAL 2 MONTH)::DATE AS plus2mo,
        |  datediff('day', DATE '1995-01-01', o_orderdate::DATE)
        |    AS days_since_95,
        |  last_day(o_orderdate::DATE) AS month_end,
        |  epoch(o_orderdate)::BIGINT AS epoch_s,
        |  o_orderdate::DATE AS as_date
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_math_funcs" ->
      """SELECT l_orderkey, l_linenumber, l_quantity,
        |  CAST(floor(l_extendedprice) AS BIGINT) AS price_floor,
        |  CAST(ceil(l_extendedprice) AS BIGINT) AS price_ceil,
        |  abs(l_quantity - 25) AS qty_dev,
        |  round(sqrt(l_quantity), 6) AS qty_sqrt,
        |  round(exp(l_discount), 6) AS disc_exp,
        |  round(ln(l_extendedprice), 6) AS price_ln,
        |  round(log10(l_extendedprice), 6) AS price_log10,
        |  CAST(pow(l_quantity, 2) AS BIGINT) AS qty_sq,
        |  mod(l_linenumber, 3) AS line_mod3,
        |  CAST(sign(l_quantity - 25) AS INT) AS qty_sign,
        |  greatest(l_quantity, 25.0) AS qty_hi,
        |  least(l_quantity, 25.0) AS qty_lo
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber, l_quantity, price_floor,
        |  disc_exp""".stripMargin,
    "q_cond_funcs" ->
      """SELECT o_orderkey,
        |  CASE WHEN o_totalprice > 300000 THEN 'big'
        |       WHEN o_totalprice > 150000 THEN 'mid'
        |       ELSE 'small' END AS bucket,
        |  COALESCE(NULLIF(o_orderstatus, 'P'), 'non-P') AS status_np,
        |  CASE WHEN o_orderpriority LIKE '1%' THEN 1 ELSE 0 END AS is_urgent,
        |  COALESCE(NULLIF(o_orderstatus, 'O'), '?') AS nvl_demo
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "q_hash_funcs" ->
      """SELECT doc_id, md5(text) AS text_md5, sha256(text) AS text_sha256
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_array_funcs" ->
      """SELECT doc_id,
        |  len(string_split(text, ' ')) AS n_tokens,
        |  CAST(list_contains(string_split(text, ' '), 'spark') AS INT)
        |    AS has_spark,
        |  len(list_distinct(string_split(text, ' '))) AS n_distinct,
        |  array_to_string(
        |    list_sort(list_distinct(string_split(text, ' ')))[1:5], '-')
        |    AS first5_sorted,
        |  string_split(text, ' ')[1] AS first_tok,
        |  string_split(text, ' ')[-1] AS last_tok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "q_explode" ->
      """SELECT token, COUNT(*) AS cnt, COUNT(DISTINCT doc_id) AS df
        |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS token
        |      FROM documents)
        |GROUP BY token
        |ORDER BY token""".stripMargin,
    "q_json_funcs" ->
      """SELECT event_id,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_path,
        |  CAST(json_extract_string(props, '$.k') AS INT) AS k_struct
        |FROM events ORDER BY event_id""".stripMargin,
    "q_map_funcs" ->
      """SELECT user_id,
        |  COUNT(CASE WHEN event_type = 'click' THEN 1 END) AS clicks,
        |  COUNT(CASE WHEN event_type = 'error' THEN 1 END) AS errors,
        |  COUNT(DISTINCT event_type) AS n_types,
        |  array_to_string(list_sort(list(DISTINCT event_type)), ',')
        |    AS types_csv
        |FROM events
        |GROUP BY user_id
        |ORDER BY user_id""".stripMargin,
    "q_bit_funcs" ->
      """SELECT l_orderkey, l_linenumber,
        |  l_orderkey & 255 AS band,
        |  l_linenumber | 8 AS bor,
        |  xor(l_orderkey, l_linenumber) AS bxor,
        |  l_linenumber << 3 AS shl,
        |  l_orderkey >> 2 AS shr,
        |  CAST(bit_count(l_orderkey) AS INT) AS bcnt,
        |  ~l_linenumber AS bnot
        |FROM lineitem
        |ORDER BY l_orderkey, l_linenumber""".stripMargin)
}
