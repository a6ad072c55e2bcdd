package graft.streaming

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.sources.TxTable

/** Round 19 (VERDICT r18 item 6): position deletes apply EXECUTOR-side.
  * The batch scan's InputPartitions carry delete-FILE PATHS (footer
  * range-filtered), never driver-materialized ordinals. */
class DvShipSpec extends AnyFunSuite with graft.SparkFixture {

  test("DSv2 batch read ships delete-file paths per partition, " +
      "resolves ordinals executor-side, and results equal the library " +
      "snapshot") {
    import spark.implicits._
    val root = graft.Scratch.dir("txtable", "spec_dvship")
    graft.Scratch.deleteRec(new java.io.File(root))
    TxTable.init(root)
    TxTable.append(spark, root,
      spark.range(0, 1000).select(col("id").as("k"),
        (col("id") % 97).as("v")))
    TxTable.append(spark, root,
      spark.range(1000, 2000).select(col("id").as("k"),
        (col("id") % 97).as("v")))
    // two separate DV commits (un-compacted accumulation)
    TxTable.deleteVector(spark, root, col("k") % 10 === 3)
    TxTable.deleteVector(spark, root, col("k") % 10 === 7)

    // partitions carry dv FILE PATHS, zero driver-resolved ordinals
    val v = TxTable.currentVersion(root)
    val schema = TxTable.inferLogicalSchema(root, v).get
    val scan = new TxTableScanBuilder(schema, root, None,
      skipChange = false, Int.MaxValue, None).build()
    val parts = scan.toBatch.planInputPartitions()
      .map(_.asInstanceOf[TxFilePartition])
    assert(parts.nonEmpty)
    parts.foreach { p =>
      assert(p.deleted.isEmpty,
        "driver materialized delete ordinals into the partition")
      assert(p.dvFiles.nonEmpty,
        "partition carries no delete files despite outstanding DVs")
    }

    // results identical to the library snapshot (which applies DVs via
    // the address anti-join) and to the direct recompute
    val dsv2 = spark.read.format("txtable").load(root)
    val lib = TxTable.snapshot(spark, root)
    assert(dsv2.count() == lib.count())
    assert(dsv2.orderBy("k").collect().map(_.toSeq).toSeq ==
      lib.orderBy("k").collect().map(_.toSeq).toSeq)
    assert(dsv2.filter(col("k") % 10 === 3).count() == 0)
    assert(dsv2.filter(col("k") % 10 === 7).count() == 0)

    // a PRUNED read still applies the right DVs (delete files whose
    // fname range misses a partition's file are skipped, not lost)
    val prunedRead = spark.read.format("txtable").load(root)
      .filter(col("k") >= 1500)
    assert(prunedRead.count() ==
      lib.filter(col("k") >= 1500).count())

    // post-skipping statistics subtract ALL dv rows when every file is
    // planned (footer row counts, no address materialization)
    val stats = scan.asInstanceOf[TxTableScan].estimateStatistics()
    assert(stats.numRows.isPresent &&
      stats.numRows.getAsLong == lib.count(),
      s"reported ${stats.numRows} vs actual ${lib.count()}")
  }
}
