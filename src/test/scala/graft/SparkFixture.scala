package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.BeforeAndAfterAll
import org.scalatest.Suite

/** Shared local SparkSession for suites: local[4], UTC, 4 shuffle
  * partitions — pinned to match Verify's configuration so seeded
  * randomSplit/ML results are identical between tests and the driver's
  * correctness run (SURVEY §7.4.5). */
trait SparkFixture extends BeforeAndAfterAll { self: Suite =>

  val sf0001 = "/root/testdata/sf0.001"
  val sf001 = "/root/testdata/sf0.01"

  lazy val spark: SparkSession = SparkFixture.session

  override def afterAll(): Unit = super.afterAll()
}

object SparkFixture {
  /** One session per JVM (sbt forks one test JVM; suites share it). */
  lazy val session: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}
