package graft

import java.nio.file.Files

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** One SparkSession for the whole forked test JVM (suites run
  * sequentially and `getOrCreate` would silently reuse the first
  * session anyway — sharing it deliberately keeps warehouse/config
  * deterministic). */
object TestSession {
  lazy val warehouse: String =
    Files.createTempDirectory("graft_test_wh").toString

  lazy val spark: SparkSession = SparkSession.builder()
      .withExtensions(new graft.functions.expr.GraftExtensions)
    .master("local[4]")
    .appName("graft-tests")
    .config("spark.sql.shuffle.partitions", 4)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    .config("spark.sql.warehouse.dir", warehouse)
    .config("spark.ui.enabled", "false")
    .getOrCreate()
}

/** Shared fixture: local session, tmp warehouse, test-data locations. */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = TestSession.spark

  /** Smallest star-schema test data (driver-generated). */
  val sfDir = "/root/testdata/sf0.001"
  /** The reference repo's own sample files (read-only). */
  val refDataDir = "/root/reference/amazon-sales-data"
}
