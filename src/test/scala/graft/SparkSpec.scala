package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

object TestSpark {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    // the SQL entry point (graft catalog): same two configs Verify sets
    .config("spark.sql.extensions", "graft.sql.GraftSqlExtensions")
    .config("spark.sql.catalog.graft", "graft.sql.GraftCatalog")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    // INT64 µs timestamps on write: INT96 (the legacy default) carries
    // no usable row-group statistics, so range scans over Spark-written
    // timestamp data could never prune IO
    .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
    .getOrCreate()
  spark // initialize eagerly at first touch

  val sf: String = "/root/testdata/sf0.001"
}

trait SparkSpec extends AnyFunSuite {
  def spark: SparkSession = TestSpark.spark
  def sf: String = TestSpark.sf
}
