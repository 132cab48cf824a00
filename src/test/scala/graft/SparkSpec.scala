package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for specs — one per suite (guide: lazy val). */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .appName("graft-test")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.sources.v2.bucketing.enabled", "true")
      // accept subset-key co-location (storage-partitioned joins whose join
      // keys are a superset of the V2 partition keys - TileAlgebra.binaryAligned)
      .config("spark.sql.requireAllClusterKeysForCoPartition", "false")
    .getOrCreate()
}
