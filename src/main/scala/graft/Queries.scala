package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The declared operator queries (SURVEY §2 inventory) with their DuckDB
  * oracle SQL. Column names are aliased identically on both sides; every
  * query orders deterministically; doubles that aggregate floating-point
  * sums go through DECIMAL so Spark's partial aggregation order cannot
  * change the bits vs DuckDB.
  */
object Queries {
  def table(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  def all: Map[String, (SparkSession, String) => DataFrame] = Map.empty
  def oracles: Map[String, String] = Map.empty
}
