package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.core.{AffineTransform, Bounds}
import graft.ops.Mosaic
import graft.scan.TileScan
import graft.stac.{Prepare, PrepareOptions, Stac, StacAsset, StacItem}

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query: the reference's main entry path end-to-end
    * (SURVEY §3.1) — normalize+sort STAC items, plan the grid
    * (prepare), lazily scan tiles, first-valid mosaic over time, and
    * summarize per composite chunk. Metadata is synthesized in-code (the
    * engine's input is STAC JSON, not the TPC-H tables); pixels come from
    * the deterministic [[graft.scan.FakeReader]]. Driver smoke-checks
    * rows > 0.
    */
  def entry(spark: SparkSession): DataFrame = {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    val items = (0 until 10).map { i =>
      val off = (i % 3) * 1280.0 // staggered scene footprints
      StacItem(
        id = s"scene-$i",
        datetime = Some(f"2024-06-${i + 1}%02dT10:00:00Z"),
        epsg = Some(32633),
        assets = Seq("red", "green", "nir").map { band =>
          band -> StacAsset(
            href = s"fake://$band/$i",
            mimetype = Some("image/tiff; application=geotiff"),
            bbox = Some(Bounds(399960 + off, 4990200 - off, 399960 + off + 2560, 4990200 - off + 2560)),
            shape = Some((256, 256)),
            transform = Some(AffineTransform.northUp(399960 + off, 4990200 - off + 2560, 10.0, 10.0)))
        }.toMap)
    }
    val plan = Prepare(items, PrepareOptions(assets = Some(Seq("red", "green", "nir"))))
    val tiles = TileScan.scan(spark, plan.assetTable, plan.spec, chunk = 256)
    val composite = Mosaic(tiles, chunk = 256)
    composite.toDF()
      .select($"band", $"yChunk", $"xChunk",
        aggregate($"pixels", lit(0L), (acc, x) => acc + when(isnan(x), 0L).otherwise(1L))
          .as("valid_px"))
      .orderBy($"band", $"yChunk", $"xChunk")
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracles
}
