package graft.multimodal

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** First-use materialized PNG fixture table for the multimodal queries.
  *
  * The container ships no image files, so m2/m4 manufacture their PNG
  * inputs from document bytes. Through round 6 that encode ran INSIDE the
  * declared queries, which meant the bench medians for "decode" and
  * "resize" were dominated by fixture manufacture — the number could not
  * regress-track the operator it names. This cache moves the encode to a
  * one-time testdata-prep step: the first call for a fixture dir encodes
  * every document once ((doc_id, png_var, png_32) — the variable-width
  * raster m2 decodes and the fixed-32-wide raster m4 resizes) and writes
  * it under target/pngcache; every later call, including every bench
  * sample after the first, is a plain parquet scan. The cache key bakes
  * in the source parquet's (size, mtime) so a regenerated fixture can
  * never serve a stale cache.
  *
  * This is testdata plumbing, not engine surface: production multimodal
  * corpora arrive with real binary columns (SURVEY §2.8), and the
  * operators under test consume exactly that shape from this table.
  *
  * Concurrency: the encode writes to a process-unique temp dir and
  * ATOMIC-RENAMEs it into the signature path, so a second session
  * benching in parallel either sees the completed cache or builds its
  * own and loses the rename race harmlessly (its temp dir is deleted) —
  * never a read-while-overwrite. Superseded signature dirs for the same
  * source prefix are deleted on write, so regenerated fixtures don't
  * accrete stale caches. CWD-relative (`target/pngcache`) by design:
  * it lives and dies with the build dir.
  */
object PngFixtureCache {

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (Files.exists(p)) {
      val walk = Files.walk(p)
      try walk.sorted(java.util.Comparator.reverseOrder())
        .forEach(f => Files.deleteIfExists(f))
      finally walk.close()
    }

  def pngTable(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val src = Paths.get(dir, "documents.parquet")
    val sig = s"${Files.size(src)}-${Files.getLastModifiedTime(src).toMillis}"
    val safe = dir.replaceAll("[^A-Za-z0-9._-]", "_")
    val base = Paths.get("target", "pngcache")
    val out = base.resolve(s"$safe-$sig")
    if (!Files.exists(out.resolve("_SUCCESS"))) {
      val tmp = base.resolve(s".$safe-$sig.tmp-${java.util.UUID.randomUUID()}")
      spark.read.parquet(src.toString)
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
        .as[(Long, Array[Byte])]
        .map { case (id, bytes) =>
          val wv = bytes.length % 64 + 1
          val hv = math.max((bytes.length + wv - 1) / wv, 1)
          (id,
            ImageCodec.encodeGrayPng(wv, hv, bytes),
            ImageCodec.encodeGrayPng(32, math.max((bytes.length + 31) / 32, 1), bytes))
        }
        .toDF("doc_id", "png_var", "png_32")
        .write.mode("overwrite").parquet(tmp.toString)
      // retire superseded (size,mtime) keys for this source, then publish
      val ls = Files.list(base)
      try ls.forEach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(s"$safe-") && n != s"$safe-$sig") deleteRecursively(p)
      } finally ls.close()
      try Files.move(tmp, out, java.nio.file.StandardCopyOption.ATOMIC_MOVE)
      catch {
        case _: java.nio.file.FileAlreadyExistsException |
             _: java.nio.file.DirectoryNotEmptyException =>
          deleteRecursively(tmp) // lost the race — the winner's cache serves
      }
    }
    spark.read.parquet(out.toString)
  }
}
