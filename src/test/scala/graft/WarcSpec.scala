package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.functions._

/** Framing contract of [[graft.sources.Warc]] — the kernel off-cluster,
  * the write/read round-trip through real files on it. */
class WarcSpec extends SparkSpec {

  private def rec(uri: String, payload: String): String = {
    val len = payload.getBytes(UTF_8).length
    s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: $len\r\n\r\n" +
      payload + "\r\n\r\n"
  }

  test("kernel: multiple records parse; separators and unknown headers tolerated") {
    val bytes = (rec("u1", "hello world") + "\n\n" +
      "WARC/1.0\r\nX-Custom: 7\r\nWARC-Target-URI: u2\r\nContent-Length: 3\r\n\r\nabc\r\n\r\n")
      .getBytes(UTF_8)
    val got = graft.sources.Warc.parse(bytes).toList
    assert(got == List(("u1", "2026-01-01T00:00:00Z", "hello world"), ("u2", "", "abc")))
  }

  test("kernel: length-driven framing survives header look-alikes inside payloads") {
    val evil = "line1\nWARC/1.0\r\nContent-Length: 999\r\n\r\nline2\n\n\nend"
    val got = graft.sources.Warc.parse(rec("u", evil).getBytes(UTF_8)).toList
    assert(got == List(("u", "2026-01-01T00:00:00Z", evil)))
  }

  test("kernel: multi-byte payloads frame by octets, not characters") {
    val s = "héllo — ünïcode ✓"
    assert(s.getBytes(UTF_8).length > s.length)
    val got = graft.sources.Warc.parse(rec("u", s).getBytes(UTF_8)).toList
    assert(got == List(("u", "2026-01-01T00:00:00Z", s)))
  }

  test("kernel: corrupt framing fails loudly, not silently") {
    intercept[IllegalArgumentException] {
      graft.sources.Warc.parse("not a warc\r\n\r\n".getBytes(UTF_8)).toList
    }
    intercept[IllegalArgumentException] { // Content-Length past EOF
      graft.sources.Warc.parse(
        "WARC/1.0\r\nContent-Length: 9999\r\n\r\nshort".getBytes(UTF_8)).toList
    }
  }

  test("WET conversion records frame identically and read back losslessly") {
    import spark.implicits._
    val docs = Seq((1L, "extracted text"), (2L, "more\n\ntext")).toDF("id", "text")
    val recs = graft.sources.Warc.toWetRecords(
      docs, concat(lit("urn:wet:"), $"id"), lit("2026-03-03T00:00:00Z"), $"text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_wetspec_").toString
    recs.write.mode("overwrite").option("compression", "gzip").text(tmp)
    val back = graft.sources.Warc.read(spark, tmp)
      .select($"uri", $"payload").as[(String, String)].collect().toMap
    assert(back == Map("urn:wet:1" -> "extracted text", "urn:wet:2" -> "more\n\ntext"))
  }

  test("gzipped archives inflate by magic bytes; plain bytes pass through") {
    val plain = rec("u1", "compress me").getBytes(UTF_8)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(plain); gz.close()
    val gzBytes = bos.toByteArray
    assert(gzBytes(0) == 0x1f.toByte && gzBytes(1) == 0x8b.toByte)
    assert(graft.sources.Warc.inflateIfGzip(gzBytes).toSeq == plain.toSeq)
    assert(graft.sources.Warc.inflateIfGzip(plain) eq plain) // no copy when plain
    assert(graft.sources.Warc.parse(
      graft.sources.Warc.inflateIfGzip(gzBytes)).toList ==
      List(("u1", "2026-01-01T00:00:00Z", "compress me")))
  }

  test("inflate ceiling fails loudly, naming the streaming-splitter escape hatch") {
    // ~200 KB of zeros compresses tiny; a 4 KB cap must trip mid-inflate
    val big = new Array[Byte](200 * 1024)
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(big); gz.close()
    val e = intercept[IllegalArgumentException] {
      graft.sources.Warc.inflateIfGzip(bos.toByteArray, maxInflatedBytes = 4096L)
    }
    assert(e.getMessage.contains("maxInflatedBytes"))
    assert(e.getMessage.contains("streaming splitter"))
    // at the default ceiling the same archive inflates fine
    assert(graft.sources.Warc.inflateIfGzip(bos.toByteArray).length == big.length)
  }

  test("readStreaming == read on gzipped and plain archives (O(record) memory path)") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain"),
      (2L, "look-alike\nWARC/1.0\r\nContent-Length: 7\r\n\r\ntrap"),
      (3L, "ünïcode ✓"),
      (4L, "")).toDF("id", "text").repartition(2)
    val recs = graft.sources.Warc.toRecords(
      docs, concat(lit("urn:s:"), $"id"), lit("2026-04-04T00:00:00Z"), $"text")
    val gzDir = java.nio.file.Files.createTempDirectory("graft_wstream_gz_").toString
    val plainDir = java.nio.file.Files.createTempDirectory("graft_wstream_pl_").toString
    recs.write.mode("overwrite").option("compression", "gzip").text(gzDir)
    recs.write.mode("overwrite").text(plainDir)
    for (dir <- Seq(gzDir, plainDir)) {
      val whole = graft.sources.Warc.read(spark, dir)
        .select($"uri", $"wdate", $"payload").collect().map(_.toSeq).toSet
      val streamed = graft.sources.Warc.readStreaming(spark, dir)
        .select($"uri", $"wdate", $"payload").collect().map(_.toSeq).toSet
      assert(streamed == whole, s"dir=$dir")
      assert(streamed.size == 4)
    }
  }

  test("readStreaming's scan reads PATHS only — binaryFile content is pruned") {
    import spark.implicits._
    val docs = Seq((1L, "x")).toDF("id", "text")
    val recs = graft.sources.Warc.toRecords(
      docs, lit("urn:p"), lit("2026-04-04T00:00:00Z"), $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft_wprune_").toString
    recs.write.mode("overwrite").text(dir)
    val plan = graft.sources.Warc.readStreaming(spark, dir)
      .queryExecution.executedPlan.toString
    // the whole point of the streaming path: archive bytes NEVER flow
    // through the scan — the FileScan must project path alone
    val scanLine = plan.linesIterator.find(_.contains("FileScan binaryFile")).getOrElse("")
    assert(scanLine.contains("ReadSchema"), s"no binaryFile scan in:\n$plan")
    assert(!scanLine.contains("content"),
      s"binaryFile scan must prune the content column:\n$scanLine")
  }

  test("readStreaming caps per-record memory, loudly") {
    import spark.implicits._
    val docs = Seq((1L, "x" * 10000)).toDF("id", "text")
    val recs = graft.sources.Warc.toRecords(
      docs, lit("urn:big"), lit("2026-04-04T00:00:00Z"), $"text")
    val dir = java.nio.file.Files.createTempDirectory("graft_wstream_cap_").toString
    recs.write.mode("overwrite").text(dir)
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.Warc.readStreaming(spark, dir, maxRecordBytes = 1024L).collect()
    }
    val msg = e.getMessage + Option(e.getCause).map(_.getMessage).getOrElse("")
    assert(msg.contains("maxRecordBytes"))
  }

  test("round-trip through the text sink and binaryFile scan is lossless") {
    import spark.implicits._
    val docs = Seq(
      (1L, "plain"),
      (2L, "embedded\nnewlines\r\nand\r\n\r\nblanks"),
      (3L, "ünïcode ✓ payload"),
      (4L, "")).toDF("id", "text").repartition(3)
    val recs = graft.sources.Warc.toRecords(
      docs, concat(lit("urn:doc:"), $"id"), lit("2026-02-02T00:00:00Z"), $"text")
    val tmp = java.nio.file.Files.createTempDirectory("graft_warcspec_").toString
    recs.write.mode("overwrite").text(tmp)
    val back = graft.sources.Warc.read(spark, tmp)
      .select($"uri", $"payload").as[(String, String)].collect().toMap
    assert(back == Map("urn:doc:1" -> "plain",
      "urn:doc:2" -> "embedded\nnewlines\r\nand\r\n\r\nblanks",
      "urn:doc:3" -> "ünïcode ✓ payload", "urn:doc:4" -> ""))
  }
}
