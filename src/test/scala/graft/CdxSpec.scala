package graft

import java.nio.charset.StandardCharsets.UTF_8
import org.apache.spark.sql.functions._

/** CDX index source: line round-trip, SURT keys, and the PRUNING
  * contract — fetch must touch only the selected byte ranges, proven by
  * corrupting every non-selected gzip member in the archive. */
class CdxSpec extends SparkSpec {
  import spark.implicits._

  private def warcRecord(uri: String, payload: String): Array[Byte] = {
    val len = payload.getBytes(UTF_8).length
    (s"WARC/1.0\r\nWARC-Type: response\r\nWARC-Target-URI: $uri\r\n" +
      s"WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Length: $len\r\n\r\n" +
      payload + "\r\n\r\n").getBytes(UTF_8)
  }

  private def gzipMember(bytes: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val gz = new java.util.zip.GZIPOutputStream(bos)
    gz.write(bytes); gz.close()
    bos.toByteArray
  }

  /** Write per-record gzip members; returns (offset, length) per record. */
  private def writeArchive(file: java.io.File, recs: Seq[Array[Byte]],
                           corrupt: Set[Int]): Seq[(Long, Long)] = {
    val out = new java.io.ByteArrayOutputStream()
    val spans = recs.zipWithIndex.map { case (r, i) =>
      val m0 = gzipMember(r)
      // corrupted members keep their exact length so later offsets hold
      val m = if (corrupt(i)) Array.fill[Byte](m0.length)(0x5A) else m0
      val off = out.size.toLong
      out.write(m)
      (off, m.length.toLong)
    }
    java.nio.file.Files.write(file.toPath, out.toByteArray)
    spans
  }

  test("toLines -> parseLines round-trips typed capture rows; headers drop") {
    val caps = Seq(
      ("http://www.Example.COM/Docs/A?q=1", "20260101000000", "text/html", 200,
        "sha1:AAA", 321L, 0L, "crawl-0.warc.gz"),
      ("https://sub.site.org/", "20260102000000", "text/plain", 404,
        "sha1:BBB", 99L, 321L, "crawl-0.warc.gz")
    ).toDF("url", "ts", "mime", "status", "digest", "rec_length", "rec_offset", "filename")
    val lines = graft.sources.Cdx.toLines(caps, $"url", $"ts", $"mime",
      $"status", $"digest", $"rec_length", $"rec_offset", $"filename")
    val withHeader = Seq(" CDX N b a m s k r M S V g").toDF("line")
      .unionByName(lines).unionByName(Seq("").toDF("line"))
    val back = graft.sources.Cdx.parseLines(withHeader, $"line")
      .orderBy($"ts").collect()
    assert(back.length == 2)
    val r0 = back(0)
    assert(r0.getString(0) == "com,example,www)/docs/a") // SURT: lowered, reversed host
    assert(r0.getString(2) == "http://www.Example.COM/Docs/A?q=1") // url verbatim
    assert(r0.getInt(4) == 200 && r0.getLong(8) == 321L && r0.getLong(9) == 0L)
    assert(back(1).getString(0) == "org,site,sub)/")
    assert(back(1).getString(6) == "-" && back(1).getString(7) == "-")
  }

  test("malformed (non-11-field) lines fail loudly, not mis-assign") {
    val bad = Seq("com,x)/ 20260101000000 http://x.com/ text/html 200").toDF("line")
    val e = intercept[Exception] {
      graft.sources.Cdx.parseLines(bad, $"line").collect()
    }
    assert(e.getMessage != null)
  }

  test("fetch reads ONLY selected ranges: corrupted unselected members never touched") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx_").toFile
    dir.deleteOnExit()
    val recs = (0 until 6).map(i => warcRecord(s"http://ex.com/doc/$i", s"payload-$i " * (i + 1)))
    // only even records selected; odd members are garbage on disk
    val spans = writeArchive(new java.io.File(dir, "crawl-0.warc.gz"), recs,
      corrupt = Set(1, 3, 5))
    val selected = Seq(0, 2, 4).map { i =>
      ("crawl-0.warc.gz", spans(i)._1, spans(i)._2)
    }.toDF("filename", "rec_offset", "rec_length")
    val acc = spark.sparkContext.longAccumulator("cdx_bytes_read")
    val got = graft.sources.Cdx.fetch(selected, dir.getAbsolutePath, Some(acc))
      .select($"uri", $"payload").as[(String, String)].collect().toMap
    assert(got == Map(
      "http://ex.com/doc/0" -> ("payload-0 " * 1),
      "http://ex.com/doc/2" -> ("payload-2 " * 3),
      "http://ex.com/doc/4" -> ("payload-4 " * 5)))
    // pruning evidence: exactly the selected bytes, strictly under file size
    val want = Seq(0, 2, 4).map(i => spans(i)._2).sum
    val fileSize = new java.io.File(dir, "crawl-0.warc.gz").length()
    assert(acc.value == want, s"bytes read ${acc.value} != selected $want")
    assert(want < fileSize)
  }

  test("multi-archive work-list: one open per file, offset-ordered reads") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx2_").toFile
    dir.deleteOnExit()
    val byFile = (0 until 2).map { f =>
      val recs = (0 until 4).map(i => warcRecord(s"http://a$f.com/p/$i", s"f$f-r$i"))
      f -> writeArchive(new java.io.File(dir, s"part-$f.warc.gz"), recs, corrupt = Set.empty)
    }.toMap
    // select records 3,1 of file 0 and 0,2 of file 1 — out of order on purpose
    val sel = Seq((0, 3), (1, 0), (0, 1), (1, 2)).map { case (f, i) =>
      (s"part-$f.warc.gz", byFile(f)(i)._1, byFile(f)(i)._2)
    }.toDF("filename", "rec_offset", "rec_length")
    val got = graft.sources.Cdx.fetch(sel, dir.getAbsolutePath)
      .select($"uri", $"payload").as[(String, String)].collect().toMap
    assert(got == Map(
      "http://a0.com/p/3" -> "f0-r3", "http://a0.com/p/1" -> "f0-r1",
      "http://a1.com/p/0" -> "f1-r0", "http://a1.com/p/2" -> "f1-r2"))
  }

  test("writeIndexedArchives: manifest spans are exact; fetch + readStreaming agree") {
    import org.apache.spark.sql.functions._
    val dir = java.nio.file.Files.createTempDirectory("graft_cdxw_").toFile
    dir.deleteOnExit()
    val docs = Seq(
      (1L, "alpha text"), (2L, "beta\nmultiline ✓"), (3L, ""), (4L, "delta " * 50))
      .toDF("id", "text").repartition(2)
    val caps = graft.sources.Cdx.writeIndexedArchives(docs,
      concat(lit("urn:w:"), $"id"), lit("20260101000000"), $"text",
      dir.getAbsolutePath).localCheckpoint(true)
    assert(caps.count() == 4)
    // the manifest's digest is md5 of the payload bytes
    val d = caps.filter($"url" === "urn:w:1").select($"digest").head.getString(0)
    assert(d == java.security.MessageDigest.getInstance("MD5")
      .digest("alpha text".getBytes("UTF-8")).map("%02x".format(_)).mkString)
    // fetch through the manifest returns every payload byte-exactly
    val fetched = graft.sources.Cdx.fetch(caps, dir.getAbsolutePath)
      .select($"uri", $"payload").as[(String, String)].collect().toMap
    assert(fetched == Map("urn:w:1" -> "alpha text",
      "urn:w:2" -> "beta\nmultiline ✓", "urn:w:3" -> "", "urn:w:4" -> ("delta " * 50)))
    // and the archives are ALSO valid whole .warc.gz files: the
    // streaming reader sees the identical record set
    val streamed = graft.sources.Warc.readStreaming(spark, dir.getAbsolutePath)
      .select($"uri", $"payload").as[(String, String)].collect().toMap
    assert(streamed == fetched)
    // spans tile the files exactly: per file, max(off+len) == file size
    caps.groupBy($"filename")
      .agg(max($"rec_offset" + $"rec_length").as("end")).collect().foreach { r =>
        assert(new java.io.File(dir, r.getString(0)).length() == r.getLong(1))
      }
  }

  test("fuzz: adversarial payloads round-trip write -> manifest -> fetch -> stream") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(1207)
    val pool = Vector("plain", "WARC/1.0", "Content-Length: 5", "\r\n", "\n\n",
      "ünïcode ✓", "😀emoji", "", " ", "tail\r\n\r\nWARC/1.0\r\n")
    for (round <- 1 to 6) {
      val docs = (0 until (5 + rnd.nextInt(20))).map { i =>
        (i.toLong, Seq.fill(rnd.nextInt(8))(pool(rnd.nextInt(pool.size))).mkString("|"))
      }
      val dir = java.nio.file.Files.createTempDirectory(s"graft_cdxfz_$round").toFile
      dir.deleteOnExit()
      val df = docs.toDF("id", "text").repartition(1 + rnd.nextInt(3))
      val caps = graft.sources.Cdx.writeIndexedArchives(df,
        concat(lit("urn:f:"), $"id"), lit("20260101000000"), $"text",
        dir.getAbsolutePath).localCheckpoint(true)
      val want = docs.map { case (i, t) => s"urn:f:$i" -> t }.toMap
      val fetched = graft.sources.Cdx.fetch(caps, dir.getAbsolutePath)
        .select($"uri", $"payload").as[(String, String)].collect().toMap
      assert(fetched == want, s"fetch round $round")
      val streamed = graft.sources.Warc.readStreaming(spark, dir.getAbsolutePath)
        .select($"uri", $"payload").as[(String, String)].collect().toMap
      assert(streamed == want, s"stream round $round")
    }
  }

  test("fetch refuses an implausible record length, loudly") {
    val dir = java.nio.file.Files.createTempDirectory("graft_cdx3_").toFile
    dir.deleteOnExit()
    writeArchive(new java.io.File(dir, "a.warc.gz"),
      Seq(warcRecord("u", "x")), corrupt = Set.empty)
    val sel = Seq(("a.warc.gz", 0L, 1L << 40)).toDF("filename", "rec_offset", "rec_length")
    val e = intercept[org.apache.spark.SparkException] {
      graft.sources.Cdx.fetch(sel, dir.getAbsolutePath).collect()
    }
    assert(e.getMessage.contains("maxRecordBytes") ||
      Option(e.getCause).exists(_.getMessage.contains("maxRecordBytes")))
  }
}
