package graft.sources

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC (Web ARChive, ISO 28500) ingest — the container format crawl
  * corpora actually arrive in (Common Crawl ships WARC/WET). Two halves:
  *
  *  - [[toRecords]] renders rows as WARC/1.0 response records whose
  *    `Content-Length` counts UTF-8 OCTETS (the spec's framing), so a
  *    record stream round-trips through any byte-preserving sink — the
  *    plain `df.write.text` path works because the sink's per-row `\n`
  *    lands BETWEEN records, where the parser skips blank lines.
  *  - [[read]] scans files with Spark's `binaryFile` source and runs one
  *    imperative framing pass per file (the media-decoder discipline:
  *    `flatMap` with O(record) state, no regex over the whole blob).
  *    Framing is Content-Length-driven, so payloads may contain
  *    ANYTHING — blank lines, `WARC/1.0` look-alikes, header-shaped
  *    text — without confusing record boundaries.
  *
  * Scale shape: one task per WARC file (binaryFile's unit), parse is a
  * single forward pass, nothing driver-side. Real crawl archives are
  * written as many ~1 GB files, which is exactly the right task
  * granularity; gzip members (WARC's usual at-rest form) would bolt on
  * at the byte layer without changing the framing pass.
  */
object Warc {

  /** Render (url, date, text) rows as full WARC/1.0 response records —
    * one single-column ("record") row each, ready for a text sink. */
  def toRecords(df: DataFrame, urlCol: Column, dateCol: Column,
                textCol: Column): DataFrame =
    df.select(concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: response\r\n"),
      lit("WARC-Target-URI: "), urlCol, lit("\r\n"),
      lit("WARC-Date: "), dateCol, lit("\r\n"),
      lit("Content-Length: "), octet_length(textCol).cast("string"), lit("\r\n"),
      lit("\r\n"),
      textCol, lit("\r\n\r\n")).as("record"))

  /** Render rows as WET-style `conversion` records (the extracted-text
    * sibling archive most Common Crawl consumers actually read —
    * identical framing, `WARC-Type: conversion`, text payloads). The
    * [[read]] pass ingests WET and WARC alike: framing never depends on
    * the record type. */
  def toWetRecords(df: DataFrame, urlCol: Column, dateCol: Column,
                   textCol: Column): DataFrame =
    df.select(concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: conversion\r\n"),
      lit("WARC-Target-URI: "), urlCol, lit("\r\n"),
      lit("WARC-Date: "), dateCol, lit("\r\n"),
      lit("Content-Type: text/plain\r\n"),
      lit("Content-Length: "), octet_length(textCol).cast("string"), lit("\r\n"),
      lit("\r\n"),
      textCol, lit("\r\n\r\n")).as("record"))

  /** Parse every WARC file under `path` into (uri, wdate, payload).
    * Gzipped archives (the `.warc.gz` form Common Crawl ships —
    * detected by magic bytes, multi-member streams included) inflate
    * per-file before the framing pass, CAPPED at `maxInflatedBytes`
    * per archive (executor-heap ceiling — see [[inflateIfGzip]]). */
  def read(spark: SparkSession, path: String,
           maxInflatedBytes: Long = DefaultMaxInflatedBytes): DataFrame = {
    import spark.implicits._
    val cap = maxInflatedBytes
    spark.read.format("binaryFile").load(path)
      .select(col("content")).as[Array[Byte]]
      .flatMap(b => parse(inflateIfGzip(b, cap)))
      .toDF("uri", "wdate", "payload")
  }

  /** Per-archive inflated-size ceiling: 1 GiB — the shipped archive
    * granularity (Common Crawl writes ~1 GB members), kept under the
    * JVM's 2 GiB byte-array hard limit so the failure mode is this
    * guard's message, never a cryptic NegativeArraySizeException. */
  val DefaultMaxInflatedBytes: Long = 1L << 30

  /** Inflate when the gzip magic (1f 8b) leads; pass through otherwise.
    * The inflated size is bounded by `maxInflatedBytes`: gzip's ~5:1
    * text ratio turns a 1 GB at-rest archive into ~5 GB on one
    * executor's heap with no warning from the codec — inputs past the
    * cap fail LOUDLY here, naming the fix (smaller archive members, or
    * a streaming per-member splitter that frames records without ever
    * materializing the whole archive — the design SCALE.md documents
    * for the >1 GB regime) instead of OOM-killing the executor. */
  def inflateIfGzip(bytes: Array[Byte],
                    maxInflatedBytes: Long = DefaultMaxInflatedBytes): Array[Byte] = {
    if (bytes.length < 2 || bytes(0) != 0x1f.toByte || bytes(1) != 0x8b.toByte)
      return bytes
    val in = new java.util.zip.GZIPInputStream(
      new java.io.ByteArrayInputStream(bytes))
    val out = new java.io.ByteArrayOutputStream(
      math.min(bytes.length.toLong * 4, maxInflatedBytes).toInt max 64)
    val buf = new Array[Byte](64 * 1024)
    var total = 0L
    var r = in.read(buf)
    while (r >= 0) {
      total += r
      require(total <= maxInflatedBytes,
        s"Warc.read: archive inflates past maxInflatedBytes=$maxInflatedBytes " +
        s"(compressed size ${bytes.length}) — one task holds the whole " +
        "inflated archive by design (the per-file framing pass). Ship " +
        "smaller archive members (Common Crawl's ~1 GB convention), raise " +
        "maxInflatedBytes if the heap allows, or split gzip members with a " +
        "streaming splitter so records frame without materializing the " +
        "archive.")
      out.write(buf, 0, r); r = in.read(buf)
    }
    in.close()
    out.toByteArray
  }

  /** The STREAMING form of [[read]] — the escape hatch [[inflateIfGzip]]'s
    * guard names: O(record) memory at ANY archive size. Instead of
    * materializing whole files ([[read]]'s `binaryFile` content path),
    * only file PATHS flow through Spark; each task opens its archive via
    * the Hadoop FileSystem API (local/HDFS/s3a), stacks a streaming
    * gzip decoder when the magic leads (multi-member streams — the
    * `.warc.gz` convention — decode transparently), and frames records
    * incrementally with [[parseStream]]: at no point does more than one
    * record (capped at `maxRecordBytes`) sit on the heap. Same output
    * contract as [[read]]; one task per archive, same as [[read]]'s
    * binaryFile unit. */
  def readStreaming(spark: SparkSession, path: String,
                    maxRecordBytes: Long = DefaultMaxInflatedBytes): DataFrame = {
    import spark.implicits._
    val cap = maxRecordBytes
    spark.read.format("binaryFile").load(path)
      .select(col("path")).as[String]
      .repartition(col("path"))
      .mapPartitions { paths =>
        paths.flatMap { p =>
          val hp = new org.apache.hadoop.fs.Path(p)
          val fs = hp.getFileSystem(new org.apache.hadoop.conf.Configuration())
          val raw = new java.io.BufferedInputStream(fs.open(hp), 1 << 16)
          raw.mark(2)
          val h0 = raw.read(); val h1 = raw.read()
          raw.reset()
          val in: java.io.InputStream =
            if (h0 == 0x1f && h1 == 0x8b)
              new java.util.zip.GZIPInputStream(raw, 1 << 16)
            else raw
          parseStream(in, cap) // exhausting the iterator closes the stream
        }
      }
      .toDF("uri", "wdate", "payload")
  }

  /** Incremental framing over an InputStream: header lines read
    * byte-at-a-time (buffered upstream), payloads via bounded readNBytes
    * — memory is O(one record), never O(archive). The stream closes when
    * the iterator exhausts. */
  def parseStream(in: java.io.InputStream,
                  maxRecordBytes: Long): Iterator[(String, String, String)] = {
    new Iterator[(String, String, String)] {
      private var nextRec: (String, String, String) = _
      private var closed = false
      // next text line (\r stripped); null at EOF before any byte
      private def line(): String = {
        val sb = new java.lang.StringBuilder(64)
        var b = in.read()
        if (b < 0) return null
        while (b >= 0 && b != '\n') { sb.append(b.toChar); b = in.read() }
        var n = sb.length()
        if (n > 0 && sb.charAt(n - 1) == '\r') n -= 1
        // header lines are ASCII by spec; payloads never route through here
        new String(sb.toString.substring(0, n).getBytes(
          java.nio.charset.StandardCharsets.ISO_8859_1),
          java.nio.charset.StandardCharsets.UTF_8)
      }
      private def advance(): Unit = {
        nextRec = null
        if (closed) return
        var version = line()
        while (version != null && version.isEmpty) version = line() // blank separators
        if (version == null) { in.close(); closed = true; return }
        require(version.startsWith("WARC/"),
          s"WARC framing lost (streaming): got '$version'")
        var uri = ""; var date = ""; var len = -1L
        var h = line()
        while (h != null && h.nonEmpty) {
          val sep = h.indexOf(": ")
          if (sep > 0) {
            val (k, v) = (h.substring(0, sep), h.substring(sep + 2))
            k match {
              case "WARC-Target-URI" => uri = v
              case "WARC-Date"       => date = v
              case "Content-Length"  => len = v.toLong
              case _                 => ()
            }
          }
          h = line()
        }
        require(len >= 0 && len <= maxRecordBytes,
          s"WARC record Content-Length $len outside [0, maxRecordBytes=" +
          s"$maxRecordBytes] — raise the cap for oversized records, or fix " +
          "the archive; the streaming reader never buffers more than one " +
          "record by design.")
        val buf = in.readNBytes(len.toInt)
        require(buf.length == len,
          s"archive truncated mid-payload: wanted $len bytes, got ${buf.length}")
        nextRec = (uri, date, new String(buf, "UTF-8"))
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): (String, String, String) = {
        val r = nextRec; advance(); r
      }
    }
  }

  /** One framing pass over a file's bytes. Exposed for kernel tests. */
  def parse(bytes: Array[Byte]): Iterator[(String, String, String)] = {
    var i = 0
    val n = bytes.length
    // next text line as String; advances past its \n; \r stripped
    def line(): String = {
      var j = i
      while (j < n && bytes(j) != '\n') j += 1
      var end = j
      if (end > i && bytes(end - 1) == '\r') end -= 1
      val s = new String(bytes, i, end - i, "UTF-8")
      i = if (j < n) j + 1 else n
      s
    }
    new Iterator[(String, String, String)] {
      private var nextRec: (String, String, String) = _
      private def advance(): Unit = {
        nextRec = null
        // skip blank separator lines between records
        while (i < n && (bytes(i) == '\r' || bytes(i) == '\n')) i += 1
        if (i >= n) return
        val version = line()
        require(version.startsWith("WARC/"),
          s"WARC framing lost at offset $i: got '$version'")
        var uri = ""; var date = ""; var len = -1L
        var h = line()
        while (h.nonEmpty) {
          val sep = h.indexOf(": ")
          if (sep > 0) {
            val (k, v) = (h.substring(0, sep), h.substring(sep + 2))
            k match {
              case "WARC-Target-URI" => uri = v
              case "WARC-Date"       => date = v
              case "Content-Length"  => len = v.toLong
              case _                 => () // tolerated: unknown headers
            }
          }
          h = line()
        }
        require(len >= 0 && i + len <= n,
          s"bad Content-Length $len at offset $i (file size $n)")
        val payload = new String(bytes, i, len.toInt, "UTF-8")
        i += len.toInt
        nextRec = (uri, date, payload)
      }
      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): (String, String, String) = {
        val r = nextRec; advance(); r
      }
    }
  }
}
