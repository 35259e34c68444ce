package graft.sources

import java.io.{BufferedInputStream, EOFException, InputStream, PushbackInputStream}
import java.nio.charset.StandardCharsets
import java.util.zip.{GZIPInputStream, GZIPOutputStream}

import org.apache.spark.input.PortableDataStream
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** WARC/WET crawl ingestion — the entry format of a web-scale training
  * corpus (ISO 28500 / the CommonCrawl layout): a file is a sequence of
  * records, each `WARC/x.y` version line + `Name: value` headers +
  * blank line + a `Content-Length`-delimited payload + a blank-line
  * separator; WET files are the same container holding `conversion`
  * records whose payload is extracted plain text.
  *
  * Read side ([[readWarc]]): every record — clean or not — surfaces as
  * a row. Malformed records (bad version line, malformed header,
  * missing/invalid Content-Length, truncated payload, wrong
  * separator, oversized payload) carry a `reason` and whatever headers
  * were salvaged before the failure, then the parser RESYNCS by
  * scanning to the next `\r\nWARC/` boundary — the
  * [[JsonlCorpus]] corrupt-side-channel discipline applied to a
  * binary container: nothing is silently dropped, one bad record
  * never takes down a 1 GB file.
  *
  * Spark shape: WARC is not line-oriented and crawl files arrive
  * gzipped (non-splittable members), so the unit of parallelism is the
  * FILE — `binaryFiles` + a streaming per-file parser (bounded memory:
  * one record's payload at a time, an explicit `maxPayloadBytes`
  * guard skips oversized payloads in chunks without buffering them).
  * This is the documented genuine-per-partition-imperative case: a
  * record-boundary byte parser cannot be expressed as Column algebra,
  * and a crawl's thousands of ~1 GB files give a 1000-executor
  * cluster its parallelism the same way the reference's per-file
  * parse dispatch does (/root/reference/WebLogTriage/parser.py:68-163
  * is the line-oriented analogue). Everything AFTER the parse is
  * ordinary DataFrame algebra.
  *
  * Write side ([[writeWet]]): renders well-formed conversion records
  * (Column concat — codegen'd, no driver loop) and streams them out
  * per partition, optionally as per-record gzip members (the
  * CommonCrawl convention: members concatenate into one valid stream
  * and `GZIPInputStream` reads them transparently).
  */
object WarcCorpus {

  /** One parsed record (clean when `reason` is null). `content_length`
    * is the DECLARED length (salvaged even when the separator check
    * fails); `payload` is null for corrupt records — a half-read
    * payload is triage material, not data, and the headers identify
    * the record.
    */
  case class WarcRec(
      file: String,
      rec_idx: Long,
      warc_type: String,
      record_id: String,
      target_uri: String,
      warc_date: String,
      content_type: String,
      content_length: Option[Long],
      payload: Array[Byte],
      reason: String)

  val DefaultMaxPayloadBytes: Long = 64L * 1024 * 1024

  /** Parse every record under `path` (files or a glob; plain or
    * gzipped, sniffed per file by magic bytes). Returns ONE frame of
    * clean + corrupt rows — split with [[wetText]] / [[corrupt]]; the
    * single frame means one scan feeds both consumers.
    */
  def readWarc(
      spark: SparkSession, path: String,
      maxPayloadBytes: Long = DefaultMaxPayloadBytes,
      minPartitions: Int = 0): DataFrame = {
    val mp = if (minPartitions > 0) minPartitions
      else spark.sparkContext.defaultParallelism
    val handles = spark.sparkContext.binaryFiles(path, mp)
    // Parallelism floor: binaryFiles COMBINES small files into few
    // splits (CombineFileInputFormat charges each file the 4 MB
    // spark.files.openCostInBytes, so a dozen small .warc files land
    // in ONE split and the whole parse runs serialized — the q131
    // shape). PortableDataStream is a lazy handle, so redistributing
    // the (path, handle) pairs is a shuffle of pointers, not payloads;
    // a real crawl's many-file input already plans >= mp partitions
    // and this is a no-op there.
    val spread =
      if (handles.getNumPartitions < mp) handles.repartition(mp)
      else handles
    val rdd = spread
      .flatMap { case (file, pds) => parseStream(file, pds, maxPayloadBytes) }
    spark.createDataFrame(rdd)
  }

  /** Clean `conversion` records as text: (file, rec_idx, target_uri,
    * warc_date, content_length, text) — the shape the downstream
    * document operators consume.
    */
  def wetText(records: DataFrame): DataFrame =
    records.filter(col("reason").isNull && col("warc_type") === "conversion")
      .select(col("file"), col("rec_idx"), col("target_uri"),
        col("warc_date"), col("content_length").as("content_length"),
        decode(col("payload"), "UTF-8").as("text"))

  /** The corrupt side channel: (file, rec_idx, reason, salvaged
    * headers that identify the record).
    */
  def corrupt(records: DataFrame): DataFrame =
    records.filter(col("reason").isNotNull)
      .select(col("file"), col("rec_idx"), col("reason"),
        col("warc_type"), col("target_uri"), col("content_length"))

  // ---------------------------------------------------------------
  // streaming per-file parser
  // ---------------------------------------------------------------

  private def open(pds: PortableDataStream): InputStream = {
    val base = new BufferedInputStream(pds.open(), 1 << 16)
    base.mark(2)
    val b0 = base.read(); val b1 = base.read()
    base.reset()
    if (b0 == 0x1f && b1 == 0x8b) new GZIPInputStream(base, 1 << 16) else base
  }

  /** Iterator over the records of one file. The stream is consumed
    * strictly forward; `PushbackInputStream` holds at most the
    * `WARC/` probe the resync scan overshoots.
    */
  private[sources] def parseStream(
      file: String, pds: PortableDataStream,
      maxPayloadBytes: Long): Iterator[WarcRec] =
    new Iterator[WarcRec] {
      private val in = new PushbackInputStream(open(pds), 8)
      // a consumer that stops early (limit(n), a failing downstream
      // stage) never drains to EOF — close at task end regardless, or
      // each partially-consumed file leaks an open (gzip) stream
      Option(org.apache.spark.TaskContext.get()).foreach(
        _.addTaskCompletionListener[Unit] { _ =>
          try in.close() catch { case _: java.io.IOException => () }
        })
      private var idx = -1L
      private var nextRec: WarcRec = null
      private var done = false

      private def emit(
          h: collection.Map[String, String], len: Option[Long],
          payload: Array[Byte], reason: String): WarcRec =
        WarcRec(file, idx,
          h.getOrElse("warc-type", null), h.getOrElse("warc-record-id", null),
          h.getOrElse("warc-target-uri", null), h.getOrElse("warc-date", null),
          h.getOrElse("content-type", null), len, payload, reason)

      private def advance(): Unit = {
        nextRec = null
        while (nextRec == null && !done) {
          if (!skipBlankLinesToRecord()) { done = true; in.close() }
          else {
            idx += 1
            nextRec = parseOne()
          }
        }
      }

      /** Consume CRLF runs; true iff more bytes remain. */
      private def skipBlankLinesToRecord(): Boolean = {
        var b = in.read()
        while (b == '\r' || b == '\n') b = in.read()
        if (b < 0) false else { in.unread(b); true }
      }

      private def parseOne(): WarcRec = {
        val empty = Map.empty[String, String]
        val version = readLine()
        if (version == null) return null
        if (!version.startsWith("WARC/"))
          return { resync(); emit(empty, None, null, "bad version line") }
        // headers
        val h = collection.mutable.Map.empty[String, String]
        var line = readLine()
        while (line != null && line.nonEmpty) {
          val c = line.indexOf(':')
          if (c <= 0) return { resync(); emit(h, None, null, "malformed header") }
          h(line.substring(0, c).trim.toLowerCase(java.util.Locale.ROOT)) =
            line.substring(c + 1).trim
          line = readLine()
        }
        if (line == null) return emit(h, None, null, "eof in headers")
        val rawLen = h.get("content-length")
        if (rawLen.isEmpty)
          return { resync(); emit(h, None, null, "missing content-length") }
        val lenOpt = rawLen.flatMap(_.toLongOption)
        // present-but-unusable (non-numeric or negative) is its OWN
        // reason, and no value salvages — a consumer asserting
        // content_length >= 0 on salvaged rows must never see -7
        if (lenOpt.isEmpty || lenOpt.get < 0)
          return { resync(); emit(h, None, null, "invalid content-length") }
        val len = lenOpt.get
        // len.toInt below would wrap negative past Int.MaxValue and
        // kill the whole file's parse — route through the skip branch
        // regardless of how high the caller raised maxPayloadBytes
        if (len > maxPayloadBytes || len > Int.MaxValue.toLong) {
          // skip without buffering — the guard that keeps one
          // pathological record from sizing executor memory
          val skipped = skipFully(len)
          if (skipped < len) return emit(h, lenOpt, null, "truncated payload")
          return { expectSeparatorOr(h, lenOpt, "oversized payload") }
        }
        val payload = new Array[Byte](len.toInt)
        var off = 0
        var r = 0
        while (off < len && r >= 0) {
          r = in.read(payload, off, len.toInt - off)
          if (r > 0) off += r
        }
        if (off < len) return emit(h, lenOpt, null, "truncated payload")
        // record separator: CRLF CRLF
        if (!readSeparator())
          return { resync(); emit(h, lenOpt, null, "bad separator") }
        emit(h, lenOpt, payload, null)
      }

      /** For the oversized path: separator intact → record is merely
        * oversized; separator wrong → also resync.
        */
      private def expectSeparatorOr(
          h: collection.Map[String, String], len: Option[Long],
          reason: String): WarcRec =
        if (readSeparator()) emit(h, len, null, reason)
        else { resync(); emit(h, len, null, reason) }

      private def readSeparator(): Boolean = {
        val sep = new Array[Byte](4)
        var off = 0
        var r = 0
        while (off < 4 && r >= 0) {
          r = in.read(sep, off, 4 - off)
          if (r > 0) off += r
        }
        if (off == 0) return true // EOF exactly at payload end: accept (final record)
        if (off == 2 && sep(0) == '\r' && sep(1) == '\n') return true // EOF after one CRLF
        val ok = off == 4 && sep(0) == '\r' && sep(1) == '\n' &&
          sep(2) == '\r' && sep(3) == '\n'
        if (!ok && off > 0) in.unread(sep, 0, off)
        ok
      }

      private def skipFully(n: Long): Long = {
        var left = n
        val buf = new Array[Byte](1 << 16)
        var r = 0
        while (left > 0 && r >= 0) {
          r = in.read(buf, 0, math.min(left, buf.length.toLong).toInt)
          if (r > 0) left -= r
        }
        n - left
      }

      /** Read a CRLF-terminated line (LF tolerated) as ISO-8859-1 —
        * header bytes pass through unmangled; values of interest are
        * ASCII. Null at EOF.
        */
      private def readLine(): String = {
        val sb = new java.io.ByteArrayOutputStream(128)
        var b = in.read()
        if (b < 0) return null
        while (b >= 0 && b != '\n') { sb.write(b); b = in.read() }
        val bytes = sb.toByteArray
        val n = if (bytes.nonEmpty && bytes(bytes.length - 1) == '\r')
          bytes.length - 1 else bytes.length
        new String(bytes, 0, n, StandardCharsets.ISO_8859_1)
      }

      /** Scan forward to the next `\r\nWARC/` boundary and push the
        * `WARC/` probe back, so the next record parses from its
        * version line. Heuristic by necessity (the payload length is
        * exactly what we no longer trust) — a payload containing the
        * literal boundary bytes would resync early; the next parse
        * then flags THAT as corrupt too. At EOF the scan just ends.
        */
      private def resync(): Unit = {
        val pat = "\r\nWARC/".getBytes(StandardCharsets.ISO_8859_1)
        var matched = 0
        var b = in.read()
        while (b >= 0) {
          matched =
            if (b == pat(matched)) matched + 1
            else if (b == pat(0)) 1
            else 0
          if (matched == pat.length) {
            in.unread(pat, 2, 5) // give back "WARC/"
            return
          }
          b = in.read()
        }
      }

      advance()
      override def hasNext: Boolean = nextRec != null
      override def next(): WarcRec = {
        val r = nextRec
        if (r == null) throw new NoSuchElementException
        advance()
        r
      }
    }

  // ---------------------------------------------------------------
  // write side
  // ---------------------------------------------------------------

  /** Render a WET `conversion` record as a STRING column (cast to
    * binary at write: UTF-8 bytes). `Content-Length` is the payload's
    * octet length — computed in the same expression, so the record is
    * well-formed by construction.
    */
  def renderWetRecord(uri: Column, date: Column, recordId: Column,
      payload: Column): Column =
    concat(
      lit("WARC/1.0\r\n"),
      lit("WARC-Type: conversion\r\n"),
      lit("WARC-Target-URI: "), uri, lit("\r\n"),
      lit("WARC-Date: "), date, lit("\r\n"),
      lit("WARC-Record-ID: "), recordId, lit("\r\n"),
      lit("Content-Type: text/plain\r\n"),
      // octet (not char) length: the record is written as UTF-8 bytes
      lit("Content-Length: "), length(payload.cast("binary")).cast("string"),
      lit("\r\n\r\n"), payload, lit("\r\n\r\n"))

  /** Write pre-rendered record strings (one per row) as
    * `part-<partition>.warc[.gz]` files under `outDir` — each task
    * streams its partition to one file through the Hadoop FileSystem
    * API (works for local paths and any configured DFS). With
    * `gzipPerRecord`, each record is its own gzip member (the
    * CommonCrawl layout: members concatenate into one valid stream;
    * `GZIPInputStream` — and the read path above — consume them
    * transparently).
    */
  def writeRecords(
      df: DataFrame, recordCol: Column, outDir: String,
      gzipPerRecord: Boolean = false): Unit = {
    val spark = df.sparkSession
    val ext = if (gzipPerRecord) ".warc.gz" else ".warc"
    val out = new org.apache.hadoop.fs.Path(outDir)
    val driverConf = spark.sparkContext.hadoopConfiguration
    val fs0 = out.getFileSystem(driverConf)
    fs0.delete(out, true)
    fs0.mkdirs(out)
    // the driver's live Configuration is not serializable (and its
    // Spark-side broadcast wrapper is private[spark]), but a bare
    // task-side `new Configuration()` would drop every runtime-set
    // spark.hadoop.* entry — defaultFS, s3 credentials — and resolve
    // outDir against a different filesystem than the one prepared
    // above. Ship the entries as a plain Map and replay them.
    val confEntries: Map[String, String] = {
      val it = driverConf.iterator()
      val b = Map.newBuilder[String, String]
      while (it.hasNext) { val e = it.next(); b += (e.getKey -> e.getValue) }
      b.result()
    }
    df.select(recordCol.cast("binary").as("rec"))
      .foreachPartition { (it: Iterator[org.apache.spark.sql.Row]) =>
        if (it.hasNext) {
          val conf = new org.apache.hadoop.conf.Configuration()
          confEntries.foreach { case (k, v) => conf.set(k, v) }
          val pid = org.apache.spark.TaskContext.getPartitionId()
          val p = new org.apache.hadoop.fs.Path(outDir, f"part-$pid%05d$ext")
          val fs = p.getFileSystem(conf)
          val os = fs.create(p, true)
          // close-shield: gz.close() must release its native Deflater
          // (Deflater.end()) after EVERY record — finish() alone leaks
          // one native zlib handle per record until GC — without
          // closing the shared part-file stream underneath
          val shield = new java.io.FilterOutputStream(os) {
            override def write(b: Array[Byte], off: Int, len: Int): Unit =
              os.write(b, off, len) // default FilterOutputStream loops per byte
            override def close(): Unit = flush()
          }
          try {
            it.foreach { row =>
              val bytes = row.getAs[Array[Byte]](0)
              if (gzipPerRecord) {
                val gz = new GZIPOutputStream(shield, 1 << 16)
                gz.write(bytes); gz.finish(); gz.close()
              } else os.write(bytes)
            }
          } finally os.close()
        }
      }
  }

  /** Render + write a WET corpus: one conversion record per row. */
  def writeWet(
      df: DataFrame, uriCol: Column, dateCol: Column, recordIdCol: Column,
      textCol: Column, outDir: String, gzipPerRecord: Boolean = false): Unit = {
    val rendered = df
      .withColumn("_graft_wet_payload", textCol)
      .select(renderWetRecord(uriCol, dateCol, recordIdCol,
        col("_graft_wet_payload")).as("rec"))
    writeRecords(rendered, col("rec"), outDir, gzipPerRecord)
  }
}
