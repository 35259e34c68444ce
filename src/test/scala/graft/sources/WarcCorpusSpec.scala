package graft.sources

import java.nio.charset.StandardCharsets
import java.nio.file.{Files, Paths}

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class WarcCorpusSpec extends GraftSparkSpec {
  import spark.implicits._

  private def tmpDir(name: String): String = {
    val d = Files.createTempDirectory(s"graft-warc-$name").toFile
    d.deleteOnExit()
    d.getAbsolutePath
  }

  /** Well-formed conversion record bytes; `declared` overrides the
    * Content-Length header (the corruption lever), `withLength=false`
    * drops the header entirely.
    */
  private def mkRec(uri: String, payload: String, declared: Option[Long] = None,
      withLength: Boolean = true, sep: String = "\r\n\r\n"): Array[Byte] = {
    val pb = payload.getBytes(StandardCharsets.UTF_8)
    val len = declared.getOrElse(pb.length.toLong)
    val head = new StringBuilder()
      .append("WARC/1.0\r\n")
      .append("WARC-Type: conversion\r\n")
      .append(s"WARC-Target-URI: $uri\r\n")
      .append("WARC-Date: 2026-01-01T00:00:00Z\r\n")
    if (withLength) head.append(s"Content-Length: $len\r\n")
    head.append("\r\n")
    head.toString.getBytes(StandardCharsets.UTF_8) ++ pb ++
      sep.getBytes(StandardCharsets.UTF_8)
  }

  private def writeFile(dir: String, name: String, recs: Array[Byte]*): Unit =
    Files.write(Paths.get(dir, name), recs.flatten.toArray)

  private def parsed(dir: String) =
    WarcCorpus.readWarc(spark, dir).collect()
      .map(r => (r.getAs[Long]("rec_idx"), r.getAs[String]("target_uri"),
        r.getAs[String]("reason"),
        Option(r.getAs[Any]("content_length")).map(_.asInstanceOf[Long]),
        Option(r.getAs[Array[Byte]]("payload"))
          .map(new String(_, StandardCharsets.UTF_8))))
      .sortBy(_._1).toSeq

  test("writeWet round-trip: plain and per-record-gzip, unicode and empty payloads") {
    val docs = (0 until 50).map { i =>
      val text = if (i % 7 == 0) "" else s"doc $i body naïve café ß end"
      (s"http://x.example/d/$i", "2026-01-01T00:00:00Z", s"urn:uuid:$i", text)
    }.toDF("uri", "date", "rid", "text")
    for (gz <- Seq(false, true)) {
      val dir = tmpDir(s"rt-$gz")
      WarcCorpus.writeWet(docs, col("uri"), col("date"), col("rid"),
        col("text"), dir, gzipPerRecord = gz)
      val back = WarcCorpus.wetText(WarcCorpus.readWarc(spark, dir))
        .select(col("target_uri"), col("text"), col("content_length"))
        .collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSet
      val expect = docs.collect().map { r =>
        val t = r.getString(3)
        (r.getString(0), t, t.getBytes(StandardCharsets.UTF_8).length.toLong)
      }.toSet
      assert(back == expect, s"gzipPerRecord=$gz")
      // corrupt channel empty on a well-formed corpus
      assert(WarcCorpus.corrupt(WarcCorpus.readWarc(spark, dir)).count() == 0)
    }
  }

  test("corruption matrix: each bad record flags, salvages headers, and resyncs") {
    val dir = tmpDir("matrix")
    writeFile(dir, "f.warc",
      mkRec("http://x/0", "payload zero"),
      mkRec("http://x/1", "payload one", withLength = false),
      mkRec("http://x/2", "payload two"),
      mkRec("http://x/3", "payload three", declared = Some(5)), // short: separator check hits payload bytes
      mkRec("http://x/4", "payload four"),
      mkRec("http://x/5", "tail cut", declared = Some(9999), sep = "")) // EOF mid-payload
    val rows = parsed(dir)
    assert(rows.map(t => (t._1, t._2, t._3)).toSeq == Seq(
      (0L, "http://x/0", null),
      (1L, "http://x/1", "missing content-length"),
      (2L, "http://x/2", null),
      (3L, "http://x/3", "bad separator"),
      (4L, "http://x/4", null),
      (5L, "http://x/5", "truncated payload")))
    // clean payloads intact either side of the damage
    assert(rows(0)._5.contains("payload zero") && rows(4)._5.contains("payload four"))
    // salvaged declared length on the bad-separator record
    assert(rows(3)._4.contains(5L) && rows(3)._5.isEmpty)
  }

  test("garbage preamble flags bad version line, then resyncs to the first record") {
    val dir = tmpDir("preamble")
    writeFile(dir, "f.warc",
      "not a warc header at all\r\nmore junk\r\n".getBytes(StandardCharsets.UTF_8),
      mkRec("http://x/ok", "good payload"))
    val rows = parsed(dir)
    assert(rows.map(_._3).toSeq == Seq("bad version line", null))
    assert(rows(1)._2 == "http://x/ok")
  }

  test("header names are case-insensitive; unknown headers pass through") {
    val dir = tmpDir("case")
    val rec = ("WARC/1.0\r\nwarc-type: conversion\r\nWARC-TARGET-URI: http://x/c\r\n" +
      "X-Custom: whatever\r\ncontent-LENGTH: 2\r\n\r\nhi\r\n\r\n")
      .getBytes(StandardCharsets.UTF_8)
    writeFile(dir, "f.warc", rec)
    val rows = parsed(dir)
    assert(rows == Seq((0L, "http://x/c", null, Some(2L), Some("hi"))))
  }

  test("oversized payloads skip in bounded memory and keep the stream alive") {
    val dir = tmpDir("oversize")
    writeFile(dir, "f.warc",
      mkRec("http://x/big", "x" * 1000),
      mkRec("http://x/after", "small"))
    val rows = WarcCorpus.readWarc(spark, dir, maxPayloadBytes = 100).collect()
      .map(r => (r.getAs[String]("target_uri"), r.getAs[String]("reason")))
      .sortBy(_._1)
    assert(rows.toSeq == Seq(
      ("http://x/after", null), ("http://x/big", "oversized payload")))
  }

  test("malformed header line flags and resyncs") {
    val dir = tmpDir("badhdr")
    val bad = ("WARC/1.0\r\nWARC-Target-URI: http://x/b\r\nno colon here\r\n" +
      "Content-Length: 2\r\n\r\nhi\r\n\r\n").getBytes(StandardCharsets.UTF_8)
    writeFile(dir, "f.warc", bad, mkRec("http://x/g", "fine"))
    val rows = parsed(dir)
    assert(rows.map(_._3).toSeq == Seq("malformed header", null))
    assert(rows(0)._2 == "http://x/b") // salvaged before the bad line
  }
}
