package graft.registry

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft._
import graft.SparkEntry._
import graft.functions.{Cidr, RiskFeatures}
import graft.rules.{GraftConfig, RuleEngine}
import graft.session.Sessionizer
import graft.sources.ParseLogLine

/** Source query registry — corpus source round-trips (WARC/WET).
  *
  * Mechanically split out of the former SparkEntry monolith (round
  * 10): entry text is unchanged; [[graft.SparkEntry.queries]] merges
  * every registry back into the single driver-facing map, and the
  * shared fixtures/oracle helpers stay on SparkEntry (`private[graft]`).
  */
object SourceQueries {

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(

    // WARC/WET ingestion round-trip with planted corruption: every doc
    // renders as a WET conversion record (Column concat, distributed
    // write), with doc_id%13==5 under-declaring Content-Length (the
    // separator check then lands in payload bytes) and doc_id%13==9
    // dropping the header entirely; the streaming parser must flag
    // BOTH, salvage their header identities, resync to the next
    // record, and hand every clean payload back byte-exact. The
    // oracle recomputes the whole outcome from the documents table —
    // the parser's verdicts are a pure function of the fixture rules
    "q109_warc" -> ((s, dir) => {
      import graft.sources.WarcCorpus
      val fixDir = warcFixtureDir(dir)
      val docs = table(s, dir, "documents").select(col("doc_id"),
        concat(lit("doc "), col("doc_id").cast("string"), lit(" "),
          coalesce(col("text"), lit(""))).as("p"))
      val plen = length(col("p").cast("binary"))
      val declared = when(col("doc_id") % 13 === 5, plen - 4).otherwise(plen)
      val clHeader = when(col("doc_id") % 13 === 9, lit(""))
        .otherwise(concat(lit("Content-Length: "), declared.cast("string"),
          lit("\r\n")))
      val rec = concat(
        lit("WARC/1.0\r\nWARC-Type: conversion\r\nWARC-Target-URI: " +
          "http://fixture.example/doc/"),
        col("doc_id").cast("string"), lit("\r\n"),
        lit("WARC-Date: 2026-01-01T00:00:00Z\r\nContent-Type: text/plain\r\n"),
        clHeader, lit("\r\n"), col("p"), lit("\r\n\r\n"))
      WarcCorpus.writeRecords(docs.select(rec.as("rec")), col("rec"), fixDir)
      WarcCorpus.readWarc(s, fixDir)
        .select(
          regexp_extract(col("target_uri"), "doc/([0-9]+)$", 1)
            .cast("long").as("doc_id"),
          coalesce(col("reason"), lit("ok")).as("status"),
          col("content_length"),
          decode(col("payload"), "UTF-8").as("text"))
    })
  )

  val oracleSql: Map[String, String] = Map(

    // the parser's verdict per record is a pure function of the
    // fixture's corruption rules, so the oracle needs no file at all:
    // ok records hand back the payload byte-exact with its octet
    // length; under-declared records salvage the declared length and
    // no payload; header-less records salvage neither
    "q109_warc" ->
      raw"""WITH p AS (
        |  SELECT doc_id, CAST(doc_id % 13 AS INT) AS m,
        |    'doc ' || CAST(doc_id AS VARCHAR) || ' ' || coalesce(text, '') AS pay
        |  FROM documents)
        |SELECT doc_id,
        |  CASE m WHEN 5 THEN 'bad separator'
        |         WHEN 9 THEN 'missing content-length'
        |         ELSE 'ok' END AS status,
        |  CASE m WHEN 9 THEN NULL
        |         WHEN 5 THEN CAST(octet_length(encode(pay)) - 4 AS BIGINT)
        |         ELSE CAST(octet_length(encode(pay)) AS BIGINT) END AS content_length,
        |  CASE WHEN m IN (5, 9) THEN NULL ELSE pay END AS text
        |FROM p""".stripMargin
  )
}
