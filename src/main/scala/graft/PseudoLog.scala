package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The shared events→access-log mapping used by the oracle query suite.
  *
  * The driver's correctness gate runs over its synthetic parquet tables,
  * so reference-parity operators are exercised by deterministically
  * deriving a pseudo access-log from `events` — ONCE, here, with an
  * exactly equivalent DuckDB SQL CTE ([[PseudoLog.sqlLogs]]) so every
  * oracle compares the same rows. Keep both sides in lockstep when
  * editing.
  */
object PseudoLog {

  /** Spark side. Columns: event_id, user_id, source, ip, method, status,
    * request_uri, resp_size, referrer, user_agent, utc_timestamp.
    */
  def logs(spark: SparkSession, dir: String): DataFrame = {
    val ev = SparkEntry.eventsTable(spark, dir)
    val id = col("event_id")
    val uid = col("user_id")
    def seg(m: Long, s: String): Column = when(id % m === 0, lit(s)).otherwise(lit(""))
    val uri = concat(
      seg(31, "/admin"),
      lit("/page/p"), (id % 50).cast("string"),
      seg(23, ".css"),
      seg(97, "/../etc/passwd"),
      seg(89, "/cmd.php"),
      seg(71, "/dump.sql"),
      seg(61, "/f.php.txt"),
      seg(53, "?q=%2e%2e"),
      seg(43, "?f=../x"),
      seg(89, "?x=whoami"))
    ev.select(
      id, uid,
      concat(lit("src"), (uid % 3).cast("string"), lit(".log")).as("source"),
      concat(lit("10."), (uid % 200).cast("string"), lit(".0.1")).as("ip"),
      when(uid % 5 === 0, "GET").when(uid % 5 === 1, "POST")
        .when(uid % 5 === 2, "PUT").when(uid % 5 === 3, "HEAD")
        .otherwise("DELETE").as("method"),
      when(id % 7 === 2, 404).when(id % 7 === 4, 500)
        .when(id % 7 === 5, 302).when(id % 7 === 6, 403)
        .otherwise(200).as("status"),
      uri.as("request_uri"),
      floor(col("value") * 100).cast("long").as("resp_size"),
      when(id % 11 === 0, "https://fofa.info/r")
        .when(id % 13 === 0, "http://ref.example/")
        .otherwise("-").as("referrer"),
      when(uid % 4 === 0, "Mozilla/5.0 (X11; Linux x86_64)")
        .when(uid % 4 === 1, "curl/8.1")
        .when(uid % 4 === 2, "sqlmap/1.7")
        .otherwise("python-requests/2.31").as("user_agent"),
      col("ts").as("utc_timestamp"))
  }

  /** DuckDB twin of [[logs]] as a CTE body named `logs`. */
  val sqlLogs: String =
    """logs AS (
      |  SELECT event_id, user_id,
      |    'src' || CAST(user_id % 3 AS VARCHAR) || '.log' AS source,
      |    '10.' || CAST(user_id % 200 AS VARCHAR) || '.0.1' AS ip,
      |    CASE WHEN user_id % 5 = 0 THEN 'GET' WHEN user_id % 5 = 1 THEN 'POST'
      |         WHEN user_id % 5 = 2 THEN 'PUT' WHEN user_id % 5 = 3 THEN 'HEAD'
      |         ELSE 'DELETE' END AS method,
      |    CASE WHEN event_id % 7 = 2 THEN 404 WHEN event_id % 7 = 4 THEN 500
      |         WHEN event_id % 7 = 5 THEN 302 WHEN event_id % 7 = 6 THEN 403
      |         ELSE 200 END AS status,
      |    (CASE WHEN event_id % 31 = 0 THEN '/admin' ELSE '' END)
      |      || '/page/p' || CAST(event_id % 50 AS VARCHAR)
      |      || (CASE WHEN event_id % 23 = 0 THEN '.css' ELSE '' END)
      |      || (CASE WHEN event_id % 97 = 0 THEN '/../etc/passwd' ELSE '' END)
      |      || (CASE WHEN event_id % 89 = 0 THEN '/cmd.php' ELSE '' END)
      |      || (CASE WHEN event_id % 71 = 0 THEN '/dump.sql' ELSE '' END)
      |      || (CASE WHEN event_id % 61 = 0 THEN '/f.php.txt' ELSE '' END)
      |      || (CASE WHEN event_id % 53 = 0 THEN '?q=%2e%2e' ELSE '' END)
      |      || (CASE WHEN event_id % 43 = 0 THEN '?f=../x' ELSE '' END)
      |      || (CASE WHEN event_id % 89 = 0 THEN '?x=whoami' ELSE '' END)
      |      AS request_uri,
      |    CAST(floor(value * 100) AS BIGINT) AS resp_size,
      |    CASE WHEN event_id % 11 = 0 THEN 'https://fofa.info/r'
      |         WHEN event_id % 13 = 0 THEN 'http://ref.example/'
      |         ELSE '-' END AS referrer,
      |    CASE WHEN user_id % 4 = 0 THEN 'Mozilla/5.0 (X11; Linux x86_64)'
      |         WHEN user_id % 4 = 1 THEN 'curl/8.1'
      |         WHEN user_id % 4 = 2 THEN 'sqlmap/1.7'
      |         ELSE 'python-requests/2.31' END AS user_agent,
      |    ts AS utc_timestamp,
      |    CAST(floor(epoch(ts)) AS BIGINT) AS ep
      |  FROM events)""".stripMargin

  /** Sessionized CTE chain on top of `src`: adds `cluster` (dense id,
    * (source, ip, localId) order — same algorithm as
    * [[graft.session.Sessionizer.withClusters]]) and `request_count`.
    */
  def sqlSessionized(threshold: Long = 300, src: String = "logs"): String =
    s"""lagged AS (
      |  SELECT *, CASE WHEN ep - lag(ep) OVER w >= $threshold THEN 1 ELSE 0 END AS new_s
      |  FROM $src WINDOW w AS (PARTITION BY source, ip ORDER BY ep, event_id)),
      |sess AS (
      |  SELECT *, sum(new_s) OVER (PARTITION BY source, ip ORDER BY ep, event_id
      |                             ROWS UNBOUNDED PRECEDING) AS local_id
      |  FROM lagged),
      |skeys AS (SELECT DISTINCT source, ip, local_id FROM sess),
      |snum AS (
      |  SELECT source, ip, local_id,
      |         row_number() OVER (ORDER BY source, ip, local_id) - 1 AS cluster
      |  FROM skeys),
      |clustered AS (
      |  SELECT s.*, n.cluster FROM sess s JOIN snum n USING (source, ip, local_id)),
      |counted AS (
      |  SELECT *, count(*) OVER (PARTITION BY source, ip, cluster, method, request_uri)
      |            AS request_count
      |  FROM clustered)""".stripMargin


  /** uri_risk components in SQL, valid for the pseudo-log URI inventory
    * (only single-depth %2e encodings appear, so one replace pass ==
    * python unquote here; full decode semantics are pinned by
    * RiskFeaturesSpec goldens).
    */
  /** C7 twin (risk.py:275-287). */
  def sqlMethodRisk(m: String): String =
    s"""(CASE upper($m)
       |  WHEN 'GET' THEN 10 WHEN 'HEAD' THEN 20 WHEN 'OPTIONS' THEN 25
       |  WHEN 'POST' THEN 45 WHEN 'PUT' THEN 80 WHEN 'DELETE' THEN 80
       |  WHEN 'TRACE' THEN 80 WHEN 'CONNECT' THEN 80 ELSE 60 END)""".stripMargin

  /** C8 twin (risk.py:289-312). */
  def sqlStatusRisk(s: String): String =
    s"""(CASE
       |  WHEN $s = 100 THEN 20 WHEN $s = 101 THEN 20
       |  WHEN $s = 200 THEN 30 WHEN $s = 201 THEN 90 WHEN $s = 202 THEN 35
       |  WHEN $s = 204 THEN 25 WHEN $s = 207 THEN 70
       |  WHEN $s = 301 THEN 10 WHEN $s = 302 THEN 10 WHEN $s = 304 THEN 20
       |  WHEN $s = 400 THEN 15 WHEN $s = 401 THEN 30 WHEN $s = 403 THEN 40
       |  WHEN $s = 404 THEN 10 WHEN $s = 429 THEN 35
       |  WHEN $s = 500 THEN 90 WHEN $s = 502 THEN 70 WHEN $s = 503 THEN 70
       |  WHEN $s = 504 THEN 70
       |  WHEN $s >= 100 AND $s < 200 THEN 25
       |  WHEN $s >= 200 AND $s < 300 THEN 35
       |  WHEN $s >= 300 AND $s < 400 THEN 15
       |  WHEN $s >= 400 AND $s < 500 THEN 25
       |  WHEN $s >= 500 AND $s < 600 THEN 80
       |  ELSE 90 END)""".stripMargin

  def sqlUriRisk(uriExpr: String): String =
    s"""(least(100,
       |   (CASE WHEN $uriExpr != replace($uriExpr, '%2e', '.') THEN 10 ELSE 0 END)
       | + (CASE WHEN contains(lower(replace($uriExpr, '%2e', '.')), '/admin')
       |      OR contains(lower(replace($uriExpr, '%2e', '.')), '/login')
       |      OR contains(lower(replace($uriExpr, '%2e', '.')), '/config')
       |      OR contains(lower(replace($uriExpr, '%2e', '.')), '/setup')
       |      OR contains(lower(replace($uriExpr, '%2e', '.')), '/upload') THEN 25 ELSE 0 END)
       | + (CASE
       |     WHEN regexp_matches(
       |       CASE WHEN position('?' IN replace($uriExpr, '%2e', '.')) > 0
       |            THEN substr(replace($uriExpr, '%2e', '.'), 1, position('?' IN replace($uriExpr, '%2e', '.')) - 1)
       |            ELSE replace($uriExpr, '%2e', '.') END,
       |       '(?i)(\\.\\./|\\.\\.\\\\|/\\.\\.|\\\\\\.\\.|%00|\\x{FFFD})') THEN 80
       |     WHEN regexp_matches(
       |       CASE WHEN position('?' IN replace($uriExpr, '%2e', '.')) > 0
       |            THEN substr(replace($uriExpr, '%2e', '.'), position('?' IN replace($uriExpr, '%2e', '.')) + 1)
       |            ELSE '' END,
       |       '(?i)(\\.\\./|\\.\\.\\\\|/\\.\\.|\\\\\\.\\.|%00|\\x{FFFD})') THEN 15
       |     ELSE 0 END)
       | + (CASE WHEN regexp_extract(
       |       CASE WHEN position('?' IN replace($uriExpr, '%2e', '.')) > 0
       |            THEN substr(replace($uriExpr, '%2e', '.'), 1, position('?' IN replace($uriExpr, '%2e', '.')) - 1)
       |            ELSE replace($uriExpr, '%2e', '.') END, '([^/]*)$$', 1)
       |       IN ('cmd.php', 'shell.php', 'c99.php', 'alfa3.php', '1.php') THEN 50 ELSE 0 END)
       | + (CASE WHEN regexp_matches(replace($uriExpr, '%2e', '.'), '(?i)\\.php\\.[a-zA-Z0-9]+$$') THEN 80 ELSE 0 END)
       | + (CASE WHEN regexp_matches(lower(replace($uriExpr, '%2e', '.')), '\\.(exe|sql|cgi|pl)') THEN 10 ELSE 0 END)
       |))""".stripMargin
}
