package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.rules.ToolSignature

/** W3 matrix (FIXTURES §3.2): all-keywords-in-window positive; one
  * keyword missing negative; window-expired negative; time_window==0
  * unlimited; last-assignment-wins on overlap.
  */
class ToolScannerSpec extends GraftSparkSpec {
  import spark.implicits._

  private val ds = ToolSignature("DS01", "DirSearch",
    "DirSearch using default dictionary (dicc.txt).",
    Seq("/.access", ".bak_0.log", ".chef/config.rb", ".isort.cfg", ".spacemacs", "/~xfs"),
    7200)

  private def mkDf(rows: Seq[(Long, String, Long)]) = // (rowId, uri, epochSec)
    rows.toDF("_row_id", "request_uri", "ep")
      .withColumn("source", lit("a.log"))
      .withColumn("ip", lit("1.1.1.1"))
      .withColumn("cluster", lit(0L))
      .withColumn("utc_timestamp", col("ep").cast("timestamp"))
      .drop("ep")

  private val sixHits: Seq[(Long, String, Long)] = Seq(
    (0L, "/.access", 0L), (1L, "/x.bak_0.log", 600L),
    (2L, "/.chef/config.rb", 1200L), (3L, "/.isort.cfg", 1800L),
    (4L, "/.spacemacs", 2400L), (5L, "/~xfs", 3000L))

  test("all 6 keywords within window -> all candidate rows assigned") {
    val noise = Seq((10L, "/index.html", 500L), (11L, "/app.js", 2500L))
    val out = ToolScanner(mkDf(sixHits ++ noise), Seq(ds))
    val tools = out.select("_row_id", "tool").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert((0L to 5L).forall(tools(_) == "DS01"))
    assert(tools(10L) == "" && tools(11L) == "")
  }

  test("one keyword missing -> nothing assigned") {
    val out = ToolScanner(mkDf(sixHits.take(5)), Seq(ds))
    assert(out.filter(col("tool") =!= "").count() == 0)
  }

  test("window expired -> nothing assigned") {
    val spread = sixHits.zipWithIndex.map { case ((id, uri, _), i) => (id, uri, i * 2000L) }
    val out = ToolScanner(mkDf(spread), Seq(ds)) // span 10000 > 7200
    assert(out.filter(col("tool") =!= "").count() == 0)
  }

  test("time_window == 0 means unlimited (risk.py:490)") {
    val spread = sixHits.zipWithIndex.map { case ((id, uri, _), i) => (id, uri, i * 100000L) }
    val out = ToolScanner(mkDf(spread), Seq(ds.copy(timeWindowSeconds = 0)))
    assert(out.filter(col("tool") === "DS01").count() == 6)
  }

  test("overlapping tools: LAST assignment wins (risk.py:498-501)") {
    val t1 = ToolSignature("T1", "One", "d1", Seq("/a", "/b"), 0)
    val t2 = ToolSignature("T2", "Two", "d2", Seq("/b", "/c"), 0)
    val rows = Seq((0L, "/a", 0L), (1L, "/b", 10L), (2L, "/c", 20L))
    val out = ToolScanner(mkDf(rows), Seq(t1, t2))
    val tools = out.select("_row_id", "tool").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // T1 assigns rows 0,1 ('/b' shared); T2 then assigns rows 1,2 -> row 1 = T2
    assert(tools == Map(0L -> "T1", 1L -> "T2", 2L -> "T2"))
  }

  test("groups are isolated by (source, ip, cluster)") {
    val split = sixHits.map { case (id, uri, ep) => (id, uri, ep) }
    val df = mkDf(split).withColumn("cluster", (col("_row_id") % 2).cast("long"))
    val out = ToolScanner(df, Seq(ds))
    assert(out.filter(col("tool") =!= "").count() == 0) // 3 keywords per group only
  }
}
