package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins [[IngestMonitor.volumeAnomalies]]: exact trailing median,
  * no-history buckets never flagged, the robustness property (a spike
  * does not drag the median it is judged against), and window-parity
  * validation.
  */
class IngestMonitorSpec extends GraftSparkSpec {

  import spark.implicits._

  test("spike flagged against trailing median; history rules respected") {
    // 10 buckets x 1 row; bucket 9 spikes to 200
    val df = (1L to 10L).map(b => (b, if (b == 9L) 200L else 100L))
      .toDF("day", "m")
    val rep = IngestMonitor.volumeAnomalies(df, $"day", $"m")
      .orderBy("bucket").collect()
    // buckets 1..7: no full 7-bucket history
    assert(rep.take(7).forall(r => !r.getBoolean(4) && !r.getBoolean(5)))
    val d8 = rep(7); val d9 = rep(8); val d10 = rep(9)
    assert(d8.getBoolean(4) && d8.getLong(2) === 100L &&
      d8.getLong(3) === 0L && !d8.getBoolean(5))
    assert(d9.getLong(2) === 100L && d9.getLong(3) === 1000L &&
      d9.getBoolean(5), "spike must flag")
    // robustness: day 10's trailing window CONTAINS the spike but the
    // median ignores it
    assert(d10.getLong(2) === 100L && d10.getLong(3) === 0L &&
      !d10.getBoolean(5))
  }

  test("even or tiny windows are rejected") {
    val df = Seq((1L, 1L)).toDF("day", "m")
    intercept[IllegalArgumentException] {
      IngestMonitor.volumeAnomalies(df, $"day", $"m", window = 6)
    }
    intercept[IllegalArgumentException] {
      IngestMonitor.volumeAnomalies(df, $"day", $"m", window = 1)
    }
  }
}
