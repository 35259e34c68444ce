package graft.textops

import java.lang.ref.WeakReference

import org.apache.spark.SparkContext
import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

/** Pins the broadcast-cache lifecycle of [[Bpe.bpe_token_count]]:
  * entries are keyed on the stable (applicationId, startTime) context
  * identity — NOT the context object's identity hash, which a
  * successor context in the same JVM can reuse — and entries whose
  * owning context is stopped (or collected) are evicted on the next
  * lookup. Spark allows one active context per JVM and the suite
  * shares it, so the "earlier, now-stopped context" is simulated by
  * planting a cache entry whose WeakReference is already cleared —
  * exactly the observable state a stopped-and-collected predecessor
  * leaves behind.
  */
class BpeCacheSpec extends GraftSparkSpec {
  import spark.implicits._

  private def count(merges: Seq[(String, String)]): Int =
    Seq("the").toDF("text")
      .select(Bpe.bpe_token_count(spark, col("text"), merges).as("n"))
      .collect().head.getInt(0)

  test("cache keys on (applicationId, startTime) and reuses one broadcast per merges") {
    Bpe.bcastCache.clear()
    val merges = Bpe.defaultMerges
    assert(count(merges) == 1)
    val sc = spark.sparkContext
    val key = (sc.applicationId, sc.startTime, merges.toVector)
    assert(Bpe.bcastCache.keySet == Set(key))
    val bcast = Bpe.bcastCache(key)._2
    assert(count(merges) == 1)
    // second call reused the SAME broadcast — no per-call leak
    assert(Bpe.bcastCache.size == 1)
    assert(Bpe.bcastCache(key)._2 eq bcast)
  }

  test("entries of dead contexts are evicted on the next lookup; live entry survives") {
    Bpe.bcastCache.clear()
    val merges = Bpe.defaultMerges
    assert(count(merges) == 1)
    val sc = spark.sparkContext
    val liveKey = (sc.applicationId, sc.startTime, merges.toVector)
    val liveBcast = Bpe.bcastCache(liveKey)._2
    // a predecessor context's leftover: same merges, different context
    // identity, WeakReference already cleared (context collected)
    val deadKey = ("app-predecessor-0000", 1L, merges.toVector)
    Bpe.bcastCache.put(deadKey, (new WeakReference[SparkContext](null), liveBcast))
    assert(Bpe.bcastCache.size == 2)
    assert(count(merges) == 1)
    // dead entry gone, live entry still the same broadcast
    assert(Bpe.bcastCache.keySet == Set(liveKey))
    assert(Bpe.bcastCache(liveKey)._2 eq liveBcast)
  }
}
