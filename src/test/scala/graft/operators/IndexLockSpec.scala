package graft.operators

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec
import graft.textops.NearDup

/** Mutation-lock guard (IndexOps.withMutationLock): the documented
  * single-mutator contract is now a loud failure — a second concurrent
  * mutator fails fast, a crash leaves a stale lock the next mutator
  * reports (with the holder tag) until forceClearMutationLock, and
  * the lock releases on both normal and failed mutations.
  */
class IndexLockSpec extends GraftSparkSpec {
  import spark.implicits._

  private def tmp() =
    java.nio.file.Files.createTempDirectory("graft_lock").toString

  private def batch(ids: Long*) =
    ids.map(i => (i, i * 31 + 7)).toDF("id", "fp")

  test("second concurrent mutator fails fast with the holder's tag") {
    val dir = tmp()
    NearDup.buildFingerprintIndex(batch(1L, 2L), "id", "fp", dir)
    val e = intercept[IndexOps.ConcurrentMutationException] {
      IndexOps.withMutationLock(spark, dir, "append-outer") {
        NearDup.appendToFingerprintIndex(batch(3L), "id", "fp", dir)
      }
    }
    assert(e.getMessage.contains("append-outer"),
      s"error must name the holding mutation: ${e.getMessage}")
    assert(e.getMessage.contains("forceClearMutationLock"))
  }

  test("delete and compact also exclude each other") {
    val dir = tmp()
    NearDup.buildFingerprintIndex(batch(1L, 2L, 3L), "id", "fp", dir)
    intercept[IndexOps.ConcurrentMutationException] {
      IndexOps.withMutationLock(spark, dir, "compact") {
        NearDup.removeFromSimhashIndex(Seq(1L).toDF("id"), "id", dir)
      }
    }
    intercept[IndexOps.ConcurrentMutationException] {
      IndexOps.withMutationLock(spark, dir, "delete") {
        NearDup.compactSimhashIndex(spark, dir)
      }
    }
  }

  test("a crashed mutator's stale lock blocks until force-cleared") {
    val dir = tmp()
    NearDup.buildFingerprintIndex(batch(1L), "id", "fp", dir)
    // simulate a crash: the lock file exists but no process holds it
    java.nio.file.Files.write(
      java.nio.file.Paths.get(dir, "_mutation.lock"),
      "append-simhash pid=99999 t=2026-01-01T00:00:00Z".getBytes)
    val e = intercept[IndexOps.ConcurrentMutationException] {
      NearDup.appendToFingerprintIndex(batch(2L), "id", "fp", dir)
    }
    assert(e.getMessage.contains("pid=99999"))
    IndexOps.forceClearMutationLock(spark, dir)
    NearDup.appendToFingerprintIndex(batch(2L), "id", "fp", dir)
    val ids = spark.read.parquet(s"$dir/fp.parquet")
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L))
  }

  test("lock releases after normal and after FAILED mutations") {
    val dir = tmp()
    NearDup.buildFingerprintIndex(batch(1L), "id", "fp", dir)
    NearDup.appendToFingerprintIndex(batch(2L), "id", "fp", dir)
    // failed mutation: frame missing the fp column -> analysis error
    intercept[Throwable] {
      NearDup.appendToFingerprintIndex(
        Seq(3L).toDF("id"), "id", "fp", dir)
    }
    assert(!new java.io.File(dir, "_mutation.lock").exists(),
      "a live mutator that failed must release the lock")
    NearDup.appendToFingerprintIndex(batch(3L), "id", "fp", dir)
    val ids = spark.read.parquet(s"$dir/fp.parquet")
      .select("id").as[Long].collect().sorted.toSeq
    assert(ids == Seq(1L, 2L, 3L))
  }

  test("locks are per-index: mutating index A does not block index B") {
    val dirA = tmp()
    val dirB = tmp()
    NearDup.buildFingerprintIndex(batch(1L), "id", "fp", dirA)
    NearDup.buildFingerprintIndex(batch(1L), "id", "fp", dirB)
    IndexOps.withMutationLock(spark, dirA, "append") {
      NearDup.appendToFingerprintIndex(batch(2L), "id", "fp", dirB)
    }
    assert(spark.read.parquet(s"$dirB/fp.parquet").count() == 2)
  }
}
