package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage-level persisted checkpoints for long multi-stage pipelines
  * (the round-10 verdict's first operational gap): the crawl→corpus
  * flagship keeps every intermediate as `localCheckpoint` — fast, but
  * LOST on driver failure, and at 100 TB each stage is hours of work.
  * The ledger applies the index families' ledger-first rule to the
  * pipeline itself: a stage writes its output parquet FIRST, then a
  * `_COMMIT` marker; a crash between the two leaves no marker, so a
  * restart recomputes exactly that stage (idempotent overwrite) and
  * reuses every committed one by reading its parquet back.
  *
  * Downstream ALWAYS consumes the persisted copy — a fresh run and a
  * resumed run read byte-identical stage inputs, which is what makes
  * "resume ≡ single run" provable rather than hoped
  * (StageLedgerSpec kills the run at every boundary and compares).
  *
  * The ledger does NOT fingerprint upstream inputs: stage names are
  * the contract, and a caller changing the pipeline (or its input
  * data) between runs must [[clear]] the ledger — same ownership rule
  * as the quantizer memo keys.
  */
class StageLedger(
    spark: SparkSession, val dir: String,
    failAfter: Option[String] = None) {

  private val hadoopConf = spark.sessionState.newHadoopConf()
  private def fs = new Path(dir).getFileSystem(hadoopConf)
  private def dataPath(name: String) = s"$dir/$name/data.parquet"
  private def commitPath(name: String) = new Path(s"$dir/$name/_COMMIT")

  def isCommitted(name: String): Boolean = fs.exists(commitPath(name))

  def committedStages: Seq[String] = {
    val base = new Path(dir)
    if (!fs.exists(base)) Nil
    else fs.listStatus(base).toSeq
      .filter(_.isDirectory).map(_.getPath.getName)
      .filter(isCommitted).sorted
  }

  /** Run (or resume) one stage. Committed → read the persisted
    * parquet, recomputing nothing; uncommitted (including a crashed
    * half-write that never reached its marker) → evaluate `f`,
    * overwrite the stage's parquet, THEN write the marker. Either
    * way the returned frame reads from the persisted copy.
    */
  def stage(name: String)(f: => DataFrame): DataFrame = {
    require(!name.contains("/"), s"stage name must be a single path segment: $name")
    if (!isCommitted(name)) {
      f.write.mode("overwrite").parquet(dataPath(name))
      fs.create(commitPath(name), true).close()
      failAfter.filter(_ == name).foreach { n =>
        throw new StageLedger.PlantedCrash(n)
      }
    }
    spark.read.parquet(dataPath(name))
  }

  /** Drop the whole ledger — the fresh-run reset. */
  def clear(): Unit = {
    val p = new Path(dir)
    if (fs.exists(p)) fs.delete(p, true)
    ()
  }
}

object StageLedger {
  /** Thrown by the `failAfter` crash injection point — the spec's
    * stand-in for the driver dying between two stages (after the
    * marker lands, before the next stage starts).
    */
  final class PlantedCrash(stage: String)
    extends RuntimeException(s"planted crash after stage $stage")
}
