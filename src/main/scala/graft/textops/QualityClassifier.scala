package graft.textops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, DataFrame, GraftInterop, SparkSession}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Hashed-feature linear quality classifier — the fastText-style
  * model-based companion to the rule-based verdict
  * ([[TextAnalysis.qualityVerdict]]) and the distributional LM signal
  * ([[NgramLm]]): a logistic-regression score over hashed token and
  * token-bigram features, trained on a small LABELED slice
  * (good/bad examples), scoring the whole corpus in one pass.
  *
  * Model: features of a document are its lowered whitespace tokens
  * plus adjacent-token bigrams (joined with a single space — tokens
  * cannot contain spaces, so the joint is unambiguous). Each feature
  * hashes into one of `dim` buckets (FNV-1a 64-bit over UTF-8 bytes,
  * floor-mod into the table — the hashing trick; collisions are part
  * of the model, both training and scoring share them). The document
  * score is
  *
  *   p = sigmoid(bias + (sum over feature occurrences of w[h(f)]) / N)
  *
  * with N = total feature occurrences (tokens + bigrams) — the mean
  * formulation fastText uses, making the score length-invariant.
  * An empty document scores sigmoid(bias).
  *
  * Training is DRIVER-SIDE deterministic full-batch gradient descent
  * on the bounded labeled slice (the [[graft.vector.Ivf]] fitCentroids
  * pattern: labeled sets are curated and small — bound-and-collect
  * with a loud overflow, no sampling, no RNG anywhere). 100 TB shape
  * mirrors [[NgramLm]]: the weight table ships ONCE PER EXECUTOR as a
  * Broadcast (`dim` doubles — 512 KiB at the default 2^16), scoring
  * is one narrow codegen'd scan, no shuffle, nothing to skew.
  */
object QualityClassifier {

  /** Trained model: `w` has length `dim`; score arithmetic is defined
    * in [[score]] (and must stay bit-reproducible — the oracle's
    * independent scorer mirrors it).
    */
  final class Weights(
      val dim: Int,
      val w: Array[Double],
      val bias: Double) extends Serializable {
    require(w.length == dim, s"Weights: |w|=${w.length} != dim=$dim")
  }

  /** FNV-1a 64-bit over the feature's UTF-8 bytes — chosen because it
    * is tiny enough to reimplement independently (the oracle scorer
    * carries its own copy) and byte-stable across JVMs.
    */
  def fnv1a64(s: String): Long = {
    val bytes = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  def featureIndex(feature: String, dim: Int): Int =
    java.lang.Math.floorMod(fnv1a64(feature), dim.toLong).toInt

  private val WsRegex = "[ \\t\\n\\x0B\\f\\r]+"

  private[textops] def tokenize(text: String): Array[String] = {
    val t = if (text == null) "" else text.toLowerCase(java.util.Locale.ROOT)
    val parts = t.split(WsRegex)
    parts.filter(_.nonEmpty)
  }

  /** Sparse mean-normalized feature vector: (index -> count / N). */
  private def featurize(text: String, dim: Int): (java.util.HashMap[Integer, java.lang.Double], Int) = {
    val toks = tokenize(text)
    val n = toks.length + math.max(toks.length - 1, 0)
    val m = new java.util.HashMap[Integer, java.lang.Double]()
    def add(f: String): Unit = {
      val i = Integer.valueOf(featureIndex(f, dim))
      val prev = m.get(i)
      m.put(i, if (prev == null) 1.0 else prev + 1.0)
    }
    var i = 0
    while (i < toks.length) { add(toks(i)); i += 1 }
    i = 1
    while (i < toks.length) { add(toks(i - 1) + " " + toks(i)); i += 1 }
    if (n > 0) m.replaceAll((_, c) => c / n)
    (m, n)
  }

  /** Deterministic full-batch logistic regression over the labeled
    * slice: `labelCol` true = good (target 1), false = bad. The slice
    * is collected in `orderCol`-ascending order (determinism: float
    * accumulation order is fixed), bounded by `maxDocs` with the
    * family's limit-probe pattern. No regularization by default — the
    * labeled sets this trains on are small and the hashing trick
    * already caps capacity; pass `l2` > 0 to shrink.
    */
  def train(
      df: DataFrame,
      textCol: String,
      labelCol: String,
      orderCol: String,
      dim: Int = 1 << 16,
      epochs: Int = 200,
      lr: Double = 2.0,
      l2: Double = 0.0,
      maxDocs: Int = 100000): Weights = {
    require(dim > 0, s"train: dim must be positive (got $dim)")
    require(epochs > 0, s"train: epochs must be positive (got $epochs)")
    require(lr > 0, s"train: lr must be positive (got $lr)")
    require(l2 >= 0, s"train: l2 must be >= 0 (got $l2)")
    val probeLimit = math.min(maxDocs.toLong + 1L, Int.MaxValue.toLong).toInt
    val collected = df
      .select(col(orderCol), col(textCol).cast("string"), col(labelCol).cast("boolean"))
      .orderBy(col(orderCol))
      .limit(probeLimit)
      .collect()
    require(collected.length <= maxDocs,
      s"train: labeled slice exceeds maxDocs=$maxDocs — train on a smaller " +
        "slice or raise the bound deliberately")
    require(collected.nonEmpty, "train: labeled slice is empty")
    val feats = collected.map { r =>
      val (m, _) = featurize(r.getString(1), dim)
      (m, if (r.isNullAt(2)) false else r.getBoolean(2))
    }
    val w = new Array[Double](dim)
    var bias = 0.0
    val nDocs = feats.length
    var epoch = 0
    while (epoch < epochs) {
      val gradW = new java.util.HashMap[Integer, java.lang.Double]()
      var gradB = 0.0
      feats.foreach { case (x, label) =>
        var s = bias
        val it = x.entrySet().iterator()
        while (it.hasNext) {
          val e = it.next()
          s += w(e.getKey.intValue()) * e.getValue.doubleValue()
        }
        val p = 1.0 / (1.0 + math.exp(-s))
        val err = p - (if (label) 1.0 else 0.0)
        gradB += err
        val it2 = x.entrySet().iterator()
        while (it2.hasNext) {
          val e = it2.next()
          val prev = gradW.get(e.getKey)
          val add = err * e.getValue.doubleValue()
          gradW.put(e.getKey, if (prev == null) add else prev + add)
        }
      }
      val git = gradW.entrySet().iterator()
      while (git.hasNext) {
        val e = git.next()
        val i = e.getKey.intValue()
        w(i) -= lr * (e.getValue.doubleValue() / nDocs + l2 * w(i))
      }
      bias -= lr * gradB / nDocs
      epoch += 1
    }
    new Weights(dim, w, bias)
  }

  /** Score under the broadcast weights: (score, pred). The
    * accumulation order is FIXED (all tokens in text order, then all
    * bigrams in text order) so the double result is bit-reproducible —
    * the oracle's independent scorer replays the same order.
    */
  def score(text: UTF8String, bcast: Broadcast[Weights]): GenericInternalRow = {
    val wts = bcast.value
    val toks = tokenize(if (text == null) "" else text.toString)
    var dot = 0.0
    var i = 0
    while (i < toks.length) {
      dot += wts.w(featureIndex(toks(i), wts.dim))
      i += 1
    }
    i = 1
    while (i < toks.length) {
      dot += wts.w(featureIndex(toks(i - 1) + " " + toks(i), wts.dim))
      i += 1
    }
    val n = toks.length + math.max(toks.length - 1, 0)
    val s = wts.bias + (if (n == 0) 0.0 else dot / n)
    val p = 1.0 / (1.0 + math.exp(-s))
    new GenericInternalRow(Array[Any](p, p >= 0.5))
  }

  case class QualityScoreExpr(child: Expression, bcast: Broadcast[Weights])
      extends UnaryExpression {
    override def dataType: DataType = StructType(Seq(
      StructField("score", DoubleType, nullable = false),
      StructField("pred", BooleanType, nullable = false)))
    override def nullable: Boolean = true
    override def prettyName: String = "quality_score"

    override def nullSafeEval(input: Any): Any =
      QualityClassifier.score(input.asInstanceOf[UTF8String], bcast)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val cls = "graft.textops.QualityClassifier"
      val ref = ctx.addReferenceObj("qcWeights", bcast,
        "org.apache.spark.broadcast.Broadcast")
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = $cls.score($input, " +
          s"(org.apache.spark.broadcast.Broadcast) $ref);")
    }

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Scoring column. Broadcasts `weights` PER CALL (the [[NgramLm]]
    * lm_score contract): per-batch callers against the same model
    * should build the column once and reuse the plan.
    */
  def quality_score(spark: SparkSession, text: Column, weights: Weights): Column = {
    val bcast = spark.sparkContext.broadcast(weights)
    GraftInterop.column(QualityScoreExpr(GraftInterop.expression(text), bcast))
  }
}
