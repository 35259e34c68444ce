package graft.textops

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession, GraftInterop}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Aho–Corasick multi-pattern substring matching as a broadcast
  * automaton + one codegen'd scan — the SCALE path for content
  * filtering against large term lists (10⁴–10⁶ patterns), where
  * [[TextIndex.phraseSetSearch]]'s plan-constant phrase list stops
  * being viable (a 100k-branch CASE expression neither compiles nor
  * prunes). Classic dictionary-matching (Aho & Corasick 1975), built
  * from scratch against Catalyst.
  *
  * The automaton builds ONCE on the driver (goto/fail/output arrays
  * over a dense char alphabet), ships per-executor as a Broadcast, and
  * each document is one linear pass — no explode, no shuffle, nothing
  * to skew; the matcher's cost is `O(|text| + hits)` regardless of
  * pattern count. Matching is case-folded (Locale.ROOT lowercase on
  * both patterns and text, the family's folding discipline) and
  * SUBSTRING semantics (grep -F -f): a pattern matches anywhere, not
  * only at token boundaries — callers wanting token alignment pad
  * patterns with spaces.
  *
  * Output per document: `(n_hits << 32) | distinct_patterns` packed in
  * one long (hits = total end-positions over all patterns, distinct =
  * how many patterns matched at least once) — the two numbers a
  * filter-or-annotate caller needs, decoded with cheap Column
  * arithmetic ([[ac_hits]] / [[ac_distinct]]).
  */
object PhraseAutomaton {

  /** Immutable trie-with-failure-links automaton. Transitions are a
    * per-state sorted char array + parallel state array (binary
    * search): a dense per-state alphabet table would be
    * states × alphabet and blow the broadcast for large dictionaries;
    * sorted-array lookup is the classic space/time middle ground and
    * keeps the hot loop allocation-free.
    */
  final class Automaton(
      val chars: Array[Array[Char]],
      val next: Array[Array[Int]],
      val fail: Array[Int],
      val ownId: Array[Int],   // the ONE pattern ending exactly here (-1 if none)
      val outLink: Array[Int]  // nearest proper fail-ancestor with an own output (-1)
  ) extends Serializable {
    def size: Int = fail.length
  }

  /** Build the automaton for `patterns` (case-folded, deduplicated;
    * empty patterns rejected). Driver-side `O(total pattern chars ×
    * log degree)`. Outputs are OWN-only plus an output LINK (the
    * nearest failure-chain ancestor that itself ends a pattern) walked
    * at match time — materializing the transitive output set per state
    * (the previous design) is O(depth) per state for suffix-nested
    * dictionaries, i.e. ~quadratic total broadcast bytes in pattern
    * length; the link keeps the automaton O(states) while the match
    * walk stays O(outputs actually emitted). Deduplicated patterns are
    * distinct strings, so each state ends at most one pattern and a
    * single `ownId` suffices.
    */
  def build(patterns: Seq[String]): Automaton = {
    require(patterns.nonEmpty, "PhraseAutomaton: empty pattern list")
    val pats = patterns.map(_.toLowerCase(java.util.Locale.ROOT)).distinct
    require(pats.forall(_.nonEmpty), "PhraseAutomaton: empty pattern")

    // mutable trie
    val gotoMaps = collection.mutable.ArrayBuffer(
      collection.mutable.TreeMap.empty[Char, Int])
    val ends = collection.mutable.ArrayBuffer(-1)
    pats.zipWithIndex.foreach { case (p, pid) =>
      var s = 0
      p.foreach { c =>
        s = gotoMaps(s).getOrElseUpdate(c, {
          gotoMaps += collection.mutable.TreeMap.empty[Char, Int]
          ends += -1
          gotoMaps.length - 1
        })
      }
      ends(s) = pid // distinct patterns -> distinct end states, one pid max
    }
    val n = gotoMaps.length
    val chars = new Array[Array[Char]](n)
    val next = new Array[Array[Int]](n)
    var i = 0
    while (i < n) {
      chars(i) = gotoMaps(i).keys.toArray
      next(i) = chars(i).map(gotoMaps(i))
      i += 1
    }
    // BFS failure links + output links (fail(s) is strictly shallower
    // than s, so its outLink is final by the time s dequeues)
    val fail = new Array[Int](n)
    val ownId = ends.toArray
    val outLink = Array.fill(n)(-1)
    val queue = collection.mutable.Queue.empty[Int]
    chars(0).indices.foreach { k => fail(next(0)(k)) = 0; queue += next(0)(k) }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      outLink(s) = if (ownId(fail(s)) >= 0) fail(s) else outLink(fail(s))
      var k = 0
      while (k < chars(s).length) {
        val c = chars(s)(k)
        val t = next(s)(k)
        // follow failure links to find the deepest proper suffix state
        // with a c-transition
        var f = fail(s)
        var ft = transition(chars, next, f, c)
        while (ft < 0 && f != 0) { f = fail(f); ft = transition(chars, next, f, c) }
        fail(t) = if (ft >= 0 && ft != t) ft else 0
        queue += t
        k += 1
      }
    }
    new Automaton(chars, next, fail, ownId, outLink)
  }

  @inline private def transition(
      chars: Array[Array[Char]], next: Array[Array[Int]],
      s: Int, c: Char): Int = {
    val i = java.util.Arrays.binarySearch(chars(s), c)
    if (i >= 0) next(s)(i) else -1
  }

  /** One-pass match over the LOWERED text; packs
    * `(total_hits << 32) | distinct_patterns`. Total hits = sum over
    * text positions of patterns ending there (a pattern occurring k
    * times counts k); distinct uses a per-call bitset over pattern
    * ids.
    */
  def matchDoc(text: UTF8String, bcast: Broadcast[Automaton]): Long = {
    val a = bcast.value
    val s = text.toString.toLowerCase(java.util.Locale.ROOT)
    var state = 0
    var hits = 0L
    var seen: java.util.BitSet = null
    var i = 0
    val len = s.length
    while (i < len) {
      val c = s.charAt(i)
      var t = transition(a.chars, a.next, state, c)
      while (t < 0 && state != 0) {
        state = a.fail(state)
        t = transition(a.chars, a.next, state, c)
      }
      state = if (t >= 0) t else 0
      // emit outputs: own pattern (if any) then the output-link chain —
      // the walk costs O(patterns actually ending at this position), so
      // total match cost stays O(|text| + hits)
      var o = if (a.ownId(state) >= 0) state else a.outLink(state)
      while (o >= 0) {
        hits += 1
        if (seen == null) seen = new java.util.BitSet()
        seen.set(a.ownId(o))
        o = a.outLink(o)
      }
      i += 1
    }
    val distinct = if (seen == null) 0 else seen.cardinality()
    // saturate: a pathological doc (every position ending many
    // patterns) could push total hits past 2^31 and corrupt the
    // distinct half of the packed long
    val h = math.min(hits, Int.MaxValue.toLong)
    (h << 32) | distinct.toLong
  }

  case class AcMatchExpr(child: Expression, bcast: Broadcast[Automaton])
      extends UnaryExpression {
    override def dataType: DataType = LongType
    override def nullable: Boolean = child.nullable
    override def prettyName: String = "ac_match"
    override def nullSafeEval(input: Any): Any =
      matchDoc(input.asInstanceOf[UTF8String], bcast)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val ref = ctx.addReferenceObj("acAutomaton", bcast,
        classOf[Broadcast[Automaton]].getName)
      nullSafeCodeGen(ctx, ev, input =>
        s"${ev.value} = graft.textops.PhraseAutomaton.matchDoc($input, $ref);")
    }
    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Column API: broadcast once per call; the automaton is
    * caller-owned ([[NgramLm.lm_score]]'s contract).
    */
  def ac_match(spark: SparkSession, text: Column, automaton: Automaton): Column = {
    val bcast = spark.sparkContext.broadcast(automaton)
    GraftInterop.column(AcMatchExpr(GraftInterop.expression(text), bcast))
  }

  /** Total pattern occurrences from a packed [[ac_match]] value. */
  def ac_hits(packed: Column): Column =
    org.apache.spark.sql.functions.shiftrightunsigned(packed, 32)

  /** Distinct patterns matched from a packed [[ac_match]] value. */
  def ac_distinct(packed: Column): Column =
    packed.bitwiseAND(0xFFFFFFFFL)
}
