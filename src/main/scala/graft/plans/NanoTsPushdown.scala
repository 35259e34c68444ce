package graft.plans

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.types.{LongType, TimestampType}

/** Restores parquet filter pushdown across the nanos→timestamp
  * conversion.
  *
  * The driver's `events.ts` is TIMESTAMP(NANOS), which Spark reads as a
  * nanos LONG (`spark.sql.legacy.parquet.nanosAsLong=true`); query code
  * converts it with `timestamp_micros(ts DIV 1000)`. A time-range
  * filter then compares the CONVERTED column, which Catalyst cannot
  * invert, so the predicate stays above the scan and every row is read
  * (PLANS.md documented this boundary). This rule rewrites
  *
  *   timestamp_micros(raw DIV 1000)  {>=,>,<=,<,=}  TIMESTAMP literal
  *
  * into a comparison on the RAW nanos column, which the parquet source
  * pushes into row-group min/max skipping.
  *
  * Soundness (`DIV` truncates toward zero, so the naive inversion is
  * wrong around 0 and for negative values — guarded per operator, with
  * m = the literal's micros value and a = the raw nanos):
  *
  *  - a DIV 1000 >= m  ⟺  a >= 1000m          for m >= 1
  *  - a DIV 1000 >  m  ⟺  a >  1000m + 999    for m >= 0
  *  - a DIV 1000 <= m  ⟺  a <= 1000m + 999    for m >= 0
  *  - a DIV 1000 <  m  ⟺  a <  1000m          for m >= 1
  *  - a DIV 1000 =  m  ⟺  1000m <= a <= 1000m+999  for m >= 1
  *
  * (for m >= 1, any negative a truncates to <= 0 on the left and fails
  * the right side too; for the m >= 0 upper-bound forms, negative a
  * satisfies both sides). Literals outside the guard, or whose nanos
  * would overflow Long (year ≳ 2262 — exactly the values a NANOS
  * column cannot hold anyway), are left untouched. Registered via
  * [[GraftExtensions]] (`spark.sql.extensions=graft.plans.GraftExtensions`).
  */
object NanoTsPushdown extends Rule[LogicalPlan] {

  /** Matches timestamp_micros(child DIV 1000) and yields the raw child. */
  private object NanosConv {
    def unapply(e: Expression): Option[Expression] = e match {
      case MicrosToTimestamp(d: IntegralDivide)
          if d.right.foldable && d.left.dataType == LongType &&
            (d.right.eval() match {
              case 1000L => true
              case 1000 => true
              case _ => false
            }) =>
        Some(d.left)
      case _ => None
    }
  }

  /** Timestamp literal's micros value. */
  private object TsLit {
    def unapply(e: Expression): Option[Long] = e match {
      case Literal(m: Long, TimestampType) => Some(m)
      case Cast(Literal(m: Long, TimestampType), TimestampType, _, _) => Some(m)
      case _ => None
    }
  }

  /** m·1000 as nanos, None on overflow. */
  private def nanos(m: Long): Option[Long] =
    if (m <= Long.MaxValue / 1000 && m >= Long.MinValue / 1000) Some(m * 1000L) else None

  /** m·1000 + 999 (the last nano that truncates to m), None on
    * overflow — the upper-bound forms need the extra headroom: for
    * m = Long.MaxValue/1000 (the max-nanos sentinel timestamp
    * 2262-04-11T23:47:16.854775Z) m·1000 fits but m·1000+999 wraps,
    * which would silently flip the predicate.
    */
  private def nanosUp(m: Long): Option[Long] =
    if (m <= (Long.MaxValue - 999L) / 1000 && m >= Long.MinValue / 1000)
      Some(m * 1000L + 999L)
    else None

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // literal on the right
    case GreaterThanOrEqual(NanosConv(a), TsLit(m)) if m >= 1 && nanos(m).isDefined =>
      GreaterThanOrEqual(a, Literal(nanos(m).get, LongType))
    case GreaterThan(NanosConv(a), TsLit(m)) if m >= 0 && nanosUp(m).isDefined =>
      GreaterThan(a, Literal(nanosUp(m).get, LongType))
    case LessThanOrEqual(NanosConv(a), TsLit(m)) if m >= 0 && nanosUp(m).isDefined =>
      LessThanOrEqual(a, Literal(nanosUp(m).get, LongType))
    case LessThan(NanosConv(a), TsLit(m)) if m >= 1 && nanos(m).isDefined =>
      LessThan(a, Literal(nanos(m).get, LongType))
    case EqualTo(NanosConv(a), TsLit(m)) if m >= 1 && nanosUp(m).isDefined =>
      And(GreaterThanOrEqual(a, Literal(nanos(m).get, LongType)),
        LessThanOrEqual(a, Literal(nanosUp(m).get, LongType)))
    // literal on the left (mirrored operators)
    case GreaterThanOrEqual(TsLit(m), NanosConv(a)) if m >= 0 && nanosUp(m).isDefined =>
      GreaterThanOrEqual(Literal(nanosUp(m).get, LongType), a)
    case GreaterThan(TsLit(m), NanosConv(a)) if m >= 1 && nanos(m).isDefined =>
      GreaterThan(Literal(nanos(m).get, LongType), a)
    case LessThanOrEqual(TsLit(m), NanosConv(a)) if m >= 1 && nanos(m).isDefined =>
      LessThanOrEqual(Literal(nanos(m).get, LongType), a)
    case LessThan(TsLit(m), NanosConv(a)) if m >= 0 && nanosUp(m).isDefined =>
      LessThan(Literal(nanosUp(m).get, LongType), a)
    case EqualTo(TsLit(m), NanosConv(a)) if m >= 1 && nanosUp(m).isDefined =>
      And(GreaterThanOrEqual(a, Literal(nanos(m).get, LongType)),
        LessThanOrEqual(a, Literal(nanosUp(m).get, LongType)))
  }
}

/** Session-extensions entry point:
  * `.config("spark.sql.extensions", "graft.plans.GraftExtensions")`.
  *
  * Besides the optimizer rule, registers graft's scalar surface as
  * SQL functions, so plain `spark.sql` users get the engine's
  * codegen'd expressions without touching the Scala API:
  *
  * {{{
  *   SELECT graft_uri_risk(request_uri), graft_method_risk(method)
  *   SELECT graft_unquote(uri).uri, graft_canon_url(url)
  *   SELECT graft_ntokens(text), graft_quality(text)
  *   SELECT graft_minhash(split(text, ' '), 64)   -- shingles in, sig out
  *   SELECT graft_regexp_groups(line, '(\\d+)')
  *   SELECT graft_cidr_match(ip, '10.0.0.0/8,192.168.0.0/16')
  * }}}
  *
  * Defaults mirror the reference's config (sensitive paths/extension
  * patterns/webshell names — `config.py` via GraftConfig); literal
  * arguments (k, patterns, CIDR lists) must be foldable strings/ints,
  * enforced with a clear error.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit[A](e: Expression, what: String, f: PartialFunction[Any, A]): A =
    e match {
      case l: Literal if l.foldable && f.isDefinedAt(l.value) => f(l.value)
      case other => throw new IllegalArgumentException(
        s"graft SQL function: $what must be a literal, got $other")
    }

  private def litInt(e: Expression, what: String): Int =
    lit(e, what, { case i: Int => i })

  private def litStr(e: Expression, what: String): String =
    lit(e, what, {
      case s: org.apache.spark.unsafe.types.UTF8String => s.toString
      case s: String => s
    })

  private def col(e: Expression) = org.apache.spark.sql.GraftInterop.column(e)
  private def expr(c: org.apache.spark.sql.Column) =
    org.apache.spark.sql.GraftInterop.catalystExpression(c)

  private def fn(name: String)(build: Seq[Expression] => Expression) = (
    org.apache.spark.sql.catalyst.FunctionIdentifier(name),
    new org.apache.spark.sql.catalyst.expressions.ExpressionInfo("graft", name),
    build)

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => NanoTsPushdown)
    // deletion-vector read compensation for DV-carrying catalog tables
    // (graft.sql.TableLogDvReadRewrite): replaces their v2 scan with
    // the DV-applied read plan; tables without live DVs never match
    ext.injectOptimizerRule(_ => graft.sql.TableLogDvReadRewrite)
    // UPDATE tablelog.`path` SET ... WHERE ... — replace the resolved
    // UpdateTable with a runnable command before check-analysis
    // refuses it (graft.sql.TableLogUpdateRewrite)
    ext.injectResolutionRule(_ => graft.sql.TableLogUpdateRewrite)
    // MERGE INTO tablelog.`path` USING src ON t.k = s.k WHEN MATCHED
    // THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *
    ext.injectResolutionRule(_ => graft.sql.TableLogMergeRewrite)

    ext.injectFunction(fn("graft_uri_risk") { args =>
      expr(graft.functions.RiskFeatures.uriRisk(col(args.head),
        graft.rules.GraftConfig.defaultSensitivePaths,
        graft.rules.GraftConfig.extPatterns(
          graft.rules.GraftConfig.defaultSensitiveExtensions),
        graft.SparkEntry.oracleShells))
    })
    ext.injectFunction(fn("graft_method_risk") { args =>
      expr(graft.functions.RiskFeatures.methodRisk(col(args.head)))
    })
    ext.injectFunction(fn("graft_status_risk") { args =>
      expr(graft.functions.RiskFeatures.statusRisk(col(args.head)))
    })
    ext.injectFunction(fn("graft_unquote") { args =>
      graft.functions.UriCodec.NestedUnquote(args.head)
    })
    ext.injectFunction(fn("graft_canon_url") { args =>
      expr(graft.functions.UrlCanon.canonicalize_url(col(args.head)))
    })
    ext.injectFunction(fn("graft_ntokens") { args =>
      expr(graft.textops.TextAnalysis.nTokens(col(args.head)))
    })
    ext.injectFunction(fn("graft_quality") { args =>
      expr(graft.textops.TextAnalysis.qualityScore(col(args.head)))
    })
    ext.injectFunction(fn("graft_minhash") { args =>
      graft.textops.MinHashSigExpr(args.head,
        litInt(args(1), "k (number of hashes)"))
    })
    ext.injectFunction(fn("graft_regexp_groups") { args =>
      graft.functions.RegexpGroups(args.head,
        litStr(args(1), "pattern"))
    })
    // the LSH near-dup chain, SQL-composable:
    //   graft_band_keys(graft_minhash_long(graft_shingles(text, 5), 64), 16, 4)
    ext.injectFunction(fn("graft_shingles") { args =>
      graft.textops.TokenShingles.HashedShinglesExpr(args.head,
        litInt(args(1), "n (shingle width)"))
    })
    ext.injectFunction(fn("graft_minhash_long") { args =>
      graft.textops.TokenShingles.MinHashSigLongExpr(args.head,
        litInt(args(1), "k (number of hashes)"))
    })
    ext.injectFunction(fn("graft_band_keys") { args =>
      graft.textops.TokenShingles.BandKeysExpr(args.head,
        litInt(args(1), "bands"), litInt(args(2), "rows per band"))
    })
    ext.injectFunction(fn("graft_cidr_match") { args =>
      expr(graft.functions.Cidr.matches(col(args.head),
        litStr(args(1), "cidr list").split(",").map(_.trim)
          .filter(_.nonEmpty).toSeq))
    })
  }
}
