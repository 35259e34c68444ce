package graft.rules

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.yaml.snakeyaml.Yaml

import graft.functions.Cidr

/** The Sigma-style rule engine (reference `balatro`, risk.py:86-187).
  *
  * Rules are parsed on the driver into a tiny AST and compiled into
  * Catalyst `Column` predicates; application is a fold of `when` chains
  * (pure expressions, whole-stage codegen, no UDAF):
  * highest-score-rule-wins, first rule wins ties, and both `risk_score`
  * and `rule_applied` update together (risk.py:175-183).
  */
object RuleEngine {

  /** One `field|op: value` selection conjunct. */
  final case class Condition(field: String, op: String, value: Any)

  final case class SigmaRule(title: String, score: Double, conditions: Seq[Condition])

  /** Fields a bare (no-op) selection may target (risk.py:171). */
  private val bareFields = Set("status", "method", "user_agent")

  // ---- YAML parsing --------------------------------------------------------

  /** Parse a rules.yaml-shaped document (list of rules with
    * detection.selection + tags[0].risk_score).
    *
    * Divergence note: the reference unpacks `field.split('|')` into
    * exactly two names (risk.py:110), so a `field|contains|all` key —
    * which its own operator table supports at risk.py:139 — would crash
    * with ValueError before reaching that branch. We split on the FIRST
    * '|' so `contains|all` works as documented.
    */
  def parseRules(yamlText: String): Seq[SigmaRule] = {
    val yaml = new Yaml()
    val root = yaml.load[java.util.List[java.util.Map[String, AnyRef]]](yamlText)
    if (root == null) return Seq.empty
    root.asScala.toSeq.map { r =>
      val title = Option(r.get("title")).map(_.toString).getOrElse("")
      val tags = r.get("tags").asInstanceOf[java.util.List[java.util.Map[String, AnyRef]]]
      val score = tags.asScala.head.get("risk_score").toString.toDouble
      val detection = r.get("detection").asInstanceOf[java.util.Map[String, AnyRef]]
      val selection = detection.get("selection").asInstanceOf[java.util.Map[String, AnyRef]]
      val conds = selection.asScala.toSeq.map { case (field, value) =>
        val i = field.indexOf('|')
        if (i < 0) Condition(field, "", toScala(value))
        else Condition(field.substring(0, i), field.substring(i + 1), toScala(value))
      }
      SigmaRule(title, score, conds)
    }
  }

  def loadRules(path: String): Seq[SigmaRule] =
    parseRules(new String(Files.readAllBytes(Paths.get(path)), "UTF-8"))

  private def toScala(v: AnyRef): Any = v match {
    case l: java.util.List[_] => l.asScala.toList.map {
      case x: AnyRef => toScala(x)
      case x => x
    }
    case other => other
  }

  // ---- compilation ---------------------------------------------------------

  /** Compile one condition to a boolean Column (op table risk.py:113-173).
    *
    * Case-sensitivity matches pandas: `contains` and `regex` are
    * case-INsensitive regex searches; `startswith`/`endswith` are
    * case-sensitive literals.
    */
  def compileCondition(c: Condition): Column = {
    val fieldCol = col(c.field)
    def values: Seq[Any] = c.value match {
      case l: List[_] => l
      case v => Seq(v)
    }
    c.op match {
      case "gte" => fieldCol >= c.value.toString.toDouble
      case "gt"  => fieldCol > c.value.toString.toDouble
      case "lte" => fieldCol <= c.value.toString.toDouble
      case "lt"  => fieldCol < c.value.toString.toDouble
      case "eq"  => fieldCol === c.value.toString.toDouble
      case "ne"  => fieldCol =!= c.value.toString.toDouble
      case "contains" =>
        // pandas str.contains(case=False) defaults to regex=True
        fieldCol.rlike("(?i)" + c.value.toString)
      case "startswith" => fieldCol.startsWith(c.value.toString)
      case "endswith"   => fieldCol.endsWith(c.value.toString)
      case "regex"      => fieldCol.rlike("(?i)" + c.value.toString)
      case "contains|all" =>
        c.value match {
          case l: List[_] =>
            l.map(v => fieldCol.rlike("(?i)" + v.toString)).reduce(_ && _)
          case other =>
            throw new IllegalArgumentException(
              s"Condition for ${c.field}|contains|all must be a list: $other")
        }
      case "in"    => fieldCol.isin(values: _*)
      case "notin" => !fieldCol.isin(values: _*)
      case "cidr"  => Cidr.inCidrs(fieldCol, values.map(_.toString))
      case "" if bareFields.contains(c.field) => fieldCol.isin(values: _*)
      case "" =>
        // bare fields outside {status, method, user_agent} are silently
        // ignored by the reference's elif (risk.py:171) -> always true
        lit(true)
      case other =>
        throw new IllegalArgumentException(s"Unsupported sigma operator: $other")
    }
  }

  def compileRule(r: SigmaRule): Column =
    r.conditions.map(compileCondition).reduceOption(_ && _).getOrElse(lit(true))

  /** Apply the rule fold. Input needs the fields rules reference
    * (rules.yaml:7-9): ip, method, status, request_uri, referrer,
    * user_agent, request_count, resp_size, uri_risk, status_risk,
    * method_risk. Adds/overwrites `risk_score` (double) and
    * `rule_applied` (string).
    */
  def apply(df: DataFrame, rules: Seq[SigmaRule]): DataFrame = {
    // The reference's sequential fold ("apply rule where its score beats
    // the current one", risk.py:175-183) is order-free in its outcome:
    // the winning rule is simply the matching rule with the highest
    // score, earliest-in-file on ties, and rules with score <= 0 can
    // never beat the 0.0 initial value. So we statically sort by
    // (score desc, index asc) and emit ONE flat CASE WHEN chain per
    // output column. This matters beyond elegance: the naive iterative
    // withColumn fold nests each rule's CASE inside the next after
    // projection collapse — exponential expression growth that blows
    // Janino's 64 KB method limit at ~8 rules.
    val ordered = rules.zipWithIndex
      .filter(_._1.score > 0)
      .sortBy { case (r, i) => (-r.score, i) }
      .map(_._1)
    val masks = ordered.map(r => compileRule(r))
    val score = masks.zip(ordered).foldLeft(when(lit(false), 0.0)) {
      case (acc, (m, r)) => acc.when(m, r.score)
    }.otherwise(0.0)
    val title = masks.zip(ordered).foldLeft(when(lit(false), "")) {
      case (acc, (m, r)) => acc.when(m, r.title)
    }.otherwise("")
    df.withColumn("risk_score", score)
      .withColumn("rule_applied", title)
  }
}
