package graft.rules

import java.nio.file.{Files, Paths}

import scala.jdk.CollectionConverters._

import org.yaml.snakeyaml.Yaml

/** Config plane (reference config.py:6-48, config.yaml).
  *
  * Small driver-side structs, broadcast implicitly via Column literals /
  * closure capture — never part of the data plane.
  */
final case class ToolSignature(
    tool: String,
    name: String,
    description: String,
    keywords: Seq[String],
    timeWindowSeconds: Long)

final case class GraftConfig(
    rulesPath: String,
    webshellPath: String,
    ignoreExtensions: Seq[String],
    ignoreIp: Seq[String],
    sensitivePaths: Seq[String],
    riskyExtensionPatterns: Seq[String],
    toolSignatures: Seq[ToolSignature],
    emailSender: String = "",
    emailSmtpServer: String = "",
    emailSmtpPort: Int = 25,
    emailBody: String = "")

object GraftConfig {

  /** Defaults mirroring the shipped config.yaml (config.yaml:14-52). */
  val defaultIgnoreExtensions: Seq[String] = Seq(
    ".js", ".gif", ".css", ".woff", ".woff2", ".ttf", ".svg", ".ico",
    ".map", ".eot", ".jpg", ".jpeg", ".png", ".bmp", ".webp")
  val defaultSensitivePaths: Seq[String] =
    Seq("/admin", "/login", "/config", "/setup", "/upload")
  val defaultSensitiveExtensions: Seq[String] = Seq(".exe", ".sql", ".cgi", ".pl")

  /** Regex fragments `\.{ext}` built like config.py:43-45 (note: the
    * extension text is NOT regex-escaped in the reference either — the
    * '.' inside an extension like '.pl' is a regex wildcard there too;
    * we reproduce that).
    */
  def extPatterns(exts: Seq[String]): Seq[String] =
    exts.map(e => "\\." + e.stripPrefix("."))

  def default: GraftConfig = GraftConfig(
    rulesPath = "rules.yaml",
    webshellPath = "shells.txt",
    ignoreExtensions = defaultIgnoreExtensions,
    ignoreIp = Seq.empty,
    sensitivePaths = defaultSensitivePaths,
    riskyExtensionPatterns = extPatterns(defaultSensitiveExtensions),
    toolSignatures = Seq.empty)

  /** Load a config.yaml-shaped file.
    *
    * NOTE the reference has a copy-paste bug at config.py:19 —
    * `webshell_path` is read from the `rules_path` key, so its webshell
    * list is silently the rules file and the +50 uri_risk increment never
    * fires with default config. We implement the documented intent
    * (config.yaml:9) and pin the divergence in tests.
    */
  def load(path: String): GraftConfig = {
    val yaml = new Yaml()
    val root = yaml.load[java.util.Map[String, AnyRef]](Files.newBufferedReader(Paths.get(path)))
    def str(k: String, d: String): String = Option(root.get(k)).map(_.toString).getOrElse(d)
    def strList(k: String): Seq[String] = Option(root.get(k)) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
      case _ => Seq.empty
    }
    val uriRisk = Option(root.get("uri_risk")) match {
      case Some(m: java.util.Map[_, _]) => m.asScala.toMap.map { case (k, v) => k.toString -> v }
      case _ => Map.empty[String, Any]
    }
    def uriRiskList(k: String): Seq[String] = uriRisk.get(k) match {
      case Some(l: java.util.List[_]) => l.asScala.toSeq.map(_.toString)
      case _ => Seq.empty
    }
    val email = Option(root.get("email")) match {
      case Some(m: java.util.Map[_, _]) =>
        m.asScala.map { case (k, v) => k.toString -> v }.toMap
      case _ => Map.empty[String, Any]
    }
    val tools = Option(root.get("tool_signatures")) match {
      case Some(l: java.util.List[_]) =>
        l.asScala.toSeq.collect { case m: java.util.Map[_, _] =>
          val t = m.asScala.map { case (k, v) => k.toString -> v }.toMap
          require(t.contains("keyword") && t.contains("time_window"),
            s"Missing required configuration keys for tool signature: $t")
          ToolSignature(
            tool = t.getOrElse("tool", "").toString,
            name = t.getOrElse("name", "").toString,
            description = t.getOrElse("description", "").toString,
            keywords = t.get("keyword") match {
              case Some(kl: java.util.List[_]) => kl.asScala.toSeq.map(_.toString)
              case _ => Seq.empty
            },
            timeWindowSeconds = t("time_window").toString.toLong)
        }
      case _ => Seq.empty
    }
    GraftConfig(
      rulesPath = str("rules_path", "rules.yaml"),
      webshellPath = str("webshell_path", "shells.txt"),
      ignoreExtensions = strList("ignore_extensions"),
      ignoreIp = strList("ignore_ip"),
      sensitivePaths = uriRiskList("sensitive_paths"),
      riskyExtensionPatterns = extPatterns(uriRiskList("sensitive_extensions")),
      toolSignatures = tools,
      emailSender = email.getOrElse("sender", "").toString,
      emailSmtpServer = email.getOrElse("smtp_server", "").toString,
      emailSmtpPort = email.get("smtp_port").map(_.toString.toInt).getOrElse(25),
      emailBody = email.getOrElse("body", "").toString)
  }

  /** Load a shells.txt-shaped webshell basename corpus
    * (reference risk.py:314-318: strip, skip blank and '#' lines).
    */
  def loadWebshells(path: String): Set[String] =
    Files.readAllLines(Paths.get(path)).asScala.iterator
      .map(_.trim)
      .filter(l => l.nonEmpty && !l.startsWith("#"))
      .toSet
}
