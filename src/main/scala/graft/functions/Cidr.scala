package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** F9/C12 — CIDR membership (SURVEY §2.2 F9, §2.9).
  *
  * Reference semantics (dataframe.py:345-354,377-385; risk.py:149-168,
  * 189-194): an IP string is a member iff it parses as IPv4/IPv6 and
  * falls inside ANY of the configured networks; malformed IPs are a
  * no-match, never an error; invalid networks in rules are skipped with a
  * warning.
  *
  * Implementation: networks are parsed once on the driver into
  * (BigInt network, prefixLen, isV6) triples; matching is a tiny Scala
  * UDF over a hand-rolled, DNS-free address parser (never
  * `InetAddress.getByName`, which can trigger resolver lookups on
  * non-literal input). For IPv4-only network lists a pure-Column
  * arithmetic path (`ipv4Match`) keeps the predicate inside codegen.
  */
object Cidr {

  final case class Network(net: BigInt, prefix: Int, v6: Boolean)

  /** Parse "a.b.c.d" -> 32-bit value, or null. No DNS, strict dotted quad. */
  def parseV4(s: String): Option[Long] = {
    val parts = s.split("\\.", -1)
    if (parts.length != 4) return None
    var acc = 0L
    var i = 0
    while (i < 4) {
      val p = parts(i)
      if (p.isEmpty || p.length > 3 || !p.forall(_.isDigit)) return None
      // ipaddress rejects leading zeros in v4 (Python >=3.9.5)
      if (p.length > 1 && p.charAt(0) == '0') return None
      val v = p.toInt
      if (v > 255) return None
      acc = (acc << 8) | v
      i += 1
    }
    Some(acc)
  }

  /** Parse an IPv6 literal -> 128-bit value, or None. Handles `::`,
    * embedded dotted-quad tails, rejects zone ids / malformed input.
    */
  def parseV6(s: String): Option[BigInt] = {
    if (s.isEmpty || s.contains('%')) return None
    val dcolon = s.indexOf("::")
    if (dcolon >= 0 && s.indexOf("::", dcolon + 1) >= 0) return None

    def parseGroups(part: String, allowV4Tail: Boolean): Option[Seq[Int]] = {
      if (part.isEmpty) return Some(Seq.empty)
      val gs = part.split(":", -1)
      val out = Seq.newBuilder[Int]
      for ((g, idx) <- gs.zipWithIndex) {
        if (g.isEmpty) return None
        else if (g.contains('.')) {
          if (!allowV4Tail || idx != gs.length - 1) return None
          parseV4(g) match {
            case Some(v4) => out += ((v4 >> 16) & 0xffff).toInt += (v4 & 0xffff).toInt
            case None => return None
          }
        } else {
          if (g.length > 4 || !g.forall(c => Character.digit(c, 16) >= 0)) return None
          out += Integer.parseInt(g, 16)
        }
      }
      Some(out.result())
    }

    val groups: Option[Seq[Int]] =
      if (dcolon >= 0) {
        val (l, r) = (s.substring(0, dcolon), s.substring(dcolon + 2))
        for {
          left <- parseGroups(l, allowV4Tail = false)
          right <- parseGroups(r, allowV4Tail = true)
          if left.length + right.length <= 7
        } yield left ++ Seq.fill(8 - left.length - right.length)(0) ++ right
      } else parseGroups(s, allowV4Tail = true).filter(_.length == 8)

    groups.map(_.foldLeft(BigInt(0))((acc, g) => (acc << 16) | g))
  }

  /** Parse one CIDR (or bare address) into a Network; `strict=False`
    * reference behavior — host bits are masked off.
    */
  def parseNetwork(cidr: String): Option[Network] = {
    val (addr, preStr) = cidr.indexOf('/') match {
      case -1 => (cidr, None)
      case i  => (cidr.substring(0, i), Some(cidr.substring(i + 1)))
    }
    def prefixOf(max: Int): Option[Int] = preStr match {
      case None => Some(max)
      case Some(p) if p.nonEmpty && p.forall(_.isDigit) && p.toInt <= max => Some(p.toInt)
      case _ => None
    }
    parseV4(addr) match {
      case Some(v4) =>
        prefixOf(32).map { p =>
          val mask = if (p == 0) BigInt(0) else (BigInt(1) << 32) - (BigInt(1) << (32 - p))
          Network(BigInt(v4) & mask, p, v6 = false)
        }
      case None =>
        parseV6(addr).flatMap { v6 =>
          prefixOf(128).map { p =>
            val mask = if (p == 0) BigInt(0) else (BigInt(1) << 128) - (BigInt(1) << (128 - p))
            Network(v6 & mask, p, v6 = true)
          }
        }
    }
  }

  /** Parse a network list, silently skipping invalid entries (the
    * reference logs a warning and continues — risk.py:163-165).
    */
  def parseNetworks(cidrs: Seq[String]): Seq[Network] =
    cidrs.flatMap(c => parseNetwork(c.trim))

  def ipInNetworks(ip: String, networks: Seq[Network]): Boolean = {
    if (ip == null) return false
    val v4 = parseV4(ip)
    val v6 = if (v4.isEmpty) parseV6(ip) else None
    if (v4.isEmpty && v6.isEmpty) return false
    networks.exists { n =>
      if (!n.v6) v4.exists { a =>
        val shift = 32 - n.prefix
        if (shift == 32) n.net == 0 else (BigInt(a) >> shift) == (n.net >> shift)
      }
      else v6.exists { a =>
        val shift = 128 - n.prefix
        if (shift == 128) n.net == 0 else (a >> shift) == (n.net >> shift)
      }
    }
  }

  /** UDF predicate: ip column ∈ any of `cidrs` (v4 + v6, malformed-safe). */
  def matches(ip: Column, cidrs: Seq[String]): Column = {
    val networks = parseNetworks(cidrs)
    if (networks.isEmpty) lit(false)
    else {
      val f = udf((s: String) => ipInNetworks(s, networks))
      f(ip)
    }
  }

  /** Pure-Column IPv4-only path: keeps the predicate in codegen when all
    * networks are v4 (the common case for ignore-lists). Malformed or
    * IPv6 addresses fall out as no-match via the regex guard.
    */
  def ipv4Match(ip: Column, cidrs: Seq[String]): Column = {
    val networks = parseNetworks(cidrs).filter(!_.v6)
    if (networks.isEmpty) return lit(false)
    val isV4 = ip.rlike("^(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)(\\.(25[0-5]|2[0-4]\\d|1\\d\\d|[1-9]?\\d)){3}$")
    val aton =
      split(ip, "\\.").getItem(0).cast("long") * 16777216L +
      split(ip, "\\.").getItem(1).cast("long") * 65536L +
      split(ip, "\\.").getItem(2).cast("long") * 256L +
      split(ip, "\\.").getItem(3).cast("long")
    val anyNet = networks.map { n =>
      val shift = 32 - n.prefix
      if (shift == 32) lit(true)
      else (shiftright(aton, shift) === lit((n.net >> shift).toLong))
    }.reduce(_ || _)
    isV4 && anyNet
  }

  /** Dispatcher: all-v4 lists use the codegen path, otherwise the UDF. */
  def inCidrs(ip: Column, cidrs: Seq[String]): Column = {
    val networks = parseNetworks(cidrs)
    if (networks.isEmpty) lit(false)
    else if (networks.forall(!_.v6)) ipv4Match(ip, cidrs)
    else matches(ip, cidrs)
  }
}
