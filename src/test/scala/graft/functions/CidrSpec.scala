package graft.functions

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.GraftSparkSpec

/** F9/C12 CIDR semantics (reference dataframe.py:377-385,
  * risk.py:149-168; FIXTURES §3.4 edge matrix).
  */
class CidrSpec extends GraftSparkSpec {
  import spark.implicits._

  test("pure parser: v4/v6/malformed") {
    assert(Cidr.parseV4("198.51.100.7").contains((198L << 24) + (51L << 16) + (100L << 8) + 7))
    assert(Cidr.parseV4("256.1.1.1").isEmpty)
    assert(Cidr.parseV4("01.2.3.4").isEmpty) // leading zero rejected like ipaddress
    assert(Cidr.parseV4("not-an-ip").isEmpty)
    assert(Cidr.parseV6("2001:db8::1").contains((BigInt(0x2001) << 112) | (BigInt(0xdb8) << 96) | 1))
    assert(Cidr.parseV6("::ffff:1.2.3.4").isDefined)
    assert(Cidr.parseV6("2001::db8::1").isEmpty)
    assert(Cidr.parseV6("zz::1").isEmpty)
  }

  test("membership: v4 codegen path, v6 udf path, malformed no-match") {
    val ips = Seq("198.51.100.7", "198.51.101.7", "10.10.10.10",
      "2001:db8::1", "2001:db9::1", "not-an-ip", "").toDF("ip")
    val v4got = ips.select(Cidr.inCidrs(col("ip"), Seq("198.51.100.0/24", "10.10.10.10")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(v4got == Seq(true, false, true, false, false, false, false))
    val v6got = ips.select(Cidr.inCidrs(col("ip"), Seq("2001:db8::/32")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(v6got == Seq(false, false, false, true, false, false, false))
  }

  test("invalid network entries are skipped, not errors (risk.py:163-165)") {
    assert(Cidr.parseNetworks(Seq("bogus/99", "300.1.2.3/8", "192.0.2.0/24")).size == 1)
    val got = Seq("192.0.2.5").toDF("ip")
      .select(Cidr.inCidrs(col("ip"), Seq("bogus", "192.0.2.0/24")))
      .collect().map(_.getBoolean(0)).toSeq
    assert(got == Seq(true))
  }

  test("host bits masked off (strict=False semantics)") {
    assert(Cidr.parseNetwork("192.0.2.77/24").exists(n => n.net == BigInt(0xC0000200L)))
  }
}
