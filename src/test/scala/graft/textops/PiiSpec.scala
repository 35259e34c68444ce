package graft.textops

import org.apache.spark.sql.functions._

import graft.GraftSparkSpec

class PiiSpec extends GraftSparkSpec {
  import spark.implicits._

  private val docs = Seq(
    (1L, "reach me at jo.doe+spam@mail.example.org thanks"),
    (2L, "server 192.168.0.17 and 10.0.0.1 rebooted"),
    (3L, "ssn 123-45-6789 on file"),
    (4L, "nothing sensitive here"),
    (5L, "mixed a@b.co at 8.8.8.8 ssn 000-11-2222 end"),
    // adversarial shapes that must NOT match
    (6L, "version 1.2 and 1.2.3 and phone 123-456-7890")).toDF("doc_id", "text")

  test("counts per class") {
    val got = Pii.withPiiStats(docs, "text")
      .select("doc_id", "n_emails", "n_ipv4", "n_ssn")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3)))).toMap
    assert(got(1L) == (1, 0, 0))
    assert(got(2L) == (0, 2, 0))
    assert(got(3L) == (0, 0, 1))
    assert(got(4L) == (0, 0, 0))
    assert(got(5L) == (1, 1, 1))
    // 1.2 / 1.2.3 are not dotted quads; 123-456-7890 is not 3-2-4
    assert(got(6L) == (0, 0, 0))
  }

  test("redaction replaces every occurrence with typed tags") {
    val got = Pii.withPiiStats(docs, "text")
      .select("doc_id", "redacted")
      .collect().map(r => (r.getLong(0), r.getString(1))).toMap
    assert(got(1L) == "reach me at <EMAIL> thanks")
    assert(got(2L) == "server <IP> and <IP> rebooted")
    assert(got(3L) == "ssn <SSN> on file")
    assert(got(4L) == "nothing sensitive here")
    assert(got(5L) == "mixed <EMAIL> at <IP> ssn <SSN> end")
    assert(got(6L) == "version 1.2 and 1.2.3 and phone 123-456-7890")
  }
}
