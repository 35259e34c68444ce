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
    // 123-456-7890 is a separated US phone (3-3-4); 1.2 / 1.2.3 stay
    // unmatched by every class
    (6L, "version 1.2 and 1.2.3 and phone 123-456-7890")).toDF("doc_id", "text")

  test("counts per class") {
    val got = Pii.withPiiStats(docs, "text")
      .select("doc_id", "n_emails", "n_ipv4", "n_ssn", "n_phones")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4)))).toMap
    assert(got(1L) == (1, 0, 0, 0))
    assert(got(2L) == (0, 2, 0, 0))
    assert(got(3L) == (0, 0, 1, 0))
    assert(got(4L) == (0, 0, 0, 0))
    assert(got(5L) == (1, 1, 1, 0))
    // 1.2 / 1.2.3 are not dotted quads nor 3-2-4; 123-456-7890 IS a phone
    assert(got(6L) == (0, 0, 0, 1))
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
    assert(got(6L) == "version 1.2 and 1.2.3 and phone <PHONE>")
  }

  test("phone formats: E.164 and separated US forms match, bare digit runs do not") {
    val phones = Seq(
      (1L, "call +15551234567 now"),
      (2L, "call (555) 123-4567 now"),
      (3L, "call 555.123.4567 now"),
      (4L, "call 555-123-4567 now"),
      // REQUIRED separators: a bare 10-digit run is an id, not a phone
      (5L, "order 5551234567 shipped"),
      // inside a longer digit run: no word boundary, no match
      (6L, "id 99555-123-4567 ok"),
      (7L, "+0 not e164, +1234567 too short")).toDF("doc_id", "text")
    val got = phones.select(col("doc_id"),
      Pii.countPhones(col("text")).as("n"),
      Pii.redact(col("text")).as("r"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getString(2)))).toMap
    assert(got(1L) == (1, "call <PHONE> now"))
    assert(got(2L) == (1, "call <PHONE> now"))
    assert(got(3L) == (1, "call <PHONE> now"))
    assert(got(4L) == (1, "call <PHONE> now"))
    assert(got(5L)._1 == 0)
    assert(got(6L)._1 == 0)
    assert(got(7L)._1 == 0)
  }

  test("credit cards: the Luhn checksum, not the shape, decides") {
    val cards = Seq(
      (1L, "pay 4242 4242 4242 4242 thanks"),    // valid (classic test PAN)
      (2L, "pay 4242-4242-4242-4242 thanks"),    // same, dashed
      (3L, "pay 4242424242424242 thanks"),       // same, plain
      (4L, "ref 4242 4242 4242 4243 thanks"),    // shape ok, Luhn fails
      (5L, "pay 4242 4242 4242 4242 and ref 1234 5678 9012 3456 end"),
      (6L, "no card here 123 4567")).toDF("doc_id", "text")
    val got = cards.select(col("doc_id"),
      Pii.countCardCandidates(col("text")).as("cand"),
      Pii.countValidCards(col("text")).as("valid"),
      Pii.redact(col("text")).as("r"))
      .collect().map(r => (r.getLong(0), (r.getInt(1), r.getInt(2), r.getString(3)))).toMap
    assert(got(1L) == (1, 1, "pay <CARD> thanks"))
    assert(got(2L) == (1, 1, "pay <CARD> thanks"))
    assert(got(3L) == (1, 1, "pay <CARD> thanks"))
    // invalid candidate is counted as candidate but NOT redacted
    assert(got(4L) == (1, 0, "ref 4242 4242 4242 4243 thanks"))
    // mixed doc: only the Luhn-valid match is redacted
    assert(got(5L) == (2, 1, "pay <CARD> and ref 1234 5678 9012 3456 end"))
    assert(got(6L) == (0, 0, "no card here 123 4567"))
  }

  test("luhnValid ground truth") {
    assert(Pii.luhnValid("4242424242424242"))
    assert(Pii.luhnValid("4111111111111111"))
    assert(!Pii.luhnValid("4242424242424243"))
    assert(!Pii.luhnValid("1234567890123456"))
  }

  test("null text is null-safe through every column") {
    val df = Seq((1L, null: String)).toDF("doc_id", "text")
    val r = Pii.withPiiStats(df, "text").collect()(0)
    assert(r.isNullAt(r.fieldIndex("n_cards")))
    assert(r.isNullAt(r.fieldIndex("redacted")))
  }
}
