package graft.text

import org.apache.spark.sql.functions._

import graft.SparkTestBase

class PiiSpec extends SparkTestBase {
  import spark.implicits._

  private def redact(s: String): String =
    Seq(s).toDF("t").select(TextOps.redactPii($"t")).as[String].head()

  test("redactPii replaces emails, IPv4s, and phone runs with typed tokens") {
    assert(redact("mail a.b+c@sub.example.org now") == "mail <EMAIL> now")
    assert(redact("host 192.168.0.1 up") == "host <IP> up")
    assert(redact("call 555-0199 today") == "call <PHONE> today")
    assert(redact("x@y.io at 10.0.0.7 tel 123-4567") ==
      "<EMAIL> at <IP> tel <PHONE>")
    // untouched text and near-misses survive: no dot-separated quad,
    // digit runs glued to words, bare at-signs
    assert(redact("v1.2.3 released at noon") == "v1.2.3 released at noon")
    assert(redact("id 1234-5678 ref a@b") == "id 1234-5678 ref a@b")
  }

  test("piiCounts reports per-category matches without double counting") {
    val row = Seq("a@b.co and c@d.org at 10.1.2.3 call 555-1234 or 555-9876")
      .toDF("t")
      .select(TextOps.piiCounts($"t"): _*)
      .as[(Int, Int, Int)].head()
    assert(row == ((2, 1, 2)), row)
    // an email's digit runs must not count as IP/phone once redacted
    val clean = Seq("only u123@host123.net here").toDF("t")
      .select(TextOps.piiCounts($"t"): _*).as[(Int, Int, Int)].head()
    assert(clean == ((1, 0, 0)), clean)
  }
}
