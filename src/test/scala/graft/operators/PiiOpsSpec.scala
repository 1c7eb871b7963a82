package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Real match/redact semantics on crafted inputs (the driver's oracle
  * rows verify the plumbing on the synthetic corpus at zero PII
  * incidence), plus plumbing invariants on the testdata corpus. */
class PiiOpsSpec extends SparkSpec {

  private def crafted = {
    import spark.implicits._
    Seq(
      (1L, "s", "contact alice@example.com or bob.smith+x@corp.co.uk now"),
      (2L, "s", "server 192.168.1.1 and 10.0.0.255 version v1.2.3.4"),
      (3L, "s", "call 555-123-4567 or 555.987.6543 today"),
      (4L, "s", "ssn 123-45-6789 card 4111111111111111 done"),
      (5L, "s", "a perfectly clean document with no identifiers"),
      (6L, "s", "mixed bob@corp.io at 10.0.0.1 dial 800-555-1234"))
      .toDF("doc_id", "source", "text")
  }

  test("detection counts per class on crafted inputs") {
    val sig = PiiOps.piiSignals(crafted).orderBy("doc_id").collect()
      .map(r => r.getLong(0) -> (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6)))
      .toMap
    // (n_email, n_ssn, n_phone, n_ipv4, n_card)
    assert(sig(1L) == ((2L, 0L, 0L, 0L, 0L)))
    // v1.2.3.4: no word boundary inside "v1", so only the two real IPs
    assert(sig(2L) == ((0L, 0L, 0L, 2L, 0L)))
    assert(sig(3L) == ((0L, 0L, 2L, 0L, 0L)))
    // SSN also matches the phone shape's cousin? No: 3-2-4 digits ≠ 3-3-4
    assert(sig(4L) == ((0L, 1L, 0L, 0L, 1L)))
    assert(sig(5L) == ((0L, 0L, 0L, 0L, 0L)))
    assert(sig(6L) == ((1L, 0L, 1L, 1L, 0L)))
  }

  test("redaction rewrites each class with its token, fixed order") {
    val red = crafted
      .select(col("doc_id"), PiiOps.redactCol(col("text")).as("r"))
      .orderBy("doc_id").collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(red(1L) == "contact <EMAIL> or <EMAIL> now")
    assert(red(2L) == "server <IP> and <IP> version v1.2.3.4")
    assert(red(3L) == "call <PHONE> or <PHONE> today")
    assert(red(4L) == "ssn <SSN> card <CARD> done")
    assert(red(5L) == "a perfectly clean document with no identifiers")
    assert(red(6L) == "mixed <EMAIL> at <IP> dial <PHONE>")
  }

  test("email redaction precedes digit classes: no IP/phone relics inside addresses") {
    import spark.implicits._
    val tricky = Seq((1L, "s", "mail 1.2.3.4a@example.com then 5.6.7.8 stop"))
      .toDF("doc_id", "source", "text")
    val r = tricky.select(PiiOps.redactCol(col("text"))).collect()(0).getString(0)
    // the address (containing a dotted digit run) collapses to ONE token;
    // the bare IP after it is still caught.
    assert(r == "mail <EMAIL> then <IP> stop")
  }

  test("corpus plumbing: stats cover every source; zero incidence on word-soup") {
    val stats = PiiOps.queries("pii_stats")(spark, sf).collect()
    val nSources = Tables.documents(spark, sf).select("source").distinct().count()
    assert(stats.length == nSources)
    assert(stats.map(_.getLong(1)).sum == Tables.documents(spark, sf).count())
    // synthetic corpus has no PII → redaction is the identity
    val red = PiiOps.queries("pii_redact")(spark, sf)
    assert(red.filter(col("n_pii") > 0).isEmpty)
    val idMismatch = Tables.documents(spark, sf)
      .select(col("doc_id"), md5(col("text")).as("m"))
      .join(red, "doc_id")
      .filter(col("m") =!= col("redacted_md5"))
    assert(idMismatch.isEmpty)
  }
}
