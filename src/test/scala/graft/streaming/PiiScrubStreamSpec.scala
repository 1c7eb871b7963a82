package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class ScrubDoc(doc_id: Long, source: String, text: String)

/** The streaming scrub must be a stateless map (plan shape) and
  * produce the batch redaction chain's output exactly (semantics). */
class PiiScrubStreamSpec extends SparkSpec {

  private val docs = Seq(
    ScrubDoc(1, "a", "contact alice@example.com or bob.smith+x@corp.co.uk now"),
    ScrubDoc(2, "a", "server 192.168.1.1 and 10.0.0.255 version v1.2.3.4"),
    ScrubDoc(3, "b", "call 555-123-4567 or 555.987.6543 today"),
    ScrubDoc(4, "b", "ssn 123-45-6789 card 4111111111111111 done"),
    ScrubDoc(5, "c", "a perfectly clean document with no identifiers"))

  test("streamed scrub == batch redaction chain across micro-batch splits") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ScrubDoc]
    val q = PiiScrubStream.scrub(input.toDF()).writeStream
      .outputMode("append").format("memory").queryName("pii_scrub").start()
    try {
      // adversarial split: one doc per micro-batch
      docs.foreach { d => input.addData(d); q.processAllAvailable() }
      val got = spark.table("pii_scrub")
        .select("doc_id", "n_pii", "text_scrubbed")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
      val want = PiiScrubStream.scrub(docs.toDF())
        .select("doc_id", "n_pii", "text_scrubbed")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getString(2))).sortBy(_._1)
      assert(got.toSeq == want.toSeq)
      assert(want.map(_._2).toSeq == Seq(2L, 2L, 2L, 2L, 0L))
      assert(want(3)._3 == "ssn <SSN> card <CARD> done")
    } finally q.stop()
  }

  test("scrub is stateless and shuffle-free; route conserves the stream") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[ScrubDoc]
    val q = PiiScrubStream.scrub(input.toDF()).writeStream
      .outputMode("append").format("memory").queryName("pii_scrub_plan").start()
    try {
      input.addData(docs: _*)
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "PII scrub must not allocate a state store")
    } finally q.stop()
    // + a null-text doc: must route clean, never vanish from both sinks
    val batch = PiiScrubStream.scrub(
      (docs :+ ScrubDoc(6, "c", null)).toDF())
    val plan = batch.queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"scrub plans a shuffle:\n$plan")
    val (clean, dirty) = PiiScrubStream.route(batch)
    assert(clean.count() == 2 && dirty.count() == 4)
    // scrubbed text carries no residual matches: re-scrub is a fixpoint
    val rescrub = PiiScrubStream.scrub(
      dirty.select(col("doc_id"), col("source"), col("text_scrubbed").as("text")))
    assert(rescrub.filter(col("n_pii") > 0).isEmpty,
      "redacted output still matches a PII pattern")
  }
}
