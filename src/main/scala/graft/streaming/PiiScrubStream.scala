package graft.streaming

import graft.operators.PiiOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming PII scrub: documents are redacted AS THEY ARRIVE — the
  * continuous twin of the batch `pii_redact` query, sharing its
  * expression chain verbatim (via [[PiiOps.countCols]] /
  * [[PiiOps.redactCol]]) so batch and stream cannot disagree on a
  * single redacted byte.
  *
  * Deliberately STATELESS, like [[QualityGateStream]]: redaction is
  * per-document, so the streaming plan is a pure map over each
  * micro-batch — no state store, no watermark, no shuffle. In the
  * ingest topology this runs IN FRONT of dedup-on-arrival (content
  * hashes must be computed over scrubbed text, or two docs differing
  * only in a user's email would never collide) and scales by adding
  * executors, nothing else.
  *
  * `route` splits scrubbed docs from untouched ones for a dual-sink
  * `foreachBatch` — scrubbed docs also land in an audit sink with
  * their per-class counts, the privacy-review trail every production
  * pipeline keeps.
  */
object PiiScrubStream {

  /** Works on a streaming OR batch relation with (doc_id, source,
    * text): per-class counts + total + scrubbed text. */
  def scrub(docs: DataFrame): DataFrame = {
    val counts = PiiOps.countCols(col("text"))
    // null text ⇒ a clean passthrough, never a dropped row: pin the
    // TOTAL to 0 explicitly on null text (not just coalesce — under
    // spark.sql.legacy.sizeOfNull the per-class size() yields -1, and
    // a -5 total would match NEITHER route branch)
    val total = when(col("text").isNull, lit(0L))
      .otherwise(coalesce(PiiOps.totalExpr, lit(0L)))
    docs
      .select(Seq(col("doc_id"), col("source"), col("text")) ++ counts: _*)
      .withColumn("n_pii", total)
      .withColumn("text_scrubbed", PiiOps.redactCol(col("text")))
  }

  /** Sink-side split: (clean passthrough, scrubbed-with-audit-trail).
    * In a dual-sink `foreachBatch`, persist the scrubbed batch BEFORE
    * routing — both sinks otherwise re-run the 10-regex chain per row
    * (filters share the one unmaterialized projection). */
  def route(scrubbed: DataFrame): (DataFrame, DataFrame) =
    (scrubbed.filter(col("n_pii") === 0), scrubbed.filter(col("n_pii") > 0))
}
