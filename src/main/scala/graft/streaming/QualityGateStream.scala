package graft.streaming

import graft.operators.TrainingOps
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming quality gate: Gopher-signal keep/drop verdicts stamped on
  * documents AS THEY ARRIVE — the continuous twin of the batch
  * `doc_gopher_signals` query, sharing its expression tree verbatim
  * (via [[TrainingOps.gopherSignals]]) so batch and stream cannot
  * disagree on a verdict.
  *
  * Deliberately STATELESS: quality scoring is per-document, so the
  * streaming plan is a pure map over each micro-batch — no state
  * store, no watermark, no shuffle. At 100 TB/day ingest this is the
  * filter that runs at wire speed in front of the stateful stages
  * (dedup-on-arrival, sessionization), and it scales by adding
  * executors, nothing else.
  *
  * `route` partitions the stream for a dual-sink `foreachBatch` (keep →
  * training shards, drop → quarantine with the violated-signal reason),
  * mirroring the reference's conditional-routing export shape
  * (db/procedures/events/NewEvent.java:70-90's session gate → export
  * table routing).
  */
object QualityGateStream {

  /** Works on a streaming OR batch relation with (doc_id, lang, text):
    * signals + verdict + routing reason. */
  def gate(docs: DataFrame): DataFrame =
    TrainingOps.gopherSignals(docs)
      .withColumn("reason",
        when(col("keep"), lit("ok"))
          .when(col("n_words") < 40, lit("too_short"))
          .when(!col("mean_wlen_ppm").between(3000000L, 8000000L), lit("word_shape"))
          .otherwise(lit("low_stopword")))

  /** Sink-side split of a gated micro-batch. */
  def route(gated: DataFrame): (DataFrame, DataFrame) =
    (gated.filter(col("keep")), gated.filter(!col("keep")))
}
