package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

/** Streaming benchmark decontamination: incoming training documents are
  * probed against a pre-built Bloom sketch of the eval set's 8-token
  * shingle hashes — the continuous twin of the batch
  * `decontaminate_bloom` query, and the shape a 100 TB/day ingest
  * actually uses: the eval set is fixed and tiny, so its sketch is
  * built ONCE (distributed, per-partition merge — see
  * `TrainingOps.decontaminate_bloom`), then rides every micro-batch's
  * plan as a serialized literal, exactly like a broadcast dim.
  *
  * Stateless by design (the sketch is read-only config, not stream
  * state): no state store, no watermark, no shuffle — wire-speed
  * filtering in front of the stateful stages, horizontally scalable by
  * executor count alone. No false negatives (Bloom property): a doc
  * flagged clean truly shares no shingle with the eval set.
  */
object DecontamStream {

  /** Same row-local gram→hash kernel as the batch query. */
  private val gramHashExpr =
    """array_distinct(transform(
      |  transform(sequence(1, size(w) - 7), i -> concat_ws(' ', slice(w, i, 8))),
      |  g -> xxhash64(g)))""".stripMargin

  /** Stamp (n_flagged, contaminated) on a streaming OR batch relation
    * with (doc_id, text), probing `bloom` row-locally. */
  def stamp(docs: DataFrame, bloom: BloomFilter): DataFrame = {
    val s = docs.sparkSession
    val probe: Column => Column = h => graft.functions.BloomFunctions.probe(s, bloom, h)
    docs
      .withColumn("w", split(col("text"), " ", -1))
      .withColumn("n_flagged",
        when(size(col("w")) < 8, 0L)
          .otherwise(size(filter(expr(gramHashExpr), probe)).cast("long")))
      .withColumn("contaminated", col("n_flagged") > 0)
      .drop("w")
  }
}
