package graft.streaming

import graft.operators.AnnIndex
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.streaming.StreamingQuery

/** Streaming freshness for an at-rest FLAT SRP index — the loop the
  * reference's model-feedback leg implies (retrain/reload keeps the
  * model fresh; this keeps the RETRIEVAL structure fresh): a stream of
  * newly-embedded vectors lands in the live `srp_bucket=` partition
  * dirs micro-batch by micro-batch, so a probe issued immediately
  * after batch N commits retrieves batch-N vectors — no rebuild, no
  * serving gap.
  *
  * Per-batch commit protocol (exactly-once, crash-replay safe):
  *
  *  1. [[AnnIndex.dropSrpBatchFiles]] — sweep `b<batchId>.parquet`
  *     leftovers of a crashed attempt of THIS batch, so step 2 never
  *     folds uncommitted rows into a compacted file;
  *  2. [[AnnIndex.compactSrpAt]] — buckets at the file-count trigger
  *     (one file per append per touched bucket) collapse to one file,
  *     BEFORE the new append so compaction only ever rewrites
  *     committed data (each bucket swaps via temp dir + atomic rename,
  *     so a concurrent probe lists old fragments or the new file,
  *     never a torn state);
  *  3. [[AnnIndex.appendSrpBatchAt]] — stage the batch's signatures,
  *     move them in under deterministic per-batch names (REPLACE on
  *     replay).
  *
  * Append cadence vs compaction: each append adds ONE file to each
  * touched bucket, so scan-back degrades linearly with appends since
  * the last compaction; the trigger (default
  * [[AnnIndex.CompactTriggerFiles]] = 8) bounds that at 8 files per
  * bucket while amortizing rewrite I/O to ≤ 1/8 of a bucket per
  * append. A deployment ingesting continuously tunes the trigger to
  * its probe-latency budget — lower = fewer files per scan, more
  * rewrite I/O.
  *
  * Scale (100 TB): the append is one shuffle of the BATCH (repartition
  * on bucket), never of the at-rest index; compaction rewrites only
  * triggered buckets. Probe plans are unchanged — pruning selects
  * partition directories, and both maintenance steps preserve the
  * directory set.
  */
object IndexFreshness {

  /** The per-batch commit body (public so a spec can drive crash
    * replays directly). */
  def commitBatch(indexPath: String,
                  compactTrigger: Int = AnnIndex.CompactTriggerFiles)
                 (batch: DataFrame, batchId: Long): Unit = {
    AnnIndex.dropSrpBatchFiles(indexPath, batchId)
    AnnIndex.compactSrpAt(batch.sparkSession, indexPath, compactTrigger)
    AnnIndex.appendSrpBatchAt(indexPath, batchId, batch)
  }

  /** Wire a vector stream (`vec_id`, `embedding: array<float>`) into a
    * live index at `indexPath` (built with [[AnnIndex.buildSrpAt]]). */
  def start(vectors: DataFrame, indexPath: String, checkpoint: String,
            compactTrigger: Int = AnnIndex.CompactTriggerFiles): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(commitBatch(indexPath, compactTrigger) _)
      .start()

  /** The IVFADC analogue — same sweep → compact → stage-and-move
    * protocol over the quantized codes relation, so new vectors are
    * ADC-searchable the moment their batch commits while the coarse
    * centroids and PQ codebook stay frozen (the at-rest append
    * discipline `AnnIndex.appendIvfPq8At` documents). `vectors` must
    * carry (vec_id, v: array<double>) — the PQ builders' input shape. */
  def commitIvfPq8Batch(indexPath: String,
                        compactTrigger: Int = AnnIndex.CompactTriggerFiles)
                       (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    AnnIndex.dropIvfPq8BatchFiles(indexPath, batchId)
    AnnIndex.compactIvfPq8At(spark, indexPath, compactTrigger)
    AnnIndex.appendIvfPq8BatchAt(spark, indexPath, batchId, batch)
  }

  def startIvfPq8(vectors: DataFrame, indexPath: String, checkpoint: String,
                  compactTrigger: Int = AnnIndex.CompactTriggerFiles): StreamingQuery =
    vectors.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(commitIvfPq8Batch(indexPath, compactTrigger) _)
      .start()
}
