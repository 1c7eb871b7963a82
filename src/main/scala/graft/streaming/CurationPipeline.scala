package graft.streaming

import graft.operators.{AnnIndex, PiiOps, TrainingOps}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** The end-to-end STREAMING curation slice — the LLM-pipeline
  * counterpart of the dashboard's EndToEndSlice: documents arrive as a
  * stream and flow through
  *
  *   PII scrub → content dedup-on-arrival → quality gate
  *     → corpus append + LIVE ANN-index append
  *
  * in ONE pipeline: the scrub and gate are stateless expression stages
  * sharing the batch operators' expression trees verbatim
  * (`PiiOps.redactCol`, `TrainingOps.gopherSignals`), the dedup is the
  * keyed fMGWS registry (same content key + min-id canonicalization as
  * `CorpusDedupStream` — dedup runs over SCRUBBED text, so two docs
  * differing only in their PII are the duplicates they should be), and
  * the sink side writes survivors to the at-rest corpus AND their
  * vectors to the partitioned SRP index via batchId-keyed overwrite
  * dirs (`AnnIndex.writeSrpBatchAt` — replay-idempotent) — new
  * documents are ANN-searchable as soon as their batch commits, no
  * rebuild.
  *
  * Scale notes (100 TB): one stateful exchange (content hash); scrub
  * and gate are map stages; the per-batch sink writes are parallel
  * parquet appends into partition dirs. State = one entry per distinct
  * content ever seen — the RocksDB shape, same argument as
  * CorpusDedupStream.
  */
object CurationPipeline {
  case class CurDoc(doc_id: Long, source: String, lang: String,
                    text: String, n_pii: Long)
  case class CurVerdict(doc_id: Long, source: String, lang: String,
                        text: String, n_pii: Long, is_dup: Boolean)
  case class SeenState(firstDocId: Long)

  /** Stateless scrub stage (batch expression trees; keeps lang). */
  def scrub(docs: DataFrame): DataFrame =
    docs.select(col("doc_id"), col("source"), col("lang"),
      PiiOps.redactCol(col("text")).as("text"),
      when(col("text").isNull, lit(0L))
        .otherwise(coalesce(
          PiiOps.countCols(col("text")).reduce(_ + _), lit(0L))).as("n_pii"))

  /** Scrub → cross-batch content dedup. Emits every doc with its
    * duplicate verdict (audit stream); the gate consumes survivors. */
  def curate(docs: DataFrame)(implicit spark: SparkSession): Dataset[CurVerdict] = {
    import spark.implicits._
    scrub(docs).as[CurDoc]
      .groupByKey(d => CorpusDedupStream.contentKey(d.text))
      .flatMapGroupsWithState[SeenState, CurVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          val batch = it.toSeq.sortBy(_.doc_id)
          val canonical = state.getOption.map(_.firstDocId)
            .getOrElse(batch.head.doc_id)
          if (state.getOption.isEmpty) state.update(SeenState(canonical))
          batch.iterator.map(d =>
            CurVerdict(d.doc_id, d.source, d.lang, d.text, d.n_pii,
              d.doc_id != canonical))
      }
  }

  /** Batch-side keep filter: unique docs passing the Gopher gate
    * (signals joined back so the verdict columns survive). */
  def keepOf(batch: DataFrame): DataFrame =
    batch.filter(!col("is_dup"))
      .join(TrainingOps.gopherSignals(batch).select("doc_id", "keep"), "doc_id")
      .filter(col("keep"))
      .select("doc_id", "source", "lang", "text", "n_pii")

  /** Deterministic stub featurizer (the multimodal decode-stub
    * discipline: real plumbing, fake features) — 64 dims from the
    * content hash, so identical text embeds identically. */
  def embed(text: String): Array[Float] = {
    val seed = java.lang.Long.parseLong(
      CorpusDedupStream.contentKey(text).substring(0, 8), 16)
    Array.tabulate(64)(i =>
      (((seed + i.toLong * 2654435761L) % 4096L) - 2048L).toFloat / 2048f)
  }

  /** foreachBatch sink: append survivors to the corpus and their
    * vectors to the partitioned SRP index. REPLAY-IDEMPOTENT: both
    * writes go to `batch=<id>` directories in overwrite mode, so a
    * crash-recovery re-execution of a micro-batch (state restored,
    * same verdicts re-emitted) overwrites its own output instead of
    * appending duplicates — the standard batchId-keyed foreachBatch
    * commit. (The content registry only defends against re-delivered
    * INPUT docs in later batches, not same-batch replays.) Readers
    * see `batch` as one more partition column; srp_bucket pruning is
    * unaffected (pruning selects directories at any nesting level). */
  def commitBatch(corpusDir: String, indexDir: String)
                 (batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    import spark.implicits._
    val keep = keepOf(batch).localCheckpoint(true)
    keep.write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
    val vecs = keep.select("doc_id", "text").as[(Long, String)]
      .map { case (id, t) => (id, embed(t)) }
      .toDF("vec_id", "embedding")
    AnnIndex.writeSrpBatchAt(indexDir, batchId, vecs)
  }

  /** Wire the full slice as one streaming query. */
  def start(docs: DataFrame, corpusDir: String, indexDir: String,
            checkpoint: String)(implicit spark: SparkSession) =
    curate(docs).toDF()
      .writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch(commitBatch(corpusDir, indexDir) _)
      .start()
}
