package graft.streaming

import graft.operators.DedupOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming novelty-on-arrival: the continuous twin of the batch
  * `gram_novelty` operator. Every incoming document's distinct 3-gram
  * hashes are verdict-stamped novel/seen against the full gram history
  * of the stream — the live corpus redundancy curve ("are new crawl
  * deliveries still contributing novel text?") without re-running the
  * batch census over the whole corpus per delivery.
  *
  * Keyed BY GRAM HASH (the same xxhash64 longs the batch side and the
  * jaccard family ride): state is one entry per distinct gram ever
  * seen, exactly the at-scale shape the RocksDB state-store provider
  * exists for (off-heap, incremental checkpoints, hash-sharded across
  * executors) — same never-expire argument as CorpusDedupStream's
  * content registry, one (8-byte key, long) entry per distinct gram.
  *
  * Parity contract (spec-proven): when arrival order respects doc_id
  * order ACROSS micro-batches (within a batch order is free — ties
  * resolve to the min doc_id, matching the batch census' min(doc_id)),
  * the per-doc novelty rollup equals the batch operator's output for
  * ANY batch split. The reference's ordered ingest (ST1) provides
  * exactly that ordering.
  */
object NoveltyStream {
  case class GramObs(doc_id: Long, gh: Long)
  case class GramVerdict(doc_id: Long, gh: Long, novel: Boolean)
  case class GramSeen(firstDocId: Long)

  /** Distinct gram-hash observations for a (doc_id, text) relation —
    * shared shingling with the batch side, no repartition (streaming
    * micro-batches arrive pre-partitioned). */
  def gramObs(docs: DataFrame): DataFrame =
    DedupOps.docShingleArraysNoRepartition(docs)
      .select(col("doc_id"), explode(col("ghs")).as("gh"))

  /** Per-gram verdicts: novel iff this gram hash was never seen in any
    * earlier batch, and (within the first batch that carries it) the
    * doc is the min-doc_id carrier. */
  def novelty(grams: Dataset[GramObs])(implicit spark: SparkSession): Dataset[GramVerdict] = {
    import spark.implicits._
    grams
      .groupByKey(_.gh)
      .flatMapGroupsWithState[GramSeen, GramVerdict](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (gh, it, state) =>
          val batch = it.toArray.sortBy(_.doc_id)
          state.getOption match {
            case Some(_) =>
              batch.iterator.map(g => GramVerdict(g.doc_id, gh, novel = false))
            case None =>
              state.update(GramSeen(batch.head.doc_id))
              batch.iterator.zipWithIndex.map { case (g, i) =>
                GramVerdict(g.doc_id, gh, novel = i == 0)
              }
          }
      }
  }

  /** Per-doc rollup of a batch of verdicts (use inside foreachBatch or
    * over a collected verdict relation): matches the batch operator's
    * output schema. */
  def rollup(verdicts: DataFrame): DataFrame =
    verdicts.groupBy("doc_id")
      .agg(count(lit(1)).as("n_grams"),
        sum(when(col("novel"), 1L).otherwise(0L)).as("n_novel"))
      .withColumn("novelty_ppm", expr("n_novel * 1000000 div n_grams"))
      .orderBy("doc_id")
}
