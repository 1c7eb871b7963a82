package graft.streaming

import graft.operators.SelectionOps
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming priority-sampling reservoir: the continuous twin of the
  * batch `sample_weighted` operator. Maintains the k smallest
  * (priority_ppm, doc_id) pairs seen so far over an unbounded stream —
  * a weighted-without-replacement sample (Duffield–Lund–Thorup) whose
  * membership is a pure function of the content seen, so any arrival
  * order and any micro-batch split yield the SAME reservoir as the
  * batch operator over the same docs (spec-proven).
  *
  * Scale shape: priorities are computed map-side (row-local md5
  * arithmetic, [[SelectionOps.withPriority]]); each partition then
  * pre-reduces its micro-batch to its own k-best BEFORE the single
  * merge key — the streaming mirror of TakeOrderedAndProject's
  * per-partition heaps + driver merge. The merge group receives at
  * most P·k candidate rows per batch and holds exactly k entries of
  * state (a few KB at k=64, regardless of stream length) — bounded
  * state by construction, no TTL needed.
  */
object WeightedSampleStream {
  case class DocPriority(doc_id: Long, w: Long, priority_ppm: Long)
  case class Reservoir(entries: Seq[DocPriority])

  private def better(a: DocPriority, b: DocPriority): Boolean =
    a.priority_ppm < b.priority_ppm ||
      (a.priority_ppm == b.priority_ppm && a.doc_id < b.doc_id)

  private def mergeTopK(xs: Seq[DocPriority], k: Int): Seq[DocPriority] =
    xs.sortWith(better).take(k)

  /** (doc_id, text, n_chars) stream → per-batch reservoir snapshots
    * (Update mode: one Reservoir row per batch; the latest row IS the
    * current sample). */
  def reservoir(docs: DataFrame, k: Int)(implicit spark: SparkSession): Dataset[Reservoir] = {
    import spark.implicits._
    val pri = SelectionOps.withPriority(docs).as[DocPriority]
    // per-partition pre-top-k: the merge key sees P·k rows, not the batch
    val partials = pri.mapPartitions(it => mergeTopK(it.toSeq, k).iterator)
    partials
      .groupByKey(_ => 0)
      .mapGroupsWithState[Reservoir, Reservoir](GroupStateTimeout.NoTimeout) {
        case (_, it, state) =>
          val merged = mergeTopK(
            state.getOption.map(_.entries).getOrElse(Nil) ++ it.toSeq, k)
          val r = Reservoir(merged)
          state.update(r)
          r
      }
  }
}
