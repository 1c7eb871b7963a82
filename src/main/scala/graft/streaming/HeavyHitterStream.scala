package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}

/** Streaming heavy hitters in BOUNDED state: a distributed Misra-Gries
  * summary (the deterministic counter-based sketch; Misra & Gries 1982,
  * merge rule from Agarwal et al., "Mergeable Summaries", PODS 2012).
  *
  * The continuous views (`StreamingViews`) keep one counter per
  * DISTINCT key — exact, but state grows with key cardinality. This is
  * the complementary operator for the unbounded-key regime (top talkers
  * over raw IPs, hot URLs in a crawl): state is P summaries × k
  * counters, CONSTANT in both stream length and key cardinality, and
  * the sketch still guarantees every key with frequency > n/(k+1) per
  * shard is present with bounded undercount.
  *
  * Sharding: keys route to one of P shards by xxhash64 — every
  * occurrence of a key lands in the SAME shard's summary, so per-key
  * guarantees are shard-local and never need cross-summary merging:
  * for shard p with n_p processed rows and d_p total decrement,
  *   est(key) ∈ [count_p(key) − d_p, count_p(key)], and
  *   d_p ≤ n_p/(k+1)  (each decrement round removes ≥ (k+1)·t mass),
  * so any key with count_p(key) > n_p/(k+1) is guaranteed present.
  * (With P shards and hash routing, n_p ≈ n/P — sharding TIGHTENS the
  * bound for skew spread across shards while scaling the operator out.)
  *
  * Merge rule per micro-batch (the PODS'12 mergeable form, not the
  * one-at-a-time textbook loop): census the batch's keys locally, add
  * into the summary, and if more than k counters remain, subtract the
  * (k+1)-th largest count from ALL and drop the non-positives. One
  * sorted pass per (shard, batch) regardless of batch size.
  *
  * Each trigger emits the shard's full current summary (snapshot
  * semantics, ≤ k rows per shard per batch) tagged with (n, dec) so a
  * reader can pick the latest snapshot per shard by max n — and so the
  * error bound travels WITH the estimate, the honest sketch contract.
  */
object HeavyHitterStream {
  case class Obs(pid: Int, key: Long)
  case class Summary(counts: Map[Long, Long], n: Long, dec: Long)
  case class HH(pid: Int, key: Long, est: Long, dec: Long, n: Long)

  val DefaultShards = 8

  /** Route a key column to shards. Works on batch and streaming
    * relations (pure map — no repartition; the groupByKey in
    * [[heavyHitters]] does the state-store routing).
    *
    * `key` is the xxhash64 of the column — NOT its raw value — so the
    * operator takes any key type (raw IPs, URLs, ids); a raw cast
    * would null every non-numeric key. Counting by 64-bit hash is
    * standard sketch practice (collision odds are negligible next to
    * the sketch's own error); map hashes back to exemplars with a
    * tiny (key_hash → key) dim join if display values are needed. */
  def observations(events: DataFrame, keyCol: String,
                   shards: Int = DefaultShards): Dataset[Obs] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.select(
      pmod(xxhash64(col(keyCol)), lit(shards)).cast("int").as("pid"),
      xxhash64(col(keyCol)).as("key")).as[Obs]
  }

  /** One pure merge step: fold a batch census into a summary
    * (mergeable-summaries reduction — subtract the (k+1)-th largest
    * count, drop non-positives). Shared by the streaming operator and
    * the property spec, so the tested kernel IS the deployed one. */
  def mergeStep(prev: Summary, census: Iterator[Long], k: Int): Summary = {
    val batch = scala.collection.mutable.LongMap.empty[Long]
    var added = 0L
    census.foreach { key =>
      batch.update(key, batch.getOrElse(key, 0L) + 1L); added += 1L }
    val merged = scala.collection.mutable.LongMap.empty[Long]
    prev.counts.foreach { case (key, c) => merged.update(key, c) }
    batch.foreach { case (key, c) =>
      merged.update(key, merged.getOrElse(key, 0L) + c) }
    var dec = prev.dec
    val reduced =
      if (merged.size > k) {
        val t = merged.values.toArray.sorted(Ordering.Long.reverse).apply(k)
        dec += t
        val r = scala.collection.mutable.LongMap.empty[Long]
        merged.foreach { case (key, c) => if (c > t) r.update(key, c - t) }
        r
      } else merged
    Summary(reduced.toMap, prev.n + added, dec)
  }

  /** Misra-Gries summaries over an observation stream. `k` counters
    * per shard; state and output are both ≤ k entries per shard. */
  def heavyHitters(obs: Dataset[Obs], k: Int)
                  (implicit spark: SparkSession): Dataset[HH] = {
    import spark.implicits._
    require(k > 0, s"counter budget must be positive, got $k")
    obs
      .groupByKey(_.pid)
      .flatMapGroupsWithState[Summary, HH](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (pid, it, state) =>
          val prev = state.getOption.getOrElse(Summary(Map.empty, 0L, 0L))
          val next = mergeStep(prev, it.map(_.key), k)
          state.update(next)
          next.counts.iterator.map { case (key, c) =>
            HH(pid, key, c, next.dec, next.n)
          }
      }
  }

  /** Latest snapshot per shard from an append-mode emission log:
    * n is monotone per shard, so max-n rows are the current summary. */
  def latest(emitted: DataFrame): DataFrame = {
    val latestN = emitted.groupBy(col("pid").as("lp")).agg(max("n").as("mx"))
    emitted.join(broadcast(latestN),
        col("pid") === col("lp") && col("n") === col("mx"))
      .select("pid", "key", "est", "dec", "n")
  }
}
