package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming distribution-drift monitor: the continuous twin of the
  * batch `unigram_tv_drift` operator (GovernanceOps). Each closed
  * event-time minute emits ONE row — the exact total-variation
  * distance between that minute's word-unigram distribution and a
  * pinned reference distribution (e.g. the corpus snapshot the current
  * model was trained on). This is the "is today's crawl still shaped
  * like the training mixture?" alarm a continuously-fed pipeline runs
  * in front of its ingest gate.
  *
  * Exactness: the same integer kernel as the batch operator —
  * TV = Σ|c_m·T_q − q·T_m| / (2·T_m·T_q) with the absent-word mass
  * folded in algebraically (see [[tvAgainst]]) — so the one IEEE
  * division is the final step and stream == batch recompute
  * bit-for-bit (spec-proven).
  *
  * Operator design (Spark 4 `transformWithState`):
  *  - a STATELESS `mapPartitions` pre-reduce turns per-occurrence word
  *    rows into (minute, word-hash, count) partials before anything
  *    shuffles — the map-side-combine discipline of the batch
  *    aggregates, without a second stateful operator in the chain;
  *  - keyed by epoch MINUTE; per-key state is a `MapState[Long, Long]`
  *    (word-hash → count) plus a scalar running total — a micro-batch
  *    costs O(hashes touched THIS batch) state point-writes, not a
  *    deserialize+rewrite of the whole accumulated vocabulary (the
  *    ValueState layout this replaced degraded linearly in vocabulary
  *    size per batch: 4.5k obs/s at 10⁵ live hashes; see BENCH_STATE);
  *  - an event-time TIMER at the minute boundary (m+1)·60 s fires once
  *    the watermark passes: the verdict row is emitted and the state
  *    for that minute is CLEARED — state is bounded by
  *    (watermark-lag minutes) × per-minute vocabulary, never by stream
  *    lifetime;
  *  - a boundary-vs-watermark guard in `handleInputRows` drops
  *    arrivals for minutes the timer has already closed, so a closed
  *    minute can never re-open or double-emit;
  *  - words ride as xxhash64 longs (same hashing family as the dedup/
  *    novelty operators): 8-byte shuffle rows, collision-negligible,
  *    and the reference ships as a hash→count map. The reference here
  *    travels in the processor closure (vocab-sized); for a 10⁸-type
  *    vocabulary hand the processor an
  *    `org.apache.spark.broadcast.Broadcast` handle instead — the
  *    kernel is unchanged.
  *
  * Scale (100 TB/day ingest): one shuffle, on the minute key, carrying
  * pre-reduced partials; state-store writes are one merge per distinct
  * hash per batch, not per word occurrence. Key cardinality = minutes
  * in flight for [[monitor]] — which caps parallelism at watermark-lag
  * minutes; [[monitorBySource]] keys by (source, minute) for
  * |sources|× the state keys and per-feed verdicts (spec-proven parity
  * with the per-source batch TV kernel).
  */
object DriftMonitorStream {

  /** Pre-reduced per-batch-partition observation: `n` occurrences of
    * word-hash `wh` in minute `minute_id`. */
  case class WordObs(minute_id: Long, wh: Long, n: Long)

  /** One closed minute's drift verdict. */
  case class DriftVerdict(minute_id: Long, n_words: Long,
                          tv_num: Long, tv_den: Long, tv: Double)

  /** The shared exact kernel: TV numerator/denominator between an
    * observed distribution and the reference,
    * N = Σ_∩ |c·T_q − q·T_m| + Σ_{obs∖ref} c·T_q + Σ_{ref∖obs} q·T_m,
    * with the ref-only mass folded algebraically
    * (Σ_{ref∖obs} q = T_q − Σ_∩ q) so only observed words are
    * iterated. Returns (num, den); tv = num/den, both exact longs. */
  def tvAgainst(obs: Map[Long, Long], obsTotal: Long,
                ref: Map[Long, Long], refTotal: Long): (Long, Long) =
    tvAgainstIter(obs.iterator, obsTotal, ref, refTotal)

  /** Iterator form of the kernel — one pass, nothing materialized; the
    * shape `MapState.iterator()` feeds directly at timer close. */
  def tvAgainstIter(obs: Iterator[(Long, Long)], obsTotal: Long,
                    ref: Map[Long, Long], refTotal: Long): (Long, Long) = {
    // multiplyExact/addExact: c·T products approach 2^63 when
    // count×total nears 9.2e18 — past that the kernel must move to
    // 128-bit (BigInt here, DecimalType(38,0) in the batch twin, which
    // ANSI mode already makes throw rather than wrap). Overflow must
    // FAIL, never produce a plausible wrong TV.
    var num = 0L
    var matchedRef = 0L
    obs.foreach { case (wh, c) =>
      ref.get(wh) match {
        case Some(q) =>
          num = Math.addExact(num, Math.abs(Math.subtractExact(
            Math.multiplyExact(c, refTotal), Math.multiplyExact(q, obsTotal))))
          matchedRef += q
        case None => num = Math.addExact(num, Math.multiplyExact(c, refTotal))
      }
    }
    num = Math.addExact(num, Math.multiplyExact(refTotal - matchedRef, obsTotal))
    (num, Math.multiplyExact(2L, Math.multiplyExact(obsTotal, refTotal)))
  }

  /** Shared state discipline for both monitors: word counts live in a
    * `MapState[Long, Long]` (RocksDB point read-modify-writes per hash
    * touched in the batch), the running total in a `ValueState[Long]`.
    * At timer close the map is streamed once through the kernel and
    * both states are CLEARED.
    *
    * CHECKPOINT COMPATIBILITY (r10 layout change): "counts" was a
    * `ValueState[MinuteCounts]` before the MapState rewrite, and
    * "total" did not exist. A query restarted from a pre-r10
    * checkpoint fails state-schema validation rather than resume —
    * restart such a pipeline from a fresh checkpoint directory (the
    * monitors are windowed aggregators over a replayable source, so a
    * fresh start re-derives state from the current minute onward; no
    * long-lived checkpoints predate the rewrite in any supported
    * deployment of this repo). */
  private[streaming] trait MinuteVocabState {
    protected def handle: StatefulProcessorHandle
    @transient protected var counts: MapState[Long, Long] = _
    @transient protected var total: ValueState[Long] = _

    protected def initVocabState(): Unit = {
      counts = handle.getMapState[Long, Long](
        "counts", Encoders.scalaLong, Encoders.scalaLong, TTLConfig.NONE)
      total = handle.getValueState[Long]("total", Encoders.scalaLong, TTLConfig.NONE)
    }

    /** Merge one batch's pre-reduced partials: the rows iterator holds
      * one partial per (shuffle-source partition × distinct hash), so
      * fold locally first, then do ONE state read-modify-write per
      * distinct hash touched this batch. */
    protected def mergeBatch(rows: Iterator[(Long, Long)]): Unit = {
      val m = scala.collection.mutable.LongMap.empty[Long]
      var add = 0L
      rows.foreach { case (wh, n) =>
        m.update(wh, m.getOrElse(wh, 0L) + n)
        add += n
      }
      m.foreach { case (wh, n) =>
        val prev = if (counts.containsKey(wh)) counts.getValue(wh) else 0L
        counts.updateValue(wh, prev + n)
      }
      total.update((if (total.exists()) total.get() else 0L) + add)
    }

    /** Close the key: stream the vocabulary through the kernel once,
      * clear both states, return (n_words, num, den). */
    protected def closeKey(ref: Map[Long, Long], refTotal: Long): (Long, Long, Long) = {
      val tot = total.get()
      val (num, den) = tvAgainstIter(counts.iterator(), tot, ref, refTotal)
      counts.clear(); total.clear()
      (tot, num, den)
    }

    protected def stateExists: Boolean = total.exists()
    protected def clearAll(): Unit = { counts.clear(); total.clear() }
  }

  class Monitor(ref: Map[Long, Long], refTotal: Long)
    extends StatefulProcessor[Long, WordObs, DriftVerdict] with MinuteVocabState {
    override protected def handle: StatefulProcessorHandle = getHandle

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      initVocabState()

    override def handleInputRows(minute: Long, rows: Iterator[WordObs],
                                 timerValues: TimerValues): Iterator[DriftVerdict] = {
      // a minute whose boundary the watermark already passed has been
      // (or is being) closed by its timer — never re-open it
      if ((minute + 1) * 60000L <= timerValues.getCurrentWatermarkInMs())
        return Iterator.empty
      mergeBatch(rows.map(o => (o.wh, o.n)))
      getHandle.registerTimer((minute + 1) * 60000L)
      Iterator.empty
    }

    override def handleExpiredTimer(minute: Long, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[DriftVerdict] = {
      if (!stateExists) return Iterator.empty
      val (tot, num, den) = closeKey(ref, refTotal)
      Iterator.single(DriftVerdict(minute, tot, num, den,
        num.toDouble / den.toDouble))
    }
  }

  /** Continuous drift monitor over a timestamped text stream.
    * `ref`/`refTotal` pin the reference distribution (same xxhash64
    * word grain — build it with [[referenceOf]] on the training
    * snapshot). */
  def monitor(docs: DataFrame, tsCol: String, textCol: String,
              ref: Map[Long, Long], refTotal: Long)
             (implicit spark: SparkSession): Dataset[DriftVerdict] = {
    import spark.implicits._
    docs
      .select(col(tsCol).as("ts"),
        explode(split(col(textCol), " ", -1)).as("word"))
      .filter(col("word") =!= "")
      .select(col("ts"), xxhash64(col("word")).as("wh"))
      .withWatermark("ts", "10 seconds")
      .as[(java.sql.Timestamp, Long)]
      .mapPartitions { it =>
        // stateless per-partition pre-reduce: one WordObs per distinct
        // (minute, hash) per partition per batch
        val acc = scala.collection.mutable.HashMap.empty[(Long, Long), Long]
        it.foreach { case (ts, wh) =>
          val k = (Math.floorDiv(ts.getTime, 60000L), wh)
          acc.update(k, acc.getOrElse(k, 0L) + 1L)
        }
        acc.iterator.map { case ((minute, wh), n) => WordObs(minute, wh, n) }
      }
      .groupByKey(_.minute_id)
      .transformWithState(new Monitor(ref, refTotal),
        TimeMode.EventTime, OutputMode.Append)
  }

  /** Pre-reduced per-source observation. */
  case class SourceWordObs(source: String, minute_id: Long, wh: Long, n: Long)

  /** One closed (source, minute) drift verdict. */
  case class SourceDriftVerdict(source: String, minute_id: Long, n_words: Long,
                                tv_num: Long, tv_den: Long, tv: Double)

  class SourceMonitor(refs: Map[String, (Map[Long, Long], Long)])
    extends StatefulProcessor[(String, Long), SourceWordObs, SourceDriftVerdict]
    with MinuteVocabState {
    override protected def handle: StatefulProcessorHandle = getHandle

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      initVocabState()

    override def handleInputRows(key: (String, Long), rows: Iterator[SourceWordObs],
                                 timerValues: TimerValues): Iterator[SourceDriftVerdict] = {
      if ((key._2 + 1) * 60000L <= timerValues.getCurrentWatermarkInMs())
        return Iterator.empty
      mergeBatch(rows.map(o => (o.wh, o.n)))
      getHandle.registerTimer((key._2 + 1) * 60000L)
      Iterator.empty
    }

    override def handleExpiredTimer(key: (String, Long), timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[SourceDriftVerdict] = {
      if (!stateExists) return Iterator.empty
      refs.get(key._1) match {
        case Some((ref, refTotal)) =>
          val (tot, num, den) = closeKey(ref, refTotal)
          Iterator.single(SourceDriftVerdict(key._1, key._2, tot, num, den,
            num.toDouble / den.toDouble))
        case None => clearAll(); Iterator.empty // out-of-contract source: no reference pinned
      }
    }
  }

  /** Source-keyed drift monitor: state keyed by (source, minute), so
    * parallelism is |sources| × watermark-lag minutes instead of being
    * capped at watermark-lag minutes — the horizontal-scale variant the
    * minute-only monitor's scaladoc promises. Each source's closed
    * minute is scored against ITS OWN pinned reference in `refs`
    * (sources without a reference emit nothing — pin one per ingest
    * feed). Kernel, timer discipline, and boundary guard are identical
    * to [[monitor]]; the composite key only widens the shuffle key. */
  def monitorBySource(docs: DataFrame, tsCol: String, srcCol: String,
                      textCol: String, refs: Map[String, (Map[Long, Long], Long)])
                     (implicit spark: SparkSession): Dataset[SourceDriftVerdict] = {
    import spark.implicits._
    val hashed = docs
      .select(col(tsCol).as("ts"), col(srcCol).as("source"),
        explode(split(col(textCol), " ", -1)).as("word"))
      .filter(col("word") =!= "")
      .select(col("ts"), col("source"), xxhash64(col("word")).as("wh"))
      .as[(java.sql.Timestamp, String, Long)]
    monitorBySourceHashed(hashed, refs)
  }

  /** Pre-hashed entry: the same operator over an already word-hashed
    * (ts, source, wh) stream — the shape an upstream that hashes once
    * at ingest (or the state bench) feeds directly. */
  def monitorBySourceHashed(hashed: Dataset[(java.sql.Timestamp, String, Long)],
                            refs: Map[String, (Map[Long, Long], Long)])
                           (implicit spark: SparkSession): Dataset[SourceDriftVerdict] = {
    import spark.implicits._
    hashed.toDF("ts", "source", "wh")
      .withWatermark("ts", "10 seconds")
      .as[(java.sql.Timestamp, String, Long)]
      .mapPartitions { it =>
        val acc = scala.collection.mutable.HashMap.empty[(String, Long, Long), Long]
        it.foreach { case (ts, src, wh) =>
          val k = (src, Math.floorDiv(ts.getTime, 60000L), wh)
          acc.update(k, acc.getOrElse(k, 0L) + 1L)
        }
        acc.iterator.map { case ((src, minute, wh), n) =>
          SourceWordObs(src, minute, wh, n) }
      }
      .groupByKey(o => (o.source, o.minute_id))
      .transformWithState(new SourceMonitor(refs),
        TimeMode.EventTime, OutputMode.Append)
  }

  /** Driver-memory ceiling on a reference vocabulary. The intended
    * input is a published training snapshot (vocabulary-sized), but
    * nothing stops a caller pointing these helpers at a raw corpus —
    * without a bound the collect would OOM the driver. A million
    * (hash → count) entries is ~tens of MB; past it the LONG TAIL is
    * truncated (kept: top-`maxVocab` by count, ties by hash), while
    * the reference TOTAL stays the FULL word count — truncated tail
    * words then read as ref-frequency-0, which OVERSTATES drift
    * slightly (the safe direction for a monitor) instead of crashing. */
  val DefaultMaxVocab: Int = 1 << 20

  /** Batch helper: per-source references for [[monitorBySource]] —
    * the collect is Σ per-source vocabulary, bounded at `maxVocab`
    * PER SOURCE (see [[DefaultMaxVocab]]; the rank filter is a
    * per-source window, never a driver-side sort). */
  def referencesBySource(docs: DataFrame, srcCol: String, textCol: String,
                         maxVocab: Int = DefaultMaxVocab): Map[String, (Map[Long, Long], Long)] = {
    // persisted: the totals action and the top-V action are SEPARATE
    // jobs over the same explode+groupBy — without it the full-corpus
    // scan (the case the maxVocab bound exists for) runs twice
    val grouped = docs
      .select(col(srcCol).as("source"),
        explode(split(col(textCol), " ", -1)).as("word"))
      .filter(col("word") =!= "")
      .select(col("source"), xxhash64(col("word")).as("wh"))
      .groupBy("source", "wh").agg(count(lit(1)).as("n"))
      .persist()
    try {
      val totals = grouped.groupBy("source")
        .agg(sum("n").as("t"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("source").orderBy(col("n").desc, col("wh"))
      val rows = grouped
        .withColumn("_rk", row_number().over(w))
        .filter(col("_rk") <= maxVocab)
        .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2)))
      rows.groupBy(_._1).map { case (src, ws) =>
        src -> (ws.map(w => w._2 -> w._3).toMap, totals(src))
      }
    } finally grouped.unpersist()
  }

  /** Batch helper: the reference (hash→count, total) of a corpus —
    * the collect is vocabulary-sized, bounded at `maxVocab` (see
    * [[DefaultMaxVocab]]; the top-V cut is a `TakeOrderedAndProject`,
    * never a driver-side sort). */
  def referenceOf(docs: DataFrame, textCol: String,
                  maxVocab: Int = DefaultMaxVocab): (Map[Long, Long], Long) = {
    // persisted for the same two-actions reason as [[referencesBySource]]
    val grouped = docs
      .select(explode(split(col(textCol), " ", -1)).as("word"))
      .filter(col("word") =!= "")
      .select(xxhash64(col("word")).as("wh"))
      .groupBy("wh").agg(count(lit(1)).as("n"))
      .persist()
    try {
      val total = grouped.agg(coalesce(sum("n"), lit(0L))).head().getLong(0)
      val rows = grouped.orderBy(col("n").desc, col("wh")).limit(maxVocab)
        .collect().map(r => r.getLong(0) -> r.getLong(1))
      (rows.toMap, total)
    } finally grouped.unpersist()
  }
}
