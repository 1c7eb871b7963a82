package graft.streaming

import org.apache.spark.sql.{Dataset, Encoders, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming._

/** Streaming per-minute EWMA anomaly detector on `transformWithState`
  * — the continuous form of the batch `ewma_anomaly` query
  * (AnalyticsOps3): trailing dyadic EWMA over the previous 8 minutes
  * (weights 2^(8-k), denominator 255), a minute is anomalous when its
  * count exceeds 2× the EWMA. Same integer rule, shared via
  * [[AnomalyStream.verdict]], so the two forms cannot drift.
  *
  * Operator design:
  *  - keyed by a caller-chosen stream key (the spec uses one global
  *    key to mirror the batch query; production keys by event_type /
  *    source so state and throughput scale with key cardinality);
  *  - state per key = last closed minute, a warmup counter, the
  *    8-slot ring of closed counts, and the open-minute counts map;
  *  - minutes close on EVENT-TIME TIMERS: minute M closes when the
  *    watermark passes (M+1)·60 s; each expiry emits the minute's
  *    verdict, pushes its count into the ring, and re-registers a
  *    timer for the next minute — so the operator emits a GAP-FILLED
  *    spine (zero rows for empty minutes) exactly like the batch
  *    query's zero-filled spine, with state bounded by the ring size
  *    plus the open (≤ watermark-lag) minutes;
  *  - the first 8 closed minutes are warmup (ring not yet full) and
  *    emit nothing, matching the batch query's `m >= lo + 8` bound.
  */
object AnomalyStream {

  /** One event-time-stamped observation. */
  case class Obs(k: String, ts: java.sql.Timestamp)

  /** Closed-minute verdict (minute_id = epoch minutes). */
  case class MinuteVerdict(k: String, minute_id: Long, n: Long,
                           ewma_num: Long, anomaly: Int)

  /** Per-key detector state. The open-minute counts are parallel Seqs
    * (openK(i) → openV(i)) because the TWS Avro state encoder does not
    * support MapType. */
  case class AnomState(lastClosed: Long, closedCount: Long,
                       ring: Seq[Long], openK: Seq[Long], openV: Seq[Long]) {
    def open: Map[Long, Long] = openK.zip(openV).toMap
    def withOpen(m: Map[Long, Long]): AnomState = {
      val ks = m.keys.toSeq.sorted
      copy(openK = ks, openV = ks.map(m))
    }
  }

  /** The shared batch/stream rule: numerator of the trailing EWMA
    * (ring(i) = count of minute m-1-i) and the anomaly decision. */
  def verdict(k: String, m: Long, n: Long, ring: Seq[Long]): MinuteVerdict = {
    val num = ring.zipWithIndex.map { case (c, i) => c * (1L << (7 - i)) }.sum
    MinuteVerdict(k, m, n, num, if (n * 255 > 2 * num) 1 else 0)
  }

  private def minuteOf(ts: java.sql.Timestamp): Long =
    Math.floorDiv(ts.getTime, 60000L) // ms → epoch minute

  class Detector extends StatefulProcessor[String, Obs, MinuteVerdict] {
    @transient private var st: ValueState[AnomState] = _

    override def init(outputMode: OutputMode, timeMode: TimeMode): Unit =
      st = getHandle.getValueState[AnomState](
        "anom", Encoders.product[AnomState], TTLConfig.NONE)

    private def boundaryMs(m: Long): Long = (m + 1) * 60000L

    override def handleInputRows(key: String, rows: Iterator[Obs],
                                 timerValues: TimerValues): Iterator[MinuteVerdict] = {
      val minutes = rows.map(o => minuteOf(o.ts)).toSeq
      val s0 = if (st.exists()) st.get()
      else AnomState(minutes.min - 1, 0L, Seq.fill(8)(0L), Seq.empty, Seq.empty)
      // an event for an already-closed minute is past OUR lateness
      // horizon even if inside the watermark — drop it rather than
      // leak an unclosable open-map entry
      val open = minutes.filter(_ > s0.lastClosed).foldLeft(s0.open) { (acc, m) =>
        acc + (m -> (acc.getOrElse(m, 0L) + 1L))
      }
      st.update(s0.withOpen(open))
      // one pending timer at the earliest unclosed minute's boundary
      getHandle.registerTimer(boundaryMs(s0.lastClosed + 1))
      Iterator.empty
    }

    override def handleExpiredTimer(key: String, timerValues: TimerValues,
                                    expiredTimerInfo: ExpiredTimerInfo): Iterator[MinuteVerdict] = {
      if (!st.exists()) return Iterator.empty
      var s = st.get()
      val wm = timerValues.getCurrentWatermarkInMs()
      val out = Seq.newBuilder[MinuteVerdict]
      // close every minute whose boundary the watermark has passed —
      // robust to coalesced/duplicate timer firings
      while (boundaryMs(s.lastClosed + 1) <= wm) {
        val m = s.lastClosed + 1
        val n = s.open.getOrElse(m, 0L)
        if (s.closedCount >= 8) out += verdict(key, m, n, s.ring)
        s = s.copy(lastClosed = m, closedCount = s.closedCount + 1,
          ring = (n +: s.ring).take(8)).withOpen(s.open - m)
      }
      st.update(s)
      getHandle.registerTimer(boundaryMs(s.lastClosed + 1))
      out.result().iterator
    }
  }

  /** Continuous detector over a timestamped stream; `keyCol` picks the
    * detection granularity (a constant column = global, event_type =
    * per-type). Watermark bounds how late a minute can still change. */
  def detect(events: Dataset[_], keyCol: String, tsCol: String)
            (implicit spark: SparkSession): Dataset[MinuteVerdict] = {
    import spark.implicits._
    events.toDF()
      .select(col(keyCol).cast("string").as("k"), col(tsCol).as("ts"))
      .withWatermark("ts", "10 seconds")
      .as[Obs]
      .groupByKey(_.k)
      .transformWithState(new Detector, TimeMode.EventTime, OutputMode.Append)
  }
}
