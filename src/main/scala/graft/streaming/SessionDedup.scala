package graft.streaming

import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Exact 30-s-gap session dedup — the reference's export gate
  * (`/root/reference/db/procedures/events/NewEvent.java:40-42,70-75`;
  * SURVEY.md ST4/J4): an event within 30 s of the (src,dest) session's
  * last event extends the session and is suppressed; otherwise it opens
  * a new session and is emitted to the export stream.
  *
  * `dropDuplicatesWithinWatermark` can't express the *gap* semantics
  * (each event refreshes the horizon), so this is the one genuinely
  * custom stateful operator (SURVEY.md §7.3): `flatMapGroupsWithState`
  * keyed by (src,dest) holding last_ts, with event-time timeout for
  * state eviction — the watermark plays the reference nibbler's role of
  * bounding state (ST6).
  *
  * Scale: state is one long per live (src,dest) pair; the shuffle is
  * the same hash-by-key exchange VoltDB's partition routing performs.
  */
object SessionDedup {
  /** Event row (driver-table shape: user_id→src, event_type→dest). */
  case class Ev(event_id: Long, user_id: Long, event_type: String,
                ts: java.sql.Timestamp, value: Double)
  case class SessionState(lastTsMicros: Long)

  val GapMicros: Long = 30L * 1000 * 1000

  /** Full µs precision: Timestamp.getTime is ms-truncated; the sub-ms
    * digits live in getNanos. */
  def micros(t: java.sql.Timestamp): Long =
    Math.floorDiv(t.getTime, 1000L) * 1000000L + t.getNanos / 1000L

  /** Pure gap rule (NewEvent.java:40-42): given the previous session
    * last-ts (None at cold start) and this batch's event times in
    * order, returns which events open sessions plus the new last-ts.
    * Every event — emitted or suppressed — refreshes last-ts, but it
    * can only move FORWARD (the reference's last_ts is MAX(ts),
    * db/ddl.sql:110): a late event processed after a newer one must
    * not rewind the horizon and spuriously re-open the session. */
  def sessionStarts(prev: Option[Long], ts: Seq[Long],
                    gap: Long = GapMicros): (Seq[Boolean], Option[Long]) = {
    var last = prev
    val flags = ts.map { t =>
      val emit = last.forall(l => t - l > gap)
      last = Some(last.fold(t)(math.max(_, t)))
      emit
    }
    (flags, last)
  }

  /** Shared gap-gate state machine: one micro-batch of one (src,dest)
    * key through the 30-s rule. Generic over the row type so the bare
    * and enriched export shapes run the IDENTICAL session logic. */
  private def gapGate[T](it: Iterator[T], state: GroupState[SessionState],
                         ts: T => Long, id: T => Long): Iterator[T] =
    if (state.hasTimedOut) {
      state.remove()
      Iterator.empty
    } else {
      // events within a micro-batch are not ordered: sort by
      // (ts, event_id) to apply the gap rule in arrival order
      val sorted = it.toSeq.sortBy(e => (ts(e), id(e)))
      val (flags, lastOpt) =
        sessionStarts(state.getOption.map(_.lastTsMicros), sorted.map(ts))
      val out = sorted.zip(flags).collect { case (e, true) => e }
      lastOpt.foreach { last =>
        state.update(SessionState(last))
        // evict state once the watermark passes last_ts + gap;
        // ceil the µs→ms conversion (floor could evict up to
        // 1 ms early and emit an event whose gap is <= 30 s);
        // clamp above the current watermark — for very late
        // events last+gap can already be behind it, and Spark
        // rejects (kills the query on) a timeout <= watermark
        val target = Math.floorDiv(last + 999, 1000) + GapMicros / 1000
        val floor = state.getCurrentWatermarkMs() + 1
        state.setTimeoutTimestamp(math.max(target, floor))
      }
      out.iterator
    }

  /** Streaming form. Input must carry a watermark on `ts` when used
    * with a real source (for timeout-based state eviction). */
  def dedup(events: Dataset[Ev])(implicit spark: SparkSession): Dataset[Ev] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 seconds") // required by EventTimeTimeout
      .as[Ev]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[SessionState, Ev](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, it, state: GroupState[SessionState]) =>
          gapGate[Ev](it, state, e => micros(e.ts), _.event_id)
      }
  }

  /** Enriched export row — what the reference actually exports
    * (`db/ddl.sql` export stream carries the resolved dim ids and the
    * cluster score, not the raw strings). */
  case class RichEv(event_id: Long, user_id: Long, event_type: String,
                    ts: java.sql.Timestamp, value: Double,
                    dest_id: Option[Long], referral_id: Option[Long],
                    agent_id: Option[Long], cluster: Int)

  /** Gap gate over the enriched shape: identical session semantics to
    * [[dedup]] (shared [[gapGate]] body), but the emitted rows keep
    * their enrichment/scoring columns — so a full ingest pipeline
    * (enrich → score → gate → sink) stays one streaming query with
    * every stage's columns surviving to the sink (nothing for the
    * optimizer to prune away). */
  def dedupRich(events: Dataset[RichEv])(implicit spark: SparkSession): Dataset[RichEv] = {
    import spark.implicits._
    events
      .withWatermark("ts", "10 seconds")
      .as[RichEv]
      .groupByKey(e => (e.user_id, e.event_type))
      .flatMapGroupsWithState[SessionState, RichEv](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (_, it, state: GroupState[SessionState]) =>
          gapGate[RichEv](it, state, e => micros(e.ts), _.event_id)
      }
  }
}
