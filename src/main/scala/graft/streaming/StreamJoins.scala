package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Stream-stream join and session-window aggregation — the two
  * Structured Streaming operator shapes the view/dedup pipeline
  * doesn't already exercise.
  *
  * Both are written against plain DataFrames so the SAME code runs in
  * batch (parity oracle) and streaming (state + watermark semantics);
  * StreamJoinsSpec asserts streaming == batch on identical input.
  *
  * Scale notes (100 TB): the interval join keys the state store on
  * user_id and bounds retained state by the watermark delay + band
  * (old rows are evicted, never scanned); session_window is Spark's
  * native gap-based session operator — state per OPEN session only,
  * merged incrementally, so steady-state memory is proportional to
  * concurrent sessions, not history.
  */
object StreamJoins {

  /** Interval (banded) stream-stream join: each error event matched to
    * the same user's events in the following hour. On streaming inputs
    * both sides MUST carry watermarks (caller applies them) so the
    * state store can evict; the time-band predicate is what bounds
    * state — an unbanded stream-stream join would retain everything. */
  def errorFollowJoin(errors: DataFrame, all: DataFrame): DataFrame = {
    val probes = errors.filter(col("event_type") === "error")
      .select(col("user_id").as("p_user"), col("event_id").as("probe_id"),
        col("ts").as("p_ts"))
    val build = all.select(col("user_id").as("b_user"),
      col("event_id").as("b_id"), col("ts").as("b_ts"))
    probes.join(build,
      col("p_user") === col("b_user") &&
        col("b_id") =!= col("probe_id") &&
        col("b_ts") >= col("p_ts") &&
        col("b_ts") <= col("p_ts") + expr("INTERVAL 1 HOUR"))
  }

  /** Gap-based session aggregation via the native session_window
    * operator (30-s inactivity gap per user, the reference's ST4
    * semantics at user granularity): count + span per session. */
  def sessionWindowStats(events: DataFrame, gap: String = "30 seconds"): DataFrame =
    events
      .groupBy(col("user_id"), session_window(col("ts"), gap).as("sw"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"), col("sw.start").as("session_start"),
        col("sw.end").as("session_end"), col("n_events"))
}
