package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** At-least-once → effectively-once ingest guard, using Spark's NATIVE
  * `dropDuplicatesWithinWatermark` operator (Spark 3.5+) rather than a
  * hand-rolled keyed-state dedup.
  *
  * The bus in front of a production ingest (the reference's client
  * retries on timeout — at-least-once by design) re-delivers events;
  * this drops re-deliveries of the same `event_id` whose event times
  * fall within the watermark delay of the first arrival, while the
  * watermark EVICTS each id's state once it expires — bounded state,
  * which plain `dropDuplicates` on a stream cannot offer (its state
  * grows with every id ever seen and is the known OOM at 100 TB).
  *
  * Contrast with [[CorpusDedupStream]]: that one is CONTENT dedup with
  * never-expire semantics (a duplicate document is a duplicate forever
  * — the registry IS the product); this is DELIVERY dedup where the
  * duplicate horizon is the bus's redelivery window, so expiring state
  * is exactly right, and the native operator gets the eviction,
  * checkpointing, and RocksDB spilling for free.
  *
  * State shape at scale: one entry per event_id inside the rolling
  * watermark window — O(arrival rate × delay), independent of stream
  * lifetime. Keys hash-shard across executors like any keyed state.
  */
object EventDedupStream {

  val DefaultDelay = "10 minutes"

  /** Deduplicate an event stream by id within the watermark delay.
    * On a batch relation (Spark rejects the watermark variant there)
    * first-wins is made DETERMINISTIC: plain dropDuplicates keeps an
    * arbitrary row per id under shuffle nondeterminism, so the batch
    * path takes each id's min row under (event time, payload) order —
    * "earliest delivery" is the only first a batch can reconstruct.
    * `min_by` keeps this a hash aggregate with map-side partials (a
    * window rank would sort every id's rows); ties only between
    * fully identical rows, where either pick is the same row. */
  def dedup(events: DataFrame, delay: String = DefaultDelay): DataFrame =
    if (events.isStreaming)
      events
        .withWatermark("ts", delay)
        .dropDuplicatesWithinWatermark("event_id")
    else {
      val ord = struct(col("ts") +:
        events.columns.filter(c => c != "event_id" && c != "ts").sorted.map(col): _*)
      events
        .groupBy(col("event_id"))
        .agg(min_by(struct(events.columns.map(col): _*), ord).as("_r"))
        .select(col("_r.*"))
    }

  /** The enrich-ready projection the ingest pipeline consumes after the
    * guard: stable column order, dedup applied first. */
  def guardedIngest(events: DataFrame, delay: String = DefaultDelay): DataFrame =
    dedup(events, delay)
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
}
