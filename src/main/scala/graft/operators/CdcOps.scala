package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Warehouse/CDC tranche: slowly-changing-dimension (SCD2) interval
  * construction and snapshot diffing — the change-capture primitives a
  * warehouse loop needs around the reference's staged-swap model
  * update (SURVEY.md D2: `LoadDsa`'s truncate-and-copy is the
  * whole-table special case of this diff). Both oracle-checked.
  *
  * Scale notes (100 TB):
  *  - scd2_intervals is one shuffle on the entity key + a
  *    per-partition sort (lag/lead windows share the same
  *    partitioning — Catalyst plans ONE Exchange + one Sort for both);
  *  - snapshot_diff is a single full-outer SMJ on the row key; the
  *    change predicate is row-local, and the status census
  *    partial-aggregates map-side. Bucketing both snapshots on the
  *    key (BucketedSink) makes the join zero-shuffle.
  */
object CdcOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // SCD2: each run of consecutive equal event_types per user becomes
    // a validity interval [valid_from, valid_to) — valid_to NULL marks
    // the current row (standard type-2 dimension shape)
    "scd2_intervals" -> ((s, d) => {
      val wOrd = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val changes = Tables.events(s, d)
        .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
        .withColumn("prev_type", lag("event_type", 1).over(wOrd))
        .filter(col("prev_type").isNull || col("prev_type") =!= col("event_type"))
      changes
        .withColumn("valid_to", lead("ts", 1).over(wOrd))
        .select(col("user_id"), col("event_type"),
          col("ts").as("valid_from"), col("valid_to"))
        .orderBy("user_id", "valid_from")
    }),

    // snapshot diff: two deterministic snapshots derived from the
    // events table (old = ids not divisible by 13; new = ids not
    // divisible by 17, values bumped where id % 11 = 0) full-outer
    // joined on the key → per-status census. This is the CDC merge
    // preflight: how much churn a MERGE would apply.
    "snapshot_diff" -> ((s, d) => {
      val ev = Tables.events(s, d).select("event_id", "value")
      val old = ev.filter(col("event_id") % 13 =!= 0)
        .select(col("event_id").as("ok"), col("value").as("ov"))
      val neu = ev.filter(col("event_id") % 17 =!= 0)
        .select(col("event_id").as("nk"),
          when(col("event_id") % 11 === 0, col("value") + 1.0)
            .otherwise(col("value")).as("nv"))
      old.join(neu, col("ok") === col("nk"), "full_outer")
        .select(when(col("ok").isNull, "inserted")
          .when(col("nk").isNull, "deleted")
          .when(col("ov") =!= col("nv"), "changed")
          .otherwise("unchanged").as("status"))
        .groupBy("status").agg(count(lit(1)).as("n"))
        .orderBy("status")
    })
  )

  val oracles: Map[String, String] = Map(
    "scd2_intervals" ->
      """WITH t AS (
        |  SELECT user_id, event_type, ts, event_id,
        |         lag(event_type) OVER (PARTITION BY user_id
        |                               ORDER BY ts, event_id) AS prev_type
        |  FROM events),
        |c AS (
        |  SELECT user_id, event_type, ts, event_id FROM t
        |  WHERE prev_type IS NULL OR prev_type <> event_type)
        |SELECT user_id, event_type, ts AS valid_from,
        |       lead(ts) OVER (PARTITION BY user_id
        |                      ORDER BY ts, event_id) AS valid_to
        |FROM c ORDER BY user_id, valid_from""".stripMargin,

    "snapshot_diff" ->
      """WITH old AS (
        |  SELECT event_id AS ok, value AS ov FROM events
        |  WHERE event_id % 13 <> 0),
        |neu AS (
        |  SELECT event_id AS nk,
        |         CASE WHEN event_id % 11 = 0 THEN value + 1.0 ELSE value END AS nv
        |  FROM events WHERE event_id % 17 <> 0)
        |SELECT CASE WHEN ok IS NULL THEN 'inserted'
        |            WHEN nk IS NULL THEN 'deleted'
        |            WHEN ov <> nv THEN 'changed'
        |            ELSE 'unchanged' END AS status,
        |       count(*) AS n
        |FROM old FULL OUTER JOIN neu ON nk = ok
        |GROUP BY 1 ORDER BY status""".stripMargin
  )
}
