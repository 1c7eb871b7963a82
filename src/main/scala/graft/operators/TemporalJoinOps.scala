package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal join shapes Spark SQL lacks as primitives (builder brief
  * preference (a): compose existing ops when semantics allow):
  *
  *  - **as-of join** — each event joined to the most recent order of
  *    the same customer at or before the event time. Composed as the
  *    union + running-last-window plan: tag both relations, sort each
  *    key's timeline once, carry the latest order down the timeline.
  *    ONE shuffle (hash by key), no per-row range probe, no
  *    candidate-pair explosion — the shape that survives 100 TB,
  *    unlike a theta-join `ON time <= ts` (O(N·M) per key).
  *
  *  - **banded range join** — pairs within a bounded time band,
  *    composed as bucket-expansion: each probe row explodes to the
  *    (at most ⌈band/bucket⌉+1) time buckets its band overlaps, the
  *    join is EQUI on (key, bucket), and the exact band predicate
  *    filters after. Candidates per row are bounded by bucket
  *    occupancy — skew-safe and AQE-splittable.
  */
object TemporalJoinOps {
  type Q = (SparkSession, String) => DataFrame

  /** Generic as-of: left rows (key, t) pick the latest right row
    * (key, rt, payload) with rt <= t; ties on rt resolve to the
    * highest payload (deterministic). SQL NULL semantics: right rows
    * with a NULL key or NULL time never match (filtered before the
    * union), and NULL-keyed left rows therefore get a NULL mark.
    * Working columns carry a `__asof_` prefix so caller columns named
    * k/t/kind/mark cannot collide. */
  def asOfJoin(left: DataFrame, leftKey: String, leftTime: String,
               right: DataFrame, rightKey: String, rightTime: String,
               payload: String): DataFrame = {
    val l = left.select(col(leftKey).as("__asof_k"), col(leftTime).as("__asof_t"),
      lit(1).as("__asof_kind"), col("*"))
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as("__asof_k"), col(rightTime).as("__asof_t"),
        lit(0).as("__asof_kind"),
        struct(col(rightTime).as("rt"), col(payload).as("p")).as("last_mark0"))
    val unioned = l.withColumn("last_mark0",
        lit(null).cast(r.schema("last_mark0").dataType))
      .unionByName(r, allowMissingColumns = true)
    // per key: right rows (kind=0) sort before left rows (kind=1) at
    // equal time, so a right row exactly at t is visible to that row
    val w = Window.partitionBy("__asof_k")
      .orderBy(col("__asof_t"), col("__asof_kind"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    unioned
      .withColumn("last_mark", max(col("last_mark0")).over(w))
      .filter(col("__asof_kind") === 1)
      .drop("__asof_k", "__asof_t", "__asof_kind", "last_mark0")
  }

  /** Forward as-of: left rows (key, t) pick the EARLIEST right row
    * (key, rt, payload) with rt >= t — same union + one-window plan as
    * [[asOfJoin]], scanned toward the future. At equal time the right
    * row is visible (kind orders right after left so the
    * current-row-to-following frame includes it); ties on rt resolve
    * to the lowest payload. */
  def asOfJoinForward(left: DataFrame, leftKey: String, leftTime: String,
                      right: DataFrame, rightKey: String, rightTime: String,
                      payload: String): DataFrame = {
    val l = left.select(col(leftKey).as("__asof_k"), col(leftTime).as("__asof_t"),
      lit(0).as("__asof_kind"), col("*"))
    val r = right
      .filter(col(rightKey).isNotNull && col(rightTime).isNotNull)
      .select(col(rightKey).as("__asof_k"), col(rightTime).as("__asof_t"),
        lit(1).as("__asof_kind"),
        struct(col(rightTime).as("rt"), col(payload).as("p")).as("next_mark0"))
    val unioned = l.withColumn("next_mark0",
        lit(null).cast(r.schema("next_mark0").dataType))
      .unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy("__asof_k")
      .orderBy(col("__asof_t"), col("__asof_kind"))
      .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    unioned
      .withColumn("next_mark", min(col("next_mark0")).over(w))
      .filter(col("__asof_kind") === 0)
      .drop("__asof_k", "__asof_t", "__asof_kind", "next_mark0")
  }

  val queries: Map[String, Q] = Map(
    // as-of: each event's latest order (same customer, at-or-before ts)
    "asof_last_order" -> ((s, d) => {
      val ev = Tables.events(s, d)
        .select(col("event_id"), col("user_id"), col("ts"))
      val ord = Tables.orders(s, d)
        .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
      asOfJoin(ev, "user_id", "ts", ord, "o_custkey", "o_orderdate", "o_orderkey")
        .select(col("event_id"),
          col("last_mark.p").as("last_orderkey"),
          col("last_mark.rt").as("last_orderdate"))
        .orderBy("event_id")
    }),

    // forward as-of: each order's FIRST event of the same customer
    // at-or-after the order date (the fulfillment-lag probe) — the
    // mirror direction of asof_last_order, same one-shuffle plan
    "asof_next_event" -> ((s, d) => {
      val ord = Tables.orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"), col("o_orderdate"))
      val ev = Tables.events(s, d)
        .select(col("user_id"), col("ts"), col("event_id"))
      asOfJoinForward(ord, "o_custkey", "o_orderdate", ev, "user_id", "ts", "event_id")
        .select(col("o_orderkey"),
          col("next_mark.p").as("next_event_id"),
          col("next_mark.rt").as("next_event_ts"))
        .orderBy("o_orderkey")
    }),

    // banded range join: for each error event, count the same user's
    // events inside the following hour (band = 3600s, bucket = 1h).
    // Bucket-expansion keeps the join EQUI on (user, bucket) — no
    // O(N·M)-per-key range probe.
    "range_join_error_window" -> ((s, d) => {
      val bandUs = 3600L * 1000000
      val bucketUs = 3600L * 1000000
      val ev = Tables.events(s, d)
        .select(col("user_id").as("k"), col("event_id"), col("event_type"),
          unix_micros(col("ts")).as("tus"))
      val probes = ev.filter(col("event_type") === "error")
        .select(col("k"), col("event_id").as("probe_id"), col("tus").as("pus"))
        .withColumn("bucket", explode(expr(
          s"sequence(pus div $bucketUs, (pus + $bandUs) div $bucketUs)")))
      val build = ev.withColumn("bucket", expr(s"tus div $bucketUs"))
      // no dedup needed: a build row has exactly one bucket, so each
      // (probe, event) pair meets on at most one (k, bucket) key
      probes.join(build, Seq("k", "bucket"))
        .filter(col("event_id") =!= col("probe_id") &&
          col("tus") >= col("pus") && col("tus") <= col("pus") + bandUs)
        .groupBy("probe_id")
        .agg(count(lit(1)).as("n_following"))
        .orderBy("probe_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "asof_last_order" ->
      """SELECT e.event_id,
        |       (SELECT o.o_orderkey FROM orders o
        |        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
        |         AS last_orderkey,
        |       (SELECT o.o_orderdate FROM orders o
        |        WHERE o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
        |        ORDER BY o.o_orderdate DESC, o.o_orderkey DESC LIMIT 1)
        |         AS last_orderdate
        |FROM events e ORDER BY e.event_id""".stripMargin,

    "asof_next_event" ->
      """SELECT o.o_orderkey,
        |       (SELECT e.event_id FROM events e
        |        WHERE e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |        ORDER BY e.ts, e.event_id LIMIT 1) AS next_event_id,
        |       (SELECT e.ts FROM events e
        |        WHERE e.user_id = o.o_custkey AND e.ts >= o.o_orderdate
        |        ORDER BY e.ts, e.event_id LIMIT 1) AS next_event_ts
        |FROM orders o ORDER BY o.o_orderkey""".stripMargin,

    "range_join_error_window" ->
      """SELECT a.event_id AS probe_id, count(*) AS n_following
        |FROM events a JOIN events b
        |  ON b.user_id = a.user_id AND b.event_id <> a.event_id
        | AND epoch_us(b.ts) >= epoch_us(a.ts)
        | AND epoch_us(b.ts) <= epoch_us(a.ts) + 3600000000
        |WHERE a.event_type = 'error'
        |GROUP BY a.event_id ORDER BY probe_id""".stripMargin
  )
}
