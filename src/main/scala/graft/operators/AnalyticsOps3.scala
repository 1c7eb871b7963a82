package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third analytics tranche on the events stream: trailing-EWMA
  * anomaly detection, sliding-window distinct users, and a key-skew
  * audit. All oracle-checked.
  *
  * Scale notes (100 TB):
  *  - both time-series queries run on the PER-MINUTE tier (bounded by
  *    elapsed time, not event volume) after one scan-bound
  *    pre-aggregation — the same two-tier design as the reference's
  *    per-second views (SURVEY.md A4-A7);
  *  - the EWMA is computed WITHOUT any global window: each minute's
  *    count is exploded to the 8 future minutes it influences with a
  *    dyadic weight (2^(8-k), exact integers) and re-aggregated on the
  *    target minute — a shuffle of spine-sized narrow rows, vs a
  *    single-partition ordered window that would serialize the world;
  *  - sliding_distinct_users explodes each (minute, user) pair to the
  *    5 covered minutes — narrow rows, bounded fan-out, and the
  *    distinct runs partial/final like any aggregation. The sketch tier
  *    (hll_sketch_tier) is the approximate path when exact distinct
  *    over wide windows gets expensive;
  *  - skew_audit is what decides whether a key needs salting
  *    (SkewOps): per-key counts partial-aggregate map-side; the global
  *    tier is one broadcast row.
  */
object AnalyticsOps3 {
  type Q = (SparkSession, String) => DataFrame

  /** Per-minute event counts keyed by epoch-minute (integer). */
  private def minuteCounts(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(expr("unix_micros(ts) div 60000000").as("m"))
      .agg(count(lit(1)).as("c"))

  val queries: Map[String, Q] = Map(
    // trailing EWMA (lags 1..8, dyadic weights 128..1, denominator
    // 255) per minute over the zero-filled spine; a minute is
    // anomalous when its count exceeds 2× the EWMA — all integer
    // arithmetic, so both engines agree bit-for-bit
    "ewma_anomaly" -> ((s, d) => {
      val c = minuteCounts(s, d)
      val b = c.agg(min("m").as("lo"), max("m").as("hi"))
      val spine = b.select(explode(expr("sequence(lo, hi)")).as("m"))
      val f = spine.join(c, Seq("m"), "left")
        .select(col("m"), coalesce(col("c"), lit(0L)).as("c"))
      val num = f
        .select(col("m"), col("c"), explode(expr("sequence(1, 8)")).as("k"))
        .select((col("m") + col("k")).as("t"),
          expr("c * shiftleft(1, 8 - k)").as("wc"))
        .groupBy("t").agg(sum("wc").as("ewma_num"))
      f.join(num, f("m") === num("t"))
        .crossJoin(broadcast(b))
        .filter(col("m") >= col("lo") + 8)
        .select(col("m").as("minute_id"), col("c").as("n"), col("ewma_num"),
          when(col("c") * 255 > col("ewma_num") * 2, 1).otherwise(0)
            .cast("int").as("anomaly"))
        .orderBy("minute_id")
    }),

    // exact distinct users over a trailing 5-minute window, per
    // minute: each (minute, user) activity row covers minutes
    // m..m+4; re-aggregate on the covered minute
    "sliding_distinct_users" -> ((s, d) => {
      // em feeds TWO branches, but checkpointing it measured SLOWER
      // (r19 A/B min-of-5: 0.87 vs 0.79 s): the optimizer rewrites the
      // spine branch's min/max-over-distinct into a plain scan-agg (the
      // distinct is redundant for min/max), so the "recompute" is a
      // thin ts-column scan while a checkpoint would materialize the
      // full (minute, user) tier. Left lazy on purpose.
      val em = Tables.events(s, d)
        .select(expr("unix_micros(ts) div 60000000").as("m"), col("user_id"))
        .distinct()
      val b = em.agg(min("m").as("lo"), max("m").as("hi"))
      val cnt = em
        .select(col("m"), col("user_id"), explode(expr("sequence(0, 4)")).as("k"))
        .select((col("m") + col("k")).as("cm"), col("user_id"))
        .groupBy("cm").agg(countDistinct("user_id").as("nu"))
      b.select(explode(expr("sequence(lo, hi)")).as("m"))
        .join(cnt, col("m") === col("cm"), "left")
        .select(col("m").as("minute_id"),
          coalesce(col("nu"), lit(0L)).as("n_users"))
        .orderBy("minute_id")
    }),

    // robust outliers via median absolute deviation: med and MAD from
    // the exact interpolated percentile (bit-parity with DuckDB's
    // quantile_cont, proven by percentiles_exact), cutoff 3σ-equivalent
    // (4.4478 = 3 × 1.4826) — the complement of value_outliers'
    // mean/stddev z-score, immune to the outliers it hunts
    "mad_outliers" -> ((s, d) => {
      val q = Tables.events(s, d).select("event_type", "value")
      val med = q.groupBy("event_type")
        .agg(expr("percentile(value, 0.5)").as("med"))
      val dev = q.join(broadcast(med), "event_type")
        .withColumn("adev", abs(col("value") - col("med")))
      val mad = dev.groupBy("event_type")
        .agg(expr("percentile(adev, 0.5)").as("mad"))
      dev.join(broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(count(lit(1)).as("n_events"),
          first(col("med")).as("med"),
          first(col("mad")).as("mad"),
          count(when(col("adev") > lit(4.4478) * col("mad"), 1)).as("n_outliers"))
        .orderBy("event_type")
    }),

    // key-skew audit: top-10 heaviest user_ids with their traffic
    // share, plus the global skew factor (max/mean, ×100) — the
    // number that decides between a plain shuffle and SkewOps salting
    "skew_audit" -> ((s, d) => {
      val c = Tables.events(s, d).groupBy("user_id").agg(count(lit(1)).as("c"))
      val g = c.agg(sum("c").as("total"), count(lit(1)).as("n_keys"),
        max("c").as("max_c"))
      c.crossJoin(broadcast(g))
        .select(col("user_id"), col("c").as("n_events"),
          expr("c * 1000000 div total").as("share_ppm"),
          expr("max_c * n_keys * 100 div total").as("skew_x100"))
        .orderBy(col("n_events").desc, col("user_id"))
        .limit(10)
    })
  )

  val oracles: Map[String, String] = Map(
    "ewma_anomaly" ->
      """WITH c AS (SELECT epoch_us(ts) // 60000000 AS m, count(*) AS c
        |           FROM events GROUP BY 1),
        |b AS (SELECT min(m) AS lo, max(m) AS hi FROM c),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS m FROM b),
        |f AS (SELECT s.m, COALESCE(c.c, 0) AS c
        |      FROM spine s LEFT JOIN c ON c.m = s.m),
        |contrib AS (SELECT f.m + k AS t, f.c * (1 << (8 - k)) AS wc
        |            FROM f, (SELECT unnest(range(1, 9)) AS k) ks),
        |num AS (SELECT t, CAST(sum(wc) AS BIGINT) AS ewma_num
        |        FROM contrib GROUP BY t)
        |SELECT f.m AS minute_id, f.c AS n, num.ewma_num,
        |       CAST(CASE WHEN f.c * 255 > 2 * num.ewma_num THEN 1 ELSE 0 END
        |            AS INT) AS anomaly
        |FROM f JOIN num ON num.t = f.m, b
        |WHERE f.m >= b.lo + 8 ORDER BY minute_id""".stripMargin,

    "sliding_distinct_users" ->
      """WITH em AS (SELECT DISTINCT epoch_us(ts) // 60000000 AS m, user_id
        |            FROM events),
        |b AS (SELECT min(m) AS lo, max(m) AS hi FROM em),
        |cnt AS (SELECT m + k AS cm, count(DISTINCT user_id) AS nu
        |        FROM em, (SELECT unnest(range(0, 5)) AS k) ks
        |        GROUP BY 1),
        |spine AS (SELECT unnest(range(lo, hi + 1)) AS m FROM b)
        |SELECT s.m AS minute_id, CAST(COALESCE(cnt.nu, 0) AS BIGINT) AS n_users
        |FROM spine s LEFT JOIN cnt ON cnt.cm = s.m
        |ORDER BY minute_id""".stripMargin,

    "mad_outliers" ->
      """WITH med AS (
        |  SELECT event_type, quantile_cont(value, 0.5) AS med
        |  FROM events GROUP BY event_type),
        |dev AS (
        |  SELECT e.event_type, abs(e.value - med.med) AS adev, med.med
        |  FROM events e JOIN med ON med.event_type = e.event_type),
        |mad AS (
        |  SELECT event_type, quantile_cont(adev, 0.5) AS mad
        |  FROM dev GROUP BY event_type)
        |SELECT dev.event_type, count(*) AS n_events,
        |       any_value(dev.med) AS med, any_value(mad.mad) AS mad,
        |       CAST(count(*) FILTER (WHERE dev.adev > 4.4478 * mad.mad) AS BIGINT)
        |         AS n_outliers
        |FROM dev JOIN mad ON mad.event_type = dev.event_type
        |GROUP BY dev.event_type ORDER BY dev.event_type""".stripMargin,

    "skew_audit" ->
      """WITH c AS (SELECT user_id, count(*) AS c FROM events GROUP BY user_id),
        |g AS (SELECT CAST(sum(c) AS BIGINT) AS total, count(*) AS n_keys,
        |             max(c) AS max_c FROM c)
        |SELECT user_id, c.c AS n_events,
        |       CAST(c.c * 1000000 // g.total AS BIGINT) AS share_ppm,
        |       CAST(g.max_c * g.n_keys * 100 // g.total AS BIGINT) AS skew_x100
        |FROM c, g ORDER BY c.c DESC, user_id LIMIT 10""".stripMargin
  )
}
