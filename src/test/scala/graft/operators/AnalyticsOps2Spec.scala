package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants for the product-analytics tranche (cross-engine value
  * parity is the oracle's job; these pin the semantics). */
class AnalyticsOps2Spec extends SparkSpec {

  test("funnel stages shrink monotonically") {
    val r = AnalyticsOps2.queries("funnel_conversion")(spark, sf).collect()(0)
    val (u, v, c, p) = (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
    assert(u >= v && v >= c && c >= p, s"funnel not monotone: $u $v $c $p")
    assert(p > 0, "sf0.001 should convert at least one user end-to-end")
  }

  test("retention offset-0 equals cohort size") {
    val m = AnalyticsOps2.queries("retention_cohorts")(spark, sf)
    val offset0 = m.filter(col("day_offset") === 0)
      .select(col("cohort_day"), col("n_users"))
    val cohorts = Tables.events(spark, sf)
      .groupBy("user_id").agg(min(date_trunc("day", col("ts"))).as("cohort_day"))
      .groupBy("cohort_day").agg(count(lit(1)).as("n_users"))
    assert(offset0.exceptAll(cohorts).isEmpty && cohorts.exceptAll(offset0).isEmpty)
  }

  test("gap fill preserves totals and covers a contiguous spine") {
    val g = AnalyticsOps2.queries("gap_fill_minutes")(spark, sf)
      .agg(sum("n"), count(lit(1)),
        min("minute").cast("long"), max("minute").cast("long"))
      .collect()(0)
    val total = Tables.events(spark, sf).count()
    assert(g.getLong(0) == total, "zero fill must not change the event total")
    val minutes = (g.getLong(3) - g.getLong(2)) / 60 + 1
    assert(g.getLong(1) == minutes, "spine must have one row per minute, no gaps")
  }

  test("transition matrix rows sum to ~1e6 ppm per from_type") {
    val t = AnalyticsOps2.queries("event_transitions")(spark, sf)
      .groupBy("from_type").agg(sum("p_ppm").as("total"))
      .collect()
    for (r <- t) {
      val total = r.getLong(1)
      // integer division truncates per cell: total ∈ (1e6 - cells, 1e6]
      assert(total > 999900L && total <= 1000000L,
        s"${r.getString(0)} transition probs sum to $total ppm")
    }
  }

  test("outliers are rare and bounded") {
    val o = AnalyticsOps2.queries("value_outliers")(spark, sf).collect()
    for (r <- o) {
      assert(r.getLong(2) <= r.getLong(1))
      // Chebyshev: at most 1/9 of any distribution sits beyond 3σ
      assert(r.getLong(2) * 9 <= r.getLong(1),
        s"${r.getString(0)}: ${r.getLong(2)} outliers of ${r.getLong(1)} exceeds the 3σ bound")
    }
  }

  test("regression fit is well-formed") {
    val rows = AnalyticsOps2.queries("regr_fit")(spark, sf).collect()
    assert(rows.length == 3)
    for (r <- rows) {
      val r2 = r.getDouble(4)
      assert(r2 >= 0.0 && r2 <= 1.0, s"r² out of range: $r2")
    }
  }
}
