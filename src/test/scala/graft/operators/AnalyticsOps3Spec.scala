package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics invariants for the third analytics tranche (value parity
  * with DuckDB is the oracle's job). */
class AnalyticsOps3Spec extends SparkSpec {

  private lazy val minuteCounts: Map[Long, Long] =
    Tables.events(spark, sf)
      .groupBy(expr("unix_micros(ts) div 60000000").as("m"))
      .agg(count(lit(1)).as("c"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("ewma_anomaly matches a local trailing-EWMA recompute") {
    val rows = AnalyticsOps3.queries("ewma_anomaly")(spark, sf).collect()
    val lo = minuteCounts.keys.min
    val hi = minuteCounts.keys.max
    assert(rows.length == (hi - lo + 1 - 8),
      "one row per spine minute past the 8-lag warmup")
    def c(m: Long): Long = minuteCounts.getOrElse(m, 0L)
    var checked = 0
    for (r <- rows if checked < 500) {
      val m = r.getLong(0)
      val num = (1 to 8).map(k => c(m - k) * (1L << (8 - k))).sum
      assert(r.getLong(1) == c(m), s"count mismatch at minute $m")
      assert(r.getLong(2) == num, s"ewma_num mismatch at minute $m")
      assert((r.getInt(3) == 1) == (c(m) * 255 > 2 * num),
        s"anomaly flag mismatch at minute $m")
      checked += 1
    }
    // a flat series is never anomalous: recheck the rule analytically
    val flatNum = (1 to 8).map(k => 7L * (1L << (8 - k))).sum
    assert(!(7L * 255 > 2 * flatNum), "constant series must not flag")
  }

  test("sliding_distinct_users matches a local 5-minute-window recompute") {
    val pairs = Tables.events(spark, sf)
      .select(expr("unix_micros(ts) div 60000000").as("m"), col("user_id"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1)))
    val byMinute = pairs.groupBy(_._1).map { case (m, ps) => m -> ps.map(_._2).toSet }
    val rows = AnalyticsOps3.queries("sliding_distinct_users")(spark, sf).collect()
    var checked = 0
    for (r <- rows if checked < 500) {
      val m = r.getLong(0)
      val want = (0 to 4).flatMap(k => byMinute.getOrElse(m - k, Set.empty)).toSet.size
      assert(r.getLong(1) == want.toLong, s"window distinct mismatch at minute $m")
      checked += 1
    }
  }

  test("mad_outliers: robust stats bound the flagged share") {
    val rows = AnalyticsOps3.queries("mad_outliers")(spark, sf).collect()
    assert(rows.nonEmpty)
    for (r <- rows) {
      val (n, mad, out) = (r.getLong(1), r.getDouble(3), r.getLong(4))
      assert(mad >= 0, "MAD is a median of absolute values")
      assert(out <= n / 2,
        "by definition at least half the mass is within one MAD of the median")
    }
  }

  test("skew_audit: shares and skew factor are exact and ordered") {
    val rows = AnalyticsOps3.queries("skew_audit")(spark, sf).collect()
    assert(rows.length == 10)
    val total = Tables.events(spark, sf).count()
    val nKeys = Tables.events(spark, sf).select("user_id").distinct().count()
    val counts = rows.map(_.getLong(1))
    assert(counts.sameElements(counts.sorted.reverse), "must be count-descending")
    for (r <- rows) {
      assert(r.getLong(2) == r.getLong(1) * 1000000L / total, "share_ppm exact")
      // the top row's count IS the global max, so the factor is exact
      assert(r.getLong(3) == counts.max * nKeys * 100L / total, "skew_x100 exact")
    }
    assert(rows.forall(_.getLong(3) >= 100L), "skew factor ≥ 1× by definition")
  }
}
