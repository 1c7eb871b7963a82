package graft.operators

import graft.{Catalog, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Sketch accuracy vs exact forms + the SQL catalog surface. */
class ApproxCatalogSpec extends SparkSpec {

  test("approx_count_distinct within 5% of exact") {
    val approx = ApproxOps.queries("approx_distinct_parts")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      val a = approx(k)
      assert(math.abs(a - n).toDouble / n < 0.05, s"$k: approx $a vs exact $n")
    }
  }

  test("HLL sketch tier: daily-sketch union is lossless vs single-pass, and near exact") {
    // mergeability: estimate(union(per-day sketches)) == estimate(one
    // global sketch) EXACTLY — register-wise max is associative, the
    // property that makes a persisted sketch tier correct at any
    // re-aggregation granularity
    val tiered = ApproxOps.queries("hll_sketch_tier")(spark, sf)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val single = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag")
      .agg(expr("hll_sketch_estimate(hll_sketch_agg(l_partkey))").as("e"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(tiered == single, s"tier union must be lossless: $tiered vs $single")
    val exact = Tables.lineitem(spark, sf)
      .groupBy("l_returnflag").agg(countDistinct(col("l_partkey")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    exact.foreach { case (k, n) =>
      assert(math.abs(tiered(k) - n).toDouble / n < 0.05,
        s"$k: sketch ${tiered(k)} vs exact $n")
    }
  }

  test("approx_percentile brackets the exact percentile") {
    // scalar p50/p90/p99 columns (the array shape broke the driver's
    // pandas compare — ndarray cells are unhashable)
    val rows = ApproxOps.queries("approx_percentile_value")(spark, sf).collect()
    assert(rows.length == 5)
    rows.foreach { r =>
      val (p50, p90, p99) = (r.getDouble(1), r.getDouble(2), r.getDouble(3))
      assert(p50 <= p90 && p90 <= p99, s"quantiles must be monotone: $r")
    }
    val exactP50 = Tables.events(spark, sf)
      .filter(col("event_type") === "click")
      .agg(expr("percentile(value, 0.5)")).collect()(0).getDouble(0)
    val approxP50 = rows.find(_.getString(0) == "click").get.getDouble(1)
    assert(math.abs(approxP50 - exactP50) / math.max(exactP50, 1.0) < 0.1,
      s"approx p50 $approxP50 vs exact $exactP50")
  }

  test("CMS heavy hitters: one-sided error, bounded inflation, recalls the exact head") {
    val ev = Tables.events(spark, sf)
    val n = ev.count()
    val exact = ev.groupBy("user_id").count()
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val hh = ApproxOps.queries("heavy_hitters_cms")(spark, sf).collect()
    assert(hh.nonEmpty && hh.length <= 10)
    hh.foreach { r =>
      val (u, est) = (r.getLong(0), r.getLong(1))
      val t = exact(u)
      assert(est >= t, s"CMS must never under-count: user $u est $est < exact $t")
      // eps = 1e-4 ⇒ w.h.p. inflation ≤ eps·N per counter; 20x slack
      assert(est <= t + math.max(2L, (n * 0.002).toLong),
        s"user $u est $est too far above exact $t")
    }
    // the true heaviest user must be surfaced (estimate ordering can
    // permute near-ties; the head itself cannot be lost)
    val top1 = exact.maxBy { case (u, c) => (c, -u) }._1
    assert(hh.map(_.getLong(0)).contains(top1), s"lost exact top-1 user $top1")
  }

  test("PercentileExact: bit-identical to the builtin percentile aggregate across groups, ties, and integral ranks") {
    import spark.implicits._
    // many groups, heavy ties, group sizes that make p·(n−1) land both
    // on and off integral ranks (incl. n=1 and n=2 edge groups)
    val base = (0 until 5000).map { i =>
      (s"g${i % 37}", (i * 2654435761L % 97).toDouble / 7.0)
    } ++ Seq(("solo", 42.0), ("pair", 1.0), ("pair", 2.0))
    val df = base.toDF("g", "v").repartition(13)
    val ps = Seq(0.0 -> "p0", 0.25 -> "p25", 0.5 -> "p50", 0.95 -> "p95", 1.0 -> "p100")
    val sortBased = PercentileExact.grouped(df, "g", "v", ps)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    val builtin = df.groupBy("g")
      .agg(ps.map { case (p, n) => expr(s"percentile(v, ${p}d)").as(n) }.head,
        ps.map { case (p, n) => expr(s"percentile(v, ${p}d)").as(n) }.tail: _*)
      .collect().map(r => r.getString(0) -> ps.indices.map(i => r.getDouble(i + 1))).toMap
    assert(sortBased.keySet == builtin.keySet)
    sortBased.foreach { case (g, vs) =>
      // exact double equality: both paths evaluate the same
      // v_lo + frac·(v_hi − v_lo) interpolation in the same order
      assert(vs == builtin(g), s"group $g: sort-based $vs vs builtin ${builtin(g)}")
    }
    // null handling: nulls skipped, all-null groups absent
    val withNulls = df.withColumn("v", when(col("g") === "g1", lit(null)).otherwise(col("v")))
    val sb2 = PercentileExact.grouped(withNulls, "g", "v", Seq(0.5 -> "p50"))
      .collect().map(_.getString(0)).toSet
    assert(!sb2.contains("g1") && sb2.contains("g2"))
    // multi-column form (one range-sort per value column, full-outer-
    // joined on the group): bit-identical to per-column builtins,
    // including a second column with a different distribution
    val df2 = df.withColumn("w", col("v") * col("v") - 3.0)
    val multi = PercentileExact.groupedColumns(df2, "g",
      Seq("v" -> Seq(0.5 -> "v50", 0.95 -> "v95"), "w" -> Seq(0.25 -> "w25")))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    val builtin2 = df2.groupBy("g")
      .agg(expr("percentile(v, 0.5d)").as("v50"),
        expr("percentile(v, 0.95d)").as("v95"),
        expr("percentile(w, 0.25d)").as("w25"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(multi == builtin2, s"multi-column percentiles diverged from builtin")
    // a group all-null in ONE column keeps its row with that column's
    // percentile null and the other columns' percentiles intact (the
    // builtin's shape — an inner join across per-column results would
    // silently drop the whole group)
    val df3 = df2.withColumn("w", when(col("g") === "g1", lit(null)).otherwise(col("w")))
    val partial = PercentileExact.groupedColumns(df3, "g",
      Seq("v" -> Seq(0.5 -> "v50"), "w" -> Seq(0.25 -> "w25")))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
         Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    val builtin3 = df3.groupBy("g")
      .agg(expr("percentile(v, 0.5d)").as("v50"), expr("percentile(w, 0.25d)").as("w25"))
      .collect().map(r => r.getString(0) ->
        (Option(r.get(1)).map(_.asInstanceOf[Double]),
         Option(r.get(2)).map(_.asInstanceOf[Double]))).toMap
    assert(partial.contains("g1") && partial("g1")._2.isEmpty && partial("g1")._1.nonEmpty,
      s"g1 must keep its v percentile with a null w25: ${partial.get("g1")}")
    assert(partial == builtin3, "partial-null multi-column diverged from builtin")
  }

  test("SQL catalog: tables, the five views, and functions are sql-reachable") {
    Catalog.registerAll(spark, sf)
    assert(spark.sql("SELECT count(*) FROM events_by_src_view").collect()(0).getLong(0) > 0)
    assert(spark.sql(
      "SELECT count(*) FROM events_sessions WHERE counts > 1").collect()(0).getLong(0) > 0)
    val topSql = spark.sql(
      """SELECT user_id, sum(count_values) AS counts FROM events_by_second
        |WHERE second_ts >= (SELECT date_trunc('second', max(ts)) FROM events)
        |                   - INTERVAL 60 seconds
        |GROUP BY user_id ORDER BY counts DESC, user_id LIMIT 10""".stripMargin)
      .collect().map(_.toString)
    val topDf = ClickstreamOps.queries("get_top_users")(spark, sf)
      .collect().map(_.toString)
    assert(topSql.sameElements(topDf), "SQL and DataFrame paths must agree")
    assert(spark.sql("SELECT ip_to_int('1.2.3.4')").collect()(0).getInt(0) == 16909060)
    assert(spark.sql(
      "SELECT dot_i64(array(1L,2L), array(3L,4L))").collect()(0).getLong(0) == 11L)
  }

  test("native DataSketches HLL: partition-invariant estimate within 5% of exact") {
    import org.apache.spark.sql.functions._
    val orders = graft.Tables.orders(spark, sf)
    def est(df: org.apache.spark.sql.DataFrame): Long =
      df.agg(expr("hll_sketch_estimate(hll_sketch_agg(o_custkey))")).head().getLong(0)
    val e1 = est(orders)
    val e2 = est(orders.repartition(17, col("o_orderkey")))
    // register union is order/partitioning independent -> identical
    assert(e1 == e2, s"HLL estimate must be partitioning-invariant: $e1 vs $e2")
    val exact = orders.select(countDistinct(col("o_custkey"))).head().getLong(0)
    assert(math.abs(e1 - exact).toDouble / exact < 0.05,
      s"HLL estimate $e1 too far from exact $exact")
  }
}
