package graft.operators

import graft.SparkSpec

/** Plan-shape invariants for the Q12/Q17 tranche (values are the
  * oracle's job). */
class RelationalOps8Spec extends SparkSpec {

  private def plan(name: String): String =
    RelationalOps8.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q12: equi join on the order key, no cartesian from the date band") {
    val p = plan("q12_late_shipments")
    // the column-vs-column band must ride the equi join as a post-join
    // condition, never degrade the join to a nested loop
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"date band degraded the join:\n$p")
    assert(p.contains("HashAggregate"), "conditional counts must partial-agg")
  }

  test("q12: both priority splits cover every joined row") {
    val rows = RelationalOps8.queries("q12_late_shipments")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(1) > 0L && r.getLong(2) > 0L,
        "both priority classes should appear in a uniform priority draw")
    }
  }

  test("q17: part slice broadcasts; per-part tier reuses the l_partkey key") {
    val p = plan("q17_small_qty_revenue")
    assert(p.contains("BroadcastHashJoin"), "filtered part dim must broadcast")
    assert(!p.contains("CartesianProduct"))
    assert(p.contains("PushedFilters") && p.contains("p_brand"),
      s"brand filter not pushed to the part scan:\n$p")
  }

  test("q17: threshold keeps only below-20%-of-average lines") {
    import org.apache.spark.sql.functions._
    val s = spark
    val li = graft.Tables.lineitem(s, sf)
    // recompute one qualifying part's average by hand and check the
    // operator's multiplicative threshold agrees with qty < 0.2*avg
    val perPart = li.groupBy("l_partkey")
      .agg(avg(col("l_quantity")).as("av"), count(lit(1)).as("n"))
      .filter(col("n") >= 10).limit(1).collect()
    assert(perPart.nonEmpty)
    val pk = perPart(0).getLong(0); val av = perPart(0).getDouble(1)
    val below = li.filter(col("l_partkey") === pk &&
      col("l_quantity") < lit(0.2) * lit(av)).count()
    val tier = li.filter(col("l_partkey") === pk)
      .join(li.groupBy(col("l_partkey").as("pk"))
        .agg(sum(col("l_quantity").cast("decimal(18,4)")).as("sq"),
          count(lit(1)).as("cq")), col("l_partkey") === col("pk"))
    val multi = tier
      .filter(col("l_quantity").cast("decimal(18,4)") * lit(5) * col("cq") < col("sq"))
      .count()
    // a row sitting EXACTLY on 0.2*avg is excluded by the exact strict
    // '<' but may round either way under the double comparison — allow
    // the boundary count as slack
    val onBoundary = tier
      .filter(col("l_quantity").cast("decimal(18,4)") * lit(5) * col("cq") === col("sq"))
      .count()
    assert(math.abs(multi - below) <= onBoundary,
      s"multiplicative threshold disagrees with 0.2*avg: $multi vs $below (boundary $onBoundary)")
  }
}
