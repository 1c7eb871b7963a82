package graft

/** Physical-plan discipline audit: correctness tests prove WHAT the
  * queries return; these prove the plans are the ones we'd want at
  * 100 TB — dims broadcast, scans filtered at the source, hot
  * aggregations inside whole-stage codegen, and no accidental
  * cartesian products (the intentional ones — ANN brute force,
  * pairwise cosine — are exactly that, intentional and LSH-bounded).
  */
class PlanAuditSpec extends SparkSpec {

  private def finalPlan(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.toRdd.count() // materialize so AQE settles on the real plan
    df.queryExecution.executedPlan.toString
  }

  test("dim joins stay broadcast (q3/q5/q14 — J1/J2 parity at any fact size)") {
    for (q <- Seq("q3_shipping", "q5_region_revenue", "q14_promo_share")) {
      val plan = finalPlan(q)
      assert(plan.contains("BroadcastHashJoin"), s"$q lost its broadcast join:\n$plan")
      assert(!plan.contains("CartesianProduct"), s"$q degenerated to a cartesian:\n$plan")
    }
  }

  test("flagship aggregation runs inside whole-stage codegen with partial aggregation") {
    val plan = finalPlan("q1_pricing")
    // AQE's tree string marks codegen stages with "*(n)" prefixes
    assert(plan.contains("WholeStageCodegen") || plan.contains("*("),
      s"q1 fell out of codegen:\n$plan")
    assert(plan.contains("HashAggregate"), s"q1 not hash-aggregated:\n$plan")
    // partial/final pair: two HashAggregate nodes around the exchange
    assert("HashAggregate".r.findAllIn(plan).size >= 2,
      s"q1 lost map-side partial aggregation:\n$plan")
  }

  test("selective scans push their filters into the parquet source") {
    val df = SparkEntry.queries("q6_revenue_delta")(spark, sf)
    val scan = df.queryExecution.executedPlan.toString
    assert(scan.contains("PushedFilters: ["), s"q6 scan has no pushed filters:\n$scan")
    assert(!scan.contains("PushedFilters: []"), s"q6 pushed-filter list is empty:\n$scan")
  }

  test("top-k queries short-circuit via TakeOrderedAndProject, not a global sort") {
    for (q <- Seq("get_top_sources", "returned_revenue_topk")) {
      val plan = finalPlan(q)
      assert(plan.contains("TakeOrderedAndProject"), s"$q does a full sort for a top-k:\n$plan")
    }
  }

  test("relational tranche is cartesian-free") {
    // every oracle-checked relational query must join on keys; a plan
    // regression to a cross product would still pass correctness at
    // sf0.01 and then melt at scale — catch it here
    for (q <- Seq("join_orders_customer", "q4_order_priority", "full_outer_daily",
      "semi_join_big_spenders", "anti_join_no_orders", "asof_last_order",
      "range_join_error_window")) {
      val plan = finalPlan(q)
      assert(!plan.contains("CartesianProduct"), s"$q plans a cartesian product:\n$plan")
    }
  }
}
