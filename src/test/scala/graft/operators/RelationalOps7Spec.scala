package graft.operators

import graft.SparkSpec

/** Plan-shape invariants for the Q8/Q13/Q15/Q18/Q21/Q22 tranche
  * (values are the oracle's job). */
class RelationalOps7Spec extends SparkSpec {

  private def plan(name: String): String =
    RelationalOps7.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q8: all dims broadcast, no cartesian despite the 8-table join") {
    val p = plan("q8_market_share")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q13: orders aggregate to per-customer counts BEFORE the outer join") {
    val p = plan("q13_order_distribution")
    // the outer join input must be the aggregated (custkey, cnt) tier,
    // so a HashAggregate appears below the join in the plan tree
    assert(p.contains("HashAggregate"))
    assert(p.contains("LeftOuter") || p.contains("RightOuter"),
      s"outer join missing:\n$p")
    assert(!p.contains("CartesianProduct"))
  }

  test("q15: ship-date range reaches the lineitem scan") {
    val p = plan("q15_top_supplier")
    assert(p.contains("PushedFilters") && p.contains("l_shipdate"),
      s"shipdate not pushed:\n$p")
  }

  test("q18: semi join against the HAVING tier, top-100 short-circuits") {
    val p = plan("q18_large_orders")
    assert(p.contains("LeftSemi"), "IN subquery must plan as a semi join")
    assert(p.contains("TakeOrderedAndProject"), "top-100 must short-circuit")
  }

  test("q21: both correlated EXISTS legs plan as semi/anti joins") {
    val p = plan("q21_sole_returned_supplier")
    assert(p.contains("LeftSemi"), "EXISTS leg")
    assert(p.contains("LeftAnti"), "NOT EXISTS leg")
    assert(p.contains("TakeOrderedAndProject"))
    assert(!p.contains("CartesianProduct"))
  }

  test("q22: scalar threshold broadcasts; no-urgent-orders is an anti join") {
    val p = plan("q22_idle_rich_customers")
    assert(p.contains("LeftAnti"), "NOT EXISTS must plan as an anti join")
    assert(!p.contains("CartesianProduct"),
      "the 1-row threshold must ride a broadcast nested loop, not a cartesian")
  }
}
