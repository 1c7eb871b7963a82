package graft.operators

import graft.SparkSpec

/** Plan-shape invariants for the Q7/Q10/Q19 tranche (values are the
  * oracle's job). */
class RelationalOps6Spec extends SparkSpec {

  private def plan(name: String): String =
    RelationalOps6.queries(name)(spark, sf).queryExecution.executedPlan.toString

  test("q7: nation hops broadcast, no cartesian") {
    val p = plan("q7_nation_volume")
    assert(p.contains("BroadcastHashJoin"), "dims must broadcast")
    assert(!p.contains("CartesianProduct"))
  }

  test("q10: returned-flag filter reaches the lineitem scan") {
    val p = plan("q10_returned_customers")
    assert(p.contains("PushedFilters") && p.contains("l_returnflag"),
      s"returnflag not pushed:\n$p")
    assert(p.contains("TakeOrderedAndProject"), "top-20 must short-circuit")
  }

  test("q19: disjunctive bands stay row-local behind a broadcast part join") {
    val p = plan("q19_disjunctive_revenue")
    assert(p.contains("BroadcastHashJoin"), "part joins via the equi-key")
    assert(!p.contains("CartesianProduct"),
      "OR bands must not defeat the equi-join extraction")
  }
}
