package graft.server

import graft.SparkSpec

/** The serving tier must stay materialized across refreshes (the
  * CacheManager plan-identity trap) and must never scan the fact
  * table on a dashboard read. */
class ServingTierSpec extends SparkSpec {

  test("dashboard reads hit the materialized tier, and refresh() keeps it that way") {
    val tier = new ServingTier(spark, sf)
    val r1 = tier.getTopUsers(60, 10).collect().map(_.toString)
    assert(r1.nonEmpty)
    val plan1 = tier.getTopUsers(60, 10).queryExecution.executedPlan.toString
    assert(!plan1.contains("Scan parquet"),
      s"dashboard read must serve from the materialized tier:\n$plan1")

    // the trap: a second refresh used to self-evict via cache-identity
    tier.refresh()
    val r2 = tier.getTopUsers(60, 10).collect().map(_.toString)
    assert(r2.sameElements(r1), "same data → same answer after refresh")
    val plan2 = tier.getTopUsers(60, 10).queryExecution.executedPlan.toString
    assert(!plan2.contains("Scan parquet"),
      s"tier must STILL be materialized after refresh:\n$plan2")

    val r3 = tier.getTopSrcDests(5).collect()
    assert(r3.length == 5)
  }
}
