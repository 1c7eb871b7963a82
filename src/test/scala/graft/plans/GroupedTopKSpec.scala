package graft.plans

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom per-key top-k physical operator must be row-equivalent
  * to the window-rank formulation and plan exactly one exchange. */
class GroupedTopKSpec extends SparkSpec {

  test("heap operator == window rank on the full orders table, k=3") {
    val ord = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val viaHeap = GroupedTopK.topKPerKey(ord, Seq("o_custkey"),
        Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = ord.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(viaHeap == viaWindow,
      s"heap/window diverge: ${(viaHeap -- viaWindow).take(3)} / ${(viaWindow -- viaHeap).take(3)}")
  }

  test("k larger than every group returns all rows") {
    val ord = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val all = GroupedTopK.topKPerKey(ord, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 1000000)
    assert(all.count() == ord.count(), "oversized k must be a no-op filter")
  }

  test("plan shape: GroupedTopKExec behind exactly one exchange") {
    val ord = Tables.orders(spark, sf)
      .select("o_custkey", "o_orderkey", "o_totalprice")
    val df = GroupedTopK.topKPerKey(ord, Seq("o_custkey"),
      Seq(("o_totalprice", true), ("o_orderkey", false)), 3)
    df.queryExecution.toRdd.count()
    val plan = df.queryExecution.executedPlan.toString
      .split("== Initial Plan ==").head
    assert(plan.contains("GroupedTopK"), s"custom exec missing:\n$plan")
    assert("Exchange".r.findAllIn(plan).size == 1,
      s"expected exactly the ClusteredDistribution exchange:\n$plan")
    assert(!plan.contains("Window") && !plan.contains("Sort"),
      s"the heap operator must not fall back to sort/window:\n$plan")
  }

  test("rewrite declines on estimated high key-cardinality (stats veto, window fallback)") {
    import org.apache.spark.sql.expressions.Window
    import org.apache.spark.sql.functions._
    // every id its own key, 10 billion rows: range() carries exact
    // rowCount stats, so the estimated retained heap (rows × avgRow /
    // tasks) dwarfs the per-task budget — the rewrite must decline and
    // keep the spillable window form. Plan-only check (nothing runs).
    def planFor(n: Long): String = {
      val df = spark.range(n).withColumn("grp", col("id"))
        .withColumn("rn", row_number().over(
          Window.partitionBy("grp").orderBy("id"))) // high-cardinality key
        .filter(col("rn") <= 3).select("id", "grp")
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    }
    val big = planFor(10L * 1000 * 1000 * 1000)
    assert(big.contains("Window") && !big.contains("GroupedTopK"),
      s"rewrite must decline when stats exceed the heap budget:\n$big")
    // same shape, small input: well inside the budget, rewrite fires
    val small = planFor(10000L)
    assert(small.contains("GroupedTopK") && !small.contains("Window"),
      s"rewrite must still fire inside the budget:\n$small")
    // the budget is a conf: shrinking it to 1 byte vetoes even tiny inputs
    val key = GroupedTopK.GroupedTopKRewrite.MaxHeapBytesKey
    spark.conf.set(key, "1")
    try {
      val tiny = planFor(10000L)
      assert(tiny.contains("Window") && !tiny.contains("GroupedTopK"),
        s"budget conf not honored:\n$tiny")
    } finally spark.conf.unset(key)
  }
}
