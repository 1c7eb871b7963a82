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
}
