package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** GlobalOrder must be bit-identical to the single-partition window
  * formulations it replaces — same indices, same ntile buckets — while
  * never moving the relation through one partition. */
class GlobalOrderSpec extends SparkSpec {

  test("withRowIndex matches row_number() over a global order") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    val viaWindow = orders
      .withColumn("rn0",
        row_number().over(Window.orderBy("o_totalprice", "o_orderkey")).cast("long") - 1)
    val viaZip = GlobalOrder.withRowIndex(
      orders, "rn0", col("o_totalprice"), col("o_orderkey"))
    assert(viaWindow.exceptAll(viaZip).isEmpty && viaZip.exceptAll(viaWindow).isEmpty)
  }

  test("ntileGlobal matches ntile() window for k in 3,4,7 (uneven splits)") {
    val orders = Tables.orders(spark, sf).select("o_orderkey", "o_totalprice")
    for (k <- Seq(3, 4, 7)) {
      val viaWindow = orders.withColumn("b",
        ntile(k).over(Window.orderBy("o_totalprice", "o_orderkey")))
      val viaZip = GlobalOrder.ntileGlobal(
        orders, k, "b", col("o_totalprice"), col("o_orderkey"))
      assert(viaWindow.exceptAll(viaZip).isEmpty && viaZip.exceptAll(viaWindow).isEmpty,
        s"ntileGlobal($k) diverged from the window ntile")
    }
  }

  test("ntileGlobal handles fewer rows than buckets") {
    val tiny = Tables.region(spark, sf).select("r_regionkey")
    val viaWindow = tiny.withColumn("b", ntile(9).over(Window.orderBy("r_regionkey")))
    val viaZip = GlobalOrder.ntileGlobal(tiny, 9, "b", col("r_regionkey"))
    assert(viaWindow.exceptAll(viaZip).isEmpty && viaZip.exceptAll(viaWindow).isEmpty)
  }
}
