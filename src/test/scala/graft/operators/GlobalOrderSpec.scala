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

  test("withRunningSum widens integral types and rejects fractional/null input") {
    import spark.implicits._
    // IntegerType input: previously a ClassCastException in getLong;
    // now widened to long up front and matches the window running sum
    val ints = Seq((1, 10), (2, 20), (3, 30)).toDF("k", "v")
    val got = GlobalOrder.withRunningSum(ints, "v", "cum", col("k"))
      .orderBy("k").select("cum").as[Long].collect().toSeq
    assert(got == Seq(10L, 30L, 60L))
    // fractional types: loud require, not silent truncation
    val dbl = Seq((1, 1.5)).toDF("k", "v")
    val e = intercept[IllegalArgumentException] {
      GlobalOrder.withRunningSum(dbl, "v", "cum", col("k"))
    }
    assert(e.getMessage.contains("integral"))
    // nulls: loud per-row rejection, not an NPE deep in foldLeft
    val nulls = Seq((1, Some(10L)), (2, None)).toDF("k", "v")
    val e2 = intercept[Exception] {
      GlobalOrder.withRunningSum(nulls, "v", "cum", col("k")).collect()
    }
    val msgs = Iterator.iterate(e2: Throwable)(_.getCause).takeWhile(_ != null)
      .flatMap(t => Option(t.getMessage)).toSeq
    assert(msgs.exists(_.contains("coalesce")), s"unexpected failure chain: $msgs")
  }

  test("ntileGlobal handles fewer rows than buckets") {
    val tiny = Tables.region(spark, sf).select("r_regionkey")
    val viaWindow = tiny.withColumn("b", ntile(9).over(Window.orderBy("r_regionkey")))
    val viaZip = GlobalOrder.ntileGlobal(tiny, 9, "b", col("r_regionkey"))
    assert(viaWindow.exceptAll(viaZip).isEmpty && viaZip.exceptAll(viaWindow).isEmpty)
  }
}
