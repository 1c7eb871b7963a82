package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics invariants for the LATERAL / session_window tranche. */
class RelationalOps5Spec extends SparkSpec {

  test("lateral top-3 equals the window-rank formulation and decorrelates") {
    val lat = RelationalOps5.queries("lateral_top_orders")(spark, sf)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val viaWindow = Tables.orders(spark, sf)
      .filter(col("o_custkey") <= 100)
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey").as("c_custkey"), col("o_orderkey"), col("o_totalprice"))
    // LATERAL keeps only customers that exist in `customer`, the window
    // form only custkeys present in orders — compare on the overlap
    val custs = Tables.customer(spark, sf).select("c_custkey")
    assert(lat.exceptAll(viaWindow.join(custs, "c_custkey")).count() == 0)
    assert(viaWindow.join(custs, "c_custkey").exceptAll(lat).count() == 0)
    val plan = lat.queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"),
      "LATERAL must decorrelate, not re-execute per row")
  }

  test("session_window islands: disjoint, gap-separated, conserving") {
    val sess = RelationalOps5.queries("session_window_islands")(spark, sf)
    val total = sess.agg(sum("n_events")).collect()(0).getLong(0)
    assert(total == Tables.events(spark, sf).count(),
      "every event belongs to exactly one session")
    assert(sess.filter(col("session_start") > col("session_end")).count() == 0)
    // consecutive sessions of the same user start ≥ 30 min after the
    // previous session's last event (the gap that split them)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("session_start")
    val gaps = sess
      .withColumn("prev_end", lag("session_end", 1).over(w))
      .filter(col("prev_end").isNotNull)
      .filter(expr("unix_micros(session_start) - unix_micros(prev_end)") < 30L * 60 * 1000000)
    assert(gaps.count() == 0, "adjacent sessions closer than the 30-min gap")
  }
}
