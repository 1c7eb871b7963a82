package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** MERGE/upsert semantics invariants: row conservation against an
  * independently-counted changeset, and the one-shuffle plan shape. */
class RelationalOps9Spec extends SparkSpec {

  test("merge_upsert: rows = base - deletes + inserts, untouched rows pass through") {
    val orders = Tables.orders(spark, sf)
    val base = orders.count()
    // action sets counted independently of the operator's when-chain
    val deletes = orders.filter(col("o_orderkey") % 13 === 0 &&
      col("o_orderkey") % 7 =!= 0).count()
    val inserts = orders.filter(col("o_orderkey") % 11 === 0 &&
      col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 13 =!= 0).count()
    val out = RelationalOps9.queries("merge_upsert")(spark, sf).collect()
    assert(out.map(_.getLong(1)).sum == base - deletes + inserts,
      s"row conservation: $base - $deletes + $inserts")
    // per-status: statuses never change under this changeset, so each
    // status row must individually satisfy conservation
    val byStatus = orders
      .withColumn("del", col("o_orderkey") % 13 === 0 && col("o_orderkey") % 7 =!= 0)
      .withColumn("ins", col("o_orderkey") % 11 === 0 &&
        col("o_orderkey") % 7 =!= 0 && col("o_orderkey") % 13 =!= 0)
      .groupBy("o_orderstatus")
      .agg((count(lit(1)) - sum(when(col("del"), 1L).otherwise(0L)) +
        sum(when(col("ins"), 1L).otherwise(0L))).as("want"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    out.foreach(r => assert(r.getLong(1) == byStatus(r.getString(0)),
      s"status ${r.getString(0)} conservation"))
  }

  test("merge_upsert: update arm moves total price by exactly 1000 per updated key") {
    val orders = Tables.orders(spark, sf)
    import org.apache.spark.sql.types.DecimalType
    val D = DecimalType(18, 4)
    val basePlus = orders.agg(
      (sum(col("o_totalprice").cast(D)) +
        sum(when(col("o_orderkey") % 7 === 0, lit(1000).cast(D)).otherwise(lit(0).cast(D))) -
        sum(when(col("o_orderkey") % 13 === 0 && col("o_orderkey") % 7 =!= 0,
          col("o_totalprice").cast(D)).otherwise(lit(0).cast(D))) +
        sum(when(col("o_orderkey") % 11 === 0 && col("o_orderkey") % 7 =!= 0 &&
          col("o_orderkey") % 13 =!= 0,
          col("o_totalprice").cast(D)).otherwise(lit(0).cast(D)))).cast("double"))
      .head.getDouble(0)
    val got = RelationalOps9.queries("merge_upsert")(spark, sf).collect()
      .map(_.getDouble(2)).sum
    assert(math.abs(got - basePlus) < 1e-6, s"sum_price: got $got want $basePlus")
  }

  test("merge_upsert plans one equi full-outer join, no cartesian") {
    val p = RelationalOps9.queries("merge_upsert")(spark, sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("FullOuter"), s"merge must plan a full-outer join:\n$p")
    assert(!p.contains("Cartesian") && !p.contains("BroadcastNestedLoop"),
      s"merge join must be an equi join:\n$p")
  }
}
