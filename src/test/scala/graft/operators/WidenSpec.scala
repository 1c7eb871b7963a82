package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The scale-adaptive parallelism guard: Widen must repair single-task
  * scans locally and be a provable NO-OP when the input already
  * carries at least the session's parallelism — the property that
  * makes it safe to leave in 100 TB plans. */
class WidenSpec extends SparkSpec {

  test("widen spreads a single-partition relation to the session parallelism") {
    val df = spark.range(0, 1000).coalesce(1).toDF("id")
    assert(df.queryExecution.toRdd.getNumPartitions == 1)
    val w = Widen(df)
    assert(w.queryExecution.toRdd.getNumPartitions ==
      spark.sparkContext.defaultParallelism)
    // row multiset unchanged
    assert(w.agg(count(lit(1)), sum("id")).collect()(0).toSeq ==
      df.agg(count(lit(1)), sum("id")).collect()(0).toSeq)
  }

  test("widen is a no-op (same plan, no added exchange) at or above parallelism") {
    val p = spark.sparkContext.defaultParallelism
    val df = spark.range(0, 1000, 1, p).toDF("id")
    val w = Widen(df)
    // the SAME Dataset comes back — no repartition node was added
    assert(w eq df, "Widen must short-circuit when partitions >= parallelism")
  }

  test("widen refuses exchange-bearing plans (misuse degrades to no-op, not early AQE)") {
    // an aggregate carries a shuffle Exchange: probing its toRdd would
    // materialize AQE stages at plan-construction time — the guard must
    // hand the plan back untouched instead
    val agg = spark.range(0, 1000).coalesce(1).toDF("id")
      .groupBy(expr("id % 7").as("k")).agg(count(lit(1)).as("c"))
    val w = Widen(agg)
    assert(w eq agg, "Widen must be a no-op on plans containing an Exchange")
  }
}
