package graft

import org.apache.spark.sql.execution.QueryExecution
import org.apache.spark.sql.functions._
import org.apache.spark.sql.util.QueryExecutionListener

/** ST9 complement: `Dataset.observe` + QueryExecutionListener is the
  * Spark-native per-query metrics hook (the @Statistics analogue for
  * batch plans — RateMonitor covers the streaming side). The metrics
  * ride the plan (CollectMetrics node), so they cost one pass over
  * rows already flowing — no second job. */
class ObserveMetricsSpec extends SparkSpec {

  test("observe() metrics surface through the listener with exact values") {
    @volatile var seen: Option[org.apache.spark.sql.Row] = None
    val listener = new QueryExecutionListener {
      override def onSuccess(funcName: String, qe: QueryExecution,
                             durationNs: Long): Unit =
        qe.observedMetrics.get("ev_metrics").foreach(r => seen = Some(r))
      override def onFailure(funcName: String, qe: QueryExecution,
                             exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    try {
      val ev = Tables.events(spark, sf)
      val df = ev.observe("ev_metrics",
        count(lit(1)).as("n_rows"),
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4)))
          .as("value_sum"),
        count(when(col("event_type") === "error", 1)).as("n_errors"))
      val nCollected = df.collect().length.toLong

      // the listener is invoked asynchronously on the listener bus
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (seen.isEmpty && System.nanoTime() < deadline) Thread.sleep(50)
      assert(seen.isDefined, "observed metrics never reached the listener")
      val m = seen.get
      assert(m.getAs[Long]("n_rows") == nCollected,
        "observe must count exactly the rows that flowed")
      val expectErrors = ev.filter(col("event_type") === "error").count()
      assert(m.getAs[Long]("n_errors") == expectErrors)
      val expectSum = ev.agg(
        sum(col("value").cast(org.apache.spark.sql.types.DecimalType(18, 4))))
        .collect()(0).getDecimal(0)
      assert(m.getDecimal(1) == expectSum, "decimal sum must be exact")
    } finally spark.listenerManager.unregister(listener)
  }
}
