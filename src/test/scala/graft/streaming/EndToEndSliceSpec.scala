package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.ClickstreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** SURVEY.md §7.2 — the engine's spine, end to end: event stream →
  * events_by_second streaming aggregation (A4) → queryable sink →
  * GetTopUsers(60,10) re-aggregation (A7+T1) served FROM the
  * continuously-maintained view, exactly like the reference dashboard
  * (which never scans the fact table). Result must equal the batch
  * oracle-checked query. */
class EndToEndSliceSpec extends SparkSpec {
  import SessionDedup.Ev

  test("stream → per-second view → GetTopUsers served from the view == batch oracle query") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = StreamingViews.eventsBySecond(input.toDF())
      .writeStream.outputMode("complete")
      .format("memory").queryName("events_by_second_live").start()
    try {
      val evs = Tables.events(spark, sf)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .as[Ev].collect().toSeq.sortBy(e => SessionDedup.micros(e.ts))
      evs.grouped(300).foreach { b => input.addData(b); q.processAllAvailable() }

      // the dashboard read path: A7 re-agg over the LIVE view table
      val view = spark.table("events_by_second_live")
      val asof = view.agg(max(col("second_ts")).as("asof_ts"))
      val topUsers = view.crossJoin(broadcast(asof))
        .filter(col("second_ts") >= col("asof_ts") - expr("INTERVAL 60 seconds"))
        .groupBy("user_id").agg(sum("count_values").as("counts"))
        .orderBy(col("counts").desc, col("user_id")).limit(10)

      val got = topUsers.collect().map(_.toString)
      val want = ClickstreamOps.queries("get_top_users")(spark, sf)
        .collect().map(_.toString)
      assert(got.sameElements(want),
        s"served-from-view ${got.toSeq} != batch ${want.toSeq}")
    } finally q.stop()
  }
}
