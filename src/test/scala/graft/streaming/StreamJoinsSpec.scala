package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Stream-stream interval join and native session_window must equal
  * their batch forms on identical input — same parity contract as the
  * five views (StreamingParitySpec). */
class StreamJoinsSpec extends SparkSpec {
  import SessionDedup.Ev

  private def loadEvents(): Seq[Ev] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts", "value")
      .as[Ev].collect().toSeq.sortBy(e => SessionDedup.micros(e.ts))
  }

  test("streaming interval join == batch interval join") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val errIn = MemoryStream[Ev]
    val allIn = MemoryStream[Ev]
    val joined = StreamJoins.errorFollowJoin(
      errIn.toDF().withWatermark("ts", "2 hours"),
      allIn.toDF().withWatermark("ts", "2 hours"))
    val q = joined.select("probe_id", "b_id").writeStream
      .outputMode("append").format("memory").queryName("ssj_stream").start()
    try {
      val evs = loadEvents()
      val (b1, b2) = evs.splitAt(evs.size / 2)
      errIn.addData(b1); allIn.addData(b1); q.processAllAvailable()
      errIn.addData(b2); allIn.addData(b2); q.processAllAvailable()
      val batch = Tables.events(spark, sf)
        .select("event_id", "user_id", "event_type", "ts", "value")
      val want = StreamJoins.errorFollowJoin(batch, batch)
        .select("probe_id", "b_id").collect().map(_.toString).sorted
      val got = spark.table("ssj_stream").collect().map(_.toString).sorted
      assert(got.length == want.length, s"got ${got.length} want ${want.length}")
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("streaming session_window == batch session_window") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = StreamJoins.sessionWindowStats(
      input.toDF().withWatermark("ts", "1 hour"))
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("sw_stream").start()
    try {
      val evs = loadEvents()
      evs.grouped(500).foreach { c => input.addData(c); q.processAllAvailable() }
      val batch = Tables.events(spark, sf)
        .select("event_id", "user_id", "event_type", "ts", "value")
      val want = StreamJoins.sessionWindowStats(batch)
        .collect().map(_.toString).sorted
      val got = spark.table("sw_stream").collect().map(_.toString).sorted
      assert(got.length == want.length, s"got ${got.length} want ${want.length}")
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("session_window stats agree with the lag-based session definition") {
    // session COUNT distribution must match the independent lag-gap
    // formulation used by ev_sessions/session_export (same 30-s gap)
    val batch = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts", "value")
    val sw = StreamJoins.sessionWindowStats(batch)
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("user_id").orderBy("ts", "event_id")
    val lagged = batch
      .withColumn("prev", lag(col("ts"), 1).over(w))
      .withColumn("new_session",
        when(col("prev").isNull ||
          unix_micros(col("ts")) - unix_micros(col("prev")) > 30000000L, 1L)
          .otherwise(0L))
    val nSessions = lagged.agg(sum("new_session")).collect()(0).getLong(0)
    assert(sw.count() == nSessions, "session count must match lag formulation")
    assert(sw.agg(sum("n_events")).collect()(0).getLong(0) == batch.count())
  }
}
