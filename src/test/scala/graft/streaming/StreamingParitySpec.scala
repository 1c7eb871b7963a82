package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.ClickstreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The continuously-maintained views must equal their batch forms on
  * identical input — the incremental-view-maintenance contract the
  * reference's materialized views provide (SURVEY.md §4 row 1). */
class StreamingParitySpec extends SparkSpec {
  import SessionDedup.Ev

  private def loadEvents(): Seq[Ev] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts", "value")
      .as[Ev].collect().toSeq.sortBy(e => SessionDedup.micros(e.ts))
  }

  test("streaming events_by_second == batch events_by_second") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = StreamingViews.eventsBySecond(input.toDF())
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ebs_stream").start()
    try {
      val evs = loadEvents()
      val (b1, b2) = evs.splitAt(evs.size / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      val got = spark.table("ebs_stream")
        .select("second_ts", "user_id", "count_values")
        .collect().map(_.toString).sorted
      val want = ClickstreamOps.eventsBySecond(spark, sf)
        .select("second_ts", "user_id", "count_values")
        .collect().map(_.toString).sorted
      assert(got.length == want.length)
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("streaming events_by_src_view (dedup → lifetime counts) == batch export-derived view") {
    import spark.implicits._
    implicit val sparkSession = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    // the reference view aggregates the export stream: chain the
    // session dedup into the lifetime count (ddl.sql:92-95).
    // Spark flags any agg downstream of flatMapGroupsWithState under
    // the global-watermark correctness check; it is safe HERE because
    // the downstream aggregate is an unwindowed lifetime count in
    // complete mode — it has no watermark-based eviction, so "late"
    // rows cannot be discarded. (Production alternative: land the
    // export stream in a sink and aggregate that — DualSinkSpec.)
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val agg = StreamingViews.eventsBySrc(SessionDedup.dedup(input.toDS()).toDF())
    val q = agg.writeStream.outputMode("complete")
      .format("memory").queryName("ebsrc_stream").start()
    try {
      val evs = loadEvents()
      evs.grouped(400).foreach { chunk => input.addData(chunk); q.processAllAvailable() }
      val got = spark.table("ebsrc_stream").collect().map(_.toString).sorted
      val want = ClickstreamOps.queries("ev_by_src")(spark, sf)
        .collect().map(_.toString).sorted
      assert(got.sameElements(want))
    } finally q.stop()
  }

  test("dedupRich (enriched shape) gates the same events as dedup (shared gapGate)") {
    import spark.implicits._
    implicit val sparkSession = spark
    implicit val sqlCtx = spark.sqlContext
    val evs = loadEvents()
    val richIn = MemoryStream[SessionDedup.RichEv]
    val q = SessionDedup.dedupRich(richIn.toDS())
      .writeStream.outputMode("append").format("memory").queryName("rich_stream").start()
    try {
      val rich = evs.map(e => SessionDedup.RichEv(e.event_id, e.user_id, e.event_type,
        e.ts, e.value, Some(e.event_id % 50), None, Some(e.event_id % 75), 3))
      rich.grouped(rich.size / 3 + 1).foreach { b => richIn.addData(b); q.processAllAvailable() }
      val got = spark.table("rich_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted
      val want = ClickstreamOps.queries("session_export")(spark, sf)
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(got.sameElements(want),
        s"enriched gate diverged from the batch gate: ${got.length} vs ${want.length}")
      // enrichment columns survive the gate to the sink
      val row = spark.table("rich_stream").first()
      assert(row.schema.fieldNames.contains("dest_id") && row.schema.fieldNames.contains("cluster"))
    } finally q.stop()
  }

  test("streaming 30s-gap session dedup == batch lag-based session_export") {
    import spark.implicits._
    implicit val sparkSession = spark
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val deduped = SessionDedup.dedup(input.toDS())
    val q = deduped.writeStream.outputMode("append")
      .format("memory").queryName("sess_stream").start()
    try {
      val evs = loadEvents()
      val (b1, rest) = evs.splitAt(evs.size / 3)
      val (b2, b3) = rest.splitAt(rest.size / 2)
      Seq(b1, b2, b3).foreach { b => input.addData(b); q.processAllAvailable() }
      val got = spark.table("sess_stream").select("event_id")
        .collect().map(_.getLong(0)).sorted
      val want = ClickstreamOps.queries("session_export")(spark, sf)
        .select("event_id").collect().map(_.getLong(0)).sorted
      assert(got.length == want.length,
        s"streaming emitted ${got.length}, batch ${want.length}")
      assert(got.sameElements(want))
    } finally q.stop()
  }
}
