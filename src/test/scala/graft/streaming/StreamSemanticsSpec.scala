package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Remaining streaming-semantics evidence: stream-static broadcast
  * enrichment (the J5 hot-path join in actual streaming execution),
  * ST5 late-data handling (watermark drops a too-late row from an
  * append-mode windowed agg), and sink compaction. */
class StreamSemanticsSpec extends SparkSpec {
  import SessionDedup.Ev

  test("stream-static broadcast join enriches a live stream (J5)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val dim = Seq(("click", 0L), ("view", 1L), ("purchase", 2L),
      ("signup", 3L), ("error", 4L)).toDF("key", "dest_id")
    val input = MemoryStream[Ev]
    val enriched = input.toDF()
      .join(broadcast(dim), col("event_type") === col("key"))
      .select("event_id", "dest_id")
    val q = enriched.writeStream.outputMode("append")
      .format("memory").queryName("enrich_stream").start()
    try {
      val evs = Tables.events(spark, sf)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .as[Ev].collect().toSeq
      input.addData(evs); q.processAllAvailable()
      val out = spark.table("enrich_stream")
      assert(out.count() == evs.size, "every event must resolve its dim id")
      assert(out.select("dest_id").distinct().count() == 5)
    } finally q.stop()
  }

  test("watermark drops a too-late event from an append-mode windowed agg (ST5)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val input = MemoryStream[Ev]
    val agg = StreamingViews.eventsBySecond(input.toDF()) // 5s watermark
    val q = agg.writeStream.outputMode("append")
      .format("memory").queryName("late_probe").start()
    try {
      def ev(id: Long, sec: Long) = Ev(id, 1L, "click",
        new java.sql.Timestamp(1700000000000L + sec * 1000), 0.0)
      input.addData(Seq(ev(1, 0), ev(2, 100))); q.processAllAvailable()
      // watermark is now 95s; second 0 closed and emitted
      input.addData(Seq(ev(3, 0))); q.processAllAvailable() // too late — dropped
      input.addData(Seq(ev(4, 200))); q.processAllAvailable() // closes second 100
      val rows = spark.table("late_probe")
        .select(unix_timestamp(col("second_ts")).as("sec"), col("count_values"))
        .collect().map(r => (r.getLong(0) - 1700000000L, r.getLong(1))).toMap
      assert(rows.get(0L).contains(1L),
        s"late event must NOT be counted into the closed window: $rows")
      assert(rows.get(100L).contains(1L))
    } finally q.stop()
  }

  test("VersionedStore.compact collapses micro-batch file litter atomically") {
    val root = java.nio.file.Files.createTempDirectory("graft_cpt").toString + "/sink"
    graft.sources.VersionedStore.publish(
      Tables.events(spark, sf).repartition(16), root)
    val n0 = graft.sources.VersionedStore.read(spark, root).count()
    val (v, before, after) = graft.sources.VersionedStore.compact(spark, root, 2)
    assert(v == 2 && before >= 16 && after <= 2, s"v=$v before=$before after=$after")
    assert(graft.sources.VersionedStore.read(spark, root).count() == n0)
  }
}
