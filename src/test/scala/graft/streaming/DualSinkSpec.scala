package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.ClickstreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** F6/ST7: the dual-sink hot path — every event lands in the events
  * store; only session-opening events land in the export store
  * (NewEvent.java:70-76). Both sinks are checkpointed file sinks fed
  * from one source; counts must reconcile exactly with the batch
  * oracle-checked forms. */
class DualSinkSpec extends SparkSpec {
  import SessionDedup.Ev

  test("one source, two checkpointed sinks: events=all, export=session starts") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_dual").toString
    val input = MemoryStream[Ev]

    val eventsQ = input.toDF().writeStream
      .option("checkpointLocation", s"$base/ckpt_events")
      .format("parquet").option("path", s"$base/events").start()
    val exportQ = SessionDedup.dedup(input.toDS())(spark).writeStream
      .option("checkpointLocation", s"$base/ckpt_export")
      .format("parquet").option("path", s"$base/export").start()
    try {
      val evs = Tables.events(spark, sf)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .as[Ev].collect().toSeq.sortBy(e => SessionDedup.micros(e.ts))
      evs.grouped(400).foreach { b =>
        input.addData(b)
        eventsQ.processAllAvailable(); exportQ.processAllAvailable()
      }
      val eventsOut = spark.read.parquet(s"$base/events")
      val exportOut = spark.read.parquet(s"$base/export")
      assert(eventsOut.count() == evs.size)
      val wantExport = ClickstreamOps.queries("session_export")(spark, sf)
        .select("event_id").collect().map(_.getLong(0)).sorted
      val gotExport = exportOut.select("event_id")
        .collect().map(_.getLong(0)).sorted
      assert(gotExport.sameElements(wantExport))
    } finally { eventsQ.stop(); exportQ.stop() }
  }
}
