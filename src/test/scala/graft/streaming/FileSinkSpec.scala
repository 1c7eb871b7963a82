package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.ClickstreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The at-rest tier: continuously-maintained per-second counts written
  * to checkpointed parquet files in append mode — the reference's
  * "materialized view" leg with an exactly-once file sink (ST7;
  * checkpoint + idempotent sink replaces the rename-harvest dance S9).
  * Append mode only emits windows the watermark has passed: closed
  * windows are final (incremental maintenance invariant). */
class FileSinkSpec extends SparkSpec {
  import SessionDedup.Ev

  test("windowed agg → checkpointed parquet sink: emitted windows are final and correct") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val base = java.nio.file.Files.createTempDirectory("graft_sink").toString
    val input = MemoryStream[Ev]
    val agg = StreamingViews.eventsBySecond(input.toDF())
    val q = agg.writeStream.outputMode("append")
      .option("checkpointLocation", s"$base/ckpt")
      .format("parquet").option("path", s"$base/data")
      .start()
    try {
      val evs = Tables.events(spark, sf)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .as[Ev].collect().toSeq.sortBy(e => SessionDedup.micros(e.ts))
      val (b1, b2) = evs.splitAt(evs.size / 2)
      input.addData(b1); q.processAllAvailable()
      input.addData(b2); q.processAllAvailable()
      // sentinel far in the future pushes the watermark past every
      // real window so they all emit and close
      input.addData(Ev(-1L, -1L, "sentinel",
        new java.sql.Timestamp(evs.last.ts.getTime + 3600 * 1000), 0.0))
      q.processAllAvailable()

      val emitted = spark.read.parquet(s"$base/data")
        .filter(col("user_id") >= 0)
        .select("second_ts", "user_id", "count_values")
        .collect().map(_.toString).sorted
      val want = ClickstreamOps.eventsBySecond(spark, sf)
        .collect().map(_.toString).sorted
      assert(emitted.length == want.length,
        s"sink has ${emitted.length} windows, batch says ${want.length}")
      assert(emitted.sameElements(want))
    } finally q.stop()
  }
}
