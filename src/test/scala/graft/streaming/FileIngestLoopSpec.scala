package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** The Kafka-less production ingestion shape (S1 at-rest variant): new
  * event files land in a drop directory; each scheduled run starts the
  * checkpointed file-source query with Trigger.AvailableNow, processes
  * exactly the unseen files through the enrichment projection, appends
  * to the sink, and terminates. Checkpointed source offsets give
  * exactly-once across runs — the reference achieved the same handoff
  * with its directory-rename harvest (SURVEY.md S9); here it is native.
  */
class FileIngestLoopSpec extends SparkSpec {

  test("AvailableNow file-source loop processes each dropped file exactly once") {
    val base = java.nio.file.Files.createTempDirectory("graft_drop").toString
    val dropDir = s"$base/drop"
    val sinkDir = s"$base/sink"
    val ckpt = s"$base/ckpt"

    val all = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts", "value")
    val n = all.count()
    val half = all.filter(col("event_id") % 2 === 0)
    half.write.mode("append").parquet(dropDir) // tranche 1

    def runOnce(): Unit = {
      val stream = spark.readStream.schema(all.schema).parquet(dropDir)
        // stateless hot-path projection (enrichment-style derived cols)
        .withColumn("second_ts", date_trunc("second", col("ts")))
        .withColumn("is_big", col("value") > 100.0)
      val q = stream.writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", sinkDir)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }

    runOnce()
    val afterFirst = spark.read.parquet(sinkDir).count()
    assert(afterFirst == half.count(), s"first run: got $afterFirst rows")

    all.filter(col("event_id") % 2 === 1).write.mode("append").parquet(dropDir) // tranche 2
    runOnce()
    val sink = spark.read.parquet(sinkDir)
    assert(sink.count() == n, "second run must process ONLY the new files (no re-reads)")
    assert(sink.select("event_id").distinct().count() == n, "no duplicated events")

    // a third run with nothing new is a no-op
    runOnce()
    assert(spark.read.parquet(sinkDir).count() == n)
  }
}
