package graft.streaming

import graft.SparkSpec
import java.sql.Timestamp

case class DedupEv(event_id: Long, ts: Timestamp, user_id: Long,
              event_type: String, value: Double)

/** Native dropDuplicatesWithinWatermark as the ingest delivery guard:
  * re-deliveries inside the watermark delay are dropped; batch parity
  * with plain dropDuplicates on unique-id input. */
class EventDedupStreamSpec extends SparkSpec {

  private def ev(id: Long, sec: Long): DedupEv =
    DedupEv(id, new Timestamp(1700000000000L + sec * 1000L), id % 7, "click", 1.0)

  private def runBatches(batches: Seq[Seq[DedupEv]]): Seq[Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DedupEv]
    val q = EventDedupStream.guardedIngest(input.toDF(), "5 minutes").writeStream
      .outputMode("append").format("memory").queryName(s"edd_${batches.length}").start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(s"edd_${batches.length}")
        .select("event_id").as[Long].collect().toSeq.sorted
    } finally q.stop()
  }

  test("re-delivery within the delay is dropped, within AND across batches") {
    val out = runBatches(Seq(
      Seq(ev(1, 0), ev(2, 10), ev(1, 20)),            // in-batch duplicate
      Seq(ev(1, 60), ev(3, 70)),                      // cross-batch re-delivery
      Seq(ev(4, 120))))
    assert(out == Seq(1L, 2L, 3L, 4L), s"got $out")
  }

  test("each surviving event keeps its FIRST delivery's payload") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[DedupEv]
    val q = EventDedupStream.dedup(input.toDF(), "5 minutes").writeStream
      .outputMode("append").format("memory").queryName("edd_first").start()
    try {
      input.addData(Seq(ev(9, 0)))
      q.processAllAvailable()
      input.addData(Seq(ev(9, 30).copy(value = 99.0)))
      q.processAllAvailable()
      val rows = spark.table("edd_first").select("value").as[Double].collect()
      assert(rows.toSeq == Seq(1.0), "re-delivery must not replace the original")
    } finally q.stop()
  }

  test("batch relation dedups deterministically: earliest delivery wins") {
    import spark.implicits._
    val df = Seq(ev(1, 0), ev(1, 20).copy(value = 99.0), ev(2, 10))
      .toDF().repartition(5)
    val got = EventDedupStream.dedup(df)
      .select("event_id", "value").as[(Long, Double)].collect().sortBy(_._1)
    assert(got.toSeq == Seq((1L, 1.0), (2L, 1.0)),
      "batch first-wins must keep the earliest-ts payload under any partitioning")
  }
}
