package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming EWMA detector must agree minute-for-minute with the
  * batch ewma_anomaly query — same dyadic rule, same zero-filled
  * spine, same 8-minute warmup — for every minute the watermark has
  * closed, across micro-batch splits. */
class AnomalyStreamSpec extends SparkSpec {
  import AnomalyStream.Obs

  /** transformWithState needs the multi-column-family (RocksDB) state
    * store; restore the previous provider afterwards. */
  test("stream verdicts == batch ewma_anomaly on closed minutes (3 batches)") { withRocksDb {
    implicit val sparkSession = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val ts = Tables.events(spark, sf).select("ts")
      .collect().map(_.getTimestamp(0)).sortBy(_.getTime)
    val hiMinute = Math.floorDiv(ts.last.getTime, 60000L)
    // sentinel pushes the watermark far past hi so every real minute
    // closes; its own (still-open) minute lies outside the compare range
    // two sentinel batches: the first advances the watermark past hi at
    // its end, the second forces one more micro-batch in which the now-
    // eligible timers actually fire
    val batches = ts.grouped((ts.length + 1) / 2).toSeq.map(_.toSeq.map(t => Obs("g", t))) :+
      Seq(Obs("g", new java.sql.Timestamp((hiMinute + 20) * 60000L))) :+
      Seq(Obs("g", new java.sql.Timestamp((hiMinute + 21) * 60000L)))

    val input = MemoryStream[Obs]
    val q = AnomalyStream.detect(input.toDS(), "k", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("anom_stream").start()
    val got =
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        spark.table("anom_stream")
          .filter(col("minute_id") <= hiMinute)
          .select("minute_id", "n", "ewma_num", "anomaly")
          .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
          .toMap
      } finally q.stop()

    val want = graft.operators.AnalyticsOps3.queries("ewma_anomaly")(spark, sf)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getInt(3))))
      .toMap
    assert(want.nonEmpty && got.nonEmpty)
    assert(got == want,
      s"stream/batch diverge: ${got.size} vs ${want.size} minutes; " +
        s"first diff: ${(want.toSet -- got.toSet).take(3)} / ${(got.toSet -- want.toSet).take(3)}")
  } }

  test("synthetic spike flags; warmup and flat series stay quiet") { withRocksDb {
    implicit val sparkSession = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // minutes 0..11 at 2 events/min, minute 12 spikes to 20, sentinel closes
    def at(min: Long, secOff: Int) = Obs("g", new java.sql.Timestamp(min * 60000L + secOff * 1000L))
    val flat = (0L to 11L).flatMap(m => Seq(at(m, 1), at(m, 30)))
    val spike = (0 until 20).map(i => at(12L, 1 + i))
    val input = MemoryStream[Obs]
    val q = AnomalyStream.detect(input.toDS(), "k", "ts")
      .writeStream.outputMode("append").format("memory")
      .queryName("anom_synth").start()
    val rows =
      try {
        input.addData(flat ++ spike)
        q.processAllAvailable()
        input.addData(Seq(Obs("g", new java.sql.Timestamp(40L * 60000L))))
        q.processAllAvailable()
        input.addData(Seq(Obs("g", new java.sql.Timestamp(41L * 60000L))))
        q.processAllAvailable()
        spark.table("anom_synth").select("minute_id", "n", "anomaly")
          .collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).sortBy(_._1)
      } finally q.stop()
    val byMin = rows.map(r => r._1 -> r).toMap
    assert(rows.head._1 == 8L, "first 8 closed minutes are warmup")
    assert((8L to 11L).forall(m => byMin(m)._3 == 0), "flat series must not flag")
    assert(byMin(12L)._2 == 20L && byMin(12L)._3 == 1, "the spike minute must flag")
    assert(byMin(13L)._3 == 0, "empty minute after the spike (n=0) must not flag")
  } }
}
