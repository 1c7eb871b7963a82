package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** ST9: progress samples flow from a running query into the monitor. */
class RateMonitorSpec extends SparkSpec {
  import SessionDedup.Ev

  test("RateMonitor captures per-batch counts and rates for a named query") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val monitor = new RateMonitor()
    spark.streams.addListener(monitor)
    val input = MemoryStream[Ev]
    val q = input.toDF().groupBy("event_type").count()
      .writeStream.outputMode("complete")
      .format("memory").queryName("rate_probe").start()
    try {
      val evs = Tables.events(spark, sf)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .as[Ev].collect().toSeq
      evs.grouped(250).foreach { b => input.addData(b); q.processAllAvailable() }
      // listener delivery is async — give the bus a moment
      val deadline = System.nanoTime() + 10e9.toLong
      while (monitor.snapshot().count(_.queryName == "rate_probe") < 2 &&
             System.nanoTime() < deadline) Thread.sleep(50)
      val mine = monitor.snapshot().filter(_.queryName == "rate_probe")
      assert(mine.size >= 2, s"expected progress samples, got ${mine.size}")
      assert(mine.map(_.numInputRows).sum == evs.size)
      assert(monitor.currentRates().contains("rate_probe"))
    } finally {
      q.stop()
      spark.streams.removeListener(monitor)
    }
  }
}
