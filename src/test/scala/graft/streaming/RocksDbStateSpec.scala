package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.ClickstreamOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** State-store scale path: the default HDFS-backed state store keeps
  * every key on-heap — fine for the demo's session-key cardinality,
  * not for 100 TB (millions of live (src,dest) sessions per executor).
  * RocksDB keeps state off-heap with incremental checkpointing; this
  * spec proves the continuously-maintained view produces identical
  * results under the RocksDB provider, so flipping the provider is a
  * pure config change at deploy time.
  */
class RocksDbStateSpec extends SparkSpec {
  import SessionDedup.Ev

  test("windowed view parity under RocksDBStateStoreProvider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val input = MemoryStream[Ev]
      val agg = StreamingViews.eventsBySecond(input.toDF())
      val q = agg.writeStream.outputMode("complete")
        .format("memory").queryName("ebs_rocks").start()
      try {
        val evs = Tables.events(spark, sf)
          .select("event_id", "user_id", "event_type", "ts", "value")
          .as[Ev].collect().toSeq.sortBy(e => SessionDedup.micros(e.ts))
        evs.grouped(300).foreach { chunk => input.addData(chunk); q.processAllAvailable() }
        val got = spark.table("ebs_rocks")
          .select("second_ts", "user_id", "count_values")
          .collect().map(_.toString).sorted
        val want = ClickstreamOps.eventsBySecond(spark, sf)
          .select("second_ts", "user_id", "count_values")
          .collect().map(_.toString).sorted
        assert(got.length == want.length && got.sameElements(want))
      } finally q.stop()
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
