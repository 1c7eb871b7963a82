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

  test("Misra-Gries summaries identical under RocksDBStateStoreProvider") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    import HeavyHitterStream.{HH, Obs}
    // deterministic for FIXED batches, so provider parity is exact
    // row equality of the final snapshots
    val batches = Seq(
      (0 until 400).map(i => Obs(i % 2, (i % 9).toLong)),
      (0 until 300).map(i => Obs(i % 2, 42L)),
      (0 until 200).map(i => Obs(i % 2, (i % 23).toLong)))
    def run(tag: String): Seq[(Int, Long, Long, Long, Long)] = {
      val input = MemoryStream[Obs]
      val q = HeavyHitterStream.heavyHitters(input.toDS(), 5).writeStream
        .outputMode("append").format("memory").queryName(s"hh_rocks_$tag").start()
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        HeavyHitterStream.latest(spark.table(s"hh_rocks_$tag")).as[HH]
          .collect().map(h => (h.pid, h.key, h.est, h.dec, h.n)).sorted.toSeq
      } finally q.stop()
    }
    val default = run("default")
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val rocks = run("rocksdb")
      assert(rocks == default, "summary must not depend on the state-store provider")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
