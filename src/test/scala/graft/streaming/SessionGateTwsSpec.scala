package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** transformWithState and flatMapGroupsWithState forms of the session
  * gate must emit the SAME export stream — they share the pure gap
  * kernel; this pins the operator plumbing (state cells, timers,
  * micro-batch ordering) on real event data across multiple batches. */
class SessionGateTwsSpec extends SparkSpec {
  import SessionDedup.Ev

  private def loadEvents(): Seq[Ev] = {
    import spark.implicits._
    Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "ts", "value")
      .as[Ev].collect().toSeq.sortBy(e => SessionDedup.micros(e.ts))
  }

  private def runGate(name: String,
                      gate: org.apache.spark.sql.Dataset[Ev] => org.apache.spark.sql.Dataset[Ev],
                      batches: Seq[Seq[Ev]]): Seq[Long] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Ev]
    val q = gate(input.toDS()).writeStream.outputMode("append")
      .format("memory").queryName(name).start()
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
      spark.table(name).select("event_id").collect().map(_.getLong(0)).sorted.toSeq
    } finally q.stop()
  }

  test("transformWithState gate == flatMapGroupsWithState gate (3 batches, RocksDB)") {
    implicit val sparkSession = spark
    val prev = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      // real event data: parity across 3 micro-batches (sf0.001 has no
      // same-key pair within 30 s, so both gates emit everything —
      // suppression itself is pinned by the synthetic test below)
      val evs = loadEvents()
      val batches = evs.grouped((evs.size + 2) / 3).toSeq
      val tws = runGate("tws_gate", SessionGateTws.dedup(_), batches)
      val fmgws = runGate("fmgws_gate", SessionDedup.dedup(_), batches)
      assert(tws.nonEmpty, "gate emitted nothing")
      assert(tws == fmgws, "the two stateful operators diverged")

      // synthetic session: extensions within the gap must be suppressed,
      // including ACROSS batches (state carries last_ts forward), and a
      // > gap pause re-opens
      def ev(id: Long, sec: Long) = Ev(id, 7L, "view",
        java.sql.Timestamp.from(java.time.Instant.ofEpochSecond(100000L + sec)), 0.0)
      val b1 = Seq(ev(1, 0), ev(2, 10), ev(3, 25)) // 1 opens; 2,3 extend
      val b2 = Seq(ev(4, 50), ev(5, 100))          // 4 extends (25+30>=50); 5 re-opens
      val twsS = runGate("tws_gate_synth", SessionGateTws.dedup(_), Seq(b1, b2))
      val fmgwsS = runGate("fmgws_gate_synth", SessionDedup.dedup(_), Seq(b1, b2))
      assert(twsS == Seq(1L, 5L), s"expected events 1 and 5 to open sessions, got $twsS")
      assert(twsS == fmgwsS, "the two stateful operators diverged on the synthetic session")
    } finally prev match {
      case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
      case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
    }
  }
}
