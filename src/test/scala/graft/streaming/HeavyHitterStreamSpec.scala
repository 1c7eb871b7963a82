package graft.streaming

import graft.{SparkSpec, Tables}

/** Misra-Gries guarantees, checked against exact counts — the sketch's
  * contract is deterministic (no probabilistic slack to hide behind):
  * per shard p, est(key) ∈ [true_p(key) − dec_p, true_p(key)],
  * dec_p ≤ n_p/(k+1), and any key with true_p(key) > dec_p is present.
  */
class HeavyHitterStreamSpec extends SparkSpec {
  import HeavyHitterStream.{HH, Obs}

  private val K = 4
  private val Shards = 2

  private def runSplit(obs: Array[Obs], batches: Int): Array[HH] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Obs]
    val name = s"hh_${batches}_${obs.length}"
    val q = HeavyHitterStream.heavyHitters(input.toDS(), K).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      val step = math.max(1, obs.length / batches)
      obs.grouped(step).foreach { chunk =>
        input.addData(chunk.toSeq); q.processAllAvailable()
      }
      HeavyHitterStream.latest(spark.table(name)).as[HH].collect()
    } finally q.stop()
  }

  private def checkInvariants(got: Array[HH], obs: Array[Obs]): Unit = {
    val trueCounts = obs.groupBy(o => (o.pid, o.key)).map { case (pk, a) => pk -> a.length.toLong }
    val perShardN = obs.groupBy(_.pid).map { case (p, a) => p -> a.length.toLong }
    got.groupBy(_.pid).foreach { case (pid, rows) =>
      assert(rows.length <= K, s"shard $pid summary exceeds k: ${rows.length}")
      val dec = rows.head.dec
      val n = rows.head.n
      assert(n == perShardN(pid), s"shard $pid processed-count drift")
      assert(dec <= n / (K + 1), s"shard $pid decrement bound violated: $dec > $n/${K + 1}")
      rows.foreach { h =>
        val t = trueCounts((pid, h.key))
        assert(h.est <= t, s"overcount for key ${h.key}: ${h.est} > $t")
        assert(t - h.est <= dec, s"undercount beyond dec for key ${h.key}")
      }
      // completeness: every key whose true count exceeds the decrement
      // total MUST be in the summary
      val present = rows.map(_.key).toSet
      trueCounts.foreach { case ((p, key), t) =>
        if (p == pid && t > dec)
          assert(present.contains(key), s"key $key with count $t > dec $dec missing")
      }
    }
  }

  test("MG invariants hold on the real event stream, single batch and split") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    val obs = HeavyHitterStream
      .observations(Tables.events(spark, sf).select(col("user_id")), "user_id", Shards)
      .as[Obs].collect()
    checkInvariants(runSplit(obs, 1), obs)
    checkInvariants(runSplit(obs, 5), obs)
  }

  test("a dominant key survives eviction with a tight estimate") {
    // zipf-ish synthetic: one key carries half the stream, 40 others
    // share the rest — with k=4 counters the hot key must stay, and its
    // undercount is bounded by n_p/(k+1)
    val hot = Array.fill(2000)(Obs(0, 999L))
    val cold = (0 until 2000).map(i => Obs(0, (i % 40).toLong)).toArray
    val obs = (hot ++ cold).zipWithIndex.sortBy(t => (t._2 * 2654435761L) % 4096)
      .map(_._1) // deterministic interleave, no RNG
    val got = runSplit(obs, 7)
    checkInvariants(got, obs)
    val hotRow = got.find(_.key == 999L)
    assert(hotRow.isDefined, "the majority key must survive every eviction round")
    assert(hotRow.get.est >= 2000L - (4000L / (K + 1)),
      s"hot-key estimate too low: ${hotRow.get.est}")
  }

  test("latest() returns exactly the final snapshot per shard") {
    val obs = (0 until 600).map(i => Obs(i % 2, (i % 6).toLong)).toArray
    val got = runSplit(obs, 3)
    got.groupBy(_.pid).foreach { case (pid, rows) =>
      assert(rows.map(_.n).distinct.length == 1, s"shard $pid mixed snapshots")
      assert(rows.head.n == obs.count(_.pid == pid), s"shard $pid stale snapshot")
      // only 6 distinct keys -> nothing evicted... except k=4 < 6, so
      // the summary is capped at k and decs are in play; sizes bounded
      assert(rows.length <= K)
    }
  }
}
