package graft.streaming

import graft.SparkSpec
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import java.sql.Timestamp

/** Checkpoint-restart recovery for the stateful streaming operators —
  * the exactly-once story under the failure mode that actually happens
  * in production: the query dies mid-stream and a new incarnation
  * resumes from the RocksDB checkpoint.
  *
  * Each test stops a query between micro-batches, starts a NEW query
  * object over the same source + checkpoint dir, and asserts the
  * combined output of both incarnations equals the single-run result:
  * accumulated state must survive (no loss → wrong aggregates),
  * nothing may replay (no duplicates → double emission), and
  * event-time TIMERS registered before the crash must still fire
  * after it (a key that receives no post-restart input must still
  * close).
  *
  * MemoryStream is replayable within the process, so the restarted
  * query resumes from the committed offset exactly as a file/bus
  * source would.
  */
class StreamRestartSpec extends SparkSpec {

  test("drift monitor: state AND timers survive restart; each minute closes exactly once") { withRocksDb {
    implicit val ss = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // reference == minute-0's full content: the minute-0 verdict can
    // only score tv == 0 if the pre-restart partial counts were
    // neither lost (missing words ⇒ tv > 0) nor replayed (doubled
    // counts ⇒ tv > 0) — the recovery proof is in the arithmetic
    val (ref, refTotal) = DriftMonitorStream.referenceOf(
      Seq("alpha beta beta gamma").toDF("text"), "text")
    val at = (s: Long) => new Timestamp(s * 1000L)

    val verdicts =
      new java.util.concurrent.ConcurrentLinkedQueue[DriftMonitorStream.DriftVerdict]()
    val input = MemoryStream[(Timestamp, String)]
    val dir = ckpt("restart_drift")
    def start() = DriftMonitorStream.monitor(
        input.toDF().toDF("ts", "text"), "ts", "text", ref, refTotal)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[DriftMonitorStream.DriftVerdict], _: Long) =>
        df.collect().foreach(verdicts.add); ()
      }
      .option("checkpointLocation", dir)
      .start()

    // incarnation 1: ALL of minute 0 + half of minute 1, then die.
    // Minute 0 gets no further input — its close depends entirely on
    // the recovered state and the timer registered before the crash.
    val q1 = start()
    input.addData(Seq((at(1), "alpha beta"), (at(2), "beta gamma"),
      (at(61), "delta")))
    q1.processAllAvailable()
    q1.stop()

    // incarnation 2: rest of minute 1, then watermark sentinels
    val q2 = start()
    input.addData(Seq((at(62), "epsilon")))
    q2.processAllAvailable()
    input.addData(Seq((at(20 * 60), "x")))
    q2.processAllAvailable()
    input.addData(Seq((at(21 * 60), "x")))
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val byMinute = verdicts.asScala.toSeq.filter(_.minute_id < 10)
      .groupBy(_.minute_id)
    assert(byMinute.keySet == Set(0L, 1L), s"minutes closed: ${byMinute.keySet}")
    assert(byMinute.values.forall(_.size == 1),
      s"a minute closed more than once: $byMinute")
    val m0 = byMinute(0L).head
    assert(m0.n_words == 4L && m0.tv == 0.0,
      s"minute 0 must recover to the exact reference distribution: $m0")
    val m1 = byMinute(1L).head
    assert(m1.n_words == 2L && m1.tv == 1.0,
      s"minute 1 must merge across the restart (delta+epsilon, disjoint): $m1")
  } }

  test("session gate: last-ts state survives restart — in-gap event stays suppressed") { withRocksDb {
    implicit val ss = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import SessionDedup.Ev

    // epoch offset keeps every event strictly above the fresh query's
    // initial watermark (0): a t=0 first event ties the watermark and
    // is dropped as late in batch 0 — boundary behavior, not the
    // operator under test
    val at = (s: Long) => new Timestamp((1000L + s) * 1000L)
    val emitted = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val input = MemoryStream[Ev]
    val dir = ckpt("restart_gate")
    def start() = SessionGateTws.dedup(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Ev], _: Long) =>
        df.collect().foreach(e => emitted.add(e.event_id)); ()
      }
      .option("checkpointLocation", dir)
      .start()

    // incarnation 1: session opens at t=0
    val q1 = start()
    input.addData(Seq(Ev(1L, 7L, "click", at(0), 1.0)))
    q1.processAllAvailable()
    q1.stop()

    // incarnation 2: t=10 is inside the recovered 30-s gap (must NOT
    // re-open — lost state would emit it); t=100 opens a new session
    val q2 = start()
    input.addData(Seq(Ev(2L, 7L, "click", at(10), 1.0)))
    q2.processAllAvailable()
    input.addData(Seq(Ev(3L, 7L, "click", at(100), 1.0)))
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    assert(emitted.asScala.toSeq.sorted == Seq(1L, 3L),
      s"session starts across restart: ${emitted.asScala.toSeq.sorted} (2 emitted ⇒ state lost; 1 missing ⇒ replay suppressed it)")
  } }

  test("corpus dedup: the content registry survives restart — post-crash copy is a dup") { withRocksDb {
    implicit val ss = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import CorpusDedupStream.{Doc, DocVerdict}

    val verdicts = new java.util.concurrent.ConcurrentLinkedQueue[DocVerdict]()
    val input = MemoryStream[Doc]
    val dir = ckpt("restart_dedup")
    def start() = CorpusDedupStream.dedup(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[DocVerdict], _: Long) =>
        df.collect().foreach(verdicts.add); ()
      }
      .option("checkpointLocation", dir)
      .start()

    val q1 = start()
    input.addData(Seq(Doc(1L, "the quick brown fox"), Doc(2L, "lorem ipsum")))
    q1.processAllAvailable()
    q1.stop()

    val q2 = start()
    input.addData(Seq(Doc(3L, "the quick brown fox"), Doc(4L, "novel text")))
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val got = verdicts.asScala.toSeq.sortBy(_.doc_id)
    assert(got == Seq(
      DocVerdict(1L, 1L, is_dup = false),
      DocVerdict(2L, 2L, is_dup = false),
      DocVerdict(3L, 1L, is_dup = true),
      DocVerdict(4L, 4L, is_dup = false)),
      s"registry must survive the restart (doc 3 == doc 1's content): $got")
  } }

  test("heavy hitters: the Misra-Gries fold continues across restart, not restarts") { withRocksDb {
    implicit val ss = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import HeavyHitterStream._

    val rows = new java.util.concurrent.ConcurrentLinkedQueue[HH]()
    val input = MemoryStream[Obs]
    val dir = ckpt("restart_hh")
    def start() = heavyHitters(input.toDS(), k = 3)
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[HH], _: Long) =>
        df.collect().foreach(rows.add); ()
      }
      .option("checkpointLocation", dir)
      .start()

    // skewed enough that batch 1 overflows k=3 (a decrement round runs
    // BEFORE the crash — the recovered state must carry dec too)
    val b1 = Seq(1L, 1L, 1L, 2L, 2L, 3L, 4L)
    val b2 = Seq(1L, 5L, 5L, 5L, 6L)
    val q1 = start()
    input.addData(b1.map(Obs(0, _)))
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    input.addData(b2.map(Obs(0, _)))
    q2.processAllAvailable()
    q2.stop()

    // ground truth: the pure mergeStep fold with the same batch
    // boundaries (the deployed kernel IS the tested kernel)
    val s1 = mergeStep(Summary(Map.empty, 0L, 0L), b1.iterator, 3)
    val s2 = mergeStep(s1, b2.iterator, 3)
    import scala.jdk.CollectionConverters._
    val all = rows.asScala.toSeq
    assert(all.exists(_.n == s1.n), s"incarnation-1 snapshot missing: $all")
    val last = all.filter(_.n == s2.n)
    assert(last.nonEmpty && last.map(h => h.key -> h.est).toMap == s2.counts,
      s"post-restart summary diverged from the continued fold: got " +
        s"${last.sortBy(_.key)} want ${s2.counts.toSeq.sorted}")
    assert(last.forall(_.dec == s2.dec),
      s"decrement mass lost across restart: ${last.map(_.dec).distinct} want ${s2.dec}")
    // a state-losing restart would restart n at |b2| — assert the
    // failure mode is actually distinguishable
    assert(s2.n != b2.size, "test vectors degenerate: n would not detect state loss")
  } }

  test("novelty: the gram first-seen registry survives restart — post-crash repeat is stale") { withRocksDb {
    implicit val ss = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import NoveltyStream.{GramObs, GramVerdict}

    val out = new java.util.concurrent.ConcurrentLinkedQueue[GramVerdict]()
    val input = MemoryStream[GramObs]
    val dir = ckpt("restart_novelty")
    def start() = NoveltyStream.novelty(input.toDS())
      .writeStream.outputMode("append")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[GramVerdict], _: Long) =>
        df.collect().foreach(out.add); ()
      }
      .option("checkpointLocation", dir)
      .start()

    val q1 = start()
    input.addData(Seq(GramObs(1L, 100L), GramObs(1L, 200L)))
    q1.processAllAvailable()
    q1.stop()
    // gram 100 repeats after the crash: the recovered registry must
    // verdict it stale; gram 300 is genuinely new
    val q2 = start()
    input.addData(Seq(GramObs(2L, 100L), GramObs(2L, 300L)))
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val got = out.asScala.toSeq.sortBy(v => (v.doc_id, v.gh))
    assert(got == Seq(
      GramVerdict(1L, 100L, novel = true), GramVerdict(1L, 200L, novel = true),
      GramVerdict(2L, 100L, novel = false), GramVerdict(2L, 300L, novel = true)),
      s"first-seen registry must survive the restart: $got")
  } }

  test("weighted reservoir: the k-sample merges across restart, not from scratch") { withRocksDb {
    implicit val ss = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    import WeightedSampleStream.Reservoir

    val k = 2
    val texts = (1L to 5L).map(i => (i, s"doc number $i body", 20L + i))
    // ground truth priorities from the SAME deterministic batch kernel
    val pri = graft.operators.SelectionOps.withPriority(
        texts.toDF("doc_id", "text", "n_chars"))
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    def topK(ids: Seq[Long]) =
      ids.sortBy(id => (pri(id), id)).take(k)
    val expectAll = topK(texts.map(_._1))
    // the failure mode must be distinguishable: a from-scratch batch-2
    // reservoir differs from the merged one
    assert(expectAll != topK(Seq(4L, 5L)),
      s"degenerate vectors: batch-2 docs alone already form the top-$k")

    val snaps = new java.util.concurrent.ConcurrentLinkedQueue[Seq[Long]]()
    val input = MemoryStream[(Long, String, Long)]
    val dir = ckpt("restart_reservoir")
    def start() = WeightedSampleStream.reservoir(
        input.toDF().toDF("doc_id", "text", "n_chars"), k)
      .writeStream.outputMode("update")
      .foreachBatch { (df: org.apache.spark.sql.Dataset[Reservoir], _: Long) =>
        df.collect().foreach(r => snaps.add(r.entries.map(_.doc_id))); ()
      }
      .option("checkpointLocation", dir)
      .start()

    val q1 = start()
    input.addData(texts.take(3).map(t => (t._1, t._2, t._3)))
    q1.processAllAvailable()
    q1.stop()
    val q2 = start()
    input.addData(texts.drop(3).map(t => (t._1, t._2, t._3)))
    q2.processAllAvailable()
    q2.stop()

    import scala.jdk.CollectionConverters._
    val all = snaps.asScala.toSeq
    assert(all.head == topK(Seq(1L, 2L, 3L)),
      s"pre-crash snapshot wrong: ${all.head}")
    assert(all.last == expectAll,
      s"post-restart reservoir must merge recovered state: ${all.last} want $expectAll")
  } }
}
