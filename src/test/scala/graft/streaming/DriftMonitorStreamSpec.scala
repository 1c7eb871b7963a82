package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming drift monitor must agree bit-for-bit with the batch
  * TV kernel on every closed minute, across micro-batch splits, and
  * must clear per-minute state on emission. */
class DriftMonitorStreamSpec extends SparkSpec {

  /** Spread the sf docs over `nMinutes` event-time minutes by doc_id. */
  private def timestamped(nMinutes: Int): Seq[(java.sql.Timestamp, String)] =
    Tables.documents(spark, sf).select("doc_id", "text").collect().toSeq
      .map { r =>
        val minute = r.getLong(0) % nMinutes
        (new java.sql.Timestamp(minute * 60000L + (r.getLong(0) % 50) * 1000L),
          r.getString(1))
      }

  test("stream TV verdicts == batch kernel recompute on closed minutes") { withRocksDb {
    implicit val sparkSession = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val (ref, refTotal) =
      DriftMonitorStream.referenceOf(Tables.documents(spark, sf), "text")
    // arrival order respects event time (the reference's ordered
    // ingest, ST1) — an out-of-order split would make minute-0 rows in
    // batch 2 legitimately late-dropped
    val data = timestamped(3).sortBy(_._1.getTime)
    // two real batches + two sentinel batches (advance watermark, then
    // let the now-eligible timers fire)
    val sentinel = (m: Long) =>
      Seq((new java.sql.Timestamp(m * 60000L), "sentinelword"))
    val batches = data.grouped((data.size + 1) / 2).toSeq :+
      sentinel(20) :+ sentinel(21)

    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = DriftMonitorStream.monitor(
        input.toDF().toDF("ts", "text"), "ts", "text", ref, refTotal)
      .writeStream.outputMode("append").format("memory")
      .queryName("drift_stream").start()
    val got =
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        spark.table("drift_stream")
          .filter(col("minute_id") < 10)
          .collect()
          .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4))))
          .toMap
      } finally q.stop()

    // batch recompute through the shared kernel on the same grain
    val byMinute = data.groupBy { case (ts, _) => Math.floorDiv(ts.getTime, 60000L) }
    val hashOf = {
      val words = data.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty).distinct
      words.zip(
        spark.createDataset(words).toDF("word")
          .select(xxhash64(col("word"))).collect().map(_.getLong(0))).toMap
    }
    val want = byMinute.map { case (m, docs) =>
      val counts = docs.flatMap(_._2.split(" ", -1)).filter(_.nonEmpty)
        .groupBy(hashOf).view.mapValues(_.size.toLong).toMap
      val tot = counts.values.sum
      val (num, den) = DriftMonitorStream.tvAgainst(counts, tot, ref, refTotal)
      m -> ((tot, num, den, num.toDouble / den.toDouble))
    }
    assert(got.nonEmpty && got.keySet == want.keySet,
      s"minutes differ: got ${got.keySet}, want ${want.keySet}")
    want.foreach { case (m, w) =>
      assert(got(m) == w, s"minute $m: got ${got(m)}, want $w")
    }
    // zero drift sanity: a minute distributed exactly like the
    // reference would give tv == 0; real minutes must be in (0, 1]
    got.values.foreach { case (_, num, den, tv) =>
      assert(num >= 0 && num <= den && tv >= 0.0 && tv <= 1.0)
    }
  } }

  test("identical-to-reference minute scores tv == 0; disjoint scores 1") { withRocksDb {
    implicit val sparkSession = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val text = "alpha beta beta gamma"
    val (ref, refTotal) = DriftMonitorStream.referenceOf(
      Seq(text).toDF("text"), "text")
    val at = (m: Long, s: Int) => new java.sql.Timestamp(m * 60000L + s * 1000L)
    val input = MemoryStream[(java.sql.Timestamp, String)]
    val q = DriftMonitorStream.monitor(
        input.toDF().toDF("ts", "text"), "ts", "text", ref, refTotal)
      .writeStream.outputMode("append").format("memory")
      .queryName("drift_synth").start()
    val rows =
      try {
        // minute 0 mirrors the reference exactly; minute 1 shares no words
        input.addData(Seq((at(0, 1), text), (at(1, 1), "delta epsilon")))
        q.processAllAvailable()
        input.addData(Seq((at(20, 0), "x")))
        q.processAllAvailable()
        input.addData(Seq((at(21, 0), "x")))
        q.processAllAvailable()
        spark.table("drift_synth").filter(col("minute_id") < 10)
          .collect().map(r => r.getLong(0) -> r.getDouble(4)).toMap
      } finally q.stop()
    assert(rows(0L) == 0.0, s"identical minute must score 0, got ${rows(0L)}")
    assert(rows(1L) == 1.0, s"disjoint minute must score 1, got ${rows(1L)}")
  } }

  test("source-keyed monitor == per-source batch TV; unpinned sources silent") { withRocksDb {
    implicit val sparkSession = spark
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val docs = Tables.documents(spark, sf).select("doc_id", "source", "text")
      .collect().toSeq.map(r => (r.getLong(0), r.getString(1), r.getString(2)))
    val sources = docs.map(_._2).distinct.sorted
    // pin references for all but one source — the unpinned one must
    // produce NO verdicts (documented out-of-contract behavior)
    val unpinned = sources.last
    val refs = DriftMonitorStream.referencesBySource(
        Tables.documents(spark, sf).filter(col("source") =!= unpinned),
        "source", "text")
    assert(!refs.contains(unpinned) && refs.size == sources.size - 1)

    val data = docs.map { case (id, src, text) =>
      (new java.sql.Timestamp((id % 2) * 60000L + (id % 50) * 1000L), src, text)
    }.sortBy(_._1.getTime)
    val sentinel = (m: Long) =>
      Seq((new java.sql.Timestamp(m * 60000L), sources.head, "sentinelword"))
    val batches = data.grouped((data.size + 1) / 2).toSeq :+
      sentinel(20) :+ sentinel(21)

    val input = MemoryStream[(java.sql.Timestamp, String, String)]
    val q = DriftMonitorStream.monitorBySource(
        input.toDF().toDF("ts", "source", "text"), "ts", "source", "text", refs)
      .writeStream.outputMode("append").format("memory")
      .queryName("drift_by_source").start()
    val got =
      try {
        batches.foreach { b => input.addData(b); q.processAllAvailable() }
        val rows = spark.table("drift_by_source").filter(col("minute_id") < 10)
          .collect()
          .map(r => (r.getString(0), r.getLong(1)) ->
            ((r.getLong(2), r.getLong(3), r.getLong(4), r.getDouble(5))))
        // exactly-once is part of the contract: a double emission for
        // one (source, minute) would vanish inside .toMap — count first
        assert(rows.map(_._1).distinct.length == rows.length,
          s"duplicate (source, minute) emissions: ${rows.map(_._1).toSeq}")
        rows.toMap
      } finally q.stop()

    assert(!got.keySet.exists(_._1 == unpinned),
      s"unpinned source must emit nothing: ${got.keySet.filter(_._1 == unpinned)}")

    // per-source batch recompute through the shared kernel
    val hashOf = {
      val words = data.flatMap(_._3.split(" ", -1)).filter(_.nonEmpty).distinct
      words.zip(
        spark.createDataset(words).toDF("word")
          .select(xxhash64(col("word"))).collect().map(_.getLong(0))).toMap
    }
    val want = data
      .groupBy { case (ts, src, _) => (src, Math.floorDiv(ts.getTime, 60000L)) }
      .collect { case ((src, m), rows) if refs.contains(src) =>
        val counts = rows.flatMap(_._3.split(" ", -1)).filter(_.nonEmpty)
          .groupBy(hashOf).view.mapValues(_.size.toLong).toMap
        val tot = counts.values.sum
        val (refMap, refTotal) = refs(src)
        val (num, den) = DriftMonitorStream.tvAgainst(counts, tot, refMap, refTotal)
        (src, m) -> ((tot, num, den, num.toDouble / den.toDouble))
      }
    assert(got.nonEmpty && got.keySet == want.keySet,
      s"keys differ: got ${got.keySet}, want ${want.keySet}")
    want.foreach { case (k, w) => assert(got(k) == w, s"$k: got ${got(k)}, want $w") }
  } }

  test("tvAgainst fails loudly on 64-bit overflow instead of wrapping") {
    // c·T_ref = 2^32 · 2^32 overflows a long — the kernel must throw
    val big = 1L << 32
    intercept[ArithmeticException] {
      DriftMonitorStream.tvAgainst(Map(1L -> big), big, Map(2L -> big), big)
    }
  }

  test("reference builders bound the driver collect at maxVocab, keeping the full total") {
    import spark.implicits._
    // 4 distinct words with counts 4/3/2/1 — a corpus-sized relation in
    // miniature; maxVocab=2 must keep the TOP-2 map but the FULL total
    // (truncated tail reads as ref-frequency-0: overstated drift, never
    // a driver OOM)
    val docs = Seq(
      ("s1", "alpha alpha alpha alpha beta beta beta"),
      ("s1", "gamma gamma delta")).toDF("source", "text")
    val (ref, total) = DriftMonitorStream.referenceOf(docs, "text", maxVocab = 2)
    assert(ref.size == 2, s"map must be cut at maxVocab: $ref")
    assert(total == 10L, s"total must stay the full word count: $total")
    val hashOf = Seq("alpha", "beta").map(w =>
      w -> Seq(w).toDF("word").select(xxhash64(col("word"))).head().getLong(0)).toMap
    assert(ref == Map(hashOf("alpha") -> 4L, hashOf("beta") -> 3L),
      s"cut must keep the top-counts entries: $ref")
    // per-source variant: the bound applies PER SOURCE
    val docs2 = docs.union(Seq(("s2", "x x y")).toDF("source", "text"))
    val refs = DriftMonitorStream.referencesBySource(docs2, "source", "text", maxVocab = 2)
    assert(refs("s1")._1.size == 2 && refs("s1")._2 == 10L, s"s1: ${refs("s1")}")
    assert(refs("s2")._1.size == 2 && refs("s2")._2 == 3L, s"s2: ${refs("s2")}")
    // unbounded default leaves small references untouched
    val (full, fullTotal) = DriftMonitorStream.referenceOf(docs, "text")
    assert(full.size == 4 && fullTotal == 10L)
  }
}
