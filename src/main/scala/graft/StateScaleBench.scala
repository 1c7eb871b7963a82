package graft

import graft.streaming.{CorpusDedupStream, SessionDedup, SessionGateTws}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Streaming state-cardinality bench (judge r5 task #5): the stateful
  * operators' sf0.1 numbers run ~300 live keys through 8 state
  * partitions — this measures the same operators at 10⁶ keys under the
  * RocksDB state-store provider, the regime the 100 TB claims are
  * actually about (state no longer fits comfortably on-heap; per-batch
  * commit cost is dominated by store maintenance, not row math).
  *
  * Workloads (deterministic, generated per micro-batch so the driver
  * never holds more than one batch):
  *  - session gate ([[SessionGateTws]], transformWithState + timers):
  *    1M (user, type) keys × 2 events 10 s apart in-batch — exactly one
  *    session start per key must emit (parity asserted, not assumed);
  *  - corpus dedup ([[CorpusDedupStream]], flatMapGroupsWithState,
  *    never-expiring state): 1.18M docs over 1M distinct contents
  *    (batches 1-9 re-send 20% of the prior batch) — exactly 180k
  *    duplicate verdicts (parity asserted).
  *
  * Output: `BENCH_STATE.json` — events/s, state rows, RocksDB memory/
  * SST metrics at peak cardinality.
  */
object StateScaleBench {
  val Keys = 1000000L
  val BatchCount = 10

  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "8") // state partitions: sized to commit overhead, not cores
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    def stateMetrics(q: org.apache.spark.sql.streaming.StreamingQuery): String = {
      val so = Option(q.lastProgress).toSeq.flatMap(_.stateOperators.toSeq).headOption
      so.map { op =>
        val mem = Option(op.customMetrics).map { m =>
          Seq("rocksdbTotalMemoryUsageBytes", "rocksdbSstFileSize")
            .flatMap(k => Option(m.get(k)).map(v => s""""$k":$v""")).mkString(",")
        }.getOrElse("")
        s""""state_rows":${op.numRowsTotal},"state_mem_bytes":${op.memoryUsedBytes}""" +
          (if (mem.nonEmpty) "," + mem else "")
      }.getOrElse("\"state_rows\":-1")
    }

    // ---- session gate at 1M keys --------------------------------------
    val perBatch = (Keys / BatchCount).toInt
    val base = 1700000000000000L // µs epoch, arbitrary fixed instant
    // Event-time layout: batch b sits at base + 2b s, with ≤0.5 s of
    // intra-batch spread and the key's second event +10 s. All 10
    // batches fit in a ~28.5 s window, so (a) no batch's rows fall
    // behind the 10 s watermark (margin 1.5 s — nothing is dropped as
    // late) and (b) the final watermark (max−10 s) never reaches any
    // key's eviction timer (last+30 s) — all 10⁶ sessions stay LIVE,
    // which is the state size this bench exists to measure.
    def sessionBatch(b: Int): Seq[SessionDedup.Ev] =
      (0 until perBatch).flatMap { i =>
        val key = b.toLong * perBatch + i
        // two events 10 s apart (inside the 30 s gap): one emit per key
        val t0 = base + b.toLong * 2000000L + (i % 1000) * 500L
        Seq(SessionDedup.Ev(key * 2, key, "view", new java.sql.Timestamp(t0 / 1000), 1.0),
          SessionDedup.Ev(key * 2 + 1, key, "view", new java.sql.Timestamp((t0 + 10000000L) / 1000), 1.0))
      }
    val sessIn = MemoryStream[SessionDedup.Ev]
    val sessQ = SessionGateTws.dedup(sessIn.toDS())(spark)
      .writeStream.outputMode("append").format("memory").queryName("state_scale_sessions")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("state_scale_sess").toString)
      .start()
    sessIn.addData(sessionBatch(0)); sessQ.processAllAvailable() // warm (codegen + store open)
    val t0s = System.nanoTime()
    (1 until BatchCount).foreach { b => sessIn.addData(sessionBatch(b)); sessQ.processAllAvailable() }
    val sessSec = (System.nanoTime() - t0s) / 1e9
    val sessEvents = (BatchCount - 1).toLong * perBatch * 2
    val emitted = spark.sql("select count(*) from state_scale_sessions").as[Long].head()
    val sessMetrics = stateMetrics(sessQ)
    // parity at cardinality: exactly one session start per key
    assert(emitted == Keys,
      s"session gate must emit exactly 1 start per key: got $emitted for $Keys keys")
    sessQ.stop()

    // ---- corpus dedup at 1M distinct contents -------------------------
    val dedupIn = MemoryStream[CorpusDedupStream.Doc]
    val dedupQ = CorpusDedupStream.dedup(dedupIn.toDS())(spark)
      .writeStream.outputMode("append").format("memory").queryName("state_scale_dedup")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("state_scale_dedup").toString)
      .start()
    // batch b: perBatch fresh docs + 20% repeats of batch b-1's contents
    def dedupBatch(b: Int): Seq[CorpusDedupStream.Doc] = {
      val fresh = (0 until perBatch).map { i =>
        val key = b.toLong * perBatch + i
        CorpusDedupStream.Doc(key, s"synthetic corpus document number $key with stable content")
      }
      val dups = if (b == 0) Seq.empty else (0 until perBatch / 5).map { i =>
        val prev = (b - 1).toLong * perBatch + i
        CorpusDedupStream.Doc(Keys * 10 + b.toLong * perBatch + i,
          s"synthetic corpus document number $prev with stable content")
      }
      fresh ++ dups
    }
    dedupIn.addData(dedupBatch(0)); dedupQ.processAllAvailable()
    val t0d = System.nanoTime()
    (1 until BatchCount).foreach { b => dedupIn.addData(dedupBatch(b)); dedupQ.processAllAvailable() }
    val dedupSec = (System.nanoTime() - t0d) / 1e9
    val dedupDocs = (BatchCount - 1).toLong * (perBatch + perBatch / 5)
    val dupCount = spark.sql(
      "select count(*) from state_scale_dedup where is_dup").as[Long].head()
    val dedupMetrics = stateMetrics(dedupQ)
    assert(dupCount == (BatchCount - 1).toLong * (perBatch / 5),
      s"dedup must flag exactly the cross-batch repeats: got $dupCount")
    dedupQ.stop()

    val json =
      s"""{"metric":"state_cardinality","keys":$Keys,"state_partitions":8,"provider":"rocksdb",
         |"session_gate":{"events":$sessEvents,"sec":${f"$sessSec%.2f"},"events_per_sec":${(sessEvents / sessSec).round},$sessMetrics},
         |"corpus_dedup":{"docs":$dedupDocs,"sec":${f"$dedupSec%.2f"},"docs_per_sec":${(dedupDocs / dedupSec).round},$dedupMetrics}}""".stripMargin.replace("\n", "")
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_STATE.json"),
      (json + "\n").getBytes("UTF-8"))
    spark.stop()
    println(json)
  }
}
