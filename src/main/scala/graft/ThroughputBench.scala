package graft

import graft.operators.IngestOps
import graft.sources.EventGen
import graft.streaming.IngestPipeline
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Ingest-throughput bench vs the reference's headline operating point
  * (BASELINE.md: 20,000 events/s sustained through enrichment + scoring
  * + session check + view maintenance on one node).
  *
  * Legs:
  *  - batch: the full IngestOps.pipeline over the sf dir's events,
  *    amortized events/s (same headline as Bench's ingest_eps);
  *  - file-source streaming at 1× and 10× the sf dir's event count:
  *    seeded reference-distribution events ([[EventGen]] — same
  *    schema, dims, and draw logic as the reference's LogGenerator)
  *    land as parquet tranches in a drop directory, then ONE
  *    checkpointed query (Trigger.AvailableNow + maxFilesPerTrigger)
  *    runs enrich → score → 30-s session gate → parquet sink in
  *    micro-batches. No driver-side collect anywhere: the generator
  *    writes distributed, the source is the checkpointed file stream,
  *    so the same harness measures any SF — the 10× leg is the
  *    "sf1" point that re-verifies the state bench's flat-throughput
  *    claim end to end (state keys grow 10×, eps must hold).
  *
  * Writes BENCH_STREAM.json: {"batch_eps":…,"stream_eps_1x":…,
  * "stream_eps_10x":…,"n_1x":…} for round-over-round tracking.
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    // external-load evidence, read before our own JVM adds load
    val loadBefore = BoxLoad.loadavg1m()
    val steal0 = BoxLoad.stealSnap()
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // toRdd.count forces the pipeline's own plan — a plain count()
    // would let Catalyst prune the scoring/session projections
    def runFully(df: DataFrame): Long = df.queryExecution.toRdd.count()
    // warm-up (codegen + file index)
    runFully(IngestOps.pipeline(spark, sfDir))

    val t0 = System.nanoTime()
    val n = runFully(IngestOps.pipeline(spark, sfDir))
    val batchSec = (System.nanoTime() - t0) / 1e9
    val batchEps = n / batchSec
    println(f"[throughput] batch: $n events in $batchSec%.2f s = $batchEps%.0f events/s")

    // the session-gate state exchange keys on (src, dest): state
    // partitioning is a streaming-query-lifetime choice sized to key
    // cardinality × state size, not core count — 8 partitions
    // amortize per-batch commit overhead at these cardinalities
    // (sweepable for per-component profiling: the per-batch fixed cost
    // is P state-store commits + P sink files + the offset/commit WAL)
    spark.conf.set("spark.sql.shuffle.partitions",
      sys.env.getOrElse("SPARK_GRAFT_STREAM_PARTS", "8"))
    if (sys.env.get("SPARK_GRAFT_STREAM_PROVIDER").contains("rocksdb")) {
      spark.conf.set("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
      spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled", "true")
    }
    // one micro-batch = ~20k events = ONE SECOND of the reference's
    // 20k events/s operating point, at both scales — so events/s here
    // reads directly as "reference-seconds of traffic cleared per
    // wall-clock second" and the 1×/10× pair isolates state growth
    // (10× the live session keys) from batch-size effects
    def tranchesFor(rows: Long): Int = math.max(2, (rows / 20000L).toInt)
    val (eps1, _) = fileSourceEps(spark, n, tranches = tranchesFor(n), tag = "1x")
    println(f"[throughput] stream 1x file-source steady-state: $eps1%.0f events/s")
    // the latency/throughput CURVE at the 10× feed: the per-batch fixed
    // cost (~150-250 ms: offset/commit WAL + planning + commit of P
    // state stores and P sink files) is batch-count-, not row-count-
    // bound, so events/s scales with trigger size while end-to-end
    // latency is bounded by the batch wall time — the dial a deployment
    // picks its trigger by. Three measured points (one reference-second
    // = 20k events, two, four), each (trigger_events, eps, batch_ms):
    val curve = Seq(4, 8, 16).map { maxFiles =>
      val tag = s"10x_${maxFiles / 4}s"
      val (eps, bms) = fileSourceEps(spark, n * 10,
        tranches = tranchesFor(n * 10), tag = tag, maxFiles = maxFiles)
      println(f"[throughput] stream $tag (${maxFiles * 5000} events/trigger): $eps%.0f events/s, batch $bms%.0f ms")
      (maxFiles * 5000, eps, bms)
    }
    val eps10 = curve(0)._2
    val eps10w = curve(1)._2
    val curveJson = curve.map { case (te, eps, bms) =>
      f"""{"trigger_events":$te,"eps":$eps%.0f,"batch_ms":$bms%.0f}""" }
      .mkString("[", ",", "]")
    val json = f"""{"batch_eps":$batchEps%.0f,"stream_eps_1x":$eps1%.0f,"stream_eps_10x":$eps10%.0f,"stream_eps_10x_2s":$eps10w%.0f,"n_1x":$n,${BoxLoad.jsonFields(loadBefore, BoxLoad.loadavg1m())},"steal_pct":${BoxLoad.stealPctSince(steal0)}%.1f,"curve":$curveJson}"""
    java.nio.file.Files.write(java.nio.file.Paths.get("BENCH_STREAM.json"),
      (json + "\n").getBytes("UTF-8"))
    println(s"[throughput] $json")
    spark.stop()
  }

  /** Generator → drop dir → one checkpointed AvailableNow query through
    * the full hot path (enrich, score, gate) → parquet sink. Returns
    * events/s over the query's wall time (generation/landing excluded:
    * the feeder isn't the system under test).
    *
    * Warm-up runs the SAME plan over a separate 3-tranche warm feed
    * (own drop/checkpoint/sink): micro-batch 1 of a cold JVM pays
    * codegen + C2 JIT + state-store class loading — per-process
    * once-ever costs a sustained-rate comparison must not bill to the
    * timed window (the reference's 20k/s is a long-running process's
    * steady state). One warm batch was NOT enough: per-batch times
    * decayed 1.4→0.9→0.7→0.68 s across the first four data batches,
    * so the warm leg clears three batches before anything is timed.
    * The timed query then processes the FULL n-event feed from a
    * fresh checkpoint with every batch at steady state. */
  def fileSourceEps(spark: SparkSession, n: Long, tranches: Int, tag: String,
                    maxFiles: Int = sys.env.getOrElse("SPARK_GRAFT_MAX_FILES", "4").toInt): (Double, Double) = {
    import spark.implicits._
    implicit val sp: SparkSession = spark
    val base = java.nio.file.Files.createTempDirectory(s"graft_tp_$tag").toString
    val drop = s"$base/drop"; val sink = s"$base/sink"; val ckpt = s"$base/ckpt"
    val warmDrop = s"$base/warm_drop"; val warmSink = s"$base/warm_sink"
    val warmCkpt = s"$base/warm_ckpt"

    // land a feed as 20k-event parquet tranches, each written
    // distributed (4 files per tranche → 4-file micro-batches)
    val per = n / tranches
    def land(dir: String, lo: Long, hi: Long, seed: Long): Unit =
      EventGen.events(spark, hi - lo, seed)
        .withColumn("event_id", col("event_id") + lit(lo))
        .withColumn("ts", expr(s"timestamp_micros(ts_micros + $lo)"))
        .drop("ts_micros")
        .repartition(4)
        .write.mode("append").parquet(dir)
    land(warmDrop, 0, per, seed = 7L)
    val schema = spark.read.parquet(warmDrop).schema

    def runOnce(drop: String, ckpt: String, sink: String): (Double, Double) = {
      val stream = spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", maxFiles).parquet(drop)
      // the reference hot path (enrich → score → 30-s gate), the ONE
      // shared definition every harness measures — IngestPipeline.hotPath
      val gated = IngestPipeline.hotPath(stream)
      val t0 = System.nanoTime()
      val q = gated.toDF().writeStream
        .option("checkpointLocation", ckpt)
        .format("parquet").option("path", sink)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      val wall = (System.nanoTime() - t0) / 1e9
      // per-trigger overhead floor, made explicit: each micro-batch's
      // input rows and execution time (the gap between Σbatch and wall
      // is query start/stop overhead — fixed per deployment, amortized
      // to nothing in a long-running stream)
      val prog = q.recentProgress.filter(_.numInputRows > 0)
      var meanBatchMs = 0.0
      if (prog.nonEmpty) {
        val batchSecs = prog.map(_.durationMs.get("triggerExecution").toLong / 1000.0)
        meanBatchMs = batchSecs.sum * 1000.0 / prog.length
        println(f"[throughput] $tag: ${prog.length} data batches, " +
          f"batch wall ${batchSecs.sum}%.2f s of $wall%.2f s total " +
          f"(start/stop overhead ${wall - batchSecs.sum}%.2f s); " +
          "per-batch: " + prog.zip(batchSecs).map { case (p, s) =>
            f"${p.numInputRows}r/$s%.2fs" }.mkString(" "))
        // per-component mean across data batches: where the per-batch
        // fixed cost actually sits (planning vs offset WAL vs execution)
        import scala.jdk.CollectionConverters._
        val keys = prog.head.durationMs.keySet.asScala.toSeq.sorted
        val means = keys.map { k =>
          val vs = prog.flatMap(p => Option(p.durationMs.get(k)).map(_.toLong))
          f"$k=${vs.sum.toDouble / math.max(1, vs.length)}%.0fms"
        }
        println(s"[throughput] $tag per-batch component means: ${means.mkString(" ")}")
      }
      (wall, meanBatchMs)
    }
    // warm leg: three 20k batches of the same plan over the warm feed
    // (the measured JIT decay horizon), throwaway checkpoint/sink
    (1 until 3).foreach(t => land(warmDrop, t * per, (t + 1) * per, seed = 7L + t))
    runOnce(warmDrop, warmCkpt, warmSink)
    // timed leg: the full n-event feed, fresh checkpoint, warm JVM
    (0 until tranches).foreach { t =>
      val hi = if (t == tranches - 1) n else (t + 1) * per
      land(drop, t * per, hi, seed = 42L + t)
    }
    val (sec, meanBatchMs) = runOnce(drop, ckpt, sink)
    val eps = n / sec
    val exported = spark.read.parquet(sink).count()
    println(f"[throughput] $tag: $n timed events ($exported total exported session-openers), $sec%.2f s")
    (eps, meanBatchMs)
  }
}
