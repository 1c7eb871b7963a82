package graft

import graft.operators.IngestOps
import graft.streaming.SessionDedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Ingest-throughput bench vs the reference's headline operating point
  * (BASELINE.md: 20,000 events/s sustained through enrichment + scoring
  * + session check + view maintenance on one node).
  *
  * Two modes over the sf0.1 events (100k rows):
  *  - batch: the full IngestOps.pipeline, amortized events/s;
  *  - micro-batch streaming: MemoryStream → session dedup + per-second
  *    view, 10 batches, steady-state events/s.
  */
object ThroughputBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark: SparkSession = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    // toRdd.count forces the pipeline's own plan — a plain count()
    // would let Catalyst prune the scoring/session projections
    def runFully(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    // warm-up (codegen + file index)
    runFully(IngestOps.pipeline(spark, sfDir))

    val t0 = System.nanoTime()
    val n = runFully(IngestOps.pipeline(spark, sfDir))
    val batchSec = (System.nanoTime() - t0) / 1e9
    println(f"[throughput] batch: $n events in $batchSec%.2f s = ${n / batchSec}%.0f events/s")

    // the session-dedup state exchange keys on (user_id, event_type):
    // a few hundred live keys — 8 state-store partitions amortize the
    // per-batch commit overhead far better than one per core (state
    // partitioning is a streaming-query-lifetime choice, sized to key
    // cardinality × state size, not to core count)
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    val evs = Tables.events(spark, sfDir)
      .select("event_id", "user_id", "event_type", "ts", "value")
      .as[SessionDedup.Ev].collect().toSeq
      .sortBy(e => SessionDedup.micros(e.ts))
    val input = MemoryStream[SessionDedup.Ev]
    val q = SessionDedup.dedup(input.toDS())(spark)
      .writeStream.outputMode("append").format("memory").queryName("tp_export").start()
    val batches = evs.grouped(math.max(1, evs.size / 5)).toSeq
    input.addData(batches.head); q.processAllAvailable() // warm
    val t1 = System.nanoTime()
    batches.tail.foreach { b => input.addData(b); q.processAllAvailable() }
    val streamSec = (System.nanoTime() - t1) / 1e9
    val streamed = evs.size - batches.head.size
    println(f"[throughput] streaming: $streamed events in $streamSec%.2f s = ${streamed / streamSec}%.0f events/s (${batches.size - 1} micro-batches)")
    q.stop(); spark.stop()
  }
}
