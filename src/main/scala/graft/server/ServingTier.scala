package graft.server

import graft.Tables
import graft.ml.MLOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Serving tier for the dashboard procedures: the reference's
  * always-maintained views exist precisely so dashboard reads never
  * scan the fact table (`/root/reference/README.md:34-36`). Here the
  * per-second tiers are materialized once (Spark cache, pinned by an
  * eager count) and every procedure reads the cached tier — top-k over
  * thousands of pre-aggregated rows, not raw events.
  *
  * `refresh()` re-materializes after new data lands (the streaming
  * path updates these continuously via StreamingViews; this class is
  * the batch-serving analogue).
  */
/** @param graceGenerations how many superseded view generations stay
  *        persisted after a refresh before their blocks are released.
  *        1 (default) tolerates readers that hold a views snapshot for
  *        up to one full refresh interval — enough for the demo's 15-s
  *        cadence with sub-second renders. A deployment with slower
  *        consumers (or callers invoking refresh() in quick
  *        succession) sizes this to its slowest reader's hold time in
  *        refresh intervals: a reader whose generation is unpersisted
  *        mid-read FAILS its job outright (truncated lineage, blocks
  *        gone) rather than recomputing. */
final class ServingTier(spark: SparkSession, dir: String,
                        graceGenerations: Int = 1) {
  require(graceGenerations >= 1, s"graceGenerations >= 1: $graceGenerations")

  @volatile private var views: Map[String, DataFrame] = Map.empty

  /** Superseded generations, newest first, kept alive for
    * `graceGenerations` refresh intervals. localCheckpoint blocks are
    * only reclaimed when the ContextCleaner notices the RDD is
    * unreachable — under a 1 Hz dashboard with a 15-s refresh cadence
    * that lag let 20+ multi-million-row view generations accumulate in
    * block storage (measured: a 300-s integrated demo run degraded
    * 25k→15k events/s from the resulting GC pressure). Explicit
    * unpersist bounds live generations to graceGenerations + 1.
    * The grace matters: a render that grabbed the old map just before
    * a refresh still holds valid blocks — unpersisting a
    * localCheckpoint mid-read would FAIL that job (truncated
    * lineage), not recompute it. */
  @volatile private var retiring: List[Map[String, DataFrame]] = Nil

  private def unpersistCheckpoint(df: DataFrame): Unit =
    df.queryExecution.analyzed.foreach {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.unpersist(false)
      case _ =>
    }

  def refresh(): Unit = synchronized {
    val ev = Tables.events(spark, dir)
    val bySec = ev.groupBy(date_trunc("second", col("ts")).as("second_ts"), col("user_id"))
      .agg(count(lit(1)).as("count_values"))
    val destsBySec = ev.groupBy(date_trunc("second", col("ts")).as("second_ts"), col("event_type"))
      .agg(count(lit(1)).as("count_values"))
    val clusterBySec = ev.select(col("ts"),
        MLOps.scoreExpr(MLOps.literalCenterSeq,
          (col("user_id") % 100).cast("double"), col("value")).as("cluster"))
      .groupBy(date_trunc("second", col("ts")).as("second_ts"), col("cluster"))
      .agg(count(lit(1)).as("count_values"))
    // A1/A2 lifetime tiers aggregate the export stream (db/ddl.sql:92-101)
    val exportEv = graft.operators.ClickstreamOps.exportEvents(spark, dir)
    val bySrc = exportEv.groupBy("user_id")
      .agg(count(lit(1)).as("total_visits"))
    val bySrcDest = exportEv.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("counts"))
    // Materialize via localCheckpoint, NOT cache(): Spark's CacheManager
    // keys entries by canonicalized plan, so a refresh re-caching the
    // textually-identical aggregation would dedup onto the OLD entry and
    // the subsequent unpersist would evict it — leaving the tier
    // permanently uncached. Checkpointed RDD blocks have independent
    // identity per refresh; superseded ones are released by the
    // ContextCleaner once the old map is dropped.
    val next = Map(
      "events_by_second" -> bySec.localCheckpoint(true),
      "dests_by_second" -> destsBySec.localCheckpoint(true),
      "events_by_cluster" -> clusterBySec.localCheckpoint(true),
      "events_by_src_view" -> bySrc.localCheckpoint(true),
      "events_by_src_dest" -> bySrcDest.localCheckpoint(true))
    val (kept, expired) = (views :: retiring).splitAt(graceGenerations)
    retiring = kept
    views = next // atomic repoint — readers see old or new, never mixed
    expired.foreach(_.valuesIterator.foreach(unpersistCheckpoint))
  }

  refresh()

  private def asOf(view: DataFrame) =
    broadcast(view.agg(max(col("second_ts")).as("asof_ts")))

  private def windowed(name: String, seconds: Int): DataFrame = {
    val v = views(name)
    v.crossJoin(asOf(v))
      .filter(col("second_ts") >= col("asof_ts") - expr(s"INTERVAL $seconds seconds"))
  }

  def getTopUsers(seconds: Int, limit: Int): DataFrame =
    windowed("events_by_second", seconds)
      .groupBy("user_id").agg(sum("count_values").as("counts"))
      .orderBy(col("counts").desc, col("user_id")).limit(limit)

  def getTopDests(seconds: Int, limit: Int): DataFrame =
    windowed("dests_by_second", seconds)
      .groupBy("event_type").agg(sum("count_values").as("counts"))
      .orderBy(col("counts").desc, col("event_type")).limit(limit)

  def getEventsByCluster(seconds: Int): DataFrame =
    windowed("events_by_cluster", seconds)
      .groupBy("cluster").agg(sum("count_values").as("counts"))
      .orderBy("cluster")

  def getTopSources(limit: Int): DataFrame =
    views("events_by_src_view")
      .orderBy(col("total_visits").desc, col("user_id")).limit(limit)

  def getTopSrcDests(limit: Int): DataFrame =
    views("events_by_src_dest")
      .orderBy(col("counts").desc, col("user_id"), col("event_type")).limit(limit)
}
