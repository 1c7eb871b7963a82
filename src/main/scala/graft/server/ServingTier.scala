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

  /** One refresh generation: the view map plus the as-of pin (max
    * second_ts) computed ONCE from the materialized per-second tier.
    * Every grouping set keeps second_ts, so the max is identical across
    * the three per-second views — pinning it at refresh time removes an
    * aggregate + broadcast-exchange stage from EVERY windowed render
    * (the views are immutable between refreshes, so the per-render
    * max() always returned this same constant). One field, swapped
    * atomically: a reader must never pair a new pin with an old view
    * map (a mixed read would filter one generation's rows by another
    * generation's cutoff). */
  private case class Gen(views: Map[String, DataFrame],
                         asof: Option[java.sql.Timestamp])
  @volatile private var gen: Gen = Gen(Map.empty, None)
  private def views: Map[String, DataFrame] = gen.views

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
    // ONE events pass for all three per-second tiers: GROUPING SETS
    // shares the scan and the shuffle (the former three groupBys each
    // re-scanned the fact table — at real scale three full passes),
    // and one materialization job replaces three. Views split back out
    // by grouping_id: bits follow (second_ts, user_id, event_type,
    // cluster) order, 1 = column NOT in the grouping set.
    val perSec = ev.select(
        date_trunc("second", col("ts")).as("second_ts"), col("user_id"),
        col("event_type"),
        MLOps.scoreExpr(MLOps.literalCenterSeq,
          (col("user_id") % 100).cast("double"), col("value")).as("cluster"))
      .groupingSets(
        Seq(Seq(col("second_ts"), col("user_id")),
          Seq(col("second_ts"), col("event_type")),
          Seq(col("second_ts"), col("cluster"))),
        col("second_ts"), col("user_id"), col("event_type"), col("cluster"))
      .agg(count(lit(1)).as("count_values"), grouping_id().as("gid"))
      .localCheckpoint(true)
    val bySec = perSec.filter(col("gid") === 3)
      .select("second_ts", "user_id", "count_values")
    val destsBySec = perSec.filter(col("gid") === 5)
      .select("second_ts", "event_type", "count_values")
    val clusterBySec = perSec.filter(col("gid") === 6)
      .select("second_ts", "cluster", "count_values")
    // A1/A2 lifetime tiers aggregate the export stream (db/ddl.sql:92-101).
    // The enrich→score→gate export pipeline is the expensive scan here:
    // run it ONCE into the (user_id, event_type) tier and re-aggregate
    // that tier for the per-user view — sum of the per-dest counts is
    // exactly the former count(*) per user, on dim-sized input.
    val exportEv = graft.operators.ClickstreamOps.exportEvents(spark, dir)
    val bySrcDest = exportEv.groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("counts"))
    // Materialize via localCheckpoint, NOT cache(): Spark's CacheManager
    // keys entries by canonicalized plan, so a refresh re-caching the
    // textually-identical aggregation would dedup onto the OLD entry and
    // the subsequent unpersist would evict it — leaving the tier
    // permanently uncached. Checkpointed RDD blocks have independent
    // identity per refresh; superseded ones are released by the
    // ContextCleaner once the old map is dropped.
    //
    // Tiers materialize SEQUENTIALLY on purpose: refresh() runs next
    // to latency-sensitive work (the demo's streaming micro-batches,
    // the 1 Hz dashboard) and a burst of concurrent refresh jobs
    // monopolizes the FIFO scheduler's task slots — measured as an
    // ingest backlog in DemoParitySpec when this was briefly parallel.
    val srcDest = bySrcDest.localCheckpoint(true)
    val bySrc = srcDest.groupBy("user_id")
      .agg(sum("counts").as("total_visits"))
    // the three per-second views are row-local filters over the ONE
    // perSec checkpoint — re-checkpointing them would just copy the
    // same blocks three more times; unpersistCheckpoint finds the
    // shared LogicalRDD through each filter (idempotent unpersist)
    val next = Map(
      "events_by_second" -> bySec,
      "dests_by_second" -> destsBySec,
      "events_by_cluster" -> clusterBySec,
      "events_by_src_dest" -> srcDest,
      "events_by_src_view" -> bySrc.localCheckpoint(true))
    // the as-of pin for this generation: one tiny driver job over the
    // already-checkpointed perSec blocks (replaces a per-render agg)
    val asof = Option(perSec.agg(max(col("second_ts"))).collect()(0)
      .getTimestamp(0))
    val (kept, expired) = (views :: retiring).splitAt(graceGenerations)
    retiring = kept
    gen = Gen(next, asof) // atomic repoint — readers see old or new, never mixed
    expired.foreach(_.valuesIterator.foreach(unpersistCheckpoint))
  }

  refresh()

  private def windowed(name: String, seconds: Int): DataFrame = {
    val g = gen // ONE volatile read: view and pin from the same generation
    val v = g.views(name)
    g.asof match {
      case Some(ts) =>
        v.filter(col("second_ts") >= lit(ts) - expr(s"INTERVAL $seconds seconds"))
      case None => v.filter(lit(false)) // no data yet: empty window, like the old null-asof filter
    }
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
