package graft.procs

import graft.Tables
import graft.ml.MLOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Procedure registry — the reference's stored-procedure surface
  * (SURVEY.md §2.10 U1–U4, §1.1 row "Stored procedure") as named,
  * parameterized Scala entry points over SparkSession: a user of the
  * reference calls these with the same names and argument shapes
  * (`/root/reference/db/ddl.sql:146-173`).
  *
  * VoltDB's `EXPECT_*` runtime assertions (NewEvent.java:62,72-74 etc.)
  * map to the expect* helpers. The NOW-relative window predicates take
  * an explicit `asOf` pin (max event ts) per SURVEY.md §7.3 so results
  * are deterministic and testable.
  */
object Procedures {

  /** U1 parity: EXPECT_SCALAR_LONG — the statement must return exactly
    * one row with one long value. */
  def expectScalarLong(df: DataFrame): Long = {
    val rows = df.limit(2).collect()
    require(rows.length == 1 && rows(0).length == 1,
      s"EXPECT_SCALAR_LONG violated: ${rows.length} rows")
    rows(0).getLong(0)
  }

  /** EXPECT_ZERO_OR_ONE_ROW parity. */
  def expectZeroOrOneRow(df: DataFrame): Option[org.apache.spark.sql.Row] = {
    val rows = df.limit(2).collect()
    require(rows.length <= 1, s"EXPECT_ZERO_OR_ONE_ROW violated: ${rows.length}")
    rows.headOption
  }

  private def asOf(s: SparkSession, dir: String) =
    Tables.events(s, dir).agg(date_trunc("second", max(col("ts"))).as("asof_ts"))

  /** GetTopUsers(seconds, limit) — GetTopUsers.java:26-31. Reads the
    * A4 per-second view (ClickstreamOps.eventsBySecond, the single
    * definition of that tier).
    *
    * The as-of pin stays a SECOND thin events scan on purpose: deriving
    * it from the view's own subtree (max(second_ts) over the aggregate)
    * was tried in r19 — the optimizer's RemoveRedundantAggregates
    * rewrites max-over-a-grouping-key straight onto the scan, so the
    * "shared" leg decays to exactly this scan+max with no reusable
    * exchange (the two legs need different partitionings). Plan shape
    * identical, so the simpler form stays. */
  def getTopUsers(s: SparkSession, dir: String, seconds: Int, limit: Int): DataFrame =
    graft.operators.ClickstreamOps.eventsBySecond(s, dir)
      .crossJoin(broadcast(asOf(s, dir)))
      .filter(col("second_ts") >= col("asof_ts") - expr(s"INTERVAL $seconds seconds"))
      .groupBy("user_id").agg(sum("count_values").as("counts"))
      .orderBy(col("counts").desc, col("user_id"))
      .limit(limit)

  /** GetTopDests(seconds, limit) — db/ddl.sql:161-166; reads the A5
    * per-second view. */
  def getTopDests(s: SparkSession, dir: String, seconds: Int, limit: Int): DataFrame =
    graft.operators.ClickstreamOps.destsBySecond(s, dir)
      .crossJoin(broadcast(asOf(s, dir)))
      .filter(col("second_ts") >= col("asof_ts") - expr(s"INTERVAL $seconds seconds"))
      .groupBy("event_type").agg(sum("count_values").as("counts"))
      .orderBy(col("counts").desc, col("event_type"))
      .limit(limit)

  /** GetTopSources(limit) — GetTopSources.java:26. Reads
    * events_by_src_view, which aggregates the EXPORT stream
    * (db/ddl.sql:92-95). */
  def getTopSources(s: SparkSession, dir: String, limit: Int): DataFrame =
    graft.operators.ClickstreamOps.exportEvents(s, dir).groupBy("user_id")
      .agg(count(lit(1)).as("total_visits"))
      .orderBy(col("total_visits").desc, col("user_id")).limit(limit)

  /** GetTopSrcDests(limit) — GetTopSrcDests.java:27-28; export-stream
    * view, like getTopSources. */
  def getTopSrcDests(s: SparkSession, dir: String, limit: Int): DataFrame =
    graft.operators.ClickstreamOps.exportEvents(s, dir).groupBy("user_id", "event_type")
      .agg(count(lit(1)).as("counts"))
      .orderBy(col("counts").desc, col("user_id"), col("event_type")).limit(limit)

  /** GetEventsByCluster(seconds) — db/ddl.sql:168-173: windowed re-agg
    * over the events_by_cluster view (A6: scored events only, cluster
    * IS NOT NULL ≙ value present). Shares the scored-cluster definition
    * with ClickstreamOps' `ev_by_cluster`. */
  def getEventsByCluster(s: SparkSession, dir: String, seconds: Int): DataFrame =
    Tables.events(s, dir)
      .filter(col("value").isNotNull)
      .select(col("ts"),
        MLOps.scoreExpr(MLOps.literalCenterSeq,
          (col("user_id") % 100).cast("double"), col("value")).as("cluster"))
      .groupBy(date_trunc("second", col("ts")).as("second_ts"), col("cluster"))
      .agg(count(lit(1)).as("count_values"))
      .crossJoin(broadcast(asOf(s, dir)))
      .filter(col("second_ts") >= col("asof_ts") - expr(s"INTERVAL $seconds seconds"))
      .groupBy("cluster").agg(sum("count_values").as("counts"))
      .orderBy("cluster")

  /** DeleteAfterDate(cutoffMicros) over a mutable parquet "hot store"
    * ([[graft.sources.VersionedStore]] root) — same contract as the
    * reference proc (DeleteAfterDate.java:65-95): delete everything
    * at/before the cutoff, return the deleted count. The new version is
    * written completely and committed by an atomic pointer swap, so a
    * crash mid-delete leaves the old store fully live. */
  def deleteAfterDate(s: SparkSession, storeRoot: String, cutoffMicros: Long): Long = {
    // no cache needed: the versioned layout pins an immutable snapshot,
    // so the count and the kept-rows rewrite both re-scan stable files
    val df = graft.sources.VersionedStore.read(s, storeRoot)
    val deleted = expectScalarLong(
      df.filter(unix_micros(col("ts")) <= cutoffMicros)
        .agg(count(lit(1)).cast(LongType)))
    val kept = df.filter(unix_micros(col("ts")) > cutoffMicros)
    graft.sources.VersionedStore.publish(kept, storeRoot)
    graft.sources.VersionedStore.vacuum(storeRoot)
    deleted
  }

  /** DeleteOldestToTarget(maxRows) — DeleteOldestToTarget.java:49-61:
    * find the timestamp through which to delete, then delete through
    * it. The cutoff is found by a cumulative count over per-second
    * buckets refined to exact timestamps inside the boundary second —
    * O(distinct seconds) work with no Int-bounded offset/sort, so it
    * holds at row counts far beyond 2^31 (a plain `offset(n)` caps at
    * Int.MaxValue). Returns deleted count. */
  def deleteOldestToTarget(s: SparkSession, storeRoot: String, targetRows: Long): Long = {
    val df = graft.sources.VersionedStore.read(s, storeRoot)
    val n = df.count()
    if (n <= targetRows) 0L
    else {
      val toDelete = n - targetRows
      // coarse: cumulative rows per second bucket via the range-sorted
      // running-sum primitive — no unpartitioned Window anywhere, so
      // the cutoff search stays distribution-safe even on a store whose
      // retention horizon spans years of distinct seconds
      val bySec = graft.operators.GlobalOrder.withRunningSum(
        df.select(expr("unix_micros(ts) div 1000000").as("sec"))
          .groupBy("sec").agg(count(lit(1)).as("c")),
        "c", "cum", col("sec"))
      val boundary = bySec.filter(col("cum") >= toDelete)
        .orderBy("sec").limit(1).collect()(0)
      val boundarySec = boundary.getLong(0)
      val before = boundary.getLong(2) - boundary.getLong(1) // cum - c
      // fine: exact timestamps within the boundary second only
      val inSec = graft.operators.GlobalOrder.withRunningSum(
        df.filter(expr(s"unix_micros(ts) div 1000000 = $boundarySec"))
          .select(unix_micros(col("ts")).as("tus"))
          .groupBy("tus").agg(count(lit(1)).as("c")),
        "c", "cum", col("tus"))
      val cutTs = inSec.filter(col("cum") >= toDelete - before)
        .orderBy("tus").limit(1).collect()(0).getLong(0)
      // ties at the boundary may delete past the target (VoltDB had the
      // same property: timestamp-predicate deletes are deterministic,
      // row-exact they are not — DeleteAfterDate.java:31-44)
      deleteAfterDate(s, storeRoot, cutTs)
    }
  }

  /** TruncateDsa — clear the staging model dir (db/ddl.sql:23-29).
    * Resolves through the Hadoop FS of the path's scheme: staging can
    * live on shared storage like every other store here, and a
    * `java.io.File` walk would silently no-op on a schemed path. */
  def truncateDsa(s: SparkSession, stagingDir: String): Unit = {
    val p = graft.sources.Dfs.path(stagingDir)
    if (graft.sources.Dfs.exists(p)) graft.sources.Dfs.delete(p)
  }

  /** LoadDsa — atomically replace the live centers with staging,
    * ordered by id (db/ddl.sql:31-43). The publish commits via the
    * versioned store's atomic pointer swap — crash-safe (a reader sees
    * the old or new model, never a missing/mixed one), the same
    * guarantee the reference gets from running the swap in one txn. */
  def loadDsa(s: SparkSession, stagingDir: String, liveRoot: String): Unit = {
    val staged = s.read.parquet(stagingDir).orderBy("id")
    graft.sources.VersionedStore.publish(staged, liveRoot)
    graft.sources.VersionedStore.vacuum(liveRoot)
  }

  /** Read the live version of a mutable store (events hot store,
    * clusters model) — resolves through the CURRENT pointer. */
  def readStore(s: SparkSession, root: String): DataFrame =
    graft.sources.VersionedStore.read(s, root)
}
