package graft.sources

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}

/** Crash-safe mutable-store layout: data lives in immutable versioned
  * directories (`root/v00001`, `v00002`, …) and readers resolve the
  * live version through a single `CURRENT` pointer file. Publishing
  * writes the new version directory completely, then commits by
  * atomically replacing `CURRENT` (write-to-temp + force + atomic
  * replace, [[Dfs.writeStringAtomic]]) — a crash at any point leaves
  * either the old or the new version fully live, never a missing
  * store. This is the manifest-commit pattern table formats use, at
  * pointer-file granularity; it gives the reference's `LoadDsa`
  * transactional-swap guarantee (`/root/reference/db/ddl.sql:31-43`)
  * on immutable files.
  *
  * All metadata operations resolve through the Hadoop `FileSystem` of
  * the root's scheme ([[Dfs]]), so the store runs on local disk,
  * `file://`, or HDFS unchanged. Because the commit is a POINTER
  * replace over immutable version dirs — never a directory rename —
  * this is also the one maintenance protocol here that stays fully
  * correct on object stores (the pointer PUT is atomic; version dirs
  * are write-once), which is why IMPLEMENTATION.md recommends it as
  * the commit front for object-store sinks.
  */
object VersionedStore {
  /** Test seam invoked with the allocated version number after the
    * claim lands, before the version write starts ([[publish]]) —
    * the race specs use it to stall a publisher mid-publish across a
    * file barrier. Identity in production. */
  private[sources] var onClaimed: Int => Unit = _ => ()

  /** How often an in-flight [[publish]] re-touches its claim marker —
    * the liveness heartbeat vacuum's grace window reads. Test-tunable. */
  private[sources] var claimHeartbeatMs: Long = 60L * 1000

  private def currentFile(root: String) = new Path(root, "CURRENT")

  def currentVersion(root: String): Option[Int] = {
    val f = currentFile(root)
    if (Dfs.exists(f)) Some(Dfs.readString(f).trim.stripPrefix("v").toInt)
    else None
  }

  def currentPath(root: String): Option[String] =
    currentVersion(root).map(v => new Path(root, f"v$v%05d").toString)

  private def claimFile(root: String, v: Int) = new Path(root, f".claim_v$v%05d")
  private def commitFile(root: String, v: Int) = new Path(root, f".commit_v$v%05d")

  /** Write df as the next version and atomically commit the pointer.
    * Returns the new version number.
    *
    * Concurrency contract — safe across PROCESSES, not just threads
    * (`VersionedStoreRaceSpec` drives two actual JVMs through this):
    *  - version ALLOCATION is collision-free: a publisher owns a
    *    number only after atomically creating its `.claim_vNNNNN`
    *    marker ([[Dfs.createExclusive]] — O_EXCL locally, atomic
    *    namenode create on HDFS), so racing publishers can never write
    *    into the same version directory;
    *  - the pointer COMMIT is last-committer-wins over COMPLETE
    *    versions: each commit is an atomic replace of `CURRENT`
    *    ([[Dfs.writeStringAtomic]] — pid-unique temp siblings, racing
    *    writers never truncate each other into a torn pointer), and a
    *    version is committed only after its files are fully written,
    *    so a reader resolves to a complete version at every instant.
    *    The publish that commits last defines the store — the
    *    reference's LoadDsa semantics, where each load replaces the
    *    whole table — even when its allocated NUMBER is lower than a
    *    concurrent racer's (the loser's version stays on disk,
    *    complete and vacuumable).
    * In-JVM, allocation+commit are additionally serialized on the
    * root's intern'd lock (cheaper than claim-probing for the common
    * single-process case). */
  def publish(df: DataFrame, root: String): Int =
    root.intern.synchronized {
      Dfs.mkdirs(Dfs.path(root))
      var next = currentVersion(root).getOrElse(0) + 1
      // skip numbers claimed by concurrent or crashed publishers (a
      // crashed claim's dir is garbage until vacuum; never reuse it)
      while (!Dfs.createExclusive(claimFile(root, next))) next += 1
      // claim HEARTBEAT: re-touch the claim marker (atomic replace)
      // while the version write runs, so vacuum's liveness signal — the
      // claim's mtime — tracks the PUBLISHER being alive, not merely
      // when the claim was first made. Without it, any write running
      // longer than the vacuum grace reads as crashed (the version
      // dir's own top-level mtime does NOT advance while part-files
      // land under the committer's nested _temporary tree). Stopped in
      // the finally on every exit path, so a crashed publisher's claim
      // goes stale and becomes sweepable after the grace.
      val beat = new Thread(() => {
        try while (true) {
          Thread.sleep(claimHeartbeatMs)
          // a transient store blip must not kill the liveness signal:
          // one missed beat is harmless (the grace window spans many
          // beats), but a DEAD beat thread would let a long publish go
          // stale-looking and become sweepable mid-write — the exact
          // hole the commit-marker/grace protocol exists to close. So
          // swallow per-beat failures and keep beating; only interrupt
          // (the publish finishing) exits the loop.
          // (NonFatal deliberately: it excludes InterruptedException,
          // which must still reach the outer catch and end the loop)
          try Dfs.writeStringAtomic(claimFile(root, next),
            System.currentTimeMillis().toString)
          catch { case scala.util.control.NonFatal(_) => }
        } catch { case _: InterruptedException => }
      }, s"vstore-claim-heartbeat-v$next")
      beat.setDaemon(true)
      beat.start()
      try {
        // test seam: lets the cross-process race spec stall a publisher
        // BETWEEN allocation and write (the window where racing commits
        // can overtake its number). No-op in production.
        onClaimed(next)
        val dir = new Path(root, f"v$next%05d").toString
        df.write.mode("overwrite").parquet(dir)
        // contents are forced to stable storage BEFORE the pointer
        // replace: a crash may persist the rename metadata but not the
        // bytes, leaving CURRENT empty (Dfs.writeStringAtomic's contract)
        Dfs.writeStringAtomic(currentFile(root), f"v$next%05d")
      } finally {
        beat.interrupt()
        beat.join(10000)
      }
      // commit marker: tells vacuum this number is COMMITTED HISTORY
      // (safe to sweep immediately once superseded) rather than a
      // possibly-in-flight publish (age-gated — see vacuum). Written
      // AFTER the pointer, BEST-EFFORT: the publish is already durably
      // committed at this point, so a transient marker-create failure
      // must not fail the caller into a retry that would publish a
      // duplicate version — a committed version without a marker is
      // exactly the state vacuum's grace window already handles (swept
      // later instead of immediately; the safe direction).
      try Dfs.createExclusive(commitFile(root, next))
      catch { case scala.util.control.NonFatal(_) => }
      next
    }

  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(currentPath(root).getOrElse(
      throw new IllegalStateException(s"no CURRENT version in $root")))

  /** How long a claimed-but-never-committed version's markers must sit
    * untouched before vacuum may reclaim it as a crashed publish. A
    * LIVE publisher re-touches its claim every [[claimHeartbeatMs]]
    * (60 s), so any grace comfortably above the heartbeat separates
    * alive from dead regardless of how long the version write runs;
    * the hour default additionally covers publishers from pre-heartbeat
    * builds, whose claim mtime is fixed at claim time (for those the
    * grace must conservatively exceed the publish duration — same
    * contract as [[Dfs.writeStringAtomic]]'s temp-orphan grace).
    *
    * Staleness compares the vacuum CLIENT's clock against STORAGE-side
    * modification times, so client/storage skew eats directly into the
    * effective window. The hour default dwarfs realistic skew; callers
    * passing a small custom `graceMs` are assuming co-located (or
    * NTP-tight) clocks and should size the grace to heartbeat interval
    * + worst-case skew, not just the heartbeat. */
  val ClaimGraceMs: Long = 60L * 60 * 1000

  /** Drop versions older than the live one minus `keep` (readers of
    * recently-superseded versions keep working — MVCC-style). Claim
    * markers of dropped numbers go with them. Versions NEWER than the
    * live pointer are never touched (a racing publisher that committed
    * earlier but allocated higher).
    *
    * Cross-process safety — vacuum must not destroy an IN-FLIGHT
    * publish: a slow publisher's claimed number can fall ≤ the cutoff
    * once `keep`+2 racing publishes commit during its write; sweeping
    * its claim and partial dir then would let it eventually commit
    * `CURRENT` to a torn version. So only numbers carrying a
    * `.commit_vNNNNN` marker (provably committed history — written by
    * [[publish]] right after the pointer replace) are swept
    * immediately; a claimed-but-never-committed number is swept only
    * once its claim marker (heartbeat-refreshed by a live publisher —
    * see [[publish]]; the version DIR's top-level mtime is useless as
    * a liveness signal, since part-files land under the committer's
    * nested `_temporary` tree without touching it) and its dir have
    * been quiescent for `graceMs` — i.e. the publisher is dead, not
    * slow. Versions committed by pre-marker layouts lack the marker
    * and sweep after the grace window instead of immediately — a
    * delay, never a correctness loss. */
  def vacuum(root: String, keep: Int = 1, graceMs: Long = ClaimGraceMs): Seq[String] = {
    val live = currentVersion(root).getOrElse(return Nil)
    val cutoff = live - 1 - keep
    val stale = System.currentTimeMillis() - graceMs
    val listing = Dfs.list(Dfs.path(root))
    def nums(re: String, prefix: String) = listing.collect {
      case s if s.getPath.getName.matches(re) =>
        s.getPath.getName.stripPrefix(prefix).toInt -> s
    }
    val dirs = nums("v\\d{5}", "v").filter(_._2.isDirectory).toMap
    val claims = nums("\\.claim_v\\d{5}", ".claim_v").filter(_._2.isFile).toMap
    val commits = nums("\\.commit_v\\d{5}", ".commit_v").filter(_._2.isFile).toMap
    def sweepable(n: Int): Boolean =
      commits.contains(n) ||
        (claims.get(n).forall(_.getModificationTime < stale) &&
          dirs.get(n).forall(_.getModificationTime < stale))
    val targets = (dirs.keySet ++ claims.keySet ++ commits.keySet)
      .filter(n => n <= cutoff && sweepable(n))
    val dropped = targets.toSeq.sorted.flatMap { n =>
      val hadDir = dirs.contains(n)
      dirs.get(n).foreach(s => Dfs.delete(s.getPath))
      claims.get(n).foreach(s => Dfs.delete(s.getPath))
      commits.get(n).foreach(s => Dfs.delete(s.getPath))
      if (hadDir) Some(f"v$n%05d") else None
    }
    dropped
  }

  /** Recursive delete for LOCAL scratch state (temp dirs, staging
    * leftovers, bench workspaces — java.io callers by construction).
    * Store/sink maintenance on possibly-remote paths goes through
    * [[Dfs.delete]]. */
  def deleteRecursive(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursive)
    f.delete()
  }

  /** Small-file compaction: rewrite the live version into `numFiles`
    * files and commit as a new version (readers never see a half-
    * compacted store). Streaming sinks accrete one file per micro-batch
    * per partition — at 100 TB the file count, not the byte count,
    * becomes the scan bottleneck; periodic compaction through the same
    * atomic-pointer commit keeps scans healthy without pausing writers.
    * Returns (newVersion, filesBefore, filesAfter). */
  def compact(spark: SparkSession, root: String, numFiles: Int): (Int, Int, Int) = {
    val livePath = currentPath(root).getOrElse(
      throw new IllegalStateException(s"no CURRENT version in $root"))
    def parquetCount(dir: String): Int =
      Dfs.list(Dfs.path(dir)).count(_.getPath.getName.endsWith(".parquet"))
    val before = parquetCount(livePath)
    val v = publish(spark.read.parquet(livePath).coalesce(numFiles), root)
    (v, before, parquetCount(currentPath(root).get))
  }
}
