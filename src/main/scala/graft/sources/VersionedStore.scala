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
  private def currentFile(root: String) = new Path(root, "CURRENT")

  def currentVersion(root: String): Option[Int] = {
    val f = currentFile(root)
    if (Dfs.exists(f)) Some(Dfs.readString(f).trim.stripPrefix("v").toInt)
    else None
  }

  def currentPath(root: String): Option[String] =
    currentVersion(root).map(v => new Path(root, f"v$v%05d").toString)

  /** Write df as the next version and atomically commit the pointer.
    * Returns the new version number.
    *
    * Concurrency contract: one writer per store root. In-JVM that is
    * enforced here (version allocation + commit are serialized on the
    * root's intern'd lock); cross-process coordination is the caller's
    * (a second process racing publish could reuse a version number —
    * the pointer commit itself stays atomic either way, because
    * [[Dfs.writeStringAtomic]] gives each writer a pid-unique temp
    * sibling: racing publishers can interleave but never truncate each
    * other's in-flight bytes into a torn CURRENT). */
  def publish(df: DataFrame, root: String): Int =
    root.intern.synchronized {
      Dfs.mkdirs(Dfs.path(root))
      val next = currentVersion(root).getOrElse(0) + 1
      val dir = new Path(root, f"v$next%05d").toString
      df.write.mode("overwrite").parquet(dir)
      // contents are forced to stable storage BEFORE the pointer
      // replace: a crash may persist the rename metadata but not the
      // bytes, leaving CURRENT empty (Dfs.writeStringAtomic's contract)
      Dfs.writeStringAtomic(currentFile(root), f"v$next%05d")
      next
    }

  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(currentPath(root).getOrElse(
      throw new IllegalStateException(s"no CURRENT version in $root")))

  /** Drop versions older than the live one minus `keep` (readers of
    * recently-superseded versions keep working — MVCC-style). */
  def vacuum(root: String, keep: Int = 1): Seq[String] = {
    val live = currentVersion(root).getOrElse(return Nil)
    val dropped = Dfs.list(Dfs.path(root))
      .filter(s => s.isDirectory && s.getPath.getName.matches("v\\d{5}"))
      .filter(_.getPath.getName.stripPrefix("v").toInt <= live - 1 - keep)
    dropped.foreach(s => Dfs.delete(s.getPath))
    dropped.map(_.getPath.getName).sorted
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
