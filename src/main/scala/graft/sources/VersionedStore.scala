package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** Crash-safe mutable-store layout: data lives in immutable versioned
  * directories (`root/v00001`, `v00002`, …) and readers resolve the
  * live version through a single `CURRENT` pointer file. Publishing
  * writes the new version directory completely, then commits by
  * atomically replacing `CURRENT` (write-to-temp + ATOMIC_MOVE) — a
  * crash at any point leaves either the old or the new version fully
  * live, never a missing store. This is the manifest-commit pattern
  * table formats use, at pointer-file granularity; it gives the
  * reference's `LoadDsa` transactional-swap guarantee
  * (`/root/reference/db/ddl.sql:31-43`) on immutable files.
  */
object VersionedStore {
  private def currentFile(root: String) = Paths.get(root, "CURRENT")

  def currentVersion(root: String): Option[Int] = {
    val f = currentFile(root)
    if (Files.exists(f)) Some(Files.readString(f).trim.stripPrefix("v").toInt)
    else None
  }

  def currentPath(root: String): Option[String] =
    currentVersion(root).map(v => Paths.get(root, f"v$v%05d").toString)

  /** Write df as the next version and atomically commit the pointer.
    * Returns the new version number.
    *
    * Concurrency contract: one writer per store root. In-JVM that is
    * enforced here (version allocation + commit are serialized on the
    * root's intern'd lock); cross-process coordination is the caller's
    * (a second process racing publish could reuse a version number —
    * the pointer commit itself stays atomic either way). */
  def publish(df: DataFrame, root: String): Int =
    root.intern.synchronized {
      Files.createDirectories(Paths.get(root))
      val next = currentVersion(root).getOrElse(0) + 1
      val dir = Paths.get(root, f"v$next%05d").toString
      df.write.mode("overwrite").parquet(dir)
      val tmp = Paths.get(root, s"CURRENT.tmp$next")
      // force contents to disk BEFORE the rename: a crash may persist
      // the rename metadata but not the bytes, leaving CURRENT empty
      val ch = java.nio.channels.FileChannel.open(tmp,
        java.nio.file.StandardOpenOption.CREATE,
        java.nio.file.StandardOpenOption.WRITE,
        java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
      try {
        ch.write(java.nio.ByteBuffer.wrap(f"v$next%05d".getBytes("UTF-8")))
        ch.force(true)
      } finally ch.close()
      Files.move(tmp, currentFile(root), StandardCopyOption.ATOMIC_MOVE,
        StandardCopyOption.REPLACE_EXISTING)
      next
    }

  def read(spark: SparkSession, root: String): DataFrame =
    spark.read.parquet(currentPath(root).getOrElse(
      throw new IllegalStateException(s"no CURRENT version in $root")))

  /** Drop versions older than the live one minus `keep` (readers of
    * recently-superseded versions keep working — MVCC-style). */
  def vacuum(root: String, keep: Int = 1): Seq[String] = {
    val live = currentVersion(root).getOrElse(return Nil)
    val dropped = Option(new java.io.File(root).listFiles()).getOrElse(Array.empty)
      .filter(f => f.isDirectory && f.getName.matches("v\\d{5}"))
      .filter(_.getName.stripPrefix("v").toInt <= live - 1 - keep)
    dropped.foreach(deleteRecursive)
    dropped.map(_.getName).toSeq.sorted
  }

  /** Shared recursive delete (also used by retention and staging
    * truncation — one implementation for all store maintenance). */
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
      Option(new java.io.File(dir).listFiles()).getOrElse(Array.empty)
        .count(_.getName.endsWith(".parquet"))
    val before = parquetCount(livePath)
    val v = publish(spark.read.parquet(livePath).coalesce(numFiles), root)
    (v, before, parquetCount(currentPath(root).get))
  }
}
