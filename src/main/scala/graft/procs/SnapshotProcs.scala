package graft.procs

import org.apache.spark.sql.{DataFrame, SparkSession}
import java.nio.file.{Files, Paths, StandardCopyOption}

/** `@SnapshotSave` / `@SnapshotRestore` analogue — the one VoltDB
  * admin surface (platform-level durability snapshots; the reference
  * app inherits it from the platform rather than calling it in demo
  * code) the procedure layer didn't already cover next to
  * `@Statistics` / load / truncate / nibble-delete.
  *
  * Layout: `root/<nonce>/<table>/` parquet per table, then
  * `root/<nonce>/MANIFEST.json` written LAST with fsync + atomic
  * rename — the commit marker. A crash mid-save leaves a nonce
  * directory with no manifest: restore refuses it, `listSnapshots`
  * reports it uncommitted, and a GC can reap it. Same
  * write-then-commit discipline as `VersionedStore.publish`.
  *
  * Restore validates per-table row counts against the manifest before
  * handing any relation out — a missing/truncated file fails loudly at
  * restore time, not silently downstream.
  *
  * Scale notes (100 TB): each table snapshot is a parallel parquet
  * write (cluster-wide, no driver funnel); the manifest holds only
  * (name, rows, files) — O(tables). Row-count validation is a
  * metadata-cheap parquet count (footer row groups), not a data scan.
  */
object SnapshotProcs {

  case class TableManifest(name: String, rows: Long, files: Long)

  private def manifestPath(root: String, nonce: String) =
    Paths.get(root, nonce, "MANIFEST.json")

  private def validName(s: String): Boolean =
    s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_' || c == '-')

  /** Snapshot every table; returns the per-table manifests. */
  def snapshotSave(tables: Map[String, DataFrame], root: String,
                   nonce: String): Seq[TableManifest] = {
    require(validName(nonce), s"bad nonce '$nonce'")
    require(tables.keys.forall(validName), "bad table name")
    require(!Files.exists(manifestPath(root, nonce)),
      s"snapshot '$nonce' already committed")
    val dir = Paths.get(root, nonce)
    Files.createDirectories(dir)
    val entries = tables.toSeq.sortBy(_._1).map { case (name, df) =>
      val tdir = dir.resolve(name).toString
      df.write.mode("overwrite").parquet(tdir)
      val files = new java.io.File(tdir).listFiles()
        .count(f => f.getName.endsWith(".parquet")).toLong
      // heartbeat for the reaper: the validation count below is
      // read-only (footer-metadata-cheap, but not instant at scale) —
      // touch the nonce dir so its mtime reflects save liveness
      Files.setLastModifiedTime(dir,
        java.nio.file.attribute.FileTime.fromMillis(System.currentTimeMillis()))
      val rows = df.sparkSession.read.parquet(tdir).count()
      TableManifest(name, rows, files)
    }
    val json = entries.map(e =>
      s"""{"name":"${e.name}","rows":${e.rows},"files":${e.files}}""")
      .mkString("[", ",", "]")
    val tmp = dir.resolve("MANIFEST.tmp")
    val ch = java.nio.channels.FileChannel.open(tmp,
      java.nio.file.StandardOpenOption.CREATE,
      java.nio.file.StandardOpenOption.WRITE,
      java.nio.file.StandardOpenOption.TRUNCATE_EXISTING)
    try {
      ch.write(java.nio.ByteBuffer.wrap(json.getBytes("UTF-8")))
      ch.force(true)
    } finally ch.close()
    Files.move(tmp, manifestPath(root, nonce), StandardCopyOption.ATOMIC_MOVE,
      StandardCopyOption.REPLACE_EXISTING)
    entries
  }

  /** Parse the committed manifest (minimal fixed-shape parser — the
    * writer above is the only producer). */
  def manifest(root: String, nonce: String): Seq[TableManifest] = {
    val p = manifestPath(root, nonce)
    require(Files.exists(p), s"snapshot '$nonce' has no committed manifest")
    val json = new String(Files.readAllBytes(p), "UTF-8")
    """\{"name":"([^"]+)","rows":(\d+),"files":(\d+)\}""".r
      .findAllMatchIn(json)
      .map(m => TableManifest(m.group(1), m.group(2).toLong, m.group(3).toLong))
      .toSeq
  }

  /** Restore all tables of a committed snapshot, validating row counts
    * against the manifest. */
  def snapshotRestore(spark: SparkSession, root: String,
                      nonce: String): Map[String, DataFrame] = {
    manifest(root, nonce).map { e =>
      val df = spark.read.parquet(Paths.get(root, nonce, e.name).toString)
      val rows = df.count()
      require(rows == e.rows,
        s"snapshot '$nonce' table '${e.name}': manifest says ${e.rows} rows, found $rows")
      e.name -> df
    }.toMap
  }

  /** (nonce, committed) for every snapshot directory under root. */
  def listSnapshots(root: String): Seq[(String, Boolean)] = {
    val d = new java.io.File(root)
    if (!d.isDirectory) Seq.empty
    else d.listFiles().filter(_.isDirectory).map(_.getName).sorted.toSeq
      .map(n => n -> Files.exists(manifestPath(root, n)))
  }

  /** Reap uncommitted snapshot directories (crash leftovers). A
    * manifest-less dir is also what an IN-PROGRESS save looks like
    * (the manifest is deliberately written last), so only dirs whose
    * newest file is older than `minAgeMillis` are reaped — a live
    * writer keeps touching its directory, a crashed one never will. */
  def reapUncommitted(root: String, minAgeMillis: Long = 3600000L): Seq[String] = {
    // null-safe walk: a sibling reaper may delete a dir mid-traversal
    // (listFiles -> null); treat vanished entries as age 0 so a racing
    // pass never NPEs and never double-deletes something fresh
    def newestMtime(f: java.io.File): Long =
      if (f.isDirectory)
        (f.lastModified +: Option(f.listFiles()).getOrElse(Array.empty).toSeq
          .map(newestMtime)).max
      else f.lastModified
    val cutoff = System.currentTimeMillis() - minAgeMillis
    listSnapshots(root).collect {
      case (n, false) if newestMtime(Paths.get(root, n).toFile) < cutoff =>
        graft.sources.VersionedStore.deleteRecursive(Paths.get(root, n).toFile)
        n
    }
  }
}
