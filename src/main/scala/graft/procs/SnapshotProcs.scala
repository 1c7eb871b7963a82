package graft.procs

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileStatus, FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}

/** `@SnapshotSave` / `@SnapshotRestore` analogue — the one VoltDB
  * admin surface (platform-level durability snapshots; the reference
  * app inherits it from the platform rather than calling it in demo
  * code) the procedure layer didn't already cover next to
  * `@Statistics` / load / truncate / nibble-delete.
  *
  * Layout: `root/<nonce>/<table>/` parquet per table, then
  * `root/<nonce>/MANIFEST.json` written LAST with hsync + rename —
  * the commit marker. A crash mid-save leaves a nonce directory with
  * no manifest: restore refuses it, `listSnapshots` reports it
  * uncommitted, and a GC can reap it. Same write-then-commit
  * discipline as `VersionedStore.publish`.
  *
  * ALL filesystem metadata operations go through the Hadoop
  * `FileSystem` API resolved from the root path's scheme — the same
  * filesystems the parquet writes target — so save/list/reap behave
  * identically whether root is `file:`, `hdfs:` or `s3a:` (a
  * `java.io.File` walk would silently see nothing on a remote root,
  * the stated 100 TB deployment shape).
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

  private def hadoopConf: Configuration =
    SparkSession.getActiveSession
      .map(_.sessionState.newHadoopConf())
      .getOrElse(new Configuration())

  private def fsFor(root: String): (FileSystem, Path) = {
    val p = new Path(root)
    (p.getFileSystem(hadoopConf), p)
  }

  private def manifestPath(rootP: Path, nonce: String): Path =
    new Path(new Path(rootP, nonce), "MANIFEST.json")

  private def validName(s: String): Boolean =
    s.nonEmpty && s.forall(c => c.isLetterOrDigit || c == '_' || c == '-')

  /** Snapshot every table; returns the per-table manifests. */
  def snapshotSave(tables: Map[String, DataFrame], root: String,
                   nonce: String): Seq[TableManifest] = {
    require(validName(nonce), s"bad nonce '$nonce'")
    require(tables.keys.forall(validName), "bad table name")
    val (fs, rootP) = fsFor(root)
    require(!fs.exists(manifestPath(rootP, nonce)),
      s"snapshot '$nonce' already committed")
    val dir = new Path(rootP, nonce)
    fs.mkdirs(dir)
    val entries = tables.toSeq.sortBy(_._1).map { case (name, df) =>
      val tdir = new Path(dir, name)
      df.write.mode("overwrite").parquet(tdir.toString)
      val files = fs.listStatus(tdir)
        .count(_.getPath.getName.endsWith(".parquet")).toLong
      // heartbeat for the reaper: the validation count below is
      // read-only (footer-metadata-cheap, but not instant at scale) —
      // touch the nonce dir so its mtime reflects save liveness
      fs.setTimes(dir, System.currentTimeMillis(), -1)
      val rows = df.sparkSession.read.parquet(tdir.toString).count()
      TableManifest(name, rows, files)
    }
    val json = entries.map(e =>
      s"""{"name":"${e.name}","rows":${e.rows},"files":${e.files}}""")
      .mkString("[", ",", "]")
    val tmp = new Path(dir, "MANIFEST.tmp")
    val out = fs.create(tmp, /*overwrite=*/ true)
    try {
      out.write(json.getBytes("UTF-8"))
      out.hsync() // durable before the rename publishes it
    } finally out.close()
    val mp = manifestPath(rootP, nonce)
    if (fs.exists(mp)) fs.delete(mp, false) // rename won't overwrite on HDFS
    require(fs.rename(tmp, mp), s"snapshot '$nonce': manifest rename failed")
    entries
  }

  /** Parse the committed manifest (minimal fixed-shape parser — the
    * writer above is the only producer). */
  def manifest(root: String, nonce: String): Seq[TableManifest] = {
    val (fs, rootP) = fsFor(root)
    val p = manifestPath(rootP, nonce)
    require(fs.exists(p), s"snapshot '$nonce' has no committed manifest")
    val in = fs.open(p)
    val json = try new String(in.readAllBytes(), "UTF-8") finally in.close()
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
      val df = spark.read.parquet(new Path(new Path(root, nonce), e.name).toString)
      val rows = df.count()
      require(rows == e.rows,
        s"snapshot '$nonce' table '${e.name}': manifest says ${e.rows} rows, found $rows")
      e.name -> df
    }.toMap
  }

  /** (nonce, committed) for every snapshot directory under root. */
  def listSnapshots(root: String): Seq[(String, Boolean)] = {
    val (fs, rootP) = fsFor(root)
    if (!fs.exists(rootP) || !fs.getFileStatus(rootP).isDirectory) Seq.empty
    else fs.listStatus(rootP).filter(_.isDirectory)
      .map(_.getPath.getName).sorted.toSeq
      .map(n => n -> fs.exists(manifestPath(rootP, n)))
  }

  /** Reap uncommitted snapshot directories (crash leftovers). A
    * manifest-less dir is also what an IN-PROGRESS save looks like
    * (the manifest is deliberately written last), so only dirs whose
    * newest file is older than `minAgeMillis` are reaped — a live
    * writer keeps touching its directory, a crashed one never will. */
  def reapUncommitted(root: String, minAgeMillis: Long = 3600000L): Seq[String] = {
    val (fs, rootP) = fsFor(root)
    // race-safe walk: a sibling reaper may delete a dir mid-traversal
    // (FileNotFound on listStatus); treat vanished entries as age 0 so
    // a racing pass never throws and never double-deletes something
    // fresh
    def newestMtime(st: FileStatus): Long =
      if (!st.isDirectory) st.getModificationTime
      else {
        val children =
          try fs.listStatus(st.getPath).toSeq
          catch { case _: java.io.FileNotFoundException => return Long.MaxValue }
        (st.getModificationTime +: children.map(newestMtime)).max
      }
    val cutoff = System.currentTimeMillis() - minAgeMillis
    listSnapshots(root).collect {
      case (n, false) if (try newestMtime(fs.getFileStatus(new Path(rootP, n)))
                          catch { case _: java.io.FileNotFoundException => Long.MaxValue }) < cutoff =>
        fs.delete(new Path(rootP, n), true)
        n
    }
  }
}
