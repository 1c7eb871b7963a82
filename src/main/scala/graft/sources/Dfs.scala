package graft.sources

import org.apache.hadoop.conf.Configuration
import org.apache.hadoop.fs.{FileContext, FileStatus, FileSystem, Options, Path}
import org.apache.spark.sql.SparkSession

/** Filesystem facade for every exactly-once maintenance protocol
  * (compaction swaps, batch-keyed index appends, retention drops,
  * versioned-store commits).
  *
  * Why it exists: the protocols were originally written against
  * `java.io.File`/`java.nio.file`, which only works when the store is
  * the driver's local POSIX disk. At the 100 TB design point the sink
  * and the ANN indexes live on shared storage (HDFS or an object
  * store), where a `File` walk silently sees nothing — so every
  * metadata operation here resolves through the Hadoop `FileSystem`
  * for the path's scheme (the same filesystems the parquet reads and
  * writes already target, cf. [[graft.procs.SnapshotProcs]]).
  *
  * Semantics by scheme — the protocols' correctness hinges on rename
  * atomicity, so the differences are load-bearing:
  *
  *  - `file:` — resolved to `RawLocalFileSystem` (not the checksummed
  *    `LocalFileSystem`): behavior-identical to the `java.io` code it
  *    replaces — no `.crc` side files can appear inside partition
  *    directories whose listings the protocols reason about, and
  *    renames are POSIX `rename(2)`. Overwriting renames and pointer
  *    fsyncs take a local fast path (`java.nio` ATOMIC_MOVE /
  *    `FileChannel.force`) because the generic Hadoop API is WEAKER
  *    than POSIX there (`FileContext.rename(OVERWRITE)` may
  *    delete-then-rename on local).
  *  - `hdfs:` — `FileSystem.rename` is atomic, and
  *    `FileContext.rename(..., Options.Rename.OVERWRITE)` is an atomic
  *    replace; `hsync` forces the pointer bytes to the datanodes. The
  *    two-rename compaction swap and the `b<batchId>.parquet` replace
  *    carry over unchanged.
  *  - object stores (`s3a:` etc.) — rename is copy+delete, NOT atomic.
  *    The swap protocols remain crash-CONSISTENT there (every state the
  *    self-heal repairs is still reachable, none loses data) but a
  *    reader can observe a partially-renamed directory, so on object
  *    stores the compaction pass must be fenced from probes (run it in
  *    the ingest loop's exclusive window, as [[graft.streaming.IndexFreshness]]
  *    does) or the store fronted by a manifest commit
  *    ([[VersionedStore]]'s pointer pattern — the table-format answer).
  *    See IMPLEMENTATION.md "Maintenance on shared storage".
  */
object Dfs {
  private def withRawLocal(c: Configuration): Configuration = {
    c.set("fs.file.impl", "org.apache.hadoop.fs.RawLocalFileSystem")
    // don't poison Hadoop's global FS cache with the raw impl — Spark's
    // own `file:` reads keep their default; we memoize our instances
    c.setBoolean("fs.file.impl.disable.cache", true)
    c
  }

  /** Per-session derived confs (weak keys — a stopped session is never
    * pinned) plus the most recent one for session-less threads. A
    * single cached conf would either go stale on a session restart
    * (old `fs.defaultFS`/credentials served forever while Spark's own
    * reads use the live session's) or, re-derived on every flip
    * between two live sessions, mint an unbounded stream of fresh
    * `Configuration` instances for [[fs]] to key FileSystems by. */
  private val sessionConfs =
    java.util.Collections.synchronizedMap(
      new java.util.WeakHashMap[SparkSession, Configuration]())
  @volatile private var lastSessionConf: Configuration = null

  /** Hadoop conf derived from the active-or-default session (so
    * `fs.defaultFS`, credentials, and `spark.hadoop.*` scheme settings
    * match what Spark's own reads use), with `file:` remapped to the
    * raw local filesystem — see class doc. A call on a thread with no
    * (inheritable-)thread-local session serves the last session's conf
    * (better than a bare one, which loses every credential); a bare
    * `Configuration` is built only before the first session exists,
    * per call, never cached. Returns (conf, fromSession). */
  private def resolveConf(): (Configuration, Boolean) =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) =>
        var c = sessionConfs.get(s)
        if (c == null) {
          c = withRawLocal(s.sessionState.newHadoopConf())
          sessionConfs.put(s, c)
        }
        lastSessionConf = c
        (c, true)
      case None =>
        val c = lastSessionConf
        if (c != null) (c, true) else (withRawLocal(new Configuration()), false)
    }

  def conf: Configuration = resolveConf()._1

  private val fsCache =
    new java.util.concurrent.ConcurrentHashMap[String, FileSystem]()

  def fs(p: Path): FileSystem = {
    val (c, fromSession) = resolveConf()
    val u = p.toUri
    // keyed ALSO by the conf instance: a restarted session re-derives
    // its conf, and a FileSystem built from the old one may point
    // scheme-less paths at a stale defaultFS or carry dead credentials.
    // Stale entries rot unused, bounded by session restarts per JVM.
    // Never memoize an instance built from the sessionless fallback
    // conf — it may point scheme-less paths at the wrong defaultFS.
    if (fromSession)
      fsCache.computeIfAbsent(
        s"${System.identityHashCode(c)}:${u.getScheme}:${u.getAuthority}",
        _ => p.getFileSystem(c))
    else p.getFileSystem(c)
  }

  def path(s: String): Path = new Path(s)

  /** Fully-qualified URI string (`file:/…`, `hdfs://nn/…`) — the form
    * `DataFrame.inputFiles` reports, for listing-vs-plan comparisons. */
  def qualify(s: String): String = {
    val p = path(s)
    fs(p).makeQualified(p).toString
  }

  def exists(p: Path): Boolean = fs(p).exists(p)

  def isLocal(p: Path): Boolean = {
    val scheme = fs(p).getUri.getScheme
    scheme == null || scheme == "file"
  }

  /** Children of `p`, name-sorted; empty if `p` doesn't exist (the
    * `Option(listFiles).getOrElse(empty)` idiom of the File code). */
  def list(p: Path): Seq[FileStatus] =
    try fs(p).listStatus(p).toSeq.sortBy(_.getPath.getName)
    catch { case _: java.io.FileNotFoundException => Nil }

  def mkdirs(p: Path): Unit = fs(p).mkdirs(p)

  /** Recursive delete; false if `p` was already absent. */
  def delete(p: Path): Boolean =
    try fs(p).delete(p, true)
    catch { case _: java.io.FileNotFoundException => false }

  /** Atomic rename, destination must not exist (both halves of the
    * compaction swap; staging publishes). Fails loudly — a false return
    * from `FileSystem.rename` is a protocol violation, never a state
    * the self-heal should be left to find. */
  def rename(src: Path, dst: Path): Unit =
    require(fs(src).rename(src, dst), s"rename failed: $src -> $dst")

  /** Rename that REPLACES an existing destination — the replay path of
    * `b<batchId>.parquet` appends and the CURRENT-pointer commit.
    * Local: POSIX atomic move. Remote: `FileContext` OVERWRITE rename
    * (atomic on HDFS; see class doc for object stores). */
  def renameOverwrite(src: Path, dst: Path): Unit =
    if (isLocal(dst)) {
      val f = fs(dst)
      java.nio.file.Files.move(
        java.nio.file.Paths.get(f.makeQualified(src).toUri.getPath),
        java.nio.file.Paths.get(f.makeQualified(dst).toUri.getPath),
        java.nio.file.StandardCopyOption.ATOMIC_MOVE,
        java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    } else {
      val f = fs(dst)
      val fc = FileContext.getFileContext(f.getUri, conf)
      fc.rename(f.makeQualified(src), f.makeQualified(dst),
        Options.Rename.OVERWRITE)
    }

  /** Read to EOF on the opened stream — never stat-then-read: a
    * [[writeStringAtomic]] replace landing between the two would serve
    * the OLD length against the NEW file, silently truncating a
    * pointer read (`v100000` read with len 6 = a valid-looking
    * `v10000`). One open sees one file fully, old or new. */
  def readString(p: Path): String = {
    val in = fs(p).open(p)
    try {
      val buf = new java.io.ByteArrayOutputStream()
      val chunk = new Array[Byte](8192)
      var n = in.read(chunk)
      while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
      new String(buf.toByteArray, "UTF-8")
    } finally in.close()
  }

  /** Durable small-file write: content lands in a temp sibling, is
    * forced to stable storage (hsync on HDFS; FileChannel.force
    * locally, where raw-local hsync may degrade to flush), then
    * atomically replaces `p` — a crash leaves the old or the new
    * content fully live, never a torn file. */
  def writeStringAtomic(p: Path, content: String): Unit = {
    // deterministic temp name, NOT a unique one: a crash between
    // create and rename must leave at most ONE orphan per target —
    // truncated and reused by the next write — never one fresh
    // dot-file per crash that no vacuum ever reclaims. Safe because
    // every caller is single-writer per target (VersionedStore
    // serializes publishes; the compaction manifest is written by the
    // single maintenance pass).
    val tmp = new Path(p.getParent, s".${p.getName}.tmp")
    val f = fs(tmp)
    val out = f.create(tmp, true)
    try {
      out.write(content.getBytes("UTF-8"))
      out.hsync()
    } finally out.close()
    if (isLocal(tmp)) {
      val ch = java.nio.channels.FileChannel.open(
        java.nio.file.Paths.get(f.makeQualified(tmp).toUri.getPath),
        java.nio.file.StandardOpenOption.WRITE)
      try ch.force(true) finally ch.close()
    }
    renameOverwrite(tmp, p)
  }
}
