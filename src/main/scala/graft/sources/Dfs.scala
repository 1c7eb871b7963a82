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
      new java.util.WeakHashMap[SparkSession, (Long, Configuration)]())
  @volatile private var lastSessionConf: (Long, Configuration) = null
  private val confSeq = new java.util.concurrent.atomic.AtomicLong()

  /** Hadoop conf derived from the active-or-default session (so
    * `fs.defaultFS`, credentials, and `spark.hadoop.*` scheme settings
    * match what Spark's own reads use), with `file:` remapped to the
    * raw local filesystem — see class doc. A call on a thread with no
    * (inheritable-)thread-local session serves the last session's conf
    * (better than a bare one, which loses every credential); a bare
    * `Configuration` is built only before the first session exists,
    * per call, never cached. Returns ((confId, conf), fromSession);
    * confId is a monotonic per-derivation id — NOT an identity hash,
    * which a restarted session's new Configuration can collide with,
    * silently serving [[fs]] a memoized FileSystem whose defaultFS or
    * credentials belong to the dead session. */
  private def resolveConf(): ((Long, Configuration), Boolean) =
    SparkSession.getActiveSession.orElse(SparkSession.getDefaultSession) match {
      case Some(s) =>
        var c = sessionConfs.get(s)
        if (c == null) {
          c = (confSeq.incrementAndGet(), withRawLocal(s.sessionState.newHadoopConf()))
          sessionConfs.put(s, c)
          evictDeadConfs()
        }
        lastSessionConf = c
        (c, true)
      case None =>
        val c = lastSessionConf
        if (c != null) (c, true)
        else ((-1L, withRawLocal(new Configuration())), false)
    }

  def conf: Configuration = resolveConf()._1._2

  private val fsCache =
    new java.util.concurrent.ConcurrentHashMap[String, FileSystem]()

  /** Instances retired by the PREVIOUS eviction pass, closed on this
    * one. Closing at retirement time races sessionless threads: one can
    * read `lastSessionConf`, lose the CPU, and a concurrent new-conf
    * derivation evicts+closes the old id's FileSystems before the first
    * thread's call completes on one of them. Deferring the close by a
    * full derivation generation (session-restart frequency) puts it far
    * outside any single in-flight [[fs]] call. */
  private var pendingClose: List[FileSystem] = Nil

  /** Drop (and eventually close) FileSystems built from confs no longer
    * reachable from any live session — a restarted session retires its
    * old conf, and the private instances built from it would otherwise
    * leak for the JVM's life. Runs only when a NEW conf is derived
    * (session restart frequency, not per-call). The lastSessionConf
    * fallback id is kept live so sessionless threads never get a closed FS. */
  private def evictDeadConfs(): Unit = synchronized {
    val live = {
      val ids = scala.collection.mutable.Set[Long]()
      sessionConfs.synchronized {
        val it = sessionConfs.values().iterator()
        while (it.hasNext) ids += it.next()._1
      }
      val last = lastSessionConf
      if (last != null) ids += last._1
      ids
    }
    val retired = scala.collection.mutable.ListBuffer[FileSystem]()
    val it = fsCache.entrySet().iterator()
    while (it.hasNext) {
      val e = it.next()
      val parts = e.getKey.split(":", 3)
      if (!live.contains(parts(0).toLong)) {
        it.remove()
        // close ONLY instances we privately built. withRawLocal disables
        // Hadoop's shared cache for `file:` alone, so closeability must
        // be decided from the RESOLVED instance, not the key: a
        // scheme-less ("null"-key) path resolves through fs.defaultFS,
        // and when that is HDFS/S3 (the 100 TB deployment shape) the
        // instance is the Hadoop-GLOBAL-cached FileSystem Spark's own
        // scans share — closing it kills them with "Filesystem closed".
        // For those, evicting the reference is enough; the global cache
        // still owns the instance.
        if (e.getValue.getUri.getScheme == "file") retired += e.getValue
      }
    }
    val closeNow = pendingClose
    pendingClose = retired.toList
    closeNow.foreach(f => try f.close() catch { case _: java.io.IOException => })
  }

  def fs(p: Path): FileSystem = {
    val ((id, c), fromSession) = resolveConf()
    val u = p.toUri
    // keyed ALSO by the conf's derivation id: a restarted session
    // re-derives its conf, and a FileSystem built from the old one may
    // point scheme-less paths at a stale defaultFS or carry dead
    // credentials. Entries for retired confs are closed and evicted by
    // [[evictDeadConfs]] on the next derivation.
    // Never memoize an instance built from the sessionless fallback
    // conf — it may point scheme-less paths at the wrong defaultFS.
    if (fromSession)
      fsCache.computeIfAbsent(
        s"$id:${u.getScheme}:${u.getAuthority}",
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

  /** Atomically create an empty file, failing if it already exists —
    * the cross-process claim primitive ([[VersionedStore]] version
    * allocation). Local goes through `Files.createFile` (POSIX
    * O_CREAT|O_EXCL — `RawLocalFileSystem.create(overwrite=false)` is
    * a check-then-act TOCTOU, not atomic); HDFS `create(overwrite
    * =false)` is atomic at the namenode. Returns true iff THIS caller
    * created the file. */
  def createExclusive(p: Path): Boolean =
    if (isLocal(p)) {
      try {
        java.nio.file.Files.createFile(
          java.nio.file.Paths.get(fs(p).makeQualified(p).toUri.getPath))
        true
      } catch { case _: java.nio.file.FileAlreadyExistsException => false }
    } else {
      try { fs(p).create(p, false).close(); true }
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
        case e: java.io.IOException if isFileExists(e, p) => false
      }
    }

  /** HDFS wraps the already-exists refusal in plain IOExceptions on
    * some paths (e.g. lease conflicts rendered as AlreadyBeingCreated).
    * Classify conservatively: the exists-shaped text must NAME the
    * claimed file — a generic match on "already exists" would also
    * swallow "parent path … already exists as a file" or quota error
    * prose, turning a real failure into a silent lost-race `false`
    * (the claim loop would then skip numbers forever instead of
    * surfacing the fault). The cause-chain walk is depth-bounded
    * against (theoretical) cyclic chains.
    *
    * Deliberate fail-loud tradeoff: a filesystem whose exists-refusal
    * text omits the path entirely (some wrapper renderings) makes
    * [[createExclusive]] THROW instead of returning a lost-race
    * `false`. That surfaces as a loud publish failure — retryable,
    * never corrupting. Such environments should map their refusal to
    * `FileAlreadyExistsException` (the typed case above), which is the
    * Hadoop contract for this condition. */
  private def isFileExists(t: Throwable, p: Path): Boolean = {
    val name = p.getName
    @annotation.tailrec
    def walk(x: Throwable, depth: Int): Boolean =
      if (x == null || depth > 8) false
      else if (Option(x.getMessage).exists(m =>
        m.contains(name) &&
          (m.contains("already exists") || m.contains("AlreadyBeingCreated"))))
        true
      else walk(x.getCause, depth + 1)
    walk(t, 0)
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

  private val tmpSeq = new java.util.concurrent.atomic.AtomicLong()

  /** How long a writer's temp sibling must sit untouched before the
    * vacuum in [[writeStringAtomic]] may reclaim it as a crash orphan.
    * An in-flight writer holds its temp for milliseconds (one small
    * write + force + rename), so fifteen minutes is conservatively
    * outside any live write — while still bounding how long a crashed
    * attempt's dot-file survives (until the target's next write). */
  private val TmpOrphanGraceMs = 15L * 60 * 1000

  /** Durable small-file write: content lands in a temp sibling, is
    * forced to stable storage (hsync on HDFS; FileChannel.force
    * locally, where raw-local hsync may degrade to flush), then
    * atomically replaces `p` — a crash leaves the old or the new
    * content fully live, never a torn file. */
  def writeStringAtomic(p: Path, content: String): Unit = {
    // UNIQUE temp name per attempt (pid + in-process counter): two
    // racing publishers must never share a temp path — with a shared
    // deterministic name, writer B's create(overwrite) truncates
    // writer A's in-flight bytes and A's rename publishes a TORN
    // target, the exact state this method exists to prevent (and the
    // one VersionedStore's cross-process contract note rules out).
    // The orphan concern that motivated a deterministic name is
    // handled by the age-gated vacuum below instead.
    val tmp = new Path(p.getParent,
      s".${p.getName}.tmp.${ProcessHandle.current().pid()}-${tmpSeq.incrementAndGet()}")
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
    // vacuum crash orphans: unique names mean each crashed attempt
    // leaves one dot-file; reclaim siblings of THIS target that are
    // older than the grace window, so a concurrent writer's fresh
    // temp is never deleted from under its rename. (Also sweeps the
    // pre-unique-name `.{name}.tmp` form left by older versions.)
    val cutoff = System.currentTimeMillis() - TmpOrphanGraceMs
    list(p.getParent)
      .filter(s => s.isFile && s.getPath.getName.startsWith(s".${p.getName}.tmp") &&
        s.getModificationTime < cutoff)
      .foreach(s => delete(s.getPath))
  }
}
