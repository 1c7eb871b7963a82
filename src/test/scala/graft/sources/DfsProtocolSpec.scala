package graft.sources

import graft.SparkSpec
import graft.operators.AnnIndex
import org.apache.spark.sql.functions._

/** Every exactly-once maintenance protocol must run against a
  * Hadoop-`FileSystem` path, not only the driver's POSIX disk — at the
  * 100 TB design point the sink and the ANN indexes live on shared
  * storage. Each test here drives a protocol end-to-end through an
  * explicit `file://`-schemed URI, so all metadata ops resolve through
  * [[Dfs]] exactly as they would on `hdfs://` (where the renames the
  * protocols lean on are equally atomic — see Dfs's scheme notes). */
class DfsProtocolSpec extends SparkSpec {

  private def schemed(prefix: String): String =
    "file://" + java.nio.file.Files.createTempDirectory(prefix).toString

  test("Dfs primitives: atomic string write, read-back, overwrite rename") {
    val root = Dfs.path(schemed("graft_dfs"))
    val p = new org.apache.hadoop.fs.Path(root, "CURRENT")
    Dfs.writeStringAtomic(p, "v00001")
    assert(Dfs.readString(p) == "v00001")
    Dfs.writeStringAtomic(p, "v00002") // replace an existing pointer
    assert(Dfs.readString(p) == "v00002")
    // no torn temp siblings left behind
    assert(Dfs.list(root).map(_.getPath.getName) == Seq("CURRENT"))
    val q = new org.apache.hadoop.fs.Path(root, "Q")
    Dfs.writeStringAtomic(q, "x")
    Dfs.renameOverwrite(q, p) // REPLACE semantics over an existing file
    assert(Dfs.readString(p) == "x" && !Dfs.exists(q))
  }

  test("writeStringAtomic: racing writers never tear the target") {
    val root = Dfs.path(schemed("graft_dfs_race"))
    Dfs.mkdirs(root)
    val p = new org.apache.hadoop.fs.Path(root, "CURRENT")
    Dfs.writeStringAtomic(p, "v00000")
    // two writers share the TARGET but (post-fix) never a temp path: a
    // deterministic shared temp let writer B's create(overwrite)
    // truncate writer A's in-flight bytes, so A's rename could publish
    // a torn pointer. Readers must only ever see a complete value.
    val errs = new java.util.concurrent.ConcurrentLinkedQueue[String]()
    val writers = (0 until 2).map { w =>
      new Thread(() => {
        try (1 to 40).foreach(i => Dfs.writeStringAtomic(p, f"v${w * 1000 + i}%05d"))
        catch { case t: Throwable => errs.add(s"writer $w: $t") }
      })
    }
    val reader = new Thread(() => {
      try (1 to 200).foreach { _ =>
        val v = Dfs.readString(p)
        if (!v.matches("v\\d{5}")) errs.add(s"torn read: '$v'")
      }
      catch { case t: Throwable => errs.add(s"reader: $t") }
    })
    (writers :+ reader).foreach(_.start())
    (writers :+ reader).foreach(_.join())
    assert(errs.isEmpty, s"racing writers broke the pointer: $errs")
    assert(Dfs.readString(p).matches("v\\d{5}"))
  }

  test("writeStringAtomic: age-gated vacuum reclaims crash orphans, spares fresh temps") {
    val root = Dfs.path(schemed("graft_dfs_vac"))
    Dfs.mkdirs(root)
    val p = new org.apache.hadoop.fs.Path(root, "CURRENT")
    Dfs.writeStringAtomic(p, "v00001")
    // a crashed attempt's orphan (unique name, old mtime) and a
    // concurrent writer's FRESH temp (recent mtime)
    val old1 = new org.apache.hadoop.fs.Path(root, ".CURRENT.tmp.999-1")
    val old2 = new org.apache.hadoop.fs.Path(root, ".CURRENT.tmp") // pre-unique-name form
    val fresh = new org.apache.hadoop.fs.Path(root, ".CURRENT.tmp.999-2")
    Seq(old1, old2, fresh).foreach { t =>
      val out = Dfs.fs(t).create(t, true)
      out.write("torn".getBytes("UTF-8")); out.close()
    }
    val stale = System.currentTimeMillis() - 60L * 60 * 1000
    Seq(old1, old2).foreach(t => Dfs.fs(t).setTimes(t, stale, stale))
    Dfs.writeStringAtomic(p, "v00002")
    assert(!Dfs.exists(old1) && !Dfs.exists(old2), "stale orphans must be vacuumed")
    assert(Dfs.exists(fresh), "a fresh temp (possible in-flight writer) must be spared")
    assert(Dfs.readString(p) == "v00002")
  }

  test("VersionedStore: publish/read/vacuum/compact through file://") {
    import spark.implicits._
    val root = schemed("graft_vstore")
    assert(VersionedStore.currentVersion(root).isEmpty)
    VersionedStore.publish(Seq(1, 2, 3).toDF("x"), root)
    assert(VersionedStore.read(spark, root).count() == 3)
    VersionedStore.publish(Seq(4, 5).toDF("x").repartition(4), root)
    assert(VersionedStore.read(spark, root).count() == 2)
    val (v, before, after) = VersionedStore.compact(spark, root, 1)
    assert(v == 3 && before > 1 && after == 1)
    assert(VersionedStore.read(spark, root).count() == 2)
    val dropped = VersionedStore.vacuum(root, keep = 0)
    assert(dropped == Seq("v00001", "v00002"))
    assert(VersionedStore.read(spark, root).count() == 2)
  }

  test("VersionedStore: a live publisher's claim heartbeat keeps its version un-vacuumable") {
    import spark.implicits._
    val root = schemed("graft_vsheartbeat")
    VersionedStore.publish(Seq(1).toDF("x"), root) // v1, live
    val prevBeat = VersionedStore.claimHeartbeatMs
    VersionedStore.claimHeartbeatMs = 100
    val beats = new java.util.concurrent.atomic.AtomicInteger(0)
    try {
      VersionedStore.onClaimed = v => {
        val claim = Dfs.path(s"$root/.claim_v0000$v")
        // freshly-claimed marker is empty; each heartbeat atomically
        // replaces it with a millis stamp — observe >= 2 refreshes
        // while the publisher is "slow" (stalled here, mid-publish)
        val deadline = System.currentTimeMillis() + 10000
        var last = ""
        while (beats.get() < 2 && System.currentTimeMillis() < deadline) {
          val cur = if (Dfs.exists(claim)) Dfs.readString(claim) else ""
          if (cur.nonEmpty && cur != last) { beats.incrementAndGet(); last = cur }
          Thread.sleep(20)
        }
      }
      VersionedStore.publish(Seq(2).toDF("x"), root) // v2, stalls in the hook
      assert(beats.get() >= 2,
        s"claim heartbeat must refresh the marker while the publish runs: ${beats.get()}")
      // and the heartbeat STOPS with the publish: the claim goes
      // quiescent, so a later vacuum can reclaim a genuinely dead claim
      val claim2 = Dfs.path(s"$root/.claim_v00002")
      val at = Dfs.readString(claim2)
      Thread.sleep(400)
      assert(Dfs.readString(claim2) == at,
        "heartbeat must stop once the publish commits")
    } finally {
      VersionedStore.onClaimed = _ => ()
      VersionedStore.claimHeartbeatMs = prevBeat
    }
  }

  test("compactPartitions: swap + self-heal branches through file://") {
    import spark.implicits._
    val dir = schemed("graft_hcompact") + "/sink"
    (0L until 900L).map(i => (i, s"k${i % 3}")).toDF("id", "k")
      .repartition(6).write.mode("overwrite").partitionBy("k").parquet(dir)
    val report = SourcesOps.compactPartitionsReport(spark, dir, numFiles = 1)
    assert(report.healed == 0 && report.rewritten.size == 3)
    report.rewritten.foreach { case (_, b, a) => assert(b > 1 && a == 1) }
    assert(spark.read.parquet(dir).count() == 900)

    // mid-swap crash (live absent, only copy in trash) on the schemed
    // path: heal restores and reports it
    val part = Dfs.list(Dfs.path(dir)).filter(_.getPath.getName.startsWith("k=")).head.getPath
    Dfs.rename(part, new org.apache.hadoop.fs.Path(
      part.getParent, s".compact_trash_${part.getName}"))
    val heal = SourcesOps.compactPartitionsReport(spark, dir, numFiles = 1,
      minFilesToCompact = 1000000)
    assert(heal.healed == 1 && heal.rewritten.isEmpty && heal.changedLiveFiles)
    assert(spark.read.parquet(dir).count() == 900, "heal lost rows")
  }

  test("compactPartitions heal: restore leaves no dead tmp dir or stale manifest") {
    import spark.implicits._
    val dir = schemed("graft_hcrash") + "/sink"
    (0L until 300L).map(i => (i, s"k${i % 2}")).toDF("id", "k")
      .repartition(4).write.mode("overwrite").partitionBy("k").parquet(dir)
    // hand-build the exact crash state between the swap's two renames:
    // live absent, manifest-bearing trash holds the only copy, the
    // compacted output stranded in tmp
    val root = Dfs.path(dir)
    val part = Dfs.list(root).filter(_.getPath.getName.startsWith("k=")).head.getPath
    val trash = new org.apache.hadoop.fs.Path(root, s".compact_trash_${part.getName}")
    val tmp = new org.apache.hadoop.fs.Path(root, s".compact_tmp_${part.getName}")
    spark.read.parquet(part.toString).coalesce(1)
      .write.mode("overwrite").parquet(tmp.toString)
    Dfs.writeStringAtomic(new org.apache.hadoop.fs.Path(part, "_COMPACT_MANIFEST"),
      Dfs.list(tmp).map(_.getPath.getName)
        .filter(_.endsWith(".parquet")).mkString("\n"))
    Dfs.rename(part, trash) // rename 1 landed; crash before rename 2
    // the partition stays under the trigger, so the heal pass is the
    // ONLY thing that acts — it must restore and leave no debris
    val heal = SourcesOps.compactPartitionsReport(spark, dir, numFiles = 1,
      minFilesToCompact = 1000000)
    assert(heal.healed == 1 && heal.rewritten.isEmpty)
    assert(spark.read.parquet(dir).count() == 300, "heal lost rows")
    val names = Dfs.list(root).map(_.getPath.getName)
    assert(!names.exists(_.startsWith(".compact_tmp_")), s"dead tmp survived: $names")
    assert(!names.exists(_.startsWith(".compact_trash_")), s"trash survived: $names")
    assert(!Dfs.list(part).map(_.getPath.getName).contains("_COMPACT_MANIFEST"),
      "stale manifest left in restored live dir")
  }

  test("compactPartitions heal: copy+delete rename crash shape does not duplicate rows") {
    import spark.implicits._
    val dir = schemed("graft_hs3") + "/sink"
    (0L until 400L).map(i => (i, s"k${i % 2}")).toDF("id", "k")
      .repartition(3).write.mode("overwrite").partitionBy("k").parquet(dir)
    // object-store rename is copy+delete, NOT atomic: a crash between
    // the copy and the delete of the swap's FIRST rename leaves live
    // and trash holding IDENTICAL files (manifest included). Hand-build
    // that state on file:// — the heal must recognize the trash as the
    // same bytes and merge to the SAME row count, never a healed_*
    // duplicate of every part file.
    val root = Dfs.path(dir)
    val part = Dfs.list(root).filter(_.getPath.getName.startsWith("k=")).head.getPath
    val trash = new org.apache.hadoop.fs.Path(root, s".compact_trash_${part.getName}")
    Dfs.writeStringAtomic(new org.apache.hadoop.fs.Path(part, "_COMPACT_MANIFEST"),
      "part-00000-would-have-been-compacted.parquet")
    Dfs.mkdirs(trash)
    Dfs.list(part).foreach { s =>
      org.apache.hadoop.fs.FileUtil.copy(
        Dfs.fs(s.getPath), s.getPath,
        Dfs.fs(trash), new org.apache.hadoop.fs.Path(trash, s.getPath.getName),
        false, Dfs.conf)
    }
    val heal = SourcesOps.compactPartitionsReport(spark, dir, numFiles = 1,
      minFilesToCompact = 1000000)
    assert(heal.healed == 1 && heal.rewritten.isEmpty)
    assert(spark.read.parquet(dir).count() == 400,
      "copy+delete crash shape duplicated or lost rows")
    val names = Dfs.list(part).map(_.getPath.getName)
    assert(!names.exists(_.startsWith("healed_")),
      s"identical copies were duplicated: $names")
    assert(!names.contains("_COMPACT_MANIFEST"),
      "stale manifest left in live dir after merge heal")
    assert(!Dfs.exists(trash), "trash not cleared after merge")
  }

  test("heal merge: equal-length DIFFERENT-content collision is kept disambiguated (byte-compare where checksums are null)") {
    import spark.implicits._
    val dir = schemed("graft_hcol") + "/sink"
    (0L until 100L).map(i => (i, "k0")).toDF("id", "k")
      .coalesce(1).write.mode("overwrite").partitionBy("k").parquet(dir)
    val root = Dfs.path(dir)
    val part = Dfs.list(root).filter(_.getPath.getName.startsWith("k=")).head.getPath
    val trash = new org.apache.hadoop.fs.Path(root, s".compact_trash_${part.getName}")
    Dfs.mkdirs(trash)
    // a same-name same-LENGTH file with different bytes on the trash
    // side — the distinct-jobs collision shape. Raw-local returns null
    // checksums, so only the streaming byte-compare can detect it; the
    // old checksum-only discriminator silently dropped the trash copy.
    val partFile = Dfs.list(part).map(_.getPath)
      .find(_.getName.endsWith(".parquet")).get
    val bytes = {
      val in = Dfs.fs(partFile).open(partFile)
      try in.readAllBytes() finally in.close()
    }
    val mutated = bytes.clone()
    mutated(bytes.length / 2) = (mutated(bytes.length / 2) ^ 0x5a).toByte
    val twin = new org.apache.hadoop.fs.Path(trash, partFile.getName)
    val out = Dfs.fs(twin).create(twin, true)
    try out.write(mutated) finally out.close()
    // manifest that does NOT match live -> routes to the merge branch
    Dfs.writeStringAtomic(new org.apache.hadoop.fs.Path(trash, "_COMPACT_MANIFEST"),
      "part-never-landed.parquet:1")
    val heal = SourcesOps.compactPartitionsReport(spark, dir, numFiles = 1,
      minFilesToCompact = 1000000)
    assert(heal.healed == 1)
    val names = Dfs.list(part).map(_.getPath.getName)
    assert(names.contains(s"healed_${partFile.getName}"),
      s"distinct-content collision must be kept disambiguated, live holds: $names")
    // and the live original is untouched
    val after = {
      val in = Dfs.fs(partFile).open(partFile)
      try in.readAllBytes() finally in.close()
    }
    assert(java.util.Arrays.equals(after, bytes), "live original was clobbered")
  }

  test("SRP batch append / sweep / compact: replay-idempotent through file://") {
    import spark.implicits._
    val dir = schemed("graft_hsrp") + "/srp"
    def vec(id: Long) = (id, Array.tabulate(64)(j => ((id * 31 + j * 7) % 13 - 6).toFloat))
    def toDf(ids: Seq[Long]) = ids.map(vec).toDF("vec_id", "embedding")
    AnnIndex.buildSrpAt(dir, toDf(0L until 30L))
    AnnIndex.appendSrpBatchAt(dir, 1L, toDf(100L until 120L))
    val n1 = spark.read.parquet(dir).count()
    assert(n1 == 50)
    AnnIndex.appendSrpBatchAt(dir, 1L, toDf(100L until 120L)) // crash replay
    assert(spark.read.parquet(dir).count() == 50, "replay doubled rows")
    AnnIndex.appendSrpBatchAt(dir, 2L, toDf(200L until 210L))
    AnnIndex.dropSrpBatchFiles(dir, 3L) // sweep of a never-landed batch: no-op
    assert(spark.read.parquet(dir).count() == 60)
    val compacted = AnnIndex.compactSrpAt(spark, dir, trigger = 2)
    assert(spark.read.parquet(dir).count() == 60, "compaction changed served rows")
    compacted.foreach { case (_, _, after) => assert(after == 1) }
  }

  test("retention drops through file://: flat and nested batch-keyed layouts") {
    import spark.implicits._
    val flat = schemed("graft_hret") + "/flat"
    Seq(("2024-01-01-00", 1), ("2024-01-01-01", 2), ("2024-01-01-02", 3))
      .toDF("date_hour", "v").write.partitionBy("date_hour").parquet(flat)
    val droppedFlat =
      graft.streaming.Retention.dropOldPartitions(flat, "2024-01-01-01")
    assert(droppedFlat == Seq("date_hour=2024-01-01-00"))
    assert(spark.read.parquet(flat).count() == 2)

    val nested = schemed("graft_hretn") + "/sink"
    Seq((7L, "2024-01-01-00", 1), (7L, "2024-01-01-01", 2), (8L, "2024-01-01-00", 3))
      .toDF("batch", "db", "v").write.partitionBy("batch", "db").parquet(nested)
    val droppedNested = graft.streaming.Retention
      .dropOldPartitionsNested(nested, "2024-01-01-01")
    assert(droppedNested ==
      Seq("batch=7/db=2024-01-01-00", "batch=8/db=2024-01-01-00"))
    // batch=8's only bucket aged out -> the whole batch dir is swept
    assert(!Dfs.list(Dfs.path(nested)).map(_.getPath.getName).contains("batch=8"))
    assert(spark.read.parquet(nested).count() == 1)
  }
}
