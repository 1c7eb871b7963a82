package graft.sources

import graft.SparkSpec
import graft.operators.AnnIndex
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Machine-checked object-store semantics. [[Dfs]] documents that on
  * `s3a:`-class stores rename is copy+delete and NOT atomic, and the
  * r13/r14 specs reproduced the resulting crash shapes by hand-building
  * directory states through `file://`. This suite retires the hand-built
  * states: every protocol here runs through [[MockObjectStoreFs]], a
  * real Hadoop filesystem whose rename actually IS copy-then-delete
  * with injectable crash points — the crashes are produced by the
  * protocol's own I/O, not assembled by the test.
  *
  * Covered, per the protocol docs' claims:
  *  - compaction swap crash shapes (rename-1 mid-file, rename-1
  *    between copy and delete, rename-2 partial output) all heal to
  *    the exact committed row set — no loss, no duplication;
  *  - an UNFENCED probe during a mock-store swap observes the
  *    documented partial state (the fence [[graft.streaming.IndexFreshness]]
  *    relies on is necessary, not just asserted);
  *  - [[VersionedStore]]: version data is never torn — a pointer-replace
  *    crash yields the old version or a loud failure, and re-publish heals;
  *  - the SRP batch append/sweep/compact loop survives a mid-move crash
  *    through its documented replay. */
class MockObjectStoreSpec extends SparkSpec {

  /** Session with the `mock:` scheme registered (fresh session so
    * [[Dfs]]'s per-session conf snapshot includes the registration even
    * if another suite already derived the shared session's conf). */
  private lazy val mockSession: SparkSession = {
    val hc = spark.sparkContext.hadoopConfiguration
    hc.set("fs.mock.impl", classOf[MockObjectStoreFs].getName)
    hc.set("fs.AbstractFileSystem.mock.impl", classOf[MockAbstractFs].getName)
    spark.newSession()
  }

  private def withMock[T](body: SparkSession => T): T = {
    val s = mockSession
    SparkSession.setActiveSession(s)
    MockFsCrash.disarm()
    try body(s)
    finally { MockFsCrash.disarm(); SparkSession.setActiveSession(spark) }
  }

  private def mocked(prefix: String): String =
    "mock:" + java.nio.file.Files.createTempDirectory(prefix).toString

  private def idSum(s: SparkSession, dir: String): (Long, Long) = {
    val r = s.read.parquet(dir).agg(count(lit(1)), sum("id")).head()
    (r.getLong(0), r.getLong(1))
  }

  test("mock fs: rename really is copy+delete, and crash points leave real partial state") {
    withMock { s =>
      val root = Dfs.path(mocked("graft_mockfs"))
      val a = new org.apache.hadoop.fs.Path(root, "a")
      Dfs.mkdirs(a)
      Dfs.writeStringAtomic(new org.apache.hadoop.fs.Path(a, "f1"), "hello world")
      Dfs.writeStringAtomic(new org.apache.hadoop.fs.Path(a, "f2"), "0123456789")
      // crash between copy and delete: BOTH trees fully present after
      val b = new org.apache.hadoop.fs.Path(root, "b")
      MockFsCrash.crashBeforeDelete = (_, dst) => dst.endsWith("/b")
      intercept[MockFsCrash.InjectedCrash] { Dfs.rename(a, b) }
      assert(Dfs.exists(a) && Dfs.exists(b), "copy+delete: both sides must exist mid-crash")
      assert(Dfs.readString(new org.apache.hadoop.fs.Path(b, "f1")) == "hello world")
      Dfs.delete(b)
      // crash mid-file: destination holds a real truncated file
      val c = new org.apache.hadoop.fs.Path(root, "c")
      MockFsCrash.plan = (src, _) => if (src.endsWith("/f2")) 4L else -1L
      intercept[MockFsCrash.InjectedCrash] { Dfs.rename(a, c) }
      assert(Dfs.readString(new org.apache.hadoop.fs.Path(c, "f2")) == "0123",
        "mid-copy crash must leave exactly the copied prefix")
      assert(Dfs.exists(a), "source untouched until the delete phase")
    }
  }

  test("compaction heal on mock: rename-1 crashes mid-file (truncated trash copy is never healed in)") {
    withMock { s =>
      import s.implicits._
      val dir = mocked("graft_mock_c1") + "/sink"
      (0L until 400L).map(i => (i, s"k${i % 2}")).toDF("id", "k")
        .repartition(3).write.mode("overwrite").partitionBy("k").parquet(dir)
      val (n0, sum0) = idSum(s, dir)
      // fire inside the swap's FIRST rename (live -> trash), mid-file:
      // trash ends with the manifest plus a TRUNCATED parquet copy
      MockFsCrash.plan = (_, dst) =>
        if (dst.contains(".compact_trash_") && dst.endsWith(".parquet")) 16L else -1L
      intercept[MockFsCrash.InjectedCrash] {
        SourcesOps.compactPartitionsReport(s, dir, numFiles = 1)
      }
      val heal = SourcesOps.compactPartitionsReport(s, dir, numFiles = 1,
        minFilesToCompact = 1000000)
      assert(heal.healed == 1 && heal.rewritten.isEmpty)
      assert(idSum(s, dir) == ((n0, sum0)), "heal lost or duplicated rows")
      val names = Dfs.list(Dfs.path(dir)).map(_.getPath.getName)
      assert(!names.exists(_.startsWith(".compact_")), s"maintenance debris: $names")
    }
  }

  test("compaction heal on mock: rename-1 crashes between copy and delete (identical trees, no duplication)") {
    withMock { s =>
      import s.implicits._
      val dir = mocked("graft_mock_c2") + "/sink"
      (0L until 300L).map(i => (i, s"k${i % 2}")).toDF("id", "k")
        .repartition(3).write.mode("overwrite").partitionBy("k").parquet(dir)
      val (n0, sum0) = idSum(s, dir)
      MockFsCrash.crashBeforeDelete = (_, dst) => dst.contains(".compact_trash_")
      intercept[MockFsCrash.InjectedCrash] {
        SourcesOps.compactPartitionsReport(s, dir, numFiles = 1)
      }
      val heal = SourcesOps.compactPartitionsReport(s, dir, numFiles = 1,
        minFilesToCompact = 1000000)
      assert(heal.healed == 1 && heal.rewritten.isEmpty)
      assert(idSum(s, dir) == ((n0, sum0)), "identical-trees crash duplicated rows")
      val part = Dfs.list(Dfs.path(dir)).map(_.getPath)
        .filter(_.getName.startsWith("k=")).head
      assert(!Dfs.list(part).exists(_.getPath.getName.startsWith("healed_")),
        "identical copies must merge silently, not healed_-duplicate")
    }
  }

  test("compaction heal on mock: rename-2 leaves a partial compacted output; unfenced probe sees it; heal is exact") {
    withMock { s =>
      import s.implicits._
      val dir = mocked("graft_mock_c3") + "/sink"
      (0L until 500L).map(i => (i, s"k${i % 2}")).toDF("id", "k")
        .repartition(4).write.mode("overwrite").partitionBy("k").parquet(dir)
      val (n0, sum0) = idSum(s, dir)
      // let the first compacted file land, crash before the second:
      // live holds a strict subset of the manifest's names — the shape
      // whose naive merge duplicates every compacted row
      var nth = 0
      MockFsCrash.plan = (src, _) =>
        if (src.contains(".compact_tmp_") && !src.contains("_temporary") &&
          src.endsWith(".parquet")) {
          nth += 1
          if (nth == 2) 0L else -1L
        } else -1L
      intercept[MockFsCrash.InjectedCrash] {
        SourcesOps.compactPartitionsReport(s, dir, numFiles = 2)
      }
      // fence necessity: a PLAIN read at this instant silently serves a
      // partial partition — exactly the documented object-store hazard
      // the ingest loop's exclusive maintenance window exists to fence
      val partial = s.read.parquet(dir).count()
      assert(partial > 0 && partial < n0,
        s"unfenced probe should observe partial state, saw $partial of $n0")
      val heal = SourcesOps.compactPartitionsReport(s, dir, numFiles = 1,
        minFilesToCompact = 1000000)
      assert(heal.healed == 1 && heal.rewritten.isEmpty)
      assert(idSum(s, dir) == ((n0, sum0)),
        "rename-2 partial-output heal lost or duplicated rows")
      val part = Dfs.list(Dfs.path(dir)).map(_.getPath)
        .filter(_.getName.startsWith("k=")).head
      val names = Dfs.list(part).map(_.getPath.getName)
      assert(!names.contains("_COMPACT_MANIFEST") && !names.exists(_.startsWith("healed_")),
        s"merge debris in live dir: $names")
    }
  }

  test("compaction heal on mock: rename-2 crashes mid-copy of the LAST compacted file (length, not presence, gates trash deletion)") {
    withMock { s =>
      import s.implicits._
      val dir = mocked("graft_mock_c5") + "/sink"
      (0L until 500L).map(i => (i, s"k${i % 2}")).toDF("id", "k")
        .repartition(4).write.mode("overwrite").partitionBy("k").parquet(dir)
      val (n0, sum0) = idSum(s, dir)
      // let the first compacted file land WHOLE, crash mid-copy of the
      // second: every manifest NAME is present in live with the last
      // one truncated — the shape a presence-only completed-swap check
      // misclassifies as done, deleting the trash (the only complete
      // copy of the rows) and leaving a footerless parquet file. The
      // manifest's name:length pairs route it to the merge branch.
      var nth = 0
      MockFsCrash.plan = (src, _) =>
        if (src.contains(".compact_tmp_") && !src.contains("_temporary") &&
          src.endsWith(".parquet")) {
          nth += 1
          if (nth == 2) 16L else -1L
        } else -1L
      intercept[MockFsCrash.InjectedCrash] {
        SourcesOps.compactPartitionsReport(s, dir, numFiles = 2)
      }
      val heal = SourcesOps.compactPartitionsReport(s, dir, numFiles = 1,
        minFilesToCompact = 1000000)
      assert(heal.healed == 1 && heal.rewritten.isEmpty)
      assert(idSum(s, dir) == ((n0, sum0)),
        "all-names-present/last-truncated heal lost or duplicated rows")
      val part = Dfs.list(Dfs.path(dir)).map(_.getPath)
        .filter(_.getName.startsWith("k=")).head
      val names = Dfs.list(part).map(_.getPath.getName)
      assert(!names.contains("_COMPACT_MANIFEST") && !names.exists(_.startsWith("healed_")),
        s"merge debris in live dir: $names")
    }
  }

  test("compaction heal on mock: the heal's own mid-merge crash re-heals exactly (truncated live copy replaced)") {
    withMock { s =>
      import s.implicits._
      val dir = mocked("graft_mock_c4") + "/sink"
      (0L until 500L).map(i => (i, s"k${i % 2}")).toDF("id", "k")
        .repartition(4).write.mode("overwrite").partitionBy("k").parquet(dir)
      val (n0, sum0) = idSum(s, dir)
      // first crash: rename-2 partial output (as above)
      var nth = 0
      MockFsCrash.plan = (src, _) =>
        if (src.contains(".compact_tmp_") && !src.contains("_temporary") &&
          src.endsWith(".parquet")) {
          nth += 1
          if (nth == 2) 0L else -1L
        } else -1L
      intercept[MockFsCrash.InjectedCrash] {
        SourcesOps.compactPartitionsReport(s, dir, numFiles = 2)
      }
      // second crash: the HEAL's merge itself dies mid-copy of the
      // first original it moves back — live is left holding a
      // truncated original (shorter than the trash's complete copy)
      MockFsCrash.plan = (src, _) =>
        if (src.contains(".compact_trash_") && src.endsWith(".parquet")) 8L else -1L
      intercept[MockFsCrash.InjectedCrash] {
        SourcesOps.compactPartitionsReport(s, dir, numFiles = 1,
          minFilesToCompact = 1000000)
      }
      // the re-run must recognize the truncated live copy (live shorter
      // than same-name trash) and REPLACE it, never skip it as
      // authoritative or healed_-duplicate it
      val heal = SourcesOps.compactPartitionsReport(s, dir, numFiles = 1,
        minFilesToCompact = 1000000)
      assert(heal.healed == 1 && heal.rewritten.isEmpty)
      assert(idSum(s, dir) == ((n0, sum0)),
        "re-healed merge lost, truncated, or duplicated rows")
      val part = Dfs.list(Dfs.path(dir)).map(_.getPath)
        .filter(_.getName.startsWith("k=")).head
      assert(!Dfs.list(part).exists(_.getPath.getName.startsWith("healed_")),
        "truncated live copy must be replaced, not healed_-duplicated")
    }
  }

  test("VersionedStore on mock: data never torn; pointer crash is loud or old-version; re-publish heals") {
    withMock { s =>
      import s.implicits._
      val root = mocked("graft_mock_vs") + "/store"
      VersionedStore.publish((1L to 100L).toDF("id"), root)
      assert(VersionedStore.read(s, root).count() == 100)
      // quiet publish through copy+delete renames end-to-end
      VersionedStore.publish((1L to 60L).toDF("id"), root)
      assert(VersionedStore.read(s, root).count() == 60)
      // crash DURING the pointer replace (after OVERWRITE deleted the
      // old pointer, before the new bytes copied): version data is all
      // present and complete, the pointer is gone — readers fail LOUDLY
      // rather than serve torn data. (On a real object store the
      // pointer lands via one atomic PUT; the mock's rename is the
      // worst-case model, see Dfs's scheme notes.)
      MockFsCrash.plan = (_, dst) => if (dst.endsWith("/CURRENT")) 0L else -1L
      intercept[MockFsCrash.InjectedCrash] {
        VersionedStore.publish((1L to 30L).toDF("id"), root)
      }
      assert(VersionedStore.currentVersion(root).isEmpty, "pointer should be absent mid-crash")
      intercept[IllegalStateException] { VersionedStore.read(s, root) }
      MockFsCrash.disarm()
      VersionedStore.publish((1L to 30L).toDF("id"), root)
      assert(VersionedStore.read(s, root).count() == 30, "re-publish must fully heal the store")
      // torn-pointer shape: a mid-copy crash leaves a truncated pointer
      // ("v00..." prefix) — it can only resolve to an older COMPLETE
      // version or fail loudly, never to torn data
      MockFsCrash.plan = (_, dst) => if (dst.endsWith("/CURRENT")) 2L else -1L
      intercept[MockFsCrash.InjectedCrash] {
        VersionedStore.publish((1L to 10L).toDF("id"), root)
      }
      assert(Dfs.readString(Dfs.path(s"$root/CURRENT")) == "v0")
      intercept[Exception] { VersionedStore.read(s, root).count() }
      MockFsCrash.disarm()
      VersionedStore.publish((1L to 10L).toDF("id"), root)
      assert(VersionedStore.read(s, root).count() == 10)
    }
  }

  test("VersionedStore on mock: a publisher crashing after its claim never blocks or corrupts later publishes") {
    withMock { s =>
      import s.implicits._
      val root = mocked("graft_mock_vsclaim") + "/store"
      VersionedStore.publish((1L to 40L).toDF("id"), root)
      // crash a publish AFTER version allocation (claim landed) but
      // before any pointer movement: the mock's rename of the parquet
      // job's temporary output dies mid-copy, stranding claim v2 and a
      // partial v00002 dir with no commit
      MockFsCrash.plan = (_, dst) =>
        if (dst.contains("v00002") && dst.endsWith(".parquet")) 8L else -1L
      intercept[Throwable] { VersionedStore.publish((1L to 50L).toDF("id"), root) }
      assert(VersionedStore.read(s, root).count() == 40,
        "a crashed claimed-but-uncommitted publish must leave the old version live")
      MockFsCrash.disarm()
      // the dead claim is skipped, never reused: the replay lands as v3
      val v = VersionedStore.publish((1L to 50L).toDF("id"), root)
      assert(v == 3, s"crashed claim v2 must be skipped, got v$v")
      assert(VersionedStore.read(s, root).count() == 50)
      // with the default grace the DEAD claim and its partial dir are
      // retained — vacuum can't tell a crashed publisher from a slow
      // one except by age, so a fresh uncommitted number is presumed
      // in-flight (committed history v1 sweeps immediately regardless)
      VersionedStore.vacuum(root, keep = 0)
      val kept = Dfs.list(Dfs.path(root)).map(_.getPath.getName)
      assert(!kept.contains("v00001") && !kept.contains(".claim_v00001"),
        s"committed history must sweep immediately: $kept")
      assert(kept.contains(".claim_v00002"),
        s"a fresh uncommitted claim must survive the default grace: $kept")
      // past the grace window the same state is provably dead — swept
      VersionedStore.vacuum(root, keep = 0, graceMs = 0)
      val names = Dfs.list(Dfs.path(root)).map(_.getPath.getName)
      assert(!names.contains("v00002") && !names.contains(".claim_v00002"),
        s"dead claim/partial dir must be vacuumed after the grace: $names")
      assert(VersionedStore.read(s, root).count() == 50)
    }
  }

  test("VersionedStore on mock: vacuum never destroys a slow publisher overtaken by racing publishes") {
    withMock { s =>
      import s.implicits._
      val root = mocked("graft_mock_vsovertake") + "/store"
      VersionedStore.publish((1L to 10L).toDF("id"), root) // v1 (live)
      // a SLOW publisher in another process has claimed v2 and is still
      // writing: claim marker present, partial dir present, no commit.
      // (Hand-built state: the claim/partial-dir shape is exactly what
      // the crashed-publish test above produces through real I/O; here
      // the publisher is alive, which no in-JVM call can represent.)
      assert(Dfs.createExclusive(Dfs.path(root + "/.claim_v00002")))
      (1L to 5L).toDF("id").write.parquet(root + "/v00002")
      // two racers overtake it: live advances to v4, so with keep=0 the
      // slow publisher's number (2) falls under the cutoff (3)
      VersionedStore.publish((1L to 20L).toDF("id"), root) // v3
      VersionedStore.publish((1L to 30L).toDF("id"), root) // v4
      VersionedStore.vacuum(root, keep = 0)
      val names = Dfs.list(Dfs.path(root)).map(_.getPath.getName)
      assert(names.contains(".claim_v00002") && names.contains("v00002"),
        s"vacuum deleted an in-flight publish's claim/dir mid-write: $names")
      assert(!names.contains("v00001") && !names.contains("v00003"),
        s"committed superseded versions must still sweep: $names")
      // the slow publisher eventually completes its write and commits —
      // the store must expose the COMPLETE version, never a torn one
      (1L to 50L).toDF("id").write.mode("overwrite").parquet(root + "/v00002")
      Dfs.writeStringAtomic(Dfs.path(root + "/CURRENT"), "v00002")
      assert(VersionedStore.read(s, root).count() == 50,
        "overtaken publisher's late commit must resolve to its complete version")
    }
  }

  test("VersionedStore on mock: claim heartbeat survives a transient write failure and keeps beating") {
    withMock { s =>
      import s.implicits._
      val root = mocked("graft_mock_vsbeat") + "/store"
      VersionedStore.publish((1L to 5L).toDF("id"), root) // v1, live
      val prevBeat = VersionedStore.claimHeartbeatMs
      VersionedStore.claimHeartbeatMs = 100
      try {
        // the FIRST beat's atomic marker replace dies inside the mock
        // rename; the hook is one-shot, so the failure is exactly a
        // transient store blip. The beat thread must swallow it and
        // keep beating — a dead beat thread would let a long publish
        // read as crashed and become sweepable mid-write.
        MockFsCrash.plan = (_, dst) =>
          if (dst.contains(".claim_v00002")) 0L else -1L
        val beats = new java.util.concurrent.atomic.AtomicInteger(0)
        VersionedStore.onClaimed = v => {
          val claim = Dfs.path(f"$root/.claim_v$v%05d")
          // stall the publisher mid-publish; the freshly-claimed marker
          // is empty (and transiently missing right after the injected
          // failure — the overwrite path deletes the target before the
          // copy that crashed), so each SURVIVING beat shows up as a
          // new non-empty millis stamp.
          val deadline = System.currentTimeMillis() + 10000
          var last = ""
          while (beats.get() < 2 && System.currentTimeMillis() < deadline) {
            val cur = if (Dfs.exists(claim)) Dfs.readString(claim) else ""
            if (cur.nonEmpty && cur != last) { beats.incrementAndGet(); last = cur }
            Thread.sleep(20)
          }
        }
        VersionedStore.publish((1L to 7L).toDF("id"), root) // v2, stalls in hook
        assert(MockFsCrash.fired == 1, "the injected beat failure must actually have fired")
        assert(beats.get() >= 2,
          s"beats after the injected one-shot failure must still land: ${beats.get()}")
        assert(VersionedStore.read(s, root).count() == 7)
      } finally {
        VersionedStore.onClaimed = _ => ()
        VersionedStore.claimHeartbeatMs = prevBeat
      }
    }
  }

  test("SRP batch append / sweep / compact on mock: mid-move crash heals through the documented replay") {
    withMock { s =>
      import s.implicits._
      val dir = mocked("graft_mock_srp") + "/srp"
      def vec(id: Long) = (id, Array.tabulate(64)(j => ((id * 31 + j * 7) % 13 - 6).toFloat))
      def toDf(ids: Seq[Long]) = ids.map(vec).toDF("vec_id", "embedding")
      AnnIndex.buildSrpAt(dir, toDf(0L until 30L))
      AnnIndex.appendSrpBatchAt(dir, 1L, toDf(100L until 120L))
      AnnIndex.appendSrpBatchAt(dir, 1L, toDf(100L until 120L)) // replay
      assert(s.read.parquet(dir).count() == 50, "replay doubled rows")
      AnnIndex.appendSrpBatchAt(dir, 2L, toDf(200L until 210L))
      // crash the stage->live move of batch 3 mid-file: one bucket is
      // left holding a TRUNCATED b3.parquet; the streaming contract is
      // that a crashed foreachBatch re-executes the same batch, whose
      // deterministic file names REPLACE the wreckage
      MockFsCrash.plan = (_, dst) => if (dst.endsWith("b3.parquet")) 8L else -1L
      intercept[MockFsCrash.InjectedCrash] {
        AnnIndex.appendSrpBatchAt(dir, 3L, toDf(300L until 315L))
      }
      AnnIndex.appendSrpBatchAt(dir, 3L, toDf(300L until 315L)) // crash replay
      assert(s.read.parquet(dir).count() == 75, "mid-move crash + replay lost or doubled rows")
      AnnIndex.dropSrpBatchFiles(dir, 4L) // sweep of a never-landed batch: no-op
      AnnIndex.compactSrpAt(s, dir, trigger = 2)
      assert(s.read.parquet(dir).count() == 75, "compaction changed served rows")
    }
  }

  test("IVFADC batch append / sweep / compact on mock: crashed attempt swept, replay exact") {
    withMock { s =>
      import s.implicits._
      val dir = mocked("graft_mock_ivfpq") + "/ivfpq"
      def vec(id: Long) = (id, Array.tabulate(64)(j => ((id * 31 + j * 7) % 13 - 6).toDouble))
      def toDf(ids: Seq[Long]) = ids.map(vec).toDF("vec_id", "v")
      AnnIndex.buildIvfPq8At(dir, toDf(0L until 80L))
      def codeRows(): Long = s.read.parquet(s"$dir/codes").count()
      assert(codeRows() == 80L * 8, "build: 8 code rows per vector")
      AnnIndex.appendIvfPq8BatchAt(s, dir, 1L, toDf(1000L until 1020L))
      AnnIndex.appendIvfPq8BatchAt(s, dir, 1L, toDf(1000L until 1020L)) // replay
      assert(codeRows() == 100L * 8, "replay doubled code rows")
      // crash the stage->live move of batch 2 mid-file (truncated
      // b2.parquet in one cell), then recover in the documented
      // foreachBatch order: sweep the crashed attempt's files, replay
      MockFsCrash.plan = (_, dst) => if (dst.endsWith("b2.parquet")) 8L else -1L
      intercept[MockFsCrash.InjectedCrash] {
        AnnIndex.appendIvfPq8BatchAt(s, dir, 2L, toDf(2000L until 2010L))
      }
      AnnIndex.dropIvfPq8BatchFiles(dir, 2L)
      AnnIndex.appendIvfPq8BatchAt(s, dir, 2L, toDf(2000L until 2010L))
      assert(codeRows() == 110L * 8, "sweep+replay lost or doubled code rows")
      AnnIndex.compactIvfPq8At(s, dir, trigger = 2)
      assert(codeRows() == 110L * 8, "compaction changed served code rows")
    }
  }
}
