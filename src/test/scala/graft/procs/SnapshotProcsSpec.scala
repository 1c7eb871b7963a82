package graft.procs

import graft.{SparkSpec, Tables}

/** Snapshot save/restore: roundtrip identity, manifest-as-commit-
  * marker, and loud validation failures. */
class SnapshotProcsSpec extends SparkSpec {

  private def tmpRoot(): String =
    java.nio.file.Files.createTempDirectory("graft_snap").toString

  test("save → restore is row-identical for a multi-table snapshot") {
    val root = tmpRoot()
    val tables = Map(
      "nation" -> Tables.nation(spark, sf),
      "events" -> Tables.events(spark, sf))
    val entries = SnapshotProcs.snapshotSave(tables, root, "s1")
    assert(entries.map(_.name) == Seq("events", "nation"))
    val back = SnapshotProcs.snapshotRestore(spark, root, "s1")
    tables.foreach { case (name, df) =>
      val a = df.collect().map(_.toSeq.toList).sortBy(_.toString)
      val b = back(name).collect().map(_.toSeq.toList).sortBy(_.toString)
      assert(a.toSeq == b.toSeq, s"table $name not identical after restore")
    }
    assert(SnapshotProcs.listSnapshots(root) == Seq("s1" -> true))
  }

  test("a snapshot without a manifest is uncommitted: refused and reapable") {
    // scheme-qualified root: list/reap resolve the filesystem from the
    // path URI (Hadoop FileSystem API), not the driver-local java.io —
    // the same calls work against hdfs:/s3a: roots
    val root = s"file:${tmpRoot()}"
    // simulate a crash: data written, no MANIFEST
    Tables.nation(spark, sf).write.parquet(s"$root/crashed/nation")
    assert(SnapshotProcs.listSnapshots(root) == Seq("crashed" -> false))
    val e = intercept[IllegalArgumentException] {
      SnapshotProcs.snapshotRestore(spark, root, "crashed")
    }
    assert(e.getMessage.contains("no committed manifest"))
    // default age threshold protects an IN-PROGRESS save (manifest is
    // written last, so a live writer's dir also has no manifest yet)
    assert(SnapshotProcs.reapUncommitted(root).isEmpty,
      "a fresh manifest-less dir must NOT be reaped at the default age")
    // forcing the cutoff into the future reaps the crash leftover
    assert(SnapshotProcs.reapUncommitted(root, -60000L) == Seq("crashed"))
    assert(SnapshotProcs.listSnapshots(root).isEmpty)
  }

  test("restore validates row counts against the manifest") {
    val root = tmpRoot()
    // repartition so the snapshot has several files and the tampered
    // read still infers a schema from the survivors
    SnapshotProcs.snapshotSave(
      Map("nation" -> Tables.events(spark, sf).repartition(4)), root, "s2")
    // tamper: drop one data file
    val dir = new java.io.File(s"$root/s2/nation")
    dir.listFiles().filter(_.getName.endsWith(".parquet")).take(1)
      .foreach(f => assert(f.delete()))
    val e = intercept[IllegalArgumentException] {
      SnapshotProcs.snapshotRestore(spark, root, "s2")
    }
    assert(e.getMessage.contains("manifest says"))
  }

  test("nonce reuse after commit is refused; bad names rejected") {
    val root = tmpRoot()
    SnapshotProcs.snapshotSave(Map("nation" -> Tables.nation(spark, sf)), root, "s3")
    intercept[IllegalArgumentException] {
      SnapshotProcs.snapshotSave(Map("nation" -> Tables.nation(spark, sf)), root, "s3")
    }
    intercept[IllegalArgumentException] {
      SnapshotProcs.snapshotSave(Map("bad/../name" -> Tables.nation(spark, sf)), root, "s4")
    }
  }
}
