package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.{AnnIndex, SimilarityOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

case class Vec(vec_id: Long, embedding: Array[Float])

/** Streaming index freshness: vectors appended by micro-batch must be
  * retrievable by a probe the moment their batch commits, the commit
  * must be replay-idempotent (crash recovery re-executes foreachBatch
  * bodies), and the in-loop compaction must never change the served
  * rows. */
class IndexFreshnessSpec extends SparkSpec {

  private def vecs(ids: Seq[Long], seed: Int): Seq[Vec] =
    ids.map(i => Vec(i, Array.tabulate(64)(j =>
      (((i * 31 + seed * 17 + j * 7) % 13) - 6).toFloat)))

  private def toDf(vs: Seq[Vec]): DataFrame = {
    import spark.implicits._
    vs.toDF("vec_id", "embedding")
  }

  private def indexRows(dir: String): Seq[(Long, Int)] =
    spark.read.parquet(dir).select("vec_id", "srp_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq

  private def bucketsOf(vs: Seq[Vec]): Map[Long, Int] =
    SimilarityOps.srpSignature(toDf(vs), AnnIndex.SrpBits)
      .select(col("vec_id"), col("srp_bucket").cast("int")).collect()
      .map(r => (r.getLong(0), r.getInt(1))).toMap

  test("probe right after batch N retrieves batch-N vectors; replay and partial-crash replays stay exactly-once; compaction in the loop") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("graft_fresh").toString + "/srp"
    val base = Tables.embeddings(spark, sf).limit(200)
    AnnIndex.buildSrpAt(dir, base)
    val baseRows = indexRows(dir)

    val batches = Seq(
      vecs(1000000L until 1000040L, seed = 1),
      vecs(1000040L until 1000080L, seed = 2),
      vecs(1000080L until 1000120L, seed = 3))

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Vec]
    // trigger=3: the third append meets the file trigger, so the loop's
    // compaction pass actually fires inside this test
    val q = IndexFreshness.start(input.toDF(), dir, ckpt("graft_fresh_ck"),
      compactTrigger = 3)
    try {
      var expected = baseRows.map(_._1).toSet
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        expected ++= b.map(_.vec_id)
        // freshness: every vector of the batch that JUST committed is
        // served from its own signature bucket — the bucket the probe
        // path (hamming multi-probe around the query's signature, which
        // always includes radius 0) scans first
        val byBucket = bucketsOf(b)
        val served = spark.read.parquet(dir)
          .filter(col("vec_id") >= 1000000L)
          .select("vec_id", "srp_bucket").collect()
          .map(r => (r.getLong(0), r.getInt(1))).toMap
        b.foreach { v =>
          assert(served.get(v.vec_id).contains(byBucket(v.vec_id)),
            s"vec ${v.vec_id}: expected bucket ${byBucket(v.vec_id)}, served ${served.get(v.vec_id)}")
        }
        // exactly-once so far: no losses, no duplicates
        val rows = indexRows(dir)
        assert(rows.map(_._1).toSet == expected, "served id set diverged")
        assert(rows.size == expected.size, "duplicate rows in the index")
      }
    } finally q.stop()

    val settled = indexRows(dir)

    // crash-replay: re-run the LAST batch's commit body verbatim (what
    // recovery does after a crash between the foreachBatch body and the
    // commit log write) — the deterministic per-batch file names must
    // absorb it
    IndexFreshness.commitBatch(dir, compactTrigger = 3)(toDf(batches.last), 2L)
    assert(indexRows(dir) == settled, "full replay changed the index")

    // partial-crash replay: batch 3 died after moving SOME of its files
    // (simulated by re-appending under the next batch id, then crashing
    // before commit) — the sweep-then-compact-then-append order must
    // not fold the orphaned uncommitted file into a compacted file
    val late = vecs(1000200L until 1000207L, seed = 4)
    AnnIndex.appendSrpBatchAt(dir, 3L, toDf(late))
    IndexFreshness.commitBatch(dir, compactTrigger = 3)(toDf(late), 3L)
    val afterPartial = indexRows(dir)
    assert(afterPartial.size == settled.size + 7,
      s"partial-crash replay duplicated rows: ${afterPartial.size} vs ${settled.size} + 7")

    // compaction actually fired at least once in the loop AND the
    // maintained index still prunes: bucket dirs hold bounded file
    // counts and a bucket probe carries a PartitionFilter
    val files = new java.io.File(dir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("srp_bucket="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(files.nonEmpty && files.max <= 4,
      s"compaction never bounded bucket fragments: max ${files.max} files")
    val someBucket = afterPartial.head._2
    val plan = spark.read.parquet(dir)
      .filter(col("srp_bucket") === someBucket)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("srp_bucket"),
      s"freshness maintenance broke partition pruning:\n$plan")
  }

  test("compaction mid-swap crash states heal with no committed-row loss") {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft_heal").toString + "/srp"
    AnnIndex.buildSrpAt(dir, toDf(vecs(0L until 20L, seed = 1)))
    AnnIndex.appendSrpBatchAt(dir, 0L, toDf(vecs(20L until 40L, seed = 1)))
    val rows0 = indexRows(dir)
    val root = new java.io.File(dir)
    def buckets() = root.listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("srp_bucket="))

    // crash shape 1: killed between the swap's two renames — the live
    // dir is gone, the only complete copy sits in the hidden trash.
    // The next maintenance pass must restore it.
    val b1 = buckets().head
    java.nio.file.Files.move(b1.toPath,
      new java.io.File(root, s".compact_trash_${b1.getName}").toPath)
    AnnIndex.compactSrpAt(spark, dir, trigger = 1000000) // heal-only pass
    assert(indexRows(dir) == rows0, "live-dir-absent crash state lost rows")

    // crash shape 2: same kill, but a streaming append RECREATES the
    // live dir (with only its own new file) before any maintenance
    // runs — the heal must MERGE the trash rows back, not treat the
    // recreated dir as a completed swap and discard them
    val b2 = buckets().head
    val b2Val = b2.getName.split("=")(1).toInt
    val donor = rows0.collectFirst { case (id, b) if b == b2Val => id }.get
    java.nio.file.Files.move(b2.toPath,
      new java.io.File(root, s".compact_trash_${b2.getName}").toPath)
    // same embedding as the donor -> same bucket, fresh id
    val clone = Vec(99999L, vecs(Seq(donor), seed = 1).head.embedding)
    AnnIndex.appendSrpBatchAt(dir, 7L, toDf(Seq(clone)))
    AnnIndex.compactSrpAt(spark, dir, trigger = 1000000) // heal-only pass
    val healed = indexRows(dir)
    assert(healed.map(_._1).toSet == rows0.map(_._1).toSet + 99999L,
      "append-recreated-live crash state lost pre-crash rows")
    assert(healed.size == rows0.size + 1, "heal duplicated rows")

    // crash shape 3: a REAL mid-swap crash leaves the compaction
    // manifest in the trash (it is written into the live dir
    // immediately before the first rename, so it travels), and then a
    // PLAIN (non-batch) append recreates the live dir with part-*
    // files. part-* is exactly the name shape a compacted output has,
    // so a "live has a non-batch file" heuristic would read this as a
    // completed swap and DELETE the only copy of the pre-crash rows.
    // The manifest makes the discriminator sound: live does not
    // contain the named output files, so the heal must MERGE.
    // donor must be a formula-generated vector (id < 40): the clone
    // recomputes its embedding from the formula, so only then do the
    // two provably share a bucket
    val (donor3, b3Val) = healed.collectFirst {
      case (id, b) if id < 40L => (id, b) }.get
    val b3 = new java.io.File(root, s"srp_bucket=$b3Val")
    val trash3 = new java.io.File(root, s".compact_trash_${b3.getName}")
    java.nio.file.Files.move(b3.toPath, trash3.toPath)
    java.nio.file.Files.writeString(
      new java.io.File(trash3, "_COMPACT_MANIFEST").toPath,
      "part-00000-lost-with-the-crashed-tmp-dir-c000.snappy.parquet")
    val clone3 = Vec(99998L, vecs(Seq(donor3), seed = 1).head.embedding)
    AnnIndex.appendSrpAt(dir, toDf(Seq(clone3))) // plain append: part-* files
    AnnIndex.compactSrpAt(spark, dir, trigger = 1000000) // heal-only pass
    val healed3 = indexRows(dir)
    assert(healed3.map(_._1).toSet == healed.map(_._1).toSet + 99998L,
      "plain-append-recreated crash state lost pre-crash rows (unsound completed-swap discriminator)")
    assert(healed3.size == healed.size + 1, "heal duplicated rows")
  }

  test("IVFADC freshness: batch-N codes live after batch N; frozen anchors/centroids; replay exactly-once; compaction bounds cells") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val dir = java.nio.file.Files.createTempDirectory("graft_fresh_pq").toString + "/ivfpq"
    val asV = expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v")
    AnnIndex.buildIvfPq8At(dir,
      Tables.embeddings(spark, sf).limit(200).select(col("vec_id"), asV))
    def codeRows(): Seq[(Long, Int)] =
      spark.read.parquet(s"$dir/codes").select("vec_id", "cell").collect()
        .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    def anchorCount(): Long = spark.read.parquet(s"$dir/anchors").count()
    def centRows(): Seq[Int] = spark.read.parquet(s"$dir/cents")
      .select("cell").collect().map(_.getInt(0)).sorted.toSeq
    val base = codeRows(); val anchors0 = anchorCount(); val cents0 = centRows()

    val batches = Seq(
      vecs(2000000L until 2000030L, seed = 5),
      vecs(2000030L until 2000060L, seed = 6),
      vecs(2000060L until 2000090L, seed = 7))
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[Vec]
    val q = IndexFreshness.startIvfPq8(
      input.toDF().select(col("vec_id"), asV), dir, ckpt("graft_fresh_pq_ck"),
      compactTrigger = 3)
    try {
      var expected = base.map(_._1).toSet
      batches.foreach { b =>
        input.addData(b)
        q.processAllAvailable()
        expected ++= b.map(_.vec_id)
        val rows = codeRows()
        // freshness + exactly-once: every batch-N vector is ADC-
        // servable right after batch N, no duplicates, no losses.
        // The codes relation holds ONE ROW PER SUBSPACE (m=8), so an
        // exactly-once index carries exactly 8 rows per vector.
        assert(rows.map(_._1).toSet == expected, "code id set diverged")
        assert(rows.size == expected.size * 8,
          s"dup/lost code rows: ${rows.size} vs ${expected.size} x 8")
      }
    } finally q.stop()
    // the frozen artifacts were never touched by streaming appends
    assert(anchorCount() == anchors0, "streaming append rewrote the codebook")
    assert(centRows() == cents0, "streaming append moved the coarse centroids")

    val settled = codeRows()
    // full crash-replay of the last batch
    IndexFreshness.commitIvfPq8Batch(dir, compactTrigger = 3)(
      toDf(batches.last).select(col("vec_id"), asV), 2L)
    assert(codeRows() == settled, "full replay changed the codes")
    // partial-crash replay under a fresh batch id
    val late = vecs(2000200L until 2000206L, seed = 8)
    AnnIndex.appendIvfPq8BatchAt(spark, dir, 3L, toDf(late).select(col("vec_id"), asV))
    IndexFreshness.commitIvfPq8Batch(dir, compactTrigger = 3)(
      toDf(late).select(col("vec_id"), asV), 3L)
    val afterPartial = codeRows()
    assert(afterPartial.size == settled.size + 6 * 8,
      s"partial-crash replay duplicated codes: ${afterPartial.size} vs ${settled.size} + 6 x 8")

    // compaction bounded cell fragments; ADC cell pruning still prunes
    val files = new java.io.File(s"$dir/codes").listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("cell="))
      .map(_.listFiles().count(_.getName.endsWith(".parquet")))
    assert(files.nonEmpty && files.max <= 4,
      s"compaction never bounded cell fragments: max ${files.max} files")
    val someCell = afterPartial.head._2
    val plan = spark.read.parquet(s"$dir/codes")
      .filter(col("cell") === someCell)
      .queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      s"freshness maintenance broke cell pruning:\n$plan")
  }
}
