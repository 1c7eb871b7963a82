package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Incremental index maintenance: appending a vector delta into the
  * partitioned SRP layout must be indistinguishable from a full
  * rebuild — same rows, same per-bucket partition pruning. */
class AnnIndexDeltaSpec extends SparkSpec {

  test("build(half) + append(half) == build(all), and pruning still prunes") {
    val emb = Tables.embeddings(spark, sf)
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 =!= 0)
    val incDir = java.nio.file.Files.createTempDirectory("graft_srp_inc").toString
    val fullDir = java.nio.file.Files.createTempDirectory("graft_srp_full").toString
    AnnIndex.buildSrpAt(incDir, a)
    AnnIndex.appendSrpAt(incDir, b)
    AnnIndex.buildSrpAt(fullDir, emb)
    def rows(p: String) = spark.read.parquet(p)
      .select("vec_id", "srp_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val inc = rows(incDir)
    val full = rows(fullDir)
    assert(inc == full, "incremental index diverged from the rebuild")

    // a probe over the appended index still partition-prunes: the scan
    // carries a PartitionFilter on srp_bucket (inputFiles is NOT
    // filter-aware, so assert on the executed plan like PlanAuditSpec)
    val someBucket = inc.head._2
    val probe = spark.read.parquet(incDir).filter(col("srp_bucket") === someBucket)
    assert(probe.count() == inc.count(_._2 == someBucket).toLong)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(srp_bucket") ||
      plan.contains("PartitionFilters: [(srp_bucket") ||
      (plan.contains("PartitionFilters: [") && plan.contains("srp_bucket")),
      s"probe scan lost its partition filter:\n$plan")
    // the delta went INTO existing partition dirs (files accrete)
    val bucketsWithTwo = new java.io.File(incDir).listFiles()
      .filter(f => f.isDirectory && f.getName.startsWith("srp_bucket="))
      .count(_.listFiles().count(_.getName.endsWith(".parquet")) >= 2)
    assert(bucketsWithTwo > 0, "append should add files inside existing bucket dirs")
  }

  test("compaction loop: triggered buckets collapse to one file; probe rows and plans unchanged on a half-compacted index") {
    import spark.implicits._
    // deterministic collision fixture: rows sharing an embedding share
    // an SRP bucket, so repeated appends of pattern A fragment exactly
    // A's bucket while pattern B's bucket stays at one file — the
    // half-compacted state the maintenance loop must handle
    def fixed(ids: Seq[Long], seed: Int) =
      ids.map(i => (i, Array.tabulate(64)(j => (((seed * 31 + j * 7) % 11) - 5).toFloat)))
        .toDF("vec_id", "embedding")
    val dir = java.nio.file.Files.createTempDirectory("graft_srp_cmp").toString
    AnnIndex.buildSrpAt(dir, fixed(0L until 10L, seed = 1))
    AnnIndex.appendSrpAt(dir, fixed(10L until 20L, seed = 1))
    AnnIndex.appendSrpAt(dir, fixed(20L until 30L, seed = 1))
    AnnIndex.appendSrpAt(dir, fixed(30L until 40L, seed = 2))

    def bucketFiles(): Map[String, Int] =
      new java.io.File(dir).listFiles()
        .filter(f => f.isDirectory && f.getName.startsWith("srp_bucket="))
        .map(f => f.getName -> f.listFiles().count(_.getName.endsWith(".parquet")))
        .toMap
    val before = bucketFiles()
    val trigger = 3
    assert(before.values.exists(_ >= trigger), "fixture must fragment some buckets")
    assert(before.values.exists(_ < trigger), "fixture must leave some buckets sparse")

    def probeRows() = spark.read.parquet(dir)
      .select("vec_id", "srp_bucket").collect()
      .map(r => (r.getLong(0), r.getInt(1))).sortBy(_._1).toSeq
    val rowsBefore = probeRows()

    val compacted = AnnIndex.compactSrpAt(spark, dir, trigger)
    val after = bucketFiles()
    // exactly the triggered buckets were rewritten, each to one file
    assert(compacted.map(_._1).toSet ==
      before.filter(_._2 >= trigger).keySet, "trigger selected the wrong buckets")
    compacted.foreach { case (b, nb, na) =>
      assert(nb >= trigger && na == 1, s"$b: $nb -> $na")
    }
    // untriggered buckets untouched
    before.filter(_._2 < trigger).foreach { case (b, n) =>
      assert(after(b) == n, s"sparse bucket $b was rewritten")
    }
    // the half-compacted index serves identical rows, and a bucket
    // probe's PLAN still partition-prunes exactly as before compaction
    assert(probeRows() == rowsBefore, "compaction changed index contents")
    val someBucket = rowsBefore.head._2
    val probe = spark.read.parquet(dir).filter(col("srp_bucket") === someBucket)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("srp_bucket"),
      s"probe over the half-compacted index lost partition pruning:\n$plan")
    assert(probe.count() == rowsBefore.count(_._2 == someBucket).toLong)
    // idempotent: a second pass finds nothing over the trigger
    assert(AnnIndex.compactSrpAt(spark, dir, trigger).isEmpty)
  }

  test("PQ8 append encodes against the FROZEN codebook; anchors untouched") {
    import org.apache.spark.sql.functions.expr
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_pq8_inc").toString
    AnnIndex.buildPq8At(dir, a)
    def anchorRows() = spark.read.parquet(s"$dir/anchors")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val anchorsBefore = anchorRows()
    AnnIndex.appendPq8At(spark, dir, b)
    // the codebook is frozen: append must not touch the anchor table
    assert(anchorRows() == anchorsBefore, "append retrained/rewrote the codebook")
    // appended codes == direct encode of B against A's anchors — the
    // invariant that keeps every at-rest ADC table valid. (A full
    // rebuild over A∪B would pick DIFFERENT anchors — content-hash
    // sampled from the bigger corpus — which is exactly why append
    // must never be implemented as retrain.)
    def codeSet(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val atRest = codeSet(spark.read.parquet(s"$dir/codes"))
    val anchorsDf = spark.read.parquet(s"$dir/anchors")
    val wantB = codeSet(SimilarityOps2.pqEncode(
      b, anchorsDf, SimilarityOps2.PqM8, SimilarityOps2.PqSub8))
    val wantA = codeSet(SimilarityOps2.pqEncode(
      a, anchorsDf, SimilarityOps2.PqM8, SimilarityOps2.PqSub8))
    assert(atRest == wantA ++ wantB, "at-rest codes diverged from frozen-codebook encode")
    // every vector carries exactly m=8 code rows
    val n = emb.count()
    assert(atRest.size.toLong == n * SimilarityOps2.PqM8)
    // geometry guard: appending vectors of the wrong dimension must
    // fail BEFORE anything lands in the live codes dir (slicing a
    // short vector would zip_with nulls into garbage codes)
    val short = b.withColumn("v", expr("slice(v, 1, 32)"))
    intercept[IllegalArgumentException] { AnnIndex.appendPq8At(spark, dir, short) }
    assert(codeSet(spark.read.parquet(s"$dir/codes")) == atRest,
      "a rejected append must leave the codes dir untouched")
  }

  test("IVFADC append: frozen centroids + frozen codebook; appended codes land in pruned cells") {
    import org.apache.spark.sql.functions.expr
    val emb = Tables.embeddings(spark, sf)
      .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
    val a = emb.filter(col("vec_id") % 2 === 0)
    val b = emb.filter(col("vec_id") % 2 =!= 0)
    val dir = java.nio.file.Files.createTempDirectory("graft_ivfpq_inc").toString
    AnnIndex.buildIvfPq8At(dir, a)
    def centRows() = spark.read.parquet(s"$dir/cents")
      .collect().map(r => (r.getInt(0), r.getSeq[Double](1))).sortBy(_._1).toSeq
    def anchorRows() = spark.read.parquet(s"$dir/anchors")
      .collect().map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2)))
      .sortBy(t => (t._1, t._2)).toSeq
    val centsBefore = centRows()
    val anchorsBefore = anchorRows()
    AnnIndex.appendIvfPq8At(spark, dir, b)
    // both frozen artifacts untouched: a moved centroid re-routes
    // probes away from codes already at rest; a retrained codebook
    // silently mis-scores them
    assert(centRows() == centsBefore, "append moved the coarse centroids")
    assert(anchorRows() == anchorsBefore, "append retrained/rewrote the codebook")
    // every appended vector is present with exactly m code rows, coded
    // against the frozen anchors
    val codes = spark.read.parquet(s"$dir/codes")
    def codeSet(df: org.apache.spark.sql.DataFrame) =
      df.select("vec_id", "m", "code").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getInt(2))).toSet
    val anchorsDf = spark.read.parquet(s"$dir/anchors")
    val wantB = codeSet(SimilarityOps2.pqEncode(
      b, anchorsDf, SimilarityOps2.PqM8, SimilarityOps2.PqSub8))
    assert(codeSet(codes.filter(col("vec_id") % 2 =!= 0)) == wantB,
      "appended codes diverged from frozen-codebook encode")
    assert(codes.count() == emb.count() * SimilarityOps2.PqM8)
    // appended rows' cells reproduce the FROZEN-centroid assignment
    // rule (argmin squared-Euclidean of the normalized vector vs the
    // stored raw-space centroids, ties to lowest cell) — checked
    // against an independent driver-side evaluation
    val cents = centsBefore.map { case (c, cent) => (c, cent.toArray) }
    def assignOf(v: Array[Double]): Int = {
      val nrm = math.sqrt(v.foldLeft(0d)((acc, x) => acc + x * x))
      if (!(nrm > 0)) 0
      else cents.map { case (c, cent) =>
        val d = cent.zip(v).foldLeft(0d) { case (acc, (ci, xi)) =>
          val e = ci - xi / nrm; acc + e * e
        }
        (d, c)
      }.min._2
    }
    val bVecs = b.collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).toMap
    val atRestCells = codes.filter(col("vec_id") % 2 =!= 0)
      .select("vec_id", "cell").distinct()
      .collect().map(r => (r.getLong(0), r.getAs[Number](1).intValue)).toMap
    bVecs.foreach { case (id, v) =>
      assert(atRestCells(id) == assignOf(v),
        s"vec $id landed in cell ${atRestCells(id)}, frozen-centroid argmin says ${assignOf(v)}")
    }
    // a probe over the appended index still partition-prunes on cell
    val someCell = atRestCells.values.head
    val probe = spark.read.parquet(s"$dir/codes").filter(col("cell") === someCell)
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("cell"),
      s"IVFADC probe scan lost its cell partition filter:\n$plan")
    // empty append is a clean no-op; wrong geometry is rejected whole
    val before = codes.count()
    AnnIndex.appendIvfPq8At(spark, dir, b.filter(col("vec_id") < 0))
    assert(spark.read.parquet(s"$dir/codes").count() == before)
    val short = b.withColumn("v", expr("slice(v, 1, 32)"))
    intercept[IllegalArgumentException] { AnnIndex.appendIvfPq8At(spark, dir, short) }
    assert(spark.read.parquet(s"$dir/codes").count() == before,
      "a rejected append must leave the codes dir untouched")
  }

  test("flat and batch-keyed layouts refuse to mix under one root") {
    val emb = Tables.embeddings(spark, sf).limit(20)
    val flatRoot = java.nio.file.Files.createTempDirectory("graft_srp_flat").toString
    AnnIndex.buildSrpAt(flatRoot, emb)
    intercept[IllegalArgumentException] {
      AnnIndex.writeSrpBatchAt(flatRoot, 0L, emb)
    }
    val batchRoot = java.nio.file.Files.createTempDirectory("graft_srp_batch").toString
    AnnIndex.writeSrpBatchAt(batchRoot, 0L, emb)
    intercept[IllegalArgumentException] {
      AnnIndex.appendSrpAt(batchRoot, emb)
    }
    // replay idempotence: rewriting batch 0 does not double the rows
    AnnIndex.writeSrpBatchAt(batchRoot, 0L, emb)
    assert(spark.read.parquet(batchRoot).count() == 20L)
  }
}
