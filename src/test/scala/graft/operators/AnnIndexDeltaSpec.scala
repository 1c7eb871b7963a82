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
