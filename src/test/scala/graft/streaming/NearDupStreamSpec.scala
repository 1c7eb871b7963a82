package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.DedupOps
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.col

/** Streaming LSH near-dup candidates == batch LSH candidates, across
  * micro-batch splits (the arrival-order twin of DedupSpec's batch
  * recall invariant). */
class NearDupStreamSpec extends SparkSpec {

  test("cross-batch candidate set equals the batch LSH bucket join (any split)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(300).cache()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)

    // batch truth: distinct (da < db) pairs sharing >=1 band bucket
    val truth = DedupOps.minhashCandidates(DedupOps.minhashSignatures(docs))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val in = MemoryStream[(Long, String)]
    val q = NearDupStream.candidates(in.toDS().toDF("doc_id", "text"))
      .writeStream.outputMode("append").format("memory").queryName("neardup_cands")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("neardup_ck").toString)
      .start()
    try {
      // split into 3 micro-batches: candidates must be split-invariant
      rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
        in.addData(b.toSeq); q.processAllAvailable()
      }
      val streamed = spark.sql("select doc_id, prior_doc from neardup_cands")
        .collect()
        .map(r => (math.min(r.getLong(0), r.getLong(1)), math.max(r.getLong(0), r.getLong(1))))
        .toSet
      assert(streamed == truth,
        s"streaming candidates diverged from batch: missing=${(truth -- streamed).take(5)} " +
          s"extra=${(streamed -- truth).take(5)}")
      // at-least-once delivery: re-sending an entire batch must add NO
      // rows (members are not re-appended, candidates not re-emitted)
      val before = spark.sql("select count(*) from neardup_cands").collect()(0).getLong(0)
      in.addData(rows.take(rows.length / 3).toSeq); q.processAllAvailable()
      val after = spark.sql("select count(*) from neardup_cands").collect()(0).getLong(0)
      assert(after == before, s"re-delivery emitted ${after - before} duplicate candidates")
    } finally q.stop()
  }

  test("streaming confirmed pairs == batch LSH + exact rerank (j >= 0.8)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    val docs = Tables.documents(spark, sf).select("doc_id", "text").limit(300).cache()
    val rows = docs.as[(Long, String)].collect().sortBy(_._1)

    // batch truth: LSH candidates reranked exactly, thresholded
    val truth = DedupOps.verifyJaccard(docs,
        DedupOps.minhashCandidates(DedupOps.minhashSignatures(docs))
          .select(col("da"), col("db")))
      .filter(col("jaccard") >= 0.8)
      .collect().map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    assert(truth.nonEmpty, "fixture should contain confirmed near-dups")

    val outDir = java.nio.file.Files.createTempDirectory("neardup_conf").toString
    val in = MemoryStream[(Long, String)]
    val q = NearDupStream.confirmedPairs(in.toDS().toDF("doc_id", "text"),
      docs, 0.8, outDir,
      java.nio.file.Files.createTempDirectory("neardup_conf_ck").toString)
    try {
      rows.grouped(math.max(1, rows.length / 3)).foreach { b =>
        in.addData(b.toSeq); q.processAllAvailable()
      }
      val streamed = spark.read.parquet(s"$outDir/batch-*")
        .collect().map(r => (math.min(r.getLong(0), r.getLong(1)),
          math.max(r.getLong(0), r.getLong(1)))).toSet
      assert(streamed == truth,
        s"confirmed-pair stream diverged: missing=${(truth -- streamed).take(5)} " +
          s"extra=${(streamed -- truth).take(5)}")
    } finally q.stop()
  }
}
