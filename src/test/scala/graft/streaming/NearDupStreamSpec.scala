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

  test("degenerate bucket saturates at the cap: bounded state, bounded pairs, overflow markers") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    implicit val sp: org.apache.spark.sql.SparkSession = spark
    // 10k byte-identical docs: every one lands in the SAME 16 band
    // buckets — the pathological mass-near-dup case. With cap=8 each
    // bucket must store only the first 8 arrivals, emit exactly
    // C(8,2)=28 member pairs, and mark every later arrival with the
    // overflow sentinel instead of pairing (per band).
    val cap = 8
    val n = 10000
    val docs = (0L until n).map(i => (i, "the quick brown fox jumps over the lazy dog again and again"))
    val in = MemoryStream[(Long, String)]
    val q = NearDupStream.candidates(in.toDS().toDF("doc_id", "text"), maxBucketMembers = cap)
      .writeStream.outputMode("append").format("memory").queryName("neardup_sat")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("neardup_sat_ck").toString)
      .start()
    try {
      // two micro-batches: saturation must persist across batches
      docs.grouped(n / 2).foreach { b => in.addData(b.toSeq); q.processAllAvailable() }
      val bands = 16
      val pairs = spark.sql(
        s"select count(*) from neardup_sat where prior_doc >= 0").collect()(0).getLong(0)
      val markers = spark.sql(
        s"select count(*) from neardup_sat where prior_doc = ${NearDupStream.OverflowPrior}")
        .collect()(0).getLong(0)
      assert(pairs == bands.toLong * cap * (cap - 1) / 2,
        s"saturated buckets must emit exactly C($cap,2) pairs per band, got $pairs")
      assert(markers == bands.toLong * (n - cap),
        s"every overflow arrival must emit one marker per band, got $markers")
      // stored members are the first `cap` ids (deterministic min-id order)
      val pairedIds = spark.sql("select doc_id from neardup_sat where prior_doc >= 0")
        .as[Long].collect().toSet
      assert(pairedIds == (1L until cap.toLong).toSet,
        s"stored members must be the lowest ids, got $pairedIds")
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
