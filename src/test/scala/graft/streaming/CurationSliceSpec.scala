package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

case class In(doc_id: Long, source: String, lang: String, text: String)

/** End-to-end streaming curation: the corpus at rest must hold exactly
  * the scrubbed, unique, quality-passing docs the batch operators
  * would select, and every kept doc must be ANN-searchable through
  * the live-appended SRP index the moment its batch commits. */
class CurationSliceSpec extends SparkSpec {

  test("stream slice == batch selection; PII never lands at rest; index is live") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark

    val reals = Tables.documents(spark, sf)
      .select("doc_id", "source", "lang", "text")
      .orderBy("doc_id").limit(30)
      .as[(Long, String, String, String)].collect()
      .map(r => In(r._1, r._2, r._3, r._4))
    val base0 = reals(0).text
    val base1 = reals(1).text
    val injected = Seq(
      In(9001L, "resend", "en", base0),                                  // exact dup
      In(9002L, "crawl", "en", base1 + " contact alice@example.com now"), // PII variant A
      In(9003L, "crawl", "en", base1 + " contact bob@test.org now"),      // PII variant B == A after scrub
      In(9004L, "junk", "en", "tiny doc"),                               // gate drop
      In(9005L, "resend", "en", base0),                                  // re-delivery, later batch
      In(9006L, "nulltext", "en", null))                                 // null text must not kill the query
    val batches = Seq(
      reals.take(15).toSeq,
      reals.drop(15).toSeq ++ injected.slice(0, 2),
      injected.slice(2, 6))

    val corpusDir = java.nio.file.Files.createTempDirectory("graft_cur_corpus").toString + "/data"
    val indexDir = java.nio.file.Files.createTempDirectory("graft_cur_index").toString + "/srp"
    val ckpt = java.nio.file.Files.createTempDirectory("graft_cur_ckpt").toString

    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[In]
    val q = CurationPipeline.start(input.toDF(), corpusDir, indexDir, ckpt)
    try {
      batches.foreach { b => input.addData(b); q.processAllAvailable() }
    } finally q.stop()

    // expected = the batch pipeline on the same input: scrub -> exact
    // dedup (min id per scrubbed content) -> gopher keep
    val allDf = (reals ++ injected).toSeq.toDF("doc_id", "source", "lang", "text")
    val scrubbed = CurationPipeline.scrub(allDf).localCheckpoint(true)
    val canon = scrubbed.groupBy(col("text").as("t")).agg(min("doc_id").as("cid"))
    val expected = scrubbed
      .join(canon, col("text") === col("t") && col("doc_id") === col("cid"))
      .join(graft.operators.TrainingOps.gopherSignals(scrubbed)
        .select(col("doc_id"), col("keep")), "doc_id")
      .filter(col("keep"))
      .select("doc_id").as[Long].collect().sorted

    val corpus = spark.read.parquet(corpusDir)
    val got = corpus.select("doc_id").as[Long].collect().sorted
    assert(got.toSeq == expected.toSeq,
      s"corpus mismatch: got ${got.toSeq}, want ${expected.toSeq}")
    // the dup injections never landed; the PII canonical (9002) did iff it kept
    assert(!got.contains(9001L) && !got.contains(9003L) && !got.contains(9005L))
    assert(!got.contains(9004L), "gate-dropped doc leaked to the corpus")
    assert(!got.contains(9006L), "null-text doc must be gate-dropped, not crash the stream")

    // PII never at rest: stored text is the scrubbed form
    val stored = corpus.filter(col("doc_id") === 9002L)
      .select("text").as[String].collect()
    if (stored.nonEmpty) {
      assert(stored.head.contains("<EMAIL>") && !stored.head.contains("alice@example.com"))
      assert(corpus.filter(col("doc_id") === 9002L).select("n_pii")
        .as[Long].head() > 0L, "audit count must travel with the doc")
    }

    // live index: one vector per kept doc, and a probe partition-prunes
    // to its bucket and finds it
    val idx = spark.read.parquet(indexDir)
    val vecIds = idx.select("vec_id").as[Long].collect().sorted
    assert(vecIds.toSeq == expected.toSeq, "index out of sync with the corpus")
    val anyVec = expected.last
    val bucket = idx.filter(col("vec_id") === anyVec)
      .select(col("srp_bucket").cast("int")).as[Int].head()
    val probe = spark.read.parquet(indexDir).filter(col("srp_bucket") === bucket)
    assert(probe.select("vec_id").as[Long].collect().contains(anyVec))
    val plan = probe.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [") && plan.contains("srp_bucket"),
      s"index probe lost partition pruning:\n$plan")
  }
}
