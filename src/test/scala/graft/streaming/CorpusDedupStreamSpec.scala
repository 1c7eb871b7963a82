package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Streaming dedup-on-arrival == batch dedup_exact when docs arrive in
  * id order; duplicate detection must span micro-batch boundaries. */
class CorpusDedupStreamSpec extends SparkSpec {
  import CorpusDedupStream.{Doc, DocVerdict}

  test("cross-batch duplicates map to the first-arriving canonical") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    val input = MemoryStream[Doc]
    val q = CorpusDedupStream.dedup(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("cds").start()
    try {
      input.addData(Doc(1, "aaa"), Doc(2, "bbb"), Doc(3, "aaa"))
      q.processAllAvailable()
      input.addData(Doc(4, "aaa"), Doc(5, "ccc"), Doc(6, "bbb"))
      q.processAllAvailable()
      val got = spark.table("cds").as[DocVerdict].collect()
        .map(v => v.doc_id -> ((v.canonical_id, v.is_dup))).toMap
      assert(got == Map(
        1L -> ((1L, false)), 2L -> ((2L, false)), 3L -> ((1L, true)),
        4L -> ((1L, true)), 5L -> ((5L, false)), 6L -> ((2L, true))))
    } finally q.stop()
  }

  test("streamed corpus (in id order) reproduces the batch dedup_exact verdicts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    val input = MemoryStream[Doc]
    val q = CorpusDedupStream.dedup(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("cds2").start()
    try {
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
        .as[Doc].collect().sortBy(_.doc_id)
      docs.grouped(100).foreach { chunk => input.addData(chunk.toSeq); q.processAllAvailable() }
      val got = spark.table("cds2").as[DocVerdict].collect()
        .map(v => v.doc_id -> ((v.canonical_id, v.is_dup))).toMap
      val want = graft.operators.DedupOps.queries("dedup_exact")(spark, sf)
        .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getBoolean(2)))).toMap
      assert(got == want)
    } finally q.stop()
  }
}
