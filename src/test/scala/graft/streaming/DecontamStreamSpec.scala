package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class RawDoc(doc_id: Long, text: String)

/** Streaming decontamination == the batch bloom path, and the stream
  * stays stateless. */
class DecontamStreamSpec extends SparkSpec {

  test("streamed contamination flags == batch decontaminate_bloom across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val bloom = graft.operators.TrainingOps.evalBloom(spark, sf)
    val input = MemoryStream[RawDoc]
    val q = DecontamStream.stamp(input.toDF(), bloom).writeStream
      .outputMode("append").format("memory").queryName("decontam").start()
    try {
      // stream the TRAINING side (batch query's probe population)
      val docs = Tables.documents(spark, sf)
        .filter(col("doc_id") % 100 >= 5)
        .select("doc_id", "text").as[RawDoc].collect().sortBy(_.doc_id)
      docs.grouped(211).foreach { chunk => input.addData(chunk.toSeq); q.processAllAvailable() }
      assert(q.lastProgress.stateOperators.isEmpty,
        "decontamination stream must not allocate a state store")
      val got = spark.table("decontam").filter(col("contaminated"))
        .select("doc_id", "n_flagged")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = graft.operators.TrainingOps.queries("decontaminate_bloom")(spark, sf)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == want)
      // and the no-false-negative property carries to the stream: every
      // exact-path contaminated doc is flagged
      val exact = graft.operators.TrainingOps.queries("decontaminate_exact")(spark, sf)
        .select("doc_id").collect().map(_.getLong(0)).toSet
      assert((exact -- got.keySet).isEmpty)
    } finally q.stop()
  }
}
