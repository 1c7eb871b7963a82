package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.SelectionOps

/** Streaming reservoir == batch sample_weighted for any micro-batch
  * split and any arrival order (membership is a pure content
  * function); state stays k entries forever. */
class WeightedSampleStreamSpec extends SparkSpec {
  import WeightedSampleStream.{DocPriority, Reservoir}

  private def runSplit(order: Seq[org.apache.spark.sql.Row], nBatches: Int,
                       k: Int, name: String): Seq[DocPriority] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    val input = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(Long, String, Long)]
    val docs = input.toDF().toDF("doc_id", "text", "n_chars")
    val q = WeightedSampleStream.reservoir(docs, k).writeStream
      .outputMode("update").format("memory").queryName(name).start()
    try {
      val tuples = order.map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val per = math.max(1, tuples.size / nBatches)
      tuples.grouped(per).foreach { chunk =>
        input.addData(chunk); q.processAllAvailable()
      }
      spark.table(name).as[Reservoir].collect().last.entries
    } finally q.stop()
  }

  test("any split/order reproduces the batch priority sample; state stays k entries") {
    val docs = Tables.documents(spark, sf)
      .select("doc_id", "text", "n_chars").collect().toSeq
    val k = 16
    val want = SelectionOps.weightedSample(
      Tables.documents(spark, sf), k)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val oneBatch = runSplit(docs, 1, k, "wss_one")
    val fiveBatches = runSplit(docs, 5, k, "wss_five")
    val reversed = runSplit(docs.reverse, 4, k, "wss_rev")
    for ((got, label) <- Seq((oneBatch, "one"), (fiveBatches, "five"), (reversed, "rev"))) {
      assert(got.size == k, s"$label: reservoir must hold exactly k")
      assert(got.map(e => (e.doc_id, e.w, e.priority_ppm)).toSet == want,
        s"$label: reservoir must equal the batch sample")
    }
  }
}
