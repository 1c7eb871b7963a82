package graft.streaming

import graft.{SparkSpec, Tables}
import graft.operators.SelectionOps

/** Streaming novelty-on-arrival == batch gram_novelty when docs arrive
  * in id order, for ANY micro-batch split; novelty must be judged
  * against the full cross-batch gram history. */
class NoveltyStreamSpec extends SparkSpec {
  import NoveltyStream.{GramObs, GramVerdict}

  private def runSplit(batchSizes: Seq[Int]): Map[Long, (Long, Long, Long)] = {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[GramObs]
    val name = s"nvs_${batchSizes.mkString("_")}"
    val q = NoveltyStream.novelty(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName(name).start()
    try {
      val docs = Tables.documents(spark, sf).select("doc_id", "text")
      val obs = NoveltyStream.gramObs(docs)
        .as[(Long, Long)].collect().map { case (d, g) => GramObs(d, g) }
        .sortBy(g => (g.doc_id, g.gh))
      // split into batches along doc_id boundaries (cumulative doc counts)
      val docIds = obs.map(_.doc_id).distinct.sorted
      val cuts = batchSizes.scanLeft(0)(_ + _).sliding(2).map { case Seq(a, b) =>
        docIds.slice(a, b).toSet
      }.toSeq
      cuts.foreach { ids =>
        val chunk = obs.filter(g => ids.contains(g.doc_id))
        if (chunk.nonEmpty) { input.addData(chunk.toSeq); q.processAllAvailable() }
      }
      val rolled = NoveltyStream.rollup(spark.table(name))
      rolled.collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    } finally q.stop()
  }

  test("any id-ordered micro-batch split reproduces the batch novelty curve") {
    val want = SelectionOps.gramNovelty(Tables.documents(spark, sf))
      .collect().map(r =>
        r.getLong(0) -> ((r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    val n = want.size
    val oneBatch = runSplit(Seq(n))
    assert(oneBatch == want, "single-batch stream must equal the batch operator")
    val threeBatches = runSplit(Seq(n / 3, n / 3, n - 2 * (n / 3)))
    assert(threeBatches == want, "novelty must be judged against cross-batch history")
  }

  test("a re-delivered doc in a later batch is fully stale (novelty 0)") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    implicit val sess = spark
    val input = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[GramObs]
    val q = NoveltyStream.novelty(input.toDS()).writeStream
      .outputMode("append").format("memory").queryName("nvs_redeliver").start()
    try {
      input.addData(GramObs(1, 101L), GramObs(1, 102L), GramObs(2, 102L), GramObs(2, 103L))
      q.processAllAvailable()
      input.addData(GramObs(3, 101L), GramObs(3, 102L), GramObs(3, 103L))
      q.processAllAvailable()
      val got = spark.table("nvs_redeliver").as[GramVerdict].collect()
        .map(v => (v.doc_id, v.gh) -> v.novel).toMap
      // batch 1: doc 1 owns 101+102 (min doc), doc 2 owns 103 only
      assert(got((1L, 101L)) && got((1L, 102L)) && !got((2L, 102L)) && got((2L, 103L)))
      // batch 2: everything already seen
      assert(!got((3L, 101L)) && !got((3L, 102L)) && !got((3L, 103L)))
    } finally q.stop()
  }
}
