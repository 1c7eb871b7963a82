package graft.streaming

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

case class InDoc(doc_id: Long, lang: String, text: String)

/** The streaming gate must be a stateless map (plan shape) and produce
  * the batch query's verdicts exactly (semantics). */
class QualityGateStreamSpec extends SparkSpec {

  test("streamed gate verdicts == batch doc_gopher_signals across micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[InDoc]
    val q = QualityGateStream.gate(input.toDF()).writeStream
      .outputMode("append").format("memory").queryName("qgate").start()
    try {
      val docs = Tables.documents(spark, sf)
        .select("doc_id", "lang", "text").as[InDoc].collect().sortBy(_.doc_id)
      docs.grouped(137).foreach { chunk => input.addData(chunk.toSeq); q.processAllAvailable() }
      val got = spark.table("qgate")
        .select("doc_id", "n_words", "mean_wlen_ppm", "distinct_ppm", "stop_ppm", "keep")
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      val want = graft.operators.TrainingOps.queries("doc_gopher_signals")(spark, sf)
        .select("doc_id", "n_words", "mean_wlen_ppm", "distinct_ppm", "stop_ppm", "keep")
        .collect().map(r => r.getLong(0) -> r.toSeq.tail).toMap
      assert(got == want)
      // every drop carries a concrete reason; keeps are all "ok"
      val reasons = spark.table("qgate").groupBy("keep", "reason").count().collect()
      assert(reasons.filter(_.getBoolean(0)).forall(_.getString(1) == "ok"))
      assert(reasons.filter(!_.getBoolean(0)).forall(_.getString(1) != "ok"))
    } finally q.stop()
  }

  test("gate is stateless: no state operators, and the batch plan is shuffle-free") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[InDoc]
    val q = QualityGateStream.gate(input.toDF()).writeStream
      .outputMode("append").format("memory").queryName("qgate_plan").start()
    try {
      input.addData(InDoc(1, "en", "a b c"))
      q.processAllAvailable()
      assert(q.lastProgress.stateOperators.isEmpty,
        "quality gate must not allocate a state store")
    } finally q.stop()
    // same transform over a batch relation: pure map, zero exchanges
    val plan = QualityGateStream.gate(
        Tables.documents(spark, sf).select("doc_id", "lang", "text"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), s"gate plans a shuffle:\n$plan")
  }

  test("route partitions the gated stream exactly (keep + drop == all)") {
    val gated = QualityGateStream.gate(
      Tables.documents(spark, sf).select("doc_id", "lang", "text"))
    val (keep, drop) = QualityGateStream.route(gated)
    assert(keep.count() + drop.count() == Tables.documents(spark, sf).count())
    assert(keep.filter(!col("keep")).isEmpty && drop.filter(col("keep")).isEmpty)
  }
}
