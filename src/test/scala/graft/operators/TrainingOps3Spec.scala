package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics invariants for the third curation tranche (value parity
  * with DuckDB is the oracle's job). */
class TrainingOps3Spec extends SparkSpec {

  test("zorder key deinterleaves back to its coordinates") {
    val z = TrainingOps3.queries("zorder_key")(spark, sf)
    val back = z.withColumn("x2", expr(
        (0 until 8).map(i => s"(((zkey >> ${2 * i}) & 1) << $i)").mkString(" + ")))
      .withColumn("y2", expr(
        (0 until 8).map(i => s"(((zkey >> ${2 * i + 1}) & 1) << $i)").mkString(" + ")))
    val orig = Tables.events(spark, sf).select(col("event_id"),
      (col("user_id") % 256).cast("long").as("x"),
      (expr("unix_micros(ts) div 1000000") % 256).cast("long").as("y"))
    val bad = back.join(orig, "event_id")
      .filter(col("x") =!= col("x2") || col("y") =!= col("y2")).count()
    assert(bad == 0, s"$bad events fail the z-order roundtrip")
  }

  test("hard negatives always carry a different label") {
    val labels = Tables.embeddings(spark, sf).select("vec_id", "label")
    val hn = TrainingOps3.queries("hard_negatives")(spark, sf)
    val bad = hn
      .join(labels.withColumnRenamed("label", "la"), "vec_id")
      .join(labels.withColumnRenamed("vec_id", "hard_negative")
        .withColumnRenamed("label", "lb"), "hard_negative")
      .filter(col("la") === col("lb")).count()
    assert(bad == 0, s"$bad hard negatives share the anchor's label")
  }

  test("contamination excludes the benchmark docs and stays in [0,1]") {
    val c = TrainingOps3.queries("contamination_ngram_rate")(spark, sf)
    assert(c.filter(expr("doc_id % 50 = 0")).count() == 0)
    assert(c.filter(col("contam_rate") < 0 || col("contam_rate") > 1).count() == 0)
    assert(c.filter(col("n_contam") > col("n_grams")).count() == 0)
  }

  test("oov counts bounded by token counts; benchmark-free vocab is top-20") {
    val v = TrainingOps3.queries("vocab_oov_rate")(spark, sf)
    assert(v.filter(col("n_oov") > col("n_tokens")).count() == 0)
    // rates average well below 1: the top-20 vocab of a zipfy corpus
    // must cover a meaningful token share
    val mean = v.agg(avg("oov_rate")).collect()(0).getDouble(0)
    assert(mean < 0.9, s"top-20 vocab covers almost nothing (mean oov $mean)")
  }
}
