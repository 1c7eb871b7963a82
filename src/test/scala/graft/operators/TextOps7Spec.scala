package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Heaps-law curve invariants, brute-verified at sf0.001. */
class TextOps7Spec extends SparkSpec {

  test("heaps_law_points: monotone curve whose last point is the whole corpus") {
    val rows = SparkEntry.queries("heaps_law_points")(spark, sf).collect()
    assert(rows.length == TextOps7.Points)
    val byI = rows.map(r => r.getLong(0) ->
      ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    // monotone non-decreasing in docs, tokens, vocab
    (2 to TextOps7.Points).foreach { i =>
      val (_, d0, t0, v0) = byI(i - 1L)
      val (_, d1, t1, v1) = byI(i.toLong)
      assert(d1 >= d0 && t1 >= t0 && v1 >= v0, s"point $i not monotone")
    }
    // final point covers every doc: totals recomputed independently
    val docs = Tables.documents(spark, sf)
    val totalDocs = docs.count()
    val totalTokens = docs
      .select(size(split(col("text"), " ", -1)).cast("long").as("t"))
      .agg(sum("t")).collect().head.getLong(0)
    val totalVocab = docs
      .select(explode(split(col("text"), " ", -1)).as("w"))
      .filter(col("w") =!= "").select("w").distinct().count()
    val (thr, d10, t10, v10) = byI(TextOps7.Points.toLong)
    assert(thr > docs.agg(max(col("doc_id"))).collect().head.getLong(0))
    assert(d10 == totalDocs && t10 == totalTokens && v10 == totalVocab)
    // the curve is concave-ish in practice: vocab grows slower than
    // tokens between the first and last point (Heaps beta < 1)
    val (_, _, t1, v1) = byI(1L)
    assert(v10.toDouble / v1 <= t10.toDouble / t1,
      "vocabulary outgrew tokens — not a Heaps-shaped corpus")
  }
}
