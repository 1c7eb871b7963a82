package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants of the corpus-mixture tranche (exact values are
  * oracle-checked by the driver; these pin the semantic properties). */
class TrainingOps2Spec extends SparkSpec {

  test("mix plan: rates are (0, 1e6]; under-budget sources keep everything") {
    val df = TrainingOps2.queries("source_mix_plan")(spark, sf).cache()
    assert(df.count() ==
      Tables.documents(spark, sf).select("source").distinct().count())
    assert(df.filter(col("rate_ppm") <= 0 || col("rate_ppm") > 1000000L).isEmpty)
    assert(df.filter(col("n_tok") <= col("budget") && col("rate_ppm") =!= 1000000L).isEmpty)
  }

  test("mixture sample: kept tokens land within hash noise of the budget") {
    val df = TrainingOps2.queries("sample_mixture")(spark, sf).cache()
    // a capped source keeps ~budget tokens: the content-hash filter is
    // Bernoulli at the doc grain, so allow wide (4x) noise — the
    // invariant is "the cap binds", not a tight CLT bound
    assert(df.filter(col("n_tokens") > col("budget") * 4).isEmpty)
    assert(df.filter(col("n_docs") <= 0).isEmpty)
  }

  test("dsir weights: eval docs score above the corpus mean (target fits itself)") {
    val w = TrainingOps2.queries("dsir_weights")(spark, sf).cache()
    assert(w.filter(col("mean_ratio_ppm") < 0 || col("min_ratio_ppm") > col("mean_ratio_ppm")
      || col("mean_ratio_ppm") > col("max_ratio_ppm")).isEmpty)
    val evalMean = w.filter(col("doc_id") % 100 < 5).agg(avg("mean_ratio_ppm")).head.getDouble(0)
    val restMean = w.filter(col("doc_id") % 100 >= 5).agg(avg("mean_ratio_ppm")).head.getDouble(0)
    assert(evalMean >= restMean,
      s"importance weights should rank the target split highest: eval=$evalMean rest=$restMean")
  }

  test("span census: descending occurrence counts, n_docs <= n_occ") {
    val rows = TrainingOps2.queries("span_topk")(spark, sf).collect()
    assert(rows.nonEmpty && rows.length <= 25)
    assert(rows.sliding(2).forall {
      case Array(a, b) => a.getLong(1) >= b.getLong(1); case _ => true
    })
    assert(rows.forall(r => r.getLong(2) <= r.getLong(1) && r.getLong(2) >= 1))
  }

  test("blocklist: partition of the corpus (blocked + kept == total) and it actually fires") {
    val df = TrainingOps2.queries("blocklist_filter")(spark, sf).cache()
    assert(df.filter(col("n_blocked") + col("n_kept") =!= col("n_total")).isEmpty)
    assert(df.agg(sum("n_total")).head.getLong(0) == Tables.documents(spark, sf).count())
    assert(df.agg(sum("n_blocked")).head.getLong(0) > 0)
  }

  test("temperature mix: shares normalize, sqrt compresses toward uniform, order kept") {
    val rows = TrainingOps2.queries("mix_temperature")(spark, sf)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
    val k = rows.length
    // integer-floor shares sum to within k ppm of exactly 1e6
    for (tot <- Seq(rows.map(_._3).sum, rows.map(_._4).sum))
      assert(tot > 1000000L - k && tot <= 1000000L, s"share sum $tot")
    assert(rows.map(_._5).sum <= 10000L)
    // α=0.5 compresses: for any pair with n_i < n_j the temp share
    // ratio strictly exceeds the natural ratio (rare sources upsampled)
    for (Seq(a, b) <- rows.toSeq.combinations(2) if a._2 != b._2) {
      val (lo, hi) = if (a._2 < b._2) (a, b) else (b, a)
      assert(lo._4 * hi._3 >= lo._3 * hi._4,
        s"temp share must compress ${lo._1} vs ${hi._1}")
      // ordering by size is preserved (monotone rebalance, not inversion)
      assert(lo._4 <= hi._4)
    }
  }
}
