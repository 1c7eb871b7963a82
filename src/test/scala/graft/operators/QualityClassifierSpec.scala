package graft.operators

import graft.{SparkEntry, SparkSpec}

/** Named coverage for the no-oracle `doc_quality_classifier` row
  * (iterative LBFGS is not SQL-expressible): the learned filter must
  * (a) be reproducible run-to-run on identical input, (b) actually
  * separate the rule-labeled classes it was trained on, and (c) score
  * every doc with a valid probability.
  */
class QualityClassifierSpec extends SparkSpec {

  private def scored() =
    SparkEntry.queries("doc_quality_classifier")(spark, sf)
      .collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))

  test("scores every doc exactly once with probabilities in [0,1]") {
    val rows = scored()
    val nDocs = graft.Tables.documents(spark, sf).count()
    assert(rows.length.toLong == nDocs, "one score per doc")
    assert(rows.map(_._1).distinct.length == rows.length, "doc_id unique")
    assert(rows.forall { case (_, _, p) => p >= 0.0 && p <= 1.0 })
  }

  test("training is deterministic on identical input (same fit, same scores)") {
    val a = scored()
    val b = scored()
    assert(a.sameElements(b),
      "two fits over the same data must produce identical probabilities")
  }

  test("golden pin (sf0.001 fixture): LBFGS scores are stable across Spark/BLAS upgrades") {
    // the determinism test above only proves same-version stability;
    // this pins the actual fitted probabilities (the BpeTrainSpec /
    // emb_pca_explained golden pattern) so an upgrade that silently
    // changes the optimizer's trajectory is DETECTED, not absorbed
    val rows = SparkEntry.queries("doc_quality_classifier")(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
      .toSeq.sortBy(_._1)
    assert(rows.length == 500)
    val golden = Seq(
      (0L, 0, 0.21474208480394552),
      (1L, 1, 0.9953240699000114),
      (2L, 1, 0.8928821018673555),
      (7L, 1, 0.7226914166016265),
      (19L, 1, 0.4879428631618289),
      (31L, 1, 0.9999632152626071),
      (47L, 1, 0.9255620580020597))
    val byId = rows.map(r => r._1 -> r).toMap
    golden.foreach { case (id, label, p) =>
      val (_, gotLabel, gotP) = byId(id)
      assert(gotLabel == label, s"doc $id: rule label drifted $gotLabel != $label")
      assert(math.abs(gotP - p) / p < 1e-9,
        s"doc $id: classifier score drifted $gotP vs golden $p")
    }
    // corpus-level pin: mean probability (sensitive to any broad shift)
    val mean = rows.map(_._3).sum / rows.length
    assert(math.abs(mean - 0.726000121100952) < 1e-9, s"mean score drifted: $mean")
  }

  test("learned scores separate the rule-labeled classes (the filter works)") {
    val rows = scored()
    val (pos, neg) = rows.partition(_._2 == 1)
    assert(pos.nonEmpty && neg.nonEmpty, "both classes present in fixtures")
    val meanPos = pos.map(_._3).sum / pos.length
    val meanNeg = neg.map(_._3).sum / neg.length
    assert(meanPos - meanNeg > 0.4,
      f"class separation too weak: mean(pos)=$meanPos%.3f mean(neg)=$meanNeg%.3f")
    // threshold-0.5 accuracy well above the base rate
    val acc = rows.count { case (_, y, p) => (p >= 0.5) == (y == 1) }.toDouble / rows.length
    val base = math.max(pos.length, neg.length).toDouble / rows.length
    assert(acc > math.min(0.9, base + 0.02),
      f"accuracy $acc%.3f not better than base rate $base%.3f")
  }
}
