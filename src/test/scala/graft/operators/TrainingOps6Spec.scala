package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Split-management tranche semantics (values at real SFs are the
  * DuckDB oracle's job). */
class TrainingOps6Spec extends SparkSpec {
  import spark.implicits._

  private def docsFrom(rows: Seq[(Long, String)]) =
    rows.toDF("doc_id", "text")
      .withColumn("lang", lit("en"))
      .withColumn("source", lit("s"))
      .withColumn("n_chars", length(col("text")).cast("long"))

  test("dataset_split: deterministic, content-keyed, ~80/10/10 on the corpus") {
    val docs = graft.Tables.documents(spark, sf)
    val a = TrainingOps6.datasetSplit(docs).collect().toSeq
    val b = TrainingOps6.datasetSplit(docs).collect().toSeq
    assert(a == b, "re-running returns the identical census")
    val bySplit = a.groupBy(_.getString(1))
      .view.mapValues(_.map(_.getLong(2)).sum).toMap
    val total = bySplit.values.sum.toDouble
    assert(bySplit("train") / total > 0.7 && bySplit("train") / total < 0.9)
    assert(bySplit.keySet == Set("train", "val", "test"))
  }

  test("identical text always lands in the same split") {
    val docs = docsFrom(Seq(
      (1L, "the quick brown fox jumps over the lazy dog again and again"),
      (2L, "the quick brown fox jumps over the lazy dog again and again"),
      (3L, "a completely different document about spark catalyst planning")))
    val splits = docs.withColumn("split", TrainingOps6.splitCol)
      .select("doc_id", "split").as[(Long, String)].collect().toMap
    assert(splits(1L) == splits(2L), "content hash ⇒ same split for equal text")
  }

  test("split_leakage: exact dups never leak; cross-split near dups do") {
    // base text long enough for stable shingles; nearA/nearB differ in
    // one trailing word (jaccard >> 0.8). Search a salt so the two
    // near-dup variants land in DIFFERENT splits (the leakage case) —
    // deterministic: the salt is part of the constructed corpus.
    val words = (1 to 40).map(i => s"w$i").mkString(" ")
    def splitOf(text: String): String =
      docsFrom(Seq((0L, text))).withColumn("s", TrainingOps6.splitCol)
        .select("s").as[String].head()
    val salt = (0 until 200).find { k =>
      splitOf(s"$words alpha$k") != splitOf(s"$words beta$k")
    }.get
    val nearA = s"$words alpha$salt"
    val nearB = s"$words beta$salt"
    val exact = "an exactly duplicated document text with enough words " +
      "to form plenty of shingles for the pair join to see"
    val docs = docsFrom(Seq(
      (1L, nearA), (2L, nearB),    // near dups, different splits → leak
      (10L, exact), (11L, exact),  // exact dups → same split, no leak
      (20L, "unrelated text " + (1 to 30).map(i => s"u$i").mkString(" "))))
    val out = TrainingOps6.splitLeakage(docs, TrainingOps6.JaccardTauPpm)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(out.contains(1L), s"near-dup pair must surface as a leaking group: $out")
    assert(out(1L) == (2L, 2L))
    assert(!out.contains(10L), "exact dups share the split by construction")
  }

  test("tokenizer_fertility: >= 1.0 and consistent with doc_bpe_tokens sums") {
    val docs = graft.Tables.documents(spark, sf)
    val fert = TrainingOps6.tokenizerFertility(docs).collect()
    assert(fert.nonEmpty)
    assert(fert.forall(_.getLong(3) >= 1000000L),
      "the regex tokenizer never merges across whitespace words")
    val viaDocOp = TextOps2.queries("doc_bpe_tokens")(spark, sf)
      .agg(sum("bpe_tokens"), sum("ws_tokens")).as[(Long, Long)].head()
    val viaFert = (fert.map(_.getLong(1)).sum, fert.map(_.getLong(2)).sum)
    assert(viaFert == viaDocOp, "per-lang sums must reconcile with the per-doc op")
  }
}
