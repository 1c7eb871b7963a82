package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Invariants of the training-data curation tranche (exact values are
  * oracle-checked by the driver; these pin the semantic properties). */
class TrainingOpsSpec extends SparkSpec {

  test("gopher signals: keep implies every threshold; ppm fields are in range") {
    val df = TrainingOps.queries("doc_gopher_signals")(spark, sf).cache()
    assert(df.count() == Tables.documents(spark, sf).count())
    assert(df.filter(col("keep") &&
      (col("n_words") < 40 || col("stop_ppm") < 10000)).isEmpty)
    assert(df.filter(col("distinct_ppm") > 1000000 || col("distinct_ppm") <= 0).isEmpty)
    // corpus has both kept and dropped docs — thresholds actually cut
    assert(df.filter(col("keep")).count() > 0)
    assert(df.filter(!col("keep")).count() > 0)
  }

  test("repetition: top-token coverage bounded by (1/n_tok, 1]") {
    val df = TrainingOps.queries("doc_repetition")(spark, sf)
    assert(df.filter(col("top_token_ppm") > 1000000 || col("top_token_ppm") <= 0).isEmpty)
    assert(df.filter(col("top_bigram_ppm") > 2000000).isEmpty)
  }

  test("stratified sample: per-lang rates track the configured thresholds") {
    val docs = Tables.documents(spark, sf)
    val kept = TrainingOps.queries("sample_stratified")(spark, sf)
    val total = docs.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val hit = kept.groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val rates = Map("en" -> 0.25, "de" -> 0.125, "es" -> 0.0625)
    for ((lang, want) <- rates if total.contains(lang)) {
      val got = hit.getOrElse(lang, 0L).toDouble / total(lang)
      assert(math.abs(got - want) < 0.15, s"$lang rate $got vs $want")
    }
  }

  test("packing: docs and tokens are conserved; bin manifests are ordered") {
    val docs = Tables.documents(spark, sf)
      .select(col("lang"), size(split(col("text"), " ", -1)).cast("long").as("n"))
    val want = docs.groupBy("lang").agg(count(lit(1)).as("docs"), sum("n").as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    val bins = TrainingOps.queries("doc_pack_bins")(spark, sf).cache()
    val got = bins.groupBy("lang").agg(sum("n_docs").as("docs"), sum("n_tokens").as("toks"))
      .collect().map(r => r.getString(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == want, "packing must conserve docs and tokens per stratum")
    assert(bins.filter(col("first_doc") > col("last_doc")).isEmpty)
  }

  test("int8 quantization: SSE bounded by dim * (step size)^2") {
    val df = TrainingOps.queries("emb_quantize_int8")(spark, sf)
    // per-element |error| <= amax div 127 + 1 (integer round-toward-zero)
    assert(df.filter(col("sse") >
      col("dim") * (col("amax") / 127 + 1) * (col("amax") / 127 + 1)).isEmpty)
    assert(df.filter(col("sse") < 0).isEmpty)
  }

  test("decontamination: bloom path flags a superset of the exact path (no false negatives)") {
    val exact = TrainingOps.queries("decontaminate_exact")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val bloom = TrainingOps.queries("decontaminate_bloom")(spark, sf)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(exact.nonEmpty, "corpus should contain contaminated docs (exact dups span the split)")
    val missed = exact -- bloom
    assert(missed.isEmpty, s"bloom missed ${missed.size} truly-contaminated docs: $missed")
    // each probed (doc, shingle) can false-positive at ~fpp=0.001 and
    // every FP shingle can flag a new doc: bound extra docs by 3x the
    // expected FP count (not by the exact-hit count — a corpus with
    // many shingles and few true hits legitimately flags more docs)
    val probes = Tables.documents(spark, sf)
      .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
      .filter(size(col("w")) >= 8 && col("doc_id") % 100 >= 5)
      .select(col("doc_id"), explode(expr(
        "transform(transform(sequence(1, size(w) - 7), i -> concat_ws(' ', slice(w, i, 8))), g -> xxhash64(g))")).as("h"))
      .distinct().count()
    val bound = math.max(5L, (probes * 0.003).toLong)
    assert((bloom -- exact).size <= bound,
      s"bloom flagged ${(bloom -- exact).size} false docs; expected <= $bound for $probes probes")
  }

  test("source overlap is symmetric-canonical (src_a < src_b) and counts real dups") {
    val df = TrainingOps.queries("source_overlap")(spark, sf).cache()
    assert(df.filter(col("src_a") >= col("src_b")).isEmpty)
    assert(df.filter(col("n_shared") <= 0).isEmpty)
  }

  test("LM score: probabilities live in (0, 1e6]; min <= mean") {
    val df = TrainingOps.queries("doc_lm_score")(spark, sf)
    assert(df.filter(col("min_p_ppm") <= 0 || col("mean_p_ppm") > 1000000).isEmpty)
    assert(df.filter(col("min_p_ppm") > col("mean_p_ppm")).isEmpty)
  }
}
