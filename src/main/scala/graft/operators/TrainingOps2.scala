package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Corpus-mixture tranche: the source-reweighting / data-selection
  * operators that turn a raw multi-source corpus into a training
  * mixture.
  *
  *  - `source_mix_plan` — per-source token census → per-source keep
  *    rate toward a uniform token budget (the "domain reweighting"
  *    table a pipeline computes once per corpus snapshot);
  *  - `sample_mixture` — applies the plan with deterministic
  *    content-hash thresholds (reproducible across engines, runs and
  *    partitionings — no seeded RNG);
  *  - `dsir_weights` — DSIR-flavored importance weights (Xie et al.
  *    2023): per-doc mean ratio of target-distribution to corpus
  *    unigram probability, target = the held-out eval split;
  *  - `mix_temperature` — temperature-scaled source shares (the
  *    XLM-R/mT5 α-rebalancing that upsamples rare sources toward
  *    uniform); α = 0.5, i.e. sqrt scaling, so the only float op is
  *    IEEE-correctly-rounded sqrt and the micro-quantized weights
  *    stay integer-exact ⇒ oracle-exact;
  *  - `span_topk` — most-repeated 8-token spans corpus-wide (the
  *    boilerplate census that seeds span-level dedup rules);
  *  - `blocklist_filter` — per-source keep/block counts against a term
  *    blocklist (row-local array intersect, no join).
  *
  * All oracle-checked; ppm integer arithmetic throughout (tranche
  * discipline — bit-identical across engines, order-independent).
  *
  * Scale notes (100 TB): the plan/census is a partial-agg group-by
  * whose output is O(sources) — broadcast back for the apply step, so
  * sampling is a map-side filter over the corpus (composes with scan
  * pushdown; no corpus shuffle). DSIR's model is O(vocab) pairs built
  * with partial aggs; the per-doc scoring joins the exploded corpus to
  * the model on the token key — at real vocab sizes the model side
  * still broadcasts. span_topk is explode → partial-agg → TakeOrdered
  * (no full sort).
  */
object TrainingOps2 {
  type Q = (SparkSession, String) => DataFrame

  private val blocked = Seq("merge", "vector")

  /** Same eval split as TrainingOps decontamination: ~5% of docs. */
  private def isEval = col("doc_id") % 100 < 5

  /** Per-source token counts + uniform-budget keep rate (ppm). */
  private def mixPlan(s: SparkSession, d: String): DataFrame = {
    val tok = Tables.documents(s, d)
      .select(col("source"), size(split(col("text"), " ", -1)).cast("long").as("n"))
      .groupBy("source").agg(sum("n").as("n_tok"))
    // O(sources) rows: the window-total here is over a dim-sized frame,
    // never the corpus
    val total = tok.agg(sum("n_tok").as("t"), count(lit(1)).as("k"))
    tok.crossJoin(broadcast(total))
      .withColumn("budget", expr("t div k"))
      .withColumn("rate_ppm", least(lit(1000000L), expr("budget * 1000000 div n_tok")))
      .select("source", "n_tok", "budget", "rate_ppm")
  }

  val queries: Map[String, Q] = Map(
    "source_mix_plan" -> ((s, d) => mixPlan(s, d).orderBy("source")),

    // apply the plan: keep a doc when its 4-hex-char md5 prefix falls
    // under the source's rate threshold. String-compare of fixed-width
    // lowercase hex == integer compare, and both engines print %04x
    // identically — deterministic, partition-independent sampling.
    "sample_mixture" -> ((s, d) => {
      val plan = mixPlan(s, d)
        .withColumn("cap", format_string("%04x", expr("rate_ppm * 65536 div 1000000")))
        .select("source", "budget", "cap")
      Tables.documents(s, d)
        .select(col("doc_id"), col("source"),
          size(split(col("text"), " ", -1)).cast("long").as("n"),
          substring(md5(col("text").cast("binary")), 1, 4).as("h"))
        .join(broadcast(plan), "source")
        .filter(col("h") < col("cap"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_docs"), sum("n").as("n_tokens"),
          max("budget").as("budget"))
        .orderBy("source")
    }),

    // DSIR-style selection weights: mean over a doc's tokens of
    // p_target(w) / p_corpus(w), as a ppm ratio of ppm probabilities.
    // Unseen-in-target tokens contribute 0 (ratio of a 0 numerator);
    // min/max per doc expose the outlier tokens.
    "dsir_weights" -> ((s, d) => {
      val docs = Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
      // tok feeds the corpus census, the target census AND the final
      // scoring join — one materialized explode instead of three
      // (multi-branch rule)
      val tok = docs.select(col("doc_id"), explode(split(col("text"), " ", -1)).as("t"))
        .localCheckpoint(true)
      val corpus = tok.groupBy("t").agg(count(lit(1)).as("c_all"))
      val target = tok.filter(isEval).groupBy("t").agg(count(lit(1)).as("c_tgt"))
      val totals = corpus.agg(sum("c_all").as("n_all"))
        .crossJoin(target.agg(sum("c_tgt").as("n_tgt")))
      val model = corpus.join(target, Seq("t"), "left")
        .crossJoin(broadcast(totals))
        .select(col("t"),
          expr("coalesce(c_tgt, 0) * 1000000 div n_tgt").as("p_tgt_ppm"),
          expr("c_all * 1000000 div n_all").as("p_all_ppm"))
        .select(col("t"),
          expr("p_tgt_ppm * 1000000 div greatest(p_all_ppm, 1)").as("ratio_ppm"))
      tok.join(model, "t")
        .groupBy("doc_id")
        .agg(expr("sum(ratio_ppm) div count(1)").as("mean_ratio_ppm"),
          min("ratio_ppm").as("min_ratio_ppm"),
          max("ratio_ppm").as("max_ratio_ppm"))
        .orderBy("doc_id")
    }),

    // temperature-rebalanced source shares: w_i = sqrt(n_i) (α = 0.5),
    // micro-quantized to integer units so the normalization is exact
    // integer division — nat_ppm vs temp_ppm shows the upsampling of
    // rare sources, exp_docs is the per-source allocation of a 10k-doc
    // training budget under the rebalanced mixture. O(sources) rows;
    // the census is one partial-agg group-by, the total a broadcast.
    "mix_temperature" -> ((s, d) => {
      val perSrc = Tables.documents(s, d)
        .groupBy("source").agg(count(lit(1)).as("n_docs"))
        .withColumn("wq", expr("cast(floor(sqrt(cast(n_docs as double)) * 1000000) as bigint)"))
      val total = perSrc.agg(sum("n_docs").as("n_all"), sum("wq").as("w_all"))
      perSrc.crossJoin(broadcast(total))
        .select(col("source"), col("n_docs"),
          expr("n_docs * 1000000 div n_all").as("nat_ppm"),
          expr("wq * 1000000 div w_all").as("temp_ppm"),
          expr("wq * 10000 div w_all").as("exp_docs"))
        .orderBy("source")
    }),

    // boilerplate census: the 8-token spans repeated most across the
    // corpus (occurrences + distinct docs). TakeOrdered top-k — tie
    // break on the span text keeps the limit deterministic.
    "span_topk" -> ((s, d) =>
      Tables.documents(s, d)
        .repartition(s.sparkContext.defaultParallelism)
        .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
        .filter(size(col("w")) >= 8)
        .select(col("doc_id"), explode(expr(
          "transform(sequence(1, size(w) - 7), i -> concat_ws(' ', slice(w, i, 8)))")).as("g"))
        .groupBy("g")
        .agg(count(lit(1)).as("n_occ"), countDistinct(col("doc_id")).as("n_docs"))
        .orderBy(col("n_occ").desc, col("g"))
        .limit(25)),

    // term-blocklist audit: how much of each source a blocklist kills.
    // Row-local arrays_overlap — a pure map + dim-sized agg; the
    // blocklist rides the plan as a literal array (same shape as a
    // broadcast dim at real blocklist sizes).
    "blocklist_filter" -> ((s, d) =>
      Tables.documents(s, d)
        .select(col("source"),
          arrays_overlap(split(col("text"), " ", -1),
            array(blocked.map(lit): _*)).as("hit"))
        .groupBy("source")
        .agg(count(lit(1)).as("n_total"),
          sum(when(col("hit"), 1L).otherwise(0L)).as("n_blocked"),
          sum(when(col("hit"), 0L).otherwise(1L)).as("n_kept"))
        .orderBy("source"))
  )

  val oracles: Map[String, String] = Map(
    "source_mix_plan" ->
      """WITH tok AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t, count(*) AS k FROM tok)
        |SELECT source, n_tok, t // k AS budget,
        |       least(1000000, (t // k) * 1000000 // n_tok) AS rate_ppm
        |FROM tok, tot ORDER BY source""".stripMargin,

    "mix_temperature" ->
      """WITH src AS (
        |  SELECT source, CAST(count(1) AS BIGINT) AS n_docs,
        |         CAST(floor(sqrt(CAST(count(1) AS DOUBLE)) * 1000000) AS BIGINT) AS wq
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
        |               CAST(sum(wq) AS BIGINT) AS w_all FROM src)
        |SELECT source, n_docs,
        |       n_docs * 1000000 // n_all AS nat_ppm,
        |       wq * 1000000 // w_all AS temp_ppm,
        |       wq * 10000 // w_all AS exp_docs
        |FROM src, tot ORDER BY source""".stripMargin,

    "sample_mixture" ->
      """WITH tok AS (
        |  SELECT source, CAST(sum(len(string_split(text, ' '))) AS BIGINT) AS n_tok
        |  FROM documents GROUP BY source),
        |tot AS (SELECT CAST(sum(n_tok) AS BIGINT) AS t, count(*) AS k FROM tok),
        |plan AS (
        |  SELECT source, t // k AS budget,
        |         printf('%04x', least(1000000, (t // k) * 1000000 // n_tok)
        |                        * 65536 // 1000000) AS cap
        |  FROM tok, tot)
        |SELECT d.source, count(*) AS n_docs,
        |       CAST(sum(len(string_split(d.text, ' '))) AS BIGINT) AS n_tokens,
        |       max(p.budget) AS budget
        |FROM documents d JOIN plan p ON d.source = p.source
        |WHERE substr(md5(d.text), 1, 4) < p.cap
        |GROUP BY d.source ORDER BY d.source""".stripMargin,

    "dsir_weights" ->
      """WITH tok AS (
        |  SELECT doc_id, unnest(string_split(text, ' ')) AS t FROM documents),
        |corpus AS (SELECT t, count(*) AS c_all FROM tok GROUP BY t),
        |target AS (SELECT t, count(*) AS c_tgt FROM tok WHERE doc_id % 100 < 5 GROUP BY t),
        |tot AS (SELECT (SELECT CAST(sum(c_all) AS BIGINT) FROM corpus) AS n_all,
        |               (SELECT CAST(sum(c_tgt) AS BIGINT) FROM target) AS n_tgt),
        |model AS (
        |  SELECT corpus.t,
        |         (COALESCE(c_tgt, 0) * 1000000 // n_tgt) * 1000000
        |           // greatest(c_all * 1000000 // n_all, 1) AS ratio_ppm
        |  FROM corpus LEFT JOIN target ON corpus.t = target.t, tot)
        |SELECT doc_id,
        |       CAST(sum(ratio_ppm) AS BIGINT) // count(*) AS mean_ratio_ppm,
        |       min(ratio_ppm) AS min_ratio_ppm,
        |       max(ratio_ppm) AS max_ratio_ppm
        |FROM tok JOIN model ON tok.t = model.t
        |GROUP BY doc_id ORDER BY doc_id""".stripMargin,

    "span_topk" ->
      """WITH w AS (
        |  SELECT doc_id, string_split(text, ' ') AS w FROM documents
        |  WHERE len(string_split(text, ' ')) >= 8),
        |g AS (SELECT doc_id, array_to_string(w[i:i+7], ' ') AS g
        |      FROM (SELECT doc_id, w, unnest(range(1, len(w) - 6)) AS i FROM w))
        |SELECT g, count(*) AS n_occ, count(DISTINCT doc_id) AS n_docs
        |FROM g GROUP BY g ORDER BY n_occ DESC, g LIMIT 25""".stripMargin,

    "blocklist_filter" ->
      """WITH d AS (
        |  SELECT source,
        |         len(list_intersect(string_split(text, ' '),
        |                            ['merge', 'vector'])) > 0 AS hit
        |  FROM documents)
        |SELECT source, count(*) AS n_total,
        |       CAST(sum(CASE WHEN hit THEN 1 ELSE 0 END) AS BIGINT) AS n_blocked,
        |       CAST(sum(CASE WHEN hit THEN 0 ELSE 1 END) AS BIGINT) AS n_kept
        |FROM d GROUP BY source ORDER BY source""".stripMargin
  )
}
