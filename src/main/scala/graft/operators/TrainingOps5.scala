package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-8 curation tranche: the three pipeline steps between the
  * existing census ops and the training-set write.
  *
  *  - `decontaminate_semantic` — embedding-space decontamination
  *    (the fourth leg after exact / n-gram / bloom): max cosine of
  *    every train vector against the held-out eval split, flagged at
  *    τ = [[SemanticTau]]. The eval membership rule (vec_id % 20 = 0)
  *    mirrors the split used by `dsir_weights`.
  *  - `boilerplate_mask` — applies the repeated-span census that
  *    `span_topk` only reports: token positions covered by any 3-gram
  *    appearing in ≥ [[BoilerDfMin]] distinct docs are masked
  *    (RefinedWeb-style boilerplate removal), and the op emits the
  *    per-doc masked/kept token accounting an audit needs.
  *  - `doc_quality_classifier` — the GPT-3-style learned quality
  *    filter: logistic regression on hashed bag-of-words features,
  *    trained against the rule label `corpus_clean_pipeline` already
  *    computes, scoring every doc. No SQL oracle (iterative ML);
  *    QualityClassifierSpec pins determinism + separation.
  *
  * Scale notes (100 TB):
  *  - the eval split is tiny by construction → broadcast; the corpus
  *    is scanned once and the per-vector argmax is a map-side
  *    max(struct) partial agg — no pair shuffle, no window;
  *    quantized integer dots (floor(x·1000), codegen `dot_i64`) make
  *    the result partition-order-independent and oracle-exact;
  *  - boilerplate df + mask both key the shuffle on the gram; mask
  *    join output is Σ df over boiler grams ≤ total gram occurrences
  *    (linear in corpus size — no pairing, so no df cap needed); the
  *    masked count is a row-local interval-union fold over each doc's
  *    sorted hit positions — no position explode, no dedup exchange;
  *  - the classifier's train side is one treeAggregate pass per LBFGS
  *    iteration over hashed sparse vectors (feature dim 4096, fixed);
  *    scoring is a row-local map — at real scale the model trains on
  *    a rule-labeled sample and only scoring touches the full corpus.
  */
object TrainingOps5 {
  type Q = (SparkSession, String) => DataFrame

  /** Cosine floor for "semantically contaminated by the eval set". */
  val SemanticTau = 0.30
  /** A 3-gram in ≥ this many distinct docs is boilerplate. */
  val BoilerDfMin = 5L

  /** Rule label shared with `corpus_clean_pipeline`'s quality_ok. */
  private def ruleLabel(docs: DataFrame): DataFrame =
    docs
      .withColumn("tokens", size(split(col("text"), " ", -1)).cast("long"))
      .withColumn("stop_hits",
        expr("(length(text) - length(replace(text, ' the ', ''))) div 5"))
      .withColumn("label",
        (col("tokens") >= 20 && col("stop_hits") >= 1).cast("double"))

  val queries: Map[String, Q] = Map(
    "decontaminate_semantic" -> ((s, d) => {
      graft.functions.VectorFunctions.registerAll(s)
      val q = DedupOps.quantized(Tables.embeddings(s, d))
      val eval = q.filter(col("vec_id") % 20 === 0)
        .select(col("vec_id").as("eval_id"), col("q").as("qe"), col("n").as("ne"))
      // max(struct) = argmax with the oracle's tie-break (higher sim,
      // then LOWER eval id via the negated second field) — partial-agg
      // friendly, so the N×|eval| sim rows never leave the map side
      q.filter(col("vec_id") % 20 =!= 0)
        .crossJoin(broadcast(eval))
        .select(col("vec_id"),
          struct(
            (graft.functions.VectorFunctions.dot_i64(col("q"), col("qe")).cast("double") /
              sqrt((col("n") * col("ne")).cast("double"))).as("sim"),
            (-col("eval_id")).as("negEval")).as("cand"))
        .groupBy("vec_id").agg(max(col("cand")).as("best"))
        .select(col("vec_id"),
          col("best.sim").as("max_sim"),
          (-col("best.negEval")).as("nearest_eval"),
          (col("best.sim") >= SemanticTau).as("contaminated"))
        .orderBy("vec_id")
    }),

    "boilerplate_mask" -> ((s, d) => {
      // tokenize+posexplode is the CPU-heavy stage: widen the narrow
      // (doc_id, text) projection so it isn't pinned to the scan's
      // split count (no-op at real scale); both consumers (gram census
      // and the n_tokens leg) reuse the same exchange
      val toks = Widen(Tables.documents(s, d).select("doc_id", "text"))
        .select(col("doc_id"), split(col("text"), " ", -1).as("w"))
      // positional grams (NOT the distinct shingle set — masking needs
      // every occurrence's position); same gram definition as the
      // dedup tranche via DedupOps.gramArrayExpr
      // grams feed BOTH the boilerplate census and the mask join —
      // checkpoint the positional explode once (multi-branch rule)
      val grams = toks.filter(size(col("w")) >= 3)
        .select(col("doc_id"),
          posexplode(expr(DedupOps.gramArrayExpr)).as(Seq("pos", "g")))
        .localCheckpoint(true)
      val boiler = grams.groupBy("g")
        .agg(countDistinct(col("doc_id")).as("df"))
        .filter(col("df") >= BoilerDfMin)
        .select("g")
      // masked token count = |union of [pos, pos+2] windows| per doc.
      // The former explode(sequence)+distinct shuffled 3× the hit rows
      // and paid a full dedup exchange; the interval-union instead
      // folds row-locally over each doc's SORTED hit positions (the
      // substring_dup_rate discipline): each window adds
      // pos+2 − greatest(covered_end, pos−1) newly-covered tokens.
      // One hit row per (doc, boiler-gram occurrence) reaches the
      // doc-keyed collect; nothing explodes.
      val masked = grams.join(boiler, "g")
        .groupBy("doc_id")
        .agg(sort_array(collect_list(col("pos").cast("long"))).as("ps"))
        .select(col("doc_id"), expr(
          """aggregate(ps,
            |  struct(CAST(0 AS BIGINT) AS cov, CAST(-1 AS BIGINT) AS e),
            |  (acc, p) -> struct(acc.cov + p + 2 - greatest(acc.e, p - 1),
            |                     p + 2),
            |  acc -> acc.cov)""".stripMargin).as("masked_tokens"))
      toks.select(col("doc_id"), size(col("w")).cast("long").as("n_tokens"))
        .join(masked, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_tokens"),
          coalesce(col("masked_tokens"), lit(0L)).as("masked_tokens"),
          (col("n_tokens") - coalesce(col("masked_tokens"), lit(0L)))
            .as("kept_tokens"))
        .orderBy("doc_id")
    }),

    "doc_quality_classifier" -> ((s, d) => {
      import org.apache.spark.ml.classification.LogisticRegression
      import org.apache.spark.ml.feature.HashingTF
      import org.apache.spark.ml.functions.vector_to_array
      val docs = ruleLabel(Tables.documents(s, d))
        .select(col("doc_id"), split(col("text"), " ", -1).as("words"),
          col("label"))
      val feat = new HashingTF()
        .setInputCol("words").setOutputCol("features")
        .setNumFeatures(1 << 12)
        .transform(docs)
      val model = new LogisticRegression()
        .setMaxIter(25).setRegParam(0.01).setStandardization(false)
        .fit(feat)
      model.transform(feat)
        .select(col("doc_id"), col("label").cast("int").as("rule_label"),
          element_at(vector_to_array(col("probability")), 2).as("p_quality"))
        .orderBy("doc_id")
    })
  )

  val oracles: Map[String, String] = Map(
    "decontaminate_semantic" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sum(x * x) AS n FROM e GROUP BY vec_id),
        |dots AS (SELECT t.vec_id AS v, q.vec_id AS ev, sum(t.x * q.x) AS dot
        |         FROM e t JOIN e q ON t.i = q.i
        |         WHERE t.vec_id % 20 <> 0 AND q.vec_id % 20 = 0
        |         GROUP BY 1, 2),
        |sims AS (SELECT v, ev,
        |                CAST(dot AS DOUBLE)
        |                  / sqrt(CAST(nt.n * ne.n AS DOUBLE)) AS sim
        |         FROM dots
        |         JOIN norms nt ON nt.vec_id = v
        |         JOIN norms ne ON ne.vec_id = ev),
        |best AS (SELECT v, ev, sim,
        |                row_number() OVER (PARTITION BY v
        |                                   ORDER BY sim DESC, ev) AS rn
        |         FROM sims)
        |SELECT v AS vec_id, sim AS max_sim, ev AS nearest_eval,
        |       sim >= 0.30 AS contaminated
        |FROM best WHERE rn = 1 ORDER BY vec_id""".stripMargin,

    "boilerplate_mask" ->
      """WITH toks AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
        |sh AS (SELECT doc_id, i, array_to_string(w[i:i+2], ' ') AS g
        |       FROM (SELECT doc_id, w, unnest(range(1, len(w) - 1)) AS i FROM toks)),
        |boiler AS (SELECT g FROM sh GROUP BY g
        |           HAVING count(DISTINCT doc_id) >= 5),
        |mask AS (SELECT DISTINCT sh.doc_id, u.p
        |         FROM sh JOIN boiler USING (g),
        |              unnest(range(sh.i, sh.i + 3)) AS u(p)),
        |m AS (SELECT doc_id, count(*) AS masked_tokens FROM mask GROUP BY doc_id)
        |SELECT t.doc_id, len(t.w) AS n_tokens,
        |       coalesce(m.masked_tokens, 0) AS masked_tokens,
        |       len(t.w) - coalesce(m.masked_tokens, 0) AS kept_tokens
        |FROM toks t LEFT JOIN m ON m.doc_id = t.doc_id
        |ORDER BY t.doc_id""".stripMargin
  )
}
