package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Retrieval-quality evaluation over the embeddings table — the
  * metrics a retrieval/curation pipeline runs to grade its ANN indexes
  * and rerankers against ground truth (here: label agreement, the
  * standard proxy when no human judgments exist).
  *
  *  - `eval_recall_at_k` — per-query recall@10 of exact cosine search:
  *    of the query's same-label vectors (capped at k), how many appear
  *    in its top-10;
  *  - `eval_ndcg_at_k` — per-query DCG/IDCG with binary gain and the
  *    standard log2(rank+1) discount;
  *  - `eval_mrr_at_k` — corpus-level mean reciprocal rank of the first
  *    same-label neighbor within the top-10 (0 beyond the cutoff).
  *
  * Cross-engine exactness discipline (the twap_user/unigram_tv_drift
  * pattern): every ranking quantity is exact integer math until one
  * final IEEE primitive. Dot products and norms ride the established
  * floor(x·1000) int64 quantization; cosine is one divide + one sqrt
  * of exact ints (bit-stable in both engines); DCG's log2 discounts
  * are pre-scaled by 2^20 into integer weights W(r) =
  * round(2^20/log2(r+1)) — the SAME ten integer constants appear in
  * the Spark expression and the oracle SQL, so the sums are exact
  * longs and ndcg/mrr are single divides of exact integers. (Computing
  * log2 at runtime would be 1-ulp unstable across libm
  * implementations; baking the constants removes the transcendental
  * from the hash entirely while keeping the genuine logarithmic
  * discount.) MRR uses LCM(1..10)=2520 so 2520/rank is exact.
  *
  * Scale notes (100 TB):
  *  - the query set is a FIXED-cardinality sample (16 lowest vec_ids
  *    with vec_id ≡ 3 (mod 7)) — eval cost is 16·N at every corpus
  *    size, never N²; growing the corpus 10× grows this 10×, linear;
  *  - queries broadcast (16 rows of 64-d int64 arrays); the scan side
  *    computes 16 codegen'd dot products per vector and shuffles only
  *    the per-query candidates into the rank window — 16 partitions of
  *    at most N rows, the same bound as the registry's knn shapes. At
  *    real scale the candidate generator would be the IVF/SRP index
  *    (ann_ivf_probe / ann_lsh); these metrics GRADE those indexes, so
  *    the exact leg is the ground-truth pass you run on a sampled
  *    slice, not the whole corpus;
  *  - the label census (n_rel denominators) is one partial-aggregated
  *    groupBy at label cardinality, broadcast back to 16 rows.
  */
object RetrievalOps2 {
  type Q = (SparkSession, String) => DataFrame

  /** Cutoff depth for all three metrics. */
  val K = 10

  /** Fixed query-sample size (scale-invariant eval cost). */
  val NQueries = 16

  /** Integer DCG discounts: W(r) = round(2^20 / log2(r+1)), r=1..10.
    * Exact same constants in the oracle SQL — no runtime log2. */
  val DcgW: Seq[Long] = Seq(
    1048576L, // r=1: 2^20/1
    661578L,  // r=2: 2^20/log2(3)
    524288L,  // r=3: 2^20/2
    451597L,  // r=4: 2^20/log2(5)
    405645L,  // r=5
    373510L,  // r=6
    349525L,  // r=7: 2^20/3
    330789L,  // r=8
    315653L,  // r=9
    303106L)  // r=10: 2^20/log2(11)

  /** Ideal-DCG prefix sums of DcgW: IDCG(m) = Σ_{r≤m} W(r). */
  val IdcgPrefix: Seq[Long] = DcgW.scanLeft(0L)(_ + _).tail

  /** MRR scale: LCM(1..10), so 2520/rank is an exact integer. */
  val MrrScale = 2520L

  /** Matryoshka prefix length for `emb_matryoshka_audit`. */
  val TruncDims = 16

  /** Exact top-K neighbors for the 16 fixed query vectors:
    * (qid, qlabel, vec_id, label, sim, rn) with rn ≤ K.
    * Quantized int64 cosine — identical math to ann_topk.
    * `dims` truncates every vector to its first m coordinates (the
    * Matryoshka read path; zero-norm prefixes are filtered so no NaN
    * enters the ordering). */
  private def rankedTopKDims(s: SparkSession, d: String,
                             dims: Option[Int]): DataFrame = {
    graft.functions.VectorFunctions.registerAll(s)
    val emb = Tables.embeddings(s, d)
    // same floor(x·1000) math as DedupOps.quantized, computed in the
    // scan projection with `label` carried along — the former
    // quantized(emb) ⋈ emb self-join re-scanned the corpus just to
    // re-attach a column the first scan already had (one scan + one
    // join removed from every eval_*/ann_eval_* plan; values identical
    // expression-for-expression, so oracle hashes are untouched)
    val q0 = emb.select(col("vec_id"), col("label"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))").as("q"))
      .withColumn("n", expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
    val q = dims match {
      case None => q0
      case Some(m) => q0
        .withColumn("q", expr(s"slice(q, 1, $m)"))
        .withColumn("n", expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)"))
        .filter(col("n") > 0)
    }
    val queries = broadcast(
      q.filter(col("vec_id") % 7 === 3).orderBy("vec_id").limit(NQueries)
        .select(col("vec_id").as("qid"), col("q").as("qq"),
          col("n").as("nq"), col("label").as("qlabel")))
    q.crossJoin(queries)
      .filter(col("vec_id") =!= col("qid"))
      // candidate-side NaN guard (redundant under dims=Some, which
      // already filters): a zero-quantized candidate scores 0/0 = NaN
      // and Spark orders NaN above every real double, so it would top
      // EVERY query's exact ranking — and the ANN legs (which carry
      // the same guard) could then never match the exact top-10,
      // silently capping every recall row below 1.0. Query selection
      // and the label census stay unguarded so both legs and the
      // DuckDB oracle keep identical query sets and denominators.
      .filter(col("n") > 0)
      .withColumn("dot",
        graft.functions.VectorFunctions.dot_i64(col("q"), col("qq")))
      .withColumn("sim", col("dot") / sqrt((col("n") * col("nq")).cast("double")))
      .select("qid", "qlabel", "vec_id", "label", "sim")
      .withColumn("rn", row_number().over(
        Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))))
      .filter(col("rn") <= K)
  }

  private[operators] def rankedTopK(s: SparkSession, d: String): DataFrame =
    rankedTopKDims(s, d, None)

  /** Per-query same-label population (recall/ndcg denominators):
    * (qid, n_rel) with n_rel = |{v ≠ q : label(v) = label(q)}|. */
  private def relCounts(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val census = emb.groupBy(col("label").as("clabel"))
      .agg(count(lit(1)).as("n_label"))
    emb.filter(col("vec_id") % 7 === 3).orderBy("vec_id").limit(NQueries)
      .select(col("vec_id").as("qid"), col("label").as("qlabel"))
      .join(broadcast(census), col("qlabel") === col("clabel"))
      .select(col("qid"), (col("n_label") - 1).as("n_rel"))
  }

  private[operators] def dcgWeight(rnCol: org.apache.spark.sql.Column) =
    DcgW.zipWithIndex.foldLeft(lit(0L)) { case (acc, (w, i)) =>
      when(rnCol === (i + 1), lit(w)).otherwise(acc)
    }

  private def idcgOf(mCol: org.apache.spark.sql.Column) =
    IdcgPrefix.zipWithIndex.foldLeft(lit(0L)) { case (acc, (ps, i)) =>
      when(mCol === (i + 1), lit(ps)).otherwise(acc)
    }

  val queries: Map[String, Q] = Map(
    // recall@10 with label-match relevance, per query vector
    "eval_recall_at_k" -> ((s, d) => {
      val hits = rankedTopK(s, d)
        .groupBy("qid")
        .agg(count(when(col("label") === col("qlabel"), 1)).as("hits"))
      relCounts(s, d).join(hits, Seq("qid"))
        .select(col("qid"), col("hits"),
          least(col("n_rel"), lit(K.toLong)).as("n_rel_cap"),
          (col("hits").cast("double") /
            least(col("n_rel"), lit(K.toLong)).cast("double")).as("recall"))
        .orderBy("qid")
    }),

    // NDCG@10, binary gain, integer-scaled log2 discount
    "eval_ndcg_at_k" -> ((s, d) => {
      val dcg = rankedTopK(s, d)
        .groupBy("qid")
        .agg(sum(when(col("label") === col("qlabel"), dcgWeight(col("rn")))
          .otherwise(lit(0L))).as("dcg_s"))
      relCounts(s, d).join(dcg, Seq("qid"))
        .select(col("qid"), col("dcg_s"),
          idcgOf(least(col("n_rel"), lit(K.toLong))).as("idcg_s"))
        .withColumn("ndcg",
          when(col("idcg_s") > 0,
            col("dcg_s").cast("double") / col("idcg_s").cast("double"))
            .otherwise(lit(0.0)))
        .orderBy("qid")
    }),

    // MAP@10: per-query average precision with exact rational
    // arithmetic — precision@r = hits_so_far/r scales by LCM(1..10) =
    // 2520 to an exact integer, AP's normalizer min(n_rel, 10) folds
    // into the single final divide
    "eval_map_at_k" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("qid").orderBy("rn")
      val ap = rankedTopK(s, d)
        .withColumn("hits_at_r",
          sum(when(col("label") === col("qlabel"), 1L).otherwise(0L)).over(w))
        .filter(col("label") === col("qlabel"))
        .groupBy("qid")
        .agg(sum(expr(s"${MrrScale} * hits_at_r div rn")).as("ap_s"))
      relCounts(s, d)
        .join(ap, Seq("qid"), "left")
        .select(col("qid"),
          coalesce(col("ap_s"), lit(0L)).as("ap_s"),
          least(col("n_rel"), lit(K.toLong)).as("n_rel_cap"))
        .withColumn("ap", col("ap_s").cast("double") /
          (lit(MrrScale.toDouble) * least(col("n_rel_cap"), lit(K.toLong)).cast("double")))
        .orderBy("qid")
    }),

    // Matryoshka truncation audit: how much of the full-dimension
    // top-10 survives when ranking by only the first TruncDims
    // coordinates (the MRL cheap-read path). overlap ∈ 0..10 per
    // query; jaccard@10 = overlap/(2K − overlap), one exact divide.
    "emb_matryoshka_audit" -> ((s, d) => {
      val full = rankedTopK(s, d).select(col("qid"), col("vec_id"))
      val trunc = rankedTopKDims(s, d, Some(TruncDims))
        .select(col("qid").as("tq"), col("vec_id").as("tv"))
      val overlap = full
        .join(trunc, col("qid") === col("tq") && col("vec_id") === col("tv"))
        .groupBy("qid").agg(count(lit(1)).as("overlap"))
      relCounts(s, d).select("qid")
        .join(overlap, Seq("qid"), "left")
        .select(col("qid"), coalesce(col("overlap"), lit(0L)).as("overlap"))
        .withColumn("jaccard", col("overlap").cast("double") /
          (lit(2L * K) - col("overlap")).cast("double"))
        .orderBy("qid")
    }),

    // corpus-level MRR@10: reciprocal rank of the first same-label
    // neighbor, 0 when none lands in the top-10
    "eval_mrr_at_k" -> ((s, d) => {
      val firstRel = rankedTopK(s, d)
        .filter(col("label") === col("qlabel"))
        .groupBy("qid").agg(min(col("rn")).as("minr"))
      relCounts(s, d)
        .join(firstRel, Seq("qid"), "left")
        .select(coalesce(expr(s"$MrrScale div minr"), lit(0L)).as("rr_s"))
        .agg(count(lit(1)).as("n_queries"),
          sum(col("rr_s")).as("rr_sum_scaled"))
        .withColumn("mrr", col("rr_sum_scaled").cast("double") /
          (lit(MrrScale.toDouble) * col("n_queries").cast("double")))
    })
  )

  /** Shared oracle CTE prefix: quantized elements, norms, the 16-query
    * sample, exact int64 dots, and the cosine-ranked top-10. */
  private val RankedCte =
    """WITH e AS (
      |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
      |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS x
      |  FROM embeddings),
      |norms AS (
      |  SELECT vec_id, any_value(label) AS label, sum(x * x) AS n
      |  FROM e GROUP BY vec_id),
      |qs AS (
      |  SELECT vec_id AS qid, label AS qlabel, n AS nq
      |  FROM norms WHERE vec_id % 7 = 3 ORDER BY vec_id LIMIT 16),
      |dots AS (
      |  SELECT qe.qid, qe.qlabel, qe.nq, e.vec_id, sum(e.x * qe.x) AS dot
      |  FROM e
      |  JOIN (SELECT qs.qid, qs.qlabel, qs.nq, eq.i, eq.x
      |        FROM qs JOIN e eq ON eq.vec_id = qs.qid) qe
      |    ON e.i = qe.i AND e.vec_id <> qe.qid
      |  GROUP BY qe.qid, qe.qlabel, qe.nq, e.vec_id),
      |ranked AS (
      |  SELECT d.qid, d.qlabel, d.vec_id, nm.label,
      |         CAST(d.dot AS DOUBLE) / sqrt(CAST(nm.n * d.nq AS DOUBLE)) AS sim,
      |         row_number() OVER (
      |           PARTITION BY d.qid
      |           ORDER BY CAST(d.dot AS DOUBLE)
      |                    / sqrt(CAST(nm.n * d.nq AS DOUBLE)) DESC, d.vec_id)
      |           AS rn
      |  FROM dots d JOIN norms nm ON d.vec_id = nm.vec_id AND nm.n > 0),
      |topk AS (SELECT * FROM ranked WHERE rn <= 10),
      |census AS (SELECT label, count(*) AS n_label FROM norms GROUP BY label),
      |rel AS (
      |  SELECT qs.qid, c.n_label - 1 AS n_rel
      |  FROM qs JOIN census c ON qs.qlabel = c.label)""".stripMargin

  private val DcgCaseSql = DcgW.zipWithIndex
    .map { case (w, i) => s"WHEN ${i + 1} THEN $w" }
    .mkString("CASE rn ", " ", " ELSE 0 END")

  private val IdcgCaseSql = IdcgPrefix.zipWithIndex
    .map { case (ps, i) => s"WHEN ${i + 1} THEN $ps" }
    .mkString("CASE least(n_rel, 10) ", " ", " ELSE 0 END")

  val oracles: Map[String, String] = Map(
    "eval_recall_at_k" ->
      s"""$RankedCte,
         |hits AS (
         |  SELECT qid, count(CASE WHEN label = qlabel THEN 1 END) AS hits
         |  FROM topk GROUP BY qid)
         |SELECT r.qid, h.hits,
         |       least(r.n_rel, 10) AS n_rel_cap,
         |       CAST(h.hits AS DOUBLE)
         |         / CAST(least(r.n_rel, 10) AS DOUBLE) AS recall
         |FROM rel r JOIN hits h ON r.qid = h.qid
         |ORDER BY r.qid""".stripMargin,

    "eval_ndcg_at_k" ->
      s"""$RankedCte,
         |dcg AS (
         |  SELECT qid,
         |         CAST(sum(CASE WHEN label = qlabel
         |                       THEN $DcgCaseSql ELSE 0 END) AS BIGINT) AS dcg_s
         |  FROM topk GROUP BY qid)
         |SELECT r.qid, d.dcg_s,
         |       CAST($IdcgCaseSql AS BIGINT) AS idcg_s,
         |       CASE WHEN $IdcgCaseSql > 0
         |            THEN CAST(d.dcg_s AS DOUBLE)
         |                 / CAST($IdcgCaseSql AS DOUBLE)
         |            ELSE 0.0 END AS ndcg
         |FROM rel r JOIN dcg d ON r.qid = d.qid
         |ORDER BY r.qid""".stripMargin,

    "eval_map_at_k" ->
      s"""$RankedCte,
         |hitsat AS (
         |  SELECT qid, rn, label, qlabel,
         |         sum(CASE WHEN label = qlabel THEN 1 ELSE 0 END)
         |           OVER (PARTITION BY qid ORDER BY rn) AS hits_at_r
         |  FROM topk),
         |ap AS (
         |  SELECT qid, CAST(sum(2520 * hits_at_r // rn) AS BIGINT) AS ap_s
         |  FROM hitsat WHERE label = qlabel GROUP BY qid)
         |SELECT r.qid,
         |       COALESCE(a.ap_s, 0) AS ap_s,
         |       least(r.n_rel, 10) AS n_rel_cap,
         |       CAST(COALESCE(a.ap_s, 0) AS DOUBLE)
         |         / (2520.0 * least(r.n_rel, 10)) AS ap
         |FROM rel r LEFT JOIN ap a ON r.qid = a.qid
         |ORDER BY r.qid""".stripMargin,

    "emb_matryoshka_audit" ->
      s"""$RankedCte,
         |e16 AS (SELECT vec_id, i, x FROM e WHERE i <= $TruncDims),
         |norms16 AS (
         |  SELECT vec_id, sum(x * x) AS n FROM e16 GROUP BY vec_id
         |  HAVING sum(x * x) > 0),
         |qs16 AS (
         |  SELECT n16.vec_id AS qid, n16.n AS nq
         |  FROM norms16 n16
         |  WHERE n16.vec_id % 7 = 3 ORDER BY n16.vec_id LIMIT 16),
         |dots16 AS (
         |  SELECT qe.qid, qe.nq, e.vec_id, sum(e.x * qe.x) AS dot
         |  FROM e16 e
         |  JOIN norms16 cn ON e.vec_id = cn.vec_id
         |  JOIN (SELECT q16.qid, q16.nq, eq.i, eq.x
         |        FROM qs16 q16 JOIN e16 eq ON eq.vec_id = q16.qid) qe
         |    ON e.i = qe.i AND e.vec_id <> qe.qid
         |  GROUP BY qe.qid, qe.nq, e.vec_id),
         |ranked16 AS (
         |  SELECT d.qid, d.vec_id,
         |         row_number() OVER (
         |           PARTITION BY d.qid
         |           ORDER BY CAST(d.dot AS DOUBLE)
         |                    / sqrt(CAST(nm.n * d.nq AS DOUBLE)) DESC, d.vec_id)
         |           AS rn
         |  FROM dots16 d JOIN norms16 nm ON d.vec_id = nm.vec_id),
         |topk16 AS (SELECT qid, vec_id FROM ranked16 WHERE rn <= 10),
         |ov AS (
         |  SELECT t.qid, count(*) AS overlap
         |  FROM topk t JOIN topk16 s ON t.qid = s.qid AND t.vec_id = s.vec_id
         |  GROUP BY t.qid)
         |SELECT q.qid, COALESCE(o.overlap, 0) AS overlap,
         |       CAST(COALESCE(o.overlap, 0) AS DOUBLE)
         |         / CAST(20 - COALESCE(o.overlap, 0) AS DOUBLE) AS jaccard
         |FROM qs q LEFT JOIN ov o ON q.qid = o.qid
         |ORDER BY q.qid""".stripMargin,

    "eval_mrr_at_k" ->
      s"""$RankedCte,
         |firstrel AS (
         |  SELECT qid, min(rn) AS minr FROM topk
         |  WHERE label = qlabel GROUP BY qid),
         |rr AS (
         |  SELECT r.qid, COALESCE(2520 // f.minr, 0) AS rr_s
         |  FROM rel r LEFT JOIN firstrel f ON r.qid = f.qid)
         |SELECT count(*) AS n_queries,
         |       CAST(sum(rr_s) AS BIGINT) AS rr_sum_scaled,
         |       CAST(sum(rr_s) AS DOUBLE)
         |         / (2520.0 * count(*)) AS mrr
         |FROM rr""".stripMargin
  )
}
