package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Similarity-search tranche 2: the k-NN JOIN (a batch of query
  * vectors, not one) and per-label centroid similarity — both
  * oracle-checked via the quantized-integer discipline of
  * [[DedupOps.quantized]] (exact, associative, engine-independent).
  *
  * Scale notes (100 TB): the k-NN join broadcasts the QUERY side (small
  * by construction) against the corpus scan and reduces per query with
  * a bounded top-k window — corpus-side work is one pass, no corpus
  * self-join. Centroid similarity is two hash aggregations (per-label
  * sums, then per-vector dot) — the (label, dim) key count is tiny, so
  * the second join broadcasts.
  */
object SimilarityOps2 {

  /** PQ operating point + codebook/encode shared by `ann_pq` and its
    * eval twin ([[AnnEval.pqTopK]]): the eval grades EXACTLY the
    * deployed index because both sides build from this one
    * definition — a drifted copy here was the failure mode a review
    * flagged. `emb` must carry (vec_id, v: array<double>).
    *
    * Two operating points on the measured recall/footprint frontier
    * (r11, graded by AnnEval against the exact quantized top-10):
    *  - m=4 × 16-dim subspaces × 32 anchors — 4 B/vec codes, the
    *    original memory-floor point (mean recall@10 ≈ 0.64/0.40 at
    *    sf0.01/0.1);
    *  - m=8 × 8-dim subspaces × 256 anchors (`PqM8`…) — the classic
    *    8-bit-code PQ8 layout, 8 B/vec: finer subspace quantization
    *    lifts mean recall@10 to ≈ 0.97/0.89 under the same top-100
    *    rerank funnel, still a 32× compression of the 64×4 B floats.
    *    Served at rest by [[AnnIndex.pq8]]; graded as `ann_eval_pq_m8`. */
  val PqM = 4; val PqSub = 16; val PqK = 32
  val PqM8 = 8; val PqSub8 = 8; val PqK8 = 256
  def pqSubExpr: String = pqSubExprOf(PqM, PqSub)
  def pqSubExprOf(m: Int, sub: Int): String =
    s"transform(sequence(0, ${m - 1}), m -> struct(m AS m, slice(v, m * $sub + 1, $sub) AS sv))"
  private val PqDist =
    "aggregate(zip_with(sv, av, (x, y) -> (x - y) * (x - y)), 0D, (acc, e) -> acc + e)"
  /** (anchors: (code, m, av), codes: (vec_id, m, code)) — codes cover
    * EVERY input vector; callers exclude their query ids themselves. */
  def pqAnchorsCodes(emb: DataFrame): (DataFrame, DataFrame) =
    pqAnchorsCodesOf(emb, PqM, PqSub, PqK)

  /** Parameterized codebook build: anchors are the first `k` vectors
    * by content hash (deterministic, reproducible cluster-wide — no
    * RNG, no training job); each vector's per-subspace code is its
    * nearest anchor subvector. At 100 TB the anchor sample is a
    * constant-size head of one content-hash order — the same
    * train-on-a-sample discipline every PQ deployment uses. */
  def pqAnchorsCodesOf(emb: DataFrame, m: Int, sub: Int, k: Int): (DataFrame, DataFrame) = {
    val subExpr = pqSubExprOf(m, sub)
    val anchorPlan = emb
      .orderBy(md5(concat(col("vec_id").cast("string"), lit("pq"))), col("vec_id"))
      .limit(k)
      .withColumn("code", row_number().over(Window.orderBy("vec_id")) - 1)
      .select(col("code"), explode(expr(subExpr)).as("a"))
      .select(col("code"), col("a.m").as("m"), col("a.sv").as("av"))
    // the codebook is a CONSTANT k·m rows (128 at the defaults); its
    // plan is a global sort + single-partition window with two consumer
    // branches (encode leg, ADC query-table leg). r18 collected it into
    // a LocalRelation so the subplan runs once — but the driver's
    // paired run measured ann_pq 0.80× WITH the collect, and the r19
    // same-hour A/B (min-of-4, 32 cores, sf0.1) agreed it does not pay:
    // ann_pq 1.87 s (collect) vs 1.67 s (lazy); ann_eval_pq 2.59 vs
    // 2.69 — a wash overall, negative for the headline query. The
    // blocking collect sits inside the timed construction window and
    // costs a driver job latency that the saved re-run of a tiny
    // sorted-head subplan never earns back. REVERTED to lazy (r19).
    val anchors = anchorPlan
    (anchors, pqEncode(emb, anchors, m, sub))
  }

  /** Encode vectors against an EXISTING (frozen) anchor table — the
    * PQ freshness primitive: a deployment trains the codebook once
    * and every later ingest batch encodes against it (retraining
    * would silently mis-score all codes already at rest, because ADC
    * tables are built from the anchors). One map-side explode + a
    * broadcast join + a (vec_id, m) min-aggregate — no shuffle of the
    * vector payload beyond the code rows themselves. */
  def pqEncode(emb: DataFrame, anchors: DataFrame, m: Int, sub: Int): DataFrame =
    emb
      .select(col("vec_id"), explode(expr(pqSubExprOf(m, sub))).as("s"))
      .select(col("vec_id"), col("s.m").as("m"), col("s.sv").as("sv"))
      .join(broadcast(anchors), "m")
      .withColumn("d2", expr(PqDist))
      .groupBy("vec_id", "m")
      .agg(min(struct(col("d2"), col("code"))).getField("code").as("code"))
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // k-NN join: top-3 cosine neighbors for EACH of the 5 query vectors
    // (vec_id < 5) — exact quantized math, query side broadcast
    "knn_join_topk" -> ((s, d) => {
      graft.functions.VectorFunctions.registerAll(s)
      val q = DedupOps.quantized(Tables.embeddings(s, d))
      val queries = q.filter(col("vec_id") < 5)
        .select(col("vec_id").as("qid"), col("q").as("qq"), col("n").as("nq"))
      val scored = q.crossJoin(broadcast(queries))
        .filter(col("vec_id") =!= col("qid"))
        .withColumn("dot", graft.functions.VectorFunctions.dot_i64(col("q"), col("qq")))
        .withColumn("sim", col("dot") / sqrt((col("n") * col("nq")).cast("double")))
      val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vec_id"))
      scored.withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 3)
        .select("qid", "vec_id", "sim", "rn")
        .orderBy("qid", "rn")
    }),

    // per-vector cosine to its own label's centroid (cluster coherence
    // scoring). Centroid = per-(label,dim) integer SUM — cosine against
    // the sum equals cosine against the mean, so no division ever
    // enters the integer path.
    "label_centroid_sim" -> ((s, d) => {
      val e = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          posexplode(expr(
            "transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
            .as(Seq("i", "x")))
      val cent = e.groupBy("label", "i").agg(sum("x").as("cs"))
      val cnorm = cent.groupBy("label")
        .agg(sum(col("cs") * col("cs")).as("nc"))
      val joined = e.join(cent, Seq("label", "i"))
      val perVec = joined.groupBy("vec_id", "label")
        .agg(sum(col("x") * col("cs")).as("dot"),
          sum(col("x") * col("x")).as("nv"))
      perVec.join(cnorm, "label")
        .select(col("vec_id"), col("label"),
          (col("dot").cast("double") /
            (sqrt(col("nv").cast("double")) * sqrt(col("nc").cast("double"))))
            .as("cos_centroid"))
        .orderBy("vec_id")
    }),

    // product-quantization ANN (IVFADC-style, Jégou et al. 2011): the
    // 100 TB memory-budget path — each 64-dim vector compresses to
    // M=4 sub-space codes against a 32-entry codebook (256 B → 4 B at
    // rest), queries scan CODES via a 128-entry broadcast lookup table,
    // and only the approx-top-100 get exact rerank. Codebook anchors
    // are content-hash-sampled (deterministic, no RNG — reproducible
    // cluster-wide like the SRP planes). Rows-only (double math);
    // recall-vs-exact pinned in AnnSpec.
    "ann_pq" -> ((s, d) => {
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      // shared codebook + encode (see pqAnchorsCodes); the query
      // vector's own code rows drop out here
      val (anchors, allCodes) = pqAnchorsCodes(emb)
      val codes = allCodes.filter(col("vec_id") =!= 0)
      // query-side asymmetric distance table: dot(q_m, anchor) per
      // (m, code) — M*k entries, broadcast to score codes directly
      val qsub = emb.filter(col("vec_id") === 0)
        .select(explode(expr(pqSubExpr)).as("s"))
        .select(col("s.m").as("m"), col("s.sv").as("qv"))
      val qd = anchors.join(qsub, "m")
        .withColumn("qdot", expr(
          "aggregate(zip_with(av, qv, (x, y) -> x * y), 0D, (acc, e) -> acc + e)"))
        .select("m", "code", "qdot")
      val approx = codes.join(broadcast(qd), Seq("m", "code"))
        .groupBy("vec_id").agg(sum("qdot").as("approx_dot"))
        .orderBy(col("approx_dot").desc, col("vec_id"))
        .limit(100)
        .select("vec_id")
      // exact rerank inside the candidate set only
      val query = emb.filter(col("vec_id") === 0).select(col("v").as("qfull"))
      emb.join(broadcast(approx), "vec_id")
        .crossJoin(broadcast(query))
        .withColumn("dot", expr(
          "aggregate(zip_with(v, qfull, (x, y) -> x * y), 0D, (acc, e) -> acc + e)"))
        .withColumn("nv", expr("aggregate(v, 0D, (acc, x) -> acc + x * x)"))
        .withColumn("nq", expr("aggregate(qfull, 0D, (acc, x) -> acc + x * x)"))
        .withColumn("sim", col("dot") / sqrt(col("nv") * col("nq")))
        .select("vec_id", "sim")
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // the PQ8 serving path: same ADC + top-100 rerank funnel as
    // `ann_pq`, but probing the AT-REST m=8 × 256-anchor index
    // ([[AnnIndex.pq8]]) — no per-query codebook build, 8 B/vec code
    // scan, and the recall@10 ≥ 0.8 operating point the eval family
    // grades as `ann_eval_pq_m8`. Rows-only (double math); AnnSpec
    // pins determinism + a ≥0.8 funnel-recall floor vs ann_topk.
    "ann_pq8" -> ((s, d) => {
      val (anchors, codes) = AnnIndex.pq8(s, d)
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      val qsub = emb.filter(col("vec_id") === 0)
        .select(explode(expr(pqSubExprOf(PqM8, PqSub8))).as("s"))
        .select(col("s.m").as("m"), col("s.sv").as("qv"))
      val qd = anchors.join(qsub, "m")
        .withColumn("qdot", expr(
          "aggregate(zip_with(av, qv, (x, y) -> x * y), 0D, (acc, e) -> acc + e)"))
        .select("m", "code", "qdot")
      val approx = codes.filter(col("vec_id") =!= 0)
        .join(broadcast(qd), Seq("m", "code"))
        .groupBy("vec_id").agg(sum("qdot").as("approx_dot"))
        .orderBy(col("approx_dot").desc, col("vec_id"))
        .limit(100)
        .select("vec_id")
      val query = emb.filter(col("vec_id") === 0).select(col("v").as("qfull"))
      emb.join(broadcast(approx), "vec_id")
        .crossJoin(broadcast(query))
        .withColumn("dot", expr(
          "aggregate(zip_with(v, qfull, (x, y) -> x * y), 0D, (acc, e) -> acc + e)"))
        .withColumn("nv", expr("aggregate(v, 0D, (acc, x) -> acc + x * x)"))
        .withColumn("nq", expr("aggregate(qfull, 0D, (acc, x) -> acc + x * x)"))
        .withColumn("sim", col("dot") / sqrt(col("nv") * col("nq")))
        .select("vec_id", "sim")
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    })
  )

  val oracles: Map[String, String] = Map(
    "knn_join_topk" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS x
        |  FROM embeddings),
        |norms AS (SELECT vec_id, sum(x * x) AS n FROM e GROUP BY vec_id),
        |dots AS (
        |  SELECT q.vec_id AS qid, e.vec_id, sum(e.x * q.x) AS dot
        |  FROM e JOIN e q ON e.i = q.i
        |  WHERE q.vec_id < 5 AND e.vec_id <> q.vec_id
        |  GROUP BY 1, 2),
        |sims AS (
        |  SELECT qid, dots.vec_id,
        |         CAST(dot AS DOUBLE)
        |           / sqrt(CAST(nv.n * nq.n AS DOUBLE)) AS sim
        |  FROM dots
        |  JOIN norms nv ON nv.vec_id = dots.vec_id
        |  JOIN norms nq ON nq.vec_id = qid),
        |ranked AS (
        |  SELECT qid, vec_id, sim,
        |         row_number() OVER (PARTITION BY qid
        |                            ORDER BY sim DESC, vec_id) AS rn
        |  FROM sims)
        |SELECT qid, vec_id, sim, rn FROM ranked
        |WHERE rn <= 3 ORDER BY qid, rn""".stripMargin,

    "label_centroid_sim" ->
      """WITH e AS (
        |  SELECT vec_id, label, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS x
        |  FROM embeddings),
        |cent AS (SELECT label, i, sum(x) AS cs FROM e GROUP BY label, i),
        |cnorm AS (SELECT label, sum(cs * cs) AS nc FROM cent GROUP BY label),
        |pv AS (
        |  SELECT e.vec_id, e.label, sum(e.x * cent.cs) AS dot,
        |         sum(e.x * e.x) AS nv
        |  FROM e JOIN cent ON e.label = cent.label AND e.i = cent.i
        |  GROUP BY 1, 2)
        |SELECT pv.vec_id, pv.label,
        |       CAST(dot AS DOUBLE)
        |         / (sqrt(CAST(nv AS DOUBLE)) * sqrt(CAST(nc AS DOUBLE))) AS cos_centroid
        |FROM pv JOIN cnorm ON pv.label = cnorm.label
        |ORDER BY pv.vec_id""".stripMargin
  )
}
