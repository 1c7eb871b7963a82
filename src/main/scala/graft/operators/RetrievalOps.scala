package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid sparse+dense retrieval and per-source curation stats — the
  * fusion stage a retrieval-augmented training pipeline runs after its
  * lexical (BM25) and embedding (ANN) legs, plus the dedup accounting
  * a corpus report aggregates per source.
  *
  * Scale notes (100 TB):
  *  - `hybrid_rrf_topk`: each leg is its own scale-safe plan — the
  *    BM25 leg is TextOps5's two-scan/zero-wide-shuffle shape, the
  *    dense leg a single scan against one broadcast query vector —
  *    and each reduces to 50 rows via TakeOrderedAndProject BEFORE
  *    any ranking. The row_number windows and the full-outer fusion
  *    join run on ≤50-row inputs (bounded by the fixed candidate
  *    depth, not the corpus), so the single-partition window is a
  *    constant-size epilogue, the same discipline as the top-k
  *    re-rank tails elsewhere in the registry.
  *  - RRF arithmetic is bit-stable across engines: ranks are exact
  *    ints, each contribution is one correctly-rounded double divide
  *    `CAST(1 AS DOUBLE) / (60 + r)`, and the fusion sum adds the two
  *    legs in fixed textual order (sparse + dense) — never an
  *    aggregate over a nondeterministically-ordered explode.
  *  - `dedup_rate_by_source`: canonical-per-text via a hash-
  *    partitioned window min (the dedup_exact shape), then a partial-
  *    aggregated rollup keyed by source — the shuffle carries
  *    per-source partials, never documents.
  */
object RetrievalOps {
  type Q = (SparkSession, String) => DataFrame

  /** RRF smoothing constant (Cormack & Clarke's k=60). */
  val RrfK = 60

  /** Candidate depth per leg before fusion. */
  val Depth = 50

  val queries: Map[String, Q] = Map(
    // reciprocal-rank fusion of the BM25 lexical leg and the exact
    // quantized-cosine dense leg (query = vec_id 0, which is excluded
    // from results on both legs — it is the query document)
    "hybrid_rrf_topk" -> ((s, d) => {
      graft.functions.VectorFunctions.registerAll(s)
      val sparseTop = TextOps5.bm25Scored(s, d)
        .filter(col("doc_id") =!= 0)
        .orderBy(col("score").desc, col("doc_id"))
        .limit(Depth)
      val q = DedupOps.quantized(Tables.embeddings(s, d))
      val query = q.filter(col("vec_id") === 0)
        .select(col("q").as("qq"), col("n").as("nq"))
      val denseTop = q.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(query))
        .withColumn("dot", graft.functions.VectorFunctions.dot_i64(col("q"), col("qq")))
        .withColumn("sim", col("dot") / sqrt((col("n") * col("nq")).cast("double")))
        .select("vec_id", "sim")
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(Depth)
      // ranks over the ≤Depth-row tops: bounded single-partition
      // windows (constant-size epilogue, not a corpus-wide sort)
      val sr = sparseTop.withColumn("sr",
        row_number().over(Window.orderBy(col("score").desc, col("doc_id"))))
        .select("doc_id", "sr")
      val dr = denseTop.withColumn("dr",
        row_number().over(Window.orderBy(col("sim").desc, col("vec_id"))))
        .select(col("vec_id").as("doc_id"), col("dr"))
      sr.join(dr, Seq("doc_id"), "full_outer")
        .select(col("doc_id"),
          (coalesce(expr(s"CAST(1 AS DOUBLE) / ($RrfK + sr)"), expr("CAST(0 AS DOUBLE)")) +
            coalesce(expr(s"CAST(1 AS DOUBLE) / ($RrfK + dr)"), expr("CAST(0 AS DOUBLE)")))
            .as("rrf"))
        .orderBy(col("rrf").desc, col("doc_id"))
        .limit(10)
    }),

    // per-source exact-duplication accounting: how many docs each
    // source contributes and what fraction are non-canonical copies
    "dedup_rate_by_source" -> ((s, d) => {
      val w = Window.partitionBy("text")
      Tables.documents(s, d)
        .withColumn("is_dup", col("doc_id") =!= min(col("doc_id")).over(w))
        .groupBy("source")
        .agg(count(lit(1)).as("docs"),
          sum(when(col("is_dup"), 1L).otherwise(0L)).as("dups"))
        .withColumn("dup_rate",
          col("dups").cast("double") / col("docs").cast("double"))
        .orderBy("source")
    })
  )

  val oracles: Map[String, String] = Map(
    "hybrid_rrf_topk" ->
      s"""WITH ${TextOps5.bm25OracleCtes},
        |bm AS (SELECT doc_id, (${TextOps5.bm25Score}) AS score
        |       FROM f, st WHERE doc_id <> 0
        |       ORDER BY score DESC, doc_id LIMIT $Depth),
        |bmr AS (SELECT doc_id,
        |          row_number() OVER (ORDER BY score DESC, doc_id) AS sr
        |        FROM bm),
        |e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS x
        |  FROM embeddings),
        |qv AS (SELECT i, x FROM e WHERE vec_id = 0),
        |nq AS (SELECT sum(x * x) AS n FROM qv),
        |dots AS (
        |  SELECT e.vec_id, sum(e.x * qv.x) AS dot, sum(e.x * e.x) AS ne
        |  FROM e JOIN qv ON e.i = qv.i
        |  WHERE e.vec_id <> 0 GROUP BY e.vec_id),
        |dn AS (SELECT vec_id,
        |         CAST(dot AS DOUBLE)
        |           / sqrt(CAST(ne * (SELECT n FROM nq) AS DOUBLE)) AS sim
        |       FROM dots ORDER BY sim DESC, vec_id LIMIT $Depth),
        |dnr AS (SELECT vec_id,
        |          row_number() OVER (ORDER BY sim DESC, vec_id) AS dr
        |        FROM dn)
        |SELECT coalesce(bmr.doc_id, dnr.vec_id) AS doc_id,
        |       (coalesce(CAST(1 AS DOUBLE) / ($RrfK + bmr.sr), CAST(0 AS DOUBLE))
        |         + coalesce(CAST(1 AS DOUBLE) / ($RrfK + dnr.dr), CAST(0 AS DOUBLE))) AS rrf
        |FROM bmr FULL OUTER JOIN dnr ON bmr.doc_id = dnr.vec_id
        |ORDER BY rrf DESC, doc_id LIMIT 10""".stripMargin,

    "dedup_rate_by_source" ->
      """WITH m AS (
        |  SELECT source,
        |         doc_id <> min(doc_id) OVER (PARTITION BY text) AS is_dup
        |  FROM documents)
        |SELECT source, count(1) AS docs,
        |       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS BIGINT) AS dups,
        |       CAST(sum(CASE WHEN is_dup THEN 1 ELSE 0 END) AS DOUBLE)
        |         / CAST(count(1) AS DOUBLE) AS dup_rate
        |FROM m GROUP BY source ORDER BY source""".stripMargin
  )
}
