package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Margin-scored bitext mining — the ratio-margin criterion of
  * Artetxe & Schwenk ("Margin-based Parallel Corpus Mining with
  * Multilingual Sentence Embeddings", ACL 2019), the scoring rule the
  * large mined corpora (CCMatrix/CCAligned-style) are built on: a raw
  * cosine threshold can't separate true translation pairs from hub
  * vectors that are "near everything", so each candidate cosine is
  * normalized by the average cosine of both endpoints' k-nearest
  * cross-side neighborhoods:
  *
  *   margin(x, y) = cos(x, y) / ( (avgK(x) + avgK(y)) / 2 )
  *
  * where avgK(v) averages v's top-[[MarginK]] cross-side cosines. A
  * hub's denominator is as inflated as its numerator, so hubs rank
  * below genuinely isolated mutual matches.
  *
  * The driver corpus has one embedding space with an integer `label`;
  * `label >= 5` splits it into two pseudo-corpora standing in for the
  * two languages (same device as `dsir_weights`' modulo eval split).
  *
  *  - `bitext_margin_topk` — forward mining from side 0: each side-0
  *    vector's best side-1 neighbor, margin-scored, top
  *    [[TopPairs]] pairs by margin. Columns (vec_id, cand, sim,
  *    margin).
  *
  * DuckDB-oracle-checked end to end. Engine parity is the knn_graph
  * discipline: quantized integer dots (floor(x·1000)) make every
  * cosine the same correctly-rounded double in both engines, and the
  * k-neighborhood average is summed in EXPLICIT rank order
  * (((s1+s2)+s3)+s4, the same left-associated tree both sides) before
  * the one final division — float sums in engine-chosen accumulation
  * order are the classic silent-divergence trap.
  *
  * Scale notes (100 TB):
  *  - the kNN legs ride [[EmbeddingNeighbors.topKNeighbors]]'s tiled
  *    kernel (crossLabelOnly=true): block-pair tasks over quantized
  *    primitive arrays, N·B·k partial rows shuffled — never N²/2 pair
  *    rows (at real scale the exact kernel runs on the blocked tiles;
  *    the ANN indexes are the recall-traded alternative);
  *  - both margin joins key on vec_id/cand against k-row-per-vector
  *    relations — linear, hash-equi, AQE-sized;
  *  - the final top-[[TopPairs]] is TakeOrderedAndProject, not a
  *    global sort.
  */
object BitextOps {
  type Q = (SparkSession, String) => DataFrame

  /** Cross-side neighborhood size for the margin denominator (the
    * paper's k=4 operating point). Both pseudo-corpora hold hundreds
    * of vectors at every driver SF, so each vector always has a full
    * k-neighborhood — the `nk = MarginK` guard is structural, not
    * data-dependent. */
  val MarginK = 4

  /** Mined pairs reported (the audit slice a curation run reviews). */
  val TopPairs = 25

  /** label >= 5 → side 1, else side 0; null labels excluded on both
    * engines (a vector of unknown side can't be mined). */
  private def sided(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("label").isNotNull)
      .select(col("vec_id"), col("embedding"),
        (col("label") >= 5).cast("int").as("label"))

  /** Forward-mined margin top pairs; see object doc. */
  def marginTopK(s: SparkSession, d: String): DataFrame = {
    val emb = sided(s, d)
    // (vec_id, rn, cand, sim): every vector's top-k OTHER-side
    // neighbors — one kernel pass serves both the numerator (rn=1)
    // and both sides' denominators
    val g = EmbeddingNeighbors
      .topKNeighbors(emb, MarginK, crossLabelOnly = true)
      .localCheckpoint(true) // two margin joins + the best leg read it
    def rankSim(r: Int) = max(when(col("rn") === r, col("sim")))
    val halfAvg = g.groupBy("vec_id")
      .agg(rankSim(1).as("s1"),
        (2 to MarginK).map(r => rankSim(r).as(s"s$r")) :+ count(lit(1)).as("nk"): _*)
      .filter(col("nk") === MarginK)
      // half the k-average: margin = sim / (hd_x + hd_y); explicit
      // left-associated sum order, mirrored verbatim in the oracle
      .select(col("vec_id"),
        ((1 to MarginK).map(r => col(s"s$r")).reduce(_ + _)
          / lit((2 * MarginK).toDouble)).as("hd"))
    val hx = halfAvg.select(col("vec_id"), col("hd").as("hd_x"))
    val hy = halfAvg.select(col("vec_id").as("cand"), col("hd").as("hd_y"))
    val side0 = emb.filter(col("label") === 0).select("vec_id")
    g.filter(col("rn") === 1)
      .join(side0, "vec_id") // forward direction only
      .join(hx, "vec_id").join(hy, "cand")
      .select(col("vec_id"), col("cand"), col("sim"),
        (col("sim") / (col("hd_x") + col("hd_y"))).as("margin"))
      .orderBy(col("margin").desc, col("vec_id"))
      .limit(TopPairs)
  }

  val queries: Map[String, Q] = Map(
    "bitext_margin_topk" -> ((s, d) => marginTopK(s, d))
  )

  /** Left-associated rank-ordered sum of the top-[[MarginK]] sims —
    * the same association tree the Spark reduce builds. */
  private val OracleRankSum = (1 to MarginK)
    .map(r => s"max(CASE WHEN rn = $r THEN sim END)")
    .reduce((a, b) => s"($a\n                 + $b)")

  val oracles: Map[String, String] = Map(
    "bitext_margin_topk" ->
      s"""WITH e AS (
        |  SELECT vec_id,
        |         CASE WHEN label >= 5 THEN 1 ELSE 0 END AS side,
        |         generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS x
        |  FROM embeddings WHERE label IS NOT NULL),
        |norms AS (SELECT vec_id, any_value(side) AS side, sum(x * x) AS n
        |          FROM e GROUP BY vec_id),
        |dots AS (SELECT a.vec_id AS va, b.vec_id AS vb, sum(a.x * b.x) AS dot
        |         FROM e a JOIN e b ON a.i = b.i AND a.side <> b.side
        |         GROUP BY 1, 2),
        |sims AS (SELECT va, vb,
        |                CAST(dot AS DOUBLE)
        |                  / sqrt(CAST(na.n * nb.n AS DOUBLE)) AS sim
        |         FROM dots
        |         JOIN norms na ON na.vec_id = va
        |         JOIN norms nb ON nb.vec_id = vb),
        |rk AS (SELECT va, vb, sim,
        |              row_number() OVER (PARTITION BY va
        |                                 ORDER BY sim DESC, vb) AS rn
        |       FROM sims),
        |hd AS (SELECT va,
        |              $OracleRankSum
        |                / CAST(${2 * MarginK} AS DOUBLE) AS hd
        |       FROM rk WHERE rn <= $MarginK GROUP BY va
        |       HAVING count(*) = $MarginK)
        |SELECT b.va AS vec_id, b.vb AS cand, b.sim AS sim,
        |       b.sim / (ha.hd + hb.hd) AS margin
        |FROM rk b
        |JOIN hd ha ON ha.va = b.va
        |JOIN hd hb ON hb.va = b.vb
        |JOIN norms nv ON nv.vec_id = b.va
        |WHERE b.rn = 1 AND nv.side = 0
        |ORDER BY margin DESC, vec_id
        |LIMIT $TopPairs""".stripMargin
  )
}
