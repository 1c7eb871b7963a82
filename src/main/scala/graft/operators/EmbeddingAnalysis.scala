package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Embedding-corpus analysis: distributed covariance, PCA compression,
  * and greedy k-center coreset selection — the dimensionality-reduction
  * and diversity-sampling stages of an embedding pipeline (the
  * complement of the dedup/ANN tranche in SimilarityOps/DedupOps).
  *
  * Scale notes (100 TB):
  *  - `emb_covariance` is ONE corpus scan: the d²-pair explode happens
  *    map-side per row and collapses into a partial HashAggregate, so
  *    the shuffle carries only #partitions × d(d+1)/2 rows (d = 64 ⇒
  *    2080 groups), never N·d². All sums are exact integer arithmetic
  *    over the quantized (floor(x·1000)) vectors, so results are
  *    bit-identical under any partitioning and DuckDB-oracle-able; the
  *    single float op is the final numerator/denominator division.
  *    Overflow: |xq| ≤ ~4·10³ and the long accumulators hold to
  *    N ≈ 10⁸ vectors per job; beyond that, shard the scan and combine
  *    the (n, si, sj, pij) partials — they are associative by design.
  *  - `emb_pca_project` collects ONLY the d×d covariance (2080 values,
  *    a bounded driver probe independent of N), eigensolves on the
  *    driver (Breeze eigSym, d³ ≈ 2.6·10⁵ flops), and projects in a
  *    pure map stage — no shuffle at all. Components are quantized to
  *    micro-units so each output coordinate is one codegen dot_i64
  *    (exact long) plus one scale + one centering subtraction:
  *    bit-deterministic under any partitioning, and native-speed
  *    (the interpreted-HOF fold form cost ~3.5 s at sf0.1; this is
  *    sub-second).
  *  - `coreset_kcenter` is the classic greedy 2-approximation: k
  *    corpus scans, each computing min-distance to the broadcast
  *    selected set (≤ k vectors ⇒ k·d longs shipped) and reducing with
  *    max(struct(dist, -vec_id, q)) — an exact integer argmax with a
  *    deterministic tiebreak that carries the winner's vector back, so
  *    each round is exactly one job. Driver state is the k selected
  *    vectors, never the corpus.
  */
object EmbeddingAnalysis {
  type Q = (SparkSession, String) => DataFrame

  val Dim = 64
  val PcaK = 8
  val CoresetK = 16

  /** Per (i ≤ j) moment sums over the quantized dims — n, Σxi, Σxj,
    * Σxixj as exact longs. One scan; the d² explode collapses into the
    * partial aggregate. */
  private def covStats(s: SparkSession, d: String): DataFrame = {
    val base = DedupOps.quantized(Tables.embeddings(s, d)).select(col("q"))
    base
      .select(posexplode(col("q")).as(Seq("i", "xi")), col("q"))
      .select(col("i"), col("xi"), posexplode(col("q")).as(Seq("j", "xj")))
      .filter(col("i") <= col("j"))
      .groupBy("i", "j")
      .agg(
        count(lit(1)).as("n"),
        sum(col("xi")).as("si"),
        sum(col("xj")).as("sj"),
        sum(col("xi") * col("xj")).as("pij"))
  }

  /** Upper-triangle sample covariance: cov = (n·Σxy − Σx·Σy)/(n·(n−1)).
    * Exact long numerator, one double division. */
  private def covarianceDf(s: SparkSession, d: String): DataFrame =
    covStats(s, d)
      .select(col("i"), col("j"),
        (( col("n") * col("pij") - col("si") * col("sj")).cast("double") /
          (col("n") * (col("n") - lit(1L))).cast("double")).as("cov"))

  /** Collects the bounded covariance probe (d² moment rows, independent
    * of N — ONE scan serves the matrix AND the means, μ_i = Σxi/n off
    * the diagonal rows) into a dense symmetric matrix. Shared by the
    * spectrum and projection eigensolves so they cannot drift. */
  private def covMatrix(s: SparkSession, d: String): (breeze.linalg.DenseMatrix[Double], Array[Double]) = {
    val m = breeze.linalg.DenseMatrix.zeros[Double](Dim, Dim)
    val means = Array.ofDim[Double](Dim)
    covStats(s, d).collect().foreach { r =>
      val (i, j) = (r.getInt(0), r.getInt(1))
      val (n, si, sj, pij) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      val c = (n * pij - si * sj).toDouble / (n * (n - 1)).toDouble
      m(i, j) = c; m(j, i) = c
      if (i == j) means(i) = si.toDouble / n
    }
    (m, means)
  }

  /** Full eigen-spectrum (all d eigenvalues, descending) — the PCA
    * "training" counterpart of kmeans_train_centers. The trace identity
    * Σλ = Σ var(dim) ties the driver eigensolve back to the
    * oracle-checked covariance (asserted in EmbeddingAnalysisSpec). */
  private def eigenSpectrum(s: SparkSession, d: String): Array[Double] =
    breeze.linalg.eigSym(covMatrix(s, d)._1)
      .eigenvalues.toArray.sorted(Ordering[Double].reverse)

  /** Symmetric eigensolve of the collected d×d covariance; returns
    * (eigenvalues desc, row-major components, per-dim means) with signs
    * fixed so each component's largest-|x| entry is positive. */
  private def pcaModel(s: SparkSession, d: String): (Array[Double], Array[Array[Double]], Array[Double]) = {
    import breeze.linalg.eigSym
    val (m, means) = covMatrix(s, d)
    val es = eigSym(m)
    // eigSym returns ascending eigenvalues; take the top PcaK descending
    val order = es.eigenvalues.toArray.zipWithIndex.sortBy(-_._1).take(PcaK)
    val vals = order.map(_._1)
    val comps = order.map { case (_, c) =>
      val v = Array.tabulate(Dim)(r => es.eigenvectors(r, c))
      val dom = v.indices.maxBy(i => (math.abs(v(i)), -i))
      if (v(dom) < 0) v.map(x => -x) else v
    }
    (vals, comps, means)
  }

  val queries: Map[String, Q] = Map(
    // upper-triangle covariance of the quantized embedding dims —
    // 2080 exact rows, oracle-checked
    "emb_covariance" -> ((s, d) => covarianceDf(s, d)),

    // full PCA spectrum: per component, eigenvalue + explained-variance
    // ratio (λ_k / Σλ). Driver eigensolve of the bounded covariance
    // probe; spec ties Σλ to the oracle-checked covariance trace.
    "emb_pca_explained" -> ((s, d) => {
      val ev = eigenSpectrum(s, d)
      val tot = ev.sum
      val rows = ev.zipWithIndex.map { case (v, k) => Row(k, v, v / tot) }
      s.createDataFrame(
        s.sparkContext.parallelize(rows.toSeq, 1),
        StructType(Seq(
          StructField("component", IntegerType, nullable = false),
          StructField("eigenvalue", DoubleType, nullable = false),
          StructField("explained_ratio", DoubleType, nullable = false))))
    }),

    // project every embedding onto the top-8 principal components of
    // the corpus covariance (centered, fixed-sign). Pure map stage:
    // components are micro-quantized (round(v·10⁶)) so each coordinate
    // is ONE native codegen dot (dot_i64) instead of millions of
    // interpreted lambda evals — y_k = dot(q, vq_k)/10⁶ − v_k·μ, with
    // the centering constant folded driver-side (the factored form of
    // v_k·(x − μ); the per-row part is integer-exact, so the projection
    // is bit-deterministic under any partitioning). Output is the 8
    // scalar coordinates p0..p7 (one column per component, ordered by
    // vec_id) — a flat schema every downstream consumer can sort and
    // hash without array-column handling.
    "emb_pca_project" -> ((s, d) => {
      graft.functions.VectorFunctions.registerAll(s)
      val (_, comps, means) = pcaModel(s, d)
      val vq = comps.map(_.map(v => math.round(v * 1e6)))
      val centers = vq.map(v => v.zip(means).map { case (a, mu) => a * mu }.sum / 1e6)
      val projCols = vq.zip(centers).zipWithIndex.map { case ((v, c), k) =>
        ((graft.functions.VectorFunctions.dot_i64(col("q"), typedlit(v.toSeq))
          .cast("double") / lit(1e6)) - lit(c)).as(s"p$k")
      }
      DedupOps.quantized(Tables.embeddings(s, d))
        .select(col("vec_id") +: projCols: _*)
        .orderBy("vec_id")
    }),

    // greedy k-center (farthest-point) coreset over the quantized
    // embeddings: seed = max-norm vector, then k−1 rounds of
    // "farthest from the selected set". Output one row per selection
    // with the exact squared distance at which it was chosen.
    "coreset_kcenter" -> ((s, d) => {
      graft.functions.VectorFunctions.registerAll(s)
      // base keeps the precomputed norm n = Σx² from `quantized`; the
      // squared distance to a selected vector s factors as
      // n + (‖s‖² − 2·x·s), so each candidate costs one native codegen
      // dot (dot_i64) — no interpreted lambda in the hot loop.
      val base = DedupOps.quantized(Tables.embeddings(s, d))
        .select(col("vec_id"), col("q"), col("n")).localCheckpoint(true)
      // each round is ONE job: the argmax struct carries the winning
      // vector's values, so no follow-up lookup scan is needed. The
      // (key, −id) prefix decides the comparison before the array field
      // is ever consulted — the tiebreak stays (max key, lowest id).
      def argmaxWithVec(key: org.apache.spark.sql.Column): (Long, Long, Array[Long]) = {
        val r = base.select(col("vec_id"), col("q"), key.as("k"))
          .agg(max(struct(col("k"), (-col("vec_id")).as("nid"), col("q"))).as("m"))
          .select(col("m.k"), (-col("m.nid")).as("vec_id"), col("m.q"))
          .collect()(0)
        (r.getLong(0), r.getLong(1), r.getSeq[Long](2).toArray)
      }
      // deterministic seed: max Σx², ties → lowest vec_id
      val (_, seedId, seedVec) = argmaxWithVec(col("n"))
      val selected = scala.collection.mutable.ArrayBuffer[(Long, Long)]((seedId, -1L))
      var selVecs = Array(seedVec)
      for (_ <- 1 until CoresetK) {
        val dmin = selVecs.map { sv =>
          lit(sv.map(x => x * x).sum) -
            lit(2L) * graft.functions.VectorFunctions.dot_i64(col("q"), typedlit(sv.toSeq))
        }.reduce(least(_, _))
        val (dist, vid, vec) = argmaxWithVec(col("n") + dmin)
        selected += ((vid, dist))
        selVecs = selVecs :+ vec
      }
      val rows = selected.zipWithIndex.map { case ((vid, dist), r) =>
        Row(r, vid, dist)
      }
      s.createDataFrame(
        s.sparkContext.parallelize(rows.toSeq, 1),
        StructType(Seq(
          StructField("round", IntegerType, nullable = false),
          StructField("vec_id", LongType, nullable = false),
          StructField("sq_dist", LongType, nullable = false))))
    })
  )

  val oracles: Map[String, String] = Map(
    "emb_covariance" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS x
        |  FROM embeddings)
        |SELECT a.i AS i, b.i AS j,
        |       CAST(count(*) * CAST(sum(a.x * b.x) AS BIGINT)
        |              - CAST(sum(a.x) AS BIGINT) * CAST(sum(b.x) AS BIGINT) AS DOUBLE)
        |         / CAST(count(*) * (count(*) - 1) AS DOUBLE) AS cov
        |FROM e a JOIN e b ON a.vec_id = b.vec_id AND a.i <= b.i
        |GROUP BY 1, 2""".stripMargin
    // emb_pca_project / coreset_kcenter: eigensolve and iterative
    // farthest-point selection are not SQL-expressible; both are
    // brute-force/property-checked in EmbeddingAnalysisSpec.
  )
}
