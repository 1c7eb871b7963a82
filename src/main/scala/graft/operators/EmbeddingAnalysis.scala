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
  *    driver (Breeze eigSym, d³ ≈ 2.6·10⁵ flops), and projects with a
  *    broadcast component matrix in a pure map stage — no shuffle at
  *    all. The per-row fold runs in fixed index order, so the IEEE
  *    sequence is deterministic under repartitioning.
  *  - `coreset_kcenter` is the classic greedy 2-approximation: k
  *    corpus scans, each computing min-distance to the broadcast
  *    selected set (≤ k vectors ⇒ k·d longs shipped) and reducing with
  *    max(struct(dist, -vec_id)) — an exact integer argmax with a
  *    deterministic tiebreak. Driver state is the k selected vectors,
  *    never the corpus.
  */
object EmbeddingAnalysis {
  type Q = (SparkSession, String) => DataFrame

  val Dim = 64
  val PcaK = 8
  val CoresetK = 16

  /** Upper-triangle sample covariance of the quantized embedding dims:
    * per (i ≤ j), cov = (n·Σxy − Σx·Σy) / (n·(n−1)). Exact long
    * numerator, one double division. */
  private def covarianceDf(s: SparkSession, d: String): DataFrame = {
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
      .select(col("i"), col("j"),
        (( col("n") * col("pij") - col("si") * col("sj")).cast("double") /
          (col("n") * (col("n") - lit(1L))).cast("double")).as("cov"))
  }

  /** Symmetric eigensolve of the collected d×d covariance; returns
    * (eigenvalues desc, row-major components, per-dim means) with signs
    * fixed so each component's largest-|x| entry is positive. */
  private def pcaModel(s: SparkSession, d: String): (Array[Double], Array[Array[Double]], Array[Double]) = {
    import breeze.linalg.{DenseMatrix, eigSym}
    // bounded driver probe: d² covariance entries + d means, independent of N
    val covRows = covarianceDf(s, d).collect()
    val m = DenseMatrix.zeros[Double](Dim, Dim)
    covRows.foreach { r =>
      val (i, j, c) = (r.getInt(0), r.getInt(1), r.getDouble(2))
      m(i, j) = c; m(j, i) = c
    }
    val means = DedupOps.quantized(Tables.embeddings(s, d))
      .select(posexplode(col("q")).as(Seq("i", "x")))
      .groupBy("i").agg((sum("x").cast("double") / count(lit(1))).as("mu"))
      .collect().sortBy(_.getInt(0)).map(_.getDouble(1))
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

    // project every embedding onto the top-8 principal components of
    // the corpus covariance (centered, fixed-sign). Pure map stage with
    // a broadcast component matrix; per-row fold is fixed-order.
    "emb_pca_project" -> ((s, d) => {
      val (_, comps, means) = pcaModel(s, d)
      val compLit = typedlit(comps.map(_.toSeq).toSeq)
      val meanLit = typedlit(means.toSeq)
      DedupOps.quantized(Tables.embeddings(s, d))
        .select(col("vec_id"), col("q"))
        .withColumn("comps", compLit)
        .withColumn("mu", meanLit)
        .select(col("vec_id"),
          expr(
            // y_k = Σ_i v_ki · (x_i − μ_i), folded in index order
            """transform(comps, v ->
              |  aggregate(sequence(0, size(v) - 1), CAST(0.0 AS DOUBLE),
              |    (acc, i) -> acc + element_at(v, i + 1)
              |                      * (CAST(element_at(q, i + 1) AS DOUBLE)
              |                         - element_at(mu, i + 1))))""".stripMargin)
            .as("proj"))
    }),

    // greedy k-center (farthest-point) coreset over the quantized
    // embeddings: seed = max-norm vector, then k−1 rounds of
    // "farthest from the selected set". Output one row per selection
    // with the exact squared distance at which it was chosen.
    "coreset_kcenter" -> ((s, d) => {
      val base = DedupOps.quantized(Tables.embeddings(s, d))
        .select(col("vec_id"), col("q")).localCheckpoint(true)
      // deterministic seed: max Σx², ties → lowest vec_id
      val seedRow = base
        .select(col("vec_id"), expr("aggregate(q, CAST(0 AS BIGINT), (acc, x) -> acc + x * x)").as("n2"))
        .agg(max(struct(col("n2"), (-col("vec_id")).as("nid"))).as("m"))
        .select(col("m.n2"), (-col("m.nid")).as("vec_id"))
        .collect()(0)
      val selected = scala.collection.mutable.ArrayBuffer[(Long, Long)]((seedRow.getLong(1), -1L))
      var selVecs = base.filter(col("vec_id") === seedRow.getLong(1))
        .collect().map(r => r.getSeq[Long](1).toArray)
      for (_ <- 1 until CoresetK) {
        val selLit = typedlit(selVecs.map(_.toSeq).toSeq)
        val far = base
          .withColumn("sel", selLit)
          .select(col("vec_id"),
            expr(
              """array_min(transform(sel, sv ->
                |  aggregate(zip_with(q, sv, (a, b) -> (a - b) * (a - b)),
                |            CAST(0 AS BIGINT), (acc, v) -> acc + v)))""".stripMargin)
              .as("dmin"))
          .agg(max(struct(col("dmin"), (-col("vec_id")).as("nid"))).as("m"))
          .select(col("m.dmin"), (-col("m.nid")).as("vec_id"))
          .collect()(0)
        val vid = far.getLong(1)
        selected += ((vid, far.getLong(0)))
        selVecs = selVecs ++ base.filter(col("vec_id") === vid)
          .collect().map(r => r.getSeq[Long](1).toArray)
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
