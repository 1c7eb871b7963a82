package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Semantics for the non-SQL-expressible embedding-analysis ops:
  * PCA projection (eigensolve) and greedy k-center coreset. The
  * covariance feeding both is DuckDB-oracle-checked (emb_covariance).
  */
class EmbeddingAnalysisSpec extends SparkSpec {

  private val sf001 = "/root/testdata/sf0.01"

  test("emb_covariance: symmetric positive-variance upper triangle, matches brute force") {
    val d = EmbeddingAnalysis.Dim
    val cov = EmbeddingAnalysis.queries("emb_covariance")(spark, sf)
      .collect().map(r => ((r.getInt(0), r.getInt(1)), r.getDouble(2))).toMap
    assert(cov.size == d * (d + 1) / 2)
    // diagonal entries are sample variances: strictly positive here
    (0 until d).foreach(i => assert(cov((i, i)) > 0.0, s"var($i)"))
    // brute-force check on the quantized vectors
    val vecs = DedupOps.quantized(Tables.embeddings(spark, sf))
      .select("q").collect().map(_.getSeq[Long](0).toArray)
    val n = vecs.length
    for ((i, j) <- Seq((0, 0), (0, 1), (3, 17), (d - 2, d - 1))) {
      val (si, sj) = (vecs.map(_(i)).sum, vecs.map(_(j)).sum)
      val pij = vecs.map(v => v(i) * v(j)).sum
      val expected = (n.toLong * pij - si * sj).toDouble / (n.toLong * (n - 1)).toDouble
      assert(cov((i, j)) == expected, s"cov($i,$j)")
    }
  }

  test("emb_pca_explained: trace identity ties the eigensolve to the covariance") {
    val d = EmbeddingAnalysis.Dim
    val spec = EmbeddingAnalysis.queries("emb_pca_explained")(spark, sf)
      .orderBy("component").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getDouble(2)))
    assert(spec.length == d)
    // eigenvalues descending; ratios sum to 1
    spec.map(_._2).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b); case _ =>
    }
    assert(math.abs(spec.map(_._3).sum - 1.0) < 1e-9)
    // Σλ == trace(cov) — the oracle-checked diagonal variances
    val trace = EmbeddingAnalysis.queries("emb_covariance")(spark, sf)
      .filter(col("i") === col("j")).agg(sum("cov")).collect()(0).getDouble(0)
    val lamSum = spec.map(_._2).sum
    assert(math.abs(lamSum - trace) / trace < 1e-10, s"sum(lambda)=$lamSum trace=$trace")
    // golden pin (sf0.001 fixture): drift detector across Spark/Breeze
    // upgrades — the eigensolve itself, not just its trace
    val golden = Seq(28950.61134088082, 26972.963604008113, 25873.890822274523)
    golden.zip(spec.map(_._2)).foreach { case (want, got) =>
      assert(math.abs(got - want) / want < 1e-9, s"eigenvalue drift: $got vs $want")
    }
  }

  test("emb_pca_project: deterministic, variance-ordered, flat p0..p7 schema") {
    val k = EmbeddingAnalysis.PcaK
    val proj = EmbeddingAnalysis.queries("emb_pca_project")(spark, sf001)
    // flat scalar schema the driver's checker can sort/hash directly
    assert(proj.columns.toSeq == "vec_id" +: (0 until k).map(i => s"p$i"))
    val rows = proj.collect()
    assert(rows.length == 500)
    // rows arrive ordered by vec_id
    assert(rows.map(_.getLong(0)).toSeq == rows.map(_.getLong(0)).sorted.toSeq)
    // per-component variance of the projection is (weakly) descending —
    // the defining property of a principal basis
    val cols = (0 until k).map(i => rows.map(_.getDouble(i + 1)))
    val vars = cols.map { xs =>
      val mu = xs.sum / xs.length
      xs.map(x => (x - mu) * (x - mu)).sum / (xs.length - 1)
    }
    vars.sliding(2).foreach { case Seq(a, b) => assert(a >= b * 0.999999, s"variance order: $a < $b") }
    // projections are centered: column means ~0
    cols.foreach { xs => assert(math.abs(xs.sum / xs.length) < 1e-6) }
    // deterministic under re-evaluation (fixed-order fold + fixed-sign components)
    val again = EmbeddingAnalysis.queries("emb_pca_project")(spark, sf001)
      .collect().map(r => r.getLong(0) -> r.toSeq.drop(1)).toMap
    rows.foreach(r => assert(again(r.getLong(0)) == r.toSeq.drop(1)))
  }

  test("coreset_kcenter: matches driver brute force; radius non-increasing") {
    val out = EmbeddingAnalysis.queries("coreset_kcenter")(spark, sf001)
      .orderBy("round").collect()
      .map(r => (r.getInt(0), r.getLong(1), r.getLong(2)))
    assert(out.length == EmbeddingAnalysis.CoresetK)
    assert(out.head._3 == -1L) // seed row carries no distance

    // brute-force greedy on the collected quantized vectors
    val vecs = DedupOps.quantized(Tables.embeddings(spark, sf001))
      .select("vec_id", "q").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    def sq(a: Array[Long], b: Array[Long]): Long = {
      var s = 0L; var i = 0
      while (i < a.length) { val d = a(i) - b(i); s += d * d; i += 1 }
      s
    }
    val seed = vecs.maxBy { case (id, v) => (v.map(x => x * x).sum, -id) }._1
    var selected = Vector(seed)
    val expected = scala.collection.mutable.ArrayBuffer((seed, -1L))
    while (selected.size < EmbeddingAnalysis.CoresetK) {
      val (far, dist) = vecs.map { case (id, v) =>
        (id, selected.map(s => sq(v, vecs(s))).min)
      }.maxBy { case (id, dm) => (dm, -id) }
      selected :+= far
      expected += ((far, dist))
    }
    assert(out.map(o => (o._2, o._3)).toSeq == expected.toSeq)
    // selection distance (coverage radius) never increases after round 1
    out.drop(1).map(_._3).toSeq.sliding(2).foreach {
      case Seq(a, b) => assert(a >= b, s"radius increased: $a -> $b")
      case _ =>
    }
  }
}
