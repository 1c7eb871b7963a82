package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** SemDeDup variants: the k-means-clustered form (no SQL oracle — the
  * clustering is engine-specific) is brute-verified verdict-by-verdict
  * against its own produced clustering, and pinned deterministic. */
class SemDedupSpec extends SparkSpec {

  private def cosine(a: Array[Long], b: Array[Long]): Double = {
    var d = 0L; var na = 0L; var nb = 0L; var k = 0
    val len = math.min(a.length, b.length)
    while (k < len) { d += a(k) * b(k); k += 1 }
    a.foreach(x => na += x * x); b.foreach(x => nb += x * x)
    d / math.sqrt((na * nb).toDouble)
  }

  test("semdedup_kmeans verdicts match a brute-force check within its own clusters") {
    val out = SparkEntry.queries("semdedup_kmeans")(spark, sf).collect()
    assert(out.length == Tables.embeddings(spark, sf).count())
    val verdicts = out.map(r => r.getLong(0) ->
      ((r.getInt(1), r.getBoolean(2), r.getDouble(3)))).toMap
    // independent quantization of every vector
    val vecs = Tables.embeddings(spark, sf)
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toArray).toMap
    // group by the clustering the query itself produced, then brute-check
    verdicts.groupBy(_._2._1).foreach { case (_, members) =>
      val ids = members.keys.toArray.sorted
      ids.zipWithIndex.foreach { case (id, j) =>
        val best = ids.take(j).foldLeft(-1.0) { (b, prior) =>
          val s = cosine(vecs(prior), vecs(id))
          if (java.lang.Double.compare(s, b) > 0) s else b
        }
        val (_, keep, priorSim) = verdicts(id)
        assert(keep == (best < 0.35), s"vec $id keep mismatch (best=$best)")
        assert(java.lang.Double.compare(priorSim, best) == 0,
          s"vec $id prior_sim ${priorSim} != brute $best")
      }
    }
    // drops must actually occur for the test to mean anything
    assert(out.count(!_.getBoolean(2)) > 0, "fixture should produce drops")
  }

  test("semdedup_kmeans is deterministic across runs (seeded clustering)") {
    val a = SparkEntry.queries("semdedup_kmeans")(spark, sf).collect().map(_.toString)
    val b = SparkEntry.queries("semdedup_kmeans")(spark, sf).collect().map(_.toString)
    assert(a.sameElements(b), "seeded k-means semdedup must be reproducible")
  }

  test("semdedup_kmeans matches the committed golden assignments (pin across Spark upgrades)") {
    // The no-oracle CORRECTNESS row is rows-only; this golden file is
    // its determinism pin: if a Spark/spark.ml upgrade changes the
    // seeded KMeans trajectory (init sampling, tie-breaks), this fails
    // LOUDLY and the golden must be consciously regenerated, instead
    // of the row silently meaning something new. Full double bits via
    // Double.toString round-trip.
    val goldenSrc = scala.io.Source.fromInputStream(
      getClass.getResourceAsStream("/golden/semdedup_kmeans_sf0.001.csv"))
    val golden = try goldenSrc.getLines().drop(1).map { line =>
      val Array(v, c, k, s) = line.split(",", 4)
      (v.toLong, c.toInt, k.toBoolean, s)
    }.toSeq finally goldenSrc.close()
    val got = SparkEntry.queries("semdedup_kmeans")(spark, "/root/testdata/sf0.001")
      .collect().map { r =>
        val sim = if (r.isNullAt(3)) "null" else r.getDouble(3).toString
        (r.getLong(0), r.getInt(1), r.getBoolean(2), sim)
      }.toSeq
    assert(got.size == golden.size, s"row count ${got.size} vs golden ${golden.size}")
    got.zip(golden).foreach { case (g, w) =>
      assert(g == w, s"golden mismatch at vec ${w._1}: got $g want $w")
    }
  }
}
