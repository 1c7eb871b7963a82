package graft.operators

import graft.{SparkSpec, Tables}

/** Semantics invariants for the sparse-cosine tranche. */
class SimilarityOps3Spec extends SparkSpec {

  test("sparse cosine top-10 matches a local idf-weighted recompute") {
    val docs = Tables.documents(spark, sf).select("doc_id", "text").collect()
      .map(r => (r.getLong(0), r.getString(1)))
    def shingles(t: String): Set[String] = {
      val w = t.split(" ", -1)
      if (w.length < 3) Set.empty
      else (0 to w.length - 3).map(i => w.slice(i, i + 3).mkString(" ")).toSet
    }
    val sets = docs.map { case (id, t) => id -> shingles(t) }.toMap
    val df = scala.collection.mutable.Map.empty[String, Long]
    for (s <- sets.values; g <- s) df(g) = df.getOrElse(g, 0L) + 1
    val n = docs.length.toLong
    def w(g: String): Long = 1000L * n / df(g)
    val norms = sets.map { case (id, s) => id -> s.toSeq.map(g => w(g) * w(g)).sum }
    val ids = sets.keys.toSeq.sorted
    val pairs = for {
      i <- ids.indices; j <- i + 1 until ids.length
      da = ids(i); db = ids(j)
      shared = sets(da) & sets(db) if shared.nonEmpty
    } yield {
      val dot = shared.toSeq.map(g => w(g) * w(g)).sum
      (da, db, dot.toDouble / (math.sqrt(norms(da).toDouble) * math.sqrt(norms(db).toDouble)))
    }
    val want = pairs.sortBy { case (da, db, c) => (-c, da, db) }.take(10)
    val got = SimilarityOps3.queries("sparse_cosine_topk")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq
    assert(got.map(p => (p._1, p._2)) == want.map(p => (p._1, p._2)),
      s"pair ranking diverges:\n got $got\n want $want")
    got.zip(want).foreach { case (g, e) =>
      assert(math.abs(g._3 - e._3) < 1e-12, s"cosine drift on ${(g._1, g._2)}")
    }
    assert(got.forall(p => p._3 > 0 && p._3 <= 1.0 + 1e-12))
  }

  test("maxsim: the query vectors' own doc scores highest (self-retrieval)") {
    val top = SimilarityOps3.queries("maxsim_topk")(spark, sf).collect()
    assert(top.length == 10)
    // doc 0 contains the query vectors themselves: each query's best
    // match there is its own (maximal) self dot product
    assert(top.head.getLong(0) == 0L,
      s"doc 0 must win self-retrieval, got doc ${top.head.getLong(0)}")
    val scores = top.map(_.getLong(1))
    assert(scores.sameElements(scores.sorted.reverse), "must be score-descending")
  }
}
