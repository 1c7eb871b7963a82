package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** ANN paths validated against the brute-force ranking. */
class AnnSpec extends SparkSpec {

  test("ann_lsh reranks exactly: sims match brute-force double cosine for returned ids") {
    val brute = SimilarityOps.queries("ann_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    val lsh = SimilarityOps.queries("ann_lsh")(spark, sf).collect()
    assert(lsh.nonEmpty, "LSH must return candidates on this data")
    // quantized (oracle) vs double cosine differ in the 4th decimal at
    // most with 1e-3 quantization on unit-scale data
    lsh.foreach { r =>
      val (id, sim) = (r.getLong(0), r.getDouble(1))
      brute.get(id).foreach(bq => assert(math.abs(bq - sim) < 5e-3,
        s"vec $id: lsh sim $sim vs quantized brute $bq"))
    }
    // sims sorted descending
    val sims = lsh.map(_.getDouble(1)).toSeq
    assert(sims == sims.sorted.reverse)
  }

  test("ann_ivf_probe returns a valid ranking from probed labels only") {
    val out = SimilarityOps.queries("ann_ivf_probe")(spark, sf).collect()
    assert(out.nonEmpty && out.length <= 10)
    val sims = out.map(_.getDouble(2)).toSeq
    assert(sims == sims.sorted.reverse)
    assert(sims.forall(s => s >= -1.0001 && s <= 1.0001))
    assert(out.map(_.getInt(1)).distinct.length <= 2, "at most 2 probed labels")
  }

  test("ann_pq: exact-reranked candidates, deterministic, recalls the brute-force head") {
    val pq = SimilarityOps2.queries("ann_pq")(spark, sf).collect()
    assert(pq.nonEmpty && pq.length <= 10)
    // reranked sims are exact double cosine — identical to brute force
    // (to quantization tolerance) for every returned id
    val brute = SimilarityOps.queries("ann_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    pq.foreach { r =>
      brute.get(r.getLong(0)).foreach(bq =>
        assert(math.abs(bq - r.getDouble(1)) < 5e-3))
    }
    // candidate funnel keeps real recall: the approx-top-50 must
    // contain at least half of the true top-10
    val hit = pq.map(_.getLong(0)).toSet.intersect(brute.keySet).size
    assert(hit >= 5, s"PQ recall@10 too low: $hit/10")
    // content-hash codebook ⇒ bit-identical reruns
    val rerun = SimilarityOps2.queries("ann_pq")(spark, sf).collect()
    assert(pq.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      rerun.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  test("ann_pq8: at-rest index serves the shipping operating point deterministically") {
    val pq8 = SimilarityOps2.queries("ann_pq8")(spark, sf).collect()
    assert(pq8.nonEmpty && pq8.length <= 10)
    val brute = SimilarityOps.queries("ann_topk")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap
    // exact rerank: returned sims match brute force to quantization tol
    pq8.foreach { r =>
      brute.get(r.getLong(0)).foreach(bq =>
        assert(math.abs(bq - r.getDouble(1)) < 5e-3))
    }
    // the shipping floor: the PQ8 funnel must recall >= 8 of the true
    // top-10 for the deployed query vector (m=4's floor is 5)
    val hit = pq8.map(_.getLong(0)).toSet.intersect(brute.keySet).size
    assert(hit >= 8, s"PQ8 recall@10 below shipping floor: $hit/10")
    val rerun = SimilarityOps2.queries("ann_pq8")(spark, sf).collect()
    assert(pq8.map(r => (r.getLong(0), r.getDouble(1))).toSeq ==
      rerun.map(r => (r.getLong(0), r.getDouble(1))).toSeq)
  }

  // ---- per-index quality grading (ann_eval_*) -------------------------
  // The grading itself is pinned against an INDEPENDENT driver-side
  // intersection of the index leg and the exact leg; floors reflect the
  // measured quality ladder at this corpus (PQ reranks a top-100 funnel
  // over the full code scan > IVF nprobe=2 > SRP-16 hamming≤2, which
  // trades recall for a 0.2%-of-corpus probe footprint).

  private def recalls(name: String): Map[Long, Double] =
    AnnEval.queries(name)(spark, sf).select("qid", "recall")
      .collect().map(r => r.getLong(0) -> r.getDouble(1)).toMap

  private def pinEval(name: String, topK: (org.apache.spark.sql.SparkSession, String) => org.apache.spark.sql.DataFrame): Unit = {
    val graded = AnnEval.queries(name)(spark, sf).collect()
    assert(graded.length == 16, s"$name must emit all 16 query rows")
    val exact = RetrievalOps2.rankedTopK(spark, sf)
      .select("qid", "vec_id").collect()
      .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val ann = topK(spark, sf)
      .select("qid", "vec_id", "rn").collect()
      .groupBy(_.getLong(0)).view
      .mapValues(_.map(r => r.getLong(1) -> r.getInt(2)).toMap).toMap
    graded.foreach { r =>
      val (qid, nRet, hits, dcgS) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))
      val annQ = ann.getOrElse(qid, Map.empty[Long, Int])
      val inter = annQ.keySet.intersect(exact.getOrElse(qid, Set.empty))
      assert(nRet == annQ.size, s"$name $qid n_returned")
      assert(hits == inter.size, s"$name $qid: hits $hits != |∩| ${inter.size}")
      val wantDcg = inter.toSeq.map(v => RetrievalOps2.DcgW(annQ(v) - 1)).sum
      assert(dcgS == wantDcg, s"$name $qid: dcg_s $dcgS != $wantDcg")
      assert(r.getDouble(4) == hits.toDouble / 10.0)
      assert(r.getDouble(5) == dcgS.toDouble / RetrievalOps2.IdcgPrefix.last.toDouble)
      assert(nRet <= 10 && hits <= nRet)
    }
  }

  test("ann_eval_lsh: grading == independent intersection of legs") {
    pinEval("ann_eval_lsh", (s, d) => AnnEval.lshTopK(s, d))
  }

  test("LSH recall dials are monotone: wider probe radius and a second table only add recall") {
    pinEval("ann_eval_lsh_r3", (s, d) => AnnEval.lshTopK(s, d, radius = 3))
    pinEval("ann_eval_lsh_2t", (s, d) => AnnEval.lshTopK(s, d, tables = 2))
    val base = recalls("ann_eval_lsh")
    val r3 = recalls("ann_eval_lsh_r3")
    val t2 = recalls("ann_eval_lsh_2t")
    // candidate sets are supersets of the base probe's, and an exact
    // top-10 member can never be displaced from a candidate-set top-10
    // (at most 9 corpus vectors rank above it) — so recall is monotone
    // PER QUERY, not just on average
    base.foreach { case (qid, r) =>
      assert(r3(qid) >= r, s"radius 3 lost recall on qid $qid: ${r3(qid)} < $r")
      assert(t2(qid) >= r, s"second table lost recall on qid $qid: ${t2(qid)} < $r")
    }
    // and the wider probes must actually BUY something on this corpus
    assert(r3.values.sum > base.values.sum,
      s"radius 3 bought no recall: ${r3.values.sum} vs ${base.values.sum}")
    assert(t2.values.sum > base.values.sum,
      s"second table bought no recall: ${t2.values.sum} vs ${base.values.sum}")
    // the grid corner dominates BOTH single dials per query (its
    // candidate set is the union of theirs and more)
    pinEval("ann_eval_lsh_r3_2t", (s, d) =>
      AnnEval.lshTopK(s, d, radius = 3, tables = 2))
    val corner = recalls("ann_eval_lsh_r3_2t")
    base.keys.foreach { qid =>
      assert(corner(qid) >= r3(qid) && corner(qid) >= t2(qid),
        s"grid corner lost recall on qid $qid: ${corner(qid)} vs r3 ${r3(qid)} / 2t ${t2(qid)}")
    }
  }

  test("ann_eval_ivf: grading pinned; nprobe=2 recall floor holds") {
    pinEval("ann_eval_ivf", (s, d) => AnnEval.ivfTopK(s, d))
    val mean = AnnEval.queries("ann_eval_ivf")(spark, sf)
      .agg(avg("recall")).first().getDouble(0)
    assert(mean >= 0.1, s"IVF mean recall@10 collapsed: $mean")
  }

  test("IVF nprobe dial is monotone: 4 probed lists never lose recall vs 2") {
    pinEval("ann_eval_ivf_np4", (s, d) => AnnEval.ivfTopK(s, d, nprobe = 4))
    val np2 = recalls("ann_eval_ivf")
    val np4 = recalls("ann_eval_ivf_np4")
    np2.foreach { case (qid, r) =>
      assert(np4(qid) >= r, s"nprobe 4 lost recall on qid $qid: ${np4(qid)} < $r")
    }
  }

  test("ann_eval_pq: grading pinned; rerank-funnel recall floor holds") {
    pinEval("ann_eval_pq", AnnEval.pqTopK)
    val mean = AnnEval.queries("ann_eval_pq")(spark, sf)
      .agg(avg("recall")).first().getDouble(0)
    assert(mean >= 0.4, s"PQ mean recall@10 collapsed: $mean")
  }

  test("ann_eval_pq_m8: the shipping operating point holds mean recall@10 >= 0.8") {
    pinEval("ann_eval_pq_m8", AnnEval.pqTopK8)
    val mean = AnnEval.queries("ann_eval_pq_m8")(spark, sf)
      .agg(avg("recall")).first().getDouble(0)
    assert(mean >= 0.8, s"PQ8 mean recall@10 below the shipping floor: $mean")
    // and the finer codebook must dominate the m=4 point on average —
    // the reason this dial exists
    val m4 = AnnEval.queries("ann_eval_pq")(spark, sf)
      .agg(avg("recall")).first().getDouble(0)
    assert(mean > m4, s"PQ8 ($mean) did not improve on PQ m=4 ($m4)")
  }

  test("ann_eval_ivfpq: composed IVFADC graded; np16 clears the 0.8 floor at half the code bytes") {
    pinEval("ann_eval_ivfpq", (s, d) => AnnEval.ivfpqTopK(s, d))
    pinEval("ann_eval_ivfpq_np16", (s, d) => AnnEval.ivfpqTopK(s, d, nprobe = 16))
    def mean(name: String) = AnnEval.queries(name)(spark, sf)
      .agg(avg("recall")).first().getDouble(0)
    val np8 = mean("ann_eval_ivfpq")
    val np16 = mean("ann_eval_ivfpq_np16")
    assert(np8 >= 0.5, s"IVFPQ np8 mean recall collapsed: $np8")
    // the second shipping-grade point: measured 0.83-0.88 across SFs
    // while partition pruning drops half the code bytes. The FLOOR is
    // 0.75, deliberately below the 0.8 shipping claim: the tightest
    // measured SF sits at 0.831, and a hard 0.8 assert would flake on
    // sampling noise rather than catch regressions (docs state this).
    assert(np16 >= 0.75, s"IVFPQ np16 below its floor: $np16")
    // MEAN ordering only: under a fixed 100-slot ADC funnel the wider
    // probe is not per-query monotone (extra cells' codes can evict a
    // true neighbor from the funnel by approx score), so the per-query
    // assert the exact-candidate LSH/IVF dials carry would be wrong here
    assert(np16 > np8, s"wider probe bought no mean recall: $np16 vs $np8")
  }

  test("brute-force top-1 is the global argmax of quantized cosine") {
    val top = SimilarityOps.queries("ann_topk")(spark, sf).first()
    val all = DedupOps.quantized(Tables.embeddings(spark, sf))
    val q = all.filter(col("vec_id") === 0)
      .select(col("q").as("qq"), col("n").as("nq"))
    val best = all.filter(col("vec_id") =!= 0).crossJoin(broadcast(q))
      .withColumn("dot", expr(
        "aggregate(zip_with(q, qq, (x, y) -> x * y), CAST(0 AS BIGINT), (acc, v) -> acc + v)"))
      .withColumn("sim", col("dot") / sqrt((col("n") * col("nq")).cast("double")))
      .agg(max(col("sim"))).first().getDouble(0)
    assert(top.getDouble(1) == best)
  }
}
