package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class RetrievalOpsSpec extends SparkSpec {

  test("hybrid_rrf_topk fuses the two legs' ranks exactly") {
    // independently recompute the two candidate lists and the RRF sum
    // on the driver, then demand the operator's top-10 matches
    val sparse = TextOps5.bm25Scored(spark, sf)
      .filter(col("doc_id") =!= 0)
      .orderBy(col("score").desc, col("doc_id"))
      .limit(RetrievalOps.Depth)
      .collect().map(_.getLong(0))
    graft.functions.VectorFunctions.registerAll(spark)
    val q = DedupOps.quantized(graft.Tables.embeddings(spark, sf))
    val query = q.filter(col("vec_id") === 0)
      .select(col("q").as("qq"), col("n").as("nq"))
    val dense = q.filter(col("vec_id") =!= 0)
      .crossJoin(broadcast(query))
      .withColumn("dot", graft.functions.VectorFunctions.dot_i64(col("q"), col("qq")))
      .withColumn("sim", col("dot") / sqrt((col("n") * col("nq")).cast("double")))
      .orderBy(col("sim").desc, col("vec_id"))
      .limit(RetrievalOps.Depth)
      .select("vec_id").collect().map(_.getLong(0))
    val sRank = sparse.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val dRank = dense.zipWithIndex.map { case (id, i) => id -> (i + 1) }.toMap
    val want = (sRank.keySet ++ dRank.keySet).toSeq
      .map { id =>
        val r = sRank.get(id).map(r => 1.0 / (RetrievalOps.RrfK + r)).getOrElse(0.0) +
          dRank.get(id).map(r => 1.0 / (RetrievalOps.RrfK + r)).getOrElse(0.0)
        (id, r)
      }
      .sortBy { case (id, r) => (-r, id) }
      .take(10)
    val got = RetrievalOps.queries("hybrid_rrf_topk")(spark, sf)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(got == want, s"got $got want $want")
  }

  test("hybrid_rrf_topk never surfaces the query document or a stranger") {
    val got = RetrievalOps.queries("hybrid_rrf_topk")(spark, sf).collect()
    assert(got.length == 10)
    assert(!got.exists(_.getLong(0) == 0L), "query doc leaked into results")
    // every fused doc must carry a positive score from at least one leg
    assert(got.forall(_.getDouble(1) > 0.0))
  }

  test("dedup_rate_by_source ties out against dedup_exact") {
    val rates = RetrievalOps.queries("dedup_rate_by_source")(spark, sf).collect()
    val docs = graft.Tables.documents(spark, sf)
    val nDocs = docs.count()
    val nDups = DedupOps.queries("dedup_exact")(spark, sf)
      .filter(col("is_dup")).count()
    assert(rates.map(_.getLong(1)).sum == nDocs, "per-source docs don't sum to corpus")
    assert(rates.map(_.getLong(2)).sum == nDups, "per-source dups don't sum to dedup_exact")
    rates.foreach { r =>
      val (d, du, rate) = (r.getLong(1), r.getLong(2), r.getDouble(3))
      assert(rate == du.toDouble / d.toDouble, s"rate mismatch for ${r.getString(0)}")
      assert(du <= d)
    }
  }
}
