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
