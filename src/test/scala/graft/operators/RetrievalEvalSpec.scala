package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Retrieval-eval metrics brute-verified at sf0.001: an independent
  * in-memory exact-cosine ranking recomputes recall@10 / NDCG@10 / MRR
  * and every per-query value must match bit-for-bit. */
class RetrievalEvalSpec extends SparkSpec {

  private case class Vec(id: Long, label: Int, q: Array[Long], n: Long)

  private lazy val vecs: Array[Vec] = Tables.embeddings(spark, sf)
    .select(col("vec_id"), col("label"),
      expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000) AS BIGINT))"))
    .collect()
    .map { r =>
      val q = r.getSeq[Long](2).toArray
      Vec(r.getLong(0), r.getInt(1), q, q.map(x => x * x).sum)
    }
    .sortBy(_.id)

  private lazy val queryIds: Array[Long] =
    vecs.map(_.id).filter(_ % 7 == 3).sorted.take(RetrievalOps2.NQueries)

  /** (qid, top-10 neighbor (id, label, rank)) by exact quantized cosine. */
  private lazy val topk: Map[Long, Array[(Long, Int, Int)]] = {
    val byId = vecs.map(v => v.id -> v).toMap
    queryIds.map { qid =>
      val qv = byId(qid)
      val ranked = vecs.filter(_.id != qid).map { v =>
        var dot = 0L
        var k = 0
        while (k < v.q.length) { dot += v.q(k) * qv.q(k); k += 1 }
        (v.id, v.label, dot / math.sqrt((v.n * qv.n).toDouble))
      }.sortBy { case (id, _, sim) => (-sim, id) }.take(RetrievalOps2.K)
      qid -> ranked.zipWithIndex.map { case ((id, l, _), i) => (id, l, i + 1) }
    }.toMap
  }

  private lazy val labelCount: Map[Int, Long] =
    vecs.groupBy(_.label).map { case (l, vs) => l -> vs.length.toLong }

  test("eval_recall_at_k matches the brute-force ranking bit-for-bit") {
    val rows = SparkEntry.queries("eval_recall_at_k")(spark, sf).collect()
    assert(rows.length == queryIds.length)
    val byId = vecs.map(v => v.id -> v).toMap
    rows.foreach { r =>
      val qid = r.getLong(0)
      val qlabel = byId(qid).label
      val hits = topk(qid).count(_._2 == qlabel).toLong
      val cap = math.min(labelCount(qlabel) - 1, RetrievalOps2.K.toLong)
      assert(r.getLong(1) == hits, s"q$qid hits")
      assert(r.getLong(2) == cap, s"q$qid n_rel_cap")
      assert(java.lang.Double.compare(
        r.getDouble(3), hits.toDouble / cap.toDouble) == 0, s"q$qid recall")
    }
  }

  test("eval_ndcg_at_k matches the scaled-integer DCG brute force") {
    val rows = SparkEntry.queries("eval_ndcg_at_k")(spark, sf).collect()
    assert(rows.length == queryIds.length)
    val byId = vecs.map(v => v.id -> v).toMap
    rows.foreach { r =>
      val qid = r.getLong(0)
      val qlabel = byId(qid).label
      val dcg = topk(qid).filter(_._2 == qlabel)
        .map { case (_, _, rank) => RetrievalOps2.DcgW(rank - 1) }.sum
      val m = math.min(labelCount(qlabel) - 1, RetrievalOps2.K.toLong).toInt
      val idcg = if (m == 0) 0L else RetrievalOps2.IdcgPrefix(m - 1)
      assert(r.getLong(1) == dcg, s"q$qid dcg_s")
      assert(r.getLong(2) == idcg, s"q$qid idcg_s")
      val expected = if (idcg > 0) dcg.toDouble / idcg.toDouble else 0.0
      assert(java.lang.Double.compare(r.getDouble(3), expected) == 0,
        s"q$qid ndcg")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("eval_map_at_k matches the brute-force average precision") {
    val rows = SparkEntry.queries("eval_map_at_k")(spark, sf).collect()
    assert(rows.length == queryIds.length)
    val byId = vecs.map(v => v.id -> v).toMap
    rows.foreach { r =>
      val qid = r.getLong(0)
      val qlabel = byId(qid).label
      var hits = 0L
      var apS = 0L
      topk(qid).foreach { case (_, l, rank) =>
        if (l == qlabel) {
          hits += 1
          apS += RetrievalOps2.MrrScale * hits / rank
        }
      }
      val cap = math.min(labelCount(qlabel) - 1, RetrievalOps2.K.toLong)
      assert(r.getLong(1) == apS, s"q$qid ap_s")
      assert(r.getLong(2) == cap, s"q$qid n_rel_cap")
      val expected = apS.toDouble / (RetrievalOps2.MrrScale.toDouble * cap)
      assert(java.lang.Double.compare(r.getDouble(3), expected) == 0, s"q$qid ap")
      assert(r.getDouble(3) >= 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("eval_mrr_at_k matches the brute-force first-relevant ranks") {
    val row = SparkEntry.queries("eval_mrr_at_k")(spark, sf).collect().head
    val byId = vecs.map(v => v.id -> v).toMap
    val rrSum = queryIds.map { qid =>
      val qlabel = byId(qid).label
      topk(qid).find(_._2 == qlabel)
        .map { case (_, _, rank) => RetrievalOps2.MrrScale / rank }
        .getOrElse(0L)
    }.sum
    assert(row.getLong(0) == queryIds.length.toLong)
    assert(row.getLong(1) == rrSum)
    val expected = rrSum.toDouble /
      (RetrievalOps2.MrrScale.toDouble * queryIds.length)
    assert(java.lang.Double.compare(row.getDouble(2), expected) == 0)
    assert(row.getDouble(2) >= 0.0 && row.getDouble(2) <= 1.0)
  }

  test("emb_matryoshka_audit matches a brute-force truncated re-ranking") {
    val rows = SparkEntry.queries("emb_matryoshka_audit")(spark, sf).collect()
    assert(rows.length == queryIds.length)
    val m = RetrievalOps2.TruncDims
    val tvecs = vecs.map(v => Vec(v.id, v.label, v.q.take(m),
      v.q.take(m).map(x => x * x).sum)).filter(_.n > 0)
    val byId = tvecs.map(v => v.id -> v).toMap
    val tQueryIds = tvecs.map(_.id).filter(_ % 7 == 3).sorted.take(RetrievalOps2.NQueries)
    val truncTop: Map[Long, Set[Long]] = tQueryIds.map { qid =>
      val qv = byId(qid)
      qid -> tvecs.filter(_.id != qid).map { v =>
        var dot = 0L; var k = 0
        while (k < v.q.length) { dot += v.q(k) * qv.q(k); k += 1 }
        (v.id, dot / math.sqrt((v.n * qv.n).toDouble))
      }.sortBy { case (id, sim) => (-sim, id) }
        .take(RetrievalOps2.K).map(_._1).toSet
    }.toMap
    rows.foreach { r =>
      val qid = r.getLong(0)
      val fullSet = topk(qid).map(_._1).toSet
      val expected = truncTop.get(qid).map(t => (fullSet & t).size.toLong).getOrElse(0L)
      assert(r.getLong(1) == expected, s"q$qid overlap")
      val jac = expected.toDouble / (2L * RetrievalOps2.K - expected).toDouble
      assert(java.lang.Double.compare(r.getDouble(2), jac) == 0, s"q$qid jaccard")
      assert(r.getLong(1) >= 0 && r.getLong(1) <= RetrievalOps2.K)
    }
  }

  test("DCG discount constants are round(2^20 / log2(r+1)) with exact prefix sums") {
    RetrievalOps2.DcgW.zipWithIndex.foreach { case (w, i) =>
      val expect = math.round(math.pow(2, 20) / (math.log(i + 2) / math.log(2)))
      assert(w == expect, s"rank ${i + 1}")
    }
    assert(RetrievalOps2.IdcgPrefix == RetrievalOps2.DcgW.scanLeft(0L)(_ + _).tail)
  }
}
