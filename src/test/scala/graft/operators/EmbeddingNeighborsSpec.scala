package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Blocked exact best-neighbor kernel: block-count invariance, label
  * filtering, and NaN (zero-norm) parity with the expression form it
  * replaced. */
class EmbeddingNeighborsSpec extends SparkSpec {

  private def mkEmb(rows: Seq[(Long, Seq[Float], Int)]) = {
    import spark.implicits._
    rows.toDF("vec_id", "embedding", "label")
  }

  test("results are invariant to block count (1, 3, 16 blocks identical)") {
    val emb = mkEmb((0L until 40L).map { i =>
      (i, Seq.tabulate(8)(k => ((i + k * 7) % 13).toFloat / 13f), (i % 3).toInt)
    })
    val forms = Seq(1, 3, 16).map(b =>
      EmbeddingNeighbors.bestNeighbor(emb, crossLabelOnly = false, numBlocks = b)
        .orderBy("vec_id").collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2))).toSeq)
    assert(forms(0) == forms(1) && forms(1) == forms(2),
      "block partitioning must not change exact results")
  }

  test("crossLabelOnly: best neighbor always carries a different label") {
    val emb = mkEmb((0L until 30L).map { i =>
      (i, Seq.tabulate(8)(k => ((i * 3 + k) % 11).toFloat / 11f), (i % 2).toInt)
    })
    val labels = emb.collect().map(r => r.getLong(0) -> r.getInt(2)).toMap
    val got = EmbeddingNeighbors.bestNeighbor(emb, crossLabelOnly = true).collect()
    assert(got.length == 30)
    got.foreach { r =>
      assert(labels(r.getLong(0)) != labels(r.getLong(1)),
        s"vec ${r.getLong(0)} matched same-label ${r.getLong(1)}")
    }
  }

  test("crossLabelOnly: null-label vectors join NO pair (SQL <> semantics)") {
    import spark.implicits._
    // vec 2 (null label) is the nearest vector to everything; under
    // `a.label <> b.label` SQL semantics it must appear in no pair —
    // neither as a source row nor as anyone's candidate
    val emb = Seq(
      (0L, Seq(1f, 0f, 0f, 0f), Some(0)),
      (1L, Seq(0.9f, 0.1f, 0f, 0f), Some(1)),
      (2L, Seq(0.95f, 0.05f, 0f, 0f), None),
      (3L, Seq(0f, 1f, 0f, 0f), Some(0))
    ).toDF("vec_id", "embedding", "label")
    val got = EmbeddingNeighbors.bestNeighbor(emb, crossLabelOnly = true)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(!got.contains(2L), "null-label vector must emit no source row")
    assert(!got.values.exists(_ == 2L), "null-label vector must never be a candidate")
    assert(got(0L) == 1L && got(3L) == 1L && got(1L) == 0L, s"got $got")
    // near-dup mode ignores labels entirely: all four vectors pair up
    val all = EmbeddingNeighbors.bestNeighbor(emb, crossLabelOnly = false)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(all.keySet == Set(0L, 1L, 2L, 3L) && all(0L) == 2L)
  }

  test("zero-norm vectors rank NaN-greatest (parity with the replaced max(struct) plan)") {
    // vec 0 is all-zero after floor(x*1000) quantization -> every pair
    // with it has sim 0/0 = NaN; Spark's max(struct) ordering put NaN
    // above every finite sim, so vec 1/2's best match must be vec 0,
    // and vec 0 itself reports a NaN best (tie-broken to lowest id)
    val emb = mkEmb(Seq(
      (0L, Seq.fill(4)(0.0001f), 0),
      (1L, Seq(1f, 0f, 0f, 0f), 1),
      (2L, Seq(0.9f, 0.1f, 0f, 0f), 2)))
    val got = EmbeddingNeighbors.bestNeighbor(emb, crossLabelOnly = false)
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got(1L)._1 == 0L && got(1L)._2.isNaN, s"vec 1 best: ${got(1L)}")
    assert(got(2L)._1 == 0L && got(2L)._2.isNaN, s"vec 2 best: ${got(2L)}")
    assert(got(0L)._1 == 1L && got(0L)._2.isNaN, s"vec 0 best: ${got(0L)}")
  }

  test("topKNeighbors: block invariance + JVM brute-force top-3 parity") {
    val rows = (0L until 30L).map { i =>
      (i, Seq.tabulate(8)(k => ((i * 5 + k * 3) % 17).toFloat / 17f), 0)
    }
    val emb = mkEmb(rows)
    // brute force with the kernel's exact arithmetic: quantize
    // floor(x*1000) to long, integer dot, sim = dot / sqrt(na*nb)
    val q = rows.map { case (id, v, _) =>
      id -> v.map(x => math.floor(x.toDouble * 1000).toLong).toArray
    }.toMap
    val n = q.map { case (id, a) => id -> a.map(x => x * x).sum }
    def sim(a: Long, b: Long): Double = {
      val d = q(a).zip(q(b)).map { case (x, y) => x * y }.sum
      d / math.sqrt(n(a).toDouble * n(b).toDouble)
    }
    val expect = rows.map(_._1).flatMap { a =>
      rows.map(_._1).filter(_ != a)
        .map(b => (b, sim(a, b)))
        .sortBy { case (b, s) => (-s, b) }
        .take(3).zipWithIndex
        .map { case ((b, s), p) => (a, p + 1, b, s) }
    }.toSeq
    val forms = Seq(1, 4, 16).map(bl =>
      EmbeddingNeighbors.topKNeighbors(emb, 3, numBlocks = bl)
        .orderBy("vec_id", "rn").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq)
    assert(forms(0) == expect, "top-3 graph must equal the brute-force ranking")
    assert(forms(0) == forms(1) && forms(1) == forms(2),
      "block partitioning must not change the graph")
  }

  test("topKNeighbors: corpora smaller than k+1 emit fewer rows, no padding") {
    val emb = mkEmb(Seq(
      (0L, Seq(1f, 0f, 0f, 0f), 0),
      (1L, Seq(0.9f, 0.1f, 0f, 0f), 0)))
    val got = EmbeddingNeighbors.topKNeighbors(emb, 3)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2)))
    assert(got.toSet == Set((0L, 1, 1L), (1L, 1, 0L)),
      s"2 vectors → exactly one rank-1 neighbor each, got ${got.toSeq}")
  }

  test("topKNeighbors crossLabelOnly: brute parity + every neighbor is other-label") {
    val rows = (0L until 30L).map { i =>
      (i, Seq.tabulate(8)(k => ((i * 5 + k * 3) % 17).toFloat / 17f), (i % 2).toInt)
    }
    val emb = mkEmb(rows)
    val q = rows.map { case (id, v, _) =>
      id -> v.map(x => math.floor(x.toDouble * 1000).toLong).toArray
    }.toMap
    val n = q.map { case (id, a) => id -> a.map(x => x * x).sum }
    val lab = rows.map(r => r._1 -> r._3).toMap
    def sim(a: Long, b: Long): Double = {
      val d = q(a).zip(q(b)).map { case (x, y) => x * y }.sum
      d / math.sqrt(n(a).toDouble * n(b).toDouble)
    }
    val expect = rows.map(_._1).flatMap { a =>
      rows.map(_._1).filter(b => b != a && lab(b) != lab(a))
        .map(b => (b, sim(a, b)))
        .sortBy { case (b, s) => (-s, b) }
        .take(3).zipWithIndex
        .map { case ((b, s), p) => (a, p + 1, b, s) }
    }.toSeq
    val forms = Seq(1, 4, 16).map(bl =>
      EmbeddingNeighbors.topKNeighbors(emb, 3, numBlocks = bl, crossLabelOnly = true)
        .orderBy("vec_id", "rn").collect()
        .map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3))).toSeq)
    assert(forms(0) == expect, "cross-label top-3 must equal the brute ranking")
    assert(forms(0) == forms(1) && forms(1) == forms(2),
      "block partitioning must not change the cross-label graph")
  }

  test("bitext_margin_topk: margins equal the brute ratio-margin on the sf corpus") {
    val rows = graft.Tables.embeddings(spark, sf)
      .filter(col("label").isNotNull).collect()
      .map(r => (r.getLong(0),
        r.getSeq[Float](1).map(x => math.floor(x.toDouble * 1000).toLong).toArray,
        if (r.getAs[Number](2).intValue >= 5) 1 else 0))
    val n = rows.map { case (id, a, _) => id -> a.map(x => x * x).sum }.toMap
    val side = rows.map(r => r._1 -> r._3).toMap
    val q = rows.map(r => r._1 -> r._2).toMap
    def sim(a: Long, b: Long): Double = {
      val d = q(a).zip(q(b)).map { case (x, y) => x * y }.sum
      d / math.sqrt(n(a).toDouble * n(b).toDouble)
    }
    val ids = rows.map(_._1)
    // top-4 cross-side neighborhood per vector, kernel tiebreak order
    val top4 = ids.map { a =>
      a -> ids.filter(b => side(b) != side(a))
        .map(b => (b, sim(a, b))).sortBy { case (b, s) => (-s, b) }.take(4)
    }.toMap
    // explicit left-associated sum — the parity-pinned accumulation order
    def hd(a: Long): Double = {
      val s = top4(a).map(_._2)
      (((s(0) + s(1)) + s(2)) + s(3)) / 8.0
    }
    val expect = ids.filter(side(_) == 0).map { a =>
      val (b, s) = top4(a).head
      (a, b, s, s / (hd(a) + hd(b)))
    }.sortBy { case (a, _, _, m) => (-m, a) }.take(BitextOps.TopPairs)
    val got = BitextOps.marginTopK(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3))).toSeq
    assert(got == expect.toSeq,
      s"mined pairs diverge from brute margin: got ${got.take(3)}… expect ${expect.take(3)}…")
  }
}
