package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantic checks for the round-3 operator tranche (RelationalOps3 /
  * TextOps3 / SimilarityOps2) beyond the generic runs-and-returns-rows
  * smoke — each query's defining invariant, validated against an
  * independent formulation. */
class Ops3Spec extends SparkSpec {

  test("stats_exact_moments matches built-in stddev_pop/corr to 1e-9") {
    val got = RelationalOps3.queries("stats_exact_moments")(spark, sf)
      .collect().map(r => r.getString(0) -> (r.getDouble(2), r.getDouble(3), r.getDouble(4))).toMap
    val ref = graft.Tables.lineitem(spark, sf)
      .select(col("l_returnflag"),
        (floor(col("l_quantity") * 100) / 100.0).as("x"),
        (floor(col("l_extendedprice") * 100) / 100.0).as("y"))
      .groupBy("l_returnflag")
      .agg(stddev_pop("x").as("sx"), stddev_pop("y").as("sy"),
        corr("x", "y").as("c"))
      .collect().map(r => r.getString(0) -> (r.getDouble(1), r.getDouble(2), r.getDouble(3))).toMap
    assert(got.keySet == ref.keySet)
    for ((k, (sq, sp, c)) <- got) {
      val (rsq, rsp, rc) = ref(k)
      assert(math.abs(sq - rsq) < 1e-9 * math.max(1, rsq.abs), s"stddev_qty $k")
      assert(math.abs(sp - rsp) < 1e-6 * math.max(1, rsp.abs), s"stddev_price $k")
      assert(math.abs(c - rc) < 1e-9, s"corr $k")
    }
  }

  test("window_lag_gap: one row per event, gaps non-negative, first-per-user null") {
    val ev = graft.Tables.events(spark, sf)
    val gaps = RelationalOps3.queries("window_lag_gap")(spark, sf)
    assert(gaps.count() == ev.count())
    assert(gaps.filter(col("gap_us") < 0).count() == 0)
    val nUsers = ev.select("user_id").distinct().count()
    assert(gaps.filter(col("gap_us").isNull).count() == nUsers)
  }

  test("ntile_quartiles: four buckets, sizes differ by at most 1, ranges ordered") {
    val rows = RelationalOps3.queries("ntile_quartiles")(spark, sf).collect()
    assert(rows.map(_.getInt(0)).toSeq == Seq(1, 2, 3, 4))
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1)
    val bounds = rows.map(r => (r.getDouble(2), r.getDouble(3)))
    bounds.sliding(2).foreach { case Array((_, hi1), (lo2, _)) => assert(hi1 <= lo2) }
  }

  test("median_mode_value: mode really is the max-frequency value") {
    val ev = graft.Tables.events(spark, sf)
    val counts = ev.groupBy(col("event_type").as("et"), col("value").as("v"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(true)
    val maxN = counts.groupBy(col("et").as("et2")).agg(max("c").as("mx"))
    val got = RelationalOps3.queries("median_mode_value")(spark, sf)
      .select("event_type", "mode_value")
    val joined = got
      .join(counts, col("event_type") === col("et") && col("mode_value") === col("v"))
      .join(maxN, col("event_type") === col("et2"))
    assert(joined.count() == got.count())
    assert(joined.filter(col("c") =!= col("mx")).count() == 0)
  }

  test("tfidf_topk: at most 3 ranked terms per doc, scores non-increasing") {
    val rows = RelationalOps3.queries.keySet // silence unused warning pattern
    val df = TextOps3.queries("tfidf_topk")(spark, sf).collect()
    assert(rows.nonEmpty)
    df.groupBy(_.getLong(0)).foreach { case (_, rs) =>
      assert(rs.length <= 3)
      val byRank = rs.sortBy(_.getInt(3)).map(_.getLong(2))
      byRank.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    }
  }

  test("doc_sample_hash is deterministic and a subset of documents") {
    val a = TextOps3.queries("doc_sample_hash")(spark, sf).collect().map(_.getLong(0)).sorted
    val b = TextOps3.queries("doc_sample_hash")(spark, sf).collect().map(_.getLong(0)).sorted
    assert(a.sameElements(b))
    val all = graft.Tables.documents(spark, sf).select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(a.forall(all.contains))
    // ~1/8 expected; allow wide slack, but it must be a PROPER sample
    assert(a.length > 0 && a.length < all.size / 2)
  }

  test("knn_join_topk: exactly 3 neighbors per query, never itself, sims sorted") {
    val rows = SimilarityOps2.queries("knn_join_topk")(spark, sf).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.keySet == Set(0L, 1L, 2L, 3L, 4L))
    for ((q, rs) <- byQ) {
      assert(rs.length == 3)
      assert(rs.forall(_.getLong(1) != q))
      val sims = rs.sortBy(_.getInt(3)).map(_.getDouble(2))
      sims.sliding(2).foreach { case Array(a, b) => assert(a >= b); case _ => }
    }
  }

  test("label_centroid_sim: cosine in [-1, 1], one row per vector") {
    val df = SimilarityOps2.queries("label_centroid_sim")(spark, sf)
    val n = graft.Tables.embeddings(spark, sf).count()
    assert(df.count() == n)
    assert(df.filter(col("cos_centroid") > 1.0 || col("cos_centroid") < -1.0).count() == 0)
  }
}
