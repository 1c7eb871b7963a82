package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Governance tranche invariants (exact values are the DuckDB oracle's
  * job — these pin semantics and physical-plan shape). */
class GovernanceOpsSpec extends SparkSpec {

  private def q(name: String) = GovernanceOps.queries(name)(spark, sf)

  test("dq_check_report: six rules, pass flag consistent, violations recomputed") {
    val rows = q("dq_check_report").collect()
    assert(rows.length == 6)
    assert(rows.map(_.getLong(0)).toSeq == (0L to 5L))
    rows.foreach { r =>
      assert(r.getBoolean(4) == (r.getLong(3) == 0L),
        s"pass flag inconsistent on ${r.getString(1)}")
      assert(r.getLong(3) >= 0L && r.getLong(3) <= r.getLong(2))
    }
    // independent recompute of the one genuinely-violated rule
    val li = Tables.lineitem(spark, sf)
    val dupPk = li.count() -
      li.select("l_orderkey", "l_linenumber").distinct().count()
    val pkRow = rows.find(_.getString(1) == "lineitem_pk_unique").get
    assert(pkRow.getLong(3) == dupPk, "lineitem pk violations mismatch")
    assert(!pkRow.getBoolean(4), "synthetic lineitem pk is known-violated")
    // FK rule recomputed via the opposite join direction
    val fkOk = Tables.orders(spark, sf).join(
      Tables.customer(spark, sf),
      col("o_custkey") === col("c_custkey"), "left_semi").count()
    val fkRow = rows.find(_.getString(1) == "orders_fk_customer").get
    assert(fkRow.getLong(3) == fkRow.getLong(2) - fkOk)
  }

  test("kanon_quasi_id_audit: monotone risk in k, class census constant") {
    val rows = q("kanon_quasi_id_audit").collect().sortBy(_.getLong(0))
    assert(rows.map(_.getLong(0)).toSeq == GovernanceOps.KanonKs)
    assert(rows.map(_.getLong(1)).distinct.length == 1,
      "n_classes must not depend on k")
    val atRisk = rows.map(_.getLong(2))
    val rowsAtRisk = rows.map(_.getLong(3))
    assert(atRisk.zip(atRisk.tail).forall { case (a, b) => b >= a },
      "classes_at_risk must grow with k")
    assert(rowsAtRisk.zip(rowsAtRisk.tail).forall { case (a, b) => b >= a },
      "rows_at_risk must grow with k")
    val total = Tables.events(spark, sf).count()
    rows.foreach { r =>
      assert(r.getLong(3) <= total)
      assert(r.getLong(4) == r.getLong(3) * 1000000L / total,
        "risk_ppm must be the exact integer division")
    }
  }

  test("unigram_tv_drift: all source pairs, tv in [0,1], partitioning-independent") {
    val docs = Tables.documents(spark, sf)
    val nSrc = docs.select("source").distinct().count()
    val rows = q("unigram_tv_drift").collect()
    assert(rows.length == nSrc * (nSrc - 1) / 2, "one row per unordered pair")
    rows.foreach { r =>
      val tv = r.getDouble(4)
      assert(tv >= 0.0 && tv <= 1.0, s"tv out of range: $tv")
      assert(tv == r.getLong(2).toDouble / r.getLong(3).toDouble,
        "tv must be exactly tv_num/tv_den")
    }
    val reshard = GovernanceOps.unigramTvDrift(
      docs.repartition(7, col("n_chars"))).collect()
    assert(rows.map(_.toSeq).toSeq == reshard.map(_.toSeq).toSeq,
      "drift must be partitioning-independent")
  }

  test("unigram_tv_drift: one pair brute-forced from raw distributions") {
    val docs = Tables.documents(spark, sf)
    val counts = docs
      .select(col("source"), explode(split(col("text"), " ", -1)).as("word"))
      .filter(col("word") =!= "").groupBy("source", "word").count()
      .collect().map(r => (r.getString(0), r.getString(1)) -> r.getLong(2)).toMap
    val srcs = counts.keys.map(_._1).toSeq.distinct.sorted
    val (sa, sb) = (srcs.head, srcs(1))
    val pa = counts.collect { case ((s, w), c) if s == sa => w -> c }.toMap
    val pb = counts.collect { case ((s, w), c) if s == sb => w -> c }.toMap
    val (ta, tb) = (pa.values.sum, pb.values.sum)
    val num = (pa.keySet ++ pb.keySet).toSeq.map { w =>
      math.abs(pa.getOrElse(w, 0L) * tb - pb.getOrElse(w, 0L) * ta)
    }.sum
    val want = num.toDouble / (2.0 * ta * tb)
    val got = q("unigram_tv_drift").collect()
      .find(r => r.getString(0) == sa && r.getString(1) == sb).get
    assert(got.getLong(2) == num && got.getLong(3) == 2L * ta * tb)
    assert(got.getDouble(4) == want, s"tv($sa,$sb): ${got.getDouble(4)} != $want")
  }

  test("sample_upweight: conservation, bounds, inverse-size monotonicity") {
    val docs = Tables.documents(spark, sf)
    val rows = q("sample_upweight").collect()
    val perDoc = rows.groupBy(_.getLong(0))
    // every doc appears exactly n_epochs times with epochs 1..n_epochs
    perDoc.foreach { case (id, rs) =>
      val n = rs.head.getLong(3)
      assert(rs.length == n, s"doc $id: ${rs.length} rows for n_epochs=$n")
      assert(rs.map(_.getLong(2)).sorted.toSeq == (1L to n),
        s"doc $id epochs not 1..$n")
      assert(n >= 1L && n <= GovernanceOps.MaxEpochs)
    }
    assert(perDoc.size == docs.count(), "no doc dropped by the expansion")
    // smaller sources never get fewer epochs than larger ones
    val tok = docs.groupBy("source").agg(sum("n_chars").as("tok"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val eps = rows.groupBy(_.getString(1)).map { case (s, rs) =>
      s -> rs.head.getLong(3) }
    val maxTok = tok.values.max
    eps.foreach { case (s, n) =>
      val want = math.min(GovernanceOps.MaxEpochs,
        (maxTok + tok(s) - 1) / tok(s))
      assert(n == want, s"source $s: epochs $n != ceil rule $want")
    }
  }

  test("plans: upweight broadcasts the plan join; kanon single class census") {
    val up = q("sample_upweight")
    up.queryExecution.toRdd.count()
    val upPlan = up.queryExecution.executedPlan.toString
    assert(upPlan.contains("BroadcastHashJoin"),
      s"upweight must broadcast the per-source plan:\n$upPlan")
    assert(!upPlan.contains("SortMergeJoin"),
      s"upweight must not shuffle the corpus for a 20-row dim:\n$upPlan")
    val ka = q("kanon_quasi_id_audit")
    ka.queryExecution.toRdd.count()
    val kaPlan = ka.queryExecution.executedPlan.toString
    assert(!kaPlan.contains("CartesianProduct"),
      s"kanon total must ride a broadcast, not a cartesian:\n$kaPlan")
  }
}
