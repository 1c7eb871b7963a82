package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.Row

/** Semantics of the substring-duplication tranche, brute-verified on a
  * corpus constructed to hit every edge: cross-doc duplication,
  * intra-doc repetition, overlapping-window merge, and sub-window-length
  * docs. (Values at real SFs are the DuckDB oracle's job.) */
class SpanDedupSpec extends SparkSpec {
  import spark.implicits._

  private val L = SpanDedupOps.WinLen

  // 26 distinct tokens a..z as building material
  private def toks(s: String): Seq[String] = s.split(" ").toSeq

  // doc 0 and 1 share one exact 8-token span (positions differ);
  // doc 2 repeats an 8-token span internally with overlap;
  // doc 3 is unique text; doc 4 is shorter than a window.
  private val shared = "a b c d e f g h"
  private val docsData = Seq(
    (0L, s"q w e r $shared t y u"),
    (1L, s"$shared z x c v b n m"),
    (2L, "p p p p p p p p p p k j h g f d s"),
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (4L, "tiny doc only")
  ).toDF("doc_id", "text")
    .withColumn("lang", org.apache.spark.sql.functions.lit("en"))
    .withColumn("source", org.apache.spark.sql.functions.lit("s"))

  /** Brute force with STRING windows (no hashing). */
  private def brute(): Map[Long, (Long, Long, Long, Long)] = {
    val rows = docsData.select("doc_id", "text").as[(Long, String)].collect()
    val wins = rows.flatMap { case (id, t) =>
      val w = toks(t)
      if (w.length < L) Seq.empty
      else (0 to w.length - L).map(i => (id, i + 1, w.slice(i, i + L).mkString(" ")))
    }
    val occ = wins.groupBy(_._3).view.mapValues(_.length).toMap
    val dup = wins.filter(w => occ(w._3) >= 2)
    rows.map { case (id, t) =>
      val n = toks(t).length.toLong
      val starts = dup.filter(_._1 == id).map(_._2).sorted
      val covered = starts.flatMap(s => s until (s + L)).distinct.length.toLong
      id -> (n, math.max(n - (L - 1), 0L), dup.count(_._1 == id).toLong, covered)
    }.toMap
  }

  test("substring_dup_rate matches string-window brute force on the edge corpus") {
    docsData.createOrReplaceTempView("span_docs")
    val got = SpanDedupOps.substringDupRate(docsData)
      .collect().map { r: Row =>
        r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      }.toMap
    assert(got.keySet == brute().keySet, "every doc keeps a row, incl. short docs")
    for ((id, want) <- brute()) assert(got(id) == want, s"doc $id")
  }

  test("overlapping intra-doc windows merge: coverage < windows * L") {
    // doc 2: "p"*10 ⇒ three duplicated windows (starts 1,2,3) covering
    // exactly positions 1..10 — the interval-union fold must not
    // double-count the overlap
    val r = SpanDedupOps.substringDupRate(docsData)
      .filter($"doc_id" === 2L).collect().head
    assert(r.getLong(3) == 3L, "three duplicated window starts")
    assert(r.getLong(4) == 10L, s"merged coverage is 10 positions, got ${r.getLong(4)}")
  }

  test("sub-window docs report zeros, not missing rows") {
    val r = SpanDedupOps.substringDupRate(docsData)
      .filter($"doc_id" === 4L).collect().head
    assert(r.getLong(2) == 0L && r.getLong(3) == 0L && r.getLong(4) == 0L)
  }

  test("dup_span_topk returns the shared span with occ and doc counts") {
    val rows = SpanDedupOps.dupSpanTopK(docsData, 25).collect()
    val sharedRow = rows.find(_.getString(0) == shared)
    assert(sharedRow.isDefined, "the cross-doc span must surface")
    assert(sharedRow.get.getLong(1) == 2L && sharedRow.get.getLong(2) == 2L)
    assert(rows.forall(_.getLong(1) >= 2L), "only duplicated spans appear")
  }

  test("lang_confusion cells sum to the doc count and keys are valid") {
    val docs = graft.Tables.documents(spark, sf)
    val m = SpanDedupOps.langConfusion(docs).collect()
    assert(m.map(_.getLong(2)).sum == docs.count())
    assert(m.forall(r => Set("en", "es", "de").contains(r.getString(1))))
  }
}
