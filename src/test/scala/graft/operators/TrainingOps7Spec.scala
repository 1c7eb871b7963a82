package graft.operators

import graft.{SparkSpec, Tables}

/** Padding-waste audit invariants (values are the oracle's job). */
class TrainingOps7Spec extends SparkSpec {

  test("buckets partition the corpus into contiguous length ranges, no Window node") {
    val q = TrainingOps7.paddingWaste(Tables.documents(spark, sf))
    assert(!q.queryExecution.executedPlan.toString.contains("Window"),
      "global ntile must ride GlobalOrder, not a single-partition window")
    val rows = q.collect()
    assert(rows.length == TrainingOps7.Buckets)
    val total = rows.map(_.getLong(1)).sum
    assert(total == Tables.documents(spark, sf).count(), "docs conserved")
    // equal-population split: sizes differ by at most one
    val sizes = rows.map(_.getLong(1))
    assert(sizes.max - sizes.min <= 1, s"ntile split uneven: ${sizes.toSeq}")
    // contiguous ranges: bucket max lengths are non-decreasing
    val maxes = rows.sortBy(_.getLong(0)).map(_.getLong(2))
    assert(maxes.sameElements(maxes.sorted), "bucket ranges must be ordered")
    rows.foreach { r =>
      val waste = r.getLong(4)
      assert(waste >= 0 && waste == r.getLong(2) * r.getLong(1) - r.getLong(3))
    }
  }
}
