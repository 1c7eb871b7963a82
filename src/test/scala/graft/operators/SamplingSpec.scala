package graft.operators

import graft.SparkSpec

/** Seeded sampling: deterministic, bounded, and stable across reruns —
  * the properties a reproducible training-data subsample needs. */
class SamplingSpec extends SparkSpec {

  test("sample_docs is deterministic for a fixed seed and lands near the fraction") {
    val a = SetOps.queries("sample_docs")(spark, sf).collect().map(_.getLong(0)).toSeq
    val b = SetOps.queries("sample_docs")(spark, sf).collect().map(_.getLong(0)).toSeq
    assert(a == b, "same seed must give the same sample")
    assert(a.nonEmpty && a.size > 50 && a.size < 150,
      s"20% of 500 docs should be ~100, got ${a.size}")
    assert(a.distinct.size == a.size, "without-replacement sample must be distinct")
  }
}
