package graft

/** Every registered query must run at the smallest SF and (except the
  * probe-at-offset edge) return rows — the same contract the driver's
  * t1 smoke applies to `entry`. */
class QueriesSmokeSpec extends SparkSpec {

  test("entry returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("oracleSql keys are a subset of queries keys") {
    val missing = SparkEntry.oracleSql.keySet -- SparkEntry.queries.keySet
    assert(missing.isEmpty, s"oracles without queries: $missing")
  }

  for ((name, fn) <- SparkEntry.queries.toSeq.sortBy(_._1)) {
    test(s"query $name runs and returns rows at sf0.001") {
      val n = fn(spark, sf).count()
      assert(n > 0, s"$name returned no rows")
    }
  }
}
