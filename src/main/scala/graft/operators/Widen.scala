package graft.operators

import org.apache.spark.sql.DataFrame

/** Scale-adaptive parallelism repair for compute-heavy map stages.
  *
  * Small/local inputs arrive as one parquet file with one row group,
  * so the scan cannot split below ONE task — and a per-row-expensive
  * projection (XML/JSON parsing, regexes, hashing) then runs
  * single-threaded while the rest of the machine idles. `Widen`
  * round-robin-repartitions a narrow relation up to the session's
  * default parallelism ONLY when the plan would otherwise run with
  * fewer partitions than that. At production scale a fact scan
  * already carries orders of magnitude more splits than the cluster
  * has cores, the guard short-circuits, and NO shuffle is added —
  * unlike a hard-coded `repartition(n)` tuned to one machine.
  *
  * Use it on exchange-free relations only (scan + row-local
  * filter/project): the partition probe walks the physical plan, and
  * probing a sub-plan that already contains an exchange would
  * materialize AQE stages early. Project down to the columns the
  * downstream compute needs BEFORE widening, so the (local-only)
  * shuffle moves the narrowest possible rows (guide §2.3).
  */
object Widen {
  def apply(df: DataFrame): DataFrame = {
    val target = df.sparkSession.sparkContext.defaultParallelism
    if (df.queryExecution.toRdd.getNumPartitions >= target) df
    else df.repartition(target)
  }
}
