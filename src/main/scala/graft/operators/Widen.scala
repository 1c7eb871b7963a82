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
    // the 'scan + row-local filter/project only' contract, ENFORCED
    // (not just documented): probing toRdd on an exchange-bearing plan
    // would materialize AQE stages at construction time. The physical
    // sparkPlan can't be checked for that — EnsureRequirements adds
    // ENSURE_REQUIREMENTS exchanges only inside executedPlan — so the
    // guard whitelists the logical shapes that can never plan an
    // exchange; anything else is returned untouched (misuse degrades
    // to a no-op instead of silently executing half the query early)
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, LeafNode, Project, Repartition}
    val rowLocalOnly = df.queryExecution.optimizedPlan.collect { case n => n }.forall {
      case _: Project | _: Filter | _: LeafNode => true
      case r: Repartition => !r.shuffle // coalesce: partition-local, no exchange
      case _ => false
    }
    if (!rowLocalOnly) df
    else {
      val target = df.sparkSession.sparkContext.defaultParallelism
      if (df.queryExecution.toRdd.getNumPartitions >= target) df
      else df.repartition(target)
    }
  }
}
