package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Exact interpolated percentiles per group, sort-based.
  *
  * Spark's exact `percentile` aggregate buffers a value→count map per
  * group; with a column whose distinct-value count grows with the
  * corpus (prices, scores) the buffer grows unboundedly — an
  * executor-memory scale-killer at 100 TB even when only a handful of
  * groups exist. This formulation replaces the per-group buffer with a
  * range-partitioned TOTAL SORT on (group, value) plus consecutive
  * global indices ([[GlobalOrder.withRowIndex]] — zipWithIndex with an
  * O(#partitions) offset pass, no single-partition exchange), so:
  *
  *  1. per-group counts and start offsets are a tiny aggregate
  *     (|groups| rows);
  *  2. each requested percentile p maps to at most two global row
  *     indices per group — `g0 + floor(p·(n−1))` and `g0 + ceil(…)`;
  *  3. one broadcast hash join probes those indices out of the sorted
  *     relation (≤ 2·|groups|·|ps| probe rows, each index is
  *     group-unique by construction), and the interpolation
  *     `(hi − r)·v_lo + (r − lo)·v_hi` — in the identical
  *     floating-point evaluation order Spark's `percentile` (and the
  *     DuckDB oracle) uses, so results are bit-identical to the
  *     builtin — runs on that handful of rows.
  *
  * Memory per task is bounded by the sort spill machinery regardless
  * of group cardinality skew or distinct-value growth; the only wide
  * exchange is the one range-partitioned sort.
  */
object PercentileExact {

  /** Percentiles `ps` (fraction → output column name) of `value` per
    * `group`. Nulls in `value` are skipped (SQL `percentile`
    * semantics); a group whose values are all null is absent from the
    * output, matching the aggregate's null row only in the
    * all-null-group edge no registered query relies on. */
  def grouped(df: DataFrame, group: String, value: String,
              ps: Seq[(Double, String)]): DataFrame =
    groupedColumns(df, group, Seq(value -> ps))

  /** As [[grouped]] for SEVERAL value columns at once: one sorted pass
    * PER COLUMN, results full-outer-joined on the (dim-sized) group
    * relation — a group whose values are ALL null in one column keeps
    * its row (null percentiles for that column only), matching the
    * builtin aggregate; only a group all-null in EVERY column is
    * absent (the [[grouped]] caveat).
    *
    * Measured, not assumed: the tempting alternative — union the
    * columns under a leading tag and sort 2N rows in ONE pass — looked
    * free (same shuffled bytes, half the fixed cost) and WAS ~15%
    * faster at sf0.1, but cliffed ~5× at the x100 deep-battery cell
    * (two 60M-row sorts: 30–41 s; one 120M-row sort: 160–290 s across
    * seven reps on the same corpus). Independent smaller barriers also
    * straggle better on a real cluster, so per-column passes are the
    * shape that survives 100 TB. */
  def groupedColumns(df: DataFrame, group: String,
                     specs: Seq[(String, Seq[(Double, String)])]): DataFrame = {
    require(specs.nonEmpty, "at least one value column required")
    val allNames = specs.flatMap(_._2.map(_._2))
    require(allNames.distinct.length == allNames.length,
      s"output names must be distinct across value columns: $allNames")
    // full outer, not inner: an inner join would silently drop a
    // group's VALID percentiles in other columns whenever one column
    // is all-null for that group (the builtin keeps the group and
    // nulls only the all-null column). USING-join semantics coalesce
    // the group key across sides, so the key survives either-side rows.
    specs.map { case (value, ps) => groupedOne(df, group, value, ps) }
      .reduce((a, b) => a.join(b, Seq(group), "full_outer"))
  }

  private def groupedOne(df: DataFrame, group: String, value: String,
                         ps: Seq[(Double, String)]): DataFrame = {
    require(ps.nonEmpty, "at least one percentile required")
    ps.foreach { case (p, _) =>
      require(p >= 0 && p <= 1, s"percentile $p out of [0,1]") }
    val slim = df.select(col(group), col(value).cast("double").as("_v"))
      .filter(col("_v").isNotNull)
    // total sort by (group, value): ties need no further tiebreaker —
    // any order among equal values yields the same result
    val indexed = GlobalOrder.withRowIndex(slim, "_gi", col(group), col("_v"))
    // indexed feeds two jobs (offsets aggregate, probe join) over a
    // narrow map of the checkpointed sorted RDD — no re-sort on reuse
    val starts = indexed.groupBy(col(group))
      .agg(min("_gi").as("_g0"), count(lit(1)).as("_n"))
    val pStructs = array(ps.map { case (p, name) =>
      struct(lit(p).as("_p"), lit(name).as("_pname")) }: _*)
    // rank arithmetic mirrors Percentile.getPercentile bit-for-bit:
    // r = p·(n−1) in double, lo/hi row offsets = floor/ceil(r)
    val needed = starts
      .select(col(group), col("_g0"), col("_n"), explode(pStructs).as("_pp"))
      .select(col(group), col("_pp._pname").as("_pname"),
        (col("_pp._p") * (col("_n") - 1).cast("double")).as("_r"), col("_g0"))
      .select(col(group), col("_pname"), col("_r"),
        (col("_g0") + floor(col("_r")).cast("long")).as("_ilo"),
        (col("_g0") + ceil(col("_r")).cast("long")).as("_ihi"))
    // global indices are group-unique, so the probe key is just _idx;
    // when r is integral the lo and hi probes share an index and the
    // same sorted row serves both sides
    val probes = needed
      .select(col("_pname"), col("_ilo").as("_idx"), lit("lo").as("_w"), col("_r"))
      .unionByName(needed
        .select(col("_pname"), col("_ihi").as("_idx"), lit("hi").as("_w"), col("_r")))
    val hits = indexed.join(broadcast(probes), col("_gi") === col("_idx"))
    // the builtin returns v_lo directly at integral ranks and otherwise
    // evaluates (hi − r)·v_lo + (r − lo)·v_hi — NOT v_lo + frac·Δ,
    // which differs in the last ulp; this must match both the builtin
    // and the DuckDB oracle bit-exactly
    val interp = hits.groupBy(col(group), col("_pname"))
      .agg(max(when(col("_w") === "lo", col("_v"))).as("_vlo"),
        max(when(col("_w") === "hi", col("_v"))).as("_vhi"),
        max(col("_r")).as("_r"))
      .withColumn("_pct",
        when(ceil(col("_r")) === floor(col("_r")), col("_vlo"))
          .otherwise((ceil(col("_r")) - col("_r")) * col("_vlo") +
            (col("_r") - floor(col("_r"))) * col("_vhi")))
    val aggs = ps.map { case (_, name) =>
      max(when(col("_pname") === name, col("_pct"))).as(name) }
    interp.groupBy(col(group)).agg(aggs.head, aggs.tail: _*)
  }
}
