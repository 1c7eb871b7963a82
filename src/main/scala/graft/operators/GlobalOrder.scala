package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Row, functions}
import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}

/** Distributed global-order primitives.
  *
  * `row_number() OVER (ORDER BY …)` with an empty PARTITION BY moves
  * the whole relation through ONE partition — the single shape Spark
  * itself warns about, and the one that cannot survive a 100 TB input.
  * The scalable formulation is a range-partitioned total sort (every
  * partition holds a contiguous key range, sorted within) followed by
  * `zipWithIndex`, which assigns globally consecutive indices with one
  * extra O(#partitions) pass to compute per-partition offsets — no
  * single-partition exchange anywhere.
  *
  * Determinism: callers must pass a TOTAL order (include a unique
  * tiebreaker column); then the assigned index is a pure function of
  * the data, independent of partition boundaries or cluster size.
  */
object GlobalOrder {

  /** Appends a 0-based global row index ordered by `order`. */
  def withRowIndex(df: DataFrame, out: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    // localCheckpoint: zipWithIndex launches a partition-size count job
    // before the consuming job — without it both re-sort every partition
    val sorted = df.orderBy(order: _*).localCheckpoint(true)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val rdd = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    spark.createDataFrame(rdd, schema)
  }

  /** Appends a global running sum of `valueCol` (long) ordered by
    * `order` — `sum(v) OVER (ORDER BY … ROWS UNBOUNDED PRECEDING)`
    * without the single-partition global window: range-partitioned
    * total sort, per-partition partial sums (one O(#partitions)
    * driver pass), then a narrow map adds each partition's offset.
    * Same two-pass shape as [[withRowIndex]]/zipWithIndex. */
  def withRunningSum(df: DataFrame, valueCol: String, out: String, order: Column*): DataFrame = {
    val spark = df.sparkSession
    // Generic-primitive guard: accept any integral value column by
    // widening it to long up front (so an IntegerType caller doesn't
    // hit a ClassCastException in getLong), and reject non-integral
    // types loudly instead of silently truncating doubles/decimals.
    // Nulls are rejected per-row below — SQL's running sum SKIPS
    // nulls, which a caller should make explicit with coalesce rather
    // than inherit silently from a low-level primitive.
    val vType = df.schema(valueCol).dataType
    require(
      vType == LongType || vType == IntegerType ||
        vType == ShortType || vType == ByteType,
      s"withRunningSum requires an integral value column; '$valueCol' is " +
        s"${vType.simpleString} — cast (and for fractional types, round) it explicitly first")
    val widened =
      if (vType == LongType) df
      else df.withColumn(valueCol, functions.col(valueCol).cast(LongType))
    // localCheckpoint: the sorted relation feeds TWO jobs (partial-sum
    // collect, then the offset-adding map) — without it the second job
    // re-sorts every partition
    val sorted = widened.orderBy(order: _*).localCheckpoint(true)
    val schema = sorted.schema.add(out, LongType, nullable = false)
    val vIdx = sorted.schema.fieldIndex(valueCol)
    val rdd = sorted.rdd
    def value(r: Row): Long = {
      if (r.isNullAt(vIdx))
        throw new IllegalArgumentException(
          s"withRunningSum: null in '$valueCol' — coalesce it before calling")
      r.getLong(vIdx)
    }
    val partSums = rdd.mapPartitionsWithIndex { (i, it) =>
      Iterator((i, it.foldLeft(0L)((a, r) => a + value(r))))
    }.collect().sortBy(_._1).map(_._2)
    val offsets = spark.sparkContext.broadcast(partSums.scanLeft(0L)(_ + _))
    val withCum = rdd.mapPartitionsWithIndex { (i, it) =>
      var acc = offsets.value(i)
      it.map { r => acc += value(r); Row.fromSeq(r.toSeq :+ acc) }
    }
    spark.createDataFrame(withCum, schema)
  }

  /** Exact `ntile(k) OVER (ORDER BY order)` without the global-window
    * single partition: the first (n mod k) buckets take ceil(n/k) rows,
    * the rest floor(n/k) — the SQL-standard split, bit-identical to
    * WindowExec's NTile and to DuckDB's. Costs one count pass + the
    * sort; both fully parallel. */
  def ntileGlobal(df: DataFrame, k: Int, out: String, order: Column*): DataFrame = {
    require(k > 0, s"ntile bucket count must be positive, got $k")
    val n = df.count()
    val big = n % k          // buckets 1..big have size base+1
    val base = n / k
    val cut = big * (base + 1) // rows before this index fall in a big bucket
    val indexed = withRowIndex(df, "_rn0", order: _*)
    // `div` (integer division), not `/` (double division)
    val bucketSql =
      if (base == 0)
        // fewer rows than buckets: one row per bucket, in order
        "_rn0 + 1"
      else
        s"CASE WHEN _rn0 < $cut THEN _rn0 div ${base + 1} + 1" +
          s" ELSE $big + (_rn0 - $cut) div $base + 1 END"
    indexed
      .withColumn(out, org.apache.spark.sql.functions.expr(bucketSql).cast("int"))
      .drop("_rn0")
  }
}
