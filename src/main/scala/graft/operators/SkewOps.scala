package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation for hot keys (builder brief: "salting for skew").
  *
  * A groupBy over a key where one value holds most rows puts that
  * key's entire row set on one reduce task. Two-phase salted
  * aggregation splits the hot key across `buckets` subkeys (phase 1 =
  * partial per (key, salt), phase 2 = merge per key), bounding any
  * task's input at rows/buckets. Deterministic salt (hash of a unique
  * column, not rand()) keeps the op replayable/retry-safe — required
  * for exactly-once sinks.
  *
  * For joins, AQE's skew-join splitting
  * (spark.sql.adaptive.skewJoin.enabled, on by default) does the
  * equivalent at runtime; this helper covers aggregations, where AQE
  * does not re-split a running hash aggregate.
  */
object SkewOps {

  /** count(*) per key, hot-key-safe. `saltSource` must be non-null and
    * high-cardinality (e.g. an id column). */
  def saltedCount(df: DataFrame, key: Column, saltSource: Column,
                  buckets: Int = 16): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(saltSource), lit(buckets)).as("salt"))
      .agg(count(lit(1)).as("partial"))
      .groupBy("k").agg(sum("partial").as("cnt"))

  /** sum(value) per key with the same two-phase shape; value goes
    * through an exact decimal so the two-phase result is bit-identical
    * to the single-phase one (decimal addition is associative). */
  def saltedSum(df: DataFrame, key: Column, value: Column, saltSource: Column,
                buckets: Int = 16): DataFrame =
    df.groupBy(key.as("k"), pmod(hash(saltSource), lit(buckets)).as("salt"))
      .agg(sum(value.cast(org.apache.spark.sql.types.DecimalType(18, 4))).as("partial"))
      .groupBy("k").agg(sum("partial").cast("double").as("total"))
}
