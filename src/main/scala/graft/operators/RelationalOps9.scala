package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Ninth relational tranche: MERGE/upsert — the one DML shape the
  * earlier tranches (D1 append, D2 staged swap, D3 truncate, D4
  * predicate TTL delete; SURVEY.md §2.7) left unexpressed. VoltDB
  * exposes it as `UPSERT INTO`; lakehouse pipelines express it as
  * `MERGE INTO target USING changeset`. Spark-first, the BATCH
  * semantics of merge are a full-outer join between the target and the
  * keyed changeset with per-row action resolution — exactly what this
  * operator pins with a DuckDB oracle.
  *
  * `merge_upsert` derives a deterministic changeset from `orders`
  * itself (updates for keys ≡0 mod 7: price +1000; deletes for the
  * remaining keys ≡0 mod 13; inserts for the remaining keys ≡0 mod 11,
  * re-keyed +10⁹), applies MERGE semantics (matched-update,
  * matched-delete, not-matched-insert, untouched rows pass through),
  * and reports the post-merge table profile per order status.
  * Money follows the tranche-wide discipline: sums run in
  * DECIMAL(18,4), doubles only appear as the final cast.
  *
  * Scale notes (100 TB): the merge join is a single equi-shuffle (SMJ
  * under AQE) on the natural key — the same partitioning the target
  * table would be bucketed by at rest, so in a real deployment the
  * target side's Exchange disappears entirely; a typical CDC changeset
  * is a small fraction of the target and broadcasts instead. Action
  * resolution (the when-matched arms) is a row-local projection after
  * the join, and the reporting aggregate is map-side partial +
  * |status| rows out. Nothing in the plan is quadratic and the only
  * wide op is the one key shuffle.
  */
object RelationalOps9 {
  type Q = (SparkSession, String) => DataFrame

  private val D = DecimalType(18, 4)

  /** MERGE of a keyed changeset into a keyed target (both with columns
    * renamed to (k, st, p) / (ck, op, np, cst)):
    * op = 'U' updates price, 'D' deletes the row, 'I' inserts. */
  def mergeChangeset(target: DataFrame, changeset: DataFrame): DataFrame =
    target.join(changeset, col("k") === col("ck"), "full_outer")
      .filter(col("op").isNull || col("op") =!= "D")
      .select(
        coalesce(col("ck"), col("k")).as("k"),
        coalesce(col("st"), col("cst")).as("st"),
        when(col("op") === "U" || col("op") === "I", col("np"))
          .otherwise(col("p")).as("p"))

  val queries: Map[String, Q] = Map(
    "merge_upsert" -> ((s, d) => {
      val t = Tables.orders(s, d).select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("st"),
        col("o_totalprice").as("p"))
      val ch = t.filter(col("k") % 7 === 0 || col("k") % 13 === 0 || col("k") % 11 === 0)
        .select(
          when(col("k") % 7 === 0 || col("k") % 13 === 0, col("k"))
            .otherwise(col("k") + 1000000000L).as("ck"),
          when(col("k") % 7 === 0, lit("U"))
            .when(col("k") % 13 === 0, lit("D"))
            .otherwise(lit("I")).as("op"),
          when(col("k") % 7 === 0, col("p") + 1000.0).otherwise(col("p")).as("np"),
          col("st").as("cst"))
      mergeChangeset(t, ch)
        .groupBy(col("st").as("o_orderstatus"))
        .agg(count(lit(1)).as("n_orders"),
          sum(col("p").cast(D)).cast("double").as("sum_price"))
        .orderBy("o_orderstatus")
    })
  )

  val oracles: Map[String, String] = Map(
    "merge_upsert" ->
      """WITH t AS (
        |  SELECT o_orderkey AS k, o_orderstatus AS st, o_totalprice AS p
        |  FROM orders),
        |ch AS (
        |  SELECT CASE WHEN k % 7 = 0 OR k % 13 = 0 THEN k
        |              ELSE k + 1000000000 END AS ck,
        |         CASE WHEN k % 7 = 0 THEN 'U'
        |              WHEN k % 13 = 0 THEN 'D'
        |              ELSE 'I' END AS op,
        |         CASE WHEN k % 7 = 0 THEN p + 1000 ELSE p END AS np,
        |         st AS cst
        |  FROM t WHERE k % 7 = 0 OR k % 13 = 0 OR k % 11 = 0),
        |m AS (
        |  SELECT COALESCE(st, cst) AS st,
        |         CASE WHEN op IN ('U','I') THEN np ELSE p END AS p
        |  FROM t FULL OUTER JOIN ch ON t.k = ch.ck
        |  WHERE op IS NULL OR op <> 'D')
        |SELECT st AS o_orderstatus, count(*) AS n_orders,
        |       CAST(SUM(CAST(p AS DECIMAL(18,4))) AS DOUBLE) AS sum_price
        |FROM m GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
