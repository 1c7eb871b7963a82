package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Planner-statistics surface: predict join sizes WITHOUT executing
  * the join. `join_card_audit` computes, for each core fact join, the
  * exact output cardinality from the two sides' key-frequency vectors
  * — |A ⋈ B| = Σ_k cA(k)·cB(k) — plus the row totals and the shared
  * key count. This is the estimate every optimizer needs before
  * committing a 100 TB shuffle; computing it exactly from frequency
  * vectors costs two partial-aggregated key censuses and a
  * key-cardinality join, never the join's own output volume (a skewed
  * key that would explode the real join contributes one multiply
  * here). The same table feeds skew diagnosis: predicted_rows ≫
  * max(left_rows, right_rows) flags multiplicative blowup before it
  * happens.
  *
  * All-integer outputs; oracle-checked; `PlanningOpsSpec` proves each
  * predicted cardinality equals the EXECUTED join's count.
  */
object PlanningOps {
  type Q = (SparkSession, String) => DataFrame

  /** (name, left table, left key, right table, right key) */
  private val JoinSpecs: Seq[(String, String, String, String, String)] = Seq(
    ("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey"),
    ("orders_customer", "orders", "o_custkey", "customer", "c_custkey"))

  private def freq(df: DataFrame, key: String): DataFrame =
    df.groupBy(col(key).as("k")).agg(count(lit(1)).as("c"))

  private def audit(s: SparkSession, d: String,
                    spec: (String, String, String, String, String)): DataFrame = {
    val (name, lt, lk, rt, rk) = spec
    val lf = freq(Tables.table(s, d, lt), lk).withColumnRenamed("c", "cl")
    val rf = freq(Tables.table(s, d, rt), rk).withColumnRenamed("c", "cr")
    lf.join(rf, Seq("k"), "full_outer")
      .agg(
        sum(coalesce(col("cl"), lit(0L))).as("left_rows"),
        sum(coalesce(col("cr"), lit(0L))).as("right_rows"),
        count(when(col("cl").isNotNull && col("cr").isNotNull, 1)).as("shared_keys"),
        sum(coalesce(col("cl") * col("cr"), lit(0L))).as("predicted_rows"))
      .select(lit(name).as("join_name"), col("left_rows"), col("right_rows"),
        col("shared_keys"), col("predicted_rows"))
  }

  val queries: Map[String, Q] = Map(
    "join_card_audit" -> ((s, d) =>
      JoinSpecs.map(audit(s, d, _)).reduce(_ unionAll _).orderBy("join_name"))
  )

  private def pairSql(spec: (String, String, String, String, String)): String = {
    val (name, lt, lk, rt, rk) = spec
    s"""SELECT '$name' AS join_name,
       |       CAST(COALESCE(sum(COALESCE(cl, 0)), 0) AS BIGINT) AS left_rows,
       |       CAST(COALESCE(sum(COALESCE(cr, 0)), 0) AS BIGINT) AS right_rows,
       |       count(CASE WHEN cl IS NOT NULL AND cr IS NOT NULL THEN 1 END)
       |         AS shared_keys,
       |       CAST(COALESCE(sum(COALESCE(cl * cr, 0)), 0) AS BIGINT)
       |         AS predicted_rows
       |FROM (SELECT $lk AS k, count(*) AS cl FROM $lt GROUP BY 1) lf
       |FULL JOIN (SELECT $rk AS k, count(*) AS cr FROM $rt GROUP BY 1) rf
       |USING (k)""".stripMargin
  }

  val oracles: Map[String, String] = Map(
    "join_card_audit" ->
      JoinSpecs.map(pairSql).mkString("", "\nUNION ALL\n", "\nORDER BY join_name")
  )
}
