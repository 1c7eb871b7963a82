package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Training-data tranche 7: batching-efficiency audit.
  *
  * `padding_waste_audit` — length-grouped batching: sort docs by token
  * length into B equal-population buckets and report each bucket's
  * padding waste (every doc in a batch pads to the batch max, so
  * waste = max_len·n − Σlen). This is the audit that justifies
  * length-bucketed batching for training/inference: the one-bucket
  * baseline pads everything to the corpus max, the B-bucket split's
  * total waste is the measured improvement. All integer arithmetic.
  *
  * Scale notes (100 TB): bucket assignment is `GlobalOrder.ntileGlobal`
  * — a range-partitioned total sort + zipWithIndex, NO single-partition
  * window (the SQL-standard ntile split, bit-identical to DuckDB's);
  * per-bucket stats are a partial+final aggregate over B groups.
  */
object TrainingOps7 {
  type Q = (SparkSession, String) => DataFrame

  val Buckets = 16

  def paddingWaste(docs: DataFrame, buckets: Int = Buckets): DataFrame = {
    val toks = docs.select(col("doc_id"),
      size(split(col("text"), " ", -1)).cast("long").as("n_tok"))
    GlobalOrder.ntileGlobal(toks, buckets, "bucket",
        col("n_tok"), col("doc_id"))
      .groupBy(col("bucket").cast("long").as("bucket"))
      .agg(count(lit(1)).as("n_docs"),
        max(col("n_tok")).as("max_len"),
        sum(col("n_tok")).as("sum_len"))
      .withColumn("waste", col("max_len") * col("n_docs") - col("sum_len"))
      .withColumn("waste_ppm",
        expr("waste * 1000000 div (max_len * n_docs)"))
      .orderBy("bucket")
  }

  val queries: Map[String, Q] = Map(
    "padding_waste_audit" -> ((s, d) =>
      paddingWaste(Tables.documents(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "padding_waste_audit" ->
      s"""WITH toks AS (
         |  SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
         |  FROM documents),
         |b AS (
         |  SELECT n_tok,
         |         CAST(ntile($Buckets) OVER (ORDER BY n_tok, doc_id) AS BIGINT)
         |           AS bucket
         |  FROM toks)
         |SELECT bucket, count(*) AS n_docs, max(n_tok) AS max_len,
         |       CAST(sum(n_tok) AS BIGINT) AS sum_len,
         |       max(n_tok) * count(*) - CAST(sum(n_tok) AS BIGINT) AS waste,
         |       (max(n_tok) * count(*) - CAST(sum(n_tok) AS BIGINT)) * 1000000
         |         // (max(n_tok) * count(*)) AS waste_ppm
         |FROM b GROUP BY bucket ORDER BY bucket""".stripMargin
  )
}
