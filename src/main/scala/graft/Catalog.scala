package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** SQL catalog: registers the driver tables, the reference's five
  * always-on views (batch forms), and the scalar function library as
  * temp views/functions, so the whole engine is reachable from
  * `spark.sql(...)` — the DDL surface of the reference
  * (`/root/reference/db/ddl.sql`) re-expressed as a session catalog.
  */
object Catalog {
  val tableNames: Seq[String] = Seq("region", "nation", "customer", "supplier",
    "part", "orders", "lineitem", "events", "documents", "embeddings")

  def registerAll(spark: SparkSession, dir: String): Unit = {
    tableNames.foreach { t =>
      Tables.table(spark, dir, t).createOrReplaceTempView(t)
    }
    // the five continuously-maintained views (db/ddl.sql:92-143), batch
    // forms; A1/A2 aggregate the export stream (ddl:92-101:
    // FROM events_export), not the raw fact table
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW events_export AS
        |SELECT event_id, user_id, event_type, ts, value FROM (
        |  SELECT event_id, user_id, event_type, ts, value,
        |         lag(ts) OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS prev_ts
        |  FROM events) t
        |WHERE prev_ts IS NULL
        |   OR unix_micros(ts) - unix_micros(prev_ts) > 30000000""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW events_by_src_view AS
        |SELECT user_id, count(*) AS total_visits FROM events_export
        |GROUP BY user_id""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW events_by_src_dest_view AS
        |SELECT user_id, event_type, count(*) AS counts
        |FROM events_export GROUP BY user_id, event_type""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW events_sessions AS
        |SELECT user_id, event_type, count(*) AS counts, max(ts) AS last_ts
        |FROM events GROUP BY user_id, event_type""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW events_by_second AS
        |SELECT date_trunc('second', ts) AS second_ts, user_id,
        |       count(*) AS count_values
        |FROM events GROUP BY 1, 2""".stripMargin)
    spark.sql(
      """CREATE OR REPLACE TEMPORARY VIEW dests_by_second AS
        |SELECT date_trunc('second', ts) AS second_ts, event_type,
        |       count(*) AS count_values
        |FROM events GROUP BY 1, 2""".stripMargin)
    graft.functions.IpFunctions.registerAll(spark)
    graft.functions.VectorFunctions.registerAll(spark)
    registerNearestCluster(spark)
  }

  /** SURVEY.md §4 candidate (a): `nearest_cluster(f1, f2)` in SQL —
    * a SQL-defined scalar function (Spark 4 SQL UDF) that inlines the
    * fused argmin over the current literal centers at analysis time,
    * so it optimizes/codegens like any expression (no black-box UDF).
    * The scoring SQL is generated from the same center set the
    * DataFrame path uses (`MLOps.literalCenterSeq`). */
  def registerNearestCluster(spark: SparkSession): Unit = {
    val structs = graft.ml.MLOps.literalCenterSeq.map { case (id, c1, c2) =>
      s"struct((f1 - $c1) * (f1 - $c1) + (f2 - $c2) * (f2 - $c2) AS score, ${id}L AS id)"
    }.mkString(", ")
    spark.sql(
      s"""CREATE OR REPLACE TEMPORARY FUNCTION nearest_cluster(f1 DOUBLE, f2 DOUBLE)
         |RETURNS BIGINT
         |RETURN least($structs).id""".stripMargin)
  }
}
