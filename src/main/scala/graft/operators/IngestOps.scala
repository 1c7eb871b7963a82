package graft.operators

import graft.Tables
import graft.ml.MLOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The reference's complete per-event hot path (`NewEvent.java:50-79`,
  * SURVEY.md §3.1) as ONE batch query — enrichment (J5 broadcast dim
  * resolution), k-means scoring (J3/M2 fused argmin), and the 30-s
  * session export gate (J4/ST4) — oracle-checked end to end.
  *
  * Plan shape: one scan of events; dim build is a tiny distinct+window;
  * enrichment is a broadcast hash join; scoring is a projection; the
  * only row-cardinality shuffle is the session window's hash-by-key
  * exchange — the same per-src routing VoltDB's partitioned procedure
  * performs (db/ddl.sql:152-153).
  */
object IngestOps {
  type Q = (SparkSession, String) => DataFrame

  /** The full pipeline as a DataFrame transform (reused by the
    * throughput bench). */
  def pipeline(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    // dim: event_type → id (line-number ids, S2 semantics)
    val dim = ev.select(col("event_type").as("key")).distinct()
      .withColumn("dest_id",
        (row_number().over(Window.orderBy("key")) - 1).cast("long"))
    val enriched = ev.join(broadcast(dim), ev("event_type") === dim("key"))
      .drop("key")
    val scored = enriched.withColumn("cluster",
      MLOps.scoreExpr(MLOps.literalCenterSeq,
        (col("user_id") % 100).cast("double"), col("value")))
    val w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    scored
      .withColumn("prev_ts", lag(col("ts"), 1).over(w))
      .withColumn("is_export",
        col("prev_ts").isNull ||
          (unix_micros(col("ts")) - unix_micros(col("prev_ts"))) > lit(30000000L))
      .select("event_id", "user_id", "dest_id", "cluster", "is_export")
  }

  val queries: Map[String, Q] = Map(
    "ingest_pipeline" -> ((s, d) => pipeline(s, d).orderBy("event_id"))
  )

  val oracles: Map[String, String] = Map(
    "ingest_pipeline" ->
      """WITH dim AS (
        |  SELECT key, row_number() OVER (ORDER BY key) - 1 AS dest_id
        |  FROM (SELECT DISTINCT event_type AS key FROM events)),
        |centers AS (
        |  SELECT i AS cid, i * 5.0 AS c1, i * 12.5 AS c2
        |  FROM (SELECT unnest(range(0, 20)) AS i)),
        |scored AS (
        |  SELECT e.event_id, e.user_id, d.dest_id, e.ts, e.event_type,
        |         (SELECT c.cid FROM centers c
        |          ORDER BY ((e.user_id % 100) - c.c1) * ((e.user_id % 100) - c.c1)
        |                 + (e.value - c.c2) * (e.value - c.c2), c.cid
        |          LIMIT 1) AS cluster
        |  FROM events e JOIN dim d ON e.event_type = d.key),
        |gated AS (
        |  SELECT event_id, user_id, dest_id, cluster,
        |         lag(ts) OVER (PARTITION BY user_id, event_type
        |                       ORDER BY ts, event_id) AS prev_ts, ts
        |  FROM scored)
        |SELECT event_id, user_id, dest_id, cluster,
        |       (prev_ts IS NULL OR epoch_us(ts) - epoch_us(prev_ts) > 30000000)
        |         AS is_export
        |FROM gated ORDER BY event_id""".stripMargin
  )
}
