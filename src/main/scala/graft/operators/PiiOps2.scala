package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Keyed pseudonymization — the privacy op BETWEEN redaction and
  * keeping raw ids: replace every user id with a keyed one-way token
  * (SHA-256 over secret∥id) so analytics keep their JOIN
  * CONSISTENCY (same user → same token everywhere, across tables and
  * runs with the same key) while the raw id never leaves the cluster.
  * Rotating the key unlinks all historical tokens at once — the
  * GDPR-style "drop the key, orphan the data" pattern.
  *
  * Deterministic + row-local (one hash per row, no state, no shuffle
  * beyond the consuming aggregation), so it pseudonymizes a 100 TB
  * fact table as a pure map stage, and any two pipelines sharing the
  * key produce joinable outputs independently.
  */
object PiiOps2 {
  type Q = (SparkSession, String) => DataFrame

  /** Demo key. Production: inject via config/credential store; NEVER
    * derive from the data. */
  val Key = "graft-demo-key-v1"

  def pseudonymize(df: DataFrame, idCol: String, key: String = Key): DataFrame =
    df.withColumn(idCol,
      sha2(concat(lit(key), lit(":"), col(idCol).cast("string")), 256))

  val queries: Map[String, Q] = Map(
    // tokenized per-user activity rollup: grouping on the TOKEN must
    // reproduce exactly the per-user cardinalities (join consistency),
    // which the oracle checks by hashing the same key∥id in SQL
    "pii_pseudonymize" -> ((s, d) =>
      pseudonymize(Tables.events(s, d), "user_id")
        .groupBy(col("user_id").as("token"))
        .agg(count(lit(1)).as("n_events"),
          countDistinct(col("event_type")).as("n_types"))
        .orderBy("token"))
  )

  val oracles: Map[String, String] = Map(
    "pii_pseudonymize" ->
      s"""SELECT sha256('$Key:' || CAST(user_id AS VARCHAR)) AS token,
         |       count(*) AS n_events,
         |       count(DISTINCT event_type) AS n_types
         |FROM events GROUP BY 1 ORDER BY token""".stripMargin
  )
}
