package graft.operators

import graft.Tables
import graft.functions.IpFunctions._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scalar-function surface (SURVEY.md §2.8): the IPv4 codec pair (E6,
  * `/root/reference/db/procedures/events/Utils.java:25-42`) as native
  * codegen expressions, plus the timestamp codec family (E2-E5,E7)
  * exercised via an oracle query.
  */
object FunctionOps {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // map-type function surface: parse the JSON props into a typed
    // map, extend it with map_concat, then project map_keys /
    // map_values / element_at / size through higher-order reductions.
    // The oracle reproduces the VALUES from JSON arithmetic directly —
    // it checks semantics, not mechanism (DuckDB's MAP type differs).
    "map_funcs_surface" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select(col("event_id"),
          from_json(col("props"), org.apache.spark.sql.types.MapType(
            org.apache.spark.sql.types.StringType,
            org.apache.spark.sql.types.LongType)).as("m"))
        .withColumn("m2", map_concat(col("m"),
          map(lit("b"), element_at(col("m"), "k") * 2)))
        .select(col("event_id"),
          size(col("m2")).cast("long").as("n_keys"),
          expr("array_join(array_sort(map_keys(m2)), ',')").as("keys"),
          expr("aggregate(map_values(m2), CAST(0 AS BIGINT), (a, x) -> a + x)")
            .as("vsum"))
        .orderBy("event_id")),

    // E6 round trip: synthesize a deterministic signed-int32 "IP" per
    // event, render it dotted-quad, parse back — both directions checked
    // against DuckDB string/bit arithmetic
    "ip_roundtrip" -> ((s, d) => {
      graft.functions.IpFunctions.registerAll(s)
      Tables.events(s, d)
        .select(col("event_id"),
          ((col("event_id") * lit(2654435761L)) % lit(4294967296L) - lit(2147483648L))
            .cast("int").as("ipint"))
        .withColumn("ip", int_to_ip(col("ipint")))
        .withColumn("ip_back", ip_to_int(col("ip")))
        .orderBy("event_id")
        .limit(2000)
    }),

    // E2-E5/E7 timestamp codec family: second-truncate, epoch seconds,
    // epoch micros, rebuilt timestamp
    "ts_codec" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          date_trunc("second", col("ts")).as("sec_ts"),
          unix_timestamp(col("ts")).as("epoch_sec"),
          unix_micros(col("ts")).as("epoch_us"),
          timestamp_seconds(unix_timestamp(col("ts"))).as("rebuilt_ts"))
        .orderBy("event_id")
        .limit(2000))
  )

  val oracles: Map[String, String] = Map(
    "map_funcs_surface" ->
      """SELECT event_id,
        |       CAST(2 AS BIGINT) AS n_keys,
        |       'b,k' AS keys,
        |       CAST(3 * CAST(json_extract(props, '$.k') AS BIGINT) AS BIGINT)
        |         AS vsum
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,

    "ip_roundtrip" ->
      """WITH base AS (
        |  SELECT event_id,
        |         CAST((event_id * 2654435761) % 4294967296 - 2147483648
        |              AS INTEGER) AS ipint
        |  FROM events),
        |u AS (SELECT event_id, ipint,
        |             (CAST(ipint AS BIGINT) + 4294967296) % 4294967296 AS uv
        |      FROM base)
        |SELECT event_id, ipint,
        |       ((uv // 16777216) % 256) || '.' || ((uv // 65536) % 256) || '.'
        |         || ((uv // 256) % 256) || '.' || (uv % 256) AS ip,
        |       CAST(CASE WHEN uv >= 2147483648 THEN uv - 4294967296 ELSE uv END
        |            AS INTEGER) AS ip_back
        |FROM u ORDER BY event_id LIMIT 2000""".stripMargin,

    "ts_codec" ->
      """SELECT event_id,
        |       date_trunc('second', ts) AS sec_ts,
        |       epoch_us(ts) // 1000000 AS epoch_sec,
        |       epoch_us(ts) AS epoch_us,
        |       make_timestamp((epoch_us(ts) // 1000000) * 1000000) AS rebuilt_ts
        |FROM events ORDER BY event_id LIMIT 2000""".stripMargin
  )
}
