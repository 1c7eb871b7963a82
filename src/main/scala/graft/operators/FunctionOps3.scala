package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Third function tranche: XML codec, timezone arithmetic, and the
  * native DataSketches top-k aggregate.
  *
  *  - `xml_funcs_surface`: Spark 4's `from_xml` (schema-driven struct
  *    parse) + the classic `xpath_*` extractors over XML synthesized
  *    from event columns — the oracle re-derives every component from
  *    the SAME source columns, so Spark must round-trip them through a
  *    real XML parse (the URL-surface discipline).
  *  - `tz_funcs_surface`: `convert_timezone` / `from_utc_timestamp`
  *    with FIXED-OFFSET zones (+05:30, -08:00) so the oracle is pure
  *    interval arithmetic — no tzdata/DST dependency to drift between
  *    engines — plus `make_timestamp` reconstruction from parts.
  *  - `approx_topk_types`: Spark 3.5+ native `approx_top_k`
  *    (DataSketches frequent-items). Below sketch capacity the sketch
  *    tracks EXACT counts, so over a low-cardinality column the result
  *    is deterministic and DuckDB-oracle-able — pinning the exactness
  *    regime explicitly (the >capacity regime is the spec-tested
  *    `heavy_hitters_cms` / Misra-Gries territory).
  *
  * All map stages or one partial-aggregated pass; presentation sort
  * only.
  */
object FunctionOps3 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    "xml_funcs_surface" -> ((s, d) =>
      // four XML parses per row make this projection CPU-bound — widen
      // the (constant-size) filtered slice so the parse isn't pinned to
      // the scan's split count (Widen is a no-op at real scale)
      Widen(Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select("event_id", "user_id", "event_type"))
        .select(col("event_id"),
          concat(lit("<ev><u>"), col("user_id"), lit("</u><t>"),
            col("event_type"), lit("</t><vals><v>"), col("event_id") % 7,
            lit("</v><v>"), col("event_id") % 11, lit("</v></vals></ev>"))
            .as("xml"))
        .select(col("event_id"),
          expr("from_xml(xml, 'u BIGINT, t STRING')").as("r"),
          expr("xpath_string(xml, '/ev/t')").as("t_x"),
          expr("CAST(xpath_long(xml, 'sum(/ev/vals/v)') AS BIGINT)").as("vsum"),
          expr("CAST(size(xpath(xml, '/ev/vals/v/text()')) AS BIGINT)").as("nv"))
        .select(col("event_id"), col("r.u").as("u"), col("r.t").as("t"),
          col("t_x"), col("vsum"), col("nv"))
        .orderBy("event_id")),

    "tz_funcs_surface" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select(col("event_id"),
          expr("convert_timezone('UTC', '+05:30', ts)").as("ist"),
          expr("from_utc_timestamp(ts, '-08:00')").as("pst"),
          expr("make_timestamp(year(ts), month(ts), day(ts), " +
            "hour(ts), minute(ts), 0)").as("rebuilt"),
          // day-BOUNDARY count on both sides (Spark's timestampdiff
          // counts complete 24h periods — a different, drift-prone
          // semantic next to DuckDB's boundary-crossing date_diff)
          expr("CAST(datediff(to_date(ts), date'2024-01-01') AS BIGINT)")
            .as("days_since"))
        .orderBy("event_id")),

    // exact regime: 5 distinct event types << sketch capacity, so the
    // native frequent-items sketch returns exact counts
    "approx_topk_types" -> ((s, d) =>
      Tables.events(s, d)
        .agg(expr("approx_top_k(event_type, 3)").as("tk"))
        .select(explode(col("tk")).as("e"))
        .select(col("e.item").as("event_type"),
          col("e.count").cast("long").as("n"))
        .orderBy(col("n").desc, col("event_type")))
  )

  val oracles: Map[String, String] = Map(
    "xml_funcs_surface" ->
      """SELECT event_id,
        |       user_id AS u, event_type AS t, event_type AS t_x,
        |       event_id % 7 + event_id % 11 AS vsum,
        |       CAST(2 AS BIGINT) AS nv
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,

    "tz_funcs_surface" ->
      """SELECT event_id,
        |       ts + INTERVAL 330 MINUTE AS ist,
        |       ts - INTERVAL 480 MINUTE AS pst,
        |       date_trunc('minute', ts) AS rebuilt,
        |       date_diff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS days_since
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,

    "approx_topk_types" ->
      """SELECT event_type, count(*) AS n
        |FROM events GROUP BY event_type
        |ORDER BY n DESC, event_type LIMIT 3""".stripMargin
  )
}
