package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bitwise + URL scalar surfaces — function families the first
  * tranche didn't cover (the reference's scalar library is
  * IP/time/format-centric; bit ops are what its partition-key and
  * codec plumbing uses under the hood, and URL parsing is the
  * clickstream-adjacent codec its dest-url dimension implies).
  *
  * Bitwise: all inputs are non-negative (`event_id`), so
  * arithmetic-vs-logical shift semantics can't diverge between
  * engines; NOT produces negatives, identical under two's complement
  * in both. URL: the URLs are synthesized from event columns, so the
  * oracle re-derives every component from the SAME source columns —
  * Spark must recover them through a real `parse_url` parse.
  * Both are pure codegen map stages — no shuffle but the sort.
  */
object FunctionOps2 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
    // Spark 4 VARIANT: parse the JSON props into the binary
    // semi-structured type and extract through variant_get /
    // try_variant_get / schema introspection — the modern replacement
    // for stringly json_extract when the shape is open. The oracle
    // re-derives the values via DuckDB's JSON functions: semantics are
    // pinned, representation is each engine's own.
    "variant_funcs_surface" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select(col("event_id"), parse_json(col("props")).as("v"))
        .select(col("event_id"),
          expr("variant_get(v, '$.k', 'bigint')").as("k_val"),
          expr("try_variant_get(v, '$.missing', 'bigint')").as("k_missing"),
          expr("schema_of_variant(v)").as("vschema"),
          expr("cast(to_json(v) as string)").as("vjson"))
        .orderBy("event_id")),

    "url_funcs_surface" -> ((s, d) =>
      Tables.events(s, d)
        .filter(col("event_id") < 2000)
        .select(col("event_id"),
          concat(lit("https://"), col("event_type"), lit(".example.com"),
            lit("/u/"), col("user_id"),
            lit("?session="), col("event_id") % 97,
            lit("&src=app#frag")).as("url"))
        .select(col("event_id"),
          parse_url(col("url"), lit("HOST")).as("host"),
          parse_url(col("url"), lit("PATH")).as("path"),
          parse_url(col("url"), lit("QUERY")).as("query"),
          parse_url(col("url"), lit("PROTOCOL")).as("proto"),
          parse_url(col("url"), lit("QUERY"), lit("session")).as("session_q"),
          parse_url(col("url"), lit("REF")).as("ref"))
        .orderBy("event_id")),
    "bitwise_funcs_surface" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"))
        .filter(col("event_id") < 2000)
        .select(col("event_id"),
          bitwise_not(col("event_id")).as("bnot"),
          (col("event_id").bitwiseAND(lit(255L))).as("band"),
          (col("event_id").bitwiseOR(lit(4096L))).as("bor"),
          (col("event_id").bitwiseXOR(lit(65535L))).as("bxor"),
          shiftleft(col("event_id").bitwiseAND(lit(1023L)), 4).cast("long").as("shl"),
          shiftright(col("event_id"), 3).cast("long").as("shr"),
          bit_count(col("event_id")).cast("long").as("nbits"))
        .orderBy("event_id"))
  )

  val oracles: Map[String, String] = Map(
    // values re-derived with DuckDB JSON functions; the schema string
    // is a constant because every props payload is {"k": <int>} —
    // pinning Spark's VARIANT schema rendering exactly
    "variant_funcs_surface" ->
      """SELECT event_id,
        |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val,
        |       CAST(NULL AS BIGINT) AS k_missing,
        |       'OBJECT<k: BIGINT>' AS vschema,
        |       replace(props, '": ', '":') AS vjson
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,
    // every component re-derived from the source columns the URL was
    // built from — Spark must round-trip them through a real parse
    "url_funcs_surface" ->
      """SELECT event_id,
        |       event_type || '.example.com' AS host,
        |       '/u/' || CAST(user_id AS VARCHAR) AS path,
        |       'session=' || CAST(event_id % 97 AS VARCHAR) || '&src=app'
        |         AS query,
        |       'https' AS proto,
        |       CAST(event_id % 97 AS VARCHAR) AS session_q,
        |       'frag' AS ref
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin,

    "bitwise_funcs_surface" ->
      """SELECT event_id,
        |       ~event_id AS bnot,
        |       event_id & 255 AS band,
        |       event_id | 4096 AS bor,
        |       xor(event_id, 65535) AS bxor,
        |       CAST((event_id & 1023) << 4 AS BIGINT) AS shl,
        |       CAST(event_id >> 3 AS BIGINT) AS shr,
        |       CAST(bit_count(event_id) AS BIGINT) AS nbits
        |FROM events WHERE event_id < 2000 ORDER BY event_id""".stripMargin
  )
}
