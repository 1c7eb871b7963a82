package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Bitwise scalar surface — the integer bit-manipulation family the
  * first function tranche didn't cover (the reference's scalar library
  * is IP/time/format-centric; bit ops are what its partition-key and
  * codec plumbing uses under the hood, and what zorder_key/simhash
  * lean on here).
  *
  * All inputs are non-negative (`event_id`), so arithmetic-vs-logical
  * shift semantics can't diverge between engines; NOT produces
  * negatives, identical under two's complement in both. Pure codegen
  * map stage — no shuffle but the presentation sort.
  */
object FunctionOps2 {
  type Q = (SparkSession, String) => DataFrame

  val queries: Map[String, Q] = Map(
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
