package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 metrics tranche: the time-series summaries an events
  * pipeline publishes for monitoring/BI consumers, plus the
  * semi-structured conformance audit that complements the relational
  * `dq_check_report`.
  *
  *  - `twap_user` — time-weighted average value per user (step-hold:
  *    each value holds until the user's next event). The weighted sum
  *    runs in EXACT decimal arithmetic — value as DECIMAL(18,2) ×
  *    integer microsecond durations, summed as DECIMAL(38,2) — so the
  *    one IEEE division (num/den) is the final step. The
  *    float-literal/summation-order hazards of double aggregation
  *    never arise;
  *  - `props_json_audit` — conformance report over the semi-structured
  *    `events.props` JSON column: per event_type counts of null,
  *    invalid-JSON, missing-key, and out-of-range payloads — the
  *    schema-on-read contract check every ingest of loosely-typed
  *    telemetry runs before trusting a field;
  *  - `ohlc_minute` — per-minute open/high/low/close bars over the
  *    event value stream. Open/close ride ONE min/max(struct) aggregate
  *    each — the (epoch-µs, event_id) prefix decides the comparison
  *    before the value field is ever consulted (event_id is unique),
  *    so ties are impossible and no window/sort per group is needed.
  *
  * All three are DuckDB-oracle-checked.
  *
  * Scale notes (100 TB):
  *  - twap_user: one shuffle on user_id for the lead() window (Spark
  *    sorts within partitions only — no global sort); the aggregate is
  *    partial/final on the same key, so the window's partitioning is
  *    REUSED by the groupBy (one Exchange total, plan-audited);
  *  - props_json_audit: row-local JSON probes (codegen'd
  *    get_json_object) feeding a |event_type|-row hash aggregate —
  *    partial map-side, nothing corpus-sized shuffles;
  *  - ohlc_minute: hash aggregate keyed by minute; min/max(struct)
  *    partials combine map-side, so each shuffle row is one struct per
  *    (partition, minute), not per event.
  */
object AnalyticsOps5 {
  type Q = (SparkSession, String) => DataFrame

  /** Inclusive [lo, hi] contract for the `props.k` field. */
  val KLo = 0L
  val KHi = 79L

  def twapUser(events: DataFrame): DataFrame = {
    val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    val seg = events
      .select(col("user_id"), col("ts"), col("event_id"),
        col("value").cast("decimal(18,2)").as("v"))
      .withColumn("nts", lead("ts", 1).over(w))
      .filter(col("nts").isNotNull)
      .withColumn("dur", unix_micros(col("nts")) - unix_micros(col("ts")))
    // the final ratio divides two exact LONGS (value·µs in cents over
    // µs·100): long→double conversion is correctly rounded in both
    // engines, whereas decimal→double is double-rounded in some (one
    // ulp off) — route the one IEEE division through longs.
    // The exposed numerator is BIGINT cents, not the internal
    // DECIMAL(38,2): every consumer stack holds a 64-bit integer
    // exactly, whereas a 17-significant-digit decimal survives some
    // (pyarrow Decimal) and not others (float64 coercion) — decimal
    // never escapes an operator's output schema (RegistrySchemaSpec).
    // This session runs Spark 4's default ANSI mode (nothing disables
    // it), so an overflowing decimal→long cast THROWS — a per-user
    // numerator past 2^63 cents fails the query loudly rather than
    // surfacing a wrong (or null) cell. Same posture as the
    // GovernanceOps TV aggregate.
    seg.groupBy("user_id")
      .agg(count(lit(1)).as("n_segments"),
        sum(col("v") * col("dur")).cast("decimal(38,2)").as("num_dec"),
        sum(col("dur")).as("twap_den"))
      .withColumn("twap_num_cents", (col("num_dec") * 100).cast("long"))
      .withColumn("twap",
        col("twap_num_cents").cast("double") /
          (col("twap_den") * 100).cast("double"))
      .select("user_id", "n_segments", "twap_num_cents", "twap_den", "twap")
      .orderBy("user_id")
  }

  def propsJsonAudit(events: DataFrame): DataFrame = {
    // Edge-payload parity with the DuckDB oracle is normalized, not
    // assumed from the generator:
    //  - the literal 'null' IS valid JSON (DuckDB json_valid agrees;
    //    get_json_object alone would misreport it invalid) — probed
    //    explicitly;
    //  - k is only CAST after an integer-shape regex gate, so a
    //    non-integer k (e.g. 1.5) lands in n_out_of_range identically
    //    in both engines instead of diverging on cast semantics (ANSI
    //    Spark throws, DuckDB rounds).
    // probe each payload ONCE in a row-local projection: referencing
    // get_json_object from four separate aggregate expressions re-ran
    // the JSON parse per aggregate per row (no CSE across aggregate
    // buffers), and the parse was pinned to the scan's task count —
    // Widen spreads it (no-op at real scale), the projection halves it
    val probed = Widen(events.select(col("event_type"), col("props")))
      .withColumn("jvalid", get_json_object(col("props"), "$").isNotNull ||
        trim(col("props")) === "null")
      .withColumn("k", get_json_object(col("props"), "$.k"))
    val kInt = when(col("k").rlike("^-?\\d{1,18}$"), col("k").cast("long"))
    probed.groupBy("event_type")
      .agg(count(lit(1)).as("n"),
        sum(when(col("props").isNull, 1L).otherwise(0L)).as("n_null"),
        sum(when(col("props").isNotNull && !col("jvalid"), 1L).otherwise(0L))
          .as("n_invalid_json"),
        sum(when(col("jvalid") && col("k").isNull, 1L).otherwise(0L)).as("n_missing_k"),
        sum(when(col("k").isNotNull &&
          !coalesce(kInt.between(KLo, KHi), lit(false)), 1L).otherwise(0L))
          .as("n_out_of_range"))
      .orderBy("event_type")
  }

  def ohlcMinute(events: DataFrame): DataFrame = {
    val key = struct(unix_micros(col("ts")).as("t"), col("event_id").as("e"),
      col("value").as("v"))
    events.groupBy(date_trunc("minute", col("ts")).as("minute"))
      .agg(count(lit(1)).as("n"),
        min(key).getField("v").as("open"),
        max(col("value")).as("high"),
        min(col("value")).as("low"),
        max(key).getField("v").as("close"))
      .orderBy("minute")
  }

  val queries: Map[String, Q] = Map(
    "twap_user" -> ((s, d) => twapUser(Tables.events(s, d))),
    "props_json_audit" -> ((s, d) => propsJsonAudit(Tables.events(s, d))),
    "ohlc_minute" -> ((s, d) => ohlcMinute(Tables.events(s, d)))
  )

  val oracles: Map[String, String] = Map(
    "twap_user" ->
      """WITH e AS (
        |  SELECT user_id, ts, event_id, CAST(value AS DECIMAL(18,2)) AS v,
        |         lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS nts
        |  FROM events),
        |seg AS (
        |  SELECT user_id, v, CAST(epoch_us(nts) - epoch_us(ts) AS BIGINT) AS dur
        |  FROM e WHERE nts IS NOT NULL)
        |SELECT user_id,
        |  CAST(count(*) AS BIGINT) AS n_segments,
        |  CAST(CAST(sum(v * dur) AS DECIMAL(38,2)) * 100 AS BIGINT) AS twap_num_cents,
        |  CAST(sum(dur) AS BIGINT) AS twap_den,
        |  CAST(CAST(CAST(sum(v * dur) AS DECIMAL(38,2)) * 100 AS BIGINT) AS DOUBLE)
        |    / CAST(sum(dur) * 100 AS DOUBLE) AS twap
        |FROM seg GROUP BY user_id ORDER BY user_id""".stripMargin,

    "props_json_audit" ->
      """WITH p AS (SELECT event_type, props,
        |    CASE WHEN json_valid(props)
        |         THEN json_extract_string(props, '$.k') END AS ks FROM events)
        |SELECT event_type,
        |  CAST(count(*) AS BIGINT) AS n,
        |  CAST(count(*) FILTER (WHERE props IS NULL) AS BIGINT) AS n_null,
        |  CAST(count(*) FILTER (WHERE props IS NOT NULL
        |        AND json_valid(props) = false) AS BIGINT) AS n_invalid_json,
        |  CAST(count(*) FILTER (WHERE json_valid(props)
        |        AND ks IS NULL) AS BIGINT) AS n_missing_k,
        |  CAST(count(*) FILTER (WHERE ks IS NOT NULL AND NOT coalesce(
        |        CASE WHEN regexp_full_match(ks, '-?\d{1,18}')
        |             THEN CAST(ks AS BIGINT) BETWEEN 0 AND 79 END, false))
        |      AS BIGINT) AS n_out_of_range
        |FROM p GROUP BY event_type ORDER BY event_type""".stripMargin,

    "ohlc_minute" ->
      """SELECT date_trunc('minute', ts) AS minute,
        |  CAST(count(*) AS BIGINT) AS n,
        |  (min(struct_pack(t := epoch_us(ts), e := event_id, v := value))).v AS open,
        |  max(value) AS high, min(value) AS low,
        |  (max(struct_pack(t := epoch_us(ts), e := event_id, v := value))).v AS close
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin
  )
}
