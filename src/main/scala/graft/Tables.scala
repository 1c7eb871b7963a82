package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Loaders for the driver-provided parquet tables (see TESTDATA.md /
  * FIXTURES.md §B).
  *
  * Scale notes (100 TB design point):
  *  - every loader is a plain `spark.read.parquet` so Catalyst retains
  *    filter pushdown / column pruning into the scan (verify with
  *    `.explain`: `PushedFilters`, `ReadSchema`);
  *  - dimension tables (region/nation/customer at low SF, dests/agents in
  *    the reference data model — SURVEY.md §1.1) stay broadcast-joinable;
  *  - the fact tables (lineitem/orders/events) are the ones that scale;
  *    nothing here collects them to the driver.
  */
object Tables {
  def path(dir: String, name: String): String = s"$dir/$name.parquet"

  /** Generic loader; `events` gets its timestamp repair. */
  def table(spark: SparkSession, dir: String, name: String): DataFrame =
    if (name == "events") events(spark, dir)
    else spark.read.parquet(path(dir, name))

  /** `events.ts` has shipped in two parquet encodings across driver
    * testdata generations, so the loader adapts by the resolved type:
    *
    *  - TIMESTAMP(NANOS): Spark's reader rejects it
    *    ([PARQUET_TYPE_ILLEGAL]), so we read it as a nanosecond long
    *    (legacy.parquet.nanosAsLong) and narrow to microsecond
    *    TimestampType — the data is µs-resolution, `div 1000` is
    *    lossless;
    *  - TIMESTAMP(MICROS, isAdjustedToUTC=false): resolves natively as
    *    TIMESTAMP_NTZ; cast to TimestampType under the UTC session so
    *    every downstream consumer (watermarks, INT96 verify dumps,
    *    window arithmetic) sees the exact same µs instants as before.
    *
    * DuckDB reads either encoding as naive µs TIMESTAMP — oracle
    * parity holds for both. */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(path(dir, "events"))
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", expr("timestamp_micros(ts div 1000)"))
      case org.apache.spark.sql.types.TimestampNTZType =>
        raw.withColumn("ts", col("ts").cast("timestamp"))
      case _ => raw
    }
  }

  def lineitem(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "lineitem")
  def orders(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "orders")
  def customer(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "customer")
  def supplier(spark: SparkSession, dir: String): DataFrame  = table(spark, dir, "supplier")
  def part(spark: SparkSession, dir: String): DataFrame      = table(spark, dir, "part")
  def nation(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "nation")
  def region(spark: SparkSession, dir: String): DataFrame    = table(spark, dir, "region")
  def documents(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "documents")
  def embeddings(spark: SparkSession, dir: String): DataFrame = table(spark, dir, "embeddings")
}
