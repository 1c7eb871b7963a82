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

  /** `events.ts` is parquet TIMESTAMP(NANOS), which Spark's reader
    * rejects ([PARQUET_TYPE_ILLEGAL]). We read it as a nanosecond long
    * (legacy.parquet.nanosAsLong) and narrow to microsecond
    * TimestampType. The generated data is µs-resolution, so `div 1000`
    * is lossless, and DuckDB's own read of the same file also lands on
    * µs TIMESTAMP — oracle parity holds.
    */
  def events(spark: SparkSession, dir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.read.parquet(path(dir, "events"))
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))
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
