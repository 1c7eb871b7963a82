package graft

import org.apache.spark.sql.SparkSession

/** Mirrors the driver's t1 smoke: build a session the way the driver
  * would and check `SparkEntry.entry` returns rows on sf0.001. */
object Smoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val rows = df.collect()
    println(s"[smoke] entry rows=${rows.length}")
    rows.take(3).foreach(r => println(s"[smoke] $r"))
    require(rows.nonEmpty, "entry returned no rows")
    spark.stop()
  }
}
