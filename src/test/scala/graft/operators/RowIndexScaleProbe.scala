package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Throwaway probe (run manually, not a suite): where does
  * GlobalOrder.withRowIndex stop scaling linearly on this box?
  * Times sort+checkpoint+zipWithIndex+consume at growing row counts. */
object RowIndexScaleProbe {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", "320")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (m <- args.headOption.map(_.split(",").map(_.toInt).toSeq).getOrElse(Seq(15, 30, 60, 120))) {
      val n = m * 1000000L
      val df = spark.range(n).select(
        (col("id") % 3).cast("string").as("g"),
        ((col("id") * 2654435761L % 1000003L) / 7.0).as("v"))
      val t0 = System.nanoTime()
      val idx = GlobalOrder.withRowIndex(df, "_gi", col("g"), col("v"))
      val c = idx.queryExecution.toRdd.count()
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"[probe] rows=${m}M -> $dt%.1f s (count=$c)")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      System.gc()
    }
    spark.stop()
  }
}
