import org.apache.spark.sql.SparkSession

/** Per-query timing probe: `runMain TimeProbe <sfDir> <query...>` runs
  * each named registry query 3× on local[32] after the standard bench
  * warm-up (incl. at-rest ANN index build), printing one line per run.
  * For chasing individual regressions without a full Bench pass. */
object TimeProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val d = args(0)
    spark.range(1000000).selectExpr("sum(id)").collect()
    val t0 = System.nanoTime()
    graft.operators.AnnIndex.ensureAll(spark, d)
    println(f"[time] index_build ${(System.nanoTime()-t0)/1e9}%.3f s (cold or cached)")
    for (q <- args.drop(1); i <- 1 to 3) {
      val t = System.nanoTime()
      val n = graft.SparkEntry.queries(q)(spark, d).queryExecution.toRdd.count()
      println(f"[time] $q run$i ${(System.nanoTime()-t)/1e9}%.3f s rows=$n")
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache(); System.gc()
    }
    spark.stop()
  }
}
