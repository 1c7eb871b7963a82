package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // session warm-up so executor/codegen/file-index init isn't billed
    // to whichever query happens to run first
    spark.range(1000000).selectExpr("sum(id)").collect()
    spark.read.parquet(s"$sfDir/lineitem.parquet").count()
    // evaluate the query's OWN physical plan (toRdd), not count() on
    // top of it — count lets Catalyst prune projections/sorts/windows
    // and the timing degenerates to a scan-count
    def runFully(df: org.apache.spark.sql.DataFrame): Long =
      df.queryExecution.toRdd.count()
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val t0 = System.nanoTime()
      val ok = try { runFully(fn(spark, sfDir)); true } catch {
        case e: Throwable =>
          System.err.println(s"[bench] $name FAILED: ${e.getMessage}")
          false
      }
      val dt = (System.nanoTime() - t0) / 1e9
      // free blocks pinned by cache()/localCheckpoint() inside queries
      // so one query's residue doesn't tax the next one's GC; blocking
      // so the release happens HERE (outside any timed window), not
      // lazily inside the next query's measurement
      spark.sparkContext.getPersistentRDDs.values.foreach(_.unpersist(true))
      spark.catalog.clearCache()
      System.gc()
      // a failed query must not masquerade as a fast one: report -1
      name -> (if (ok) dt else -1.0)
    }.toMap
    // keep the JSON line compact (3-decimal timings): the driver keeps
    // only a bounded tail of the output, and a 90-query line at full
    // double precision overflows it and fails to parse
    def f(v: Double): String = if (v < 0) "-1" else "%.3f".format(v)
    val qs = results.toSeq.sortBy(_._1).map { case (k, v) => "\"" + k + "\":" + f(v) }
      .mkString("{", ",", "}")
    val total = results.values.filter(_ >= 0).sum
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
