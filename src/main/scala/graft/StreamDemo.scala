package graft

import graft.streaming.{SessionDedup, StreamingViews}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Sample driver for the streaming leg: feeds the sf0.001 events through
  * the 30-s session-dedup operator and a continuously-maintained view,
  * in three micro-batches, and prints what a dashboard would read —
  * the reference's hot path (SURVEY.md §3.1) at micro-batch granularity.
  */
object StreamDemo {
  def main(args: Array[String]): Unit = {
    val spark: SparkSession = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext

    val evs = Tables.events(spark, "/root/testdata/sf0.001")
      .select("event_id", "user_id", "event_type", "ts", "value")
      .as[SessionDedup.Ev].collect().toSeq
      .sortBy(e => SessionDedup.micros(e.ts))

    val input = MemoryStream[SessionDedup.Ev]
    // safe agg-after-fmgws: unwindowed complete-mode count discards
    // nothing (see StreamingParitySpec for the full rationale)
    spark.conf.set("spark.sql.streaming.statefulOperator.checkCorrectness.enabled", "false")
    val export = SessionDedup.dedup(input.toDS())(spark)
      .writeStream.outputMode("append").format("memory").queryName("export").start()
    val view = StreamingViews.eventsBySrcDest(SessionDedup.dedup(input.toDS())(spark).toDF())
      .writeStream.outputMode("complete").format("memory").queryName("by_src_dest").start()

    // per-batch scoring against a swappable model — the ST8 loop: the
    // first batches score with v1 centers, then a "retrain" swaps the
    // model and later batches score against v2 (SURVEY.md §3.3)
    val swap = new graft.ml.ModelSwap(
      graft.ml.MLOps.literalCenterSeq.map { case (id, c1, c2) => id.toInt -> (c1, c2) }.toMap)
    evs.grouped((evs.size + 2) / 3).zipWithIndex.foreach { case (batch, i) =>
      input.addData(batch)
      export.processAllAvailable(); view.processAllAvailable()
      val exported = spark.table("export").count()
      val groups = spark.table("by_src_dest").count()
      val scored = graft.streaming.IngestPipeline.scoreBatch(
        batch.toDF()
          .withColumn("f1", (org.apache.spark.sql.functions.col("user_id") % 100).cast("double"))
          .withColumn("f2", org.apache.spark.sql.functions.col("value")), swap)
      val topCluster = scored.groupBy("cluster").count()
        .orderBy(org.apache.spark.sql.functions.col("count").desc).first()
      println(s"[demo] after batch $i: ingested=${batch.size} exported_total=$exported " +
        s"view_groups=$groups top_cluster=${topCluster.get(0)}(n=${topCluster.getLong(1)})")
      if (i == 0) { // "retrain": swap the model between micro-batches
        swap.swap(graft.ml.MLOps.trainCentersOn(spark, batch.toDF()).collect()
          .map(r => r.getInt(0) -> (r.getInt(1).toDouble, r.getInt(2).toDouble)).toMap)
        println("[demo] model swapped after batch 0 (retrained on observed data)")
      }
    }
    println(s"[demo] total events=${evs.size} " +
      s"export_rows=${spark.table("export").count()} " +
      s"suppressed=${evs.size - spark.table("export").count()}")
    spark.table("export").orderBy("event_id").show(5)
    export.stop(); view.stop(); spark.stop()
  }
}
