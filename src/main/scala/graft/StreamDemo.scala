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

    evs.grouped((evs.size + 2) / 3).zipWithIndex.foreach { case (batch, i) =>
      input.addData(batch)
      export.processAllAvailable(); view.processAllAvailable()
      val exported = spark.table("export").count()
      val groups = spark.table("by_src_dest").count()
      println(s"[demo] after batch $i: ingested=${batch.size} exported_total=$exported view_groups=$groups")
    }
    println(s"[demo] total events=${evs.size} " +
      s"export_rows=${spark.table("export").count()} " +
      s"suppressed=${evs.size - spark.table("export").count()}")
    spark.table("export").orderBy("event_id").show(5)
    export.stop(); view.stop(); spark.stop()
  }
}
