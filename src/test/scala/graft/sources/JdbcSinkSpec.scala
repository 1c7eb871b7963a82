package graft.sources

import graft.{SparkSpec, Tables}
import graft.streaming.SessionDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.util.Properties

/** S5 — JDBC warehouse sink (the reference's Vertica export leg,
  * `deployment-demo.xml.template:5-11` → EVENTS_EXPORT table), driven
  * against embedded Derby: batch `df.write.jdbc` plus the streaming
  * `foreachBatch { _.write.jdbc }` shape from SURVEY.md §2.1 S5. */
class JdbcSinkSpec extends SparkSpec {

  private def url(db: String) =
    s"jdbc:derby:${java.nio.file.Files.createTempDirectory("graft_jdbc")}/$db;create=true"

  test("batch JDBC round trip: write events table, read back, aggregate") {
    val u = url("batchdb")
    val props = new Properties()
    val ev = Tables.events(spark, sf)
      .select("event_id", "user_id", "event_type", "value")
    ev.write.jdbc(u, "EVENTS_EXPORT", props)
    val back = spark.read.jdbc(u, "EVENTS_EXPORT", props)
    assert(back.count() == ev.count())
    val got = back.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val want = ev.groupBy("event_type").agg(count(lit(1)).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(got == want)
  }

  test("streaming foreachBatch → JDBC sink (the reference's export-to-warehouse loop)") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val u = url("streamdb")
    val props = new Properties()
    val input = MemoryStream[SessionDedup.Ev]
    val q = input.toDF()
      .select("event_id", "user_id", "event_type", "value")
      .writeStream
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, batchId: Long) =>
        batch.write.mode("append").jdbc(u, "EVENTS_EXPORT", props)
      }
      .start()
    try {
      val evs = Tables.events(spark, sf)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .as[SessionDedup.Ev].collect().toSeq
      evs.grouped(400).foreach { b => input.addData(b); q.processAllAvailable() }
      val back = spark.read.jdbc(u, "EVENTS_EXPORT", props)
      assert(back.count() == evs.size)
      assert(back.select("event_id").distinct().count() == evs.size)
    } finally q.stop()
  }
}
