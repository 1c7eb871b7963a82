package graft.sources

import graft.{SparkSpec, Tables}
import graft.streaming.SessionDedup
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** The streaming leg of the bucketed at-rest layout: micro-batches
  * appended through BucketedSink land in a bucketed table whose
  * downstream per-key join needs no shuffle on the fact side — the
  * export stream's durable form keeps the routing-key co-location the
  * reference's partitioned table had in memory. */
class BucketedExportSpec extends SparkSpec {
  import SessionDedup.Ev

  test("streamed micro-batches into a bucketed table: no fact shuffle on the keyed join") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql("DROP TABLE IF EXISTS graft_export_bucketed")
    spark.sql("DROP TABLE IF EXISTS graft_users_bucketed")
    try {
      val evs = Tables.events(spark, sf)
        .select("event_id", "user_id", "event_type", "ts", "value")
        .as[Ev].collect().toSeq
      val input = MemoryStream[Ev]
      val q = input.toDF().writeStream
        .foreachBatch { (b: org.apache.spark.sql.DataFrame, _: Long) =>
          BucketedSink.appendBucketed(b, "graft_export_bucketed", 8, "user_id")
        }
        .start()
      try {
        val (b1, b2) = evs.splitAt(evs.size / 2)
        input.addData(b1); q.processAllAvailable()
        input.addData(b2); q.processAllAvailable()
      } finally q.stop()

      val users = Tables.events(spark, sf).select("user_id").distinct()
        .withColumn("segment", pmod(col("user_id"), lit(5)))
      BucketedSink.appendBucketed(users, "graft_users_bucketed", 8, "user_id")

      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
      val joined = spark.table("graft_export_bucketed")
        .join(spark.table("graft_users_bucketed"), "user_id")
        .groupBy("segment").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      val joinSide = plan.linesIterator.dropWhile(!_.contains("SortMergeJoin")).toSeq
      assert(!joinSide.exists(_.contains("Exchange hashpartitioning(user_id")),
        s"bucketed join inputs must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), "scan must be bucket-aware")

      // every event arrived exactly once despite the two appends
      assert(spark.table("graft_export_bucketed").count() == evs.size)
      val want = Tables.events(spark, sf)
        .join(users, "user_id")
        .groupBy("segment").agg(count(lit(1)).as("n"))
        .collect().map(_.toString).sorted
      assert(joined.collect().map(_.toString).sorted.sameElements(want))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_export_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_users_bucketed")
    }
  }
}
