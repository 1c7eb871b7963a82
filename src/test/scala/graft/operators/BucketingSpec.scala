package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Co-located fact-fact joins via bucketing — the pre-partitioning that
  * replaces the reference's hash-partitioned table routing
  * (`PARTITION TABLE events ON COLUMN src`, db/ddl.sql:73) for at-rest
  * data: both sides bucketed on the join key join with NO shuffle. At
  * 100 TB this turns the orders⋈lineitem exchange (the dominant network
  * cost) into a local merge per bucket. */
class BucketingSpec extends SparkSpec {

  test("bucketed orders ⋈ lineitem joins without a shuffle exchange") {
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force SMJ
    try {
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
      Tables.lineitem(spark, sf)
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("graft_li_bucketed")
      Tables.orders(spark, sf)
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("graft_ord_bucketed")

      val joined = spark.table("graft_li_bucketed")
        .join(spark.table("graft_ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))

      val plan = joined.queryExecution.executedPlan.toString
      // only the final agg may shuffle; the join itself must read
      // co-located buckets
      val joinSide = plan.linesIterator.dropWhile(!_.contains("SortMergeJoin")).toSeq
      assert(plan.contains("SortMergeJoin"), s"expected SMJ:\n$plan")
      assert(!joinSide.exists(l => l.contains("Exchange hashpartitioning(l_orderkey") ||
        l.contains("Exchange hashpartitioning(o_orderkey")),
        s"join inputs must not shuffle:\n$plan")
      assert(plan.contains("SelectedBucketsCount"), "scan must be bucket-aware")

      // same answer as the unbucketed join
      val want = Tables.lineitem(spark, sf)
        .join(Tables.orders(spark, sf), col("l_orderkey") === col("o_orderkey"))
        .groupBy("o_orderpriority").agg(count(lit(1)).as("cnt"))
        .collect().map(_.toString).sorted
      assert(joined.collect().map(_.toString).sorted.sameElements(want))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS graft_li_bucketed")
      spark.sql("DROP TABLE IF EXISTS graft_ord_bucketed")
    }
  }
}
