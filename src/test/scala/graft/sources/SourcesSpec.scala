package graft.sources

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Sink/scan behavior that matters at scale: partition pruning and
  * filter pushdown must reach the scan of our own sinks. */
class SourcesSpec extends SparkSpec {

  test("partitioned sink: type-filtered scan prunes to one partition directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_prune").toString
    Tables.events(spark, sf).write.mode("overwrite")
      .partitionBy("event_type").parquet(dir)
    val q = spark.read.parquet(dir).filter(col("event_type") === "click")
    val plan = q.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters") &&
      plan.contains("event_type"), s"no partition filter in:\n$plan")
    val scanned = q.queryExecution.executedPlan.collectLeaves()
      .head.toString
    assert(!scanned.contains("PartitionFilters: []"),
      "partition filter list must not be empty")
    assert(q.count() ==
      Tables.events(spark, sf).filter(col("event_type") === "click").count())
  }

  test("predicate pushdown reaches the parquet scan (PushedFilters)") {
    val q = Tables.lineitem(spark, sf)
      .filter(col("l_quantity") > 45.0)
      .select("l_orderkey", "l_quantity")
    val scan = q.queryExecution.executedPlan.collectLeaves().head.toString
    assert(scan.contains("PushedFilters") && scan.contains("GreaterThan(l_quantity"),
      s"filter not pushed:\n$scan")
    assert(scan.contains("ReadSchema") && !scan.contains("l_extendedprice"),
      "column pruning must drop unused columns")
  }

  test("compaction collapses files per partition and changes nothing else") {
    val dir = java.nio.file.Files.createTempDirectory("graft_compact_spec").toString
    Tables.events(spark, sf).repartition(20)
      .write.mode("overwrite").partitionBy("event_type").parquet(dir)
    val before = spark.read.parquet(dir).orderBy("event_id").collect()
    val report = SourcesOps.compactPartitions(spark, dir, numFiles = 1)
    assert(report.nonEmpty)
    report.foreach { case (part, nBefore, nAfter) =>
      assert(nBefore > 1, s"$part should start fragmented (had $nBefore files)")
      assert(nAfter == 1, s"$part not compacted: $nAfter files")
    }
    val after = spark.read.parquet(dir).orderBy("event_id").collect()
    assert(after.sameElements(before), "compaction altered the data")
  }

  test("csv dim load assigns stable line-number ids") {
    val got = SourcesOps.queries("dim_load_csv")(spark, sf).collect()
    assert(got.map(_.getLong(0)).toSeq == got.indices.map(_.toLong))
    assert(got.map(_.getString(1)).toSeq == got.map(_.getString(1)).sorted.toSeq)
  }

  test("orc and json round trips preserve values") {
    val orc = SourcesOps.queries("orc_roundtrip")(spark, sf).collect()
    assert(orc.length == 3 && orc.map(_.getLong(1)).sum == 6000)
    val json = SourcesOps.queries("json_roundtrip")(spark, sf).collect()
    assert(json.length == 25)
  }
}
