package graft.procs

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** A9 / system procedures: partition statistics must reconcile. */
class SystemProcsSpec extends SparkSpec {

  test("@Statistics TABLE: per-partition counts sum to the table count") {
    val ev = Tables.events(spark, sf).repartition(8, col("user_id"))
    val stats = SystemProcs.statisticsTable(ev).collect()
    assert(stats.map(_.getLong(1)).sum == 1000)
    assert(stats.length <= 8 && stats.forall(_.getLong(1) > 0))
  }

  test("@GetPartitionKeys: every key routes to exactly one in-range partition") {
    val keys = SystemProcs.partitionKeys(Tables.events(spark, sf), "user_id", 8)
    val rows = keys.collect()
    assert(rows.length == Tables.events(spark, sf)
      .select("user_id").distinct().count())
    assert(rows.forall(r => r.getInt(1) >= 0 && r.getInt(1) < 8))
    // routing agrees with the physical partitioner: rows of key k land
    // in the partition partitionKeys predicts
    val physical = Tables.events(spark, sf).repartition(8, col("user_id"))
      .select(col("user_id"), org.apache.spark.sql.functions.spark_partition_id().as("pid"))
      .distinct().collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val predicted = rows.map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(physical == predicted)
  }
}
