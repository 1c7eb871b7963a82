package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Semantics invariants for the CDC tranche (value parity is the
  * oracle's job). */
class CdcOpsSpec extends SparkSpec {

  test("scd2 intervals chain per user: valid_to == next valid_from, one open row") {
    val iv = CdcOps.queries("scd2_intervals")(spark, sf)
    val w = Window.partitionBy("user_id").orderBy("valid_from")
    val chained = iv.withColumn("next_from", lead("valid_from", 1).over(w))
    val badChain = chained.filter(
      (col("valid_to").isNull && col("next_from").isNotNull) ||
        (col("valid_to").isNotNull && col("next_from").isNotNull &&
          col("valid_to") =!= col("next_from"))).count()
    assert(badChain == 0, s"$badChain intervals break the SCD2 chain")
    val openPerUser = iv.filter(col("valid_to").isNull)
      .groupBy("user_id").count().filter(col("count") =!= 1).count()
    assert(openPerUser == 0, "every user has exactly one current row")
    val nUsers = Tables.events(spark, sf).select("user_id").distinct().count()
    assert(iv.select("user_id").distinct().count() == nUsers)
  }

  test("snapshot diff counts follow from the modular construction") {
    val got = CdcOps.queries("snapshot_diff")(spark, sf).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val ids = Tables.events(spark, sf).select("event_id")
      .collect().map(_.getLong(0))
    def n(p: Long => Boolean): Long = ids.count(p).toLong
    assert(got("inserted") == n(id => id % 13 == 0 && id % 17 != 0))
    assert(got("deleted") == n(id => id % 13 != 0 && id % 17 == 0))
    assert(got("changed") == n(id => id % 13 != 0 && id % 17 != 0 && id % 11 == 0))
    assert(got("unchanged") == n(id => id % 13 != 0 && id % 17 != 0 && id % 11 != 0))
  }
}
