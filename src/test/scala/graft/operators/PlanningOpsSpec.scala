package graft.operators

import graft.{SparkEntry, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The predicted join cardinalities must equal the EXECUTED joins. */
class PlanningOpsSpec extends SparkSpec {

  test("join_card_audit predictions equal the real join counts") {
    val rows = SparkEntry.queries("join_card_audit")(spark, sf).collect()
      .map(r => r.getString(0) ->
        ((r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))).toMap
    assert(rows.keySet ==
      Set("lineitem_orders", "lineitem_part", "orders_customer"))

    def check(name: String, lt: String, lk: String, rt: String, rk: String): Unit = {
      val l = Tables.table(spark, sf, lt)
      val r = Tables.table(spark, sf, rt)
      val actualJoin = l.join(r, col(lk) === col(rk)).count()
      val (leftRows, rightRows, sharedKeys, predicted) = rows(name)
      assert(leftRows == l.count(), s"$name left_rows")
      assert(rightRows == r.count(), s"$name right_rows")
      assert(predicted == actualJoin,
        s"$name predicted $predicted != executed $actualJoin")
      val shared = l.select(col(lk).as("k")).distinct()
        .join(r.select(col(rk).as("k")).distinct(), "k").count()
      assert(sharedKeys == shared, s"$name shared_keys")
    }
    check("lineitem_orders", "lineitem", "l_orderkey", "orders", "o_orderkey")
    check("lineitem_part", "lineitem", "l_partkey", "part", "p_partkey")
    check("orders_customer", "orders", "o_custkey", "customer", "c_custkey")
  }
}
