package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Semantics invariants for the graph tranche (value parity with
  * DuckDB is the oracle's job). */
class GraphOpsSpec extends SparkSpec {

  test("pagerank conserves mass up to floor loss and stays positive") {
    val pr = GraphOps.queries("nation_trade_pagerank")(spark, sf).collect()
    assert(pr.length == 25, "one rank per nation")
    val total = pr.map(_.getLong(1)).sum
    // every node keeps at least the teleport share; floor divisions
    // only ever LOSE mass, never create it
    assert(total <= 1000000000L, s"rank mass grew: $total")
    assert(total >= 999000000L, s"rank mass leaked too much: $total")
    assert(pr.forall(_.getLong(1) >= 6000000L), "teleport share is a floor")
  }

  test("degree census: in/out strengths both sum to total edge weight") {
    val deg = GraphOps.queries("nation_trade_degree")(spark, sf)
    val r = deg.agg(sum("out_strength"), sum("in_strength"),
      max("out_degree"), max("in_degree")).collect()(0)
    assert(r.getLong(0) == r.getLong(1),
      "every edge leaves one node and enters another")
    assert(r.getLong(2) <= 24 && r.getLong(3) <= 24,
      "degree bounded by |nations| - 1")
  }

  test("triangle count matches a local recompute of the undirected graph") {
    val deg = GraphOps.queries("nation_trade_degree")(spark, sf)
    // rebuild the undirected edge set locally from the tiny census-side
    // join (V² bounded), then count triangles by brute force
    val tri = GraphOps.queries("nation_trade_triangles")(spark, sf).collect()(0)
    val edges = GraphOps.queries("nation_trade_degree")(spark, sf) // force build path
    assert(edges.count() == 25)
    val und = {
      // recompute edges the same way the operator does, via its oracle
      // contract: distinct unordered trade pairs
      import spark.implicits._
      val li = graft.Tables.lineitem(spark, sf).select("l_orderkey", "l_suppkey")
      val ord = graft.Tables.orders(spark, sf).select("o_orderkey", "o_custkey")
      val cust = graft.Tables.customer(spark, sf).select("c_custkey", "c_nationkey")
      val supp = graft.Tables.supplier(spark, sf).select("s_suppkey", "s_nationkey")
      li.join(ord, $"l_orderkey" === $"o_orderkey")
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(supp, $"l_suppkey" === $"s_suppkey")
        .filter($"c_nationkey" =!= $"s_nationkey")
        .select(least($"c_nationkey", $"s_nationkey").cast("long").as("a"),
          greatest($"c_nationkey", $"s_nationkey").cast("long").as("b"))
        .distinct().as[(Long, Long)].collect().toSet
    }
    var n = 0L
    val nodes = und.flatMap(e => Seq(e._1, e._2)).toSeq.distinct.sorted
    for {
      a <- nodes; b <- nodes if a < b && und((a, b))
      c <- nodes if b < c && und((b, c)) && und((a, c))
    } n += 1
    assert(tri.getLong(0) == und.size.toLong, "edge count parity")
    assert(tri.getLong(1) == n, s"triangles: query ${tri.getLong(1)} vs local $n")
  }
}
