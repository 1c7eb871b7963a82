package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Graph-analytics tranche over the nation-level trade graph derived
  * from the fact tables: an edge (src → dst, weight w) exists when a
  * customer in nation `src` bought lineitems supplied from nation
  * `dst` (self-trade excluded). All three queries are oracle-checked.
  *
  * The reference's clickstream is itself a graph feed (src → dest
  * visits; SURVEY.md §1.3, `db/ddl.sql:62-76`); this tranche adds the
  * graph-side analytics a training-data / clickstream warehouse needs:
  * degree census, iterative PageRank, and triangle counting.
  *
  * Scale notes (100 TB):
  *  - the expensive part is edge DERIVATION (fact-fact join of
  *    lineitem⋈orders plus two broadcast dim hops); the edge list
  *    itself is V²-bounded (≤ 625 rows here, |nations|² in general) —
  *    aggregate first, iterate on the tiny edge relation after;
  *  - the edge relation is persisted before the PageRank loop so the
  *    fact join runs ONCE, not once per iteration — at 100 TB the
  *    5 iterations then touch only the V²-bounded edge/rank tables;
  *  - every arithmetic step is integer (ppb rank mass, floor div), so
  *    results are bit-identical across engines and partitionings —
  *    the oracle replays the identical unrolled iterations in SQL;
  *  - triangle counting joins the undirected edge list against itself
  *    twice (the canonical a<b<c enumeration); for graphs where E is
  *    NOT dim-bounded the same plan holds with the heavy side
  *    pre-bucketed on the join key (BucketedSink), which is the
  *    standard distributed triangle-join shape.
  */
object GraphOps {
  type Q = (SparkSession, String) => DataFrame

  /** Weighted nation→nation trade edges with out-strength attached.
    * count(*) per (src,dst) pair; self-loops dropped. */
  private def tradeEdges(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_suppkey")
    val ord = Tables.orders(s, d).select("o_orderkey", "o_custkey")
    val cust = Tables.customer(s, d).select("c_custkey", "c_nationkey")
    val supp = Tables.supplier(s, d).select("s_suppkey", "s_nationkey")
    li.join(ord, li("l_orderkey") === ord("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp), col("l_suppkey") === col("s_suppkey"))
      .filter(col("c_nationkey") =!= col("s_nationkey"))
      .groupBy(col("c_nationkey").as("src"), col("s_nationkey").as("dst"))
      .agg(count(lit(1)).as("w"))
  }

  private val edgeCte =
    """e0 AS (SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
      |  FROM lineitem l JOIN orders o ON o.o_orderkey = l.l_orderkey
      |  JOIN customer c ON c.c_custkey = o.o_custkey
      |  JOIN supplier s ON s.s_suppkey = l.l_suppkey
      |  WHERE c.c_nationkey <> s.s_nationkey GROUP BY 1, 2)""".stripMargin

  val queries: Map[String, Q] = Map(
    // degree/strength census of the trade graph — the graph-shape
    // audit run before committing to any propagation algorithm
    "nation_trade_degree" -> ((s, d) => {
      // referenced twice (out + in tiers) — materialize the edge list once
      val e = tradeEdges(s, d).localCheckpoint(true)
      val out = e.groupBy("src").agg(
        count(lit(1)).as("out_degree"), sum("w").as("out_strength"))
      val in = e.groupBy("dst").agg(
        count(lit(1)).as("in_degree"), sum("w").as("in_strength"))
      Tables.nation(s, d)
        .select(col("n_nationkey").as("node"), col("n_name").as("name"))
        .join(out, col("node") === out("src"), "left")
        .join(in, col("node") === in("dst"), "left")
        .select(col("node"), col("name"),
          coalesce(col("out_degree"), lit(0L)).as("out_degree"),
          coalesce(col("in_degree"), lit(0L)).as("in_degree"),
          coalesce(col("out_strength"), lit(0L)).as("out_strength"),
          coalesce(col("in_strength"), lit(0L)).as("in_strength"))
        .orderBy("node")
    }),

    // 5-iteration PageRank (damping 0.85) in exact ppb integer math:
    // pr0 = 1e9/N; pr_{t+1}(v) = 0.15e9/N + 85% · Σ_u pr_t(u)·w(u,v)/out(u),
    // every division a floor-div — deterministic on any engine, any
    // partitioning. Dangling mass is dropped (no out-edges ⇒ no
    // contribution), the standard simplification.
    "nation_trade_pagerank" -> ((s, d) => {
      // eager localCheckpoint: the fact join that derives edges runs
      // exactly ONCE; the V²-bounded edge list is materialized before
      // the loop (a lazy .persist still recomputed the join for the
      // out-strength tier and left AQE blind to the tiny sizes —
      // 20 s → ~2 s at sf0.1)
      val e0 = tradeEdges(s, d).localCheckpoint(true)
      val out = e0.groupBy("src").agg(sum("w").as("out_w"))
      val e = e0.join(out, "src")
      val nodes = Tables.nation(s, d).select(col("n_nationkey").as("node"))
      var pr = nodes.withColumn("pr", lit(1000000000L / 25).cast("long"))
      for (_ <- 1 to 5) {
        val contrib = e.join(pr, e("src") === pr("node"))
          .select(col("dst"), expr("pr * w div out_w").as("c"))
          .groupBy("dst").agg(sum("c").as("sc"))
        pr = nodes.join(contrib, col("node") === col("dst"), "left")
          .select(col("node"),
            (lit(150000000L / 25) + expr("85 * coalesce(sc, CAST(0 AS BIGINT)) div 100"))
              .as("pr"))
      }
      pr.orderBy("node")
    }),

    // triangle count: canonical a<b<c enumeration over the undirected
    // edge set (two self-joins), plus the edge count — one output row
    "nation_trade_triangles" -> ((s, d) => {
      // referenced four times (three join legs + edge count) —
      // materialize the undirected edge list once
      val und = tradeEdges(s, d)
        .select(least(col("src"), col("dst")).as("a"),
          greatest(col("src"), col("dst")).as("b"))
        .distinct()
        .localCheckpoint(true)
      val e1 = und.select(col("a").as("e1a"), col("b").as("e1b"))
      val e2 = und.select(col("a").as("e2a"), col("b").as("e2b"))
      val e3 = und.select(col("a").as("e3a"), col("b").as("e3b"))
      val tri = e1.join(e2, col("e2a") === col("e1b"))
        .join(e3, col("e3a") === col("e1a") && col("e3b") === col("e2b"))
        .agg(count(lit(1)).as("n_triangles"))
      und.agg(count(lit(1)).as("n_edges")).crossJoin(tri)
    })
  )

  val oracles: Map[String, String] = Map(
    "nation_trade_degree" ->
      s"""WITH $edgeCte,
         |o AS (SELECT src, count(*) AS od, CAST(sum(w) AS BIGINT) AS ostr
         |      FROM e0 GROUP BY src),
         |i AS (SELECT dst, count(*) AS idg, CAST(sum(w) AS BIGINT) AS istr
         |      FROM e0 GROUP BY dst)
         |SELECT n.n_nationkey AS node, n.n_name AS name,
         |       CAST(COALESCE(o.od, 0) AS BIGINT) AS out_degree,
         |       CAST(COALESCE(i.idg, 0) AS BIGINT) AS in_degree,
         |       CAST(COALESCE(o.ostr, 0) AS BIGINT) AS out_strength,
         |       CAST(COALESCE(i.istr, 0) AS BIGINT) AS in_strength
         |FROM nation n
         |LEFT JOIN o ON o.src = n.n_nationkey
         |LEFT JOIN i ON i.dst = n.n_nationkey
         |ORDER BY node""".stripMargin,

    "nation_trade_pagerank" -> {
      val iters = (1 to 5).map { i =>
        s"""pr$i AS (
           |  SELECT n.n_nationkey AS node,
           |    CAST(6000000 + 85 * COALESCE(sum(p.pr * e.w // e.out_w), 0) // 100
           |         AS BIGINT) AS pr
           |  FROM nation n
           |  LEFT JOIN e ON e.dst = n.n_nationkey
           |  LEFT JOIN pr${i - 1} p ON p.node = e.src
           |  GROUP BY 1)""".stripMargin
      }.mkString(",\n")
      s"""WITH $edgeCte,
         |outd AS (SELECT src, sum(w) AS out_w FROM e0 GROUP BY src),
         |e AS (SELECT e0.src, e0.dst, e0.w, outd.out_w FROM e0 JOIN outd USING (src)),
         |pr0 AS (SELECT n_nationkey AS node, CAST(40000000 AS BIGINT) AS pr FROM nation),
         |$iters
         |SELECT node, pr FROM pr5 ORDER BY node""".stripMargin
    },

    "nation_trade_triangles" ->
      s"""WITH $edgeCte,
         |und AS (SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b FROM e0)
         |SELECT (SELECT count(*) FROM und) AS n_edges,
         |       (SELECT count(*) FROM und e1
         |        JOIN und e2 ON e2.a = e1.b
         |        JOIN und e3 ON e3.a = e1.a AND e3.b = e2.b) AS n_triangles""".stripMargin
  )
}
