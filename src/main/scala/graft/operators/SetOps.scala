package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Set operations and grouping-sets coverage (the reference uses none —
  * SURVEY.md §2.7 "No UNION/INTERSECT/EXCEPT anywhere" — but an engine
  * replacing it must have them), plus bigram corpus statistics.
  */
object SetOps {
  type Q = (SparkSession, String) => DataFrame

  /** Adjacent-doc pairing (doc_id n ↔ n+1), shared by the overlap and
    * edit-distance queries so the adjacency convention lives once. */
  private def adjacentDocs(s: SparkSession, d: String,
                           proj: org.apache.spark.sql.Column => org.apache.spark.sql.Column)
      : (DataFrame, DataFrame) = {
    val a = Tables.documents(s, d).select(col("doc_id"), proj(col("text")).as("ta"))
    val b = Tables.documents(s, d)
      .select((col("doc_id") - 1).as("doc_id"), proj(col("text")).as("tb"))
    (a, b)
  }

  val queries: Map[String, Q] = Map(
    // EXCEPT: active-ish customers that are not big spenders
    "except_customers" -> ((s, d) => {
      val active = Tables.orders(s, d).select(col("o_custkey").as("c"))
      val big = Tables.orders(s, d).filter(col("o_totalprice") > 400000.0)
        .select(col("o_custkey").as("c"))
      active.except(big).orderBy("c")
    }),

    // INTERSECT: customers with both an urgent and a low-priority order
    "intersect_customers" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("c"))
      val low = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "5-LOW").select(col("o_custkey").as("c"))
      urgent.intersect(low).orderBy("c")
    }),

    // EXCEPT ALL — multiset difference: each custkey keeps
    // count(all orders) − count(urgent orders) copies; the compact
    // per-key census of the survivors is the output. Spark plans
    // exceptAll as a signed-count aggregate + replicate (one shuffle
    // per side on the key, no pairwise join) — the multiset semantics
    // the DISTINCT form above cannot express.
    "except_all_orders" -> ((s, d) => {
      val all = Tables.orders(s, d).select(col("o_custkey").as("c"))
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("c"))
      all.exceptAll(urgent)
        .groupBy("c").agg(count(lit(1)).as("n"))
        .orderBy("c")
    }),

    // INTERSECT ALL — multiset intersection: min(urgent copies, low
    // copies) per custkey
    "intersect_all_orders" -> ((s, d) => {
      val urgent = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey").as("c"))
      val low = Tables.orders(s, d)
        .filter(col("o_orderpriority") === "5-LOW").select(col("o_custkey").as("c"))
      urgent.intersectAll(low)
        .groupBy("c").agg(count(lit(1)).as("n"))
        .orderBy("c")
    }),

    // UNION DISTINCT of two key populations
    "union_keys" -> ((s, d) => {
      val a = Tables.customer(s, d).select(col("c_nationkey").as("k"))
      val b = Tables.supplier(s, d).select(col("s_nationkey").as("k"))
      a.union(b).distinct().orderBy("k")
    }),

    // CUBE over (orderstatus, orderpriority) — full grouping-sets
    // lattice (rollup already covered by rollup_nation_counts)
    "cube_order_counts" -> ((s, d) => {
      Tables.orders(s, d).createOrReplaceTempView("graft_orders_cube")
      s.sql(
        """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
          |FROM graft_orders_cube
          |GROUP BY CUBE (o_orderstatus, o_orderpriority)
          |ORDER BY o_orderstatus ASC NULLS FIRST,
          |         o_orderpriority ASC NULLS FIRST""".stripMargin)
    }),

    // array-function surface: distinct shared words between adjacent docs
    "adjacent_doc_overlap" -> ((s, d) => {
      val (a, b) = adjacentDocs(s, d, t => split(t, " ", -1))
      a.join(b, "doc_id")
        .select(col("doc_id"),
          size(array_intersect(col("ta"), col("tb"))).cast("long").as("shared_words"))
        .orderBy("doc_id")
    }),

    // deterministic seeded sampling (training-data subsampling) —
    // rows-only: engines implement sampling differently; determinism
    // and bounds are spec-checked
    "sample_docs" -> ((s, d) =>
      Tables.documents(s, d).sample(withReplacement = false, 0.2, seed = 42L)
        .select("doc_id").orderBy("doc_id")),

    // content-hash sampling: keep a doc iff its first md5 byte ≡ 0
    // (mod 5) — a ~20% sample that is a pure function of content, so
    // it is reproducible across engines, partitionings, and cluster
    // sizes (seeded .sample is partitioning-dependent and would drift
    // on a 1000-executor re-shard). Oracle-checked.
    "sample_docs_hash" -> ((s, d) =>
      Tables.documents(s, d)
        .filter(conv(substring(md5(col("text")), 1, 2), 16, 10)
          .cast("int") % 5 === 0)
        .select("doc_id").orderBy("doc_id")),

    // regexp group extraction (the non-JSON path to the props payload)
    "regexp_extract_props" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          regexp_extract(col("props"), "\"k\": (\\d+)", 1).cast("int").as("k"))
        .groupBy("k").agg(count(lit(1)).as("n"))
        .orderBy("k")),

    // date arithmetic: order-to-ship delay distribution in days
    "ship_delay_histogram" -> ((s, d) =>
      Tables.lineitem(s, d)
        .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
        .select(datediff(col("l_shipdate"), col("o_orderdate"))
          .cast("long").as("delay_days")) // duckdb date_diff returns BIGINT
        .groupBy("delay_days").agg(count(lit(1)).as("n"))
        .orderBy("delay_days")),

    // the pivot relational operator (DataFrame .pivot with explicit
    // values → no extra distinct-values job; same result as the manual
    // conditional-agg form in order_status_pivot)
    "pivot_api" -> ((s, d) =>
      Tables.orders(s, d)
        .groupBy("o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L)
        .orderBy("o_orderpriority")),

    // null-semantics surface: null-safe equality, COALESCE, NULLIF over
    // a column with synthesized nulls
    "null_semantics" -> ((s, d) =>
      Tables.events(s, d)
        .withColumn("v", when(col("event_id") % 7 === 0, lit(null)).otherwise(col("value")))
        .select(col("event_id"),
          (col("v") <=> lit(null)).as("is_null_nullsafe"),
          coalesce(col("v"), lit(-1.0)).as("v_or_default"),
          nullif(col("event_type"), lit("error")).as("type_or_null"))
        .orderBy("event_id")
        .limit(1000)),

    // value histogram: fixed-width buckets over the event value
    "value_histogram" -> ((s, d) =>
      Tables.events(s, d)
        .groupBy(floor(col("value") / 25.0).cast("long").as("bucket"))
        .agg(count(lit(1)).as("n"))
        .orderBy("bucket")),

    // edit distance between adjacent docs' prefixes (string-function
    // surface; pairwise levenshtein is bounded here by construction)
    "doc_edit_distance" -> ((s, d) => {
      val (a, b) = adjacentDocs(s, d, t => substring(t, 1, 60))
      a.join(b, "doc_id")
        .select(col("doc_id"), levenshtein(col("ta"), col("tb")).as("dist"))
        .orderBy("doc_id")
    }),

    // bigram frequency top-k over the corpus
    "bigram_topk" -> ((s, d) =>
      Tables.documents(s, d)
        .select(split(col("text"), " ", -1).as("w"))
        .filter(size(col("w")) >= 2)
        .select(explode(expr(
          "transform(sequence(1, size(w) - 1), i -> concat_ws(' ', slice(w, i, 2)))"))
          .as("bigram"))
        .groupBy("bigram").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("bigram"))
        .limit(25))
  )

  val oracles: Map[String, String] = Map(
    "except_customers" ->
      """SELECT o_custkey AS c FROM orders
        |EXCEPT
        |SELECT o_custkey AS c FROM orders WHERE o_totalprice > 400000.0
        |ORDER BY c""".stripMargin,

    "intersect_customers" ->
      """SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '1-URGENT'
        |INTERSECT
        |SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '5-LOW'
        |ORDER BY c""".stripMargin,

    "except_all_orders" ->
      """SELECT c, count(*) AS n FROM (
        |  SELECT o_custkey AS c FROM orders
        |  EXCEPT ALL
        |  SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '1-URGENT')
        |GROUP BY c ORDER BY c""".stripMargin,

    "intersect_all_orders" ->
      """SELECT c, count(*) AS n FROM (
        |  SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '1-URGENT'
        |  INTERSECT ALL
        |  SELECT o_custkey AS c FROM orders WHERE o_orderpriority = '5-LOW')
        |GROUP BY c ORDER BY c""".stripMargin,

    "union_keys" ->
      """SELECT c_nationkey AS k FROM customer
        |UNION
        |SELECT s_nationkey AS k FROM supplier
        |ORDER BY k""".stripMargin,

    "cube_order_counts" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS cnt
        |FROM orders GROUP BY CUBE (o_orderstatus, o_orderpriority)
        |ORDER BY o_orderstatus ASC NULLS FIRST,
        |         o_orderpriority ASC NULLS FIRST""".stripMargin,

    "adjacent_doc_overlap" ->
      """SELECT a.doc_id,
        |       CAST(len(list_filter(list_distinct(string_split(a.text, ' ')),
        |                            x -> list_contains(string_split(b.text, ' '), x)))
        |            AS BIGINT) AS shared_words
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin,

    "sample_docs_hash" ->
      """WITH m AS (SELECT doc_id,
        |  ascii(substr(md5(text), 1, 1)) AS a1,
        |  ascii(substr(md5(text), 2, 1)) AS a2 FROM documents)
        |SELECT doc_id FROM m
        |WHERE ((CASE WHEN a1 >= 97 THEN a1 - 87 ELSE a1 - 48 END) * 16
        |     + (CASE WHEN a2 >= 97 THEN a2 - 87 ELSE a2 - 48 END)) % 5 = 0
        |ORDER BY doc_id""".stripMargin,

    "regexp_extract_props" ->
      """SELECT CAST(regexp_extract(props, '"k": (\d+)', 1) AS INTEGER) AS k,
        |       count(*) AS n
        |FROM events GROUP BY 1 ORDER BY k""".stripMargin,

    "ship_delay_histogram" ->
      """SELECT date_diff('day', CAST(o_orderdate AS DATE),
        |                 CAST(l_shipdate AS DATE)) AS delay_days,
        |       count(*) AS n
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |GROUP BY 1 ORDER BY delay_days""".stripMargin,

    "pivot_api" ->
      """SELECT o_orderpriority,
        |       CAST(sum(CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS "F",
        |       CAST(sum(CASE WHEN o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS "O",
        |       CAST(sum(CASE WHEN o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS "P"
        |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin,

    "null_semantics" ->
      """SELECT event_id,
        |       (CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END) IS NULL
        |         AS is_null_nullsafe,
        |       COALESCE(CASE WHEN event_id % 7 = 0 THEN NULL ELSE value END, -1.0)
        |         AS v_or_default,
        |       NULLIF(event_type, 'error') AS type_or_null
        |FROM events ORDER BY event_id LIMIT 1000""".stripMargin,

    "value_histogram" ->
      """SELECT CAST(floor(value / 25.0) AS BIGINT) AS bucket, count(*) AS n
        |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin,

    "doc_edit_distance" ->
      """SELECT a.doc_id,
        |       levenshtein(substr(a.text, 1, 60), substr(b.text, 1, 60)) AS dist
        |FROM documents a JOIN documents b ON b.doc_id = a.doc_id + 1
        |ORDER BY a.doc_id""".stripMargin,

    "bigram_topk" ->
      """WITH toks AS (SELECT string_split(text, ' ') AS w FROM documents),
        |bg AS (SELECT array_to_string(w[i:i+1], ' ') AS bigram
        |       FROM (SELECT w, unnest(range(1, len(w))) AS i FROM toks)
        |       WHERE len(w) >= 2)
        |SELECT bigram, count(*) AS freq FROM bg
        |GROUP BY bigram ORDER BY freq DESC, bigram LIMIT 25""".stripMargin
  )
}
