package graft.operators

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (builder brief: brute-force cosine top-k baseline + LSH-bucketed
  * scale variant).
  *
  * The oracle-checked baseline uses quantized integer arithmetic
  * (floor(x*1000) per element) so dot products are exact and
  * associative — bit-identical under any partitioning and in DuckDB.
  * The production-precision double path and the LSH path are rows-only
  * (spec-tested for recall against the brute-force ranking).
  *
  * Scale: brute force is O(N·d) per query — the right baseline for one
  * query over a broadcast vector; the LSH variant bounds candidates per
  * bucket so a 100 TB corpus answers from a few buckets, not a full
  * scan. Random-hyperplane signs are derived from deterministic integer
  * mixing, not an RNG, so signatures are reproducible cluster-wide.
  */
object SimilarityOps {
  type Q = (SparkSession, String) => DataFrame

  /** Deterministic pseudo-random hyperplane component in [-0.5, 0.5):
    * mix(plane, dim) via splitmix64-style integer mixing. */
  private def planeComponent(plane: Int, dim: org.apache.spark.sql.Column) = {
    // constants sized so the mix never overflows a long under ANSI mode:
    // inner ≤ 16*73856093 + 64*19349663 + 7919 ≈ 2.4e9; ×104729 ≈ 2.6e14
    val mixed = (lit(plane.toLong * 73856093L) + dim * lit(19349663L) + lit(7919L)) * lit(104729L)
    ((pmod(mixed, lit(1000003L)).cast("double") / lit(1000003.0)) - lit(0.5))
  }

  /** 16-bit sign-random-projection signature over the embedding. */
  def srpSignature(emb: DataFrame, bits: Int = 16): DataFrame = {
    val withIdx = emb.select(col("vec_id"), col("embedding"),
      posexplode(col("embedding")).as(Seq("dim", "xf")))
      .withColumn("x", col("xf").cast("double"))
    val sigBits = (0 until bits).map { b =>
      when(sum(col("x") * planeComponent(b, col("dim"))) > 0, shiftleft(lit(1L), b))
        .otherwise(0L)
    }
    withIdx.groupBy("vec_id")
      .agg(sigBits.reduce(_ + _).as("srp_bucket"),
        first(col("embedding")).as("embedding"))
  }

  val queries: Map[String, Q] = Map(
    // brute-force cosine top-k vs the vec_id=0 query vector —
    // oracle-checked exact quantized math
    "ann_topk" -> ((s, d) => {
      graft.functions.VectorFunctions.registerAll(s)
      val q = DedupOps.quantized(Tables.embeddings(s, d))
      val query = q.filter(col("vec_id") === 0)
        .select(col("q").as("qq"), col("n").as("nq"))
      q.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(query))
        .withColumn("dot", graft.functions.VectorFunctions.dot_i64(col("q"), col("qq")))
        .withColumn("sim", col("dot") / sqrt((col("n") * col("nq")).cast("double")))
        .select("vec_id", "sim")
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // per-label centroid-probed search (IVF-style): group mean as
    // coarse quantizer, rank labels' members for the query — exercises
    // two-stage (coarse → fine) ANN; rows-only (double math)
    "ann_ivf_probe" -> ((s, d) => {
      graft.functions.VecFunctions.registerAll(s)
      val emb = Tables.embeddings(s, d)
        .select(col("vec_id"), col("label"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("v"))
      // coarse: centroid per label in ONE pass via the element-wise
      // vec_sum aggregate (no posexplode to (label, dim, x) triples)
      val cents = emb.groupBy("label")
        .agg(graft.functions.VecFunctions.vec_sum(col("v")).as("vsum"),
          count(lit(1)).as("cnt"))
        .select(col("label"), expr(
          "transform(vsum, x -> x / CAST(cnt AS DOUBLE))").as("centroid"))
      val query = emb.filter(col("vec_id") === 0)
        .select(col("v").as("qv"))
      // probe: top-2 labels by centroid cosine
      val probed = cents.crossJoin(broadcast(query))
        .withColumn("cd", expr(
          "aggregate(zip_with(centroid, qv, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
        .withColumn("cn", expr("aggregate(centroid, 0D, (acc, x) -> acc + x * x)"))
        .withColumn("csim", col("cd") / sqrt(col("cn")))
        .orderBy(col("csim").desc, col("label"))
        .limit(2)
        .select("label")
      // fine: exact rank within probed labels only
      emb.join(broadcast(probed), Seq("label"))
        .filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(query))
        .withColumn("dot", expr(
          "aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
        .withColumn("nv", expr("aggregate(v, 0D, (acc, x) -> acc + x * x)"))
        .withColumn("nq", expr("aggregate(qv, 0D, (acc, x) -> acc + x * x)"))
        .withColumn("sim", col("dot") / sqrt(col("nv") * col("nq")))
        .select("vec_id", "label", "sim")
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    }),

    // LSH-bucketed ANN: SRP signature join (query bucket ± hamming-1
    // probes), exact rerank inside candidates — rows-only
    "ann_lsh" -> ((s, d) => {
      val sigs = srpSignature(Tables.embeddings(s, d))
      val qsig = sigs.filter(col("vec_id") === 0)
        .select(col("srp_bucket").as("qb"),
          expr("transform(embedding, x -> CAST(x AS DOUBLE))").as("qv"))
      // multi-probe: exact bucket or hamming distance ≤ 2
      val cands = sigs.filter(col("vec_id") =!= 0)
        .crossJoin(broadcast(qsig))
        .withColumn("hd", expr(
          "bit_count(srp_bucket ^ qb)"))
        .filter(col("hd") <= 2)
      cands
        .withColumn("v", expr("transform(embedding, x -> CAST(x AS DOUBLE))"))
        .withColumn("dot", expr(
          "aggregate(zip_with(v, qv, (x, y) -> x * y), 0D, (acc, v) -> acc + v)"))
        .withColumn("nv", expr("aggregate(v, 0D, (acc, x) -> acc + x * x)"))
        .withColumn("nq", expr("aggregate(qv, 0D, (acc, x) -> acc + x * x)"))
        .withColumn("sim", col("dot") / sqrt(col("nv") * col("nq")))
        .select("vec_id", "sim")
        .orderBy(col("sim").desc, col("vec_id"))
        .limit(10)
    })
  )

  val oracles: Map[String, String] = Map(
    "ann_topk" ->
      """WITH e AS (
        |  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
        |         CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000) AS BIGINT) AS x
        |  FROM embeddings),
        |q AS (SELECT i, x FROM e WHERE vec_id = 0),
        |nq AS (SELECT sum(x * x) AS n FROM q),
        |dots AS (
        |  SELECT e.vec_id, sum(e.x * q.x) AS dot, sum(e.x * e.x) AS ne
        |  FROM e JOIN q ON e.i = q.i
        |  WHERE e.vec_id <> 0 GROUP BY e.vec_id)
        |SELECT vec_id,
        |       CAST(dot AS DOUBLE)
        |         / sqrt(CAST(ne * (SELECT n FROM nq) AS DOUBLE)) AS sim
        |FROM dots ORDER BY sim DESC, vec_id LIMIT 10""".stripMargin
  )
}
