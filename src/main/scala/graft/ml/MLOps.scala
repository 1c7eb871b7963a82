package graft.ml

import graft.Tables
import org.apache.spark.ml.clustering.KMeans
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The reference's ML loop (SURVEY.md §2.11, §3.3):
  *
  *  - M1 train — k-means k=20, maxIter=20 over an integer feature space
  *    (`/root/reference/hadoop/spark/src/main/scala/KMeansReferral.scala:49-57`),
  *    centers int-rounded, ids 0..19 assigned by index;
  *  - M2 assign — per-row argmin of squared Euclidean distance against
  *    the (replicated → broadcast) centers table, ties to lowest id
  *    (`/root/reference/db/procedures/events/NewEvent.java:29-30,62-69`);
  *  - the staging swap (`clusters_dsa` → `clusters`,
  *    `/root/reference/db/ddl.sql:23-43`) becomes an atomic repoint of
  *    the broadcast centers map — see [[ModelSwap]].
  */
object MLOps {
  type Q = (SparkSession, String) => DataFrame

  /** M1: train k-means over (user_id mod 100, value) — the driver-table
    * analogue of the reference's (src,dest,referral,agent) int space.
    * Fixed seed: deterministic across runs on the same data. */
  def trainCenters(spark: SparkSession, dir: String, k: Int = 20): DataFrame =
    trainCentersOn(spark, Tables.events(spark, dir), k)

  /** Train on any event-shaped relation (used by the model-feedback
    * loop, which trains on the accumulated export stream — §3.3). */
  def trainCentersOn(spark: SparkSession, events: DataFrame, k: Int = 20): DataFrame = {
    val feats = events
      .select((col("user_id") % 100).cast("double").as("f1"), col("value").as("f2"))
    val assembled = new VectorAssembler()
      .setInputCols(Array("f1", "f2")).setOutputCol("features")
      .transform(feats)
    // random init (seeded) instead of k-means||: the parallel init
    // costs ~5 extra data passes for marginal quality on this 2-d
    // space; 20 Lloyd iterations dominate either way
    val model = new KMeans().setK(k).setMaxIter(20).setSeed(42L)
      .setInitMode("random")
      .setFeaturesCol("features").fit(assembled)
    import spark.implicits._
    // ids by center index; coordinates int-rounded like KMeansReferral.scala:52
    model.clusterCenters.zipWithIndex.map { case (c, i) =>
      (i, math.round(c(0)).toInt, math.round(c(1)).toInt)
    }.toSeq.toDF("id", "c1", "c2")
  }

  /** M2 scoring as a fused projection: argmin over literal centers via
    * `least(struct(score_i, id_i))` — no join, no shuffle, stays in one
    * whole-stage-codegen projection. This is the plan shape the
    * reference's per-event scoring loop implies (≤20 replicated
    * centers, NewEvent.java:62-69); ties resolve to the lowest id via
    * the struct ordering, identical to `ORDER BY score, id LIMIT 1`. */
  def scoreExpr(centers: Seq[(Long, Double, Double)],
                f1: org.apache.spark.sql.Column,
                f2: org.apache.spark.sql.Column): org.apache.spark.sql.Column = {
    val scored = centers.sortBy(_._1).map { case (id, c1, c2) =>
      val d1 = f1 - lit(c1)
      val d2 = f2 - lit(c2)
      struct((d1 * d1 + d2 * d2).as("score"), lit(id).as("id"))
    }
    val best = if (scored.size == 1) scored.head else least(scored: _*)
    best.getField("id")
  }

  /** Driver-table literal centers as plain Scala (for scoreExpr). */
  val literalCenterSeq: Seq[(Long, Double, Double)] =
    (0L until 20L).map(i => (i, i * 5.0, i * 12.5))

  /** M2 core: nearest-centroid assignment against a broadcast centers
    * relation — the J3 "distance top-1 theta join". min(struct(score,
    * id)) gives argmin with ties to lowest id, aggregated map-side
    * (no extra shuffle beyond the per-event groupBy). Generic form for
    * a DataFrame centers relation; for literal/driver-held centers the
    * fused [[scoreExpr]] avoids the join entirely. */
  def assignNearest(events: DataFrame, centers: DataFrame): DataFrame = {
    val f1 = (col("user_id") % 100).cast("double")
    val f2 = col("value")
    val d1 = f1 - col("c1")
    val d2 = f2 - col("c2")
    events.crossJoin(broadcast(centers))
      .withColumn("score", d1 * d1 + d2 * d2)
      .groupBy("event_id")
      .agg(min(struct(col("score"), col("cid"))).as("m"))
      .select(col("event_id"), col("m.cid").as("cluster"))
  }

  /** Deterministic literal centers (cid i → (i*5, i*12.5)) used by the
    * oracle-checked assignment query: fixed centers make the argmin
    * SQL-expressible, which k-means-trained centers are not. */
  def literalCenters(spark: SparkSession): DataFrame =
    spark.range(0, 20).select(col("id").as("cid"),
      (col("id") * lit(5.0)).as("c1"), (col("id") * lit(12.5)).as("c2"))

  val queries: Map[String, Q] = Map(
    // M2/J3/T3 — oracle-checked against fixed centers; fused projection
    // (no join/shuffle for the scoring itself)
    "kmeans_assign" -> ((s, d) =>
      Tables.events(s, d)
        .select(col("event_id"),
          scoreExpr(literalCenterSeq,
            (col("user_id") % 100).cast("double"), col("value")).as("cluster"))
        .orderBy("event_id")),

    // cluster histogram over the assignment (the dashboard's
    // events_by_cluster read path with a real model): scoring is a
    // map-side expression, the only shuffle is the 20-group agg
    "kmeans_cluster_sizes" -> ((s, d) =>
      Tables.events(s, d)
        .select(scoreExpr(literalCenterSeq,
          (col("user_id") % 100).cast("double"), col("value")).as("cluster"))
        .groupBy("cluster").agg(count(lit(1)).as("n"))
        .orderBy("cluster")),

    // M1 — trained centers (rows-only: k-means iterations are not
    // SQL-expressible; determinism is spec-tested instead)
    "kmeans_train_centers" -> ((s, d) =>
      trainCenters(s, d).orderBy("id"))
  )

  val oracles: Map[String, String] = Map(
    "kmeans_assign" ->
      """WITH centers AS (
        |  SELECT i AS cid, i * 5.0 AS c1, i * 12.5 AS c2
        |  FROM (SELECT unnest(range(0, 20)) AS i)),
        |scored AS (
        |  SELECT e.event_id, c.cid,
        |         ((e.user_id % 100) - c.c1) * ((e.user_id % 100) - c.c1)
        |           + (e.value - c.c2) * (e.value - c.c2) AS score
        |  FROM events e CROSS JOIN centers c),
        |best AS (
        |  SELECT event_id, cid,
        |         row_number() OVER (PARTITION BY event_id
        |                            ORDER BY score, cid) AS rn
        |  FROM scored)
        |SELECT event_id, cid AS cluster FROM best WHERE rn = 1
        |ORDER BY event_id""".stripMargin,

    "kmeans_cluster_sizes" ->
      """WITH centers AS (
        |  SELECT i AS cid, i * 5.0 AS c1, i * 12.5 AS c2
        |  FROM (SELECT unnest(range(0, 20)) AS i)),
        |scored AS (
        |  SELECT e.event_id, c.cid,
        |         ((e.user_id % 100) - c.c1) * ((e.user_id % 100) - c.c1)
        |           + (e.value - c.c2) * (e.value - c.c2) AS score
        |  FROM events e CROSS JOIN centers c),
        |best AS (
        |  SELECT event_id, cid,
        |         row_number() OVER (PARTITION BY event_id
        |                            ORDER BY score, cid) AS rn
        |  FROM scored)
        |SELECT cid AS cluster, count(*) AS n FROM best WHERE rn = 1
        |GROUP BY cid ORDER BY cluster""".stripMargin
  )
}

/** ST8 model-feedback loop: the `TruncateDsa`/`LoadDsa` staged swap
  * (`/root/reference/db/ddl.sql:23-43`) re-expressed for Spark — the
  * scoring stream reads the centers via an AtomicReference that a batch
  * retrain swaps between micro-batches, so each batch scores against a
  * consistent model version (SURVEY.md §7.3). */
final class ModelSwap(initial: Map[Int, (Double, Double)]) extends Serializable {
  private val ref = new java.util.concurrent.atomic.AtomicReference(initial)
  def current: Map[Int, (Double, Double)] = ref.get()
  /** Atomic swap — LoadDsa semantics at micro-batch granularity. */
  def swap(next: Map[Int, (Double, Double)]): Unit = ref.set(next)
}
