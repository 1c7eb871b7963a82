package graft.ml

import graft.{SparkSpec, Tables}
import graft.procs.Procedures
import graft.sources.VersionedStore
import graft.streaming.IngestPipeline
import org.apache.spark.sql.functions._

/** SURVEY.md §3.3 — the full analytics loop in one pass:
  * export data → k-means train (M1) → staging → LoadDsa publish
  * (versioned, atomic) → ModelSwap rebroadcast → next micro-batch
  * scores against the new model (M2/ST8). Exactly the reference's
  * compute_clusters.sh cycle, with the swap guarantees at micro-batch
  * granularity.
  */
class ModelLoopSpec extends SparkSpec {

  test("train → publish → swap → score: the model-update loop end to end") {
    val base = java.nio.file.Files.createTempDirectory("graft_loop").toString
    val staging = s"$base/clusters_dsa"
    val live = s"$base/clusters"
    val batch = Tables.events(spark, sf)
      .withColumn("f1", (col("user_id") % 100).cast("double"))
      .withColumn("f2", col("value"))

    // cold start: empty model → null clusters (reference scores -1/null
    // before the first training run)
    val swap = new ModelSwap(Map.empty)
    assert(IngestPipeline.scoreBatch(batch, swap)
      .filter(col("cluster").isNotNull).count() == 0)

    // train on the accumulated events (the export data of this slice)
    val centers = MLOps.trainCentersOn(spark, Tables.events(spark, sf))
    centers.write.parquet(staging)

    // LoadDsa: staging → live, atomic versioned publish
    Procedures.loadDsa(spark, staging, live)
    val liveCenters = Procedures.readStore(spark, live)
      .collect().map(r => r.getInt(0) -> (r.getInt(1).toDouble, r.getInt(2).toDouble))
      .toMap
    assert(liveCenters.size == 20)

    // rebroadcast: the next micro-batch sees the new model atomically
    swap.swap(liveCenters)
    val scored = IngestPipeline.scoreBatch(batch, swap)
    assert(scored.filter(col("cluster").isNull).count() == 0)
    assert(scored.select("cluster").distinct().count() > 1)

    // scoring equals the declarative argmin against the same centers
    val centersDf = Procedures.readStore(spark, live)
      .select(col("id").cast("long").as("cid"),
        col("c1").cast("double"), col("c2").cast("double"))
    val want = MLOps.assignNearest(Tables.events(spark, sf), centersDf)
      .collect().map(r => r.getLong(0) -> r.getLong(1).toInt).toMap
    val got = scored.select("event_id", "cluster")
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got == want)

    // retrain cycle: TruncateDsa + new staging + LoadDsa bumps the
    // version; old version stays readable until vacuum
    Procedures.truncateDsa(spark, staging)
    import spark.implicits._
    Seq((0, 50, 125)).toDF("id", "c1", "c2").write.parquet(staging)
    Procedures.loadDsa(spark, staging, live)
    assert(VersionedStore.currentVersion(live).contains(2))
    assert(Procedures.readStore(spark, live).count() == 1)
  }
}
