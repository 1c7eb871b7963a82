package graft.ml

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** M1/M2: trained-model determinism and argmin tie-break semantics. */
class KMeansSpec extends SparkSpec {

  test("trainCenters is deterministic (fixed seed) and well-formed") {
    val c1 = MLOps.trainCenters(spark, sf).collect().map(_.toString).sorted
    val c2 = MLOps.trainCenters(spark, sf).collect().map(_.toString).sorted
    assert(c1.sameElements(c2), "same seed + data must give same centers")
    assert(c1.length == 20)
  }

  test("assignNearest breaks ties to the lowest center id (VoltDB ORDER BY score, id)") {
    import spark.implicits._
    // two centers equidistant from the event's features
    val ev = Seq((1L, 10L, 50.0)).toDF("event_id", "user_id", "value")
    val centers = Seq((5L, 0.0, 50.0), (3L, 20.0, 50.0), (9L, 10.0, 90.0))
      .toDF("cid", "c1", "c2")
    // f1 = user_id % 100 = 10 → dist to cid5: 100, cid3: 100, cid9: 1600
    val got = MLOps.assignNearest(ev, centers).collect()
    assert(got.length == 1 && got(0).getLong(1) == 3L,
      s"tie between cid 3 and 5 must resolve to 3, got ${got.toSeq}")
  }

  test("assignNearest matches KMeansModel-style nearest semantics on real data") {
    val assigned = MLOps.assignNearest(
      Tables.events(spark, sf), MLOps.literalCenters(spark))
    assert(assigned.count() == 1000)
    assert(assigned.filter(col("cluster") < 0 || col("cluster") > 19).count() == 0)
  }
}
