package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Multimodal plumbing: schema, batch shape, stub-decode determinism. */
class MediaSpec extends SparkSpec {

  test("media table schema: binary payload + typed metadata") {
    val m = MediaOps.mediaTable(spark, sf)
    val sch = m.schema.map(f => f.name -> f.dataType.simpleString).toMap
    assert(sch == Map("media_id" -> "bigint", "kind" -> "string", "payload" -> "binary"))
    assert(m.count() == 500)
    assert(m.filter(length(col("payload")) =!= 16).count() == 0, "md5 payloads are 16 bytes")
  }

  test("decode runs partition-batched, is deterministic, and keys survive") {
    val m = MediaOps.mediaTable(spark, sf).repartition(4)
    val d1 = MediaOps.decodeAll(m).collect().sortBy(_.media_id)
    val d2 = MediaOps.decodeAll(m.repartition(7)).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq, "decode must not depend on partitioning")
    assert(d1.forall(_.ok))
    assert(d1.forall(r => r.width >= 16 && r.height >= 16 && r.channels >= 1))
    assert(d1.map(_.media_id).toSeq == (0L until 500L))
  }

  test("decode handles malformed payloads without failing the stage") {
    import spark.implicits._
    val bad = Seq(
      MediaOps.MediaRow(1L, "img/x", Array[Byte](1, 2)),
      MediaOps.MediaRow(2L, "img/x", null),
      MediaOps.MediaRow(3L, "img/x", Array.fill[Byte](16)(7))
    ).toDS()
    val out = MediaOps.decodeAll(bad).collect().sortBy(_.media_id)
    assert(out.map(_.ok).toSeq == Seq(false, false, true))
  }
}
