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
    val m = MediaOps.pngTable(spark, sf).repartition(4)
    val d1 = MediaOps.decodeAll(m).collect().sortBy(_.media_id)
    val d2 = MediaOps.decodeAll(m.repartition(7)).collect().sortBy(_.media_id)
    assert(d1.toSeq == d2.toSeq, "decode must not depend on partitioning")
    assert(d1.forall(_.ok), "every generated PNG must really decode")
    assert(d1.forall(r => r.width >= 8 && r.height >= 8 &&
      (r.channels == 1 || r.channels == 3)))
    assert(d1.map(_.media_id).toSeq == (0L until 500L))
  }

  test("ImageIO decode recovers exactly the generator's dims and bands") {
    for ((w, h, gray) <- Seq((8, 518, true), (517, 9, false), (256, 256, true))) {
      val png = MediaOps.PngCodec.encode(w, h, gray, rgbSeed = 42)
      // PNG magic bytes: a REAL container, not a fake blob
      assert((png(0) & 0xff) == 0x89 && png(1) == 'P' && png(2) == 'N' && png(3) == 'G')
      val img = javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(png))
      assert(img.getWidth == w && img.getHeight == h)
      assert(img.getRaster.getNumBands == (if (gray) 1 else 3))
    }
  }

  test("phash matches a local byte-compare recompute and stays 8-bit") {
    val got = MediaOps.queries("media_phash")(spark, sf).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.values.forall(p => p >= 0 && p <= 255), "phash is 8 bits")
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    val md = java.security.MessageDigest.getInstance("MD5")
    for ((id, t) <- docs) {
      val b = md.digest(t.getBytes("UTF-8")).map(_ & 0xff)
      val want = (0 until 8).map(i => if (b(i) > b(i + 1)) 1L << i else 0L).sum
      assert(got(id) == want, s"phash mismatch for doc $id")
    }
  }

  test("phash near-dup: JVM brute-force parity on the sf corpus; edits within radius pair up") {
    // brute-force the whole pipeline: token-length "luma" bytes,
    // 63-bit gradient hash, exact hamming <= 3 — the banded query must
    // return EXACTLY the brute pair set (banding is exact at radius 3:
    // 3 differing bits can spoil at most 3 of 4 bands)
    val docs = graft.Tables.documents(spark, sf).select("doc_id", "text")
      .collect().map(r => (r.getLong(0), r.getString(1)))
    def bits(t: String): Seq[Long] = {
      // token luma = len*131 + last char (the query's formula); the
      // band cap is inert at spec scale (every bucket ≪ 1000)
      val lums = t.split(" ", -1)
        .map(w => if (w.isEmpty) 0L else w.length.toLong * 131L + w.last.toLong)
        .padTo(64, 0L).take(64)
      (0 to 62).map(i => if (lums(i) > lums(i + 1)) 1L else 0L)
    }
    val hs = docs.map { case (id, t) => id -> bits(t) }.toMap
    val expect = (for {
      (a, ba) <- hs.toSeq; (b, bb) <- hs.toSeq if a < b
      h = ba.zip(bb).count { case (x, y) => x != y } if h <= 3
    } yield (a, b, h.toLong)).sortBy(p => (p._1, p._2))
    val got = MediaOps.queries("media_phash_neardup")(spark, sf).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == expect, s"banded join diverged from brute hamming: got " +
      s"${got.size} pairs, want ${expect.size}")
  }

  test("decode handles malformed payloads without failing the stage") {
    import spark.implicits._
    val bad = Seq(
      MediaOps.MediaRow(1L, "img/x", Array[Byte](1, 2)),
      MediaOps.MediaRow(2L, "img/x", null),
      MediaOps.MediaRow(3L, "img/x", Array.fill[Byte](16)(7)), // opaque junk
      MediaOps.MediaRow(4L, "img/x", MediaOps.PngCodec.encode(10, 12, gray = false, 7))
    ).toDS()
    val out = MediaOps.decodeAll(bad).collect().sortBy(_.media_id)
    assert(out.map(_.ok).toSeq == Seq(false, false, false, true))
    assert(out(3).width == 10 && out(3).height == 12 && out(3).channels == 3)
  }
}
