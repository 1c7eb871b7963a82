package graft.operators

import graft.{SparkSpec, Tables}

/** Deflate-ratio signal: deterministic, bounded, and pointing the
  * direction a redundancy heuristic must point. */
class CompressSignalSpec extends SparkSpec {

  test("ratios are in-range, deterministic, and redundancy-ordered") {
    val out = TextOps6.compressRatio(Tables.documents(spark, sf)).collect()
    assert(out.nonEmpty)
    out.foreach { r =>
      val raw = r.getLong(1); val comp = r.getLong(2); val ppm = r.getLong(3)
      assert(raw > 0 && comp > 0)
      // deflate never exceeds raw by more than the stored-block header
      // overhead (~5 bytes per 64k block + slack)
      assert(comp <= raw + 64, s"doc ${r.getLong(0)}: deflate expanded $raw -> $comp")
      assert(ppm == comp * 1000000L / raw)
    }
    val again = TextOps6.compressRatio(Tables.documents(spark, sf)).collect()
    assert(out.map(_.toSeq).toSeq == again.map(_.toSeq).toSeq, "must be deterministic")
  }

  test("NULL text yields NULL signals, not an NPE (repo NULL-text discipline)") {
    import spark.implicits._
    val df = Seq((1L, "real text here"), (2L, null.asInstanceOf[String]))
      .toDF("doc_id", "text")
    val rows = TextOps6.compressRatio(df).collect()
    assert(rows.length == 2)
    val nullRow = rows.find(_.getLong(0) == 2L).get
    assert(nullRow.isNullAt(1) && nullRow.isNullAt(2) && nullRow.isNullAt(3))
    val okRow = rows.find(_.getLong(0) == 1L).get
    assert(!okRow.isNullAt(2) && okRow.getLong(2) > 0)
  }

  test("repetitive text compresses far better than high-entropy text") {
    val rep = "spark " * 2000
    // md5-chained hex: incompressible-ish, deterministic, no RNG
    val sb = new StringBuilder
    var seed = "0"
    while (sb.length < 12000) {
      seed = java.security.MessageDigest.getInstance("MD5")
        .digest(seed.getBytes("UTF-8")).map("%02x".format(_)).mkString
      sb.append(seed)
    }
    val repLen = TextOps6.deflatedLen(rep.getBytes("UTF-8"))
    val rndLen = TextOps6.deflatedLen(sb.toString.getBytes("UTF-8"))
    assert(repLen * 10 < rndLen,
      s"repetitive $repLen should be <10% of high-entropy $rndLen")
  }
}
