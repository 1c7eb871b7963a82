package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Differential proof that the per-document text kernels are
  * bit-identical to the expression pipelines they replaced, over the
  * corpus and on adversarial inputs. */
class TextKernelsSpec extends SparkSpec {

  private val NormExpr =
    "trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', ' '), '  *', ' '))"

  test("normalize equals the regex pipeline over the corpus") {
    val ref = Tables.documents(spark, sf)
      .selectExpr("doc_id", s"length($NormExpr) AS l", s"md5($NormExpr) AS h")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getString(2)))).toMap
    Tables.documents(spark, sf).select("doc_id", "text").collect().foreach { r =>
      val got = TextKernels.normalize(r.getString(1))
      assert(got == ref(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
  }

  test("normalize handles adversarial unicode, punctuation runs, and edges") {
    val texts = Seq(
      "", "   ", "...", "a", ".a.", "a.b", "a..b", "a . b", " ab ",
      "HÉLLO Wörld MIXED Case", "你好 world 123", "abc𝄞def", "𝄞𝄞𝄞",
      "UPPER lower 0123456789 !@#$%^&*()", "tab\there\nnewline",
      "ÀÉÎÕÜ ß ǅ İ")
    import spark.implicits._
    val ref = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .selectExpr("doc_id", s"length($NormExpr) AS l", s"md5($NormExpr) AS h")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getString(2)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(TextKernels.normalize(t) == ref(i.toLong), s"text $i: '$t'")
    }
    assert(TextKernels.normalize(null) == null)
  }

  test("minShingleMd5 equals the expression form over the corpus") {
    val ref = Tables.documents(spark, sf)
      .withColumn("w", split(col("text"), " ", -1))
      .selectExpr("doc_id",
        s"CASE WHEN size(w) >= 3 THEN array_min(transform(" +
          s"transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3))), " +
          s"g -> md5(CAST(g AS BINARY)))) END AS msf")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    Tables.documents(spark, sf).select("doc_id", "text").collect().foreach { r =>
      val got = Option(TextKernels.minShingleMd5(r.getString(1)))
      assert(got == ref(r.getLong(0)), s"doc ${r.getLong(0)}")
    }
  }

  test("fingerprintPair equals the regex+expression form over the corpus") {
    val ref = Tables.documents(spark, sf)
      .selectExpr("doc_id",
        "md5(regexp_replace(lower(text), '[^a-z0-9 ]', '')) AS fp")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    Tables.documents(spark, sf).select("doc_id", "text").collect().foreach { r =>
      val got = TextKernels.fingerprintPair(r.getString(1))
      assert(got._1 == ref(r.getLong(0)), s"doc ${r.getLong(0)} fp")
      assert(Option(got._2) ==
        Option(TextKernels.minShingleMd5(r.getString(1))), s"doc ${r.getLong(0)} msf")
    }
    assert(TextKernels.fingerprintPair(null) == null)
  }

  test("fuzz: normalize and fingerprintPair equal the expression forms on 300 seeded strings") {
    val texts = FuzzTexts.corpus(300, seed = 99123L)
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val refNorm = df
      .selectExpr("doc_id", s"length($NormExpr) AS l", s"md5($NormExpr) AS h")
      .collect().map(r => r.getLong(0) -> ((r.getInt(1).toLong, r.getString(2)))).toMap
    val refFp = df
      .withColumn("w", split(col("text"), " ", -1))
      .selectExpr("doc_id",
        "md5(regexp_replace(lower(text), '[^a-z0-9 ]', '')) AS fp",
        s"CASE WHEN size(w) >= 3 THEN array_min(transform(" +
          s"transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3))), " +
          s"g -> md5(CAST(g AS BINARY)))) END AS msf")
      .collect().map(r => r.getLong(0) -> ((r.getString(1), Option(r.getString(2))))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(TextKernels.normalize(t) == refNorm(i.toLong), s"fuzz norm $i")
      val pair = TextKernels.fingerprintPair(t)
      assert(pair._1 == refFp(i.toLong)._1, s"fuzz fp $i")
      assert(Option(pair._2) == refFp(i.toLong)._2, s"fuzz msf $i")
    }
  }

  test("minShingleMd5 edge cases: short, empty-token, and unicode shingles") {
    val texts = Seq("one two", "", " ", "a  b c", "你 好 世 界", "x y z")
    import spark.implicits._
    val ref = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
      .withColumn("w", split(col("text"), " ", -1))
      .selectExpr("doc_id",
        s"CASE WHEN size(w) >= 3 THEN array_min(transform(" +
          s"transform(sequence(1, size(w) - 2), i -> concat_ws(' ', slice(w, i, 3))), " +
          s"g -> md5(CAST(g AS BINARY)))) END AS msf")
      .collect().map(r => r.getLong(0) -> Option(r.getString(1))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      assert(Option(TextKernels.minShingleMd5(t)) == ref(i.toLong), s"text $i: '$t'")
    }
    assert(TextKernels.minShingleMd5(null) == null)
  }
}
