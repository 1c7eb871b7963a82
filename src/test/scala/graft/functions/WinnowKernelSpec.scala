package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** The winnow kernel must be bit-identical to the SQL-expression form
  * it replaced (per-gram md5 + slice/array_min) — proven differentially
  * over the corpus and on adversarial unicode. */
class WinnowKernelSpec extends SparkSpec {
  private val K = 5
  private val W = 8

  /** The original expression-tree form, kept as the reference. */
  private def sqlForm(textCol: String): org.apache.spark.sql.DataFrame =
    Tables.documents(spark, sf)
      .filter(length(col(textCol)) >= K + W - 1)
      .withColumn("hs", expr(
        s"transform(sequence(1, length($textCol) - $K + 1), " +
          s"i -> substring(md5(CAST(substring($textCol, i, $K) AS BINARY)), 1, 8))"))
      .withColumn("fps", expr(
        s"transform(sequence(1, size(hs) - $W + 1), j -> array_min(slice(hs, j, $W)))"))
      .select(col("doc_id"),
        size(array_distinct(col("fps"))).cast("long").as("n_fp"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))

  test("kernel equals the expression form over the whole sf corpus") {
    val ref = sqlForm("text").collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    val got = Tables.documents(spark, sf).collect().flatMap { r =>
      Option(WinnowKernel.fingerprint(r.getAs[String]("text"), K, W))
        .map(t => r.getAs[Long]("doc_id") -> t)
    }.toMap
    assert(got.keySet == ref.keySet)
    got.foreach { case (id, t) =>
      assert(t == ref(id), s"doc $id diverged: $t vs ${ref(id)}")
    }
  }

  test("unicode: multi-byte and astral codepoints follow codepoint substring semantics") {
    // é (2-byte), 你 (3-byte), 𝄞 (4-byte, astral — Java substring would
    // split the surrogate pair; Spark/DuckDB substr counts codepoints)
    val texts = Seq(
      "héllo wörld heizölrückstoßabdämpfung",
      "你好世界这是一个测试文档需要更长一点",
      "abc𝄞def𝄞ghi𝄞jkl𝄞mno𝄞pqr",
      "a" * 12,
      "mixed ascii 你好 and 𝄞 astral €"
    )
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val ref = df.filter(length(col("text")) >= K + W - 1)
      .withColumn("hs", expr(
        s"transform(sequence(1, length(text) - $K + 1), " +
          s"i -> substring(md5(CAST(substring(text, i, $K) AS BINARY)), 1, 8))"))
      .withColumn("fps", expr(
        s"transform(sequence(1, size(hs) - $W + 1), j -> array_min(slice(hs, j, $W)))"))
      .select(col("doc_id"),
        size(array_distinct(col("fps"))).cast("long").as("n_fp"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = Option(WinnowKernel.fingerprint(t, K, W))
      assert(got == ref.get(i.toLong).map(identity),
        s"text $i diverged: $got vs ${ref.get(i.toLong)}")
    }
  }

  test("null and short texts return null (query filters them first)") {
    assert(WinnowKernel.fingerprint(null, K, W) == null)
    assert(WinnowKernel.fingerprint("short", K, W) == null)
    assert(WinnowKernel.fingerprint("a" * (K + W - 2), K, W) == null)
  }

  test("fuzz: kernel equals the expression form on 300 seeded random strings") {
    val texts = FuzzTexts.corpus(300, seed = 20260814L)
    import spark.implicits._
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val ref = df.filter(length(col("text")) >= K + W - 1)
      .withColumn("hs", expr(
        s"transform(sequence(1, length(text) - $K + 1), " +
          s"i -> substring(md5(CAST(substring(text, i, $K) AS BINARY)), 1, 8))"))
      .withColumn("fps", expr(
        s"transform(sequence(1, size(hs) - $W + 1), j -> array_min(slice(hs, j, $W)))"))
      .select(col("doc_id"),
        size(array_distinct(col("fps"))).cast("long").as("n_fp"),
        array_min(col("fps")).as("min_fp"),
        array_max(col("fps")).as("max_fp"))
      .collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getString(2), r.getString(3)))).toMap
    texts.zipWithIndex.foreach { case (t, i) =>
      val got = Option(WinnowKernel.fingerprint(t, K, W))
      assert(got == ref.get(i.toLong), s"fuzz $i: '${t.take(40)}'")
    }
  }
}

/** Seeded fuzz corpus shared by the kernel differential specs: mixes
  * ASCII words, punctuation runs, multi-byte BMP, astral codepoints,
  * locale-sensitive case expansions, and edge whitespace. */
object FuzzTexts {
  private val Pools: Array[Array[String]] = Array(
    Array("the", "agg", "scan", "Window", "VALUE", "slow", "0042"),
    Array(".", "!", "??", "—", "…", ",,", "  ", " "),
    Array("héllo", "wörld", "ÀÉÎÕÜ", "ß", "İstanbul", "ǅungla"),
    Array("你好", "世界", "测试"),
    Array("𝄞", "𝕊𝕡𝕒𝕣𝕜", "👍"),
    Array("\t", "\n", ""))

  def corpus(n: Int, seed: Long): Seq[String] = {
    val rnd = new scala.util.Random(seed)
    (0 until n).map { _ =>
      val parts = rnd.nextInt(40) + 1
      (0 until parts).map { _ =>
        val pool = Pools(rnd.nextInt(Pools.length))
        pool(rnd.nextInt(pool.length))
      }.mkString(if (rnd.nextBoolean()) " " else "")
    }
  }
}
