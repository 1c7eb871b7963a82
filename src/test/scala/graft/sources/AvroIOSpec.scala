package graft.sources

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Real-Avro export/scan (S6 — the reference's export format). */
class AvroIOSpec extends SparkSpec {

  private def tmpDir(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  test("avro roundtrip preserves every supported type including nulls") {
    val schema = StructType(Seq(
      StructField("id", LongType, nullable = false),
      StructField("name", StringType, nullable = true),
      StructField("score", DoubleType, nullable = true),
      StructField("flag", BooleanType, nullable = true),
      StructField("small", IntegerType, nullable = true),
      StructField("ts", TimestampType, nullable = true),
      StructField("blob", BinaryType, nullable = true)))
    val ts = java.sql.Timestamp.valueOf("2026-03-01 12:34:56.789123")
    val rows = Seq(
      Row(1L, "alpha", 1.5, true, 7, ts, Array[Byte](1, 2, 3)),
      Row(2L, null, null, null, null, null, null),
      Row(3L, "gamma", -0.25, false, -1, ts, Array.empty[Byte]))
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2), schema)
    val dir = tmpDir("avro_types")
    AvroIO.write(df, dir)
    val back = AvroIO.read(spark, dir, schema)
    val a = df.collect().map(r => r.toSeq.map {
      case b: Array[Byte] => b.toSeq; case v => v }).toSet
    val b = back.collect().map(r => r.toSeq.map {
      case b: Array[Byte] => b.toSeq; case v => v }).toSet
    assert(a == b, s"roundtrip mismatch:\n$a\nvs\n$b")
    // µs precision survives (Timestamp.getTime alone would drop 123µs)
    val gotTs = back.filter("id = 1").collect()(0).getTimestamp(5)
    assert(gotTs.getNanos == 789123000, s"lost sub-ms precision: ${gotTs.getNanos}")
  }

  test("streaming export: micro-batches land as per-batch avro dirs, harvest reads them all") {
    import spark.implicits._
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime.MemoryStream[(Long, String)]
    val dir = tmpDir("avro_stream")
    val q = AvroIO.streamTo(in.toDS().toDF("id", "tag"), dir, tmpDir("avro_ckpt"))
    try {
      in.addData(Seq((1L, "a"), (2L, "b"))); q.processAllAvailable()
      in.addData(Seq((3L, "c"))); q.processAllAvailable()
      val schema = StructType(Seq(
        StructField("id", LongType, nullable = false),
        StructField("tag", StringType, nullable = true)))
      val got = AvroIO.readAll(spark, dir, schema).collect()
        .map(r => (r.getLong(0), r.getString(1))).toSet
      assert(got == Set((1L, "a"), (2L, "b"), (3L, "c")), s"harvest mismatch: $got")
      val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName).sorted
      assert(dirs.sameElements(Array("batch-0", "batch-1")), dirs.mkString(","))
    } finally q.stop()
  }

  test("write commits via rename: only complete .avro containers are visible") {
    import spark.implicits._
    val dir = tmpDir("avro_commit")
    AvroIO.write((1 to 100).toDF("n").repartition(4), dir)
    val files = new java.io.File(dir).listFiles().map(_.getName)
    assert(files.nonEmpty && files.forall(_.endsWith(".avro")),
      s"unexpected files: ${files.mkString(",")}")
    assert(files.length == 4, "one container per partition")
    // the container is standard Avro: re-read totals match
    val schema = StructType(Seq(StructField("n", IntegerType, nullable = false)))
    assert(AvroIO.read(spark, dir, schema).agg(Map("n" -> "sum"))
      .collect()(0).getLong(0) == 5050L)
  }
}
