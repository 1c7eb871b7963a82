package graft.operators

import graft.{Catalog, SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Salted aggregation correctness + the SQL nearest_cluster function. */
class SkewSpec extends SparkSpec {

  private def skewed = Tables.events(spark, sf)
    .withColumn("k", when(col("event_id") % 10 < 8, lit("hot"))
      .otherwise(concat(lit("cold"), col("event_id") % 50)))

  test("saltedCount == direct groupBy count under 80% hot-key skew") {
    val direct = skewed.groupBy(col("k")).agg(count(lit(1)).as("cnt"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    val salted = SkewOps.saltedCount(skewed, col("k"), col("event_id"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(salted == direct)
    assert(direct("hot") > direct.values.sum * 7 / 10, "test data must be skewed")
  }

  test("saltedSum == direct sum bit-for-bit (decimal partials)") {
    val D = org.apache.spark.sql.types.DecimalType(18, 4)
    val direct = skewed.groupBy(col("k"))
      .agg(sum(col("value").cast(D)).cast("double").as("total"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val salted = SkewOps.saltedSum(skewed, col("k"), col("value"), col("event_id"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(salted == direct)
  }

  test("SQL nearest_cluster(f1,f2) inlines and matches the DataFrame scoring path") {
    Catalog.registerAll(spark, sf)
    val viaSql = spark.sql(
      """SELECT event_id,
        |       nearest_cluster(CAST(user_id % 100 AS DOUBLE), value) AS cluster
        |FROM events ORDER BY event_id""".stripMargin)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaDf = graft.ml.MLOps.queries("kmeans_assign")(spark, sf)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaSql == viaDf)
  }
}
