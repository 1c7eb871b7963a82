package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** A session created with spark.sql.extensions=graft.GraftExtensions
  * has the full function library with zero registerAll calls. */
class GraftExtensionsSpec extends AnyFunSuite {

  test("extensions-configured session exposes the function library in SQL") {
    // `.withExtensions` applies even on a reused SparkContext; the
    // equivalent cluster deployment is the static conf
    // spark.sql.extensions=graft.GraftExtensions at context launch
    // (static confs are silently ignored when a context already exists,
    // which a test JVM sharing one context would hit)
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT ip_to_int('1.2.3.4') AS a,
          |       int_to_ip(16909060) AS b,
          |       dot_i64(array(2L, 3L), array(4L, 5L)) AS c""".stripMargin).first()
      assert(r.getInt(0) == 16909060)
      assert(r.getString(1) == "1.2.3.4")
      assert(r.getLong(2) == 23L)
      val agg = spark.sql(
        """SELECT simhash_agg(t) AS sh FROM
          |  (SELECT explode(split('the quick brown fox', ' ')) AS t)""".stripMargin)
        .first().getLong(0)
      assert(agg != 0L)
      val vs = spark.sql(
        """SELECT vec_sum(v) FROM (SELECT array(1.0D, 2.0D) AS v
          |UNION ALL SELECT array(10.0D, 20.0D))""".stripMargin)
        .first().getSeq[Double](0)
      assert(vs == Seq(11.0, 22.0))
    } finally {
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
