package graft

import org.apache.spark.sql.SparkSession

/** Sample driver for the S10 HTTP façade: starts the query server over
  * sf0.001 and issues the dashboard's own call sequence
  * (`/root/reference/web/js/demo.js:1-35`: the 5 procedures at 1 Hz). */
object ServerDemo {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val srv = new graft.server.QueryServer(spark, "/root/testdata/sf0.001")
    val port = srv.start()
    val client = java.net.http.HttpClient.newHttpClient()
    val calls = Seq(
      "GetTopUsers" -> "[60,10]", "GetTopDests" -> "[60,10]",
      "GetTopSources" -> "[10]", "GetTopSrcDests" -> "[10]",
      "GetEventsByCluster" -> "[60]", "Bogus" -> "[]")
    // two rounds: the second shows steady-state dashboard latency
    // against the cached view tier (the reference polls at 1 Hz)
    (1 to 2).foreach { round =>
      calls.foreach { case (proc, params) =>
        val t0 = System.nanoTime()
        val r = client.send(
          java.net.http.HttpRequest.newBuilder(java.net.URI.create(
            s"http://127.0.0.1:$port/api/1.0/?Procedure=$proc&Parameters=$params")).build(),
          java.net.http.HttpResponse.BodyHandlers.ofString())
        val ms = (System.nanoTime() - t0) / 1e6
        println(f"[server] r$round $proc%-20s ${r.statusCode()} ${ms}%8.1f ms ${r.body().take(100)}")
      }
    }
    srv.stop(); spark.stop()
  }
}
