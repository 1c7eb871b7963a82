package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Seeded clickstream event generator with the reference feeder's
  * distributions (S1 fidelity; `client/src/events/LogGenerator.java:
  * 82-124,237-247` and the client data files):
  *
  *  - source IP: uniform pick over 46,053 CIDR-style ranges, then a
  *    uniform offset within the range (`nextIp`, ips.csv has 46,053
  *    rows). The ranges here are SYNTHESIZED seeded (prefix lengths
  *    weighted toward /16-/24 like public IPv4 allocation tables) —
  *    same cardinality and shape, no copied data file;
  *  - dest URL: uniform over 49 URLs (urls.txt has 49 lines); the
  *    dests dimension additionally carries the empty-string sentinel
  *    the reference inserts as the 50th row (`loadUrls`);
  *  - method: constant "GET";
  *  - ts: monotonically increasing µs (the reference stamps wall-clock
  *    µs per call);
  *  - value: uniform non-negative int (`Math.abs(rand.nextInt())`);
  *  - referral: empty HALF the time, else uniform over the 49 URLs
  *    (`rand.nextBoolean() ? "" : urls.get(...)`);
  *  - agent: uniform over 75 agent strings (agents.txt has 75 lines).
  *
  * Everything derives from splitmix64 mixing of (seed, row id) — no
  * RNG state, so generation is deterministic, partition-independent,
  * and embarrassingly parallel: `spark.range(n)` scales to any
  * cluster width with zero driver involvement.
  */
object EventGen {
  val NumIpRanges = 46053
  val NumUrls = 49
  val NumAgents = 75

  case class GenEvent(event_id: Long, src: Int, dest: String, method: String,
                      ts_micros: Long, value: Long, referral: String, agent: String)

  /** splitmix64 finalizer (public-domain mixing constants). Runs in
    * plain JVM arithmetic (wrapping), deliberately outside Spark SQL
    * expressions where ANSI mode would throw on the intended wrap. */
  @inline def mix(x: Long): Long = {
    var z = x + 0x9E3779B97F4A7C15L
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^ (z >>> 31)
  }

  @inline private def bounded(h: Long, n: Int): Int =
    java.lang.Math.floorMod(h, n.toLong).toInt

  val urls: IndexedSeq[String] =
    (0 until NumUrls).map(i => f"www.site$i%02d.example.com")

  val agentStrings: IndexedSeq[String] =
    (0 until NumAgents).map(i =>
      s"SynthBrowser/${i / 10}.${i % 10} (Platform ${i % 5}; rv:${i % 9}.0) Engine/${100 + i}")

  /** 46,053 seeded (start, end) IPv4 ranges. ~370 KB — computed once
    * per JVM (executors re-derive it locally; nothing ships). */
  lazy val ipRanges: Array[(Int, Int)] = {
    (0 until NumIpRanges).map { i =>
      val h = mix(0x5EEDD1A5L * 1000003L + i)
      // prefix mix: a few /8s, mostly /16../24 — allocation-table shape
      val p = bounded(h >>> 8, 100) match {
        case r if r < 2  => 8
        case r if r < 10 => 12
        case r if r < 35 => 16
        case r if r < 65 => 20
        case _           => 24
      }
      val maskBits = -1 << (32 - p)
      val base = (h >>> 32).toInt & maskBits
      (base, base | ~maskBits)
    }.toArray
  }

  /** n deterministic events from `seed`, distributed via spark.range. */
  def events(spark: SparkSession, n: Long, seed: Long = 42L,
             baseTsMicros: Long = 1700000000000000L): DataFrame = {
    import spark.implicits._
    spark.range(n).as[Long].map { i =>
      val k = seed * 0x100000001B3L + i * 8
      val hRange = mix(k); val hOff = mix(k + 1); val hUrl = mix(k + 2)
      val hVal = mix(k + 3); val hRef = mix(k + 4); val hAgent = mix(k + 5)
      val (lo, hi) = ipRanges(bounded(hRange, NumIpRanges))
      val span = hi - lo + 1 // range sizes are 2^8..2^24, never overflow
      val src = lo + bounded(hOff, span)
      val referral = if ((hRef & 1L) == 0L) "" else urls(bounded(hRef >>> 1, NumUrls))
      GenEvent(i, src, urls(bounded(hUrl, NumUrls)), "GET",
        baseTsMicros + i, (hVal >>> 33), referral, agentStrings(bounded(hAgent, NumAgents)))
    }.toDF()
      .withColumn("ts", expr("timestamp_micros(ts_micros)"))
  }

  /** The dests dimension exactly as the reference loads it: the 49
    * URLs plus the empty-string sentinel as the final row
    * (`LogGenerator.loadUrls` inserts `(49, "")`). */
  def dests(spark: SparkSession): DataFrame = {
    import spark.implicits._
    (urls.zipWithIndex.map { case (u, i) => (i.toLong, u) } :+ (NumUrls.toLong, ""))
      .toDF("id", "key")
  }

  def agents(spark: SparkSession): DataFrame = {
    import spark.implicits._
    agentStrings.zipWithIndex.map { case (a, i) => (i.toLong, a) }.toDF("id", "key")
  }

  type Q = (SparkSession, String) => DataFrame

  /** Registry entry: generate as many events as the sf dir's events
    * table holds (so the generated feed is the same scale the real
    * one is at that sf). No oracle — DuckDB can't reproduce the JVM
    * mixing — covered by EventGenSpec's distribution checks. */
  val queries: Map[String, Q] = Map(
    "gen_events" -> ((s, d) => {
      val n = graft.Tables.events(s, d).select(col("event_id")).count()
      events(s, n).select("event_id", "src", "dest", "method", "ts", "value", "referral", "agent")
        .orderBy("event_id")
    })
  )

  val oracles: Map[String, String] = Map.empty
}
