package graft.streaming

import org.apache.spark.sql.streaming.StreamingQueryListener
import java.util.concurrent.ConcurrentLinkedDeque

/** ST9 stream monitoring: the reference's dashboard polls
  * `@Statistics PROCEDUREPROFILE` deltas for TPS
  * (`/root/reference/web/js/voltdb-dashboard.js:100-160`); Structured
  * Streaming pushes the equivalent — per-batch row counts and rates —
  * through StreamingQueryListener. This listener keeps a bounded
  * in-memory window of progress samples per query for a serving/UI
  * tier to read. */
final class RateMonitor(maxSamples: Int = 256) extends StreamingQueryListener {
  final case class Sample(queryName: String, batchId: Long, numInputRows: Long,
                          inputRowsPerSecond: Double, processedRowsPerSecond: Double,
                          timestamp: String)

  private val samples = new ConcurrentLinkedDeque[Sample]()

  override def onQueryStarted(e: StreamingQueryListener.QueryStartedEvent): Unit = ()
  override def onQueryTerminated(e: StreamingQueryListener.QueryTerminatedEvent): Unit = ()

  override def onQueryProgress(e: StreamingQueryListener.QueryProgressEvent): Unit = {
    val p = e.progress
    samples.addLast(Sample(
      Option(p.name).getOrElse(p.id.toString), p.batchId, p.numInputRows,
      orZero(p.inputRowsPerSecond), orZero(p.processedRowsPerSecond),
      p.timestamp))
    while (samples.size() > maxSamples) samples.pollFirst()
  }

  private def orZero(d: Double): Double = if (d.isNaN || d.isInfinite) 0.0 else d

  def snapshot(): Seq[Sample] = {
    val it = samples.iterator()
    val b = Seq.newBuilder[Sample]
    while (it.hasNext) b += it.next()
    b.result()
  }

  /** Latest observed processing rate per query — the dashboard's TPS. */
  def currentRates(): Map[String, Double] =
    snapshot().groupBy(_.queryName)
      .map { case (n, ss) => n -> ss.maxBy(_.batchId).processedRowsPerSecond }
}
