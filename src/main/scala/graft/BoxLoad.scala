package graft

/** Shared-box load evidence for benchmark artifacts.
  *
  * Round-12's committed headline bench regressed ~21% vs round-11 under
  * documented external load spikes on the shared machine (loadavg bursts
  * to 9-22 every ~20-40 min), and separating that noise from a real
  * regression required archaeology across IMPLEMENTATION.md notes. Every
  * bench main now embeds the 1-minute loadavg at start and end of its
  * timed work so future readers can tell a noisy run from a slow engine
  * without leaving the JSON artifact.
  */
object BoxLoad {
  /** 1-minute loadavg from /proc/loadavg; -1 if unreadable (non-Linux). */
  def loadavg1m(): Double =
    try {
      val line = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/loadavg")), "UTF-8")
      line.trim.split("\\s+")(0).toDouble
    } catch { case _: Throwable => -1.0 }

  /** `"loadavg_before":a,"loadavg_after":b` JSON fragment (no braces). */
  def jsonFields(before: Double, after: Double): String =
    f""""loadavg_before":$before%.2f,"loadavg_after":$after%.2f"""

  /** (stealTicks, totalTicks) from /proc/stat's aggregate cpu line.
    * On this shared VM the documented "external load spikes" are
    * largely HYPERVISOR STEAL — co-tenant VMs taking physical CPU away
    * — which never appears in loadavg or the process table. The steal
    * fraction over the timed window is the direct evidence: ~0% means
    * a clean run; multi-percent means wall-clock timings are inflated
    * by contention no code change can fix. */
  def stealSnap(): (Long, Long) =
    try {
      val line = new String(java.nio.file.Files.readAllBytes(
        java.nio.file.Paths.get("/proc/stat")), "UTF-8")
        .linesIterator.next()
      val cols = line.trim.split("\\s+").drop(1).map(_.toLong)
      // steal is field 8 (user nice sys idle iowait irq softirq steal).
      // Denominator = the first 8 fields ONLY: the trailing guest/
      // guest_nice are already counted inside user/nice, so summing
      // them double-counts guest time and understates steal_pct on
      // hosts running guests.
      (cols(7), cols.take(8).sum)
    } catch { case _: Throwable => (-1L, -1L) }

  /** Percent of CPU time stolen by the hypervisor since `s0`. */
  def stealPctSince(s0: (Long, Long)): Double = {
    val s1 = stealSnap()
    if (s0._1 < 0 || s1._1 < 0 || s1._2 <= s0._2) -1.0
    else 100.0 * (s1._1 - s0._1) / (s1._2 - s0._2).toDouble
  }
}
