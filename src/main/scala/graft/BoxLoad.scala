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
}
