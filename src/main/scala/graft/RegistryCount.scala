package graft
/** Dev helper: print registry sizes (queries vs oracle SQL entries). */
object RegistryCount {
  def main(args: Array[String]): Unit =
    println(s"QCOUNT=${SparkEntry.queries.size} OCOUNT=${SparkEntry.oracleSql.size}")
}
