package org.apache.spark

import org.apache.spark.memory.TaskMemoryManager

/** Bridge to the `private[spark]` task memory manager, so graft's
  * custom physical operators can register their retained state as an
  * accounted [[org.apache.spark.memory.MemoryConsumer]] (the same pool
  * Spark's own hash/sort operators draw from). Kept to this single
  * accessor. */
object GraftTaskShim {
  def taskMemoryManager(tc: TaskContext): TaskMemoryManager = tc.taskMemoryManager()
}
