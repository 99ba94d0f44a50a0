package org.apache.spark

/** Test-only accessor for the `private[spark]` listener bus: JobBudgetSpec
  * needs a DETERMINISTIC drain (waitUntilEmpty) instead of a fixed sleep,
  * which can under-count job starts on a loaded host.
  */
object GraftListenerBus {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
