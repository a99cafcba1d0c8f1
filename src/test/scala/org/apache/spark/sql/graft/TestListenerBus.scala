package org.apache.spark.sql.graft

import org.apache.spark.SparkContext

/** Test-only access to the `private[spark]` listener bus: lets specs
  * drain asynchronously-dispatched `QueryExecutionListener` events before
  * asserting on what they observed (needed to audit plans that execute
  * eagerly inside an operator via `localCheckpoint`). */
object TestListenerBus {
  def drain(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
