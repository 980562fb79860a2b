package org.apache.spark

/** Bridge to the spark-private listener bus drain (metrics snapshots need
  * the asynchronous stage-completed events delivered before reading).
  */
object GraftListenerBridge {
  def waitUntilEmpty(sc: SparkContext): Unit = sc.listenerBus.waitUntilEmpty()
}
