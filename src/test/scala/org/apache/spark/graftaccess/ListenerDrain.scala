package org.apache.spark.graftaccess

import org.apache.spark.SparkContext

/** Test-only bridge to the private[spark] listener bus: lets specs drain
  * pending listener events deterministically instead of sleeping.
  */
object ListenerDrain {
  def drain(sc: SparkContext, timeoutMillis: Long): Unit =
    sc.listenerBus.waitUntilEmpty(timeoutMillis)
}
