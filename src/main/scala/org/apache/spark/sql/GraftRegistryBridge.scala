package org.apache.spark.sql

/** Registers the engine's SQL functions into an ALREADY-BUILT session —
  * the runtime counterpart of `withExtensions(new GraftExtensions)` for
  * sessions the library didn't construct (notebooks, the driver's verify
  * harness). Lives in the sql package because FunctionRegistry hangs off
  * the sql-private sessionState.
  */
object GraftRegistryBridge {
  def install(spark: SparkSession): Unit = {
    val reg = spark.asInstanceOf[classic.SparkSession].sessionState.functionRegistry
    graft.plans.GraftExtensions.functions.foreach { case (id, info, builder) =>
      reg.registerFunction(id, info, builder)
    }
  }
}
