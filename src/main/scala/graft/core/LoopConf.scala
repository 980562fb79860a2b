package graft.core

import org.apache.spark.sql.DataFrame

/** Session-config scoping for iterative operators. */
object LoopConf {

  /** Run `body` with AQE post-shuffle coalescing ENABLED, restoring the
    * previous setting afterwards. Round-loop operators (components, SCC,
    * MST, BFS) are LATENCY-bound — a hundred tiny sequential jobs — so
    * folding their near-empty shuffle outputs is a pure win even in bench
    * sessions that disable coalescing to measure flagship throughput; at
    * 100 TB the 64MB advisory never folds below the core count, so scale
    * behavior is unchanged.
    */
  def withCoalescing[T](df: DataFrame)(body: => T): T = {
    val spark = df.sparkSession
    val key = "spark.sql.adaptive.coalescePartitions.enabled"
    val prev = spark.conf.getOption(key)
    spark.conf.set(key, "true")
    try body
    finally prev match {
      case Some(v) => spark.conf.set(key, v)
      case None => spark.conf.unset(key)
    }
  }
}
