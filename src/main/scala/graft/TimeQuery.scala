package graft

/** Dev tool: time one SparkEntry query in isolation (3 passes, cache
  * cleared between passes) — the per-query magnifier for Bench results on
  * this noisy shared host. Usage: runMain graft.TimeQuery <name> [sfDir].
  */
object TimeQuery {
  def main(args: Array[String]): Unit = {
    val name = args(0)
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val spark = BenchScale.session(sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt)
    spark.sparkContext.setLogLevel("WARN")
    (1 to 3).foreach { pass =>
      graft.core.CacheScope.releaseGlobal()
      spark.sharedState.cacheManager.clearCache()
      val t0 = System.nanoTime()
      val rows = SparkEntry.queries(name)(spark, sfDir).count()
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"[time] $name pass $pass: $sec%.2f s ($rows rows)")
    }
    spark.stop()
  }
}
