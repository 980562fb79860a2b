package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.{Column, DataFrame}

/** Dev tool: stage-by-stage timing of q_traj_cluster's chain. */
object DebugTraj {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val spark = BenchScale.session(32)
    spark.sparkContext.setLogLevel("WARN")
    def tm[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"[dbg] $label: ${(System.nanoTime() - t0) / 1e9}%.2f s"); r
    }
    val wp = SparkEntry.wayPoints(
      spark.read.parquet(s"$sfDir/lineitem.parquet"))
    val tracks = graft.core.CacheScope.global.persist(
      wp.groupBy("way_id").agg(
        array_sort(collect_list(struct(col("seq"), col("x"), col("y")))).as("p"))
      .select(col("way_id"),
        expr("transform(p, q -> q.x)").as("xs"),
        expr("transform(p, q -> q.y)").as("ys")))
    val n = tm("tracks count") { tracks.count() }
    println(s"[dbg] tracks = $n")
    val thr = if (n <= SparkEntry.FrechetSmallN) SparkEntry.FrechetThrSmall
      else SparkEntry.FrechetThr
    val pairs = graft.core.CacheScope.global.persist(
      operators.SpatialOps.frechetJoin(tracks, tracks, thr,
        coverLevel = SparkEntry.TrackCoverLevel, selfJoin = true)
        .select(col("way_a").as("doc_a"), col("way_b").as("doc_b")))
    val np = tm("pairs materialize") { pairs.count() }
    println(s"[dbg] pairs = $np")
    val adj = pairs.agg(
      sum(when(abs(col("doc_a") - col("doc_b")) <= 32, 1L).otherwise(0L)).as("near"),
      sum(when(abs(col("doc_a") - col("doc_b")) <= 4096, 1L).otherwise(0L)).as("mid"))
      .head()
    println(s"[dbg] |a-b|<=32: ${adj.getLong(0)}  <=4096: ${adj.getLong(1)} of $np")
    val (labels, rounds) = tm("duplicateClustersCounted") {
      val (l, r) = operators.DedupOps.duplicateClustersCounted(
        pairs, graft.core.CacheScope.global)
      (l.persist(), r)
    }
    val nl = tm("labels materialize") { labels.count() }
    println(s"[dbg] labels = $nl rounds = $rounds")
    val out = tm("final groupBy") {
      labels.groupBy("cluster_id").agg(count(lit(1)).as("n_tracks")).count()
    }
    println(s"[dbg] clusters = $out")
    spark.stop()
  }
}
