package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.core.CacheScope
import graft.operators.{DedupOps, SpatialOps}
import graft.sources.Synth

/** Throwaway A/B: cell-graph vs run-compressed vectorizeRaster at sf0.1. */
object TimeVecAB {
  private def vectorizeCells(cells: DataFrame, scope: CacheScope): DataFrame = {
    val c = scope.persist(cells.select(col("bx"), col("by"),
      (col("bx") * lit(4194304L) + col("by")).as("k")))
    val edges = Seq((1, 0), (0, 1)).map { case (dx, dy) =>
      c.join(c.select((col("bx") - dx).as("bx"), (col("by") - dy).as("by"),
          col("k").as("nk")), Seq("bx", "by"))
        .select(col("k").as("doc_a"), col("nk").as("doc_b"))
    }.reduce(_ unionByName _)
    val labels = DedupOps.duplicateClusters(edges, scope)
    c.join(labels.withColumnRenamed("doc_id", "k"), Seq("k"), "left")
      .withColumn("comp", coalesce(col("cluster_id"), col("k")))
      .groupBy("comp")
      .agg(min("bx").as("min_bx"), min("by").as("min_by"),
        max("bx").as("max_bx"), max("by").as("max_by"),
        count(lit(1)).as("n_cells"))
      .select(col("comp").as("component_id"), col("min_bx"), col("min_by"),
        col("max_bx"), col("max_by"), col("n_cells"))
  }

  def main(args: Array[String]): Unit = {
    val spark = BenchScale.session(32)
    spark.sparkContext.setLogLevel("ERROR")
    val d = args.headOption.getOrElse("/root/testdata/sf0.1")
    val pts = Synth.points(spark, d)
    val n = pts.count()
    var level = 6
    while (level < 12 && n > (1L << (2 * level))) level += 1
    val occ = SpatialOps.equirectDensity(pts, level).filter(col("cnt") >= 3)
    println(s"[ab] occupied cells: ${occ.count()}, level $level")
    for (pass <- 1 to 2; (name, f) <- Seq(
      "cells" -> ((df: DataFrame, s: CacheScope) => vectorizeCells(df, s)),
      "runs" -> ((df: DataFrame, s: CacheScope) => SpatialOps.vectorizeRaster(df, s)))) {
      val scope = new CacheScope
      val t0 = System.nanoTime()
      val cnt = f(occ, scope).count()
      println(f"[ab] $name pass $pass: ${(System.nanoTime() - t0) / 1e9}%.2f s ($cnt components)")
      scope.release()
    }
    spark.stop()
  }
}
