package graft

/** Dev tool: contrast the two flagship formulations at the same
  * replication to locate fixed-overhead vs per-row cost. Usage:
  * runMain graft.TimeFlagship [rep].
  */
object TimeFlagship {
  def main(args: Array[String]): Unit = {
    val rep = if (args.nonEmpty) args(0).toInt else 256
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = BenchScale.session(32)
    spark.sparkContext.setLogLevel("WARN")
    def time(name: String)(job: => Long): Unit = (1 to 3).foreach { pass =>
      val t0 = System.nanoTime()
      val out = job
      println(f"[time] $name pass $pass: ${(System.nanoTime() - t0) / 1e9}%.2f s ($out)")
    }
    import org.apache.spark.sql.functions.sum
    if (args.length > 1 && args(1) == "explain") {
      BenchScale.flagship(spark, sfDir, rep).explain("formatted")
      BenchScale.flagshipScale(spark, sfDir, rep).explain("formatted")
      spark.stop(); return
    }
    time("flagship(pip+tiles)") {
      BenchScale.flagship(spark, sfDir, rep).agg(sum("count")).collect()(0).getLong(0)
    }
    time("flagshipScale(left+hav)") {
      BenchScale.flagshipScale(spark, sfDir, rep).agg(sum("n")).collect()(0).getLong(0)
    }
    // decomposition: replicate+tiles only, +join, +join+pip
    import org.apache.spark.sql.functions._
    import graft.functions.Fns
    import graft.sources.Synth
    val base = Synth.points(spark, sfDir)
    def pts = base.withColumn("r", explode(sequence(lit(0), lit(rep - 1))))
      .select((col("pid") * rep + col("r")).as("pid"), col("lon_fix"), col("lat_fix"))
    def tiles(df: org.apache.spark.sql.DataFrame) = df.select(
        Fns.tileX(8, Fns.fixToDeg(col("lon_fix"))).as("tx"),
        Fns.tileY(8, Fns.fixToDeg(col("lat_fix"))).as("ty"))
      .groupBy("tx", "ty").count().agg(sum("count")).collect()(0).getLong(0)
    val ss = spark; import ss.implicits._
    val cover = Synth.hexagons.flatMap { h =>
      graft.core.CellId.coverBBox(h.xs.min, h.ys.min, h.xs.max, h.ys.max,
        operators.SpatialOps.CoverLevel).map(c => (c, h.polyId))
    }.toDF("cell", "poly_id")
    val polyMap: graft.plans.PipKernel.Polys =
      Synth.hexagons.map(h => h.polyId -> Array((h.xs, h.ys))).toMap
    time("tiles-only") { tiles(pts) }
    time("join-no-pip") {
      tiles(pts.withColumn("cell", Fns.cellId(col("lon_fix"), col("lat_fix"),
          operators.SpatialOps.CoverLevel))
        .join(broadcast(cover), "cell"))
    }
    time("join+pip") {
      tiles(pts.withColumn("cell", Fns.cellId(col("lon_fix"), col("lat_fix"),
          operators.SpatialOps.CoverLevel))
        .join(broadcast(cover), "cell")
        .filter(graft.plans.PointInPolygonSet(
          spark, col("poly_id"), col("lon_fix"), col("lat_fix"), polyMap)))
    }
    spark.stop()
  }
}
