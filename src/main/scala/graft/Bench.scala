package graft

import org.apache.spark.sql.SparkSession
import graft.sources.Synth

/** Per-round benchmark: runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR (default sf0.1) at local[SPARK_GRAFT_CPUS]
  * (default 32) and prints ONE JSON line:
  *   {"metric":"total","value":<sec>,"unit":"sec","queries":{...},
  *    "flagship_rows_per_sec":<n>,"sf":...}
  *
  * The headline north-rule metric is flagship_rows_per_sec: output rows of
  * the spatial-join + tiling slice (points → PIP → tile counts) per second
  * of wall clock, measured after one warm-up. BenchScale (separate main)
  * produces the N-vs-4N scaling evidence in BENCH/BASELINE.md.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    // sampled BEFORE the run: mid/post-run readings measure the benchmark's
    // own threads. Gate regression conclusions on start load < 3 (the
    // sandbox host carries external spikes with 2-4x swings).
    val loadStart = BenchScale.loadAvg()
    val spark = BenchScale.session(cpus.toInt)
    spark.sparkContext.setLogLevel("WARN")

    // flagship throughput: points processed through PIP join + tiling per
    // second of wall clock, on the ${BenchScale.Rep}x-replicated set. NB:
    // at this small replication the job is scan/schedule-overhead-bound —
    // the authoritative north-rule throughput + scaling evidence is
    // BENCH/BASELINE.md (BenchScale, 2048x replication)
    val flagshipRps = {
      val warm = BenchScale.flagship(spark, sfDir, BenchScale.Rep).count() // warm-up
      val t0 = System.nanoTime()
      val joined = BenchScale.flagship(spark, sfDir, BenchScale.Rep)
        .agg(org.apache.spark.sql.functions.sum("count")).collect()(0).getLong(0)
      val sec = (System.nanoTime() - t0) / 1e9
      val pts = Synth.points(spark, sfDir).count() * BenchScale.Rep
      System.err.println(
        s"[bench] flagship: $pts points -> $joined joined rows in ${f"$sec%.2f"}s (warm=$warm)")
      pts / sec
    }

    // two passes per query, min taken: the sandbox host carries external
    // load spikes (observed 2-4x swings on identical code), and the first
    // pass also absorbs codegen/JIT warm-up — min-of-2 reports the
    // engine's actual cost, not the noise envelope
    val results = SparkEntry.queries.toSeq.sortBy(_._1).map { case (name, fn) =>
      val secs = (1 to 2).map { pass =>
        // clear persisted intermediates so pass 2 re-measures the full
        // query (min-of-2 damps host noise and JIT warm-up, not real work)
        graft.core.CacheScope.releaseGlobal()
        spark.sharedState.cacheManager.clearCache()
        val t0 = System.nanoTime()
        val rows = try fn(spark, sfDir).count() catch {
          case e: Throwable =>
            System.err.println(s"[bench] $name FAILED: ${e.getMessage}"); -1L
        }
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(s"[bench] $name pass $pass: ${f"$sec%.2f"}s ($rows rows)")
        // a failed pass must not win the min with its fast-fail time
        if (rows < 0) Double.MaxValue else sec
      }
      name -> (if (secs.min == Double.MaxValue) -1.0 else secs.min)
    }
    val qs = results.map { case (k, v) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"flagship_rows_per_sec":$flagshipRps,"load":$loadStart,"sf":"$sfDir"}""")
    spark.stop()
  }
}
