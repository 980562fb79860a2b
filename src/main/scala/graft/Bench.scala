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
    // ENFORCED (round-5): a run that would start above the gate WAITS for
    // the host to quiesce (up to ~10 min, 30 s probes); if it never does,
    // the run proceeds but the artifact self-marks "gate_failed": true so
    // a non-compliant run can never be snapshotted as authoritative
    // per-query evidence again (the round-4 BENCH_r04 ran at load 4.21).
    val loadStart = {
      var l = BenchScale.loadAvg(); var waited = 0
      while (l >= 3.0 && waited < 600) {
        System.err.println(f"[bench] start load $l%.2f >= 3 gate - waiting 30s (${waited}s so far)")
        Thread.sleep(30000); waited += 30; l = BenchScale.loadAvg()
      }
      l
    }
    val gateFailed = loadStart >= 3.0
    if (gateFailed) System.err.println(
      f"[bench] GATE FAILED: start load $loadStart%.2f >= 3 after max wait - artifact self-marks gate_failed")
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
      name -> (secs.map(v => if (v == Double.MaxValue) -1.0 else v),
        if (secs.min == Double.MaxValue) -1.0 else secs.min)
    }

    // self-defense against session contention: compare each query's
    // min-of-2 against the PREVIOUS run's (BENCH/last_run.json, read
    // before overwrite) and list >2x slowdowns in the artifact — a flagged
    // query under high load is a contention artifact, a flagged query at
    // low load on stable code is a real regression (see BENCH/NOTES.md
    // three-strikes protocol). Sub-0.2s priors are skipped (pure jitter).
    val lastRunPath = java.nio.file.Paths.get("BENCH/last_run.json")
    val prior: Map[String, Double] =
      if (java.nio.file.Files.exists(lastRunPath)) {
        try {
          val node = new com.fasterxml.jackson.databind.ObjectMapper()
            .readTree(java.nio.file.Files.readString(lastRunPath)).get("queries")
          val it = node.fields()
          val b = Map.newBuilder[String, Double]
          while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.asDouble() }
          b.result()
        } catch { case e: Throwable =>
          System.err.println(s"[bench] prior run unreadable: ${e.getMessage}"); Map.empty }
      } else Map.empty
    val flagged = results.collect {
      case (name, (_, sec)) if sec > 0 && prior.get(name).exists(p => p >= 0.2 && sec > 2 * p) =>
        name -> (sec / prior(name))
    }
    def ratioStr(r: Double): String =
      String.format(java.util.Locale.ROOT, "%.2f", Double.box(r))
    flagged.foreach { case (n, ratio) =>
      System.err.println(s"[bench] FLAGGED $n: ${ratioStr(ratio)}x its previous-run time") }

    val qs = results.map { case (k, (_, v)) => "\"" + k + "\":" + v }.mkString("{", ",", "}")
    val passes = results.map { case (k, (ps, _)) =>
      "\"" + k + "\":" + ps.mkString("[", ",", "]") }.mkString("{", ",", "}")
    // Locale.ROOT: a comma-decimal default locale would emit invalid JSON
    val flaggedJson = flagged.map { case (k, r) =>
      "\"" + k + "\":" + ratioStr(r) }.mkString("{", ",", "}")
    val total = results.map(_._2._2).sum
    val json = s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"passes":$passes,"flagged":$flaggedJson,"flagship_rows_per_sec":$flagshipRps,"load":$loadStart,"gate_failed":$gateFailed,"sf":"$sfDir"}"""
    // the bare-JSON artifact: sbt buries the stdout line under [info]
    // prefixes, which broke the driver's parse in round 3 — the file is
    // the robust machine-readable copy
    java.nio.file.Files.createDirectories(lastRunPath.getParent)
    java.nio.file.Files.writeString(lastRunPath, json + "\n")
    println(json)
    spark.stop()
  }
}
