package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the session-7 additions: personalized PageRank and SemDeDup
  * semantic near-dup pairs. Checks are algebraic identities (PPR with
  * the full seed set IS PageRank) and brute-force references on seeded
  * data (no Math.random).
  */
class Round4SessionSevenSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => x * 6364136223846793005L + 1442695040888963407L)
      .map(x => x >>> 33)

  test("personalizedPageRank with the full node set as seeds equals pageRank") {
    val s = spark; import s.implicits._
    val edges = lcg(9L).take(120).grouped(2)
      .map(p => (p.head % 40L, p(1) % 40L)).filter(p => p._1 != p._2)
      .toSeq.toDF("src", "dst")
    val all = edges.select(col("src").as("node_id"))
      .unionByName(edges.select(col("dst").as("node_id"))).distinct()
    val pr = GraphOps.pageRank(edges, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val ppr = GraphOps.personalizedPageRank(edges, all, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(ppr === pr)
  }

  test("personalizedPageRank: mass decays with hop distance from the seed") {
    val s = spark; import s.implicits._
    // directed path 0 -> 1 -> 2 -> 3 plus a disconnected pair 10 -> 11
    val edges = Seq((0L, 1L), (1L, 2L), (2L, 3L), (10L, 11L))
      .toDF("src", "dst")
    val seeds = Seq(0L).toDF("node_id")
    val got = GraphOps.personalizedPageRank(edges, seeds, 6)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got(0L) > got(1L) && got(1L) > got(2L) && got(2L) > got(3L),
      got.toString)
    // nothing reaches the disconnected component
    assert(got(10L) === 0L && got(11L) === 0L, got.toString)
    // the seed keeps at least the restart mass
    import GraphOps.{DampingPct, RankScale}
    assert(got(0L) >= (100L - DampingPct) * (RankScale / 100L))
  }

  test("semDedupPairs finds planted near-identical pairs in small clusters") {
    val s = spark; import s.implicits._
    // 40 well-separated base vectors (axis-ish directions) + a planted
    // near-copy of every 4th: the quantizer puts copy next to original
    val dim = 16
    val base = (0 until 40).map { i =>
      val v = Array.fill(dim)(0.01f * ((i * 7 + 3) % 5))
      v(i % dim) = 1f; v((i / dim + 1) % dim) = 0.5f
      (i.toLong, v.toSeq)
    }
    val copies = base.filter(_._1 % 4 == 0).map { case (id, v) =>
      (id + 1000L, v.updated(0, v.head + 0.001f))
    }
    val emb = (base ++ copies).toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = SimilarityOps.semDedupPairs(emb, 999000L)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // SemDeDup recall is cluster-local BY DESIGN: a pair whose copy
    // flips to a neighboring coarse cluster is missed (the documented
    // trade vs global LSH), so require most planted pairs, not all
    val want = copies.map(c => (c._1 - 1000L, c._1)).toSet
    assert(want.intersect(got).size * 10 >= want.size * 8,
      s"found only ${want.intersect(got).size}/${want.size}: missing ${want.diff(got)}")
    // and nothing below the threshold sneaks in: every reported pair is
    // a planted (original, copy) pair — the base vectors are separated
    assert(got.subsetOf(want), s"extra: ${got.diff(want)}")
  }

  test("hardNegatives: nothing at/above the ceiling, dense ranks, and " +
      "exclusion happens before the rank") {
    val s = spark; import s.implicits._
    val dim = 8
    // query 0; 3 near-copies (positives, cos ~ 1) and 5 spread vectors
    val base = Array.fill(dim)(1f)
    val rows = Seq((0L, base.toSeq)) ++
      (1 to 3).map(i => (i.toLong, base.updated(0, 1f + 0.0001f * i).toSeq)) ++
      (4 to 8).map { i =>
        val v = Array.fill(dim)(0.2f); v(i % dim) = 1f; (i.toLong, v.toSeq)
      }
    val emb = rows.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = SimilarityOps.hardNegatives(emb,
        emb.filter(col("vec_id") === 0L), 3, 999000L)
      .collect().map(r => (r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.forall(_._3 < 999000L), got.mkString(","))
    // the 3 near-copies are excluded BEFORE ranking, so ranks 1..3 are
    // the best of the spread vectors — a post-filtered top-3 of the raw
    // ranking would have returned ZERO rows here
    assert(got.map(_._2).sorted.toSeq === Seq(1L, 2L, 3L), got.mkString(","))
    assert(got.forall(g => g._1 >= 4L), got.mkString(","))
  }

  test("frontierSchedule: dense per-host slots, politeness spacing, stalest first") {
    val s = spark; import s.implicits._
    val caps = Seq(
      ("https://a.example.org/x?b=2&a=1", 100L),
      ("HTTPS://A.Example.ORG:443/x?a=1&b=2", 900L), // same canon url, newer
      ("https://a.example.org/y", 50L),
      ("https://b.example.org/z", 10L))
      .toDF("url", "us")
      .select(col("url"), timestamp_micros(col("us")).as("warc_ts"))
    val got = CrawlOps.frontierSchedule(caps, 1000000L, 15000000L)
      .collect().map(r => (r.getString(0), r.getString(1), r.getLong(2), r.getLong(3)))
    assert(got.length === 3) // the duplicate capture collapsed
    val byHost = got.groupBy(_._2)
    // dense slots 0..n-1 per host and delay-spaced fetch times
    byHost.foreach { case (_, rows) =>
      assert(rows.map(_._3).sorted.toSeq === rows.indices.map(_.toLong))
      rows.foreach(r => assert(r._4 === 1000000L + r._3 * 15000000L))
    }
    // stalest-first within host a: /y (50) before /x (max(100,900)=900)
    val a = byHost("a.example.org").sortBy(_._3).map(_._1)
    assert(a.head.contains("/y") && a(1).contains("/x"), a.mkString(","))
  }

  test("doubleSweepDiameter is exact on a path graph and tie-breaks deterministically") {
    val s = spark; import s.implicits._
    // path 5-4-3-2-1-0-10-11 (seed = min node 0): ecc(0) = 5 (node 5),
    // second sweep from 5 reaches 11 at distance 7 = the true diameter
    val edges = Seq((5L, 4L), (4L, 3L), (3L, 2L), (2L, 1L), (1L, 0L),
      (0L, 10L), (10L, 11L)).toDF("src", "dst")
    val r = GraphOps.doubleSweepDiameter(edges, 30).head()
    assert((r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))
      === ((0L, 5L, 5L, 11L, 7L)))
    // star: every leaf at distance 1 from hub 0; seed 0 picks leaf 1
    // (tie by min id), sweep from 1 crosses the hub: diameter 2
    val star = (1L to 6L).map(i => (0L, i)).toDF("src", "dst")
    val r2 = GraphOps.doubleSweepDiameter(star, 30).head()
    assert((r2.getLong(0), r2.getLong(1), r2.getLong(2), r2.getLong(4))
      === ((0L, 1L, 1L, 2L)))
  }

  test("gazetteerTag counts multi-word names exactly and picks the max-mention winner") {
    val s = spark; import s.implicits._
    val gaz = Seq((3L, "SAUDI ARABIA", "MIDDLE EAST"), (7L, "CANADA", "AMERICA"),
      (9L, "INDIA", "ASIA")).toDF("gaz_key", "gaz_name", "gaz_group")
    val docs = Seq(
      (1L, "visit saudi arabia twice: Saudi Arabia. canada once"),
      (2L, "india india India vs CANADA canada"),
      (3L, "nothing here"),
      (4L, "canada india")) // tie at 1 each -> min key 7 wins
      .toDF("doc_id", "text")
    val got = SearchOps.gazetteerTag(docs, gaz)
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(4)))).toMap
    assert(got === Map(1L -> ((3L, 2L)), 2L -> ((9L, 3L)), 4L -> ((7L, 1L))))
  }

  test("randomWalks: every hop follows an edge, walks stop at sinks, steps are dense") {
    val s = spark; import s.implicits._
    // 0 -> {1, 2}; 1 -> {2}; 2 is a sink
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L)).toDF("src", "dst")
    val rows = GraphOps.randomWalks(edges, 2, 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val edgeSet = Set((0L, 1L), (0L, 2L), (1L, 2L))
    val byWalk = rows.groupBy(_._1).view.mapValues(_.sortBy(_._2)).toMap
    // 2 walks per node with out-edges (nodes 0 and 1) = 4 walks
    assert(byWalk.size === 4, byWalk.keys.toSeq.sorted.mkString(","))
    byWalk.foreach { case (wid, path) =>
      assert(path.map(_._2).toSeq === (0L until path.length).toSeq, s"walk $wid gaps")
      path.sliding(2).foreach {
        case Array(a, b) => assert(edgeSet((a._3, b._3)), s"walk $wid: ${a._3}->${b._3}")
        case _ =>
      }
      // a walk only ends early at the sink
      if (path.length < 4) assert(path.last._3 === 2L, s"walk $wid stopped at ${path.last._3}")
    }
  }

  test("semDedupPairs mega-cluster stays bounded and still finds dups") {
    val s = spark; import s.implicits._
    // 300 near-identical vectors: ONE coarse cluster of size 300 >
    // MaxSemCluster, so the LSH-refined path must engage — output pairs
    // must stay far below the 300*299/2 = 44850 all-pairs blowup while
    // still finding near-dups (identical vectors share every bucket, but
    // the per-(cid, table, bucket) cap skips oversized groups; the
    // perturbations spread vectors over nearby buckets)
    val dim = 16
    val emb = (0 until 300).map { i =>
      val v = Array.fill(dim)(1f)
      v(i % dim) = 1f + 0.002f * (i / dim)
      (i.toLong, v.toSeq)
    }.toDF("vec_id", "embedding")
      .select(col("vec_id"), col("embedding").cast("array<float>").as("embedding"))
    val got = SimilarityOps.semDedupPairs(emb, 999900L).collect()
    assert(got.length < 44850 / 2, s"unbounded: ${got.length} pairs")
  }
}
