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
