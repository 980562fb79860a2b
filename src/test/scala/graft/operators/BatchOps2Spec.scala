package graft.operators

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the round-4 session-3 operators: integer PageRank, interval
  * overlap join, exact quantiles, BM25/postings, and the live-session SQL
  * registry bridge. Each operator is compared against an independent
  * local (driver-side) reference computation on seeded data.
  */
class BatchOps2Spec extends AnyFunSuite with BeforeAndAfterAll {
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

  // deterministic LCG for seeded inputs (no Math.random in specs)
  private def lcg(seed: Long): Iterator[Long] =
    Iterator.iterate(seed)(x => (x * 6364136223846793005L + 1442695040888963407L))
      .map(x => (x >>> 33))

  test("pageRank matches a driver-side integer reference on a seeded graph") {
    val s = spark; import s.implicits._
    val edges = lcg(42).take(400).grouped(2)
      .map(p => (p.head % 50, p.last % 50)).filter(e => e._1 != e._2)
      .toSeq.distinct
    val df = edges.toDF("src", "dst")
    val got = GraphOps.pageRank(df, 5).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    graft.core.CacheScope.releaseGlobal()

    // local fixed-point reference
    val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
    val outdeg = edges.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    var rank = nodes.map(_ -> GraphOps.RankScale).toMap
    for (_ <- 1 to 5) {
      val in = scala.collection.mutable.Map.empty[Long, Long].withDefaultValue(0L)
      edges.foreach { case (a, b) => in(b) += rank(a) / outdeg(a) }
      rank = nodes.map(n => n -> (150000L + 85L * in(n) / 100L)).toMap
    }
    assert(got === rank)
    // mass never exceeds the initial total (dangling mass only leaks out)
    assert(got.values.sum <= nodes.size * GraphOps.RankScale)
  }

  test("intervalJoin equals brute force; multi-bucket pairs emit once; span contract drops") {
    val s = spark; import s.implicits._
    val rnd = lcg(7)
    def mk(n: Int, idBase: Long) = (0 until n).map { i =>
      val st = (rnd.next() % 1000L) * 3600L
      val dur = (rnd.next() % 90L + 1L) * 3600L // 1..90 "hours" (contract max 72)
      (idBase + i, rnd.next() % 3L, st, st + dur)
    }
    val l = mk(120, 0); val r = mk(120, 1000)
    val maxSpan = 72L * 3600L
    val got = HistoryOps.intervalJoin(
        l.toDF("lid", "key", "start_us", "end_us"),
        r.toDF("rid", "key", "start_us", "end_us"),
        bucketUs = 24L * 3600L, maxSpanUs = maxSpan)
      .collect().map(x => (x.getLong(0), x.getLong(1), x.getLong(2), x.getLong(3)))
    val expect = for {
      (lid, lk, ls, le) <- l if le - ls <= maxSpan
      (rid, rk, rs, re) <- r if re - rs <= maxSpan
      if lk == rk && ls <= re && rs <= le
    } yield (lid, rid, lk, math.min(le, re) - math.max(ls, rs))
    assert(got.length === got.distinct.length) // anchor-bucket dedup: no dupes
    assert(got.toSet === expect.toSet)
    assert(expect.nonEmpty)
    // the contract really dropped something (durations go beyond 72h)
    assert(l.exists(x => x._4 - x._3 > maxSpan))
  }

  // independent recursive Douglas-Peucker reference (same exact-integer
  // split rule, different structure: recursion + Scala max, no stack)
  private def refDp(pts: IndexedSeq[(Long, Long, Long)], tol: Long): Set[Long] = {
    val n = pts.length
    if (n <= 2) return pts.map(_._1).toSet
    val tol2 = BigInt(tol) * tol
    def rec(a: Int, b: Int): Set[Int] = {
      if (b - a < 2) return Set.empty
      val (_, xa, ya) = pts(a); val (_, xb, yb) = pts(b)
      val dx = BigInt(xb - xa); val dy = BigInt(yb - ya)
      val l2 = dx * dx + dy * dy
      val (cr, p2, _, k) = (a + 1 until b).map { k =>
        val (_, xk, yk) = pts(k)
        ((dx * BigInt(ya - yk) - dy * BigInt(xa - xk)).abs,
          BigInt(xk - xa).pow(2) + BigInt(yk - ya).pow(2), -k, k)
      }.max
      val split = if (l2 == 0) p2 > tol2 else cr * cr > tol2 * l2
      if (split) rec(a, k) ++ rec(k, b) + k else Set.empty
    }
    (rec(0, n - 1) + 0 + (n - 1)).map(i => pts(i)._1)
  }

  test("simplifyWays == recursive DP reference on 80-point ways (beyond the oracle's unroll)") {
    val s = spark; import s.implicits._
    val rnd = lcg(77)
    // random-walk ways, 80 points each — deeper than any 5-stage unroll
    val ways = (0 until 6).map { w =>
      var x = 0L; var y = 0L
      (0 until 80).map { i =>
        x += rnd.next() % 2000001L - 1000000L
        y += rnd.next() % 2000001L - 1000000L
        (w.toLong, i.toLong, x, y)
      }
    }
    val df = ways.flatten.toDF("way_id", "seq", "x", "y")
    val tol = 800000L
    val got = SpatialOps.simplifyWays(df, tol).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    for (w <- ways) {
      val expect = refDp(w.map(p => (p._2, p._3, p._4)), tol)
      assert(got(w.head._1) === expect)
      // non-degenerate: simplification kept some interior but not all
      assert(expect.size > 2 && expect.size < 80)
    }
  }

  test("simplifyWays edge cases: collinear, closed way, tol 0, tiny ways") {
    val s = spark; import s.implicits._
    val collinear = (0 until 10).map(i => (1L, i.toLong, i * 1000000L, i * 2000000L))
    val closed = Seq((2L, 0L, 0L, 0L), (2L, 1L, 5000000L, 0L),
      (2L, 2L, 0L, 100L), (2L, 3L, 0L, 0L)) // first == last
    val tiny = Seq((3L, 0L, 7L, 7L), (4L, 0L, 1L, 2L), (4L, 1L, 3L, 4L))
    val df = (collinear ++ closed ++ tiny).toDF("way_id", "seq", "x", "y")
    val got = SpatialOps.simplifyWays(df, 1000000L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(got(1L) === Set(0L, 9L))          // exactly-on-chord drops
    // degenerate chord: farthest-by-p2 (seq 1) kept, near point dropped
    assert(got(2L) === Set(0L, 1L, 3L))
    assert(got(3L) === Set(0L))              // 1-point way passes through
    assert(got(4L) === Set(0L, 1L))          // 2-point way passes through
    // tol=0 keeps every off-chord point, still drops exact-collinear ones
    val got0 = SpatialOps.simplifyWays(df, 0L).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).groupBy(_._1)
      .view.mapValues(_.map(_._2).toSet).toMap
    assert(got0(1L) === Set(0L, 9L))
    assert(got0(2L) === Set(0L, 1L, 2L, 3L))
  }

  test("overlapStats == brute-force range overlap; wide files pair-excluded but present") {
    val s = spark; import s.implicits._
    val rnd = lcg(55)
    val files = (0 until 150).map { i =>
      val mn = (rnd.next() % 40L) * 250L
      ("p" + (rnd.next() % 3), i.toLong, mn, mn + rnd.next() % 3000L + 1L)
    }
    val maxSpan = 2000L
    val got = LayoutOps.overlapStats(
        files.toDF("part_key", "file_id", "min_key", "max_key"),
        bucketKeys = 500L, maxSpanKeys = maxSpan)
      .collect().map(r => r.getLong(1) -> r.getLong(2)).toMap
    val in = files.filter(f => f._4 - f._3 <= maxSpan)
    val expect = files.map { f =>
      f._2 -> (if (f._4 - f._3 > maxSpan) 0L
        else in.count(g => g._2 != f._2 && g._1 == f._1 &&
          f._3 <= g._4 && g._3 <= f._4).toLong)
    }.toMap
    assert(got === expect)
    assert(files.exists(f => f._4 - f._3 > maxSpan))  // contract exercised
    assert(expect.values.exists(_ > 0) && expect.values.exists(_ == 0))
  }

  test("geofenceTransitions: membership flips only, per-polygon timelines independent") {
    val s = spark; import s.implicits._
    // entity 1 visits polys A(=10) and B(=20); entity 2 never leaves A
    val track = Seq((1L, 1L), (1L, 2L), (1L, 3L), (1L, 4L), (1L, 5L),
      (2L, 1L), (2L, 2L)).toDF("entity", "ts")
    val hits = Seq(
      (1L, 1L, 10), (1L, 2L, 10),            // in A at 1,2 -> exit at 3
      (1L, 4L, 10),                          // re-enter A at 4 -> exit at 5
      (1L, 2L, 20), (1L, 3L, 20),            // enter B at 2, exit at 4
      (2L, 1L, 10), (2L, 2L, 10)             // always in A: no events
    ).toDF("entity", "ts", "poly_id")
    val got = SpatialOps.geofenceTransitions(track, hits).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2), r.getString(3))).toSet
    assert(got === Set(
      (1L, 3L, 10, "exit"), (1L, 4L, 10, "enter"), (1L, 5L, 10, "exit"),
      (1L, 2L, 20, "enter"), (1L, 4L, 20, "exit")))
    // entity 1 was inside A at its FIRST observation: no spurious enter
    assert(!got.contains((1L, 1L, 10, "enter")))
  }

  test("lmScore == driver-side Laplace bigram reference; trained text scores lower") {
    val s = spark; import s.implicits._
    val train = Seq((0L, "the cat sat on the mat"), (7L, "the cat ran"))
    val corpus = train ++ Seq(
      (1L, "the cat sat"),       // in-distribution
      (2L, "zig zag zog quux"),  // fully unseen
      (3L, "lonely"))            // single token: no bigram, no row
    val got = LmOps.lmScore(corpus.toDF("doc_id", "text"), train.toDF("doc_id", "text"))
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    // reference over raw token STRINGS (no hashing — independent path)
    def toks(t: String) = t.split(" ").filter(_.nonEmpty).toSeq
    val uc = train.flatMap(t => toks(t._2)).groupBy(identity).view.mapValues(_.size).toMap
    val bc = train.flatMap(t => toks(t._2).sliding(2).filter(_.size == 2).map(w => (w(0), w(1))).toSeq)
      .groupBy(identity).view.mapValues(_.size).toMap
    val v = uc.size
    for ((id, text) <- corpus) {
      val bs = toks(text).sliding(2).filter(_.size == 2).toSeq
      if (bs.nonEmpty) {
        val es = bs.map { w =>
          val x = (uc.getOrElse(w.head, 0) + v).toDouble /
            (bc.getOrElse((w.head, w(1)), 0) + 1).toDouble
          graft.core.Hll.lnE6(x)
        }
        assert(got(id) === ((bs.size.toLong, es.sum / bs.size)))
      } else assert(!got.contains(id))
    }
    assert(got(1L)._2 < got(2L)._2) // in-distribution beats gibberish
  }

  test("decontaminate flags shifted benchmark overlap; clean docs score zero") {
    val s = spark; import s.implicits._
    val passage = (1 to 10).map(i => s"leak$i").mkString(" ")
    val bench = Seq((1000L, s"intro words $passage outro words"))
    val corpus = Seq(
      // contaminated at a DIFFERENT alignment than in the benchmark doc
      (1L, s"a b c d e $passage tail tail"),
      (2L, (1 to 30).map(i => s"clean$i").mkString(" ")), // no overlap
      (3L, "too short"))                                  // < n tokens: no window
    val got = DedupOps.decontaminate(
        corpus.toDF("doc_id", "text"), bench.toDF("doc_id", "text"), 8)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getLong(3))).toMap
    assert(got.keySet === Set(1L, 2L))       // doc 3 has no window
    assert(got(2L) === ((23L, 0L, 0L)))      // 30 tokens -> 23 windows, clean
    val (n1, h1, pm1) = got(1L)
    assert(n1 === 10L)                       // 17 tokens -> 10 windows
    assert(h1 === 3L)                        // the 3 windows inside the passage
    assert(pm1 === 300L)
  }

  test("redactPii replaces emails, IPs and SSN-shaped ids; other text untouched") {
    val s = spark; import s.implicits._
    val rows = Seq(
      (1L, "write to Jane.Doe+spam@sub.Example.org or call later"),
      (2L, "server at 192.168.0.1 and id 123-45-6789 leaked"),
      (3L, "version 1.2 costs $3.50, ratio 10.5, id 12-345-678"), // none match
      (4L, "a@b.co x@y.io 10.0.0.1")) // multiple on one line
    val got = rows.toDF("doc_id", "text")
      .select(col("doc_id"), graft.functions.Fns.redactPii(col("text")))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got(1L) === "write to <EMAIL> or call later")
    assert(got(2L) === "server at <IP> and id <ID> leaked")
    assert(got(3L) === rows(2)._2)
    assert(got(4L) === "<EMAIL> <EMAIL> <IP>")
  }

  test("compactionPlan: greedy in-order packing, groups bounded by target + max file") {
    val s = spark; import s.implicits._
    val rnd = lcg(99)
    val files = (0 until 300).map { i =>
      ("p" + (rnd.next() % 4), i.toLong, rnd.next() % 5000L + 1L)
    }
    val target = 12000L
    val got = LayoutOps.compactionPlan(
        files.toDF("part_key", "file_id", "bytes"), target)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))

    // reference: sequential fold per partition in file_id order
    val expect = files.groupBy(_._1).flatMap { case (pk, fs) =>
      var cum = 0L
      fs.sortBy(_._2).map { case (_, fid, b) =>
        val g = cum / target; cum += b; (pk, fid, b, g)
      }
    }.toSet
    assert(got.toSet === expect)
    // every group is bounded above by target + max file, and cumulative
    // bytes through a closed group reach that group's window boundary
    // (a single group may hold < target only via predecessor overshoot)
    for ((pk, rows) <- got.groupBy(_._1)) {
      val byGrp = rows.sortBy(_._2).groupBy(_._4)
      val maxG = byGrp.keys.max
      for ((g, members) <- byGrp) {
        val sz = members.map(_._3).sum
        assert(sz < target + files.map(_._3).max, s"oversized group $g in $pk")
        if (g < maxG) {
          val cumThrough = rows.filter(_._4 <= g).map(_._3).sum
          assert(cumThrough >= (g + 1) * target, s"closed group $g in $pk short")
        }
      }
      // groups partition the listing into contiguous runs
      val ordered = rows.sortBy(_._2).map(_._4)
      assert(ordered === ordered.sorted)
    }
  }

  test("exactQuantiles = sorted-order statistics (ceil rank, lower quantile)") {
    val s = spark; import s.implicits._
    val vals = lcg(13).take(500).map(v => ("g" + (v % 2), (v % 37).toInt)).toSeq
    val got = StatsOps.exactQuantiles(vals.toDF("grp", "v"), "grp", "v",
        Seq(1, 500, 900, 1000))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getInt(2))).toMap
    for (g <- Seq("g0", "g1"); q <- Seq(1, 500, 900, 1000)) {
      val sorted = vals.filter(_._1 == g).map(_._2).sorted
      val idx = ((sorted.size.toLong * q + 999) / 1000).toInt // ceil rank, 1-based
      assert(got((g, q)) === sorted(idx - 1), s"group $g q=$q")
    }
  }

  test("exactQuantilesWeighted = weighted order statistics (ceil weight rank)") {
    val s = spark; import s.implicits._
    val vals = lcg(29).take(400)
      .map(v => ("g" + (v % 2), (v % 23).toInt, 1L + (v % 9))).toSeq
    val got = StatsOps.exactQuantilesWeighted(
        vals.toDF("grp", "v", "w"), "grp", "v", "w", Seq(250, 500, 900))
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getInt(2))).toMap
    for (g <- Seq("g0", "g1"); q <- Seq(250, 500, 900)) {
      val rows = vals.filter(_._1 == g).sortBy(_._2)
      val total = rows.map(_._3).sum
      val thr = (total * q + 999) / 1000
      var cum = 0L
      val want = rows.find { r => cum += r._3; cum >= thr }.get._2
      assert(got((g, q)) === want, s"group $g q=$q")
    }
  }

  test("sampledQuantiles: exact when the group fits k; subset-exact beyond") {
    val s = spark; import s.implicits._
    def mixRef(c: Long): Long = {
      val M = 2147483647L
      def xs(z: Long) = z ^ (z >> 16)
      val z0 = ((c % M) + M) % M
      val z1 = xs((z0 * 1103515245L + 12345L) % M)
      xs((z1 * 69069L + 1L) % M)
    }
    val rows = (0L until 400L).map(i =>
      ("g" + (i % 3), i, (mixRef(i * 7 + 1) % 1000).toInt))
    val df = rows.toDF("grp", "id", "v")
    val qs = Seq(250, 500, 900)
    // k larger than any group: sample = group, estimates = exact quantiles
    val exact = StatsOps.sampledQuantiles(df, "grp", "id", "v", 1000, qs)
      .collect().map(r => ((r.getString(0), r.getInt(1)), r.getInt(2))).toMap
    for (g <- Seq("g0", "g1", "g2"); q <- qs) {
      val sorted = rows.filter(_._1 == g).map(_._3).sorted
      val idx = ((sorted.size.toLong * q + 999) / 1000).toInt
      assert(exact((g, q)) === sorted(idx - 1), s"exact branch $g q=$q")
    }
    // k smaller: the estimate is the exact quantile OF the deterministic
    // bottom-k mixId sample — replicate the sample driver-side
    val k = 20
    val got = StatsOps.sampledQuantiles(df, "grp", "id", "v", k, qs)
      .collect()
      .map(r => ((r.getString(0), r.getInt(1)), (r.getInt(2), r.getLong(3))))
      .toMap
    for (g <- Seq("g0", "g1", "g2"); q <- qs) {
      val sample = rows.filter(_._1 == g)
        .sortBy(t => (mixRef(t._2 * 2654435761L + 97L), t._2)).take(k)
      val sorted = sample.map(_._3).sorted
      val idx = ((sorted.size.toLong * q + 999) / 1000).toInt
      assert(got((g, q)) === ((sorted(idx - 1), sample.size.toLong)),
        s"sampled branch $g q=$q")
    }
  }

  test("bm25 matches a local replication; postings are capped, sorted, df-exact") {
    val s = spark; import s.implicits._
    val docs = Seq(
      (1L, "spark joins the fast spark engine"),
      (2L, "merge sort beats hash join sometimes"),
      (3L, "window functions window over spark window"),
      (4L, "plain text with none of them"),
      (5L, "spark spark spark merge")).toDF("doc_id", "text")
    val terms = Seq("spark", "merge", "window")
    val got = SearchOps.bm25(docs, terms).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap

    val toks = Seq(
      1L -> Seq("spark", "joins", "the", "fast", "spark", "engine"),
      2L -> Seq("merge", "sort", "beats", "hash", "join", "sometimes"),
      3L -> Seq("window", "functions", "window", "over", "spark", "window"),
      4L -> Seq("plain", "text", "with", "none", "of", "them"),
      5L -> Seq("spark", "spark", "spark", "merge"))
    val n = toks.size
    val avgdl = toks.map(_._2.size).sum.toDouble / n.toDouble
    val dfm = terms.map(t => t -> toks.count(_._2.contains(t))).toMap
    val idf = terms.map(t => t -> graft.core.Hll.lnDet(
      ((n - dfm(t)).toDouble + 0.5) / (dfm(t).toDouble + 0.5) + 1.0)).toMap
    val expect = toks.flatMap { case (id, tk) =>
      val scores = terms.flatMap { t =>
        val tf = tk.count(_ == t).toDouble
        if (tf == 0) None else Some(math.round(
          idf(t) * ((tf * SearchOps.K1Plus1) /
            (tf + SearchOps.K1 * (SearchOps.OneMinusB +
              SearchOps.B * (tk.size.toDouble / avgdl)))) * 1000000.0))
      }
      if (scores.isEmpty) None else Some(id -> (scores.size.toLong, scores.sum))
    }.toMap
    assert(got === expect)

    val posts = SearchOps.postings(docs, minDf = 1, maxPostings = 2).collect()
      .map(r => (r.getString(0), r.getLong(1),
        r.getSeq[org.apache.spark.sql.Row](2).map(x => (x.getLong(0), x.getLong(1)))))
    val sparkRow = posts.find(_._1 == "spark").get
    assert(sparkRow._2 === 3L)                       // df counts ALL docs
    assert(sparkRow._3 === Seq((1L, 2L), (3L, 1L)))  // capped at 2, doc_id-sorted
  }

  test("GraftRegistryBridge: SQL functions on a live session equal the Column surface") {
    val s = spark; import s.implicits._
    org.apache.spark.sql.GraftRegistryBridge.install(s)
    Seq(("en", "a\"b", 1L), ("de", "c=d,e", 2L)).toDF("lang", "source", "id")
      .createOrReplaceTempView("brt")
    val viaSql = s.sql(
      "SELECT id, tags_kv(map('lang', lang, 'source', source), ',') AS kv, " +
        "tags_hstore(map('lang', lang, 'source', source)) AS hs, " +
        "url_norm_host('SVN+ssh://u@WWW.Example.ORG:22/r') AS h FROM brt")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    val tags = map(lit("lang"), col("lang"), lit("source"), col("source"))
    val viaCol = s.table("brt").select(col("id"),
        graft.functions.TagStrings.tagsKeyEqualsValue(tags, ","),
        graft.functions.TagStrings.tagsHstore(tags),
        graft.functions.Fns.urlNormHost(lit("SVN+ssh://u@WWW.Example.ORG:22/r")))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(2), r.getString(3)))
    assert(viaSql.sortBy(_._1) === viaCol.sortBy(_._1))
    assert(viaSql.head._4 === "www.example.org")
  }
}
