package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.CacheScope
import graft.functions.Fns

/** Training-data-pipeline deduplication operators over a (doc_id, text)
  * corpus. All emit deterministic integer/string outputs.
  *
  * Scale notes: exact dedup is a single hash-shuffle groupBy; MinHash/LSH
  * shuffles only (band_key → doc) pairs (k·rows, narrow); candidate
  * verification joins are band-bucket-local. Pair outputs are
  * candidate-bounded, never all-pairs.
  */
object DedupOps {

  /** Exact duplicate groups keyed by (sha256, length) of the full text;
    * keeps the smallest doc_id as the canonical representative
    * (deterministic). The composite key makes an accidental-collision
    * false-merge effectively impossible at the 10^12-row posture (md5
    * alone is 128-bit and collision-constructible).
    */
  def exactDuplicates(corpus: DataFrame): DataFrame =
    corpus.groupBy(sha2(col("text"), 256).as("text_sha"),
        length(col("text")).cast("long").as("text_len"))
      .agg(min("doc_id").as("keep_id"), count(lit(1)).as("n"))
      .filter(col("n") > 1)

  /** Cross-document boilerplate detection at sub-document granularity
    * (the CCNet/RefinedWeb line-dedup adapted to unbroken text): the doc
    * is cut into non-overlapping `w`-token chunks (native WordChunkHashes
    * — one codegen'd pass per row, no word explode), a chunk is
    * boilerplate when it occurs in >= `minDocs` DISTINCT documents, and
    * each doc reports how much of it is boilerplate.
    *
    * Output: (doc_id, n_chunks, n_boiler, boiler_pm) for every doc with
    * at least one full chunk; boiler_pm = floor(n_boiler*1000/n_chunks),
    * the CCNet-style drop-threshold score.
    *
    * Scale: explode is narrow (doc_id, hash) pairs; the global chunk
    * count is one hash-shuffle groupBy with partial aggregation (the
    * distinct-doc count first collapses (hash, doc) map-side); the
    * filtered boiler set joins back to the chunk stream — planned as a
    * broadcast-hash join while the boiler set is small and a shuffle
    * equi-join (AQE) once it outgrows the threshold — and the final
    * per-doc rollup shuffles one narrow row per chunk instance. The
    * chunk stream is recomputed (not cached) on both sides of the join:
    * a map-only explode is cheaper to replay than to persist at corpus
    * scale. No step is quadratic.
    */
  def boilerplateChunks(corpus: DataFrame, w: Int = 8,
                        minDocs: Int = 2): DataFrame = {
    val chunked = corpus.select(col("doc_id"),
      explode(graft.plans.TextHashExpressions.wordChunkHashes(col("text"), w)).as("ch"))
    val boiler = chunked.groupBy("ch")
      .agg(countDistinct("doc_id").as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("ch"), lit(1L).as("__b"))
    chunked.join(boiler, Seq("ch"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_chunks"), count(col("__b")).as("n_boiler"))
      .withColumn("boiler_pm", expr("n_boiler * 1000 DIV n_chunks"))
  }

  val NumMinHashes = 12
  val BandSize = 4
  val ShingleCap = 256
  val ShingleLen = 10

  /** MinHash signatures (k = NumMinHashes) over character-10-gram shingles
    * of the first ShingleCap chars, via the native ShingleMinHash
    * expression (the Column-composed Fns form is the executable spec but
    * evaluates interpreted lambdas per character — >100x slower).
    * Parameters tuned so band collisions on non-duplicates stay rare even
    * on a narrow-vocabulary corpus.
    */
  def minHashSignatures(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"),
      graft.plans.TextHashExpressions
        .shingleMinHash(col("text"), ShingleCap, ShingleLen, NumMinHashes).as("mh"))

  /** Band buckets larger than this are skipped by the LSH candidate
    * generation: a bucket of size s emits O(s^2) pairs, so one degenerate
    * mega-bucket (boilerplate shingles, near-empty docs) can dominate the
    * whole job at corpus scale. Measured bucket sizes on the test corpora
    * top out at 7, so the cap is inert at verification scale; exact
    * duplicates skipped this way are the exact-dedup pipeline's job
    * anyway. The DuckDB oracle replicates the cap bit-for-bit.
    */
  val MaxBandBucket = 64

  /** LSH candidate pairs: docs sharing at least one band (bands of
    * BandSize consecutive minhashes, band key = mod-chained polynomial).
    * Output (doc_a < doc_b, n_bands). One pass over the corpus (posexplode
    * of the band-key array), banded rows persisted for the self-join —
    * shuffle cost is O(bands·rows) narrow rows; never all-pairs, and
    * per-bucket pair count is bounded by MaxBandBucket^2.
    */
  /** (doc_id, band, band_key) banded rows — the LSH bucketing both the
    * batch self-join and the streaming candidate operator share (one
    * stateless narrow pass: signature + posexplode of the band keys).
    */
  def bandedRows(corpus: DataFrame): DataFrame = {
    val nBands = NumMinHashes / BandSize
    val bandKeys = Fns.bindOnce(col("mh")) { mh =>
      transform(sequence(lit(0), lit(nBands - 1)), b => {
        (0 until BandSize).map(i => element_at(mh, b * BandSize + i + 1))
          .reduceLeft((acc, c) => (acc * lit(1000003L) + c) % lit(1000000007L))
      })
    }
    minHashSignatures(corpus)
      .select(col("doc_id"), posexplode(bandKeys).as(Seq("band", "band_key")))
  }

  /** Drop every row of a bucket larger than MaxBandBucket: the one
    * guard all three LSH candidate generators (and their QUALIFY oracle
    * twins) share. `keys` identify the bucket.
    */
  private[graft] def capBuckets(rows: DataFrame, keys: Seq[String]): DataFrame = {
    val small = rows.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("__bsz"))
      .filter(col("__bsz") <= MaxBandBucket)
      .select(keys.map(col): _*)
    rows.join(small, keys)
  }

  def minHashLshPairs(corpus: DataFrame,
                      scope: CacheScope = CacheScope.global): DataFrame = {
    // persisted (scope-released): feeds the bucket-size filter and both
    // sides of the candidate self-join
    val banded = scope.persist(bandedRows(corpus))
    val kept = capBuckets(banded, Seq("band", "band_key"))
    val a = kept.as("a"); val b = kept.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .groupBy(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Incremental near-dup candidates: a NEW batch LSH-joined against the
    * EXISTING corpus only — the shape every crawl ingestion actually runs
    * (pair today's batch against the index; never re-self-join the
    * accumulated corpus). At scale the existing side's banded rows are a
    * PRECOMPUTED index written once at ingest (see LayoutOps.writeBucketed
    * for the layout that makes the band-key join exchange-free); per batch
    * the work is one banded pass over the batch plus a bounded bucket
    * join. Both sides get the MaxBandBucket cap, computed per side —
    * a degenerate band key saturated on BOTH sides would otherwise emit
    * |old|·|new| pairs. Output (doc_new, doc_old, n_bands).
    */
  def minHashLshPairsIncremental(existing: DataFrame, fresh: DataFrame,
                                 scope: CacheScope = CacheScope.global): DataFrame = {
    val keptOld = capBuckets(scope.persist(bandedRows(existing)),
      Seq("band", "band_key"))
    val keptNew = capBuckets(scope.persist(bandedRows(fresh)),
      Seq("band", "band_key"))
    keptNew.as("n").join(keptOld.as("o"),
        col("n.band") === col("o.band") && col("n.band_key") === col("o.band_key"))
      .groupBy(col("n.doc_id").as("doc_new"), col("o.doc_id").as("doc_old"))
      .agg(count(lit(1)).as("n_bands"))
  }

  /** Rounds between plan-lineage rebases in duplicateClusters. */
  val ClusterRebaseEvery = 3

  /** Rounds of plain min-label propagation before pointer jumping kicks
    * in: dup-pair graphs are usually shallow (a handful of near-copies per
    * component), where the jump's extra self-join per round is pure
    * overhead — it pays only on deep chains that survive the first rounds.
    */
  val ClusterJumpAfter = 3

  /** Duplicate-cluster assignment: connected components over the pair
    * graph, cluster id = smallest doc_id in the component — the step a
    * dedup pipeline runs after pair generation to pick one canonical
    * representative per group of transitively-linked near-duplicates.
    */
  def duplicateClusters(pairs: DataFrame,
                        scope: CacheScope = CacheScope.global): DataFrame =
    duplicateClustersCounted(pairs, scope)._1

  /** duplicateClusters exposing the round count (spec'd convergence bound).
    *
    * Min-label propagation with ADAPTIVE POINTER JUMPING: each round every
    * node adopts the minimum label over its closed neighborhood; from
    * round ClusterJumpAfter+1 on, it additionally shortcuts to its label's
    * label (labels are always node ids, so the lookup is a complete
    * self-join). The shortcut halves the remaining distance to the
    * component minimum, so a component of diameter d converges in
    * O(ClusterJumpAfter + log d) rounds — a 10^6-link boilerplate chain
    * (common in crawl data: paginated near-copies) costs ~25 rounds, not
    * 10^6 — while the common shallow graph never pays the jump's extra
    * self-join. Convergence is detected on the round's own frame (the old
    * label is carried through), so each round is exactly one materializing
    * count with no extra comparison join.
    *
    * Scale hygiene (the round-2 verdict's leak): the superseded label
    * frame is unpersisted as soon as the next round's materializes, and
    * every ClusterRebaseEvery rounds the plan is rebased through the
    * cached RDD, so Catalyst never re-optimizes an ever-deeper join chain.
    * Only the final label frame survives, registered in `scope` for the
    * caller to release after consuming the result.
    */
  private[graft] def duplicateClustersCounted(pairs: DataFrame,
      scope: CacheScope): (DataFrame, Int) = {
    val e = scope.persist(pairs.select(col("doc_a"), col("doc_b")))
    if (e.count() <= GraphOps.LocalSweepEdges &&
        GraphOps.integralId(pairs.schema("doc_a").dataType,
          pairs.schema("doc_b").dataType))
      (duplicateClustersLocal(e), 0)
    else duplicateClustersContractedLoop(e, scope)
  }

  /** The distributed contraction + pointer-jump machinery of
    * [[duplicateClusters]] (spec-reachable directly — the convergence
    * and contraction specs exercise it below the dispatch budget).
    */
  private[graft] def duplicateClustersContractedLoop(pairs: DataFrame,
      scope: CacheScope): (DataFrame, Int) =
    graft.core.LoopConf.withCoalescing(pairs) {
      val (nodeRoot, contracted) = contractPairs(pairs, scope)
      val (rootLabels, rounds) = duplicateClustersLoop(contracted, scope)
      val idType = pairs.schema("doc_a").dataType
      val out = nodeRoot.join(
          rootLabels.withColumnRenamed("doc_id", "mroot"), Seq("mroot"), "left")
        .select(col("node").cast(idType).as("doc_id"),
          coalesce(col("cluster_id"), col("mroot")).cast(idType)
            .as("cluster_id"))
      (out, rounds)
    }

  /** Single-shard twin of [[duplicateClusters]] under
    * [[GraphOps.LocalSweepEdges]]: one union-find task over the whole
    * pair list. Unions always direct the larger root at the smaller, so
    * find(x) IS the component's minimum member — the same label contract
    * as the contraction + jump path (and the same kernel as
    * [[contractPairs]]' per-partition pass, here seeing every edge);
    * parity spec'd.
    */
  private[graft] def duplicateClustersLocal(e: DataFrame): DataFrame = {
    val sess = e.sparkSession
    import sess.implicits._
    val idType = e.schema("doc_a").dataType
    e.select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)].coalesce(1).mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x
          while (c != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
        val out = new scala.collection.mutable.ArrayBuffer[
          (Long, Long)](parent.size)
        val ks = parent.keySet().iterator()
        while (ks.hasNext) { val k = ks.next(); out += ((k, find(k))) }
        out.iterator
      }.toDF("doc_id", "cluster_id")
      .select(col("doc_id").cast(idType).as("doc_id"),
        col("cluster_id").cast(idType).as("cluster_id"))
  }

  /** Per-partition edge budget for one cascaded-contraction pass: a
    * union-find pass is allowed to see at most ~this many edges per
    * partition (the in-memory map is O(nodes), nodes ≤ 2·edges), so the
    * cascade's partition count is always derived from the REMAINING edge
    * count and executor memory stays bounded no matter how the graph
    * shrinks.
    */
  val SingleShotEdges: Long = 1L << 20

  /** CASCADED partition-local union-find CONTRACTION: collapse the pair
    * graph as far as repeated local passes can before the global round
    * loop ever runs. One pass: each partition's edges go through an
    * in-memory union-find (union by MIN id, path-compressed find —
    * memory is O(nodes in the partition), which the pass's partition
    * count bounds), emitting (node, local root). A node whose edges are
    * spread over several partitions gets several local roots — each such
    * multi-membership IS a cross-partition merge, so the groupBy(node)
    * that follows emits the CONTRACTED graph: one edge
    * (root, min root of the node) per extra membership.
    *
    * A single hash-partitioned pass contracts chain-shaped graphs badly
    * (a path's edges scatter over P partitions, so ~(1−1/P) of them
    * span partitions — measured 7% shrink on the trajectory pair graph,
    * leaving a 42-round pointer-jump loop). So the pass CASCADES: after
    * each pass the surviving contracted edges are re-counted and
    * re-sharded into ceil(edges / [[SingleShotEdges]]) partitions — a
    * strictly smaller partition count, each partition still
    * memory-bounded — and contracted again. The partition count shrinks
    * geometrically, so the cascade runs ≤ log(P) passes, and once the
    * remaining graph fits one [[SingleShotEdges]] shard the final pass
    * resolves every component exactly and the round loop sees an EMPTY
    * graph (one convergence-check round, no propagation). Graphs too
    * large to cascade to one shard (cross-partition edges still above
    * the per-pass budget × current shard count) stop early and hand the
    * remainder to the pointer-jump loop — the cascade never regresses
    * the loop's asymptotics, it only shrinks the loop's input.
    *
    * Labels are unchanged by any number of passes: the global component
    * minimum m is its own local root wherever it appears, every local
    * root is a component member ≥ m, and roots chain to m through the
    * contracted edges — so the loop's min-label output on the final
    * roots, mapped back through the COMPOSED (node → min root) mapping,
    * reproduces exactly the labels the plain loop assigns (spec'd parity
    * on random graphs). Returns (node→mroot mapping over every node in
    * `pairs`, contracted edges as (doc_a, doc_b) — possibly empty).
    */
  private[graft] def contractPairs(pairs: DataFrame,
      scope: CacheScope): (DataFrame, DataFrame) = {
    val sess = pairs.sparkSession
    import sess.implicits._

    def unionFindPass(edges: org.apache.spark.sql.Dataset[(Long, Long)]): DataFrame = edges
      .mapPartitions { it =>
        val parent = new java.util.HashMap[Long, Long]()
        def find(x: Long): Long = {
          var r = x
          while (parent.get(r) != r) r = parent.get(r)
          var c = x
          while (c != r) { val nx = parent.get(c); parent.put(c, r); c = nx }
          r
        }
        it.foreach { case (a, b) =>
          if (!parent.containsKey(a)) parent.put(a, a)
          if (!parent.containsKey(b)) parent.put(b, b)
          val ra = find(a); val rb = find(b)
          if (ra < rb) parent.put(rb, ra)
          else if (rb < ra) parent.put(ra, rb)
        }
        val out = new scala.collection.mutable.ArrayBuffer[(Long, Long)](parent.size)
        val ks = parent.keySet().iterator()
        while (ks.hasNext) { val k = ks.next(); out += ((k, find(k))) }
        out.iterator
      }
      .toDF("node", "root")

    var edges: org.apache.spark.sql.Dataset[(Long, Long)] = pairs
      .select(col("doc_a").cast("long"), col("doc_b").cast("long"))
      .as[(Long, Long)]
    var mapping: DataFrame = null
    var contracted: DataFrame = null
    var lastParts = -1 // first pass rides the caller's partitioning
    var continue = true
    while (continue) {
      val nr = scope.persist(unionFindPass(edges).groupBy("node")
        .agg(min("root").as("mroot"), collect_set("root").as("roots")))
      val m = nr.select(col("node"), col("mroot"))
      // compose this pass's root mapping onto the cumulative one: only
      // roots that still had cross-partition edges re-appear in the next
      // pass, so absent roots keep their current mroot (left + coalesce)
      mapping = if (mapping == null) m
        else scope.persist(mapping.join(
            m.select(col("node").as("mroot"), col("mroot").as("mroot2")),
          Seq("mroot"), "left")
          .select(col("node"),
            coalesce(col("mroot2"), col("mroot")).as("mroot")))
      contracted = scope.persist(nr
        .select(col("mroot"), explode(col("roots")).as("r"))
        .filter(col("r") =!= col("mroot"))
        .select(col("r").as("doc_a"), col("mroot").as("doc_b"))
        .distinct())
      val n = contracted.count()
      val cur = if (lastParts > 0) lastParts else contracted.rdd.getNumPartitions
      val target = math.max(1L, (n + SingleShotEdges - 1) / SingleShotEdges).toInt
      if (n == 0 || target >= cur) continue = false
      else {
        lastParts = target
        edges = contracted.repartition(target).as[(Long, Long)]
      }
    }
    (mapping, contracted)
  }

  private[graft] def duplicateClustersLoop(pairs: DataFrame,
                                           scope: CacheScope): (DataFrame, Int) = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val symRaw = scope.persist(edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst"))))
    // ENTRY-side plan rebase: the caller's pair plan can be arbitrarily
    // deep (an LSH candidate tree, a radius-join cover tree), and EVERY
    // round references sym twice plus labels (which also descends from
    // sym) — without cutting the lineage here, Catalyst re-analyzes the
    // multiplied caller tree on every round's action (measured 22 s/round
    // driver CPU on q_dbscan's 2k-edge graph vs <1 s of actual compute).
    // The rebase wraps the persisted frame's RDD, so data still comes
    // from cache and the loop's plans start from a leaf.
    val sym = spark.createDataFrame(symRaw.rdd, symRaw.schema)
    var labels = sym.select(col("src").as("id")).distinct()
      .withColumn("label", col("id"))
    var prev: DataFrame = null
    var changed = 1L
    var rounds = 0
    while (changed > 0) {
      rounds += 1
      val prop = sym.join(
          labels.select(col("id").as("dst"), col("label").as("nbl")), "dst")
        .groupBy(col("src").as("id")).agg(min("nbl").as("nbr"))
      val stepped = labels.select(col("id"), col("label").as("old"))
        .join(prop, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("nbr"), col("old"))).as("label"))
      var roundCache: DataFrame = null
      val roundOut =
        if (rounds <= ClusterJumpAfter) stepped
        else {
          // persisted for this round only: the shortcut self-join reads it
          // on both sides (shuffled by different keys, no exchange reuse)
          roundCache = stepped.persist()
          roundCache.join(
              roundCache.select(col("id").as("lid"), col("label").as("llabel")),
              col("label") === col("lid"))
            .select(col("id"), col("old"), least(col("label"), col("llabel")).as("label"))
        }
      val next = roundOut.persist()
      changed = next.filter(col("label") =!= col("old")).count()
      if (roundCache != null) roundCache.unpersist(blocking = false)
      if (prev != null) prev.unpersist(blocking = false)
      prev = next
      val lbl = next.select(col("id"), col("label"))
      // plan-lineage rebase: every ClusterRebaseEvery-th plain round, and
      // EVERY jump round — the shortcut self-join DOUBLES the logical plan
      // per round, and without a per-round cut the analyzer/optimizer walk
      // of the exponentially nested tree dominates wall time by round ~6
      // (measured ~20 s of driver CPU on a 10k-node graph) even though all
      // data comes from cache. The rebase wraps the cached RDD — no
      // recompute, no shuffle.
      labels =
        if (changed > 0 &&
            (rounds >= ClusterJumpAfter || rounds % ClusterRebaseEvery == 0))
          spark.createDataFrame(lbl.toDF().rdd, lbl.schema)
        else lbl
    }
    scope.track(prev)
    (prev.select(col("id").as("doc_id"), col("label").as("cluster_id")), rounds)
  }

  /** Durable, resumable duplicate clustering — the same min-label
    * propagation with adaptive pointer jumping as
    * [[duplicateClustersCounted]], but every round's label frame commits
    * to `stateDir` through [[CheckpointOps.iterateResumable]]: a
    * pre-empted clustering job over a 10^12-doc candidate graph restarts
    * from its last durable round, not from scratch. The parquet
    * round-trip doubles as the plan-lineage rebase (each round's plan is
    * reborn from a scan), so this variant needs none of the in-memory
    * loop's unpersist/rebase hygiene; its cost is one write+read barrier
    * per round, plus one re-evaluation of the round for the durable
    * write after the convergence count (bounded: each evaluation is the
    * round's two joins over the previous DURABLE frame). Use the
    * in-memory loop for latency, this one for long jobs on pre-emptible
    * capacity. Returns (labels like duplicateClusters, total completed
    * rounds, rounds executed this invocation — 0 on a full resume); pass
    * `maxRounds` to budget an invocation and call again to continue.
    */
  def duplicateClustersResumable(pairs: DataFrame, stateDir: String,
                                 maxRounds: Int = Int.MaxValue): (DataFrame, Int, Int) = {
    val spark = pairs.sparkSession
    val edges = pairs.select(col("doc_a").as("src"), col("doc_b").as("dst"))
    val sym = edges.unionByName(
      edges.select(col("dst").as("src"), col("src").as("dst"))).persist()
    val init = sym.select(col("src").as("id")).distinct()
      .withColumn("old", col("id")).withColumn("label", col("id"))
    val (state, rounds, executed) = CheckpointOps.iterateResumable(spark, init, stateDir,
      maxRounds) { (labels, round) =>
      val prop = sym.join(
          labels.select(col("id").as("dst"), col("label").as("nbl")), "dst")
        .groupBy(col("src").as("id")).agg(min("nbl").as("nbr"))
      val stepped = labels.select(col("id"), col("label").as("old"))
        .join(prop, Seq("id"), "left")
        .select(col("id"), col("old"),
          least(col("old"), coalesce(col("nbr"), col("old"))).as("label"))
      val out =
        if (round <= ClusterJumpAfter) stepped
        else stepped.join(
            stepped.select(col("id").as("lid"), col("label").as("llabel")),
            col("label") === col("lid"))
          .select(col("id"), col("old"), least(col("label"), col("llabel")).as("label"))
      (out, out.filter(col("label") =!= col("old")).count())
    }
    sym.unpersist(blocking = false)
    (state.select(col("id").as("doc_id"), col("label").as("cluster_id")), rounds, executed)
  }

  /** Final dedup-pipeline step: one survivor per near-duplicate cluster —
    * the longest text wins, ties broken by smallest doc_id; documents in
    * no cluster survive as their own singleton. One left join + one
    * struct-min aggregation (map-side combinable), so the step scales like
    * any hash aggregation. Output (doc_id, cluster_id, text_len), one row
    * per surviving document.
    */
  def dedupSurvivors(corpus: DataFrame, clusters: DataFrame): DataFrame = {
    val withC = corpus.join(clusters, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("cluster_id"), col("doc_id")).as("cid"),
        length(col("text")).cast("long").as("len"))
    // survivor per cid = min(struct(-len, doc_id)) — (max len, min id)
    withC.groupBy("cid")
      .agg(min(struct((col("len") * -1L).as("nl"), col("doc_id").as("did"))).as("b"))
      .select(col("b.did").as("doc_id"), col("cid").as("cluster_id"),
        (col("b.nl") * -1L).as("text_len"))
  }

  /** Benchmark decontamination (the GPT-3/PaLM-style n-gram overlap
    * check): every SLIDING n-token window of each corpus document is
    * tested against the set of n-grams occurring anywhere in the
    * benchmark corpus, and each doc reports how many of its windows are
    * contaminated. Sliding (not chunked) windows catch a shared run at
    * any alignment; a single hit is grounds for dropping the doc in a
    * real pipeline, so the per-mille score keeps the full signal.
    *
    * Output: (doc_id, n_ngrams, n_hits, contam_pm) for every corpus doc
    * with at least n tokens (shorter docs have no window to test).
    *
    * Scale: the benchmark side is an eval suite — thousands of docs
    * against a 100 TB corpus — so its distinct-hash set is broadcast
    * (hinted; AQE flips to a shuffle join if a pathological benchmark
    * outgrows the threshold) and the corpus side stays a narrow
    * map-side explode + per-doc rollup: ONE shuffle total (doc_id
    * rollup), nothing quadratic, no corpus-side distinct.
    */
  def decontaminate(corpus: DataFrame, benchmark: DataFrame,
                    n: Int): DataFrame = {
    def grams(df: DataFrame) = df.select(col("doc_id"), explode(
      graft.plans.TextHashExpressions.slidingNgramHashes(col("text"), n)).as("h"))
    val bench = grams(benchmark).select("h").distinct()
      .withColumn("hit", lit(1))
    val hits = grams(corpus)
      .join(broadcast(bench), Seq("h"), "left")
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_ngrams"), count(col("hit")).as("n_hits"))
    val pm = col("n_hits") * 1000L
    hits.withColumn("contam_pm",
        ((pm - pmod(pm, col("n_ngrams"))) / col("n_ngrams")).cast("long"))
      .select(col("doc_id"), col("n_ngrams"), col("n_hits"), col("contam_pm"))
  }

  /** Corpus-internal repeated n-gram spans — the memorization/templating
    * surface of a training corpus (which exact word runs appear in more
    * than one document, and how often). Same sliding-hash kernel as
    * [[decontaminate]], turned inward: one narrow explode + one
    * map-side-combined groupBy on the span hash; count(distinct doc_id)
    * is the only two-phase aggregate. Nothing pairwise — the output is
    * per-SPAN, so cost is linear in token count at any corpus size.
    * Output (h, n_docs, n_occurrences) for spans seen in ≥ `minDocs` docs.
    */
  def commonSpans(corpus: DataFrame, n: Int, minDocs: Long): DataFrame =
    corpus.select(col("doc_id"), explode(
        graft.plans.TextHashExpressions.slidingNgramHashes(col("text"), n)).as("h"))
      .groupBy("h")
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_occurrences"))
      .filter(col("n_docs") >= minDocs)

  /** Exact n-gram Jaccard verification of the LSH candidates (the
    * canonical MinHash-dedup pipeline: candidates from banding, verified
    * exactly): |A∩B| / |A∪B| over distinct shingle hashes, computed with
    * per-doc shingle arrays joined to the bounded candidate set — no
    * all-pairs stage anywhere. Output pairs with jaccard_pm (per-mille,
    * exact integer) >= threshold.
    */
  def ngramJaccardPairs(corpus: DataFrame, thresholdPm: Int,
                        scope: CacheScope = CacheScope.global): DataFrame = {
    val cand = minHashLshPairs(corpus, scope).select("doc_a", "doc_b")
    // persisted (scope-released): joined twice (doc_a side, doc_b side)
    val sets = scope.persist(corpus.select(col("doc_id"),
      array_distinct(graft.plans.TextHashExpressions
        .shingleHashes(col("text"), ShingleCap, ShingleLen)).as("shs")))
    val inter = cand
      .join(sets.select(col("doc_id").as("doc_a"), col("shs").as("sa")), "doc_a")
      .join(sets.select(col("doc_id").as("doc_b"), col("shs").as("sb")), "doc_b")
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))).cast("long"))
      .withColumn("sza", size(col("sa")).cast("long"))
      .withColumn("szb", size(col("sb")).cast("long"))
    val union = col("sza") + col("szb") - col("i")
    val num = col("i") * lit(1000L)
    inter
      .withColumn("jaccard_pm", ((num - pmod(num, union)) / union).cast("long"))
      .filter(col("jaccard_pm") >= thresholdPm)
      .select(col("doc_a"), col("doc_b"), col("jaccard_pm"))
  }

  /** WINNOWING document fingerprints (the MOSS scheme): over the
    * position-ordered n-gram chain hashes, every window of `w`
    * consecutive hashes contributes its RIGHTMOST MINIMUM; the distinct
    * selected (pos, hash) pairs are the fingerprint — guaranteed to
    * catch any shared substring of ≥ n+w−1 tokens while storing ~2/(w+1)
    * of the grams. The rightmost-min tie rule packs into ONE int64 key
    * h·2²¹ + (2²⁰ − p): a plain sliding `min` then picks (h asc, p desc)
    * — no per-window argmin gymnastics, bit-identical cross-engine.
    *
    * Scale posture: one narrow gram explode, ONE window pass partitioned
    * by doc (frame = w rows, state O(w)), one distinct — linear in
    * corpus tokens, no joins. Docs with fewer than n+w−1 tokens emit
    * nothing (no complete window — the standard contract). Position
    * contract: < 2^20 grams per document — ENFORCED with raise_error,
    * oversized docs fail loudly rather than emit corrupt fingerprints.
    * Output (doc_id, pos, h).
    */
  def winnowFingerprints(corpus: DataFrame, n: Int, w: Int): DataFrame = {
    val grams = corpus.select(col("doc_id"),
        graft.plans.TextHashExpressions.slidingNgramHashes(col("text"), n)
          .as("a"))
      .select(col("doc_id"), size(col("a")).cast("long").as("np"),
        posexplode(col("a")).as(Seq("p", "h")))
      // ENFORCED position contract: the packed key budgets 2^20 positions;
      // a doc with more grams would silently corrupt (2^20 − p) goes
      // negative, wrong window minima). Fail loudly instead.
      .withColumn("np",
        when(col("np") < lit(1L << 20), col("np"))
          .otherwise(raise_error(concat(lit("winnowFingerprints: doc "),
            col("doc_id"), lit(" has "), col("np"),
            lit(" grams >= 2^20 — exceeds the packed-position contract")))))
    val cw = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy("p")
      .rowsBetween(org.apache.spark.sql.expressions.Window.currentRow, w - 1)
    grams
      .withColumn("k",
        min(col("h") * lit(1L << 21) + (lit(1L << 20) - col("p"))).over(cw))
      .filter(col("p") <= col("np") - w)
      .select(col("doc_id"), col("k")).distinct()
      .select(col("doc_id"),
        (lit(1L << 20) - pmod(col("k"), lit(1L << 21))).as("pos"),
        expr(s"k div ${1L << 21}").as("h"))
  }

  /** MOSS-style near-dup CANDIDATE PAIRS from shared winnowing
    * fingerprints: documents sharing ≥ `minShared` distinct fingerprint
    * hashes, with the shared count — the match stage that turns
    * [[winnowFingerprints]] into a plagiarism/boilerplate detector (the
    * n+w−1 guarantee makes recall structural: any shared ≥8-token run
    * forces a shared fingerprint).
    *
    * Scale posture: the per-hash self-join is capped by the SAME
    * [[MaxBandBucket]] rule as every LSH band here — a boilerplate span
    * fingerprint appearing in s docs would otherwise emit s²/2 pairs;
    * dropped hashes are the stopword-boilerplate ones by construction
    * (documented recall cap, twinned via QUALIFY). Output
    * (doc_a, doc_b, n_shared).
    */
  def winnowPairs(corpus: DataFrame, n: Int, w: Int, minShared: Long,
                  scope: CacheScope = CacheScope.global): DataFrame = {
    val fps = scope.persist(
      winnowFingerprints(corpus, n, w).select("doc_id", "h").distinct())
    val kept = capBuckets(fps, Seq("h"))
    kept.join(kept.select(col("h"), col("doc_id").as("doc_b")), "h")
      .filter(col("doc_id") < col("doc_b"))
      .groupBy(col("doc_id").as("doc_a"), col("doc_b"))
      .agg(count(lit(1)).as("n_shared"))
      .filter(col("n_shared") >= minShared)
  }

  /** EXACT set-similarity join with PREFIX FILTERING (the PPJoin family):
    * all pairs whose distinct-token-set Jaccard is ≥ thrPm permille —
    * deterministic and complete, unlike the MinHash path (probabilistic
    * recall) and without its signature cost. Tokens get a GLOBAL
    * rarity order (df, then token); a document's PREFIX is its first
    * |s| − ⌈τ·|s|⌉ + 1 tokens in that order, and the classic theorem
    * says two sets with J ≥ τ MUST share a prefix token — so the
    * candidate join runs on prefix tokens only, and rare tokens (tiny
    * df) dominate prefixes, bounding fan-out. Candidates verify with an
    * exact integer count: keep iff 1000·|∩| ≥ thrPm·(|a|+|b|−|∩|).
    *
    * Scale posture: df is one map-combined groupBy; the per-doc rank is
    * a window PARTITIONED by doc (bounded by doc length); the candidate
    * self-join is per prefix-token (stopword tokens never enter
    * prefixes at high τ — their df sorts them last); verification joins
    * the full token lists only for surviving candidate pairs. Output:
    * (doc_a, doc_b, inter, union_sz, jac_pm).
    */
  def ppjoinPairs(corpus: DataFrame, thrPm: Long,
                  scope: CacheScope = CacheScope.global): DataFrame = {
    // ONE tokenize pass: the distinct-token ARRAY per doc is the shared
    // artifact — the prefix index explodes it, sizes come from size()
    // (no groupBy shuffle), and verification intersects the two arrays
    // per candidate pair directly (|∩| = size(array_intersect) on
    // distinct arrays) instead of exploding every candidate pair by the
    // doc's tokens into a pairs×|doc| semi-join + aggregate. Same exact
    // counts, two narrow joins on doc ids in place of the token-row
    // explosion — the verify stage's shuffle volume drops from
    // Θ(pairs · |doc|) rows to Θ(pairs).
    val tokArr = scope.persist(corpus.select(col("doc_id"), array_distinct(
      regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))).as("toks")))
    val toks = tokArr.select(col("doc_id"), explode(col("toks")).as("tok"))
    val sz = tokArr.select(col("doc_id"), size(col("toks")).cast("long").as("sz"))
    val cand = ppjoinCandidates(toks, sz, thrPm, scope)
    val a = tokArr.select(col("doc_id").as("doc_a"), col("toks").as("__ta"),
      size(col("toks")).cast("long").as("sza"))
    val b = tokArr.select(col("doc_id").as("doc_b"), col("toks").as("__tb"),
      size(col("toks")).cast("long").as("szb"))
    cand.join(a, "doc_a").join(b, "doc_b")
      .withColumn("inter", size(array_intersect(col("__ta"), col("__tb"))).cast("long"))
      .withColumn("union_sz", col("sza") + col("szb") - col("inter"))
      .filter(col("inter") * 1000 >= lit(thrPm) * col("union_sz"))
      .select(col("doc_a"), col("doc_b"), col("inter"), col("union_sz"),
        expr("(inter * 1000) div union_sz").as("jac_pm"))
  }

  /** Distinct-token rows (doc_id, tok) for the PPJoin family. */
  private[graft] def ppjoinToks(corpus: DataFrame): DataFrame =
    corpus.select(col("doc_id"), explode(
        array_distinct(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))))
      .as("tok"))

  /** PPJoin PREFIX rows (tok, doc_id, sz, rn): each document's first
    * |s| − ⌈τ·|s|⌉ + 1 tokens in the global (df, token) rarity order —
    * the shared candidate-key stage of the batch join and the streaming
    * twin (which replays these rows against per-token state). The df
    * table is corpus-global by definition; in a streaming deployment it
    * is the precomputed slowly-changing artifact the stream broadcasts.
    */
  private[graft] def ppjoinPrefixRows(toks: DataFrame, sz: DataFrame,
                                      thrPm: Long): DataFrame = {
    val df = toks.groupBy("tok").agg(count(lit(1)).as("df"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy("doc_id").orderBy(col("df"), col("tok"))
    toks.join(df, "tok")
      .withColumn("rn", row_number().over(w))
      .join(sz, "doc_id")
      .filter(col("rn") <=
        col("sz") - expr(s"(($thrPm * sz) + 999) div 1000") + 1)
      .select(col("tok"), col("doc_id"), col("sz"), col("rn"))
  }

  /** PPJoin candidate generator (exposed for the boundedness spec):
    * distinct (doc_a, doc_b) pairs surviving prefix + length +
    * positional filtering. toks = (doc_id, tok) distinct-token rows,
    * sz = (doc_id, sz) distinct-token counts.
    */
  private[graft] def ppjoinCandidates(toks: DataFrame, sz: DataFrame,
                                      thrPm: Long,
                                      scope: CacheScope = CacheScope.global): DataFrame = {
    // persisted (scope-released): BOTH sides of the prefix self-join read
    // this — uncached, each side recomputes the df groupBy + the per-doc
    // rank window from scratch
    val prefix = scope.persist(ppjoinPrefixRows(toks, sz, thrPm))
    // TWO lossless companion filters on the candidate join:
    //  • length prune: J ≥ τ forces min(|a|,|b|) ≥ τ·max(|a|,|b|)
    //    (|∩| ≤ min and |∪| ≥ max) — kills size-mismatched candidates;
    //  • POSITIONAL filter (PPJoin's 2nd filter): a shared prefix token
    //    at rarity-rank i in a and j in b bounds the whole overlap by
    //    ubound = min(i−1, j−1) + 1 + min(|a|−i, |b|−j)  (common tokens
    //    strictly before the match ≤ min(i−1,j−1); the match itself; the
    //    tails after it). J ≥ τ needs O·(1000+τ‰) ≥ τ‰·(|a|+|b|), and
    //    ubound ≥ O for EVERY shared occurrence of a true pair, so
    //    dropping rows whose ubound misses the bar loses nothing. This
    //    is what bounds candidates when token rarity collapses (a
    //    boilerplate-heavy shard where every prefix token has df ≈ n/V):
    //    high-rank matches on size-mismatched tails die HERE, before
    //    the distinct + verification joins.
    prefix.join(
        prefix.select(col("tok"), col("doc_id").as("doc_b"),
          col("sz").as("szb"), col("rn").as("rnb")), "tok")
      .filter(col("doc_id") < col("doc_b") &&
        least(col("sz"), col("szb")) * 1000 >=
          lit(thrPm) * greatest(col("sz"), col("szb")) &&
        (least(col("rn"), col("rnb")) +
          least(col("sz") - col("rn"), col("szb") - col("rnb"))) *
          lit(1000L + thrPm) >= lit(thrPm) * (col("sz") + col("szb")))
      .select(col("doc_id").as("doc_a"), col("doc_b")).distinct()
  }

  /** Per-shingle document-frequency cap for [[containmentPairs]]'
    * inverted index: shingles in more docs than this are boilerplate and
    * are dropped from the metric (the documented contract — the oracle
    * applies the same cap). The cap is ALSO the scale bound: a shingle
    * with df ≤ c emits ≤ c² candidate rows, so no stopword shingle can
    * go quadratic in the corpus.
    */
  val ContainDfCap = 64

  /** Asymmetric containment pairs: directed (doc_a → doc_b) where the
    * fraction of doc_a's distinct shingles also present in doc_b is ≥
    * thrPm permille — the quote/excerpt detector. NOT the symmetric
    * Jaccard path: a short document fully quoted inside a long one has
    * high containment but LOW Jaccard, so the MinHash-LSH candidate
    * generator ([[minHashLshPairs]]) is structurally blind to it; recall
    * here comes from a rare-shingle INVERTED INDEX instead (explode
    * distinct shingles, drop df > [[ContainDfCap]], self-join per
    * shingle). Intersections are exact over the capped shingle space;
    * containment = |∩| · 1000 div |S_a| (floor, exact int).
    *
    * Scale: candidate volume is Σ_sh df(sh)² ≤ cap · Σ df — linear in
    * corpus shingle mass at fixed cap; two hash shuffles (index build,
    * pair count) plus the size join. Output (doc_a, doc_b, cont_pm),
    * both directions evaluated independently.
    */
  def containmentPairs(corpus: DataFrame, thrPm: Long,
                       dfCap: Int = ContainDfCap,
                       scope: CacheScope = CacheScope.global): DataFrame = {
    // persisted (scope-released): the shingle explode is the expensive
    // text-hashing pass and BOTH the df aggregation and the capped-index
    // join read it — uncached it shingles the corpus twice
    val sh = scope.persist(corpus.select(col("doc_id"), explode(array_distinct(
      graft.plans.TextHashExpressions
        .shingleHashes(col("text"), ShingleCap, ShingleLen))).as("sh")))
    val rare = sh.groupBy("sh").agg(count(lit(1)).as("__df"))
      .filter(col("__df") <= dfCap).select("sh")
    // persisted (scope-released): the capped index feeds both join sides
    // and the per-doc size aggregation
    val capped = scope.persist(sh.join(rare, "sh"))
    val sizes = capped.groupBy("doc_id").agg(count(lit(1)).as("na"))
    // |∩| is symmetric: count each UNORDERED pair once (a < b) — half
    // the candidate rows through the pair exchange — and expand to both
    // directed containments on the aggregated (orders-of-magnitude
    // smaller) frame before the size join
    // persisted (scope-released): both union branches read the
    // aggregated pair frame — uncached, the heavy per-shingle join would
    // run once per branch
    val inter = scope.persist(capped.select(col("sh"), col("doc_id").as("doc_a"))
      .join(capped.select(col("sh"), col("doc_id").as("doc_b"))
        .hint("shuffle_hash"), "sh")
      .filter(col("doc_a") < col("doc_b"))
      .groupBy("doc_a", "doc_b").agg(count(lit(1)).as("inter")))
    inter.unionByName(inter.select(col("doc_b").as("doc_a"),
        col("doc_a").as("doc_b"), col("inter")))
      .join(sizes.withColumnRenamed("doc_id", "doc_a"), "doc_a")
      .filter(col("inter") * 1000 >= lit(thrPm) * col("na"))
      .selectExpr("doc_a", "doc_b", "(inter * 1000) div na AS cont_pm")
  }

  val SimHashBands = 4

  /** SimHash near-dup pairs: 64-bit simhash in 4x16-bit bands (hamming
    * LSH), pairs at hamming distance <= maxDist. Candidates = docs sharing
    * at least one full band; by pigeonhole this is recall-COMPLETE for
    * maxDist <= SimHashBands - 1 = 3 (require it). Each band key is 16
    * bits -> 65536 buckets per band, which bounds bucket sizes
    * statistically — but a degenerate corpus (millions of near-empty docs
    * whose simhash collapses to one value) still concentrates one bucket,
    * so band buckets larger than MaxBandBucket are skipped exactly like
    * the MinHash path: one such bucket of size s would emit s^2/2 pairs
    * and dominate the whole job at crawl scale. Docs sheared off this way
    * are (near-)identical — the exact-dedup pipeline's job.
    */
  def simHashPairs(corpus: DataFrame, maxDist: Int,
                   scope: CacheScope = CacheScope.global): DataFrame = {
    require(maxDist <= SimHashBands - 1,
      s"band bucketing is recall-complete only for maxDist <= ${SimHashBands - 1}")
    val sh = corpus.select(col("doc_id"),
      graft.plans.TextHashExpressions.simHash64(col("text")).as("sh"))
    // persisted (scope-released): feeds the bucket-size filter and both
    // sides of the candidate self-join
    val banded = scope.persist(sh.select(col("doc_id"), col("sh"),
      posexplode(array((0 until SimHashBands).map(j =>
        shiftright(col("sh"), 16 * j).bitwiseAND(lit(0xFFFFL))): _*))
        .as(Seq("band", "band_key"))))
    val kept = capBuckets(banded, Seq("band", "band_key"))
    val a = kept.as("a"); val b = kept.as("b")
    a.join(b, col("a.band") === col("b.band") &&
        col("a.band_key") === col("b.band_key") &&
        col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"),
        bit_count(col("a.sh").bitwiseXOR(col("b.sh"))).cast("long").as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }

  val NearDupTables = 8
  val NearDupBits = 12

  /** Embedding-cosine near-duplicates: pairs with round(cos,4) >= threshold.
    * Candidates from multi-table sign-projection LSH (VecLshBuckets,
    * 8 tables x 12 bits — the same family the ANN path uses): a pair is a
    * candidate iff some table assigns both vectors the same 12-bit bucket.
    * 4096 buckets per table bound the per-bucket self-join at scale (the
    * old 8-sign-bit form had 256 buckets total and went quadratic);
    * near-identical vectors agree on nearly every hyperplane, so
    * multi-table agreement is near-certain. Exact cosine verifies.
    *
    * Buckets larger than MaxBandBucket are skipped (same cap as the
    * MinHash/SimHash paths): 4096 buckets per table bound sizes only
    * statistically, and a crawl-scale corpus WILL have a degenerate
    * bucket (e.g. near-zero embeddings all hashing alike) whose s^2/2
    * pair blowup would dominate the job.
    */
  def embeddingNearDups(emb: DataFrame, thresholdE4: Long,
                        scope: CacheScope = CacheScope.global): DataFrame = {
    // persisted (scope-released): feeds the bucket-size filter and both
    // sides of the candidate self-join
    val e = scope.persist(emb.select(col("vec_id"), col("embedding"),
      posexplode(graft.plans.TextHashExpressions
        .vecLshBuckets(col("embedding"), NearDupTables, NearDupBits))
        .as(Seq("table", "bucket"))))
    val kept = capBuckets(e, Seq("table", "bucket"))
    val a = kept.as("a"); val b = kept.as("b")
    a.join(b, col("a.table") === col("b.table") &&
        col("a.bucket") === col("b.bucket") && col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("vec_a"), col("b.vec_id").as("vec_b"),
        round(graft.plans.TextHashExpressions.vecCosine(col("a.embedding"), col("b.embedding")) * lit(10000.0), 0)
          .cast("long").as("cos_e4"))
      .distinct()
      .filter(col("cos_e4") >= thresholdE4)
  }

  /** Edit-distance verification of LSH candidates — the classic near-dup
    * confirm stage alongside [[ngramJaccardPairs]]: levenshtein over the
    * CANDIDATE pairs only (the capped banded self-join of
    * [[minHashLshPairs]] — never all-pairs). Texts join back by id (two
    * hash joins), so the O(len²) DP kernel runs exactly once per
    * candidate; output (doc_a, doc_b, edist) for pairs within `maxDist`.
    */
  def editDistancePairs(corpus: DataFrame, maxDist: Int,
                        scope: CacheScope = CacheScope.global): DataFrame = {
    val cand = minHashLshPairs(corpus, scope).select("doc_a", "doc_b")
    // persisted (scope-released): joined twice — doc_a side and doc_b side
    val texts = scope.persist(corpus.select(col("doc_id"), col("text")))
    val ta = texts.select(col("doc_id").as("doc_a"), col("text").as("__ta"))
    val tb = texts.select(col("doc_id").as("doc_b"), col("text").as("__tb"))
    cand.join(ta, "doc_a").join(tb, "doc_b")
      .select(col("doc_a"), col("doc_b"),
        levenshtein(col("__ta"), col("__tb")).cast("long").as("edist"))
      .filter(col("edist") <= maxDist)
  }

  // ---- incremental (cross-batch) dedup --------------------------------------

  /** Bloom-filter words over a long key column: `k` probe positions per
    * key in an m = 2^logM bit space, packed into m/32 (word, bits) rows.
    * Positions derive from [[Fns.mixId]] (BIGINT-safe, oracle-exact), and
    * the whole filter is ONE map-side-combinable bit_or aggregation over
    * at most m/32 groups — for the default logM=16 that is a 2048-row
    * table, broadcastable no matter how large the seen corpus is. Words
    * are 32-bit (bit index < 32) so neither engine ever shifts into the
    * sign bit.
    */
  def bloomBits(keys: DataFrame, keyCol: String, logM: Int = BloomLogM,
                k: Int = BloomK): DataFrame = {
    require(logM >= 1 && logM <= 31,
      s"logM must be in [1, 31] (mixId positions are < 2^31): $logM")
    val m = 1L << logM
    keys.select(explode(array((0 until k).map(j =>
        Fns.mixId(col(keyCol) + lit(j * BloomSeed)) % lit(m)): _*)).as("p"))
      .select(Fns.idiv(col("p"), 32).as("word"),
        expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))").as("mask"))
      .groupBy("word").agg(expr("bit_or(mask)").as("bits"))
  }

  /** Incremental-crawl dedup: flag every document of a `fresh` batch whose
    * key (content fingerprint) may already exist in the `seen` corpus —
    * Bloom probe first, exact confirmation join second. This is the
    * cross-batch companion of [[exactDuplicates]]: a daily 10^9-page crawl
    * increment must not shuffle-join the full 10^12-page history, so the
    * broadcast Bloom table (built from `seen` in one aggregation) kills
    * the non-duplicate bulk map-side, and only the bloom-hit sliver —
    * true duplicates plus the deterministic false-positive residue — pays
    * the exact key join. Both stages are deterministic (mixId positions),
    * so the DuckDB oracle reproduces the exact flag pattern, false
    * positives included.
    *
    * Output: (doc_id, bloom_hit, confirmed) for every fresh doc, 1/0
    * longs; bloom_hit >= confirmed always, and the gap is the measured
    * false-positive count of the filter configuration.
    */
  def bloomIncrementalDedup(seen: DataFrame, fresh: DataFrame, keyCol: String,
                            logM: Int = BloomLogM, k: Int = BloomK): DataFrame = {
    val m = 1L << logM
    val bloom = broadcast(bloomBits(seen.select(keyCol), keyCol, logM, k))
    val probes = fresh.select(col("doc_id"), col(keyCol))
      .withColumn("p", explode(array((0 until k).map(j =>
        Fns.mixId(col(keyCol) + lit(j * BloomSeed)) % lit(m)): _*)))
      .withColumn("word", Fns.idiv(col("p"), 32))
      .withColumn("mask", expr("shiftleft(CAST(1 AS BIGINT), CAST(p % 32 AS INT))"))
    val hits = probes.join(bloom, Seq("word"), "left")
      .groupBy("doc_id")
      .agg(min(when(coalesce(col("bits"), lit(0L))
        .bitwiseAND(col("mask")) === col("mask"), 1L).otherwise(0L)).as("bloom_hit"))
    val confirmed = fresh.join(hits, "doc_id").filter(col("bloom_hit") === 1L)
      .join(seen.select(col(keyCol)).distinct(), Seq(keyCol), "left_semi")
      .select(col("doc_id"), lit(1L).as("__c"))
    hits.join(confirmed, Seq("doc_id"), "left")
      .select(col("doc_id"), col("bloom_hit"),
        coalesce(col("__c"), lit(0L)).as("confirmed"))
  }

  /** Bloom defaults: m = 2^16 bits / k = 4 probes — ~0.2% false-positive
    * rate at 4k keys; at crawl scale callers raise logM up to the hard
    * cap of 31 (mixId positions are < 2^31; the 2^26-row word table is
    * still broadcastable) — beyond ~10^9 keys, shard the filter by key
    * range instead.
    */
  val BloomLogM = 16
  val BloomK = 4
  /** Probe-position seed spacing (Knuth multiplicative constant); keeps
    * mixId inputs < 2^62 for any fingerprint < 2^61.
    */
  val BloomSeed = 2654435761L

  /** EXACT edit-distance-1 string join by deletion neighborhoods (the
    * FastSS construction): two strings are at Levenshtein distance 1 iff
    * either (a) they share a single-deletion variant at the SAME
    * position while differing (substitution — same-position is what
    * rules out transposition-style ed-2 pairs like "ab"/"ba"), or
    * (b) one IS a single-deletion variant of the other (indel). So the
    * join key is the variant string: each distinct input string of
    * length L emits L deletion variants plus itself, and ed-1 pairs fall
    * out of two equi-joins — a typo-cluster / near-identical-URL join
    * with NO distance kernel and no candidate generator.
    *
    * Scale posture: strings are DEDUPLICATED first, so a join bucket
    * (variant, pos) holds at most |alphabet|+1 distinct strings (the
    * ways to re-insert one character) — structurally bounded, no cap
    * parameter needed; id multiplicity re-enters only through the final
    * id join, whose fan-out is the true output size. Everything is
    * equi-join + groupBy: three hash shuffles, linear in total string
    * mass. Unlike [[editDistancePairs]] (LSH candidates + full DP
    * kernel, any maxDist) this path is exact and complete for d = 1.
    *
    * Output: (doc_a, doc_b, kind) with doc_a < doc_b, kind ∈
    * {'sub','indel'}.
    */
  def editOnePairs(df: DataFrame, idCol: String, strCol: String,
                   scope: CacheScope = CacheScope.global): DataFrame = {
    val ids = df.select(col(idCol).cast("long").as("__id"),
      col(strCol).as("__s"))
    val ds = ids.select("__s").distinct()
    // 0-based deletion position via posexplode over the 1-based transform
    // (length >= 1 guard: Spark's sequence(1, 0) DESCENDS, not empties)
    val del = scope.persist(ds.filter(length(col("__s")) >= 1)
      .select(col("__s"), posexplode(expr(
      "transform(sequence(1, length(__s)), " +
        "i -> concat(substring(__s, 1, i - 1), substring(__s, i + 1)))"))
        .as(Seq("pos", "key"))))
    val subs = del.select(col("key"), col("pos"), col("__s").as("sa"))
      .join(del.select(col("key"), col("pos"), col("__s").as("sb")),
        Seq("key", "pos"))
      .filter(col("sa") < col("sb"))
      .select("sa", "sb")
    val indel = ds.select(col("__s").as("key"), col("__s").as("sa"))
      .join(del.select(col("key"), col("__s").as("sb")), "key")
      .select("sa", "sb").distinct() // "aa"->"a" matches at 2 positions
    val pairs = subs.unionByName(indel)
      .select(least(col("sa"), col("sb")).as("sa"),
        greatest(col("sa"), col("sb")).as("sb"),
        when(length(col("sa")) === length(col("sb")), lit("sub"))
          .otherwise(lit("indel")).as("kind"))
    pairs
      .join(ids.select(col("__s").as("sa"), col("__id").as("ia")), "sa")
      .join(ids.select(col("__s").as("sb"), col("__id").as("ib")), "sb")
      .select(least(col("ia"), col("ib")).as("doc_a"),
        greatest(col("ia"), col("ib")).as("doc_b"), col("kind"))
  }

  /** Place conflation — the gazetteer-merge join (same real-world place,
    * two records): candidate pairs whose NAMES are at exact Levenshtein
    * distance 1 (the complete [[editOnePairs]] FastSS join — typos and
    * transliteration drift) that also lie within `radiusFix` of each
    * other (exact int64 planar d²). Name similarity alone over-merges
    * ("Springfield"); proximity alone over-merges (market stalls); the
    * conjunction is the classic conflation rule.
    *
    * Input: (place_id, name, x, y). Output: (place_a, place_b, kind, d2)
    * with place_a < place_b, kind ∈ {'sub','indel'}.
    *
    * Scale posture: candidates come ONLY from the deletion-neighborhood
    * equi-join (structurally bounded buckets — see [[editOnePairs]]);
    * the coordinate filter is two hash joins on place_id. Never
    * all-pairs, no distance candidate generator needed because the name
    * index already bounds the pair set.
    */
  def conflatePlaces(places: DataFrame, radiusFix: Long): DataFrame = {
    val pairs = editOnePairs(places, "place_id", "name")
      .select(col("doc_a").as("place_a"), col("doc_b").as("place_b"),
        col("kind"))
    val ca = places.select(col("place_id").as("place_a"),
      col("x").as("xa"), col("y").as("ya"))
    val cb = places.select(col("place_id").as("place_b"),
      col("x").as("xb"), col("y").as("yb"))
    val dx = col("xa") - col("xb"); val dy = col("ya") - col("yb")
    pairs.join(ca, "place_a").join(cb, "place_b")
      .filter(dx * dx + dy * dy <= lit(radiusFix) * lit(radiusFix))
      .select(col("place_a"), col("place_b"), col("kind"),
        (dx * dx + dy * dy).as("d2"))
  }
}
