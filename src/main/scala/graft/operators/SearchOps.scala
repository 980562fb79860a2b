package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.core.Hll

/** Full-text retrieval operators over a (doc_id, text) corpus: inverted
  * index construction and BM25 ranked retrieval — the search side of a
  * web-corpus pipeline (quality mining, targeted subset extraction).
  *
  * Tokenization is the engine's whitespace contract (`[^ ]+`, shared with
  * the HLL/vocab operators) so every term statistic has an exact DuckDB
  * twin.
  */
object SearchOps {

  /** BM25 parameters — exposed so the SQL oracle interpolates the SAME
    * doubles (Scala double toString round-trips through strtod).
    */
  val K1: Double = 1.2
  val B: Double = 0.75
  val K1Plus1: Double = K1 + 1.0
  val OneMinusB: Double = 1.0 - B

  private def toks(docs: DataFrame) = docs.select(col("doc_id"),
    explode(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0))).as("tok"))

  /** Gazetteer GEOTAGGING of web text: resolve each document to the
    * place it mentions most. Every (doc, gazetteer entry) pair counts
    * case-insensitive substring occurrences exactly
    * (⌊(len − len(remove(name)))/len(name)⌋ — handles the multi-word
    * names a token join cannot: 'UNITED KINGDOM', 'SAUDI ARABIA'), and
    * the winner per doc is the max count with ties to the smallest key.
    * This is the geospatial×webtext fusion primitive: place resolution
    * feeding every downstream per-region rollup.
    *
    * Scale posture: the gazetteer is a genuinely small dimension
    * (countries/admin regions — thousands, not millions), so the scan is
    * ONE broadcast nested-loop over the corpus: |docs|·|gaz| codegen'd
    * string ops, no shuffle until the per-doc argmax (a single window
    * keyed by doc_id, fan-in ≤ |gaz|). Input: docs(doc_id, text),
    * gaz(gaz_key, gaz_name, gaz_group). Output: (doc_id, gaz_key,
    * gaz_name, gaz_group, n_mentions) — docs mentioning nothing are
    * absent.
    */
  def gazetteerTag(docs: DataFrame, gaz: DataFrame): DataFrame = {
    // uppercase each document ONCE before the gazetteer fan-out — inside
    // the join the expression would re-run per (doc, gazetteer-row) combo
    // (Catalyst does not CSE across the join), multiplying the heaviest
    // string op by the gazetteer size
    val up = docs.select(col("doc_id"), upper(col("text")).as("__ut"))
    val ut = col("__ut")
    val un = upper(col("gaz_name"))
    val n = ((length(ut) - length(replace(ut, un, lit("")))) / length(un))
      .cast("long")
    val scored = up.join(
        broadcast(gaz.select(col("gaz_key"), col("gaz_name"), col("gaz_group"))))
      .select(col("doc_id"), col("gaz_key"), col("gaz_name"), col("gaz_group"),
        n.as("n_mentions"))
      .filter(col("n_mentions") > 0)
    val w = Window.partitionBy("doc_id")
      .orderBy(col("n_mentions").desc, col("gaz_key"))
    scored.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
  }

  /** Inverted index: per term, document frequency and the posting list
    * (doc_id, tf) sorted by doc_id. `minDf` drops hapax noise; `maxPostings`
    * caps the stored list per term — stop-word terms at crawl scale have
    * posting lists the size of the corpus, and real index builds shard or
    * truncate them (the df column still counts ALL matches, so the cap
    * loses no frequency information). The build is two hash shuffles
    * (doc,term → term), both map-side combined; the per-term collect_list
    * is bounded by `maxPostings` only after the sort — callers indexing
    * unfiltered crawl text should pre-drop stop terms by df.
    */
  def postings(docs: DataFrame, minDf: Long, maxPostings: Int): DataFrame =
    toks(docs)
      .groupBy(col("tok"), col("doc_id")).agg(count(lit(1)).as("tf"))
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"),
        slice(sort_array(collect_list(struct(col("doc_id"), col("tf")))),
          1, maxPostings).as("postings"))
      .filter(col("df") >= minDf)

  /** BM25 scores for a fixed small query-term set: for each document
    * containing at least one query term,
    * `score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))`
    * with the Robertson-Sparck-Jones idf `ln((N − df + 0.5)/(df + 0.5) + 1)`.
    *
    * Determinism: idf uses the engine's fixed-IEEE-op ln kernel
    * ([[graft.core.Hll.lnDet]]) and each per-term score is rounded to
    * integer e6 micro-points BEFORE the per-document sum, so the result
    * is bit-identical cross-engine (float sums have nondeterministic
    * order; int sums don't).
    *
    * Scale posture: corpus stats (N, Σdl) and per-term df are GLOBAL
    * scalars over the tiny query-term set — collected to the driver like
    * any broadcast dimension, then the scoring pass is one shuffle
    * (doc,term tf aggregation) plus a broadcast join of the ≤|terms|-row
    * idf table. Output: (doc_id, n_terms, score_e6).
    */
  def bm25(docs: DataFrame, terms: Seq[String]): DataFrame = {
    val t = toks(docs)
    val dl = t.groupBy("doc_id").agg(count(lit(1)).as("dl"))
    val stats = dl.agg(count(lit(1)).as("n"), sum("dl").as("sumdl")).head()
    val n = stats.getLong(0)
    val avgdl = stats.getLong(1).toDouble / n.toDouble

    val tf = t.filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("tf"))
    val dfRows = tf.groupBy("tok").agg(count(lit(1)).as("df")).collect()
    val idf = dfRows.map { r =>
      val df = r.getLong(1)
      (r.getString(0),
        Hll.lnDet(((n - df).toDouble + 0.5) / (df.toDouble + 0.5) + 1.0))
    }
    val spark = docs.sparkSession
    import spark.implicits._
    val idfDf = broadcast(idf.toSeq.toDF("tok", "idf"))

    val tfD = col("tf").cast("double")
    val dlD = col("dl").cast("double")
    val score = col("idf") * ((tfD * lit(K1Plus1)) /
      (tfD + lit(K1) * (lit(OneMinusB) + lit(B) * (dlD / lit(avgdl)))))
    tf.join(idfDf, "tok")
      .join(dl, "doc_id")
      .withColumn("term_e6", round(score * lit(1000000.0)).cast("long"))
      .groupBy("doc_id")
      .agg(count(lit(1)).as("n_terms"), sum("term_e6").as("score_e6"))
  }

  /** Overlapping passage chunking (the RAG / embedding-input building
    * block): token windows of `size` advancing by `stride` (< size =
    * overlap), last window covering the tail. Chunk count for n tokens is
    * 1 + ceil(max(n - size, 0) / stride) — exactly the windows whose start
    * precedes the tail, with no duplicate all-tail windows. Emits
    * (doc_id, chunk_idx, n_toks, chunk_md5). Pure narrow pipeline: split +
    * posexplode of an index range + slice + md5, all codegen'd built-ins,
    * zero shuffle — the explode fan-out is the output itself. md5 (not the
    * engine's Horner hashes) because both engines ship it natively for
    * ARBITRARY-length input, so the chunk identity survives any size/stride.
    */
  def passageChunks(docs: DataFrame, width: Int, stride: Int): DataFrame = {
    require(width >= 1 && stride >= 1 && stride <= width)
    val toks = filter(split(col("text"), " "), t => length(t) > lit(0))
    // exact ceil-div via floor on double: token counts sit far below 2^52
    val nch = lit(1L) + floor(
      (greatest(size(col("toks")) - lit(width), lit(0)).cast("long") +
        lit(stride - 1L)) / lit(stride.toDouble)).cast("long")
    val win = slice(col("toks"), (col("chunk_idx") * stride + 1).cast("int"), lit(width))
    docs
      .select(col("doc_id"), toks.as("toks"))
      .filter(size(col("toks")) > 0)
      .select(col("doc_id"), col("toks"),
        explode(sequence(lit(0L), nch - lit(1L))).as("chunk_idx"))
      .select(col("doc_id"), col("chunk_idx"),
        size(win).cast("long").as("n_toks"),
        md5(array_join(win, " ").cast("binary")).as("chunk_md5"))
  }

  /** Robots-style longest-prefix policy match: each URL resolves against
    * its host's path-prefix rules; the LONGEST matching prefix wins
    * (Google robots.txt semantics), URLs with no matching rule default to
    * allowed — the crawl-compliance gate of a fetch pipeline.
    *
    * Scale posture: the rule table at web scale is per-host robots
    * entries (~billions of rows, but a handful PER HOST), so the right
    * plan is a hash shuffle equi-join on `host` — rules-per-host bounds
    * the candidate fan-out per URL, never an all-rules scan. Winner
    * selection is one lexicographic struct-max aggregation (no window):
    * two prefixes of equal length matching the same path are necessarily
    * equal, so (plen) alone already determines the winner and the
    * allow/prefix legs are pure tie-break hygiene.
    *
    * Input: urls (url_id, host, path); rules (host, prefix, allow: long).
    * Output: (url_id, prefix, allow) — prefix '' / allow 1 when unruled.
    */
  def policyMatch(urls: DataFrame, rules: DataFrame): DataFrame = {
    val hit = urls.join(rules, Seq("host"))
      .filter(col("path").startsWith(col("prefix")))
      .groupBy("url_id")
      .agg(max(struct(length(col("prefix")).as("plen"),
        col("allow").as("allow"), col("prefix").as("prefix"))).as("m"))
    urls.select("url_id").join(hit, Seq("url_id"), "left")
      .select(col("url_id"),
        coalesce(col("m.prefix"), lit("")).as("prefix"),
        coalesce(col("m.allow"), lit(1L)).as("allow"))
  }

  /** PHRASE matching over positional postings: a phrase p₀…p_{k−1}
    * matches at start position s iff token(s+i) == p_i for every i. The
    * classic offset trick turns that into ONE equi-join: each (term hit
    * at pos, phrase term i) pair votes for start = pos − i, and a start
    * with k distinct i-votes is a match — no per-term join chain, so a
    * 7-word phrase costs the same two shuffles as a 2-word one.
    *
    * Scale posture: the phrase-term table is tiny (broadcast), so the
    * corpus-side token explode inner-joins against it — tokens not in any
    * phrase never leave the scan stage. Then one hash shuffle groups
    * votes by (phrase, doc, start) and a map-side-combined count rolls
    * matches up per (phrase, doc). Repeated terms inside a phrase are
    * handled by the distinct-i vote count. Input: docs (doc_id, text),
    * phrases (phrase_id, terms: array<string>); tokenization is the
    * engine's whitespace contract. Output (phrase_id, doc_id, n_matches),
    * docs without a match absent.
    */
  def phraseMatch(docs: DataFrame, phrases: DataFrame): DataFrame = {
    val pterms = phrases.select(col("phrase_id"),
        size(col("terms")).cast("long").as("plen"),
        posexplode(col("terms")).as(Seq("i", "tok")))
    val tp = docs.select(col("doc_id"),
      posexplode(regexp_extract_all(col("text"), lit("[^ ]+"), lit(0)))
        .as(Seq("pos", "tok")))
    tp.join(broadcast(pterms), Seq("tok"))
      .groupBy(col("phrase_id"), col("doc_id"),
        (col("pos") - col("i")).as("start"), col("plen"))
      .agg(countDistinct(col("i")).as("nhit"))
      .filter(col("nhit") === col("plen") && col("start") >= 0)
      .groupBy(col("phrase_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_matches"))
  }
}
