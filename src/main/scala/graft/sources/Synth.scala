package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.functions.Fns

/** Deterministic synthesis of the engine's spatial/production inputs from
  * the driver's parquet tables — no randomness, pure arithmetic, so every
  * derived table has an exact DuckDB-SQL twin for the oracle.
  */
object Synth {

  def table(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  /** Point-per-lineitem-row: key = l_orderkey*10 + l_linenumber, coords by
    * multiplicative hashing (Fns.lonFixOf/latFixOf). lon ±90°, lat ±60°.
    */
  def points(spark: SparkSession, sfDir: String): DataFrame = {
    val li = table(spark, sfDir, "lineitem")
    val key = li("l_orderkey") * lit(10L) + li("l_linenumber")
    // (l_orderkey, l_linenumber) is NOT unique in the synthetic data, and
    // coords are pure functions of pid → full-row duplicates; the point set
    // is defined as DISTINCT so kNN/PIP have well-defined per-pid semantics.
    li.select(
      key.as("pid"),
      Fns.lonFixOf(key).as("lon_fix"),
      Fns.latFixOf(key).as("lat_fix")).distinct()
  }

  /** The same derivation as DuckDB SQL (shared by every spatial oracle). */
  val pointsSql: String =
    """SELECT DISTINCT (l_orderkey*10 + l_linenumber) AS pid,
      |  ((l_orderkey*10 + l_linenumber) * 2654435761) % 1800000000 - 900000000 AS lon_fix,
      |  ((l_orderkey*10 + l_linenumber) * 2246822519) % 1200000000 - 600000000 AS lat_fix
      |FROM lineitem""".stripMargin

  // ---- polygons -------------------------------------------------------------

  /** Deterministic convex hexagons (CCW, integer fix-coord vertices).
    * poly_id k: center on an integer-degree grid, radius 2°..6.9°.
    */
  case class Hexagon(polyId: Int, cx: Long, cy: Long, xs: Array[Long], ys: Array[Long])

  val NumPolygons = 30

  lazy val hexagons: Seq[Hexagon] = (0 until NumPolygons).map { k =>
    val cx = ((k * 97561L + 11) % 160 - 80) * 10000000L   // ±80° lon
    val cy = ((k * 48271L + 7) % 100 - 50) * 10000000L    // ±50° lat
    val r = 20000000L + k * 1700000L
    val s = r * 866L / 1000L
    val xs = Array(cx + r, cx + r / 2, cx - r / 2, cx - r, cx - r / 2, cx + r / 2)
    val ys = Array(cy, cy + s, cy + s, cy, cy - s, cy - s)
    Hexagon(k, cx, cy, xs, ys)
  }

  /** Polygon vertex table (poly_id, seq, x, y) — CCW open rings. */
  def polygonVertices(spark: SparkSession): DataFrame = {
    import spark.implicits._
    hexagons.flatMap(h => h.xs.indices.map(i => (h.polyId, i, h.xs(i), h.ys(i))))
      .toDF("poly_id", "seq", "x", "y")
  }

  /** Polygon edge table (poly_id, x1, y1, x2, y2) for convex half-plane
    * tests; also the literal VALUES body for the DuckDB oracle.
    */
  def polygonEdges: Seq[(Int, Long, Long, Long, Long)] =
    hexagons.flatMap { h =>
      h.xs.indices.map { i =>
        val j = (i + 1) % h.xs.length
        (h.polyId, h.xs(i), h.ys(i), h.xs(j), h.ys(j))
      }
    }

  def polygonEdgesDf(spark: SparkSession): DataFrame = {
    import spark.implicits._
    polygonEdges.toDF("poly_id", "x1", "y1", "x2", "y2")
  }

  /** VALUES(...) literal of the edges for oracle SQL. */
  def polygonEdgesValuesSql: String =
    polygonEdges.map { case (p, x1, y1, x2, y2) => s"($p,$x1,$y1,$x2,$y2)" }
      .mkString("(VALUES ", ", ", ") AS pe(poly_id, x1, y1, x2, y2)")

  // ---- corpus with injected duplicates --------------------------------------

  /** documents ∪ perturbed copies: every 7th doc gets an exact copy
    * (id+1000000), every 5th a near-copy with the last 7 chars dropped
    * (id+2000000). Gives the dedup operators real work with a SQL twin.
    */
  def corpus(spark: SparkSession, sfDir: String): DataFrame = {
    val d = table(spark, sfDir, "documents").select("doc_id", "text")
    val exact = d.filter(col("doc_id") % 7 === 0)
      .select((col("doc_id") + 1000000L).as("doc_id"), col("text"))
    val near = d.filter(col("doc_id") % 5 === 0)
      .select((col("doc_id") + 2000000L).as("doc_id"),
        expr("substring(text, 1, length(text) - 7)").as("text"))
    d.unionByName(exact).unionByName(near)
  }

  val corpusSql: String =
    """SELECT doc_id, text FROM documents
      |UNION ALL SELECT doc_id + 1000000, text FROM documents WHERE doc_id % 7 = 0
      |UNION ALL SELECT doc_id + 2000000, substring(text, 1, length(text) - 7) FROM documents WHERE doc_id % 5 = 0""".stripMargin

  /** Embedding corpus with injected near-duplicates: every 10th vector gets
    * a copy (vec_id+1000000) with the first component nudged by +0.01.
    */
  def embCorpus(spark: SparkSession, sfDir: String): DataFrame = {
    val e = table(spark, sfDir, "embeddings").select("vec_id", "embedding")
    val dup = e.filter(col("vec_id") % 10 === 0)
      .select((col("vec_id") + 1000000L).as("vec_id"),
        expr("transform(embedding, (x, i) -> CASE WHEN i = 0 THEN CAST(x + 0.01 AS FLOAT) ELSE x END)")
          .as("embedding"))
    e.unionByName(dup)
  }

  val embCorpusSql: String =
    """SELECT vec_id, embedding FROM embeddings
      |UNION ALL SELECT vec_id + 1000000,
      |  [CASE WHEN i = 1 THEN CAST(embedding[i] + 0.01 AS FLOAT) ELSE embedding[i] END
      |   for i in range(1, 1 + len(embedding))]
      |FROM embeddings WHERE vec_id % 10 = 0""".stripMargin

  // ---- pages (north-rule production table) ----------------------------------

  /** Common-Crawl-style pages table synthesized from documents:
    * (url, warc_ts, html, text, lang) per BASELINE.json input_hint.
    */
  def pages(spark: SparkSession, sfDir: String): DataFrame =
    table(spark, sfDir, "documents").select(
      concat(lit("https://example.org/doc/"), col("doc_id").cast("string")).as("url"),
      timestamp_micros(lit(1704067200000000L) + col("doc_id") * lit(1000000L)).as("warc_ts"),
      encode(concat(lit("<html><body>"), col("text"), lit("</body></html>")), "UTF-8").as("html"),
      col("text"),
      col("lang"))
}
