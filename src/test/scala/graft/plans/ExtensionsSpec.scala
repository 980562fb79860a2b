package graft.plans

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

class ExtensionsSpec extends AnyFunSuite {

  test("GraftExtensions registers native functions for SQL use") {
    // force a fresh session so withExtensions is honored even when other
    // suites in this JVM already created one
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    val spark = SparkSession.builder()
      .master("local[2]")
      .config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      spark.sparkContext.setLogLevel("ERROR")
      spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        .createOrReplaceTempView("docs")
      val viaSql = spark.sql(
        """SELECT doc_id, simhash16(text) AS sh,
          |  shingle_minhash(text, 256, 10, 12) AS mh,
          |  size(shingle_hashes(text, 256, 10)) AS n
          |FROM docs ORDER BY doc_id LIMIT 5""".stripMargin).collect()
      assert(viaSql.length === 5)
      viaSql.foreach { r =>
        val text = spark.sql(s"SELECT text FROM docs WHERE doc_id = ${r.getLong(0)}")
          .collect()(0).getString(0)
        assert(r.getLong(1) === graft.core.TextHash.simHash16(text))
        assert(r.getSeq[Long](2) === graft.core.TextHash.minHash(text, 256, 10, 12).toSeq)
      }
      val emb = spark.sql(
        """SELECT vec_lsh_buckets(CAST(array(0.5, -0.25) AS array<float>), 4, 8) AS b""")
        .collect()(0).getSeq[Long](0)
      assert(emb === graft.core.TextHash.lshBuckets(Array(0.5f, -0.25f), 4, 8).toSeq)
      // Column-composed registrations: TagStrings formatters + URL host
      val tagRow = spark.sql(
        """SELECT tags_kv(map('b', 'y', 'a', 'x'), ',') AS kv,
          |  tags_hstore(map('k', 'say "hi" \\ bye')) AS hs,
          |  url_norm_host('svn+ssh://u@Repo.Example.COM:22/t') AS host""".stripMargin)
        .collect()(0)
      assert(tagRow.getString(0) === "a=x,b=y")
      assert(tagRow.getString(1) === "\"k\"=>\"say \\\"hi\\\" \\\\ bye\"")
      assert(tagRow.getString(2) === "repo.example.com")
      // geohash: the parser-shaped tree matches the Column surface and
      // the published vector
      val gh = spark.sql(
        """SELECT geohash(-56030000L, 426050000L, 5) AS g5,
          |  geohash(104074400L, 576491100L, 8) AS g8""".stripMargin).collect()(0)
      assert(gh.getString(0) === "ezs42")
      assert(gh.getString(1) === "u4pruydq")
      // overlay predicates: closed semantics (edge contact intersects)
      val ov = spark.sql(
        """SELECT convex_intersects(array(10L,10L,-10L,-10L), array(-10L,10L,10L,-10L),
          |    array(30L,30L,10L,10L), array(-10L,10L,10L,-10L)) AS touch,
          |  convex_intersects(array(10L,10L,-10L,-10L), array(-10L,10L,10L,-10L),
          |    array(31L,31L,11L,11L), array(-10L,10L,10L,-10L)) AS apart,
          |  seg_intersects_ring(array(-20L,0L,20L,0L),
          |    array(10L,10L,-10L,-10L), array(-10L,10L,10L,-10L)) AS through,
          |  seg_intersects_ring(array(12L,0L,30L,0L),
          |    array(10L,10L,-10L,-10L), array(-10L,10L,10L,-10L)) AS short
          |""".stripMargin).collect()(0)
      assert(ov.getBoolean(0) && !ov.getBoolean(1))
      assert(ov.getBoolean(2) && !ov.getBoolean(3))
    } finally {
      spark.stop()
      SparkSession.clearActiveSession()
      SparkSession.clearDefaultSession()
    }
  }
}
