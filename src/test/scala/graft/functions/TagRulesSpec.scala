package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

class TagRulesSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def tagged(maps: Map[String, String]*) = {
    val ss = spark; import ss.implicits._
    maps.zipWithIndex.map { case (m, i) => (i.toLong, m) }.toDF("id", "tags")
  }

  test("osm2shape rule forms: key / key=* / key=value / key=v1|v2") {
    val df = tagged(
      Map("highway" -> "primary"),
      Map("highway" -> "residential"),
      Map("landuse" -> "forest"),
      Map.empty)
    def ids(rule: String) = df.filter(
      TagRules.anyMatch(col("tags"), Seq(TagRules.parse(rule))))
      .collect().map(_.getLong(0)).toSet
    assert(ids("highway") === Set(0L, 1L))
    assert(ids("highway=*") === Set(0L, 1L))
    assert(ids("highway=primary") === Set(0L))
    assert(ids("highway=primary|residential") === Set(0L, 1L))
    assert(ids("landuse=forest") === Set(2L))
  }

  test("KeyFilter first-match chain with default verdict") {
    val df = tagged(
      Map("created_by" -> "editor"),     // rule 0: drop
      Map("highway" -> "primary"),       // rule 1: keep
      Map("note" -> "x"))                // no match -> default false
    val rules = Seq(
      TagRules.KeyExists("created_by", verdict = false),
      TagRules.KeyExists("highway", verdict = true))
    val kept = df.filter(TagRules.firstMatch(col("tags"), rules, default = false))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(1L))
    // first-match wins: an object matching both rules takes rule 0
    val both = tagged(Map("created_by" -> "e", "highway" -> "primary"))
    assert(both.filter(TagRules.firstMatch(col("tags"), rules, default = true))
      .count() === 0)
  }

  test("regex rule matches values") {
    val df = tagged(Map("name" -> "Main Street"), Map("name" -> "Hauptstrasse"))
    val kept = df.filter(TagRules.anyMatch(col("tags"),
        Seq(TagRules.KeyValueRegex("name", "Street$"))))
      .collect().map(_.getLong(0)).toSet
    assert(kept === Set(0L))
  }
}
