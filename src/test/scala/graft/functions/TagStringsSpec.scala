package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.BeforeAndAfterAll
import org.scalatest.funsuite.AnyFunSuite

/** Goldens ported from reference/test/t/tags/test_to_string.cpp (the
  * reference's own expected strings, formatted in key-sorted order — the
  * fixtures happen to be alphabetical already).
  */
class TagStringsSpec extends AnyFunSuite with BeforeAndAfterAll {
  private var spark: SparkSession = _

  override def beforeAll(): Unit = {
    spark = SparkSession.builder()
      .master("local[2]").config("spark.sql.shuffle.partitions", 2)
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
  }
  override def afterAll(): Unit = if (spark != null) spark.stop()

  private def fmt(tags: Map[String, String])(f: org.apache.spark.sql.Column
      => org.apache.spark.sql.Column): String = {
    val ss = spark; import ss.implicits._
    Seq(Tuple1(tags)).toDF("tags").select(f(col("tags"))).collect()(0).getString(0)
  }

  private val basic = Map("highway" -> "primary", "name" -> "Main Street")

  test("parameterized op golden (tag_to_string)") {
    assert(fmt(basic)(TagStrings.tagsToString(_, "", "PREFIX", "INFIX", "SUFFIX", "JOIN"))
      === "PREFIXhighwayINFIXprimarySUFFIXJOINPREFIXnameINFIXMain StreetSUFFIX")
  }

  test("key=value golden") {
    assert(fmt(basic)(TagStrings.tagsKeyEqualsValue(_, ","))
      === "highway=primary,name=Main Street")
  }

  test("hstore golden") {
    assert(fmt(basic)(TagStrings.tagsHstore)
      === "\"highway\"=>\"primary\",\"name\"=>\"Main Street\"")
  }

  test("hstore escape golden (quotes escaped, apostrophes kept)") {
    val t = Map("name" -> "O'Rourke Street (\"Fool's Corner\")")
    assert(fmt(t)(TagStrings.tagsHstore)
      === "\"name\"=>\"O'Rourke Street (\\\"Fool's Corner\\\")\"")
  }

  test("backslashes in values escape before quotes (no double-escaping)") {
    val t = Map("k" -> "a\\b\"c")
    assert(fmt(t)(TagStrings.tagsHstore) === "\"k\"=>\"a\\\\b\\\"c\"")
    // the k=v form escapes nothing (escape set is empty)
    assert(fmt(t)(TagStrings.tagsKeyEqualsValue(_, ",")) === "k=a\\b\"c")
  }
}
