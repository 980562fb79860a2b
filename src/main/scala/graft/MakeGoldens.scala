package graft

import org.apache.spark.sql.SparkSession

/** Regenerates the committed golden parquet for queries whose semantics
  * are not ANSI-SQL-expressible (the multipolygon assembly pipeline). The
  * golden is produced from the fixed OsmSynth conformance input (150
  * relations, sf-independent), reviewed via the assembly spec suite, and
  * committed; the driver's DuckDB oracle then reads it back with
  * read_parquet, turning the q_area_assembly check from rows-only into a
  * full rows+schema+hash gate. Run after any intentional assembly
  * semantics change: `sbt "runMain graft.MakeGoldens"`.
  */
object MakeGoldens {
  val GoldenDir = "/root/repo/goldens"

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    SparkEntry.areaAssembly(spark)
      .coalesce(1)
      .write.mode("overwrite")
      .parquet(s"$GoldenDir/q_area_assembly")
    println(s"[goldens] wrote $GoldenDir/q_area_assembly")
    spark.stop()
  }
}
