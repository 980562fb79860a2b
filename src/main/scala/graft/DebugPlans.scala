package graft
import org.apache.spark.sql.SparkSession
object DebugPlans {
  def main(args: Array[String]): Unit = {
    val spark = BenchScale.session(8)
    spark.sparkContext.setLogLevel("ERROR")
    val d = "/root/testdata/sf0.001"
    for (name <- args) {
      println(s"========== $name ==========")
      SparkEntry.queries(name)(spark, d).explain("formatted")
    }
    spark.stop()
  }
}
