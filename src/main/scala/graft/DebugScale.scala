package graft
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.MetricsOps
object DebugScale {
  def main(args: Array[String]): Unit = {
    for (cpus <- Seq(8, 32)) {
      val spark = BenchScale.session(cpus)
      spark.sparkContext.setLogLevel("ERROR")
      val d = "/root/testdata/sf0.1"
      def run() = BenchScale.flagshipScale(spark, d, BenchScale.Rep).agg(sum("n")).collect()
      run() // warm
      run() // warm more (JIT)
      val t0 = System.nanoTime()
      val (_, metrics) = MetricsOps.withProgress(spark) { run() }
      println(f"CPUS=$cpus TOTAL ${(System.nanoTime()-t0)/1e9}%.2f s")
      metrics.orderBy(col("stageId")).collect().foreach { r =>
        println(s"  stage ${r.getInt(0)} tasks=${r.getInt(2)} in=${r.getLong(3)} wallMs=${r.getLong(7)}")
      }
      spark.stop()
      SparkSession.clearActiveSession(); SparkSession.clearDefaultSession()
    }
  }
}
