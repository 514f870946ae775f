package graft
object DumpPlan {
  def main(args: Array[String]): Unit = {
    val spark = Engine.session("local[8]", shufflePartitions = 8)
    spark.sparkContext.setLogLevel("ERROR")
    val df = SparkEntry.queries(args(1))(spark, args(0))
    println(df.queryExecution.executedPlan.toString())
    spark.stop()
  }
}
