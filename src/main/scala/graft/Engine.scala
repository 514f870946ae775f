package graft

import org.apache.spark.sql.SparkSession

/** SparkSession factory with the engine's scale posture baked in.
  *
  * Local runs use `local[N]`; on a real cluster the same config block
  * applies (AQE, skew-join handling, sensible shuffle parallelism) —
  * only `master` and memory sizing change.
  */
object Engine {
  def session(master: String = "local[*]", shufflePartitions: Int = 32): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.shuffle.partitions", shufflePartitions.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
