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
    // getOrCreate silently reuses a pre-existing session: runtime SQL
    // configs above ARE re-applied to it, but extensions (the graft SQL
    // function registry) are NOT. Fail fast instead of returning a
    // session that breaks the engine's determinism conventions.
    if (!spark.catalog.functionExists("simhash64"))
      throw new IllegalStateException(
        "Engine.session: getOrCreate returned a pre-existing SparkSession " +
          "built without GraftExtensions — graft SQL functions are missing. " +
          "Stop that session first, or build yours via Engine.session.")
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
