package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev probe (test scope, not shipped): measures the actual convergence
  * round of the three iterative graph operators on the driver testdata,
  * so the fixed-round oracle unrolls and the convergence-driven kernels
  * can be cross-checked per generation. Run with main+test classes and
  * the Spark jars dir on the classpath:
  * `java -cp ... graft.GraphConvergenceProbe /root/testdata/sf0.01` */
object GraphConvergenceProbe {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val s = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", false)
      .appName("graph-probe").getOrCreate()
    val li = Tables.lineitem(s, dir).select(col("l_orderkey"), col("l_suppkey"))
    val ord = Tables.orders(s, dir).select(col("o_orderkey"), col("o_custkey"))
    val cs = li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .select((col("o_custkey") * 2).as("c"), (col("l_suppkey") * 2 + 1).as("p"))
      .distinct()
    val edges = cs.select(col("c").as("src"), col("p").as("dst"))
      .unionByName(cs.select(col("p").as("src"), col("c").as("dst")))
      .distinct()
      .repartition(col("src")).persist()

    // BFS from node 0
    var dist = s.range(1).select(lit(0L).as("node"), lit(0L).as("dist")).localCheckpoint(true)
    (1 to 8).foreach { r =>
      val relaxed = edges
        .join(dist.withColumnRenamed("node", "src").withColumnRenamed("dist", "d0"), "src")
        .select(col("dst").as("node"), (col("d0") + lit(1L)).as("dist"))
      val next = dist.unionByName(relaxed)
        .groupBy(col("node")).agg(min(col("dist")).as("dist")).localCheckpoint(true)
      val changed = next.exceptAll(dist).count()
      println(s"BFS round $r changed=$changed count=${next.count()}")
      dist = next
    }

    // k-core k=10
    var alive = edges.select(col("src").as("node")).distinct().localCheckpoint(true)
    (1 to 8).foreach { r =>
      val next = edges
        .join(alive.withColumnRenamed("node", "src"), "src")
        .join(alive.withColumnRenamed("node", "dst"), "dst")
        .groupBy(col("src").as("node")).agg(count(lit(1)).as("core_deg"))
        .filter(col("core_deg") >= 10).select(col("node")).localCheckpoint(true)
      println(s"KCORE round $r n=${next.count()} (prev ${alive.count()})")
      alive = next
    }

    // label prop
    var labels = edges.select(col("src").as("node")).distinct()
      .select(col("node"), col("node").as("lbl")).localCheckpoint(true)
    var prevPrev: org.apache.spark.sql.DataFrame = null
    (1 to 10).foreach { r =>
      val votes = edges
        .join(labels.withColumnRenamed("node", "src"), "src")
        .groupBy(col("dst").as("node"), col("lbl"))
        .agg(count(lit(1)).as("cnt"))
      val w = org.apache.spark.sql.expressions.Window.partitionBy(col("node"))
        .orderBy(col("cnt").desc, col("lbl").asc)
      val next = votes.withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1).select(col("node"), col("lbl")).localCheckpoint(true)
      val chg = next.exceptAll(labels).count()
      val cyc = if (prevPrev != null) next.exceptAll(prevPrev).count() else -1L
      println(s"LP round $r changed=$chg cycleDelta=$cyc")
      prevPrev = labels
      labels = next
    }
    s.stop()
  }
}
