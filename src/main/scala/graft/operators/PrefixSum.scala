package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructField, StructType}

/** Distributed prefix scan: globally-ordered running totals and a
  * 1-based global rank WITHOUT a single-partition window.
  *
  * `Window.orderBy(k)` with no partition spec funnels every row through
  * ONE task — the classic scale cliff for ECDFs, cumulative revenue,
  * global ranks. The scan here is the textbook two-pass fix:
  *
  *   1. range-repartition on the order key(s) and sort within each
  *      partition (the ONLY exchange);
  *   2. pass 1 (narrow): per-partition subtotals — a
  *      numPartitions-sized collect, never row-sized;
  *   3. pass 2 (narrow): re-walk each partition adding its exclusive
  *      prefix offset.
  *
  * Determinism: both passes run over the SAME RDD instance, and
  * `RangePartitioner` seeds its reservoir sampling from the RDD id, so
  * even a cache-evicted recompute reproduces identical boundaries; the
  * emitted (row, running-total, rank) values are in any case
  * independent of WHERE the boundaries fall because `orderCols` must be
  * a unique key (ties across rows would make tied rows' prefix values
  * partition-dependent — callers aggregate to distinct keys first).
  * Running totals are BIGINT (the integer-exact discipline): exact,
  * order-independent, hash-stable across engines.
  *
  * The sorted input is persisted while the two passes run and
  * registered in an owned-cache list (the [[graft.dedup.Dedup]]
  * contract); call [[releaseCaches]] once results are materialized.
  */
object PrefixSum {

  private val owned = scala.collection.mutable.ArrayBuffer.empty[DataFrame]

  /** Unpersist every scan input this JVM has cached. Safe at any time. */
  def releaseCaches(): Unit = synchronized {
    owned.foreach(_.unpersist(blocking = false))
    owned.clear()
  }

  /** Append `<c>_cum` running totals (one per `sumCols` entry, which
    * must be LongType) and a 1-based global-rank column `rankCol`, all
    * under the total order of `orderCols` (a unique key of `df`). */
  def withRunningTotals(df: DataFrame, orderCols: Seq[String], sumCols: Seq[String],
      numParts: Int = 32, rankCol: String = "rn"): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(numParts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    synchronized {
      sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      owned += sorted
    }
    val schema = sorted.schema
    val idx = sumCols.map(schema.fieldIndex).toArray
    val rdd = sorted.rdd // single instance: both passes see one partitioning
    val nP = rdd.getNumPartitions
    val subtotals: Map[Int, (Array[Long], Long)] = rdd.mapPartitionsWithIndex { (pid, it) =>
      val s = new Array[Long](idx.length); var n = 0L
      it.foreach { r =>
        n += 1
        var j = 0; while (j < idx.length) { s(j) += r.getLong(idx(j)); j += 1 }
      }
      Iterator((pid, (s, n)))
    }.collect().toMap
    val offSums = new Array[Array[Long]](nP)
    val offN = new Array[Long](nP)
    var accS = new Array[Long](idx.length); var accN = 0L
    for (p <- 0 until nP) {
      offSums(p) = accS.clone(); offN(p) = accN
      subtotals.get(p).foreach { case (s, n) =>
        accS = accS.zip(s).map { case (a, b) => a + b }; accN += n
      }
    }
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val s = offSums(pid).clone(); var n = offN(pid)
      it.map { r =>
        n += 1
        var j = 0; while (j < idx.length) { s(j) += r.getLong(idx(j)); j += 1 }
        Row.fromSeq(r.toSeq ++ s.toSeq :+ n)
      }
    }
    val outSchema = StructType(schema.fields ++
      sumCols.map(c => StructField(c + "_cum", LongType, nullable = false)) :+
      StructField(rankCol, LongType, nullable = false))
    spark.createDataFrame(out, outSchema)
  }
}
