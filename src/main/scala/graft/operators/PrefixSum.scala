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

  /** Persist `df` under this object's owned-cache lifecycle (released
    * by [[releaseCaches]]) — for callers that build their own scan but
    * share the Verify/Bench per-query release point. */
  def persistOwned(df: DataFrame): DataFrame = synchronized {
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    owned += df
    df
  }

  /** Distinct-key running counts straight from RAW (possibly duplicated)
    * rows: one output row per distinct `orderCols` key carrying `cnt`
    * (multiplicity) and `cnt_cum` (rows ≤ key in the total order).
    *
    * Equivalent to `df.groupBy(orderCols).count()` piped through
    * [[withRunningTotals]], minus the aggregation exchange: after the
    * range repartition equal keys are contiguous within one partition
    * (RangePartitioner never splits equal keys), so multiplicities fall
    * out of a run-length merge inside the scan pass itself. That matters
    * when keys are near-unique — a partial hash aggregate over 1.5M
    * distinct keys builds a map per partition and reduces nothing, pure
    * overhead this path never pays. Output values are
    * boundary-independent (cnt and cnt_cum are global properties of the
    * key), so the sampling-dependent partitioning cannot leak into
    * results.
    *
    * `sumCols` (must be LongType) additionally emit the per-key sum
    * under the column's own name plus a `<c>_cum` running total — the
    * weighted-rank shape (weighted medians, midranks). */
  def distinctRunningCounts(df: DataFrame, orderCols: Seq[String],
      sumCols: Seq[String] = Nil, numParts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val sorted = df.select((orderCols ++ sumCols).map(col): _*)
      .repartitionByRange(numParts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    persistOwned(sorted)
    val rdd = sorted.rdd // single instance: both passes see one partitioning
    val nP = rdd.getNumPartitions
    val k = orderCols.length
    val m = sumCols.length
    val subs: Map[Int, (Long, Array[Long])] = rdd.mapPartitionsWithIndex { (pid, it) =>
      var n = 0L; val s = new Array[Long](m)
      it.foreach { r =>
        n += 1
        var j = 0; while (j < m) { s(j) += r.getLong(k + j); j += 1 }
      }
      Iterator((pid, (n, s)))
    }.collect().toMap
    val offN = new Array[Long](nP)
    val offS = new Array[Array[Long]](nP)
    var accN = 0L; var accS = new Array[Long](m)
    for (p <- 0 until nP) {
      offN(p) = accN; offS(p) = accS.clone()
      subs.get(p).foreach { case (n, s) =>
        accN += n; accS = accS.zip(s).map { case (a, b) => a + b }
      }
    }
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      var cum = offN(pid)
      val scum = offS(pid).clone()
      new Iterator[Row] {
        private var pending: Row = null
        def hasNext: Boolean = pending != null || it.hasNext
        def next(): Row = {
          val key = if (pending != null) pending else it.next()
          pending = null
          var cnt = 1L
          val sums = new Array[Long](m)
          var j = 0; while (j < m) { sums(j) = key.getLong(k + j); j += 1 }
          var done = false
          while (!done && it.hasNext) {
            val r = it.next()
            var same = true; j = 0
            while (same && j < k) { if (r.get(j) != key.get(j)) same = false; j += 1 }
            if (same) {
              cnt += 1
              j = 0; while (j < m) { sums(j) += r.getLong(k + j); j += 1 }
            } else { pending = r; done = true }
          }
          cum += cnt
          j = 0; while (j < m) { scum(j) += sums(j); j += 1 }
          Row.fromSeq(key.toSeq.take(k) ++ (cnt +: cum +:
            (0 until m).flatMap(i => Seq(sums(i), scum(i)))))
        }
      }
    }
    val outSchema = StructType(sorted.schema.fields.take(k) ++
      (StructField("cnt", LongType, nullable = false) ::
        StructField("cnt_cum", LongType, nullable = false) :: Nil) ++
      sumCols.flatMap(c => Seq(StructField(c, LongType, nullable = false),
        StructField(c + "_cum", LongType, nullable = false))))
    spark.createDataFrame(out, outSchema)
  }

  /** Append `<c>_pmax` EXCLUSIVE prefix maxima (one per `maxCols`
    * entry, which must be LongType): for each row, the max of the
    * column over all STRICTLY earlier rows in the `orderCols` total
    * order, `Long.MinValue` for the first row. Same two-pass shape as
    * [[withRunningTotals]] (max is associative — per-partition maxima
    * fold into exclusive partition offsets), same determinism contract:
    * `orderCols` must be a unique key. The exclusive form is the
    * dominance-test primitive (skyline: "does any higher-ranked row
    * already beat me"), where an inclusive running max would always
    * include the row itself. */
  def withRunningMax(df: DataFrame, orderCols: Seq[String], maxCols: Seq[String],
      numParts: Int = 32): DataFrame = {
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(numParts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    synchronized {
      sorted.persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      owned += sorted
    }
    val schema = sorted.schema
    val idx = maxCols.map(schema.fieldIndex).toArray
    val rdd = sorted.rdd // single instance: both passes see one partitioning
    val nP = rdd.getNumPartitions
    val partMax: Map[Int, Array[Long]] = rdd.mapPartitionsWithIndex { (pid, it) =>
      val s = Array.fill(idx.length)(Long.MinValue)
      it.foreach { r =>
        var j = 0
        while (j < idx.length) {
          val v = r.getLong(idx(j)); if (v > s(j)) s(j) = v; j += 1
        }
      }
      Iterator((pid, s))
    }.collect().toMap
    val off = new Array[Array[Long]](nP)
    var acc = Array.fill(idx.length)(Long.MinValue)
    for (p <- 0 until nP) {
      off(p) = acc.clone()
      partMax.get(p).foreach { s =>
        acc = acc.zip(s).map { case (a, b) => math.max(a, b) }
      }
    }
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val s = off(pid).clone()
      it.map { r =>
        val prev = s.clone()
        var j = 0
        while (j < idx.length) {
          val v = r.getLong(idx(j)); if (v > s(j)) s(j) = v; j += 1
        }
        Row.fromSeq(r.toSeq ++ prev.toSeq)
      }
    }
    val outSchema = StructType(schema.fields ++
      maxCols.map(c => StructField(c + "_pmax", LongType, nullable = false)))
    spark.createDataFrame(out, outSchema)
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

  /** [[withRunningTotals]] for DECIMAL(38,18) value columns: running
    * totals accumulate in java.math.BigDecimal (exact — decimal adds
    * carry the same order-independence guarantee the BIGINT path gives
    * integers), emitted as `<c>_cum` DECIMAL(38,18). The globally-exact
    * prefix scan over gathered doubles (each term a correctly-rounded
    * double CAST to decimal) is what makes data-sized ln/log prefix
    * tables engine-portable: DuckDB's window SUM over the same decimal
    * terms lands the identical cumulative values in any evaluation
    * order. Same two-pass shape, same determinism contract (`orderCols`
    * a unique key), same owned-cache lifecycle. */
  def withRunningDecimalTotals(df: DataFrame, orderCols: Seq[String],
      sumCols: Seq[String], numParts: Int = 32): DataFrame = {
    import org.apache.spark.sql.types.DataTypes
    val dec38 = DataTypes.createDecimalType(38, 18)
    val spark = df.sparkSession
    val sorted = df
      .repartitionByRange(numParts, orderCols.map(col): _*)
      .sortWithinPartitions(orderCols.map(col): _*)
    persistOwned(sorted)
    val schema = sorted.schema
    val idx = sumCols.map(schema.fieldIndex).toArray
    val zero = java.math.BigDecimal.ZERO
    def term(r: Row, i: Int): java.math.BigDecimal = {
      val v = r.getDecimal(i); if (v == null) zero else v
    }
    val rdd = sorted.rdd // single instance: both passes see one partitioning
    val nP = rdd.getNumPartitions
    val subtotals: Map[Int, Array[java.math.BigDecimal]] =
      rdd.mapPartitionsWithIndex { (pid, it) =>
        val s = Array.fill(idx.length)(zero)
        it.foreach { r =>
          var j = 0; while (j < idx.length) { s(j) = s(j).add(term(r, idx(j))); j += 1 }
        }
        Iterator((pid, s))
      }.collect().toMap
    val off = new Array[Array[java.math.BigDecimal]](nP)
    var acc = Array.fill(idx.length)(zero)
    for (p <- 0 until nP) {
      off(p) = acc.clone()
      subtotals.get(p).foreach { s =>
        acc = acc.zip(s).map { case (a, b) => a.add(b) }
      }
    }
    val out = rdd.mapPartitionsWithIndex { (pid, it) =>
      val s = off(pid).clone()
      it.map { r =>
        var j = 0; while (j < idx.length) { s(j) = s(j).add(term(r, idx(j))); j += 1 }
        Row.fromSeq(r.toSeq ++ s.map(_.setScale(18)).toSeq)
      }
    }
    val outSchema = StructType(schema.fields ++
      sumCols.map(c => StructField(c + "_cum", dec38, nullable = false)))
    spark.createDataFrame(out, outSchema)
  }
}
