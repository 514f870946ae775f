package graft.etl

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Load stage: sinks with fallback (reference: scripts/load.py —
  * batched Supabase inserts with retry/backoff, falling back to a local
  * file copy when the remote is unavailable or its schema rejects rows).
  *
  * Spark-native re-expression: a `Sink` is a terminal write of a
  * DataFrame; `FallbackSink` tries sinks in order. The JDBC sink is the
  * Postgres-equivalent of the reference's Supabase table load — Spark's
  * JDBC writer already batches per partition (`batchsize`) and
  * parallelizes across executors (`numPartitions`), replacing the
  * reference's driver-side 200-row loop with a distributed write.
  */
object Load {

  trait Sink {
    def write(df: DataFrame): Unit

    /** The sink's contents re-read as a frame, when the sink holds a
      * complete re-readable snapshot of the last write (Overwrite-mode
      * file/table sinks). Append-mode sinks return None — their count
      * includes prior loads, so snapshot reconciliation doesn't apply. */
    def readBack(spark: SparkSession): Option[DataFrame] = None
  }

  /** Post-load row-count reconciliation (reference scripts/
    * validate.py:75–80 — source count vs the count actually loaded):
    * re-reads the sink and compares counts, throwing on a short write
    * (partial load, lost partition). Sinks without a re-readable
    * snapshot are skipped. Count-only: the read-back never deserializes
    * row contents for columnar sinks. */
  def reconcile(source: DataFrame, sink: Sink): Unit =
    sink.readBack(source.sparkSession).foreach { back =>
      val loaded = back.count()
      val src = source.count()
      if (loaded != src)
        throw new IllegalStateException(
          s"load reconciliation failed: source has $src rows, sink read back $loaded")
    }

  final case class ParquetSink(path: String,
                               partitionBy: Seq[String] = Nil,
                               mode: SaveMode = SaveMode.Overwrite) extends Sink {
    def write(df: DataFrame): Unit = {
      val w = df.write.mode(mode)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).parquet(path)
    }
    override def readBack(spark: SparkSession): Option[DataFrame] =
      if (mode == SaveMode.Overwrite) Some(spark.read.parquet(path)) else None
  }

  final case class CsvSink(path: String, header: Boolean = true,
                           mode: SaveMode = SaveMode.Overwrite) extends Sink {
    def write(df: DataFrame): Unit =
      df.write.mode(mode).option("header", header.toString).csv(path)
    override def readBack(spark: SparkSession): Option[DataFrame] =
      if (mode == SaveMode.Overwrite)
        Some(spark.read.option("header", header.toString).csv(path))
      else None
  }

  final case class OrcSink(path: String,
                           partitionBy: Seq[String] = Nil,
                           mode: SaveMode = SaveMode.Overwrite) extends Sink {
    def write(df: DataFrame): Unit = {
      val w = df.write.mode(mode)
      (if (partitionBy.nonEmpty) w.partitionBy(partitionBy: _*) else w).orc(path)
    }
    override def readBack(spark: SparkSession): Option[DataFrame] =
      if (mode == SaveMode.Overwrite) Some(spark.read.orc(path)) else None
  }

  /** JSON lines sink (reference etl_analysis.ipynb writes an
    * analysis_summary.json next to the CSV outputs — cells 3/9). */
  final case class JsonSink(path: String,
                            mode: SaveMode = SaveMode.Overwrite) extends Sink {
    def write(df: DataFrame): Unit = df.write.mode(mode).json(path)
    override def readBack(spark: SparkSession): Option[DataFrame] =
      if (mode == SaveMode.Overwrite) Some(spark.read.json(path)) else None
  }

  /** JDBC batch load (reference: load.py:95-210). `batchSize` maps the
    * reference's insert batching; `numPartitions` bounds connection
    * fan-out from a large cluster. Column names are snake_cased to match
    * unquoted Postgres identifiers (load.py:118-138). */
  final case class JdbcSink(url: String, table: String,
                            properties: java.util.Properties = new java.util.Properties(),
                            batchSize: Int = 1000, numPartitions: Int = 8,
                            mode: SaveMode = SaveMode.Append) extends Sink {
    def write(df: DataFrame): Unit = {
      val renamed = df.columns.foldLeft(df)((d, c) =>
        d.withColumnRenamed(c, Features.snakeCase(c)))
      renamed
        .repartition(numPartitions)
        .write.mode(mode)
        .option("batchsize", batchSize.toString)
        .jdbc(url, table, properties)
    }
    override def readBack(spark: SparkSession): Option[DataFrame] =
      if (mode == SaveMode.Overwrite) Some(spark.read.jdbc(url, table, properties))
      else None
  }

  /** Bucketed managed-table sink: rows are hash-bucketed (and sorted)
    * by the join/agg key at write time, so later equi-joins and
    * aggregations on that key run shuffle-free — the standard layout
    * investment for fact tables that are joined repeatedly at scale.
    * (See PlanSpec: a join of two tables bucketed on the same key by
    * the same bucket count plans with no Exchange.) */
  final case class BucketedTableSink(table: String, bucketCol: String,
                                     numBuckets: Int = 32,
                                     sortCol: Option[String] = None,
                                     mode: SaveMode = SaveMode.Overwrite,
                                     oneFilePerBucket: Boolean = false) extends Sink {
    def write(df: DataFrame): Unit = {
      // repartition on the bucket column (same murmur3 hash bucketBy
      // uses) → each task owns whole buckets → ONE file per bucket —
      // the layout Spark requires before it trusts the written sort
      // order and elides the per-side Sort under a bucketed join
      val in = if (oneFilePerBucket)
        df.repartition(numBuckets, org.apache.spark.sql.functions.col(bucketCol))
      else df
      val w = in.write.mode(mode).format("parquet")
        .bucketBy(numBuckets, bucketCol)
      sortCol.fold(w)(s => w.sortBy(s)).saveAsTable(table)
    }
    override def readBack(spark: SparkSession): Option[DataFrame] =
      if (mode == SaveMode.Overwrite) Some(spark.table(table)) else None
  }

  /** Try each sink in order; first success wins (load.py's
    * remote-then-local-copy behavior). Retries are per-sink, with
    * linear backoff between attempts (load.py's sleep-and-retry). */
  final case class FallbackSink(sinks: Seq[Sink], retriesPerSink: Int = 2,
                                backoffMs: Long = 0L) extends Sink {
    /** The sink the last successful write landed in — read-back (and so
      * reconciliation) targets it, not the first-choice sink. */
    @volatile private var lastSucceeded: Option[Sink] = None

    def write(df: DataFrame): Unit = {
      var lastErr: Throwable = null
      var done = false
      val it = sinks.iterator
      while (!done && it.hasNext) {
        val s = it.next()
        var attempt = 0
        while (!done && attempt <= retriesPerSink) {
          try { s.write(df); done = true; lastSucceeded = Some(s) }
          catch {
            case scala.util.control.NonFatal(e) =>
              lastErr = e; attempt += 1
              if (attempt <= retriesPerSink && backoffMs > 0)
                Thread.sleep(backoffMs * attempt)
          }
        }
      }
      if (!done) throw new RuntimeException("all sinks failed", lastErr)
    }
    override def readBack(spark: SparkSession): Option[DataFrame] =
      lastSucceeded.flatMap(_.readBack(spark))
  }

  /** Small-files compaction: rewrite a parquet directory into
    * ~`targetBytes`-sized files. Streaming sinks and per-batch appends
    * fragment a table into thousands of KB-scale files, and at 100 TB
    * the scan then pays one open/footer-parse per file and the
    * scheduler one task per file — compaction is the standing
    * maintenance job every lakehouse runs. Sizing uses the actual
    * on-disk bytes (filesystem listing, no data scan); the rewrite is
    * one `coalesce` job — no shuffle, each output file concatenates
    * whole input partitions. Writes to a temp sibling then swaps, so a
    * failed rewrite never destroys the source.
    *
    * Returns (filesBefore, filesAfter).
    */
  def compactParquet(spark: SparkSession, dir: String,
                     targetBytes: Long = 128L << 20): (Int, Int) = {
    require(targetBytes > 0)
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    val parts = fs.listStatus(path)
      .filter(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    val totalBytes = parts.map(_.getLen).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    rewriteSwap(spark, dir, spark.read.parquet(dir).coalesce(nOut))
    val after = fs.listStatus(path)
      .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
    (parts.length, after)
  }

  /** Write through a sink with ONE-PASS load metrics via Spark's
    * Observation API: the named aggregates ride the write job itself —
    * no second scan, unlike the reference's validate step re-reading
    * what it just loaded (scripts/validate.py:75–80). Typical metrics:
    * `count(lit(1))`, per-column null counts, `sum` of a measure for
    * balance checks. Returns the observed values after the write
    * completes. At 100 TB a re-scan for row counts doubles the load
    * cost; observation makes the audit free. */
  def writeObserved(df: DataFrame, sink: Sink,
                    metrics: Map[String, org.apache.spark.sql.Column]): Map[String, Any] = {
    require(metrics.nonEmpty)
    val obs = new org.apache.spark.sql.Observation()
    val cols = metrics.toSeq.map { case (n, c) => c.as(n) }
    sink.write(df.observe(obs, cols.head, cols.tail: _*))
    obs.get
  }

  /** File-based upsert (MERGE by key, latest wins): rows of `updates`
    * replace target rows sharing their key; unmatched target rows are
    * kept, unmatched updates inserted. The merge is one left_anti join
    * (broadcast when the update batch is small — the common CDC shape)
    * plus a union; the rewrite goes through the same temp-and-swap as
    * [[compactParquet]], so a failed merge never corrupts the target.
    * This is the poor-lakehouse MERGE INTO for plain parquet dirs —
    * rewriting the whole table per batch; at real CDC volume, partition
    * the target and merge only touched partitions. */
  def upsertParquet(spark: SparkSession, dir: String, updates: DataFrame,
                    keyCols: Seq[String]): Unit = {
    require(keyCols.nonEmpty)
    val target = spark.read.parquet(dir)
    val merged = updates.unionByName(
      target.join(broadcast(updates.select(keyCols.map(org.apache.spark.sql.functions.col): _*)),
        keyCols, "left_anti"))
    rewriteSwap(spark, dir, merged)
  }

  /** [[compactParquet]] for a partitioned table: each `pcol=value`
    * subdirectory is sized and rewritten independently, and partitions
    * already within the file budget are SKIPPED entirely — the
    * steady-state maintenance pass touches only the partitions the
    * last ingest fragmented (on a date-partitioned table: today's).
    * Returns (partition → (filesBefore, filesAfter)) for rewritten
    * partitions only. */
  def compactPartitioned(spark: SparkSession, dir: String,
                         targetBytes: Long = 128L << 20,
                         maxFilesTolerated: Int = 4): Map[String, (Int, Int)] = {
    val conf = spark.sparkContext.hadoopConfiguration
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(conf)
    fs.listStatus(root)
      .filter(d => d.isDirectory && d.getPath.getName.contains("="))
      .flatMap { d =>
        val nFiles = fs.listStatus(d.getPath)
          .count(f => f.isFile && f.getPath.getName.endsWith(".parquet"))
        if (nFiles <= maxFilesTolerated) None
        else Some(d.getPath.getName ->
          compactParquet(spark, d.getPath.toString, targetBytes))
      }.toMap
  }

  /** Partition-scoped upsert: the scale path [[upsertParquet]] points
    * at. Only partitions present in the CDC batch are read (partition
    * pruning keeps the scan to touched subdirs), merged, and swapped —
    * a day's worth of updates against a 100 TB date-partitioned table
    * rewrites one date's files, not the table. Untouched partition
    * directories are never opened or renamed. */
  def upsertPartitioned(spark: SparkSession, dir: String, updates: DataFrame,
                        keyCols: Seq[String], partitionCol: String): Unit = {
    require(keyCols.nonEmpty && !keyCols.contains(partitionCol))
    import org.apache.spark.sql.functions.col
    val touched = updates.select(col(partitionCol)).distinct().collect().map(_.get(0))
    if (touched.isEmpty) return
    val target = spark.read.parquet(dir).filter(col(partitionCol).isin(touched: _*))
    val merged = updates.unionByName(
      target.join(broadcast(updates.select((keyCols :+ partitionCol).map(col): _*)),
        keyCols :+ partitionCol, "left_anti"))
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new org.apache.hadoop.fs.Path(dir).getFileSystem(conf)
    val tmp = dir + "_rewrite_tmp"
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
    merged.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(tmp)
    touched.foreach { v =>
      val sub = s"$partitionCol=$v"
      val dst = new org.apache.hadoop.fs.Path(s"$dir/$sub")
      val src = new org.apache.hadoop.fs.Path(s"$tmp/$sub")
      val bak = new org.apache.hadoop.fs.Path(s"$dir/${sub}_rewrite_old")
      fs.delete(bak, true)
      if (fs.exists(dst) && !fs.rename(dst, bak))
        throw new IllegalStateException(s"upsert swap failed for $dst")
      if (!fs.rename(src, dst)) {
        fs.rename(bak, dst)
        throw new IllegalStateException(s"upsert swap failed for $dst")
      }
      fs.delete(bak, true)
    }
    fs.delete(new org.apache.hadoop.fs.Path(tmp), true)
  }

  private def broadcast(df: DataFrame): DataFrame =
    org.apache.spark.sql.functions.broadcast(df)

  /** Materialize `replacement` into a temp sibling of `dir`, then swap
    * it in place (backup-rename-restore): the source stays intact until
    * the rewrite has fully succeeded. The replacement plan may READ
    * `dir` — it is computed against the original files before any
    * rename happens. */
  private def rewriteSwap(spark: SparkSession, dir: String, replacement: DataFrame): Unit = {
    val conf = spark.sparkContext.hadoopConfiguration
    val path = new org.apache.hadoop.fs.Path(dir)
    val fs = path.getFileSystem(conf)
    val tmp = new org.apache.hadoop.fs.Path(dir + "_rewrite_tmp")
    fs.delete(tmp, true)
    replacement.write.mode(SaveMode.Overwrite).parquet(tmp.toString)
    val bak = new org.apache.hadoop.fs.Path(dir + "_rewrite_old")
    fs.delete(bak, true)
    if (!fs.rename(path, bak))
      throw new IllegalStateException(s"rewrite swap failed for $dir")
    if (!fs.rename(tmp, path)) {
      fs.rename(bak, path) // roll back
      throw new IllegalStateException(s"rewrite swap failed for $dir")
    }
    fs.delete(bak, true)
  }
}
