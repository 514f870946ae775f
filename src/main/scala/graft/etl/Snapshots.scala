package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Manifest-based snapshot versioning for plain parquet directories —
  * the reproducibility primitive a training pipeline needs ("the run
  * trained on corpus@v12") without a table-format dependency.
  *
  * Layout:
  * {{{
  *   <table>/data/v<version>-<uuid>/part-*.parquet   immutable commit dirs
  *   <table>/_manifests/v<00000version>.json         file list per version
  * }}}
  *
  * Every commit writes its data files to a fresh commit dir, then
  * publishes manifest v(N+1) — `append` carries the parent's file list
  * forward, `overwrite` starts fresh. The manifest create uses
  * FileSystem.create(overwrite = false): two writers racing to the same
  * version see exactly one winner; the loser gets a
  * ConcurrentModificationException and must re-read and retry
  * (optimistic concurrency, the Delta/Iceberg commit protocol shape).
  * Readers pin a version and see an immutable file set — a reader on
  * v12 is unaffected by later commits OR by compaction/vacuum of newer
  * versions, because data files are never mutated in place.
  *
  * At 100 TB the manifest stays driver-sized (one line per file, not
  * per row) and `read` hands Spark the exact file list — no directory
  * listing of the whole table, which on object stores is the difference
  * between a millisecond plan and a minutes-long LIST storm.
  */
object Snapshots {

  final case class Manifest(version: Int, op: String, parent: Int, files: Seq[String])

  private val mapper = new ObjectMapper()

  private def fs(s: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def manifestPath(table: String, v: Int): Path =
    new Path(s"$table/_manifests/v${"%05d".format(v)}.json")

  def latestVersion(s: SparkSession, table: String): Int = {
    val dir = new Path(s"$table/_manifests")
    val f = fs(s, table)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  def readManifest(s: SparkSession, table: String, version: Int): Manifest = {
    val in = fs(s, table).open(manifestPath(table, version))
    val node = try mapper.readTree(in) finally in.close()
    Manifest(
      node.get("version").asInt,
      node.get("op").asText,
      node.get("parent").asInt,
      node.get("files").elements().asScala.map(_.asText).toSeq)
  }

  /** Write `df` as a new snapshot. `op` is "append" (parent's files are
    * carried forward) or "overwrite" (fresh file list). Returns the
    * committed version. Throws ConcurrentModificationException when
    * another writer published the same version first — nothing partial
    * is visible in that case (the orphan commit dir is unreferenced and
    * reclaimed by vacuum).
    */
  def commit(df: DataFrame, table: String, op: String = "append",
             targetVersion: Option[Int] = None): Int = {
    require(op == "append" || op == "overwrite", s"unknown op $op")
    val s = df.sparkSession
    val f = fs(s, table)
    // targetVersion is the CAS handle: a writer that read latest = N
    // passes N+1 and conflicts if anyone committed in between. Without
    // it the latest is re-read here, which narrows but cannot close the
    // window — the manifest create below is what guarantees one winner.
    val version = targetVersion.getOrElse(latestVersion(s, table) + 1)
    val parent = version - 1
    val commitDir = s"$table/data/v$version-${java.util.UUID.randomUUID().toString.take(8)}"
    df.write.parquet(commitDir)
    val newFiles = f.listStatus(new Path(commitDir)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted.toSeq
    val carried =
      if (op == "append" && parent > 0) readManifest(s, table, parent).files else Nil
    publishManifest(f, table, version, op, parent, carried ++ newFiles)
    version
  }

  /** CAS-publish manifest `version` with an explicit file list — the
    * single commit point shared by commit(), delete(), and any future
    * file-level operation. overwrite=false IS the protocol: exactly one
    * writer wins a version. */
  private def publishManifest(f: FileSystem, table: String, version: Int,
                              op: String, parent: Int, files: Seq[String]): Unit = {
    val m = mapper.createObjectNode()
    m.put("version", version); m.put("op", op); m.put("parent", parent)
    val arr = m.putArray("files")
    files.foreach(arr.add)
    val target = manifestPath(table, version)
    f.mkdirs(target.getParent)
    // Lost-CAS detection must not swallow real I/O failures: translate to
    // ConcurrentModificationException only when the target manifest already
    // exists (another writer won); anything else propagates and fails the
    // commit so no checkpoint advances past a version that never landed.
    val out =
      try f.create(target, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new java.util.ConcurrentModificationException(
            s"$table version $version was committed by another writer; re-read and retry")
        case _: java.io.IOException if f.exists(target) =>
          throw new java.util.ConcurrentModificationException(
            s"$table version $version was committed by another writer; re-read and retry")
      }
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(m))
    finally out.close()
  }

  /** Copy-on-write row-level DELETE inside the snapshot protocol: only
    * the data files that actually CONTAIN matching rows are rewritten
    * (predicate-filtered); every untouched file is carried forward into
    * the new manifest by reference. At 100 TB this is the difference
    * between rewriting a table and rewriting the handful of files a
    * targeted delete touches — the Delta/Iceberg CoW shape. The match
    * scan uses the same pinned file list the rewrite does, so a
    * concurrent append can't leak rows past the predicate; the manifest
    * CAS then guarantees one winner. Returns the new version (or the
    * current one when nothing matched — no empty commit).
    */
  def delete(s: SparkSession, table: String, predicate: org.apache.spark.sql.Column): Int = {
    import org.apache.spark.sql.functions.input_file_name
    val f = fs(s, table)
    val v = latestVersion(s, table)
    require(v > 0, s"$table has no committed snapshots")
    val files = readManifest(s, table, v).files
    // normalize scheme/slash variants (file:/ vs file:///) before
    // comparing manifest paths with input_file_name()'s spelling
    def norm(p: String): String = new Path(p).toUri.getPath
    val touched = s.read.parquet(files: _*).filter(predicate)
      .select(input_file_name().as("f")).distinct()
      .collect().map(r => norm(r.getString(0))).toSet // driver-sized: file names
    if (touched.isEmpty) return v
    val (rewrite, carry) = files.partition(p => touched.contains(norm(p)))
    val commitDir = s"$table/data/v${v + 1}-${java.util.UUID.randomUUID().toString.take(8)}"
    // keep-filter must be NULL-safe: a row where the predicate is NULL
    // is NOT matched (SQL semantics), so it must survive the rewrite —
    // plain !predicate would evaluate NULL and silently drop it
    import org.apache.spark.sql.functions.{coalesce, lit, not}
    s.read.parquet(rewrite: _*)
      .filter(not(coalesce(predicate, lit(false)))).write.parquet(commitDir)
    val newFiles = f.listStatus(new Path(commitDir)).map(_.getPath)
      .filter(_.getName.endsWith(".parquet")).map(_.toString).sorted.toSeq
    publishManifest(f, table, v + 1, "delete", v, carry ++ newFiles)
    v + 1
  }

  /** Roll the table back to pinned version `toVersion` — published as a
    * NEW version referencing the OLD version's files (history is
    * preserved; nothing is rewritten or deleted, because data dirs are
    * immutable — the Delta RESTORE shape). Zero data movement at any
    * table size: the restore is one manifest write. The bad versions
    * stay readable for forensics until vacuum retires them. */
  def restore(s: SparkSession, table: String, toVersion: Int): Int = {
    val latest = latestVersion(s, table)
    require(toVersion >= 1 && toVersion <= latest,
      s"restore toVersion=$toVersion must be in [1, latest=$latest] for $table")
    val files = readManifest(s, table, toVersion).files
    publishManifest(fs(s, table), table, latest + 1, "restore", latest, files)
    latest + 1
  }

  /** Multiset row diff between two pinned versions: what `delete`/
    * `commit` actually changed, as data. Rows in v2 not in v1 (with
    * multiplicity) are tagged `added`, the reverse `removed` — the
    * audit primitive for "what did this commit do to corpus@vN".
    * exceptAll is a hash aggregation on the row content, no sort. */
  def diff(s: SparkSession, table: String, v1: Int, v2: Int): DataFrame = {
    import org.apache.spark.sql.functions.lit
    val a = read(s, table, Some(v1))
    val b = read(s, table, Some(v2))
    b.exceptAll(a).withColumn("change", lit("added"))
      .unionByName(a.exceptAll(b).withColumn("change", lit("removed")))
  }

  /** Read a pinned snapshot (default: latest). The returned frame scans
    * exactly the manifest's file list.
    */
  def read(s: SparkSession, table: String, version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(s, table))
    require(v > 0, s"$table has no committed snapshots")
    val files = readManifest(s, table, v).files
    s.read.parquet(files: _*)
  }

  /** Small-files compaction INSIDE the snapshot protocol: rewrite the
    * latest snapshot's content into ~`targetFiles` files and publish it
    * as an overwrite commit. Readers pinned to older versions are
    * untouched (immutable data dirs; the old files stay until vacuum),
    * new readers plan over the compacted layout, and the CAS handle
    * makes compaction safely concurrent with writers — if an append
    * lands first, compact loses the race and retries against the new
    * latest instead of silently dropping that append. Returns the
    * committed version. */
  @annotation.tailrec
  def compact(s: SparkSession, table: String, targetFiles: Int = 1,
              maxRetries: Int = 5): Int = {
    val v = latestVersion(s, table)
    require(v > 0, s"$table has no committed snapshots")
    val attempt =
      try Some(commit(read(s, table, Some(v)).coalesce(targetFiles),
        table, "overwrite", targetVersion = Some(v + 1)))
      catch { case _: java.util.ConcurrentModificationException => None }
    attempt match {
      case Some(committed) => committed
      case None if maxRetries > 0 => compact(s, table, targetFiles, maxRetries - 1)
      case None => throw new IllegalStateException(
        // bounded: each retry re-reads the whole table, so losing the
        // CAS forever to a hot writer must fail loud, not livelock
        s"compact($table) lost the commit race $maxRetries times; " +
          "run it when the writer cadence allows")
    }
  }

  /** Retention grace for vacuum: an unreferenced data file younger than
    * this is presumed to belong to an in-flight commit whose manifest
    * has not been published yet, and is left alone (the Delta-style
    * retention rule). Size it well above the longest plausible gap
    * between a writer's data write and its manifest publish.
    */
  val DefaultVacuumGraceMs: Long = 20L * 60 * 1000

  /** Delete data files referenced by NO manifest >= `keepFrom` (older
    * snapshots become unreadable — their manifests are dropped too).
    * Returns the number of data files removed.
    *
    * Concurrency: commit() writes data files FIRST and publishes the
    * manifest after, so a naive "delete everything unreferenced" races
    * an in-flight committer — vacuum removes its just-written files,
    * then the manifest publishes pointing at deleted data (silent loss).
    * The guard: unreferenced files modified within `graceMs` are kept.
    * Pass graceMs = 0 only when no writer can be in flight.
    */
  def vacuum(s: SparkSession, table: String, keepFrom: Int,
             graceMs: Long = DefaultVacuumGraceMs): Int = {
    val f = fs(s, table)
    val latest = latestVersion(s, table)
    // keepFrom beyond latest would drop every manifest and leave the
    // table unreadable — that is a caller bug, not a retention policy
    require(keepFrom >= 1 && keepFrom <= latest,
      s"vacuum keepFrom=$keepFrom must be in [1, latest=$latest] for $table")
    val keep = (keepFrom to latest)
      .flatMap(v => readManifest(s, table, v).files).toSet
    (1 until keepFrom).foreach(v => f.delete(manifestPath(table, v), false))
    val dataDir = new Path(s"$table/data")
    if (!f.exists(dataDir)) return 0
    val cutoff = System.currentTimeMillis() - graceMs
    val all = f.listStatus(dataDir).flatMap { d =>
      if (d.isDirectory) f.listStatus(d.getPath).toSeq else Seq(d)
    }.filter(_.getPath.getName.endsWith(".parquet"))
    val orphans = all.filterNot(st => keep.contains(st.getPath.toString))
      .filter(_.getModificationTime < cutoff)
    orphans.foreach(st => f.delete(st.getPath, false))
    orphans.length
  }
}
