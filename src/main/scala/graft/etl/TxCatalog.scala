package graft.etl

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.{DataFrame, SparkSession}
import com.fasterxml.jackson.databind.ObjectMapper
import scala.jdk.CollectionConverters._

/** Multi-table atomic commits over [[Snapshots]] tables — the
  * cross-table consistency a training pipeline needs: "this run
  * trained on corpus@v12 WITH labels@v5", flipped as one unit.
  *
  * Layout:
  * {{{
  *   <root>/<table>/...                    ordinary Snapshots tables
  *   <root>/_catalog/v<00000version>.json  (table → snapshot version) pins
  * }}}
  *
  * The protocol stages each table's data + per-table manifest FIRST
  * (plain [[Snapshots.commit]]), then CAS-publishes the catalog
  * manifest with `FileSystem.create(overwrite = false)` — the same
  * one-winner commit point Snapshots uses. The catalog pointer flip is
  * the atomicity boundary: a reader that resolves table pins through
  * [[read]] either sees ALL of a commit's tables or none of them. A
  * loser's staged per-table versions stay on disk but are referenced
  * by no catalog version — dead data until vacuumed, exactly the
  * two-phase shape real table formats use for multi-table
  * transactions (data is invisible until the pointer flips; direct
  * per-table readers bypass the boundary and are documented as such).
  *
  * At 100 TB the catalog manifest is a handful of (name, int) pairs —
  * driver-sized regardless of table size — and resolution costs one
  * small JSON read before the per-table manifest reads.
  */
object TxCatalog {

  final case class CatalogManifest(version: Int, parent: Int, tables: Map[String, Int])

  private val mapper = new ObjectMapper()

  private def fs(s: SparkSession, p: String): FileSystem =
    new Path(p).getFileSystem(s.sparkContext.hadoopConfiguration)

  private def catalogPath(root: String, v: Int): Path =
    new Path(s"$root/_catalog/v${"%05d".format(v)}.json")

  def latestVersion(s: SparkSession, root: String): Int = {
    val dir = new Path(s"$root/_catalog")
    val f = fs(s, root)
    if (!f.exists(dir)) 0
    else f.listStatus(dir).map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .foldLeft(0)(math.max)
  }

  def readCatalog(s: SparkSession, root: String, version: Int): CatalogManifest = {
    val in = fs(s, root).open(catalogPath(root, version))
    val node = try mapper.readTree(in) finally in.close()
    val tables = node.get("tables").fields().asScala
      .map(e => e.getKey -> e.getValue.asInt).toMap
    CatalogManifest(node.get("version").asInt, node.get("parent").asInt, tables)
  }

  /** Atomically commit a set of table writes as one catalog version.
    * Tables absent from `writes` carry their parent-catalog pin
    * forward unchanged. Pass `targetVersion` as the CAS handle after
    * reading the latest (same contract as [[Snapshots.commit]]); on a
    * race, exactly one writer's catalog version lands and the loser
    * gets a ConcurrentModificationException — its staged table
    * versions are never referenced. Returns the catalog version. */
  def commitAll(s: SparkSession, root: String,
                writes: Seq[(String, DataFrame, String)],
                targetVersion: Option[Int] = None): Int = {
    require(writes.nonEmpty, "a catalog commit needs at least one table write")
    val staged = writes.map { case (t, df, op) =>
      t -> Snapshots.commit(df, s"$root/$t", op)
    }.toMap
    commitPins(s, root, staged, targetVersion)
  }

  /** Pointer-flip-only commit: publish a catalog version pinning
    * already-staged table versions (the second phase of the protocol,
    * exposed for writers — e.g. a streaming sink — that stage table
    * commits with their own CAS handles). Pins must reference
    * existing per-table snapshot versions. */
  def commitPins(s: SparkSession, root: String, pins: Map[String, Int],
                 targetVersion: Option[Int] = None): Int = {
    require(pins.nonEmpty, "a catalog commit needs at least one pin")
    val version = targetVersion.getOrElse(latestVersion(s, root) + 1)
    val parent = version - 1
    val carried = if (parent > 0) readCatalog(s, root, parent).tables else Map.empty[String, Int]
    publish(fs(s, root), root, version, parent, carried ++ pins)
    version
  }

  /** Atomic cross-table row erasure — the right-to-be-forgotten shape:
    * run a copy-on-write [[Snapshots.delete]] on EVERY listed table
    * (only files containing matches rewrite; see delete's contract),
    * then flip one catalog pointer pinning all the post-delete
    * versions together. Readers resolving through the catalog never
    * see a half-erased state: before the flip every pin is pre-delete,
    * after it every pin is post-delete. Tables where nothing matched
    * re-pin their current version (delete no-ops). Returns the new
    * catalog version. */
  def deleteAll(s: SparkSession, root: String, tables: Seq[String],
                predicate: String => org.apache.spark.sql.Column,
                targetVersion: Option[Int] = None): Int = {
    require(tables.nonEmpty, "erasure needs at least one table")
    val pins = tables.map { t =>
      t -> Snapshots.delete(s, s"$root/$t", predicate(t))
    }.toMap
    commitPins(s, root, pins, targetVersion)
  }

  /** Read `table` at the pin recorded by catalog `version` (latest
    * catalog when absent) — the consistency boundary: every table read
    * through one catalog version belongs to the same atomic commit. */
  def read(s: SparkSession, root: String, table: String,
           version: Option[Int] = None): DataFrame = {
    val v = version.getOrElse(latestVersion(s, root))
    val pins = readCatalog(s, root, v).tables
    val pin = pins.getOrElse(table,
      throw new IllegalArgumentException(
        s"catalog v$v of $root pins no table '$table' (has: ${pins.keys.toSeq.sorted.mkString(", ")})"))
    Snapshots.read(s, s"$root/$table", Some(pin))
  }

  /** Reclaim race losers' staged table versions — the two-phase
    * protocol's garbage. A commitAll loser stages per-table snapshot
    * versions that no catalog version ever references; they are
    * invisible (correct) but accumulate forever (leak). Keeps every
    * per-table version pinned by a retained catalog (≥
    * `keepFromCatalog`) plus any version younger than `graceMs` — an
    * in-flight two-phase commit that staged its tables but has not
    * flipped the catalog pointer yet must survive, exactly the
    * [[Snapshots.vacuum]] grace contract. Catalog manifests below
    * `keepFromCatalog` are pruned too (catalog-level retention: table
    * history not reachable from a retained catalog is gone). Returns
    * the number of deleted manifests + data files. */
  def vacuum(s: SparkSession, root: String, keepFromCatalog: Int,
             graceMs: Long = Snapshots.DefaultVacuumGraceMs): Int = {
    val f = fs(s, root)
    val latestCat = latestVersion(s, root)
    require(keepFromCatalog >= 1 && keepFromCatalog <= latestCat,
      s"vacuum keepFromCatalog=$keepFromCatalog must be in [1, latest=$latestCat] for $root")
    val cutoff = System.currentTimeMillis() - graceMs
    val referenced: Map[String, Set[Int]] =
      (keepFromCatalog to latestCat).flatMap(v => readCatalog(s, root, v).tables.toSeq)
        .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    (1 until keepFromCatalog).foreach(v => f.delete(catalogPath(root, v), false))
    var removed = 0
    val tables = f.listStatus(new Path(root)).filter(_.isDirectory)
      .map(_.getPath.getName).filterNot(_ == "_catalog")
    for (t <- tables) {
      val tPath = s"$root/$t"
      val mDir = new Path(s"$tPath/_manifests")
      if (f.exists(mDir)) {
        val manifests = f.listStatus(mDir).filter { st =>
          val n = st.getPath.getName
          n.startsWith("v") && n.endsWith(".json")
        }
        def vOf(n: String): Int = n.stripPrefix("v").stripSuffix(".json").toInt
        // keep: catalog-pinned, or young enough to be an in-flight commit
        val keepV = manifests.filter { st =>
          referenced.getOrElse(t, Set.empty).contains(vOf(st.getPath.getName)) ||
            st.getModificationTime >= cutoff
        }.map(st => vOf(st.getPath.getName)).toSet
        val keepFiles = keepV.flatMap(v => Snapshots.readManifest(s, tPath, v).files)
        manifests.filterNot(st => keepV.contains(vOf(st.getPath.getName))).foreach { st =>
          f.delete(st.getPath, false); removed += 1
        }
        val dataDir = new Path(s"$tPath/data")
        if (f.exists(dataDir)) {
          val all = f.listStatus(dataDir).flatMap { d =>
            if (d.isDirectory) f.listStatus(d.getPath).toSeq else Seq(d)
          }.filter(_.getPath.getName.endsWith(".parquet"))
          val orphans = all.filterNot(st => keepFiles.contains(st.getPath.toString))
            .filter(_.getModificationTime < cutoff)
          orphans.foreach { st => f.delete(st.getPath, false); removed += 1 }
        }
      }
    }
    removed
  }

  private def publish(f: FileSystem, root: String, version: Int,
                      parent: Int, tables: Map[String, Int]): Unit = {
    val m = mapper.createObjectNode()
    m.put("version", version); m.put("parent", parent)
    val tn = m.putObject("tables")
    tables.toSeq.sortBy(_._1).foreach { case (t, v) => tn.put(t, v) }
    val target = catalogPath(root, version)
    f.mkdirs(target.getParent)
    // Only a genuinely lost CAS (the target already exists) becomes
    // ConcurrentModificationException; any other I/O failure (disk full,
    // permissions, transient FS error) must propagate so a caller that
    // treats CME as "replayed batch" cannot advance past a commit that
    // never landed.
    val out =
      try f.create(target, false)
      catch {
        case _: org.apache.hadoop.fs.FileAlreadyExistsException =>
          throw new java.util.ConcurrentModificationException(
            s"catalog $root version $version was committed by another writer; re-read and retry")
        case _: java.io.IOException if f.exists(target) =>
          throw new java.util.ConcurrentModificationException(
            s"catalog $root version $version was committed by another writer; re-read and retry")
      }
    try out.write(mapper.writerWithDefaultPrettyPrinter().writeValueAsBytes(m))
    finally out.close()
  }
}
