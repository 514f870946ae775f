package graft

import org.apache.spark.sql.functions._
import graft.etl.Snapshots

/** Snapshot versioning: pinned reads are immutable across later
  * commits, the manifest create is the commit point (one winner per
  * version), and vacuum reclaims only unreferenced files.
  */
class SnapshotsSpec extends SparkSpec {

  private def freshTable(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_snap").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/corpus"
  }

  test("append and overwrite produce pinned, immutable versions") {
    val t = freshTable()
    val docs = Tables.documents(spark, sfDir)
    val v1 = Snapshots.commit(docs.limit(30), t, "append")
    val v2 = Snapshots.commit(docs.limit(20), t, "append")
    val v3 = Snapshots.commit(docs.limit(5), t, "overwrite")
    assert((v1, v2, v3) == (1, 2, 3))
    assert(Snapshots.read(spark, t, Some(1)).count() == 30)
    assert(Snapshots.read(spark, t, Some(2)).count() == 50)
    assert(Snapshots.read(spark, t, Some(3)).count() == 5)
    assert(Snapshots.read(spark, t).count() == 5) // latest
    // a reader pinned BEFORE the overwrite still sees the old corpus
    val pinned = Snapshots.read(spark, t, Some(2))
    Snapshots.commit(docs.limit(1), t, "overwrite")
    assert(pinned.count() == 50)
  }

  test("two writers racing to the same version: exactly one wins") {
    val t = freshTable()
    val docs = Tables.documents(spark, sfDir).limit(10)
    Snapshots.commit(docs, t)
    // the race: both writers read latest = 1 and target v2; writer A
    // publishes first, writer B (committing with its stale CAS handle)
    // must get the conflict, not silent corruption
    val m = new java.io.File(s"$t/_manifests/v00002.json")
    java.nio.file.Files.write(m.toPath,
      """{"version":2,"op":"append","parent":1,"files":[]}""".getBytes)
    intercept[java.util.ConcurrentModificationException] {
      Snapshots.commit(docs, t, "append", targetVersion = Some(2))
    }
    // the loser's data files are orphaned, not referenced
    assert(Snapshots.readManifest(spark, t, 2).files.isEmpty)
  }

  test("vacuum reclaims only files no kept manifest references") {
    val t = freshTable()
    val docs = Tables.documents(spark, sfDir)
    Snapshots.commit(docs.limit(10), t, "append")
    Snapshots.commit(docs.limit(10), t, "overwrite") // v1 files now orphanable
    Snapshots.commit(docs.limit(10), t, "append")
    // graceMs = 0: the test IS the single writer, nothing is in flight
    val removed = Snapshots.vacuum(spark, t, keepFrom = 2, graceMs = 0)
    assert(removed > 0)
    assert(Snapshots.read(spark, t, Some(2)).count() == 10)
    assert(Snapshots.read(spark, t, Some(3)).count() == 20)
    intercept[Exception] { Snapshots.read(spark, t, Some(1)).count() }
  }

  test("compact rewrites the latest snapshot without changing its content") {
    val t = freshTable()
    val docs = Tables.documents(spark, sfDir)
    Snapshots.commit(docs.limit(30).repartition(6), t, "append")
    Snapshots.commit(docs.limit(20).repartition(6), t, "append")
    val before = Snapshots.read(spark, t).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    val manyFiles = Snapshots.readManifest(spark, t, 2).files.size
    assert(manyFiles > 2, s"expected a fragmented layout, got $manyFiles files")
    val v = Snapshots.compact(spark, t, targetFiles = 1)
    assert(v == 3)
    assert(Snapshots.readManifest(spark, t, v).files.size == 1)
    val after = Snapshots.read(spark, t).select("doc_id")
      .collect().map(_.getLong(0)).sorted.toSeq
    assert(after == before)
    // pinned pre-compaction readers still see their immutable version
    assert(Snapshots.read(spark, t, Some(2)).count() == 50)
    // and vacuum (no writers in flight) reclaims the fragmented files
    val removed = Snapshots.vacuum(spark, t, keepFrom = v, graceMs = 0)
    assert(removed == manyFiles)
    assert(Snapshots.read(spark, t).count() == 50)
  }

  test("vacuum refuses a keepFrom beyond latest (would orphan the table)") {
    val t = freshTable()
    Snapshots.commit(Tables.documents(spark, sfDir).limit(5), t, "append")
    intercept[IllegalArgumentException] {
      Snapshots.vacuum(spark, t, keepFrom = 99, graceMs = 0)
    }
    assert(Snapshots.read(spark, t).count() == 5)
  }

  test("vacuum grace window spares an in-flight commit's data files") {
    val t = freshTable()
    val docs = Tables.documents(spark, sfDir)
    Snapshots.commit(docs.limit(10), t, "append")
    Snapshots.commit(docs.limit(10), t, "overwrite") // v1 orphanable
    // in-flight writer: data files written, manifest NOT yet published
    val inflight = s"$t/data/v3-inflight"
    docs.limit(7).write.parquet(inflight)
    // age the genuinely-dead v1 files past the grace cutoff so the
    // default-grace vacuum still reclaims them — but not the fresh
    // in-flight files
    val f = new org.apache.hadoop.fs.Path(t)
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val old = System.currentTimeMillis() - 24L * 3600 * 1000
    val v1Files = Snapshots.readManifest(spark, t, 1).files
    v1Files.foreach(p => f.setTimes(new org.apache.hadoop.fs.Path(p), old, old))
    val removed = Snapshots.vacuum(spark, t, keepFrom = 2)
    assert(removed == v1Files.size)
    // the committer now publishes its manifest — the snapshot it
    // promises must be fully readable (this is the data-loss race)
    val files = f.listStatus(new org.apache.hadoop.fs.Path(inflight))
      .map(_.getPath.toString).filter(_.endsWith(".parquet")).sorted
    assert(files.nonEmpty)
    val m = new java.io.File(s"$t/_manifests/v00003.json")
    val fileList = files.map("\"" + _ + "\"").mkString(",")
    java.nio.file.Files.write(m.toPath,
      s"""{"version":3,"op":"overwrite","parent":2,"files":[$fileList]}""".getBytes)
    assert(Snapshots.read(spark, t).count() == 7)
    assert(Snapshots.read(spark, t, Some(3)).count() == 7)
  }
}
