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
    val removed = Snapshots.vacuum(spark, t, keepFrom = 2)
    assert(removed > 0)
    assert(Snapshots.read(spark, t, Some(2)).count() == 10)
    assert(Snapshots.read(spark, t, Some(3)).count() == 20)
    intercept[Exception] { Snapshots.read(spark, t, Some(1)).count() }
  }
}
