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

  test("delete rewrites only the files containing matches (CoW file pruning)") {
    import spark.implicits._
    val t = freshTable()
    // range-clustered: 8 files each holding a contiguous id range
    val df = (1L to 800L).toDF("id").withColumn("v", col("id") * 2)
      .repartitionByRange(8, col("id"))
    Snapshots.commit(df, t, "append")
    val before = Snapshots.readManifest(spark, t, 1).files
    val v2 = Snapshots.delete(spark, t, col("id") <= 100)
    assert(v2 == 2)
    val after = Snapshots.readManifest(spark, t, 2).files
    val carried = after.toSet.intersect(before.toSet)
    // only the file(s) holding ids 1..100 were rewritten; the rest of
    // the 8-file layout rides forward by reference
    assert(carried.size >= 6, s"carried ${carried.size} of ${before.size}")
    assert(after.toSet != before.toSet)
    assert(Snapshots.read(spark, t).count() == 700)
    assert(Snapshots.read(spark, t, Some(1)).count() == 800) // history immutable
    assert(Snapshots.read(spark, t).filter(col("id") <= 100).count() == 0)
  }

  test("delete keeps rows where the predicate evaluates NULL (SQL match semantics)") {
    import spark.implicits._
    val t = freshTable()
    val df = Seq((1L, Some("a")), (2L, None: Option[String]), (3L, Some("b")))
      .toDF("id", "tag")
    Snapshots.commit(df, t, "append")
    Snapshots.delete(spark, t, col("tag") === "a")
    val left = Snapshots.read(spark, t).orderBy("id").collect()
    // row 2 has tag NULL → predicate NULL → NOT matched → must survive
    assert(left.map(_.getLong(0)).toSeq == Seq(2L, 3L))
  }

  test("delete with no matches is a no-op commit (version unchanged)") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit((1L to 10L).toDF("id"), t, "append")
    val v = Snapshots.delete(spark, t, col("id") > 999)
    assert(v == 1)
    assert(Snapshots.latestVersion(spark, t) == 1)
  }

  test("restore rolls back by reference: no data movement, history intact") {
    val docs = Tables.documents(spark, sfDir)
    val t = freshTable()
    Snapshots.commit(docs.limit(30), t, "append")
    Snapshots.commit(docs.limit(5), t, "overwrite") // the bad load
    val v3 = Snapshots.restore(spark, t, 1)
    assert(v3 == 3)
    assert(Snapshots.read(spark, t).count() == 30)          // back to good
    assert(Snapshots.read(spark, t, Some(2)).count() == 5)  // forensics intact
    // zero-copy: the restored manifest references v1's files verbatim
    assert(Snapshots.readManifest(spark, t, 3).files ==
      Snapshots.readManifest(spark, t, 1).files)
    assert(Snapshots.readManifest(spark, t, 3).op == "restore")
  }

  test("diff reports the multiset delta between versions") {
    import spark.implicits._
    val t = freshTable()
    Snapshots.commit(Seq((1L, 10.0), (2L, 20.0), (2L, 20.0), (3L, 30.0))
      .toDF("id", "v"), t, "append")
    // v2: drop one duplicate of id 2, reprice id 3, keep id 1
    Snapshots.commit(Seq((1L, 10.0), (2L, 20.0), (3L, 35.0))
      .toDF("id", "v"), t, "overwrite")
    val d = Snapshots.diff(spark, t, 1, 2)
      .collect().map(r => (r.getLong(0), r.getDouble(1), r.getString(2))).toSet
    assert(d == Set((3L, 35.0, "added"), (3L, 30.0, "removed"), (2L, 20.0, "removed")))
  }

  private def freshRoot(): String = {
    val d = java.nio.file.Files.createTempDirectory("graft_cat").toFile
    d.deleteOnExit()
    s"${d.getAbsolutePath}/warehouse"
  }

  test("catalog commit pins every table of a version together") {
    import graft.etl.TxCatalog
    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir)
    val v1 = TxCatalog.commitAll(spark, root, Seq(
      ("corpus", docs.limit(30), "append"),
      ("labels", docs.limit(30).select(col("doc_id"), col("lang")), "append")))
    val v2 = TxCatalog.commitAll(spark, root, Seq(
      ("corpus", docs.limit(10), "overwrite"),
      ("labels", docs.limit(10).select(col("doc_id"), col("lang")), "overwrite")))
    assert((v1, v2) == (1, 2))
    // a reader resolving through catalog v1 sees the PAIRED state even
    // after v2 overwrote both tables
    assert(TxCatalog.read(spark, root, "corpus", Some(1)).count() == 30)
    assert(TxCatalog.read(spark, root, "labels", Some(1)).count() == 30)
    assert(TxCatalog.read(spark, root, "corpus").count() == 10)
    assert(TxCatalog.read(spark, root, "labels").count() == 10)
  }

  test("catalog carries unwritten tables forward; missing table is an error") {
    import graft.etl.TxCatalog
    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir)
    TxCatalog.commitAll(spark, root, Seq(
      ("corpus", docs.limit(20), "append"),
      ("labels", docs.limit(20).select(col("doc_id"), col("lang")), "append")))
    // v2 touches only the corpus — labels must keep its v1 pin
    TxCatalog.commitAll(spark, root, Seq(("corpus", docs.limit(5), "overwrite")))
    assert(TxCatalog.read(spark, root, "corpus").count() == 5)
    assert(TxCatalog.read(spark, root, "labels").count() == 20)
    assert(TxCatalog.readCatalog(spark, root, 2).tables("labels") == 1)
    intercept[IllegalArgumentException] {
      TxCatalog.read(spark, root, "embeddings")
    }
  }

  test("deleteAll erases a user from every table behind one pointer flip") {
    import graft.etl.TxCatalog
    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir).limit(40)
    TxCatalog.commitAll(spark, root, Seq(
      ("corpus", docs, "append"),
      ("labels", docs.select(col("doc_id"), col("lang")), "append")))
    val victim = docs.select(min(col("doc_id"))).head().getLong(0)
    val v2 = TxCatalog.deleteAll(spark, root, Seq("corpus", "labels"),
      _ => col("doc_id") === victim)
    assert(v2 == 2)
    // post-flip: the id is gone from BOTH tables
    Seq("corpus", "labels").foreach { t =>
      assert(TxCatalog.read(spark, root, t).filter(col("doc_id") === victim).count() == 0, t)
      assert(TxCatalog.read(spark, root, t).count() == 39, t)
    }
    // pre-flip catalog v1 still shows the un-erased pair (forensics pin)
    Seq("corpus", "labels").foreach { t =>
      assert(TxCatalog.read(spark, root, t, Some(1)).count() == 40, t)
    }
    // erasing an id that matches nothing re-pins current versions: the
    // catalog advances but no table version churns
    val corpusBefore = Snapshots.latestVersion(spark, s"$root/corpus")
    val v3 = TxCatalog.deleteAll(spark, root, Seq("corpus", "labels"),
      _ => col("doc_id") === -1L)
    assert(v3 == 3)
    assert(Snapshots.latestVersion(spark, s"$root/corpus") == corpusBefore)
    assert(TxCatalog.readCatalog(spark, root, 3).tables("corpus") == corpusBefore)
  }

  test("two catalog writers racing to the same version: exactly one wins") {
    import graft.etl.TxCatalog
    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir)
    TxCatalog.commitAll(spark, root, Seq(("corpus", docs.limit(10), "append")))
    val target = TxCatalog.latestVersion(spark, root) + 1
    TxCatalog.commitAll(spark, root,
      Seq(("corpus", docs.limit(3), "overwrite")), Some(target))
    // the second writer staged table data but must lose the pointer flip
    intercept[java.util.ConcurrentModificationException] {
      TxCatalog.commitAll(spark, root,
        Seq(("corpus", docs.limit(7), "overwrite")), Some(target))
    }
    // catalog still resolves the winner's pin; the loser's staged table
    // version exists but no catalog version references it
    assert(TxCatalog.read(spark, root, "corpus").count() == 3)
    val pinned = TxCatalog.readCatalog(spark, root, target).tables("corpus")
    assert(Snapshots.latestVersion(spark, s"$root/corpus") > pinned,
      "the loser's staged snapshot is orphaned, not referenced")
  }

  test("catalog vacuum reclaims race losers' staged versions, spares in-flight commits") {
    import graft.etl.TxCatalog
    val root = freshRoot()
    val docs = Tables.documents(spark, sfDir)
    TxCatalog.commitAll(spark, root, Seq(("corpus", docs.limit(30), "append")))
    TxCatalog.commitAll(spark, root, Seq(("corpus", docs.limit(10), "overwrite")))
    // a race loser's staged snapshot: committed at table level, never pinned
    val orphanV = Snapshots.commit(docs.limit(7), s"$root/corpus", "overwrite")
    assert(TxCatalog.readCatalog(spark, root, 2).tables("corpus") != orphanV)
    // generous grace: the staged version could still be an in-flight
    // two-phase commit, so nothing may be reclaimed yet
    assert(TxCatalog.vacuum(spark, root, keepFromCatalog = 1,
      graceMs = 60 * 60 * 1000L) == 0)
    assert(Snapshots.read(spark, s"$root/corpus", Some(orphanV)).count() == 7)
    // zero grace: the orphan manifest and its unreferenced files go
    val removed = TxCatalog.vacuum(spark, root, keepFromCatalog = 1, graceMs = 0L)
    assert(removed > 0, "expected the orphaned staged version to be reclaimed")
    intercept[Exception] { Snapshots.read(spark, s"$root/corpus", Some(orphanV)).count() }
    // every catalog-pinned read still resolves after the vacuum
    assert(TxCatalog.read(spark, root, "corpus", Some(1)).count() == 30)
    assert(TxCatalog.read(spark, root, "corpus", Some(2)).count() == 10)
    // catalog-level retention: dropping catalog v1 prunes its pins too
    val removed2 = TxCatalog.vacuum(spark, root, keepFromCatalog = 2, graceMs = 0L)
    assert(removed2 > 0)
    assert(TxCatalog.read(spark, root, "corpus").count() == 10)
    intercept[Exception] { TxCatalog.readCatalog(spark, root, 1) }
  }
}
