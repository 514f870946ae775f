package graft

import org.apache.spark.sql.functions._
import graft.functions.NfcNormalize

/** NfcNormalize expression semantics + the blocked edit-distance
  * near-dup operator. The DuckDB oracle covers cross-engine value
  * equality (text_nfc / dedup_editdist); here the expression contract
  * is pinned: composition, idempotence, the ASCII fast path, null
  * propagation, and codegen/interpreted agreement.
  */
class UnicodeNormSpec extends SparkSpec {
  import spark.implicits._

  test("nfc composes combining sequences and is idempotent") {
    val df = Seq(
      "café",        // e + combining acute -> é
      "café",         // already precomposed
      "Ångström", // ring + diaeresis
      "plain ascii").toDF("s")
      .select(col("s"), NfcNormalize.nfc(col("s")).as("n"))
      .select(col("n"), NfcNormalize.nfc(col("n")).as("nn"),
        length(col("s")).as("ls"), length(col("n")).as("ln"))
      .collect()
    assert(df(0).getString(0) == "café")
    assert(df(1).getString(0) == "café")
    assert(df(2).getString(0) == "Ångström")
    assert(df(3).getString(0) == "plain ascii")
    // idempotent: NFC(NFC(x)) == NFC(x)
    df.foreach(r => assert(r.getString(0) == r.getString(1)))
    // composition shrinks the two decomposed inputs, keeps the others
    assert(df(0).getInt(2) == df(0).getInt(3) + 1)
    assert(df(2).getInt(2) == df(2).getInt(3) + 2)
  }

  test("nfc null propagation and codegen/interpreted agreement") {
    val df = Seq(Some("éx"), None, Some("abc")).toDF("s")
    val gen = df.select(NfcNormalize.nfc(col("s")).as("n")).collect()
    assert(gen(0).getString(0) == "éx" && gen(1).isNullAt(0)
      && gen(2).getString(0) == "abc")
    // interpreted path (no codegen): eval directly
    import org.apache.spark.unsafe.types.UTF8String
    assert(NfcNormalize.compute(UTF8String.fromString("éx")).toString == "éx")
    val ascii = UTF8String.fromString("abc")
    assert(NfcNormalize.compute(ascii) eq ascii) // fast path: same object back
  }

  test("nfc_normalize is registered as a SQL function via GraftExtensions") {
    // TestSession builds through Engine.session, which loads the
    // extensions — the SQL surface must see the same native expression
    val out = spark.sql("SELECT nfc_normalize('café') AS n")
      .head().getString(0)
    assert(out == "café")
  }

  test("text_nfc digest equals md5 of the composed bytes") {
    val r = SparkEntry.queries("text_nfc")(spark, sfDir).limit(5).collect()
    r.foreach { row =>
      // every injected 'e'+U+0301 composed: dec length - nfc length =
      // number of combining marks added = number of 'e's in the source
      assert(row.getAs[Int]("n_chars_dec") > row.getAs[Int]("n_chars_nfc"))
      assert(row.getAs[String]("nfc_digest").matches("[0-9a-f]{32}"))
    }
  }

  test("dedup_editdist finds planted near-identical docs, skips distinct ones") {
    val tmp = java.nio.file.Files.createTempDirectory("editdist_toy").toString
    val base = "the quick brown fox jumps over the lazy dog " * 4
    Seq(
      (1L, base),
      (2L, base.replaceFirst("jumps", "jumped")),     // dist ~3 within head
      (3L, "a completely different document body with other words " * 3),
      (4L, base.replaceFirst("the", "xxe")))          // differs in block 1, caught by block 2
      .toDF("doc_id", "text")
      .write.parquet(s"$tmp/documents.parquet")
    val pairs = SparkEntry.queries("dedup_editdist")(spark, tmp)
      .collect().map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"))).toSet
    assert(pairs.contains((1L, 2L)))
    assert(pairs.contains((1L, 4L))) // second blocking key rescues a changed head
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }
}
