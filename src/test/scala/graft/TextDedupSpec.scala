package graft

import org.apache.spark.sql.functions._
import graft.text.TextFunctions
import graft.dedup.Dedup

class TextDedupSpec extends SparkSpec {
  import spark.implicits._

  test("contamination guard: sub-shingle docs produce no grams, no crash") {
    // mirrors SparkEntry.textContaminate's CASE guard — sequence(1, n)
    // with n < 1 would otherwise generate a DESCENDING range
    val df = Seq((1L, "a b c"), (2L, "a b c d e f g h")).toDF("doc_id", "text")
    val grams = df
      .select(col("doc_id"), graft.text.TextFunctions.words(col("text")).as("ws"))
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(ws) >= 5
          |THEN transform(sequence(1, size(ws) - 4), i -> array_join(slice(ws, i, 5), ' '))
          |ELSE array() END""".stripMargin)).as("gram"))
      .collect()
    assert(grams.forall(_.getLong(0) == 2L), "3-word doc must yield zero grams")
    assert(grams.length == 4, "8 words -> 4 five-grams")
  }

  test("incrementalJaccardPairs equals the cross-slice of the symmetric op") {
    val docs = Tables.documents(spark, sfDir)
    val inc = Dedup.incrementalJaccardPairs(
        docs.filter($"doc_id" >= 400), docs.filter($"doc_id" < 400), "text", "doc_id")
      .select("doc_new", "doc_old").as[(Long, Long)].collect().toSet
    // the symmetric op emits doc_a < doc_b, so a cross pair is (old, new)
    val symPairs: Set[(Long, Long)] = Dedup.ngramJaccardPairs(docs, "text", "doc_id")
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val expected = symPairs.collect { case (a, b) if a < 400 && b >= 400 => (b, a) }
    assert(inc == expected, s"incremental $inc != symmetric cross-slice $expected")
    Dedup.releaseCaches()
  }

  test("redactPii masks emails, phones, IPs and leaves lookalikes alone") {
    val cases = Seq(
      ("contact bob.smith+x@corp.example.org today", "contact <EMAIL> today"),
      ("call 555-123-4567 or (555) 123-4567 now", "call <PHONE> or <PHONE> now"),
      ("intl +1 555-123-4567 ok", "intl <PHONE> ok"),
      ("host 192.168.001.1 down", "host <IP> down"),
      // precision over recall: versions, years, plain number pairs survive
      ("v1.2.3 released 2024 batch 100 200", "v1.2.3 released 2024 batch 100 200"),
      ("id 1234567890123 is not a phone", "id 1234567890123 is not a phone"))
    val out = cases.map(_._1).toDF("t")
      .select(TextFunctions.redactPii(col("t"))).as[String].collect()
    out.zip(cases.map(_._2)).foreach { case (got, want) =>
      assert(got == want, s"got '$got', want '$want'")
    }
  }

  test("langId picks the language with most markers; und when none") {
    val df = Seq(
      "the cat is on a mat and the dog",
      "el perro y la casa de los gatos es",
      "der hund und die katze ist das tier",
      "le chat et la maison les arbres est",
      "xyzzy plugh quux").toDF("text")
      .withColumn("lang", TextFunctions.langId(col("text")))
    assert(df.select("lang").as[String].collect().toSeq ==
      Seq("en", "es", "de", "fr", "und"))
  }

  test("token counts: whitespace vs BPE-ish estimate") {
    val df = Seq("hello world foo").toDF("text")
    assert(df.select(TextFunctions.tokenCount(col("text"))).as[Int].head() == 3)
    assert(df.select(TextFunctions.bpeTokenEstimate(col("text"))).as[Int].head() == 3)
  }

  test("shingles: distinct word 3-grams in order windows") {
    val got = Seq("a b c d c d").toDF("t")
      .select(TextFunctions.shingles(col("t"), 3)).as[Seq[String]].head()
    assert(got.toSet == Set("a b c", "b c d", "c d c", "d c d"))
  }

  test("simhash64 and dot_product are registered as SQL functions") {
    val h = spark.sql("SELECT simhash64(array(1L, 3L)) AS h").as[Long].head()
    assert(h == 1L) // bit0: two votes set; bit1: one of two -> tie broken to 0
    val d = spark.sql("SELECT dot_product(array(1.0d, 2.0d), array(3.0d, 4.0d)) AS d")
      .as[Double].head()
    assert(d == 11.0)
  }

  test("exact dedup keeps min id per content hash") {
    val df = Seq((10L, "same text"), (3L, "same text"), (7L, "other")).toDF("doc_id", "text")
    val got = Dedup.exact(df, "text", "doc_id")
      .select("keeper_id", "n_copies").as[(Long, Long)].collect().toSet
    assert(got == Set((3L, 2L), (7L, 1L)))
  }

  test("simhash: identical texts collide, disjoint texts differ") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here instead now")).toDF("doc_id", "text")
    val hs = Dedup.simhash(df, "text", "doc_id").orderBy("doc_id")
      .select("simhash").as[Long].collect()
    assert(hs(0) == hs(1))
    assert(java.lang.Long.bitCount(hs(0) ^ hs(2)) > 3)
  }

  test("poly_word_hash62 matches the SQL-replay reference values") {
    // Pinned against an independent DuckDB evaluation of the oracle
    // fold (list_reduce over ord(split(w,'')) + temper) so the
    // cross-engine contract can't drift silently. 'ö' exercises the
    // code-point (not UTF-16 char) iteration; '' the empty fold.
    val df = Seq("hello", "world", "", "a", "ö", "x y").toDF("w")
      .select(graft.functions.PolyWordHash62.poly_word_hash62(col("w")).as("h"))
    val got = df.as[Long].collect().toSeq
    assert(got == Seq(4415785332527423899L, 3240425394917569701L, 0L,
      163838229808743273L, 415508034017953606L, 3398169738402336674L))
    // all hashes fit in bits 0..61 (SimHash top-bit caveat)
    got.foreach(h => assert(h >= 0 && (h >> 62) == 0))
  }

  test("BpeTokens: merges chain in rule order, double-pass closes adjacency skips") {
    import graft.functions.BpeTokens
    // t+h then th+e: 'the' collapses to one token
    assert(BpeTokens.tokenize("the") == Seq("the"))
    // chained adjacency: 'ananan' — a+n fires on every pair (the
    // double-pass guarantee), then an+d is a no-op without 'd'
    assert(BpeTokens.tokenize("ananan") == Seq("an", "an", "an"))
    assert(BpeTokens.tokenize("and") == Seq("and"))
    // unknown chars stay single units
    assert(BpeTokens.tokenize("xyz") == Seq("x", "y", "z"))
    assert(BpeTokens.tokenize("") == Seq.empty)
    // whole-document count: words sum, doubled spaces contribute nothing
    val df = Seq((1L, "the and  xyz"), (2L, ""), (3L, "that")).toDF("doc_id", "text")
    val got = df.select(col("doc_id"),
        BpeTokens.bpe_token_count(col("text")).as("n")).as[(Long, Long)]
      .collect().toMap
    assert(got == Map(1L -> 5L, 2L -> 0L, 3L -> 1L)) // the(1)+and(1)+x,y,z(3); that = th+at merged by rule 32
  }

  test("simhashPairs with fastPortableWordHash finds the duplicate pair only") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here instead now")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "text", "doc_id", maxHamming = 3,
        wordHash = Dedup.fastPortableWordHash)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("simhashPairs finds the duplicate pair only") {
    val df = Seq((1L, "alpha beta gamma delta"), (2L, "alpha beta gamma delta"),
      (3L, "totally different words here instead now")).toDF("doc_id", "text")
    val pairs = Dedup.simhashPairs(df, "text", "doc_id", maxHamming = 3)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  test("minhash signature similarity approximates jaccard") {
    // two near-identical docs (one word changed) vs an unrelated doc
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 40) "CHANGED" else s"w$i").mkString(" ")
    val far = (100 to 140).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val sets = Dedup.shingleSets(df, "text", "doc_id")
      .withColumn("sig", Dedup.minhashSignature(col("shingles")))
    val sigs = sets.orderBy("doc_id").select("sig").as[Seq[Long]].collect()
    def simEst(a: Seq[Long], b: Seq[Long]) =
      a.zip(b).count { case (x, y) => x == y } / 64.0
    assert(simEst(sigs(0), sigs(1)) > 0.7)   // true jaccard = 35/41 ≈ 0.85
    assert(simEst(sigs(0), sigs(2)) < 0.2)   // true jaccard = 0
  }

  test("minhashLshPairs recovers high-jaccard pairs with no false positives") {
    val base = (1 to 40).map(i => s"w$i").mkString(" ")
    val near = (1 to 40).map(i => if (i == 40) "CHANGED" else s"w$i").mkString(" ")
    val far = (100 to 140).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far)).toDF("doc_id", "text")
    val got = Dedup.minhashLshPairs(df, "text", "doc_id", tau = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 2L)))
  }

  test("ngramJaccardPairs computes exact jaccard") {
    val df = Seq((1L, "a b c d e"), (2L, "a b c d f"), (3L, "x y z q r")).toDF("doc_id", "text")
    // shingles(1)={abc,bcd,cde}, shingles(2)={abc,bcd,cdf}; jaccard = 2/4
    val got = Dedup.ngramJaccardPairs(df, "text", "doc_id", tau = 0.4)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 0.5)))
  }

  test("prefix-filtered jaccard pairs equal a driver-side brute force") {
    // the independent exactness witness: ngramJaccardPairs now routes
    // through the PPJoin prefix filter at every tau, so the check is
    // against sets recomputed outside the candidate machinery entirely
    val docs = Tables.documents(spark, sfDir)
    val sets = Dedup.shingleSets(docs, "text", "doc_id")
      .as[(Long, Seq[String])].collect().map { case (k, v) => k -> v.toSet }
    for (tau <- Seq(0.05, 0.2, 0.5)) {
      val want = (for {
        (a, sa) <- sets; (b, sb) <- sets if a < b
        o = (sa & sb).size
        if o.toDouble / (sa.size + sb.size - o) >= tau
      } yield (a, b)).toSet
      val got = Dedup.ngramJaccardPairs(docs, "text", "doc_id", tau = tau)
        .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
      assert(got == want, s"tau=$tau: prefix filtering changed the pair set")
    }
    Dedup.releaseCaches()
  }

  test("a corpus-wide hot shingle never enters the candidate join") {
    // every doc shares ONE boilerplate shingle ("lorem ipsum dolor",
    // fenced by per-doc-unique words so exactly one window is shared);
    // the naive posting self-join would fan out n·(n−1)/2 rows on it.
    // With 31 distinct shingles/doc and tau=0.05 the prefix drops
    // ceil(0.05·31)−1 = 1 token per doc — by document frequency that
    // is exactly the hot one, so its prefix-posting count must be ZERO.
    val n = 500
    val docs = (1 to n).map { i =>
      val u = (1 to 30).map(w => s"u${i}w$w")
      (i.toLong,
        (u.take(15) :+ "lorem ipsum dolor").mkString(" ") + " " + u.drop(15).mkString(" "))
    }.toDF("doc_id", "text")
    val hot = spark.range(1).select(xxhash64(lit("lorem ipsum dolor"))).as[Long].head()
    val pp = Dedup.prefixPostingsForSpec(docs, "text", "doc_id", k = 3, tau = 0.05)
      .groupBy($"sh").count().as[(Long, Long)].collect().toMap
    assert(!pp.contains(hot), s"hot shingle posted ${pp.getOrElse(hot, 0L)} times into the prefix join")
    assert(pp.values.forall(_ == 1L), "every surviving posting must be doc-unique")
    // and the full operator stays exact: all true jaccards are
    // 1/(31+31-1) ≈ 0.016 < tau, so the verified pair set is empty
    assert(Dedup.ngramJaccardPairs(docs, "text", "doc_id", tau = 0.05).isEmpty)
    Dedup.releaseCaches()
  }

  test("containmentPairs flags a quoted-whole short doc that jaccard misses") {
    // doc 1 is contained verbatim in doc 2 (C(1→2)=1) while jaccard is
    // diluted by doc 2's extra length — the asymmetric case
    val df = Seq(
      (1L, "a b c d e"),                              // 3 shingles
      (2L, "a b c d e f g h i j k l m n o p q r s"),  // 17 shingles, superset
      (3L, "x y z q r")).toDF("doc_id", "text")
    val got = Dedup.containmentPairs(df, "text", "doc_id", tau = 0.9)
      .as[(Long, Long, Double)].collect().toSet
    assert(got == Set((1L, 2L, 1.0)), s"got $got")
    val j = Dedup.ngramJaccardPairs(df, "text", "doc_id", tau = 0.9)
      .collect()
    assert(j.isEmpty, "jaccard at the same tau must miss the quoted doc")
  }

  test("containmentPairs is exact against a driver-side recompute") {
    val docs = Tables.documents(spark, sfDir)
    val got = Dedup.containmentPairs(docs, "text", "doc_id", tau = 0.5)
      .as[(Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val ids = got.flatMap(p => Seq(p._1, p._2)).distinct.toSeq
    val sets = Dedup.shingleSets(docs.filter(col("doc_id").isin(ids: _*)), "text", "doc_id")
      .as[(Long, Seq[String])].collect().toMap.map { case (k, v) => k -> v.toSet }
    got.foreach { case (src, dst, c) =>
      val want = (sets(src) & sets(dst)).size.toDouble / sets(src).size
      assert(c == want, s"($src→$dst): $c vs $want")
      assert(c >= 0.5)
    }
    Dedup.releaseCaches()
  }

  test("packBins: greedy fill respects the budget bound per (shard, bin)") {
    val docs = Tables.documents(spark, sfDir)
      .select(col("doc_id"),
        graft.text.TextFunctions.bpeTokenEstimate(col("text")).cast("long").as("n_tokens"))
    val packed = graft.text.Packing.packBins(docs, "doc_id", "n_tokens",
      budget = 512L, shards = 4)
    // a greedy sequential packer never exceeds budget + the straddling doc
    val viol = packed.groupBy("shard", "bin")
      .agg(sum("n_tokens").as("fill"), max("n_tokens").as("mx"))
      .filter(col("fill") > lit(512L) + col("mx"))
      .count()
    assert(viol == 0)
    // deterministic: same input → same assignment
    val a = packed.select("doc_id", "shard", "bin").collect().toSet
    val b = graft.text.Packing.packBins(docs, "doc_id", "n_tokens", 512L, 4)
      .select("doc_id", "shard", "bin").collect().toSet
    assert(a == b)
    // every doc present exactly once
    assert(packed.count() == docs.count())
  }
}
