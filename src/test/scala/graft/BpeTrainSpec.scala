package graft

import graft.functions.BpeTokens
import graft.text.BpeTrain

/** BPE training on planted corpora: the merge sequence is hand-derivable
  * (exact pair counts + the count-DESC/lexicographic tie-break), so the
  * spec checks the learned table itself, then that APPLYING the learned
  * merges reproduces the fixed-table token counts where the plant makes
  * the two tables agree. */
class BpeTrainSpec extends SparkSpec {
  import spark.implicits._

  test("trainMerges recovers the hand-derived merge sequence and stops when exhausted") {
    // corpus: the×3 and×2 in×1.
    // step 1: (t,h)=3 ties (h,e)=3 → 'h' < 't' picks (h,e)
    // step 2: (t,he)=3
    // step 3: (a,n)=2 ties (n,d)=2 → 'a' < 'n' picks (a,n)
    // step 4: (an,d)=2; step 5: (i,n)=1; then no pairs remain
    val docs = Seq("the and the in", "the and").toDF("text")
    val got = BpeTrain.trainMerges(docs, "text", nMerges = 8)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(got == Seq(
      (1, "h", "e", 3L), (2, "t", "he", 3L), (3, "a", "n", 2L),
      (4, "an", "d", 2L), (5, "i", "n", 1L)))
  }

  test("learned merges reproduce fixed-table token counts on a planted corpus") {
    // plant: the×4 + tha — (t,h)=5 beats (h,e)=4, then (th,e)=4 beats
    // (th,a)=1, so training recovers exactly the fixed table's first
    // two merges; applying either table then yields identical counts
    val docs = Seq("the the tha", "the the").toDF("text")
    val learned = BpeTrain.trainMerges(docs, "text", nMerges = 2)
      .as[(Int, String, String, Long)].collect().toSeq.sortBy(_._1)
    assert(learned.map(m => (m._2, m._3)) == BpeTokens.Merges.take(2))
    val words = Seq("the", "tha")
    val lm = learned.map(m => (m._2, m._3))
    words.foreach { w =>
      assert(BpeTrain.tokenize(w, lm).size == BpeTokens.tokenize(w).size,
        s"token count diverged for '$w'")
    }
  }

  test("tokenize applies learned merges in order with the double-pass completion") {
    // " a b a b " single-pass replace would merge pairs 1 and 3 only;
    // the double pass must merge all occurrences
    val merges = Seq(("a", "b"))
    assert(BpeTrain.tokenize("abab", merges) == Seq("ab", "ab"))
    assert(BpeTrain.tokenize("ababab", merges) == Seq("ab", "ab", "ab"))
    assert(BpeTrain.tokenize("", merges).isEmpty)
  }
}
