package graft.text

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Corpus-trained BPE merge learning — the tokenizer-TRAINING primitive
  * a training-data pipeline needs beside fixed-vocab counting
  * ([[graft.functions.BpeTokens]] applies a FIXED public merge table;
  * this learns the table from the corpus itself).
  *
  * Classic BPE training (Sennrich et al. 2016), exact and distributed:
  *  1. collapse the corpus to the distinct-word frequency table — all
  *     later work is vocab-sized, never corpus-sized (the corpus is
  *     scanned exactly once at any SF);
  *  2. represent each word as sentinel-spaced units (" t h e ", the
  *     BpeTokens convention);
  *  3. per merge step: count every adjacent unit pair weighted by word
  *     frequency (one aggregate over the vocab table), take the argmax
  *     pair with a deterministic tie-break (highest count, then
  *     lexicographic pair), and rewrite " a b " → " ab " with the
  *     double literal-replace pass (see BpeTokens — pass 1 can skip an
  *     occurrence whose leading space the previous match consumed;
  *     pass 2 is then complete).
  *
  * The argmax per step is a 1-row driver action by necessity (the next
  * rewrite is driver control flow) — nMerges tiny actions total, each
  * reading the persisted vocab-sized table, the k-means-promotion
  * posture. Every step is plain literal string algebra, so a SQL
  * oracle replays training verbatim as an unrolled CTE chain.
  *
  * Reference behavior baseline: jahnavi1thoom/ETL-pipeline-telecom has
  * no text surface (490-line single-node pandas over churn CSV); BPE
  * training is part of the training-data extension the brief adds.
  */
object BpeTrain {

  /** Shared bound with the SQL oracle: the oracle enumerates adjacent
    * pair positions with range(1, MaxWordUnits), so a word longer than
    * MaxWordUnits − 1 units would silently diverge the two sides. The
    * trainer guards loudly (the text_char_entropy lesson). */
  val MaxWordUnits = 16

  /** Learn the top `nMerges` BPE merges from `docs(textCol)`.
    * @return (merge_idx, left_unit, right_unit, pair_count) — the
    *         learned merge table in application order */
  def trainMerges(docs: DataFrame, textCol: String, nMerges: Int): DataFrame = {
    val spark = docs.sparkSession
    require(nMerges >= 1, s"nMerges must be >= 1, got $nMerges")
    // tokenization explode is the expensive map work — spread a
    // single-split scan before computing it (r19, guide §2.5)
    val wf = graft.operators.Spread.forCompute(docs)
      .select(explode(split(col(textCol), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy("w").agg(count(lit(1)).as("freq"))
    // vocab-sized working table, scanned once per merge step; released
    // at the engine's per-query release point
    val base = graft.operators.PrefixSum.persistOwned(
      wf.withColumn("repr",
        concat(lit(" "), concat_ws(" ", split(col("w"), "")), lit(" "))))
    val over = base.filter(length(col("w")) > MaxWordUnits - 1).limit(1).count()
    require(over == 0,
      s"bpe train oracle enumerates pair positions to ${MaxWordUnits - 1} " +
        "units; a longer word would silently diverge Spark vs oracle")
    var cur = base
    val merges = scala.collection.mutable.ArrayBuffer.empty[(Int, String, String, Long)]
    var i = 1
    var exhausted = false
    while (i <= nMerges && !exhausted) {
      val best = cur
        .select(col("freq"), split(trim(col("repr")), " ").as("t"))
        .select(col("freq"), explode(expr(
          "CASE WHEN size(t) >= 2 THEN transform(sequence(1, size(t) - 1), " +
            "j -> named_struct('a', element_at(t, j), 'b', element_at(t, j + 1))) " +
            "ELSE array() END")).as("p"))
        .groupBy(col("p.a").as("a"), col("p.b").as("b"))
        .agg(sum(col("freq")).as("c"))
        .orderBy(col("c").desc, col("a"), col("b"))
        .limit(1).collect()
      if (best.isEmpty) exhausted = true // every word fully merged
      else {
        val r = best(0)
        val (a, b, c) = (r.getString(0), r.getString(1), r.getLong(2))
        merges += ((i, a, b, c))
        val pat = lit(s" $a $b ")
        val rep = lit(s" $a$b ")
        cur = cur.withColumn("repr",
          replace(replace(col("repr"), pat, rep), pat, rep))
        i += 1
      }
    }
    import spark.implicits._
    merges.toSeq.toDF("merge_idx", "left_unit", "right_unit", "pair_count")
  }

  /** Tokenize one word under an arbitrary learned merge table — the
    * application half of training (BpeTokens.tokenize with its fixed
    * table swapped out), used by the spec to show learned merges
    * reproduce planted segmentations. */
  def tokenize(word: String, merges: Seq[(String, String)]): Seq[String] = {
    if (word.isEmpty) return Seq.empty
    val sb = new java.lang.StringBuilder(word.length * 2 + 2)
    sb.append(' ')
    var i = 0
    while (i < word.length) {
      val cp = word.codePointAt(i)
      sb.appendCodePoint(cp)
      sb.append(' ')
      i += Character.charCount(cp)
    }
    var s = sb.toString
    merges.foreach { case (a, b) =>
      val pat = s" $a $b "
      val rep = s" $a$b "
      s = s.replace(pat, rep).replace(pat, rep)
    }
    s.trim.split(' ').toSeq
  }
}
