package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

import graft.etl.{Clean, Features, Validate}
import graft.analytics.Summary


/** Text query implementations and their paired oracle SQL —
  * split out of the assembled registry ([[SparkEntry]]) purely for
  * file-size maintainability; the self-type gives every member the
  * same scope it had inside the object. Moved vals are lazy so
  * trait-linearization order can never observe an uninitialized
  * cross-family reference. */
private[graft] trait SparkEntryText { this: SparkEntry.type =>


  /** Corpus bigram document frequencies (top 20). */
  private[graft] def textNgramFreq(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(explode(graft.text.TextFunctions.shingles(col("text"), 2)).as("ngram"))
      .groupBy(col("ngram")).agg(count(lit(1)).as("df"))
      .orderBy(col("df").desc, col("ngram"))
      .limit(20)

  private[graft] lazy val textNgramFreqSql =
    """WITH sh AS (
      |  SELECT doc_id, unnest(list_distinct([w[i] || ' ' || w[i+1] for i in range(1, len(w))])) AS ngram
      |  FROM (SELECT doc_id, string_split(text, ' ') AS w FROM documents))
      |SELECT ngram, COUNT(*) AS df FROM sh
      |GROUP BY ngram ORDER BY df DESC, ngram LIMIT 20""".stripMargin

  /** Benchmark decontamination: flag corpus documents sharing any
    * 5-token shingle with a benchmark set (docs 0..19 stand in for the
    * held-out eval set) — the GPT-3/Pile-style n-gram contamination
    * check. The benchmark gram set is tiny by construction and
    * broadcasts; the corpus side explodes to (doc_id, gram) and
    * semi-joins without shuffling, then the count aggregate carries
    * only matched scalars — at 100 TB the corpus never moves, exactly
    * like the other broadcast-probe operators. */
  private[graft] def textContaminate(s: SparkSession, dir: String): DataFrame = {
    val grams = Tables.documents(s, dir)
      .select(col("doc_id"), graft.text.TextFunctions.words(col("text")).as("ws"))
      // sequence(1, n) with n < 1 would generate DESCENDING [1..n] —
      // guard short docs to an empty gram list instead
      .select(col("doc_id"), explode(expr(
        """CASE WHEN size(ws) >= 5
          |THEN transform(sequence(1, size(ws) - 4), i -> array_join(slice(ws, i, 5), ' '))
          |ELSE array() END""".stripMargin)).as("gram"))
    val bench = grams.filter(col("doc_id") < 20).select("gram").distinct()
    grams.filter(col("doc_id") >= 20)
      .join(broadcast(bench), Seq("gram"), "left_semi")
      .groupBy("doc_id").agg(countDistinct(col("gram")).as("n_hits"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val textContaminateSql =
    """WITH lists AS (SELECT doc_id, string_split(text, ' ') AS l FROM documents),
      |grams AS (SELECT doc_id, array_to_string(l[i:i+4], ' ') AS gram
      |          FROM lists, UNNEST(range(1, greatest(len(l) - 3, 1))) AS t(i)),
      |bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id < 20)
      |SELECT g.doc_id, count(DISTINCT g.gram) AS n_hits
      |FROM grams g JOIN bench b USING (gram)
      |WHERE g.doc_id >= 20
      |GROUP BY 1 ORDER BY doc_id""".stripMargin

  /** SPAN-level decontamination — the surgical complement to
    * text_contaminate's doc-level screen: per corpus doc, WHERE the
    * benchmark 5-grams land (window positions) and the longest
    * consecutive contaminated run, which is what separates "drop the
    * doc" from "cut the quoted span and keep the rest". Same posture as
    * the dedup_substring islands scan (per-doc window, 16-byte hashes
    * only) with the held-out gram set BROADCAST — the corpus never
    * shuffles for membership, the documented decontamination shape. */
  private[graft] def textContaminateSpans(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val bench = graft.text.Decontam
      .gramWindows(docs.filter(col("doc_id") < 20), "text", "doc_id")
      .select(col("h")).distinct()
    graft.text.Decontam
      .spanStats(docs.filter(col("doc_id") >= 20), bench, "text", "doc_id")
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val textContaminateSpansSql =
    """WITH t AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
      |l AS (SELECT doc_id, list_transform(range(1, greatest(len(ws) - 3, 1)),
      |        i -> md5(array_to_string(ws[i:i+4], ' '))) AS lst FROM t),
      |g AS (SELECT doc_id, generate_subscripts(lst, 1) - 1 AS pos,
      |        unnest(lst) AS h FROM l),
      |bench AS (SELECT DISTINCT h FROM g WHERE doc_id < 20),
      |f AS (SELECT g.doc_id, g.pos, b.h IS NOT NULL AS c
      |      FROM g LEFT JOIN bench b ON g.h = b.h
      |      WHERE g.doc_id >= 20),
      |byd AS (SELECT doc_id, COUNT(*) AS n_windows,
      |          CAST(SUM(CASE WHEN c THEN 1 ELSE 0 END) AS BIGINT) AS n_contam
      |        FROM f GROUP BY doc_id),
      |runs AS (SELECT doc_id, CAST(MAX(run) AS BIGINT) AS max_run FROM (
      |    SELECT doc_id, grp, COUNT(*) AS run FROM (
      |      SELECT doc_id, pos,
      |        pos - row_number() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |      FROM f WHERE c) x GROUP BY doc_id, grp) y GROUP BY doc_id)
      |SELECT b.doc_id, b.n_windows, b.n_contam,
      |  COALESCE(r.max_run, 0) AS max_run
      |FROM byd b LEFT JOIN runs r USING (doc_id) ORDER BY b.doc_id""".stripMargin

  /** Domain mixing with fractional epochs (the training-mixture shape:
    * per-source sampling rate ρ, where ρ>1 up-samples by duplication
    * and ρ<1 down-samples): every doc emits floor(ρ) full copies plus
    * one more iff its deterministic md5-uniform falls under frac(ρ),
    * so realized counts converge to ρ·n per source and the exact row
    * set replays on any engine. Here ρ is derived from the source id
    * (0.25/1.0/1.75/2.5 by index mod 4) so the oracle can recompute it;
    * in production ρ comes from a mixture plan table. Pure map-side —
    * project + explode, zero shuffle (the orderBy is presentation). */
  private[graft] def textMixEpochs(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .withColumn("m", regexp_extract(col("source"), "(\\d+)", 1).cast("int") % 4)
      .withColumn("full_copies",
        expr("CASE m WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 2 END"))
      .withColumn("thr",
        expr("CASE m WHEN 0 THEN '4' WHEN 1 THEN '0' WHEN 2 THEN 'c' ELSE '8' END"))
      .withColumn("n_copies", col("full_copies") +
        when(substring(md5(concat(col("doc_id").cast("string"), lit(":"), col("source"))), 1, 1)
          < col("thr"), 1).otherwise(0))
      // sequence(0, -1) generates DESCENDING [0,-1] — guard n_copies=0
      .select(col("doc_id"), col("source"),
        explode(expr(
          "CASE WHEN n_copies >= 1 THEN sequence(0, n_copies - 1) ELSE array() END"))
          .as("epoch_i"))
      .select(col("doc_id"), col("source"), col("epoch_i").cast("long").as("epoch"))
      .orderBy(col("doc_id"), col("epoch"))

  private[graft] lazy val textMixEpochsSql =
    """WITH d AS (SELECT doc_id, source,
      |        CAST(regexp_extract(source, '(\d+)', 1) AS INT) % 4 AS m FROM documents),
      |c AS (SELECT doc_id, source,
      |        (CASE m WHEN 0 THEN 0 WHEN 1 THEN 1 WHEN 2 THEN 1 ELSE 2 END) +
      |        (CASE WHEN substr(md5(doc_id || ':' || source), 1, 1) <
      |              (CASE m WHEN 0 THEN '4' WHEN 1 THEN '0' WHEN 2 THEN 'c' ELSE '8' END)
      |         THEN 1 ELSE 0 END) AS n FROM d)
      |SELECT doc_id, source, CAST(t.e AS BIGINT) AS epoch
      |FROM c, UNNEST(range(c.n)) AS t(e)
      |ORDER BY doc_id, epoch""".stripMargin

  private[graft] def textLangid(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"), graft.text.TextFunctions.langId(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  private[graft] lazy val textLangidSql = {
    def cnt(ws: Seq[String]) =
      s"len(list_filter(string_split(text, ' '), x -> x IN (${ws.map(w => s"'$w'").mkString(",")})))"
    val de = cnt(graft.text.TextFunctions.Stopwords("de"))
    val en = cnt(graft.text.TextFunctions.Stopwords("en"))
    val es = cnt(graft.text.TextFunctions.Stopwords("es"))
    val fr = cnt(graft.text.TextFunctions.Stopwords("fr"))
    s"""SELECT doc_id,
       |  CASE WHEN GREATEST($de, $en, $es, $fr) = 0 THEN 'und'
       |       WHEN $de = GREATEST($de, $en, $es, $fr) THEN 'de'
       |       WHEN $en = GREATEST($de, $en, $es, $fr) THEN 'en'
       |       WHEN $es = GREATEST($de, $en, $es, $fr) THEN 'es'
       |       WHEN $fr = GREATEST($de, $en, $es, $fr) THEN 'fr'
       |       ELSE 'und' END AS lang_pred
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Language-ID confusion matrix against the corpus's labeled `lang`
    * column — the EVALUATION the labeled data makes free (text_langid
    * emits predictions; this scores them, the per-pair error structure
    * a lang-filter threshold decision actually needs). One exact-count
    * groupBy over (truth, prediction); the predictor is the SAME
    * marker-word scorer as [[textLangid]] so the matrix scores the
    * shipped model, not a copy. */
  private[graft] def textLangidEval(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), graft.text.TextFunctions.langId(col("text")).as("lang_pred"))
      .groupBy(col("lang"), col("lang_pred")).agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("lang_pred"))

  private[graft] lazy val textLangidEvalSql = {
    def cnt(ws: Seq[String]) =
      s"len(list_filter(string_split(text, ' '), x -> x IN (${ws.map(w => s"'$w'").mkString(",")})))"
    val de = cnt(graft.text.TextFunctions.Stopwords("de"))
    val en = cnt(graft.text.TextFunctions.Stopwords("en"))
    val es = cnt(graft.text.TextFunctions.Stopwords("es"))
    val fr = cnt(graft.text.TextFunctions.Stopwords("fr"))
    s"""WITH p AS (SELECT lang,
       |  CASE WHEN GREATEST($de, $en, $es, $fr) = 0 THEN 'und'
       |       WHEN $de = GREATEST($de, $en, $es, $fr) THEN 'de'
       |       WHEN $en = GREATEST($de, $en, $es, $fr) THEN 'en'
       |       WHEN $es = GREATEST($de, $en, $es, $fr) THEN 'es'
       |       WHEN $fr = GREATEST($de, $en, $es, $fr) THEN 'fr'
       |       ELSE 'und' END AS lang_pred
       |FROM documents)
       |SELECT lang, lang_pred, COUNT(*) AS n
       |FROM p GROUP BY lang, lang_pred ORDER BY lang, lang_pred""".stripMargin
  }

  /** Trigram-profile language ID (the langid upgrade): same contract
    * as text_langid, scored from character trigrams instead of 5
    * marker words. The oracle recomputes the identical replace-
    * shrinkage trigram counts in SQL. */
  private[graft] def textLangid3(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.text.TextFunctions.langIdTrigram(col("text")).as("lang_pred"))
      .orderBy(col("doc_id"))

  private[graft] lazy val textLangid3Sql = {
    def score(tris: Seq[String]) =
      tris.map(t => s"(len(t) - len(replace(t, '$t', ''))) / 3").mkString(" + ")
    val p = graft.text.TextFunctions.TrigramProfiles
    val (de, en, es, fr) = (score(p("de")), score(p("en")), score(p("es")), score(p("fr")))
    s"""WITH padded AS (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
       |s AS (SELECT doc_id, $de AS sde, $en AS sen, $es AS ses, $fr AS sfr FROM padded)
       |SELECT doc_id,
       |  CASE WHEN GREATEST(sde, sen, ses, sfr) = 0 THEN 'und'
       |       WHEN sde = GREATEST(sde, sen, ses, sfr) THEN 'de'
       |       WHEN sen = GREATEST(sde, sen, ses, sfr) THEN 'en'
       |       WHEN ses = GREATEST(sde, sen, ses, sfr) THEN 'es'
       |       WHEN sfr = GREATEST(sde, sen, ses, sfr) THEN 'fr'
       |       ELSE 'und' END AS lang_pred
       |FROM s ORDER BY doc_id""".stripMargin
  }

  private[graft] def textQuality(s: SparkSession, dir: String): DataFrame = {
    val cols = graft.text.TextFunctions.qualityColumns(col("text"))
    val intCols = Set("n_chars", "n_words")
    Tables.documents(s, dir)
      .select(col("doc_id") +: cols.map { case (n, c) =>
        (if (intCols(n)) c.cast("long") else c).as(n) }: _*)
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val textQualitySql =
    """SELECT doc_id,
      |  CAST(length(text) AS BIGINT) AS n_chars,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_words,
      |  len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' ')) AS distinct_ratio,
      |  len(list_filter(string_split(text, ' '), x -> x IN ('the','a','and','of','is'))) * 1.0
      |    / len(string_split(text, ' ')) AS stopword_ratio,
      |  len(regexp_extract_all(text, '[^a-z0-9 ]')) * 1.0 / length(text) AS punct_ratio,
      |  (length(text) - len(string_split(text, ' ')) + 1) * 1.0 / len(string_split(text, ' ')) AS mean_word_len,
      |  (len(list_distinct(string_split(text, ' '))) * 1.0 / len(string_split(text, ' '))) * 0.5
      |    + LEAST((len(list_filter(string_split(text, ' '), x -> x IN ('the','a','and','of','is'))) * 1.0
      |        / len(string_split(text, ' '))) * 4.0, 1.0) * 0.3
      |    + (1.0 - LEAST((len(regexp_extract_all(text, '[^a-z0-9 ]')) * 1.0 / length(text)) * 10.0, 1.0)) * 0.2
      |    AS quality_score
      |FROM documents ORDER BY doc_id""".stripMargin

  private[graft] def textTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.text.TextFunctions.tokenCount(col("text")).cast("long").as("n_ws_tokens"),
        graft.text.TextFunctions.bpeTokenEstimate(col("text")).cast("long").as("n_bpe_tokens"),
        (length(col("text")) * lit(1.0) /
          graft.text.TextFunctions.bpeTokenEstimate(col("text"))).as("chars_per_token"))
      .orderBy(col("doc_id"))

  private[graft] lazy val textTokensSql =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_ws_tokens,
      |  CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_bpe_tokens,
      |  length(text) * 1.0 / len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS chars_per_token
      |FROM documents ORDER BY doc_id""".stripMargin

  /** Real merge-table BPE token counts ([[graft.functions.BpeTokens]]
    * — 32 ordered public merges, leftmost-greedy, codegen'd): training
    * budgets are set in BPE tokens, and the whitespace/regex estimates
    * (text_tokens) can be ~2× off on merge-heavy English. Row-local
    * projection, no shuffle at any scale; the kernel's double-pass
    * literal-replace semantics replay in SQL as a nested replace()
    * chain, so the count sits under the full hash oracle. */
  private[graft] def textBpeTokens(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        size(filter(split(col("text"), " "), w => w =!= lit("")))
          .cast("long").as("n_words"),
        graft.functions.BpeTokens.bpe_token_count(col("text")).as("n_bpe"))
      .withColumn("bpe_per_word",
        when(col("n_words") > 0,
          round(col("n_bpe").cast("double") / col("n_words"), 6)).otherwise(lit(0.0)))
      .orderBy(col("doc_id"))

  private[graft] lazy val textBpeTokensSql: String = {
    val base = "' ' || array_to_string(split(w, ''), ' ') || ' '"
    val chain = graft.functions.BpeTokens.Merges.foldLeft(base) { case (acc, (a, b)) =>
      val p = s"' $a $b '"
      val r = s"' $a$b '"
      s"replace(replace($acc, $p, $r), $p, $r)"
    }
    s"""SELECT doc_id,
       |  CAST(len(list_filter(string_split(text, ' '), w -> w <> '')) AS BIGINT) AS n_words,
       |  CAST(COALESCE(list_sum(list_transform(
       |         list_filter(string_split(text, ' '), w -> w <> ''),
       |         w -> len(string_split(trim($chain), ' ')))), 0) AS BIGINT) AS n_bpe,
       |  CASE WHEN len(list_filter(string_split(text, ' '), w -> w <> '')) > 0
       |       THEN ROUND(CAST(COALESCE(list_sum(list_transform(
       |              list_filter(string_split(text, ' '), w -> w <> ''),
       |              w -> len(string_split(trim($chain), ' ')))), 0) AS DOUBLE)
       |            / len(list_filter(string_split(text, ' '), w -> w <> '')), 6)
       |       ELSE 0.0 END AS bpe_per_word
       |FROM documents ORDER BY doc_id""".stripMargin
  }

  /** Corpus-TRAINED BPE merges ([[graft.text.BpeTrain.trainMerges]] —
    * the tokenizer-training primitive beside text_bpe_tokens' fixed
    * table): 8 exact merge steps over the distinct-word frequency
    * table, each one vocab-sized aggregate + a 1-row argmax action,
    * emitting the learned (merge_idx, left, right, pair_count) table.
    * The corpus is scanned once; every training step rides the
    * persisted vocab table, so at 100 TB the cost is the word-count
    * aggregation plus 8 vocab-sized passes. The DuckDB oracle replays
    * training verbatim as an unrolled CTE chain (argmax tie-break:
    * count DESC, then lexicographic pair — both engines binary-order
    * the ASCII units identically). */
  private[graft] def textBpeTrain(s: SparkSession, dir: String): DataFrame =
    graft.text.BpeTrain.trainMerges(Tables.documents(s, dir), "text", nMerges = 8)
      .orderBy(col("merge_idx"))

  private[graft] lazy val textBpeTrainSql: String = {
    val n = 8
    def iter(i: Int) =
      s"""p$i AS (SELECT t[CAST(j AS INT)] AS a, t[CAST(j AS INT) + 1] AS b,
         |        CAST(SUM(freq) AS BIGINT) AS c
         |     FROM (SELECT freq, string_split(trim(repr), ' ') AS t FROM r${i - 1}) x,
         |          range(1, ${graft.text.BpeTrain.MaxWordUnits}) pos(j)
         |     WHERE j <= len(t) - 1 GROUP BY 1, 2),
         |b$i AS (SELECT a, b, c FROM p$i ORDER BY c DESC, a, b LIMIT 1),
         |r$i AS (SELECT w, freq,
         |        replace(replace(repr, ' ' || a || ' ' || b || ' ', ' ' || a || b || ' '),
         |                ' ' || a || ' ' || b || ' ', ' ' || a || b || ' ') AS repr
         |     FROM r${i - 1} CROSS JOIN b$i)""".stripMargin
    s"""WITH wds AS (SELECT unnest(string_split(text, ' ')) AS w FROM documents),
       |wf AS (SELECT w, COUNT(*) AS freq FROM wds WHERE w <> '' GROUP BY w),
       |r0 AS (SELECT w, freq,
       |       ' ' || array_to_string(string_split(w, ''), ' ') || ' ' AS repr FROM wf),
       |${(1 to n).map(iter).mkString(",\n")}
       |SELECT merge_idx, left_unit, right_unit, pair_count FROM (
       |${(1 to n).map(i =>
          s"SELECT $i AS merge_idx, a AS left_unit, b AS right_unit, c AS pair_count FROM b$i")
          .mkString(" UNION ALL ")}
       |) u ORDER BY merge_idx""".stripMargin
  }

  /** Top-20 bigram collocations by pointwise mutual information — the
    * phrase miner next to an_bigram_logprob (that one screens documents
    * with corpus probabilities; this one surfaces the phrases
    * themselves): PMI = ln((c_xy/N_bi) / ((c_x/N_u)(c_y/N_u))) over
    * min-count-5 bigrams, ranked desc with (w1, w2) tie-break. Two
    * posting-shaped partial-aggregated groupBys (bigrams, unigrams) —
    * the shuffle carries token counts, never documents — then a tiny
    * broadcast of the two totals; the standard distributed collocation
    * shape at any corpus size. */
  private[graft] def textPmiCollocations(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val docs = graft.operators.Spread.forCompute(Tables.documents(s, dir))
    // the posting tables are re-read (bigrams twice: totals + scoring;
    // unigrams three times: totals + both sides of the scoring join) —
    // without a cut each consumer re-runs the corpus explode, so the
    // tokenization pass executed FIVE times (the textTfidf double-read
    // problem, one worse). Lazy checkpoints run each explode once.
    val bigrams = graft.operators.Checkpoints.stabilizeLazy(docs
      .select(explode(when(size(ws) >= 2,
        transform(sequence(lit(1), size(ws) - 1),
          i => struct(element_at(ws, i).as("w1"), element_at(ws, i + 1).as("w2"))))
        .otherwise(array().cast("array<struct<w1:string,w2:string>>"))).as("b"))
      .select(col("b.w1"), col("b.w2"))
      .groupBy(col("w1"), col("w2")).agg(count(lit(1)).as("c_xy")))
    val unigrams = graft.operators.Checkpoints.stabilizeLazy(
      docs.select(explode(ws).as("w"))
        .groupBy(col("w")).agg(count(lit(1)).as("c_w")))
    val totals = bigrams.agg(sum(col("c_xy")).as("n_bi"))
      .crossJoin(unigrams.agg(sum(col("c_w")).as("n_uni")))
    bigrams.filter(col("c_xy") >= 5)
      .join(unigrams.select(col("w").as("w1"), col("c_w").as("c_x")), "w1")
      .join(unigrams.select(col("w").as("w2"), col("c_w").as("c_y")), "w2")
      .crossJoin(broadcast(totals))
      .withColumn("pmi", round(
        log((col("c_xy").cast("double") / col("n_bi").cast("double")) /
          ((col("c_x").cast("double") / col("n_uni").cast("double")) *
            (col("c_y").cast("double") / col("n_uni").cast("double")))), 6))
      // Top-20 via orderBy+limit → TakeOrderedAndProject; the rank
      // window runs over the 20-row result, never the vocabulary-sized
      // PMI table (the text_zipf limit-first pattern).
      .orderBy(col("pmi").desc, col("w1"), col("w2")).limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("pmi").desc, col("w1"), col("w2"))))
      .select(col("rnk"), col("w1"), col("w2"), col("c_xy"), col("pmi"))
      .orderBy(col("rnk"))
  }

  private[graft] lazy val textPmiCollocationsSql =
    """WITH t AS (SELECT string_split(text, ' ') AS ws FROM documents),
      |bi AS (SELECT ws[CAST(i AS INT)] AS w1, ws[CAST(i AS INT) + 1] AS w2
      |       FROM t, unnest(range(1, greatest(len(ws), 1))) AS u(i)),
      |bg AS (SELECT w1, w2, COUNT(*) AS c_xy FROM bi GROUP BY 1, 2),
      |un AS (SELECT unnest(ws) AS w FROM t),
      |ug AS (SELECT w, COUNT(*) AS c_w FROM un GROUP BY 1),
      |tot AS (SELECT (SELECT CAST(SUM(c_xy) AS BIGINT) FROM bg) AS n_bi,
      |               (SELECT CAST(SUM(c_w) AS BIGINT) FROM ug) AS n_uni),
      |sc AS (SELECT b.w1, b.w2, b.c_xy,
      |         ROUND(ln((CAST(b.c_xy AS DOUBLE) / CAST(tot.n_bi AS DOUBLE))
      |           / ((CAST(x.c_w AS DOUBLE) / CAST(tot.n_uni AS DOUBLE))
      |              * (CAST(y.c_w AS DOUBLE) / CAST(tot.n_uni AS DOUBLE)))), 6) AS pmi
      |       FROM bg b JOIN ug x ON x.w = b.w1 JOIN ug y ON y.w = b.w2
      |            CROSS JOIN tot
      |       WHERE b.c_xy >= 5)
      |SELECT CAST(rnk AS BIGINT) AS rnk, w1, w2, c_xy, pmi FROM (
      |  SELECT *, row_number() OVER (ORDER BY pmi DESC, w1, w2) AS rnk FROM sc) z
      |WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  private[graft] def textFingerprint(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("doc_id"),
        graft.text.TextFunctions.contentFingerprint(col("text")).as("content_fp"),
        substring(graft.text.TextFunctions.contentFingerprint(col("text")), 1, 8).as("fp_prefix"))
      .orderBy(col("doc_id"))

  private[graft] lazy val textFingerprintSql =
    """SELECT doc_id, md5(text) AS content_fp, substr(md5(text), 1, 8) AS fp_prefix
      |FROM documents ORDER BY doc_id""".stripMargin

  /** TF-IDF top-3 terms per document: one posting aggregate for tf, one
    * for df, idf = ln(N/df); scores rounded once, rank pinned by
    * (score desc, term). */
  private[graft] def textTfidf(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    // df comes from a partial-aggregated groupBy over the tf rows (one
    // row per doc-term, so count per term = document frequency) joined
    // back broadcast — a term-partitioned window would serialize each
    // Zipf-head term's posting list through a single task; the corpus
    // size joins in as a broadcast scalar. tf is eagerly checkpointed
    // because BOTH branches (df counts and the scoring join) consume
    // it — without materialization the explode+aggregate runs twice
    // (AQE re-plans each branch, so exchange reuse does not
    // deduplicate them), and a lazy persist still pays a second
    // plan+probe pass. tf is the post-combine (doc, term) table — tiny
    // next to the exploded token stream it summarizes.
    val nDf = docs.agg(count(lit(1)).cast("double").as("n_docs"))
    // tokenize ONCE into a named column before the Generate — inlining
    // words(text) into both explode() and size() re-runs the regex
    // tokenizer per expression (Catalyst does not CSE across a
    // Generate boundary)
    val words = docs
      .select(col("doc_id"), graft.text.TextFunctions.words(col("text")).as("ws"))
      .select(col("doc_id"), explode(col("ws")).as("term"), size(col("ws")).as("nw"))
    val tf = words.groupBy(col("doc_id"), col("term"), col("nw"))
      .agg(count(lit(1)).as("tf"))
      .localCheckpoint()
    val dfCounts = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val w = Window.partitionBy(col("doc_id"))
      .orderBy(col("score").desc, col("term"))
    tf.join(broadcast(dfCounts), "term")
      .crossJoin(broadcast(nDf))
      .withColumn("score",
        round((col("tf") / col("nw")) * log(col("n_docs") / col("df")), 8))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= 3)
      .select(col("doc_id"), col("term"), col("rank"), col("score"))
      .orderBy(col("doc_id"), col("rank"))
  }

  private[graft] lazy val textTfidfSql =
    """WITH w AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS term,
      |    len(string_split(text, ' ')) AS nw
      |  FROM documents),
      |tf AS (SELECT doc_id, term, nw, COUNT(*) AS tf FROM w GROUP BY doc_id, term, nw),
      |df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM w GROUP BY term),
      |n AS (SELECT COUNT(*) AS n FROM documents)
      |SELECT doc_id, term, CAST(rank AS INT) AS rank, score FROM (
      |  SELECT tf.doc_id, tf.term,
      |    ROUND((tf.tf * 1.0 / tf.nw) * ln(n.n * 1.0 / df.df), 8) AS score,
      |    ROW_NUMBER() OVER (PARTITION BY tf.doc_id
      |      ORDER BY ROUND((tf.tf * 1.0 / tf.nw) * ln(n.n * 1.0 / df.df), 8) DESC, tf.term) AS rank
      |  FROM tf JOIN df ON tf.term = df.term CROSS JOIN n) t
      |WHERE rank <= 3
      |ORDER BY doc_id, rank""".stripMargin

  /** Language-balanced corpus sample: language-ID then a deterministic
    * per-language cap — operator composition (text.langId ∘
    * Sampling.stratified), the standard "balance the long tail" step. */
  private[graft] def textLangSample(s: SparkSession, dir: String): DataFrame =
    graft.operators.Sampling.stratified(
        Tables.documents(s, dir)
          .select(col("doc_id"), graft.text.TextFunctions.langId(col("text")).as("lang")),
        col("lang"), col("doc_id"), n = 50)
      .orderBy(col("lang"), col("doc_id"))

  private[graft] lazy val textLangSampleSql = {
    def cnt(ws: Seq[String]) =
      s"len(list_filter(string_split(text, ' '), x -> x IN (${ws.map(w => s"'$w'").mkString(",")})))"
    val de = cnt(graft.text.TextFunctions.Stopwords("de"))
    val en = cnt(graft.text.TextFunctions.Stopwords("en"))
    val es = cnt(graft.text.TextFunctions.Stopwords("es"))
    val fr = cnt(graft.text.TextFunctions.Stopwords("fr"))
    s"""WITH l AS (
       |  SELECT doc_id,
       |    CASE WHEN GREATEST($de, $en, $es, $fr) = 0 THEN 'und'
       |         WHEN $de = GREATEST($de, $en, $es, $fr) THEN 'de'
       |         WHEN $en = GREATEST($de, $en, $es, $fr) THEN 'en'
       |         WHEN $es = GREATEST($de, $en, $es, $fr) THEN 'es'
       |         WHEN $fr = GREATEST($de, $en, $es, $fr) THEN 'fr'
       |         ELSE 'und' END AS lang
       |  FROM documents)
       |SELECT doc_id, lang FROM (
       |  SELECT doc_id, lang, ROW_NUMBER() OVER (PARTITION BY lang
       |    ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id) AS rn
       |  FROM l) t
       |WHERE rn <= 50
       |ORDER BY lang, doc_id""".stripMargin
  }

  /** Sequence packing: documents → fixed-token-budget training bins,
    * sharded by content hash so shards pack in parallel. */
  private[graft] def textPack(s: SparkSession, dir: String): DataFrame =
    graft.text.Packing.packBins(
        Tables.documents(s, dir)
          .select(col("doc_id"),
            graft.text.TextFunctions.bpeTokenEstimate(col("text")).cast("long").as("n_tokens")),
        "doc_id", "n_tokens", budget = 2048L, shards = 8)
      .select("doc_id", "n_tokens", "shard", "n_tokens_cum", "bin")
      .orderBy(col("doc_id"))

  private[graft] lazy val textPackSql =
    """WITH t AS (
      |  SELECT doc_id,
      |    CAST(len(regexp_extract_all(text, '[a-z0-9]+|[^a-z0-9 ]')) AS BIGINT) AS n_tokens,
      |    CAST(((strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 1, 1)) - 1) * 16
      |        + strpos('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), 2, 1)) - 1) % 8 AS INT) AS shard
      |  FROM documents)
      |SELECT doc_id, n_tokens, shard,
      |  CAST(SUM(n_tokens) OVER w AS BIGINT) AS n_tokens_cum,
      |  CAST(FLOOR((SUM(n_tokens) OVER w - n_tokens) / 2048.0) AS BIGINT) AS bin
      |FROM t
      |WINDOW w AS (PARTITION BY shard ORDER BY doc_id
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY doc_id""".stripMargin

  /** Sliding-window sequence chunking (RAG/pretraining shape): 64-token
    * chunks on a 48-token stride (16-token overlap), one Expand pass —
    * starts come from `sequence(0, n-1, stride)`, the chunk itself is a
    * slice. No shuffle at all: chunking is embarrassingly row-local. */
  private[graft] def textChunk(s: SparkSession, dir: String): DataFrame = {
    val (chunkLen, stride) = (64, 48)
    Tables.documents(s, dir)
      .select(col("doc_id"), graft.text.TextFunctions.words(col("text")).as("w"))
      .select(col("doc_id"), col("w"),
        posexplode(sequence(lit(0), size(col("w")) - 1, lit(stride))).as(Seq("chunk_id", "start")))
      .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("w"), col("start") + 1, lit(chunkLen))).as("chunk"),
        size(slice(col("w"), col("start") + 1, lit(chunkLen))).cast("long").as("n_tokens"))
      .orderBy(col("doc_id"), col("chunk_id"))
  }

  private[graft] lazy val textChunkSql =
    """WITH w AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |s AS (SELECT doc_id, w, unnest(range(0, len(w), 48)) AS start FROM w)
      |SELECT doc_id, CAST(start/48 AS BIGINT) AS chunk_id,
      |  array_to_string(w[start+1 : least(start+64, len(w))], ' ') AS chunk,
      |  least(start+64, len(w)) - start AS n_tokens
      |FROM s ORDER BY doc_id, chunk_id""".stripMargin

  /** The composed C4/Gopher-style quality gate: every keep/drop signal
    * (length, lexical diversity, top-word repetition, language) in ONE
    * row-local projection — a single scan, one tokenize, no shuffle
    * except the presentation sort. `reasons` lists every failed check
    * (concat_ws drops the null passes), so the drop report doubles as
    * the filter audit log a 100 TB curation run needs. */
  private[graft] def textFilterPipeline(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), TextFunctions.words(col("text")).as("ws"))
    val nWords = size(col("ws"))
    val distinctRatio = size(array_distinct(col("ws"))) * lit(1.0) / nWords
    val checks = Seq(
      "too_short" -> (nWords < 10),
      "low_diversity" -> (distinctRatio < 0.2),
      "repetitive" -> (topRunFrac(col("ws")) > 0.2),
      "not_en" -> (TextFunctions.langIdWords(col("ws")) =!= "en"))
    docs
      .withColumn("reasons", concat_ws(",",
        checks.map { case (n, c) => when(c, lit(n)) }: _*))
      .select(col("doc_id"), (col("reasons") === "").as("keep"), col("reasons"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val textFilterPipelineSql = {
    def cnt(ws: Seq[String]) =
      s"len(list_filter(w, x -> x IN (${ws.map(w => s"'$w'").mkString(",")})))"
    val de = cnt(graft.text.TextFunctions.Stopwords("de"))
    val en = cnt(graft.text.TextFunctions.Stopwords("en"))
    val es = cnt(graft.text.TextFunctions.Stopwords("es"))
    val fr = cnt(graft.text.TextFunctions.Stopwords("fr"))
    s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
       |cnt AS (SELECT doc_id, gram, count(*) AS c
       |        FROM (SELECT doc_id, unnest(w) AS gram FROM w) GROUP BY 1, 2),
       |top AS (SELECT doc_id, max(c) * 1.0 / sum(c) AS top_word_frac FROM cnt GROUP BY 1),
       |sig AS (SELECT w.doc_id,
       |  concat_ws(',',
       |    CASE WHEN len(w) < 10 THEN 'too_short' END,
       |    CASE WHEN len(list_distinct(w)) * 1.0 / len(w) < 0.2 THEN 'low_diversity' END,
       |    CASE WHEN top.top_word_frac > 0.2 THEN 'repetitive' END,
       |    CASE WHEN (CASE WHEN GREATEST($de, $en, $es, $fr) = 0 THEN 'und'
       |               WHEN $de = GREATEST($de, $en, $es, $fr) THEN 'de'
       |               WHEN $en = GREATEST($de, $en, $es, $fr) THEN 'en'
       |               WHEN $es = GREATEST($de, $en, $es, $fr) THEN 'es'
       |               WHEN $fr = GREATEST($de, $en, $es, $fr) THEN 'fr'
       |               ELSE 'und' END) <> 'en' THEN 'not_en' END) AS reasons
       |  FROM w JOIN top USING (doc_id))
       |SELECT doc_id, reasons = '' AS keep, reasons FROM sig ORDER BY doc_id""".stripMargin
  }

  private[graft] def textRepetition(s: SparkSession, dir: String): DataFrame = {
    val w = graft.text.TextFunctions.words(col("text"))
    val bigrams = transform(sequence(lit(1), size(w) - 1),
      i => concat_ws(" ", element_at(w, i), element_at(w, i + 1)))
    Tables.documents(s, dir)
      .select(col("doc_id"),
        round(topRunFrac(w), 8).as("top_word_frac"),
        round(topRunFrac(bigrams), 8).as("top_bigram_frac"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val textRepetitionSql =
    """WITH w AS (SELECT doc_id, string_split(text,' ') AS w FROM documents),
      |grams AS (
      |  SELECT doc_id, 'uni' AS g, unnest(w) AS gram FROM w
      |  UNION ALL
      |  SELECT doc_id, 'bi' AS g,
      |    unnest([w[i] || ' ' || w[i+1] for i in range(1, len(w))]) AS gram FROM w),
      |cnt AS (SELECT doc_id, g, gram, COUNT(*) AS c FROM grams GROUP BY 1,2,3),
      |agg AS (SELECT doc_id, g, MAX(c) AS mx, SUM(c) AS tot FROM cnt GROUP BY 1,2)
      |SELECT doc_id,
      |  MAX(CASE WHEN g='uni' THEN ROUND(mx * 1.0 / tot, 8) END) AS top_word_frac,
      |  MAX(CASE WHEN g='bi' THEN ROUND(mx * 1.0 / tot, 8) END) AS top_bigram_frac
      |FROM agg GROUP BY 1 ORDER BY 1""".stripMargin

  /** Unicode NFC normalization under the hard oracle. The corpus is
    * ASCII, so the query MANUFACTURES decomposed text deterministically
    * (every 'e' becomes 'e' + U+0301 combining acute) and then runs the
    * codegen'd [[graft.functions.NfcNormalize]] expression, which must
    * compose those sequences back to precomposed 'é'. The per-doc char
    * counts before/after plus an md5 of the normalized UTF-8 bytes are
    * hash-checked against DuckDB's nfc_normalize — so the composition
    * actually happening (length shrinks by exactly the injected count)
    * is what's verified, not an identity pass. Row-local, map-only. */
  private[graft] def textNfc(s: SparkSession, dir: String): DataFrame = {
    val decomposed = regexp_replace(col("text"), "e", "e\u0301")
    val norm = graft.functions.NfcNormalize.nfc(decomposed)
    Tables.documents(s, dir)
      .select(col("doc_id"),
        length(decomposed).as("n_chars_dec"),
        length(norm).as("n_chars_nfc"),
        md5(norm.cast("binary")).as("nfc_digest"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val textNfcSql =
    """WITH t AS (SELECT doc_id, replace(text, 'e', 'e' || chr(769)) AS dec
      |           FROM documents)
      |SELECT doc_id,
      |  length(dec) AS n_chars_dec,
      |  length(nfc_normalize(dec)) AS n_chars_nfc,
      |  md5(nfc_normalize(dec)) AS nfc_digest
      |FROM t ORDER BY doc_id""".stripMargin

  /** Zipf-law slope of the token frequency spectrum — the corpus
    * health probe (natural text runs slope ≈ −1; templated/duplicated
    * corpora flatten or steepen it): top-50 token document frequencies,
    * OLS of ln(freq) on ln(rank) with the deterministic (freq desc,
    * token) rank tie-break. The regression sums go through
    * DECIMAL(38,18) (order-independent) and emit under ROUND(·, 6)
    * (libm ulp absorption, as [[anEntropy]]). Token counting is the
    * text_ngram_freq shape; the spectrum fit runs on 50 rows. */
  private[graft] def textZipf(s: SparkSession, dir: String): DataFrame = {
    val top = Tables.documents(s, dir)
      .select(explode(split(lower(col("text")), "\\s+")).as("tok"))
      .filter(length(col("tok")) > 0)
      .groupBy("tok").agg(count(lit(1)).as("f"))
      .orderBy(col("f").desc, col("tok")).limit(50)
    val xy = top.select(
      log(row_number().over(Window.orderBy(col("f").desc, col("tok"))).cast("double")).as("x"),
      log(col("f").cast("double")).as("y"))
    def dsum(c: Column) = sum(c.cast("decimal(38,18)"))
    xy.agg(count(lit(1)).as("n"), dsum(col("x")).as("sx"), dsum(col("y")).as("sy"),
        dsum(col("x") * col("x")).as("sxx"), dsum(col("x") * col("y")).as("sxy"))
      .select(col("n"),
        round((col("n").cast("double") * col("sxy").cast("double")
            - col("sx").cast("double") * col("sy").cast("double"))
          / (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")), 6).as("zipf_slope"))
  }

  private[graft] lazy val textZipfSql =
    """WITH tok AS (
      |  SELECT t AS tok, COUNT(*) AS f
      |  FROM (SELECT UNNEST(string_split_regex(lower(text), '\s+')) AS t FROM documents)
      |  WHERE len(t) > 0 GROUP BY t ORDER BY f DESC, tok LIMIT 50),
      |xy AS (SELECT ln(CAST(ROW_NUMBER() OVER (ORDER BY f DESC, tok) AS DOUBLE)) AS x,
      |              ln(CAST(f AS DOUBLE)) AS y FROM tok),
      |a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |             SUM(CAST(x AS DECIMAL(38,18))) AS sx, SUM(CAST(y AS DECIMAL(38,18))) AS sy,
      |             SUM(CAST(x*x AS DECIMAL(38,18))) AS sxx, SUM(CAST(x*y AS DECIMAL(38,18))) AS sxy
      |      FROM xy)
      |SELECT n,
      |  ROUND((CAST(n AS DOUBLE)*CAST(sxy AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sy AS DOUBLE))
      |        / (CAST(n AS DOUBLE)*CAST(sxx AS DOUBLE) - CAST(sx AS DOUBLE)*CAST(sx AS DOUBLE)), 6)
      |    AS zipf_slope
      |FROM a""".stripMargin

  /** PII scan/redaction audit — the privacy screen before a corpus
    * ships: the ASCII test corpus carries no PII, so the query
    * MANUFACTURES it deterministically (every 3rd doc gains an email,
    * every 5th a phone number — the [[textNfc]] injection discipline),
    * then counts matches and verifies the redacted length drop
    * per doc. Patterns stay in the regex subset whose semantics are
    * identical across Java regex and RE2-style engines (character
    * classes, +, literal dot). Row-local, map-only — the 100 TB shape
    * is a pure projection. */
  private[graft] def textPiiAudit(s: SparkSession, dir: String): DataFrame = {
    val injected = Tables.documents(s, dir).select(col("doc_id"),
      concat(col("text"),
        when(col("doc_id") % 3 === 0,
          concat(lit(" user"), col("doc_id").cast("string"), lit("@example.com")))
          .otherwise(lit("")),
        when(col("doc_id") % 5 === 0,
          concat(lit(" 555-01"), lpad((col("doc_id") % 100).cast("string"), 2, "0")))
          .otherwise(lit(""))).as("t"))
    // [.] instead of \. — identical across engines AND sidesteps the
    // string-literal backslash-escape differences between Spark SQL
    // and DuckDB entirely
    val emailRe = "[a-z0-9]+@[a-z0-9]+[.][a-z]+"
    val phoneRe = "[0-9]{3}-[0-9]{4,6}"
    injected.select(col("doc_id"),
        size(expr(s"regexp_extract_all(t, '$emailRe', 0)")).cast("long").as("n_email"),
        size(expr(s"regexp_extract_all(t, '$phoneRe', 0)")).cast("long").as("n_phone"),
        (length(col("t")) - length(
          regexp_replace(regexp_replace(col("t"), emailRe, "<EMAIL>"),
            phoneRe, "<PHONE>"))).as("len_drop"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val textPiiAuditSql =
    """WITH inj AS (SELECT doc_id,
      |    text || CASE WHEN doc_id % 3 = 0
      |                 THEN ' user' || CAST(doc_id AS VARCHAR) || '@example.com'
      |                 ELSE '' END
      |         || CASE WHEN doc_id % 5 = 0
      |                 THEN ' 555-01' || lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0')
      |                 ELSE '' END AS t
      |  FROM documents)
      |SELECT doc_id,
      |  CAST(len(regexp_extract_all(t, '[a-z0-9]+@[a-z0-9]+[.][a-z]+')) AS BIGINT) AS n_email,
      |  CAST(len(regexp_extract_all(t, '[0-9]{3}-[0-9]{4,6}')) AS BIGINT) AS n_phone,
      |  CAST(strlen(t) - strlen(regexp_replace(regexp_replace(t,
      |    '[a-z0-9]+@[a-z0-9]+[.][a-z]+', '<EMAIL>', 'g'),
      |    '[0-9]{3}-[0-9]{4,6}', '<PHONE>', 'g')) AS BIGINT) AS len_drop
      |FROM inj ORDER BY doc_id""".stripMargin

  /** Fog-style readability per document — the curation signal that
    * separates "simple training prose" from jargon walls where
    * text_quality's ratios can't (they never see word SHAPE). Syllables
    * are vowel-group counts via ONE translate (vowels→'a', every other
    * letter→'b') + sentinel + substring-delete — pure portable string
    * algebra, no regex (the etl_url_normalize replay-safety rule);
    * the corpus has no sentence punctuation, so the Gunning-Fog grade
    * uses the standard fixed 20-word pseudo-sentence. Row-local
    * projection: no shuffle at any scale. */
  private[graft] def textReadability(s: SparkSession, dir: String): DataFrame = {
    val syllAgg =
      """aggregate(filter(split(text, ' '), w -> w <> ''), 0L, (acc, w) ->
        |  acc + greatest(1L,
        |    length(translate(w, 'abcdefghijklmnopqrstuvwxyz',
        |                        'abbbabbbabbbbbabbbbbabbbbb') || 'b') -
        |    length(replace(translate(w, 'abcdefghijklmnopqrstuvwxyz',
        |                                'abbbabbbabbbbbabbbbbabbbbb') || 'b',
        |                   'ab', 'b'))))""".stripMargin.replace("\n", " ")
    val complexCnt =
      """size(filter(split(text, ' '), w -> w <> '' AND
        |  length(translate(w, 'abcdefghijklmnopqrstuvwxyz',
        |                      'abbbabbbabbbbbabbbbbabbbbb') || 'b') -
        |  length(replace(translate(w, 'abcdefghijklmnopqrstuvwxyz',
        |                              'abbbabbbabbbbbabbbbbabbbbb') || 'b',
        |                 'ab', 'b')) >= 3))""".stripMargin.replace("\n", " ")
    Tables.documents(s, dir)
      .select(col("doc_id"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long").as("n_words"),
        expr(syllAgg).as("n_syll"),
        expr(complexCnt).cast("long").as("n_complex"))
      .filter(col("n_words") > 0)
      .select(col("doc_id"), col("n_words"), col("n_syll"), col("n_complex"),
        round(col("n_syll").cast("double") / col("n_words").cast("double"), 6)
          .as("syll_per_word"),
        round(lit(0.4) * (lit(20.0) +
          lit(100.0) * col("n_complex").cast("double") / col("n_words").cast("double")), 4)
          .as("fog_grade"))
      .orderBy(col("doc_id"))
  }

  private[graft] lazy val textReadabilitySql = {
    val tr = "translate(w, 'abcdefghijklmnopqrstuvwxyz', 'abbbabbbabbbbbabbbbbabbbbb') || 'b'"
    s"""WITH d AS (SELECT doc_id,
       |    list_filter(string_split(text, ' '), w -> w <> '') AS ws
       |  FROM documents),
       |c AS (SELECT doc_id,
       |    CAST(len(ws) AS BIGINT) AS n_words,
       |    CAST(COALESCE(list_sum(list_transform(ws, w ->
       |      greatest(1, length($tr) - length(replace($tr, 'ab', 'b'))))), 0) AS BIGINT)
       |      AS n_syll,
       |    CAST(len(list_filter(ws, w ->
       |      length($tr) - length(replace($tr, 'ab', 'b')) >= 3)) AS BIGINT) AS n_complex
       |  FROM d)
       |SELECT doc_id, n_words, n_syll, n_complex,
       |  ROUND(CAST(n_syll AS DOUBLE) / CAST(n_words AS DOUBLE), 6) AS syll_per_word,
       |  ROUND(0.4 * (20.0 + 100.0 * CAST(n_complex AS DOUBLE)
       |    / CAST(n_words AS DOUBLE)), 4) AS fog_grade
       |FROM c WHERE n_words > 0 ORDER BY doc_id""".stripMargin
  }

  /** Heaps-law vocabulary growth over the corpus in ingest order — the
    * "is more data still buying new vocabulary" curve that decides
    * when corpus collection saturates. Terms' first-occurrence doc ids
    * come from one explode + min groupBy (no window over the token
    * stream); 50-doc buckets then carry (tokens, new-vocab) through
    * ONE [[graft.operators.PrefixSum]] scan — cumulative counts stay
    * exact BIGINTs, and the Heaps exponent estimate
    * ln(vocab)/ln(tokens) is one IEEE expression, ROUND(·,6). */
  private[graft] def textVocabGrowth(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val words = docs.select(col("doc_id"),
      explode(expr("filter(split(text, ' '), w -> w <> '')")).as("term"))
    val firstDoc = words.groupBy(col("term")).agg(min(col("doc_id")).as("fd"))
      .groupBy((col("fd") / 50).cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("vocab_new"))
    val tokens = docs.select((col("doc_id") / 50).cast("bigint").as("bucket"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long").as("nw"))
      .groupBy(col("bucket")).agg(sum(col("nw")).as("tokens"), count(lit(1)).as("n_docs"))
    val merged = tokens.join(firstDoc, Seq("bucket"), "left")
      .select(col("bucket"), col("n_docs"), col("tokens"),
        coalesce(col("vocab_new"), lit(0L)).as("vocab_new"))
    graft.operators.PrefixSum.withRunningTotals(merged, Seq("bucket"),
        Seq("tokens", "vocab_new"))
      .select(col("bucket"), col("n_docs"), col("tokens_cum"),
        col("vocab_new_cum").as("vocab_cum"),
        round(log(col("vocab_new_cum").cast("double")) /
          log(col("tokens_cum").cast("double")), 6).as("heaps_beta"))
      .orderBy(col("bucket"))
  }

  private[graft] lazy val textVocabGrowthSql =
    """WITH w AS (SELECT doc_id,
      |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      |  FROM documents),
      |f1 AS (SELECT term, CAST(MIN(doc_id) // 50 AS BIGINT) AS bucket2
      |       FROM w GROUP BY term),
      |fd2 AS (SELECT bucket2, COUNT(*) AS vocab_new FROM f1 GROUP BY 1),
      |tk AS (SELECT CAST(doc_id // 50 AS BIGINT) AS bucket,
      |         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
      |           AS tokens,
      |         COUNT(*) AS n_docs
      |       FROM documents GROUP BY 1),
      |m AS (SELECT bucket, n_docs, tokens, COALESCE(vocab_new, 0) AS vocab_new
      |      FROM tk LEFT JOIN fd2 ON tk.bucket = fd2.bucket2)
      |SELECT bucket, n_docs,
      |  CAST(SUM(tokens) OVER (ORDER BY bucket) AS BIGINT) AS tokens_cum,
      |  CAST(SUM(vocab_new) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum,
      |  ROUND(ln(CAST(SUM(vocab_new) OVER (ORDER BY bucket) AS DOUBLE))
      |    / ln(CAST(SUM(tokens) OVER (ORDER BY bucket) AS DOUBLE)), 6) AS heaps_beta
      |FROM m ORDER BY bucket""".stripMargin

  /** Jensen–Shannon divergence between two sources' unigram
    * distributions — the symmetric, bounded [0, ln 2] drift metric for
    * TEXT (an_ks_drift/an_chi2_drift watch numeric columns; corpus mix
    * shift lives in the token distribution). Counts per term are exact
    * BIGINTs from one explode + groupBy per side, full-outer joined on
    * term (smoothing-free: JS is finite on disjoint support, which is
    * WHY it beats KL here); each plog term gathers DECIMAL(38,18)
    * (the an_kruskal order-independent sum), ROUND(·,6); js_norm
    * divides by ln 2 for the [0,1] readout. */
  private[graft] def textJsDivergence(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    def termCounts(src: String, out: String) = docs
      .filter(col("source") === src)
      .select(explode(expr("filter(split(text, ' '), w -> w <> '')")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as(out))
    val p = termCounts("src0", "cp")
    val q = termCounts("src1", "cq")
    val joined = p.join(q, Seq("term"), "full_outer")
      .select(col("term"), coalesce(col("cp"), lit(0L)).as("cp"),
        coalesce(col("cq"), lit(0L)).as("cq"))
    val tot = joined.agg(sum(col("cp")).as("np"), sum(col("cq")).as("nq"),
      count(lit(1)).as("vocab"))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    val pp = col("cp").cast("double") / col("np").cast("double")
    val qq = col("cq").cast("double") / col("nq").cast("double")
    val mm = (pp + qq) / lit(2.0)
    joined.crossJoin(broadcast(tot))
      .agg(max(col("np")).as("n_src0"), max(col("nq")).as("n_src1"),
        max(col("vocab")).as("vocab"),
        gather(when(col("cp") > 0, pp * log(pp / mm)).otherwise(lit(0.0))).as("klp"),
        gather(when(col("cq") > 0, qq * log(qq / mm)).otherwise(lit(0.0))).as("klq"))
      .select(col("n_src0"), col("n_src1"), col("vocab"),
        round((col("klp").cast("double") + col("klq").cast("double")) / 2.0, 6).as("js"),
        round((col("klp").cast("double") + col("klq").cast("double")) / 2.0 /
          math.log(2.0), 6).as("js_norm"))
  }

  private[graft] lazy val textJsDivergenceSql =
    """WITH p AS (SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
      |           FROM documents WHERE source = 'src0'),
      |pc AS (SELECT term, COUNT(*) AS cp FROM p GROUP BY term),
      |q AS (SELECT unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
      |      FROM documents WHERE source = 'src1'),
      |qc AS (SELECT term, COUNT(*) AS cq FROM q GROUP BY term),
      |j AS (SELECT COALESCE(pc.term, qc.term) AS term,
      |        COALESCE(cp, 0) AS cp, COALESCE(cq, 0) AS cq
      |      FROM pc FULL OUTER JOIN qc ON pc.term = qc.term),
      |t AS (SELECT CAST(SUM(cp) AS BIGINT) AS np, CAST(SUM(cq) AS BIGINT) AS nq,
      |        COUNT(*) AS vocab FROM j),
      |g AS (SELECT MAX(np) AS n_src0, MAX(nq) AS n_src1, MAX(vocab) AS vocab,
      |    CAST(SUM(CAST(CASE WHEN cp > 0 THEN
      |      (CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
      |        * ln((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE))
      |          / ((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE)
      |              + CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE)) / 2.0))
      |      ELSE 0.0 END AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS klp,
      |    CAST(SUM(CAST(CASE WHEN cq > 0 THEN
      |      (CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE))
      |        * ln((CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE))
      |          / ((CAST(cp AS DOUBLE) / CAST(np AS DOUBLE)
      |              + CAST(cq AS DOUBLE) / CAST(nq AS DOUBLE)) / 2.0))
      |      ELSE 0.0 END AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS klq
      |  FROM j CROSS JOIN t)
      |SELECT n_src0, n_src1, vocab,
      |  ROUND((CAST(klp AS DOUBLE) + CAST(klq AS DOUBLE)) / 2.0, 6) AS js,
      |  ROUND((CAST(klp AS DOUBLE) + CAST(klq AS DOUBLE)) / 2.0 / ln(2.0), 6) AS js_norm
      |FROM g""".stripMargin

  /** Term burstiness (Fano factor) for the corpus's top-30 terms —
    * the dispersion signal that separates topical words (bursty:
    * present heavily in few docs) from function words (even spread),
    * which TF-IDF conflates when document frequency saturates.
    * Zero-count docs are IN the statistics (Fano over all D docs, not
    * just containing docs): VMR = (D·Σc² − T²)/(D·T) — every input an
    * exact BIGINT from one explode + groupBy, the ratio one IEEE
    * division, ROUND(·,6); top-30 by (total DESC, term) is a bounded
    * deterministic readout. */
  private[graft] def textBurstiness(s: SparkSession, dir: String): DataFrame = {
    val docs = Tables.documents(s, dir)
    val nDocs = docs.agg(count(lit(1)).as("d"))
    val perDocTerm = docs
      .select(col("doc_id"), explode(expr("filter(split(text, ' '), w -> w <> '')")).as("term"))
      .groupBy(col("doc_id"), col("term")).agg(count(lit(1)).as("c"))
    val perTerm = perDocTerm.groupBy(col("term"))
      .agg(sum(col("c")).as("t"), sum(col("c") * col("c")).as("s2"),
        count(lit(1)).as("df"))
    perTerm.crossJoin(broadcast(nDocs))
      .select(col("term"), col("t"), col("df"),
        round((col("d") * col("s2") - col("t") * col("t")).cast("double") /
          (col("d") * col("t")).cast("double"), 6).as("fano"))
      .orderBy(col("t").desc, col("term")).limit(30)
  }

  private[graft] lazy val textBurstinessSql =
    """WITH d AS (SELECT COUNT(*) AS d FROM documents),
      |pdt AS (SELECT doc_id, term, COUNT(*) AS c FROM (
      |    SELECT doc_id, unnest(list_filter(string_split(text, ' '), w -> w <> '')) AS term
      |    FROM documents) t GROUP BY doc_id, term),
      |pt AS (SELECT term, CAST(SUM(c) AS BIGINT) AS t,
      |              CAST(SUM(c * c) AS BIGINT) AS s2,
      |              COUNT(*) AS df
      |       FROM pdt GROUP BY term)
      |SELECT term, t, df,
      |  ROUND(CAST(d.d * s2 - t * t AS DOUBLE) / CAST(d.d * t AS DOUBLE), 6) AS fano
      |FROM pt CROSS JOIN d
      |ORDER BY t DESC, term LIMIT 30""".stripMargin

  private[graft] def textCharEntropy(s: SparkSession, dir: String): DataFrame = {
    // native one-pass bigram kernel (CharBigrams) — the interpreted
    // transform(sequence)+substring chain probed mildly super-linear
    // (exp 1.08 at sf1) from per-row array materialization
    val over = Tables.documents(s, dir)
      .filter(length(col("text")) > CharEntropyMaxLen - 1).limit(1).count()
    require(over == 0,
      s"text_char_entropy oracle unrolls positions to ${CharEntropyMaxLen - 1} " +
        "chars; a longer document would silently diverge Spark vs oracle")
    val grams = Tables.documents(s, dir)
      .filter(length(col("text")) >= 2)
      .select(col("lang"),
        explode(graft.functions.VectorExprs.char_bigrams(col("text"))).as("bg"))
      .groupBy(col("lang"), col("bg")).agg(count(lit(1)).as("c"))
    val perLang = grams.groupBy(col("lang")).agg(sum(col("c")).as("n"))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    grams.join(broadcast(perLang), "lang")
      .groupBy(col("lang"))
      .agg(max(col("n")).as("n_bigrams"), count(lit(1)).as("vocab"),
        gather(lit(-1.0) * col("c").cast("double") / col("n").cast("double") *
          log(col("c").cast("double") / col("n").cast("double"))).as("hg"))
      .select(col("lang"), col("n_bigrams"), col("vocab"),
        round(col("hg").cast("double"), 6).as("char_entropy"))
      .orderBy(col("lang"))
  }

  private[graft] lazy val textCharEntropySql =
    s"""WITH g AS (SELECT lang, bg, COUNT(*) AS c FROM (
      |    SELECT lang, substr(text, CAST(i.range AS INT), 2) AS bg
      |    FROM documents CROSS JOIN range(1, $CharEntropyMaxLen) i
      |    WHERE length(text) >= 2 AND i.range <= length(text) - 1) t
      |  GROUP BY lang, bg),
      |pl AS (SELECT lang, CAST(SUM(c) AS BIGINT) AS n FROM g GROUP BY lang)
      |SELECT g.lang, MAX(pl.n) AS n_bigrams, COUNT(*) AS vocab,
      |  ROUND(CAST(CAST(SUM(CAST(-1.0 * CAST(c AS DOUBLE) / CAST(pl.n AS DOUBLE)
      |    * ln(CAST(c AS DOUBLE) / CAST(pl.n AS DOUBLE)) AS DECIMAL(38,18)))
      |    AS DECIMAL(38,18)) AS DOUBLE), 6) AS char_entropy
      |FROM g JOIN pl USING (lang)
      |GROUP BY g.lang ORDER BY g.lang""".stripMargin

  /** Lexical-richness panel per language: vocabulary V, token count N,
    * hapax count V₁, TTR, Yule's K = 10⁴(Σf²−N)/N², Simpson's D =
    * Σf(f−1)/(N(N−1)) — all from ONE (lang, word) count aggregate
    * (posting-shaped: the shuffle carries words+counts, never
    * documents), every statistic exact integers until a single IEEE
    * division. The per-language diversity screen beside text_zipf's
    * spectrum slope and text_vocab_growth's Heaps curve. */
  private[graft] def textLexicalRichness(s: SparkSession, dir: String): DataFrame = {
    val wf = Tables.documents(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .groupBy(col("lang"), col("w")).agg(count(lit(1)).as("f"))
    val d = (c: Column) => c.cast("decimal(38,0)")
    wf.groupBy(col("lang"))
      .agg(sum(col("f")).as("n"), count(lit(1)).as("v"),
        sum(when(col("f") === 1, 1L).otherwise(0L)).as("v1"),
        sum(d(col("f")) * d(col("f"))).as("sf2"),
        sum(d(col("f")) * d(col("f") - 1)).as("sff1"))
      .select(col("lang"), col("n").as("n_tokens"), col("v").as("vocab"),
        col("v1").as("hapax"),
        (col("v").cast("double") / col("n").cast("double")).as("ttr"),
        ((col("sf2") - col("n")).cast("double") * 10000.0 /
          (d(col("n")) * d(col("n"))).cast("double")).as("yule_k"),
        (col("sff1").cast("double") /
          (d(col("n")) * d(col("n") - 1)).cast("double")).as("simpson_d"))
      .orderBy(col("lang"))
  }

  private[graft] lazy val textLexicalRichnessSql =
    """WITH wf AS (SELECT lang, w, COUNT(*) AS f FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents) t
      |  WHERE w <> '' GROUP BY lang, w),
      |a AS (SELECT lang, CAST(SUM(f) AS BIGINT) AS n, COUNT(*) AS v,
      |        CAST(SUM(CASE WHEN f = 1 THEN 1 ELSE 0 END) AS BIGINT) AS v1,
      |        CAST(SUM(CAST(f AS DECIMAL(38,0)) * CAST(f AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sf2,
      |        CAST(SUM(CAST(f AS DECIMAL(38,0)) * CAST(f - 1 AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sff1
      |      FROM wf GROUP BY lang)
      |SELECT lang, n AS n_tokens, v AS vocab, v1 AS hapax,
      |  CAST(v AS DOUBLE) / CAST(n AS DOUBLE) AS ttr,
      |  CAST(sf2 - n AS DOUBLE) * 10000.0
      |    / CAST(CAST(n AS DECIMAL(38,0)) * CAST(n AS DECIMAL(38,0)) AS DOUBLE) AS yule_k,
      |  CAST(sff1 AS DOUBLE)
      |    / CAST(CAST(n AS DECIMAL(38,0)) * CAST(n - 1 AS DECIMAL(38,0)) AS DOUBLE) AS simpson_d
      |FROM a ORDER BY lang""".stripMargin

  /** Per-source 3-gram novelty: the fraction of a doc's DISTINCT word
    * trigrams whose first corpus occurrence (min doc_id over the gram)
    * is the doc itself — the "how much new text does this source add"
    * curation signal. Spark groups grams by xxhash64 (the
    * dedup_segments posture: only 8-byte keys shuffle, never gram
    * text; a 64-bit collision over a ≤10⁹-gram vocabulary is
    * negligible and the oracle's raw-gram grouping would surface one
    * as a hash mismatch); min-doc_id aggregate + one posting join. */
  private[graft] def textNgramNovelty(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    val grams = graft.operators.Spread.forCompute(Tables.documents(s, dir))
      .select(col("doc_id"), col("source"),
        explode(when(size(ws) >= 3,
          transform(sequence(lit(1), size(ws) - 2),
            i => concat_ws(" ", element_at(ws, i), element_at(ws, i + 1),
              element_at(ws, i + 2))))
          .otherwise(array().cast("array<string>"))).as("g"))
      .select(col("doc_id"), col("source"), xxhash64(col("g")).as("h"))
      .distinct()
    val first = grams.groupBy(col("h")).agg(min(col("doc_id")).as("first_doc"))
    grams.join(first, "h")
      .groupBy(col("source"))
      .agg(countDistinct(col("doc_id")).as("n_docs"),
        count(lit(1)).as("n_grams"),
        sum((col("doc_id") === col("first_doc")).cast("long")).as("novel_grams"))
      .select(col("source"), col("n_docs"), col("n_grams"), col("novel_grams"),
        (col("novel_grams").cast("double") / col("n_grams").cast("double")).as("novelty_rate"))
      .orderBy(col("source"))
  }

  private[graft] lazy val textNgramNoveltySql =
    """WITH t AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
      |g AS (SELECT DISTINCT doc_id, source,
      |        ws[CAST(j AS INT)] || ' ' || ws[CAST(j AS INT) + 1] || ' ' || ws[CAST(j AS INT) + 2] AS gram
      |      FROM t, range(1, 100000) pos(j) WHERE j <= len(ws) - 2),
      |f AS (SELECT gram, MIN(doc_id) AS first_doc FROM g GROUP BY gram)
      |SELECT source, COUNT(DISTINCT g.doc_id) AS n_docs, COUNT(*) AS n_grams,
      |  CAST(SUM(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END) AS BIGINT) AS novel_grams,
      |  CAST(SUM(CASE WHEN g.doc_id = f.first_doc THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS novelty_rate
      |FROM g JOIN f USING (gram)
      |GROUP BY source ORDER BY source""".stripMargin

  /** RAKE keyword extraction (Rose et al. 2010) over the corpus:
    * stopwords {a, the} delimit candidate phrases (gaps-islands on word
    * positions: island id = pos − row_number over non-stop words per
    * doc), word score = deg/freq over phrase members (deg = Σ phrase
    * lengths containing the word), phrase score = Σ member scores
    * gathered in DECIMAL(38,18), top-20 by (score, phrase) — all
    * row-local until two posting-shaped aggregates over words. Phrase
    * assembly is deterministic: array_sort on (pos, word) structs, not
    * bare collect_list order. */
  private[graft] def textRake(s: SparkSession, dir: String): DataFrame = {
    val words = Tables.documents(s, dir)
      .select(col("doc_id"), posexplode(split(col("text"), " ")).as(Seq("pos", "w")))
      .filter(col("w") =!= "")
    val nonStop = words.filter(!col("w").isin("a", "the"))
      .withColumn("grp", col("pos") - row_number().over(
        Window.partitionBy(col("doc_id")).orderBy(col("pos"))))
    val phrases = nonStop.groupBy(col("doc_id"), col("grp"))
      .agg(array_join(transform(array_sort(collect_list(struct(col("pos"), col("w")))),
        x => x.getField("w")), " ").as("phrase"),
        count(lit(1)).as("plen"))
    val members = nonStop.join(phrases, Seq("doc_id", "grp"))
    val wordStats = members.groupBy(col("w"))
      .agg(count(lit(1)).as("freq"), sum(col("plen")).as("deg"))
    def gather(c: Column) = sum(c.cast("decimal(38,18)")).cast("decimal(38,18)")
    val scored = members.join(wordStats, "w")
      .groupBy(col("doc_id"), col("grp"), col("phrase"))
      .agg(gather(col("deg").cast("double") / col("freq").cast("double")).as("sc"))
    scored.groupBy(col("phrase"))
      .agg(count(lit(1)).as("n_occ"), max(col("sc")).as("sc"))
      .withColumn("score", round(col("sc").cast("double"), 6))
      // Top-20 via orderBy+limit → TakeOrderedAndProject; rank the
      // 20-row result, never the corpus-sized phrase table.
      .orderBy(col("score").desc, col("phrase")).limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("score").desc, col("phrase"))))
      .select(col("rnk"), col("phrase"), col("n_occ"), col("score"))
      .orderBy(col("rnk"))
  }

  private[graft] lazy val textRakeSql =
    """WITH wp AS (SELECT doc_id, CAST(j AS BIGINT) AS pos, ws[CAST(j AS INT)] AS w
      |  FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents) t,
      |       range(1, 100000) p(j)
      |  WHERE j <= len(ws) AND ws[CAST(j AS INT)] <> ''),
      |ns AS (SELECT doc_id, pos, w,
      |         pos - ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS grp
      |       FROM wp WHERE w NOT IN ('a', 'the')),
      |ph AS (SELECT doc_id, grp,
      |         string_agg(w, ' ' ORDER BY pos) AS phrase, COUNT(*) AS plen
      |       FROM ns GROUP BY doc_id, grp),
      |mem AS (SELECT ns.doc_id, ns.grp, ns.w, ph.phrase, ph.plen
      |        FROM ns JOIN ph ON ns.doc_id = ph.doc_id AND ns.grp = ph.grp),
      |ws AS (SELECT w, COUNT(*) AS freq, CAST(SUM(plen) AS BIGINT) AS deg
      |       FROM mem GROUP BY w),
      |sc AS (SELECT mem.doc_id, mem.grp, mem.phrase,
      |         CAST(SUM(CAST(CAST(ws.deg AS DOUBLE) / CAST(ws.freq AS DOUBLE)
      |           AS DECIMAL(38,18))) AS DECIMAL(38,18)) AS sc
      |       FROM mem JOIN ws ON mem.w = ws.w
      |       GROUP BY mem.doc_id, mem.grp, mem.phrase),
      |agg AS (SELECT phrase, COUNT(*) AS n_occ,
      |          ROUND(CAST(MAX(sc) AS DOUBLE), 6) AS score
      |        FROM sc GROUP BY phrase),
      |rk AS (SELECT phrase, n_occ, score,
      |         ROW_NUMBER() OVER (ORDER BY score DESC, phrase) AS rnk FROM agg)
      |SELECT rnk, phrase, n_occ, score FROM rk WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  /** Out-of-vocabulary rate per source against the corpus top-1000
    * vocabulary ((count DESC, word ASC) deterministic cut): the
    * tokenizer-coverage screen for a fixed-vocab model. Vocab is a
    * 1000-row broadcast; the per-source pass is one posting aggregate
    * joined against it — the corpus shuffles word counts once. */
  private[graft] def textOovRate(s: SparkSession, dir: String): DataFrame = {
    val toks = Tables.documents(s, dir)
      .select(col("source"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
    // Vocab cut via orderBy+limit → TakeOrderedAndProject (each
    // partition keeps 1000, driver merges), not a global row_number
    // window over the word-vocabulary-sized count table.
    val vocab = toks.groupBy(col("w")).agg(count(lit(1)).as("c"))
      .orderBy(col("c").desc, col("w")).limit(1000)
      .select(col("w"), lit(1).as("in_vocab"))
    toks.groupBy(col("source"), col("w")).agg(count(lit(1)).as("c"))
      .join(broadcast(vocab), Seq("w"), "left")
      .groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        sum(when(col("in_vocab").isNull, col("c")).otherwise(0L)).as("oov_tokens"))
      .select(col("source"), col("n_tokens"), col("oov_tokens"),
        (col("oov_tokens").cast("double") / col("n_tokens").cast("double")).as("oov_rate"))
      .orderBy(col("source"))
  }

  private[graft] lazy val textOovRateSql =
    """WITH tok AS (SELECT source, w FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS w FROM documents) t
      |  WHERE w <> ''),
      |vc AS (SELECT w, COUNT(*) AS c FROM tok GROUP BY w),
      |vocab AS (SELECT w FROM (
      |    SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rnk FROM vc) r
      |  WHERE rnk <= 1000),
      |sv AS (SELECT source, tok.w, COUNT(*) AS c,
      |         MAX(CASE WHEN vocab.w IS NOT NULL THEN 1 ELSE 0 END) AS iv
      |       FROM tok LEFT JOIN vocab ON tok.w = vocab.w
      |       GROUP BY source, tok.w)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN iv = 0 THEN c ELSE 0 END) AS BIGINT) AS oov_tokens,
      |  CAST(SUM(CASE WHEN iv = 0 THEN c ELSE 0 END) AS DOUBLE)
      |    / CAST(SUM(c) AS DOUBLE) AS oov_rate
      |FROM sv GROUP BY source ORDER BY source""".stripMargin

  /** Word-length profile per language: mean length (exact integer sums,
    * one division), max, and a 4-band histogram (1–2 / 3–5 / 6–8 / 9+)
    * — the cheap morphology fingerprint that separates scripts and
    * catches tokenizer-hostile sources. Row-local then one posting
    * aggregate. */
  private[graft] def textWordLengths(s: SparkSession, dir: String): DataFrame =
    Tables.documents(s, dir)
      .select(col("lang"), explode(split(col("text"), " ")).as("w"))
      .filter(col("w") =!= "")
      .withColumn("l", length(col("w")).cast("long"))
      .groupBy(col("lang"))
      .agg(count(lit(1)).as("n_words"),
        sum(col("l")).as("sum_len"),
        max(col("l")).as("max_len"),
        sum((col("l") <= 2).cast("long")).as("len_1_2"),
        sum((col("l") >= 3 && col("l") <= 5).cast("long")).as("len_3_5"),
        sum((col("l") >= 6 && col("l") <= 8).cast("long")).as("len_6_8"),
        sum((col("l") >= 9).cast("long")).as("len_9p"))
      .select(col("lang"), col("n_words"),
        (col("sum_len").cast("double") / col("n_words").cast("double")).as("mean_len"),
        col("max_len"), col("len_1_2"), col("len_3_5"), col("len_6_8"), col("len_9p"))
      .orderBy(col("lang"))

  private[graft] lazy val textWordLengthsSql =
    """WITH w AS (SELECT lang, length(w) AS l FROM (
      |    SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents) t
      |  WHERE w <> '')
      |SELECT lang, COUNT(*) AS n_words,
      |  CAST(CAST(SUM(l) AS BIGINT) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_len,
      |  CAST(MAX(l) AS BIGINT) AS max_len,
      |  CAST(SUM(CASE WHEN l <= 2 THEN 1 ELSE 0 END) AS BIGINT) AS len_1_2,
      |  CAST(SUM(CASE WHEN l BETWEEN 3 AND 5 THEN 1 ELSE 0 END) AS BIGINT) AS len_3_5,
      |  CAST(SUM(CASE WHEN l BETWEEN 6 AND 8 THEN 1 ELSE 0 END) AS BIGINT) AS len_6_8,
      |  CAST(SUM(CASE WHEN l >= 9 THEN 1 ELSE 0 END) AS BIGINT) AS len_9p
      |FROM w GROUP BY lang ORDER BY lang""".stripMargin

  /** Boilerplate-template census: documents sharing the same first-8-
    * word prefix (the "generated from one template" signal a dedup
    * sweep by full-document hash misses): prefixes with df ≥ 3, top-20
    * by (df DESC, prefix), with the source spread per template. One
    * posting-shaped prefix aggregate — the prefix (≤ 8 words) is the
    * only text that shuffles. */
  private[graft] def textTemplates(s: SparkSession, dir: String): DataFrame = {
    val ws = split(col("text"), " ")
    Tables.documents(s, dir)
      .select(col("doc_id"), col("source"),
        array_join(slice(ws, 1, 8), " ").as("prefix"))
      .filter(size(ws) >= 8)
      .groupBy(col("prefix"))
      .agg(count(lit(1)).as("n_docs"), countDistinct(col("source")).as("n_sources"))
      .filter(col("n_docs") >= 3)
      // Top-20 via orderBy+limit → TakeOrderedAndProject; rank the
      // 20-row result, never the prefix-census-sized frame.
      .orderBy(col("n_docs").desc, col("prefix")).limit(20)
      .withColumn("rnk", row_number().over(
        Window.orderBy(col("n_docs").desc, col("prefix"))))
      .select(col("rnk"), col("prefix"), col("n_docs"), col("n_sources"))
      .orderBy(col("rnk"))
  }

  private[graft] lazy val textTemplatesSql =
    """WITH p AS (SELECT doc_id, source,
      |    array_to_string(string_split(text, ' ')[1:8], ' ') AS prefix
      |  FROM documents WHERE len(string_split(text, ' ')) >= 8),
      |g AS (SELECT prefix, COUNT(*) AS n_docs, COUNT(DISTINCT source) AS n_sources
      |      FROM p GROUP BY prefix HAVING COUNT(*) >= 3),
      |r AS (SELECT prefix, n_docs, n_sources,
      |        ROW_NUMBER() OVER (ORDER BY n_docs DESC, prefix) AS rnk FROM g)
      |SELECT rnk, prefix, n_docs, n_sources FROM r WHERE rnk <= 20 ORDER BY rnk""".stripMargin

  /** Gopher-style quality-rule scorecard per source (Rae et al. 2021
    * §A1.1 adapted to this corpus's vocabulary): word-count bounds,
    * mean-word-length band, minimum stopword evidence, and top-word
    * dominance — reported as PER-RULE failure counts so a curation run
    * can see WHICH gate bites before applying text_filter_pipeline's
    * keep/drop. Row-local flags except top-word share (posting-shaped
    * per-doc aggregate, the text_filter_pipeline machinery). */
  private[graft] def textGopherRules(s: SparkSession, dir: String): DataFrame = {
    import graft.text.TextFunctions
    val docs = Tables.documents(s, dir)
      .select(col("doc_id"), col("source"), TextFunctions.words(col("text")).as("ws"))
    val nWords = size(col("ws"))
    val meanLen = (aggregate(col("ws"), lit(0L), (acc, w) => acc + length(w))
      .cast("double") / nWords.cast("double"))
    val nStop = size(filter(col("ws"),
      w => w.isin(TextFunctions.Stopwords("en"): _*)))
    val top = docs.select(col("doc_id"), explode(col("ws")).as("w"))
      .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg((max(col("c")).cast("double") / sum(col("c")).cast("double")).as("top_frac"))
    docs.join(top, Seq("doc_id"))
      .select(col("source"),
        (nWords < 50).cast("long").as("f_words"),
        (meanLen < 3.0 || meanLen > 10.0).cast("long").as("f_mean_len"),
        (nStop < 2).cast("long").as("f_stopwords"),
        (col("top_frac") > 0.2).cast("long").as("f_top_word"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("f_words")).as("n_fail_words"),
        sum(col("f_mean_len")).as("n_fail_mean_len"),
        sum(col("f_stopwords")).as("n_fail_stopwords"),
        sum(col("f_top_word")).as("n_fail_top_word"),
        sum(when(col("f_words") + col("f_mean_len") + col("f_stopwords") +
          col("f_top_word") === 0, 1L).otherwise(0L)).as("n_pass"))
      .orderBy(col("source"))
  }

  private[graft] lazy val textGopherRulesSql = {
    val stop = graft.text.TextFunctions.Stopwords("en")
      .map(w => s"'$w'").mkString(",")
    s"""WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS ws FROM documents),
       |cnt AS (SELECT doc_id, gram, COUNT(*) AS c
       |    FROM (SELECT doc_id, unnest(ws) AS gram FROM w) GROUP BY 1, 2),
       |top AS (SELECT doc_id, CAST(MAX(c) AS DOUBLE) / CAST(SUM(c) AS DOUBLE) AS top_frac
       |    FROM cnt GROUP BY 1),
       |f AS (SELECT source,
       |    CASE WHEN len(ws) < 50 THEN 1 ELSE 0 END AS f_words,
       |    CASE WHEN CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
       |        / CAST(len(ws) AS DOUBLE) < 3.0
       |      OR CAST(list_sum(list_transform(ws, x -> length(x))) AS DOUBLE)
       |        / CAST(len(ws) AS DOUBLE) > 10.0 THEN 1 ELSE 0 END AS f_mean_len,
       |    CASE WHEN len(list_filter(ws, x -> x IN ($stop))) < 2 THEN 1 ELSE 0 END AS f_stopwords,
       |    CASE WHEN top.top_frac > 0.2 THEN 1 ELSE 0 END AS f_top_word
       |  FROM w JOIN top USING (doc_id))
       |SELECT source, COUNT(*) AS n_docs,
       |  CAST(SUM(f_words) AS BIGINT) AS n_fail_words,
       |  CAST(SUM(f_mean_len) AS BIGINT) AS n_fail_mean_len,
       |  CAST(SUM(f_stopwords) AS BIGINT) AS n_fail_stopwords,
       |  CAST(SUM(f_top_word) AS BIGINT) AS n_fail_top_word,
       |  CAST(SUM(CASE WHEN f_words + f_mean_len + f_stopwords + f_top_word = 0
       |    THEN 1 ELSE 0 END) AS BIGINT) AS n_pass
       |FROM f GROUP BY source ORDER BY source""".stripMargin
  }

  /** Top-k vocabulary token-coverage curve — the tokenizer-budget
    * planning number ([[textZipf]] fits the rank-frequency LAW; this
    * emits the operational readout: what fraction of all corpus tokens
    * the k most frequent terms absorb, for candidate vocab sizes k).
    * Vocab counts are exact BIGINTs from one explode+groupBy; the
    * frequency-descending global order (−count, term — deterministic
    * tie order shared by both engines) and cumulative covered-token
    * totals come from ONE [[graft.operators.PrefixSum]] scan, never a
    * single-partition window over the vocab-sized frame; each k row
    * gathers max(cum ≤ k) against the exact total. coverage ROUND 6. */
  private[graft] def textCoverageCurve(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val ks = Seq(1L, 5L, 10L, 25L, 100L, 10000L)
    val tc = Tables.documents(s, dir)
      .select(explode(expr("filter(split(text, ' '), w -> w <> '')")).as("term"))
      .groupBy(col("term")).agg(count(lit(1)).as("cnt"))
      .select(col("term"), col("cnt"), (-col("cnt")).as("sc"))
    val scan = graft.operators.PrefixSum.withRunningTotals(
      tc, Seq("sc", "term"), Seq("cnt"))
    val tot = scan.agg(max(col("cnt_cum")).as("total"), max(col("rn")).as("vocab"))
    val kdf = ks.toDF("k")
    scan.crossJoin(broadcast(kdf)).filter(col("rn") <= col("k"))
      .groupBy(col("k"))
      .agg(max(col("rn")).as("top_terms"), max(col("cnt_cum")).as("covered"))
      .crossJoin(broadcast(tot))
      .select(col("k"), col("top_terms"), col("covered"), col("total"),
        round(col("covered").cast("double") / col("total").cast("double"), 6)
          .as("coverage"))
      .orderBy(col("k"))
  }

  private[graft] lazy val textCoverageCurveSql =
    """WITH tc AS (SELECT term, COUNT(*) AS cnt FROM (
      |    SELECT unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
      |    FROM documents) GROUP BY term),
      |scan AS (SELECT term, cnt,
      |    CAST(SUM(cnt) OVER (ORDER BY -cnt, term) AS BIGINT) AS cnt_cum,
      |    CAST(ROW_NUMBER() OVER (ORDER BY -cnt, term) AS BIGINT) AS rn
      |  FROM tc),
      |tot AS (SELECT MAX(cnt_cum) AS total, MAX(rn) AS vocab FROM scan),
      |ks AS (SELECT CAST(unnest([1, 5, 10, 25, 100, 10000]) AS BIGINT) AS k)
      |SELECT k, MAX(rn) AS top_terms, MAX(cnt_cum) AS covered,
      |  MAX(tot.total) AS total,
      |  ROUND(CAST(MAX(cnt_cum) AS DOUBLE) / CAST(MAX(tot.total) AS DOUBLE), 6)
      |    AS coverage
      |FROM scan CROSS JOIN ks CROSS JOIN tot
      |WHERE rn <= k GROUP BY k ORDER BY k""".stripMargin

  /** Heaps-law parameter fit K·n^β — the REGRESSION over
    * [[textVocabGrowth]]'s checkpoint curve (vocab_growth emits the
    * raw curve plus a point estimate per bucket; this fits ONE (K, β)
    * by OLS of ln V on ln n across all checkpoints, the number a
    * corpus-collection plan actually extrapolates with). Checkpoint
    * cumulative (tokens, vocab) pairs come from the same
    * explode + min-first-doc + ONE [[graft.operators.PrefixSum]]
    * construction; each ln term is a correctly-rounded double gathered
    * DECIMAL(38,18) (order-independent, engine-portable); β, K, r²
    * ROUND(·,6). */
  private[graft] def textHeapsFit(s: SparkSession, dir: String): DataFrame = {
    val d18 = (c: Column) => c.cast("decimal(38,18)")
    val docs = Tables.documents(s, dir)
    val words = docs.select(col("doc_id"),
      explode(expr("filter(split(text, ' '), w -> w <> '')")).as("term"))
    val firstDoc = words.groupBy(col("term")).agg(min(col("doc_id")).as("fd"))
      .groupBy((col("fd") / 50).cast("bigint").as("bucket"))
      .agg(count(lit(1)).as("vocab_new"))
    val tokens = docs.select((col("doc_id") / 50).cast("bigint").as("bucket"),
        expr("size(filter(split(text, ' '), w -> w <> ''))").cast("long").as("nw"))
      .groupBy(col("bucket")).agg(sum(col("nw")).as("tokens"))
    val merged = tokens.join(firstDoc, Seq("bucket"), "left")
      .select(col("bucket"), col("tokens"),
        coalesce(col("vocab_new"), lit(0L)).as("vocab_new"))
    val scan = graft.operators.PrefixSum.withRunningTotals(merged, Seq("bucket"),
      Seq("tokens", "vocab_new"))
    val xE = log(col("tokens_cum").cast("double"))
    val yE = log(col("vocab_new_cum").cast("double"))
    val m = scan.filter(col("tokens_cum") > 0 && col("vocab_new_cum") > 0)
      .agg(count(lit(1)).as("n"),
        sum(d18(xE)).as("sx"), sum(d18(yE)).as("sy"),
        sum(d18(xE * xE)).as("sxx"), sum(d18(xE * yE)).as("sxy"),
        sum(d18(yE * yE)).as("syy"))
    val nd = col("n").cast("double")
    val (sx, sy) = (col("sx").cast("double"), col("sy").cast("double"))
    val (sxx, sxy, syy) = (col("sxx").cast("double"),
      col("sxy").cast("double"), col("syy").cast("double"))
    val slope = (nd * sxy - sx * sy) / (nd * sxx - sx * sx)
    val icept = (sy - slope * sx) / nd
    val r2 = ((nd * sxy - sx * sy) * (nd * sxy - sx * sy)) /
      ((nd * sxx - sx * sx) * (nd * syy - sy * sy))
    m.select(col("n").as("n_checkpoints"),
      round(slope, 6).as("heaps_beta"),
      round(exp(icept), 6).as("heaps_k"),
      round(r2, 6).as("r2"))
  }

  private[graft] lazy val textHeapsFitSql = {
    val x = "ln(CAST(tokens_cum AS DOUBLE))"
    val y = "ln(CAST(vocab_cum AS DOUBLE))"
    def g(e: String) = s"CAST(SUM(CAST($e AS DECIMAL(38,18))) AS DECIMAL(38,18))"
    val slope = """((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                   |  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                   | / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                   |  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))"""
      .stripMargin.replace("\n", "")
    val icept = s"((CAST(sy AS DOUBLE) - $slope * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE))"
    val r2 = """(((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                |  * (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                |   - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)))
                | / ((CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                |   - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
                |  * (CAST(n AS DOUBLE) * CAST(syy AS DOUBLE)
                |   - CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))))"""
      .stripMargin.replace("\n", "")
    s"""WITH w AS (SELECT doc_id,
       |    unnest(list_filter(string_split(text, ' '), x -> x <> '')) AS term
       |  FROM documents),
       |f1 AS (SELECT term, CAST(MIN(doc_id) // 50 AS BIGINT) AS bucket2
       |       FROM w GROUP BY term),
       |fd2 AS (SELECT bucket2, COUNT(*) AS vocab_new FROM f1 GROUP BY 1),
       |tk AS (SELECT CAST(doc_id // 50 AS BIGINT) AS bucket,
       |         CAST(SUM(len(list_filter(string_split(text, ' '), x -> x <> ''))) AS BIGINT)
       |           AS tokens
       |       FROM documents GROUP BY 1),
       |mg AS (SELECT bucket, tokens, COALESCE(vocab_new, 0) AS vocab_new
       |      FROM tk LEFT JOIN fd2 ON tk.bucket = fd2.bucket2),
       |cp AS (SELECT CAST(SUM(tokens) OVER (ORDER BY bucket) AS BIGINT) AS tokens_cum,
       |         CAST(SUM(vocab_new) OVER (ORDER BY bucket) AS BIGINT) AS vocab_cum
       |       FROM mg),
       |m AS (SELECT COUNT(*) AS n,
       |    ${g(x)} AS sx, ${g(y)} AS sy,
       |    ${g(s"$x * $x")} AS sxx, ${g(s"$x * $y")} AS sxy,
       |    ${g(s"$y * $y")} AS syy
       |  FROM cp WHERE tokens_cum > 0 AND vocab_cum > 0)
       |SELECT n AS n_checkpoints, ROUND($slope, 6) AS heaps_beta,
       |  ROUND(exp($icept), 6) AS heaps_k,
       |  ROUND($r2, 6) AS r2
       |FROM m""".stripMargin
  }
}
