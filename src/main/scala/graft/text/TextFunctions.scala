package graft.text

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, language ID, fingerprinting. All pure `Column`
  * expressions (codegen'd, one projection pass at any scale, no UDFs).
  */
object TextFunctions {

  /** Default stopword markers per language (tiny on purpose — the
    * heuristic needs only high-frequency markers, not a lexicon). */
  val Stopwords: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "and", "of", "is"),
    "es" -> Seq("el", "la", "los", "de", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"))

  /** Whitespace word array (single-space tokenizer; callers normalize
    * whitespace upstream if needed). */
  def words(c: Column): Column = split(c, " ")

  /** Whitespace token count. */
  def tokenCount(c: Column): Column = size(words(c))

  /** BPE-ish token estimate: alnum runs + individual punctuation marks
    * (the usual pre-tokenizer shape). */
  def bpeTokenEstimate(c: Column): Column =
    regexp_count(c, lit("[a-z0-9]+|[^a-z0-9 ]"))

  /** Count of words from `set` (exact membership on the word array). */
  def markerCount(c: Column, set: Seq[String]): Column =
    markerCountWords(words(c), set)

  /** [[markerCount]] over an already-tokenized word array — use when
    * several signals share one split (re-splitting per signal is the
    * text_tfidf double-tokenize lesson). */
  def markerCountWords(arr: Column, set: Seq[String]): Column =
    size(filter(arr, w => w.isin(set: _*)))

  /** Heuristic language ID from per-language marker-word counts.
    * Deterministic tie-break: languages checked in alphabetical order,
    * `>=` against the global max, so the earliest language wins ties;
    * all-zero counts → "und". */
  def langId(c: Column, markers: Map[String, Seq[String]] = Stopwords): Column =
    langIdWords(words(c), markers)

  /** [[langId]] over an already-tokenized word array. */
  def langIdWords(arr: Column, markers: Map[String, Seq[String]] = Stopwords): Column = {
    val langs = markers.keys.toSeq.sorted
    val counts = langs.map(l => l -> markerCountWords(arr, markers(l))).toMap
    val mx = greatest(langs.map(counts): _*)
    langs.foldLeft(when(mx === 0, lit("und"))) { (acc, l) =>
      acc.when(counts(l) === mx, lit(l))
    }.otherwise(lit("und"))
  }

  /** Characteristic character-trigram profiles for [[langIdTrigram]]:
    * high-frequency function-word and morphology trigrams per language
    * (public linguistic commonplaces, ASCII-only so char counting is
    * engine-portable). Much more robust than the 5-marker-word
    * heuristic: trigrams fire inside arbitrary vocabulary ("sch"/"ung"
    * match any German derivation, not just a stopword hit), so short
    * and stopword-poor text still accumulates signal. */
  val TrigramProfiles: Map[String, Seq[String]] = Map(
    "de" -> Seq("der", "ein", "ich", "sch", "che", "und", "ung", "cht", "die", "gen"),
    "en" -> Seq("the", "ing", "and", "tio", "ent", "of ", "ed ", "to ", "is ", " th"),
    "es" -> Seq("cio", "aci", "que", "los", "ado", "nte", "era", "os ", "rio", " es"),
    "fr" -> Seq("les", "une", "eur", "oir", "ons", "eau", "ien", "ant", "pas", " le", "iqu", " et"))

  /** Occurrences of the literal `tri` (length 3) in `padded` counted by
    * replace-shrinkage — one codegen'd string pass per trigram, no
    * regex engine. Greedy left-to-right non-overlap, same as SQL
    * replace() everywhere. */
  private def trigramOccurrences(padded: Column, tri: String): Column =
    (length(padded) - length(replace(padded, lit(tri), lit("")))) / lit(3)

  /** Character-trigram language ID over [[TrigramProfiles]] (pure
    * Column algebra — map-only, codegen'd, no UDF): pad+lowercase once,
    * score = total profile-trigram occurrences, argmax with the same
    * deterministic contract as [[langId]] (alphabetical tie-break,
    * all-zero → "und"). */
  def langIdTrigram(c: Column,
                    profiles: Map[String, Seq[String]] = TrigramProfiles): Column = {
    val padded = concat(lit(" "), lower(c), lit(" "))
    val langs = profiles.keys.toSeq.sorted
    val scores = langs.map(l =>
      l -> profiles(l).map(t => trigramOccurrences(padded, t)).reduce(_ + _)).toMap
    val mx = greatest(langs.map(scores): _*)
    langs.foldLeft(when(mx === 0, lit("und"))) { (acc, l) =>
      acc.when(scores(l) === mx, lit(l))
    }.otherwise(lit("und"))
  }

  /** Quality signals: char count, word count, distinct-word ratio,
    * stopword ratio, punctuation ratio, mean word length — plus a
    * composite score in [0,1]-ish. Returns the named columns. */
  def qualityColumns(c: Column): Seq[(String, Column)] = {
    val w = words(c)
    val nChars = length(c)
    val nWords = size(w)
    val distinctRatio = size(array_distinct(w)) * lit(1.0) / nWords
    val stopRatio = markerCount(c, Stopwords("en")) * lit(1.0) / nWords
    val punctRatio = regexp_count(c, lit("[^a-z0-9 ]")) * lit(1.0) / nChars
    val meanWordLen = (nChars - nWords + lit(1)) * lit(1.0) / nWords
    val score = distinctRatio * lit(0.5) +
      least(stopRatio * lit(4.0), lit(1.0)) * lit(0.3) +
      (lit(1.0) - least(punctRatio * lit(10.0), lit(1.0))) * lit(0.2)
    Seq(
      "n_chars" -> nChars,
      "n_words" -> nWords,
      "distinct_ratio" -> distinctRatio,
      "stopword_ratio" -> stopRatio,
      "punct_ratio" -> punctRatio,
      "mean_word_len" -> meanWordLen,
      "quality_score" -> score)
  }

  /** Exact content fingerprint (md5 hex — stable across engines). */
  def contentFingerprint(c: Column): Column = md5(c)

  /** Winnowing-style rolling fingerprint: min/max xxhash64 over word
    * k-shingles — a compact sketch for shift-tolerant near-dup checks.
    * (Spark-hash based, so verified by ScalaTest rather than SQL oracle.) */
  /** PII redaction: mask emails, international/US-style phone numbers,
    * and IPv4 addresses with typed placeholders — the scrub pass every
    * training-data pipeline runs before text leaves the landing zone.
    * Three chained `regexp_replace` expressions: still one codegen'd
    * projection, no UDF, linear in text size at any scale. Patterns are
    * deliberately conservative (precision over recall): a redactor
    * that eats version strings or timestamps corrupts more data than
    * it protects. Order matters — emails first, so user@host never
    * survives as a "phone-like" digit run; IPv4 before phone, so
    * dotted quads don't half-match the phone pattern. */
  def redactPii(c: Column): Column = {
    val email = regexp_replace(c,
      lit("[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"), lit("<EMAIL>"))
    val ip = regexp_replace(email,
      lit("\\b(?:\\d{1,3}\\.){3}\\d{1,3}\\b"), lit("<IP>"))
    regexp_replace(ip,
      lit("(?<!\\d)(?:\\+\\d{1,2} )?(?:\\(\\d{3}\\) ?|\\d{3}[-.])\\d{3}[-.]\\d{4}(?!\\d)"),
      lit("<PHONE>"))
  }

  def shingleSketch(c: Column, k: Int = 3): Column = {
    val sh = shingles(c, k)
    val hs = transform(sh, s => xxhash64(s))
    struct(array_min(hs).as("min_hash"), array_max(hs).as("max_hash"),
      size(hs).as("n_shingles"))
  }

  /** Distinct word k-gram shingles of a text column (native one-pass
    * kernel; first-occurrence order, empty array below k words). */
  def shingles(c: Column, k: Int = 3): Column =
    graft.functions.VectorExprs.word_shingles(c, k)
}
