package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: token counting,
  * quality scoring, n-gram-heuristic language ID, and document
  * fingerprinting. All expressions are built-in-function compositions
  * (codegen-friendly; no UDFs) and RE2-compatible regexes so the same logic
  * runs on any engine.
  */
object TextStats {

  /** Whitespace token count. */
  def tokenCount(text: Column): Column = size(split(text, " "))

  /** Email pattern shared by [[piiRedact]] and its oracle: explicit
    * character classes only (no \d/\w/\b), so Java regex and RE2 agree
    * byte-for-byte on every match. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"

  /** IPv4-shaped pattern for [[piiRedact]] — same RE2/Java-portable
    * discipline (dotted quads; semantic range checks are a later pass). */
  val Ipv4Re = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** PII redaction over the text column — the C4/CCNet curation step the
    * privacy AUDITS (k-anonymity/l-diversity/ε-DP over structured
    * columns) don't cover: emails then IPv4 literals are replaced with
    * typed placeholder tokens, and per-document match counts ride along
    * as the scrubbing ledger. Emails are scrubbed FIRST so an address's
    * host part can never be double-counted as an IP-shaped string; both
    * counts are taken on the text the pattern actually scanned
    * (n_emails on the original, n_ips on the email-scrubbed text).
    * Built-in regexp functions only (codegen'd, no UDFs); patterns are
    * RE2-portable so the DuckDB oracle replays every replacement.
    * Output: (id, redacted, n_emails, n_ips). */
  def piiRedact(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val emailScrubbed =
      regexp_replace(col(textCol), EmailRe, "<EMAIL>")
    df.where(col(textCol).isNotNull).select(
      col(idCol).as("id"),
      regexp_replace(emailScrubbed, Ipv4Re, "<IP>").as("redacted"),
      regexp_count(col(textCol), lit(EmailRe)).cast("long").as("n_emails"),
      regexp_count(emailScrubbed, lit(Ipv4Re)).cast("long").as("n_ips"))
  }

  /** BPE-ish subword count: alpha runs split from digit/punctuation singles —
    * a cheap, deterministic proxy for tokenizer cost estimation. */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit("[a-zA-Z]+|[0-9]|[^a-zA-Z0-9 ]"), lit(0)))

  private val stopwords = Seq("the", "a", "of", "and", "to", "in", "is")

  /** The quality-tier CASE, the single definition [[qualityFeatures]] (over
    * its materialized feature columns) and [[qualityBucket]] (inline over
    * text) both use — the thresholds can't drift apart. */
  def qualityBucketFrom(nTokens: Column, punctRatio: Column,
                        avgTokenLen: Column): Column =
    when(nTokens >= 50 && punctRatio < 0.1
      && avgTokenLen >= 3 && avgTokenLen <= 10, "high")
      .when(nTokens >= 10, "medium")
      .otherwise("low")

  /** The quality tier as a pure Column over the text — lets an eligibility
    * filter run in the scan stage of ONE pass instead of joining
    * [[qualityFeatures]] output back on the id (at 100 TB that join
    * shuffles the whole corpus for a filter). Codegen's common-subexpression
    * elimination dedupes the repeated token/length terms. */
  def qualityBucket(text: Column): Column = {
    val nTok = tokenCount(text)
    val nonSpace = length(regexp_replace(text, " ", ""))
    qualityBucketFrom(
      nTok,
      size(regexp_extract_all(text, lit("[^a-zA-Z0-9 ]"), lit(0))).cast("double")
        / length(text).cast("double"),
      nonSpace.cast("double") / nTok.cast("double"))
  }

  /** Per-document quality features + a bucketed score. `carryCols` ride
    * along unchanged (e.g. the source/stratum for [[qualityDrift]]) so a
    * grouped consumer stays a ONE-scan pipeline instead of re-joining the
    * input. */
  def qualityFeatures(df: DataFrame, idCol: String, textCol: String,
                      carryCols: Seq[String] = Nil): DataFrame = {
    val t = col(textCol)
    val nTok = tokenCount(t)
    val nonSpace = length(regexp_replace(t, " ", ""))
    val stopHits = size(filter(split(t, " "), w => w.isin(stopwords.map(lit): _*)))
    df.select(
      (col(idCol) +: carryCols.map(col)) ++ Seq(
        length(t).as("n_chars"),
        nTok.as("n_tokens"),
        (nonSpace.cast("double") / nTok.cast("double")).as("avg_token_len"),
        (size(regexp_extract_all(t, lit("[^a-zA-Z0-9 ]"), lit(0))).cast("double")
          / length(t).cast("double")).as("punct_ratio"),
        (stopHits.cast("double") / nTok.cast("double")).as("stopword_ratio")): _*)
      .withColumn("quality",
        qualityBucketFrom(col("n_tokens"), col("punct_ratio"), col("avg_token_len")))
  }

  /** Per-stratum quality drift mart: document counts, mean feature values,
    * and the share of high-quality docs per value of `strataCol` (source
    * domain, language, snapshot week, …) — the monitoring table that
    * catches a crawl source going bad. ONE scan ([[qualityFeatures]] with
    * the stratum carried through) + one partial-agg shuffle on the
    * stratum. Means rounded to 6 dp so summation order can't flip a hash
    * compare across engines. */
  def qualityDrift(df: DataFrame, idCol: String, textCol: String,
                   strataCol: String): DataFrame =
    qualityFeatures(df, idCol, textCol, Seq(strataCol))
      .groupBy(strataCol)
      .agg(
        count(lit(1)).as("n_docs"),
        round(avg("n_tokens"), 6).as("avg_tokens"),
        round(avg("punct_ratio"), 6).as("avg_punct_ratio"),
        round(avg("stopword_ratio"), 6).as("avg_stopword_ratio"),
        (sum(when(col("quality") === "high", 1L).otherwise(0L)).cast("double")
          / count(lit(1)).cast("double")).as("share_high"))

  /** Marker words per language for the n-gram language-ID heuristic. Order
    * matters: ties resolve to the earlier entry. */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "is", "of"),
    "de" -> Seq("der", "die", "das", "und"),
    "es" -> Seq("el", "los", "las", "que"),
    "fr" -> Seq("le", "la", "les", "et"),
    "zh" -> Seq("的", "是", "在", "了"))

  /** Per-language marker-hit counts as (lang, score Column) pairs over the
    * text — the shared front half of [[langId]] and [[detectedLang]]. */
  def languageScores(text: Column): Seq[(String, Column)] = {
    val toks = split(text, " ")
    langMarkers.map { case (lang, ms) =>
      lang -> size(filter(toks, w => w.isin(ms.map(lit): _*)))
    }
  }

  /** Argmax over per-language score columns (first language in score order
    * wins ties) — works over materialized `score_*` column refs ([[langId]])
    * or inline expressions ([[detectedLang]]). */
  def detectedLangFrom(scores: Seq[(String, Column)]): Column = {
    val best = scores.map(_._2)
    scores.foldLeft(lit(null).cast("string")) {
      case (acc, (lang, sc)) =>
        when(acc.isNull && sc === greatest(best: _*), lang).otherwise(acc)
    }
  }

  /** The detected language as a pure Column over the text — the scan-stage
    * form an eligibility filter composes without joining [[langId]] output
    * back on the id. */
  def detectedLang(text: Column): Column = detectedLangFrom(languageScores(text))

  /** Language-ID heuristic: count marker-word hits per language, take the
    * argmax (first language in [[langMarkers]] order wins ties). */
  def langId(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val scores = languageScores(col(textCol))
    val withScores = df.select(
      (col(idCol) +: scores.map { case (l, c) => c.as(s"score_$l") }): _*)
    withScores.withColumn("detected_lang",
      detectedLangFrom(scores.map { case (l, _) => l -> col(s"score_$l") }))
  }

  /** Language-metadata purity audit — does the corpus's RECORDED `lang`
    * column agree with what the text actually looks like? Per source, the
    * (recorded, detected) confusion grid with each cell's share of the
    * source and the source-level purity (agreeing share) repeated — the
    * audit that catches a scraper writing the site default into `lang`
    * (a mislabeled slice silently poisons per-language sampling weights
    * and tokenizer fairness numbers downstream). Detection is the
    * [[detectedLang]] scan-stage kernel; NULL recorded and NULL detected
    * agree only with each other (the null-safe rule).
    *
    * Scale shape: ONE (source, recorded, detected) hash-agg over the scan
    * (the detector is a pure Column — no join back), then a source-keyed
    * reduce broadcast back onto the ≤ |sources|·|langs|² grid. */
  def langPurity(df: DataFrame, textCol: String, langCol: String,
                 srcCol: String): DataFrame = {
    val grid = df.where(col(textCol).isNotNull)
      .groupBy(col(srcCol).as("source"), col(langCol).as("recorded_lang"),
        detectedLang(col(textCol)).as("detected_lang"))
      .agg(count(lit(1)).as("n"))
    val tot = grid.groupBy("source").agg(sum("n").as("__t"),
      coalesce(sum(when(col("recorded_lang") <=> col("detected_lang"),
        col("n"))), lit(0L)).as("__agree"))
    grid.join(broadcast(tot), Seq("source"))
      .select(col("source"), col("recorded_lang"), col("detected_lang"),
        col("n"),
        round(col("n").cast("double") / col("__t").cast("double"), 6)
          .as("share_of_source"),
        (col("recorded_lang") <=> col("detected_lang")).as("agree"),
        round(col("__agree").cast("double") / col("__t").cast("double"), 6)
          .as("source_purity"))
  }

  /** Repetition score: distinct word n-grams / total word n-grams, the
    * standard boilerplate/looping-text detector (a doc that repeats itself
    * has far fewer distinct n-grams than slots). 1.0 = no repetition; docs
    * shorter than n words score 1.0 by convention. One narrow projection,
    * no shuffle — runs in the scan stage at any scale. */
  /** The distinct-n-gram ratio as a Column — the single definition
    * [[repetitionScore]] and [[Quality.curationScorecard]] both use
    * (empty-doc convention: ratio 1.0). */
  def distinctNgramRatio(text: Column, n: Int): Column = {
    val sh = Dedup.shingles(text, n)
    when(size(sh) <= 0, lit(1.0))
      .otherwise(size(array_distinct(sh)).cast("double") / size(sh).cast("double"))
  }

  def repetitionScore(df: DataFrame, idCol: String, textCol: String,
                      n: Int = 3): DataFrame =
    df.select(col(idCol),
      distinctNgramRatio(col(textCol), n).as("distinct_ngram_ratio"))

  /** PII scrubbing: masks emails, URLs, and long (7+) digit runs — the
    * redaction pass a training-data pipeline runs before tokenization.
    * RE2-compatible patterns, so any engine reproduces the masking
    * byte-for-byte. Returns the scrubbed text plus per-kind hit counts
    * (the usual audit/reporting columns). */
  def scrubPii(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val email = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
    val url = "https?://[^ ]+"
    val digits = "[0-9]{7,}"
    val t = col(textCol)
    df.select(
      col(idCol),
      regexp_replace(regexp_replace(regexp_replace(t,
        url, "<URL>"), email, "<EMAIL>"), digits, "<NUM>").as("clean_text"),
      size(regexp_extract_all(t, lit(email), lit(0))).as("n_emails"),
      size(regexp_extract_all(t, lit(url), lit(0))).as("n_urls"),
      size(regexp_extract_all(t, lit(digits), lit(0))).as("n_digit_runs"))
  }

  /** Text normalization: lowercase, control characters → space, whitespace
    * runs collapsed, ends trimmed — the canonicalization pass that runs
    * before dedup/fingerprinting so trivially-different bytes hash alike.
    * RE2-portable patterns only (no Unicode tables beyond lower), so any
    * engine reproduces the output byte-for-byte. Scan-stage projection,
    * no shuffle. Returns the normalized text plus a `changed` flag (the
    * usual audit column: fraction changed ≈ how dirty the source is). */
  def normalizeText(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val cleaned = trim(regexp_replace(
      regexp_replace(lower(col(textCol)), "[\\x00-\\x1f\\x7f]", " "),
      " {2,}", " "))
    df.select(col(idCol), cleaned.as("norm_text"),
      (cleaned =!= col(textCol)).as("changed"))
  }

  /** Corpus-frequency boilerplate removal (the line-level dedup of
    * RefinedWeb/CCNet, generalized over a separator): split every document
    * into segments on `sep`, count each distinct segment's DOCUMENT
    * frequency across the corpus, drop segments appearing in more than
    * `maxDf` documents — navigation chrome, cookie banners, license
    * headers at line granularity (`sep = "\n"`); df-based stopword pruning
    * at word granularity — and reassemble the survivors in original
    * order. Returns (id, clean_text, n_kept, n_removed); documents that
    * were ALL boilerplate survive with an empty `clean_text` (dropping
    * rows is a policy decision left to the caller).
    *
    * Scale shape: ONE posexplode scan feeds both the df hash-agg and the
    * keep join (persisted — uncached it would run twice); reassembly is a
    * groupBy(id) whose collect_list is bounded by the document's own
    * segment count, with order restored by an in-memory per-doc sort of
    * (pos, seg) structs — no global sort, no window. */
  def removeCommonSegments(df: DataFrame, idCol: String, textCol: String,
                           sep: String, maxDf: Long): DataFrame = {
    // Pattern.quote: the separator is a LITERAL (Spark's split takes a
    // regex — an unquoted "." or "|" would split on everything)
    val lsep = java.util.regex.Pattern.quote(sep)
    val segs = graft.core.CacheRegistry.persist(
      df.select(col(idCol), posexplode(split(col(textCol), lsep)).as(Seq("pos", "seg"))))
    val dfc = segs.select(col("seg"), col(idCol)).distinct()
      .groupBy("seg").agg(count(lit(1)).as("__df"))
    val kept = segs.join(dfc, "seg").where(col("__df") <= maxDf)
      .groupBy(col(idCol))
      .agg(
        array_join(transform(array_sort(collect_list(struct(col("pos"), col("seg")))),
          x => x.getField("seg")), sep).as("clean_text"),
        count(lit(1)).as("n_kept"))
    df.select(col(idCol), size(split(col(textCol), lsep)).cast("long").as("__total"))
      .join(kept, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("clean_text"), lit("")).as("clean_text"),
        coalesce(col("n_kept"), lit(0L)).as("n_kept"),
        (col("__total") - coalesce(col("n_kept"), lit(0L))).as("n_removed"))
  }

  /** Markup stripping — the extraction step between a raw web crawl and
    * every text operator above: drop HTML comments, then tags, then
    * unescape the entities tag-stripping exposes (`&amp;` LAST, so
    * `&amp;lt;` yields the literal `&lt;` instead of double-unescaping),
    * then collapse runs of whitespace. Plain text passes through
    * unchanged (modulo whitespace collapse), so the op is safe to run
    * unconditionally in an ingest chain. Pure scan-stage projection —
    * zero shuffle; both regexes are RE2-compatible, so external engines
    * reproduce the exact output. */
  def stripMarkup(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    // (?s): comments span lines and may contain '>' — without DOTALL a
    // multi-line comment would leak its tail past the tag regex
    val noTags = regexp_replace(
      regexp_replace(col(textCol), "(?s)<!--.*?-->", " "), "<[^>]*>", " ")
    val unescaped = Seq(
      "&lt;" -> "<", "&gt;" -> ">", "&quot;" -> "\"",
      "&#39;" -> "'", "&nbsp;" -> " ", "&amp;" -> "&")
      .foldLeft(noTags) { case (c, (s, r)) => replace(c, lit(s), lit(r)) }
    df.select(col(idCol),
      trim(regexp_replace(unescaped, "\\s+", " ")).as("clean_text"))
  }

  /** Document fingerprints: full-content md5 plus a winnowing-style minimum
    * over character 8-gram hashes (robust to small edits at the ends). The
    * min-gram is a native one-pass kernel
    * (org.apache.spark.sql.graft.MinGramMd5); the built-in formulation it
    * replaced (a lambda frame + md5 string per character position,
    * interpreted per element) survives as a test-only equivalence witness
    * (EquivalenceWitnesses.fingerprintsHof, pinned in TextFunctionsSpec). */
  def fingerprints(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(
      col(idCol),
      md5(col(textCol)).as("content_md5"),
      graft.functions.TextFunctions.minGramMd5(col(textCol)).as("min_gram_md5"))

  /** Per-document Unicode-script composition: the share of characters in
    * Latin, digit, CJK, Cyrillic, whitespace, and "other" classes — the
    * multilingual-curation signal the word-marker language ID
    * ([[langId]]) can't give on mixed-script or non-space-delimited
    * text (a "en" doc that is 40 % CJK is mislabeled or bilingual; an
    * "other" spike marks mojibake/control garbage). Counts are
    * length-minus-stripped (one regexp per class, BMP ranges so UTF-16
    * and code-point engines agree); shares are 6 dp of count/len;
    * empty/null docs report null shares. Pure scan stage, zero
    * shuffle; the char classes are RE2-compatible.
    * Output: (id, n_chars, latin_share, digit_share, cjk_share,
    * cyrillic_share, space_share, other_share). */
  def scriptShares(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = col(textCol)
    val len = length(t)
    def cnt(cls: String): Column = len - length(regexp_replace(t, cls, ""))
    val classes = Seq(
      "latin_share" -> "[A-Za-z]",
      "digit_share" -> "[0-9]",
      "cjk_share" -> "[\\x{4e00}-\\x{9fff}]",
      "cyrillic_share" -> "[\\x{0400}-\\x{04ff}]",
      "space_share" -> "[ ]")
    val counted = classes.map { case (as, cls) => cnt(cls).as(s"__$as") }
    val base = df.select((col(idCol) +: (len.as("__len") +: counted)): _*)
    def share(c: Column): Column =
      when(col("__len") > 0, round(c.cast("double") / col("__len"), 6))
    val classShares = classes.map { case (as, _) => share(col(s"__$as")).as(as) }
    val other = share(col("__len") - classes.map { case (as, _) =>
      col(s"__$as") }.reduce(_ + _)).as("other_share")
    base.select((col(idCol) +:
      (coalesce(col("__len"), lit(0)).cast("long").as("n_chars") +:
        (classShares :+ other))): _*)
  }

  /** Gopher-style hard-filter rule mart (Rae et al. 2021 §A1.1 shape): each
    * named rule as its own boolean column plus the conjunction `keep`, so a
    * curation review can see WHICH rule killed a doc (a bare keep/drop bit
    * hides systematic filter bugs — e.g. a tokenizer change flipping the
    * mean-word-length band for one language). Rules, each over whitespace
    * words:
    *  - `ok_word_count`: word count within [minWords, maxWords]
    *  - `ok_mean_word_len`: mean word length within [3, 10]
    *  - `ok_alpha_ratio`: ≥ 80 % of words contain an alphabetic char
    *  - `ok_symbol_ratio`: (# of `#` chars + `...` runs) / words < 0.1
    *  - `ok_stopwords`: ≥ 2 distinct members of the canonical stop set
    *  - `ok_repetition`: distinct-word / word ratio > 0.2 (the top-level
    *    dedup-within-doc cut; n-gram bands live in [[repetitionScore]])
    * All thresholds are the published defaults; the word stats are computed
    * once and shared across rules (codegen CSE). Pure scan stage, zero
    * shuffle, RE2-safe — the 100 TB shape is "filters run in the scan".
    * Output: (id, n_words, mean_word_len, the six flags, keep). */
  def gopherRules(df: DataFrame, idCol: String, textCol: String,
                  minWords: Int = 50, maxWords: Int = 100000): DataFrame = {
    val t = col(textCol)
    val words = split(t, " ")
    val nWords = size(words)
    val nonSpace = length(regexp_replace(t, " ", ""))
    val meanLen = when(nWords > 0, nonSpace.cast("double") / nWords.cast("double"))
    val alphaWords = size(filter(words, w => w.rlike("[A-Za-z]")))
    val alphaRatio = when(nWords > 0, alphaWords.cast("double") / nWords.cast("double"))
    val symbolCount =
      size(regexp_extract_all(t, lit("#"), lit(0))) +
        size(regexp_extract_all(t, lit("\\.\\.\\."), lit(0)))
    val symbolRatio = when(nWords > 0, symbolCount.cast("double") / nWords.cast("double"))
    val stopDistinct = size(array_intersect(
      array_distinct(words), array(stopwords.map(lit): _*)))
    val distinctRatio =
      when(nWords > 0, size(array_distinct(words)).cast("double") / nWords.cast("double"))
    val flags = Seq(
      "ok_word_count" -> (nWords >= minWords && nWords <= maxWords),
      "ok_mean_word_len" -> (meanLen >= 3.0 && meanLen <= 10.0),
      "ok_alpha_ratio" -> (alphaRatio >= 0.8),
      "ok_symbol_ratio" -> (symbolRatio < 0.1),
      "ok_stopwords" -> (stopDistinct >= 2),
      "ok_repetition" -> (distinctRatio > 0.2))
    df.select((col(idCol) +:
      (nWords.cast("long").as("n_words") +:
        round(coalesce(meanLen, lit(0.0)), 6).as("mean_word_len") +:
        (flags.map { case (n, c) => coalesce(c, lit(false)).as(n) } :+
          flags.map(_._2).map(c => coalesce(c, lit(false))).reduce(_ && _)
            .as("keep")))): _*)
  }

  /** Flesch readability mart — Reading Ease and Flesch–Kincaid grade per
    * document from three portable counts: non-whitespace-run words,
    * sentence-punctuation runs (`[.!?]+`), and vowel-group syllables
    * (`[aeiouy]+` over the lowercased text — the standard no-dictionary
    * approximation). Run counting is collision-free by construction:
    * `len(replace(runs → 1 char)) − len(replace(runs → ''))` counts runs
    * without inventing a marker character that could occur in the text.
    * Scores are guarded (≥1 word, ≥1 sentence floors) and rounded to 4 dp;
    * empty/whitespace-only docs score NULL. Output: (id, n_words,
    * n_sentences, n_syllables, flesch, fk_grade).
    *
    * Scale shape: pure per-row scan-stage expressions inside whole-stage
    * codegen — no shuffle, no UDF; a 100 TB corpus prices at one read. */
  def readability(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val t = coalesce(col(textCol), lit(""))
    def runCount(c: Column, cls: String): Column =
      (length(regexp_replace(c, cls, "x")) -
        length(regexp_replace(c, cls, ""))).cast("long")
    val words = runCount(t, "\\S+")
    val sents = runCount(t, "[.!?]+")
    val sylls = runCount(lower(t), "[aeiouy]+")
    val w = greatest(words, lit(1L)).cast("double")
    val s = greatest(sents, lit(1L)).cast("double")
    val y = sylls.cast("double")
    df.select(col(idCol),
      words.as("n_words"), sents.as("n_sentences"), sylls.as("n_syllables"),
      when(words > 0,
        round(lit(206.835) - lit(1.015) * (w / s) - lit(84.6) * (y / w), 4))
        .as("flesch"),
      when(words > 0,
        round(lit(0.39) * (w / s) + lit(11.8) * (y / w) - lit(15.59), 4))
        .as("fk_grade"))
  }
}
