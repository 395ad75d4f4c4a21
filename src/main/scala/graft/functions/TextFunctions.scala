package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/**
 * Text-analysis operators for large-scale training-data pipelines: language
 * identification, quality scoring, token counting, n-gram extraction, and
 * document fingerprinting. Everything is built from codegen'd built-in
 * functions (no UDFs) so the hot path stays inside whole-stage codegen and
 * the expressions push through Catalyst untouched at 100 TB.
 */
object TextFunctions {

  /** Whitespace tokenization (the corpus is single-spaced; extend the regex
    * for real-world text). */
  def tokens(text: Column): Column = split(text, " ")

  def tokenCount(text: Column): Column = size(tokens(text)).cast("long")

  /** BPE-ish subword count estimate: whitespace tokens plus an extra unit per
    * 6 chars of long words (a cheap, deterministic proxy for tokenizer
    * behavior on long/rare words). */
  def tokenCountBpeish(text: Column): Column =
    (tokenCount(text) +
      aggregate(tokens(text), lit(0L),
        (acc, t) => acc + (length(t) / lit(7)).cast("long"))).cast("long")

  /** Word n-grams over a token array (empty when shorter than n). */
  def ngrams(toks: Column, n: Int): Column =
    when(size(toks) >= n,
      transform(sequence(lit(0), size(toks) - n),
        i => array_join(slice(toks, i + 1, lit(n)), " ")))
      .otherwise(array().cast("array<string>"))

  // ---- language identification (stopword-marker heuristic) -----------------

  /** Marker stopwords per language; scores are plain token-hit counts so the
    * same heuristic is expressible in the DuckDB oracle. */
  val Markers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "is", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist", "ein", "nicht"),
    "es" -> Seq("el", "los", "que", "es", "una", "como", "por"),
    "fr" -> Seq("le", "les", "et", "est", "une", "dans", "pour"))

  def markerScore(toks: Column, markers: Seq[String]): Column =
    size(filter(toks, t => t.isin(markers.map(lit): _*)))

  // ---- fused token statistics ----------------------------------------------

  /** Marker lists in the FIXED order the fused kernel exposes them:
    * the languages alphabetically, then the combined stopword list. */
  private val KernelMarkerLists: Seq[Seq[String]] =
    Markers.sortBy(_._1).map(_._2) :+ Markers.flatMap(_._2)

  /** One-pass token-statistics struct (codegen'd kernel; field semantics and
    * the HOF bit-identity contract are documented on
    * [[NativeExpressions.tokenStats]]). The language-ID / quality /
    * repetition operators below all derive from this ONE expression, so a
    * full per-document feature set costs a single pass over the tokens
    * instead of O(distinct·tokens) interpreted lambdas. */
  def tokenStats(toks: Column): Column =
    NativeExpressions.tokenStats(toks, KernelMarkerLists)

  private def markerHits(ts: Column, i: Int): Column =
    element_at(ts.getField("marker_hits"), i + 1)

  /** CJK character count (for zh detection). */
  def cjkCount(text: Column): Column =
    length(regexp_replace(text, "[^\\u4e00-\\u9fff]", ""))

  /**
   * Deterministic language ID: zh when CJK chars dominate, otherwise the
   * marker-language with the highest hit count (ties broken alphabetically),
   * `und` when nothing matches. Marker scores come from the fused kernel;
   * [[languageIdHof]] is the HOF reference it must agree with.
   */
  def languageId(text: Column): Column = {
    val ts = tokenStats(tokens(text))
    // Alphabetical candidate order makes the argmax tiebreak deterministic
    // and reproducible in plain SQL (CASE evaluation order).
    val ordered = Markers.sortBy(_._1).map(_._1).zipWithIndex.map {
      case (lang, i) => lang -> markerHits(ts, i)
    }
    val best = ordered.map(_._2).reduce(greatest(_, _))
    val alphaPick = ordered.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && best > 0, lit(lang)).otherwise(els)
    }
    when(cjkCount(text) * 2 > length(text), lit("zh")).otherwise(alphaPick)
  }

  /** HOF composition of [[languageId]] (interpreted; equivalence reference). */
  def languageIdHof(text: Column): Column = {
    val toks = tokens(text)
    val ordered = Markers.sortBy(_._1).map { case (lang, ms) =>
      lang -> markerScore(toks, ms)
    }
    val best = ordered.map(_._2).reduce(greatest(_, _))
    val alphaPick = ordered.foldRight(lit("und")) { case ((lang, s), els) =>
      when(s === best && best > 0, lit(lang)).otherwise(els)
    }
    when(cjkCount(text) * 2 > length(text), lit("zh")).otherwise(alphaPick)
  }

  // ---- quality scoring -----------------------------------------------------

  /** Per-document quality features (all exact-arithmetic, oracle-stable).
    * Token-derived terms come from the fused kernel; [[qualityFeaturesHof]]
    * is the HOF reference. */
  def qualityFeatures(text: Column): Seq[(String, Column)] = {
    val ts = tokenStats(tokens(text))
    val nChars = length(text).cast("long")
    val nToks = ts.getField("n_tokens")
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "avg_token_len" -> (ts.getField("sum_token_len").cast("double") /
        nToks.cast("double")),
      "punct_count" -> length(regexp_replace(text, "[^.,;:!?]", "")).cast("long"),
      "upper_count" -> length(regexp_replace(text, "[^A-Z]", "")).cast("long"),
      "stopword_ratio" -> (markerHits(ts, Markers.size).cast("double") /
        nToks.cast("double")))
  }

  /** HOF composition of [[qualityFeatures]] (interpreted; equivalence
    * reference). */
  def qualityFeaturesHof(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nChars = length(text).cast("long")
    val nToks = size(toks).cast("long")
    Seq(
      "n_chars" -> nChars,
      "n_tokens" -> nToks,
      "avg_token_len" -> (aggregate(toks, lit(0L), (a, t) => a + length(t)).cast("double") /
        nToks.cast("double")),
      "punct_count" -> length(regexp_replace(text, "[^.,;:!?]", "")).cast("long"),
      "upper_count" -> length(regexp_replace(text, "[^A-Z]", "")).cast("long"),
      "stopword_ratio" -> (markerScore(toks, Markers.flatMap(_._2)).cast("double") /
        nToks.cast("double")))
  }

  /** Composite quality score in [0,1]: length band + stopword presence −
    * punctuation/uppercase noise. Deterministic double arithmetic. */
  def qualityScore(text: Column): Column = {
    val f = qualityFeatures(text).toMap
    val lengthOk = when(f("n_chars") >= 100 && f("n_chars") <= 10000, lit(0.5)).otherwise(lit(0.0))
    val stopOk = least(f("stopword_ratio") * lit(2.0), lit(0.3))
    // greatest(n_chars, 1): empty documents exist in any real corpus and
    // must score (0.2), not throw ANSI DIVIDE_BY_ZERO
    val punctPenalty = least(f("punct_count").cast("double") /
      greatest(f("n_chars"), lit(1)).cast("double") * 5.0, lit(0.2))
    lengthOk + stopOk + lit(0.2) - punctPenalty
  }

  /** Repetition signals (the Gopher/RefinedWeb-style filters for generated or
    * boilerplate text): most-frequent-token share, distinct-token share, and
    * duplicate-bigram share. Map-side, no shuffle; all counts come from the
    * fused one-pass kernel (the HOF reference below recomputes the top-token
    * count as O(distinct·tokens) interpreted lambdas per row), and every term
    * is recomputable in DuckDB for the gate. */
  def repetitionFeatures(text: Column): Seq[(String, Column)] = {
    val ts = tokenStats(tokens(text))
    val nToks = ts.getField("n_tokens")
    val n = nToks.cast("double")
    val nBi = ts.getField("n_bigrams").cast("double")
    Seq(
      "n_tokens" -> nToks,
      "top_token_ratio" ->
        when(nToks === 0, lit(0.0))
          .otherwise(ts.getField("top_count").cast("double") / n),
      "unique_token_ratio" ->
        when(nToks === 0, lit(0.0))
          .otherwise(ts.getField("distinct_count").cast("double") / n),
      "dup_bigram_ratio" ->
        when(nBi === 0, lit(0.0))
          .otherwise(lit(1.0) - ts.getField("distinct_bigrams").cast("double") / nBi))
  }

  /** HOF composition of [[repetitionFeatures]] (interpreted; equivalence
    * reference). */
  def repetitionFeaturesHof(text: Column): Seq[(String, Column)] = {
    val toks = tokens(text)
    val nToks = size(toks).cast("long")
    val n = nToks.cast("double")
    val topCount = array_max(transform(array_distinct(toks),
      t => size(filter(toks, x => x === t))))
    val bigrams = ngrams(toks, 2)
    val nBi = size(bigrams).cast("double")
    Seq(
      "n_tokens" -> nToks,
      "top_token_ratio" ->
        when(nToks === 0, lit(0.0)).otherwise(topCount.cast("double") / n),
      "unique_token_ratio" ->
        when(nToks === 0, lit(0.0))
          .otherwise(size(array_distinct(toks)).cast("double") / n),
      "dup_bigram_ratio" ->
        when(nBi === 0, lit(0.0))
          .otherwise(lit(1.0) - size(array_distinct(bigrams)).cast("double") / nBi))
  }

  /** Repetitive-document flag with the usual web-corpus thresholds. */
  def isRepetitive(text: Column,
                   topTokenMax: Double = 0.2,
                   dupBigramMax: Double = 0.3): Column = {
    val f = repetitionFeatures(text).toMap
    f("top_token_ratio") > topTokenMax || f("dup_bigram_ratio") > dupBigramMax
  }

  /** Overlapping token-window chunking, the standard long-document prep for
    * LLM training corpora: windows of `chunkSize` tokens every
    * `chunkSize - overlap` tokens (the last window may be short; a document
    * at or under `chunkSize` yields exactly one chunk). Returns an array of
    * (ix, text, n_tokens) structs — explode it for one row per chunk. Pure
    * per-row Column expressions, no shuffle. */
  def chunkWindows(text: Column, chunkSize: Int, overlap: Int): Column = {
    require(chunkSize > 0 && overlap >= 0 && overlap < chunkSize,
      "need 0 <= overlap < chunkSize")
    val stride = chunkSize - overlap
    val toks = tokens(text)
    val n = size(toks)
    // integral chunk count: 1 when n <= chunkSize, else
    // (n - chunkSize + stride - 1) / stride + 1 more windows
    val nChunks = when(n <= chunkSize, lit(1))
      .otherwise(floor((n - chunkSize + stride - 1).cast("double") / stride)
        .cast("int") + 1)
    transform(sequence(lit(0), nChunks - 1), ix => struct(
      ix.as("ix"),
      array_join(slice(toks, ix * stride + 1, lit(chunkSize)), " ").as("text"),
      least(lit(chunkSize), n - ix * stride).cast("long").as("n_tokens")))
  }

  // ---- Gopher-rule quality filtering ---------------------------------------

  /** The required-stopword list from the Gopher quality rules (Rae et al.
    * 2021, arXiv:2112.11446, §A1.1): a document must contain at least two
    * of these to pass the stopword rule. */
  val GopherStopwords: Seq[String] =
    Seq("the", "be", "to", "of", "and", "that", "have", "with")

  /**
   * Gopher-rule quality flags (Rae et al. 2021, arXiv:2112.11446, §A1.1) —
   * the standard rule-based web-corpus filter. Every ratio rule is stated in
   * INTEGER cross-multiplied form (`10·symbols < words` instead of
   * `symbols/words < 0.1`) so the booleans are bit-exact across engines —
   * no floating-point division anywhere. Emits (name → Column):
   *
   *  - `n_words`         token count (newlines normalized to spaces first)
   *  - `f_word_count`    50 ≤ words ≤ 100 000
   *  - `f_mean_word_len` mean token length in [3, 10] (as 3n ≤ Σlen ≤ 10n)
   *  - `f_symbol_ratio`  `#`/words < 0.1 AND `...`/words < 0.1 (the paper
   *                      applies the threshold to EACH symbol separately)
   *  - `f_bullet`        < 90 % of lines start with a `- ` bullet
   *  - `f_ellipsis`      < 30 % of lines end with `...`
   *  - `f_alpha`         ≥ 80 % of words contain an alphabetic character
   *  - `f_stopwords`     ≥ 2 distinct [[GopherStopwords]] present
   *  - `keep`            conjunction of all flags
   *
   * Scale: entirely map-side (one [[tokenStats]] kernel pass for the token
   * counts; the line/alpha rules are HOF filters over the per-row arrays —
   * interpreted lambdas, but per-row with no shuffle, so they stay cheap and
   * distributed). Nothing here prevents predicate pushdown of an outer
   * filter on `keep`.
   */
  def gopherFlags(text: Column): Seq[(String, Column)] = {
    val toks = tokens(regexp_replace(text, "\n", " "))
    val ts = tokenStats(toks)
    val n = ts.getField("n_tokens")
    val sumLen = ts.getField("sum_token_len")
    val lines = split(text, "\n")
    val nLines = size(lines).cast("long")
    val bulletLines = size(filter(lines, l => l.substr(1, 2) === "- ")).cast("long")
    val ellipsisLines = size(filter(lines, l => org.apache.spark.sql.functions
      .right(l, lit(3)) === "...")).cast("long")
    val hashes = regexp_count(text, lit("#")).cast("long")
    val ellipses = regexp_count(text, lit("\\.\\.\\.")).cast("long")
    val alphaWords = size(filter(toks, t => t.rlike("[A-Za-z]"))).cast("long")
    val stopHits = GopherStopwords
      .map(s => when(array_contains(toks, lit(s)), lit(1L)).otherwise(lit(0L)))
      .reduce(_ + _)
    val flags = Seq(
      "f_word_count" -> (n >= 50L && n <= 100000L),
      "f_mean_word_len" -> (sumLen >= n * 3 && sumLen <= n * 10),
      "f_symbol_ratio" -> (hashes * 10 < n && ellipses * 10 < n),
      "f_bullet" -> (bulletLines * 10 < nLines * 9),
      "f_ellipsis" -> (ellipsisLines * 10 < nLines * 3),
      "f_alpha" -> (alphaWords * 5 >= n * 4),
      "f_stopwords" -> (stopHits >= 2L))
    ("n_words" -> n) +: flags :+ ("keep" -> flags.map(_._2).reduce(_ && _))
  }

  // ---- PII redaction -------------------------------------------------------

  /** (name, pattern, replacement) for the standard web-corpus PII classes.
    * Patterns deliberately use only constructs with identical semantics in
    * Java regex (Spark) and RE2 (DuckDB), so redaction is oracle-checkable.
    * Order matters: emails first (an address contains dots a later rule
    * could half-match), then phones, then bare IPv4s. */
  val PiiPatterns: Seq[(String, String, String)] = Seq(
    ("email", "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", "\\b\\d{3}-\\d{3}-\\d{4}\\b", "<PHONE>"),
    ("ipv4", "\\b\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\b", "<IP>"))

  /** Mask every PII match with its class token — pure `regexp_replace`
    * chain: map-side, codegen'd, no UDF. */
  def redactPii(text: Column): Column =
    PiiPatterns.foldLeft(text) { case (c, (_, re, tok)) =>
      regexp_replace(c, re, tok)
    }

  /** Per-class PII match counts (same patterns as [[redactPii]]), for
    * corpus-level privacy audits. Counted AFTER earlier classes are
    * redacted, mirroring the replacement chain exactly. */
  def piiCounts(text: Column): Seq[(String, Column)] = {
    val staged = PiiPatterns.scanLeft(("", text)) { case ((_, c), (name, re, tok)) =>
      (name, regexp_replace(c, re, tok))
    }
    PiiPatterns.zip(staged).map { case ((name, re, _), (_, before)) =>
      s"n_$name" -> regexp_count(before, lit(re))
    }
  }

  // ---- fingerprinting ------------------------------------------------------

  /** Content fingerprint: md5 of the normalized text (lowercased, single
    * spaces). md5 exists in both Spark and DuckDB, so fingerprints are
    * oracle-checkable; use fingerprint equality for exact dedup. */
  def fingerprint(text: Column): Column =
    md5(lower(regexp_replace(text, "\\s+", " ")))

  /** 64-bit rolling content hash for cheap grouping (Spark-side only). */
  def fingerprint64(text: Column): Column = xxhash64(text)

  /** First 32 bits of md5 as a non-negative long — THE cross-engine hash
    * primitive of the gate family (DuckDB spelling:
    * `('0x' || substr(md5(x), 1, 8))::UBIGINT`). Every deterministic
    * selector, bucket, and weight gate derives from this single expression
    * so the Spark/DuckDB parity convention lives in one place. */
  def md5Prefix32(c: Column): Column =
    conv(substring(md5(c), 1, 8), 16, 10).cast("long")

  // ---- linear quality-classifier inference ---------------------------------

  /** Deterministic per-token weight in [-1, 1] derived from the token's md5
    * (the "hashing trick" of a fastText/VW-style linear model: the model IS
    * a weight per feature bucket, here keyed directly by the 32-bit md5
    * prefix). `(h % 2001 − 1000)/1000` is all-integer until the final exact
    * division, so both engines produce bit-identical doubles. */
  def hashTokenWeight(tok: Column): Column =
    ((md5Prefix32(tok) % 2001) - 1000) / lit(1000.0)

  /**
   * fastText-style linear classifier inference over the hashed
   * bag-of-words: `σ(mean_t w(t))` — the standard "quality classifier"
   * scoring step of LLM curation pipelines (GPT-3 §A / LLaMA webtext
   * filtering), with the trained weight table replaced by a deterministic
   * hash-derived one so the oracle can reproduce inference exactly.
   *
   * Scale shape: pure map-side, zero shuffles — the weight lookup is a hash
   * of the token (no broadcast table needed), the mean folds over the token
   * array in one codegen'd `aggregate`, and σ is a scalar expression. A
   * real trained model swaps [[hashTokenWeight]] for a broadcast
   * bucket→weight map lookup; the plan shape is unchanged.
   *
   * NULL text scores as the empty string (whose single empty token carries
   * its hash weight like any other — both engines split "" to [""], so the
   * oracle agrees row for row). `size(toks)` is never 0: split always
   * returns at least one element. Rounded to `roundDigits`: the engines'
   * `exp` may differ in the last ulp.
   */
  def classifierScore(text: Column, roundDigits: Int = 4): Column = {
    val toks = tokens(coalesce(text, lit("")))
    val mean = aggregate(toks, lit(0.0), (acc, t) => acc + hashTokenWeight(t)) /
      size(toks)
    round(lit(1.0) / (lit(1.0) + exp(-mean)), roundDigits)
  }
}
