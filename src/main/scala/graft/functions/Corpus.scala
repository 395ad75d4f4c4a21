package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Corpus-level term statistics for training-data curation and retrieval
 * prep: term/document frequencies, TF-IDF keyword extraction, and a capped
 * inverted index. These complement the per-document Column expressions in
 * [[TextFunctions]] — everything here needs a corpus-wide shuffle, so the
 * shapes are chosen for the 100 TB case:
 *
 *  - term frequencies shuffle once on (doc, token); document frequencies
 *    ride a second token-keyed aggregation whose input is the (doc, token)
 *    DISTINCT set, never the raw token stream;
 *  - TF-IDF derives df with a count window riding a token-keyed exchange
 *    over the aggregated (doc, token, tf) rows — one corpus scan, no
 *    tf⋈df self-join (which would scan the corpus twice);
 *  - the inverted index caps posting lists with a per-token `row_number`
 *    BEFORE the list is materialized — a stopword's million-document
 *    posting never sits in one aggregation buffer — and the total document
 *    count per token rides the same window shuffle as the rank.
 *
 * The reference engine has no corpus statistics surface (its `$group` can
 * express tf but not the two-level tf/df composition); this is a
 * north-star addition in the SURVEY.md §2 "training-data pipeline" sense.
 */
object Corpus {

  /** Long-form term frequencies: one row per (doc, token) with its count.
    * One shuffle, keyed (doc, token). */
  def termFrequencies(docs: DataFrame, idCol: String, textCol: String): DataFrame =
    graft.Tables.widen(docs).select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .groupBy(col("doc"), col("token"))
      .agg(count(lit(1)).as("tf"))

  /** Document frequency per token. Input rows are already distinct per
    * (doc, token) — [[termFrequencies]] output — so this is a plain count,
    * not a count-distinct. */
  def documentFrequencies(tf: DataFrame): DataFrame =
    tf.groupBy(col("token")).agg(count(lit(1)).as("df"))

  /**
   * Top-k keywords per document by smoothed TF-IDF
   * (`idf = ln((N+1)/(df+1)) + 1`, the sklearn smoothing — never zero,
   * never divides by zero). Returns (doc, token, tf, df, score, rank).
   *
   * Ranking uses the score ROUNDED to `roundDigits` with the token as the
   * tie-break, so results are reproducible across engines whose `ln` may
   * differ in the last ulp.
   *
   * Scale: tf and df are token-keyed aggregations of the same exploded
   * stream (the shared subtree's exchange is reused when the planner can);
   * the join is token-keyed on both sides; the corpus size N is a scalar
   * aggregate broadcast into the plan — no driver-side collect of data rows.
   */
  def tfidfTopK(docs: DataFrame, idCol: String, textCol: String, k: Int,
                roundDigits: Int = 4): DataFrame = {
    val tf = termFrequencies(docs, idCol, textCol)
    // df as a count window over the token partition instead of a tf⋈df
    // self-join: the join formulation evaluates the tf subtree TWICE (two
    // full corpus scans — Catalyst can't share branches whose exchanges
    // differ), while the window rides one token-keyed exchange over the
    // already-aggregated (doc, token, tf) rows. One scan, three exchanges
    // total ((doc,token) agg → token window → doc window), no join.
    val withDf = tf.withColumn("df",
      count(lit(1)).over(Window.partitionBy(col("token"))))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    val scored = withDf
      .crossJoin(broadcast(n))
      .withColumn("score",
        round(col("tf") * (log((col("n_docs") + 1) / (col("df") + 1)) + 1),
          roundDigits))
    val w = Window.partitionBy(col("doc"))
      .orderBy(col("score").desc, col("token"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("doc"), col("token"), col("tf"), col("df"),
        col("score"), col("rank"))
  }

  /**
   * Inverted index: token → (document frequency, capped posting list of the
   * `maxPostings` SMALLEST doc ids, comma-joined). The cap is applied with
   * a per-token `row_number` BEFORE any list materializes, so no
   * aggregation buffer ever holds more than `maxPostings` entries — the
   * difference between "works" and "one stopword OOMs an executor" on a
   * web corpus. `n_docs` is the UNCAPPED document count, computed by a
   * count window riding the same token-keyed shuffle as the rank; the
   * final groupBy reuses that partitioning, so the whole index costs two
   * exchanges end to end ((doc,token) distinct, then token).
   */
  def invertedIndex(docs: DataFrame, idCol: String, textCol: String,
                    maxPostings: Int = 1000): DataFrame = {
    val pairs = graft.Tables.widen(docs).select(col(idCol).as("doc"),
        explode(TextFunctions.tokens(col(textCol))).as("token"))
      .distinct()
    val byToken = Window.partitionBy(col("token"))
    val ranked = pairs
      .withColumn("rn", row_number().over(byToken.orderBy(col("doc"))))
      .withColumn("n_docs", count(lit(1)).over(byToken))
    ranked.filter(col("rn") <= maxPostings)
      .groupBy(col("token"))
      .agg(first(col("n_docs")).as("n_docs"),
        // sort numerically first, stringify after (lexicographic "10"<"2"
        // would corrupt the order)
        concat_ws(",", transform(sort_array(collect_list(col("doc"))),
          _.cast("string"))).as("postings"))
  }

  /**
   * Corpus-self-trained bigram surprisal — the perplexity-style quality
   * filter of CCNet/RefinedWeb, with the corpus itself as the language
   * model (no external model artifact): for every document, the average
   * negative log Laplace-smoothed bigram probability
   * `-1/n · Σ tf·ln((c(w1,w2)+1)/(c(w1·)+V))`, where `c(w1·)` is the count
   * of w1 as a bigram head (so probabilities normalize per head) and V the
   * corpus vocabulary size. Garbled, shuffled, or out-of-domain text
   * scores high; templated text scores low. `exp(avg_surprisal)` is the
   * usual perplexity if a familiar unit is wanted.
   *
   * Scale shape: bigram occurrences aggregate to (doc, w1, w2, tf) with
   * map-side combine (one shuffle); the corpus counts c(w1,w2) and c(w1·)
   * are sum windows over those aggregated rows ((w1,w2)- and w1-keyed
   * exchanges — never a join back to a re-scanned corpus); V is a scalar
   * count-distinct broadcast into the plan (the one extra corpus pass).
   * Scores round to `roundDigits` for cross-engine ln()/sum-order
   * reproducibility. Documents with fewer than two tokens emit no bigrams
   * and are absent from the output.
   */
  def bigramSurprisal(docs: DataFrame, idCol: String, textCol: String,
                      roundDigits: Int = 4): DataFrame = {
    val bg = graft.Tables.widen(docs).select(col(idCol).as("doc"),
        explode(TextFunctions.ngrams(TextFunctions.tokens(col(textCol)), 2))
          .as("gram"))
      .select(col("doc"),
        split(col("gram"), " ").getItem(0).as("w1"),
        split(col("gram"), " ").getItem(1).as("w2"))
      .groupBy(col("doc"), col("w1"), col("w2"))
      .agg(count(lit(1)).as("tf"))
    val cb = sum(col("tf")).over(Window.partitionBy(col("w1"), col("w2")))
    val cu = sum(col("tf")).over(Window.partitionBy(col("w1")))
    val v = docs.select(explode(TextFunctions.tokens(col(textCol))).as("tok"))
      .agg(countDistinct(col("tok")).as("v"))
    bg.withColumn("cb", cb).withColumn("cu", cu)
      .crossJoin(broadcast(v))
      .groupBy(col("doc"))
      .agg(sum(col("tf")).as("n_bigrams"),
        round(-sum(col("tf") * log((col("cb") + 1) / (col("cu") + col("v"))))
          / sum(col("tf")), roundDigits).as("avg_surprisal"))
  }

  /**
   * C4-style duplicate-LINE removal (Raffel et al. 2020, §2.2 "we discarded
   * …​ any line that occurred more than once in the data set"; RefinedWeb's
   * line-dedup is the same shape with a document-frequency threshold): a
   * line that appears in at least `minDocs` DISTINCT documents is
   * boilerplate (navigation chrome, cookie banners, license footers) and is
   * struck from every document that contains it; line order inside each
   * document is preserved.
   *
   * Returns one row per input document:
   * `(doc, n_lines, kept_lines, removed_lines, clean_text)` — `clean_text`
   * is the surviving lines re-joined with `\n` (empty string when every
   * line was boilerplate; callers typically drop such rows).
   *
   * Scale shape (the corpus-level census is the whole point — per-doc
   * line-hashing needs no engine):
   *  - lines explode once with their position; the census key is `md5(line)`
   *    so the two line-keyed exchanges shuffle 32-byte digests, not raw
   *    line text;
   *  - the document-frequency census aggregates the DISTINCT (hash, doc)
   *    set — a repeated line within one document counts once, and the raw
   *    line stream is never re-shuffled;
   *  - flagged lines come back via a hash-keyed equi-JOIN (shuffle join on
   *    both sides): the boilerplate set on a web corpus is unbounded (every
   *    site's chrome), so a broadcast of it would be the driver-OOM shape;
   *  - reassembly is one doc-keyed aggregation; `collect_list` skips the
   *    nulled-out duplicate lines BEFORE the array materializes, so the
   *    buffer holds only surviving lines.
   */
  def lineDedup(docs: DataFrame, idCol: String, textCol: String,
                minDocs: Int): DataFrame = {
    require(minDocs >= 2, "minDocs must be at least 2")
    val lines = graft.Tables.widen(docs).select(col(idCol).as("doc"),
        posexplode(split(col(textCol), "\n")).as(Seq("pos", "line")))
      .withColumn("h", md5(col("line")))
    val census = lines.select(col("h"), col("doc")).distinct()
      .groupBy(col("h")).agg(count(lit(1)).as("line_df"))
    val flagged = lines.join(census, "h")
      .withColumn("dup", col("line_df") >= minDocs)
    flagged.groupBy(col("doc")).agg(
      count(lit(1)).as("n_lines"),
      count(when(!col("dup"), lit(1))).as("kept_lines"),
      count(when(col("dup"), lit(1))).as("removed_lines"),
      array_join(
        transform(
          array_sort(collect_list(when(!col("dup"),
            struct(col("pos"), col("line"))))),
          s => s.getField("line")),
        "\n").as("clean_text"))
  }

  /**
   * Document-frequency vocabulary report: tokens present in at least
   * `minDocFrac` of documents (the boilerplate/stopword census used to
   * decide df-based pruning thresholds). Emits (token, df, doc_frac).
   */
  def highDfTokens(docs: DataFrame, idCol: String, textCol: String,
                   minDocFrac: Double, roundDigits: Int = 4): DataFrame = {
    val df = documentFrequencies(termFrequencies(docs, idCol, textCol))
    val n = docs.agg(count(lit(1)).as("n_docs"))
    df.crossJoin(broadcast(n))
      .withColumn("doc_frac", round(col("df") / col("n_docs"), roundDigits))
      .filter(col("doc_frac") >= minDocFrac)
      .select(col("token"), col("df"), col("doc_frac"))
  }

  /**
   * DSIR-style importance weights (Xie et al. 2023, "Data Selection for
   * Language Models via Importance Resampling"): score every document by
   * how much its HASHED-bigram feature distribution looks like a target
   * domain rather than the raw corpus. For document d with bucket counts
   * c_d(b):
   *
   *   avg_logweight(d) = 1/|d| · Σ_b c_d(b) · [ln p̂_target(b) − ln p̂_raw(b)]
   *
   * with Laplace-smoothed bucket probabilities
   * p̂(b) = (c(b)+1)/(n+B) over B hash buckets. Documents resembling the
   * target (`targetFilter` rows) score high; selection keeps the top mass.
   *
   * Scale shape — the reason hashed n-grams work at 100 TB:
   *  - bigrams bucket map-side (md5 → one of B buckets), so the ONLY
   *    corpus-wide shuffle is the (doc, bucket) aggregation, and its key
   *    cardinality is ≤ B per document regardless of vocabulary size;
   *  - both distributions (target and raw) re-aggregate those SAME
   *    (doc, bucket, c) rows down to ≤ B rows each — never a second pass
   *    over raw text — and come back as one broadcast B-row table;
   *  - the per-doc score is a second pass over the aggregated rows with a
   *    broadcast hash join; nothing driver-side, nothing all-pairs.
   *
   * Determinism: bucket ids are md5-derived integers; the log-ratio is the
   * same double expression on both engines; per-doc sums round to
   * `roundDigits` (sum-order ulps, the t21 rule).
   *
   * Materialization note (100 TB): the intermediate (doc, bucket, c) rows
   * feed three consumers and are pinned by an explicit `.cache()` — the
   * ONLY curation operator whose pinned intermediate grows linearly with
   * corpus size (≤ `buckets` rows/doc, ~100× smaller than raw text; it
   * spills to disk under MEMORY_AND_DISK, so the pin costs storage, not
   * heap). At cluster scale, where executor churn evicts cache blocks and
   * forces recomputes of the whole tokenize+hash subtree, pass
   * `materializeDir` to write the aggregate once to parquet and read it
   * back: recompute-free under executor loss, storage off the block
   * manager, reclaimable by the caller after the job.
   */
  def dsirWeights(docs: DataFrame, idCol: String, textCol: String,
                  targetFilter: Column, buckets: Int = 128,
                  roundDigits: Int = 4,
                  materializeDir: Option[String] = None): DataFrame = {
    // Cache barrier: the aggregated (doc, bucket, c) rows feed THREE
    // consumers (bucket distributions, corpus totals, and the score join) —
    // without it the tokenize+hash+aggregate subtree evaluates three times
    // (measured 2.5 s → ~1 s at sf0.1). Only the aggregated rows are
    // retained: ≤ B per document, never raw text.
    val bgRaw = graft.Tables.widen(docs)
      .select(col(idCol).as("doc"), targetFilter.as("is_target"),
        explode(TextFunctions.ngrams(TextFunctions.tokens(col(textCol)), 2))
          .as("gram"))
      .withColumn("b",
        TextFunctions.md5Prefix32(col("gram")) % buckets)
      .groupBy(col("doc"), col("is_target"), col("b"))
      .agg(count(lit(1)).as("c"))
    val bg = materializeDir match {
      case Some(dir) =>
        bgRaw.write.mode("overwrite").parquet(dir)
        docs.sparkSession.read.parquet(dir)
      case None => bgRaw.cache()
    }
    val dist = bg.groupBy(col("b")).agg(
      sum(col("c")).as("c_raw"),
      coalesce(sum(when(col("is_target"), col("c"))), lit(0L)).as("c_tgt"))
    val totals = bg.agg(
      sum(col("c")).as("n_raw"),
      coalesce(sum(when(col("is_target"), col("c"))), lit(0L)).as("n_tgt"))
    bg.join(broadcast(dist), "b")
      .crossJoin(broadcast(totals))
      .withColumn("lw", col("c") *
        (log((col("c_tgt") + 1) / (col("n_tgt") + buckets)) -
         log((col("c_raw") + 1) / (col("n_raw") + buckets))))
      .groupBy(col("doc"))
      .agg(sum(col("c")).as("n_grams"),
        round(sum(col("lw")) / sum(col("c")), roundDigits).as("avg_logweight"))
  }
}
