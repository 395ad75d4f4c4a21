package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Corpus-level term statistics: tf/df/TF-IDF and the capped inverted
  * index, including the plan properties that make them 100 TB-shaped. */
class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  private def docs = Seq(
    (1L, "a b a c"),
    (2L, "a b"),
    (3L, "c d d d"),
    (4L, "a")).toDF("doc_id", "text")

  test("term and document frequencies") {
    val tf = Corpus.termFrequencies(docs, "doc_id", "text")
    assert(tf.filter($"doc" === 1L && $"token" === "a").select("tf")
      .as[Long].head() == 2L)
    val df = Corpus.documentFrequencies(tf).as[(String, Long)].collect().toMap
    assert(df == Map("a" -> 3L, "b" -> 2L, "c" -> 2L, "d" -> 1L))
  }

  test("tfidf ranks rarer tokens above common ones at equal tf") {
    val top = Corpus.tfidfTopK(docs, "doc_id", "text", k = 2)
    // doc 3: d has tf=3 df=1 → clearly first; c (tf=1, df=2) second
    val doc3 = top.filter($"doc" === 3L).orderBy($"rank")
      .select("token").as[String].collect().toSeq
    assert(doc3 == Seq("d", "c"))
    // doc 2: a and b both tf=1, but b is rarer (df 2 < 3) → b outranks a
    val doc2 = top.filter($"doc" === 2L).orderBy($"rank")
      .select("token").as[String].collect().toSeq
    assert(doc2 == Seq("b", "a"))
    // smoothed idf is never zero → every token scores > 0
    assert(top.filter($"score" <= 0).isEmpty)
  }

  test("tfidf plan: one corpus scan, no tf/df self-join") {
    val plan = Corpus.tfidfTopK(docs, "doc_id", "text", k = 2)
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin") && !plan.contains("BroadcastHashJoin")
      || !plan.contains("token#"), "df must come from a window, not a join")
    // the rank<=k filter is pushed into the window as a group limit
    assert(plan.contains("WindowGroupLimit"))
  }

  test("inverted index caps postings but reports the uncapped df") {
    val many = (1 to 50).map(i => (i.toLong, "x common")).toDF("doc_id", "text")
    val idx = Corpus.invertedIndex(many, "doc_id", "text", maxPostings = 5)
      .as[(String, Long, String)].collect().toMap2
    assert(idx("x") == (50L, "1,2,3,4,5"))
    assert(idx("common") == (50L, "1,2,3,4,5"))
  }

  test("inverted index postings sort numerically, not lexicographically") {
    val d = Seq((2L, "t"), (10L, "t"), (1L, "t")).toDF("doc_id", "text")
    val row = Corpus.invertedIndex(d, "doc_id", "text", maxPostings = 10)
      .as[(String, Long, String)].head()
    assert(row == (("t", 3L, "1,2,10")))
  }

  test("duplicated-span census counts occurrences, including within-doc repeats") {
    val d = Seq(
      (1L, "a b c a b c"),   // trigrams: abc, bca, cab, abc → "a b c" ×2
      (2L, "a b c x y z"),   // shares "a b c" with doc 1
      (3L, "p q r s")).toDF("doc_id", "text") // all unique
    val got = Dedup.duplicatedSpanStats(d, "doc_id", "text", n = 3)
      .orderBy("doc").as[(Long, Long, Long, Double)].collect().toSeq
    // doc 1: 4 trigram occurrences, "a b c" appears 3× corpus-wide → its 2
    // occurrences are dup; others unique → 2/4
    assert(got == Seq((1L, 4L, 2L, 0.5), (2L, 4L, 1L, 0.25), (3L, 2L, 0L, 0.0)))
    // a doc shorter than n emits nothing
    val short = Dedup.duplicatedSpanStats(
      Seq((9L, "a b")).toDF("doc_id", "text"), "doc_id", "text", n = 3)
    assert(short.isEmpty)
  }

  test("bigram surprisal: repeated corpus patterns score lower than novel ones") {
    val d = Seq(
      (1L, "the cat sat"), (2L, "the cat sat"), (3L, "the cat sat"),
      (4L, "zqx wvb kjm")).toDF("doc_id", "text") // one-off bigrams
    val got = Corpus.bigramSurprisal(d, "doc_id", "text")
      .as[(Long, Long, Double)].collect().map(r => r._1 -> ((r._2, r._3))).toMap
    assert(got.keySet == Set(1L, 2L, 3L, 4L))
    assert(got(1L)._1 == 2L) // "the cat", "cat sat"
    assert(got(1L) == got(2L)) // identical docs, identical scores
    assert(got(4L)._2 > got(1L)._2) // novel bigrams are more surprising
    // hand-check doc 1: V=6, c(the cat)=c(cat sat)=3, c(the ·)=c(cat ·)=3
    // → each term -ln((3+1)/(3+6)); avg = ln(9/4)
    assert(math.abs(got(1L)._2 - math.log(9.0 / 4)) < 1e-3)
    // sub-bigram docs are absent
    val short = Corpus.bigramSurprisal(
      Seq((9L, "solo")).toDF("doc_id", "text"), "doc_id", "text")
    assert(short.isEmpty)
  }

  test("line dedup strikes corpus-frequent lines, preserves order") {
    val d = Seq(
      (1L, "alpha one\nboiler\nalpha two"),
      (2L, "beta one\nboiler\nbeta two"),
      (3L, "boiler\ngamma only")).toDF("doc_id", "text")
    val got = Corpus.lineDedup(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc").as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 3L, 2L, 1L, "alpha one\nalpha two"),
      (2L, 3L, 2L, 1L, "beta one\nbeta two"),
      (3L, 2L, 1L, 1L, "gamma only")))
  }

  test("line dedup counts a within-doc repeat as ONE document") {
    // "dup" appears twice in doc 1 but only doc 2 also has it → df = 2,
    // below minDocs = 3, so it survives everywhere
    val d = Seq(
      (1L, "dup\nmid\ndup"),
      (2L, "dup\nother"),
      (3L, "clean")).toDF("doc_id", "text")
    val got = Corpus.lineDedup(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc").as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got.head == ((1L, 3L, 3L, 0L, "dup\nmid\ndup")))
  }

  test("line dedup: a fully-boilerplate doc keeps zero lines, empty clean_text") {
    val d = Seq(
      (1L, "x\ny"), (2L, "x\ny"), (3L, "x\ny"),
      (4L, "x")).toDF("doc_id", "text")
    val got = Corpus.lineDedup(d, "doc_id", "text", minDocs = 3)
      .orderBy("doc").as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got(3) == ((4L, 1L, 0L, 1L, "")))
    assert(got.head == ((1L, 2L, 0L, 2L, "")))
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
