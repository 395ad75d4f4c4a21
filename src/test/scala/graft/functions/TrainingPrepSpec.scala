package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Training-prep operators: Gopher-rule quality flags and the deterministic
  * epoch shuffle/shard assignment. */
class TrainingPrepSpec extends SparkTestBase {
  import spark.implicits._

  private def flagsOf(text: String): Map[String, Any] = {
    val row = Seq(Tuple1(text)).toDF("text")
      .select(TextFunctions.gopherFlags(col("text")).map { case (n, c) => c.as(n) }: _*)
      .head()
    row.schema.fieldNames.zip(row.toSeq).toMap
  }

  // 60 words, mean length ~3.8, two Gopher stopwords, no symbols/bullets
  private val goodText = Seq.fill(10)("the quick brown fox jumps of").mkString(" ")

  test("gopher: a clean document passes every rule") {
    val f = flagsOf(goodText)
    assert(f("n_words") == 60L)
    Seq("f_word_count", "f_mean_word_len", "f_symbol_ratio", "f_bullet",
      "f_ellipsis", "f_alpha", "f_stopwords", "keep")
      .foreach(k => assert(f(k) == true, s"$k should pass: $f"))
  }

  test("gopher: short documents fail the word-count rule only") {
    val f = flagsOf("the of cat")
    assert(f("f_word_count") == false && f("keep") == false)
    assert(f("f_stopwords") == true && f("f_alpha") == true)
  }

  test("gopher: symbol spam fails the symbol-ratio rule") {
    // 20 '#' over 80 words → 200 < 80 is false
    val f = flagsOf(goodText + " " + Seq.fill(20)("#").mkString(" "))
    assert(f("f_symbol_ratio") == false && f("keep") == false)
    assert(f("f_word_count") == true)
  }

  test("gopher: the symbol threshold applies to EACH symbol separately") {
    // goodText is 60 words; 6 '#' + 6 'ok...' appended → 72 words total:
    // each symbol's 6·10 = 60 < 72, so the paper keeps the document — a
    // summed form (12·10 = 120 ≥ 72) would wrongly discard it
    val t = goodText + " " +
      (Seq.fill(6)("#") ++ Seq.fill(6)("ok...")).mkString(" ")
    val f = flagsOf(t)
    assert(f("f_symbol_ratio") == true, f)
    // one symbol class crossing 10% alone still fails: 8 '...' over 68
    // words → 80 ≥ 68
    val t2 = goodText + " " + Seq.fill(8)("ok...").mkString(" ")
    assert(flagsOf(t2)("f_symbol_ratio") == false)
  }

  test("gopher: bullet-dominated documents fail the bullet rule") {
    // 10 lines, 9 bulleted → 90 < 90 is false (exactly-90% boundary fails)
    val t = (Seq.fill(9)("- item") :+ "closing line").mkString("\n")
    assert(flagsOf(t)("f_bullet") == false)
    // 8 of 10 bulleted → 80 < 90 passes
    val t2 = (Seq.fill(8)("- item") ++ Seq("a line", "b line")).mkString("\n")
    assert(flagsOf(t2)("f_bullet") == true)
  }

  test("gopher: ellipsis-heavy documents fail the ellipsis rule") {
    // 4 of 10 lines end with "..." → 40 < 30 is false
    val t = (Seq.fill(4)("trailing...") ++ Seq.fill(6)("plain line")).mkString("\n")
    assert(flagsOf(t)("f_ellipsis") == false)
    // 2 of 10 → 20 < 30 passes
    val t2 = (Seq.fill(2)("trailing...") ++ Seq.fill(8)("plain line")).mkString("\n")
    assert(flagsOf(t2)("f_ellipsis") == true)
  }

  test("gopher: numeric documents fail the alphabetic-word rule") {
    // 2 alpha words of 10 → 10 >= 32 is false
    val f = flagsOf("1 2 3 4 5 6 7 8 the of")
    assert(f("f_alpha") == false)
    assert(f("f_stopwords") == true)
  }

  test("gopher: documents without the required stopwords fail the stopword rule") {
    val f = flagsOf(Seq.fill(60)("lorem").mkString(" "))
    assert(f("f_stopwords") == false)
    // one stopword is not enough — the rule wants at least two distinct
    val f1 = flagsOf(("the " + Seq.fill(59)("lorem").mkString(" ")))
    assert(f1("f_stopwords") == false)
  }

  test("epoch shards: deterministic, dense positions, bounded shard range") {
    val df = spark.range(0, 1000).toDF("id")
    val a = Packing.epochShards(df, "id", seed = "e1", hexDigits = 1)
      .select("id", "shard", "pos")
    val b = Packing.epochShards(df, "id", seed = "e1", hexDigits = 1)
      .select("id", "shard", "pos")
    assert(a.collect().toSet == b.collect().toSet, "same seed must reproduce")
    val rows = a.as[(Long, Long, Long)].collect()
    assert(rows.forall { case (_, s, _) => s >= 0 && s < 16 })
    // positions are dense 1..k within each shard
    rows.groupBy(_._2).foreach { case (_, g) =>
      assert(g.map(_._3).sorted.toSeq == (1L to g.length).toSeq)
    }
    // every input row appears exactly once
    assert(rows.map(_._1).sorted.toSeq == (0L until 1000L).toSeq)
  }

  test("epoch shards: a new seed is a different permutation") {
    val df = spark.range(0, 500).toDF("id")
    val e1 = Packing.epochShards(df, "id", "e1", hexDigits = 1)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toMap2
    val e2 = Packing.epochShards(df, "id", "e2", hexDigits = 1)
      .select("id", "shard", "pos").as[(Long, Long, Long)].collect().toMap2
    val moved = e1.keys.count(id => e1(id) != e2(id))
    assert(moved > 400, s"a reseed should reshuffle nearly everything ($moved/500)")
  }

  test("epoch shards plan: shard-keyed window, no single-partition global sort") {
    val df = spark.range(0, 100).toDF("id")
    val plan = Packing.epochShards(df, "id", "e1", hexDigits = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("Window"), plan)
    assert(!plan.contains("SinglePartition"),
      "epoch sharding must never funnel the corpus through one partition")
  }

  test("span removal: keep-first masks later copies, boundary tokens survive") {
    val d = Seq(
      (1L, "u1 u2 c1 c2 c3 c4 c5 u3"),
      (2L, "v1 c1 c2 c3 c4 c5 v2 v3")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(d, "doc_id", "text", k = 3)
      .orderBy("doc").as[(Long, Long, Long, String)].collect().toSeq
    // doc 1 holds every gram's first occurrence → untouched
    assert(got.head == ((1L, 8L, 0L, "u1 u2 c1 c2 c3 c4 c5 u3")))
    // doc 2's copy of the span is struck; its unique context survives
    assert(got(1) == ((2L, 8L, 5L, "v1 v2 v3")))
  }

  test("span removal: within-doc repeats keep only the first occurrence") {
    val d = Seq((1L, "r1 r2 r3 x r1 r2 r3")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(d, "doc_id", "text", k = 3)
      .as[(Long, Long, Long, String)].head()
    assert(got == ((1L, 7L, 3L, "r1 r2 r3 x")))
  }

  test("span removal: documents shorter than k are untouched") {
    val d = Seq((1L, "a b"), (2L, "a b")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(d, "doc_id", "text", k = 3)
      .orderBy("doc").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 2L, 0L, "a b"), (2L, 2L, 0L, "a b")))
  }

  test("span removal: an exact full duplicate empties the later copy") {
    val d = Seq(
      (1L, "d1 d2 d3 d4 d5"),
      (2L, "d1 d2 d3 d4 d5")).toDF("doc_id", "text")
    val got = Dedup.removeDuplicatedSpans(d, "doc_id", "text", k = 3)
      .orderBy("doc").as[(Long, Long, Long, String)].collect().toSeq
    assert(got == Seq((1L, 5L, 0L, "d1 d2 d3 d4 d5"), (2L, 5L, 5L, "")))
  }

  private implicit class Map2[A, B, C](rows: Array[(A, B, C)]) {
    def toMap2: Map[A, (B, C)] = rows.map(r => r._1 -> ((r._2, r._3))).toMap
  }
}
