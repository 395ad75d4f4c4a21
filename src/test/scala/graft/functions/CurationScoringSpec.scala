package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** DSIR importance weights, hashed-linear classifier inference, and
  * intra-class centroid outliers — semantics plus the plan properties that
  * keep each one 100 TB-shaped (broadcast distributions, zero-shuffle
  * scoring, bounded centroid aggregation). */
class CurationScoringSpec extends SparkTestBase {
  import spark.implicits._

  // ---- DSIR hashed-bigram importance weights -------------------------------

  private def dsirDocs = Seq(
    // target domain: "alpha beta gamma" phrasing
    (1L, "alpha beta gamma alpha beta", true),
    (2L, "alpha beta gamma beta gamma", true),
    // raw-only background: "delta epsilon zeta" phrasing
    (3L, "delta epsilon zeta delta epsilon", false),
    (4L, "delta epsilon zeta epsilon zeta", false),
    // held-out probes, one per style
    (5L, "alpha beta gamma", false),
    (6L, "delta epsilon zeta", false))
    .toDF("doc_id", "text", "is_tgt")

  test("dsir: target-styled probe outscores background-styled probe") {
    val w = Corpus.dsirWeights(dsirDocs, "doc_id", "text", col("is_tgt"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._3).toMap
    assert(w(5L) > w(6L),
      s"target-phrased doc should carry a higher importance weight: $w")
    // the target docs themselves score at least as high as pure background
    assert(w(1L) > w(3L) && w(2L) > w(4L))
  }

  test("dsir: n_grams counts bigram occurrences per doc") {
    val n = Corpus.dsirWeights(dsirDocs, "doc_id", "text", col("is_tgt"))
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r._2).toMap
    // 5 tokens → 4 bigrams; 3 tokens → 2 bigrams
    assert(n(1L) == 4L && n(5L) == 2L)
  }

  test("dsir: sub-token docs are absent, weights are finite") {
    val d = Seq((1L, "only", false), (2L, "two tokens", true))
      .toDF("doc_id", "text", "is_tgt")
    val rows = Corpus.dsirWeights(d, "doc_id", "text", col("is_tgt"))
      .as[(Long, Long, Double)].collect()
    assert(rows.map(_._1).toSeq == Seq(2L))
    assert(rows.forall(r => !r._3.isNaN && !r._3.isInfinite))
  }

  test("dsir plan: distributions come back broadcast, one doc-keyed score agg") {
    val plan = Corpus.dsirWeights(dsirDocs, "doc_id", "text", col("is_tgt"))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("SortMergeJoin"),
      "bucket distributions must broadcast, never shuffle-join the corpus:\n" + plan)
    assert(plan.contains("BroadcastHashJoin") || plan.contains("BroadcastNestedLoopJoin"))
  }

  // ---- hashed linear classifier --------------------------------------------

  test("classifier score matches a hand-computed sigmoid for one token") {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest("hello".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString.substring(0, 8)
    val wt = (java.lang.Long.parseLong(hex, 16) % 2001 - 1000) / 1000.0
    val expect = BigDecimal(1.0 / (1.0 + math.exp(-wt)))
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val got = Seq("hello").toDF("text")
      .select(TextFunctions.classifierScore(col("text")).as("s"))
      .as[Double].head()
    assert(got == expect)
  }

  test("classifier score is bounded and deterministic") {
    val d = Seq("a b c", "quick brown fox", "x").toDF("text")
    val s1 = d.select(TextFunctions.classifierScore(col("text"))).as[Double].collect()
    val s2 = d.select(TextFunctions.classifierScore(col("text"))).as[Double].collect()
    assert(s1.toSeq == s2.toSeq)
    assert(s1.forall(v => v > 0.0 && v < 1.0))
  }

  test("classifier plan: zero shuffles — map-side inference only") {
    val plan = Seq("a b").toDF("text")
      .select(TextFunctions.classifierScore(col("text")))
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"),
      "hashed-weight inference must not shuffle:\n" + plan)
  }

  // ---- centroid outliers ---------------------------------------------------

  private def vecs = {
    // label 0: tight cluster around (1, 0) with one flipped outlier
    val l0 = Seq(
      (1L, Array(1.0f, 0.0f), 0),
      (2L, Array(0.9f, 0.1f), 0),
      (3L, Array(1.0f, 0.1f), 0),
      (4L, Array(-1.0f, 0.05f), 0)) // outlier
    // label 1: cluster around (0, 1), one orthogonal-ish member
    val l1 = Seq(
      (5L, Array(0.0f, 1.0f), 1),
      (6L, Array(0.1f, 0.9f), 1),
      (7L, Array(1.0f, 0.2f), 1)) // least aligned
    (l0 ++ l1).toDF("vec_id", "embedding", "label")
  }

  test("centroid outliers rank the flipped vector first in its class") {
    val out = Similarity.centroidOutliers(vecs, "vec_id", "embedding", "label", k = 2)
      .as[(Int, Long, Double, Int)].collect()
    val byLabel = out.groupBy(_._1)
    assert(byLabel(0).find(_._4 == 1).get._2 == 4L)
    assert(byLabel(1).find(_._4 == 1).get._2 == 7L)
    // k caps output per label
    assert(byLabel.values.forall(_.length == 2))
  }

  test("centroid cosine is scale-invariant (sum centroid ≡ mean centroid)") {
    // duplicating every member leaves each cosine unchanged: cos(v, 2Σ) = cos(v, Σ)
    val doubled = vecs.unionByName(
      vecs.withColumn("vec_id", col("vec_id") + 100L))
    val base = Similarity.centroidOutliers(vecs, "vec_id", "embedding", "label", k = 10)
      .as[(Int, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    val dup = Similarity.centroidOutliers(doubled, "vec_id", "embedding", "label", k = 20)
      .as[(Int, Long, Double, Int)].collect()
      .filter(_._2 <= 100L).map(r => (r._1, r._2) -> r._3).toMap
    assert(base.keySet.forall(k0 => base(k0) == dup(k0)),
      "duplicating the class must not move any member's centroid cosine")
  }

  test("centroid outliers plan: centroid joins back broadcast") {
    val plan = Similarity.centroidOutliers(vecs, "vec_id", "embedding", "label", k = 2)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"),
      "labels × dims centroid table must broadcast:\n" + plan)
    assert(!plan.contains("SortMergeJoin"), plan)
  }
}
