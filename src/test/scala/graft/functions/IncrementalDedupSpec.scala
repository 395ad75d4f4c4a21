package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Cross-corpus incremental dedup: exact/near/kept classification of a new
  * batch against an existing corpus, and the plan properties that keep it
  * equi-join-only at corpus scale. */
class IncrementalDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def existing = Seq(
    (1L, "a b c d e f"),
    (2L, "x y z w q v")).toDF("doc_id", "text")

  private def batch = Seq(
    (10L, "a b c d e f"),              // exact dup of 1
    (11L, "a b c d e f g"),            // near dup of 1 (trigram J = 4/5)
    (12L, "totally different tokens here now friend"), // new
    (13L, "p q r s t u"),              // new, near-dups doc 14 but NOT existing
    (14L, "p q r s t u w")).toDF("doc_id", "text")

  private def statuses =
    Dedup.incrementalDedup(existing, batch, "doc_id", "text",
        n = 3, threshold = 0.5)
      .as[(Long, String)].collect().toMap

  test("classifies exact, near, and kept batch docs against the corpus") {
    assert(statuses == Map(
      10L -> "exact_dup",
      11L -> "near_dup",
      12L -> "kept",
      13L -> "kept",
      14L -> "kept"))
  }

  test("within-batch near-dups are NOT flagged (only the corpus counts)") {
    // 13 and 14 are near-dups of each other, but incremental dedup only
    // compares against the existing corpus — both survive
    assert(statuses(13L) == "kept" && statuses(14L) == "kept")
  }

  test("exact beats near when both apply") {
    assert(statuses(10L) == "exact_dup")
  }

  test("normalization: whitespace/case variants are exact dups") {
    val b = Seq((20L, "A  B C D E F")).toDF("doc_id", "text")
    val st = Dedup.incrementalDedup(existing, b, "doc_id", "text")
      .as[(Long, String)].head()
    assert(st == ((20L, "exact_dup")))
  }

  test("sub-shingle batch docs fall through to the exact pass only") {
    val b = Seq((30L, "a b"), (31L, "x y z w q v")).toDF("doc_id", "text")
    val st = Dedup.incrementalDedup(existing, b, "doc_id", "text")
      .as[(Long, String)].collect().toMap
    assert(st(30L) == "kept")      // too short for trigrams, not in corpus
    assert(st(31L) == "exact_dup") // identical to doc 2
  }

  test("plan: equi-joins only — no cartesian or nested-loop anywhere") {
    val plan = Dedup.incrementalDedup(existing, batch, "doc_id", "text")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("CartesianProduct"), plan)
    assert(!plan.contains("BroadcastNestedLoopJoin"), plan)
  }
}
