package graft.functions

import graft.SparkTestBase
import scala.util.Random

/**
 * Pins [[Dedup.removeDuplicatedSpans]]'s contract against an exact driver
 * reimplementation of the documented rule: rank every k-gram occurrence in
 * (doc, pos) corpus order, mask every occurrence except rank 1, drop a
 * token iff a masked occurrence's span [p, p+k) covers it.
 *
 * Corpora draw from a tiny vocabulary so duplicated grams arise naturally
 * in every shape — overlapping spans, within-doc repeats, cross-doc chains,
 * full-document copies — not just the planted-paragraph shape the t26 gate
 * uses.
 */
class SpanRemovalPropertySpec extends SparkTestBase {
  import spark.implicits._

  /** Exact keep-first span masking on the driver. */
  private def reference(docs: Seq[(Long, String)],
                        k: Int): Map[Long, (Long, Long, String)] = {
    val toks = docs.map { case (id, t) => id -> t.split(" ", -1).toVector }.toMap
    val occs = for {
      (id, ts) <- toks.toSeq
      p <- 0 to ts.length - k
    } yield (ts.slice(p, p + k).mkString(" "), id, p)
    val first = occs.groupBy(_._1).map { case (g, os) =>
      g -> os.map(o => (o._2, o._3)).min
    }
    docs.map { case (id, _) =>
      val ts = toks(id)
      val covered = occs.collect {
        case (g, `id`, p) if first(g) != ((id, p)) => p
      }.flatMap(p => p until p + k).toSet
      val kept = ts.indices.filterNot(covered).map(ts)
      id -> ((ts.length.toLong, covered.size.toLong, kept.mkString(" ")))
    }.toMap
  }

  private def run(docs: Seq[(Long, String)], k: Int): Map[Long, (Long, Long, String)] =
    Dedup.removeDuplicatedSpans(docs.toDF("doc_id", "text"), "doc_id", "text", k)
      .as[(Long, Long, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3, r._4))).toMap

  test("random small-vocabulary corpora match the exact keep-first rule") {
    val rng = new Random(29)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g", "h")
    (1 to 5).foreach { trial =>
      val nDocs = 4 + rng.nextInt(8)
      val docs = (0L until nDocs.toLong).map { id =>
        val len = 5 + rng.nextInt(16)
        id -> Seq.fill(len)(vocab(rng.nextInt(vocab.size))).mkString(" ")
      }
      val k = 3 + rng.nextInt(2)
      val expected = reference(docs, k)
      val got = run(docs, k)
      assert(got == expected, s"trial $trial (k=$k): mismatch\n" +
        s"got      $got\nexpected $expected\ncorpus   $docs")
    }
  }

  test("shuffled doc ids keep the global (doc,pos) order rule, not input order") {
    // same corpus, ids permuted: the survivor copy must follow the NEW ids
    val body = "x y z w x y z w q"
    val docsA = Seq(1L -> body, 2L -> body)
    val docsB = Seq(2L -> body, 1L -> body) // same set, reversed input order
    assert(run(docsA, 3) == run(docsB, 3))
    assert(run(docsA, 3)(1L)._2 > 0L || run(docsA, 3)(2L)._2 > 0L)
    // the lower id keeps more: its within-doc first occurrences win
    val a = run(docsA, 3)
    assert(a(1L)._2 < a(2L)._2)
  }
}
