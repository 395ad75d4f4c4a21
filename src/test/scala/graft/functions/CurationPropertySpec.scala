package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import scala.util.Random

/**
 * Property checks for the newest curation operators against naive
 * driver-side reimplementations over random corpora (fixed-seed RNG,
 * replayable):
 *  - incrementalDedup's exact/near/kept statuses vs brute-force all-pairs
 *    Jaccard + fingerprint membership (also pins the PPJoin prefix
 *    filter's recall = 1.0 on the cross-side join);
 *  - dsirWeights vs a naive bucket-count log-ratio computation.
 */
class CurationPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "dd", "ee", "fff", "g", "hh")

  private def randomDoc(rng: Random): String = {
    val n = 3 + rng.nextInt(10)
    (0 until n).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" ")
  }

  private def trigrams(t: String): Set[String] = {
    val toks = t.split(" ")
    if (toks.length < 3) Set.empty
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  private def jaccard(a: Set[String], b: Set[String]): Double = {
    val u = (a ++ b).size
    if (u == 0) 0.0 else (a & b).size.toDouble / u
  }

  private def normFp(t: String): String =
    t.toLowerCase.replaceAll("\\s+", " ")

  test("incrementalDedup statuses match brute force on random corpora") {
    val rng = new Random(11)
    (1 to 5).foreach { trial =>
      val nEx = 4 + rng.nextInt(8)
      val nB = 4 + rng.nextInt(8)
      val existing = (1 to nEx).map(i => (i.toLong, randomDoc(rng)))
      // batch: random docs, plus a mutated copy and an exact copy of
      // existing docs so every status arises
      val batch = (1 to nB).map(i => (100L + i, randomDoc(rng))) ++ Seq(
        (200L, existing(rng.nextInt(nEx))._2),
        (201L, existing(rng.nextInt(nEx))._2 + " " +
          existing(rng.nextInt(nEx))._2))
      val exFps = existing.map(d => normFp(d._2)).toSet
      val exShingles = existing.map(d => trigrams(d._2))
      val expected = batch.map { case (id, t) =>
        val st =
          if (exFps.contains(normFp(t))) "exact_dup"
          else if (exShingles.exists(s => jaccard(trigrams(t), s) >= 0.5))
            "near_dup"
          else "kept"
        id -> st
      }.toMap
      val got = Dedup.incrementalDedup(
          existing.toDF("doc_id", "text"), batch.toDF("doc_id", "text"),
          "doc_id", "text", n = 3, threshold = 0.5)
        .as[(Long, String)].collect().toMap
      assert(got == expected, s"trial $trial:\n got=$got\n exp=$expected")
    }
  }

  test("dsirWeights matches a naive bucket log-ratio computation") {
    val rng = new Random(23)
    val buckets = 16
    (1 to 3).foreach { trial =>
      val corpus = (1 to 8 + rng.nextInt(6))
        .map(i => (i.toLong, randomDoc(rng), i % 3 == 0))
      val docs = corpus.toDF("doc_id", "text", "is_t")

      def bigrams(t: String): Seq[String] = {
        val toks = t.split(" ")
        if (toks.length < 2) Seq.empty else toks.sliding(2).map(_.mkString(" ")).toSeq
      }
      // same md5-prefix bucket rule as the operator
      def bucket(g: String): Long = {
        val md = java.security.MessageDigest.getInstance("MD5")
        val hex = md.digest(g.getBytes("UTF-8")).map("%02x".format(_))
          .mkString.substring(0, 8)
        java.lang.Long.parseLong(hex, 16) % buckets
      }
      val perDoc: Seq[(Long, Boolean, Map[Long, Long])] = corpus.map {
        case (id, t, tgt) =>
          (id, tgt, bigrams(t).groupBy(bucket).view.mapValues(_.size.toLong).toMap)
      }
      val raw = perDoc.flatMap(_._3).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
      val tgt = perDoc.filter(_._2).flatMap(_._3).groupBy(_._1).view
        .mapValues(_.map(_._2).sum).toMap
      val nRaw = raw.values.sum
      val nTgt = tgt.values.sum
      val expected: Map[Long, (Long, Double)] = perDoc
        .filter(_._3.nonEmpty)
        .map { case (id, _, counts) =>
          val nG = counts.values.sum
          val lw = counts.map { case (b, c) =>
            c * (math.log((tgt.getOrElse(b, 0L) + 1.0) / (nTgt + buckets)) -
                 math.log((raw(b) + 1.0) / (nRaw + buckets)))
          }.sum
          id -> (nG, BigDecimal(lw / nG)
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }.toMap
      val got = Corpus.dsirWeights(docs, "doc_id", "text", col("is_t"),
          buckets = buckets)
        .as[(Long, Long, Double)].collect()
        .map(r => r._1 -> (r._2, r._3)).toMap
      assert(got.keySet == expected.keySet, s"trial $trial keys")
      expected.foreach { case (id, (nG, w)) =>
        assert(got(id)._1 == nG, s"trial $trial doc $id n_grams")
        assert(math.abs(got(id)._2 - w) <= 1e-4,
          s"trial $trial doc $id weight: got ${got(id)._2}, exp $w")
      }
    }
  }
}
