package graft.functions

import graft.SparkTestBase
import org.apache.spark.sql.functions._
import scala.util.Random

/**
 * Property check: the distributed corpus statistics agree with a naive
 * driver-side reimplementation over randomly generated corpora (fixed-seed
 * RNG, replayable). Covers termFrequencies/documentFrequencies/tfidfTopK
 * ranking, invertedIndex postings, duplicatedSpanStats, and
 * bigramSurprisal probabilities.
 */
class CorpusPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Vector("a", "b", "c", "dd", "ee", "fff")

  private def randomCorpus(rng: Random, nDocs: Int): Seq[(Long, String)] =
    (1 to nDocs).map { i =>
      val n = 1 + rng.nextInt(8)
      (i.toLong, (0 until n).map(_ => vocab(rng.nextInt(vocab.size))).mkString(" "))
    }

  test("tf/df/tfidf agree with a naive reimplementation") {
    val rng = new Random(7)
    (1 to 3).foreach { trial =>
      val corpus = randomCorpus(rng, 6 + rng.nextInt(6))
      val docs = corpus.toDF("doc_id", "text")

      val naiveTf: Map[(Long, String), Long] = corpus
        .flatMap { case (id, t) => t.split(" ").map(w => (id, w)) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val gotTf = Corpus.termFrequencies(docs, "doc_id", "text")
        .as[(Long, String, Long)].collect()
        .map(r => (r._1, r._2) -> r._3).toMap
      assert(gotTf == naiveTf, s"trial $trial tf")

      val naiveDf: Map[String, Long] = naiveTf.keys.toSeq
        .map(_._2).groupBy(identity).view.mapValues(_.size.toLong).toMap
      val gotDf = Corpus.documentFrequencies(
          Corpus.termFrequencies(docs, "doc_id", "text"))
        .as[(String, Long)].collect().toMap
      assert(gotDf == naiveDf, s"trial $trial df")

      // tfidf ranking: recompute scores naively and check the top-k per doc
      val nD = corpus.size
      val k = 3
      val naiveTop: Map[Long, Seq[String]] = naiveTf.toSeq
        .map { case ((id, w), tf) =>
          val score = BigDecimal(
            tf * (math.log((nD + 1.0) / (naiveDf(w) + 1.0)) + 1))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP)
          (id, w, score)
        }
        .groupBy(_._1).view.mapValues(
          _.sortBy { case (_, w, s) => (-s, w) }.take(k).map(_._2)).toMap
      val gotTop = Corpus.tfidfTopK(docs, "doc_id", "text", k)
        .orderBy(col("doc"), col("rank"))
        .select(col("doc"), col("token")).as[(Long, String)].collect()
        .groupBy(_._1).view.mapValues(_.map(_._2).toSeq).toMap
      assert(gotTop == naiveTop, s"trial $trial tfidf top-$k")
    }
  }

  test("inverted index and duplicated spans agree with naive recomputation") {
    val rng = new Random(11)
    val corpus = randomCorpus(rng, 10)
    val docs = corpus.toDF("doc_id", "text")

    val pairs = corpus.flatMap { case (id, t) =>
      t.split(" ").distinct.map(w => (w, id)) }
    val naiveIdx: Map[String, (Long, String)] = pairs.groupBy(_._1).map {
      case (w, ps) =>
        val ds = ps.map(_._2).sorted
        w -> (ds.size.toLong, ds.take(4).mkString(","))
    }
    val gotIdx = Corpus.invertedIndex(docs, "doc_id", "text", maxPostings = 4)
      .as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gotIdx == naiveIdx)

    val n = 2
    val allGrams = corpus.flatMap { case (_, t) =>
      t.split(" ").sliding(n).filter(_.size == n).map(_.mkString(" ")) }
    val gramCount = allGrams.groupBy(identity).view.mapValues(_.size).toMap
    val naiveSpans: Map[Long, (Long, Long)] = corpus.flatMap { case (id, t) =>
      val gs = t.split(" ").sliding(n).filter(_.size == n)
        .map(_.mkString(" ")).toSeq
      if (gs.isEmpty) None
      else Some(id -> ((gs.size.toLong, gs.count(g => gramCount(g) > 1).toLong)))
    }.toMap
    val gotSpans = Dedup.duplicatedSpanStats(docs, "doc_id", "text", n)
      .select(col("doc"), col("n_ngrams"), col("n_dup"))
      .as[(Long, Long, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(gotSpans == naiveSpans)
  }

  test("bigram surprisal agrees with naive probabilities") {
    val rng = new Random(13)
    val corpus = randomCorpus(rng, 8)
    val docs = corpus.toDF("doc_id", "text")
    val bigrams = corpus.flatMap { case (id, t) =>
      t.split(" ").sliding(2).filter(_.size == 2).map(a => (id, a(0), a(1))) }
    val cb = bigrams.groupBy(b => (b._2, b._3)).view.mapValues(_.size).toMap
    val cu = bigrams.groupBy(_._2).view.mapValues(_.size).toMap
    val v = corpus.flatMap(_._2.split(" ")).distinct.size
    val naive: Map[Long, Double] = bigrams.groupBy(_._1).view.mapValues { bs =>
      val s = bs.map { case (_, w1, w2) =>
        -math.log((cb((w1, w2)) + 1.0) / (cu(w1) + v)) }.sum / bs.size
      BigDecimal(s).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    }.toMap
    val got = Corpus.bigramSurprisal(docs, "doc_id", "text")
      .select(col("doc"), col("avg_surprisal"))
      .as[(Long, Double)].collect().toMap
    assert(got.keySet == naive.keySet)
    got.foreach { case (id, s) =>
      assert(math.abs(s - naive(id)) <= 1e-4 + 1e-9, s"doc $id: $s vs ${naive(id)}")
    }
  }

  test("lineDedup agrees with a naive reimplementation on random corpora") {
    val lines = Vector("boiler a", "boiler b", "footer", "x", "y", "z")
    val rng = new Random(31)
    (1 to 4).foreach { trial =>
      val nDocs = 4 + rng.nextInt(6)
      val minDocs = 2 + rng.nextInt(2)
      val corpus = (1 to nDocs).map { i =>
        val n = 1 + rng.nextInt(5)
        // small line pool → natural cross-doc (and within-doc) repeats,
        // plus a per-doc unique line in ~half the docs
        val ls = (0 until n).map(_ => lines(rng.nextInt(lines.size))) ++
          (if (rng.nextBoolean()) Seq(s"unique $i") else Nil)
        (i.toLong, ls.mkString("\n"))
      }
      val naive: Map[Long, (Long, Long, Long, String)] = {
        val perDoc = corpus.map { case (id, t) => id -> t.split("\n", -1).toSeq }
        val df = perDoc.flatMap { case (id, ls) => ls.distinct.map(_ -> id) }
          .groupBy(_._1).view.mapValues(_.map(_._2).distinct.size).toMap
        perDoc.map { case (id, ls) =>
          val kept = ls.filter(l => df(l) < minDocs)
          id -> ((ls.size.toLong, kept.size.toLong,
            (ls.size - kept.size).toLong, kept.mkString("\n")))
        }.toMap
      }
      val got = Corpus.lineDedup(corpus.toDF("doc_id", "text"),
          "doc_id", "text", minDocs)
        .as[(Long, Long, Long, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3, r._4, r._5))).toMap
      assert(got == naive, s"trial $trial (minDocs=$minDocs)\n$corpus")
    }
  }
}
