package graft.functions

import graft.SparkTestBase
import scala.util.Random

/**
 * Pins [[Similarity.semanticDedup]]'s survivor-set CONTRACT against an
 * exact all-pairs driver reimplementation of the documented rule: drop
 * every row with a LOWER-ID neighbor at cosine ≥ threshold; the rule is
 * pairwise (greedy keep-lowest-id), NOT connected-components.
 *
 * Generated corpora keep every pair's cosine far from the threshold
 * (within-cluster ≈ 1, cross-cluster ≈ 0) so banded-LSH recall cannot
 * flake the property — borderline-pair recall is a documented bound at
 * the t22 gate (MLQueries), not part of this contract. The chain test
 * uses deterministic vectors with the fixed default seed, so its
 * near-threshold pairs are found reproducibly.
 */
class SemanticDedupPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val Dim = 16

  private def cosine(a: Array[Float], b: Array[Float]): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
    while (i < a.length) {
      dot += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
      nb += b(i).toDouble * b(i); i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Exact pairwise min-id rule: survivors have no lower-id neighbor. */
  private def referenceSurvivors(vs: Seq[(Long, Array[Float])],
                                 th: Double): Set[Long] =
    vs.filter { case (id, e) =>
      !vs.exists { case (oid, oe) => oid < id && cosine(oe, e) >= th }
    }.map(_._1).toSet

  private def runDedup(vs: Seq[(Long, Array[Float])]): Set[Long] =
    Similarity.semanticDedup(vs.toDF("id", "embedding"), "id", "embedding",
        dim = Dim, threshold = 0.95, nBits = 128, bands = 16)
      .select("id").as[Long].collect().toSet

  test("survivors match the exact pairwise min-id rule on clustered corpora") {
    val rng = new Random(13)
    (1 to 3).foreach { trial =>
      val nClusters = 2 + rng.nextInt(4)
      val vs = scala.collection.mutable.ArrayBuffer.empty[(Long, Array[Float])]
      var id = 0L
      (0 until nClusters).foreach { c =>
        val members = 1 + rng.nextInt(4)
        (0 until members).foreach { _ =>
          // cluster c lives on axis c; 0.005 noise keeps within-cluster
          // cosine ≈ 0.9999 and cross-cluster ≈ 0 — nowhere near 0.95
          val e = Array.tabulate(Dim)(d =>
            (if (d == c) 1.0f else 0.0f) + (rng.nextFloat() - 0.5f) * 0.01f)
          // ids assigned in shuffled order so the min-id survivor is not
          // always the cluster's first-generated member
          vs += ((id, e)); id += 1
        }
      }
      val shuffled = rng.shuffle(vs.toSeq).zipWithIndex
        .map { case ((_, e), i) => (i.toLong, e) }
      val expected = referenceSurvivors(shuffled, 0.95)
      val got = runDedup(shuffled)
      assert(got == expected,
        s"trial $trial: got ${got.toSeq.sorted}, expected ${expected.toSeq.sorted}")
      // exactly one survivor per cluster
      assert(got.size == nClusters, s"trial $trial: ${got.size} != $nClusters")
    }
  }

  test("chain a~b~c with a≁c: the pairwise rule drops BOTH b and c") {
    // θ = 13°: cos θ ≈ 0.974 ≥ 0.95, cos 2θ ≈ 0.899 < 0.95
    val th = math.toRadians(13)
    def onPlane(angle: Double): Array[Float] = Array.tabulate(Dim) {
      case 0 => math.cos(angle).toFloat
      case 1 => math.sin(angle).toFloat
      case _ => 0.0f
    }
    val vs = Seq(0L -> onPlane(0), 1L -> onPlane(th), 2L -> onPlane(2 * th))
      .map { case (i, e) => (i, e) }
    assert(cosine(vs(0)._2, vs(1)._2) >= 0.95)
    assert(cosine(vs(1)._2, vs(2)._2) >= 0.95)
    assert(cosine(vs(0)._2, vs(2)._2) < 0.95)
    val got = runDedup(vs)
    // b drops (lower-id neighbor a); c drops (lower-id neighbor b) even
    // though c is NOT near a — greedy min-id, not connected components
    assert(got == Set(0L))
    assert(got == referenceSurvivors(vs, 0.95))
  }
}
