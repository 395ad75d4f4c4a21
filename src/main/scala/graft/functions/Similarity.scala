package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/**
 * Similarity search over embedding columns (`Array[Float]`).
 *
 * Two paths, matching how this scales:
 *  - brute-force cosine top-k: broadcast the (small) query set, one pass
 *    over the corpus, per-query top-k via window — the exact baseline;
 *  - LSH-bucketed search: random-hyperplane bit signatures computed map-side,
 *    candidates from a shuffle on (band, bandKey) — the 100 TB path, where
 *    an all-pairs or full-scan-per-query join is impossible.
 *
 * Dot products run in double precision in array order ([[graft.Tables.dot]]),
 * so scores are deterministic and oracle-comparable.
 */
object Similarity {

  def dot(a: Column, b: Column): Column = graft.Tables.dot(a, b)
  def cosine(a: Column, b: Column): Column = graft.Tables.cosine(a, b)

  /** Deterministic random hyperplanes (dim × nBits), seeded. */
  def hyperplanes(dim: Int, nBits: Int, seed: Long = 42L): Seq[Seq[Double]] = {
    val r = new scala.util.Random(seed)
    Seq.fill(nBits)(Seq.fill(dim)(r.nextGaussian()))
  }

  /** Sign-bit signature of an embedding against hyperplanes, as an array of
    * longs (64 bits per word, nBits can exceed 64). Fused codegen kernel —
    * the composed version below generated a method past HotSpot's JIT limit
    * and ran interpreted. [[signatureComposed]] is the semantic reference it
    * must stay bit-identical to (NativeExpressionsSpec). */
  def signature(emb: Column, planes: Seq[Seq[Double]]): Column =
    NativeExpressions.hyperplaneSignature(emb, planes)

  /** Built-ins-only composition of [[signature]] (kept for equivalence
    * tests): one DotProduct per plane, sign bits OR-ed per 64-bit word. */
  def signatureComposed(emb: Column, planes: Seq[Seq[Double]]): Column = {
    val words = planes.zipWithIndex.groupBy(_._2 / 64).toSeq.sortBy(_._1).map {
      case (_, ps) => ps.map { case (p, i) =>
        val d = dot(emb, typedlit(p.toArray))
        when(d >= 0, lit(1L << (i % 64))).otherwise(lit(0L))
      }.reduce((a, b) => a.bitwiseOR(b))
    }
    array(words: _*)
  }

  /**
   * Brute-force cosine top-k: for each query vector, the k nearest corpus
   * vectors by cosine (descending, id-ascending tiebreak).
   */
  def bruteForceTopK(queries: DataFrame, corpus: DataFrame,
                     qId: String, qEmb: String, cId: String, cEmb: String,
                     k: Int): DataFrame = {
    val pairs = broadcast(queries.select(col(qId).as("qid"), col(qEmb).as("__qe")))
      .crossJoin(graft.Tables.widen(corpus)
        .select(col(cId).as("nid"), col(cEmb).as("__ne")))
      .filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("__qe"), col("__ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }

  /**
   * LSH near-duplicate pairs: bucket by banded hyperplane signatures, then
   * verify candidates with exact cosine ≥ threshold. nBits must be divisible
   * by bands; more bands → higher recall at a given cost.
   */
  def lshNearDupPairs(vectors: DataFrame, idCol: String, embCol: String,
                      dim: Int, threshold: Double = 0.95,
                      nBits: Int = 64, bands: Int = 16, seed: Long = 42L): DataFrame = {
    require(nBits % bands == 0)
    val bitsPerBand = nBits / bands
    require(64 % bitsPerBand == 0 && nBits % 64 == 0 || nBits <= 64,
      "band width must pack evenly into 64-bit words")
    val bandsPerWord = 64 / bitsPerBand
    val planes = hyperplanes(dim, nBits, seed)
    // Cache: the nBits-dot-product signature feeds both sides of the bucket
    // self-join; computing it once per row halves the dominant cost. The
    // norm rides along so candidate verification is ONE dot product instead
    // of three (sqrt(dot(a,a))*sqrt(dot(b,b)) is precomputed per row —
    // same doubles, same product, so cos stays bit-identical to cosine()).
    val signed = graft.Tables.widen(vectors)
      .select(col(idCol).as("__id"), col(embCol).as("__e"))
      .withColumn("__sig", signature(col("__e"), planes))
      .withColumn("__n", sqrt(dot(col("__e"), col("__e"))))
      .cache()
    val mask = (1L << bitsPerBand) - 1
    // One transform over band indexes → the signature subtree (nBits dot
    // products) is evaluated once per row, not once per band (see
    // Dedup.lshBands for the collapse pathology this avoids).
    val banded = signed.withColumn("__bands",
      transform(sequence(lit(0), lit(bands - 1)), j => {
        val word = element_at(col("__sig"), (j / lit(bandsPerWord)).cast("int") + 1)
        val shift = (pmod(j, lit(bandsPerWord)) * bitsPerBand).cast("int")
        call_function("shiftright", word, shift).bitwiseAND(lit(mask))
      }))
    val cands = Dedup.candidatePairs(banded, "__id", "__bands")
    cands
      .join(signed.select(col("__id").as("id_a"), col("__e").as("__ea"), col("__n").as("__na")), "id_a")
      .join(signed.select(col("__id").as("id_b"), col("__e").as("__eb"), col("__n").as("__nb")), "id_b")
      .withColumn("cos", dot(col("__ea"), col("__eb")) / (col("__na") * col("__nb")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), col("cos"))
  }

  /**
   * Semantic deduplication (SemDeDup-flavored, the deterministic min-id
   * variant): DROP every row that has a lower-id neighbor at
   * `cosine >= threshold`; keep the rest. Candidate pairs come from the
   * banded-LSH self-join ([[lshNearDupPairs]] — never all pairs, one
   * (band,hash) shuffle); survivors are one anti-join of the corpus against
   * the dominated-id side. At scale the dominated set is bounded by the
   * duplicate rate, not the corpus size, so the anti-join's build side
   * stays broadcast-able for realistic dup rates.
   *
   * The rule is pairwise (not connected-components): in a chain a–b–c with
   * a–c below threshold, b and c BOTH drop (each has a smaller-id
   * neighbor) — matching the greedy keep-lowest-id policy, reproducible in
   * plain SQL for the oracle. Use [[graft.functions.Dedup.duplicateGroups]]
   * when transitive-cluster semantics are wanted.
   */
  def semanticDedup(vectors: DataFrame, idCol: String, embCol: String,
                    dim: Int, threshold: Double = 0.95,
                    nBits: Int = 64, bands: Int = 16,
                    seed: Long = 42L): DataFrame = {
    val pairs = lshNearDupPairs(vectors, idCol, embCol, dim, threshold,
      nBits, bands, seed)
    // candidatePairs guarantees id_a < id_b → id_b is the dominated side
    val dominated = pairs.select(col("id_b").as("__dom")).distinct()
    vectors.join(dominated, col(idCol) === col("__dom"), "left_anti")
  }

  // ---- IVF-Flat -------------------------------------------------------------

  /** Per-centroid score structs: (cosine, -id, id) so lexicographic struct
    * ordering = highest cosine with lowest-id tie-break. The row's norm is
    * hoisted into `normCol` and each centroid's norm is a precomputed literal,
    * so scoring a row costs ONE dot product per centroid — and the double
    * arithmetic (`dot / (norm * centNorm)`) matches the cosine formula
    * term-for-term, so scores are bit-identical to an oracle recomputation. */
  private def centroidScores(emb: Column, normCol: Column,
                             cents: Seq[(Long, Array[Double])]): Seq[Column] =
    cents.map { case (cid, ce) =>
      var s = 0.0; var i = 0
      while (i < ce.length) { s += ce(i) * ce(i); i += 1 }
      val cNorm = math.sqrt(s)
      struct(
        (dot(emb, typedlit(ce)) / (normCol * lit(cNorm))).as("cos"),
        lit(-cid).as("negid"), lit(cid).as("cid"))
    }

  /** Nearest-centroid cell id — a map-side fused kernel (the centroid matrix
    * rides in the expression; no join, no shuffle). The composed
    * `greatest(score structs)` version below generated a method past
    * HotSpot's JIT limit for ≥64 centroids and ran interpreted;
    * [[nearestCellComposed]] is the bit-identity reference. */
  def nearestCell(emb: Column, normCol: Column,
                  cents: Seq[(Long, Array[Double])]): Column =
    element_at(NativeExpressions.topCentroids(emb, normCol, cents, 1), 1)

  /** The `probes` nearest centroid cell ids (for query-side multi-probe),
    * ordered by (cosine desc, id asc). */
  def nearestCells(emb: Column, normCol: Column,
                   cents: Seq[(Long, Array[Double])], probes: Int): Column =
    NativeExpressions.topCentroids(emb, normCol, cents, probes)

  /** Built-ins-only compositions (kept for equivalence tests). */
  def nearestCellComposed(emb: Column, normCol: Column,
                          cents: Seq[(Long, Array[Double])]): Column =
    greatest(centroidScores(emb, normCol, cents): _*).getField("cid")

  def nearestCellsComposed(emb: Column, normCol: Column,
                           cents: Seq[(Long, Array[Double])], probes: Int): Column =
    transform(
      slice(array_sort(array(centroidScores(emb, normCol, cents): _*)),
        -probes, probes),
      s => s.getField("cid"))

  /**
   * IVF-Flat ANN top-k: every corpus vector is assigned map-side to its
   * nearest centroid (argmax cosine, lowest-id tie-break); each query probes
   * its `probes` nearest cells; the search is then a plain EQUALITY join on
   * cell id — the 100 TB path, where the per-query candidate set is the
   * probed cells' contents, not the corpus. Centroids are a small sampled
   * set (caller-provided), broadcast in the expression itself as literals.
   * Recall grows with `probes`; exactness within probed cells.
   */
  def ivfTopK(queries: DataFrame, corpus: DataFrame,
              qId: String, qEmb: String, cId: String, cEmb: String,
              cents: Seq[(Long, Array[Double])], k: Int,
              probes: Int = 2): DataFrame = {
    require(cents.size >= 2, "need at least 2 centroids")
    val c = corpus.select(col(cId).as("nid"), col(cEmb).as("__ne"))
      .withColumn("__nn", sqrt(dot(col("__ne"), col("__ne"))))
      .withColumn("__cell", nearestCell(col("__ne"), col("__nn"), cents))
    val q = queries.select(col(qId).as("qid"), col(qEmb).as("__qe"))
      .withColumn("__qn", sqrt(dot(col("__qe"), col("__qe"))))
      .withColumn("__cell",
        explode(nearestCells(col("__qe"), col("__qn"), cents, probes)))
    val pairs = q.join(c, Seq("__cell")).filter(col("qid") =!= col("nid"))
      .withColumn("cos",
        dot(col("__qe"), col("__ne")) / (col("__qn") * col("__nn")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }

  /**
   * One distributed Lloyd (k-means) iteration over an embedding column:
   * every vector is assigned MAP-SIDE to its nearest centroid (cosine
   * argmax, lowest-id tie-break — same rule as [[ivfTopK]]), then each
   * centroid is recomputed as the per-dimension mean of its members with ONE
   * shuffle on (cell, dimension). No driver materialization beyond the
   * k×dim result — this is how [[ivfTopK]] centroids get trained at scale
   * (iterate by feeding the output back in as the next round's centroids).
   *
   * Returns (cid, dim, value, n): cluster id, dimension index, new centroid
   * coordinate, cluster size. Coordinates are quantized to 1e-12 and summed
   * as exact integers, so the mean is summation-order-independent and
   * bit-reproducible across engines (double sums are order-dependent, and
   * decimal casts round ties differently engine to engine); the 1e-12
   * quantization error is far below any clustering-relevant signal.
   */
  def kmeansUpdate(corpus: DataFrame, embCol: String,
                   cents: Seq[(Long, Array[Double])]): DataFrame = {
    import org.apache.spark.sql.types.{DoubleType, LongType}
    val assigned = corpus.select(col(embCol).cast("array<double>").as("__e"))
      .withColumn("__n", sqrt(dot(col("__e"), col("__e"))))
      .withColumn("cid", nearestCell(col("__e"), col("__n"), cents))
    assigned.select(col("cid"), posexplode(col("__e")))
      .toDF("cid", "dim", "v")
      .groupBy(col("cid"), col("dim"))
      .agg(
        (sum(round(col("v") * lit(1e12)).cast(LongType)).cast(DoubleType) /
          (lit(1e12) * count(lit(1)))).as("value"),
        count(lit(1)).as("n"))
  }

  /**
   * Train IVF centroids: `iters` distributed Lloyd iterations
   * ([[kmeansUpdate]]) from a deterministic init. Each round collects only
   * the k×dim centroid table (KBs — the 100-TB-safe driver footprint);
   * clusters that lose all members keep their previous centroid (the
   * standard empty-cluster rule, and what keeps the cell count stable for
   * [[ivfTopK]]'s probe math).
   */
  def kmeansTrain(corpus: DataFrame, embCol: String,
                  init: Seq[(Long, Array[Double])],
                  iters: Int): Seq[(Long, Array[Double])] = {
    var cents = init
    (1 to iters).foreach { _ =>
      val upd = kmeansUpdate(corpus, embCol, cents).collect()
      val byCid = upd.groupBy(_.getLong(0)).map { case (cid, rows) =>
        cid -> rows.sortBy(_.getInt(1)).map(_.getDouble(2))
      }
      cents = cents.map { case (cid, old) => (cid, byCid.getOrElse(cid, old)) }
    }
    cents
  }

  /**
   * LSH-quantizer ANN top-k: assign every vector to a signature-prefix cell,
   * search only the query's cell. Returns approximate neighbors.
   */
  def annTopK(queries: DataFrame, corpus: DataFrame,
              qId: String, qEmb: String, cId: String, cEmb: String,
              dim: Int, k: Int, nBits: Int = 16, seed: Long = 42L): DataFrame = {
    // Coarse cells = signature prefix buckets (hyperplane LSH as quantizer).
    val planes = hyperplanes(dim, nBits, seed)
    val q = queries.select(col(qId).as("qid"), col(qEmb).as("__qe"))
      .withColumn("__cell", signature(col("__qe"), planes))
    val c = graft.Tables.widen(corpus)
      .select(col(cId).as("nid"), col(cEmb).as("__ne"))
      .withColumn("__cell", signature(col("__ne"), planes))
    val pairs = q.join(c, Seq("__cell")).filter(col("qid") =!= col("nid"))
      .withColumn("cos", cosine(col("__qe"), col("__ne")))
    val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("nid"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .select(col("qid"), col("nid"), col("cos"), col("rn"))
  }

  /**
   * Intra-class embedding outliers: for every label, the k members LEAST
   * similar (cosine) to their class centroid — the CLIP-score-style prune
   * step (and SemDeDup's "semantic outlier" flip side): mislabeled,
   * corrupted, or off-distribution examples sit far from their class mean
   * and are dropped before training.
   *
   * Centroids use the UN-normalized element-wise sum — cosine is
   * scale-invariant, so cos(v, Σ) = cos(v, mean) and the division (a
   * per-label count broadcast) is never needed.
   *
   * Scale shape:
   *  - the centroid is ONE (label, dim)-keyed aggregation of the exploded
   *    elements with map-side combine — dims are fixed (64–4096), so the
   *    shuffle is labels × dims rows of doubles no matter the corpus size;
   *  - reassembly to an array happens per label (labels × dims rows total)
   *    and the centroid table broadcasts back — the corpus-side pass is one
   *    broadcast hash join plus the fused dot kernel;
   *  - ranking is a per-label window on the ROUNDED cosine (engine-stable
   *    ordering), vec_id tiebreak.
   */
  def centroidOutliers(vectors: DataFrame, idCol: String, embCol: String,
                       labelCol: String, k: Int,
                       roundDigits: Int = 4): DataFrame = {
    val sums = vectors.select(col(labelCol).as("label"),
        posexplode(col(embCol)).as(Seq("pos", "x")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(col("x").cast("double")).as("sx"))
    val centroids = sums.groupBy(col("label"))
      .agg(transform(array_sort(collect_list(struct(col("pos"), col("sx")))),
        s => s.getField("sx")).as("__centroid"))
    val scored = vectors.select(col(idCol).as("vec_id"),
        col(labelCol).as("label"), col(embCol).as("__e"))
      .join(broadcast(centroids), "label")
      .withColumn("cos_centroid",
        round(cosine(col("__e"), col("__centroid")), roundDigits))
    val w = Window.partitionBy(col("label"))
      .orderBy(col("cos_centroid"), col("vec_id"))
    scored.withColumn("rank", row_number().over(w)).filter(col("rank") <= k)
      .select(col("label"), col("vec_id"), col("cos_centroid"), col("rank"))
  }
}
