package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/**
 * Corpus-scale soak for the curation family: a synthetic corpus two-plus
 * orders of magnitude past the gate SF (default 100k documents, ~8M
 * tokens) driven through exact dedup → MinHash near-dup → connected
 * components (FORCED down the distributed path) → classifier/Gopher
 * scoring → DSIR weighting → incremental batch dedup, in a child JVM with
 * a deliberately small heap (the spec forks with `-Xmx1536m`).
 *
 * What survival proves: no stage materializes the corpus (or any
 * per-corpus-size structure — fingerprint sets, candidate-pair streams,
 * component labels) in one place. The text is GENERATED distributed
 * (hash-derived tokens from `spark.range`, written to parquet and read
 * back so every stage starts from a real scan), duplicates and near-dups
 * are injected at known rates, and each phase's output cardinality is
 * asserted, so a silently-empty stage cannot pass as "bounded".
 *
 * Print contract (parsed by CorpusSoakSpec): `maxHeapMiB=`, per-phase
 * `phase <name> ms=`, final `SOAK OK <counts>`.
 */
object CorpusSoak {

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse(
      java.nio.file.Files.createTempDirectory("graft-corpus-soak").toString)
    val nDocs = args.lift(1).map(_.toInt).getOrElse(100000)
    // The id%20==5 cross-boundary-dup seed divides by nDocs/40; below 40
    // docs that divisor is 0 and pmod returns NULL text — fail loudly
    // instead (the soak is meaningless at toy sizes anyway).
    require(nDocs >= 40, s"corpus soak needs at least 40 docs, got $nDocs")
    val spark = SparkSession.builder()
      .master("local[8]")
      .appName("graft-corpus-soak")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val timings = scala.collection.mutable.LinkedHashMap.empty[String, Long]
    def phase[A](name: String)(body: => A): A = {
      val t0 = System.currentTimeMillis()
      val r = body
      val ms = System.currentTimeMillis() - t0
      timings.put(name, ms)
      println(s"phase $name ms=$ms")
      r
    }
    println(s"maxHeapMiB=${Runtime.getRuntime.maxMemory() / (1024 * 1024)}")

    // ---- distributed corpus generation ----------------------------------
    // Every doc's text derives from a SEED id: docs with id % 20 == 0 share
    // their seed with id+1 (exact duplicates, 5%), id % 20 == 10 share the
    // seed but append one token (near duplicates, 5%). ~80 hash-derived
    // tokens from a 5k vocabulary per doc.
    phase("generate") {
      // id%20==0: exact twin of id+1; id%20==10: near-dup of id+1 (one
      // extra token); id%20==5: exact copy of a doc in the FIRST HALF of
      // the corpus (x ≡ 1 mod 20, so the target renders its own seed) —
      // these give the incremental phase genuine cross-boundary dups.
      val seed = when(col("id") % 20 === 0 || col("id") % 20 === 10,
          col("id") + 1)
        .when(col("id") % 20 === 5,
          pmod(col("id"), lit((nDocs / 40).toLong)) * 20 + 1)
        .otherwise(col("id"))
      val body = concat_ws(" ",
        transform(sequence(lit(0), (pmod(xxhash64(col("__seed")), lit(40)) + lit(60)).cast("int")),
          i => concat(lit("w"), pmod(xxhash64(col("__seed"), i), lit(5000)))))
      spark.range(nDocs.toLong)
        .withColumn("__seed", seed)
        .withColumn("text",
          when(col("id") % 20 === 10, concat(body, lit(" nearmark")))
            .otherwise(body))
        .withColumn("lang",
          element_at(typedlit(Seq("en", "de", "fr", "es", "zh")),
            (pmod(col("id"), lit(5)) + 1).cast("int")))
        .select(col("id").as("doc_id"), col("lang"), col("text"))
        .write.mode("overwrite").parquet(s"$dir/corpus")
    }
    val docs = spark.read.parquet(s"$dir/corpus")

    // ---- exact dedup census ---------------------------------------------
    val nExactDups = phase("exact-dedup") {
      docs.groupBy(TextFunctions.fingerprint(col("text")).as("fp"))
        .agg(count(lit(1)).as("n"))
        .filter(col("n") > 1).count()
    }
    require(nExactDups >= nDocs / 20 * 9 / 10,
      s"exact-dup census too small: $nExactDups")

    // ---- minhash near-dup pairs + distributed connected components ------
    // The pair set lands on DISK once (parquet, not a heap cache — the
    // capped-heap property must not depend on the pairs fitting in memory)
    // and feeds both the cardinality assertion and the components phase.
    val nPairs = phase("minhash-pairs") {
      Dedup.minhashNearDups(docs, "doc_id", "text",
          shingleSize = 3, k = 64, bands = 16, threshold = 0.5)
        .write.mode("overwrite").parquet(s"$dir/pairs")
      spark.read.parquet(s"$dir/pairs").count()
    }
    require(nPairs >= nDocs / 10 * 8 / 10, s"near-dup pairs too few: $nPairs")
    val nGroups = phase("components-distributed") {
      val pairs = spark.read.parquet(s"$dir/pairs")
      // smallGraphEdges = 0 forces the iterative distributed path — the one
      // that must hold at 100 TB — instead of the driver union-find.
      Dedup.duplicateGroups(docs.select(col("doc_id")), pairs, "doc_id",
          smallGraphEdges = 0L)
        .filter(col("doc_id") =!= col("rep")).count()
    }
    require(nGroups >= nDocs / 10 * 8 / 10, s"components too few: $nGroups")

    // ---- map-side scoring at corpus width -------------------------------
    val scored = phase("score") {
      val gf = TextFunctions.gopherFlags(col("text")).toMap
      docs.select(
          TextFunctions.classifierScore(col("text")).as("cs"),
          gf("f_word_count").as("g"))
        .agg(count(when(col("cs") >= 0.5, 1)).as("kept"),
          count(when(col("g"), 1)).as("flagged"))
        .head()
    }
    require(scored.getLong(0) > 0, "classifier kept nothing")

    // ---- DSIR weighting over the full corpus ----------------------------
    val dsirDocs = phase("dsir") {
      Corpus.dsirWeights(docs, "doc_id", "text", col("lang") === "en").count()
    }
    require(dsirDocs == nDocs.toLong, s"dsir row count: $dsirDocs")

    // ---- incremental dedup: last 10% as the new batch -------------------
    val cut = nDocs.toLong * 9 / 10
    val kept = phase("incremental") {
      Dedup.incrementalDedup(
          docs.filter(col("doc_id") < cut),
          docs.filter(col("doc_id") >= cut),
          "doc_id", "text", n = 3, threshold = 0.5)
        .groupBy(col("status")).count()
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    }
    require(kept.getOrElse("kept", 0L) > 0 &&
      kept.getOrElse("exact_dup", 0L) > 0, s"incremental statuses: $kept")

    println(s"SOAK OK docs=$nDocs exactDupGroups=$nExactDups nearPairs=$nPairs " +
      s"components=$nGroups dsir=$dsirDocs incremental=$kept " +
      s"timings=${timings.map { case (k, v) => s"$k:${v}ms" }.mkString(",")}")
    spark.stop()
  }
}
