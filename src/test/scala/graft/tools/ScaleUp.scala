package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Build an sf1 dataset (10× sf0.1) for the scale-escalation runs: the
 * driver only ships sf≤0.1, so sf1 is derived as ten DISJOINT re-keyed
 * replicas of sf0.1 — join structure is preserved exactly (orderkey and
 * custkey shift together), aggregates scale linearly, and the DuckDB
 * oracle recomputes over the same generated parquet, so correctness
 * comparisons stay exact by construction.
 *
 * Documents get a per-replica token prefix (a token bijection): identical/
 * near-dup relations WITHIN a replica are preserved (shingle sets map
 * 1:1), while cross-replica shingle overlap is zero — duplicate structure
 * scales linearly instead of exploding into 10-cliques.
 *
 * Usage: Test/runMain graft.tools.ScaleUp [outDir] [replicas]
 */
object ScaleUp {
  def main(args: Array[String]): Unit = {
    val out = args.headOption.getOrElse("/tmp/graft-sf1")
    val reps = args.lift(1).map(_.toInt).getOrElse(10)
    val src = "/root/testdata/sf0.1"
    val spark = SparkSession.builder().master("local[16]")
      .config("spark.sql.shuffle.partitions", "16")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def read(n: String) = spark.read.parquet(s"$src/$n.parquet")
    def replicate(df: DataFrame, f: (DataFrame, Int) => DataFrame): DataFrame =
      (0 until reps).map(r => f(df, r)).reduce(_ unionByName _)
    def write(df: DataFrame, n: String): Unit = {
      df.repartition(16).write.mode("overwrite")
        .parquet(s"$out/$n.parquet")
      println(s"wrote $n: ${spark.read.parquet(s"$out/$n.parquet").count()} rows")
    }

    // Replica key spacing: just above each key's sf0.1 maximum, so the
    // SHIFTED key space stays inside the invariants the gate queries
    // assume for their synthetic new-key arms — the merge gates derive
    // fresh keys as `<key> + 10_000_000_000` (round 15; the old +10M/+1M
    // arms collided with replicated keys above ~60 replicas, surfacing
    // at sf10 as d6 counting inserts as updates — a data-generation
    // artifact, not an engine bug, same class as the round-13 s3-at-sf3
    // incident). With the 1e10 arm this spacing supports ~60,000
    // replicas. Order-key shifts are multiples of 100, so the `% 10` /
    // `% 100` residue classes the gates filter on survive.
    val OK = 150000L // > max o_orderkey (149999); 60 reps < 10M
    val CK = 15000L  // > max c_custkey  (14999);  60 reps < 1M
    val EK = 100000L // > max event_id   (99999)
    val UK = 1500L   // > max user_id    (1499)
    val DK = 5000L   // > max doc_id     (4999)

    write(replicate(read("customer"), (d, r) =>
      d.withColumn("c_custkey", col("c_custkey") + lit(r * CK))), "customer")
    write(replicate(read("orders"), (d, r) =>
      d.withColumn("o_orderkey", col("o_orderkey") + lit(r * OK))
        .withColumn("o_custkey", col("o_custkey") + lit(r * CK))), "orders")
    write(replicate(read("lineitem"), (d, r) =>
      d.withColumn("l_orderkey", col("l_orderkey") + lit(r * OK))), "lineitem")
    write(replicate(read("events"), (d, r) =>
      d.withColumn("event_id", col("event_id") + lit(r * EK))
        .withColumn("user_id", col("user_id") + lit(r * UK))), "events")
    write(replicate(read("documents"), (d, r) =>
      d.withColumn("doc_id", col("doc_id") + lit(r * DK))
        .withColumn("text",
          if (r == 0) col("text")
          else concat_ws(" ",
            transform(split(col("text"), " "), t => concat(lit(s"x$r"), t))))),
      "documents")
    // small/side tables verbatim (not part of the headline scaling set)
    Seq("region", "nation", "part", "supplier", "embeddings").foreach { n =>
      read(n).write.mode("overwrite").parquet(s"$out/$n.parquet")
      println(s"copied $n")
    }
    spark.stop()
  }
}
