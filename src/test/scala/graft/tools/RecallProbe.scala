package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{DoubleType, FloatType}
import graft.functions.Similarity

/** One-off measurement harness for the q20 gate's recall bound (not a
  * spec): plants perturbed copies of corpus vectors as queries and
  * reports how often trained-IVF top-10 finds the true origin. */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (sf <- Seq("0.001", "0.01", "0.1")) {
      val e = spark.read.parquet(s"/root/testdata/sf$sf/embeddings.parquet")
      val cnt = broadcast(e.groupBy().agg(count(lit(1)).as("__n")))
      val init = e.crossJoin(cnt)
        .filter(col("vec_id") % greatest(lit(1L), floor((col("__n") + 63L) / 64L).cast("long")) === 0)
        .select(col("vec_id"), col("embedding").cast("array<double>"))
        .collect().map(r => (r.getLong(0), r.getSeq[Double](1).toArray)).sortBy(_._1).toSeq
      val cents = Similarity.kmeansTrain(e.select(col("embedding")), "embedding", init, 5)
      // queries = perturbed copies: +0.1 on dim 0 (the vecsUnion rule)
      val queries = e.filter(col("vec_id") % 17 === 3)
        .select((col("vec_id") + 1000000).as("qid"),
          concat(
            array((element_at(col("embedding"), 1).cast(DoubleType) + lit(0.1)).cast(FloatType)),
            slice(col("embedding"), 2, 10000)).as("embedding"))
      val corpus = e.select(col("vec_id"), col("embedding"))
      val nq = queries.count()
      for (p <- Seq(1, 2, 4, 8)) {
        val ivf = Similarity.ivfTopK(queries, corpus, "qid", "embedding", "vec_id", "embedding", cents, 10, p)
        val hits = ivf.filter(col("qid") - 1000000 === col("nid")).count()
        println(s"SF=$sf cents=${init.size} probes=$p originHit=${hits.toDouble / nq} ($hits/$nq)")
      }
    }
    spark.stop()
  }
}
