package graft

import org.apache.spark.sql.SparkSession

/** Plan-quality inspector: dumps formatted plans for the given query names
  * (default: a pushdown-sensitive subset) so scan pruning, PushedFilters,
  * broadcast joins, and WholeStageCodegen spans can be eyeballed/grepped. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val names = if (args.nonEmpty) args.toSeq
      else Seq("q1_pricing_summary", "q2_range_filter", "q3_join_topk",
        "q6_forecast_revenue", "q13_token_stats")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"========== $n ==========")
      println(SparkEntry.queries(n)(spark, sfDir).queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode))
    }
    spark.stop()
  }
}
