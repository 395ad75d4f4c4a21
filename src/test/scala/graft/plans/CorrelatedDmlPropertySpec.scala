package graft.plans

import graft.SparkTestBase
import org.apache.spark.sql.Row

/**
 * Property check for the correlated-scalar DML lowering against SPARK'S OWN
 * correlated-scalar evaluation: for random tables (null keys, unmatched
 * keys, null values, duplicate target keys), `UPDATE t SET x = (SELECT agg
 * ...)` through the clause-chain merge must leave exactly the state the
 * equivalent correlated-scalar SELECT computes — Spark's native
 * decorrelation is a second oracle, independent of the DuckDB gates.
 */
class CorrelatedDmlPropertySpec extends SparkTestBase {

  private lazy val cat: String = GraftSql.ensure(spark)

  private def setup(): Unit = {
    spark.sql(s"CREATE NAMESPACE IF NOT EXISTS $cat.prop")
    ()
  }

  private val aggs = Seq("max(v)", "min(v)", "avg(v)", "sum(v)", "count(v)", "count(*)")

  test("correlated-scalar UPDATE matches Spark's correlated-scalar SELECT") {
    setup()
    val rnd = new scala.util.Random(42)
    for (trial <- 0 until 6) {
      val agg = aggs(trial % aggs.length)
      val t = s"$cat.prop.t$trial"
      val aux = s"$cat.prop.a$trial"
      val nT = 30 + rnd.nextInt(40)
      val nA = 20 + rnd.nextInt(60)
      val tRows = (0 until nT).map { i =>
        val k: java.lang.Long = if (rnd.nextInt(10) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(12).toLong)
        Row(java.lang.Long.valueOf(i.toLong), k, java.lang.Double.valueOf(-1.0))
      }
      val aRows = (0 until nA).map { i =>
        val k: java.lang.Long = if (rnd.nextInt(12) == 0) null
          else java.lang.Long.valueOf(rnd.nextInt(15).toLong)
        val v: java.lang.Double = if (rnd.nextInt(8) == 0) null
          else java.lang.Double.valueOf(rnd.nextInt(100).toDouble)
        Row(k, v)
      }
      import org.apache.spark.sql.types._
      val tDf = spark.createDataFrame(spark.sparkContext.parallelize(tRows),
        StructType(Seq(StructField("id", LongType), StructField("k", LongType),
          StructField("x", DoubleType))))
      val aDf = spark.createDataFrame(spark.sparkContext.parallelize(aRows),
        StructType(Seq(StructField("k", LongType), StructField("v", DoubleType))))
      tDf.createOrReplaceTempView(s"tsrc$trial")
      aDf.createOrReplaceTempView(s"asrc$trial")
      spark.sql(s"CREATE TABLE $t AS SELECT * FROM tsrc$trial")
      spark.sql(s"CREATE TABLE $aux AS SELECT * FROM asrc$trial")
      val cond = trial % 3 match {
        case 0 => ""
        case 1 => " WHERE id % 2 = 0"
        case 2 => " WHERE k IS NOT NULL"
      }
      // expected state via Spark's OWN correlated-scalar evaluation (the
      // target's pre-update snapshot is the temp view)
      val condExpr = cond.replace(" WHERE ", "")
      val gate = if (condExpr.isEmpty) "true" else condExpr
      val expected = spark.sql(
        s"""SELECT id, k,
           |  CASE WHEN $gate THEN
           |    CAST((SELECT $agg FROM asrc$trial a WHERE a.k = tsrc$trial.k) AS DOUBLE)
           |  ELSE x END AS x
           |FROM tsrc$trial""".stripMargin)
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      spark.sql(
        s"""UPDATE $t SET x =
           |  CAST((SELECT $agg FROM $aux a WHERE a.k = $t.k) AS DOUBLE)$cond""".stripMargin)
      val got = spark.sql(s"SELECT id, k, x FROM $t")
        .collect().map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got == expected,
        s"trial $trial agg=$agg cond='$cond': \n got ${got.toSeq.sortBy(_._1).take(10)}" +
          s"\n exp ${expected.toSeq.sortBy(_._1).take(10)}")
    }
  }
}
