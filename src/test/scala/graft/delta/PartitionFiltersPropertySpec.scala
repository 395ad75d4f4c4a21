package graft.delta

import graft.SparkTestBase
import graft.sources.DeltaRelation
import org.apache.spark.sql.Row
import org.apache.spark.sql.sources._
import org.apache.spark.sql.types._
import org.scalacheck.Gen

/**
 * The claiming invariant, property-tested: for every (file, filter) pair
 * where [[PartitionFilters.eval]] DECIDES, a row carrying the file's
 * partition values must survive Spark's own evaluation of the same filter
 * iff the verdict is True — i.e. the tri-state evaluator agrees with the
 * engine that would otherwise re-check the predicate per row. This is the
 * exact contract that lets the DSv2 scan consume a claimed filter without
 * Spark re-evaluating it.
 */
class PartitionFiltersPropertySpec extends SparkTestBase {

  private val schema = StructType(Seq(
    StructField("p_s", StringType),
    StructField("p_d", DateType),
    StructField("p_n", IntegerType),
    StructField("p_f", FloatType)))
  private val partCols = Set("p_s", "p_d", "p_n", "p_f")

  // Path-string partition values as a writer may render them, incl. nulls.
  // 0.1/0.3 are the epsilon-prone shortest-decimal renderings Spark's Cast
  // writes; "0.100000001490116" is a FOREIGN writer's non-shortest but
  // float-exact rendering of the same 0.1f (the comparator must parse the
  // path under the column type, not compare decimal strings); NaN parses
  // as a float but has no decimal identity (must stay undecided).
  private val genVals: Gen[Map[String, String]] = for {
    s <- Gen.oneOf("a", "ab", "b", "zz", PartitionPaths.NullMarker)
    d <- Gen.oneOf("2026-05-01", "2026-05-02", "2026-05-09", PartitionPaths.NullMarker)
    n <- Gen.oneOf("-3", "0", "7", PartitionPaths.NullMarker)
    f <- Gen.oneOf("0.1", "0.3", "2.5", "0.100000001490116", "NaN",
      PartitionPaths.NullMarker)
  } yield Map("p_s" -> s, "p_d" -> d, "p_n" -> n, "p_f" -> f)

  private def dateLit(s: String) = java.sql.Date.valueOf(s)

  private val genAtom: Gen[Filter] = Gen.oneOf(
    Gen.oneOf[Any]("a", "ab", "c").map(v => EqualTo("p_s", v)),
    Gen.oneOf("a", "b").map(v => EqualNullSafe("p_s", v)),
    Gen.oneOf("2026-05-02", "2026-05-05").map(v => GreaterThanOrEqual("p_d", dateLit(v))),
    Gen.oneOf("2026-05-02", "2026-05-09").map(v => LessThan("p_d", dateLit(v))),
    Gen.oneOf(0, 5).map(v => GreaterThan("p_n", v)),
    Gen.oneOf(-3, 7).map(v => EqualTo("p_n", v)),
    Gen.const(In("p_n", Array(0, 7))),
    Gen.const(In("p_s", Array[Any]("a", "zz"))),
    Gen.oneOf("p_s", "p_d", "p_n", "p_f").map(IsNull(_)),
    Gen.oneOf("p_s", "p_d", "p_n", "p_f").map(IsNotNull(_)),
    Gen.oneOf("a", "z").map(p => StringStartsWith("p_s", p)),
    // the round-15 regression class: float literals must claim EXACTLY
    // against decimal-rendered path values (0.1f vs path "0.1")
    Gen.oneOf(0.1f, 0.3f, 2.0f).map(v => EqualTo("p_f", v)),
    Gen.oneOf(0.1f, 1.0f).map(v => GreaterThan("p_f", v)),
    Gen.const(In("p_f", Array[Any](0.1f, 2.5f))))

  private val genFilter: Gen[Filter] = Gen.oneOf(
    genAtom,
    for { a <- genAtom; b <- genAtom } yield And(a, b),
    for { a <- genAtom; b <- genAtom } yield Or(a, b),
    genAtom.map(Not(_)),
    for { a <- genAtom; b <- genAtom; c <- genAtom } yield Or(And(a, b), Not(c)))

  test("eval agrees with Spark's row evaluation wherever it decides") {
    val files: Seq[AddFile] =
      Gen.listOfN(60, genVals)(Gen.Parameters.default, org.scalacheck.rng.Seed(11L))
        .get.zipWithIndex.map { case (vals, i) => AddFile(s"f$i.parquet", vals) }
    // one typed row per file, id = index
    def dec(m: Map[String, String], k: String): String =
      m(k) match { case PartitionPaths.NullMarker => null; case v => v }
    val rows = files.zipWithIndex.map { case (f, i) =>
      Row(i,
        dec(f.partitionValues, "p_s"),
        Option(dec(f.partitionValues, "p_d")).map(java.sql.Date.valueOf).orNull,
        Option(dec(f.partitionValues, "p_n")).map(_.toInt).map(Integer.valueOf).orNull,
        Option(dec(f.partitionValues, "p_f")).map(_.toFloat)
          .map(java.lang.Float.valueOf).orNull)
    }
    val df = spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 2),
      StructType(StructField("id", IntegerType, nullable = false) +: schema.fields.toSeq)).cache()
    df.count()

    var decided = 0L; var undecided = 0L
    (0 until 120).foreach { i =>
      val filter = genFilter(Gen.Parameters.default,
        org.scalacheck.rng.Seed(5000L + i)).get
      val col = DeltaRelation.toColumn(filter).getOrElse(
        fail(s"toColumn must translate the claimable grammar: $filter"))
      val surviving = df.filter(col).select("id")
        .collect().map(_.getInt(0)).toSet
      files.zipWithIndex.foreach { case (f, idx) =>
        PartitionFilters.eval(f, filter, partCols, schema) match {
          case Some(tv) =>
            decided += 1
            val expect = tv == PartitionFilters.True
            assert(surviving.contains(idx) == expect,
              s"filter=$filter file=${f.partitionValues} verdict=$tv " +
                s"but Spark ${if (surviving.contains(idx)) "kept" else "dropped"} the row")
          case None => undecided += 1
        }
      }
    }
    // the property is vacuous if eval never decides
    assert(decided > undecided * 10,
      s"evaluator too timid: $decided decided vs $undecided undecided")
    df.unpersist()
    ()
  }
}
