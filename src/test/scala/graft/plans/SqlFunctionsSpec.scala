package graft.plans

import org.apache.spark.sql.functions.col

import graft.SparkTestBase
import graft.functions.{Dedup, TextFunctions}

/** SQL scalar functions (graft_token_count … graft_hamming) must expand to
  * the SAME expression trees as the programmatic Column API — asserted by
  * value parity on mixed-language, whitespace-odd, empty and CJK inputs. */
class SqlFunctionsSpec extends SparkTestBase {
  import spark.implicits._

  GraftSql.ensure(spark)

  private val docs = Seq(
    (1, "the quick brown fox jumps over the lazy dog and runs to the river"),
    (2, "der alte Mann und das kleine Kind gehen nicht in die Stadt"),
    (3, "el   perro  que\tcorre   por la casa es una maravilla como por arte"),
    (4, ""),
    (5, "一二三四五六七八九十一二三四五 short tail"),
    (6, "le chat est dans les jardins pour une promenade et les oiseaux"))

  private lazy val df = {
    val d = docs.toDF("id", "text")
    d.createOrReplaceTempView("fn_docs")
    d
  }

  private def parity(sqlExpr: String, colExpr: org.apache.spark.sql.Column,
                     name: String): Unit = {
    val viaSql = spark.sql(
      s"SELECT id, $sqlExpr AS v FROM fn_docs ORDER BY id").collect().toSeq
    val viaCol = df.select(col("id"), colExpr.as("v")).orderBy("id")
      .collect().toSeq
    assert(viaSql == viaCol, s"$name: SQL and Column results differ")
  }

  test("text functions: SQL calls equal the programmatic Column API") {
    df
    parity("graft_token_count(text)", TextFunctions.tokenCount(col("text")),
      "token_count")
    parity("graft_token_count_bpe(text)",
      TextFunctions.tokenCountBpeish(col("text")), "token_count_bpe")
    parity("graft_fingerprint(text)", TextFunctions.fingerprint(col("text")),
      "fingerprint")
    parity("graft_fingerprint64(text)",
      TextFunctions.fingerprint64(col("text")), "fingerprint64")
    parity("graft_lang_id(text)", TextFunctions.languageId(col("text")),
      "lang_id")
    parity("graft_quality_score(text)",
      TextFunctions.qualityScore(col("text")), "quality_score")
  }

  test("dedup kernels: shingles/minhash/simhash/hamming parity") {
    df
    parity("graft_shingles(text, 3)",
      TextFunctions.ngrams(TextFunctions.tokens(col("text")), 3), "shingles")
    parity("graft_minhash(graft_shingles(text, 3), 16)",
      Dedup.minhashSignature(
        TextFunctions.ngrams(TextFunctions.tokens(col("text")), 3), 16),
      "minhash")
    parity("graft_minhash(graft_shingles(text, 2), 8, 7)",
      Dedup.minhashSignature(
        TextFunctions.ngrams(TextFunctions.tokens(col("text")), 2), 8, 7L),
      "minhash seeded")
    parity("graft_simhash(split(text, ' '))",
      Dedup.simhash64(org.apache.spark.sql.functions.split(col("text"), " ")),
      "simhash")
    parity("graft_hamming(graft_simhash(split(text, ' ')), 0L)",
      Dedup.hamming64(
        Dedup.simhash64(org.apache.spark.sql.functions.split(col("text"), " ")),
        org.apache.spark.sql.functions.lit(0L)),
      "hamming")
  }

  test("a pure-SQL dedup query: group by fingerprint, near-dup by simhash distance") {
    df
    val rows = spark.sql(
      """SELECT a.id AS ida, b.id AS idb,
        |  graft_hamming(graft_simhash(split(a.text, ' ')),
        |                graft_simhash(split(b.text, ' '))) AS d
        |FROM fn_docs a JOIN fn_docs b ON a.id < b.id
        |ORDER BY ida, idb""".stripMargin).collect()
    assert(rows.length == docs.size * (docs.size - 1) / 2)
    assert(rows.forall(r => r.getInt(2) >= 0 && r.getInt(2) <= 64))
  }

  test("wrong arity / non-literal parameters fail with clear errors") {
    df
    val e1 = intercept[Exception](spark.sql("SELECT graft_token_count() FROM fn_docs"))
    assert(e1.getMessage.contains("graft_token_count(text)"))
    val e2 = intercept[Exception](
      spark.sql("SELECT graft_minhash(graft_shingles(text, 3), id) FROM fn_docs"))
    assert(e2.getMessage.contains("integer literal"))
  }
}
