package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.Tables._

/**
 * Multi-join analytics gates (round 16): TPC-H Q5/Q7/Q8/Q9 shapes over the
 * testdata star schema — 5-to-8-relation join trees that exercise join
 * ordering, broadcast selection, and AQE's runtime re-plan, the axes the
 * existing gates (peaking at 3 tables, q3/n24) never stressed.
 *
 * Broadcast policy — the 100-TB rule, not the 6-MB-testdata rule:
 * `broadcast()` is written explicitly ONLY for relations whose cardinality
 * is bounded by the SCHEMA (region = 5 rows, nation = 25, and their
 * region-filtered projections) — those are broadcastable at any scale
 * factor. Everything that grows with SF (supplier, part, customer, orders
 * — even after a selective filter) is joined plainly: AQE turns those
 * joins into broadcasts at small SF from runtime sizes, while at 100 TB
 * they keep the shuffle they genuinely need. JoinPlanAuditSpec pins both
 * halves (bounded dims broadcast; no cartesian anywhere).
 *
 * All money arithmetic goes through the exact-decimal helpers
 * ([[Tables.dec]]/[[Tables.dsum]]) so sums hash-match DuckDB bit-for-bit.
 */
object JoinQueries {

  private val D0 = java.time.LocalDateTime.parse("1996-01-01T00:00:00")
  private val D1 = java.time.LocalDateTime.parse("1998-01-01T00:00:00")

  /** revenue/volume term: decimal-exact l_extendedprice * (1 - l_discount). */
  private def volume: org.apache.spark.sql.Column =
    dec(col("l_extendedprice")) * (lit(BigDecimal(1)) - dec(col("l_discount")))
  private val sqlVolume =
    "CAST(l_extendedprice AS DECIMAL(18,2)) * (1 - CAST(l_discount AS DECIMAL(18,2)))"

  /** TPC-H Q5 shape (6 relations): local-supplier volume by nation inside
    * one region. region→nation is the bounded broadcast chain; lineitem ⋈
    * supplier-of-region prunes to ~1/5 BEFORE the two real shuffles
    * (⋈ orders on orderkey, ⋈ customer on custkey); the local-supplier
    * condition c_nationkey = s_nationkey filters after the key joins. */
  def q21(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val nAsia = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(n("n_nationkey"), n("n_name"))
    val su = t(s, dir, "supplier")
      .join(broadcast(nAsia), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("s_nationkey"), col("n_name"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(D0) && col("o_orderdate") < lit(D1))
    val c = t(s, dir, "customer")
    t(s, dir, "lineitem")
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .filter(col("c_nationkey") === col("s_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(volume).cast(DoubleType).as("revenue"))
      .orderBy(col("revenue").desc, col("n_name"))
  }

  /** TPC-H Q7 shape (6 relations, nation joined TWICE): shipping volume
    * between a nation pair by year. Both nation sides are bounded
    * broadcasts; restricting supplier and customer to the pair BEFORE
    * their key joins prunes lineitem to ~2/25 at the first (broadcastable)
    * join, so the orderkey/custkey shuffles move only surviving rows. */
  def q22(s: SparkSession, dir: String): DataFrame = {
    val pair = Seq("NATION_3", "NATION_7")
    val n1 = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      .filter(col("supp_nation").isin(pair: _*))
    val n2 = t(s, dir, "nation")
      .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      .filter(col("cust_nation").isin(pair: _*))
    val su = t(s, dir, "supplier")
      .join(broadcast(n1), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val c = t(s, dir, "customer")
      .join(broadcast(n2), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"), col("cust_nation"))
    val o = t(s, dir, "orders")
    t(s, dir, "lineitem")
      .filter(col("l_shipdate") >= lit(D0) && col("l_shipdate") < lit(D1))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation") =!= col("cust_nation"))
      .withColumn("l_year", year(col("l_shipdate")).cast(LongType))
      .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      .agg(sum(volume).cast(DoubleType).as("revenue"))
      .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
  }

  /** TPC-H Q8 shape (8 relations: part, lineitem, supplier, orders,
    * customer, nation ×2, region): a nation's market share of one product
    * type inside one region, by year. The share is a ratio of two
    * decimal-exact sums cast to double — bit-identical division in both
    * engines. part/supplier/customer grow with SF → plain joins (AQE
    * broadcasts them at bench SF); nation/region → explicit broadcasts. */
  def q23(s: SparkSession, dir: String): DataFrame = {
    val r = t(s, dir, "region").filter(col("r_name") === "ASIA")
    val n = t(s, dir, "nation")
    val nAsia = n.join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .select(n("n_nationkey").as("cn_key"))
    val c = t(s, dir, "customer")
      .join(broadcast(nAsia), col("c_nationkey") === col("cn_key"))
      .select(col("c_custkey"))
    val nSupp = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
    val su = t(s, dir, "supplier")
      .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("supp_nation"))
    val p = t(s, dir, "part").filter(col("p_type") === "ECONOMY")
      .select(col("p_partkey"))
    val o = t(s, dir, "orders")
      .filter(col("o_orderdate") >= lit(D0) && col("o_orderdate") < lit(D1))
    t(s, dir, "lineitem")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast(LongType))
      .withColumn("vol", volume)
      .groupBy(col("o_year"))
      .agg((sum(when(col("supp_nation") === "NATION_3", col("vol"))
              .otherwise(lit(BigDecimal(0)))).cast(DoubleType) /
            sum(col("vol")).cast(DoubleType)).as("mkt_share"))
      .orderBy(col("o_year"))
  }

  /** TPC-H Q9 shape (5 relations): profit proxy by supplier nation and
    * year for one product type (no partsupp table in the corpus, so
    * revenue stands in for profit — same join tree). Every year of every
    * order participates — no date filter — so this is the widest of the
    * four join gates at bench SF. */
  def q24(s: SparkSession, dir: String): DataFrame = {
    val nSupp = t(s, dir, "nation")
      .select(col("n_nationkey").as("sn_key"), col("n_name").as("nation"))
    val su = t(s, dir, "supplier")
      .join(broadcast(nSupp), col("s_nationkey") === col("sn_key"))
      .select(col("s_suppkey"), col("nation"))
    val p = t(s, dir, "part").filter(col("p_type") === "PROMO")
      .select(col("p_partkey"))
    val o = t(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate"))
    t(s, dir, "lineitem")
      .join(p, col("l_partkey") === col("p_partkey"))
      .join(su, col("l_suppkey") === col("s_suppkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .withColumn("o_year", year(col("o_orderdate")).cast(LongType))
      .groupBy(col("nation"), col("o_year"))
      .agg(sum(volume).cast(DoubleType).as("profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q21_local_supplier_volume" -> (q21(_, _)),
    "q22_volume_shipping" -> (q22(_, _)),
    "q23_market_share" -> (q23(_, _)),
    "q24_product_profit" -> (q24(_, _)))

  val oracleSql: Map[String, String] = Map(
    "q21_local_supplier_volume" ->
      s"""SELECT n_name, CAST(SUM($sqlVolume) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation ON s_nationkey = n_nationkey
         |JOIN region ON n_regionkey = r_regionkey
         |WHERE r_name = 'ASIA' AND c_nationkey = s_nationkey
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin,

    "q22_volume_shipping" ->
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |  CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
         |  CAST(SUM($sqlVolume) AS DOUBLE) AS revenue
         |FROM lineitem
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON s_nationkey = n1.n_nationkey
         |JOIN nation n2 ON c_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_3' AND n2.n_name = 'NATION_7')
         |    OR (n1.n_name = 'NATION_7' AND n2.n_name = 'NATION_3'))
         |  AND l_shipdate >= TIMESTAMP '1996-01-01'
         |  AND l_shipdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,

    "q23_market_share" ->
      s"""SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         |  CAST(SUM(CASE WHEN n2.n_name = 'NATION_3' THEN $sqlVolume
         |           ELSE 0 END) AS DOUBLE) /
         |  CAST(SUM($sqlVolume) AS DOUBLE) AS mkt_share
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN customer ON o_custkey = c_custkey
         |JOIN nation n1 ON c_nationkey = n1.n_nationkey
         |JOIN region ON n1.n_regionkey = r_regionkey
         |JOIN nation n2 ON s_nationkey = n2.n_nationkey
         |WHERE r_name = 'ASIA' AND p_type = 'ECONOMY'
         |  AND o_orderdate >= TIMESTAMP '1996-01-01'
         |  AND o_orderdate < TIMESTAMP '1998-01-01'
         |GROUP BY 1 ORDER BY 1""".stripMargin,

    "q24_product_profit" ->
      s"""SELECT n_name AS nation,
         |  CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
         |  CAST(SUM($sqlVolume) AS DOUBLE) AS profit
         |FROM lineitem
         |JOIN part ON l_partkey = p_partkey
         |JOIN supplier ON l_suppkey = s_suppkey
         |JOIN orders ON l_orderkey = o_orderkey
         |JOIN nation ON s_nationkey = n_nationkey
         |WHERE p_type = 'PROMO'
         |GROUP BY 1, 2 ORDER BY 1, 2 DESC""".stripMargin)
}
