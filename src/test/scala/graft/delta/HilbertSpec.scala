package graft.delta

import graft.SparkTestBase
import graft.functions.Hilbert

/**
 * The TRUE Hilbert curve (round 15, `curveType=hilbert-true`): the two
 * defining properties are checked EXHAUSTIVELY at small bit widths —
 *  1. bijectivity: every cell of the 2^bits-per-axis grid maps to a
 *     distinct index covering [0, cells);
 *  2. unit-step locality: consecutive indexes are grid-adjacent
 *     (Manhattan distance exactly 1) — the property Morton order lacks
 *     (its worst steps jump half the grid) and the reason Hilbert
 *     clustering tightens per-file zone maps.
 * Then the clustering rewrite itself is A/B'd against Morton on a grid
 * corpus: same data, same file count, measured per-file min/max widths.
 */
class HilbertSpec extends SparkTestBase {

  private def invert(bits: Int, dims: Int): Map[Long, Seq[Long]] = {
    val side = 1L << bits
    val all =
      if (dims == 2)
        for (x <- 0L until side; y <- 0L until side)
          yield Hilbert.index2(x, y, bits) -> Seq(x, y)
      else
        for (x <- 0L until side; y <- 0L until side; z <- 0L until side)
          yield Hilbert.index3(x, y, z, bits) -> Seq(x, y, z)
    all.toMap
  }

  private def checkCurve(bits: Int, dims: Int): Unit = {
    val cells = 1L << (bits * dims)
    val byIndex = invert(bits, dims)
    assert(byIndex.size == cells,
      s"d=$dims bits=$bits: ${byIndex.size} distinct indexes, expected $cells (not a bijection)")
    assert(byIndex.keys.min == 0L && byIndex.keys.max == cells - 1,
      "indexes must cover [0, cells) exactly")
    (1L until cells).foreach { i =>
      val a = byIndex(i - 1)
      val b = byIndex(i)
      val dist = a.zip(b).map { case (p, q) => math.abs(p - q) }.sum
      assert(dist == 1L,
        s"d=$dims bits=$bits: step $i moves $a -> $b (Manhattan $dist, want 1)")
    }
  }

  test("2D Hilbert index is a bijective unit-step space-filling curve (exhaustive, 5 bits)") {
    checkCurve(bits = 5, dims = 2) // 1024 cells
  }

  test("3D Hilbert index is a bijective unit-step space-filling curve (exhaustive, 3 bits)") {
    checkCurve(bits = 3, dims = 3) // 512 cells
  }

  test("hilbert-true clustering: row-exact rewrite, zone maps no wider than Morton") {
    import org.apache.spark.sql.functions.col
    import spark.implicits._
    // a 200x200 grid — the workload multi-column range predicates see
    val rows = for (x <- 0 until 200; y <- 0 until 200)
      yield (x.toLong * 200 + y, x.toLong, y.toLong)
    val df = rows.toDF("id", "gx", "gy")

    def cluster(curve: String): (DeltaTable, Maintenance.ZOrderResult) = {
      val t = DeltaTable.forPath(spark,
        java.nio.file.Files.createTempDirectory(s"hil-$curve").toString)
      t.write(df.repartition(8))
      (t, Maintenance.zOrderCluster(t, Seq("gx", "gy"), targetFiles = 16,
        curveType = curve))
    }
    val (tm, morton) = cluster("zorder")
    val (th, hilbert) = cluster("hilbert-true")

    // layout-only: identical content either way
    val back = th.toDF().orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(back == rows.sortBy(_._1), "hilbert rewrite must not alter rows")
    assert(tm.toDF().count() == rows.size.toLong)

    // locality A/B: average per-file (max-min) width over the clustered
    // columns. True Hilbert's unit-step walk must not be WORSE than the
    // Morton interleave, and on a square grid it is typically tighter.
    val mw = morton.zoneMaps.map(_.avgZoneWidth).get
    val hw = hilbert.zoneMaps.map(_.avgZoneWidth).get
    info(f"zone-map avg width: morton=$mw%.1f hilbert-true=$hw%.1f " +
      f"(ratio ${hw / mw}%.2f)")
    assert(hw <= mw * 1.05,
      f"hilbert-true zone maps ($hw%.1f) must not be wider than Morton's ($mw%.1f)")
  }
}
