package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, LongType}

/**
 * True Hilbert-curve index (round 15 — the reference's `hilbert` curve
 * type falls through to the Morton interleave,
 * compaction/index.ts:151,1122; this is the north-star locality upgrade
 * behind the opt-in `curveType=hilbert-true`).
 *
 * Skilling's transpose algorithm ("Programming the Hilbert curve", AIP
 * Conf. Proc. 707, 2004 — public domain): coordinates are mapped
 * in-place to the Hilbert "transpose" form (inverse-undo + Gray encode),
 * then the transposed bits interleave MSB-first into one long. For the
 * clustering use case d ∈ {2, 3} at 21 bits/dim, so the index fits a
 * long (42 / 63 bits). Unlike Morton order, consecutive Hilbert indexes
 * are always grid-adjacent (unit Manhattan step — property-tested by
 * exhaustive bijectivity+adjacency in HilbertSpec), which is what makes
 * per-file min/max zone maps tighter for multi-column range predicates.
 */
object Hilbert {

  /** In-place axes → Hilbert-transpose (Skilling). `bits` per axis. */
  private def axesToTranspose(x: Array[Long], bits: Int): Unit = {
    val n = x.length
    // Inverse undo
    var q = 1L << (bits - 1)
    while (q > 1L) {
      val p = q - 1L
      var i = 0
      while (i < n) {
        if ((x(i) & q) != 0L) x(0) ^= p
        else { val t = (x(0) ^ x(i)) & p; x(0) ^= t; x(i) ^= t }
        i += 1
      }
      q >>= 1
    }
    // Gray encode
    var i = 1
    while (i < n) { x(i) ^= x(i - 1); i += 1 }
    var t = 0L
    q = 1L << (bits - 1)
    while (q > 1L) { if ((x(n - 1) & q) != 0L) t ^= q - 1L; q >>= 1 }
    i = 0
    while (i < n) { x(i) ^= t; i += 1 }
  }

  /** Transpose → single index: bit b of axis i lands MSB-first, axis 0
    * carrying the most significant bit of each level. */
  private def transposeToIndex(x: Array[Long], bits: Int): Long = {
    val n = x.length
    var out = 0L
    var b = bits - 1
    while (b >= 0) {
      var i = 0
      while (i < n) {
        out = (out << 1) | ((x(i) >> b) & 1L)
        i += 1
      }
      b -= 1
    }
    out
  }

  /** Hilbert index of (x, y), `bits` bits per axis (≤ 31). */
  def index2(x: Long, y: Long, bits: Int): Long = {
    val a = Array(x, y)
    axesToTranspose(a, bits)
    transposeToIndex(a, bits)
  }

  /** Hilbert index of (x, y, z), `bits` bits per axis (≤ 21). */
  def index3(x: Long, y: Long, z: Long, bits: Int): Long = {
    val a = Array(x, y, z)
    axesToTranspose(a, bits)
    transposeToIndex(a, bits)
  }
}

/**
 * Catalyst expression wrapping [[Hilbert.index2]]/[[Hilbert.index3]]:
 * children are the per-column scaled-to-[0, 2^bits) longs the clustering
 * rewrite already computes for the Morton path. Codegen emits one static
 * call per row — no boxing, stays inside whole-stage codegen.
 */
case class HilbertIndex(children: Seq[Expression], bits: Int)
  extends Expression {

  require(children.size == 2 || children.size == 3,
    s"hilbert index takes 2 or 3 coordinates, got ${children.size}")

  override def dataType: DataType = LongType
  override def nullable: Boolean = false
  override def foldable: Boolean = children.forall(_.foldable)
  override def prettyName: String = "hilbert_index"

  private def coord(e: Expression, input: InternalRow): Long =
    e.eval(input) match { case null => 0L; case v => v.asInstanceOf[Long] }

  override def eval(input: InternalRow): Any = {
    val c = children.map(coord(_, input))
    if (c.size == 2) Hilbert.index2(c(0), c(1), bits)
    else Hilbert.index3(c(0), c(1), c(2), bits)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val gens = children.map(_.genCode(ctx))
    val args = gens.map(g => s"(${g.isNull} ? 0L : ${g.value})")
    val call =
      if (children.size == 2)
        s"graft.functions.Hilbert.index2(${args(0)}, ${args(1)}, $bits)"
      else
        s"graft.functions.Hilbert.index3(${args(0)}, ${args(1)}, ${args(2)}, $bits)"
    ev.copy(
      code = code"""
        ${gens.map(_.code).reduce(_ + _)}
        long ${ev.value} = $call;
      """,
      isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): HilbertIndex =
    copy(children = newChildren)
}
