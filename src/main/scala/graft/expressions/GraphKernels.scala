package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow}
import org.apache.spark.sql.types.{DataType, IntegerType, LongType, StructField, StructType}

/** Compact CSR adjacency snapshot for the SIZE-GATED dense-graph kernel
  * paths: `keys` (sorted node ids, binary-searched), `offs` (CSR
  * offsets, length keys+1), `flat` (concatenated SORTED neighbor
  * lists). Embedded in an Expression via addReferenceObj — shipped once
  * per stage like the IVF centroid tables — so a per-edge score is one
  * generated call against local arrays instead of replicating both
  * endpoints' neighbor arrays through a join (Σdeg² transport). The
  * builders GATE on total adjacency bytes (the size-gated eval
  * broadcast discipline); past the gate the join paths remain. */
case class AdjCsr(keys: Array[Long], offs: Array[Int], flat: Array[Long])
  extends Serializable

/** Dense-graph adjacency as V packed BITMAPS of V bits each (`stride` =
  * ceil(V/64) words per node, bit j of node i's row = edge to keys(j)):
  * V²/8 bytes total, so the whole adjacency of a 20k-node graph is
  * ≤ 50 MB regardless of how close to complete it gets. A per-edge
  * common-neighbor count is `stride` word-ANDs + popcounts — O(V/64)
  * versus the sorted-merge's O(du+dv), a ~64·density win exactly where
  * the merge degenerates (a saturating co-purchase projection has
  * d̄ → V, making merge cost per edge O(V) and total O(E·V) = O(V³)).
  * `degs` precomputed so edge stats never rescan a row. */
case class AdjBitmap(keys: Array[Long], degs: Array[Long],
                     words: Array[Long], stride: Int)
  extends Serializable

object GraphKernels {
  /** |N(u) ∩ N(v)| over the CSR's sorted lists; 0 when a key is absent
    * (an oriented sink has no out-list). */
  def commonCount(u: Long, v: Long, csr: AdjCsr): Int = {
    val iu = java.util.Arrays.binarySearch(csr.keys, u)
    val iv = java.util.Arrays.binarySearch(csr.keys, v)
    if (iu < 0 || iv < 0) return 0
    var i = csr.offs(iu); val ie = csr.offs(iu + 1)
    var j = csr.offs(iv); val je = csr.offs(iv + 1)
    var c = 0
    while (i < ie && j < je) {
      val x = csr.flat(i); val y = csr.flat(j)
      if (x == y) { c += 1; i += 1; j += 1 }
      else if (x < y) i += 1
      else j += 1
    }
    c
  }

  /** struct(c, du, dv) against the packed bitmaps: the whole per-edge
    * Jaccard input in `stride` AND+popcount words — the dense
    * similar-parts branch needs zero joins and never touches a
    * neighbor list. */
  def bitmapEdgeStats(u: Long, v: Long, bm: AdjBitmap): GenericInternalRow = {
    val iu = java.util.Arrays.binarySearch(bm.keys, u)
    val iv = java.util.Arrays.binarySearch(bm.keys, v)
    val du = if (iu < 0) 0L else bm.degs(iu)
    val dv = if (iv < 0) 0L else bm.degs(iv)
    var c = 0L
    if (iu >= 0 && iv >= 0) {
      val ou = iu * bm.stride; val ov = iv * bm.stride
      var k = 0
      while (k < bm.stride) {
        c += java.lang.Long.bitCount(bm.words(ou + k) & bm.words(ov + k))
        k += 1
      }
    }
    new GenericInternalRow(Array[Any](c, du, dv))
  }
}

/** adj_common_count(u, v): |N(u) ∩ N(v)| against the embedded CSR. */
case class AdjCommonCount(left: Expression, right: Expression, csr: AdjCsr)
  extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "adj_common_count"
  override def nullSafeEval(u: Any, v: Any): Any =
    GraphKernels.commonCount(u.asInstanceOf[Long], v.asInstanceOf[Long], csr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adjCsr", csr, classOf[AdjCsr].getName)
    defineCodeGen(ctx, ev,
      (u, v) => s"graft.expressions.GraphKernels.commonCount($u, $v, $ref)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdjCommonCount =
    copy(left = newLeft, right = newRight)
}

/** adj_bitmap_stats(u, v): struct(c, du, dv) against the embedded
  * bitmap adjacency. */
case class AdjBitmapStats(left: Expression, right: Expression, bm: AdjBitmap)
  extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("c", LongType, nullable = false),
    StructField("du", LongType, nullable = false),
    StructField("dv", LongType, nullable = false)))
  override def prettyName: String = "adj_bitmap_stats"
  override def nullSafeEval(u: Any, v: Any): Any =
    GraphKernels.bitmapEdgeStats(u.asInstanceOf[Long], v.asInstanceOf[Long], bm)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adjBitmap", bm, classOf[AdjBitmap].getName)
    defineCodeGen(ctx, ev,
      (u, v) => s"graft.expressions.GraphKernels.bitmapEdgeStats($u, $v, $ref)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdjBitmapStats =
    copy(left = newLeft, right = newRight)
}
