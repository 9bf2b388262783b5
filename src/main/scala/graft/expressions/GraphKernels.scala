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

  /** struct(c, du, dv): the common-neighbor count plus both endpoint
    * degrees in ONE call — the whole per-edge Jaccard input, so the
    * dense similar-parts branch needs zero joins. */
  def edgeStats(u: Long, v: Long, csr: AdjCsr): GenericInternalRow = {
    val iu = java.util.Arrays.binarySearch(csr.keys, u)
    val iv = java.util.Arrays.binarySearch(csr.keys, v)
    val du = if (iu < 0) 0L else (csr.offs(iu + 1) - csr.offs(iu)).toLong
    val dv = if (iv < 0) 0L else (csr.offs(iv + 1) - csr.offs(iv)).toLong
    new GenericInternalRow(Array[Any](
      commonCount(u, v, csr).toLong, du, dv))
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

/** adj_edge_stats(u, v): struct(c, du, dv) against the embedded CSR. */
case class AdjEdgeStats(left: Expression, right: Expression, csr: AdjCsr)
  extends BinaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("c", LongType, nullable = false),
    StructField("du", LongType, nullable = false),
    StructField("dv", LongType, nullable = false)))
  override def prettyName: String = "adj_edge_stats"
  override def nullSafeEval(u: Any, v: Any): Any =
    GraphKernels.edgeStats(u.asInstanceOf[Long], v.asInstanceOf[Long], csr)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("adjCsr", csr, classOf[AdjCsr].getName)
    defineCodeGen(ctx, ev,
      (u, v) => s"graft.expressions.GraphKernels.edgeStats($u, $v, $ref)")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): AdjEdgeStats =
    copy(left = newLeft, right = newRight)
}
