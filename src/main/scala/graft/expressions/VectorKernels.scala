package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{DataType, DoubleType, IntegerType, StructField, StructType}

/** Vector kernels callable from generated code. The fold order is
  * IDENTICAL to `aggregate(zip_with(a,b,_*_), 0.0, _+_)` — left-to-right
  * element order seeded at 0.0 — so swapping the declarative fold for
  * this kernel changes performance, not a single result bit, and every
  * DuckDB list_reduce oracle stays valid. */
object VectorKernels {

  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var s = 0.0
    var i = 0
    while (i < n) { s += a.getDouble(i) * b.getDouble(i); i += 1 }
    s
  }

  /** Spark's round(double) semantics exactly: NaN/Inf pass through,
    * otherwise BigDecimal.valueOf(x).setScale(0, HALF_UP) — the same
    * code Catalyst's Round generates, so the kernel cannot diverge from
    * the declarative round() on any input, including exact .5 halves. */
  private def sparkRound0(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue()

  /** int8 round-trip quantization audit of one vector, single compiled
    * pass replacing the interpreted `transform`+`aggregate` chain:
    *   vmin/vmax      — array_min/array_max (Double.compare ordering)
    *   scale          — greatest((vmax-vmin)/255, 1e-12)
    *   err_i          — abs(round((x-vmin)/scale)*scale + vmin - x)
    *   max_abs_err    — array_max(err)
    *   mean_abs_err   — aggregate(err, 0.0, _+_) / size(v), the SAME
    *                    left-to-right element-order fold, so DuckDB's
    *                    list_reduce oracle stays bit-identical.
    * Assumes non-null elements (the embeddings table guarantees it);
    * an empty vector yields all-null fields like array_min(empty). */
  def quantError(v: ArrayData): InternalRow = {
    val n = v.numElements()
    if (n == 0) return new GenericInternalRow(Array[Any](null, null, null, null))
    var vmin = v.getDouble(0)
    var vmax = vmin
    var i = 1
    while (i < n) {
      val x = v.getDouble(i)
      if (java.lang.Double.compare(x, vmin) < 0) vmin = x
      if (java.lang.Double.compare(x, vmax) > 0) vmax = x
      i += 1
    }
    val scale = math.max((vmax - vmin) / 255.0, 1e-12)
    var maxErr = Double.NegativeInfinity
    var sumErr = 0.0
    i = 0
    while (i < n) {
      val x = v.getDouble(i)
      val e = math.abs(sparkRound0((x - vmin) / scale) * scale + vmin - x)
      if (java.lang.Double.compare(e, maxErr) > 0) maxErr = e
      sumErr += e
      i += 1
    }
    new GenericInternalRow(Array[Any](vmin, vmax, maxErr, sumErr / n))
  }

  /** Argmax-dot assignment of `v` against a centroid table held as a
    * plain JVM object (the broadcast IVF index state). Centroids must be
    * unit-normalized by the caller, so argmax dot == argmax cosine (the
    * row norm is constant across candidates). Ties → lowest index, so
    * duplicate padding centroids never win over the original. The table
    * rides into generated code as a reference object — the generated
    * method is ONE call regardless of nlist, which is what lets the cell
    * count grow with the corpus (the old greatest()-over-structs shape
    * grew the expression tree linearly in nlist and capped it at 64). */
  def nearestCell(v: ArrayData, cents: Array[Array[Double]]): Int = {
    var best = 0
    var bestDot = Double.NegativeInfinity
    var i = 0
    while (i < cents.length) {
      val c = cents(i)
      val m = math.min(v.numElements(), c.length)
      var s = 0.0
      var d = 0
      while (d < m) { s += v.getDouble(d) * c(d); d += 1 }
      if (s > bestDot) { bestDot = s; best = i }
      i += 1
    }
    best
  }

  private def dotA(v: ArrayData, c: Array[Double]): Double = {
    val m = math.min(v.numElements(), c.length)
    var s = 0.0
    var d = 0
    while (d < m) { s += v.getDouble(d) * c(d); d += 1 }
    s
  }

  /** Top-`nprobe` flat cells (ci·maxSub + si) for a query vector against
    * the two-level broadcast index — the DISTRIBUTED probe ranking: rank
    * the coarse seeds, descend into the `probeCoarse` best coarse cells
    * only, rank their sub-centroids, return the globally-best nprobe
    * flat cells by dot (ties → lower cell id, so results are
    * deterministic). Per-row cost is C1 + probeCoarse·C2 = O(√nlist)
    * dots — independent of the total cell count, exactly like the
    * NearestCell/NearestSubCell assignment path. One compiled call per
    * row regardless of index size (reference objects, not expression
    * trees). */
  def topCells(v: ArrayData, coarse: Array[Array[Double]],
      sub: Array[Array[Array[Double]]], maxSub: Int,
      probeCoarse: Int, nprobe: Int): ArrayData = {
    val nc = coarse.length
    val pc = math.min(probeCoarse, nc)
    // top-pc coarse cells by dot (selection over nc; nc = O(sqrt(nlist)))
    val chosen = new Array[Int](pc)
    val used = new Array[Boolean](nc)
    var c = 0
    while (c < pc) {
      var best = -1
      var bestD = Double.NegativeInfinity
      var j = 0
      while (j < nc) {
        if (!used(j)) {
          val s = dotA(v, coarse(j))
          if (s > bestD || (s == bestD && (best < 0 || j < best))) { bestD = s; best = j }
        }
        j += 1
      }
      used(best) = true
      chosen(c) = best
      c += 1
    }
    // rank the chosen cells' sub-centroids; keep the nprobe best flat
    // cells via insertion into a small sorted buffer
    val outCell = new Array[Int](nprobe)
    val outDot = new Array[Double](nprobe)
    var filled = 0
    var ci = 0
    while (ci < pc) {
      val cc = chosen(ci)
      val subs = sub(cc)
      var si = 0
      while (si < subs.length) {
        val flat = cc * maxSub + si
        val s = dotA(v, subs(si))
        // find insertion point: order by (dot desc, cell asc)
        var p = filled
        while (p > 0 && (outDot(p - 1) < s ||
            (outDot(p - 1) == s && outCell(p - 1) > flat))) p -= 1
        if (p < nprobe) {
          val last = math.min(filled, nprobe - 1)
          var q = last
          while (q > p) { outCell(q) = outCell(q - 1); outDot(q) = outDot(q - 1); q -= 1 }
          outCell(p) = flat
          outDot(p) = s
          if (filled < nprobe) filled += 1
        }
        si += 1
      }
      ci += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(outCell, filled))
  }

  /** Product-quantization code assignment: for each of the `cents.length`
    * subspaces (subspace m covers elements [m·dsub, (m+1)·dsub)), the
    * argmin-L2 sub-centroid index — L2 on the SUBVECTOR, the standard PQ
    * encoding objective (minimizing ‖v_m − c‖ bounds the ADC dot error
    * by ‖q_m‖·‖v_m − c‖). Ties → lowest index. One compiled call per row;
    * the codebook rides in as a reference object, so generated-code size
    * is independent of M and ks.
    *
    * `normalize = true` (plain PQ): the codebook quantizes UNIT vectors
    * (ADC approximates the cosine dot), so the input is scaled by
    * 1/sqrt(ss) inside the distance loop; zero-norm vectors encode as
    * zeros. `normalize = false` (residual PQ): the input IS the quantity
    * being coded (a cell residual u − c(cell), already scale-fixed by
    * the unit normalization upstream), so it is used raw. */
  def pqCodes(v: ArrayData, cents: Array[Array[Array[Double]]], dsub: Int,
      normalize: Boolean): ArrayData = {
    val nv = v.numElements()
    var inv = 1.0
    if (normalize) {
      var ss = 0.0
      var k = 0
      while (k < nv) { val x = v.getDouble(k); ss += x * x; k += 1 }
      inv = if (ss == 0.0) 0.0 else 1.0 / math.sqrt(ss)
    }
    val m = cents.length
    val out = new Array[Int](m)
    var s = 0
    while (s < m) {
      val cs = cents(s)
      val off = s * dsub
      var best = 0
      var bestD = Double.MaxValue
      var c = 0
      while (c < cs.length) {
        val cent = cs(c)
        var d = 0.0
        var i = 0
        while (i < dsub) {
          val x = v.getDouble(off + i)
          val t = (if (normalize) x * inv else x) - cent(i)
          d += t * t; i += 1
        }
        if (d < bestD) { bestD = d; best = c }
        c += 1
      }
      out(s) = best
      s += 1
    }
    new GenericArrayData(out)
  }

  /** Spark round(x, 4) exactly (BigDecimal HALF_UP — away from zero on
    * halves, like DuckDB's round), NaN/Inf pass-through. */
  private def sparkRound4(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(4, java.math.RoundingMode.HALF_UP).doubleValue()

  private def cosine(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var d = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) { d += a.getDouble(i) * b.getDouble(i); i += 1 }
    i = 0
    while (i < a.numElements()) { val x = a.getDouble(i); na += x * x; i += 1 }
    i = 0
    while (i < b.numElements()) { val x = b.getDouble(i); nb += x * x; i += 1 }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Greedy MMR (maximal marginal relevance, Carbonell & Goldstein '98)
    * over one query's candidate array: k rounds of
    * argmax λ·rel(i) − μ·max_{j∈S} sim(i, j), ties → lowest id, with
    * sim the 4-decimal-rounded cosine between candidate vectors and
    * max∅ = 0.0. λ and μ arrive as SEPARATE literals (1−0.7 in doubles
    * is 0.30000000000000004 — the oracle writes 0.3, so the kernel must
    * too). Candidates are scanned in ascending-id order so the strict->
    * argmax reproduces the oracle's (mmr DESC, n_id) row_number; the
    * per-candidate running max is updated incrementally (== MAX over
    * the selected set, since max is associative). O(k·C·dim) per query
    * row, one compiled call. Returns array<struct<n_id, mmr>> in pick
    * order.
    *
    * NaN guard: a zero-norm candidate vector has NaN rel (0/0 cosine)
    * and NaN never compares greater, so such candidates could never win
    * a pick yet still shrink the pool — worse, if ALL remaining
    * candidates were NaN, best would stay -1 and index out of bounds.
    * They are excluded from the pool up front (the registered operator
    * feeds only finite cosines — the upstream top-C ranks them — so
    * this is robustness, not a behavior change at the gate), and the
    * pick loop breaks early if the pool empties, emitting fewer than k
    * picks honestly. */
  def mmrSelect(arr: ArrayData, k: Int, lam: Double, mu: Double): ArrayData = {
    val n = arr.numElements()
    val idx = Array.range(0, n)
    val ids = new Array[Long](n)
    val rel = new Array[Double](n)
    val vecs = new Array[ArrayData](n)
    val used = new Array[Boolean](n)
    var live = 0
    var i = 0
    while (i < n) {
      val row = arr.getStruct(i, 3)
      ids(i) = row.getLong(0); rel(i) = row.getDouble(1); vecs(i) = row.getArray(2)
      if (java.lang.Double.isNaN(rel(i))) used(i) = true else live += 1
      i += 1
    }
    // ascending-id scan order makes strict-> pick the lowest id on ties
    val order = idx.sortBy(ids(_))
    // true MAX over the selected set (negative cosines included — the
    // oracle's inner-join MAX sees them), -Inf until first update;
    // step 0 uses the literal 0.0 of the empty set on both engines
    val maxsim = Array.fill(n)(Double.NegativeInfinity)
    val picks = math.min(k, live)
    val out = new Array[Any](picks)
    var step = 0
    var done = false
    while (step < picks && !done) {
      var best = -1
      var bestScore = Double.NegativeInfinity
      var oi = 0
      while (oi < n) {
        val c = order(oi)
        if (!used(c)) {
          val score =
            if (step == 0) lam * rel(c) - mu * 0.0
            else lam * rel(c) - mu * maxsim(c)
          if (score > bestScore) { bestScore = score; best = c }
        }
        oi += 1
      }
      if (best < 0) done = true // defensive: pool exhausted (e.g. NaN maxsim)
      else {
        used(best) = true
        out(step) = new GenericInternalRow(Array[Any](ids(best), bestScore))
        var j = 0
        while (j < n) {
          if (!used(j)) {
            val s = sparkRound4(cosine(vecs(j), vecs(best))) + 0.0
            if (s > maxsim(j)) maxsim(j) = s
          }
          j += 1
        }
        step += 1
      }
    }
    new GenericArrayData(if (step == picks) out else java.util.Arrays.copyOf(
      out.asInstanceOf[Array[AnyRef]], step).asInstanceOf[Array[Any]])
  }

  /** Cell residual r = u − c(cell) of one vector against its assigned
    * IVF cell's unit centroid (the broadcast flat-cell table): u is the
    * DIVISION-normalized vector (the `unit` helper / the mirror's
    * `un.u`), zero-norm vectors pass through raw exactly like the
    * declarative CASE. Residual PQ (FAISS IVFx,PQy) codes THIS quantity
    * instead of u itself — residual magnitudes shrink with nlist, so the
    * same 4-bit budget spends its resolution near the cell centroid
    * where the cell's vectors actually live. */
  def cellResidual(v: ArrayData, cell: Int, flat: Array[Array[Double]]): ArrayData = {
    val n = v.numElements()
    var ss = 0.0
    var i = 0
    while (i < n) { val x = v.getDouble(i); ss += x * x; i += 1 }
    val c = flat(cell)
    val out = new Array[Double](n)
    val nrm = math.sqrt(ss)
    i = 0
    while (i < n) {
      val u = if (ss == 0.0) v.getDouble(i) else v.getDouble(i) / nrm
      out(i) = u - (if (i < c.length) c(i) else 0.0)
      i += 1
    }
    new GenericArrayData(out)
  }

  /** ADC (asymmetric distance computation) score: Σ_m lut[m][codes[m]] —
    * the query's precomputed per-subspace partial dots looked up by the
    * candidate's 4-bit codes. The candidate's float vector is never read:
    * scoring cost is M lookups + adds per row. */
  def pqAdc(codes: ArrayData, lut: ArrayData): Double = {
    var s = 0.0
    var m = 0
    val n = math.min(codes.numElements(), lut.numElements())
    while (m < n) {
      val row = lut.getArray(m)
      val c = codes.getInt(m)
      if (c < row.numElements()) s += row.getDouble(c)
      m += 1
    }
    s
  }
}

/** vec_dot(a, b): sequential-order dot product of two array<double>. */
case class VectorDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "vec_dot"
  override def nullSafeEval(a: Any, b: Any): Any =
    VectorKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.expressions.VectorKernels.dot($a, $b)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): VectorDot =
    copy(left = newLeft, right = newRight)
}

/** ivf_cell(v): index of the nearest (argmax-dot) centroid. The centroid
  * table is a constructor parameter, NOT a child expression — it reaches
  * codegen via addReferenceObj, so generated-code size is independent of
  * nlist (see VectorKernels.nearestCell). */
case class NearestCell(child: Expression, cents: Array[Array[Double]])
    extends UnaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_cell"
  override def nullSafeEval(v: Any): Any =
    VectorKernels.nearestCell(v.asInstanceOf[ArrayData], cents)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfCents", cents, "double[][]")
    defineCodeGen(ctx, ev, v => s"graft.expressions.VectorKernels.nearestCell($v, $ref)")
  }
  override protected def withNewChildInternal(newChild: Expression): NearestCell =
    copy(child = newChild)
}

/** ivf_subcell(v, coarse): index of the nearest sub-centroid WITHIN the
  * given coarse cell — the second level of a two-level IVF assignment.
  * Per-row cost is |sub-cells of one coarse cell|, not the total cell
  * count, so assignment work grows as O(sqrt(nlist)) while nlist grows
  * with the corpus. */
case class NearestSubCell(left: Expression, right: Expression,
                          cents: Array[Array[Array[Double]]])
    extends BinaryExpression {
  override def dataType: DataType = IntegerType
  override def prettyName: String = "ivf_subcell"
  override def nullSafeEval(v: Any, coarse: Any): Any =
    VectorKernels.nearestCell(v.asInstanceOf[ArrayData],
      cents(coarse.asInstanceOf[Int]))
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfSubCents", cents, "double[][][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.expressions.VectorKernels.nearestCell($v, $ref[$c])")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): NearestSubCell =
    copy(left = newLeft, right = newRight)
}

/** ivf_top_cells(v): the nprobe best flat cells for a query vector —
  * the distributed twin of the driver-side probe ranking, so a query
  * TABLE of any size ranks its probes map-side against the broadcast
  * index state (see VectorKernels.topCells). */
case class TopCells(child: Expression, coarse: Array[Array[Double]],
                    sub: Array[Array[Array[Double]]], maxSub: Int,
                    probeCoarse: Int, nprobe: Int)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "ivf_top_cells"
  override def nullSafeEval(v: Any): Any =
    VectorKernels.topCells(v.asInstanceOf[ArrayData], coarse, sub, maxSub,
      probeCoarse, nprobe)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val cref = ctx.addReferenceObj("ivfCoarse", coarse, "double[][]")
    val sref = ctx.addReferenceObj("ivfSub", sub, "double[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.VectorKernels.topCells($v, $cref, $sref, $maxSub, $probeCoarse, $nprobe)")
  }
  override protected def withNewChildInternal(newChild: Expression): TopCells =
    copy(child = newChild)
}

/** vec_quant_error(v): struct(vmin, vmax, max_abs_err, mean_abs_err) of
  * int8 round-trip quantization over an array<double>, one codegen'd
  * pass (see VectorKernels.quantError for the exact fold contract). */
case class VectorQuantError(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("vmin", DoubleType),
    StructField("vmax", DoubleType),
    StructField("max_abs_err", DoubleType),
    StructField("mean_abs_err", DoubleType)))
  override def prettyName: String = "vec_quant_error"
  override def nullSafeEval(v: Any): Any =
    VectorKernels.quantError(v.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, v => s"graft.expressions.VectorKernels.quantError($v)")
  override protected def withNewChildInternal(newChild: Expression): VectorQuantError =
    copy(child = newChild)
}

/** pq_codes(v): per-subspace argmin-L2 code assignment against the
  * broadcast PQ codebook (see VectorKernels.pqCodes). array<int> of
  * length M — at 100 TB this column (M bytes of information per vector)
  * REPLACES the float vector in the candidate-generation scan. */
case class PqCodes(child: Expression, cents: Array[Array[Array[Double]]], dsub: Int,
                   normalize: Boolean = true)
    extends UnaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "pq_codes"
  override def nullSafeEval(v: Any): Any =
    VectorKernels.pqCodes(v.asInstanceOf[ArrayData], cents, dsub, normalize)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqCents", cents, "double[][][]")
    defineCodeGen(ctx, ev, v =>
      s"graft.expressions.VectorKernels.pqCodes($v, $ref, $dsub, $normalize)")
  }
  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
}

/** ivf_residual(v, cell): the unit-normalized vector minus its assigned
  * cell's unit centroid (see VectorKernels.cellResidual) — the quantity
  * residual PQ encodes. The flat centroid table is a reference object,
  * so generated-code size is independent of nlist. */
case class CellResidual(left: Expression, right: Expression,
                        flat: Array[Array[Double]])
    extends BinaryExpression {
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(DoubleType, containsNull = false)
  override def prettyName: String = "ivf_residual"
  override def nullSafeEval(v: Any, cell: Any): Any =
    VectorKernels.cellResidual(v.asInstanceOf[ArrayData],
      cell.asInstanceOf[Int], flat)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("ivfFlatCents", flat, "double[][]")
    defineCodeGen(ctx, ev, (v, c) =>
      s"graft.expressions.VectorKernels.cellResidual($v, $c, $ref)")
  }
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): CellResidual =
    copy(left = newLeft, right = newRight)
}

/** mmr_select(candidates): greedy MMR pick list for one query's
  * candidate array (see VectorKernels.mmrSelect). array<struct<n_id,
  * mmr>> in pick order; k/λ/μ are constructor literals. */
case class MmrSelect(child: Expression, k: Int, lam: Double, mu: Double)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StructField, StructType}
  override def dataType: DataType =
    org.apache.spark.sql.types.ArrayType(StructType(Seq(
      StructField("n_id", LongType, nullable = false),
      StructField("mmr", DoubleType, nullable = false))), containsNull = false)
  override def prettyName: String = "mmr_select"
  override def nullSafeEval(arr: Any): Any =
    VectorKernels.mmrSelect(arr.asInstanceOf[ArrayData], k, lam, mu)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, a =>
      s"graft.expressions.VectorKernels.mmrSelect($a, $k, $lam, $mu)")
  override protected def withNewChildInternal(newChild: Expression): MmrSelect =
    copy(child = newChild)
}

/** pq_adc(codes, lut): ADC score of one candidate against one query's
  * lookup table (see VectorKernels.pqAdc). */
case class PqAdc(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "pq_adc"
  override def nullSafeEval(codes: Any, lut: Any): Any =
    VectorKernels.pqAdc(codes.asInstanceOf[ArrayData], lut.asInstanceOf[ArrayData])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (c, l) => s"graft.expressions.VectorKernels.pqAdc($c, $l)")
  override protected def withNewChildrenInternal(newLeft: Expression,
                                                 newRight: Expression): PqAdc =
    copy(left = newLeft, right = newRight)
}
