package graft.expressions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.types.{DataType, DoubleType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass kernels for the two hottest scalar ops in the financial
  * family: accounting-format rendering (a 15-expression concat/lpad CASE
  * chain per row) and accounting-amount parsing (three java.util.regex
  * executions per row). Every fin_* query pays both once per statement
  * row, so at sf1 (~15M rows) they are the family's shared floor.
  *
  * Semantics are BIT-IDENTICAL to the declarative Column versions
  * (Statements.fmtAmountDeclarative / Financial.cleanAmountDeclarative),
  * including the Java-regex anchor quirk where `$` matches before a
  * FINAL line terminator — ExpressionsSpec pins kernel == declarative
  * over the whole derived statements corpus plus adversarial edges, so
  * the DuckDB oracles (built from ground-truth integer cents, not from
  * either parser) stay valid.
  */
object StatementKernels {

  /** Accounting format from signed integer cents — mirrors
    * Statements.fmtAmountDeclarative: grouped thousands via the same
    * double-division-then-truncate steps the Column chain performs
    * ((a/100).cast("long") divides as DOUBLE first), parens-negative. */
  def fmtCents(sc: Long): UTF8String = {
    val a = math.abs(sc)
    // Column `/` on longs divides as double, then cast(long) truncates —
    // exact for |cents| < 2^53, same as the declarative chain
    val d = (a.toDouble / 100).toLong
    val f = a % 100
    val dk = (d.toDouble / 1000).toLong
    val dm = (d.toDouble / 1000000).toLong
    val sb = new java.lang.StringBuilder(20)
    if (sc < 0) sb.append("$(") else sb.append('$')
    if (d >= 1000000) {
      sb.append(dm).append(',')
      pad3(sb, dk % 1000).append(',')
      pad3(sb, d % 1000)
    } else if (d >= 1000) {
      sb.append(dk).append(',')
      pad3(sb, d % 1000)
    } else sb.append(d)
    sb.append('.')
    if (f < 10) sb.append('0')
    sb.append(f)
    if (sc < 0) sb.append(')')
    UTF8String.fromString(sb.toString)
  }

  private def pad3(sb: java.lang.StringBuilder, v: Long): java.lang.StringBuilder = {
    if (v < 100) sb.append('0')
    if (v < 10) sb.append('0')
    sb.append(v)
  }

  // Java regex `$` (no MULTILINE) also matches just before a FINAL line
  // terminator; `.` matches none of these anywhere.
  private def isTerm(c: Char): Boolean =
    c == '\n' || c == '\r' || c == '\u0085' || c == '\u2028' || c == '\u2029'

  /** Position where `$` may anchor: len, or before the final terminator
    * (a final "\r\n" counts as one terminator). */
  private def endAnchor(s: String): Int = {
    val n = s.length
    if (n >= 2 && s.charAt(n - 2) == '\r' && s.charAt(n - 1) == '\n') n - 2
    else if (n >= 1 && isTerm(s.charAt(n - 1))) n - 1
    else n
  }

  /** trim(' ') exactly as Spark's trim(): spaces only, both ends. */
  private def trimSpaces(s: String): String = {
    var b = 0; var e = s.length
    while (b < e && s.charAt(b) == ' ') b += 1
    while (e > b && s.charAt(e - 1) == ' ') e -= 1
    s.substring(b, e)
  }

  /** body matches ^[+-]?(\d+\.?\d*|\.\d+)([eE][+-]?\d+)?$ over [0, end). */
  private def numericMatches(s: String, end: Int): Boolean = {
    var i = 0
    if (i < end && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
    var intDigits = 0
    while (i < end && s.charAt(i) >= '0' && s.charAt(i) <= '9') { i += 1; intDigits += 1 }
    if (intDigits > 0) {
      if (i < end && s.charAt(i) == '.') {
        i += 1
        while (i < end && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
    } else {
      if (i >= end || s.charAt(i) != '.') return false
      i += 1
      var fracDigits = 0
      while (i < end && s.charAt(i) >= '0' && s.charAt(i) <= '9') { i += 1; fracDigits += 1 }
      if (fracDigits == 0) return false
    }
    if (i < end && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
      i += 1
      if (i < end && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
      var expDigits = 0
      while (i < end && s.charAt(i) >= '0' && s.charAt(i) <= '9') { i += 1; expDigits += 1 }
      if (expDigits == 0) return false
    }
    i == end
  }

  /** Accounting-amount parse — mirrors Financial.cleanAmountDeclarative:
    * strip every '$'/',', trim spaces, outer-parens = negate, numeric
    * grammar gate, null for garbage. Returns null as boxed null. */
  def cleanAmount(raw: UTF8String): java.lang.Double = {
    if (raw == null) return null
    val src = raw.toString
    val sb = new java.lang.StringBuilder(src.length)
    var i = 0
    while (i < src.length) {
      val ch = src.charAt(i)
      if (ch != '$' && ch != ',') sb.append(ch)
      i += 1
    }
    val s0 = trimSpaces(sb.toString)
    val e0 = endAnchor(s0)
    var neg = false
    if (e0 >= 2 && s0.charAt(0) == '(' && s0.charAt(e0 - 1) == ')') {
      var ok = true
      var j = 1
      while (ok && j < e0 - 1) { if (isTerm(s0.charAt(j))) ok = false; j += 1 }
      neg = ok
    }
    val body = trimSpaces(
      if (neg) s0.substring(1, e0 - 1) + s0.substring(e0) else s0)
    val eb = endAnchor(body)
    if (eb == 0 || !numericMatches(body, eb)) return null
    val v = java.lang.Double.parseDouble(body.substring(0, eb))
    java.lang.Double.valueOf(if (neg) -v else v)
  }
}

/** fmtCents as a codegen'd expression: LONG cents → accounting string. */
case class FormatCents(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StringType
  override protected def nullSafeEval(input: Any): Any =
    StatementKernels.fmtCents(input.asInstanceOf[Long])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.StatementKernels.fmtCents($c)")
  override protected def withNewChildInternal(newChild: Expression): FormatCents =
    copy(child = newChild)
}

/** cleanAmount as a codegen'd expression: accounting string → nullable
  * DOUBLE (null on garbage, independent of input nullability — hence the
  * custom null-handling codegen instead of defineCodeGen). */
case class CleanAmount(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) null
    else {
      val r = StatementKernels.cleanAmount(v.asInstanceOf[UTF8String])
      if (r == null) null else r.doubleValue()
    }
  }
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val parsed = ctx.freshName("parsed")
    ev.copy(code =
      code"""
        ${c.code}
        boolean ${ev.isNull} = true;
        double ${ev.value} = 0.0;
        if (!${c.isNull}) {
          java.lang.Double $parsed =
            graft.expressions.StatementKernels.cleanAmount(${c.value});
          if ($parsed != null) {
            ${ev.isNull} = false;
            ${ev.value} = $parsed.doubleValue();
          }
        }""")
  }
  override protected def withNewChildInternal(newChild: Expression): CleanAmount =
    copy(child = newChild)
}
