package graft.expressions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Single-pass text sketch kernels, callable from generated code.
  *
  * The declarative formulations of MinHash/SimHash (nested transform/
  * filter/aggregate lambdas) evaluate interpreted — higher-order array
  * expressions are excluded from whole-stage codegen, and at 32 hashes x
  * ~70 shingles/doc the tree-walk dominates the query (SURVEY.md §4,
  * BASELINE.md). These kernels do the same work in one tight compiled
  * pass per row; the Expressions below splice them into codegen via
  * defineCodeGen, so the projection stays inside the codegen stage.
  *
  * Hashing: one xxhash64 pass over each shingle's bytes, then the n
  * signature lanes derive via cheap hashLong mixing — standard multi-
  * hash MinHash construction (n byte-passes would cost n-fold more for
  * no estimator benefit).
  *
  * Tokenization is `split(" ", -1)` — KEEPING trailing empty tokens —
  * because the declarative `split(col, " ")` and DuckDB's `string_split`
  * both keep them; `split(' ')` (limit 0) silently drops them and the
  * kernels would diverge from their oracles on trailing-space text.
  */
object TextHashes {

  /** n MinHash lanes over word k-shingles; empty/short text → empty array. */
  def shingleMinHashes(text: UTF8String, k: Int, n: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val mins = Array.fill(n)(Long.MaxValue)
    var any = false
    var i = 0
    while (i + k <= words.length) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
      val base = XXH64.hashUTF8String(UTF8String.fromString(sb.toString), 42L)
      var l = 0
      while (l < n) {
        val h = XXH64.hashLong(base, l.toLong)
        if (h < mins(l)) mins(l) = h
        l += 1
      }
      any = true
      i += 1
    }
    new GenericArrayData(if (any) mins else Array.emptyLongArray)
  }

  /** md5 hex of each word k-shingle — identical strings to
    * `transform(shingles, md5)` (and to DuckDB's md5), so every oracle
    * built on md5 shingles stays valid; one compiled pass with a reused
    * digest instead of an interpreted lambda chain. */
  def shingleMd5s(text: UTF8String, k: Int): ArrayData = {
    val words = text.toString.split(" ", -1)
    val n = math.max(0, words.length - k + 1)
    val out = new Array[Any](n)
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = "0123456789abcdef".toCharArray
    var i = 0
    while (i < n) {
      val sb = new java.lang.StringBuilder(words(i))
      var j = 1
      while (j < k) { sb.append(' ').append(words(i + j)); j += 1 }
      md.reset()
      val d = md.digest(sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      val cs = new Array[Char](32)
      var b = 0
      while (b < 16) {
        cs(2 * b) = hex((d(b) >> 4) & 0xf)
        cs(2 * b + 1) = hex(d(b) & 0xf)
        b += 1
      }
      out(i) = UTF8String.fromString(new String(cs))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** One-pass repetition stats: (n_words, n_distinct_words, n_bigrams,
    * n_distinct_bigrams) with the same `split(" ", -1)` tokenization and
    * single-space bigram join as the declarative words/shingles chain —
    * ExpressionsSpec pins the equivalence. The declarative version
    * rebuilds the bigram array interpreted once per output column; this
    * is one compiled pass with two hash sets. */
  def repetitionStats(text: UTF8String): org.apache.spark.sql.catalyst.InternalRow = {
    val words = text.toString.split(" ", -1)
    val n = words.length
    val seenW = new java.util.HashSet[String]()
    var i = 0
    while (i < n) { seenW.add(words(i)); i += 1 }
    val seenB = new java.util.HashSet[String]()
    i = 0
    while (i + 1 < n) { seenB.add(words(i) + " " + words(i + 1)); i += 1 }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](n, seenW.size, math.max(0, n - 1), seenB.size))
  }

  /** 64-bit SimHash: per-word xxhash64, majority vote per bit. */
  def simHash64(text: UTF8String): Long = {
    val words = text.toString.split(" ", -1)
    val counts = new Array[Int](64)
    var i = 0
    while (i < words.length) {
      val h = XXH64.hashUTF8String(UTF8String.fromString(words(i)), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) counts(b) += 1 else counts(b) -= 1
        b += 1
      }
      i += 1
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (counts(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}

/** shingle_minhashes(text, k, n): array<long> MinHash signature. */
case class ShingleMinHashes(child: Expression, k: Int, n: Int)
  extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "shingle_minhashes"
  override def nullSafeEval(input: Any): Any =
    TextHashes.shingleMinHashes(input.asInstanceOf[UTF8String], k, n)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashes.shingleMinHashes($c, $k, $n)")
  override protected def withNewChildInternal(newChild: Expression): ShingleMinHashes =
    copy(child = newChild)
}

/** shingle_md5s(text, k): array<string> of md5-hex word k-shingles. */
case class ShingleMd5s(child: Expression, k: Int)
  extends UnaryExpression {
  override def dataType: DataType =
    ArrayType(org.apache.spark.sql.types.StringType, containsNull = false)
  override def prettyName: String = "shingle_md5s"
  override def nullSafeEval(input: Any): Any =
    TextHashes.shingleMd5s(input.asInstanceOf[UTF8String], k)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashes.shingleMd5s($c, $k)")
  override protected def withNewChildInternal(newChild: Expression): ShingleMd5s =
    copy(child = newChild)
}

/** repetition_stats(text): struct of word/bigram duplication counts. */
case class RepetitionStats(child: Expression)
  extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, StructField, StructType}
  override def dataType: DataType = StructType(Seq(
    StructField("n_words", IntegerType, nullable = false),
    StructField("n_distinct_words", IntegerType, nullable = false),
    StructField("n_bigrams", IntegerType, nullable = false),
    StructField("n_distinct_bigrams", IntegerType, nullable = false)))
  override def prettyName: String = "repetition_stats"
  override def nullSafeEval(input: Any): Any =
    TextHashes.repetitionStats(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashes.repetitionStats($c)")
  override protected def withNewChildInternal(newChild: Expression): RepetitionStats =
    copy(child = newChild)
}

/** simhash64(text): 64-bit SimHash signature. */
case class SimHash64(child: Expression)
  extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"
  override def nullSafeEval(input: Any): Any =
    TextHashes.simHash64(input.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.expressions.TextHashes.simHash64($c)")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}
