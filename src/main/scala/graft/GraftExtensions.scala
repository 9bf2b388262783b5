package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import graft.expressions.{ShingleMinHashes, SimHash64, SimHashMd5}

/** graft's SparkSessionExtensions: registers the native sketch
  * expressions as SQL functions so any session configured with
  * `spark.sql.extensions=graft.GraftExtensions` can call
  * `shingle_minhashes(text, k, n)` and `simhash64(text)` from SQL or
  * `expr(...)` — the standard plug-in point for engine extensions. */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def intArg(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$fn expects an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      FunctionIdentifier("shingle_minhashes"),
      new ExpressionInfo(classOf[ShingleMinHashes].getName, "shingle_minhashes"),
      (children: Seq[Expression]) => ShingleMinHashes(children.head,
        intArg(children(1), "shingle_minhashes"), intArg(children(2), "shingle_minhashes"))))
    ext.injectFunction((
      FunctionIdentifier("simhash64"),
      new ExpressionInfo(classOf[SimHash64].getName, "simhash64"),
      (children: Seq[Expression]) => SimHash64(children.head)))
    ext.injectFunction((
      FunctionIdentifier("simhash_md5"),
      new ExpressionInfo(classOf[SimHashMd5].getName, "simhash_md5"),
      (children: Seq[Expression]) => SimHashMd5(children.head)))
  }
}
