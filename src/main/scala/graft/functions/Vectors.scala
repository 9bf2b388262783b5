package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over array<double> columns (SURVEY.md §2E). dot() is the
  * native VectorDot kernel — bit-identical to the declarative
  * `aggregate(zip_with(..), 0.0, _+_)` fold (same element order, same
  * seed) but compiled instead of interpreted, so it stays matched to
  * every DuckDB list_reduce oracle. Cast float embeddings to
  * array<double> BEFORE these (float accumulation would diverge from
  * any double-computing oracle). */
object Vectors {

  def dot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.VectorDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** struct(vmin, vmax, max_abs_err, mean_abs_err) of int8 round-trip
    * quantization — the native one-pass twin of the declarative
    * array_min/array_max + transform + aggregate chain (same element
    * order, same Spark round() semantics; see VectorKernels.quantError). */
  def quantError(v: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(graft.expressions.VectorQuantError(
      GraftColumnBridge.expression(v)))
  }

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
