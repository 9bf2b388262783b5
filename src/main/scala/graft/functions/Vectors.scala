package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over array<double> columns via zip_with/aggregate — pure
  * codegen'd Column expressions, no UDFs (SURVEY.md §2E). The folds are
  * sequential in element order, so results are bit-deterministic and
  * match an oracle that evaluates in the same order. Cast float
  * embeddings to array<double> BEFORE these (float accumulation would
  * diverge from any double-computing oracle). */
object Vectors {

  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
