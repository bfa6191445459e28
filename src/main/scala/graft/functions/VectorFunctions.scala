package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over array<float>/array<double> columns, built from
  * codegen'd higher-order functions (zip_with/aggregate) — no UDF
  * deserialization in the hot path.
  */
object VectorFunctions {

  /** Dot product of two numeric arrays (double). */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  /** L2-normalize (array<double>). */
  def normalized(a: Column): Column = {
    val n = norm(a)
    transform(a, x => x.cast("double") / n)
  }

  def cosine(a: Column, b: Column): Column = dot(a, b) / (norm(a) * norm(b))
}
