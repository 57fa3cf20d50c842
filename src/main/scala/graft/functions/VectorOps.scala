package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Vector math over `array<float>` embedding columns, built from Spark's
  * codegen'd higher-order functions (zip_with / transform / aggregate) —
  * no UDFs, stays inside whole-stage codegen.
  *
  * Products are computed in double (float→double is exact) so results
  * agree with the DuckDB oracle to summation-order noise (~1e-14),
  * absorbed by round(...,6) at the output edge.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision (left-fold in array order). */
  def dot(a: Column, b: Column): Column =
    aggregate(
      zip_with(a, b, (x, y) => x.cast("double") * y.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Σ aᵢ² in double precision. */
  def normSq(a: Column): Column =
    aggregate(transform(a, x => x.cast("double") * x.cast("double")),
      lit(0.0), (acc, v) => acc + v)

  /** Cosine similarity; callers should pre-compute norms when one side is
    * reused (see Similarity.s1AnnBrute — query norms are computed once). */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (sqrt(normSq(a)) * sqrt(normSq(b)))
}
