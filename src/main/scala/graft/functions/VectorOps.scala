package graft.functions

import org.apache.spark.sql.{Column, GraftShim}

/** Vector math over `array<float>` embedding columns, backed by native
  * codegen Catalyst expressions (VecExprs) — single fused loop per row,
  * zero allocation, inside whole-stage codegen. (The earlier HOF form,
  * `aggregate(zip_with(...))`, allocated an intermediate array per pair
  * and re-traversed per norm: ~50× slower on the d5 pairwise path.)
  *
  * Products are computed in double (float→double is exact) so results
  * agree with the DuckDB oracle to summation-order noise (~1e-14),
  * absorbed by round(...,6) at the output edge.
  */
object VectorOps {

  /** Σ aᵢ·bᵢ in double precision (left-fold in array order). */
  def dot(a: Column, b: Column): Column =
    GraftShim.column(VecDot(GraftShim.expression(a), GraftShim.expression(b)))

  /** Σ aᵢ² in double precision. */
  def normSq(a: Column): Column =
    GraftShim.column(VecNormSq(GraftShim.expression(a)))

  /** Cosine similarity — dot and both norms in one fused pass; use when
    * neither side's norm is precomputable (pairwise self-joins). */
  def cosine(a: Column, b: Column): Column =
    GraftShim.column(VecCosine(GraftShim.expression(a), GraftShim.expression(b)))

  /** Σ |aᵢ−bᵢ| over `array<double>`, bit-identical to the
    * aggregate(zip_with(..)) fold (same order, same ops). */
  def l1d(a: Column, b: Column): Column =
    GraftShim.column(VecL1D(GraftShim.expression(a), GraftShim.expression(b)))
}
