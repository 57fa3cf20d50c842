package graft.operators

/** Shared SQL-literal helpers for the literal-embedding DuckDB oracles
  * (a1/a3/a7/s3/s4): the deterministic fitted model is embedded in the
  * oracle SQL as literals and everything downstream of the fit —
  * scoring, quantile cut, filter, rounding — is replayed independently
  * by DuckDB. See AnomalyML.dynOracle for the contract.
  */
private[operators] object OracleLit {

  /** Double literal via Double.toString: shortest round-trip form,
    * restored bit-exact by DuckDB's strtod. Non-finite values use
    * DuckDB's cast spelling — a bare `NaN`/`Infinity` token is invalid
    * SQL and would make the generated oracle fail to parse (ADVICE
    * r6). */
  def dlit(d: Double): String =
    if (d.isNaN) "'nan'::DOUBLE"
    else if (d == Double.PositiveInfinity) "'infinity'::DOUBLE"
    else if (d == Double.NegativeInfinity) "'-infinity'::DOUBLE"
    else d.toString

  /** Rounds a double expression to 6 dp exactly as Spark's round()
    * does (decimal half-up over the shortest string form). */
  def r6(e: String): String =
    s"COALESCE(CAST(TRY_CAST(CAST($e AS VARCHAR) AS DECIMAL(28,6)) AS DOUBLE), $e)"

  /** `Σ (emb[i] − cᵢ)²` as an explicit left-associated SQL chain —
    * the nearest-centroid UDFs' exact loop (double accumulator, float
    * element widened, i ascending). `emb` is a SQL array expression;
    * subscripts are 1-based (`off` shifts into a sub-block). */
  def sqDistChain(emb: String, c: Array[Double], off: Int = 0): String =
    c.zipWithIndex.map { case (cv, i) =>
      val e = s"(CAST($emb[${off + i + 1}] AS DOUBLE) - ${dlit(cv)})"
      s"$e * $e"
    }.mkString(" + ")

  /** `Σ emb[i]·cᵢ` as an explicit left-associated chain (the
    * dot-table loop of ProductQuantizer.dotTable). */
  def dotLitChain(emb: String, c: Array[Double], off: Int = 0): String =
    c.zipWithIndex.map { case (cv, i) =>
      s"CAST($emb[${off + i + 1}] AS DOUBLE) * ${dlit(cv)}"
    }.mkString(" + ")

  /** `Σ a[i]·b[i]` over two array columns (VecDot's loop). */
  def dotColChain(a: String, b: String, dim: Int): String =
    (1 to dim).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($b[$i] AS DOUBLE)")
      .mkString(" + ")

  /** `Σ a[i]²` over an array column (VecNormSq's loop). */
  def normSqChain(a: String, dim: Int): String =
    (1 to dim).map(i => s"CAST($a[$i] AS DOUBLE) * CAST($a[$i] AS DOUBLE)")
      .mkString(" + ")
}
