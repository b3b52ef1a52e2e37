package graft.queries

/** Helpers for authoring DuckDB oracle SQL. */
private[queries] object Oracles {

  /** Java-exact `round(double, 6)`: Spark's round goes through
    * `BigDecimal.valueOf(d)` — the SHORTEST decimal representation of
    * the double — then HALF_UP. DuckDB prints doubles as
    * shortest-roundtrip VARCHAR, so casting through VARCHAR→DECIMAL
    * reproduces it exactly (a plain DuckDB `round(d, 6)` rounds the
    * binary value instead and can differ by 1 ulp at grid boundaries).
    */
  def jr6(e: String): String =
    s"CAST(round(CAST(CAST($e AS VARCHAR) AS DECIMAL(38,18)), 6) AS DOUBLE)"
}
