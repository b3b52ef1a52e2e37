package graft.queries

/** Helpers for authoring DuckDB oracle SQL. */
private[queries] object Oracles {

  /** Java-exact `round(double, 6)`: Spark's round goes through
    * `BigDecimal.valueOf(d)` — the SHORTEST decimal representation of
    * the double — then HALF_UP. DuckDB prints doubles as
    * shortest-roundtrip VARCHAR, so casting through VARCHAR→DECIMAL
    * reproduces it exactly (a plain DuckDB `round(d, 6)` rounds the
    * binary value instead and can differ by 1 ulp at grid boundaries).
    *
    * Scale 25, not 18: a small double's shortest representation can
    * carry more than 18 FRACTIONAL digits (17 significant digits plus
    * leading zeros — e.g. -0.00037249999999999995), and DECIMAL(38,18)
    * would round it up to the .5 boundary first, flipping the 6-digit
    * rounding. 25 fractional digits hold the full shortest form of any
    * |x| ≥ 1e-8; 13 integer digits remain, ample for every metric here.
    */
  def jr6(e: String): String = jr(e, 6)

  /** [[jr6]] at any scale — same VARCHAR→DECIMAL(38,25) replay of
    * Spark's shortest-representation HALF_UP rounding.
    */
  def jr(e: String, scale: Int): String =
    s"CAST(round(CAST(CAST($e AS VARCHAR) AS DECIMAL(38,25)), $scale) AS DOUBLE)"

  /** [[jr]] for LARGE magnitudes: DECIMAL(38,25) holds only 13 integer
    * digits, so values ≥ 1e13 overflow the cast. (38,18) trades
    * fractional headroom for 20 integer digits — safe whenever the
    * expression is exactly 0 or |x| ≥ ~1e-1 (a shortest-rep double with
    * an integer part has ≤ 17 significant → ≤ 17 fractional digits).
    * Use for micro/pico-unit products before an integer round.
    */
  def jrWide(e: String, scale: Int): String =
    s"CAST(round(CAST(CAST($e AS VARCHAR) AS DECIMAL(38,18)), $scale) AS DOUBLE)"
}
