package graft.functions

/** Z-order (Morton) curve helper for multi-dimensional data layout.
  *
  * Interleaving the low bits of two cell coordinates gives a single sort
  * key whose contiguous ranges are small rectangles in (x, y) space —
  * writing 100 TB ordered by it makes per-file min/max statistics tight in
  * BOTH dimensions at once, so scans filtered on either column (or both)
  * can skip most files. A single-column sort gives tight stats in that
  * column only; the other's span per file stays full-range.
  *
  * The interleave is emitted as a plain SQL arithmetic string — `>>`, `&`,
  * `*`, `+` — valid verbatim in Spark SQL and DuckDB, so the engine under
  * test and the oracle evaluate the IDENTICAL expression text (one source
  * of truth, zero cross-engine drift). In Spark it compiles to a codegen'd
  * integer expression tree: no UDF, stays inside whole-stage codegen.
  */
object ZOrder {

  /** SQL text interleaving the low `bits` bits of integer expressions
    * `x` (even positions) and `y` (odd positions). Callers ensure
    * 0 <= x,y < 2^bits — higher bits are simply ignored by the masks.
    */
  def interleaveSql(x: String, y: String, bits: Int = 10): String = {
    require(bits > 0 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val terms = (0 until bits).flatMap { i =>
      Seq(
        s"((($x) >> $i) & 1) * ${1L << (2 * i)}",
        s"((($y) >> $i) & 1) * ${1L << (2 * i + 1)}")
    }
    terms.mkString("(", " + ", ")")
  }
}
