package graft.operators

/** Builders for DuckDB oracle SQL that replays graft's custom hash
  * kernels (graft.functions.Kernels) bit-for-bit.
  *
  * The kernels work in 64-bit wraparound arithmetic; DuckDB raises on
  * UBIGINT overflow instead of wrapping, so every 64x64 multiply is
  * emitted as 32-bit split products accumulated in HUGEINT and reduced
  * `% 2^64`, while xor/shift steps run natively on UBIGINT. These
  * builders exist so queries whose outputs flow through custom codegen
  * expressions (t05 rolling hash, d03 simhash, the m-series stub
  * decoder) still land in the full hash-compared oracle gate rather
  * than the weaker rows-only check.
  */
private[operators] object OracleSql {

  val M64: BigInt = BigInt(1) << 64

  /** `xor(e, e >> n)` with logical shift, as a HUGEINT expression. */
  def xorShift(e: String, n: Int): String =
    s"CAST(xor(CAST($e AS UBIGINT), CAST($e AS UBIGINT) >> $n) AS HUGEINT)"

  /** `(e * c) % 2^64` for a HUGEINT expression `e` in [0, 2^64). */
  def mulMod(e: String, c: BigInt): String = {
    val (cHi, cLo) = (c >> 32, c & 0xffffffffL)
    val lo = s"CAST(CAST($e AS UBIGINT) & 4294967295 AS HUGEINT)"
    val hi = s"CAST(CAST($e AS UBIGINT) >> 32 AS HUGEINT)"
    s"(($lo * $cLo + (($lo * $cHi + $hi * $cLo) % 4294967296) * 4294967296) % $M64)"
  }

  /** The splitmix64 finalizer (Kernels.avalanche) over expression `e`. */
  def avalanche(e: String): String = {
    val x1 = s"(($e + 11400714819323198485) % $M64)" // + 0x9e3779b97f4a7c15
    val x2 = mulMod(xorShift(x1, 30), BigInt("bf58476d1ce4e5b9", 16))
    val x3 = mulMod(xorShift(x2, 27), BigInt("94d049bb133111eb", 16))
    xorShift(x3, 31)
  }

  /** FNV-1a 64 of string expression `tok` (Kernels.fnv64) as a HUGEINT
    * expression: fold the char stream through xor-then-multiply with
    * the offset basis prepended as the reduce seed. `ord` equals the
    * UTF-8 byte the kernel consumes on this ASCII corpus.
    */
  def fnv64(tok: String): String = {
    val step = mulMod(
      "CAST(xor(CAST(acc AS UBIGINT), CAST(b AS UBIGINT)) AS HUGEINT)",
      BigInt("100000001b3", 16))
    s"list_reduce(list_prepend(CAST(14695981039346656037 AS HUGEINT), " +
      s"list_transform(range(1, length($tok) + 1), " +
      s"i -> CAST(ord(substr($tok, CAST(i AS INT), 1)) AS HUGEINT))), " +
      s"(acc, b) -> $step)"
  }

  /** Unsigned value of 4 hex chars of `col` at 1-based `pos`, via
    * strpos digit lookups — no hex-parse builtin needed.
    */
  def hex4(col: String, pos: Int): String = {
    def d(i: Int) =
      s"(strpos('0123456789abcdef', substr($col, ${pos + i}, 1)) - 1)"
    s"(((${d(0)} * 16 + ${d(1)}) * 16 + ${d(2)}) * 16 + ${d(3)})"
  }

  /** Sign-convert an unsigned-64 column `e` back to the kernel's
    * signed BIGINT.
    */
  def toSigned(e: String): String =
    s"CAST(CASE WHEN $e >= 9223372036854775808 " +
      s"THEN CAST($e AS HUGEINT) - $M64 " +
      s"ELSE CAST($e AS HUGEINT) END AS BIGINT)"
}
