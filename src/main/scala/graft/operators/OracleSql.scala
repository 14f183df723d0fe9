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

  // ---------------------------------------------------------------------
  // Pure-UBIGINT XXH64 (Spark's xxhash64) as staged CTE columns.
  //
  // The HUGEINT helpers above are fine for per-token folds, but d02's
  // MinHash oracle evaluates 64 lanes x every distinct shingle — ~1M
  // fold rows at sf0.01 — where 128-bit arithmetic is the bottleneck.
  // Everything below stays in native 64-bit UBIGINT: wraparound multiply
  // via 32-bit split products with explicit carry folding, wraparound
  // add via split-add, rotl as disjoint-bit masked-multiply-or (no
  // expression can overflow, so DuckDB's checked arithmetic never
  // fires). Values carry the hash with its SIGN BIT FLIPPED where a
  // signed MIN is needed (unsigned order of h^2^63 == signed order of
  // h); equality joins are signedness-agnostic so nothing ever converts
  // back to BIGINT.
  // ---------------------------------------------------------------------

  val XxP1: BigInt = BigInt("9E3779B185EBCA87", 16)
  val XxP2: BigInt = BigInt("C2B2AE3D27D4EB4F", 16)
  val XxP3: BigInt = BigInt("165667B19E3779F9", 16)
  val XxP4: BigInt = BigInt("85EBCA77C2B2AE63", 16)
  val XxP5: BigInt = BigInt("27D4EB2F165667C5", 16)
  private val M32 = BigInt(1) << 32

  /** `(e * c) % 2^64` over a UBIGINT expression, native 64-bit only. */
  def uMulMod(e: String, c: BigInt): String = {
    val (cHi, cLo) = (c >> 32, c & 0xffffffffL)
    val lo = s"(($e) & 4294967295)"
    val hi = s"(($e) >> 32)"
    val t1 = s"($lo * $cLo)"
    val mid = s"((($lo * $cHi) % $M32 + ($hi * $cLo) % $M32) % $M32)"
    s"(((($t1 >> 32) + $mid) % $M32) * $M32 | ($t1 & 4294967295))"
  }

  /** `(a + b) % 2^64` over UBIGINT expressions, native 64-bit only. */
  def uAddMod(a: String, b: String): String = {
    val slo = s"((($a) & 4294967295) + (($b) & 4294967295))"
    s"((((($a) >> 32) + (($b) >> 32) + ($slo >> 32)) % $M32) * $M32 | ($slo & 4294967295))"
  }

  /** `rotl(e, n)` over a UBIGINT expression: the shifted-out high bits
    * land in the low positions; the masked multiply cannot overflow.
    */
  def uRotl(e: String, n: Int): String = {
    val mask = (BigInt(1) << (64 - n)) - 1
    s"(((($e) & $mask) * ${BigInt(1) << n}) | (($e) >> ${64 - n}))"
  }

  def uXorShift(e: String, n: Int): String = s"xor($e, ($e) >> $n)"

  /** A chain of CTEs each adding columns to the previous — keeps every
    * intermediate a plain column reference so DuckDB evaluates each hash
    * step once per row instead of re-expanding nested expressions.
    */
  final class Stages(name0: String, sql0: String) {
    private var list = Vector(name0 -> sql0)
    private var i = 0
    def add(cols: Seq[(String, String)], select: Seq[String] = Nil): String = {
      i += 1
      val nm = s"${name0}_$i"
      val sel = if (select.isEmpty) "*" else select.mkString(", ")
      val body = s"SELECT $sel, " +
        cols.map { case (n, e) => s"$e AS $n" }.mkString(", ") +
        s" FROM ${list.last._1}"
      list :+= nm -> body
      nm
    }
    def last: String = list.last._1
    def ctes: Vector[(String, String)] = list
  }

  /** XXH64 avalanche finalizer as stages; leaves the result in `out`. */
  def xxFmix(st: Stages, h: String, out: String): Unit = {
    st.add(Seq(s"${out}_f1" -> uMulMod(uXorShift(h, 33), XxP2)))
    st.add(Seq(s"${out}_f2" -> uMulMod(uXorShift(s"${out}_f1", 29), XxP3)))
    st.add(Seq(out -> uXorShift(s"${out}_f2", 32)))
  }

  /** `XXH64.hashInt(j, 42)` (Spark's int hash, seed 42) as stages over a
    * non-negative INT column `j`.
    */
  def xxHashInt(st: Stages, j: String, out: String): Unit = {
    val init = (BigInt(42) + XxP5 + 4) % M64
    st.add(Seq(s"${out}_i1" ->
      s"xor($init::UBIGINT, ${uMulMod(s"CAST($j AS UBIGINT)", XxP1)})"))
    st.add(Seq(s"${out}_i2" -> uMulMod(uRotl(s"${out}_i1", 23), XxP2)))
    st.add(Seq(s"${out}_i3" -> uAddMod(s"${out}_i2", s"$XxP3::UBIGINT")))
    xxFmix(st, s"${out}_i3", out)
  }

  /** `XXH64.hashLong(v, seed)` as stages: one long round + fmix. */
  def xxHashLong(st: Stages, seed: String, v: String, out: String): Unit = {
    st.add(Seq(s"${out}_a" -> uAddMod(seed, s"${XxP5 + 8}::UBIGINT")))
    st.add(Seq(s"${out}_b" -> uMulMod(uRotl(uMulMod(v, XxP2), 31), XxP1)))
    st.add(Seq(s"${out}_c" -> uAddMod(
      uMulMod(uRotl(s"xor(${out}_a, ${out}_b)", 27), XxP1), s"$XxP4::UBIGINT")))
    xxFmix(st, s"${out}_c", out)
  }

  /** One guarded XXH64 tail-fold round:
    * `h' = cond ? rotl(h ^ k, rot) * p (+ addc) : h`.
    */
  def xxRound(st: Stages, h: String, k: String, rot: Int, p: BigInt,
              addc: Option[BigInt], cond: String, nh: String): String = {
    st.add(Seq(s"${nh}_r" -> uRotl(s"xor($h, $k)", rot)))
    st.add(Seq(s"${nh}_m" -> uMulMod(s"${nh}_r", p)))
    val fin = addc.fold(s"${nh}_m")(c => uAddMod(s"${nh}_m", s"$c::UBIGINT"))
    st.add(Seq(nh -> s"(CASE WHEN $cond THEN $fin ELSE $h END)"))
    nh
  }
}
