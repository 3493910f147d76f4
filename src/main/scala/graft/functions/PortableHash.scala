package graft.functions

/** Deterministic md5-derived hash family shared by the Spark operators and
  * the DuckDB oracle SQL.
  *
  * Round 1 gated the LSH/fingerprint queries on xxhash64 + SplitMix64
  * families that DuckDB cannot reproduce, leaving them rows-only. Every
  * query-gated pipeline now derives its randomness from md5 — available and
  * bit-identical in both engines:
  *
  *  - base 60-bit hash: first 15 hex digits of md5 interpreted as an
  *    unsigned integer. SQL mirror: `CAST('0x' || substr(md5(x), 1, 15) AS
  *    BIGINT)`. 15 digits keep the value < 2^60, clear of BIGINT overflow
  *    in either engine.
  *  - MinHash seeds: a universal linear family `(a_s·h + b_s) mod P` over
  *    the Mersenne prime P = 2^31 − 1, with per-seed coefficients
  *    themselves md5-derived. Products stay < 2^62 (DuckDB errors on BIGINT
  *    overflow rather than wrapping, so this bound is load-bearing).
  *  - LSH hyperplanes: component (t,b,d) = (md5_60("t_b_d") mod 10^6)/10^6
  *    − 0.5 — the same integer→double steps run in both engines, so the
  *    resulting weights (and dot-product signs) are bit-identical.
  *
  * md5 is ~4x slower than xxhash64 per byte, but fingerprinting is a small
  * slice of each pipeline (the corpus scan and shuffles dominate); the
  * cross-engine verifiability is worth the constant factor. Security is NOT
  * a goal — this is hashing-for-sketches, not authentication.
  */
object PortableHash {

  /** Mersenne prime 2^31 − 1: the modulus of the MinHash linear family. */
  val P: Long = 2147483647L

  private val localMd5 = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First 60 bits of md5(bytes) == first 15 hex digits as an integer. */
  def md5Long60(bytes: Array[Byte]): Long = {
    val md = localMd5.get()
    md.reset()
    val d = md.digest(bytes)
    // big-endian long of bytes 0..7, dropped low nibble = 15 hex digits
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (d(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def md5Long60(s: String): Long =
    md5Long60(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))

  /** MinHash per-seed multiplier in [1, P−1]. */
  def minhashA(seed: Int): Long = (md5Long60(s"mh_a_$seed") % (P - 1)) + 1

  /** MinHash per-seed offset in [0, P−1]. */
  def minhashB(seed: Int): Long = md5Long60(s"mh_b_$seed") % P

  /** Sign-LSH hyperplane component for (table, bit, dim) in [−0.5, 0.5). */
  def planeComponent(table: Int, bit: Int, dim: Int): Double =
    (md5Long60(s"${table}_${bit}_${dim}") % 1000000L).toDouble / 1000000.0 - 0.5

  /** Hyperplane matrix for one LSH table: bits × dims. */
  def planes(table: Int, bits: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(bits, dims)((b, d) => planeComponent(table, b, d))

  /** Immutable (dims, planes) pair for the plane-expression caches:
    * holding both behind ONE reference makes concurrent refresh at
    * worst redundant, never torn (see LshSignatureExpr).
    */
  final class PlaneCache(val dims: Int, val planes: Array[Array[Double]])

  // ------------------------------------------------------ DuckDB SQL mirrors

  /** SQL: 60-bit md5 hash of a string expression. */
  def sqlHash60(expr: String): String =
    s"CAST('0x' || substr(md5($expr), 1, 15) AS BIGINT)"

  /** SQL: the planes CTE body producing (t, b, d, w) for the given shape —
    * DuckDB computes the identical md5-derived weights itself, so no
    * thousand-literal constant tables ride along in the oracle.
    */
  def sqlPlanes(tables: Int, bits: Int, dims: Int): String =
    // CAST AS DOUBLE before the division: DuckDB otherwise plans DECIMAL
    // arithmetic for `x / 1000000.0`, which rounds differently from the
    // JVM's IEEE-double path (verified bit-exact only via the cast)
    s"""SELECT t.range AS t, b.range AS b, d.range AS d,
       |  CAST(${sqlHash60("concat_ws('_', t.range, b.range, d.range)")}
       |    % 1000000 AS DOUBLE) / 1000000.0 - 0.5 AS w
       |FROM range($tables) t, range($bits) b, range($dims) d""".stripMargin
}
