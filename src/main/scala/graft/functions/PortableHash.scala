package graft.functions

import java.nio.charset.StandardCharsets
import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Engine-portable deterministic hashing (round-2 upgrade per
  * VERDICT "Next round" item 1): every sketch/LSH kernel hashes with
  * md5-derived integers instead of xxhash64 so the DuckDB oracle can
  * state bit-identical signatures, buckets and candidate sets — the
  * same trick already proven by `Curation.md5Bucket`.
  *
  * Three forms, each with an exact DuckDB twin:
  *  - [[md5Long32]]  = first 8 md5 hex digits as a long in [0, 2^32)
  *    (`CAST(('0x' || substr(md5(x), 1, 8)) AS BIGINT)`)
  *  - [[md5Long32b]] = hex digits 9..16 — an independent second word
  *  - [[md5Long60]]  = first 15 hex digits, a 60-bit value that stays
  *    inside signed-64 arithmetic in both engines
  *
  * MinHash uses the textbook universal family over the first word:
  * `h_i(x) = (A_i * x + B_i) mod p`, p = 2^31 - 1, with per-slot
  * deterministic constants ([[slotConstants]]) — independent slots,
  * one digest per input row regardless of the number of hash slots,
  * and expressible in one DuckDB cross join with a VALUES slot table.
  */
object PortableHash {

  /** First 8 md5 hex digits of the string form of `c`, as a long. */
  def md5Long32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** md5 hex digits 9..16 — independent of [[md5Long32]]'s word. */
  def md5Long32b(c: Column): Column =
    conv(substring(md5(c.cast("string")), 9, 8), 16, 10).cast("long")

  /** First 15 md5 hex digits: a 60-bit non-negative long (15 nibbles).
    * 64-bit would overflow BIGINT in DuckDB's `'0x'` cast for values
    * >= 2^63, so sketches that need "wide" bits use 60.
    */
  def md5Long60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** JVM twin of ([[md5Long32]], [[md5Long32b]]) over a UTF-8 string:
    * bytes 0..3 / 4..7 of the digest as unsigned 32-bit values. Used
    * by [[MinHashSketch]] so the custom aggregate hashes identically
    * to the Column/SQL forms (asserted in PipelineSpec).
    */
  def md5PairJvm(s: Array[Byte]): (Long, Long) = {
    val d = threadDigest.get()
    d.reset()
    val h = d.digest(s)
    def word(off: Int): Long =
      ((h(off) & 0xFFL) << 24) | ((h(off + 1) & 0xFFL) << 16) |
        ((h(off + 2) & 0xFFL) << 8) | (h(off + 3) & 0xFFL)
    (word(0), word(4))
  }

  def md5PairJvm(s: String): (Long, Long) =
    md5PairJvm(s.getBytes(StandardCharsets.UTF_8))

  // MessageDigest is stateful and not thread-safe; expressions can be
  // shared across local-mode task threads, so each thread gets its own.
  private val threadDigest: ThreadLocal[MessageDigest] =
    ThreadLocal.withInitial(() => MessageDigest.getInstance("MD5"))

  /** Mersenne prime 2^31 - 1: the modulus of the MinHash universal
    * family. Both engines stay in exact signed-64 arithmetic:
    * x < p and A,B < p, so A*x + B < 2^62.
    */
  val P31: Long = 2147483647L

  /** Per-slot (A_i, B_i) constants of the universal hash family
    * h_i(x) = (A_i * x + B_i) mod p — independent slots (the classic
    * MinHash construction), NOT the correlated a + i*b ladder (without
    * a modulus that degenerates toward argmin-b for large i).
    * Deterministic: derived from md5("slot:i"); A_i forced nonzero.
    * The same constants are embedded as literals in the DuckDB oracle
    * ([[slotConstantsSql]]).
    */
  def slotConstants(numHashes: Int): Array[(Long, Long)] =
    Array.tabulate(numHashes) { i =>
      val (w1, w2) = md5PairJvm(s"slot:$i")
      (w1 % (P31 - 1) + 1, w2 % P31)
    }

  /** `(VALUES (0, A0, B0), ...) AS slots(i, a, b)` for the oracle. */
  def slotConstantsSql(numHashes: Int): String =
    slotConstants(numHashes).zipWithIndex
      .map { case ((a, b), i) => s"($i, $a, $b)" }
      .mkString("(VALUES ", ", ", ") AS slots(i, a, b)")

  /** Deterministic ±1 hyperplane matrix for sign-LSH: plane j's i-th
    * coordinate is +1 iff md5("j:i")'s first-8-hex word is even —
    * computed once at plan-build time (the matrix depends only on
    * (j, i), never on data) and embedded as literals in BOTH the Spark
    * plan and the generated oracle SQL, so the two engines share the
    * exact hyperplanes by construction.
    */
  def signMatrix(nBits: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(nBits, dim) { (j, i) =>
      if (md5PairJvm(s"$j:$i")._1 % 2 == 0) 1.0 else -1.0
    }

  /** SQL literal list of a sign row: `[1.0, -1.0, ...]`. */
  def sqlList(signs: Array[Double]): String =
    signs.map(v => if (v > 0) "1.0" else "-1.0").mkString("[", ", ", "]")
}
