package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashing primitives.
  *
  * Everything here is chosen so the EXACT same value is computable in
  * Spark (native codegen'd expressions or plain Scala kernels) and in the
  * DuckDB oracle SQL the driver runs — that's what makes the training-data
  * ops (dedup sketches, LSH, fingerprints) hash-comparable end-to-end:
  *
  *   md5i(s) = first 15 hex chars of md5(s), parsed base-16 → 60-bit Long
  *     Spark SQL :  conv(substring(md5(s),1,15),16,10)::long
  *     DuckDB    :  CAST('0x' || substr(md5(s),1,15) AS BIGINT)
  *     Scala     :  java.lang.Long.parseLong(md5hex(s).take(15), 16)
  *
  * 60 bits keeps every value strictly positive in a signed 64-bit Long, so
  * `%` behaves identically across engines (no negative-mod divergence).
  *
  * The analog in the reference is its deterministic tokenizer hashing —
  * everything derives from content bytes, never from wall-clock or
  * iteration order (/root/reference/crates/core/src/inference.rs:107-175).
  */
object Hashing {

  // one digest instance per task thread: getInstance per call costs an
  // allocation + provider lookup, and the dedup kernels hash millions of
  // shingles per partition
  private val digest = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** Lowercase hex md5 of the UTF-8 bytes — same as Spark/DuckDB `md5()`. */
  def md5hex(s: String): String = {
    val md = digest.get()
    md.reset()
    val d = md.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    val sb = new java.lang.StringBuilder(32)
    var i = 0
    while (i < d.length) {
      sb.append(Character.forDigit((d(i) >> 4) & 0xf, 16))
      sb.append(Character.forDigit(d(i) & 0xf, 16))
      i += 1
    }
    sb.toString
  }

  /** 60-bit positive hash of a string (see object doc for SQL parity). */
  def md5i(s: String): Long =
    java.lang.Long.parseLong(md5hex(s).substring(0, 15), 16)

  /** Column form of [[md5i]] — the native [[Md5iExpr]] (one static call
    * inside generated code). Value-identical to the SQL chain
    * `conv(substring(md5(c),1,15),16,10)::long` it previously built, but
    * skips materializing the 32-char hex string and the interpreted
    * base-conversion — this column is on per-row hot paths (sampling
    * gates, media metadata, fingerprints, stream repair gates).
    */
  def md5iCol(c: Column): Column =
    org.apache.spark.sql.graftbridge.ColumnBridge.column(
      Md5iExpr(org.apache.spark.sql.graftbridge.ColumnBridge.expression(c)))

  /** DuckDB SQL snippet computing md5i over expression `e`. */
  def md5iSql(e: String): String =
    s"CAST('0x' || substr(md5($e),1,15) AS BIGINT)"

  /** Modulus for polynomial fingerprints: fits acc*31 + 60-bit term in a
    * signed Long without overflow (1e9+7 * 31 + 2^60 < 2^63).
    */
  val FpMod = 1000000007L

  /** Polynomial rolling fingerprint over a token-hash sequence, seeded by
    * the first element (reduceLeft semantics — matches DuckDB
    * `list_reduce(l, (a,b) -> (a*31+b) % mod)` and Spark
    * `aggregate(l, 0L, (a,b) -> (a*31+b) % mod)`, since 0*31+h1 = h1).
    */
  def polyFp(hashes: Iterator[Long]): Long = {
    var acc = 0L
    while (hashes.hasNext) acc = (acc * 31 + hashes.next() % FpMod) % FpMod
    acc
  }
}
