package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator — the `Aggregator[IN, BUF, OUT]`
  * face of the sketch surface (SURVEY §2.8: the reference has no UDAFs; the
  * engine exposes Spark's typed aggregate API for custom sketches).
  *
  * Hash family SHARED with [[MinHashSig]]/DedupOps.d03/the DuckDB oracle:
  * per shingle, x = the 28-bit md5-prefix base hash
  * ([[MinHashSig.baseHash]]), per seed min of `(a_i·x + b_i) mod p`
  * ([[MinHashFamily]]) — so signatures built here band/join correctly
  * against expression-built ones (MinHashAggSpec pins element-for-element
  * identity against `MinHashSig.compute` on the same shingle sets).
  * Buffers are primitive long arrays — mergeable, constant size,
  * spill-friendly — which is what a 100 TB groupByKey sketch needs.
  */
final class MinHashAgg(numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  private val A: Array[Long] = Array.tabulate(numHashes)(MinHashFamily.a)
  private val B: Array[Long] = Array.tabulate(numHashes)(MinHashFamily.b)
  private val P: Long = MinHashFamily.p

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    val x = MinHashSig.baseHash(
      shingle.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var i = 0
    while (i < numHashes) {
      val v = (A(i) * x + B(i)) % P
      if (v < buf(i)) buf(i) = v
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  /** NULL for the untouched zero buffer (no rows reduced — only a
    * global aggregate over an empty/fully-filtered Dataset; grouped
    * aggregation always has ≥1 row per group): all-MaxValue is a
    * sentinel no real input can produce (one reduce updates EVERY
    * slot), and emitting it as a "signature" band-joined two empty
    * inputs as perfect near-duplicates. Same null-for-empty contract
    * as [[MinHashSig.compute]]. */
  override def finish(buf: Array[Long]): Array[Long] =
    if (buf.forall(_ == Long.MaxValue)) null else buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
