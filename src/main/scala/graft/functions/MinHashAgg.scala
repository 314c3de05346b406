package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Typed MinHash-signature aggregator — the `Aggregator[IN, BUF, OUT]`
  * face of the sketch surface (SURVEY §2.8: the reference has no UDAFs; the
  * engine exposes Spark's typed aggregate API for custom sketches).
  *
  * Functionally identical to the expression-based signature in
  * DedupOps.d03 (verified by MinHashAggSpec): numHashes seeded md5-prefix
  * hashes, min per seed. Buffers are primitive long arrays — mergeable,
  * constant size, spill-friendly — which is what a 100 TB groupByKey sketch
  * needs.
  */
final class MinHashAgg(numHashes: Int)
    extends Aggregator[String, Array[Long], Array[Long]] {

  override def zero: Array[Long] = Array.fill(numHashes)(Long.MaxValue)

  override def reduce(buf: Array[Long], shingle: String): Array[Long] = {
    var i = 0
    while (i < numHashes) {
      val h = StableHash.h60Jvm(s"$i:$shingle")
      if (h < buf(i)) buf(i) = h
      i += 1
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numHashes) { if (b(i) < a(i)) a(i) = b(i); i += 1 }
    a
  }

  override def finish(buf: Array[Long]): Array[Long] = buf
  override def bufferEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Array[Long]] =
    org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Array[Long]]()
}
