package graft.functions

/** The shared universal hash family behind every MinHash signature matrix
  * (DedupOps.minhashPairs, CorpusPipeline p01): h_i(x) = (a_i·x + b_i) mod p
  * over a 28-bit md5-prefix base hash x — one digest per shingle, then one
  * multiply-add-mod per seed.
  *
  * p = 2^31 − 1 (Mersenne prime); a_i ∈ [1, p), b_i ∈ [0, p) are fixed
  * md5-derived constants, so both engines (and any future port) rebuild the
  * identical family from this definition alone. Bounds: x < 2^28 and
  * a_i < 2^31 keep a_i·x + b_i < 2^60 — exact int64 arithmetic, no overflow
  * under ANSI semantics in Spark or DuckDB.
  */
object MinHashFamily {
  val p: Long = 2147483647L
  def a(i: Int): Long = StableHash.h60Jvm(s"minhash-a:$i") % (p - 1) + 1
  def b(i: Int): Long = StableHash.h60Jvm(s"minhash-b:$i") % p

  /** DuckDB VALUES rows `(seed, a, b)` for seeds 0..n-1. */
  def duckSeedRows(n: Int): String =
    (0 until n).map(i => s"(${i}, ${a(i)}, ${b(i)})").mkString(", ")
}
