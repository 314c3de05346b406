package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Deterministic, engine-portable hashes built from md5 hex prefixes.
  *
  * Spark's `hash`/`xxhash64` are Spark-specific (seeded Murmur3/XXH64) and
  * cannot be reproduced in a DuckDB oracle, so every hash-dependent operator
  * (exact dedup keys, MinHash, SimHash, LSH bucketing, fingerprints) uses an
  * md5-prefix hash that both engines compute identically:
  *
  *   Spark : conv(substr(md5(s), 1, k), 16, 10) cast long
  *   DuckDB: ('0x' || substr(md5(s), 1, k))::BIGINT
  *
  * k=15 hex digits = 60 bits (fits signed int64, always non-negative);
  * k=8 = 32 bits, used where per-bit arithmetic must stay small.
  *
  * Scale note: md5 is not the fastest hash, but it is computed inside
  * whole-stage codegen (all built-in expressions) and is branch-free per row;
  * at 100 TB the cost is dwarfed by the shuffles these operators feed.
  */
object StableHash {
  /** 60-bit non-negative hash of a string column. */
  def h60(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** 32-bit non-negative hash of a string column. */
  def h32(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 8), 16, 10).cast("long")

  /** JVM-side twin of [[h60]] for typed aggregators / drivers — identical
    * value for identical input (lowercase md5 hex, first 15 digits). */
  def h60Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16)
  }

  /** JVM-side twin of [[h32]] (first 8 md5 hex digits as a long). */
  def h32Jvm(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString
    java.lang.Long.parseLong(hex.substring(0, 8), 16)
  }

  /** DuckDB SQL fragment equivalent to [[h60]] over expression `e`. */
  def duckH60(e: String): String =
    s"('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 15))::BIGINT"

  /** DuckDB SQL fragment equivalent to [[h32]]. */
  def duckH32(e: String): String =
    s"('0x' || substr(md5(CAST($e AS VARCHAR)), 1, 8))::BIGINT"
}
