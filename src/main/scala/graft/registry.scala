package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator/query in the engine's inventory (SURVEY.md §2).
  *
  * @param build   builds the result DataFrame from (session, sfDir). The
  *                output must be deterministic: explicit orderBy, floats
  *                rounded, computed ints cast to long (DuckDB BIGINT parity).
  * @param oracle  equivalent ANSI SQL the driver runs in DuckDB over the same
  *                parquet tables; None → driver does a rows-only check.
  * @param headline included in Bench's per-round benchmark set.
  */
final case class QueryDef(
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    headline: Boolean = false)

/** Loads the driver-generated TPC-H-ish corpus (TESTDATA.md) for one scale
  * factor. Plain parquet reads — Catalyst handles filter pushdown and column
  * pruning, so every query should show PushedFilters/ReadSchema at the scan.
  */
final case class Tables(spark: SparkSession, dir: String) {
  private def p(name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")
  def region: DataFrame = p("region")
  def nation: DataFrame = p("nation")
  def customer: DataFrame = p("customer")
  def supplier: DataFrame = p("supplier")
  def part: DataFrame = p("part")
  def orders: DataFrame = p("orders")
  def lineitem: DataFrame = p("lineitem")
  /** events.parquet has shipped `ts` as TIMESTAMP(NANOS) in some testdata
    * generations and timestamp[us] in others, so branch on the SCANNED
    * schema rather than assuming either:
    *   - int64 nanos (via nanosAsLong, which Spark 4 needs to read NANOS
    *     at all) → truncate to micros, exactly what DuckDB does on load;
    *   - timestamp[us] without UTC flag → Spark reads TIMESTAMP_NTZ; cast
    *     to session-zoned TimestampType (session TZ is pinned UTC in
    *     Verify/Bench, so the cast is value-preserving and keeps every
    *     downstream window/watermark op on the same type as before). */
  def events: DataFrame = {
    import org.apache.spark.sql.functions.{expr, timestamp_micros}
    import org.apache.spark.sql.types.{LongType, TimestampNTZType, TimestampType}
    // SESSION-GLOBAL, deliberately not restored: the flag is read at
    // scan-planning time (actions run long after this accessor), so a
    // set-and-restore would plan later executions with it OFF and fail
    // on nanos files. GraftSession.build sets it at session build —
    // this set covers sessions built elsewhere. Consequence a caller
    // must know: any OTHER nanos-timestamp parquet read on this session
    // also surfaces as LongType from here on (Spark offers no
    // per-read form of the flag).
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = p("events")
    df.schema("ts").dataType match {
      case LongType         => df.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType => df.withColumn("ts", df("ts").cast(TimestampType))
      case _                => df
    }
  }
  def documents: DataFrame = p("documents")
  def embeddings: DataFrame = p("embeddings")

  /** documents/embeddings are small files that scan as one partition
    * locally, which would serialize the explode/hash-heavy per-row compute
    * of the dedup/text/similarity operators onto one thread. On a real
    * cluster the input splits provide the spread; here an explicit
    * round-robin repartition restores it. Cost: one tiny shuffle of the
    * source rows (never of the exploded rows).
    *
    * The partition count is EXPLICIT (defaultParallelism = the session's
    * cores): a bare `repartition(col)` is advisory to AQE, which sizes
    * post-shuffle partitions by BYTES and coalesces a few-MB corpus back
    * to one partition — re-serializing exactly the compute-heavy stage
    * the spread exists for (p21's decontamination predicate measured 10×
    * slower under the coalesce). Compute-bound stages must be sized by
    * CPU, not bytes; the explicit count pins that. */
  def documentsSpread: DataFrame =
    documents.repartition(spark.sparkContext.defaultParallelism,
      col("doc_id"))
  def embeddingsSpread: DataFrame =
    embeddings.repartition(spark.sparkContext.defaultParallelism,
      col("vec_id"))
  private def col(n: String) = org.apache.spark.sql.functions.col(n)
}
