package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.expressions.{Expression, Generator, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, LongType, StructField, StructType}

/** `sorted_pairs(ids)` — generator emitting the C(k,2) ordered pairs
  * `(ids[i], ids[j])` for `i < j` as two BIGINT columns `(a_id, b_id)`.
  *
  * The shared tail of every group-and-expand candidate generator (n-gram
  * shingles, MinHash bands, hyperplane buckets): a bucket's gathered
  * sorted doc list expands to its candidate pairs in place. Replaces the
  * HOF spelling `explode(flatten(transform(ids, (x,i) ->
  * transform(slice(ids, i+2, size(ids)), y -> struct(x, y)))))`, whose
  * interpreted lambdas pay an O(k) `slice` copy per element plus a boxed
  * struct per pair — ~0.5-1 µs/pair, and (measured, round 9) 0.6 s of
  * d02's ~1.5 s warm time at sf0.1 once AQE's byte-based coalesce packs
  * the compute-heavy expansion onto 4 post-shuffle tasks. This native
  * `Generator` walks the array with two cursors and allocates one
  * two-long row per pair — tens of ns/pair, so a byte-coalesced
  * post-shuffle stage stays cheap and the worst single group a
  * production hot-key cap admits (k = 2000 → 1,999,000 pairs in ONE
  * task) costs milliseconds, not the ~1 s the HOF path measured.
  *
  * Contract: null ELEMENTS are skipped (the engine's inputs are
  * collect_list output, which never contains them; a direct SQL caller
  * passing one gets the pairs of the non-null elements rather than a
  * silent 0 read through the primitive accessor); a strictly ascending
  * input yields pairs with a_id < b_id. A null array, like the HOF
  * spelling's, emits nothing. Lazy iterator: the O(k²) pair set is
  * never materialized as one array (the HOF path built the full
  * flattened array per row before exploding it).
  */
case class SortedPairs(child: Expression)
    extends UnaryExpression with Generator with CodegenFallback {

  override def elementSchema: StructType = StructType(Seq(
    StructField("a_id", LongType, nullable = false),
    StructField("b_id", LongType, nullable = false)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"sorted_pairs requires ARRAY<BIGINT>, got ${other.simpleString}")
  }
  override def prettyName: String = "sorted_pairs"

  override def eval(input: InternalRow): IterableOnce[InternalRow] = {
    val value = child.eval(input)
    if (value == null) Iterator.empty
    else {
      val arr = value.asInstanceOf[ArrayData]
      val total = arr.numElements()
      // compact away null elements once (collect_list inputs have none;
      // the scan is O(k) against the O(k²) expansion it protects)
      var nulls = 0
      var c = 0
      while (c < total) { if (arr.isNullAt(c)) nulls += 1; c += 1 }
      val vals = new Array[Long](total - nulls)
      var s = 0
      c = 0
      while (c < total) {
        if (!arr.isNullAt(c)) { vals(s) = arr.getLong(c); s += 1 }
        c += 1
      }
      val n = vals.length
      if (n < 2) Iterator.empty
      else new Iterator[InternalRow] {
        private var i = 0
        private var j = 1
        override def hasNext: Boolean = i < n - 1
        override def next(): InternalRow = {
          val row = new GenericInternalRow(
            Array[Any](vals(i), vals(j)))
          j += 1
          if (j == n) { i += 1; j = i + 1 }
          row
        }
      }
    }
  }

  override protected def withNewChildInternal(
      newChild: Expression): SortedPairs = copy(child = newChild)
}
