package graft.plans

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.{SparkPlan, FileSourceScanExec}
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, CartesianProductExec}

/** Physical-plan quality assertions — the ".explain and iterate until it's
  * the plan you'd want" discipline, codified so regressions fail CI instead
  * of surfacing as 100 TB slowdowns. Used by PlanSpec to pin the plan shape
  * of the headline queries (pushdown reaches the scan, small dims broadcast,
  * top-k avoids global sorts, candidate generation never goes Cartesian).
  */
object PlanChecks {

  private def collect(plan: SparkPlan): Seq[SparkPlan] = {
    plan match {
      case a: AdaptiveSparkPlanExec => collect(a.executedPlan)
      case q: QueryStageExec => Seq(q) ++ collect(q.plan)
      case p => Seq(p) ++ p.children.flatMap(collect) ++
        p.subqueries.flatMap(collect)
    }
  }

  def physical(df: DataFrame): Seq[SparkPlan] =
    collect(df.queryExecution.executedPlan)

  /** Some parquet scan carries pushed-down data filters. */
  def hasPushedFilters(df: DataFrame): Boolean =
    physical(df).exists {
      case s: FileSourceScanExec => s.dataFilters.nonEmpty
      case _ => false
    }

  /** Every parquet scan reads at most `maxCols` columns (pruning works). */
  def maxScanColumns(df: DataFrame): Int =
    physical(df).collect {
      case s: FileSourceScanExec => s.output.size
    }.maxOption.getOrElse(0)

  /** Number of parquet scan nodes in the EXECUTED (post-AQE) plan — the
    * single-scan-per-input pin for the theta-join rewrites (string
    * counting over toString would double-count AQE's Initial Plan). */
  def countParquetScans(df: DataFrame): Int =
    physical(df).count(_.isInstanceOf[FileSourceScanExec])

  def usesBroadcastJoin(df: DataFrame): Boolean =
    physical(df).exists(_.isInstanceOf[BroadcastHashJoinExec])

  def usesCartesianProduct(df: DataFrame): Boolean =
    physical(df).exists(_.isInstanceOf[CartesianProductExec])

  /** Join types of every broadcast-hash join in the (post-AQE) plan —
    * lets a pin assert a specific join (e.g. the two-phase back-anti)
    * planned as a broadcast. */
  def broadcastHashJoinTypes(df: DataFrame): Seq[String] =
    physical(df).collect {
      case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec =>
        j.joinType.toString
    }

  /** Sort-merge joins in the (post-AQE) plan — a back-join that plans as
    * one shuffles BOTH sides (payload included), the exact shape the
    * two-phase topologies exist to avoid. */
  def countSortMergeJoins(df: DataFrame): Int =
    physical(df).count(
      _.isInstanceOf[org.apache.spark.sql.execution.joins.SortMergeJoinExec])

  /** TakeOrderedAndProject present (top-k without a global sort). */
  def usesTakeOrdered(df: DataFrame): Boolean =
    physical(df).exists(
      _.getClass.getSimpleName.startsWith("TakeOrderedAndProject"))

  def countShuffles(df: DataFrame): Int =
    physical(df).count(_.isInstanceOf[Exchange])

  /** Data shuffles only — broadcast exchanges excluded (a broadcast of a
    * provably-small side is not the scale risk a repartition is). */
  def countDataShuffles(df: DataFrame): Int =
    physical(df).count(
      _.isInstanceOf[org.apache.spark.sql.execution.exchange.ShuffleExchangeLike])

  /** For every PARTITIONED parquet scan in the (post-AQE) plan: true when
    * its partition filters carry a SELECTIVE predicate — a literal
    * IN/equality over the partition column (static file-index pruning),
    * or a genuinely planted DynamicPruningExpression. `isnotnull` alone
    * and the `true` placeholder an AQE-degraded DPP slot shows do NOT
    * count. Empty when the plan scans nothing partitioned. The pruning
    * half of a partitioned-layout pin (s18/s19): a scan without a
    * selective partition filter reads EVERY partition of the layout at
    * 100 TB no matter how selective the probe side is. */
  def partitionedScansPruned(df: DataFrame): Seq[Boolean] = {
    import org.apache.spark.sql.catalyst.expressions.{
      DynamicPruningExpression, IsNotNull, Literal}
    physical(df).collect {
      case s: FileSourceScanExec if s.relation.partitionSchema.nonEmpty =>
        s.partitionFilters.exists {
          case _: IsNotNull => false
          case DynamicPruningExpression(child) =>
            child != Literal.TrueLiteral
          case _ => true
        }
    }
  }

  /** Sum of the "number of partitions read" metric across partitioned
    * parquet scans — read AFTER executing the frame (scan materialization
    * fills it, post-pruning). The scanned-partition-count half of a DPP
    * pin: assert it equals the probed subset, not the full layout. */
  def partitionsRead(df: DataFrame): Long =
    physical(df).collect {
      case s: FileSourceScanExec if s.relation.partitionSchema.nonEmpty =>
        s.metrics.get("numPartitions").map(_.value).getOrElse(0L)
    }.sum

  /** Whole-stage codegen spans present (hot path is compiled). */
  def hasWholeStageCodegen(df: DataFrame): Boolean =
    physical(df).exists(
      _.getClass.getSimpleName.startsWith("WholeStageCodegen"))

  /** Window operators with no PARTITION BY — the "whole table through one
    * task" shape (`WindowExec: No Partition Defined`). Any occurrence in a
    * registered query is a scale bug: the window's input serializes through
    * a single partition regardless of cluster size. */
  def unpartitionedWindows(df: DataFrame): Seq[String] =
    physical(df).collect {
      case w: org.apache.spark.sql.execution.window.WindowExec
          if w.partitionSpec.isEmpty => w.windowExpression.mkString(", ")
      case w: org.apache.spark.sql.execution.window.WindowGroupLimitExec
          if w.partitionSpec.isEmpty => s"group-limit ${w.rankLikeFunction}"
    }
}
