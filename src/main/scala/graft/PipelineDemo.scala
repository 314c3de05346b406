package graft

import org.apache.spark.sql.SparkSession

/** Batch twin of EngineDemo: runs the composed training-data pipeline
  * end-to-end over a real scale-factor directory and prints the dataset
  * card — the "switch to this library and build a corpus" walkthrough.
  *
  *   stage 1  curation        p01  (quality gate → exact dedup → LSH near-dup)
  *   stage 2  decontamination p05  (minus benchmark 5-gram overlap)
  *   stage 3  packing         p02  (per-language token budgets)
  *   stage 4  sharding        p04  (hash shards, within-shard order)
  *   stage 5  dataset card    p07  (grouping-set grains, permille shares)
  *
  * Each stage is one of the oracle-verified operators (CORRECTNESS gate);
  * this main just chains and reports them. Usage:
  *   runMain graft.PipelineDemo [sfDir]      (default /root/testdata/sf0.001)
  */
object PipelineDemo {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = GraftSession.build("graft-pipeline-demo", "local[4]", 4)

    def stage(name: String)(n: => Long): Unit =
      println(f"STAGE $name%-28s rows=$n%d")

    stage("p01_training_corpus") {
      SparkEntry.queries("p01_training_corpus")(spark, sfDir).count()
    }
    stage("p05_decontaminated_corpus") {
      SparkEntry.queries("p05_decontaminated_corpus")(spark, sfDir).count()
    }
    stage("p02_token_budget") {
      SparkEntry.queries("p02_token_budget")(spark, sfDir).count()
    }
    stage("p04_shard_assign") {
      SparkEntry.queries("p04_shard_assign")(spark, sfDir).count()
    }
    println("DATASET_CARD:")
    SparkEntry.queries("p07_mix_report")(spark, sfDir)
      .show(100, truncate = false)
    spark.stop()
  }
}
