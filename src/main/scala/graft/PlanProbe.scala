package graft

import org.apache.spark.sql.SparkSession

/** Plan inspection utility: prints the formatted physical plan (and timing)
  * for named queries — the `.explain("formatted")` iteration loop the build
  * discipline requires (check PushedFilters/ReadSchema at scans, broadcast
  * vs shuffle joins, WholeStageCodegen spans).
  *
  * Usage: runMain graft.PlanProbe <sfDir> <query> [query ...]
  *        runMain graft.PlanProbe <sfDir> --time <query ...>   (timing only)
  *        runMain graft.PlanProbe <sfDir> --executed <query ...>
  *          (run fully, then print the POST-AQE executed plan — the only
  *           view that shows runtime stage reuse, AQE join conversions,
  *           and skew splits; the static explain shows none of them)
  */
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val timeOnly = args.contains("--time")
    val executed = args.contains("--executed")
    val names = args.drop(1)
      .filterNot(a => a == "--time" || a == "--executed") match {
      case Array() => SparkEntry.headlines.toArray
      case xs => xs
    }
    val cpus = sys.env.get("SPARK_GRAFT_CPUS")
      .flatMap(_.toIntOption).getOrElse(32)
    // canonical builder: the hand-rolled copy pinned 32 shuffle
    // partitions regardless of the CPUS-sized master
    val spark = GraftSession.build("graft-planprobe", s"local[$cpus]", cpus)
    // ad-hoc conf overrides for plan experiments, e.g.
    // SPARK_GRAFT_CONF="spark.sql.autoBroadcastJoinThreshold=-1" —
    // applied at runtime (SQL confs are runtime-settable; plan
    // experiments only ever need SQL confs)
    sys.env.get("SPARK_GRAFT_CONF").foreach(_.split(";;").foreach { kv =>
      kv.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => spark.conf.set(k, v)
        case _ if kv.trim.isEmpty => () // tolerate trailing/double ';;'
        case _ => System.err.println(
          s"PlanProbe: ignoring malformed SPARK_GRAFT_CONF entry '$kv' " +
            "(expected key=value)")
      }
    })
    // --overlap-preflight: price the overlap rewrite's pair-probe over
    // the corpus shingle relation BEFORE running it (SkewTools
    // .overlapJoinPreflight) — a hot element prints as a diagnosed WARN,
    // not a mystery straggler. Conf overrides (SPARK_GRAFT_CONF) apply
    // to this probe like any other.
    if (args.contains("--overlap-preflight")) {
      val report = SparkEntry.queries("d31_overlap_preflight")(spark, sfDir)
        .collect()(0)
      println(s"overlap-preflight: $report")
      val diagnosis = report.getAs[String]("diagnosis")
      if (diagnosis != "ok")
        println(s"WARN overlap-preflight: $diagnosis " +
          s"(worst=${report.getAs[String]("worst_element")}, " +
          s"share_bp=${report.getAs[Long]("max_share_bp")})")
      spark.stop()
      return
    }
    // --hamming-preflight: the same discipline for the block equi-join
    // family (SkewTools.hammingJoinPreflight over d25's fingerprint
    // relation) — a skewed block value prints as a diagnosed WARN.
    if (args.contains("--hamming-preflight")) {
      val report = SparkEntry.queries("d41_hamming_preflight")(spark, sfDir)
        .collect()(0)
      println(s"hamming-preflight: $report")
      val diagnosis = report.getAs[String]("diagnosis")
      if (diagnosis != "ok")
        println(s"WARN hamming-preflight: $diagnosis " +
          s"(worst_block=(${report.getAs[Long]("worst_block_index")}, " +
          s"${report.getAs[Long]("worst_block_value")}), " +
          s"share_bp=${report.getAs[Long]("max_share_bp")})")
      spark.stop()
      return
    }
    names.foreach { n =>
      println(s"\n===== $n =====")
      val df = SparkEntry.queries(n)(spark, sfDir)
      if (!timeOnly && !executed) df.explain("formatted")
      val t0 = System.nanoTime()
      // --executed must run THIS df's own plan (count() builds a separate
      // aggregate tree, leaving df's AdaptiveSparkPlan un-finalized — the
      // print would show the pre-AQE guess, not the real stages); iterate
      // rather than collect so a large probe result never sits whole on
      // the driver
      val rows =
        if (executed) {
          var n = 0L
          val it = df.toLocalIterator()
          while (it.hasNext) { it.next(); n += 1 }
          n
        } else df.count()
      println(f"[$n] $rows rows in ${(System.nanoTime() - t0) / 1e9}%.3f s")
      if (executed) println(df.queryExecution.executedPlan.toString)
    }
    spark.stop()
  }
}
