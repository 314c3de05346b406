package graft

/** GraftSession.build's session-reuse contract: getOrCreate silently
  * returns an existing session with every builder conf ignored, so the
  * runtime-settable confs that change SEMANTIC behavior (the RocksDB
  * state-store provider) must be applied to the reused session instead
  * of silently dropped — a caller that requested RocksDB state would
  * otherwise run stateful streams on the in-heap provider (an
  * executor-OOM at 100 TB-scale state) while believing otherwise.
  */
class GraftSessionSpec extends SparkSuite {

  test("build(rocksdbStateStore = true) against an EXISTING session " +
      "applies the RocksDB confs at runtime instead of silently " +
      "dropping them with the rest of the ignored builder config") {
    val sess = spark // force the shared session into existence first
    val keys = GraftSession.rocksdbConfs.keys.toSeq
    val prior = keys.map(k => k -> sess.conf.getOption(k)).toMap
    try {
      val reused = GraftSession.build(rocksdbStateStore = true)
      assert(reused eq sess, "getOrCreate must have reused the session")
      assert(reused.conf.get("spark.sql.streaming.stateStore.providerClass")
        == GraftSession.RocksDbProvider,
        "the requested provider must be applied to the reused session")
      GraftSession.rocksdbConfs.foreach { case (k, v) =>
        assert(reused.conf.get(k) == v, s"conf $k not applied")
      }
    } finally prior.foreach {
      case (k, Some(v)) => sess.conf.set(k, v)
      case (k, None)    => sess.conf.unset(k)
    }
  }
}
