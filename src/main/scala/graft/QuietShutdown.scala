package graft

import org.apache.spark.sql.SparkSession

/** Deterministic, quiet Spark teardown for the artifact-emitting mains
  * (Bench / Slope / Verify).
  *
  * Why this exists (VERDICT r10 wrong-item 1): with streaming entries in
  * the registry, `spark.stop()` tears down the RpcEnv while the state-store
  * MAINTENANCE pool is still alive; its next tick then fails with a
  * multi-KB "Could not unload state store provider … RpcEnv already
  * stopped" stack trace on stderr/stdout — and since the driver wrapper
  * keeps only the LAST 2000 chars of stdout, any result JSON printed
  * BEFORE the stop scrolls out of the tail window (`BENCH_r10.json` came
  * back `parsed: null`). The fix is twofold: (a) shut the streaming
  * machinery down in the right order — active queries first, then the
  * StateStore maintenance pool + providers, then the session — so nothing
  * asynchronously logs after stop; (b) the mains print their result lines
  * AFTER this returns, so even an unexpected straggler cannot outrun them.
  */
object QuietShutdown {
  def apply(spark: SparkSession): Unit = {
    // Stop any still-active streaming queries (entries normally drain
    // AvailableNow to completion; this is the defensive sweep).
    try spark.streams.active.foreach(q => try q.stop() catch { case _: Throwable => () })
    catch { case _: Throwable => () }
    // The maintenance-pool death rattle is logged at ERROR from the
    // state-store package even on a CLEAN shutdown race; silence that
    // package for teardown (the run itself already completed).
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.streaming.state",
      org.apache.logging.log4j.Level.OFF)
    catch { case _: Throwable => () }
    // StateStore.stop() kills the maintenance task pool and unloads all
    // providers WHILE the RpcEnv is still up — the coordinator
    // deactivation RPCs succeed instead of stack-tracing. The object is
    // Scala-private to spark packages; bytecode-public, so call
    // reflectively rather than planting a shim in Spark's namespace.
    try {
      val cls = Class.forName(
        "org.apache.spark.sql.execution.streaming.state.StateStore$")
      cls.getMethod("stop").invoke(cls.getField("MODULE$").get(null))
    } catch { case _: Throwable => () }
    spark.stop()
  }
}
