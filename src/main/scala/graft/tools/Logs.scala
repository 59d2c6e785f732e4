package graft.tools

/** Targeted log hygiene for the harness mains. */
object Logs {

  /** Mute WindowExec's "No Partition Defined ... serious performance
    * degradation" warning. In this codebase the warning carries no
    * signal: Spark 4's EliminateWindowPartitions canonicalizes every
    * constant-partition window to an empty partitionSpec, so the
    * engine's bounded prefix-sum windows (≤ dozens-to-hundreds of
    * bucket/bin rows by construction) are indistinguishable to the
    * executor from a genuine global-sort hazard — the distinction is
    * enforced instead by PlanLintSpec's allowlist gate, which fails
    * any unpartitioned window lacking a written boundedness argument.
    * With that gate in place, the remaining per-query warnings only
    * pollute the ~2000-char log tail the driver keeps of a bench run.
    * Scoped to the window package; everything else still warns.
    * Round 18 closes the gate's blind spot: the maintenance verbs'
    * INTERNAL actions (never returned as catalog plans) are swept by
    * Round18OpsSpec's QueryExecutionListener test, which fails on any
    * executed unpartitioned window inside a cycle — so a new offender
    * on either surface breaks the build, mute or no mute. */
  def muteReviewedWindowWarning(): Unit =
    try org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.execution.window",
      org.apache.logging.log4j.Level.ERROR)
    catch { case _: Throwable => () } // non-log4j2 backends: keep the noise
}
