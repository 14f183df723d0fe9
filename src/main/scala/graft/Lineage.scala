package graft

import org.apache.spark.sql.DataFrame

/** Lineage truncation for the iterative operators (d07 connected
  * components, e59 pointer doubling, s08's greedy chain). Each of
  * their driver-synced rounds doubles the logical plan unless the
  * round result is cut to a materialized RDD boundary.
  *
  * Two modes, chosen by configuration:
  *  - `spark.graft.checkpointDir` (or SPARK_GRAFT_CHECKPOINT_DIR in
  *    the environment) set → RELIABLE `checkpoint()` into that
  *    directory: survives executor loss, the right call for real
  *    multi-hour 100 TB jobs where losing one executor mid-iteration
  *    would otherwise recompute the whole chain (there is no lineage
  *    left to recompute FROM — a lost localCheckpoint block is fatal).
  *  - unset → executor-local `localCheckpoint`: no distributed-FS
  *    round trip, the fast default for tests and short jobs.
  *
  * Both modes replace the plan subtree with an RDD scan, so the
  * O(rounds)-deep plan growth is truncated identically; LineageSpec
  * pins that property for each mode.
  */
object Lineage {
  final val ConfKey = "spark.graft.checkpointDir"

  def cut(df: DataFrame): DataFrame = {
    val s = df.sparkSession
    val dir = s.conf.getOption(ConfKey)
      .orElse(sys.env.get("SPARK_GRAFT_CHECKPOINT_DIR"))
      .filter(_.nonEmpty)
    dir match {
      case Some(d) =>
        val sc = s.sparkContext
        // setCheckpointDir appends a random UUID subdir under d, so
        // "already configured" = the current dir lives under d. A bare
        // isEmpty check would silently ignore a LATER change to the
        // conf key in the same context and keep checkpointing into the
        // first-installed directory.
        def norm(p: String) =
          p.stripPrefix("file:").replaceAll("/+$", "")
        val want = norm(new java.io.File(d).getAbsolutePath)
        // Match on a path boundary: a sibling dir sharing a string
        // prefix (want=/x/ckpt vs current=/x/ckpt2/<uuid>) is NOT the
        // same root and must trigger a re-install.
        val sameRoot = sc.getCheckpointDir.exists { c =>
          val n = norm(c)
          n == want || n.startsWith(want + "/")
        }
        if (!sameRoot) sc.setCheckpointDir(d)
        // lazy like the localCheckpoint path: materializes on first use,
        // so an iteration that short-circuits never pays the write
        df.checkpoint(eager = false)
      case None =>
        df.localCheckpoint(eager = false)
    }
  }
}
