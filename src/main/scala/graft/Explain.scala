package graft

/** Plan auditor: prints the formatted physical plan of each declared
  * query and flags the scale hazards SURVEY.md §5 bans — a fact-side
  * shuffle where a broadcast was intended, a scan without pushed
  * filters where a selective predicate exists, a global sort where
  * top-k should heap. Run: `sbt "runMain graft.Explain [name...]"`.
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    val spark = GraftSession.build()
    val names = if (args.nonEmpty) args.toSeq else SparkEntry.queries.keys.toSeq.sorted
    names.foreach { n =>
      val df = SparkEntry.queries(n)(spark, dir)
      val qe = df.queryExecution
      val plan = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
      // Under AQE the unexecuted plan is an AdaptiveSparkPlanExec whose
      // string carries no codegen "*(N)" markers (stages collapse at
      // execution) — materialize THIS QueryExecution (a noop df.write
      // would plan a fresh one and leave qe unfinalized), then read the
      // FINAL plan, the honest source for the join-shape flags too.
      qe.toRdd.count()
      // finalized AQE prints "== Final Plan ==" AND "== Initial Plan =="
      // sections — audit only the final one (the initial section still
      // shows the pre-AQE SortMergeJoins that AQE converted away)
      val executed = qe.executedPlan.toString.split("== Initial Plan ==").head
      println(s"\n======== $n ========")
      println(plan)
      println("---- final (post-AQE) plan ----")
      println(executed)
      val checks = Seq(
        "BroadcastHashJoin" -> executed.contains("BroadcastHashJoin"),
        "TakeOrderedAndProject" -> executed.contains("TakeOrderedAndProject"),
        "PushedFilters" -> "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
        "WholeStageCodegen" -> executed.contains("*("),
        "SortMergeJoin" -> executed.contains("SortMergeJoin"),
        "CartesianProduct" -> executed.contains("CartesianProduct"))
      println(s"[audit] $n: " + checks.collect { case (k, true) => k }.mkString(", "))
    }
    spark.stop()
  }
}
