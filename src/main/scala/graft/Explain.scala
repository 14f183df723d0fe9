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
      val qe = SparkEntry.queries(n)(spark, dir).queryExecution
      val plan = qe.explainString(org.apache.spark.sql.execution.FormattedMode)
      // FormattedMode annotates codegen stages as "(N)" ids but never
      // prints the literal operator name — check the simple plan string,
      // where codegen'd operators carry the "*(N)" prefix
      val codegen = qe.executedPlan.toString.contains("*(")
      println(s"\n======== $n ========")
      println(plan)
      val checks = Seq(
        "BroadcastHashJoin" -> plan.contains("BroadcastHashJoin"),
        "TakeOrderedAndProject" -> plan.contains("TakeOrderedAndProject"),
        "PushedFilters" -> "PushedFilters: \\[[^\\]]".r.findFirstIn(plan).isDefined,
        "WholeStageCodegen" -> codegen,
        "SortMergeJoin" -> plan.contains("SortMergeJoin"),
        "CartesianProduct" -> plan.contains("CartesianProduct"))
      println(s"[audit] $n: " + checks.collect { case (k, true) => k }.mkString(", "))
    }
    spark.stop()
  }
}
