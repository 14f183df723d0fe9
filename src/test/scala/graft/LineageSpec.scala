package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._

/** Pins [[Lineage.cut]]'s contract in both modes: the returned frame's
  * plan is an RDD-scan boundary (the O(rounds) plan growth of the
  * iterative operators is truncated), and the reliable mode actually
  * routes through the configured checkpoint directory.
  */
class LineageSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private def planOf(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.optimizedPlan.toString

  test("local mode truncates the plan to an RDD scan") {
    import spark.implicits._
    spark.conf.unset(Lineage.ConfKey)
    val df = Lineage.cut(
      Tables(spark, dir, "documents").groupBy($"source").count())
    assert(planOf(df).contains("LogicalRDD"),
      s"plan not truncated:\n${planOf(df)}")
    assert(df.count() > 0)
  }

  test("reliable mode truncates the plan AND writes the checkpoint dir") {
    import spark.implicits._
    val ckpt = Files.createTempDirectory("graft_ckpt").toString
    spark.conf.set(Lineage.ConfKey, ckpt)
    try {
      val df = Lineage.cut(
        Tables(spark, dir, "documents").groupBy($"source").count())
      assert(planOf(df).contains("LogicalRDD"),
        s"plan not truncated:\n${planOf(df)}")
      assert(df.count() > 0) // lazy cut materializes here
      val sc = spark.sparkContext
      assert(sc.getCheckpointDir.exists(_.contains(
        new java.io.File(ckpt).getName)),
        s"checkpoint dir not installed: ${sc.getCheckpointDir}")
      // the reliable artifact is on disk, not just in block-manager RAM
      def files(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(files) else Seq(f)
      assert(files(new java.io.File(ckpt)).nonEmpty,
        "no checkpoint files written")
    } finally spark.conf.unset(Lineage.ConfKey)
  }

  test("a sibling dir sharing a string prefix is NOT the same root") {
    import spark.implicits._
    // want=/x/ckpt vs installed=/x/ckpt2/<uuid>: a startsWith match
    // would keep checkpointing into ckpt2; the boundary match must
    // re-install ckpt.
    val parent = Files.createTempDirectory("graft_ckpt_prefix").toString
    val sib = new java.io.File(parent, "ckpt2"); sib.mkdirs()
    val want = new java.io.File(parent, "ckpt"); want.mkdirs()
    spark.conf.set(Lineage.ConfKey, sib.toString)
    try {
      val base = Tables(spark, dir, "documents").groupBy($"source").count()
      Lineage.cut(base).count()
      spark.conf.set(Lineage.ConfKey, want.toString)
      Lineage.cut(base).count()
      val cur = spark.sparkContext.getCheckpointDir.getOrElse("")
      assert(cur.stripPrefix("file:").startsWith(want.toString),
        s"checkpoint root not re-installed past the prefix sibling: $cur")
    } finally spark.conf.unset(Lineage.ConfKey)
  }

  test("d07 still converges under reliable checkpointing") {
    val ckpt = Files.createTempDirectory("graft_ckpt_d07").toString
    spark.conf.set(Lineage.ConfKey, ckpt)
    try {
      val out = operators.Dedup.queries("d07_dedup_clusters")(spark, dir)
      assert(out.count() > 0)
    } finally spark.conf.unset(Lineage.ConfKey)
  }
}
