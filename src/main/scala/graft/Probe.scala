package graft

import org.apache.spark.scheduler.{SparkListener, SparkListenerStageCompleted}

/** Spark-only scale probe (round-13 verdict ask #3): runs named
  * registry keys against a (possibly oracle-less) corpus dir and
  * prints one JSON line per key with wall seconds, result rows, and
  * the TOTAL + PEAK-stage shuffle-write bytes — the numbers PLANS.md's
  * growth curve tracks across sf1 → sf10 → sfbig. The action is a
  * count(), which executes the full plan (every probe key aggregates
  * or joins — nothing prunes to a metadata count) without parquet
  * materialization cost.
  *
  * Usage: runMain graft.Probe <sfDir> <key1,key2,...>
  */
object Probe {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, keyCsv) = args
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = GraftSession.build(s"local[$cpus]", cpus.toInt)
    val shuffle = new SparkListener {
      @volatile var total = 0L
      @volatile var peakStage = 0L
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = {
        val w = sc.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten
        total += w
        if (w > peakStage) peakStage = w
      }
      def reset(): Unit = { total = 0L; peakStage = 0L }
    }
    spark.sparkContext.addSparkListener(shuffle)
    keyCsv.split(",").map(_.trim).filter(_.nonEmpty).foreach { key =>
      shuffle.reset()
      val t0 = System.nanoTime()
      val rows =
        try SparkEntry.queries(key)(spark, sfDir).count()
        catch { case e: Throwable =>
          System.err.println(s"[probe] $key failed: ${e.getMessage}")
          -1L
        }
      val sec = (System.nanoTime() - t0) / 1e9
      // listener events drain asynchronously; settle before reading
      // (listenerBus is private[spark] — a bounded sleep is enough for
      // a probe tool: stages of a finished job post within millis)
      Thread.sleep(2000)
      println(f"""{"key":"$key","sec":$sec%.1f,"rows":$rows,""" +
        s""""shuffle_write_bytes":${shuffle.total},""" +
        s""""peak_stage_shuffle_bytes":${shuffle.peakStage}}""")
      System.out.flush()
    }
    spark.stop()
  }
}
