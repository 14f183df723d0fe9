package graft

import java.nio.file.Files
import java.sql.Timestamp

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

import graft.sinks.DbSink
import graft.streaming.{Event, Sessionize}

/** Streaming → bulk-load path: closed sessions land in the DB sink via
  * foreachBatch (the micro-batch hook a JDBC target would use — same
  * bounded-parallelism writer as the batch path).
  */
class StreamingSinkSpec extends SparkSpec {

  private def ts(minutes: Long) = new Timestamp(1700000400000L + minutes * 60000L)

  test("sessions stream into the sink via foreachBatch") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = Files.createTempDirectory("sessions-sink").toString + "/sessions"
    val input = MemoryStream[Event]
    val q = Sessionize.sessions(input.toDS().withWatermark("ts", "1 minute"))
      .writeStream
      .outputMode("append")
      .foreachBatch { (batch: org.apache.spark.sql.Dataset[graft.streaming.Session], _: Long) =>
        if (!batch.isEmpty) DbSink.writeParquet(batch.toDF(), out, numPartitions = 1)
      }
      .start()
    try {
      input.addData(Event(1, ts(0), 1, "view"), Event(2, ts(5), 1, "view"))
      q.processAllAvailable()
      input.addData(Event(3, ts(240), 2, "view"))
      q.processAllAvailable()
      input.addData(Event(4, ts(241), 2, "view"))
      q.processAllAvailable()
      val written = spark.read.parquet(out)
      assert(written.columns.toSet ==
        Set("user_id", "session_id", "n_events", "t_start", "t_end"))
      val u1 = written.filter("user_id = 1").collect()
      assert(u1.length == 1 && u1.head.getAs[Long]("n_events") == 2L)
    } finally q.stop()
  }
}
