package graft

import graft.sinks.DbSink

class DbSinkSpec extends SparkSpec {

  test("parquet fallback bounds writer parallelism and round-trips") {
    import spark.implicits._
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
      .repartition(16)
    val out = java.nio.file.Files.createTempDirectory("dbsink").toString + "/t"
    DbSink.writeParquet(df, out, numPartitions = 3)
    val files = new java.io.File(out).listFiles().count(_.getName.endsWith(".parquet"))
    assert(files <= 3) // insert_many-style bounded connection count
    val back = spark.read.parquet(out)
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) == 500500L)
  }

  test("jdbc conf carries the reference's bulk-load knobs") {
    val c = DbSink.JdbcConf(url = "jdbc:postgresql://h/db", table = "variants",
      batchSize = 5000, numPartitions = 4, truncate = true)
    assert(c.batchSize == 5000 && c.numPartitions == 4 && c.truncate)
    assert(c.isolationLevel == "READ_COMMITTED")
  }

  test("extensions-installed functions resolve in a fresh session") {
    // GraftSession wires GraftExtensions; the SQL names must resolve
    // without any explicit register() call
    val row = spark.sql("SELECT simhash64(array('x')) AS sh").head()
    assert(row.getLong(0) != 0L)
  }
}
