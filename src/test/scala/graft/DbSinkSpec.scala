package graft

import graft.sinks.DbSink
import org.apache.spark.sql.SaveMode

class DbSinkSpec extends SparkSpec {

  test("embedded-Derby JDBC round-trip: real write path, batched, append") {
    import spark.implicits._
    // keep derby.log out of the repo tree
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("derby").toString)
    val url = "jdbc:derby:memory:dbsink;create=true"
    val df = (1 to 257)
      .map(i => (i.toLong, s"v$i", Seq(i, i + 1), Array(i.toByte)))
      .toDF("id", "v", "arr", "blob").repartition(4)
    // batchSize 16 over 257 rows across capped partitions: the writer
    // must flush multiple executeBatch() rounds per connection
    DbSink.writeJdbc(DbSink.jdbcSafe(df),
      DbSink.JdbcConf(url = url, table = "t1", batchSize = 16, numPartitions = 2),
      SaveMode.Overwrite)
    val props = new java.util.Properties()
    val back = spark.read.jdbc(url, "t1", props)
    assert(back.count() == 257)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) ==
      257L * 258 / 2)
    val r = back.filter("id = 3").head()
    assert(r.getAs[String]("v") == "v3")
    // arrays degrade to comma-joined TEXT — the reference's behavior
    assert(r.getAs[String]("arr") == "3,4")
    assert(r.getAs[Array[Byte]]("blob").toSeq == Seq(3.toByte))
    // default Append mode accumulates like buffered insert_many
    DbSink.writeJdbc(DbSink.jdbcSafe(df.filter($"id" <= 10)),
      DbSink.JdbcConf(url = url, table = "t1", batchSize = 3, numPartitions = 2))
    assert(spark.read.jdbc(url, "t1", props).count() == 267)
    // Overwrite drops and recreates
    DbSink.writeJdbc(DbSink.jdbcSafe(df.filter($"id" <= 5)),
      DbSink.JdbcConf(url = url, table = "t1", batchSize = 2, numPartitions = 1),
      SaveMode.Overwrite)
    assert(spark.read.jdbc(url, "t1", props).count() == 5)
  }

  test("partitioned parallel JDBC read: the consumer path at cohort scale") {
    import spark.implicits._
    System.setProperty("derby.system.home",
      java.nio.file.Files.createTempDirectory("derby").toString)
    val url = "jdbc:derby:memory:dbread;create=true"
    val df = (1 to 1000).map(i => (i.toLong, s"v$i")).toDF("id", "v")
    DbSink.writeJdbc(df,
      DbSink.JdbcConf(url = url, table = "t2", numPartitions = 2),
      SaveMode.Overwrite)
    // a GEMINI-style consumer reads the table back in parallel: range
    // predicates on the partition column split the scan into 4
    // independent connections — the read twin of the bounded writer
    val props = new java.util.Properties()
    val back = spark.read.jdbc(url, "t2",
      columnName = "id", lowerBound = 1L, upperBound = 1001L,
      numPartitions = 4, connectionProperties = props)
    assert(back.rdd.getNumPartitions == 4)
    assert(back.count() == 1000)
    assert(back.agg(org.apache.spark.sql.functions.sum("id")).head.getLong(0) ==
      1000L * 1001 / 2)
  }

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
