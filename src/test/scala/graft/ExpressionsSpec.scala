package graft

import org.apache.spark.sql.functions._

import graft.functions.GraftFunctions

class ExpressionsSpec extends SparkSpec {

  test("registered functions run inside SQL and round-trip") {
    GraftFunctions.register(spark)
    val row = spark.sql(
      """SELECT zlib_unpack(zlib_pack(array(1, 2, 3, -4))) AS rt,
        |       simhash64(array('a', 'b')) AS sh,
        |       rolling_minhash('hello world, long enough input') AS rh
        |""".stripMargin).collect()(0)
    assert(row.getAs[scala.collection.Seq[Int]]("rt").toSeq == Seq(1, 2, 3, -4))
    assert(row.getAs[Long]("sh") != 0L)
    assert(row.getAs[Long]("rh") != 0L)
  }

  test("expressions survive codegen over a real column") {
    GraftFunctions.register(spark)
    import spark.implicits._
    val df = (1 to 100).map(i => (i.toLong, s"document number $i with some shared text"))
      .toDF("id", "text")
      .selectExpr("id", "simhash64(split(text, ' ')) AS sh",
        "zlib_pack(array(CAST(id AS INT))) AS blob", "rolling_minhash(text) AS fp")
    assert(df.count() == 100)
    assert(df.select("sh").distinct().count() > 1)
    val unpacked = df.selectExpr("zlib_unpack(blob)[0] AS back", "id").collect()
    assert(unpacked.forall(r => r.getAs[Int]("back").toLong == r.getAs[Long]("id")))
  }
}
