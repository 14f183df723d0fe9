package graft

import org.apache.spark.sql.functions._

import graft.operators.Similarity
import graft.operators.Similarity.VecIndex

/** Pins the persisted ANN index's contract: load-probe parity with the
  * in-memory build, geometry PINNED across merge (the versioning
  * hazard auto-sizing introduces), and the needsReplane tripwire.
  */
class VecIndexSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("probe from a parquet-reloaded index reproduces the in-memory probe") {
    import spark.implicits._
    val emb = Tables(spark, dir, "embeddings")
    val base = emb.filter($"vec_id" % 2 === 0)
    val delta = emb.filter($"vec_id" % 2 === 1).select($"vec_id", $"embedding")
    val mem = VecIndex.build(base)
    val tmp = java.nio.file.Files.createTempDirectory("vecidx").toString
    mem.write(tmp)
    val loaded = VecIndex.load(spark, tmp)
    assert(loaded.nPlanes == mem.nPlanes)
    val a = mem.probe(delta).collect().toSeq
    val b = loaded.probe(delta).collect().toSeq
    assert(a == b, "reloaded index probe diverges from in-memory")
    assert(a.nonEmpty)
    // and the registered s18 is exactly this composition
    val s18 = Similarity.s18(spark, dir).collect().toSeq
    assert(s18 == a, "s18 is not the build+probe composition")
  }

  test("geometry stays pinned across merge even when the corpus outgrows it") {
    import spark.implicits._
    // build at 300 rows -> auto np = 8; merge 52k synthetic rows so a
    // FRESH build would size to 10 planes — the index must keep 8
    val emb = Tables(spark, dir, "embeddings")
    val idx0 = VecIndex.build(emb.filter($"vec_id" < 300))
    assert(idx0.nPlanes == 8)
    assert(!idx0.needsReplane)
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed)
      Array.fill(Similarity.Dims)(r.nextGaussian().toFloat)
    }
    val big = (0 until 52000).map(i => ((10000 + i).toLong, vec(i)))
      .toDF("vec_id", "embedding")
    val merged = idx0.merge(big)
    assert(merged.nPlanes == 8, "merge must NOT re-derive the geometry")
    assert(Similarity.nPlanesFor(300L + 52000L) > 8,
      "fixture must actually outgrow the pinned geometry")
    // every merged bucket still lives in the pinned 8-bit key space
    assert(merged.buckets.agg(max($"bucket")).head.getInt(0) < 256)
    // ...and the tripwire fires: 52.3k rows > 2 * 100 * 256
    assert(merged.needsReplane, "outgrown index must flag needsReplane")
    // a probe against the merged index still matches: its query side
    // buckets under the INDEX np, so planted exact twins are found
    val q = Seq((90000L, vec(7)), (90001L, vec(13)))
      .toDF("vec_id", "embedding")
    val hits = merged.probe(q, maxHamming = 0, k = 1).collect()
    assert(hits.length == 2)
    // vec(7)/vec(13) exist verbatim in the merged rows (seeds 7, 13)
    assert(hits.forall(_.getAs[Double]("cos") == 1.0),
      "exact twin not found — probe bucketed under the wrong geometry")
  }

  test("write carries the geometry row, not just bucket rows") {
    import spark.implicits._
    val tmp = java.nio.file.Files.createTempDirectory("vecidxg").toString
    VecIndex.build(Tables(spark, dir, "embeddings")).write(tmp)
    val g = spark.read.parquet(s"$tmp/geometry.parquet").collect().head
    assert(g.getAs[Int]("n_planes") == 8)
    assert(g.getAs[Long]("target_occupancy") == 100L)
  }
}
