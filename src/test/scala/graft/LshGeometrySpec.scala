package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, Similarity}

/** Pins the auto-sized LSH geometry (round-13 verdict ask #1): the
  * integer sizing rule itself, the probe-mask enumeration it feeds,
  * and — on a corpus with REAL near-duplicates — that widening the
  * geometry keeps every pair the narrow geometry confirmed at τ.
  */
class LshGeometrySpec extends SparkSpec {

  test("nPlanesFor is the exact integer ceil(log2(N/occupancy)) with floor and cap") {
    // floor: every committed fixture stays at 8 planes, so small-scale
    // oracle results are byte-identical to the old fixed geometry
    assert(Similarity.nPlanesFor(0L) == 8)
    assert(Similarity.nPlanesFor(500L) == 8)
    assert(Similarity.nPlanesFor(2000L) == 8)
    assert(Similarity.nPlanesFor(20000L) == 8)
    assert(Similarity.nPlanesFor(100L << 8) == 8) // boundary: 25600 fits
    assert(Similarity.nPlanesFor((100L << 8) + 1) == 9) // first overflow
    // the sf10 probe corpus: 200k vectors -> 11 planes (2048 cells)
    assert(Similarity.nPlanesFor(200000L) == 11)
    // the sfbig probe corpus: 2M vectors -> 15 planes
    assert(Similarity.nPlanesFor(2000000L) == 15)
    // cap: 24 planes carries ~1.7B vectors at occupancy 100
    assert(Similarity.nPlanesFor(100L << 24) == 24)
    assert(Similarity.nPlanesFor(Long.MaxValue) == 24)
    // monotone in N (no j where a bigger corpus gets fewer planes)
    val ns = Seq(1L, 100L, 10000L, 1000000L, 100000000L, 10000000000L)
    assert(ns.map(Similarity.nPlanesFor) == ns.map(Similarity.nPlanesFor).sorted)
  }

  test("probesAt equals |probeMasks| and masks are distinct with weight <= h") {
    for (np <- Seq(8, 11, 24); h <- 0 to 3) {
      val masks = Similarity.probeMasks(np, h)
      assert(masks.distinct.size == masks.size, s"dup masks at np=$np h=$h")
      assert(masks.forall(m => Integer.bitCount(m) <= h && m < (1 << np)))
      assert(Similarity.probesAt(h, np) == masks.size,
        s"binomial sum != enumeration at np=$np h=$h")
    }
    // spot values: 1, 1+11, 1+11+55, 1+11+55+165
    assert(Seq(0, 1, 2, 3).map(Similarity.probesAt(_, 11)) == Seq(1, 12, 67, 232))
  }

  /** A corpus of deterministic pseudo-random unit-ish vectors where
    * each of the first `nDup` base vectors carries a near-identical
    * twin (one coordinate nudged by 1e-3 — cosine > 0.999).
    */
  private def nearDupFixture(nBase: Int, nDup: Int): String = {
    import spark.implicits._
    val dir = java.nio.file.Files.createTempDirectory("graft-lshgeo").toString
    def vec(seed: Int): Array[Float] = {
      val r = new scala.util.Random(seed * 7919 + 13)
      Array.fill(Similarity.Dims)(r.nextGaussian().toFloat)
    }
    val base = (0 until nBase).map(i => (i.toLong, vec(i), s"l${i % 4}"))
    val dups = (0 until nDup).map { i =>
      val v = vec(i)
      v(i % Similarity.Dims) += 1e-3f
      ((1000 + i).toLong, v, s"l${i % 4}")
    }
    (base ++ dups).toDF("vec_id", "embedding", "label")
      .write.mode("overwrite").parquet(s"$dir/embeddings.parquet")
    dir
  }

  test("widening the geometry keeps every pair the narrow geometry confirmed at tau") {
    val dir = nearDupFixture(nBase = 120, nDup = 40)
    def pairs(np: Int): Set[(Long, Long)] =
      Dedup.d05At(spark, dir, np).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
    val narrow = pairs(8)
    val wide = pairs(12)
    val planted = (0 until 40).map(i => (i.toLong, (1000 + i).toLong)).toSet
    // the narrow geometry must already confirm every planted twin...
    assert(planted.subsetOf(narrow), s"narrow missed ${planted -- narrow}")
    // ...and widening to 12 planes (4096 cells) must not drop any
    // confirmed pair: near-identical vectors agree on (almost) every
    // extra sign bit, so they stay within Hamming <= 1 of each other
    assert(narrow.subsetOf(wide),
      s"widening dropped confirmed pairs: ${narrow -- wide}")
  }

  test("s17 geometry audit row is internally consistent at the fixture scale") {
    val row = Similarity.s17(spark, "/root/testdata/sf0.001").collect().head
    assert(row.getAs[Long]("n_vectors") == 500L)
    assert(row.getAs[Int]("n_planes") == 8)
    assert(row.getAs[Long]("n_cells") == 256L)
    assert(row.getAs[Long]("n_buckets") <= 256L)
    assert(row.getAs[Long]("max_occupancy") >=
      math.ceil(500.0 / row.getAs[Long]("n_buckets")).toLong)
    val mean = row.getAs[Double]("mean_occupancy")
    assert(math.abs(mean - 500.0 / row.getAs[Long]("n_buckets")) < 1e-4)
  }

  test("auto-sized operators at a fixture dir still match the fixed-8 geometry") {
    // nPlanesOf(fixture) == 8 => d05 via the auto path is byte-equal
    // to the explicit np=8 form (the r13-and-earlier committed shape)
    val dir = "/root/testdata/sf0.001"
    assert(Similarity.nPlanesOf(spark, dir) == 8)
    val auto = Dedup.queries("d05_dedup_embedding")(spark, dir).collect()
    val fixed = Dedup.d05At(spark, dir, 8).collect()
    assert(auto.toSeq == fixed.toSeq)
  }
}
