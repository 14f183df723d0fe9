package graft

import org.apache.spark.sql.functions._

import graft.operators.{Decoder, MediaMeta, Multimodal}

/** Round-12 verdict ask #6: the multimodal decode seam. A deployment
  * with real codecs must be able to swap its own [[Decoder]] into
  * m02/m03/m06/m07 with ZERO plan changes — these tests inject a
  * custom decoder and prove it flows through metadata, feature
  * extraction, resize geometry, and perceptual-hash dedup end to end,
  * while the default decoder keeps the registered (oracle-verified)
  * behavior bit for bit.
  */
class DecoderSeamSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** A recognizable fake codec: geometry from the byte LENGTH, digest
    * tagged, and a luma grid that depends only on length — so two
    * same-length blobs with different content collapse under it (the
    * default decoder would never merge them).
    */
  private object LengthDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta =
      MediaMeta(id, bytes.length, 320, 200, 7, s"len:${bytes.length}")
    def lumaGrid(bytes: Array[Byte]): Option[Array[Array[Int]]] =
      Some(Array.tabulate(8, 8)((r, c) => (r * 8 + c + bytes.length) % 256))
  }

  private def blobs = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("blob"))
  }

  test("m02: a custom decoder's geometry and digest reach the output rows") {
    import spark.implicits._
    val out = Multimodal.mediaMeta(blobs, LengthDecoder)
    assert(out.filter($"width" =!= 320 || $"height" =!= 200 ||
      $"n_frames" =!= 7).count() == 0)
    val r = out.orderBy($"doc_id").limit(1)
      .join(blobs.orderBy($"doc_id").limit(1), "doc_id").head()
    assert(r.getAs[String]("digest") ==
      s"len:${r.getAs[Array[Byte]]("blob").length}")
  }

  test("m03: the embedding stub's entropy follows the injected decoder") {
    import spark.implicits._
    val custom = Multimodal.featureExtract(blobs, LengthDecoder)
    val default_ = Multimodal.featureExtract(blobs)
    // same plan/schema, different content: the digest chain now seeds
    // from the custom decoder's content digest
    assert(custom.schema == default_.schema)
    assert(custom.count() == default_.count())
    val joined = custom.as("c")
      .join(default_.as("d"), $"c.doc_id" === $"d.doc_id")
      .filter($"c.emb_digest" === $"d.emb_digest")
    assert(joined.count() == 0,
      "custom decoder did not reach the embedding digest chain")
    // and two same-length docs embed IDENTICALLY under LengthDecoder
    val lens = blobs.select($"doc_id", octet_length($"blob").as("n"))
    val samePair = lens.as("a").join(lens.as("b"),
      $"a.n" === $"b.n" && $"a.doc_id" < $"b.doc_id").limit(1)
      .select($"a.doc_id".as("ida"), $"b.doc_id".as("idb")).head()
    val digs = custom.filter($"doc_id".isin(samePair.getLong(0), samePair.getLong(1)))
      .select($"emb_digest").collect().map(_.getString(0))
    assert(digs.toSet.size == 1, "same-length blobs must embed identically")
  }

  test("m06: resize geometry letterboxes the custom decoder's dimensions") {
    import spark.implicits._
    val out = Multimodal.resizeGeometry(blobs, LengthDecoder)
    // 320x200 fits 224x224 at scale 0.7 -> 224x140, pad_y = 42
    assert(out.filter($"src_w" =!= 320 || $"out_w" =!= 224 ||
      $"out_h" =!= 140 || $"pad_y" =!= 42).count() == 0)
  }

  test("m07: phash dedup groups follow the custom decoder's grids end to end") {
    import spark.implicits._
    // two novel blobs, same length, different content: the default
    // decoder separates them; LengthDecoder's grids (length-keyed)
    // collapse them into one dedup group
    val injected = Seq(
      (9000001L, "aaaa bbbb cccc"), (9000003L, "dddd eeee ffff"))
      .toDF("doc_id", "text")
      .select($"doc_id", $"text".cast("binary").as("blob"))
    val custom = Multimodal.phashDedup(injected, LengthDecoder).collect()
    assert(custom.forall(_.getAs[Long]("grp_size") == 2L),
      "same-length blobs must share a phash group under LengthDecoder")
    assert(custom.count(_.getAs[Boolean]("keep")) == 1)
    val default_ = Multimodal.phashDedup(injected).collect()
    assert(default_.forall(_.getAs[Long]("grp_size") == 1L),
      "default decoder must keep distinct-content blobs apart")
  }

  test("the default decoder is the registered m02/m03 behavior") {
    import spark.implicits._
    val viaSeam = Multimodal.mediaMeta(blobs).orderBy($"doc_id")
    val registered = Multimodal.queries("m02_decode_stub")(spark, dir)
    assert(viaSeam.exceptAll(registered).isEmpty &&
      registered.exceptAll(viaSeam).isEmpty)
    val m03Seam = Multimodal.featureExtract(blobs).orderBy($"doc_id")
    val m03Reg = Multimodal.queries("m03_feature_extract")(spark, dir)
    assert(m03Seam.exceptAll(m03Reg).isEmpty && m03Reg.exceptAll(m03Seam).isEmpty)
  }
}
