package graft

/** Semantic cross-checks for the round-5 operators: the q14 as-of join
  * and st04 interval join against brute-force Scala recomputations, t12
  * packing invariants (continuity, offsets, totals), m04 frame-sample
  * invariants (stride coverage, determinism).
  */
class EventJoinSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  /** The driver's parquet stores `ts` as timestamp[us] with no zone, which
    * Spark 4 reads as TIMESTAMP_NTZ and collects as java.time.LocalDateTime;
    * regenerated data may carry a zone and collect as java.sql.Timestamp.
    * Normalize either to a Timestamp so the brute-force oracles are stable.
    */
  private def asTs(v: Any): java.sql.Timestamp = v match {
    case t: java.sql.Timestamp     => t
    case l: java.time.LocalDateTime => java.sql.Timestamp.valueOf(l)
    case i: java.time.Instant       => java.sql.Timestamp.from(i)
    case other => sys.error(s"unexpected timestamp repr: ${other.getClass}")
  }

  private def events: Seq[(Long, Long, java.sql.Timestamp, String)] =
    Tables(spark, dir, "events")
      .selectExpr("user_id", "event_id", "ts", "event_type")
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        asTs(r.get(2)), r.getString(3))).toSeq

  test("q14 as-of join matches a brute-force most-recent-click scan") {
    val ev = events
    val clicks = ev.filter(_._4 == "click")
    val expected = ev.filter(_._4 == "purchase").map { case (u, id, ts, _) =>
      val prior = clicks.filter(c => c._1 == u && !c._3.after(ts))
      val best = if (prior.isEmpty) None
      else Some(prior.maxBy(c => (c._3.getTime, c._2))) // latest ts, then max id
      (u, id) -> best.map(c => (c._2, c._3))
    }.toMap
    val got = SparkEntry.queries("q14_asof_join")(spark, dir).collect().map { r =>
      (r.getLong(0), r.getLong(1)) ->
        (if (r.isNullAt(3)) None else Some((r.getLong(3), asTs(r.get(4)))))
    }.toMap
    assert(got.keySet == expected.keySet)
    got.foreach { case (k, v) => assert(v == expected(k), s"mismatch at $k") }
    assert(got.valuesIterator.exists(_.isDefined), "no purchase had a prior click")
  }

  test("st04 interval join matches a brute-force pair scan") {
    val ev = events
    val views = ev.filter(_._4 == "view")
    val dayMs = 24L * 3600 * 1000
    val expected = (for {
      (u, pid, pts, t) <- ev if t == "purchase"
      (vu, vid, vts, _) <- views
      if vu == u && vts.getTime >= pts.getTime - dayMs && !vts.after(pts)
    } yield (u, pid, vid)).toSet
    val got = SparkEntry.queries("st04_interval_join")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(3))).toSet
    assert(got == expected)
    assert(got.nonEmpty)
  }

  test("q16 funnel counts match a brute-force per-user scan") {
    val ev = events
    val byUser = ev.groupBy(_._1)
    val viewT = byUser.flatMap { case (u, es) =>
      val ts = es.filter(_._4 == "view").map(_._3)
      if (ts.isEmpty) None else Some(u -> ts.min)
    }
    val clickT = viewT.flatMap { case (u, t1) =>
      val ts = byUser(u).filter(e => e._4 == "click" && e._3.after(t1)).map(_._3)
      if (ts.isEmpty) None else Some(u -> ts.min)
    }
    val purchT = clickT.flatMap { case (u, t2) =>
      val ts = byUser(u).filter(e => e._4 == "purchase" && e._3.after(t2)).map(_._3)
      if (ts.isEmpty) None else Some(u -> ts.min)
    }
    val row = SparkEntry.queries("q16_funnel")(spark, dir).collect().head
    assert(row.getLong(0) == viewT.size)
    assert(row.getLong(1) == clickT.size)
    assert(row.getLong(2) == purchT.size)
  }

  test("t13 line dedup: kept totals equal the corpus's distinct line count") {
    import org.apache.spark.sql.functions._
    val out = SparkEntry.queries("t13_line_dedup")(spark, dir).collect()
    out.foreach { r =>
      val (nLines, nKept) = (r.getAs[Long]("n_lines"), r.getAs[Long]("n_kept"))
      assert(nKept >= 0 && nKept <= nLines)
    }
    // every distinct line survives exactly once, somewhere
    val distinctLines = Tables(spark, dir, "documents")
      .selectExpr("explode(transform(sequence(0, CAST((size(split(text, ' ')) - 1) div 10 AS INT)), " +
        "i -> array_join(slice(split(text, ' '), i * 10 + 1, 10), ' '))) AS line")
      .agg(countDistinct(col("line"))).collect().head.getLong(0)
    assert(out.map(_.getAs[Long]("n_kept")).sum == distinctLines)
  }

  test("t18 heavy hitters match a brute-force gram count") {
    val docs = Tables(spark, dir, "documents")
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    val perDoc = docs.map { case (id, text) =>
      val w = text.split(" ", -1)
      id -> w.sliding(3).filter(_.length == 3).map(_.mkString(" ")).toSeq
    }
    val tf = scala.collection.mutable.Map.empty[String, Long]
    val df = scala.collection.mutable.Map.empty[String, Long]
    perDoc.foreach { case (_, grams) =>
      grams.foreach(g => tf(g) = tf.getOrElse(g, 0L) + 1)
      grams.distinct.foreach(g => df(g) = df.getOrElse(g, 0L) + 1)
    }
    val expected = tf.keys.toSeq
      .map(g => (g, tf(g), df(g)))
      .sortBy { case (g, t, d) => (-d, -t, g) }
      .take(30)
    val out = SparkEntry.queries("t18_heavy_hitters")(spark, dir).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    assert(out == expected)
  }

  test("d13 source overlap matches brute-force pairwise shingle sets") {
    val bySource = Tables(spark, dir, "documents")
      .select("source", "text").collect()
      .map(r => r.getString(0) -> r.getString(1))
      .groupBy(_._1)
      .map { case (src, rows) =>
        src -> rows.flatMap { case (_, text) =>
          text.split(" ", -1).sliding(3).filter(_.length == 3)
            .map(_.mkString(" "))
        }.toSet
      }
    val out = SparkEntry.queries("d13_source_overlap")(spark, dir).collect()
    // every overlapping pair present, each row's counts exact
    val expectedPairs = for {
      a <- bySource.keys.toSeq; b <- bySource.keys.toSeq
      if a < b && (bySource(a) & bySource(b)).nonEmpty
    } yield (a, b)
    assert(out.map(r => (r.getString(0), r.getString(1))).toSet ==
      expectedPairs.toSet)
    out.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      val (sa, sb) = (bySource(a), bySource(b))
      val shared = (sa & sb).size.toLong
      assert(r.getAs[Long]("shared_grams") == shared)
      assert(r.getAs[Long]("grams_a") == sa.size.toLong)
      assert(r.getAs[Long]("grams_b") == sb.size.toLong)
      val jac = BigDecimal(shared.toDouble / (sa.size + sb.size - shared))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(r.getAs[Double]("jaccard") - jac) < 1e-9)
    }
  }

  test("t12 packing is contiguous per source with in-range offsets") {
    val rows = SparkEntry.queries("t12_seq_pack")(spark, dir).collect()
      .map(r => (r.getString(1), r.getInt(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6)))
    rows.groupBy(_._1).foreach { case (src, rs) =>
      val bySeq = rs.sortBy(_._3)
      // head-to-tail: each doc starts exactly where the previous ended
      bySeq.sliding(2).foreach {
        case Array((_, _, c1, _, _, _), (_, nt2, c2, _, _, _)) =>
          assert(c2 - nt2 == c1, s"$src: gap in packing stream")
        case _ =>
      }
      val (_, ntH, cumH, _, _, _) = bySeq.head
      assert(cumH == ntH, s"$src: first doc must start at offset 0")
      assert(bySeq.last._3 == rs.map(_._2.toLong).sum, s"$src: total mismatch")
    }
    rows.foreach { case (_, nt, cum, sf, sl, off) =>
      assert(off >= 0 && off < 256)
      assert(sf <= sl)
      assert(sf == (cum - nt) / 256 && sl == (cum - 1) / 256)
    }
  }

  test("m05 chunks have hop-strided offsets, bounded counts, and are deterministic") {
    val run1 = SparkEntry.queries("m05_audio_chunk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    val run2 = SparkEntry.queries("m05_audio_chunk")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getInt(3), r.getString(4)))
    assert(run1.toSeq == run2.toSeq, "chunking must be deterministic")
    val byDoc = run1.groupBy(_._1)
    val lens = Tables(spark, dir, "documents")
      .selectExpr("doc_id", "CAST(length(text) AS BIGINT) AS n")
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    byDoc.foreach { case (id, chunks) =>
      assert(chunks.length <= 6 && chunks.nonEmpty)
      chunks.sortBy(_._2).zipWithIndex.foreach { case ((_, idx, off, sz, _), i) =>
        assert(idx == i, "chunk indexes are dense from 0")
        assert(off == i * 48, "offsets stride by the hop")
        assert(sz > 0 && sz <= 64)
        assert(off + sz <= lens(id))
      }
    }
  }

  test("m06 resize geometry letterboxes into 224x224 preserving aspect") {
    val rows = SparkEntry.queries("m06_resize_stub")(spark, dir).collect()
      .map(r => (r.getInt(1), r.getInt(2), r.getInt(3), r.getInt(4),
        r.getInt(5), r.getInt(6)))
    assert(rows.nonEmpty)
    rows.foreach { case (sw, sh, ow, oh, px, py) =>
      assert(ow >= 1 && ow <= 224 && oh >= 1 && oh <= 224)
      assert(ow == 224 || oh == 224, "the fitted side must touch the target box")
      // aspect preserved to rounding: ow/oh ~ sw/sh
      assert(math.abs(ow.toDouble / oh - sw.toDouble / sh) <=
        1.5 * (1.0 / oh + sw.toDouble / sh / oh), s"aspect drift for ($sw,$sh)")
      assert(px == (224 - ow) / 2 && py == (224 - oh) / 2)
    }
  }

  test("m04 samples min(4, n_frames) evenly-strided frames, deterministically") {
    val run1 = SparkEntry.queries("m04_frame_sample")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    val run2 = SparkEntry.queries("m04_frame_sample")(spark, dir).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getInt(2), r.getString(3)))
    assert(run1.toSeq == run2.toSeq, "frame sampling must be deterministic")
    run1.groupBy(_._1).foreach { case (doc, frames) =>
      val n = frames.head._2
      val k = math.min(4, n)
      assert(frames.length == k, s"doc $doc: expected $k frames")
      val idxs = frames.map(_._3).toSeq
      assert(idxs == idxs.sorted && idxs.distinct == idxs,
        s"doc $doc: frame indices must be strictly increasing")
      assert(idxs == (0 until k).map(j => (j.toLong * n / k).toInt),
        s"doc $doc: indices must follow the even stride")
      assert(idxs.forall(i => i >= 0 && i < n))
    }
  }

  test("m08 routes injected container heads to their modalities") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    val heads = Seq(
      (1L, "RIFF0124WAVEfmt and pcm samples follow", "wav"),
      (2L, "GIF89a image data", "gif"),
      (3L, "%PDF-1.7 obj stream", "pdf"),
      (4L, "0000ftypisom mp4 boxes", "mp4"),
      (5L, "OggS vorbis page", "ogg"),
      (6L, "ID3 tag then mpeg frames", "mp3"),
      (7L, "<?xml version='1.0'?><doc/>", "xml"),
      (8L, "plain prose document", "text"))
    val tmp = java.nio.file.Files.createTempDirectory("m08").toString
    heads.map { case (id, t, _) => (id, t, "en", "mixed", 0L) }
      .toDF("doc_id", "text", "lang", "source", "n_chars")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("m08_modality_route")(spark, tmp).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    heads.foreach { case (id, _, want) =>
      assert(out(id) == want, s"doc $id: routed ${out(id)}, want $want")
    }
    // the prose corpus routes entirely to text
    val corpus = SparkEntry.queries("m08_modality_route")(spark, dir).collect()
    assert(corpus.forall(_.getString(2) == "text"))
  }

  test("routeBlob routes real binary magics (JPEG/PNG) that text CASEs cannot spell") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    def bytes(xs: Int*): Array[Byte] = xs.map(_.toByte).toArray
    val blobs = Seq(
      // JPEG SOI + APP0: ff d8 ff e0
      (1L, bytes(0xFF, 0xD8, 0xFF, 0xE0, 0x00, 0x10, 0x4A, 0x46), "jpeg"),
      // PNG signature: 89 50 4e 47 0d 0a 1a 0a
      (2L, bytes(0x89, 0x50, 0x4E, 0x47, 0x0D, 0x0A, 0x1A, 0x0A), "png"),
      // the ASCII magics route identically through the hex path
      (3L, "RIFF0124WAVEfmt ".getBytes("UTF-8"), "wav"),
      (4L, "%PDF-1.7 obj".getBytes("UTF-8"), "pdf"),
      (5L, "0000ftypisom".getBytes("UTF-8"), "mp4"),
      // a JPEG head truncated before its third byte is NOT a jpeg
      (6L, bytes(0xFF, 0xD8), "text"),
      (7L, "plain prose".getBytes("UTF-8"), "text"))
    val out = blobs.map { case (id, b, _) => (id, b) }
      .toDF("doc_id", "blob")
      .select($"doc_id", graft.operators.Multimodal.routeBlob($"blob").as("m"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    blobs.foreach { case (id, _, want) =>
      assert(out(id) == want, s"blob $id: routed ${out(id)}, want $want")
    }
  }

  test("m07 phash dedup collapses injected duplicate blobs, keeps min id") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // the synthetic corpus is dup-free — inject re-uploads (same blob,
    // fresh doc_id), the case perceptual dedup exists for
    val base = Tables(spark, dir, "documents")
    val dupes = base.orderBy("doc_id").limit(7)
      .withColumn("doc_id", col("doc_id") + lit(1000000L))
    val tmp = java.nio.file.Files.createTempDirectory("m07").toString
    base.unionByName(dupes).write.mode("overwrite")
      .parquet(s"$tmp/documents.parquet")
    val out = SparkEntry.queries("m07_phash_dedup")(spark, tmp).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getBoolean(2), r.getLong(3)))
      .toMap
    (0 until 7).map(_.toLong).foreach { id =>
      // brute-force the intended verdicts from the id pairing itself
      val (hOrig, kOrig, gOrig) = out(id)
      val (hDup, kDup, gDup) = out(id + 1000000L)
      assert(hOrig == hDup, s"doc $id: identical blobs must share a phash")
      assert(gOrig == 2 && gDup == 2, s"doc $id: group size must be 2")
      assert(kOrig && !kDup, s"doc $id: min-id survivor rule violated")
    }
    // hash quality on the stub grid: distinct content never collides here
    val uniques = out.filter { case (id, (_, _, g)) => g == 1 }
    assert(uniques.size == out.size - 14, "unexpected extra collisions")
    // every group has exactly one survivor
    out.groupBy(_._2._1).foreach { case (h, members) =>
      assert(members.count(_._2._2) == 1, s"phash $h: one survivor expected")
    }
  }
  test("m02/m06/m07 real-image branch: javax.imageio decode, dHash collapses a re-encode") {
    import spark.implicits._
    // a real 64x48 gradient image, encoded twice with DIFFERENT bytes
    // but identical pixels: PNG (compressed) and BMP (raw) — the
    // re-encoded-duplicate case perceptual hashing exists for
    val img = new java.awt.image.BufferedImage(
      64, 48, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 48; x <- 0 until 64) {
      val lum = if (x < 32) (x * 4) min 255 else 255 - ((x - 32) * 4 min 255)
      img.setRGB(x, y, (lum << 16) | (lum << 8) | lum)
    }
    def enc(fmt: String): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      assert(javax.imageio.ImageIO.write(img, fmt, bos), s"no $fmt writer")
      bos.toByteArray
    }
    val png = enc("png"); val bmp = enc("bmp")
    assert(!java.util.Arrays.equals(png, bmp), "containers must differ")
    val blobs = Seq((1L, png), (2L, bmp),
      (3L, "just prose bytes, not an image".getBytes("UTF-8")))
      .toDF("doc_id", "blob")

    // m02 core: true geometry for both containers, same PIXEL digest
    val meta = graft.operators.Multimodal.mediaMeta(blobs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("width"), r.getAs[Int]("height"), r.getAs[String]("digest")))
      .toMap
    assert(meta(1L)._1 == 64 && meta(1L)._2 == 48, "PNG must decode to true WxH")
    assert(meta(2L)._1 == 64 && meta(2L)._2 == 48, "BMP must decode to true WxH")
    assert(meta(1L)._3 == meta(2L)._3,
      "same pixels must yield the same content digest across containers")
    assert(meta(3L)._3 != meta(1L)._3, "prose routes to the stub path")

    // m06 core: letterbox geometry from the REAL dims — 64x48 fits
    // 224x224 at scale 3.5 -> 224x168, padY 28
    val geo = graft.operators.Multimodal.resizeGeometry(blobs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Int]("out_w"), r.getAs[Int]("out_h"), r.getAs[Int]("pad_y")))
      .toMap
    assert(geo(1L) == ((224, 168, 28)), s"unexpected letterbox: ${geo(1L)}")
    assert(geo(2L) == ((224, 168, 28)))

    // m07 core: the PNG and BMP collapse to ONE dHash group (min-id
    // survives); the prose blob stays its own group
    val ded = graft.operators.Multimodal.phashDedup(blobs).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        (r.getAs[Long]("phash"), r.getAs[Boolean]("keep"), r.getAs[Long]("grp_size")))
      .toMap
    assert(ded(1L)._1 == ded(2L)._1,
      "re-encoded duplicate must share the real-decode dHash")
    assert(ded(1L)._3 == 2 && ded(2L)._3 == 2)
    assert(ded(1L)._2 && !ded(2L)._2, "min-id survivor rule")
    assert(ded(3L)._3 == 1 && ded(3L)._1 != ded(1L)._1)
  }

  test("m09 shard packing: contiguous shards, conserved bytes, greedy budget") {
    val dir = "/root/testdata/sf0.001"
    val out = graft.operators.Multimodal.queries("m09_shard_pack")(spark, dir)
      .collect().map(r => (r.getString(0), r.getInt(1), r.getLong(2), r.getLong(3)))
    val docs = graft.Tables(spark, dir, "documents").collect()
      .map(r => (r.getString(3), r.getString(1).getBytes("UTF-8").length.toLong))
    // bytes are conserved: shard totals partition the corpus bytes
    assert(out.map(_._4).sum == docs.map(_._2).sum)
    out.groupBy(_._1).foreach { case (src0, shards) =>
      val ids = shards.map(_._2).sorted
      // shard ids are contiguous from 0 (no empty shard in the chain)
      assert(ids.toSeq == (0 until ids.length), s"$src0 shard ids: ${ids.toSeq}")
      // floor(prior/budget) assignment ⇒ the first member of shard i+1
      // has prior bytes in [(i+1)·B, (i+2)·B): the PREFIX sum through
      // shard i must land in that band (per-shard bytes alone can
      // undershoot B when one item straddles the boundary)
      val byId = shards.map(s => s._2 -> s._4).toMap
      var prefix = 0L
      ids.dropRight(1).foreach { i =>
        prefix += byId(i)
        assert(prefix >= (i + 1) * 4096L && prefix < (i + 2) * 4096L,
          s"$src0 prefix through shard $i = $prefix outside its band")
      }
    }
  }
  test("q28 rolling actives match a brute-force trailing-window scan") {
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val got = SparkEntry.queries("q28_rolling_actives")(spark, dir).collect()
      .map(r => r.getTimestamp(0).getTime -> r.getLong(1)).toMap
    val pairs = graft.Tables(spark, dir, "events")
      .select(date_trunc("day", col("ts")).as("day"), col("user_id"))
      .distinct().collect()
      .map(r => (r.getTimestamp(0).getTime, r.getLong(1)))
    val days = pairs.map(_._1).distinct
    val week = 7L * 24 * 3600 * 1000
    val expected = days.map { d =>
      d -> pairs.filter(p => p._1 <= d && p._1 > d - week).map(_._2).distinct.length.toLong
    }.toMap
    assert(got == expected)
    // the window actually accumulates: some day must exceed its own-day count
    val daily = pairs.groupBy(_._1).map { case (d, v) => d -> v.length.toLong }
    assert(days.exists(d => got(d) > daily(d)),
      "trailing window never exceeded single-day actives")
  }
}
