package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables

/** Typed metadata a media decoder would emit for one blob. */
case class MediaMeta(
    doc_id: Long,
    n_bytes: Int,
    width: Int,
    height: Int,
    n_frames: Int,
    digest: String)

/** The PLUGGABLE decode seam (SURVEY §2.3): one implementation call per
  * blob, invoked inside the per-partition 32-blob batches of
  * m02/m03/m06/m07/m10 — so a codec-bearing deployment (libjpeg/ffmpeg/
  * torch on the executors) swaps in real decode by passing its own
  * `Decoder` to [[Multimodal.mediaMeta]]/[[Multimodal.featureExtract]]/
  * [[Multimodal.resizeGeometry]]/[[Multimodal.phashes]] with ZERO plan
  * changes: the schema, partitioning, batch shape, and everything
  * downstream of the decode are decoder-agnostic (DecoderSeamSpec
  * proves a custom decoder flows through m02→m03→m07 end to end).
  * Implementations ship to executors — keep them Serializable and
  * stateless (or lazily initialized per JVM).
  */
trait Decoder extends Serializable {

  /** Geometry + content digest for one blob — m02/m06's row, and the
    * entropy source of m03's embedding stub.
    */
  def decode(id: Long, bytes: Array[Byte]): MediaMeta

  /** 8×8 mean-luminance grid when the bytes decode to pixels — the
    * dHash input of m07/m10. None routes the blob to the deterministic
    * stub grid (same bit layout, derived from the blob digest).
    */
  def lumaGrid(bytes: Array[Byte]): Option[Array[Array[Int]]]
}

/** Multimodal-column operators (SURVEY.md §2.3): media as opaque
  * `binary` columns with typed metadata.
  *
  * No image/audio libraries ship in this container, so the DECODE step
  * is a clearly-marked deterministic stub — but the Spark-side plumbing
  * is real: binary columns, per-partition batch iteration (the shape a
  * vectorized decoder needs), typed output via a product Encoder, and
  * scan-level column pruning so the blob column is only read when the
  * operator needs it.
  */
object Multimodal {

  private def T(s: SparkSession, dir: String, n: String) = Tables(s, dir, n)

  /** m01: binary ingest + cheap metadata — byte length, content hash,
    * head bytes — all codegen, no decode.
    */
  def m01(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "documents")
      .select($"doc_id",
        octet_length($"text".cast("binary")).as("n_bytes"),
        sha2($"text".cast("binary"), 256).as("sha"),
        substring($"text", 1, 8).as("head8"))
      .orderBy($"doc_id")
  }

  /** md5 hex of the blob bytes — the stub decoder's entropy source.
    * md5 (not FNV/xxhash) so the DuckDB ORACLE can recompute the exact
    * same digests natively: this is what upgrades m02/m04/m05/m06 from
    * rows-only to full oracle verification while keeping the decode
    * stub deterministic on content.
    */
  private def md5hex(bytes: Array[Byte]): String = {
    val d = java.security.MessageDigest.getInstance("MD5").digest(bytes)
    val sb = new java.lang.StringBuilder(32)
    d.foreach { b => sb.append(Character.forDigit((b >> 4) & 0xf, 16))
      .append(Character.forDigit(b & 0xf, 16)) }
    sb.toString
  }

  /** Unsigned value of 4 hex chars of `s` at 0-based `pos` (16 bits —
    * small enough that the oracle can rebuild it with plain arithmetic).
    */
  private def hex4(s: String, pos: Int): Int =
    Integer.parseInt(s.substring(pos, pos + 4), 16)

  /** The same 4-hex-char value in DuckDB SQL (1-based `pos`). */
  private def sqlHex4(col: String, pos: Int): String = OracleSql.hex4(col, pos)

  /** STUB decoder — stands in for libjpeg/ffmpeg, which are absent in
    * this container. Deterministic on the blob bytes so results are
    * verifiable (and oracle-recomputable, see md5hex); the real
    * implementation would decode here and nothing else in the pipeline
    * would change.
    */
  private def fakeDecode(id: Long, bytes: Array[Byte]): MediaMeta = {
    val dg = md5hex(bytes)
    MediaMeta(
      doc_id = id,
      n_bytes = bytes.length,
      width = 64 + hex4(dg, 0) % 1024,
      height = 64 + hex4(dg, 4) % 1024,
      n_frames = 1 + hex4(dg, 8) % 16,
      digest = dg)
  }

  /** Image-container magic sniff (m08's router move applied inside the
    * decoder): only blobs opening with a PNG/JPEG/BMP/GIF signature
    * ever reach ImageIO, so the text-corpus hot path stays at one
    * 8-byte prefix compare per row — no stream/reader setup per blob.
    */
  private def looksLikeImage(b: Array[Byte]): Boolean =
    b.length >= 8 && (
      (b(0) == 0x89.toByte && b(1) == 'P'.toByte && b(2) == 'N'.toByte &&
        b(3) == 'G'.toByte) ||
      (b(0) == 0xff.toByte && b(1) == 0xd8.toByte) ||
      (b(0) == 'B'.toByte && b(1) == 'M'.toByte) ||
      (b(0) == 'G'.toByte && b(1) == 'I'.toByte && b(2) == 'F'.toByte))

  /** REAL decode branch: javax.imageio — the PNG/BMP/GIF/JPEG readers
    * that ship inside the JDK, no external dependency. Returns None
    * when the bytes are not a decodable image, which routes the blob
    * to [[fakeDecode]] — the synthetic corpus's text blobs all take
    * that path, keeping the DuckDB oracle able to replay the m02/m06/
    * m07 digest chains, while a corpus with real images exercises this
    * branch (EventJoinSpec decodes a real PNG/BMP pair through it).
    */
  private def tryDecodeImage(bytes: Array[Byte]): Option[java.awt.image.BufferedImage] =
    if (!looksLikeImage(bytes)) None
    else
      try Option(javax.imageio.ImageIO.read(new java.io.ByteArrayInputStream(bytes)))
      catch { case _: java.io.IOException => None }

  /** 8×8 mean-luminance grid by block averaging — the real counterpart
    * of the stub's md5-chain grid. Cell (r,c) integer-averages the
    * Rec.601 luma (299R+587G+114B)/1000 of its pixel block, so any two
    * containers that decode to the same pixels (PNG↔BMP, PNG
    * compression levels) yield the SAME grid — which is exactly what
    * makes the dHash below re-encode-robust.
    */
  private def lumaGrid8(img: java.awt.image.BufferedImage): Array[Array[Int]] = {
    val (w, h) = (img.getWidth, img.getHeight)
    Array.tabulate(8, 8) { (r, c) =>
      val y0 = r * h / 8; val y1 = math.max(y0 + 1, (r + 1) * h / 8)
      val x0 = c * w / 8; val x1 = math.max(x0 + 1, (c + 1) * w / 8)
      var sum = 0L; var n = 0L
      var y = y0
      while (y < y1 && y < h) {
        var x = x0
        while (x < x1 && x < w) {
          val p = img.getRGB(x, y)
          sum += (299 * ((p >> 16) & 0xff) + 587 * ((p >> 8) & 0xff) +
            114 * (p & 0xff)) / 1000
          n += 1; x += 1
        }
        y += 1
      }
      (sum / math.max(n, 1L)).toInt
    }
  }

  /** Unified decode: real images (by magic + successful ImageIO read)
    * get true geometry and a PIXEL-content digest (md5 over the luma
    * grid bytes — stable across container re-encodes of the same
    * pixels, unlike the blob digest); everything else falls back to
    * the deterministic stub.
    */
  private def decode(id: Long, bytes: Array[Byte]): MediaMeta =
    tryDecodeImage(bytes) match {
      case Some(img) =>
        val grid = lumaGrid8(img)
        MediaMeta(id, bytes.length, img.getWidth, img.getHeight, 1,
          md5hex(grid.flatten.map(_.toByte)))
      case None => fakeDecode(id, bytes)
    }

  /** The sandbox default [[Decoder]]: JDK ImageIO for real image
    * containers (PNG/BMP/GIF/JPEG — no external dependency), the
    * deterministic md5-chain stub for everything else. The registered
    * m02/m03/m06/m07/m10 queries run through this, so their oracle
    * contracts are exactly the pre-seam behavior.
    */
  object DefaultDecoder extends Decoder {
    def decode(id: Long, bytes: Array[Byte]): MediaMeta =
      Multimodal.decode(id, bytes)
    def lumaGrid(bytes: Array[Byte]): Option[Array[Array[Int]]] =
      tryDecodeImage(bytes).map(lumaGrid8)
  }

  /** m02: decode plumbing — binary batches per partition
    * (batch size 32, the shape a GPU/vectorized decoder wants), typed
    * struct out. `mapPartitions` is the Scala analog of mapInPandas:
    * one iterator per partition, amortized setup, no driver round-trip.
    */
  def m02(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    mediaMeta(T(s, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("blob")))
      .orderBy($"doc_id")
  }

  /** m02 core over any (doc_id, blob: binary) frame — factored so
    * specs (and image-bearing corpora) can feed REAL image bytes that
    * a parquet string column could not carry, and so a deployment can
    * inject its own [[Decoder]] (the codec seam) with no plan change.
    */
  def mediaMeta(blobs: DataFrame,
      decoder: Decoder = DefaultDecoder): DataFrame = {
    val s = blobs.sparkSession
    import s.implicits._
    blobs.select($"doc_id", $"blob")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(32).flatMap { batch =>
          // batch boundary = where a real decoder would invoke its
          // vectorized kernel once per 32 blobs
          batch.map { case (id, bytes) => decoder.decode(id, bytes) }
        }
      }
      .toDF()
  }

  /** m03: feature-extract plumbing — binary blob → dense embedding
    * (the "encode then ANN-index" path; s01–s03 consume this shape).
    * The encoder is a deterministic stub (no torch/onnx in this
    * container): 16 signed 16-bit lattice coordinates derived from
    * per-dimension content digests, then L2-normalized to the
    * Array[Float] a real model would emit. Batching, schema, and
    * normalization are real; the EMITTED scalars digest the integer
    * pre-image (a bijective image of the unit vector) rather than
    * formatted floats — cross-engine float formatting is not
    * contract-stable (see t10's round() note), integers are, which is
    * what lets the DuckDB oracle verify this query.
    */
  def m03(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    featureExtract(T(s, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("blob")))
      .orderBy($"doc_id")
  }

  /** m03 core over any (doc_id, blob: binary) frame. The embedding
    * stub's entropy source is the DECODER's content digest (for the
    * default decoder on non-image blobs that is md5(blob) — the
    * registered query's oracle contract; on real images it is the
    * pixel-content digest, so re-encodes embed identically), which is
    * what lets a custom [[Decoder]] flow through to the embedding with
    * no plan change.
    */
  def featureExtract(blobs: DataFrame,
      decoder: Decoder = DefaultDecoder): DataFrame = {
    val s = blobs.sparkSession
    import s.implicits._
    val dims = 16
    blobs.select($"doc_id", $"blob")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(32).flatMap { batch => // one stub "model call" per 32 blobs
          batch.map { case (id, bytes) =>
            val dg = decoder.decode(id, bytes).digest
            val q = Array.tabulate(dims) { d =>
              hex4(md5hex(s"$dg:$d".getBytes("UTF-8")), 0) - 32768
            }
            val norm = math.sqrt(q.map(v => v.toDouble * v).sum)
            // the downstream embedding shape — normalized floats
            val emb = q.map(v => (v / norm).toFloat)
            // Scalars only on the way out: the Array[Float] stays an
            // internal shape; externally we emit the integer pre-image's
            // exact squared norm and content digest. Array cells in a
            // result table also break column-wise sorters downstream.
            (id, q.map(v => v.toLong * v).sum,
              md5hex(q.mkString(",").getBytes("UTF-8")), emb.length)
          }
        }
      }
      .toDF("doc_id", "sq_norm_int", "emb_digest", "dims")
  }

  /** Frames sampled per blob in m04 (a real video pipeline samples a
    * handful of frames per clip, not every frame).
    */
  private val KFrames = 4

  /** m04: frame-sample plumbing — the video path of the
    * multimodal mandate: decode header → pick K evenly-strided frame
    * indices → one output ROW PER SAMPLED FRAME with scalar per-frame
    * digests (the shape a frame-level embedding model consumes next).
    * The decoder is the same deterministic stub as m02 (no ffmpeg in
    * this container); the plumbing is real: per-partition batch
    * iteration, flatMap row expansion (bounded ×K, never ×n_frames),
    * scalars only on the way out.
    */
  def m04(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    frameSample(T(s, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("blob")))
      .orderBy($"doc_id", $"frame_idx")
  }

  /** m04 core over any (doc_id, blob: binary) frame — the [[Decoder]]
    * seam's video leg: frame count and per-frame digest entropy come
    * from the injected decoder (for the default on non-video blobs,
    * the deterministic stub — the registered query's oracle contract).
    */
  def frameSample(blobs: DataFrame,
      decoder: Decoder = DefaultDecoder): DataFrame = {
    val s = blobs.sparkSession
    import s.implicits._
    blobs.select($"doc_id", $"blob")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(32).flatMap { batch => // one stub "decoder call" per 32 blobs
          batch.flatMap { case (id, bytes) =>
            val meta = decoder.decode(id, bytes)
            val k = math.min(KFrames, meta.n_frames)
            (0 until k).map { j =>
              // evenly-strided deterministic indices — ffmpeg's
              // select='not(mod(n,stride))' sampling shape
              val frameIdx = ((j.toLong * meta.n_frames) / k).toInt
              // stub per-frame digest: the frame index mixed into the
              // blob digest stands in for hashing decoded pixel data
              val h = md5hex(s"${meta.digest}:$frameIdx".getBytes("UTF-8"))
              (id, meta.n_frames, frameIdx, h)
            }
          }
        }
      }
      .toDF("doc_id", "n_frames", "frame_idx", "frame_hash")
  }

  /** m05 chunking geometry: 64-byte windows, 48-byte hop (25% overlap —
    * the audio feature-frame convention), capped at 6 chunks per blob.
    * The CAP is the scale contract: row expansion is bounded ×6, never
    * ×(blob bytes / hop) — a long clip samples its head here; a real
    * pipeline would shard long media upstream.
    */
  private val ChunkBytes = 64
  private val HopBytes = 48
  private val MaxChunks = 6

  /** m05: audio-chunk plumbing — the audio path of the
    * multimodal mandate: split each blob into fixed-size overlapping
    * windows (the frame/hop shape every acoustic feature extractor
    * consumes), one output row per chunk with scalar digests. Decode is
    * stubbed (no soundfile/ffmpeg in this container) by treating the
    * character stream as the sample stream (chars == bytes on this
    * ASCII corpus; a real decoder slots in without changing the plan);
    * batching, bounded flatMap expansion, and scalars-only output are
    * the real contract. Chunk digests are md5 over the chunk content so
    * the oracle recomputes them with substr+md5.
    */
  def m05(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "documents")
      .select($"doc_id", $"text")
      .as[(Long, String)]
      .mapPartitions { it =>
        it.grouped(32).flatMap { batch => // one stub "resampler call" per 32 blobs
          batch.flatMap { case (id, txt) =>
            // empty blob → zero chunks (never a zero-byte frame row)
            val len = txt.length
            val nChunks =
              if (len == 0) 0
              else math.min(MaxChunks,
                math.max(1, (len - ChunkBytes + HopBytes) / HopBytes))
            (0 until nChunks).map { j =>
              val off = j * HopBytes
              val end = math.min(off + ChunkBytes, len)
              (id, j, off, end - off,
                md5hex(txt.substring(off, end).getBytes("UTF-8")))
            }
          }
        }
      }
      .toDF("doc_id", "chunk_idx", "char_off", "n_chunk_chars", "chunk_hash")
      .orderBy($"doc_id", $"chunk_idx")
  }

  /** m06: image-RESIZE plumbing — decode header → compute
    * the letterboxed target geometry (fit 224×224 preserving aspect, the
    * vision-model preprocessing staple) → emit the resized-frame scalar
    * digest. The pixel resample is the stub (no libjpeg/PIL here); the
    * geometry math, batching, and scalars-only contract are real — a
    * real kernel slots into `resizedDigest` and nothing else changes.
    */
  def m06(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    resizeGeometry(T(s, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("blob")))
      .orderBy($"doc_id")
  }

  /** m06 core over any (doc_id, blob: binary) frame. Real images get
    * their true decoded geometry (the stub supplies it otherwise); the
    * letterbox math is identical either way — and decoder-agnostic, so
    * a custom [[Decoder]] swaps in with no plan change.
    */
  def resizeGeometry(blobs: DataFrame,
      decoder: Decoder = DefaultDecoder): DataFrame = {
    val s = blobs.sparkSession
    import s.implicits._
    val (tw, th) = (224, 224)
    blobs.select($"doc_id", $"blob")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(32).flatMap { batch => // one stub "resize kernel call" per 32 blobs
          batch.map { case (id, bytes) =>
            val meta = decoder.decode(id, bytes)
            // fit-inside scale preserving aspect ratio, letterboxed
            val scale = math.min(tw.toDouble / meta.width, th.toDouble / meta.height)
            val (ow, oh) = (math.max(1, (meta.width * scale).round.toInt),
              math.max(1, (meta.height * scale).round.toInt))
            val padX = (tw - ow) / 2
            val padY = (th - oh) / 2
            // geometry mixed into the content digest stands in for
            // hashing the resampled pixels
            val h = md5hex(s"${meta.digest}:${ow}x$oh".getBytes("UTF-8"))
            (id, meta.width, meta.height, ow, oh, padX, padY, h)
          }
        }
      }
      .toDF("doc_id", "src_w", "src_h", "out_w", "out_h", "pad_x", "pad_y",
        "resized_hash")
  }

  /** m07: perceptual-hash image DEDUP — the multimodal counterpart of
    * d01: decode each image blob → 8×8 luminance grid → dHash
    * (horizontal gradient sign bits, 8 rows × 7 comparisons = 56 bits,
    * the standard re-encode-robust fingerprint: JPEG quality, scaling,
    * and format changes preserve gradient signs) → dedup groups keyed
    * on the hash. The grid comes from the same md5-chain stub as
    * m02–m06 (no image libs in this container) — with a REAL decoder
    * only `fakeDecode`'s grid changes and re-encoded variants collapse
    * to the same hash; with the stub, groups form on identical blob
    * content (the synthetic corpus is dup-free, so EventJoinSpec
    * proves the collapse on injected duplicate blobs).
    *
    * Scale shape: hashing is per-row batched mapPartitions (the
    * vectorized-decoder shape); the dedup is d01's regime — ONE
    * partial-agg shuffle on the constant-width 56-bit key, then the
    * count-back join co-partitioned on that key (group dim is
    * distinct-hash-sized; at 100 TB both sides shuffle once on the
    * hash — never wider than the corpus). Oracle: DuckDB rebuilds the
    * md5 row-digest chain and every gradient bit natively, so each
    * doc's hash, survivor verdict, and group size are hash-verified.
    */
  def m07(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    phashDedup(T(s, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("blob")))
  }

  /** The 56-bit dHash of one blob: decodable images go through the
    * REAL path (8×8 block-averaged luma grid → horizontal gradient
    * signs), so re-encodes of the same pixels — PNG↔BMP, compression
    * levels — collapse to one hash; non-images keep the md5-chain stub
    * grid (same bit layout, deterministic on blob content).
    */
  private def dHash56(bytes: Array[Byte], decoder: Decoder): Long = {
    var h = 0L
    var bit = 0
    decoder.lumaGrid(bytes) match {
      case Some(g) =>
        var i = 0
        while (i < 8) {
          var j = 0
          while (j < 7) {
            if (g(i)(j) > g(i)(j + 1)) h |= 1L << bit
            bit += 1; j += 1
          }
          i += 1
        }
      case None =>
        val dg = md5hex(bytes)
        var i = 0
        while (i < 8) {
          // row digest = one 8-value luminance row of the stub grid
          val row = md5hex(s"$dg:r$i".getBytes("UTF-8"))
          var j = 0
          while (j < 7) {
            if (hex4(row, 4 * j) > hex4(row, 4 * (j + 1))) h |= 1L << bit
            bit += 1; j += 1
          }
          i += 1
        }
    }
    h
  }

  /** The (doc_id, phash) dHash frame m07 and m10 share — per-row
    * batched mapPartitions (the vectorized-decoder shape), no shuffle.
    */
  def phashes(blobs: DataFrame,
      decoder: Decoder = DefaultDecoder): DataFrame = {
    val s = blobs.sparkSession
    import s.implicits._
    blobs.select($"doc_id", $"blob")
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        it.grouped(32).flatMap { batch => // one "decode+hash call" per 32 blobs
          batch.map { case (id, bytes) => (id, dHash56(bytes, decoder)) }
        }
      }
      .toDF("doc_id", "phash")
  }

  /** m07 core over any (doc_id, blob: binary) frame. */
  def phashDedup(blobs: DataFrame,
      decoder: Decoder = DefaultDecoder): DataFrame = {
    val s = blobs.sparkSession
    import s.implicits._
    val hashed = phashes(blobs, decoder)
    val groups = hashed.groupBy($"phash")
      .agg(min($"doc_id").as("keep_id"), count(lit(1)).as("grp_size"))
    hashed.join(groups, "phash")
      .select($"doc_id", $"phash", ($"doc_id" === $"keep_id").as("keep"),
        $"grp_size")
      .orderBy($"doc_id")
  }

  /** m10's report size — the K closest candidate pairs. */
  private val NearDupK = 10

  /** m10: NEAR-duplicate image search by perceptual-hash Hamming
    * distance — the production image-dedup form m07's exact-hash
    * groups feed into: a re-encode that flips a few gradient bits
    * (crop sliver, watermark, recompression artifact) breaks exact
    * equality but stays within a small Hamming radius. d03's banding
    * move applied to the 56-bit dHash: each hash splits into four
    * 14-bit chunks, hashes sharing ANY chunk become candidates (a pair
    * within Hamming ≤ 3 is GUARANTEED a shared chunk by pigeonhole;
    * farther pairs are caught with LSH-style probability), and the
    * report is the [[NearDupK]] closest candidate pairs.
    *
    * Scale shape: hashing is the shuffle-free scan above; the
    * candidate join shuffles on the (chunk-index, chunk-value) key
    * with d03's adaptive bucket cap (8× expected occupancy, floor 50)
    * so a flat-image corpus (uniform chrome, one dominant grid) can't
    * drive one bucket quadratic; top-K is TakeOrderedAndProject. The
    * DuckDB oracle replays the full chain — stub grid bits, chunks,
    * cap, Hamming, top-K — exactly.
    */
  def m10(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    phashNearDup(T(s, dir, "documents")
      .select($"doc_id", $"text".cast("binary").as("blob")))
  }

  /** m10 core over any (doc_id, blob: binary) frame. */
  def phashNearDup(blobs: DataFrame): DataFrame = {
    val s = blobs.sparkSession
    import s.implicits._
    val h = phashes(blobs)
    val chunks = h
      .select($"doc_id", $"phash", explode(expr("sequence(0, 3)")).as("c"))
      .withColumn("chunk", expr("(phash >> (c * 14)) & 16383"))
    val total = h.select(count(lit(1)).as("n_docs"))
    val keep = chunks.groupBy($"c", $"chunk")
      .agg(count(lit(1)).as("bsz"))
      .crossJoin(broadcast(total))
      .filter($"bsz" <= greatest(lit(50L), lit(8L) * $"n_docs" / 16384L))
      .select($"c", $"chunk")
    val capped = chunks.join(keep, Seq("c", "chunk"))
    capped.as("a")
      .join(capped.as("b"),
        $"a.c" === $"b.c" && $"a.chunk" === $"b.chunk" &&
          $"a.doc_id" < $"b.doc_id")
      .select($"a.doc_id".as("doc_a"), $"b.doc_id".as("doc_b"),
        expr("bit_count(a.phash ^ b.phash)").as("hamming"))
      .distinct()
      .orderBy($"hamming", $"doc_a", $"doc_b")
      .limit(NearDupK)
  }

  /** m08: modality ROUTER — classify each blob by its container
    * signature (magic bytes) BEFORE any decode is attempted: the first
    * stage of every multimodal ingest pipeline (route to the right
    * decoder pool, quarantine unknowns, budget per modality). Pure
    * per-row codegen prefix compares over one scan — shuffle-free.
    * The Spark side routes through [[routeBlob]] (hex prefix compares
    * over the binary cast), which covers the BINARY magics (JPEG ff d8
    * ff, PNG 89 50 4e 47) as well as the ASCII-representable ones
    * (RIFF/WAVE, GIF8, %PDF, ftyp@5, OggS, ID3, XML/SVG); the ORACLE
    * stays on the ASCII CASE — equivalent on a prose corpus, since a
    * JPEG/PNG head is not valid UTF-8 text — because this DuckDB build
    * lacks BLOB substring for a hex replay. EventJoinSpec proves the
    * routing on injected container heads INCLUDING literal JPEG/PNG
    * byte arrays; the prose corpus all routes to 'text'.
    */
  def m08(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    T(s, dir, "documents")
      .select($"doc_id", substring($"text", 1, 8).as("head8"),
        routeBlob($"text".cast("binary")).as("modality"))
      .orderBy($"doc_id")
  }

  /** The PRODUCTION router: modality of a BINARY column by magic-byte
    * prefix over ONE hex projection of the first 12 bytes — the same
    * shuffle-free per-row shape as [[ModalityCaseDuck]], plus the
    * binary container magics (JPEG ff d8 ff, PNG 89 50 4e 47) a
    * text-typed CASE cannot spell. Both m08's routing column and m11's
    * interleave costing derive modality from this one expression, so
    * they cannot disagree on what counts as media — on synthetic prose
    * or on real blobs. m08 routes `cast(text AS BINARY)` through this,
    * so the oracle's ASCII CASE stays byte-equivalent on a prose corpus
    * (a JPEG/PNG head is not valid UTF-8 prose) while a real blob
    * column routes correctly — EventJoinSpec injects literal JPEG/PNG
    * byte arrays and asserts they no longer fall through to 'text'.
    */
  def routeBlob(bin: Column): Column = {
    val h = hex(substring(bin, 1, 12)) // 24 hex chars; WAVE sits at 17..24
    when(substring(h, 1, 6) === "FFD8FF", "jpeg")
      .when(substring(h, 1, 8) === "89504E47", "png")
      .when(substring(h, 1, 8) === "52494646" &&
        substring(h, 17, 8) === "57415645", "wav")
      .when(substring(h, 1, 8) === "47494638", "gif")
      .when(substring(h, 1, 8) === "25504446", "pdf")
      .when(substring(h, 9, 8) === "66747970", "mp4")
      .when(substring(h, 1, 8) === "4F676753", "ogg")
      .when(substring(h, 1, 6) === "494433", "mp3")
      .when(substring(h, 1, 10) === "3C3F786D6C" ||
        substring(h, 1, 8) === "3C737667", "xml")
      .otherwise("text")
  }

  /** DuckDB form of the routing logic for the m11 oracle: ASCII-
    * representable magics only (this DuckDB build lacks BLOB substring
    * for a hex replay of JPEG/PNG) — byte-equivalent to [[routeBlob]]
    * on a prose corpus, since a JPEG/PNG head is not valid UTF-8 text.
    * The Spark side of BOTH m08 and m11 routes through [[routeBlob]],
    * so the two operators cannot disagree on what counts as media even
    * on real binary blobs (EventJoinSpec pins this with literal
    * JPEG/PNG byte arrays).
    */
  private val ModalityCaseDuck: String =
    """CASE
      |  WHEN substr(text, 1, 4) = 'RIFF' AND substr(text, 9, 4) = 'WAVE' THEN 'wav'
      |  WHEN substr(text, 1, 4) = 'GIF8' THEN 'gif'
      |  WHEN substr(text, 1, 4) = '%PDF' THEN 'pdf'
      |  WHEN substr(text, 5, 4) = 'ftyp' THEN 'mp4'
      |  WHEN substr(text, 1, 4) = 'OggS' THEN 'ogg'
      |  WHEN substr(text, 1, 3) = 'ID3' THEN 'mp3'
      |  WHEN substr(text, 1, 5) = '<?xml' OR substr(text, 1, 4) = '<svg' THEN 'xml'
      |  ELSE 'text' END""".stripMargin

  /** Fixed-length training-sequence budget for m11 (tokens) and the
    * per-image slot cost (a 24×24-patch vision encoder's output
    * length — the constant a multimodal LM reserves per image).
    */
  private final val SeqBudget = 2048L
  private final val ImageSlotTokens = 576L

  /** m11: INTERLEAVED multimodal sequence packing — t12's fixed-length
    * training-sequence packer extended to mixed text+media streams:
    * every doc costs its text tokens (chars/4, the standard BPE rule
    * of thumb), media docs (m08's router says non-'text') additionally
    * reserve a fixed [[ImageSlotTokens]]-token slot for the vision
    * encoder's output; docs pack greedily into [[SeqBudget]]-token
    * sequences per source in doc_id order (m09's running-cumsum
    * assignment — deterministic, one window). Per (source, sequence):
    * doc/media counts and the token composition — the shape an
    * interleaved-pretraining dataloader consumes.
    *
    * Scale shape: costing is per-row codegen over one scan; the ONLY
    * shuffle is the per-source window (+ its map-side-combined
    * rollup); at 100 TB the source partitions are the parallel unit
    * and a skewed mega-source splits by AQE skew handling on the
    * window's range partitioning.
    */
  def m11(s: SparkSession, dir: String): DataFrame =
    m11With(s, dir, DefaultTextCostSql)

  /** m12: m11's interleaved packer priced with EXACT tokenizer counts
    * instead of the chars/4 calibration — the [[m11With]] cost seam
    * exercised as a registered query. The cost here is the t06
    * pretokenizer's token count (the repo's oracle-replayable BPE-style
    * tokenization, identical under Java regex and RE2, so the packing
    * manifest stays hash-verified end to end); a deployment with a real
    * merges file swaps in `bpe_count(text, '/path/merges.txt')` through
    * the same seam for dataloader-exact GPT-2 costs —
    * TokenCalibrationSpec pins that mode's packed totals against the
    * tokenizer's own counts, and pins m12-vs-m11's delta (the exact
    * cost runs below the calibrated overestimate, so sequences pack
    * denser and the budget still never overflows).
    *
    * Scale shape: identical to m11 — the cost expression is per-row
    * codegen over the same single scan; the one shuffle is the
    * per-source packing window.
    */
  def m12(s: SparkSession, dir: String): DataFrame =
    m11With(s, dir,
      s"size(regexp_extract_all(text, '${Text.bpePattern}', 0))")

  /** m11's default per-doc text-token cost: ceil(chars/4), the standard
    * BPE rule of thumb. CALIBRATED against the t06 regex pretokenizer
    * on the fixture corpus (TokenCalibrationSpec): it OVERESTIMATES by
    * 1.1–1.6× per doc there — a conservative bias, so a packed
    * sequence can underfill but never overflow its token budget. A
    * deployment with a real tokenizer swaps the expression via
    * [[m11With]] without touching the packing plan — e.g.
    * `bpe_count(text, '/path/merges.txt')` for dataloader-EXACT costs
    * against a public GPT-2-format merges file (TokenCalibrationSpec's
    * exact-mode cases pin that the packed totals then equal the
    * tokenizer's own counts), or a materialized `token_count` column.
    */
  final val DefaultTextCostSql = "(n_chars + 3) div 4"

  /** m11 with a PLUGGABLE per-doc text-token cost expression (SQL over
    * the documents columns — `n_chars`, `text`, or a materialized
    * token-count column). The packing machinery — per-source window,
    * cumsum assignment, rollup — is cost-agnostic.
    */
  def m11With(s: SparkSession, dir: String, textCostSql: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    T(s, dir, "documents")
      .select($"doc_id", $"source", $"n_chars", $"text",
        routeBlob($"text".cast("binary")).as("modality"))
      .withColumn("text_toks", expr(textCostSql).cast("long"))
      .drop("text")
      .withColumn("img_toks",
        when($"modality" =!= "text", lit(ImageSlotTokens)).otherwise(lit(0L)))
      .withColumn("cost", $"text_toks" + $"img_toks")
      .withColumn("prior", coalesce(sum($"cost").over(w), lit(0L)))
      .withColumn("seq", expr(s"CAST(prior div $SeqBudget AS INT)"))
      .groupBy($"source", $"seq")
      .agg(count(lit(1)).as("n_docs"),
        count(when($"modality" =!= "text", 1)).as("n_media"),
        sum($"text_toks").as("text_tokens"),
        sum($"img_toks").as("image_tokens"),
        sum($"cost").as("seq_tokens"))
      .orderBy($"source", $"seq")
  }

  /** m09 shard byte budget — sized so the synthetic corpus yields a few
    * shards per source; production uses ~100 MB–1 GB tar shards.
    */
  private final val ShardBudget = 4096L

  /** m09: WebDataset-style SHARD PACKING manifest — blobs greedily
    * packed into byte-budgeted shards per source (the tar-shard layout
    * multimodal training data actually ships in: sequential reads, no
    * per-sample object-store round trips), emitting one manifest row
    * per shard: item count, byte total, and an order-sensitive digest
    * chain over the members (what an integrity check of the written
    * shard verifies against). t12 packs token streams into training
    * sequences; this packs BINARY blobs into I/O-sized containers —
    * same discipline, different axis.
    *
    * Scale shape: t12's regime — ONE window shuffle keyed on source
    * (each source's shard sequence packs independently, exactly how a
    * 100 TB corpus shards per prefix), assignment by integer
    * prior-bytes division (exact, both engines), and the shard rollup
    * reuses the same source partitioning. The blob itself never moves
    * — only (id, size, digest) triples flow through the shuffle; the
    * writer tasks would stream the bytes shard-locally.
    */
  def m09(s: SparkSession, dir: String): DataFrame = {
    import s.implicits._
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy($"source").orderBy($"doc_id")
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    T(s, dir, "documents")
      .select($"doc_id", $"source",
        octet_length($"text".cast("binary")).as("nb"),
        md5($"text".cast("binary")).as("dg"))
      .withColumn("prior", coalesce(sum($"nb").over(w), lit(0L)))
      .withColumn("shard", expr(s"CAST(prior div $ShardBudget AS INT)"))
      .groupBy($"source", $"shard")
      .agg(count(lit(1)).as("n_items"),
        sum($"nb").as("shard_bytes"),
        md5(array_join(transform(
          array_sort(collect_list(struct($"doc_id", $"dg"))),
          x => x.getField("dg")), ",")).as("manifest_md5"))
      .orderBy($"source", $"shard")
  }

  /** The m07/m10-shared DuckDB replay of the stub dHash: one row per
    * (doc, grid row), 7 gradient-sign bits packed row-locally and
    * scaled into place by a CASE-form 2^(7·i); yields h(doc_id, phash).
    */
  private def phashCte: String = {
    val bits = (0 until 7).map { j =>
      s"(CASE WHEN ${sqlHex4("rd", 4 * j + 1)} > ${sqlHex4("rd", 4 * j + 5)} THEN ${1L << j} ELSE 0 END)"
    }.mkString(" + ")
    val scale = (0 until 8).map(i => s"WHEN $i THEN ${1L << (7 * i)}")
      .mkString(" ")
    s"""rows_ AS (SELECT doc_id, i,
       |  md5(dg || ':r' || CAST(i AS VARCHAR)) AS rd
       |  FROM (SELECT doc_id, md5(text) AS dg FROM documents),
       |       (SELECT unnest(range(0, 8)) AS i)),
       |rowbits AS (SELECT doc_id,
       |  ($bits) * (CASE i $scale END) AS rb
       |  FROM rows_),
       |h AS (SELECT doc_id, CAST(SUM(rb) AS BIGINT) AS phash
       |  FROM rowbits GROUP BY doc_id)""".stripMargin
  }

  val oracle: Map[String, String] = Map(
    "m11_interleave_pack" ->
      s"""WITH b AS (SELECT doc_id, source, n_chars,
         |  $ModalityCaseDuck AS modality
         |  FROM documents),
         |c AS (SELECT doc_id, source, modality,
         |  (n_chars + 3) // 4 AS text_toks,
         |  CASE WHEN modality <> 'text' THEN $ImageSlotTokens ELSE 0 END AS img_toks
         |  FROM b),
         |d AS (SELECT *, text_toks + img_toks AS cost FROM c),
         |e AS (SELECT *, CAST(coalesce(sum(cost) OVER (PARTITION BY source
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    0) AS BIGINT) AS prior FROM d),
         |f AS (SELECT *, CAST(prior // $SeqBudget AS INT) AS seq FROM e)
         |SELECT source, seq, count(*) AS n_docs,
         | count(*) FILTER (WHERE modality <> 'text') AS n_media,
         | CAST(sum(text_toks) AS BIGINT) AS text_tokens,
         | CAST(sum(img_toks) AS BIGINT) AS image_tokens,
         | CAST(sum(cost) AS BIGINT) AS seq_tokens
         |FROM f GROUP BY 1, 2 ORDER BY source, seq""".stripMargin,
    "m09_shard_pack" ->
      s"""WITH b AS (SELECT doc_id, source, strlen(text) AS nb, md5(text) AS dg
         |  FROM documents),
         |c AS (SELECT *, CAST(coalesce(sum(nb) OVER (PARTITION BY source
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    0) AS BIGINT) AS prior FROM b),
         |sh AS (SELECT source, doc_id, dg, nb,
         |  CAST(prior // $ShardBudget AS INT) AS shard FROM c)
         |SELECT source, shard, count(*) AS n_items,
         | CAST(sum(nb) AS BIGINT) AS shard_bytes,
         | md5(string_agg(dg, ',' ORDER BY doc_id)) AS manifest_md5
         |FROM sh GROUP BY 1, 2 ORDER BY source, shard""".stripMargin,
    "m12_interleave_exact" ->
      s"""WITH b AS (SELECT doc_id, source, text,
         |  $ModalityCaseDuck AS modality
         |  FROM documents),
         |c AS (SELECT doc_id, source, modality,
         |  len(regexp_extract_all(text, '${Text.bpePattern}', 0)) AS text_toks,
         |  CASE WHEN modality <> 'text' THEN $ImageSlotTokens ELSE 0 END AS img_toks
         |  FROM b),
         |d AS (SELECT *, text_toks + img_toks AS cost FROM c),
         |e AS (SELECT *, CAST(coalesce(sum(cost) OVER (PARTITION BY source
         |    ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
         |    0) AS BIGINT) AS prior FROM d),
         |f AS (SELECT *, CAST(prior // $SeqBudget AS INT) AS seq FROM e)
         |SELECT source, seq, count(*) AS n_docs,
         | count(*) FILTER (WHERE modality <> 'text') AS n_media,
         | CAST(sum(text_toks) AS BIGINT) AS text_tokens,
         | CAST(sum(img_toks) AS BIGINT) AS image_tokens,
         | CAST(sum(cost) AS BIGINT) AS seq_tokens
         |FROM f GROUP BY 1, 2 ORDER BY source, seq""".stripMargin,
    "m08_modality_route" ->
      """SELECT doc_id, substr(text, 1, 8) AS head8,
        | CASE
        |  WHEN substr(text, 1, 4) = 'RIFF' AND substr(text, 9, 4) = 'WAVE' THEN 'wav'
        |  WHEN substr(text, 1, 4) = 'GIF8' THEN 'gif'
        |  WHEN substr(text, 1, 4) = '%PDF' THEN 'pdf'
        |  WHEN substr(text, 5, 4) = 'ftyp' THEN 'mp4'
        |  WHEN substr(text, 1, 4) = 'OggS' THEN 'ogg'
        |  WHEN substr(text, 1, 3) = 'ID3' THEN 'mp3'
        |  WHEN substr(text, 1, 5) = '<?xml' OR substr(text, 1, 4) = '<svg' THEN 'xml'
        |  ELSE 'text' END AS modality
        |FROM documents ORDER BY doc_id""".stripMargin,
    "m07_phash_dedup" ->
      s"""WITH $phashCte,
         |g AS (SELECT phash, MIN(doc_id) AS keep_id, count(*) AS grp_size
         |  FROM h GROUP BY phash)
         |SELECT h.doc_id, h.phash, h.doc_id = g.keep_id AS keep, g.grp_size
         |FROM h JOIN g USING (phash) ORDER BY h.doc_id""".stripMargin,
    "m10_phash_near_dup" ->
      s"""WITH $phashCte,
         |chunks AS (SELECT doc_id, phash, c,
         |  (phash >> (CAST(c AS INT) * 14)) & 16383 AS chunk
         |  FROM h, (SELECT unnest(range(0, 4)) AS c)),
         |n AS (SELECT count(*) AS n_docs FROM h),
         |keep AS (SELECT c, chunk FROM (
         |  SELECT c, chunk, count(*) AS bsz FROM chunks GROUP BY 1, 2), n
         |  WHERE bsz <= greatest(50, 8 * n_docs // 16384)),
         |capped AS (SELECT ch.doc_id, ch.phash, ch.c, ch.chunk
         |  FROM chunks ch JOIN keep USING (c, chunk)),
         |pairs AS (SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b,
         |  CAST(bit_count(xor(a.phash, b.phash)) AS INT) AS hamming
         |  FROM capped a JOIN capped b
         |  ON a.c = b.c AND a.chunk = b.chunk AND a.doc_id < b.doc_id)
         |SELECT doc_a, doc_b, hamming FROM pairs
         |ORDER BY hamming, doc_a, doc_b LIMIT $NearDupK""".stripMargin,
    "m01_multimodal_meta" ->
      """SELECT doc_id,
        | octet_length(text::BLOB) AS n_bytes,
        | sha256(text) AS sha,
        | substr(text, 1, 8) AS head8
        |FROM documents ORDER BY doc_id""".stripMargin,
    // m02–m06: the stub decoder derives EVERYTHING from md5(blob),
    // which DuckDB computes natively — so the oracle rebuilds the full
    // decode → geometry → digest chain in SQL.
    "m03_feature_extract" -> {
      val qs = (0 until 16).map { d =>
        s"(${sqlHex4(s"md5(dg || ':$d')", 1)} - 32768) AS q$d"
      }.mkString(",\n        ")
      val sq = (0 until 16).map(d => s"CAST(q$d AS BIGINT) * q$d").mkString(" + ")
      val cat = (0 until 16).map(d => s"CAST(q$d AS VARCHAR)").mkString(" || ',' || ")
      s"""WITH meta AS (SELECT doc_id, md5(text) AS dg FROM documents),
         |q AS (SELECT doc_id,
         |        $qs
         |      FROM meta)
         |SELECT doc_id,
         |       CAST($sq AS BIGINT) AS sq_norm_int,
         |       md5($cat) AS emb_digest,
         |       CAST(16 AS INT) AS dims
         |FROM q ORDER BY doc_id""".stripMargin
    },
    "m02_decode_stub" ->
      s"""WITH meta AS (
         |  SELECT doc_id, CAST(octet_length(text::BLOB) AS INT) AS n_bytes,
         |         md5(text) AS digest
         |  FROM documents)
         |SELECT doc_id, n_bytes,
         |  CAST(64 + ${sqlHex4("digest", 1)} % 1024 AS INT) AS width,
         |  CAST(64 + ${sqlHex4("digest", 5)} % 1024 AS INT) AS height,
         |  CAST(1 + ${sqlHex4("digest", 9)} % 16 AS INT) AS n_frames,
         |  digest
         |FROM meta ORDER BY doc_id""".stripMargin,
    "m04_frame_sample" ->
      s"""WITH meta AS (
         |  SELECT doc_id, md5(text) AS dg,
         |         CAST(1 + ${sqlHex4("md5(text)", 9)} % 16 AS INT) AS n_frames
         |  FROM documents),
         |f AS (
         |  SELECT doc_id, n_frames, dg,
         |         CAST((j * n_frames) // LEAST(4, n_frames) AS INT) AS frame_idx
         |  FROM meta CROSS JOIN range(4) t(j)
         |  WHERE j < LEAST(4, n_frames))
         |SELECT doc_id, n_frames, frame_idx,
         |       md5(dg || ':' || CAST(frame_idx AS VARCHAR)) AS frame_hash
         |FROM f ORDER BY doc_id, frame_idx""".stripMargin,
    "m05_audio_chunk" ->
      """WITH d AS (
        |  SELECT doc_id, text, length(text) AS len
        |  FROM documents WHERE length(text) > 0),
        |c AS (
        |  SELECT doc_id, text, len,
        |         LEAST(6, GREATEST(1, (len - 64 + 48) // 48)) AS n_chunks
        |  FROM d)
        |SELECT doc_id, CAST(j AS INT) AS chunk_idx,
        |       CAST(j * 48 AS INT) AS char_off,
        |       CAST(LEAST(j * 48 + 64, len) - j * 48 AS INT) AS n_chunk_chars,
        |       md5(substr(text, CAST(j * 48 + 1 AS INT), 64)) AS chunk_hash
        |FROM c CROSS JOIN range(6) t(j) WHERE j < n_chunks
        |ORDER BY doc_id, chunk_idx""".stripMargin,
    "m06_resize_stub" ->
      s"""WITH meta AS (
         |  SELECT doc_id, md5(text) AS dg,
         |         CAST(64 + ${sqlHex4("md5(text)", 1)} % 1024 AS INT) AS w,
         |         CAST(64 + ${sqlHex4("md5(text)", 5)} % 1024 AS INT) AS h
         |  FROM documents),
         |g AS (
         |  SELECT doc_id, dg, w, h,
         |    GREATEST(1, CAST(round(w * LEAST(CAST(224 AS DOUBLE) / w,
         |      CAST(224 AS DOUBLE) / h)) AS INT)) AS ow,
         |    GREATEST(1, CAST(round(h * LEAST(CAST(224 AS DOUBLE) / w,
         |      CAST(224 AS DOUBLE) / h)) AS INT)) AS oh
         |  FROM meta)
         |SELECT doc_id, w AS src_w, h AS src_h, ow AS out_w, oh AS out_h,
         |       CAST((224 - ow) // 2 AS INT) AS pad_x,
         |       CAST((224 - oh) // 2 AS INT) AS pad_y,
         |       md5(dg || ':' || CAST(ow AS VARCHAR) || 'x'
         |           || CAST(oh AS VARCHAR)) AS resized_hash
         |FROM g ORDER BY doc_id""".stripMargin
  )

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "m01_multimodal_meta" -> (m01 _),
    "m02_decode_stub" -> (m02 _),
    "m03_feature_extract" -> (m03 _),
    "m04_frame_sample" -> (m04 _),
    "m05_audio_chunk" -> (m05 _),
    "m06_resize_stub" -> (m06 _),
    "m07_phash_dedup" -> (m07 _),
    "m08_modality_route" -> (m08 _),
    "m09_shard_pack" -> (m09 _),
    "m10_phash_near_dup" -> (m10 _),
    "m11_interleave_pack" -> (m11 _),
    "m12_interleave_exact" -> (m12 _)
  )
}
