package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Tabix (.tbi) index reader — htslib's coordinate index over BGZF-
  * compressed, coordinate-sorted tab files (format: the public
  * SAM/tabix specification; Li 2011, "Tabix: fast retrieval of
  * sequence features from generic TAB-delimited files").
  *
  * The index maps genomic regions to CHUNKS of the compressed file:
  * virtual offsets packing (BGZF block compressed offset << 16 |
  * in-block decompressed offset). The planner turns a pushed
  * chrom/pos region into the merged block ranges that can contain
  * matching records — replacing the per-split first-key boundary
  * sampling (one bounded head-read per split) with zero data reads:
  * the index IS the key sample, computed once at write time. At
  * 100 TB that converts region-query planning from "touch every
  * shard's head" to "read one dim-sized .tbi per shard".
  *
  * Binning is the standard UCSC 5-level scheme (bins 0, 1-8, 9-72,
  * 73-584, 585-4680, 4681-37448 covering 512 Mb/64 Mb/8 Mb/1 Mb/
  * 128 kb/16 kb spans); the 16 kb-window linear index lower-bounds
  * the chunk list exactly as htslib does.
  */
private[graft] object Tabix {

  /** One reference sequence's index: chunks per bin + linear index. */
  final case class Ref(bins: Map[Int, Vector[(Long, Long)]],
      linear: Vector[Long])

  final case class Index(names: Vector[String], refs: Vector[Ref]) {
    def ref(chrom: String): Option[Ref] = {
      val i = names.indexOf(chrom)
      if (i < 0) None else Some(refs(i))
    }
  }

  /** Fully read + decompress (tabix indexes are dim-sized: ~100 KB/GB
    * of data; GZIPInputStream natively consumes the concatenated-
    * member BGZF container).
    */
  def read(raw: java.io.InputStream): Index = {
    val in = new java.util.zip.GZIPInputStream(raw, 1 << 16)
    val bos = new java.io.ByteArrayOutputStream(1 << 16)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    val b = ByteBuffer.wrap(bos.toByteArray).order(ByteOrder.LITTLE_ENDIAN)
    require(b.remaining >= 36, "tabix: truncated header")
    val magic = Array.fill(4)(b.get())
    require(magic.sameElements(Array[Byte]('T', 'B', 'I', 1)),
      "tabix: bad magic")
    val nRef = b.getInt
    require(nRef >= 0 && nRef < (1 << 24), s"tabix: implausible n_ref $nRef")
    b.getInt; b.getInt; b.getInt; b.getInt; b.getInt; b.getInt // format..skip
    val lNm = b.getInt
    val nmBytes = new Array[Byte](lNm)
    b.get(nmBytes)
    val names = new String(nmBytes, "UTF-8").split('\u0000') // NUL-terminated names
      .toVector.filter(_.nonEmpty)
    require(names.length == nRef,
      s"tabix: $nRef refs but ${names.length} names")
    val refs = Vector.fill(nRef) {
      val nBin = b.getInt
      val bins = (0 until nBin).map { _ =>
        val bin = b.getInt
        val nChunk = b.getInt
        bin -> Vector.fill(nChunk)((b.getLong, b.getLong))
      }.toMap
      val nIntv = b.getInt
      Ref(bins, Vector.fill(nIntv)(b.getLong))
    }
    Index(names, refs)
  }

  /** UCSC bins overlapping [beg, end) — 0-based half-open, clamped to
    * the scheme's 512 Mb ceiling.
    */
  def reg2bins(beg0: Long, end0: Long): Seq[Int] = {
    val beg = math.max(0L, beg0)
    val end = math.min(end0, 1L << 29) - 1 // inclusive
    if (end < beg) return Seq.empty
    val out = Vector.newBuilder[Int]
    out += 0
    var k = 1 + (beg >> 26).toInt
    while (k <= 1 + (end >> 26).toInt) { out += k; k += 1 }
    k = 9 + (beg >> 23).toInt
    while (k <= 9 + (end >> 23).toInt) { out += k; k += 1 }
    k = 73 + (beg >> 20).toInt
    while (k <= 73 + (end >> 20).toInt) { out += k; k += 1 }
    k = 585 + (beg >> 17).toInt
    while (k <= 585 + (end >> 17).toInt) { out += k; k += 1 }
    k = 4681 + (beg >> 14).toInt
    while (k <= 4681 + (end >> 14).toInt) { out += k; k += 1 }
    out.result()
  }

  /** Virtual-offset chunk ranges that can contain records of
    * `chrom:[posMin, posMax]` (1-based closed, the RegionFilter
    * convention), lower-bounded by the linear index. Empty when the
    * chrom has no indexed records — which in a tabix-indexed file
    * means no records at all, so empty is an exact answer, not a
    * fallback.
    */
  def chunkRanges(idx: Index, chrom: String,
      posMin: Long, posMax: Long): Vector[(Long, Long)] = {
    val r = idx.ref(chrom).getOrElse(return Vector.empty)
    val beg = math.max(0L, math.max(1L, posMin) - 1) // 0-based
    val end = math.min(posMax, 1L << 29) // half-open
    if (end <= beg) return Vector.empty
    val minOff = {
      val w = (beg >> 14).toInt
      if (r.linear.isEmpty) 0L
      else r.linear(math.min(w, r.linear.length - 1))
    }
    reg2bins(beg, end).flatMap(r.bins.getOrElse(_, Vector.empty))
      .filter { case (_, ve) => ve > minOff }
      .sortBy(_._1)
      .toVector
  }

  /** Merge chunk ranges whose BLOCK spans overlap or are adjacent
    * (separated splits must be ≥1 whole block apart: a split's end
    * covers lines STARTING at its end offset, so two splits meeting at
    * one block would double-read the line opening that block).
    */
  def mergeByBlock(ranges: Seq[(Long, Long)]): Vector[(Long, Long)] = {
    val sorted = ranges.sortBy(_._1)
    val out = Vector.newBuilder[(Long, Long)]
    var cur: (Long, Long) = null
    sorted.foreach { case (vs, ve) =>
      if (cur == null) cur = (vs, ve)
      else if ((vs >>> 16) <= (cur._2 >>> 16) + 1)
        cur = (cur._1, math.max(cur._2, ve))
      else { out += cur; cur = (vs, ve) }
    }
    if (cur != null) out += cur
    out.result()
  }
}
