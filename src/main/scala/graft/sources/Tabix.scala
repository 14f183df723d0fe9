package graft.sources

import java.nio.{ByteBuffer, ByteOrder}

/** Tabix (.tbi) and CSI (.csi) index readers — htslib's coordinate
  * indexes over BGZF-compressed, coordinate-sorted tab files (formats:
  * the public SAM/tabix and CSI specifications; Li 2011, "Tabix: fast
  * retrieval of sequence features from generic TAB-delimited files").
  *
  * Both map genomic regions to CHUNKS of the compressed file: virtual
  * offsets packing (BGZF block compressed offset << 16 | in-block
  * decompressed offset). The planner turns a pushed chrom/pos region
  * into the merged block ranges that can contain matching records —
  * replacing the per-split first-key boundary sampling (one bounded
  * head-read per split) with zero data reads: the index IS the key
  * sample, computed once at write time. At 100 TB that converts
  * region-query planning from "touch every shard's head" to "read one
  * dim-sized index per shard".
  *
  * .tbi uses the fixed UCSC 5-level scheme (min_shift 14, depth 5:
  * bins 0, 1-8, 9-72, 73-584, 585-4680, 4681-37448 spanning 512 Mb
  * down to 16 kb) plus a 16 kb-window linear index; .csi generalizes
  * to configurable (min_shift, depth) and replaces the linear index
  * with a per-bin `loffset` lower bound. Sequence names come from the
  * index itself (.tbi always; .csi when written by `tabix --csi`,
  * whose aux block carries the tabix config) or, for a bare
  * bcftools-style .csi, from the VCF header's ##contig order — the
  * same resolution htslib applies.
  */
private[graft] object Tabix {

  /** One reference sequence's index: chunks + loffset per bin, plus
    * the .tbi linear index (empty for .csi).
    */
  final case class Ref(bins: Map[Int, Vector[(Long, Long)]],
      loffset: Map[Int, Long], linear: Vector[Long])

  final case class Index(names: Vector[String], refs: Vector[Ref],
      minShift: Int, depth: Int) {
    def ref(chrom: String): Option[Ref] = {
      val i = names.indexOf(chrom)
      if (i < 0) None else Some(refs(i))
    }
  }

  /** Fully read + decompress (indexes are dim-sized: ~100 KB/GB of
    * data; GZIPInputStream natively consumes the concatenated-member
    * BGZF container).
    */
  private def inflate(raw: java.io.InputStream): ByteBuffer = {
    val in = new java.util.zip.GZIPInputStream(raw, 1 << 16)
    val bos = new java.io.ByteArrayOutputStream(1 << 16)
    val buf = new Array[Byte](1 << 16)
    var n = in.read(buf)
    while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
    ByteBuffer.wrap(bos.toByteArray).order(ByteOrder.LITTLE_ENDIAN)
  }

  private def nulNames(bytes: Array[Byte]): Vector[String] =
    new String(bytes, "UTF-8").split('\u0000').toVector.filter(_.nonEmpty)

  /** Read a .tbi index. */
  def read(raw: java.io.InputStream): Index = {
    val b = inflate(raw)
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
    val names = nulNames(nmBytes)
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
      Ref(bins, Map.empty, Vector.fill(nIntv)(b.getLong))
    }
    Index(names, refs, minShift = 14, depth = 5)
  }

  /** Read a .csi index. `contigNames` supplies the reference order
    * when the aux block carries no names (bcftools-style .csi) — pass
    * the data file's ##contig header order.
    */
  def readCsi(raw: java.io.InputStream,
      contigNames: => Seq[String] = Seq.empty): Index = {
    val b = inflate(raw)
    require(b.remaining >= 16, "csi: truncated header")
    val magic = Array.fill(4)(b.get())
    require(magic.sameElements(Array[Byte]('C', 'S', 'I', 1)),
      "csi: bad magic")
    val minShift = b.getInt
    val depth = b.getInt
    require(minShift > 0 && minShift <= 32 && depth >= 0 && depth <= 10,
      s"csi: implausible geometry ($minShift, $depth)")
    val lAux = b.getInt
    val aux = new Array[Byte](lAux)
    b.get(aux)
    // tabix --csi puts the full tabix config in aux: 7 int32s
    // (format, col_seq, col_beg, col_end, meta, skip, l_nm) + names
    val auxNames =
      if (lAux >= 28) {
        val ab = ByteBuffer.wrap(aux).order(ByteOrder.LITTLE_ENDIAN)
        ab.position(24)
        val lNm = ab.getInt
        if (lNm > 0 && 28 + lNm <= lAux) {
          val nb = new Array[Byte](lNm); ab.get(nb); nulNames(nb)
        } else Vector.empty
      } else Vector.empty
    val nRef = b.getInt
    require(nRef >= 0 && nRef < (1 << 24), s"csi: implausible n_ref $nRef")
    val names =
      if (auxNames.length == nRef) auxNames
      else {
        val fromHeader = contigNames.toVector
        require(fromHeader.length >= nRef,
          s"csi: no names in aux and only ${fromHeader.length} header " +
            s"contigs for $nRef refs")
        fromHeader.take(nRef)
      }
    val refs = Vector.fill(nRef) {
      val nBin = b.getInt
      val entries = (0 until nBin).map { _ =>
        val bin = b.getInt
        val loff = b.getLong
        val nChunk = b.getInt
        (bin, loff, Vector.fill(nChunk)((b.getLong, b.getLong)))
      }
      Ref(entries.map(e => e._1 -> e._3).toMap,
        entries.map(e => e._1 -> e._2).toMap, Vector.empty)
    }
    Index(names, refs, minShift, depth)
  }

  /** Bins overlapping [beg, end) — 0-based half-open, in the
    * (minShift, depth) scheme; (14, 5) reproduces the UCSC .tbi bins.
    */
  def reg2bins(beg0: Long, end0: Long,
      minShift: Int = 14, depth: Int = 5): Seq[Int] = {
    val maxPos = 1L << (minShift + depth * 3)
    val beg = math.max(0L, beg0)
    val end = math.min(end0, maxPos) - 1 // inclusive
    if (end < beg) return Seq.empty
    val out = Vector.newBuilder[Int]
    var l = 0
    var t = 0L
    var s = minShift + depth * 3
    while (l <= depth) {
      var k = t + (beg >> s)
      val e = t + (end >> s)
      while (k <= e) { out += k.toInt; k += 1 }
      t += 1L << (l * 3)
      s -= 3
      l += 1
    }
    out.result()
  }

  /** Virtual-offset chunk ranges that can contain records of
    * `chrom:[posMin, posMax]` (1-based closed, the RegionFilter
    * convention), lower-bounded by the .tbi linear index or the .csi
    * leaf-bin loffset. Empty when the chrom has no indexed records —
    * which in an indexed file means no records at all, so empty is an
    * exact answer, not a fallback.
    */
  def chunkRanges(idx: Index, chrom: String,
      posMin: Long, posMax: Long): Vector[(Long, Long)] = {
    val r = idx.ref(chrom).getOrElse(return Vector.empty)
    val maxPos = 1L << (idx.minShift + idx.depth * 3)
    val beg = math.max(0L, math.max(1L, posMin) - 1) // 0-based
    val end = math.min(posMax, maxPos) // half-open
    if (end <= beg) return Vector.empty
    val minOff =
      if (r.linear.nonEmpty) {
        val w = (beg >> idx.minShift).toInt
        r.linear(math.min(w, r.linear.length - 1))
      } else if (r.loffset.nonEmpty) {
        // leaf bin of beg: first-leaf-id + (beg >> minShift)
        var t = 0L
        (0 until idx.depth).foreach(l => t += 1L << (l * 3))
        r.loffset.getOrElse((t + (beg >> idx.minShift)).toInt, 0L)
      } else 0L
    reg2bins(beg, end, idx.minShift, idx.depth)
      .flatMap(r.bins.getOrElse(_, Vector.empty))
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
