package graft.sources

import org.apache.hadoop.fs.FSDataInputStream

/** BGZF block machinery for splittable compressed VCF shards.
  *
  * BGZF (the htslib/bgzip format, SAM spec §4.1 — public knowledge) is
  * a sequence of independent gzip members, each ≤ 64 KiB of compressed
  * data, whose total length is recorded in a BC extra subfield in the
  * member's own header. Because every block is self-contained and
  * self-sizing, a reader dropped at ANY byte offset can resync to the
  * next block start (block starts are at most 65536 bytes apart) and
  * decompress independently from there — which is what lets ONE huge
  * .vcf.gz shard fan out across executors instead of serializing on a
  * single task (the round-6 scale bound this removes). Plain gzip has
  * no such structure and stays unsplittable.
  */
private[sources] object Bgzf {

  /** Max distance from an arbitrary offset to the next block start: a
    * block's total size is ≤ 65536 (BSIZE is u16 of size-1).
    */
  private val MaxBlock = 65536

  private def u16(b: Array[Byte], i: Int): Int =
    (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)

  /** Total block length (BSIZE+1) if `buf(off…)` holds a valid BGZF
    * member header, else -1. Validates gzip magic, CM=deflate, FEXTRA
    * set, and the BC subfield inside XLEN — ~2^-40 false-positive odds
    * on random bytes even before the second-block confirmation.
    */
  def headerBlockLen(buf: Array[Byte], off: Int, len: Int): Int = {
    if (off + 12 > len) return -1
    if (buf(off) != 0x1f.toByte || buf(off + 1) != 0x8b.toByte ||
      buf(off + 2) != 8.toByte || (buf(off + 3) & 4) == 0) return -1
    val xlen = u16(buf, off + 10)
    if (off + 12 + xlen > len) return -1
    var i = off + 12
    val end = off + 12 + xlen
    while (i + 4 <= end) {
      val slen = u16(buf, i + 2)
      if (buf(i) == 66.toByte && buf(i + 1) == 67.toByte && slen == 2) {
        if (i + 6 > end) return -1
        val total = u16(buf, i + 4) + 1
        // a block is at least its own header + 8-byte footer
        return if (total >= 12 + xlen + 8) total else -1
      }
      i += 4 + slen
    }
    -1
  }

  /** Block length at absolute `off` via positioned read (no seek state
    * disturbed), -1 when invalid or past EOF.
    */
  def blockLenAt(in: FSDataInputStream, off: Long, fileLen: Long): Int = {
    if (off >= fileLen) return -1
    val n = math.min(MaxBlock.toLong, fileLen - off).toInt
    val head = new Array[Byte](math.min(n, 4096))
    in.readFully(off, head, 0, head.length)
    headerBlockLen(head, 0, head.length)
  }

  /** Whether the stream holds a BGZF file (valid block at offset 0). */
  def isBgzf(in: FSDataInputStream, fileLen: Long): Boolean =
    fileLen >= 28 && blockLenAt(in, 0L, fileLen) > 0

  /** First block START at/after `from` — the split-boundary aligner.
    * Scans at most one block's worth of bytes for a candidate header and
    * CONFIRMS it by validating the following block header (or exact
    * EOF), so a compressed-payload byte string that happens to look
    * like a header cannot produce a bogus boundary. Returns `fileLen`
    * when `from` is past the last block, -1 when no boundary could be
    * established (caller must fall back to not splitting).
    */
  def nextBlockStart(in: FSDataInputStream, from: Long, fileLen: Long): Long = {
    if (from >= fileLen) return fileLen
    val win = math.min((MaxBlock + 4096).toLong, fileLen - from).toInt
    val buf = new Array[Byte](win)
    in.readFully(from, buf, 0, win)
    var i = 0
    while (i < win) {
      if (buf(i) == 0x1f.toByte && i + 1 < win && buf(i + 1) == 0x8b.toByte) {
        val len = headerBlockLen(buf, i, win)
        if (len > 0) {
          val nxt = from + i + len
          val confirmed = nxt == fileLen ||
            (if (nxt + 12 <= from + win) headerBlockLen(buf, (nxt - from).toInt, win) > 0
             else blockLenAt(in, nxt, fileLen) > 0)
          if (confirmed) return from + i
        }
      }
      i += 1
    }
    -1L
  }
}

/** Line reader over a BGZF stream starting at a BLOCK boundary,
  * reporting each line's ownership position in COMPRESSED offset space:
  * a line beginning at a block's first decompressed byte owns the
  * block's start offset; any mid-block start compares as start+1.
  * Split ends are always block-aligned (planning aligns them), so the
  * text-split ownership contract ("a line starting at exactly `end`
  * still belongs to this split; the next reader unconditionally
  * discards its first line") carries over verbatim — the partition
  * reader's `pos > end` check needs no BGZF special case.
  */
private[sources] class BgzfLineReader(in: FSDataInputStream, startBlock: Long,
    fileLen: Long) extends AutoCloseable {

  private val inflater = new java.util.zip.Inflater(true)
  private var nextBlockOff: Long = startBlock
  private var curBlockStart: Long = startBlock
  private var buf: Array[Byte] = Array.emptyByteArray
  private var bufPos = 0
  private var eof = false
  // one-byte pushback for lone-CR line terminators, with its position
  private var pbByte = -1
  private var pbPos = 0L

  /** Loads blocks until ≥1 decompressed byte is available (EOF-marker
    * blocks decompress to nothing and are skipped) or the file ends.
    */
  private def ensure(): Unit = {
    while (!eof && bufPos >= buf.length) {
      if (nextBlockOff >= fileLen) { eof = true; return }
      val off = nextBlockOff
      val fixed = new Array[Byte](12)
      in.readFully(off, fixed, 0, 12)
      val xlen = (fixed(10) & 0xff) | ((fixed(11) & 0xff) << 8)
      val head = new Array[Byte](12 + xlen)
      System.arraycopy(fixed, 0, head, 0, 12)
      in.readFully(off + 12, head, 12, xlen)
      val total = Bgzf.headerBlockLen(head, 0, head.length)
      if (total < 0) throw new java.io.IOException(
        s"corrupt BGZF block at offset $off (not a valid member header)")
      val rest = new Array[Byte](total - 12 - xlen)
      in.readFully(off + 12 + xlen, rest, 0, rest.length)
      val isize = (rest(rest.length - 4) & 0xff) |
        ((rest(rest.length - 3) & 0xff) << 8) |
        ((rest(rest.length - 2) & 0xff) << 16) |
        ((rest(rest.length - 1) & 0xff) << 24)
      val out = new Array[Byte](isize)
      if (isize > 0) {
        inflater.reset()
        inflater.setInput(rest, 0, rest.length - 8)
        var done = 0
        while (done < isize && !inflater.finished())
          done += inflater.inflate(out, done, isize - done)
        if (done != isize) throw new java.io.IOException(
          s"corrupt BGZF block at offset $off (ISIZE $isize, inflated $done)")
      }
      buf = out; bufPos = 0
      curBlockStart = off
      nextBlockOff = off + total
    }
  }

  /** Position the reader at a tabix virtual offset's in-block byte:
    * skips `n` decompressed bytes of the FIRST block. The index
    * guarantees that lands on a record start, so no first-line
    * discard applies (tabix chunk offsets are exact, unlike split
    * boundaries).
    */
  def seekInFirstBlock(n: Int): Unit = if (n > 0) {
    ensure()
    if (!eof) bufPos = math.min(n, buf.length)
  }

  /** Ownership offset of the next unread byte (see class doc);
    * Long.MaxValue at EOF so any `pos > end` gate stops cleanly.
    */
  def nextPos: Long = {
    if (pbByte >= 0) return pbPos
    ensure()
    if (eof) Long.MaxValue
    else if (bufPos == 0) curBlockStart
    else curBlockStart + 1
  }

  private def readByte(): Int = {
    if (pbByte >= 0) { val b = pbByte; pbByte = -1; return b }
    ensure()
    if (eof) return -1
    val b = buf(bufPos) & 0xff
    bufPos += 1
    b
  }

  def readLine(): String = {
    val first = readByte()
    if (first < 0) return null
    val out = new java.io.ByteArrayOutputStream(256)
    var b = first
    while (b >= 0 && b != '\n' && b != '\r') { out.write(b); b = readByte() }
    if (b == '\r') { // CRLF eats both; lone CR pushes the byte back
      val p = nextPos
      val nb = readByte()
      if (nb >= 0 && nb != '\n') { pbByte = nb; pbPos = p }
    }
    new String(out.toByteArray, java.nio.charset.StandardCharsets.UTF_8)
  }

  override def close(): Unit = { inflater.end(); in.close() }
}
