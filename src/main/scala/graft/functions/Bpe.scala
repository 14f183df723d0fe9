package graft.functions

import java.util.regex.Pattern

import scala.collection.concurrent.TrieMap

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Byte-level BPE token COUNTING against a loadable merges table in
  * the public GPT-2 `merges.txt` format (one `left right` pair per
  * line, rank = line order, optional `#version` header) — the exact
  * token cost behind t12/m11's packing when a deployment has a real
  * tokenizer, replacing the calibrated chars/4 overestimate without
  * touching the packing plan (`m11With(s, dir,
  * "bpe_count(text, '/path/merges.txt')")`).
  *
  * The algorithm is the published byte-level BPE (GPT-2 paper +
  * reference implementation, public knowledge): pretokenize with the
  * GPT-2 regex, map each pretoken's UTF-8 bytes through the
  * bytes-to-unicode table (printable bytes map to themselves, the
  * rest shift to 256+n so every byte is a printable symbol and merges
  * files stay whitespace-safe), then greedily merge the lowest-rank
  * adjacent pair to fixpoint. Only the COUNT is returned — packing
  * needs costs, not token ids, so no vocab file is required.
  *
  * Scale shape: the merges table loads ONCE per executor (per path)
  * into a process-wide cache; the per-row work is pure local CPU
  * inside whole-stage codegen — no broadcast join, no shuffle, no UDF
  * serialization boundary.
  */
object Bpe {

  /** GPT-2 bytes→unicode: bytes that are printable and not whitespace
    * map to themselves; the remaining 68 shift to 256, 257, … in byte
    * order. Gives a reversible byte→char code whose output never
    * contains whitespace, so merges files split on ' ' safely.
    */
  private val byteEncoder: Array[Char] = {
    val enc = new Array[Char](256)
    val direct = (33 to 126) ++ (161 to 172) ++ (174 to 255)
    val directSet = direct.toSet
    direct.foreach(b => enc(b) = b.toChar)
    var n = 0
    (0 to 255).foreach { b =>
      if (!directSet(b)) { enc(b) = (256 + n).toChar; n += 1 }
    }
    enc
  }

  /** The GPT-2 pretokenizer (published regex), Unicode classes on. */
  private val pretoken: Pattern = Pattern.compile(
    """'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+(?!\S)|\s+""",
    Pattern.UNICODE_CHARACTER_CLASS)

  final class Model(val ranks: java.util.HashMap[String, Integer]) {
    /** Token count of one pretoken's symbol sequence under the merges. */
    private[Bpe] def mergedLength(sym0: Array[String]): Int = {
      var sym = sym0
      var done = sym.length < 2
      while (!done) {
        // lowest-rank adjacent pair
        var best = -1
        var bestRank = Int.MaxValue
        var i = 0
        while (i < sym.length - 1) {
          val r = ranks.get(sym(i) + " " + sym(i + 1))
          if (r != null && r < bestRank) { bestRank = r; best = i }
          i += 1
        }
        if (best < 0) done = true
        else {
          // merge EVERY occurrence of the winning pair, left to right
          val a = sym(best); val b = sym(best + 1)
          val out = new scala.collection.mutable.ArrayBuffer[String](sym.length)
          var j = 0
          while (j < sym.length) {
            if (j < sym.length - 1 && sym(j) == a && sym(j + 1) == b) {
              out += a + b; j += 2
            } else { out += sym(j); j += 1 }
          }
          sym = out.toArray
          done = sym.length < 2
        }
      }
      sym.length
    }
  }

  private val cache = TrieMap.empty[String, Model]

  def load(path: String): Model = cache.getOrElseUpdate(path, {
    val src = scala.io.Source.fromFile(path)(scala.io.Codec.UTF8)
    try {
      val ranks = new java.util.HashMap[String, Integer]()
      var rank = 0
      src.getLines().foreach { line =>
        val t = line.trim
        // Only the `#version: …` header is a comment in GPT-2-format
        // merges files: '#' (byte 0x23) maps to itself in
        // bytes-to-unicode, so lines like "# #" or "## #" are REAL
        // merges and must not be dropped.
        if (t.nonEmpty && !t.startsWith("#version")) {
          // rank = order of FIRST occurrence; later duplicates ignored
          if (ranks.putIfAbsent(t, rank) == null) rank += 1
        }
      }
      new Model(ranks)
    } finally src.close()
  })

  /** Codegen/eval entry: exact BPE token count of `text` under the
    * merges at `path`. Deterministic, pure function of (path contents,
    * text).
    */
  def count(text: UTF8String, path: UTF8String): Int = {
    val model = load(path.toString)
    val m = pretoken.matcher(text.toString)
    var total = 0
    while (m.find()) {
      val bytes = m.group().getBytes(java.nio.charset.StandardCharsets.UTF_8)
      val sym = new Array[String](bytes.length)
      var i = 0
      while (i < bytes.length) {
        sym(i) = String.valueOf(byteEncoder(bytes(i) & 0xff)); i += 1
      }
      total += model.mergedLength(sym)
    }
    total
  }
}

/** `bpe_count(string, merges_path) → int` — exact byte-level BPE token
  * count (see [[Bpe]]). The path argument must be foldable: one merges
  * table per plan, loaded once per executor.
  */
case class BpeCount(text: Expression, path: Expression)
    extends BinaryExpression {
  override def left: Expression = text
  override def right: Expression = path
  override def dataType: DataType = IntegerType
  override def checkInputDataTypes(): TypeCheckResult =
    (text.dataType, path.dataType) match {
      case (StringType, StringType) if path.foldable =>
        TypeCheckResult.TypeCheckSuccess
      case (StringType, StringType) => TypeCheckResult.TypeCheckFailure(
        "bpe_count path must be a constant")
      case (t, p) => TypeCheckResult.TypeCheckFailure(
        s"bpe_count expects (string, string), got ($t, $p)")
    }
  override protected def nullSafeEval(t: Any, p: Any): Any =
    Bpe.count(t.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) => s"graft.functions.Bpe.count($t, $p)")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): BpeCount =
    copy(text = newLeft, path = newRight)
}
