package graft.sources

import scala.collection.immutable.ListMap

/** Pure-Scala VCF parser — no Spark dependency, unit-testable alone.
  *
  * Re-derives (from public knowledge of quinlan-lab/vcf2db's vcf2db.py —
  * the reference checkout is empty) the reference's header-driven schema
  * inference: `##INFO=<ID,Number,Type,Description>` lines drive column
  * names/types, VEP `CSQ`-style annotation field lists are recovered from
  * the Description's `Format: a|b|c` suffix, and per-sample genotypes are
  * classified into the GEMINI encoding (0=HOM_REF, 1=HET, 2=UNKNOWN,
  * 3=HOM_ALT) that the reference's gt_types blobs use.
  *
  * Scale note: header parsing is driver-side (headers are KB-sized);
  * record parsing is a pure line → record function, so Spark can apply it
  * per-partition over a text scan with no coordination.
  */
object VcfParser {

  /** One `##INFO`/`##FORMAT` header field spec. */
  final case class FieldSpec(
      id: String,
      number: String, // "0","1","A","R","G","." or an int >1
      vcfType: String, // Integer | Float | Flag | String | Character
      description: String)

  /** Parsed VCF header: field specs (in declaration order), annotation
    * (CSQ/ANN/BCSQ) sub-field names, sample ids, and the raw header text
    * (the reference stores it verbatim in a `vcf_header` table).
    */
  final case class Header(
      infos: ListMap[String, FieldSpec],
      formats: ListMap[String, FieldSpec],
      samples: Vector[String],
      rawLines: Vector[String]) {

    /** VEP-style annotation key present in this header, if any. */
    val annKey: Option[String] =
      Seq("CSQ", "ANN", "BCSQ").find(infos.contains)

    /** Annotation sub-field names parsed from the Description — VEP's
      * `... Format: Allele|Consequence|...` suffix, or SnpEff's
      * `Functional annotations: 'Allele | Annotation | ...'` quoted
      * pipe list (no Format: marker).
      */
    val annFields: Vector[String] = annKey match {
      case Some(k) =>
        val d = infos(k).description
        val i = d.lastIndexOf("Format:")
        val payload =
          if (i >= 0) d.substring(i + "Format:".length)
          else {
            val j = d.indexOf(':')
            if (j >= 0 && d.substring(j + 1).contains('|')) d.substring(j + 1)
            else ""
          }
        if (payload.isEmpty) Vector.empty
        else payload.trim
          .stripPrefix("'").stripSuffix("\"").stripSuffix("'")
          .split('|').map(_.trim).toVector
      case None => Vector.empty
    }
  }

  /** One parsed body line, still multi-allelic. */
  final case class Record(
      chrom: String,
      pos: Long,
      id: Option[String],
      ref: String,
      alts: Vector[String],
      qual: Option[Double],
      filter: Option[String],
      info: ListMap[String, String], // raw values; Flag → ""
      formatKeys: Vector[String],
      genotypes: Vector[Vector[String]]) // per sample, aligned to formatKeys

  /** GEMINI genotype classes (gt_types encoding). */
  val HomRef = 0; val Het = 1; val Unknown = 2; val HomAlt = 3

  // ---------------------------------------------------------------- header

  private val structured = """##(INFO|FORMAT)=<(.*)>\s*""".r

  /** Parses the `key=value` list inside `##INFO=<...>`, honoring quoted
    * values (Description routinely contains commas and `=`).
    */
  def parseKvList(s: String): ListMap[String, String] = {
    val out = ListMap.newBuilder[String, String]
    var i = 0
    while (i < s.length) {
      val eq = s.indexOf('=', i)
      if (eq < 0) { i = s.length }
      else {
        val key = s.substring(i, eq).trim
        if (eq + 1 < s.length && s.charAt(eq + 1) == '"') {
          // closing quote scan skips backslash-escaped quotes (\" is
          // legal inside Description per the VCF spec)
          var j = eq + 2
          while (j < s.length &&
            !(s.charAt(j) == '"' && s.charAt(j - 1) != '\\')) j += 1
          out += key -> s.substring(eq + 2, j).replace("\\\"", "\"")
          i = j + 2 // skip closing quote + comma
        } else {
          val comma = s.indexOf(',', eq)
          val stop = if (comma < 0) s.length else comma
          out += key -> s.substring(eq + 1, stop)
          i = stop + 1
        }
      }
    }
    out.result()
  }

  def parseHeader(lines: Iterable[String]): Header = {
    var infos = ListMap.empty[String, FieldSpec]
    var formats = ListMap.empty[String, FieldSpec]
    var samples = Vector.empty[String]
    val raw = Vector.newBuilder[String]
    lines.iterator.takeWhile(_.startsWith("#")).foreach { line =>
      raw += line
      line match {
        case structured(kind, body) =>
          val kv = parseKvList(body)
          val spec = FieldSpec(
            kv.getOrElse("ID", ""), kv.getOrElse("Number", "."),
            kv.getOrElse("Type", "String"), kv.getOrElse("Description", ""))
          if (kind == "INFO") infos += spec.id -> spec
          else formats += spec.id -> spec
        case l if l.startsWith("#CHROM") =>
          val cols = l.split('\t')
          if (cols.length > 9) samples = cols.drop(9).toVector
        case _ => ()
      }
    }
    Header(infos, formats, samples, raw.result())
  }

  // ---------------------------------------------------------------- records

  private def opt(s: String): Option[String] = if (s == "." || s.isEmpty) None else Some(s)

  def parseRecord(line: String): Record = {
    // limit -1: a trailing EMPTY sample column must survive the split,
    // or the genotype vector silently shrinks below the cohort width
    // and every per-sample index join downstream mis-attributes
    val f = line.split("\t", -1)
    val info: ListMap[String, String] =
      if (f.length <= 7 || f(7) == ".") ListMap.empty
      else ListMap.from(f(7).split(';').iterator.map { kv =>
        val eq = kv.indexOf('=')
        if (eq < 0) kv -> "" else kv.substring(0, eq) -> kv.substring(eq + 1)
      })
    val formatKeys =
      if (f.length > 8) f(8).split(':').toVector else Vector.empty
    val gts =
      if (f.length > 9) f.drop(9).toVector.map(_.split(':').toVector)
      else Vector.empty
    Record(
      chrom = f(0), pos = f(1).toLong, id = opt(f(2)), ref = f(3),
      alts = f(4).split(',').toVector.filter(_ != "."),
      qual = opt(f(5)).map(_.toDouble), filter = opt(f(6)),
      info = info, formatKeys = formatKeys, genotypes = gts)
  }

  def isBodyLine(line: String): Boolean =
    line.nonEmpty && !line.startsWith("#")

  /** Permissive-mode parse: None for malformed lines (truncated columns,
    * non-numeric POS/QUAL, bad genotype tokens) instead of failing the
    * task — at cohort scale a handful of corrupt rows must not kill a
    * multi-hour job; callers count the Nones.
    */
  def tryParseRecord(line: String): Option[Record] =
    try {
      val r = parseRecord(line)
      if (r.alts.isEmpty) None else Some(r)
    } catch { case scala.util.control.NonFatal(_) => None }

  // ------------------------------------------------------------- genotypes

  /** VEP's minimised-allele form of an ALT (the CSQ `Allele` field):
    * SNVs keep the alt; indels sharing their leading base with REF drop
    * it ("-" when nothing remains). Needed to attach CSQ entries to
    * indel alts — matching the raw ALT string alone silently drops
    * every indel annotation.
    */
  def vepAllele(ref: String, alt: String): String =
    if (ref.length == 1 && alt.length == 1) alt
    else if (ref.nonEmpty && alt.nonEmpty && ref(0) == alt(0)) {
      val t = alt.drop(1)
      if (t.isEmpty) "-" else t
    } else alt

  /** Allele indices of a GT string ("0/1", "1|1", "./."); None = missing. */
  def gtAlleles(gt: String): Vector[Option[Int]] =
    gt.split("[/|]").toVector.map(a => if (a == "." || a.isEmpty) None else Some(a.toInt))

  /** GEMINI gt_type of one sample's GT w.r.t. alt allele index `altIx`
    * (1-based in the GT encoding). Any missing allele → UNKNOWN; alleles
    * of OTHER alts count as ref after decompose (vt-decompose keeps the
    * record bi-allelic by demoting other alts).
    */
  def gtType(gt: String, altIx: Int = 1): Int = {
    val alleles = gtAlleles(gt)
    if (alleles.isEmpty || alleles.exists(_.isEmpty)) Unknown
    else {
      val n = alleles.count(_.contains(altIx))
      if (n == 0) HomRef
      else if (n == alleles.length) HomAlt
      else Het
    }
  }

  /** Per-variant genotype summary — the reference's call_rate / aaf /
    * num_hom_ref / num_het / num_hom_alt / num_unknown columns.
    */
  final case class GtStats(
      callRate: Double, aaf: Double,
      numHomRef: Int, numHet: Int, numHomAlt: Int, numUnknown: Int)

  def gtStats(gtTypes: Seq[Int]): GtStats = {
    val n = gtTypes.size
    val unknown = gtTypes.count(_ == Unknown)
    val called = n - unknown
    val het = gtTypes.count(_ == Het)
    val homAlt = gtTypes.count(_ == HomAlt)
    val homRef = gtTypes.count(_ == HomRef)
    GtStats(
      callRate = if (n == 0) 0.0 else called.toDouble / n,
      aaf = if (called == 0) 0.0 else (het + 2 * homAlt).toDouble / (2 * called),
      numHomRef = homRef, numHet = het, numHomAlt = homAlt, numUnknown = unknown)
  }

  // ------------------------------------------------------- schema plumbing

  /** SQL-unsafe / reserved column names get a `_` suffix, everything is
    * lowercased and non-alphanumerics become `_` — the reference's column
    * sanitization so INFO ids survive as SQL columns.
    */
  private val reserved = Set(
    "all", "alter", "and", "as", "between", "case", "check", "default",
    "distinct", "end", "filter", "group", "id", "in", "index", "is",
    "like", "not", "null", "or", "order", "select", "table", "where")

  def sanitize(name: String): String = {
    val base = name.toLowerCase.map(c => if (c.isLetterOrDigit) c else '_')
    val led = if (base.nonEmpty && base.head.isDigit) "_" + base else base
    if (reserved(led)) led + "_" else led
  }

  /** Worst-impact severity ranking over SO consequence terms — the
    * reference's HIGH/MED/LOW bucketing used to pick the single impact
    * row that gets denormalized onto `variants`. Lower rank = worse.
    */
  val severityRank: Map[String, Int] = Map(
    // HIGH
    "transcript_ablation" -> 0, "splice_acceptor_variant" -> 1,
    "splice_donor_variant" -> 2, "stop_gained" -> 3, "frameshift_variant" -> 4,
    "stop_lost" -> 5, "start_lost" -> 6,
    // MEDIUM
    "inframe_insertion" -> 10, "inframe_deletion" -> 11,
    "missense_variant" -> 12, "protein_altering_variant" -> 13,
    "splice_region_variant" -> 14,
    // LOW
    "synonymous_variant" -> 20, "stop_retained_variant" -> 21,
    "5_prime_UTR_variant" -> 22, "3_prime_UTR_variant" -> 23,
    "intron_variant" -> 24, "upstream_gene_variant" -> 25,
    "downstream_gene_variant" -> 26, "intergenic_variant" -> 27)

  def severityBucket(consequence: String): String = {
    val r = severityRank.getOrElse(consequence, 99)
    if (r < 10) "HIGH" else if (r < 20) "MED" else "LOW"
  }
}
