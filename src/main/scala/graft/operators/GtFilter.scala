package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GEMINI's wildcard genotype-filter DSL — the reference's most
  * distinctive query form (`gemini query --gt-filter`):
  *
  * {{{ (COLUMN).(SAMPLE_WILDCARD).(RULE).(QUANTIFIER) }}}
  *
  * e.g. `(gt_types).(phenotype==2).(==HET).(all)` = "every affected
  * sample is heterozygous", or `(gt_depths).(*).(>=20).(any)`.
  * Compiles to ONE per-row Spark Column over the unpacked genotype
  * arrays: the sample wildcard resolves driver-side against the
  * dim-sized samples table (names → 1-based gt-array indexes via the
  * header sample order), and the quantifier folds the per-sample
  * `element_at` predicates — codegen, no explode, no shuffle; the
  * variants corpus is scanned once however many samples the wildcard
  * selects.
  */
object GtFilter {

  /** GEMINI genotype-class names usable as RULE operands. */
  private val GtClasses = Map(
    "HOM_REF" -> 0, "HET" -> 1, "UNKNOWN" -> 2, "HOM_ALT" -> 3)

  private val SpecRe = """^\((\w+)\)\.\((.+?)\)\.\((.+?)\)\.\((.+?)\)$""".r
  private val CmpRe = """^(==|!=|>=|<=|>|<)\s*(.+)$""".r
  private val SampleCmpRe = """^(\w+)\s*(==|!=)\s*'?([^']*)'?$""".r
  private val CountRe = """^count\s*(==|!=|>=|<=|>|<)\s*(\d+)$""".r

  /** Compile a wildcard spec into a row predicate.
    *
    * @param spec          the GEMINI wildcard string
    * @param samples       the samples table (PED columns as strings)
    * @param headerSamples VCF sample order (drives gt-array indexes)
    */
  def compile(spec: String, samples: DataFrame,
      headerSamples: Seq[String]): Column = spec.trim match {
    case SpecRe(colName, sampleW, rule, quant) =>
      val ixOf = headerSamples.zipWithIndex
        .map { case (n, i) => n -> (i + 1) }.toMap
      // sample wildcard → names (driver-side, sample-dim-sized)
      val names: Seq[String] = sampleW.trim match {
        case "*" => headerSamples
        case SampleCmpRe(field, op, value) =>
          require(samples.columns.contains(field),
            s"gt-filter: samples table has no column '$field'")
          val base = samples.select(col("sample_id"), col(field))
          val hit =
            if (op == "==") base.filter(col(field) === value)
            else base.filter(col(field) =!= value)
          hit.collect().map(_.getString(0)).toSeq.filter(ixOf.contains)
        case w => throw new IllegalArgumentException(
          s"gt-filter: bad sample wildcard '$w' (want * or field==value)")
      }
      require(names.nonEmpty,
        s"gt-filter: sample wildcard '$sampleW' selects no VCF samples")
      // per-sample cell predicate
      val (op, operandRaw) = rule.trim match {
        case CmpRe(o, v) => (o, v.trim)
        case r => throw new IllegalArgumentException(
          s"gt-filter: bad rule '$r' (want <op><value>, e.g. ==HET, >=20)")
      }
      val operand: Column = GtClasses.get(operandRaw) match {
        case Some(cls) => lit(cls)
        case None =>
          try lit(operandRaw.toDouble)
          catch { case _: NumberFormatException => lit(operandRaw) }
      }
      def pred(name: String): Column = {
        val cell = element_at(col(colName), ixOf(name))
        op match {
          case "==" => cell === operand
          case "!=" => cell =!= operand
          case ">=" => cell >= operand
          case "<=" => cell <= operand
          case ">" => cell > operand
          case "<" => cell < operand
        }
      }
      // quantifier fold
      quant.trim match {
        case "all" => names.map(pred).reduce(_ && _)
        case "any" => names.map(pred).reduce(_ || _)
        case "none" => names.map(n => !pred(n)).reduce(_ && _)
        case CountRe(cop, n) =>
          val cnt = names.map(s => when(pred(s), 1).otherwise(0))
            .reduce(_ + _)
          val k = n.toInt
          cop match {
            case "==" => cnt === k
            case "!=" => cnt =!= k
            case ">=" => cnt >= k
            case "<=" => cnt <= k
            case ">" => cnt > k
            case "<" => cnt < k
          }
        case q => throw new IllegalArgumentException(
          s"gt-filter: bad quantifier '$q' (want all|any|none|count<op>N)")
      }
    case s => throw new IllegalArgumentException(
      s"gt-filter: bad spec '$s' (want (col).(samples).(rule).(quant))")
  }
}
