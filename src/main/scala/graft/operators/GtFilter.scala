package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** GEMINI's genotype-filter DSL — the reference's most distinctive
  * query form (`gemini query --gt-filter`). Two clause shapes, freely
  * combinable with `and` / `or` / `not` and parentheses:
  *
  *  - wildcard: {{{ (COLUMN).(SAMPLE_WILDCARD).(RULE).(QUANTIFIER) }}}
  *    e.g. `(gt_types).(phenotype==2).(==HET).(all)` = "every affected
  *    sample is heterozygous", or `(gt_depths).(*).(>=20).(any)`
  *  - per-sample: {{{ COLUMN.SAMPLE <op> VALUE }}}
  *    e.g. `gt_types.kid == HET and gt_depths.kid >= 20`
  *
  * Everything compiles to ONE per-row Spark Column over the unpacked
  * genotype arrays: sample wildcards resolve driver-side against the
  * dim-sized samples table (names → 1-based gt-array indexes via the
  * header sample order), quantifiers fold the per-sample `element_at`
  * predicates, and the boolean combinators fold the clause Columns —
  * codegen, no explode, no shuffle; the variants corpus is scanned
  * once no matter how many clauses or samples the filter touches.
  */
object GtFilter {

  /** GEMINI genotype-class names usable as RULE / VALUE operands. */
  private val GtClasses = Map(
    "HOM_REF" -> 0, "HET" -> 1, "UNKNOWN" -> 2, "HOM_ALT" -> 3)

  private val CmpRe = """^(==|!=|>=|<=|>|<)\s*(.+)$""".r
  private val SampleCmpRe = """^(\w+)\s*(==|!=)\s*'?([^']*)'?$""".r
  private val CountRe = """^count\s*(==|!=|>=|<=|>|<)\s*(\d+)$""".r

  // clause-level prefix patterns for the expression parser
  private val WildcardAt = """\((\w+)\)\.\((.+?)\)\.\((.+?)\)\.\((.+?)\)""".r
  private val SampleClauseAt =
    """(\w+)\.([A-Za-z0-9_\-]+)\s*(==|!=|>=|<=|>|<)\s*('[^']*'|[-\w./]+)""".r
  private val KeywordAt = """(?i)(and|or|not)\b""".r

  /** Compile a gt-filter expression into a row predicate.
    *
    * @param spec          the GEMINI filter string (clauses + and/or/not)
    * @param samples       the samples table (PED columns as strings)
    * @param headerSamples VCF sample order (drives gt-array indexes)
    */
  def compile(spec: String, samples: DataFrame,
      headerSamples: Seq[String]): Column =
    new Parser(spec.trim, samples, headerSamples).parse()

  /** GEMINI `query --sample-filter` + `--in` modifiers: a SQL WHERE
    * over the samples table picks a sample subset driver-side
    * (dim-sized), and the variant predicate asks how that subset
    * relates to the variant's carriers (gt_types HET/HOM_ALT):
    *
    *  - `any`  (GEMINI's default): some matching sample carries it
    *  - `all`: every matching sample carries it
    *  - `none`: no matching sample carries it
    *  - `only`: some matching sample carries it AND no NON-matching
    *    sample does (GEMINI's `--in only` exclusivity form)
    *
    * Compiles to one codegen row predicate over the unpacked gt_types
    * array — no explode, no shuffle, one variants scan.
    */
  def sampleFilter(where: String, in: String, samples: DataFrame,
      headerSamples: Seq[String]): Column = {
    val ixOf = headerSamples.zipWithIndex
      .map { case (n, i) => n -> (i + 1) }.toMap
    val matching = samples.filter(where)
      .select("sample_id").collect().map(_.getString(0))
      .filter(ixOf.contains).toSeq
    require(matching.nonEmpty,
      s"sample-filter '$where' selects no VCF samples")
    def carrier(name: String): Column = {
      val cell = element_at(col("gt_types"), ixOf(name))
      cell === 1 || cell === 3
    }
    val others = headerSamples.filterNot(matching.contains)
    in.trim.toLowerCase match {
      case "any" => matching.map(carrier).reduce(_ || _)
      case "all" => matching.map(carrier).reduce(_ && _)
      case "none" => matching.map(n => !carrier(n)).reduce(_ && _)
      case "only" =>
        val anyMatch = matching.map(carrier).reduce(_ || _)
        if (others.isEmpty) anyMatch
        else anyMatch && others.map(n => !carrier(n)).reduce(_ && _)
      case other => throw new IllegalArgumentException(
        s"sample-filter: bad --in '$other' (want any|all|none|only)")
    }
  }

  private def operandOf(raw: String): Column = GtClasses.get(raw) match {
    case Some(cls) => lit(cls)
    case None =>
      try lit(raw.toDouble)
      catch { case _: NumberFormatException => lit(raw) }
  }

  private def cmp(cell: Column, op: String, operand: Column): Column =
    op match {
      case "==" => cell === operand
      case "!=" => cell =!= operand
      case ">=" => cell >= operand
      case "<=" => cell <= operand
      case ">" => cell > operand
      case "<" => cell < operand
    }

  /** Recursive-descent parser for the boolean clause grammar:
    * {{{
    * expr   := and ( "or" and )*
    * and    := unary ( "and" unary )*
    * unary  := "not" unary | "(" expr ")" | wildcardClause | sampleClause
    * }}}
    * A leading '(' is a wildcard clause iff the wildcard prefix pattern
    * matches there (its head is `(word).` which no grouped expression
    * can start with); otherwise it opens a group.
    */
  private final class Parser(input: String, samples: DataFrame,
      headerSamples: Seq[String]) {
    private var pos = 0
    private val ixOf = headerSamples.zipWithIndex
      .map { case (n, i) => n -> (i + 1) }.toMap

    private def rest: CharSequence = input.subSequence(pos, input.length)
    private def ws(): Unit =
      while (pos < input.length && input(pos).isWhitespace) pos += 1
    private def fail(msg: String): Nothing =
      throw new IllegalArgumentException(
        s"gt-filter: $msg at position $pos in '$input'")

    def parse(): Column = {
      val c = orExpr()
      ws()
      if (pos < input.length) fail(s"unexpected trailing input '$rest'")
      c
    }

    private def orExpr(): Column = {
      var left = andExpr()
      while (matchKeyword("or")) left = left || andExpr()
      left
    }

    private def andExpr(): Column = {
      var left = unary()
      while (matchKeyword("and")) left = left && unary()
      left
    }

    private def matchKeyword(kw: String): Boolean = {
      ws()
      KeywordAt.findPrefixMatchOf(rest) match {
        case Some(m) if m.group(1).equalsIgnoreCase(kw) => pos += m.end; true
        case _ => false
      }
    }

    private def unary(): Column = {
      ws()
      if (pos >= input.length) fail("expected a clause")
      if (matchKeyword("not")) return !unary()
      if (input(pos) == '(') {
        WildcardAt.findPrefixMatchOf(rest) match {
          case Some(m) =>
            pos += m.end
            wildcardPred(m.group(1), m.group(2), m.group(3), m.group(4))
          case None =>
            pos += 1
            val c = orExpr()
            ws()
            if (pos >= input.length || input(pos) != ')') fail("expected ')'")
            pos += 1
            c
        }
      } else {
        SampleClauseAt.findPrefixMatchOf(rest) match {
          case Some(m) =>
            pos += m.end
            sampleClausePred(m.group(1), m.group(2), m.group(3), m.group(4))
          case None => fail("expected a clause " +
            "((col).(samples).(rule).(quant) or col.sample <op> value)")
        }
      }
    }

    /** `gt_types.kid == HET` — one array cell against one operand. */
    private def sampleClausePred(colName: String, sample: String,
        op: String, valueRaw: String): Column = {
      val ix = ixOf.getOrElse(sample, fail(
        s"unknown sample '$sample' (not in the VCF header sample columns)"))
      val value = valueRaw.stripPrefix("'").stripSuffix("'")
      cmp(element_at(col(colName), ix), op, operandOf(value))
    }

    /** `(col).(wildcard).(rule).(quant)` — the original wildcard form. */
    private def wildcardPred(colName: String, sampleW: String,
        rule: String, quant: String): Column = {
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
      val operand = operandOf(operandRaw)
      def pred(name: String): Column =
        cmp(element_at(col(colName), ixOf(name)), op, operand)
      // quantifier fold
      quant.trim match {
        case "all" => names.map(pred).reduce(_ && _)
        case "any" => names.map(pred).reduce(_ || _)
        case "none" => names.map(n => !pred(n)).reduce(_ && _)
        case CountRe(cop, n) =>
          val cnt = names.map(s => when(pred(s), 1).otherwise(0))
            .reduce(_ + _)
          cmp(cnt, cop, lit(n.toInt))
        case q => throw new IllegalArgumentException(
          s"gt-filter: bad quantifier '$q' (want all|any|none|count<op>N)")
      }
    }
  }
}
