package graft

/** Shared `--name=value` argument parsing for the job CLIs (Vcf2Db,
  * CurateCorpus) — one definition of the strict-flag rule: anything
  * that isn't `--name=value` with a known name fails loudly, because
  * the space-separated form (`--expand gt_types`) would otherwise
  * shift its value into the positional slots and silently re-target
  * the output directory.
  */
private[graft] object Cli {
  def parse(args: Array[String], known: Set[String],
      usage: String): (String => Option[String], Seq[String]) = {
    val (flags, positional) = args.partition(_.startsWith("--"))
    flags.foreach { f =>
      val ok = f.drop(2).split("=", 2) match {
        case Array(name, _) => known(name)
        case _ => false
      }
      require(ok, s"unrecognized or valueless flag '$f' (use --name=value)\n$usage")
    }
    def flag(name: String): Option[String] =
      flags.collectFirst { case f if f.startsWith(s"--$name=") =>
        f.substring(name.length + 3) }
    (flag, positional.toSeq)
  }
}
