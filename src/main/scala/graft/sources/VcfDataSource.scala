package graft.sources

import java.util.{Map => JMap}

import scala.jdk.CollectionConverters._

import org.apache.hadoop.fs.{FileSystem, Path}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.{CatalystTypeConverters, InternalRow}
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.StructType
import org.apache.spark.sql.util.CaseInsensitiveStringMap

/** DataSourceV2 VCF source: `spark.read.format("vcf").load(path)`.
  *
  * The header (KB-sized) is read ONCE driver-side and drives the typed
  * variants schema exactly like the reference's ##INFO-based inference;
  * body parsing happens in executor-side PartitionReaders — one
  * partition per file (a bgzip-sharded 100 TB cohort parallelizes by
  * shard; a finer line-range split would slot in here without touching
  * the parse path). Column pruning is pushed into the reader: pruned
  * rows are projected BEFORE conversion to InternalRow, so unread INFO
  * columns cost nothing per row.
  */
class VcfDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "vcf"

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val p = Option(options.get("path")).getOrElse(
      throw new IllegalArgumentException("vcf source requires a path"))
    val hp = new Path(p)
    val fs = FileSystem.get(hp.toUri,
      SparkSession.active.sessionState.newHadoopConf())
    val stats = fs.globStatus(hp)
    if (stats == null || stats.isEmpty) Seq(p)
    else stats.flatMap { st =>
      if (st.isDirectory) fs.listStatus(st.getPath).toSeq.filter(_.isFile).map(_.getPath.toString)
      else Seq(st.getPath.toString)
    }.sorted.toSeq
  }

  private def headerLines(path: String): Vector[String] = {
    val hp = new Path(path)
    val fs = FileSystem.get(hp.toUri, SparkSession.active.sessionState.newHadoopConf())
    val in = fs.open(hp)
    try {
      val reader = new java.io.BufferedReader(new java.io.InputStreamReader(
        VcfIo.maybeGunzip(path, in), "UTF-8"))
      Iterator.continually(reader.readLine())
        .takeWhile(l => l != null && l.startsWith("#"))
        .toVector
    } finally in.close()
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val ps = paths(options)
    VcfReader.variantSchema(VcfParser.parseHeader(headerLines(ps.head)))
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val ps = paths(opts)
    new VcfTable(ps, headerLines(ps.head), schema)
  }

  override def supportsExternalMetadata(): Boolean = false
}

private[sources] class VcfTable(paths: Seq[String], header: Vector[String],
    tableSchema: StructType) extends Table with SupportsRead {
  override def name(): String = s"vcf(${paths.mkString(",")})"
  override def schema(): StructType = tableSchema
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new VcfScanBuilder(paths, header, tableSchema,
      options.getBoolean("permissive", false),
      options.getLong("splitSize", 128L * 1024 * 1024))
}

private[sources] class VcfScanBuilder(paths: Seq[String], header: Vector[String],
    full: StructType, permissive: Boolean, splitSize: Long)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = full

  override def pruneColumns(requiredSchema: StructType): Unit =
    // keep the scan's column ORDER stable (subset of the full schema)
    required = StructType(full.fields.filter(f => requiredSchema.fieldNames.contains(f.name)))

  override def build(): Scan =
    new VcfScan(paths, header, full, required, permissive, splitSize)
}

private[sources] class VcfScan(paths: Seq[String], header: Vector[String],
    full: StructType, required: StructType, permissive: Boolean,
    splitSize: Long) extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this

  /** Plain-text files split into byte ranges (each reader skips the
    * partial first line and reads through the line straddling its
    * end — the classic text-split contract), so ONE huge uncompressed
    * VCF still fans out across executors. Compressed shards stay one
    * partition each (gzip is unsplittable; bgzip cohorts parallelize
    * by shard).
    */
  override def planInputPartitions(): Array[InputPartition] = {
    val conf = new org.apache.hadoop.conf.Configuration()
    paths.flatMap { p =>
      if (p.endsWith(".gz") || p.endsWith(".bgz"))
        Seq(VcfInputPartition(p, 0L, Long.MaxValue))
      else {
        val hp = new Path(p)
        val len = FileSystem.get(hp.toUri, conf).getFileStatus(hp).getLen
        val n = math.max(1L, (len + splitSize - 1) / splitSize)
        (0L until n).map(i =>
          VcfInputPartition(p, i * splitSize,
            if (i == n - 1) Long.MaxValue else (i + 1) * splitSize))
      }
    }.map(x => x: InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new VcfReaderFactory(header, full.fieldNames, required.fieldNames, permissive)
}

private[sources] case class VcfInputPartition(path: String, start: Long, end: Long)
    extends InputPartition

private[sources] object VcfIo {
  /** Transparent decompression for gzip/bgzip shards (`.vcf.gz`,
    * `.vcf.bgz`): BGZF is concatenated-member gzip, which Java's
    * GZIPInputStream consumes natively. Each compressed shard stays
    * one InputPartition (bgzip shards are the cohort's parallelism
    * unit; gzip itself is unsplittable).
    */
  def maybeGunzip(path: String, in: java.io.InputStream): java.io.InputStream =
    if (path.endsWith(".gz") || path.endsWith(".bgz"))
      new java.util.zip.GZIPInputStream(in, 1 << 16)
    else in
}

private[sources] class VcfReaderFactory(headerLines: Vector[String],
    fullNames: Array[String], requiredNames: Array[String], permissive: Boolean)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[VcfInputPartition]
    new VcfPartitionReader(p, headerLines, fullNames, requiredNames, permissive)
  }
}

private[sources] class VcfPartitionReader(part: VcfInputPartition,
    headerLines: Vector[String],
    fullNames: Array[String], requiredNames: Array[String], permissive: Boolean)
    extends PartitionReader[InternalRow] {

  private val path = part.path

  private val header = VcfParser.parseHeader(headerLines)
  private val fullSchema = VcfReader.variantSchema(header)
  private val required = StructType(
    fullSchema.fields.filter(f => requiredNames.contains(f.name)))
  private val keepIx: Array[Int] = required.fieldNames.map(fullSchema.fieldIndex)
  private val toCatalyst =
    CatalystTypeConverters.createToCatalystConverter(required)

  private val stream = {
    val hp = new Path(path)
    val fs = FileSystem.get(hp.toUri, new org.apache.hadoop.conf.Configuration())
    val raw = fs.open(hp)
    if (part.start > 0) raw.seek(part.start)
    new java.io.BufferedReader(new java.io.InputStreamReader(
      VcfIo.maybeGunzip(path, raw), "UTF-8"))
  }

  // byte offset (within the file) of the NEXT line to be read
  private var pos: Long = part.start
  private var primed = part.start == 0
  private var pending: Iterator[InternalRow] = Iterator.empty
  private var current: InternalRow = _

  /** Reads one line, tracking its starting offset; a reader seeked to
    * start>0 first discards the (possibly partial) line it landed in —
    * that line belongs to the previous split.
    */
  private def nextOwnedLine(): String = {
    if (!primed) {
      val skipped = stream.readLine()
      if (skipped != null) pos += skipped.getBytes("UTF-8").length + 1
      primed = true
    }
    // a line STARTING at exactly `end` still belongs to this split (the
    // next reader unconditionally discards its first line) — stop only
    // strictly past end, per the Hadoop text-split contract
    if (pos > part.end) return null
    val line = stream.readLine()
    if (line != null) pos += line.getBytes("UTF-8").length + 1
    line
  }

  private def rowsOf(line: String): Iterator[InternalRow] = {
    val rows =
      if (permissive)
        try VcfReader.decomposedRows(header, line)
        catch { case scala.util.control.NonFatal(_) => Seq.empty }
      else VcfReader.decomposedRows(header, line)
    rows.iterator.map { row =>
      val pruned = org.apache.spark.sql.Row.fromSeq(keepIx.map(row.get).toSeq)
      toCatalyst(pruned).asInstanceOf[InternalRow]
    }
  }

  override def next(): Boolean = {
    while (!pending.hasNext) {
      val line = nextOwnedLine()
      if (line == null) return false
      if (VcfParser.isBodyLine(line)) pending = rowsOf(line)
    }
    current = pending.next()
    true
  }

  override def get(): InternalRow = current
  override def close(): Unit = stream.close()
}
