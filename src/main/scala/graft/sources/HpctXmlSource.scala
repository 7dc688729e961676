package graft.sources

import java.util

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

import graft.hpct.XmlReader

/** DataSource V2 reader for HPCToolkit experiment XML databases (SURVEY §7.3's
  * optional scan-source polish over [[graft.hpct.ProfileLoad.loadMany]]):
  *
  * {{{
  * spark.read.format("hpct-xml")
  *   .option("path", "/data/exp1.xml,/data/exp2.xml")
  *   .option("maxDepth", "4")          // optional parse-time subtree pruning
  *   .option("skipCallsites", "true")  // optional, default true
  *   .load()
  * }}}
  *
  * Scan planning: ONE input partition per experiment file (the file is the
  * reference's natural unit of work — its tree must be parsed whole), so a
  * 1000-file load fans out across 1000 tasks. Schema is the union of the files'
  * metric columns (headers parse driver-side, cheap — they stop before the tree)
  * plus a `db` column and the location columns. Column pruning IS pushed down:
  * pruned metric slots are never copied into rows. Emits RAW metric values;
  * formula evaluation / root fix / ratio columns remain plan-level transforms
  * (ProfileLoad.applyFormulas and friends) on top of this scan.
  */
class HpctXmlSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "hpct-xml"

  private def paths(options: CaseInsensitiveStringMap): Seq[String] = {
    val p = options.get("path")
    require(p != null && p.nonEmpty, "hpct-xml: option 'path' (comma-separated files) is required")
    p.split(",").map(_.trim).filter(_.nonEmpty).toSeq
  }

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    HpctXmlSource.unionSchema(paths(options))

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new HpctXmlTable(schema, paths(opts),
      Option(opts.get("maxDepth")).map(_.toInt),
      Option(opts.get("skipCallsites")).forall(_.toBoolean))
  }
}

object HpctXmlSource {
  private[sources] def locationFields: Seq[StructField] = Seq(
    StructField("callpath", ArrayType(LongType, containsNull = false), nullable = false),
    StructField("module path", StringType, nullable = true),
    StructField("module", StringType, nullable = true),
    StructField("file path", StringType, nullable = true),
    StructField("file", StringType, nullable = true),
    StructField("line", LongType, nullable = false),
    StructField("procedure", StringType, nullable = true),
    StructField("id", LongType, nullable = false),
    StructField("type", StringType, nullable = false))

  def unionSchema(paths: Seq[String]): StructType = {
    val metricNames = paths.flatMap(p => XmlReader.parseHeader(p).metricNames).distinct
    StructType(
      StructField("db", StringType, nullable = false) +:
        metricNames.map(StructField(_, DoubleType, nullable = true)) ++:
        locationFields)
  }
}

private class HpctXmlTable(schema: StructType, paths: Seq[String],
    maxDepth: Option[Int], skipCallsites: Boolean) extends Table with SupportsRead {
  override def name(): String = s"hpct-xml(${paths.mkString(",")})"
  override def schema(): StructType = schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new HpctXmlScanBuilder(schema, paths, maxDepth, skipCallsites)
}

private class HpctXmlScanBuilder(fullSchema: StructType, paths: Seq[String],
    maxDepth: Option[Int], skipCallsites: Boolean)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = fullSchema
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema
  override def build(): Scan =
    new HpctXmlScan(fullSchema, required, paths, maxDepth, skipCallsites)
}

private class HpctXmlScan(fullSchema: StructType, required: StructType,
    paths: Seq[String], maxDepth: Option[Int], skipCallsites: Boolean)
    extends Scan with Batch {
  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def planInputPartitions(): Array[InputPartition] =
    paths.map(p => HpctXmlPartition(p): InputPartition).toArray
  override def createReaderFactory(): PartitionReaderFactory =
    new HpctXmlReaderFactory(required.fieldNames, maxDepth, skipCallsites)
}

private case class HpctXmlPartition(path: String) extends InputPartition

private class HpctXmlReaderFactory(requiredCols: Array[String],
    maxDepth: Option[Int], skipCallsites: Boolean) extends PartitionReaderFactory {

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val path = partition.asInstanceOf[HpctXmlPartition].path
    new PartitionReader[InternalRow] {
      private val parsed = XmlReader.parse(path, maxDepth, skipCallsites)
      private val slotOf: Map[String, Int] = parsed.meta.metricNames.zipWithIndex.toMap
      private val utf8Path = UTF8String.fromString(path)
      // one extractor per required column, bound once (pruned columns cost nothing)
      private val extract: Array[XmlReader.NodeRow => Any] = requiredCols.map {
        case "db" => (_: XmlReader.NodeRow) => utf8Path
        case "callpath" => (r: XmlReader.NodeRow) => ArrayData.toArrayData(r.callpath)
        case "module path" => (r: XmlReader.NodeRow) => UTF8String.fromString(r.modulePath)
        case "module" => (r: XmlReader.NodeRow) => UTF8String.fromString(r.module)
        case "file path" => (r: XmlReader.NodeRow) => UTF8String.fromString(r.filePath)
        case "file" => (r: XmlReader.NodeRow) => UTF8String.fromString(r.file)
        case "line" => (r: XmlReader.NodeRow) => r.line
        case "procedure" => (r: XmlReader.NodeRow) => UTF8String.fromString(r.procedure)
        case "id" => (r: XmlReader.NodeRow) => r.id
        case "type" => (r: XmlReader.NodeRow) => UTF8String.fromString(r.nodeType)
        case metric => slotOf.get(metric) match {
          case Some(slot) => (r: XmlReader.NodeRow) =>
            { val v = r.metrics(slot); if (v == null) null else v.doubleValue() }
          case None => (_: XmlReader.NodeRow) => null // metric from another file
        }
      }
      private val it = parsed.rows.iterator
      private var current: XmlReader.NodeRow = _
      override def next(): Boolean = { val h = it.hasNext; if (h) current = it.next(); h }
      override def get(): InternalRow =
        InternalRow.fromSeq(extract.map(f => f(current)).toIndexedSeq)
      override def close(): Unit = ()
    }
  }
}
