package graft.sources.framed

import java.util
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

/** DataSource V2 implementation of the reference's ReaderSource concept
  * (extension/source_reader.go:15-108): a byte stream cut into elements by
  * a user-chosen framing rule. The reference takes an arbitrary
  * `ElementReader func(io.Reader) ([]byte, error)`; a Spark source must be
  * declarative, so framing is expressed as a delimiter byte-sequence option
  * (the common case — the reference's own example frames UDP lines,
  * examples/udp/main.go:39-46).
  *
  * Usage:
  * {{{
  *   spark.read.format("graft-framed")
  *     .option("delimiter", ";")   // default "\n"
  *     .load("/path/to/files")     // file, directory, or glob
  * }}}
  *
  * Output schema: (value STRING, file STRING).
  *
  * Scale notes: one input partition per file — delimiter framing cannot be
  * safely split mid-file without scanning (same sequential constraint as
  * the reference's ElementReader). Many small files parallelize naturally;
  * one huge file does not — that is inherent to opaque framing, and the
  * fix at 100 TB is upstream: land data in a splittable format.
  */
class FramedDataSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-framed"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FramedDataSource.schema

  override def getTable(
      schema: StructType,
      partitioning: Array[Transform],
      properties: util.Map[String, String]): Table =
    new FramedTable(properties.asScala.toMap)
}

object FramedDataSource {
  val schema: StructType = StructType(Seq(
    StructField("value", StringType, nullable = false),
    StructField("file", StringType, nullable = false)
  ))
}

class FramedTable(properties: Map[String, String]) extends Table with SupportsRead {
  override def name(): String = s"graft-framed(${properties.getOrElse("path", "?")})"
  override def schema(): StructType = FramedDataSource.schema
  override def capabilities(): util.Set[TableCapability] =
    util.EnumSet.of(TableCapability.BATCH_READ)

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder = {
    val opts = properties ++ options.asScala
    new ScanBuilder with Scan with Batch {
      override def build(): Scan = this
      override def readSchema(): StructType = FramedDataSource.schema
      override def toBatch: Batch = this

      override def planInputPartitions(): Array[InputPartition] = {
        val pathStr = opts.getOrElse("path",
          throw new IllegalArgumentException("graft-framed requires a path"))
        val delim = opts.getOrElse("delimiter", "\n")
        val hconf = org.apache.spark.sql.SparkSession.active
          .sparkContext.hadoopConfiguration
        val path = new Path(pathStr)
        val fs = path.getFileSystem(hconf)
        val files = fs.globStatus(path) match {
          case null =>
            throw new java.io.FileNotFoundException(s"graft-framed: path does not exist: $pathStr")
          case sts => sts.flatMap { st =>
            if (st.isDirectory) fs.listStatus(st.getPath).filter(_.isFile) else Array(st)
          }
        }
        files.filter(_.getLen > 0).map(st =>
          FramedFilePartition(st.getPath.toString, delim): InputPartition)
      }

      override def createReaderFactory(): PartitionReaderFactory =
        new FramedReaderFactory
    }
  }
}

case class FramedFilePartition(file: String, delimiter: String) extends InputPartition

class FramedReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val p = partition.asInstanceOf[FramedFilePartition]
    new FramedPartitionReader(p.file, p.delimiter)
  }
}

/** Sequential frame reader for one file — the executor-side analogue of the
  * reference's per-source reader goroutine (extension/source_reader.go:71-96).
  */
class FramedPartitionReader(file: String, delimiter: String)
    extends PartitionReader[InternalRow] {

  private val fileUtf8 = UTF8String.fromString(file)
  private val frames: Iterator[String] = {
    val path = new Path(file)
    // default Hadoop conf on the executor: sufficient for file:// and any
    // fs whose settings ship in core-site.xml on the executor classpath;
    // a production connector would ship a serialized conf in the partition
    val fs = path.getFileSystem(new org.apache.hadoop.conf.Configuration())
    val in = fs.open(path)
    val bytes = try org.apache.commons.io.IOUtils.toByteArray(in) finally in.close()
    val content = new String(bytes, java.nio.charset.StandardCharsets.UTF_8)
    content.split(java.util.regex.Pattern.quote(delimiter), -1).iterator
      .filter(_.nonEmpty)
  }
  private var current: String = _

  override def next(): Boolean =
    if (frames.hasNext) { current = frames.next(); true } else false

  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(current), fileUtf8)

  override def close(): Unit = ()
}
