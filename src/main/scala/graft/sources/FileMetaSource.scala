package graft.sources

import java.io.File
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** DataSource V2 source emitting file METADATA rows (name, sanitized
  * name, ext, size, mtime) without ever opening the files — the
  * reference's metadata-before-data rule (HEAD-only size/mtime probes,
  * child.py:35-65) as a first-class Spark source, and the DSv2 analog of
  * its per-protocol source dispatch (scrap/child_otherftp.py:129-162).
  *
  * Usage: spark.read.format("graft.sources.FileMetaSource")
  *          .option("path", dir).load()
  *
  * Scale shape: listing happens on the driver (like every file index),
  * but rows are dealt round-robin into `numPartitions` input partitions
  * (reference's batch dealing, main.py:65-78) and materialized on
  * executors. Payload bytes are never touched — a 100 TB catalog scan
  * reads zero data bytes.
  */
class FileMetaSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    FileMetaSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new FileMetaTable(opts.get("path"), opts.getInt("numPartitions", 4))
  }
}

object FileMetaSource {
  val schema: StructType = StructType(Seq(
    StructField("file_name", StringType, nullable = false),
    StructField("clean_name", StringType, nullable = false),
    StructField("ext", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mtime_s", LongType, nullable = false)))
}

class FileMetaTable(path: String, numPartitions: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_files($path)"
  override def schema(): StructType = FileMetaSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    () => new Scan {
      override def readSchema(): StructType = FileMetaSource.schema
      override def toBatch: Batch = new Batch {
        override def planInputPartitions(): Array[InputPartition] = {
          val files = Option(new File(path).listFiles()).getOrElse(Array.empty)
            .filter(_.isFile).sortBy(_.getName)
            .map(f => FileMeta(f.getName, f.length(), f.lastModified() / 1000))
          // round-robin dealing, drop empty buckets (main.py:65-78)
          (0 until numPartitions)
            .map(i => files.zipWithIndex.collect {
              case (f, j) if j % numPartitions == i => f
            })
            .filter(_.nonEmpty)
            .map(fs => FileMetaPartition(fs.toArray): InputPartition)
            .toArray
        }
        override def createReaderFactory(): PartitionReaderFactory =
          new FileMetaReaderFactory
      }
    }
}

case class FileMeta(name: String, size: Long, mtimeS: Long)

case class FileMetaPartition(files: Array[FileMeta]) extends InputPartition

class FileMetaReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val files = partition.asInstanceOf[FileMetaPartition].files
    new PartitionReader[InternalRow] {
      private var i = -1
      override def next(): Boolean = { i += 1; i < files.length }
      override def get(): InternalRow = {
        val f = files(i)
        val ext = {
          val idx = f.name.lastIndexOf('.')
          if (idx > 0 && idx < f.name.length - 1)
            f.name.substring(idx + 1).toLowerCase
          else "none"
        }
        InternalRow(
          UTF8String.fromString(f.name),
          UTF8String.fromString(
            graft.expr.SanitizeFilename.sanitizeBytes(f.name.getBytes("UTF-8"))),
          UTF8String.fromString(ext),
          f.size, f.mtimeS)
      }
      override def close(): Unit = ()
    }
  }
}
