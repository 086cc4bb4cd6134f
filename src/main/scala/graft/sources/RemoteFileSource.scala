package graft.sources

import java.io.File
import java.nio.file.Files
import java.util

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read.{Batch, InputPartition, PartitionReader, PartitionReaderFactory, Scan, ScanBuilder, SupportsPushDownRequiredColumns}
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset, ReadLimit, SupportsAdmissionControl, SupportsTriggerAvailableNow}
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String

/** Remote file reference — listing metadata only, no payload bytes
  * (the reference's HEAD-only size/mtime probes, child.py:35-65). */
case class RemoteFileRef(name: String, size: Long, mtimeS: Long)

/** Minimal remote-protocol client: enumerate a directory, fetch one
  * payload (the reference worker's two network verbs — list/stat and
  * download, child.py:35-80). */
trait RemoteClient extends Serializable {
  def list(): Seq[RemoteFileRef]
  def fetch(name: String): Array[Byte]
}

/** Local-directory stand-in used for every supported scheme in this
  * environment — the reference's own test source is a localhost FTP
  * server over a local directory (ftp_server.py:42-44), so the protocol
  * seam is exercised with the transport mocked. */
class LocalDirClient(dir: String) extends RemoteClient {
  override def list(): Seq[RemoteFileRef] =
    Option(new File(dir).listFiles()).getOrElse(Array.empty)
      .filter(_.isFile).sortBy(_.getName)
      .map(f => RemoteFileRef(f.getName, f.length(), f.lastModified() / 1000))
      .toSeq
  override def fetch(name: String): Array[Byte] =
    Files.readAllBytes(new File(dir, name).toPath)
}

/** URL parsing + per-scheme client dispatch (reference
  * scrap/child_otherftp.py:129-162: branch ftp vs sftp, else raise;
  * default ports 21/22 as in child.py:16-18). */
object RemoteUrl {
  case class Parsed(url: String, scheme: String, host: String, port: Int,
      path: String) {
    /** `hostname_port` sink-folder derivation (child.py:16-18). */
    def serverFolder: String = s"${host}_$port"
    def client: RemoteClient = scheme match {
      case "ftp" | "sftp" | "file" => new LocalDirClient(path)
      case other => throw new IllegalArgumentException(
        s"unsupported protocol '$other' in $url (supported: ftp, sftp, file)")
    }
  }

  private val Re = "(?i)^([a-z][a-z0-9+.-]*)://([^:/]+)(?::([0-9]+))?(/.*)$".r

  def parse(url: String): Parsed = url.trim match {
    case Re(scheme, host, port, path) =>
      val sl = scheme.toLowerCase
      val p = Option(port).map(_.toInt).getOrElse(sl match {
        case "ftp" => 21
        case "sftp" => 22
        case _ => 0
      })
      Parsed(url.trim, sl, host, p, path)
    case other =>
      throw new IllegalArgumentException(s"malformed remote url: $other")
  }
}

/** DataSource V2 source serving file PAYLOADS from remote-protocol URLs
  * — the reference's entire input side (pycurl download child.py:67-80,
  * protocol dispatch scrap/child_otherftp.py:129-162, remote stat
  * child.py:35-65) as a first-class Spark source. Complements
  * [[FileMetaSource]] (metadata-only catalog scans).
  *
  * Usage: spark.read.format("graft.sources.RemoteFileSource")
  *          .option("urls", "ftp://host:21/dir,sftp://host2:2222/dir2")
  *          .option("numPartitions", "4").load()
  *
  * Scale shape: the DRIVER only lists (metadata per file, like every
  * file index); payload bytes are fetched on EXECUTORS inside the
  * partition reader, so 1000 executors download concurrently and bytes
  * never pass through the driver. Files are dealt round-robin across
  * partitions (the reference's batch dealing, main.py:65-78). Column
  * pruning is pushed into the reader: a query that doesn't reference
  * `content` never fetches a single payload byte — the
  * metadata-before-data rule (child.py:38-41) enforced by the planner.
  */
class RemoteFileSource extends TableProvider {
  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    RemoteFileSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    val urls = opts.get("urls").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    new RemoteFileTable(urls, opts.getInt("numPartitions", 4),
      opts.getInt("batchSize", Int.MaxValue))
  }
}

object RemoteFileSource {
  val schema: StructType = StructType(Seq(
    StructField("url", StringType, nullable = false),
    StructField("scheme", StringType, nullable = false),
    StructField("server_folder", StringType, nullable = false),
    StructField("file_name", StringType, nullable = false),
    StructField("size", LongType, nullable = false),
    StructField("mtime_s", LongType, nullable = false),
    StructField("content", BinaryType, nullable = false)))
}

class RemoteFileTable(urls: Seq[String], numPartitions: Int, batchSize: Int)
    extends Table with SupportsRead {
  override def name(): String = s"graft_remote(${urls.mkString(",")})"
  override def schema(): StructType = RemoteFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RemoteScanBuilder(urls, numPartitions, batchSize)
}

object RemoteListing {
  /** Driver-side: parse + LIST only (dispatch fails fast on an
    * unsupported scheme, before any executor work is scheduled).
    * Deterministic total order so streaming offsets are stable. */
  def listAll(urls: Seq[String]): Array[RemoteTask] =
    urls.flatMap { u =>
      val parsed = RemoteUrl.parse(u)
      parsed.client.list().map(f => RemoteTask(parsed.url, f))
    }.sortBy(t => (t.url, t.ref.name)).toArray

  /** Round-robin dealing, empty buckets dropped (main.py:65-78). */
  def deal(files: Array[RemoteTask], numPartitions: Int): Array[InputPartition] =
    (0 until numPartitions)
      .map(i => files.zipWithIndex.collect {
        case (f, j) if j % numPartitions == i => f
      })
      .filter(_.nonEmpty)
      .map(fs => RemoteFilePartition(fs.toArray): InputPartition)
      .toArray
}

class RemoteScanBuilder(urls: Seq[String], numPartitions: Int, batchSize: Int)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RemoteFileSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = required
    override def toBatch: Batch = new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        RemoteListing.deal(RemoteListing.listAll(urls), numPartitions)
      override def createReaderFactory(): PartitionReaderFactory =
        new RemoteFileReaderFactory(required)
    }
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new RemoteMicroBatchStream(urls, numPartitions, batchSize, required)
  }
}

/** Offset = count of files (in the deterministic listing order) already
  * admitted — the streaming analog of the reference's per-run task
  * cursor. */
case class RemoteOffset(n: Long) extends Offset {
  override def json(): String = n.toString
}

/** Micro-batch stream over the remote listing: the reference's
  * cron-triggered batch runs (README.md:102-131) as a genuine
  * Structured Streaming source. Admission control caps each micro-batch
  * at `batchSize` files (BATCH_SIZE, config.py:2); Trigger.AvailableNow
  * snapshots the listing and drains it batch-by-batch, then stops —
  * exactly the scheduled-ingest shape. Listing happens on the driver at
  * offset-resolution time; payload fetch stays on executors. */
class RemoteMicroBatchStream(urls: Seq[String], numPartitions: Int,
    batchSize: Int, required: StructType)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private lazy val tasks: Array[RemoteTask] = RemoteListing.listAll(urls)
  @volatile private var availableNowCap: Long = -1L

  override def prepareForTriggerAvailableNow(): Unit =
    availableNowCap = tasks.length.toLong

  override def getDefaultReadLimit: ReadLimit =
    if (batchSize == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxFiles(batchSize)

  override def initialOffset(): Offset = RemoteOffset(0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val begin = start.asInstanceOf[RemoteOffset].n
    val total = if (availableNowCap >= 0) availableNowCap else tasks.length.toLong
    val capped = limit match {
      case _ if batchSize == Int.MaxValue => total
      case _ => math.min(begin + batchSize, total)
    }
    RemoteOffset(capped)
  }

  override def reportLatestOffset(): Offset = RemoteOffset(tasks.length.toLong)

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] = {
    val b = start.asInstanceOf[RemoteOffset].n.toInt
    val e = end.asInstanceOf[RemoteOffset].n.toInt
    RemoteListing.deal(tasks.slice(b, e), numPartitions)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new RemoteFileReaderFactory(required)

  override def deserializeOffset(json: String): Offset = RemoteOffset(json.toLong)

  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class RemoteTask(url: String, ref: RemoteFileRef)

case class RemoteFilePartition(tasks: Array[RemoteTask]) extends InputPartition

class RemoteFileReaderFactory(required: StructType)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val tasks = partition.asInstanceOf[RemoteFilePartition].tasks
    val wantContent = required.fieldNames.contains("content")
    new PartitionReader[InternalRow] {
      // One client per distinct URL per partition (connection reuse).
      private val clients = scala.collection.mutable.Map.empty[String, RemoteClient]
      private var i = -1
      override def next(): Boolean = { i += 1; i < tasks.length }
      override def get(): InternalRow = {
        val t = tasks(i)
        val parsed = RemoteUrl.parse(t.url)
        lazy val bytes =
          clients.getOrElseUpdate(t.url, parsed.client).fetch(t.ref.name)
        InternalRow(required.fieldNames.map {
          case "url" => UTF8String.fromString(t.url)
          case "scheme" => UTF8String.fromString(parsed.scheme)
          case "server_folder" => UTF8String.fromString(parsed.serverFolder)
          case "file_name" => UTF8String.fromString(t.ref.name)
          case "size" => t.ref.size
          case "mtime_s" => t.ref.mtimeS
          case "content" => if (wantContent) bytes else Array.emptyByteArray
        }.toIndexedSeq: _*)
      }
      override def close(): Unit = ()
    }
  }
}
