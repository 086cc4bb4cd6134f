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
  * default ports 21/22 as in child.py:16-18). Inline `user:pass@host`
  * userinfo is parsed and handed to the protocol client — the
  * reference's production source URLs embed credentials this way
  * (FIXTURES.md corpus); absent userinfo falls back to the anonymous
  * `graft`/`graft` account. */
object RemoteUrl {
  case class Parsed(url: String, scheme: String, host: String, port: Int,
      path: String, user: Option[String] = None, pass: Option[String] = None) {
    /** `hostname_port` sink-folder derivation (child.py:16-18) —
      * credentials never leak into folder names. */
    def serverFolder: String = s"${host}_$port"
    /** Per-scheme transport: ftp:// and sftp:// are REAL socket
      * protocol clients ([[FtpSocketClient]] / [[SftpSocketClient]] —
      * localhost URLs are served by in-process loopback servers, the
      * reference's own ftp_server.py arrangement; non-local hosts
      * connect literally). file:// remains a local-dir stand-in. */
    def client: RemoteClient = scheme match {
      case "ftp" => new FtpSocketClient(host, port, path,
        user.getOrElse("graft"), pass.getOrElse("graft"))
      case "sftp" => new SftpSocketClient(host, port, path,
        user.getOrElse("graft"), pass.getOrElse("graft"))
      case "file" => new LocalDirClient(path)
      case other => throw new IllegalArgumentException(
        s"unsupported protocol '$other' in $url (supported: ftp, sftp, file)")
    }
  }

  private val Re =
    "(?i)^([a-z][a-z0-9+.-]*)://(?:([^/@:]+)(?::([^/@]*))?@)?([^:/@]+)(?::([0-9]+))?(/.*)$".r

  def parse(url: String): Parsed = url.trim match {
    case Re(scheme, user, pass, host, port, path) =>
      val sl = scheme.toLowerCase
      val p = Option(port).map(_.toInt).getOrElse(sl match {
        case "ftp" => 21
        case "sftp" => 22
        case _ => 0
      })
      Parsed(url.trim, sl, host, p, path, Option(user), Option(pass))
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
    require(opts.containsKey("urls"),
      "RemoteFileSource requires the 'urls' option " +
        "(comma-separated ftp://, sftp:// or file:// URLs)")
    val urls = opts.get("urls").split(",").map(_.trim).filter(_.nonEmpty).toSeq
    require(urls.nonEmpty, "RemoteFileSource 'urls' option is empty")
    // Fault injection is namespaced `test.` so a stray production
    // config key can't silently arm it (ADVICE r6); the bare legacy
    // name is rejected loudly rather than ignored.
    require(!opts.containsKey("chaosFailFirstFetches"),
      "option 'chaosFailFirstFetches' was renamed to " +
        "'test.chaosFailFirstFetches' (fault injection is test-only)")
    val policy = FetchPolicy(
      maxRetries = opts.getInt("maxRetries", FetchPolicy.default.maxRetries),
      backoffMs = opts.getLong("retryBackoffMs", FetchPolicy.default.backoffMs),
      chaosFailFirstFetches = opts.getInt("test.chaosFailFirstFetches", 0))
    new RemoteFileTable(urls, opts.getInt("numPartitions", 4),
      opts.getInt("batchSize", Int.MaxValue), policy)
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

class RemoteFileTable(urls: Seq[String], numPartitions: Int, batchSize: Int,
    policy: FetchPolicy = FetchPolicy.default)
    extends Table with SupportsRead {
  override def name(): String = s"graft_remote(${urls.mkString(",")})"
  override def schema(): StructType = RemoteFileSource.schema
  override def capabilities(): util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ).asJava

  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new RemoteScanBuilder(urls, numPartitions, batchSize, policy)
}

object RemoteListing {
  /** Driver-side: parse + LIST only (dispatch fails fast on an
    * unsupported scheme, before any executor work is scheduled).
    * Deterministic total order so streaming offsets are stable. */
  def listAll(urls: Seq[String],
      policy: FetchPolicy = FetchPolicy.default): Array[RemoteTask] =
    urls.flatMap { u =>
      val parsed = RemoteUrl.parse(u)
      // Pooled like the executor fetch path: a NON-AvailableNow stream
      // re-lists every micro-batch on the driver, so the listing
      // session is as worth amortizing as the fetch session.
      val c = RemoteClientPool.borrow(parsed.url)
      // The listing is as exposed to transient refusals as the fetch —
      // an FTP list() is 2 control round trips PER FILE (SIZE/MDTM
      // stat probes) — so it retries under the same policy; the client
      // resets its control connection on failure, so a retry
      // reconnects cleanly.
      try RemoteRetry.withRetry(s"list $u", policy.maxRetries,
        policy.backoffMs)(c.list()).map(f => RemoteTask(parsed.url, f))
      finally RemoteClientPool.give(parsed.url, c)
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

class RemoteScanBuilder(urls: Seq[String], numPartitions: Int, batchSize: Int,
    policy: FetchPolicy = FetchPolicy.default)
    extends ScanBuilder with SupportsPushDownRequiredColumns {
  private var required: StructType = RemoteFileSource.schema

  override def pruneColumns(requiredSchema: StructType): Unit =
    required = requiredSchema

  override def build(): Scan = new Scan {
    override def readSchema(): StructType = required
    override def toBatch: Batch = new Batch {
      override def planInputPartitions(): Array[InputPartition] =
        RemoteListing.deal(RemoteListing.listAll(urls, policy), numPartitions)
      override def createReaderFactory(): PartitionReaderFactory =
        new RemoteFileReaderFactory(required, policy)
    }
    override def toMicroBatchStream(checkpointLocation: String): MicroBatchStream =
      new RemoteMicroBatchStream(urls, numPartitions, batchSize, required,
        checkpointLocation, policy)
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
  * drains the pending listing batch-by-batch, then stops — exactly the
  * scheduled-ingest shape. Listing happens on the driver at
  * offset-resolution time; payload fetch stays on executors.
  *
  * INCREMENTAL across runs (R16/R18 "new files since last run") via an
  * ADMISSION-TIME batch log in the checkpoint — the FileStreamSource
  * design: when a batch is admitted (latestOffset), a record
  * `start → (end, file keys)` is persisted BEFORE Spark writes its
  * offset WAL. Every future instance derives "already ingested" from
  * the union of recorded keys, so a cron-style re-trigger processes
  * only new files; a WAL-replayed batch reads its own record back and
  * re-plans the IDENTICAL file set (exactly-once per file together with
  * the sink's batch-id dedup), even if the remote listing changed in
  * between. A commit-time log would lag one batch — Spark never calls
  * commit() for the final batch of an AvailableNow run — which is why
  * admission time is the only sound write point. */
class RemoteMicroBatchStream(urls: Seq[String], numPartitions: Int,
    batchSize: Int, required: StructType, checkpointLocation: String,
    policy: FetchPolicy = FetchPolicy.default)
    extends MicroBatchStream with SupportsAdmissionControl
    with SupportsTriggerAvailableNow {

  private val batchDir = {
    val dir = new File(checkpointLocation.stripPrefix("file:"), "graft-batches")
    dir.mkdirs()
    dir
  }

  private def taskKey(t: RemoteTask): String = s"${t.url}|${t.ref.name}"

  /** Batch records persisted by earlier instances: start → (end, keys).
    * Record file = <start offset>, line 1 = end offset, rest = keys. */
  private lazy val persisted: Map[Long, (Long, Seq[String])] =
    Option(batchDir.listFiles()).getOrElse(Array.empty).map { f =>
      val lines = Files.readAllLines(f.toPath).asScala.toSeq
      f.getName.toLong -> ((lines.head.toLong, lines.tail.filter(_.nonEmpty)))
    }.toMap

  private val admittedThisRun =
    scala.collection.mutable.Map.empty[Long, (Long, Seq[String])]

  private def record(start: Long): Option[(Long, Seq[String])] =
    admittedThisRun.get(start).orElse(persisted.get(start))

  private lazy val listing: Array[RemoteTask] =
    RemoteListing.listAll(urls, policy)
  private lazy val byKey: Map[String, RemoteTask] =
    listing.map(t => taskKey(t) -> t).toMap

  /** Files never admitted by ANY recorded batch, in listing order. */
  private lazy val pending: Array[RemoteTask] = {
    val ingested = persisted.values.flatMap(_._2).toSet
    listing.filterNot(t => ingested.contains(taskKey(t)))
  }

  /** Next pending index to admit in this run. */
  private var cursor: Int = 0

  override def prepareForTriggerAvailableNow(): Unit = ()

  override def getDefaultReadLimit: ReadLimit =
    if (batchSize == Int.MaxValue) ReadLimit.allAvailable()
    else ReadLimit.maxFiles(batchSize)

  override def initialOffset(): Offset = RemoteOffset(0L)

  override def latestOffset(): Offset =
    throw new UnsupportedOperationException(
      "latestOffset(Offset, ReadLimit) should be called instead")

  override def latestOffset(start: Offset, limit: ReadLimit): Offset =
    synchronized {
      val begin = start.asInstanceOf[RemoteOffset].n
      record(begin) match {
        // WAL replay (or a crash between our record and Spark's WAL):
        // re-admit the identical recorded batch.
        case Some((end, _)) => RemoteOffset(end)
        case None =>
          val n = math.min(
            if (batchSize == Int.MaxValue) Int.MaxValue else batchSize,
            pending.length - cursor)
          if (n <= 0) RemoteOffset(begin)
          else {
            val files = pending.slice(cursor, cursor + n).toSeq
            cursor += n
            val end = begin + n
            val f = new File(batchDir, begin.toString)
            Files.write(f.toPath,
              (end.toString +: files.map(taskKey)).mkString("\n").getBytes("UTF-8"))
            admittedThisRun(begin) = (end, files.map(taskKey))
            RemoteOffset(end)
          }
      }
    }

  override def reportLatestOffset(): Offset = synchronized {
    val maxEnd = (persisted.values.map(_._1) ++ admittedThisRun.values.map(_._1))
      .maxOption.getOrElse(0L)
    RemoteOffset(maxEnd + (pending.length - cursor))
  }

  override def planInputPartitions(start: Offset, end: Offset): Array[InputPartition] =
    synchronized {
      val begin = start.asInstanceOf[RemoteOffset].n
      val endN = end.asInstanceOf[RemoteOffset].n
      val tasks = record(begin) match {
        case Some((_, keys)) => keys.flatMap(byKey.get).toArray
        case None if endN > begin =>
          // A non-empty offset range with no admission record means the
          // graft-batches log was lost/corrupted during WAL replay —
          // fail loudly instead of silently emitting zero rows
          // (ADVICE r2).
          throw new IllegalStateException(
            s"no admission record for batch [$begin, $endN) in $batchDir — " +
              "checkpoint batch log missing or corrupt; cannot replay")
        case None => Array.empty[RemoteTask]
      }
      RemoteListing.deal(tasks, numPartitions)
    }

  override def createReaderFactory(): PartitionReaderFactory =
    new RemoteFileReaderFactory(required, policy)

  override def deserializeOffset(json: String): Offset = RemoteOffset(json.toLong)

  /** Progress is durable at admission time; nothing to do at commit
    * (Spark never calls commit for an AvailableNow run's final batch). */
  override def commit(end: Offset): Unit = ()

  override def stop(): Unit = ()
}

case class RemoteTask(url: String, ref: RemoteFileRef)

case class RemoteFilePartition(tasks: Array[RemoteTask]) extends InputPartition

/** Per-fetch retry policy. The reference's own open TODO
  * (config.py:11-13 "retry download") and its error log (missing
  * REMOTE_TIME failures, log/error.log:1-30) show flaky remote fetches
  * are the expected failure mode — a 1000-executor ingest of millions
  * of files WILL see transient refusals, and one lost connection must
  * not fail a whole partition of otherwise-healthy downloads.
  *
  * `chaosFailFirstFetches` is fault injection for tests (the
  * fail-once-then-succeed fixture): the reader's first N fetch
  * ATTEMPTS throw before touching the client. Default 0 = off. */
case class FetchPolicy(maxRetries: Int, backoffMs: Long,
    chaosFailFirstFetches: Int) {
  require(maxRetries >= 0, s"maxRetries must be >= 0, got $maxRetries")
  require(backoffMs >= 0, s"retryBackoffMs must be >= 0, got $backoffMs")
}

object FetchPolicy {
  val default: FetchPolicy =
    FetchPolicy(maxRetries = 3, backoffMs = 50L, chaosFailFirstFetches = 0)
}

/** A protocol-level PERMANENT failure (FTP 5xx, SSH auth rejection):
  * retrying the identical request can only fail identically, so
  * [[RemoteRetry]] rethrows it immediately instead of burning
  * maxRetries×backoff per fetch and again at the listing level
  * (ADVICE r6 — a missing file cost 4 attempts with exponential
  * backoff twice over). */
class PermanentProtocolException(msg: String) extends java.io.IOException(msg)

object RemoteRetry {
  /** Retries observed in this JVM — an executor-local observability
    * counter (tests read it under local[*]; a cluster deployment would
    * wire a Spark accumulator/metric instead). */
  val observedRetries = new java.util.concurrent.atomic.AtomicLong(0L)

  /** Run `f`, retrying up to `maxRetries` times with exponential
    * backoff (backoffMs · 2^attempt). Permanent protocol errors fail
    * fast. Every retry is logged to the error channel (the reference
    * logs each failed fetch, custom_logging.py analog); the final
    * failure propagates with the attempt count attached. */
  def withRetry[T](what: String, maxRetries: Int, backoffMs: Long)(f: => T): T = {
    var attempt = 0
    while (attempt < maxRetries) {
      try return f
      catch {
        case e: PermanentProtocolException =>
          graft.GraftLog.error(s"fetch failed permanently ($what): ${e.getMessage}")
          throw e
        case e: Exception =>
          observedRetries.incrementAndGet()
          graft.GraftLog.error(
            s"fetch failed ($what), retry ${attempt + 1}/$maxRetries: ${e.getMessage}")
          // doubling capped at 64×base and an absolute 10 s ceiling:
          // an uncapped `backoffMs << attempt` overflows Long (negative
          // sleep → IllegalArgumentException ESCAPING the retry loop)
          // and sleeps for hours long before that.
          if (backoffMs > 0)
            Thread.sleep(math.min(backoffMs << math.min(attempt, 6), 10000L))
          attempt += 1
      }
    }
    try f
    catch {
      case e: PermanentProtocolException =>
        graft.GraftLog.error(s"fetch failed permanently ($what): ${e.getMessage}")
        throw e
      case e: Exception =>
        throw new java.io.IOException(
          s"fetch failed ($what) after ${maxRetries + 1} attempts", e)
    }
  }
}

class RemoteFileReaderFactory(required: StructType,
    policy: FetchPolicy = FetchPolicy.default)
    extends PartitionReaderFactory {
  override def createReader(partition: InputPartition): PartitionReader[InternalRow] = {
    val tasks = partition.asInstanceOf[RemoteFilePartition].tasks
    val wantContent = required.fieldNames.contains("content")
    new PartitionReader[InternalRow] {
      // One client per distinct URL per partition, BORROWED from the
      // executor-wide [[RemoteClientPool]] so the authenticated session
      // (and its SSH-2/FTP handshake) survives across micro-batches
      // instead of dying with each per-batch reader.
      private val clients = scala.collection.mutable.Map.empty[String, RemoteClient]
      private var chaosLeft = policy.chaosFailFirstFetches
      private var i = -1
      override def next(): Boolean = { i += 1; i < tasks.length }
      override def get(): InternalRow = {
        val t = tasks(i)
        val parsed = RemoteUrl.parse(t.url)
        lazy val bytes =
          RemoteRetry.withRetry(s"${t.url}/${t.ref.name}",
            policy.maxRetries, policy.backoffMs) {
            if (chaosLeft > 0) {
              chaosLeft -= 1
              throw new java.io.IOException(
                s"injected fetch failure for ${t.ref.name}")
            }
            clients.getOrElseUpdate(t.url, RemoteClientPool.borrow(t.url))
              .fetch(t.ref.name)
          }
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
      override def close(): Unit =
        clients.foreach { case (url, c) => RemoteClientPool.give(url, c) }
    }
  }
}
