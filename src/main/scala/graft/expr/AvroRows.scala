package graft.expr

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Avro object-container-file (OCF) explode — the row-interchange
  * format next to the columnar pair (parquet/ORC): Kafka archive dumps,
  * CDC topic drains, and legacy Hadoop corpora arrive as `.avro`
  * containers. One container row → N record rows, used with
  * `explode(...)` as the UDTF/Generator shape like [[ZipEntries]] /
  * [[TarEntries]].
  *
  * The container parser is HAND-ROLLED against the public Avro 1.12
  * spec: `Obj\1` magic, file-metadata map (avro map encoding with
  * negative-count blocks honored), 16-byte sync marker, then
  * (count, byte-size, payload, sync) data blocks — the sync after
  * EVERY block is verified against the header marker (that marker is
  * what makes OCF splittable: an HDFS reader seeks to any offset and
  * scans forward for it; a mismatch here means a torn/corrupt block
  * and must fail loudly, not resync silently). `null` and `deflate`
  * codecs are supported (raw RFC-1951 inflate, nowrap — the two
  * codecs the spec requires of every implementation). Record decoding
  * is the hand-rolled Avro binary encoding: zigzag-varint longs/ints,
  * length-prefixed UTF-8 strings/bytes, little-endian IEEE
  * float/double, single-byte booleans — flat records of those
  * primitives (the shape Kafka topic dumps overwhelmingly use; unions
  * and nesting are rejected loudly, not mis-read). Only the writer
  * SCHEMA TEXT is delegated to avro-core's `Schema.Parser` (it is
  * plain JSON parsing, not container logic).
  *
  * AvroSpec cross-validates the parser record-for-record against
  * avro-core's `DataFileReader`+`GenericDatumReader` on files WRITTEN
  * by avro-core (proving it reads real producers' bytes, not a
  * private dialect), covers both codecs plus a mixed-primitive
  * schema, and pins that a flipped block-sync byte fails loudly.
  */
object AvroRows {

  case class Doc(doc_id: Long, lang: String, source: String,
      n_chars: Long, text: String)

  private val Magic = Array[Byte]('O', 'b', 'j', 1)

  /** Cursor over the container bytes; all reads bounds-checked. */
  private final class Cur(val b: Array[Byte], var off: Int, val end: Int) {
    def u8(): Int = {
      require(off < end, s"avro: truncated at offset $off")
      val v = b(off) & 0xff; off += 1; v
    }
    def take(n: Int): Array[Byte] = {
      require(n >= 0 && off + n <= end,
        s"avro: truncated run of $n bytes at offset $off")
      val r = java.util.Arrays.copyOfRange(b, off, off + n); off += n; r
    }
    /** zigzag varint (the one integer encoding Avro uses). */
    def readLong(): Long = {
      var n = 0L; var shift = 0; var byte = 0
      while ({ byte = u8(); (byte & 0x80) != 0 }) {
        n |= (byte & 0x7fL) << shift; shift += 7
        require(shift < 64, "avro: varint too long")
      }
      n |= byte.toLong << shift
      (n >>> 1) ^ -(n & 1L)
    }
    def readBytes(): Array[Byte] = {
      val len = readLong()
      require(len >= 0 && len <= Int.MaxValue, s"avro: bad length $len")
      take(len.toInt)
    }
    def readString(): String = new String(readBytes(), "UTF-8")
    def atEnd: Boolean = off >= end
  }

  private def inflate(data: Array[Byte]): Array[Byte] = {
    val inf = new java.util.zip.Inflater(true) // nowrap: raw deflate
    inf.setInput(data)
    val out = new java.io.ByteArrayOutputStream(data.length * 4)
    val buf = new Array[Byte](8192)
    while (!inf.finished()) {
      val n = inf.inflate(buf)
      require(n > 0 || inf.finished() || !inf.needsInput(),
        "avro: truncated deflate block")
      out.write(buf, 0, n)
    }
    inf.end()
    out.toByteArray
  }

  /** Flat-record field decoder table, derived from the writer schema. */
  private def fieldReaders(schemaJson: String)
      : Seq[(String, Cur => Any)] = {
    val schema = new org.apache.avro.Schema.Parser().parse(schemaJson)
    require(schema.getType == org.apache.avro.Schema.Type.RECORD,
      s"avro: unsupported top-level type ${schema.getType}")
    import org.apache.avro.Schema.Type._
    import scala.jdk.CollectionConverters._
    schema.getFields.asScala.toSeq.map { f =>
      val rd: Cur => Any = f.schema().getType match {
        case LONG    => c => c.readLong()
        case INT     => c => c.readLong().toInt
        case STRING  => c => c.readString()
        case BYTES   => c => c.readBytes()
        case BOOLEAN => c => c.u8() != 0
        case FLOAT   => c => java.lang.Float.intBitsToFloat(
          c.u8() | c.u8() << 8 | c.u8() << 16 | c.u8() << 24)
        case DOUBLE  => c =>
          var bits = 0L
          var i = 0
          while (i < 8) { bits |= c.u8().toLong << (8 * i); i += 1 }
          java.lang.Double.longBitsToDouble(bits)
        case other   => throw new IllegalArgumentException(
          s"avro: unsupported field type $other for '${f.name}'")
      }
      f.name() -> rd
    }
  }

  /** Parse a whole OCF: (field names, rows in file order). */
  def extract(bytes: Array[Byte]): (Seq[String], Seq[Array[Any]]) = {
    require(bytes.length > 4 + 16 &&
      bytes.take(4).sameElements(Magic), "avro: bad container magic")
    val c = new Cur(bytes, 4, bytes.length)
    // file metadata: map<string, bytes>; negative block count carries a
    // byte size we don't need but must consume.
    val meta = scala.collection.mutable.Map[String, Array[Byte]]()
    var n = c.readLong()
    while (n != 0) {
      if (n < 0) { c.readLong(); n = -n }
      var i = 0L
      while (i < n) { meta(c.readString()) = c.readBytes(); i += 1 }
      n = c.readLong()
    }
    val codec = meta.get("avro.codec").map(new String(_, "UTF-8"))
      .getOrElse("null")
    require(codec == "null" || codec == "deflate",
      s"avro: unsupported codec $codec")
    val schemaJson = new String(meta.getOrElse("avro.schema",
      throw new IllegalArgumentException("avro: missing schema")), "UTF-8")
    val readers = fieldReaders(schemaJson)
    val sync = c.take(16)
    val rows = Seq.newBuilder[Array[Any]]
    while (!c.atEnd) {
      val count = c.readLong()
      require(count >= 0, s"avro: negative block count $count")
      val raw = c.readBytes()
      val payload = if (codec == "deflate") inflate(raw) else raw
      val bc = new Cur(payload, 0, payload.length)
      var i = 0L
      while (i < count) {
        rows += readers.map(_._2(bc)).toArray
        i += 1
      }
      require(bc.atEnd,
        s"avro: block decoded ${bc.off} of ${payload.length} bytes")
      require(c.take(16).sameElements(sync),
        "avro: block sync marker mismatch (torn or corrupt block)")
    }
    (readers.map(_._1), rows.result())
  }

  /** content BINARY -> ARRAY<STRUCT<doc_id,lang,source,n_chars,text>>
    * for the documents-shaped fixture schema. */
  val avroDocsUdf = udf((bytes: Array[Byte]) =>
    if (bytes == null) Seq.empty[Doc]
    else {
      val (names, rows) = extract(bytes)
      require(names == Seq("doc_id", "lang", "source", "n_chars", "text"),
        s"avro: unexpected document schema $names")
      rows.map(r => Doc(r(0).asInstanceOf[Long], r(1).asInstanceOf[String],
        r(2).asInstanceOf[String], r(3).asInstanceOf[Long],
        r(4).asInstanceOf[String]))
    })

  def avro_docs(c: Column): Column = avroDocsUdf(c)
}
