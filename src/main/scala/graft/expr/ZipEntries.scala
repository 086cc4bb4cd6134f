package graft.expr

import java.io.ByteArrayInputStream
import java.util.zip.ZipInputStream

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

/** Zip-archive explode (reference R14, child.py:94-121): one archive row
  * → N member rows, each carrying the member's own name, recovered mtime
  * (epoch seconds, from the zip directory's date_time — child.py:104-106)
  * and bytes. Used with `explode(...)` it is the UDTF/Generator shape
  * (SURVEY.md §2b); payload bytes stay inside the row and are never
  * shuffled separately.
  *
  * Nested directories are flattened to the basename, matching the scrap
  * variant's dir-flatten (scrap/child_otherftp.py:41-56). Nested
  * ARCHIVES are exploded recursively — the reference re-enters
  * handle_file for every member (child.py:114), so a zip-inside-a-zip
  * yields the inner members, not an opaque .zip row. Depth is bounded
  * (a zip-bomb chain stops at [[MaxDepth]]; the remaining archive then
  * surfaces as a plain row for quarantine instead of recursing forever).
  */
object ZipEntries {

  case class Entry(name: String, mtime: Long, size: Long, content: Array[Byte])

  /** Recursion bound for nested archives. */
  val MaxDepth = 5

  def extract(bytes: Array[Byte]): Seq[Entry] = extract(bytes, MaxDepth)

  private def extract(bytes: Array[Byte], depth: Int): Seq[Entry] = {
    val zin = new ZipInputStream(new ByteArrayInputStream(bytes))
    val out = Seq.newBuilder[Entry]
    try {
      var e = zin.getNextEntry
      while (e != null) {
        if (!e.isDirectory) {
          val content = zin.readAllBytes()
          val base = e.getName.split('/').last
          if (base.toLowerCase.endsWith(".zip") && depth > 1)
            out ++= extract(content, depth - 1)
          else
            out += Entry(base, e.getTime / 1000, content.length.toLong, content)
        }
        e = zin.getNextEntry
      }
    } finally zin.close()
    out.result()
  }

  /** content BINARY -> ARRAY<STRUCT<name,mtime,size,content>> */
  val zipEntriesUdf = udf((bytes: Array[Byte]) =>
    if (bytes == null) Seq.empty[Entry] else extract(bytes))

  def zip_entries(c: Column): Column = zipEntriesUdf(c)
}
