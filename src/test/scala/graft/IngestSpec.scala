package graft

import java.io.ByteArrayOutputStream
import java.util.zip.{ZipEntry, ZipOutputStream}

import graft.expr.ZipEntries
import org.scalatest.funsuite.AnyFunSuite

class IngestSpec extends AnyFunSuite {
  import SharedSpark.{spark, sf}

  private def zipOf(members: (String, String, Long)*): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val zos = new ZipOutputStream(bos)
    members.foreach { case (name, content, mtime) =>
      val e = new ZipEntry(name)
      e.setTime(mtime)
      zos.putNextEntry(e)
      zos.write(content.getBytes("UTF-8"))
      zos.closeEntry()
    }
    zos.close()
    bos.toByteArray
  }

  test("zip_entries explodes members, flattens dirs, recovers mtimes") {
    val bytes = zipOf(
      ("a.txt", "hello", 1600000000000L),
      ("nested/deep/b.bin", "world!", 1650000000000L))
    val got = ZipEntries.extract(bytes)
    assert(got.map(_.name) === Seq("a.txt", "b.bin"))
    assert(got.map(_.size) === Seq(5L, 6L))
    assert(got.map(e => new String(e.content, "UTF-8")) === Seq("hello", "world!"))
    // zip dos-time is 2s-granular and tz-dependent; order must hold.
    assert(got(0).mtime < got(1).mtime)
  }

  test("zip_entries tolerates empty archives and null") {
    assert(ZipEntries.extract(zipOf()) === Seq.empty)
    assert(ZipEntries.extract(Array.emptyByteArray) === Seq.empty)
  }

  test("ingest_e2e audit matches the pinned expectation") {
    val rows = SparkEntry.queries("ingest_e2e")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq === Seq(
      ("log", 2L, 25L, "b.log|b_2.log"),
      ("none", 1L, 17L, "noext"),
      ("txt", 4L, 57L, "a.txt|data--.txt|dup_one.txt|report final.txt")))
  }

  test("partition-pruned scan reads only the lang=en partition") {
    SparkEntry.queries("scan_partition_pruned")(spark, sf).count()
    val plan = ops.Ingest.partitionPrunedPlan(spark)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition filters in:\n$plan")
  }

  test("dedup policies partition the input: semi + anti = all") {
    val semi = SparkEntry.queries("join_semi")(spark, sf).count()
    val anti = SparkEntry.queries("join_anti")(spark, sf).count()
    val all = Tables.t(spark, sf, "customer").count()
    assert(semi + anti === all)
  }
}
