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

  test("zip_entries explodes nested archives recursively, bounded depth") {
    val inner = zipOf(("deep.txt", "deep", 1600000000000L))
    val outerBytes = {
      val bos = new ByteArrayOutputStream()
      val zos = new ZipOutputStream(bos)
      val e = new ZipEntry("inner.zip")
      zos.putNextEntry(e); zos.write(inner); zos.closeEntry()
      val p = new ZipEntry("plain.txt")
      zos.putNextEntry(p); zos.write("plain".getBytes("UTF-8")); zos.closeEntry()
      zos.close()
      bos.toByteArray
    }
    val got = ZipEntries.extract(outerBytes)
    assert(got.map(_.name).sorted === Seq("deep.txt", "plain.txt"))
    // depth bound: a chain deeper than MaxDepth surfaces the remaining
    // archive as an opaque row instead of recursing forever
    val chain = (1 to ZipEntries.MaxDepth + 1).foldLeft(
      zipOf(("leaf.txt", "leaf", 1600000000000L))) { (z, i) =>
      val bos = new ByteArrayOutputStream()
      val zos = new ZipOutputStream(bos)
      val e = new ZipEntry(s"level$i.zip")
      zos.putNextEntry(e); zos.write(z); zos.closeEntry(); zos.close()
      bos.toByteArray
    }
    val deep = ZipEntries.extract(chain)
    assert(deep.size === 1)
    assert(deep.head.name.endsWith(".zip"),
      "over-deep archive must surface opaquely, not disappear")
  }

  test("ingest_e2e audit matches the pinned expectation") {
    val rows = SparkEntry.queries("ingest_e2e")(spark, sf)
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getString(3)))
    assert(rows.toSeq === Seq(
      ("log", 2L, 25L, "b.log|b_2.log"),
      ("none", 1L, 17L, "noext"),
      ("txt", 5L, 68L, "a.txt|data--.txt|deep.txt|dup_one.txt|report final.txt")))
  }

  test("partition-pruned scan reads only the lang=en partition") {
    SparkEntry.queries("scan_partition_pruned")(spark, sf).count()
    val plan = ops.Ingest.partitionPrunedPlan(spark)
      .queryExecution.executedPlan.toString()
    assert(plan.contains("PartitionFilters: [isnotnull(lang"),
      s"expected partition filters in:\n$plan")
  }

  test("remote source never plans a content fetch when content is unused") {
    val fixture = ops.Ingest.buildFixture()
    val df = spark.read.format("graft.sources.RemoteFileSource")
      .option("urls", s"ftp://localhost:21$fixture").load()
      .select("file_name", "size")
    val plan = df.queryExecution.executedPlan.toString()
    assert(!plan.contains("content"),
      s"content column must be pruned out of the scan:\n$plan")
    // all 8 files listed, including the zero-byte one Spark's own file
    // index drops
    assert(df.count() === 8)
  }

  test("sink_fs_connector writes through the Hadoop FileSystem interface") {
    // The seam claim: every sink-side FS operation goes through
    // org.apache.hadoop.fs.FileSystem, so an object-store connector
    // (abfss://, s3a://) is a config change. Pin that the demonstrated
    // scheme resolves to the local connector implementation and that
    // the partitioned layout is visible THROUGH the interface.
    SparkEntry.queries("sink_fs_connector")(spark, sf).collect()
    val uri = new java.net.URI(s"file://${Tables.scratchRoot}/sink/fs_connector")
    val fs = org.apache.hadoop.fs.FileSystem
      .get(uri, spark.sparkContext.hadoopConfiguration)
    assert(fs.isInstanceOf[org.apache.hadoop.fs.LocalFileSystem],
      s"file:// must resolve to the local Hadoop connector, got ${fs.getClass}")
    val table = new org.apache.hadoop.fs.Path(
      fs.makeQualified(new org.apache.hadoop.fs.Path(uri)), "documents")
    val langDirs = fs.listStatus(table).filter(_.isDirectory)
      .map(_.getPath.getName).filter(_.startsWith("lang="))
    assert(langDirs.nonEmpty, "partition dirs must be listed through the FS API")
  }

  test("remote source dispatches by scheme and rejects unknown protocols") {
    val fixture = ops.Ingest.buildFixture()
    val e = intercept[Throwable] {
      spark.read.format("graft.sources.RemoteFileSource")
        .option("urls", s"gopher://host:70$fixture").load().count()
    }
    val messages = Iterator.iterate(e)(_.getCause).takeWhile(_ != null)
      .map(_.getMessage).mkString(" | ")
    assert(messages.contains("unsupported protocol"), messages)
  }

  test("remote source round-trips payload bytes intact") {
    val fixture = ops.Ingest.buildFixture()
    val rows = spark.read.format("graft.sources.RemoteFileSource")
      .option("urls", s"sftp://localhost:22$fixture").load()
      .where(org.apache.spark.sql.functions.col("file_name") === "dup_one.txt")
      .collect()
    assert(rows.length === 1)
    assert(new String(rows.head.getAs[Array[Byte]]("content"), "UTF-8")
      === "same content twice")
    assert(rows.head.getAs[String]("server_folder") === "localhost_22")
  }

  test("remote stream drains in batchSize micro-batches under AvailableNow") {
    val fixture = ops.Ingest.buildFixture()
    val ckptDir = new java.io.File(s"${Tables.scratchRoot}/stream/remote_spec")
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete(): Unit
    }
    if (ckptDir.exists()) del(ckptDir)
    val st = spark.readStream.format("graft.sources.RemoteFileSource")
      .option("urls", s"ftp://localhost:21$fixture")
      .option("batchSize", "3")
      .load()
    val q = st.writeStream.format("memory").queryName("remote_spec_t")
      .outputMode("append")
      .option("checkpointLocation", s"$ckptDir/ckpt")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    assert(spark.table("remote_spec_t").count() === 8)
    val dataBatches = q.recentProgress.count(_.numInputRows > 0)
    assert(dataBatches >= 3,
      s"8 files at batchSize=3 must take >= 3 micro-batches, got $dataBatches")
  }

  test("remote stream is incremental across runs: only new files processed") {
    val fixture = ops.Ingest.buildFixture()
    val base = new java.io.File(s"${Tables.scratchRoot}/stream/remote_incr")
    def del(f: java.io.File): Unit = {
      if (f.isDirectory) f.listFiles().foreach(del)
      f.delete(): Unit
    }
    if (base.exists()) del(base)
    def runOnce(): Unit = {
      val st = spark.readStream.format("graft.sources.RemoteFileSource")
        .option("urls", s"ftp://localhost:21$fixture")
        .option("batchSize", "3")
        .load()
        .select("file_name", "size")
      val q = st.writeStream.format("parquet")
        .option("path", s"$base/out")
        .option("checkpointLocation", s"$base/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    runOnce()
    assert(spark.read.parquet(s"$base/out").count() === 8)
    // a new file arrives between two cron-style runs
    val f = new java.io.FileOutputStream(new java.io.File(fixture, "late.txt"))
    f.write("late arrival".getBytes("UTF-8")); f.close()
    runOnce()
    import org.apache.spark.sql.functions.col
    val out = spark.read.parquet(s"$base/out")
    assert(out.count() === 9, "second run must ingest ONLY the new file")
    assert(out.where(col("file_name") === "late.txt").count() === 1)
  }

  test("sink_compact merges the shattered input into target-size files") {
    val before = SparkEntry.queries("sink_compact")(spark, sf).collect()
    val (nSmall, nOut) = graft.ops.Ingest.compactFileCounts(spark, sf)
    assert(nSmall === 64, "stage 1 must shatter into 64 splits")
    // sf0.01 lineitem is ~1.5 MB on disk — one 8 MiB target file.
    assert(nOut === 1, s"expected 1 compacted file, got $nOut")
    // content-neutral: same rows either way (oracle checks vs source
    // table; here pin count over the compacted output)
    assert(before.map(_.getLong(1)).sum === 6000)
  }

  test("z-order tightens row-group ranges on BOTH dimensions; single sort only on its own") {
    SparkEntry.queries("sink_zorder")(spark, sf).count() // builds zorder/out
    val single = graft.ops.Ingest.writeSingleSorted(spark, sf)
    def meanSpanFrac(dir: String, colName: String): Double = {
      val ranges = graft.ops.Ingest.rowGroupRanges(spark, dir, colName)
      assert(ranges.nonEmpty, s"$dir has no row groups")
      val lo = ranges.map(_._1).min
      val hi = ranges.map(_._2).max
      ranges.map { case (a, b) => (b - a).toDouble / math.max(1L, hi - lo) }
        .sum / ranges.size
    }
    val zDir = s"${Tables.scratchRoot}/zorder/out"
    val zOrder = meanSpanFrac(zDir, "l_orderkey")
    val zPart = meanSpanFrac(zDir, "l_partkey")
    val sOrder = meanSpanFrac(single, "l_orderkey")
    val sPart = meanSpanFrac(single, "l_partkey")
    // single-column sort: its own column is tight, the OTHER is ~full
    assert(sOrder < 0.5, s"orderkey-sorted orderkey span $sOrder")
    assert(sPart > 0.8, s"orderkey-sorted partkey span $sPart (should be ~1)")
    // z-order: BOTH dimensions bounded — that is the whole point
    assert(zOrder < 0.75 && zPart < 0.75,
      s"z-order spans order=$zOrder part=$zPart (both must tighten)")
    assert(zPart < sPart,
      s"z-order must beat single-sort on the second dimension: $zPart vs $sPart")
  }

  test("dedup policies partition the input: semi + anti = all") {
    val semi = SparkEntry.queries("join_semi")(spark, sf).count()
    val anti = SparkEntry.queries("join_anti")(spark, sf).count()
    val all = Tables.t(spark, sf, "customer").count()
    assert(semi + anti === all)
  }

  test("tar parser matches commons-compress entry-for-entry; checksum tamper dies") {
    val dir = ops.Ingest.buildTarFixture()
    val gzBytes = java.nio.file.Files.readAllBytes(
      new java.io.File(dir, "bundle.tar.gz").toPath)
    val gun = {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(gzBytes))
      try in.readAllBytes() finally in.close()
    }
    // reference reader: commons-compress (INDEPENDENT implementation),
    // recursing into inner.tar the same way the hand parser does
    import org.apache.commons.compress.archivers.tar.TarArchiveInputStream
    def ccParse(bytes: Array[Byte]): Seq[(String, Long, Long, Seq[Byte])] = {
      val t = new TarArchiveInputStream(new java.io.ByteArrayInputStream(bytes))
      val b = Seq.newBuilder[(String, Long, Long, Seq[Byte])]
      var e = t.getNextEntry
      while (e != null) {
        if (e.isFile) {
          val content = t.readAllBytes()
          val base = e.getName.split('/').last
          if (base.endsWith(".tar")) b ++= ccParse(content)
          else b += ((base, e.getModTime.getTime / 1000, e.getSize,
            content.toSeq))
        }
        e = t.getNextEntry
      }
      b.result()
    }
    val ref = ccParse(gun).sortBy(x => (x._1, x._4.hashCode))
    val mine = graft.expr.TarEntries.extract(gzBytes)
      .map(en => (en.name, en.mtime, en.size, en.content.toSeq))
      .sortBy(x => (x._1, x._4.hashCode))
    assert(mine === ref, "hand-rolled ustar parse must equal commons-compress")
    assert(mine.map(_._1).sorted ===
      Seq("a.txt", "b.bin", "c.txt", "d.txt", "d.txt"), "expected member set")
    // a flipped byte inside the first header's checksum field must die
    val bad = gun.clone()
    bad(150) = (bad(150) ^ 0x01).toByte
    intercept[IllegalArgumentException] {
      graft.expr.TarEntries.extract(bad)
    }
  }
}
