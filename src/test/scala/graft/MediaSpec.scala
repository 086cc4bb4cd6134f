package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins for the real-codec media path (round-6): the javax.imageio
  * encode→decode round trip, the integer luma/resample math, and the
  * phash pair structure — all against the authored pixel spec, never
  * against environment-owned bytes (the round-5 failure mode). */
class MediaSpec extends AnyFunSuite {
  import SharedSpark.spark

  test("imageio round trip: decoded BMP and PNG pixels equal the authored spec") {
    val d = ops.Media.dir
    for (i <- 0 until ops.Media.numImages; ext <- Seq("bmp", "png")) {
      val f = new java.io.File(d, f"img_$i%02d.$ext")
      assert(f.isFile, s"$f must exist")
      val bytes = java.nio.file.Files.readAllBytes(f.toPath)
      val (w, h, luma) = ops.Media.decodeLuma(bytes)
      assert(w === ops.Media.width && h === ops.Media.height)
      val expected = ops.Media.pixels(i, reenc = ext == "png").map { p =>
        (77 * ((p >> 16) & 0xff) + 150 * ((p >> 8) & 0xff) + 29 * (p & 0xff)) >> 8
      }
      assert(luma.sameElements(expected),
        s"img_$i.$ext decode must return the authored luma plane")
    }
  }

  test("re-encode is byte-different but perceptually identical (the dedup_phash premise)") {
    val d = ops.Media.dir
    for (i <- 0 until ops.Media.numImages) {
      val bmp = java.nio.file.Files.readAllBytes(
        new java.io.File(d, f"img_$i%02d.bmp").toPath)
      val png = java.nio.file.Files.readAllBytes(
        new java.io.File(d, f"img_$i%02d.png").toPath)
      assert(!bmp.sameElements(png), "containers must differ byte-wise")
      val (bw, bh, bl) = ops.Media.decodeLuma(bmp)
      val (pw, ph, pl) = ops.Media.decodeLuma(png)
      val hb = ops.Media.ahash(bw, bh, bl)
      val hp = ops.Media.ahash(pw, ph, pl)
      assert(java.lang.Long.bitCount(hb ^ hp) <= 4,
        s"img_$i: re-encode must stay within the phash threshold")
    }
  }

  test("dedup_phash pairs every original with exactly its own re-encode") {
    val rows = SparkEntry.queries("dedup_phash")(spark, SharedSpark.sf).collect()
    assert(rows.length === ops.Media.numImages)
    rows.foreach { r =>
      val (a, b) = (r.getString(0), r.getString(1))
      assert(a.endsWith(".bmp") && b.endsWith(".png") &&
        a.stripSuffix(".bmp") === b.stripSuffix(".png"),
        s"unexpected pair $a ~ $b")
      assert(r.getLong(2) <= 4)
    }
  }

  test("mm_decode emits true pixel dimensions from the real decode") {
    val rows = SparkEntry.queries("mm_decode")(spark, SharedSpark.sf).collect()
    assert(rows.length === 2 * ops.Media.numImages)
    rows.foreach { r =>
      assert(r.getInt(1) === ops.Media.width && r.getInt(2) === ops.Media.height)
      val mean = r.getLong(3)
      assert(mean > 0 && mean < 255, s"mean luma $mean out of range")
    }
  }

  test("animated GIF round trip: every decoded frame equals the authored spec") {
    val f = new java.io.File(Tables.scratchRoot, "probe.gif")
    ops.Media.writeAnimatedGif(f, 0)
    val frames = ops.Media.decodeGifFrames(
      java.nio.file.Files.readAllBytes(f.toPath))
    assert(frames.length === ops.Media.videoFrames)
    frames.zipWithIndex.foreach { case ((w, h, luma), k) =>
      assert(w === ops.Media.width && h === ops.Media.height)
      // authored gray level l has r=g=b=l, so integer luma == l exactly
      val expected = ops.Media.framePixels(0, k).map(_ & 0xff)
      assert(luma.sameElements(expected), s"frame $k decode differs from spec")
    }
  }

  test("WAV round trip: decoded PCM equals the authored sample spec") {
    val d = ops.Media.dir
    for (i <- ops.Media.audioSizes.indices) {
      val f = new java.io.File(d, s"aud_$i.wav")
      assert(f.isFile, s"$f must exist")
      val decoded = ops.Media.decodeAudio(
        java.nio.file.Files.readAllBytes(f.toPath))
      assert(decoded.sameElements(ops.Media.audioSamples(i)),
        s"aud_$i.wav decode must return the authored samples")
    }
  }

  test("mm_audio windows tile each clip exactly") {
    val rows = SparkEntry.queries("mm_audio")(spark, SharedSpark.sf).collect()
    val byFile = rows.groupBy(_.getString(0))
    assert(byFile.keySet === ops.Media.audioSizes.indices.map(i => s"aud_$i.wav").toSet)
    ops.Media.audioSizes.indices.foreach { i =>
      val rs = byFile(s"aud_$i.wav").sortBy(_.getLong(1))
      assert(rs.map(_.getLong(2)).sum === ops.Media.audioSizes(i).toLong,
        "window sample counts must sum to the clip length")
      assert(rs.map(_.getLong(1)).toSeq === rs.indices.map(_.toLong),
        "window indices must be dense from 0")
    }
  }

  test("thumbnail is an exact integer area-average (4x4 hand case)") {
    // 4x4 plane → 2x2 thumb: each cell is the floor-average of its 2x2 block.
    val luma = Array(
      0, 10, 100, 100,
      20, 31, 100, 104,
      200, 200, 7, 8,
      200, 204, 9, 11)
    assert(ops.Media.thumbnail(4, 4, luma, 2).toSeq === Seq(15, 101, 201, 8))
  }
}
