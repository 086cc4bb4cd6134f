package graft

import graft.expr.{MinHash, MinHashAgg}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.unsafe.types.UTF8String
import org.scalatest.funsuite.AnyFunSuite

/** Algebraic laws of the MinHash kernel — the properties that make
  * map-side partial aggregation and the scalar/aggregate duality sound
  * at any partitioning. Deterministic seeded fuzz. */
class MinHashSpec extends AnyFunSuite {
  private val k = 16
  private val rnd = new scala.util.Random(42)

  private def word(): String =
    Seq.fill(2 + rnd.nextInt(8))(('a' + rnd.nextInt(26)).toChar).mkString

  private def sig(xs: Seq[String]): Seq[Long] = {
    val buf = Array.fill(k)(Long.MaxValue)
    xs.foreach(x => MinHash.updateBuf(buf, UTF8String.fromString(x)))
    buf.toSeq
  }

  private def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
    a.zip(b).map { case (x, y) => math.min(x, y) }

  test("partition split invariance: sig(a ++ b) == merge(sig(a), sig(b))") {
    for (_ <- 1 to 50) {
      val xs = Seq.fill(1 + rnd.nextInt(40))(word())
      val cut = rnd.nextInt(xs.length + 1)
      val (l, r) = xs.splitAt(cut)
      assert(sig(xs) === merge(sig(l), sig(r)),
        s"split at $cut must not change the signature: $xs")
    }
  }

  test("order insensitivity: sig(shuffled) == sig(original)") {
    for (_ <- 1 to 50) {
      val xs = Seq.fill(1 + rnd.nextInt(40))(word())
      assert(sig(rnd.shuffle(xs)) === sig(xs))
    }
  }

  test("updates are monotone non-increasing per slot") {
    for (_ <- 1 to 20) {
      val buf = Array.fill(k)(Long.MaxValue)
      var prev = buf.toSeq
      for (_ <- 1 to 30) {
        MinHash.updateBuf(buf, UTF8String.fromString(word()))
        assert(buf.toSeq.zip(prev).forall { case (n, p) => n <= p })
        prev = buf.toSeq
      }
    }
  }

  test("scalar sigOf agrees with the Aggregator surface") {
    val agg = new MinHashAgg(k)
    for (_ <- 1 to 30) {
      val xs = Seq.fill(1 + rnd.nextInt(30))(word())
      val viaAgg = xs.foldLeft(agg.zero)((b, x) => agg.reduce(b, x)).toSeq
      val viaScalar = MinHash.sigOf(
        new GenericArrayData(xs.map(UTF8String.fromString).toArray), k)
        .toLongArray.toSeq
      assert(viaAgg === viaScalar)
    }
  }
}

/** Remote URL parsing + dispatch contract (scrap/child_otherftp.py:129-162
  * semantics: scheme branch, default ports 21/22, else raise). */
class RemoteUrlSpec extends AnyFunSuite {
  import graft.sources.RemoteUrl

  test("default ports per scheme; explicit port wins") {
    assert(RemoteUrl.parse("ftp://h/dir").port === 21)
    assert(RemoteUrl.parse("sftp://h/dir").port === 22)
    assert(RemoteUrl.parse("sftp://h:2222/dir").port === 2222)
    assert(RemoteUrl.parse("FTP://H:99/d").scheme === "ftp")
  }

  test("server_folder is hostname_port (child.py:16-18)") {
    assert(RemoteUrl.parse("sftp://mirror.example.com:2222/x").serverFolder
      === "mirror.example.com_2222")
    assert(RemoteUrl.parse("ftp://localhost/x").serverFolder === "localhost_21")
  }

  test("unknown scheme raises at dispatch; malformed url raises at parse") {
    val p = RemoteUrl.parse("gopher://host:70/dir")
    val e = intercept[IllegalArgumentException](p.client)
    assert(e.getMessage.contains("unsupported protocol"))
    intercept[IllegalArgumentException](RemoteUrl.parse("no-scheme-here"))
    intercept[IllegalArgumentException](RemoteUrl.parse("ftp://"))
  }
}
