package graft

import org.scalatest.funsuite.AnyFunSuite

/** Llm.Scratch latch semantics — the properties the whole train-once
  * artifact discipline rests on. The nested-build pin exists because
  * ConcurrentHashMap.computeIfAbsent holds the bin lock during the
  * build, so a Scratch build that itself touches Scratch (a DERIVED
  * artifact built from a base artifact — the bucketed pagerank edge
  * table over the plain edge artifact) threw
  * IllegalStateException("Recursive update") whenever the two paths
  * collided in a bin: a map-capacity-dependent TRANSIENT that failed
  * one full Verify in five in round 13. The putIfAbsent+future latch
  * builds outside any map lock, making nesting legal at any depth.  */
class ScratchSpec extends AnyFunSuite {
  import graft.ops.Llm.Scratch

  private def tmp(): java.io.File = {
    val d = java.nio.file.Files.createTempDirectory("graft-scratch").toFile
    d
  }

  test("nested once-builds at depth 64 succeed (the Recursive update class)") {
    val dir = tmp()
    try {
      val hits = new java.util.concurrent.atomic.AtomicInteger(0)
      // 64 distinct paths guarantee bin collisions at every realistic
      // table capacity — under the computeIfAbsent latch this nesting
      // threw as soon as any two nested paths shared a bin.
      def nest(i: Int): Unit =
        if (i < 64) Scratch.once(s"${dir.getPath}/p$i") {
          hits.incrementAndGet(); nest(i + 1)
        }
      nest(0)
      assert(hits.get() === 64)
      // all latched: a second pass builds nothing
      nest(0)
      assert(hits.get() === 64)
    } finally Tables.deleteRecursively(dir)
  }

  test("a failed build installs no latch: the next caller rebuilds") {
    val dir = tmp()
    try {
      val p = s"${dir.getPath}/failing"
      val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
      intercept[RuntimeException] {
        Scratch.once(p) { attempts.incrementAndGet(); sys.error("boom") }
      }
      Scratch.once(p) { attempts.incrementAndGet(): Unit }
      assert(attempts.get() === 2)
      // and now it IS latched
      Scratch.once(p) { attempts.incrementAndGet(): Unit }
      assert(attempts.get() === 2)
    } finally Tables.deleteRecursively(dir)
  }

  test("a waiter blocked on a FAILING build retries it instead of " +
      "inheriting the winner's exception (r13 ADVICE)") {
    val dir = tmp()
    try {
      val p = s"${dir.getPath}/retry"
      val attempts = new java.util.concurrent.atomic.AtomicInteger(0)
      val winnerIn = new java.util.concurrent.CountDownLatch(1)
      val winner = new Thread(() => {
        try Scratch.once(p) {
          attempts.incrementAndGet()
          winnerIn.countDown()
          Thread.sleep(100)
          sys.error("winner boom")
        } catch { case _: Throwable => () }
      })
      winner.start()
      winnerIn.await() // the waiter joins while the doomed build runs
      Scratch.once(p) { attempts.incrementAndGet(): Unit } // must NOT throw
      winner.join(10000)
      assert(attempts.get() === 2)
    } finally Tables.deleteRecursively(dir)
  }

  test("a reentrant build on the SAME path fails fast, not deadlocks") {
    val dir = tmp()
    try {
      val p = s"${dir.getPath}/reent"
      val e = intercept[IllegalStateException] {
        Scratch.once(p) { Scratch.once(p) { () } }
      }
      assert(e.getMessage.contains("reentrant"))
      // the failed outer build installed no latch: a clean retry works
      val built = new java.util.concurrent.atomic.AtomicInteger(0)
      Scratch.once(p) { built.incrementAndGet(): Unit }
      assert(built.get() === 1)
    } finally Tables.deleteRecursively(dir)
  }

  test("concurrent same-path callers block on one build") {
    val dir = tmp()
    try {
      val p = s"${dir.getPath}/conc"
      val builds = new java.util.concurrent.atomic.AtomicInteger(0)
      val started = new java.util.concurrent.CountDownLatch(1)
      val threads = (1 to 8).map { _ =>
        new Thread(() => {
          started.await()
          Scratch.once(p) { Thread.sleep(50); builds.incrementAndGet(): Unit }
        })
      }
      threads.foreach(_.start())
      started.countDown()
      threads.foreach(_.join(10000))
      assert(builds.get() === 1)
    } finally Tables.deleteRecursively(dir)
  }
}
