package graft

import org.scalatest.funsuite.AnyFunSuite

/** The scaling preflight (tools/scaling.py) mirrors the registered df
  * caps so its candidate-mass probe guards exactly the plans that will
  * run — a cap hardcoded twice is a cap silently wrong once (r10
  * ADVICE). This spec fails the suite if the Python RISK_KEYS caps
  * drift from the Scala constants they mirror.
  */
class ToolsLockstepSpec extends AnyFunSuite {
  private lazy val py: String = {
    val p = java.nio.file.Paths.get("tools/scaling.py")
    new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
  }

  private def pyCap(key: String): Long = {
    val re = ("\"" + key + "\": \\(\"\\w+\", (\\d+)\\)").r
    re.findFirstMatchIn(py) match {
      case Some(m) => m.group(1).toLong
      case None => fail(s"RISK_KEYS entry for $key not found in tools/scaling.py")
    }
  }

  test("scaling.py RISK_KEYS df caps match the Scala constants they probe") {
    assume(java.nio.file.Files.exists(
      java.nio.file.Paths.get("tools/scaling.py")), "run from the repo root")
    assert(pyCap("dedup_containment") === ops.Llm.containmentDfCap)
    assert(pyCap("dedup_ngram") === ops.Llm.ngramDfCap)
    assert(pyCap("dedup_fuzzy") === ops.Llm.fuzzyBucketCap)
    // recall's exact-truth probe is deliberately uncapped (that key is
    // the one that OOM'd the r9 sf10 leg) — pin that it stays None.
    assert(py.contains("\"dedup_minhash_recall\": (\"shingle\", None)"))
  }
}
