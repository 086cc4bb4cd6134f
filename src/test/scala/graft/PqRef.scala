package graft

/** Driver-side reference of the PQ codebook pipeline (the Lloyd loop of
  * graft.ops.Pipeline#pqTrainCodebook plus encode): pure
  * single-threaded Scala over collected points — a different mechanism
  * from the distributed plan — shared by KmeansSpec and PipelineSpec.
  * Same discipline: 8 fixed seed vec_ids, (dist, cid) argmin
  * assignment, elementwise sum/count floor means over the non-negative
  * micro-unit grid, empty entries drop and stay dropped. */
object PqRef {
  val SeedIds = Seq(11L, 29L, 47L, 83L, 97L, 131L, 151L, 173L)
  val Sub = 4
  val SubDim = 16
  val Iters = 3

  def sub(p: Array[Long], i: Int): Array[Long] =
    p.slice(i * SubDim, i * SubDim + SubDim)

  def sqd(a: Array[Long], b: Array[Long]): Long = {
    var d = 0L; var i = 0
    while (i < a.length) { val t = a(i) - b(i); d += t * t; i += 1 }
    d
  }

  /** (sub, cid) -> trained entry. */
  def train(pts: Map[Long, Array[Long]]): Map[(Int, Long), Array[Long]] = {
    var cb: Map[(Int, Long), Array[Long]] =
      (for (c <- SeedIds if pts.contains(c); i <- 0 until Sub)
        yield (i, c) -> sub(pts(c), i)).toMap
    for (_ <- 1 to Iters) {
      val sums = collection.mutable.Map[(Int, Long), (Long, Array[Long])]()
      for ((_, p) <- pts; i <- 0 until Sub) {
        val pv = sub(p, i)
        val cid = cb.collect { case ((j, c), e) if j == i =>
          (sqd(pv, e), c)
        }.min._2
        val (n, acc) =
          sums.getOrElseUpdate((i, cid), (0L, new Array[Long](SubDim)))
        var k = 0
        while (k < SubDim) { acc(k) += pv(k); k += 1 }
        sums((i, cid)) = (n + 1, acc)
      }
      // non-negative sums: Long / == floor division == Spark `div`
      cb = sums.map { case (key, (n, acc)) => key -> acc.map(_ / n) }.toMap
    }
    cb
  }

  /** Per-vector sub-codes under a trained codebook. */
  def encode(pts: Map[Long, Array[Long]],
      cb: Map[(Int, Long), Array[Long]]): Map[Long, IndexedSeq[Long]] = {
    val ents = (0 until Sub).map(i =>
      i -> cb.keys.collect { case (j, c) if j == i => c }.toSeq.sorted).toMap
    pts.map { case (v, p) =>
      v -> (0 until Sub).map(i =>
        ents(i).map(c => (sqd(sub(p, i), cb((i, c))), c)).min._2)
    }
  }
}
