package graft.queries

/** Sequential replay of the exact-integer k-means training chain (the
  * [[KmeansTrainSpec]] recipe: fixed-point int64 accumulation at 2^20
  * scale, cosine-scale-invariant centroid directions, emptied/all-zero
  * cells dropped) — shared by the trained-serving specs so every one of
  * them pins the distributed chain against ONE local trainer definition. */
object TrainReplay {

  def cos(a: Array[Double], b: Array[Double]): Double = {
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- a.indices) { d += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
    d / (math.sqrt(na) * math.sqrt(nb))
  }

  /** Hard assignment: max cosine, ties to the SMALLER cent_id (the
    * `rankedCells` pinned tie-break). */
  def assign(v: Array[Double], cents: Seq[(Long, Array[Double])]): Long =
    cents.maxBy { case (id, c) => (cos(v, c), -id) }._1

  /** Final centroid table after `iters` exact fixed-point Lloyd rounds
    * from the `nCells` seed vectors (vec_id < nCells). */
  def trainedCents(emb: Array[(Long, Array[Double])], nCells: Int,
      iters: Int): Seq[(Long, Array[Double])] = {
    val dim = emb.head._2.length
    var cents: Seq[(Long, Array[Double])] =
      emb.filter(_._1 < nCells).map { case (id, v) => (id, v) }.toSeq
    for (_ <- 1 to iters) {
      val fp = collection.mutable.Map.empty[Long, Array[Long]]
      for ((_, v) <- emb) {
        val c = assign(v, cents)
        val nrm = math.sqrt(v.map(x => x * x).sum)
        val acc = fp.getOrElseUpdate(c, Array.ofDim[Long](dim))
        for (d <- 0 until dim)
          acc(d) += math.floor(v(d) / nrm * 1048576.0 + 0.5).toLong
      }
      cents = fp.toSeq.sortBy(_._1)
        .map { case (c, a) => (c, a.map(_.toDouble)) }
        .filter { case (_, a) => a.exists(_ != 0.0) }
    }
    cents
  }
}
