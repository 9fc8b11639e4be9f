package graft.ops

/** Bradley-Terry preference-strength estimation via the classic MM
  * (minorization-maximization) update (Hunter, Annals of Statistics
  * 2004): p_i <- W_i / sum_j n_ij / (p_i + p_j) — the model behind
  * pairwise preference data (RLHF reward comparisons, ranking from
  * A/B duels).
  *
  * The distributed half is the pairwise win-count aggregate; the item
  * set is bounded (brands/arms/models), so the fixed-iteration
  * recursion runs driver-side on an integer MICRO grid with pure long
  * division — truncating JVM `/` on the nonnegative operands equals
  * DuckDB's BIGINT `//`, so the oracle replays the iterations as
  * unrolled CTEs bit-for-bit (same recipe as ops.Smoothing /
  * ops.Survival). Updates are SYNCHRONOUS: every iteration reads only
  * the previous iteration's ratings.
  *
  * Overflow bounds: terms are `n_ij * 1e12 / (p_i + p_j)` and
  * `W_i * 1e12 / denom` — safe in a long for W_i, n_ij up to ~9e6
  * (guarded below); shift both engines to DECIMAL(38,0)/HUGEINT
  * beyond that.
  */
object BradleyTerry {

  private val Scale = 1000000000000L // 1e12: micro-ratings x 1e6

  /** @param wins (winner, loser, count) aggregated win events
    * @return per item: (item, wins, matches, rating_micro) sorted by
    *         item; initial rating 1e6, `iters` MM rounds. */
  def ratings(wins: Seq[(String, String, Long)],
      iters: Int = 3): Seq[(String, Long, Long, Long)] = {
    val n = scala.collection.mutable.Map.empty[(String, String), Long]
    wins.foreach { case (wi, lo, w) =>
      require(w <= 9000000L, s"win count $w overflows the long grid")
      n((wi, lo)) = n.getOrElse((wi, lo), 0L) + w
      n((lo, wi)) = n.getOrElse((lo, wi), 0L) + w
    }
    val wTot = wins.groupBy(_._1).map { case (b, xs) => b -> xs.map(_._3).sum }
    wTot.values.foreach(w =>
      require(w <= 9000000L, s"total wins $w overflows the long grid"))
    val items = n.keysIterator.map(_._1).toSeq.distinct.sorted
    val nbrs: Map[String, Seq[(String, Long)]] = items.map { i =>
      i -> n.iterator.collect { case ((`i`, j), c) => (j, c) }.toSeq
    }.toMap
    var p: Map[String, Long] = items.map(_ -> 1000000L).toMap
    for (_ <- 1 to iters) {
      p = items.map { i =>
        val denom = nbrs(i).iterator.map { case (j, nij) =>
          nij * Scale / (p(i) + p(j)) // p_i+p_j > 0 when n_ij > 0
        }.sum
        val w = wTot.getOrElse(i, 0L)
        i -> (if (denom > 0L) w * Scale / denom else 0L)
      }.toMap
    }
    items.map(i =>
      (i, wTot.getOrElse(i, 0L), nbrs(i).map(_._2).sum, p(i)))
  }
}
