package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Maximal independent set via Luby's algorithm (Luby 1986 — THE
  * parallel MIS primitive; greedy sequential MIS is inherently
  * serial): each round every still-active node draws a priority, the
  * local minima of the priority order join the set, and winners plus
  * their neighborhoods deactivate. Expected O(log n) rounds.
  *
  * Determinism/replayability: the round-r priority is the md5 13-hex
  * prefix of `node:r` with (priority, node) lexicographic tie-break —
  * fixed-length hex compares identically as a string in Spark and
  * DuckDB (the q_negative_sample rule), so every round, the final
  * set, and the selection rounds replay bit-for-bit in an
  * unrolled-CTE oracle.
  *
  * Fail-fast contract (the Truss maxRounds rule): if rounds exhaust
  * while nodes are still active the function THROWS rather than
  * returning a non-maximal set — and any paired oracle must unroll at
  * least the same number of layers.
  *
  * Scale shape: per round, two node-keyed equi joins (neighbor
  * priority comparison), one distinct, one left join tagging beaten
  * actives (ONE eager checkpoint winners/mis/neighborhood all read),
  * one neighborhood-expansion join and one LEFT ANTI into the lazy
  * survivor checkpoint whose count is the loop probe — two Spark jobs
  * per round, all hashing on node ids, O(active edges) per round.
  * Nothing collects. */
object Mis {

  /** @param edges undirected canonical (src, dst) edge list.
    * @return (node, sel_round): the maximal independent set and the
    *         1-based Luby round that selected each member. */
  def luby(edges: DataFrame, maxRounds: Int): DataFrame = {
    require(maxRounds >= 1)
    val spark = edges.sparkSession
    val und = Bfs.undOf(edges)
    var active = und.select(col("a").as("node")).distinct()
      .localCheckpoint(true)
    var activeRows = active.count()
    // empty-graph-safe accumulator (long node, long sel_round)
    var mis = spark.range(0).select(col("id").as("node"),
      col("id").as("sel_round"))
    var r = 1
    while (activeRows > 0L && r <= maxRounds) {
      val prio = active.withColumn("p",
        substring(md5(concat(col("node").cast("string"), lit(s":$r"))),
          1, 13))
      // count-informed broadcasts (the Bfs rule): both priority
      // sides are |active| rows, known exactly from the probe — the
      // materialized edge frame otherwise re-exchanges every round
      val v = Bfs.bcastIfSmall(
        prio.select(col("node").as("vnode"), col("p").as("vp")), activeRows)
      val w = Bfs.bcastIfSmall(
        prio.select(col("node").as("wnode"), col("p").as("wp")), activeRows)
      // a node is beaten if ANY active neighbor wins the
      // (priority, node) order; un-beaten actives are the round's
      // local minima — isolated actives win by vacuity
      val beaten = und
        .join(v, col("vnode") === col("a"))
        .join(w, col("wnode") === col("b"))
        .where(col("wp") < col("vp") ||
          (col("wp") === col("vp") && col("wnode") < col("vnode")))
        .select(col("vnode").as("node")).distinct()
      // TWO jobs per round (measured ~2x over winners-eager +
      // active-eager + two counts): one eager checkpoint of the
      // beat-tagged active set — winners, the mis accumulation, and
      // the neighborhood expansion all read off it for free — and one
      // lazy checkpoint of the survivors materialized by the count
      // probe. A zero-winner round on a non-empty active set is
      // impossible (some node holds the global minimum priority), so
      // progress needs no extra guard.
      val tagged = active
        .join(Bfs.bcastIfSmall(beaten.withColumn("beat", lit(true)),
          activeRows), Seq("node"), "left")
        .select(col("node"), coalesce(col("beat"), lit(false)).as("beat"))
        .localCheckpoint(true)
      val winners = tagged.where(!col("beat")).select(col("node"))
      val nbrWin = und.join(Bfs.bcastIfSmall(winners, activeRows),
          col("node") === col("a"))
        .select(col("b").as("node"))
      active = tagged.where(col("beat")).select(col("node"))
        .join(nbrWin, Seq("node"), "left_anti")
        .localCheckpoint(false)
      activeRows = active.count() // the probe job
      mis = mis.unionByName(
        winners.select(col("node"), lit(r.toLong).as("sel_round")))
      r += 1
    }
    require(activeRows == 0L,
      s"Luby MIS still has $activeRows active nodes after " +
        s"maxRounds=$maxRounds — raise maxRounds (and any paired " +
        "oracle's unroll depth)")
    mis.orderBy(asc("node"))
  }
}
