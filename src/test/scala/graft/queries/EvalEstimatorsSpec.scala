package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The q_pass_at_k / q_maj_at_k integer formulas against brute-force
  * subset enumeration: for every (n, c) pool the product-form basis
  * points must equal the combinatorial definition computed by
  * enumerating ALL k-subsets exactly (BigInt — no float anywhere in
  * the reference either). This pins the algebra the DuckDB oracle
  * replays; the oracle run pins the distributed plumbing. */
class EvalEstimatorsSpec extends SparkSpec {

  private def choose(n: Int, k: Int): BigInt =
    if (k < 0 || k > n) BigInt(0)
    else (BigInt(1) to BigInt(k)).foldLeft(BigInt(1))((a, i) =>
      a * (n - i.toInt + 1) / i)

  /** floor(10000 · (1 − C(n−c,k)/C(n,k))) via exact rationals. */
  private def passBpRef(n: Int, c: Int, k: Int): Long = {
    val den = choose(n, k)
    val num = choose(n - c, k)
    // 10000 − ceil-free floor-div of the miss probability, matching
    // 10000 − num·10000 div den on nonneg integers
    (BigInt(10000) - num * 10000 / den).toLong
  }

  /** Product form used by the query (and its oracle). */
  private def passBpQuery(n: Long, c: Long, k: Int): Long =
    if (n - c < k) 10000L
    else {
      val num = (0 until k).map(i => n - c - i).product
      val den = (0 until k).map(i => n - i).product
      10000L - num * 10000L / den
    }

  /** P(majority of 3 draws correct) by enumerating all 3-subsets. */
  private def maj3Ref(n: Int, c: Int): Long = {
    val num = choose(c, 2) * choose(n - c, 1) + choose(c, 3)
    (num * 10000 / choose(n, 3)).toLong
  }

  private def maj3Query(n: Long, c: Long): Long =
    (3 * c * (c - 1) * (n - c) + c * (c - 1) * (c - 2)) * 10000L /
      (n * (n - 1) * (n - 2))

  test("pass@k product form equals the combinatorial definition for all pools") {
    for {
      n <- 1 to 14
      c <- 0 to n
      k <- Seq(1, 2, 3, 4) if k <= n
    } assert(passBpQuery(n, c, k) === passBpRef(n, c, k), s"n=$n c=$c k=$k")
  }

  test("maj@3 product form equals subset enumeration for all pools") {
    for {
      n <- 3 to 14
      c <- 0 to n
    } {
      assert(maj3Query(n, c) === maj3Ref(n, c), s"n=$n c=$c")
      // and against a LITERAL enumeration of the C(n,3) subsets
      val pool = (0 until n).map(_ < c) // c correct samples
      val subsets = pool.indices.combinations(3).toSeq
      val hits = subsets.count(s => s.count(pool) >= 2)
      assert(maj3Query(n, c) ===
        BigInt(hits) * 10000 / subsets.size, s"enum n=$n c=$c")
    }
  }

  test("edge semantics: all-correct, none-correct, k larger than misses") {
    assert(passBpQuery(5, 5, 4) === 10000L) // n−c < k ⇒ certain pass
    assert(passBpQuery(5, 0, 4) === 0L)     // no correct ⇒ certain miss
    assert(maj3Query(5, 5) === 10000L)
    assert(maj3Query(5, 0) === 0L)
    // monotone in c for fixed n (sanity on the whole grid)
    for (n <- 4 to 12; k <- Seq(1, 2, 4)) {
      val vals = (0 to n).map(c => passBpQuery(n, c, k))
      assert(vals === vals.sorted, s"pass@$k not monotone at n=$n")
    }
  }

  test("the declared queries agree with a driver-side replay on real data") {
    val dir = "/root/testdata/sf0.001"
    val rows = graft.Tables.lineitem(spark, dir)
      .groupBy(col("l_orderkey"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_quantity") > 25, 1L).otherwise(0L)).as("c"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val suites = graft.Tables.orders(spark, dir)
      .select(col("o_orderkey"), col("o_orderpriority"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    val expect = rows.filter(_._2 >= 4)
      .groupBy(t => suites(t._1))
      .map { case (suite, ts) =>
        suite -> (ts.length.toLong,
          ts.map(t => passBpQuery(t._2, t._3, 1)).sum / ts.length,
          ts.map(t => passBpQuery(t._2, t._3, 2)).sum / ts.length,
          ts.map(t => passBpQuery(t._2, t._3, 4)).sum / ts.length)
      }
    val got = graft.SparkEntry.queries("q_pass_at_k")(spark, dir)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    assert(got === expect)
  }
}
