package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class RendezvousSpec extends SparkSpec {

  /** Brute-force HRW: argmax over j of md5("<j>|<id>") by (hash, j). */
  private def brute(id: Long, shards: Int): Long =
    (0 until shards).map { j =>
      val md = java.security.MessageDigest.getInstance("MD5")
        .digest(s"$j|$id".getBytes("UTF-8"))
      md.map("%02x".format(_)).mkString -> j.toLong
    }.max._2

  test("rendezvousShard matches the brute-force argmax for every k") {
    import spark.implicits._
    val ids = (0L until 200L).toDF("id")
    for (k <- Seq(2, 3, 8, 9, 16)) {
      val got = ids.select(col("id"),
          Shuffle.rendezvousShard(col("id"), k).as("s"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      for (id <- 0L until 200L)
        assert(got(id) == brute(id, k), s"id=$id k=$k")
    }
  }

  test("growing the shard count moves ONLY docs won by the new shard") {
    import spark.implicits._
    val ids = (0L until 1000L).toDF("id")
    for (k <- Seq(4, 8, 12)) {
      val rows = ids.select(
          Shuffle.rendezvousShard(col("id"), k).as("a"),
          Shuffle.rendezvousShard(col("id"), k + 1).as("b"))
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      // every mover lands in the NEW shard k; everyone else is fixed
      assert(rows.forall { case (a, b) => a == b || b == k })
      // and the new shard actually won a roughly fair share
      val moved = rows.count { case (a, b) => a != b }
      assert(moved > 0 && moved < 1000 * 3 / (k + 1),
        s"k=$k moved=$moved (expected ≈ ${1000 / (k + 1)})")
    }
  }

  test("assignment is reasonably balanced") {
    import spark.implicits._
    val counts = (0L until 2000L).toDF("id")
      .groupBy(Shuffle.rendezvousShard(col("id"), 8).as("s"))
      .agg(count(lit(1)).as("n"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(counts.keySet == (0L until 8L).toSet)
    // md5 is uniform: every shard within ±50% of the mean
    assert(counts.values.forall(n => n > 125 && n < 375), counts.toString)
  }
}
