package graft.ops

import org.apache.spark.sql.functions._

import graft.SparkSpec

class ShuffleSpec extends SparkSpec {

  private def ids(n: Int) = {
    val s = spark
    import s.implicits._
    (0L until n.toLong).toDF("id")
  }

  test("positions are a strict 0..n-1 permutation") {
    val out = Shuffle.shuffled(ids(500), "id", seed = 7L)
    val pos = out.select("shuffle_pos").collect().map(_.getLong(0)).sorted
    assert(pos.toSeq == (0L until 500L))
  }

  test("order matches a local sort of the same md5 keys") {
    val out = Shuffle.shuffled(ids(300), "id", seed = 42L)
      .orderBy("shuffle_pos")
      .select("id").collect().map(_.getLong(0)).toSeq
    val md = java.security.MessageDigest.getInstance("MD5")
    def key(id: Long): String = {
      md.reset()
      md.digest(s"42|$id".getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    }
    val expected = (0L until 300L).sortBy(id => (key(id), id))
    assert(out == expected)
  }

  test("deterministic across runs; seed changes the order") {
    val a = Shuffle.shuffled(ids(200), "id", seed = 1L)
      .orderBy("shuffle_pos").select("id").collect().map(_.getLong(0)).toSeq
    val b = Shuffle.shuffled(ids(200), "id", seed = 1L)
      .orderBy("shuffle_pos").select("id").collect().map(_.getLong(0)).toSeq
    val c = Shuffle.shuffled(ids(200), "id", seed = 2L)
      .orderBy("shuffle_pos").select("id").collect().map(_.getLong(0)).toSeq
    assert(a == b)
    assert(a != c)
  }

  test("writeShards: one pruned directory per shard, shards partition the corpus") {
    val out = java.nio.file.Files.createTempDirectory("graft-shards").toString
    Shuffle.writeShards(ids(400), "id", seed = 5L, shards = 4, out)
    val dirs = new java.io.File(out).listFiles()
      .filter(_.getName.startsWith("shard_id=")).map(_.getName).sorted
    assert(dirs.toSeq == Seq("shard_id=0", "shard_id=1", "shard_id=2", "shard_id=3"))
    val back = spark.read.parquet(out)
    // shards partition the id set exactly, 100 rows each
    assert(back.count() == 400)
    assert(back.select("id").distinct().count() == 400)
    val sizes = back.groupBy("shard_id").count()
      .collect().map(_.getLong(1)).toSeq
    assert(sizes == Seq(100L, 100L, 100L, 100L))
    // reading one shard prunes to its directory's files only
    val one = spark.read.parquet(out).where(col("shard_id") === 2)
    val files = one.select(input_file_name()).distinct()
      .collect().map(_.getString(0))
    assert(files.nonEmpty && files.forall(_.contains("shard_id=2")))
    // shard membership matches the shuffle positions
    val expected = Shuffle.shuffled(ids(400), "id", seed = 5L)
      .select(col("id"), pmod(col("shuffle_pos"), lit(4L)).as("s"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    val got = back.select(col("id"), col("shard_id").cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(got == expected)
  }

  test("round-robin shards are near-equal in size") {
    val out = Shuffle.shuffled(ids(1000), "id", seed = 3L)
      .select(pmod(col("shuffle_pos"), lit(8L)).as("shard"))
      .groupBy("shard").count()
      .collect().map(_.getLong(1))
    assert(out.length == 8)
    assert(out.max - out.min <= 1)
  }
}
