package graft.ingest

import java.nio.file.Files

import org.apache.spark.sql.functions._

import graft.{SparkSpec, Tables}

class ExportSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("export round-trips content exactly; shard assignment is a pure id function") {
    val out = Files.createTempDirectory("graft-export").toString + "/c"
    val docs = Tables.documents(spark, dir).select("doc_id", "text", "source")
    val stats = Export.shards(docs, "doc_id", out, nShards = 8)
    assert(stats.map(_.rows).sum === docs.count())
    // reload parity, row for row
    val back = spark.read.parquet(out)
    assert(back.select("doc_id", "text", "source").collect().map(_.toSeq).toSet
      === docs.collect().map(_.toSeq).toSet)
    // shard = xxhash64(id) mod n, recomputable by any consumer
    val bad = back.where(
      col("__shard").cast("long") =!= pmod(xxhash64(col("doc_id")), lit(8L)))
    assert(bad.count() === 0L)
    // verification passes on the intact export
    assert(Export.verify(spark, out, "doc_id").isEmpty)
  }

  test("verify flags a tampered shard and a lost shard") {
    val out = Files.createTempDirectory("graft-export2").toString + "/c"
    val docs = Tables.documents(spark, dir).select("doc_id", "text")
    Export.shards(docs, "doc_id", out, nShards = 4)
    // tamper: append a duplicated row into shard 0
    docs.limit(1).withColumn("__shard", lit(0L))
      .write.mode("append").partitionBy("__shard").parquet(out)
    val bad = Export.verify(spark, out, "doc_id")
    assert(bad == Seq(0L), bad.toString)
    // lose a whole shard: delete its directory
    val shard1 = new java.io.File(s"$out/__shard=1")
    shard1.listFiles().foreach(_.delete()); shard1.delete()
    val bad2 = Export.verify(spark, out, "doc_id")
    assert(bad2.contains(1L) && bad2.contains(0L), bad2.toString)
  }

  test("manifest parses back exactly what was written") {
    val out = Files.createTempDirectory("graft-export3").toString + "/c"
    val docs = Tables.documents(spark, dir).select("doc_id")
    val stats = Export.shards(docs, "doc_id", out, nShards = 3)
    assert(Export.readManifest(out) === stats)
  }
}
