package graft.similarity

import org.apache.spark.sql.functions._

import graft.SparkSpec

class IvfIndexSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.001"
  private def emb = graft.Tables.embeddings(spark, sfDir)

  test("persisted index: probe-all equals brute force; pruning prunes") {
    val base = java.nio.file.Files.createTempDirectory("graft-ivf").toString
    val c = 8
    val name = IvfIndex.build(base, emb, "embedding", "vec_id", c)
    assert(IvfIndex.latestName(base).contains(name))

    val query = emb.where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))

    // nprobe = c → every cell probed → identical to exact brute force
    val viaIndex = IvfIndex.topK(spark, base, query, "embedding", "vec_id",
      k = 10, nprobe = c)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val brute = Similarity.topK(emb, "embedding", "vec_id", query, 10)
      .collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    assert(viaIndex == brute)

    // nprobe = 2: the scan must touch a strict subset of the files —
    // centroid_id is a partition column, so the isin filter prunes
    // directories before I/O
    val all = IvfIndex.assigned(spark, base)
    val cells = Similarity.ivfAssignQuery(query,
      IvfIndex.centroids(spark, base), 2).collect().map(_.getLong(0))
    val pruned = all.where(col("centroid_id").isin(cells.toIndexedSeq: _*))
    def filesRead(df: org.apache.spark.sql.DataFrame): Long =
      df.select(input_file_name()).distinct().count()
    assert(filesRead(pruned) < filesRead(all),
      s"${filesRead(pruned)} vs ${filesRead(all)}")
    // and the plan itself carries the partition filter (pruning happens
    // at planning, not as a post-scan filter)
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [centroid_id"))
    // and the probed result still finds plausible neighbors (recall
    // sanity; exactness at full probe is asserted above)
    val probed = IvfIndex.topK(spark, base, query, "embedding", "vec_id",
      k = 10, nprobe = 2).collect()
    assert(probed.length == 10)
  }

  test("retention: LATEST survives, older indexes prune") {
    val base = java.nio.file.Files.createTempDirectory("graft-ivf2").toString
    val small = emb.limit(50)
    val n1 = IvfIndex.build(base, small, "embedding", "vec_id", 4)
    Thread.sleep(5) // distinct timestamp names
    val n2 = IvfIndex.build(base, small, "embedding", "vec_id", 4)
    assert(IvfIndex.candidates(base) == Seq(n2, n1))
    assert(IvfIndex.latestName(base).contains(n2))
    val gone = IvfIndex.prune(base, 1)
    assert(gone == Seq(n1))
    assert(IvfIndex.candidates(base) == Seq(n2))
    // the surviving index still answers queries
    val q = small.where(col("vec_id") === 1).select(col("embedding").as("qvec"))
    assert(IvfIndex.topK(spark, base, q, "embedding", "vec_id", 3, nprobe = 4)
      .count() == 3)
  }

  test("append: delta segments equal a frozen-quantizer full assign; compact preserves") {
    val base = java.nio.file.Files.createTempDirectory("graft-ivf3").toString
    val c = 8
    val first = emb.where(col("vec_id") < 60)
    val delta1 = emb.where(col("vec_id") >= 60 && col("vec_id") < 80)
    val delta2 = emb.where(col("vec_id") >= 80)
    val n0 = IvfIndex.build(base, first, "embedding", "vec_id", c)
    val n1 = IvfIndex.append(base, delta1, "embedding", "vec_id")
    val n2 = IvfIndex.append(base, delta2, "embedding", "vec_id")
    assert(IvfIndex.latestName(base).contains(n2))
    // chained corpus view = every row exactly once
    val ids = IvfIndex.assigned(spark, base)
      .select(col("vec_id")).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq == emb.select(col("vec_id"))
      .collect().map(_.getLong(0)).sorted.toSeq)
    // assignments in the chain == one frozen-quantizer assign of the
    // full corpus (the append contract: same centroids, same cells)
    val cents = IvfIndex.centroids(spark, base)
    val full = Similarity.ivfAssign(emb, "embedding", "vec_id", cents)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val chained = IvfIndex.assigned(spark, base)
      .select(col("vec_id"), col("centroid_id")).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(chained == full)
    // probe-all through the CHAIN equals brute force over everything
    val query = emb.where(col("vec_id") === 0)
      .select(col("embedding").as("qvec"))
    def keyOf(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getDouble(1))).toSeq
    val viaChain = keyOf(IvfIndex.topK(spark, base, query, "embedding",
      "vec_id", k = 10, nprobe = c))
    val brute = keyOf(Similarity.topK(emb, "embedding", "vec_id", query, 10))
    assert(viaChain == brute)
    // compaction: one self-contained dir, same answers, LATEST moves
    val nc = IvfIndex.compact(spark, base)
    assert(IvfIndex.latestName(base).contains(nc))
    assert(keyOf(IvfIndex.topK(spark, base, query, "embedding", "vec_id",
      k = 10, nprobe = c)) == brute)
    // retention never severs a chain: pruning with keep=1 while the
    // latest is the compacted dir may delete the old segments, but a
    // chain-dependent latest keeps its ancestors
    IvfIndex.prune(base, 1)
    assert(keyOf(IvfIndex.topK(spark, base, query, "embedding", "vec_id",
      k = 10, nprobe = c)) == brute)
  }

  test("prune protects the whole segment chain of a non-compacted latest") {
    val base = java.nio.file.Files.createTempDirectory("graft-ivf4").toString
    val first = emb.where(col("vec_id") < 60)
    val delta = emb.where(col("vec_id") >= 60)
    IvfIndex.build(base, first, "embedding", "vec_id", 4)
    val n1 = IvfIndex.append(base, delta, "embedding", "vec_id")
    // keep=1 would normally delete the parent — the chain guard keeps it
    val gone = IvfIndex.prune(base, 1)
    assert(gone.isEmpty)
    val ids = IvfIndex.assigned(spark, base)
      .select(col("vec_id")).collect().map(_.getLong(0)).toSet
    assert(ids == emb.select(col("vec_id")).collect().map(_.getLong(0)).toSet)
    assert(IvfIndex.latestName(base).contains(n1))
  }
}
