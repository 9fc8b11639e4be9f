package graft.ops

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing — assign every document to a fixed-token-budget
  * training batch, grouped by length bucket, deterministically.
  *
  * Why: a training loader that pads every sequence in a batch to the
  * batch max wastes compute proportional to length variance. The
  * standard fix is length bucketing: round each doc's token count up
  * to a bucket width, then fill each batch with `budget / width` docs
  * of the same bucket — padding waste is bounded by the bucket ratio
  * (≤ 2× with power-of-two widths), and every batch has an identical
  * token footprint. Greedy first-fit bin packing would beat it by a
  * few percent but is inherently sequential; bucketing is the
  * embarrassingly-parallel form every large pipeline actually ships.
  *
  * Plan shape for 100 TB (same machinery as [[Shuffle.shuffled]]):
  *   - bucket + shuffle key (`md5(seed | id)`) are pure column
  *     expressions;
  *   - per-bucket positions come from ONE range-partitioned sort on
  *     (bucket, key, id) + `zipWithIndex` — exact, parallel, no
  *     single-reducer window. Positions depend only on the total
  *     order, so output is deterministic run-to-run and engine-to-
  *     engine;
  *   - bucket offsets (to convert global rank → rank within bucket)
  *     are a tiny aggregate — one row per bucket — collected and
  *     re-embedded as a literal map (bounded by |buckets|, ≤ 10).
  *
  * Output columns: idCol, tokCol, `bucket_w` (assigned width),
  * `batch_idx` (0-based batch within the bucket), `slot` (0-based
  * position within the batch). A batch is globally identified by
  * (bucket_w, batch_idx); all its members pad to exactly bucket_w
  * tokens.
  */
object SeqPack {

  def pack(df: DataFrame, idCol: String, tokCol: String, seed: Long,
      budget: Long = 4096,
      buckets: Seq[Long] = Seq(64L, 128L, 256L, 512L, 1024L, 2048L, 4096L),
      partitions: Int = 32): DataFrame = {
    require(buckets.nonEmpty && buckets == buckets.sorted, s"buckets $buckets")
    require(budget >= buckets.last,
      s"budget $budget must fit the largest bucket ${buckets.last}")
    val spark = df.sparkSession

    // smallest bucket ≥ tok; the last bucket catches everything longer
    // (a doc longer than the budget still packs — alone in its batch —
    // the loader truncates, this operator only assigns).
    val bucketCol = buckets.init.reverse.foldLeft(lit(buckets.last)) {
      (acc, b) => when(col(tokCol) <= b, lit(b)).otherwise(acc)
    }

    val sorted = df
      .select(col(idCol), col(tokCol).cast("long").as(tokCol))
      .withColumn("bucket_w", bucketCol)
      .withColumn("__k",
        md5(concat(lit(seed.toString), lit("|"), col(idCol).cast("string"))))
      .repartitionByRange(partitions, col("bucket_w"), col("__k"), col(idCol))
      .sortWithinPartitions(col("bucket_w"), col("__k"), col(idCol))
    val schema = sorted.schema.add("__gpos", LongType, nullable = false)
    val withPos = sorted.rdd.zipWithIndex().map { case (r, i) =>
      Row.fromSeq(r.toSeq :+ i)
    }
    val positioned = spark.createDataFrame(withPos, schema)

    // rank within bucket = global rank − (docs in all earlier buckets).
    // One tiny agg (≤ |buckets| rows) collected, prefix-summed on the
    // driver, and embedded as a literal map — bounded, deterministic.
    val counts = positioned.groupBy(col("bucket_w"))
      .agg(count(lit(1)).as("n")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
    val offsets = counts.map(_._1)
      .zip(counts.map(_._2).scanLeft(0L)(_ + _).init).toMap
    val offsetCol = offsets.toSeq.sortBy(_._1).reverse
      .foldLeft(lit(0L)) { case (acc, (b, off)) =>
        when(col("bucket_w") === b, lit(off)).otherwise(acc)
      }

    positioned
      .withColumn("__p", col("__gpos") - offsetCol)
      // integer division — Column./ on longs is double division
      .withColumn("__dpb", expr(s"${budget}L DIV bucket_w"))
      .select(col(idCol), col(tokCol), col("bucket_w"),
        expr("__p DIV __dpb").as("batch_idx"),
        expr("__p % __dpb").as("slot"))
  }
}
