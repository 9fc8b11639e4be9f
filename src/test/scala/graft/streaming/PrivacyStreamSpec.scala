package graft.streaming

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.ops.Privacy

/** Streaming twin of the eps-DP release (q_dp_release): a continuously
  * updated private dataset card. The batch mechanism composes onto a
  * stream UNCHANGED — count aggregate, scan-stage deterministic noise
  * on the tiny post-agg frame, noisy-threshold filter — and the
  * DETERMINISTIC noise is precisely what makes per-trigger re-release
  * privacy-sound: every microbatch re-publishes the SAME Laplace
  * sample for a statistic (one sample ever, however many triggers),
  * where fresh per-trigger noise would burn eps linearly in the
  * trigger count. */
class PrivacyStreamSpec extends SparkSpec {
  import spark.implicits._

  test("streaming noisy counts equal batch; the noise draw never changes across triggers") {
    val streamDir = java.nio.file.Files.createTempDirectory("graft-dpstream")
    val docs = (0 until 120).map { i =>
      (i.toLong, if (i % 3 == 0) "en" else if (i % 3 == 1) "de" else "fr")
    }.toDF("doc_id", "lang")
    // two arrival waves (uneven per-lang counts across waves)
    val scratch = java.nio.file.Files.createTempDirectory("graft-dpsrc")
    Seq(0, 1).foreach { half =>
      val out = scratch.resolve(s"p$half")
      docs.where(col("doc_id") < 40 === (half == 0)).coalesce(1)
        .write.parquet(out.toString)
      val part = java.nio.file.Files.list(out).iterator().asScala
        .find(_.getFileName.toString.endsWith(".parquet")).get
      java.nio.file.Files.copy(part, streamDir.resolve(s"f$half.parquet"))
    }
    val stream = spark.readStream
      .schema(docs.schema)
      .option("maxFilesPerTrigger", 1)
      .parquet(streamDir.toString)
    val released = Privacy.noisyCounts(stream, Seq("lang"), eps = 1.0,
      minRelease = 3L)
    val perTrigger =
      scala.collection.mutable.ArrayBuffer.empty[Map[String, Long]]
    val q = released.writeStream
      .outputMode("complete")
      .foreachBatch { (df: org.apache.spark.sql.DataFrame, _: Long) =>
        perTrigger += df.collect()
          .map(r => r.getString(0) -> r.getLong(1)).toMap
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination(120000)
    assert(perTrigger.size == 2, s"expected 2 triggers: $perTrigger")
    // final streaming release ≡ the batch mechanism on the same rows
    val batch = Privacy.noisyCounts(docs, Seq("lang"), eps = 1.0,
        minRelease = 3L)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(perTrigger.last == batch)
    // the privacy invariant: for every key released in BOTH triggers,
    // the implied noise (release − true count at that trigger) is the
    // SAME draw — re-release publishes no fresh randomness
    val countsAt = Seq(
      docs.where(col("doc_id") < 40), docs)
      .map(_.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap)
    val noiseAt = perTrigger.zip(countsAt).map { case (rel, cnt) =>
      rel.map { case (k, v) => k -> (v - cnt(k) * 1000000L) }
    }
    val common = noiseAt.head.keySet.intersect(noiseAt(1).keySet)
    assert(common.nonEmpty)
    common.foreach { k =>
      assert(noiseAt.head(k) == noiseAt(1)(k),
        s"noise for $k changed across triggers: " +
          s"${noiseAt.head(k)} vs ${noiseAt(1)(k)}")
    }
  }
}
