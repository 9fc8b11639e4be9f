package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every SparkEntry query on
  * SPARK_GRAFT_SF_DIR and prints ONE JSON line.
  *
  * Methodology: one untimed warmup pass (JVM/JIT, codegen compilation,
  * parquet footer caches — none of which exist on a long-running
  * cluster), then `BENCH_RUNS` timed passes per query taking the best;
  * each pass materializes the full result via a count-style action on
  * the cached plan. Queries are timed end-to-end including planning.
  */
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val runs = sys.env.getOrElse("SPARK_GRAFT_BENCH_RUNS", "2").toInt
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    // SPARK_GRAFT_QUERIES=a,b,c limits the run (local iteration only;
    // the driver leaves it unset and benches everything).
    val only = sys.env.get("SPARK_GRAFT_QUERIES")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    val names = SparkEntry.queries.keys.toSeq.sorted
      .filter(n => only.forall(_.contains(n)))
    // Prime every base parquet source (footer reads + OS page cache)
    // before ANY timing: first-touch I/O otherwise lands on whichever
    // query alphabetically reads a table first, misranking it.
    Seq("region", "nation", "customer", "supplier", "part", "orders",
      "lineitem", "events", "documents", "embeddings").foreach { t =>
      val p = s"$sfDir/$t.parquet"
      if (new java.io.File(p).exists())
        try spark.read.parquet(p).count()
        catch { case _: Throwable => () } // events nanos handled by Tables
    }
    val failed = scala.collection.mutable.LinkedHashSet[String]()
    // Warmup: full pass over every query (also fails fast on breakage).
    names.foreach { n =>
      try SparkEntry.queries(n)(spark, sfDir).foreach(_ => ())
      catch { case e: Throwable =>
        failed += n
        System.err.println(s"[bench] warmup $n FAILED: ${e.getMessage}")
      }
    }
    // A failed query is reported as failed, never as a time-to-crash.
    val results = names.filterNot(failed).flatMap { n =>
      // Settle the JVM between queries: the previous query's shuffle
      // cleanup + GC otherwise bleeds into this one's wall time
      // (q_pivot_daily measured 6x its solo cost in a full-suite run).
      System.gc()
      val times = (1 to runs).flatMap { _ =>
        val t0 = System.nanoTime()
        try {
          SparkEntry.queries(n)(spark, sfDir).foreach(_ => ())
          Some((System.nanoTime() - t0) / 1e9)
        } catch { case e: Throwable =>
          failed += n
          System.err.println(s"[bench] $n FAILED: ${e.getMessage}")
          None
        }
      }
      // A query that failed ANY timed run is only ever reported as
      // failed — never under "queries" with a min over surviving runs.
      if (times.isEmpty || failed(n)) None else Some(n -> times.min)
    }
    // Solo re-timing for the 5 slowest: cross-round total comparisons
    // kept needing manual drift adjudication because suite times carry
    // neighbor bleed; a settled re-run (full GC + pause, best of
    // `runs`) in the SAME session is the comparable number. Emitted as
    // an EXTRA field — the driver's "queries" contract is unchanged.
    val top5 = results.sortBy(-_._2).take(5).flatMap { case (n, suiteS) =>
      System.gc()
      Thread.sleep(1000)
      try {
        val solo = (1 to runs).map { _ =>
          val t0 = System.nanoTime()
          SparkEntry.queries(n)(spark, sfDir).foreach(_ => ())
          (System.nanoTime() - t0) / 1e9
        }.min
        Some(n -> ((suiteS, solo)))
      } catch { case e: Throwable =>
        System.err.println(s"[bench] solo $n FAILED: ${e.getMessage}")
        None
      }
    }
    // Canon section: a PINNED ~20-query subset re-timed solo (full GC
    // + settle pause, best of `runs`, fixed order) — the cross-round
    // comparison surface. Full-suite totals drift up to ±50% with
    // machine load; these settled solo times in a fixed list are what
    // round N+1 compares against round N. Skipped when
    // SPARK_GRAFT_QUERIES filters the run (local iteration).
    val canonNames = Seq(
      "q_near_dup_prefix", "q_triangles", "q_profile", "q_link_predict",
      "q_graph_churn", "q_tfidf", "q_dedup_simhash", "q_dedup_minhash",
      "q_ann_topk", "q_ann_ivf", "q_span_dedup", "q_quality_filter",
      "q_agg_totals", "q_top_orders", "q_histogram_equidepth", "q_dsir",
      "q_source_overlap_exact", "q_pagerank", "q_bm25", "q_dimsum")
    val canon = if (only.isDefined) Nil else canonNames
      .filter(SparkEntry.queries.contains).filterNot(failed).flatMap { n =>
        System.gc()
        Thread.sleep(500)
        try {
          val solo = (1 to runs).map { _ =>
            val t0 = System.nanoTime()
            SparkEntry.queries(n)(spark, sfDir).foreach(_ => ())
            (System.nanoTime() - t0) / 1e9
          }.min
          Some(n -> solo)
        } catch { case e: Throwable =>
          System.err.println(s"[bench] canon $n FAILED: ${e.getMessage}")
          None
        }
      }
    // Flagship E2E: the pipeline CLI's per-stage wall times (quality /
    // span_dedup / mixture / export) at this SF — jsonl-sink format so
    // the transactional connector is on the measured path. Budget is
    // sized to the corpus (half the docs) so mixture+export do real
    // per-row work instead of a fixed 300-row cap.
    val pipeline = if (only.isDefined) Nil else {
      try {
        val outDir = java.nio.file.Files
          .createTempDirectory("graft-bench-pipe").toString + "/corpus"
        val nDocs = graft.Tables.documents(spark, sfDir).count()
        val r = graft.cli.Main.pipelineRun(spark, sfDir, outDir,
          nShards = 8, format = "jsonl-sink",
          budget = math.max(1L, nDocs / 2))
        if (r.badShards.nonEmpty)
          System.err.println(s"[bench] pipeline verify FAILED: ${r.badShards}")
        r.stageSecs
      } catch { case e: Throwable =>
        System.err.println(s"[bench] pipeline FAILED: ${e.getMessage}")
        Nil
      }
    }
    val qs = results.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val t5 = top5.map { case (k, (su, so)) =>
      "\"" + k + f"""\":{"suite_s":$su%.3f,"solo_s":$so%.3f}"""
    }.mkString("{", ",", "}")
    val cn = canon.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val pl = pipeline.map { case (k, v) => "\"" + k + f"\":$v%.3f" }
      .mkString("{", ",", "}")
    val fs = failed.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = results.map(_._2).sum
    val json =
      f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"top5":$t5,"canon":$cn,"pipeline":$pl,"failed":$fs,"sf":"$sfDir"}"""
    // Belt and braces: the JSON goes to stdout (sole machine-readable
    // line; build.sbt routes forked output straight through, no [info]
    // prefix) AND to bench.json in the repo root.
    try java.nio.file.Files.writeString(java.nio.file.Paths.get("bench.json"), json + "\n")
    catch { case e: Throwable => System.err.println(s"[bench] bench.json write failed: $e") }
    println(json)
    // The driver archives only a bounded stdout TAIL; the big line's
    // front-loaded totals truncate away once "queries" grows (r11's
    // BENCH artifact lost total_s). A second totals-only line at the
    // very end always survives the tail capture.
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","n_queries":${results.size},"n_failed":${failed.size},"sf":"$sfDir"}""")
    spark.stop()
    if (failed.nonEmpty)
      System.err.println(s"[bench] ${failed.size} queries FAILED: ${failed.mkString(", ")}")
  }
}
