package graft

import org.apache.spark.sql.SparkSession

/** Benchmark driver: runs the headline queries on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line {"metric":...,"queries":{...}}.
  *
  * Methodology mirrors the reference's benchmark scripts (warmup + repeated
  * measurement, reference tools/scripts/benchmark.py:24-35), scaled down:
  * 1 warmup + 3 measured runs, median reported. Queries are materialized
  * through the noop datasource so the full plan executes (count() would let
  * Catalyst prune aggregates).
  */
object Bench {
  private val headline = Seq(
    "tpch_q1", "tpch_q3", "tpch_q5", "tpch_q6", "tpch_q9", "tpch_q10", "tpch_q21",
    "agg_rollup", "agg_groupjoin", "win_running_sum",
    "dedup_exact", "dedup_ngram_jaccard", "dedup_minhash_lsh", "dedup_embed_cos",
    "sim_cosine_topk", "text_quality", "ev_sessions")

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS",
      Runtime.getRuntime.availableProcessors.toString)
    // optional args: subset of headline query names (A/B iteration on one query)
    val selected = if (args.nonEmpty) headline.filter(args.contains) else headline
    val spark = Engine.create(master = s"local[$cpus]", shufflePartitions = cpus.toInt,
      appName = "graft-bench", dataDir = Some(sfDir))

    // Execute the query and consume every output row, timing construction +
    // planning + execution. This replaces the earlier noop-write sink: a
    // `df.write` wraps the ANALYZED plan in a fresh write command and re-runs
    // the whole analyze/optimize/plan pipeline a second time (~40 ms/query
    // measured, tools.BuildProbe) while adding nothing to the work the query
    // itself does — toRdd on a fresh Dataset executes the identical physical
    // plan (AQE included) and the while-loop drains every partition iterator,
    // so the full result set is still produced, matching the reference
    // benchmark protocol (run query, discard rows).
    def once(name: String): Double = {
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .queryExecution.toRdd.foreachPartition { it =>
          while (it.hasNext) it.next()
        }
      (System.nanoTime() - t0) / 1e9
    }

    val results: Seq[(String, Double)] = selected.filter(SparkEntry.queries.contains).map { name =>
      val t = try {
        val warm = once(name) // warmup: JIT + codegen + file-footer caches
        System.gc()
        // Run count adapts to query cost: 5 measured runs + median for
        // sub-minute queries (per-query variance at small SFs is up to ±3x
        // on shared hardware, PERF_r04.md §1 — 5 runs bound the damage),
        // but a minutes-long query has proportionally low scheduling noise
        // and 6 × 10 min of honest-sf100 ngram would dominate the whole
        // campaign — 2 runs (report the faster, like the reference's
        // benchmark.py min-of-runs) past a 60 s warmup.
        // GC after EVERY run (concurrent, after the clock stops): one sf100
        // run of a shingle-heavy query spills >10 GB, and six runs' retained
        // shuffle files exhausted the disk mid-query before the per-query
        // cleanup below ever ran
        val n = if (warm >= 60.0) 2 else 5
        val runs = Seq.fill(n) { val r = once(name); System.gc(); r }
        System.err.println(s"[bench] $name runs: " +
          runs.map(r => f"$r%.2f").mkString(" "))
        if (n == 2) runs.min else runs.sorted.apply(2) // median (min for long)
      } catch { case e: Throwable =>
        System.err.println(s"[bench] $name failed: ${e.getMessage}")
        -1.0
      }
      // release the finished query's shuffle files before the next one runs:
      // the ContextCleaner only deletes them after the driver GCs the query's
      // ShuffleDependency objects, and a large driver heap may otherwise not
      // GC across the whole bench (measured: 17 queries × 6 runs of retained
      // sf100 spill filled the disk)
      System.gc()
      name -> t
    }

    def f(v: Double): String = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val qs = results.map { case (k, v) => s""""$k":${f(v)}""" }
      .mkString("{", ",", "}")
    val total = results.map(_._2).filter(_ >= 0).sum
    val failed = results.collect { case (k, v) if v < 0 => s""""$k"""" }
      .mkString("[", ",", "]")
    println(s"""{"metric":"total","value":${f(total)},"unit":"sec","queries":$qs,"failed":$failed,"sf":"$sfDir"}""")
    spark.stop()
    // A query that errors means the bench total is not comparable across
    // rounds — fail the run loudly rather than reporting a partial total.
    if (results.exists(_._2 < 0)) sys.exit(1)
  }
}
