package graft

/** Plan-shape guards for the 100 TB story: filters reach the parquet scan,
  * dimension joins broadcast (the fact table must never shuffle in the
  * broadcast-joinable headline queries), and hot paths stay in whole-stage
  * codegen. A regression here is a performance bug even when results stay
  * correct. */
class PlanSpec extends SparkSpec {

  private def planOf(name: String): String = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.queryExecution.executedPlan.toString
  }

  test("tpch_q1: shipdate filter pushed to the parquet scan, pruned schema") {
    val p = planOf("tpch_q1")
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate), LessThanOrEqual(l_shipdate"), p)
    assert(!p.contains("l_orderkey"), "q1 must not read unused columns")
  }

  test("tpch_q5: dimensions broadcast; fact merge keyed on the order key ALONE") {
    val p = planOf("tpch_q5")
    assert(p.contains("BroadcastHashJoin"), p)
    // the locality condition must stay a residual: if ExtractEquiJoinKeys
    // folds s_nationkey = c_nationkey into the join keys, BOTH fact sides
    // re-shuffle on the composite key and the bucketed layout is forfeited
    // (measured at sf100: erases the ASIA-supplier pre-filter win entirely)
    val smjKeys = """SortMergeJoin \[([^\]]*)\]""".r.findAllMatchIn(p).map(_.group(1)).toSeq
    assert(smjKeys.forall(k => !k.contains("nationkey")),
      s"fact join keys must not include the nationkey residual: $smjKeys")
  }

  test("tpch_q3: top-k via bounded heap (TakeOrderedAndProject)") {
    val p = planOf("tpch_q3")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("rel_topk: TakeOrderedAndProject, no global sort") {
    val p = planOf("rel_topk")
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("tpch_q1: aggregation is two-phase (partial then final)") {
    val p = planOf("tpch_q1")
    assert(p.contains("partial_sum") || p.contains("HashAggregate"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, "expected partial+final agg")
  }

  test("dedup_minhash_lsh: jaccard verification is candidate-bounded") {
    val p = planOf("dedup_minhash_lsh")
    // the intersection count must join through the candidate set (keys b,g) —
    // an inner join on [g] alone means the full shared-shingle pair
    // enumeration is back (the thing LSH exists to avoid)
    val pairJoinOnGAlone = """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[g#\d+L?\], \[g#\d+L?\], Inner""".r
    assert(pairJoinOnGAlone.findFirstIn(p).isEmpty,
      "full shared-shingle pair join found in LSH verification path")
    val candBoundedJoin = """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[b#\d+L?, g#\d+L?\]""".r
    assert(candBoundedJoin.findFirstIn(p).isDefined,
      s"candidate-bounded (b,g) intersection join missing: $p")
  }

  test("join_range: binned interval join is an equi-join, never a nested loop") {
    val p = planOf("join_range")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      s"interval join must equi-join on the date bin: $p")
    assert(p.contains("Join") || p.contains("HashJoin") || p.contains("SortMergeJoin"), p)
  }

  test("text_decontam_bloom: bloom pre-filter guards the exact verify join") {
    val p = planOf("text_decontam_bloom")
    assert(p.contains("might_contain") || p.contains("BloomFilterMightContain") ||
      p.contains("bloom_filter"), s"bloom pre-filter missing from plan: $p")
  }

  test("dedup_embed_cos: no all-pairs cross join") {
    val p = planOf("dedup_embed_cos")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "embedding dedup must be candidate-bounded, not all-pairs")
  }

  test("dedup_cluster: label propagation stays equi-join, no all-pairs") {
    val p = planOf("dedup_cluster")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "component labeling must join edges to labels by key, not cross-multiply")
  }

  test("text_repetition: token counting is two-phase (map-side partial agg)") {
    val p = planOf("text_repetition")
    assert("partial_count|partial|HashAggregate".r.findFirstIn(p).isDefined, p)
    assert("HashAggregate".r.findAllIn(p).length >= 4,
      "expected partial+final agg on both the (doc, token) and doc rollup levels")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("tpch_q8: fact joins broadcast the dimension sides") {
    val p = planOf("tpch_q8")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("tpch_q21: groupjoin formulation — EXISTS pair folds to one per-order aggregate") {
    val p = planOf("tpch_q21")
    // no self-join semi/anti (those shapes keep witnesses in tpch_q4/q20 and
    // join_semi/join_anti) and no correlated re-execution
    assert(!p.contains("LeftSemi") && !p.contains("LeftAnti"), p)
    // two-phase distinct: no Expand (a countDistinct pair would double every
    // lineitem row pre-aggregation) — the distinct reduction happens in the
    // (l_orderkey, l_suppkey) HashAggregate's map side
    assert(!p.contains("Expand"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("Decorrelate: SUM identities stay exact past 2^53 for integral inputs") {
    import spark.implicits._
    val big = 9007199254740993L // 2^53 + 1, not representable in double
    Seq(10L, 20L, 30L).toDF("v").createOrReplaceTempView("dc_big")
    Seq(big, big + 2).toDF("c").createOrReplaceTempView("dc_t")
    // SUM over a pure-outer argument: Catalyst alone mis-attributes it to
    // the outer scope; DecorrelateComplexAggs rewrites it to o*COUNT(1)
    // per the corpus's inner-scope semantics. The former DoubleType routing
    // rounded 2^53+1 to 2^53 before multiplying.
    val rows = spark.sql(
      "SELECT c, (SELECT SUM(dc_t.c) FROM dc_big) AS s FROM dc_t GROUP BY c ORDER BY c").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((big, 3 * big), (big + 2, 3 * (big + 2))),
      "expected exact long arithmetic, not double-rounded")
  }

  test("CBO: column stats flip a JOB-style multi-join order (ANALYZE TABLE)") {
    // the reference reorders joins from sampled statistics (DPhyp,
    // OptimizeJoinOrder.cpp:13-140); the Spark-native equivalent is
    // ANALYZE TABLE ... COMPUTE STATISTICS FOR ALL COLUMNS + cbo.joinReorder.
    // Catalyst's reorder only fires on catalog tables with stats, so this is
    // the engine capability test: same 5-table star query, stats on vs off,
    // different join order.
    val db = "cbo_flip_db"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:") + s"/$db.db"))
    spark.sql(s"CREATE DATABASE IF NOT EXISTS $db")
    import spark.implicits._
    def save(name: String, n: Int, payload: Int): Unit =
      (0 until n).map(i => (i.toLong, (i % payload).toLong))
        .toDF(s"${name}_k", s"${name}_v")
        .write.mode("overwrite").saveAsTable(s"$db.$name")
    save("fact", 40000, 1000)
    save("dim_big", 8000, 100)
    save("dim_mid", 800, 50)
    save("dim_small", 40, 10)
    save("dim_tiny", 4, 2)
    // join written worst-first: tiny last, so the written order is the
    // no-stats order and a stats-driven planner must move it forward
    val q =
      s"""SELECT count(*) AS n FROM $db.fact f
         |JOIN $db.dim_big b ON f.fact_v = b.dim_big_k
         |JOIN $db.dim_mid m ON b.dim_big_v = m.dim_mid_k
         |JOIN $db.dim_small s ON m.dim_mid_v = s.dim_small_k
         |JOIN $db.dim_tiny t ON s.dim_small_v = t.dim_tiny_k""".stripMargin
    def joinOrder(): Seq[String] = {
      val plan = spark.sql(q).queryExecution.optimizedPlan.toString
      s"$db\\.(\\w+)".r.findAllMatchIn(plan).map(_.group(1)).toSeq
    }
    val before = joinOrder()
    Seq("fact", "dim_big", "dim_mid", "dim_small", "dim_tiny").foreach { t =>
      spark.sql(s"ANALYZE TABLE $db.$t COMPUTE STATISTICS FOR ALL COLUMNS")
    }
    val after = joinOrder()
    assert(before != after,
      s"stats should change the join order; both were $before")
  }

  test("JOB q1a: star joins broadcast the dimensions, no cartesian product") {
    val df = SparkEntry.queries("job_q1a")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), "JOB joins must stay keyed")
  }

  test("ClickBench q21: URL LIKE filter reaches the parquet scan") {
    val df = SparkEntry.queries("cb_q21")(spark, sf)
    val p = df.queryExecution.executedPlan.toString
    // contains-LIKE pushes as a StringContains parquet filter; the scan must
    // also prune to the one column the query touches
    assert(p.contains("PushedFilters: [IsNotNull(URL), StringContains(URL,google)"), p)
    assert(p.contains("ReadSchema: struct<URL:string>"), "scan must prune to URL")
  }

  test("bucketing: co-located join runs with zero shuffle exchanges") {
    // SURVEY §2.5: the reference's hash indexes map to broadcast joins for
    // small sides and BUCKETING for fact-fact joins — both sides bucketed
    // and sorted on the join key join with no Exchange at all, the plan
    // shape that keeps a 100 TB fact-fact join shuffle-free.
    val db = "bucket_db"
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    org.apache.commons.io.FileUtils.deleteQuietly(
      new java.io.File(spark.conf.get("spark.sql.warehouse.dir")
        .stripPrefix("file:") + s"/$db.db"))
    spark.sql(s"CREATE DATABASE $db")
    import spark.implicits._
    def save(name: String): Unit =
      (0 until 50000).map(i => (i.toLong, i.toLong % 97)).toDF("k", "v")
        .write.bucketBy(8, "k").sortBy("k").mode("overwrite")
        .saveAsTable(s"$db.$name")
    save("fact_a"); save("fact_b")
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table(s"$db.fact_a")
        .join(spark.table(s"$db.fact_b"), "k")
      joined.collect()
      val p = joined.queryExecution.executedPlan.toString
      assert(p.contains("SortMergeJoin"), p)
      assert(!p.contains("Exchange"), "bucketed join must not shuffle:\n" + p)
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("sample selectivity: complex-predicate join order flips with the rule ON, not OFF") {
    // The reference evaluates predicates on stored samples before join
    // ordering (QueryGraph.cpp:264-294); Catalyst's CBO histogram path
    // (previous test) cannot see through a correlated two-column predicate.
    // plans.SampleJoinReorder evaluates the pushed-down filter on the
    // ScaleUp-persisted sample and moves the filtered table first.
    import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}
    val dir = "/tmp/graft_test_samples"
    import spark.implicits._
    def save(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
      df.limit(2000).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/_samples/$name.parquet")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_samples/$name.count"),
        df.count().toString.getBytes("UTF-8"))
    }
    save("s_fact", (0 until 40000)
      .map(i => (i.toLong, (i % 1000).toLong)).toDF("fact_k", "fact_v"))
    save("s_dim_big", (0 until 8000)
      .map(i => (i.toLong, (i % 100).toLong, (i % 317).toLong, (i % 4).toLong))
      .toDF("dim_big_k", "dim_big_v", "dim_big_w", "dim_big_u"))
    save("s_dim_mid", (0 until 800)
      .map(i => (i.toLong, (i % 50).toLong)).toDF("dim_mid_k", "dim_mid_v"))
    def q(): org.apache.spark.sql.DataFrame = {
      import org.apache.spark.sql.functions.col
      val fact = spark.read.parquet(s"$dir/s_fact.parquet")
      // correlated complex predicate on NON-join columns (a join-column
      // filter would be constraint-propagated to the other side and change
      // the comparison): w=i%317, u=i%4 — the conjunction keeps ~0.1%,
      // which no histogram-free planner can see but a sample measures
      val big = spark.read.parquet(s"$dir/s_dim_big.parquet")
        .filter(col("dim_big_w") === 0 && col("dim_big_u") === 1)
      val mid = spark.read.parquet(s"$dir/s_dim_mid.parquet")
      fact.join(big, col("fact_v") === col("dim_big_k"))
        .join(mid, col("dim_big_v") === col("dim_mid_k"))
    }
    def leafOrder(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.queryExecution.optimizedPlan.collect {
        case l: LogicalRelation => l.relation match {
          case fs: HadoopFsRelation => fs.location.rootPaths.head.getName
        }
      }
    spark.conf.set("spark.graft.sampleReorder.enabled", "false") // session default is ON (no-dataDir)
    val off = leafOrder(q())
    val offRows = q().collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.sampleReorder.enabled", "true")
    try {
      val on = leafOrder(q())
      val onRows = q().collect().map(_.toString).sorted.toSeq
      assert(off != on, s"sampled selectivity should flip the join order; both were $off")
      assert(on.head == "s_dim_big.parquet",
        s"the sampled ~1% filtered table must lead the join order, got $on")
      assert(onRows == offRows, "reordering must not change results")
    } finally spark.conf.unset("spark.graft.sampleReorder.enabled")
  }

  test("sample reorder: exact DP beats greedy where smallest-leaf-first is a trap") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_dp_").toString
    new java.io.File(s"$dir/_samples").mkdirs()
    def save(name: String, df: org.apache.spark.sql.DataFrame,
        sample: Option[org.apache.spark.sql.DataFrame] = None): Unit = {
      df.coalesce(1).write.parquet(s"$dir/$name.parquet")
      sample.getOrElse(df).coalesce(1).write.parquet(s"$dir/_samples/$name.parquet")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_samples/$name.count"),
        df.count().toString.getBytes("UTF-8"))
    }
    // The trap: A is the smallest LEAF (greedy leads with it), but A⋈B is
    // 200× bigger than B⋈C — the System-R/ndv model sees it, greedy's
    // smallest-connected-leaf walk cannot (it never prices the join).
    save("dp_a", (0 until 200).map(i => i.toLong).toDF("a_k"))
    val bFull = (0 until 40000)
      .map(i => ((i % 200).toLong, i.toLong)).toDF("b_k", "b_c")
    save("dp_b", bFull, Some(bFull.limit(2000)))
    save("dp_c", (0 until 5000).map(i => i.toLong * 1000).toDF("c_k"))
    def q(): org.apache.spark.sql.DataFrame = {
      val a = spark.read.parquet(s"$dir/dp_a.parquet")
      val b = spark.read.parquet(s"$dir/dp_b.parquet")
      val c = spark.read.parquet(s"$dir/dp_c.parquet")
      a.join(b, col("a_k") === col("b_k")).join(c, col("b_c") === col("c_k"))
    }
    // measured cardinalities: the DP's preferred bottom join really is
    // the far smaller intermediate (40 rows vs 40000)
    val ab = spark.read.parquet(s"$dir/dp_a.parquet")
      .join(spark.read.parquet(s"$dir/dp_b.parquet"), col("a_k") === col("b_k")).count()
    val bc = spark.read.parquet(s"$dir/dp_b.parquet")
      .join(spark.read.parquet(s"$dir/dp_c.parquet"), col("b_c") === col("c_k")).count()
    assert(bc < ab / 100, s"fixture broken: |B⋈C|=$bc not far below |A⋈B|=$ab")
    def bottomJoinTables(df: org.apache.spark.sql.DataFrame): Set[String] = {
      val joins = df.queryExecution.optimizedPlan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join => j
      }
      joins.lastOption.map(_.collectLeaves().collect {
        case l: org.apache.spark.sql.execution.datasources.LogicalRelation =>
          l.relation match {
            case fs: org.apache.spark.sql.execution.datasources.HadoopFsRelation =>
              fs.location.rootPaths.head.getName
          }
      }.toSet).getOrElse(Set.empty)
    }
    spark.conf.set("spark.graft.sampleReorder.enabled", "false") // session default is ON (no-dataDir)
    val offRows = q().collect().map(_.toString).sorted.toSeq
    spark.conf.set("spark.graft.sampleReorder.enabled", "true")
    try {
      val bottom = bottomJoinTables(q())
      assert(bottom == Set("dp_b.parquet", "dp_c.parquet"),
        s"exact DP should join B⋈C first (greedy leads with smallest leaf A); got $bottom")
      val onRows = q().collect().map(_.toString).sorted.toSeq
      assert(onRows == offRows, "DP reordering must not change results")
    } finally spark.conf.unset("spark.graft.sampleReorder.enabled")
  }

  test("sample broadcast hints: a string-filtered side invisible to stats broadcasts with the rule ON") {
    // Catalyst's size-only estimation keeps a Contains-filtered relation at
    // its full file size, so a side that is tiny AFTER the filter gets a
    // corpus-scale shuffle join (the JOB ×50 pathology: 2.5M-row title
    // exchanged against an 87k-row filtered movie_companies). The sampled
    // estimate sees ~1% survive and attaches a broadcast hint (guide §3.1),
    // so the big side is never exchanged. AQE would convert the join at
    // runtime too — but only AFTER the big side's shuffle map stage ran,
    // which is exactly what the hint avoids; hence the assertion is on the
    // presence of the shuffle, not the join operator.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val dir = java.nio.file.Files.createTempDirectory("graft_bh_").toString
    new java.io.File(s"$dir/_samples").mkdirs()
    def save(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.write.mode("overwrite").parquet(s"$dir/$name.parquet")
      df.limit(2000).coalesce(1).write.mode("overwrite")
        .parquet(s"$dir/_samples/$name.parquet")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_samples/$name.count"),
        df.count().toString.getBytes("UTF-8"))
    }
    // big enough that its own estimate clears the 10 MB broadcast threshold
    save("bh_big", (0 until 3000000).map(i => (i.toLong % 20000, i * 2654435761L)).toDF("b_k", "b_v"))
    // incompressible per-row note text keeps the parquet file (and thus the
    // stats estimate) above the 10 MB broadcast threshold; ~1% contain "xyz"
    save("bh_dim", (0 until 500000).map { i =>
      val pad = f"${i * 2654435761L}%016x" * 3
      (i.toLong % 20000, if (i % 100 == 0) s"n xyz $pad" else s"n $pad")
    }.toDF("d_k", "d_note"))
    def q(): org.apache.spark.sql.DataFrame = {
      val big = spark.read.parquet(s"$dir/bh_big.parquet")
      val dim = spark.read.parquet(s"$dir/bh_dim.parquet")
        .filter(col("d_note").contains("xyz"))
      big.join(dim, col("b_k") === col("d_k"))
    }
    spark.conf.set("spark.graft.sampleReorder.enabled", "false")
    val offDf = q()
    val offRows = offDf.collect().map(_.toString).sorted.toSeq
    val offPlan = offDf.queryExecution.executedPlan.toString
    spark.conf.set("spark.graft.sampleReorder.enabled", "true")
    try {
      val onDf = q()
      val onRows = onDf.collect().map(_.toString).sorted.toSeq
      val onPlan = onDf.queryExecution.executedPlan.toString
      assert(offPlan.contains("Exchange hashpartitioning"),
        "fixture broken: the rule-OFF plan should shuffle (estimate over threshold):\n" + offPlan)
      assert(onPlan.contains("BroadcastHashJoin"), onPlan)
      assert(!onPlan.contains("Exchange hashpartitioning"),
        "rule-ON plan must not shuffle the big side:\n" + onPlan)
      assert(onRows == offRows, "broadcast hint must not change results")
    } finally spark.conf.set("spark.graft.sampleReorder.enabled", "true")
  }

  test("sample broadcast hints: composite-side hint is gated by probe size (serialized-stage pricing)") {
    // Broadcasting a COMPOSITE subtree (one that contains joins) nests its
    // build inside the BroadcastQueryStage, so a chain of such hints
    // materializes its AQE stages strictly sequentially (~40 ms driver gap
    // each, StageProbe on JOB q11b). The rule therefore only hints a
    // composite side when the probe side's estimated rows exceed
    // spark.graft.sampleReorder.stagePenaltyRows — below that the saved
    // exchange is cheaper than the serialization it buys.
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    import org.apache.spark.sql.catalyst.plans.logical.{BROADCAST, Join}
    val dir = java.nio.file.Files.createTempDirectory("graft_sp_").toString
    new java.io.File(s"$dir/_samples").mkdirs()
    def save(name: String, df: org.apache.spark.sql.DataFrame): Unit = {
      df.coalesce(1).write.parquet(s"$dir/$name.parquet")
      df.limit(2000).coalesce(1).write.parquet(s"$dir/_samples/$name.parquet")
      java.nio.file.Files.write(
        java.nio.file.Paths.get(s"$dir/_samples/$name.count"),
        df.count().toString.getBytes("UTF-8"))
    }
    save("sp_s1", (0 until 300).map(i => (i.toLong, (i % 300).toLong)).toDF("s1_k", "s1_j"))
    save("sp_s2", (0 until 300).map(i => ((i % 300).toLong, i.toLong)).toDF("s2_j", "s2_v"))
    save("sp_probe", (0 until 20000).map(i => ((i % 300).toLong, i.toLong)).toDF("p_k", "p_v"))
    def q(): org.apache.spark.sql.DataFrame = {
      val s1 = spark.read.parquet(s"$dir/sp_s1.parquet")
      val s2 = spark.read.parquet(s"$dir/sp_s2.parquet")
      val probe = spark.read.parquet(s"$dir/sp_probe.parquet")
      probe.join(s1, col("p_k") === col("s1_k")).join(s2, col("s1_j") === col("s2_j"))
    }
    def topHint(df: org.apache.spark.sql.DataFrame) =
      df.queryExecution.optimizedPlan.collect { case j: Join => j }.head.hint
    def hasBroadcastSide(h: org.apache.spark.sql.catalyst.plans.logical.JoinHint) =
      Seq(h.leftHint, h.rightHint).flatten.exists(_.strategy.contains(BROADCAST))
    val prevThr = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    // threshold sized so ONLY the tiny composite (s1⋈s2, est ~300 rows ×
    // 40 B = 12 kB) fits — the 20k-row probe (480 kB) must not, or the
    // leaf-preference path would broadcast the probe and bypass the gate
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "50000")
    spark.conf.set("spark.graft.sampleReorder.enabled", "true")
    try {
      // probe est rows (20000) <= default penalty (4e5): hint suppressed
      val gated = topHint(q())
      assert(!hasBroadcastSide(gated),
        s"composite-side hint must be gated when the probe is small: $gated")
      // penalty lowered below the probe rows: the composite side is hinted
      spark.conf.set("spark.graft.sampleReorder.stagePenaltyRows", "1000")
      val hinted = topHint(q())
      assert(hasBroadcastSide(hinted),
        s"composite-side hint must fire when the probe exchange outweighs the penalty: $hinted")
      // the hint decision must not change results
      spark.conf.unset("spark.graft.sampleReorder.stagePenaltyRows")
      val onRows = q().collect().map(_.toString).sorted.toSeq
      spark.conf.set("spark.graft.sampleReorder.enabled", "false")
      val offRows = q().collect().map(_.toString).sorted.toSeq
      assert(onRows == offRows, "gated hints must not change results")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThr)
      spark.conf.unset("spark.graft.sampleReorder.stagePenaltyRows")
      spark.conf.set("spark.graft.sampleReorder.enabled", "true")
    }
  }

  test("bucketed layout: q21's fact pipeline is exchange-free; results match plain layout") {
    // Tables.load prefers a `_bucketed/<table>` layout (written by ScaleUp)
    // and registers it as a bucketed catalog table — the Spark analog of the
    // reference's persistent hash index (LingoDBHashIndex.cpp; SURVEY §2.5).
    // On that layout tpch_q21's li⋈orders join, its per-order aggregate, and
    // the ⋈ordStats join are all co-partitioned by the bucket key: the ONLY
    // exchange left is the final dimension-sized s_name aggregation.
    val dir = "/tmp/graft_test_bucketed"
    val marker = new java.io.File(s"$dir/_bucketed/orders/_bucketspec")
    if (!marker.isFile) {
      Tables.all.foreach { n =>
        spark.read.parquet(s"$sf/$n.parquet")
          .write.mode("overwrite").parquet(s"$dir/$n.parquet")
      }
      Seq(("lineitem", "l_orderkey"), ("orders", "o_orderkey")).foreach { case (n, k) =>
        val tmp = s"plan_spec_bkt_$n"
        spark.sql(s"DROP TABLE IF EXISTS $tmp")
        spark.read.parquet(s"$dir/$n.parquet")
          .repartition(4, org.apache.spark.sql.functions.col(k))
          .write.bucketBy(4, k).sortBy(k)
          .option("path", s"$dir/_bucketed/$n").mode("overwrite").saveAsTable(tmp)
        spark.sql(s"DROP TABLE IF EXISTS $tmp")
        java.nio.file.Files.write(
          java.nio.file.Paths.get(s"$dir/_bucketed/$n/_bucketspec"),
          s"$k 4".getBytes("UTF-8"))
      }
    }
    val bucketed = SparkEntry.queries("tpch_q21")(spark, dir)
    val got = bucketed.collect()
    val p = bucketed.queryExecution.executedPlan.toString.split("== Initial Plan ==").head
    val exchanges = """Exchange hashpartitioning\(([a-z_#0-9]+)""".r
      .findAllMatchIn(p).map(_.group(1)).toSeq
    assert(exchanges.forall(_.startsWith("s_name")),
      s"only the final s_name agg may exchange, found: $exchanges\n$p")
    val want = SparkEntry.queries("tpch_q21")(spark, sf).collect()
    assert(got.map(_.toString).toSeq == want.map(_.toString).toSeq,
      "bucketed layout must not change results")
  }

  test("ev_sessions: one user_id exchange feeds lag, running sum, AND the final agg") {
    val df = SparkEntry.queries("ev_sessions")(spark, sf)
    df.collect() // reuse and stage shapes are only visible in the executed plan
    val p = df.queryExecution.executedPlan.toString
    val finalPlan = p.split("== Initial Plan ==").head
    // both window functions and the session aggregation are keyed by user_id:
    // the plan must shuffle on user_id exactly once (lag and the running sum
    // chain inside one Window sort; the groupBy reuses the same partitioning)
    val userIdExchanges = """Exchange hashpartitioning\(user_id""".r
      .findAllIn(finalPlan).length
    assert(userIdExchanges == 1,
      s"expected exactly one user_id exchange, found $userIdExchanges:\n$finalPlan")
  }

  test("ev_asof: merge-based as-of join — no join operator, no pair explosion") {
    val df = SparkEntry.queries("ev_asof")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalPlan = p.split("== Initial Plan ==").head
    // the as-of lookup must be the union + running-window merge, not a range
    // join: any Join/CartesianProduct here means an O(clicks × purchases)
    // per-user blowup that cannot scale
    assert(!finalPlan.contains("Join"), s"as-of must not plan a join:\n$finalPlan")
    assert(!finalPlan.contains("CartesianProduct"), finalPlan)
    assert(finalPlan.contains("Window"), s"expected the running-window merge:\n$finalPlan")
  }

  test("dedup_minhash_lsh: verification path reuses the shingle exchange + broadcasts") {
    val df = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
    df.collect()
    val p = df.queryExecution.executedPlan.toString
    val finalPlan = p.split("== Initial Plan ==").head
    // the gb side and the sizes aggregate must read ga's distinct-shingle
    // shuffle, not re-scan the corpus — the shape that keeps verification at
    // one extra corpus pass total (PERF_r04.md §2)
    assert(finalPlan.contains("ReusedExchange"),
      "verification path must reuse the distinct-shingle exchange:\n" + finalPlan)
  }

  test("text_token_ids: vocab lookup broadcasts — the corpus never shuffles for it") {
    val p = planOf("text_token_ids")
    // the tok⋈vocab join must be a BroadcastHashJoin (bounded top-V side);
    // a SortMergeJoin there would shuffle the full exploded token stream
    // for a lookup against a few-KB table
    assert(p.contains("BroadcastHashJoin"), s"vocab join must broadcast: $p")
  }

  test("text_seg_dedup: frequency lookup has no hard-coded broadcast (size-driven only)") {
    // the segment-frequency table is unbounded (worst case one row per
    // distinct segment), so the CODE must never force a broadcast — at this
    // tiny SF Catalyst rightly auto-broadcasts on size stats, so the guard
    // disables the size-driven path and asserts the join degrades to a
    // shuffle join (it would stay a broadcast if the operator carried a
    // broadcast() hint)
    val key = "spark.sql.autoBroadcastJoinThreshold"
    val saved = spark.conf.get(key)
    try {
      spark.conf.set(key, "-1")
      val p = planOf("text_seg_dedup")
      val segJoinBroadcast = """BroadcastHashJoin \[seg#\d+\]""".r
      assert(segJoinBroadcast.findFirstIn(p).isEmpty,
        s"segment-frequency join carries a forced broadcast: $p")
      assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin"), p)
    } finally spark.conf.set(key, saved)
  }

  test("ev_resample: raw event stream shuffles once; the dense grid joins on (type, hour)") {
    val p = planOf("ev_resample")
    // both the hourly rollup and the grid aggregate partial-agg map-side;
    // no CartesianProduct anywhere (grid × counts must be a keyed join)
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"), p)
    assert("HashAggregate".r.findAllIn(p).length >= 2, "expected partial+final agg")
  }

  test("agg_corr_regr: moment sums are two-phase long/decimal aggregation") {
    val p = planOf("agg_corr_regr")
    assert("HashAggregate".r.findAllIn(p).length >= 2, "expected partial+final agg")
    assert(!p.contains("corr("), "must decompose, not call native corr")
  }

  test("custom expressions stay codegen-compatible (no fallback markers)") {
    val df = SparkEntry.queries("fn_erf")(spark, sf)
    df.collect() // AQE finalizes (and codegen-compiles) only on execution
    val p = df.queryExecution.executedPlan.toString
    // "*(n)" prefixes mark WholeStageCodegen stages in the compact plan form;
    // the erf Project must carry one (a codegen fallback would drop it)
    assert(p.contains("*(1) Project") || p.contains("*(2) Project") ||
      p.contains("WholeStageCodegen"), p)
  }

  test("codegen-fallback expressions across the WHOLE contract are pinned") {
    // The round-7 test log carries exactly one runtime codegen-fallback
    // warning — the deliberately-interpreted Python UDF. Pin the full
    // fallback surface: walk every contract query's optimized plan
    // (subqueries included) and collect every CodegenFallback expression.
    // Two locks:
    //  1. no graft-authored expression may be CodegenFallback except
    //     PyUdfExpression (an external-language UDF is opaque to codegen
    //     in the reference too, SURVEY §2.7) — a new custom expression
    //     that silently drops out of whole-stage codegen turns red;
    //  2. the set of SPARK-BUILTIN fallback classes is snapshot-locked —
    //     these are Spark's own by-design interpreted surfaces
    //     (higher-order functions, typed imperative aggregates), and a
    //     rewrite that starts emitting a NEW one is a hot-path slowdown
    //     that must be a conscious choice, not an accident.
    import org.apache.spark.sql.catalyst.expressions.Expression
    import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
    import org.apache.spark.sql.catalyst.expressions.SubqueryExpression
    import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

    def fallbacks(plan: LogicalPlan): Seq[Expression] =
      plan.flatMap { node =>
        node.expressions.flatMap(_.collect {
          case s: SubqueryExpression => fallbacks(s.plan)
          case f: Expression with CodegenFallback => Seq(f)
        }.flatten)
      }

    // Spark-builtin by-design fallbacks present in the round-8 contract:
    // HOFs interpret their lambda per element; Collect*/HLL++/percentile/
    // pivot are TypedImperativeAggregate (run inside ObjectHashAggregate,
    // outside codegen by construction); ReplicateRows backs INTERSECT/
    // EXCEPT ALL; ScalaAggregator is the typed UDAF bridge.
    val allowedBuiltins = Set(
      "ArrayAggregate", "ArrayFilter", "ArraySort", "ArrayTransform",
      "ZipWith", "LambdaFunction", "NamedLambdaVariable",
      "CollectList", "CollectSet", "HyperLogLogPlusPlus",
      "ApproximatePercentile", "PivotFirst", "ReplicateRows",
      "ScalaAggregator")
    // PyUdfExpression / CUdfExpression: external-language UDF bodies are
    // interpreted per row BY DESIGN (UdfSurface scaladoc — the reference
    // embeds CPython / dlopens compiled C; generating Java from either
    // language would be a compiler project, and expression-shaped C/SQL
    // bodies take the codegen'd Catalyst-macro path instead)
    val allowedGraft = Set("PyUdfExpression", "CUdfExpression")

    val offenders = scala.collection.mutable.SortedMap.empty[String, Set[String]]
    SparkEntry.queries.foreach { case (name, fn) =>
      fallbacks(fn(spark, sf).queryExecution.optimizedPlan).foreach { e =>
        val cls = e.getClass.getSimpleName
        val graftAuthored = e.getClass.getName.startsWith("graft.")
        val ok = if (graftAuthored) allowedGraft(cls) else allowedBuiltins(cls)
        if (!ok) offenders(cls) = offenders.getOrElse(cls, Set()) + name
      }
    }
    assert(offenders.isEmpty,
      s"unpinned CodegenFallback expressions (new fallback = conscious choice " +
        s"required; extend the allowed set WITH justification): $offenders")
  }

  test("Prepared plan cache: cloned executions reproduce fresh results, every run recomputes") {
    // shape-diverse slice of the headline set: scan+agg, multi-join,
    // rollup/Expand, window, session window
    for (name <- Seq("tpch_q1", "tpch_q5", "agg_rollup", "win_running_sum", "ev_sessions")) {
      val q = SparkEntry.queries(name)
      val freshRows = q(spark, sf).count()
      val counts = Seq.fill(3) { // run 1 primes the cache; 2-3 are clone hits
        Prepared.freshRdd(q(spark, sf))
          .mapPartitions(it => Iterator.single(it.size.toLong)).collect().sum
      }
      assert(counts.forall(_ == freshRows),
        s"$name: prepared runs $counts != fresh $freshRows")
    }
    // a plan with ReusedExchangeExec cross-references must FALL BACK (a
    // cloned tree would silently reuse the previous run's shuffle output)
    val heavy = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
    val n1 = Prepared.freshRdd(heavy)
      .mapPartitions(it => Iterator.single(it.size.toLong)).collect().sum
    assert(n1 == SparkEntry.queries("dedup_minhash_lsh")(spark, sf).count())
    // …and repeated calls on the SAME Dataset must each get a FRESH
    // execution: queryExecution.toRdd is a memoized lazy val, so handing
    // it back twice would let the second drain skip every completed
    // shuffle map stage — silent result reuse under the bench's
    // construct-once protocol
    assert(Prepared.freshRdd(heavy).id != Prepared.freshRdd(heavy).id,
      "uncacheable fallback returned the memoized toRdd twice")
  }

  test("Prepared rdd cache: re-drain re-runs the map stages (no silent result reuse)") {
    import org.apache.spark.sql.functions.{col, udf}
    // Honesty probe for the round-11 prepared-RDD tier: an accumulator
    // bumped on the MAP side (pre-shuffle) counts how many input rows were
    // actually processed. If a re-drain of the cached DAG skipped the
    // completed shuffle map stage, the second run would add zero.
    // the rdd tier only engages for non-adaptive plans (the engine's
    // tiny/small regime); this shared test session has no dataDir, so pin
    // AQE off for the probe the way Engine.create's tiny regime does
    val priorAqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try {
    val acc = spark.sparkContext.longAccumulator("graft_rdd_cache_honesty")
    val bump = udf { (x: Long) => acc.add(1L); x }
    val df = Tables.load(spark, sf, "orders")
      .select(bump(col("o_orderkey")).as("k"))
      .groupBy((col("k") % 10).as("g")).count()
    val rdd1 = Prepared.freshRdd(df)
    rdd1.foreachPartition(it => while (it.hasNext) it.next())
    val afterRun1 = acc.value.longValue
    assert(afterRun1 > 0, "map side never ran")
    val rdd2 = Prepared.freshRdd(df)
    assert(rdd2 eq rdd1, "shuffle-only plan did not hit the prepared-RDD tier")
    rdd2.foreachPartition(it => while (it.hasNext) it.next())
    assert(acc.value.longValue == 2 * afterRun1,
      s"re-drain processed ${acc.value.longValue - afterRun1} map rows, " +
        s"expected $afterRun1 — shuffle map stage was silently reused")
    // broadcast-bearing plans land on the rdd tier through the round-12
    // rebroadcast rewrite: the DAG is reused, but the broadcast relation —
    // including the shuffle INSIDE its build subtree — must honestly
    // rebuild per drain. The build side here is an aggregate over orders
    // with a map-side accumulator bump: if a re-drain reused the built
    // hash relation (or skipped the build subtree's shuffle map stage),
    // the second run would add zero.
    import org.apache.spark.sql.functions.{broadcast, sum}
    val bacc = spark.sparkContext.longAccumulator("graft_rebroadcast_honesty")
    val bbump = udf { (x: Long) => bacc.add(1L); x }
    val buildSide = Tables.load(spark, sf, "orders")
      .select(bbump(col("o_orderkey")).as("k"))
      .groupBy((col("k") % 1000).as("bk")).count()
      .withColumnRenamed("count", "bc")
    val joined = Tables.load(spark, sf, "lineitem")
      .join(broadcast(buildSide), col("l_orderkey") % 1000 === col("bk"))
      .groupBy(col("l_returnflag")).agg(sum("bc").as("s"))
    val j1 = Prepared.freshRdd(joined)
    val jr1 = j1.mapPartitions(it => Iterator.single(it.size.toLong)).collect().sum
    val afterJoin1 = bacc.value.longValue
    assert(afterJoin1 > 0, "broadcast build side never ran")
    val j2 = Prepared.freshRdd(joined)
    assert(j2 eq j1, "broadcast plan did not hit the prepared-RDD tier")
    val jr2 = j2.mapPartitions(it => Iterator.single(it.size.toLong)).collect().sum
    assert(jr2 == jr1, s"re-drain rows $jr2 != first drain $jr1")
    assert(bacc.value.longValue == 2 * afterJoin1,
      s"rebroadcast refresh processed ${bacc.value.longValue - afterJoin1} " +
        s"build rows, expected $afterJoin1 — broadcast relation was silently reused")
    } finally spark.conf.set("spark.sql.adaptive.enabled", priorAqe)
  }
}
