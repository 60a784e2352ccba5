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

  test("tpch_q5: all dimension joins broadcast, no sort-merge join") {
    val p = planOf("tpch_q5")
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), "fact table must not be shuffle-sorted")
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
    val pairJoinOnGAlone = """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[g#\d+\], \[g#\d+\], Inner""".r
    assert(pairJoinOnGAlone.findFirstIn(p).isEmpty,
      "full shared-shingle pair join found in LSH verification path")
    val candBoundedJoin = """(SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin) \[b#\d+L?, g#\d+\]""".r
    assert(candBoundedJoin.findFirstIn(p).isDefined,
      s"candidate-bounded (b,g) intersection join missing: $p")
  }

  test("dedup_embed_cos: no all-pairs cross join") {
    val p = planOf("dedup_embed_cos")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "embedding dedup must be candidate-bounded, not all-pairs")
  }

  test("tpch_q8: fact joins broadcast the dimension sides") {
    val p = planOf("tpch_q8")
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("tpch_q21: EXISTS/NOT EXISTS are semi/anti joins, no correlated re-execution") {
    val p = planOf("tpch_q21")
    assert(p.contains("LeftSemi"), p)
    assert(p.contains("LeftAnti"), p)
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
}
