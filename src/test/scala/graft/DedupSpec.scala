package graft

import org.apache.spark.sql.functions._

/** LSH candidate generation must not lose true near-duplicates (the planted
  * near-dup pairs in the synthetic corpus), and signatures must be stable. */
class DedupSpec extends SparkSpec {

  test("minhash-LSH finds every pair with exact jaccard >= 0.5") {
    val exact = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf)
      .filter(col("jac") >= 0.5)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val lsh = SparkEntry.queries("dedup_minhash_lsh")(spark, sf)
      .select("a", "b").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty, "synthetic corpus should contain planted near-dups")
    assert(exact.subsetOf(lsh), s"missed pairs: ${exact -- lsh}")
  }

  test("simhash pairs respect the hamming threshold") {
    val rows = SparkEntry.queries("dedup_simhash")(spark, sf).collect()
    assert(rows.forall(_.getAs[Long]("hamming") <= 10))
  }

  test("exact dedup: every group keeps its minimal doc_id") {
    val rows = SparkEntry.queries("dedup_exact")(spark, sf).collect()
    assert(rows.map(_.getAs[Long]("n_copies")).sum ==
      Tables.load(spark, sf, "documents").count())
  }

  test("jaccard is symmetric-free (a < b) and within [0,1]") {
    val rows = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf).collect()
    assert(rows.forall { r =>
      val (a, b, j) = (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Double]("jac"))
      a < b && j >= 0.0 && j <= 1.0
    })
  }
}
