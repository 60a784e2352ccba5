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

  test("sign-band candidates: recall 1.0 on planted near-dup vectors") {
    import spark.implicits._
    // 50 seeded random base vectors, each with a 1%-perturbed near-dup twin
    // (cos > 0.99). Sign-LSH must catch every planted pair.
    val rnd = new scala.util.Random(7)
    val base = (0 until 50).map(i => (i.toLong, Array.fill(64)(rnd.nextGaussian().toFloat)))
    val twins = base.map { case (id, v) =>
      (id + 1000L, v.map(x => x + (rnd.nextGaussian() * 0.01f * math.abs(x)).toFloat))
    }
    val df = (base ++ twins).toDF("vec_id", "embedding")
    val cand = graft.data.Dedup.signBandCandidates(df)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val planted = (0 until 50).map(i => (i.toLong, i + 1000L)).toSet
    assert(planted.subsetOf(cand), s"missed planted pairs: ${planted -- cand}")
    // and it is a sparsifier, not an all-pairs enumerator, on random data
    val n = 100
    val allPairs = n * (n - 1) / 2
    val randOnly = graft.data.Dedup.signBandCandidates(
      base.toDF("vec_id", "embedding").limit(n)).count()
    assert(randOnly < allPairs / 2, s"candidates $randOnly not sparse vs $allPairs")
  }

  test("embed-cos top-20: every pair is a sign-band candidate with exact cosine") {
    val rows = SparkEntry.queries("dedup_embed_cos")(spark, sf).collect()
    assert(rows.length == 20)
    assert(rows.forall { r => r.getAs[Double]("sim") >= -1.0 && r.getAs[Double]("sim") <= 1.0 })
  }

  test("jaccard is symmetric-free (a < b) and within [0,1]") {
    val rows = SparkEntry.queries("dedup_ngram_jaccard")(spark, sf).collect()
    assert(rows.forall { r =>
      val (a, b, j) = (r.getAs[Long]("a"), r.getAs[Long]("b"), r.getAs[Double]("jac"))
      a < b && j >= 0.0 && j <= 1.0
    })
  }
}
