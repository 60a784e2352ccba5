package graft.data

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables

/** Similarity search over the embeddings table (Array[Float] column).
  *
  * Scale design:
  * - Brute-force top-k: the query set is tiny and explicitly broadcast; the
  *   corpus side streams — cost is one pass over the corpus per batch of
  *   queries, embarrassingly parallel, no shuffle of the corpus.
  * - LSH-bucketed ANN: random-hyperplane signatures put each corpus vector in
  *   one bucket; probes only scan their own bucket — the 100 TB path where a
  *   full pass per query batch is no longer acceptable. Hyperplanes are
  *   generated from a fixed seed so results are reproducible.
  * - Dot products use Catalyst higher-order functions (zip_with + aggregate):
  *   codegen'd, no UDF, sequential fold → deterministic.
  */
object Similarity {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  type Q = (SparkSession, String) => DataFrame

  /** Lloyd's k-means over a driver-resident sample (the IVF coarse
    * quantizer). Seeded deterministic init (distinct sample points chosen by
    * a fixed-seed shuffle), fixed iteration count, empty cells re-seeded
    * from the sample — no Spark job, no cache pressure, reproducible. */
  private[data] def trainCentroids(
      sample: Array[Array[Double]], k: Int, iters: Int, seed: Long): Seq[Seq[Double]] = {
    require(sample.length >= k, s"sample ${sample.length} < k=$k")
    val rnd = new scala.util.Random(seed)
    val dim = sample.head.length
    var cents: Array[Array[Double]] =
      rnd.shuffle(sample.indices.toList).take(k).map(i => sample(i).clone).toArray
    def nearest(v: Array[Double]): Int = {
      var best = 0; var bestD = Double.MaxValue
      var c = 0
      while (c < k) {
        var dist = 0.0; var i = 0
        while (i < dim) { val t = v(i) - cents(c)(i); dist += t * t; i += 1 }
        if (dist < bestD) { bestD = dist; best = c }
        c += 1
      }
      best
    }
    for (_ <- 0 until iters) {
      val sums = Array.fill(k)(new Array[Double](dim))
      val counts = new Array[Long](k)
      sample.foreach { v =>
        val c = nearest(v)
        counts(c) += 1
        var i = 0
        while (i < dim) { sums(c)(i) += v(i); i += 1 }
      }
      cents = Array.tabulate(k) { c =>
        if (counts(c) == 0) sample(rnd.nextInt(sample.length)).clone
        else { val s = sums(c); s.indices.foreach(i => s(i) /= counts(c)); s }
      }
    }
    cents.map(_.toSeq).toSeq
  }

  // Codegen ArrayDot expression (bit-identical accumulation order to the
  // zip_with/transform + aggregate HOF chains it replaced — the oracle
  // hashes depend on the double-add order; see ArrayDotUtil's doc).
  private def dot(a: Column, b: Column): Column =
    graft.functions.GraftFunctions.array_dot(a, b)

  /** Embedding dimensionality of the driver's synthetic corpus. */
  private[graft] val EmbDims = 64

  private def norm(a: Column): Column =
    graft.functions.GraftFunctions.array_norm(a)

  val queries: Map[String, Q] = Map(
    // Brute-force cosine top-10 for 5 query vectors (exact baseline).
    "sim_cosine_topk" -> ((s, d) => {
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      val q = e.filter(col("vec_id") < 5).toDF("qid", "qv", "qn")
      val pairs = e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (dot(col("qv"), col("embedding")) / (col("qn") * col("nrm"))).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      pairs.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 10)
        .select(col("qid"), col("rnk"), col("vec_id"), round(col("cos"), 4).as("sim"))
        .orderBy("qid", "rnk")
    }),

    // LSH-bucketed approximate NN: 6 fixed random hyperplanes → 64 buckets,
    // with single-bit MULTI-PROBE — each query scans its own bucket plus the
    // 6 one-bit-flip neighbors (the flips are exactly the buckets a true
    // neighbor lands in when one hyperplane splits the pair), i.e. 7/64 of
    // the corpus instead of 1/64 for ~2-3× the single-probe recall. The
    // probe expansion rides the broadcast side, so the corpus still streams
    // once with no shuffle. Approximation → rows-only check; the spec
    // asserts recall against the brute-force baseline.
    "sim_ann_lsh" -> ((s, d) => {
      val dim = 64
      val nPlanes = 6
      val rnd = new scala.util.Random(42)
      val planes: Seq[Seq[Double]] =
        Seq.fill(nPlanes)(Seq.fill(dim)(rnd.nextGaussian()))
      def sigOf(v: Column): Column =
        planes.zipWithIndex.map { case (p, i) =>
          val proj = aggregate(
            zip_with(v, typedlit(p), (x, h) => x.cast("double") * h),
            lit(0.0), (acc, x) => acc + x)
          when(proj >= 0, lit(1 << i)).otherwise(lit(0))
        }.reduce(_ + _)
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"),
          sigOf(col("embedding")).as("bucket"))
      val q = e.filter(col("vec_id") < 5).toDF("qid", "qv", "qn", "qbucket")
        .withColumn("pbucket", explode(array(col("qbucket") +:
          (0 until nPlanes).map(f => col("qbucket").bitwiseXOR(lit(1 << f))): _*)))
      val pairs = e.join(broadcast(q), col("bucket") === col("pbucket"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (dot(col("qv"), col("embedding")) / (col("qn") * col("nrm"))).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      pairs.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("vec_id"), round(col("cos"), 4).as("sim"))
        .orderBy("qid", "rnk")
    }),

    // IVF (inverted-file) approximate NN — the other standard ANN scale
    // path besides LSH: a k-means coarse quantizer trained driver-side on a
    // deterministic fixed-size sample (quantizer training is sample-sized
    // by design — k×dim centroids are the one legitimately driver-sized
    // object in the pipeline; a 100 TB corpus still trains on a few
    // thousand vectors), every corpus vector assigned to its nearest cell
    // in a single map pass, queries probing their nProbe nearest cells —
    // each query batch scans ~nProbe/nCells of the corpus, with the cell
    // column persisted/partitioned in a real deployment so repeated query
    // batches skip the assign. Distances/argmin are Catalyst HOF +
    // struct-fold expressions (codegen, no UDF). Approximate +
    // training-dependent → rows-only check; DedupSpec asserts recall
    // against the brute-force baseline.
    "sim_ann_ivf" -> ((s, d) => {
      val nCells = 16
      val nProbe = 2
      val e = t(s, d, "embeddings")
        .select(col("vec_id"), col("embedding"), norm(col("embedding")).as("nrm"))
      val cents: Seq[Seq[Double]] = trainCentroids(
        e.orderBy(col("vec_id")).limit(4096)
          .select(col("embedding")).collect()
          .map(_.getSeq[Float](0).toArray.map(_.toDouble)),
        k = nCells, iters = 10, seed = 42)
      def sqDist(v: Column, c: Seq[Double]): Column =
        aggregate(zip_with(v, typedlit(c), (x, h) => (x.cast("double") - h) * (x.cast("double") - h)),
          lit(0.0), (acc, x) => acc + x)
      // (dist, idx) structs sorted ascending — each distance is evaluated
      // ONCE inside one array literal. (A when-chain argmin fold would
      // duplicate its left subtree per step: 2^k expression blowup — it
      // OOM'd the driver during codegen at k=16.)
      def cellArr(v: Column): Column =
        array_sort(array(cents.zipWithIndex.map { case (c, i) =>
          struct(sqDist(v, c).as("d"), lit(i).as("i"))
        }: _*))
      def cellOf(v: Column): Column = element_at(cellArr(v), 1)("i")
      def probeCells(v: Column): Column = slice(cellArr(v), 1, nProbe)
      val corpus = e.withColumn("cell", cellOf(col("embedding")))
      val q = e.filter(col("vec_id") < 5).toDF("qid", "qv", "qn")
        .withColumn("pcell", explode(probeCells(col("qv"))("i")))
      val pairs = corpus.join(broadcast(q), col("cell") === col("pcell"))
        .filter(col("vec_id") =!= col("qid"))
        .select(col("qid"), col("vec_id"),
          (dot(col("qv"), col("embedding")) / (col("qn") * col("nrm"))).as("cos"))
      val w = Window.partitionBy(col("qid")).orderBy(col("cos").desc, col("vec_id"))
      pairs.withColumn("rnk", row_number().over(w).cast("long"))
        .filter(col("rnk") <= 5)
        .select(col("qid"), col("rnk"), col("vec_id"), round(col("cos"), 4).as("sim"))
        .orderBy("qid", "rnk")
    }),

    // Vector norms + mean component — numeric sanity surface for the
    // embedding column, fully oracle-checked.
    // Int8 scalar quantization — the standard embedding-compression step
    // for corpus-scale vector stores (4× smaller than float32, cheap SIMD
    // distance kernels downstream). Per-dimension min/max ranges come from
    // a posexplode + groupBy(dim) aggregation: partial min/max collapses
    // every partition to ≤64 rows before the exchange, so the stats pass
    // shuffles O(partitions × dims) bytes no matter the corpus size; the
    // 64-entry range table then broadcasts and coding is a pure map stage
    // (array HOFs, codegen). Integer outputs → exact DuckDB hash oracle
    // (the round() tie rule, half-away-from-zero on these non-negative
    // scaled values, agrees between engines; the arithmetic is written in
    // the identical operation order on both sides).
    "sim_quantize_int8" -> ((s, d) => {
      val e = t(s, d, "embeddings")
      val dims = e.select(posexplode(col("embedding")).as(Seq("i", "x")))
        .groupBy(col("i"))
        .agg(min(col("x").cast("double")).as("mn"), max(col("x").cast("double")).as("mx"))
      val stats = dims
        .agg(array_sort(collect_list(struct(col("i"), col("mn"), col("mx")))).as("st"))
        .select(transform(col("st"), f => f.getField("mn")).as("mns"),
          transform(col("st"), f => f.getField("mx")).as("mxs"))
      val codes = transform(col("embedding"), (x, i) => {
        val mn = element_at(col("mns"), i + 1)
        val mx = element_at(col("mxs"), i + 1)
        when(mx === mn, lit(0L))
          .otherwise(round((x.cast("double") - mn) * lit(255.0) / (mx - mn)).cast("long"))
      })
      e.crossJoin(broadcast(stats))
        .select(col("vec_id"), codes.as("code"))
        .select(col("vec_id"),
          element_at(col("code"), 1).as("c0"),
          element_at(col("code"), 2).as("c1"),
          element_at(col("code"), 3).as("c2"),
          element_at(col("code"), 4).as("c3"),
          aggregate(zip_with(col("code"), sequence(lit(1L), size(col("code")).cast("long")),
            (c, i) => c * i), lit(0L), (acc, v) => acc + v).as("code_sum"))
        .orderBy("vec_id")
    }),

    "sim_vector_stats" -> ((s, d) =>
      t(s, d, "embeddings")
        .select(col("vec_id"),
          size(col("embedding")).cast("long").as("dim"),
          round(norm(col("embedding")), 4).as("l2"),
          round(aggregate(col("embedding"), lit(0.0), (acc, x) => acc + x.cast("double")) /
            size(col("embedding")).cast("double"), 6).as("mean_c"))
        .orderBy("vec_id")),

    // Per-label embedding centroids (class prototypes / the k-means update
    // step) via the typed Aggregator UDAF — one Array[Long] buffer per
    // group per partition, so the vectors are consumed in a single pass and
    // only |labels|·|partitions| buffers shuffle. The explode-to-(row,dim)
    // formulation the oracle uses would multiply the shuffled row count by
    // the dimensionality (×64 here, ×4096 in production) — the UDAF exists
    // precisely to avoid that at 100 TB. Exact scaled-long accumulation
    // (graft.functions.CentroidAgg) keeps the doubles engine-identical.
    "sim_centroids" -> ((s, d) => {
      val cagg = udaf(new graft.functions.CentroidAgg(EmbDims))
      t(s, d, "embeddings")
        .groupBy(col("label").cast("long").as("label"))
        .agg(count(lit(1)).as("n"), cagg(col("embedding")).as("c"))
        .select(col("label"), col("n"),
          element_at(col("c"), 1).as("c0"),
          element_at(col("c"), 2).as("c1"),
          element_at(col("c"), 3).as("c2"),
          element_at(col("c"), 4).as("c3"),
          element_at(col("c"), EmbDims + 1).as("grand_mean"))
        .orderBy("label")
    })
  )

  val oracle: Map[String, String] = Map(
    "sim_cosine_topk" ->
      """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                           CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings),
              norms AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY 1),
              q AS (SELECT vec_id AS qid, i, v FROM e WHERE vec_id < 5),
              dots AS (SELECT q.qid, e.vec_id, sum(q.v * e.v) AS dot
                       FROM q JOIN e ON q.i = e.i AND q.qid <> e.vec_id
                       GROUP BY 1, 2),
              cosd AS (SELECT dots.qid AS qid, dots.vec_id AS vec_id, dot / (nq.nrm * nv.nrm) AS cs
                       FROM dots JOIN norms nq ON dots.qid = nq.vec_id
                       JOIN norms nv ON dots.vec_id = nv.vec_id),
              ranked AS (SELECT qid, vec_id, cs,
                       CAST(row_number() OVER (PARTITION BY qid ORDER BY cs DESC, vec_id) AS BIGINT) AS rnk
                       FROM cosd)
         SELECT qid, rnk, vec_id, round(cs, 4) AS sim
         FROM ranked WHERE rnk <= 10 ORDER BY qid, rnk""",
    "sim_quantize_int8" ->
      """WITH e AS (SELECT vec_id, generate_subscripts(embedding, 1) AS i,
                           CAST(unnest(embedding) AS DOUBLE) AS x FROM embeddings),
              st AS (SELECT i, min(x) AS mn, max(x) AS mx FROM e GROUP BY 1),
              c AS (SELECT e.vec_id, e.i,
                           CASE WHEN st.mx = st.mn THEN 0
                                ELSE CAST(round((e.x - st.mn) * 255.0 / (st.mx - st.mn)) AS BIGINT)
                           END AS code
                    FROM e JOIN st ON e.i = st.i)
         SELECT vec_id,
                max(CASE WHEN i = 1 THEN code END) AS c0,
                max(CASE WHEN i = 2 THEN code END) AS c1,
                max(CASE WHEN i = 3 THEN code END) AS c2,
                max(CASE WHEN i = 4 THEN code END) AS c3,
                CAST(sum(code * i) AS BIGINT) AS code_sum
         FROM c GROUP BY vec_id ORDER BY vec_id""",
    // floor(x·10⁶ + 0.5) is the exact closed form CentroidAgg applies per
    // component; the oracle explodes to (row, dim) — fine at oracle scale,
    // the thing the UDAF avoids at corpus scale.
    "sim_centroids" ->
      s"""WITH e AS (SELECT label, generate_subscripts(embedding, 1) AS i,
                            CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000 + 0.5) AS BIGINT) AS s
                     FROM embeddings),
              m AS (SELECT label, i, CAST(sum(s) AS DOUBLE) / (count(*) * 1000000.0) AS c
                    FROM e GROUP BY 1, 2),
              g AS (SELECT label, CAST(sum(s) AS DOUBLE) / (count(*) * 1000000.0) AS grand_mean,
                           count(*) // $EmbDims AS n
                    FROM e GROUP BY 1)
         SELECT CAST(m.label AS BIGINT) AS label, CAST(g.n AS BIGINT) AS n,
                max(CASE WHEN i = 1 THEN c END) AS c0,
                max(CASE WHEN i = 2 THEN c END) AS c1,
                max(CASE WHEN i = 3 THEN c END) AS c2,
                max(CASE WHEN i = 4 THEN c END) AS c3,
                max(g.grand_mean) AS grand_mean
         FROM m JOIN g ON m.label = g.label
         GROUP BY 1, 2 ORDER BY label""",
    "sim_vector_stats" ->
      """WITH e AS (SELECT vec_id, CAST(unnest(embedding) AS DOUBLE) AS v FROM embeddings)
         SELECT vec_id, CAST(count(*) AS BIGINT) AS dim,
                round(sqrt(sum(v * v)), 4) AS l2,
                round(sum(v) / count(*), 6) AS mean_c
         FROM e GROUP BY vec_id ORDER BY vec_id"""
  )
}
