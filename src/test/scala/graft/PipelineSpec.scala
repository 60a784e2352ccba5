package graft

import org.apache.spark.sql.functions._

class PipelineSpec extends SparkSpec {

  test("text_stats expression matches the HOF formulation on edge-case texts") {
    import spark.implicits._
    val stop = Seq("the", "a", "of", "and")
    val texts = Seq(
      "", " ", "  ", "the", "a of and the", " leading", "trailing ",
      "double  space", "the the the", "añüé 中文 字 the", "xthe thex th e",
      "of", "and of", "a  a   a", "word", "the  a", "中文中文 的",
      "ánd and", "THE The the").toDF("text")
    def tk = split(col("text"), " ")
    val hof = texts.select(
      length(col("text")).cast("long"),
      size(tk).cast("long"),
      size(filter(tk, x => x.isin(stop: _*))).cast("long"),
      aggregate(transform(tk, x => length(x)), lit(0), (a, x) => a + x).cast("long"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    // codegen path (whole-stage projection)
    val gen = texts.select(functions.GraftFunctions.text_stats(col("text"), stop).as("ts"))
      .select("ts.*")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(gen == hof)
    // interpreted path (nullSafeEval) must agree with codegen
    val stops = stop.map(_.getBytes("UTF-8")).toArray
    val interp = texts.collect().map { r =>
      val row = functions.ExprUtil.textStats(
        org.apache.spark.unsafe.types.UTF8String.fromString(r.getString(0)), stops)
      (row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3))
    }.toSeq
    assert(interp == hof)
  }

  test("text_mix_sample: every domain contributes and budgets bind") {
    val rows = SparkEntry.queries("text_mix_sample")(spark, sf).collect()
      .map(r => (r.getAs[String]("lang"), r.getAs[Long]("n_tokens"), r.getAs[Long]("cum_tokens")))
    val langs = Tables.load(spark, sf, "documents")
      .select("lang").distinct().collect().map(_.getString(0)).toSet
    assert(rows.map(_._1).toSet == langs) // non-empty domains all contribute
    def budget(l: String) = if (l == "en") 4000L else 1000L
    // keep rule: the budget was not exhausted before the kept doc
    assert(rows.forall { case (l, n, cum) => cum - n < budget(l) })
    // budget coverage: per domain, kept tokens reach the budget unless the
    // domain ran out of documents entirely
    val total = Tables.load(spark, sf, "documents")
      .selectExpr("lang", "size(split(text, ' ')) AS n")
      .groupBy("lang").sum("n").collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.groupBy(_._1).foreach { case (l, rs) =>
      val kept = rs.map(_._2).sum
      assert(kept >= math.min(budget(l), total(l)), s"$l kept=$kept")
    }
  }

  test("multimodal stub metadata is consistent with byte lengths") {
    val rows = SparkEntry.queries("mm_meta")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall { r =>
      val n = r.getAs[Long]("n_bytes")
      r.getAs[Long]("width") == n % 640 &&
        r.getAs[Long]("height") == (n * 7) % 480 &&
        r.getAs[Long]("n_frames") == n % 16 + 1
    })
  }

  test("frame sampling explodes exactly n_frames rows per doc") {
    val meta = SparkEntry.queries("mm_meta")(spark, sf)
      .filter(col("doc_id") < 100)
      .select(sum("n_frames")).collect().head.getLong(0)
    val frames = SparkEntry.queries("mm_frames")(spark, sf).count()
    assert(frames == meta)
  }

  test("ev_approx_stats: sketch estimates stay within bounds of exact values") {
    val approx = SparkEntry.queries("ev_approx_stats")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") ->
        (r.getAs[Long]("approx_users"), r.getAs[Double]("ap50"), r.getAs[Double]("ap99"))).toMap
    val ev = Tables.load(spark, sf, "events")
    val exactUsers = ev.groupBy("event_type").agg(countDistinct("user_id").as("u"))
      .collect().map(r => r.getString(0) -> r.getAs[Long]("u")).toMap
    assert(approx.keySet == exactUsers.keySet)
    approx.foreach { case (et, (au, ap50, ap99)) =>
      val eu = exactUsers(et)
      // approx_count_distinct rsd=0.02 → 5σ bound 10%
      assert(math.abs(au - eu).toDouble / eu < 0.10, s"$et: approx $au vs exact $eu")
      assert(ap50 <= ap99, s"$et: quantile order")
    }
    // percentile_approx at accuracy 10000 on this cardinality is near-exact:
    // compare against the exact rank-selected quantiles
    val exactQ = SparkEntry.queries("ev_quantiles")(spark, sf).collect()
      .map(r => r.getAs[String]("event_type") -> r.getAs[Double]("p50")).toMap
    approx.foreach { case (et, (_, ap50, _)) =>
      val range = ev.filter(col("event_type") === et)
        .agg(max("value").cast("double")).collect().head.getDouble(0)
      assert(math.abs(ap50 - exactQ(et)) <= 0.05 * range,
        s"$et: ap50 $ap50 vs exact ${exactQ(et)}")
    }
  }

  test("sessionization: session counts and bounds are sane") {
    val rows = SparkEntry.queries("ev_sessions")(spark, sf).collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r.getAs[Long]("start_s") <= r.getAs[Long]("end_s")))
    // per user, session ids are 1..k dense
    val byUser = rows.groupBy(_.getAs[Long]("user_id"))
    assert(byUser.values.forall { rs =>
      val ids = rs.map(_.getAs[Long]("session_id")).sorted.toSeq
      ids == (1L to ids.length.toLong)
    })
  }

  test("session_window boundary: an event at exactly gap distance merges") {
    // Pins the semantics the ev_session_window oracle mirrors: Spark's
    // session_window extends a session through an event at EXACTLY
    // start+gap (new session only when gap > 30 min). Events at 0 s,
    // 1800 s (exact gap → merge), and 3600.000001 s (gap 1800.000001 s
    // → split) must produce exactly two sessions.
    import spark.implicits._
    val df = Seq((1L, 0L), (1L, 1800000000L), (1L, 3600000001L)).toDF("user_id", "us")
      .withColumn("ts_ts", timestamp_micros(col("us")))
    val rows = df.groupBy(col("user_id"), session_window(col("ts_ts"), "30 minutes"))
      .agg(count(lit(1)).as("n"))
      .select(expr("unix_micros(session_window.start)").as("start_us"), col("n"))
      .orderBy("start_us").collect()
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((0L, 2L), (3600000001L, 1L)))
  }

  test("ev_session_window equals ev_sessions' session partitioning") {
    // Same gap rule, independent constructions (native operator vs
    // lag+cumsum): per-user session counts and total per-session event
    // counts must agree.
    val native = SparkEntry.queries("ev_session_window")(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("k"), sum("n_events").as("n"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    val manual = SparkEntry.queries("ev_sessions")(spark, sf)
      .groupBy("user_id").agg(count(lit(1)).as("k"), sum("n_events").as("n"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2)))).toMap
    assert(native.nonEmpty && native == manual)
  }

  test("langid emits a prediction for every document") {
    val n = SparkEntry.queries("text_langid")(spark, sf).count()
    assert(n == Tables.load(spark, sf, "documents").count())
  }

  test("pii scrub: injected email/phone are found and redacted") {
    val rows = SparkEntry.queries("text_pii_scrub")(spark, sf).collect()
    assert(rows.nonEmpty)
    // every doc gets exactly one injected email + phone appended; organic
    // matches in the synthetic text would only add to the counts
    assert(rows.forall(_.getAs[Long]("n_email") >= 1))
    assert(rows.forall(_.getAs[Long]("n_phone") >= 1))
  }

  test("chunking: stride/size invariants and exact reassembly") {
    import graft.data.TextAnalysis.{ChunkOverlap, ChunkSize, ChunkStride}
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 50)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    val chunks = SparkEntry.queries("text_chunk")(spark, sf)
      .filter(col("doc_id") < 50).collect()
      .groupBy(_.getAs[Long]("doc_id"))
      .view.mapValues(_.sortBy(_.getAs[Long]("chunk_id"))
        .map(_.getAs[String]("chunk_text")).toSeq).toMap
    assert(chunks.keySet == docs.keySet)
    docs.foreach { case (id, toks) =>
      val expected = (1 to math.max(toks.size - ChunkOverlap, 1) by ChunkStride)
        .map(s => toks.slice(s - 1, s - 1 + ChunkSize).mkString(" "))
      assert(chunks(id) == expected, s"doc $id")
      // overlap-aware reassembly: chunk 0 + the tail of every later chunk
      val reassembled = (expected.head.split(" ", -1).toSeq ++
        expected.tail.flatMap(_.split(" ", -1).drop(ChunkOverlap))).mkString(" ")
      assert(reassembled == toks.mkString(" "), s"doc $id reassembly")
    }
  }

  test("repetition signals match a hand count and stay in bounds") {
    val byId = SparkEntry.queries("text_repetition")(spark, sf)
      .filter(col("doc_id") < 50).collect()
      .map(r => r.getAs[Long]("doc_id") -> r).toMap
    val docs = Tables.load(spark, sf, "documents").filter(col("doc_id") < 50)
      .select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1).split(" ", -1).toSeq).toMap
    assert(byId.keySet == docs.keySet)
    docs.foreach { case (id, toks) =>
      val r = byId(id)
      val counts = toks.groupBy(identity).view.mapValues(_.size)
      assert(r.getAs[Long]("n_words") == toks.size)
      assert(r.getAs[Long]("n_distinct") == counts.size)
      assert(r.getAs[Double]("top_word_frac") ==
        counts.values.max.toDouble / toks.size, s"doc $id top word")
      val bigrams = toks.sliding(2).filter(_.size == 2).map(_.mkString(" ")).toSeq
      assert(r.getAs[Long]("n_bigrams") == bigrams.size)
      if (bigrams.nonEmpty) {
        val bc = bigrams.groupBy(identity).view.mapValues(_.size)
        assert(r.getAs[Double]("top_bigram_frac") ==
          bc.values.max.toDouble / bigrams.size, s"doc $id top bigram")
      }
      val dup = r.getAs[Double]("dup_word_frac")
      assert(dup >= 0.0 && dup < 1.0)
    }
  }

  test("stratified sample: per-stratum cap, hash-ordered, run-stable") {
    import graft.data.TextAnalysis.StratumN
    val a = SparkEntry.queries("text_stratified_sample")(spark, sf).collect()
    val perLang = a.groupBy(_.getAs[String]("lang"))
    val langCounts = Tables.load(spark, sf, "documents")
      .groupBy("lang").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    perLang.foreach { case (lang, rows) =>
      assert(rows.length == math.min(StratumN.toLong, langCounts(lang)),
        s"stratum $lang takes min(N, stratum size)")
      assert(rows.map(_.getAs[Long]("rk")).sorted.toSeq ==
        (1L to rows.length).toSeq, s"stratum $lang ranks are dense")
    }
    // content-hash order => re-running yields the identical subset
    val b = SparkEntry.queries("text_stratified_sample")(spark, sf).collect()
    assert(a.map(_.toString).toSeq == b.map(_.toString).toSeq)
  }

  test("packing: contiguous offsets per bucket, window arithmetic consistent") {
    import graft.data.TextAnalysis.PackWindow
    val rows = SparkEntry.queries("text_pack")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getAs[Long]("bucket")).foreach { case (b, rs) =>
      val ordered = rs.sortBy(_.getAs[Long]("doc_id"))
      var expectedStart = 0L
      ordered.foreach { r =>
        val (st, n) = (r.getAs[Long]("start_off"), r.getAs[Long]("n_tokens"))
        assert(st == expectedStart, s"bucket $b: gap/overlap at doc ${r.getAs[Long]("doc_id")}")
        assert(r.getAs[Long]("first_seq") == st / PackWindow)
        assert(r.getAs[Long]("last_seq") == (st + n - 1) / PackWindow)
        assert(r.getAs[Long]("first_seq") <= r.getAs[Long]("last_seq"))
        expectedStart = st + n
      }
    }
  }

  test("vocab: top-k rows, frequencies descending, counts match a manual count") {
    val rows = SparkEntry.queries("text_vocab")(spark, sf).collect()
    val vocabSize = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok")).distinct().count()
    assert(rows.length == math.min(100L, vocabSize))
    val freqs = rows.map(_.getAs[Long]("freq"))
    assert(freqs.zip(freqs.tail).forall { case (a, b) => a >= b })
    val top = rows.head
    val manual = Tables.load(spark, sf, "documents")
      .select(explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") === top.getAs[String]("token")).count()
    assert(top.getAs[Long]("freq") == manual)
  }

  test("nfc_normalize: composes decomposed text, identity on ASCII/NFC, both eval paths") {
    import spark.implicits._
    val decomposed = "résumé naïve"
    val composed = "résumé naïve"
    val rows = Seq(decomposed, composed, "plain ascii", "", "中文 mixed ascii")
      .toDF("s")
      .select(functions.GraftFunctions.nfc_normalize(col("s")).as("n"))
      .collect().map(_.getString(0))
    assert(rows(0) == composed)   // decomposed → composed
    assert(rows(1) == composed)   // already NFC → unchanged
    assert(rows(2) == "plain ascii")
    assert(rows(3) == "")
    assert(rows(4) == "中文 mixed ascii")
    // interpreted path agrees with the codegen results above
    import org.apache.spark.unsafe.types.UTF8String
    assert(functions.ExprUtil.nfc(UTF8String.fromString(decomposed)).toString == composed)
    // NULL in → NULL out
    val n = Seq[Option[String]](None).toDF("s")
      .select(functions.GraftFunctions.nfc_normalize(col("s")).as("n")).collect()
    assert(n(0).isNullAt(0))
  }

  test("text_seg_dedup: kept-everything docs reassemble exactly; boilerplate path fires") {
    val out = SparkEntry.queries("text_seg_dedup")(spark, sf).collect()
      .map(r => r.getAs[Long]("doc_id") ->
        ((r.getAs[Long]("n_segs"), r.getAs[Long]("n_kept"), r.getAs[String]("cleaned_md5"))))
      .toMap
    val docs = Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text", "md5(cast(text as binary)) AS m").collect()
      .map(r => r.getAs[Long]("doc_id") -> ((r.getAs[String]("text"), r.getAs[String]("m")))).toMap
    assert(out.keySet == docs.keySet) // every doc appears, even fully-dropped ones
    // segments partition the token stream, so n_kept == n_segs ⇒ cleaned == original
    val intact = out.filter { case (_, (s, k, _)) => s == k }
    assert(intact.nonEmpty)
    intact.foreach { case (id, (_, _, md5c)) => assert(md5c == docs(id)._2, s"doc $id") }
    // and the corpus actually contains boilerplate: some doc lost a segment
    assert(out.exists { case (_, (s, k, _)) => k < s })
  }

  test("cosine top-k: k rows per query, sims descending within query") {
    val rows = SparkEntry.queries("sim_cosine_topk")(spark, sf).collect()
    val byQ = rows.groupBy(_.getAs[Long]("qid"))
    assert(byQ.size == 5)
    assert(byQ.values.forall { rs =>
      val sims = rs.sortBy(_.getAs[Long]("rnk")).map(_.getAs[Double]("sim"))
      sims.length == 10 && sims.zip(sims.tail).forall { case (x, y) => x >= y }
    })
  }
}
