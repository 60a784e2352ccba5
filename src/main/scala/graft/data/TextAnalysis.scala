package graft.data

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.Tables
import graft.functions.GraftFunctions

/** Text-analysis operators for large-scale training-data pipelines: quality
  * scoring, token statistics, fingerprinting, language-ID. All are single-pass
  * narrow transforms over the `documents` table — no shuffle at all except the
  * final presentation sort, so they scale linearly with input splits (at 100 TB
  * these run as pure map stages over parquet row groups).
  *
  * The array-lambda forms (filter/transform/aggregate) are Catalyst
  * higher-order functions — codegen'd, no UDF boxing.
  */
object TextAnalysis {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  type Q = (SparkSession, String) => DataFrame

  private val stopwords = Seq("the", "a", "of", "and")

  private def toks: Column = split(col("text"), " ")

  val queries: Map[String, Q] = Map(
    // Quality scoring: length, token count, stopword ratio, mean token length.
    // Formulation history (A/B at sf10): array-HOF 3.65 s; staged named-column
    // projections tied it (3.75 s — codegen subexpr elimination already
    // dedupes the split); an "all-codegen" regex rewrite (lookaround
    // regexp_count + length(translate)) was 2× WORSE (7.2 s). Current form:
    // the custom TextStats expression — ONE byte scan per document computes
    // all four counters with zero token-array materialization (the HOF form
    // allocates a UTF8String per token per lambda pass); semantics contract
    // vs the HOF form is pinned in ExprUtil.textStats's doc + PipelineSpec's
    // equivalence fixture (empty/multi-space/multibyte/stopword-edge rows).
    "text_quality" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          GraftFunctions.text_stats(col("text"), stopwords).as("ts"))
        .select(
          col("doc_id"),
          col("ts.n_chars").as("n_chars"),
          col("ts.n_tokens").as("n_tokens"),
          col("ts.n_stop").as("n_stop"),
          (col("ts.n_stop").cast("double") /
            col("ts.n_tokens").cast("double")).as("stop_ratio"),
          (col("ts.sum_tok_len").cast("double") /
            col("ts.n_tokens").cast("double")).as("avg_tok_len"))
        .orderBy("doc_id")),

    // Token statistics: total/distinct counts (vocabulary richness).
    "text_tokens" -> ((s, d) =>
      t(s, d, "documents")
        .select(
          col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          size(array_distinct(toks)).cast("long").as("n_distinct"),
          (size(array_distinct(toks)).cast("double") / size(toks).cast("double"))
            .as("ttr"))
        .orderBy("doc_id")),

    // Normalized-content fingerprint (md5 of whitespace-collapsed lowercase)
    // — the exact-dedup key for "effectively identical" documents.
    "text_fp_md5" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          md5(lower(regexp_replace(col("text"), "\\s+", " ")).cast("binary")).as("fp"))
        .orderBy("doc_id")),

    // Rolling-hash fingerprint via the custom codegen expression. The oracle
    // replays the exact 61-bit polynomial in DuckDB HUGEINT arithmetic
    // (graft.util.OracleSql.rollingFp), so this is fully hash-checked.
    "text_fp_rolling" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"),
          GraftFunctions.rolling_hash(lower(col("text"))).as("fp"))
        .orderBy("doc_id")),

    // Deterministic train/val/test split: bucket = content hash mod 100, so
    // the assignment is a pure function of the text — stable across runs,
    // clusters, and engines (the property a 100 TB pipeline needs: re-running
    // the split can never leak val/test docs into train). 80/10/10.
    "text_split_assign" -> ((s, d) => {
      val bucket = GraftFunctions.rolling_hash(col("text")) % 100
      t(s, d, "documents")
        .select(col("doc_id"), bucket.as("bucket"),
          when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
            .as("split"))
        .orderBy("doc_id")
    }),

    // Benchmark decontamination: flag corpus docs sharing any 3-word shingle
    // with a held-out benchmark set (here: doc_id % 97 = 0 stands in for the
    // eval suite). At 100 TB the benchmark gram set is tiny and broadcast, so
    // the contamination JOIN itself adds no shuffle (the shingle pipeline's
    // per-doc distinct and the final per-doc count still shuffle once each).
    "text_decontam" -> ((s, d) => {
      val grams = Dedup.shingles(t(s, d, "documents"))
      val bench = grams.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
      grams.filter(col("doc_id") % 97 =!= 0)
        .join(broadcast(bench), Seq("g"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    }),

    // Bloom-filter decontamination — the 100 TB path for text_decontam.
    // The broadcast semi-join above ships the RAW benchmark gram strings to
    // every task; at production benchmark sizes (10⁷-10⁸ grams) that
    // broadcast is GBs. Here the benchmark side is compressed into a bloom
    // filter over xxhash64(gram) (~1.2 MB per 10⁶ grams at 1% fpp, built
    // distributed by Spark's mergeable sketch aggregate; the driver holds
    // only the fixed-size filter, like the IVF training sample), the corpus
    // stream is pre-filtered by Catalyst's BloomFilterMightContain — the
    // same expression Spark's own runtime row-level filtering injects, so
    // it rides whole-stage codegen — and only the surviving ~fpp fraction
    // reaches an exact shuffle semi-join for verification. Results are
    // EXACT (bloom false positives are killed by the verify join), so the
    // oracle is the same SQL as text_decontam.
    "text_decontam_bloom" -> ((s, d) => {
      val grams = Dedup.shingles(t(s, d, "documents"))
      val bench = grams.filter(col("doc_id") % 97 === 0).select(col("g")).distinct()
      val bloom = bench.select(xxhash64(col("g")).as("h"))
        .stat.bloomFilter("h", expectedNumItems = 1000L * 1000L, fpp = 0.01)
      val bytes = {
        val bos = new java.io.ByteArrayOutputStream()
        bloom.writeTo(bos); bos.toByteArray
      }
      import org.apache.spark.sql.GraftColumnBridge
      import org.apache.spark.sql.catalyst.expressions.{BloomFilterMightContain, Literal}
      val mightContain = GraftColumnBridge.column(BloomFilterMightContain(
        Literal.create(bytes, org.apache.spark.sql.types.BinaryType),
        GraftColumnBridge.expression(xxhash64(col("g")))))
      grams.filter(col("doc_id") % 97 =!= 0)
        .filter(mightContain)
        .join(bench.hint("shuffle_hash"), Seq("g"))
        .groupBy(col("doc_id")).agg(count(lit(1)).as("n_shared"))
        .orderBy("doc_id")
    }),

    // Language-ID: stopword-profile n-gram heuristic (argmax of per-language
    // marker-token hits, deterministic priority on ties). The oracle mirrors
    // the same profiles and tie order in DuckDB, so this is hash-checked.
    "text_langid" -> ((s, d) => langid(t(s, d, "documents")).orderBy("doc_id")),

    // PII scrubbing: redact emails / phone-shaped numbers / IPv4s before a
    // corpus ships to training. Pure map stage (regexp_replace chains are
    // codegen'd), so it scales with input splits like every other narrow
    // transform here. The synthetic corpus has no organic PII, so a
    // deterministic PII-bearing suffix (a function of doc_id alone) is
    // appended on BOTH engines before scrubbing — the redaction paths are
    // genuinely exercised, and counts land in the output for the contract.
    "text_pii_scrub" -> ((s, d) => {
      val injected = concat(col("text"),
        lit(" contact user"), (col("doc_id") % 1000).cast("string"),
        lit("@example.com or +1 555-01"),
        format_string("%02d", col("doc_id") % 100),
        lit(" from 10.0."), (col("doc_id") % 256).cast("string"),
        lit("."), (col("doc_id") % 97).cast("string"))
      val scrubbed = regexp_replace(regexp_replace(regexp_replace(injected,
        PiiEmail, "<EMAIL>"), PiiPhone, "<PHONE>"), PiiIp, "<IP>")
      t(s, d, "documents")
        .select(col("doc_id"),
          size(regexp_extract_all(injected, lit(PiiEmail), lit(0))).cast("long").as("n_email"),
          size(regexp_extract_all(injected, lit(PiiPhone), lit(0))).cast("long").as("n_phone"),
          md5(scrubbed.cast("binary")).as("scrubbed_md5"))
        .orderBy("doc_id")
    }),

    // Fixed-size token chunking with overlap (chunk 64, stride 48) — the
    // shape every context-window-bounded training pipeline needs. posexplode
    // over the chunk starts is map-side only: no shuffle, each input split
    // chunks independently, output order pinned by (doc_id, chunk_id).
    "text_chunk" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), toks.as("w"))
        .select(col("doc_id"),
          posexplode(sequence(lit(1), greatest(size(col("w")) - ChunkOverlap, lit(1)),
            lit(ChunkStride))).as(Seq("chunk_id", "start")),
          col("w"))
        .select(col("doc_id"), col("chunk_id").cast("long").as("chunk_id"),
          array_join(slice(col("w"), col("start"), lit(ChunkSize)), " ").as("chunk_text"),
          least(size(col("w")) - col("start") + 1, lit(ChunkSize)).cast("long")
            .as("n_chunk_tokens"))
        .orderBy("doc_id", "chunk_id")),

    // Repetition signals (the Gopher/RefinedWeb quality rules): duplicate-word
    // fraction, most-frequent-word fraction, and most-frequent-bigram fraction
    // per document. Counting goes through (doc_id, token) partial aggregation
    // — the exploded token stream combines map-side, so only (doc, token,
    // partial-count) triples shuffle, then a doc_id-keyed rollup; the bigram
    // branch reuses the doc_id shuffle for its final join. No per-doc
    // quadratic HOF scans (transform×filter over the token array would be
    // O(distinct·n) per doc — a job-killer on 10k-token documents).
    "text_repetition" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val wa = docs.select(col("doc_id"), explode(toks).as("w"))
        .groupBy(col("doc_id"), col("w")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum("c").as("n_words"), count(lit(1)).as("n_distinct"),
          max("c").as("top_c"))
      val bigrams = zip_with(
        slice(toks, lit(1), size(toks) - 1),
        slice(toks, lit(2), size(toks) - 1),
        (x, y) => concat(x, lit(" "), y))
      val ba = docs.filter(size(toks) >= 2)
        .select(col("doc_id"), explode(bigrams).as("b"))
        .groupBy(col("doc_id"), col("b")).agg(count(lit(1)).as("c"))
        .groupBy(col("doc_id"))
        .agg(sum("c").as("n_bigrams"), max("c").as("top_bc"))
      wa.join(ba, Seq("doc_id"), "left")
        .select(col("doc_id"),
          col("n_words").cast("long").as("n_words"),
          col("n_distinct").cast("long").as("n_distinct"),
          ((col("n_words") - col("n_distinct")).cast("double") /
            col("n_words").cast("double")).as("dup_word_frac"),
          (col("top_c").cast("double") / col("n_words").cast("double"))
            .as("top_word_frac"),
          coalesce(col("n_bigrams"), lit(0L)).cast("long").as("n_bigrams"),
          coalesce(col("top_bc").cast("double") / col("n_bigrams").cast("double"),
            lit(0.0)).as("top_bigram_frac"))
        .orderBy("doc_id")
    }),

    // Deterministic stratified sampling: top-N documents per language by
    // content-hash order. The hash IS the random order (stable across runs,
    // engines, and cluster layouts — re-sampling a 100 TB corpus yields the
    // same subset), and per-stratum top-N is one lang-keyed window — on a
    // cluster each stratum sorts locally after a single shuffle.
    "text_stratified_sample" -> ((s, d) =>
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          GraftFunctions.rolling_hash(col("text")).as("fp"))
        .withColumn("rk", row_number().over(
          Window.partitionBy(col("lang")).orderBy(col("fp"), col("doc_id"))))
        .filter(col("rk") <= StratumN)
        .select(col("doc_id"), col("lang"), col("rk").cast("long").as("rk"))
        .orderBy("lang", "rk")),

    // Sequence packing (GPT-pretraining style): documents are concatenated
    // in a deterministic order and cut into fixed token windows; each doc
    // reports its token offset range and the first/last window it lands in.
    // Packing is per hash-bucket so a cluster packs 64 independent streams:
    // one bucket-keyed shuffle + a running-sum window, no sequential driver
    // pass — the packed corpus layout a 100 TB pretraining run feeds from.
    "text_pack" -> ((s, d) => {
      val w = Window.partitionBy("bucket").orderBy("doc_id")
      t(s, d, "documents")
        .select(col("doc_id"),
          size(toks).cast("long").as("n_tokens"),
          pmod(col("doc_id"), lit(PackBuckets)).cast("long").as("bucket"))
        .withColumn("end_off", sum("n_tokens").over(w))
        .select(col("doc_id"), col("bucket"), col("n_tokens"),
          (col("end_off") - col("n_tokens")).as("start_off"),
          floor((col("end_off") - col("n_tokens")) / PackWindow).cast("long").as("first_seq"),
          floor((col("end_off") - 1) / PackWindow).cast("long").as("last_seq"))
        .orderBy("doc_id")
    }),

    // Mixture construction: assemble a training mix by sampling each domain
    // (lang) up to a per-domain TOKEN budget — the knob pretraining recipes
    // tune ("N tokens of code, M of web, ..."). Selection order within a
    // domain is the content-hash order (deterministic across runs, engines,
    // and cluster layouts, like text_stratified_sample); a document is kept
    // while its domain's budget is not yet exhausted BEFORE it (the crossing
    // document is kept, so every non-empty domain contributes). One lang-keyed
    // shuffle + a running-sum window — at 100 TB each domain accumulates
    // independently after a single exchange.
    "text_mix_sample" -> ((s, d) => {
      val w = Window.partitionBy(col("lang"))
        .orderBy(col("fp"), col("doc_id"))
      val budget = when(col("lang") === "en", lit(MixBudgetEn))
        .otherwise(lit(MixBudgetOther))
      t(s, d, "documents")
        .select(col("doc_id"), col("lang"),
          size(toks).cast("long").as("n_tokens"),
          GraftFunctions.rolling_hash(col("text")).as("fp"))
        .withColumn("cum_tokens", sum("n_tokens").over(w))
        .filter(col("cum_tokens") - col("n_tokens") < budget)
        .select(col("doc_id"), col("lang"), col("n_tokens"), col("cum_tokens"))
        .orderBy("lang", "cum_tokens")
    }),

    // Unicode NFC canonicalization (custom codegen expression — Spark has no
    // built-in normalizer). The synthetic corpus is pure ASCII, so a
    // deterministic unicode suffix is injected on BOTH engines: even docs get
    // the DECOMPOSED encoding (e + U+0301 ...), odd docs the COMPOSED one —
    // after NFC both spell "résumé naïve", so n_before differs by parity
    // while norm_md5 agrees across the pair. Pure map stage; the ASCII fast
    // path in ExprUtil.nfc means production web text pays one byte scan.
    "text_normalize" -> ((s, d) => {
      val marker = when(col("doc_id") % 2 === 0,
        lit(" résumé naïve")).otherwise(lit(" résumé naïve"))
      val injected = concat(col("text"), marker)
      val normed = GraftFunctions.nfc_normalize(injected)
      t(s, d, "documents")
        .select(col("doc_id"),
          length(injected).cast("long").as("n_before"),
          length(normed).cast("long").as("n_after"),
          md5(normed.cast("binary")).as("norm_md5"))
        .orderBy("doc_id")
    }),

    // Segment-level boilerplate removal (the line-dedup stage of CCNet/
    // RefinedWeb-style pipelines, expressed over this corpus's fixed 4-token
    // segments since the synthetic docs have no newlines): a segment that
    // appears SegDropFreq+ times corpus-wide is boilerplate and is cut from
    // every document; survivors are reassembled in order. Two keyed shuffles
    // — segment-string frequency count (full map-side combine) then a doc_id
    // regroup — plus the freq lookup join riding the same segment exchange;
    // exactly the shape a 100 TB line-dedup runs (shard by line, count,
    // re-shard by doc). No driver-side state: the boilerplate set stays
    // distributed (it is corpus-sized in the worst case, so broadcasting it
    // would be the scale bug).
    "text_seg_dedup" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val nSegs = expr(s"(size(split(text, ' ')) + ${SegWidth - 1}) div $SegWidth")
      val segs = docs
        .select(col("doc_id"), split(col("text"), " ").as("w"))
        .select(col("doc_id"), posexplode(expr(
          s"""transform(sequence(0, cast((size(w) + ${SegWidth - 1}) div $SegWidth as int) - 1),
              i -> array_join(slice(w, i*$SegWidth + 1, $SegWidth), ' '))"""))
          .as(Seq("i", "seg")))
      val freq = segs.groupBy("seg").agg(count(lit(1)).as("c"))
      val kept = segs.join(freq, Seq("seg")).filter(col("c") < SegDropFreq)
      val agg = kept.groupBy("doc_id")
        .agg(count(lit(1)).as("n_kept"),
          array_join(transform(array_sort(collect_list(struct(col("i"), col("seg")))),
            x => x.getField("seg")), " ").as("cleaned"))
      docs.select(col("doc_id"), nSegs.cast("long").as("n_segs"))
        .join(agg, Seq("doc_id"), "left")
        .select(col("doc_id"), col("n_segs"),
          coalesce(col("n_kept"), lit(0L)).cast("long").as("n_kept"),
          md5(coalesce(col("cleaned"), lit("")).cast("binary")).as("cleaned_md5"))
        .orderBy("doc_id")
    }),

    // Token-id encoding (tokenizer-prep): rank the top-V corpus vocabulary by
    // (freq desc, token) and rewrite every document as its id sequence, with
    // out-of-vocabulary tokens mapped to -1. The vocab is bounded (top-V) so
    // it broadcasts — the corpus never shuffles for the lookup, only for the
    // doc_id reassembly regroup; even a production 100k-token vocab is a few
    // MB on the broadcast path. V=16 here so the OOV branch genuinely fires
    // on this corpus's ~31-token vocabulary.
    "text_token_ids" -> ((s, d) => {
      val docs = t(s, d, "documents")
      val tok = docs.select(col("doc_id"),
        posexplode(split(col("text"), " ")).as(Seq("i", "tk")))
      val w = Window.orderBy(col("c").desc, col("tk"))
      val vocab = tok.groupBy("tk").agg(count(lit(1)).as("c"))
        .orderBy(col("c").desc, col("tk")).limit(VocabV)
        .withColumn("id", (row_number().over(w) - 1).cast("long"))
        .select("tk", "id")
      tok.join(broadcast(vocab), Seq("tk"), "left")
        .select(col("doc_id"), col("i"), coalesce(col("id"), lit(-1L)).as("id"))
        .groupBy("doc_id")
        .agg(count(lit(1)).as("n_tokens"),
          sum(when(col("id") === -1L, 1L).otherwise(0L)).as("n_oov"),
          array_join(transform(array_sort(collect_list(struct(col("i"), col("id")))),
            x => x.getField("id").cast("string")), " ").as("ids"))
        .select(col("doc_id"), col("n_tokens").cast("long").as("n_tokens"),
          col("n_oov").cast("long").as("n_oov"), col("ids"))
        .orderBy("doc_id")
    }),

    // Corpus vocabulary: global token frequencies, top 100. One shuffle on
    // the token key with full map-side partial aggregation — the exploded
    // token stream never moves, only (token, partial-count) pairs do; the
    // top-k is a bounded heap (TakeOrderedAndProject), not a global sort.
    "text_vocab" -> ((s, d) =>
      t(s, d, "documents")
        .select(explode(toks).as("token"))
        .groupBy("token").agg(count(lit(1)).as("freq"))
        .orderBy(col("freq").desc, col("token"))
        .limit(100))
  )

  // PII patterns — the subset of regex syntax Java and RE2 (DuckDB) agree on
  private[graft] val PiiEmail = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  private[graft] val PiiPhone = "\\+[0-9][0-9 -]{7,}[0-9]"
  private[graft] val PiiIp = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  private[graft] val ChunkSize = 64
  private[graft] val ChunkStride = 48
  private[graft] val ChunkOverlap = ChunkSize - ChunkStride

  private[graft] val StratumN = 20

  // text_seg_dedup: segment width (tokens) and the corpus-wide frequency at
  // which a segment counts as boilerplate and is dropped
  private[graft] val SegWidth = 4
  private[graft] val SegDropFreq = 2

  // text_token_ids: vocabulary size (small so OOV fires on this corpus)
  private[graft] val VocabV = 16

  private[graft] val PackWindow = 2048
  private[graft] val PackBuckets = 64

  // per-domain token budgets for text_mix_sample (en-heavy mix)
  private[graft] val MixBudgetEn = 4000L
  private[graft] val MixBudgetOther = 1000L

  private[graft] val langProfiles: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "is"),
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "es" -> Seq("el", "los", "las", "y", "es"),
    "zh" -> Seq("的", "是", "了", "在", "和"))

  /** (doc_id, pred_lang) for any frame with doc_id + text columns. */
  private[graft] def langid(docs: DataFrame): DataFrame = {
    val scored = langProfiles.foldLeft(docs.select(col("doc_id"), toks.as("w"))) {
      case (df, (lang, markers)) =>
        df.withColumn(s"score_$lang",
          size(filter(col("w"), x => x.isin(markers: _*))))
    }
    // argmax with fixed priority order (earlier profile wins ties)
    val maxScore = greatest(langProfiles.map(p => col(s"score_${p._1}")): _*)
    val pred = langProfiles.reverse.foldLeft(lit("und")) { case (acc, (lang, _)) =>
      when(col(s"score_$lang") === maxScore && maxScore > 0, lang).otherwise(acc)
    }
    scored.select(col("doc_id"), pred.as("pred_lang"))
  }

  val oracle: Map[String, String] = Map(
    "text_quality" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars,
                CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and'))) AS BIGINT) AS n_stop,
                CAST(len(list_filter(string_split(text, ' '), x -> x IN ('the','a','of','and'))) AS DOUBLE) /
                  CAST(len(string_split(text, ' ')) AS DOUBLE) AS stop_ratio,
                CAST(list_sum(list_transform(string_split(text, ' '), x -> length(x))) AS DOUBLE) /
                  CAST(len(string_split(text, ' ')) AS DOUBLE) AS avg_tok_len
         FROM documents ORDER BY doc_id""",
    "text_tokens" ->
      """SELECT doc_id, CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
                CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
                CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE) /
                  CAST(len(string_split(text, ' ')) AS DOUBLE) AS ttr
         FROM documents ORDER BY doc_id""",
    "text_fp_md5" ->
      """SELECT doc_id, md5(lower(regexp_replace(text, '\s+', ' ', 'g'))) AS fp
         FROM documents ORDER BY doc_id""",
    "text_fp_rolling" ->
      s"""SELECT doc_id, fp FROM (${graft.util.OracleSql.rollingFp("lower(text)")}) t
          ORDER BY doc_id""",
    "text_split_assign" ->
      s"""SELECT doc_id, fp % 100 AS bucket,
                 CASE WHEN fp % 100 < 80 THEN 'train'
                      WHEN fp % 100 < 90 THEN 'val'
                      ELSE 'test' END AS split
          FROM (${graft.util.OracleSql.rollingFp("text")}) t
          ORDER BY doc_id""",
    "text_decontam" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                    WHERE len(string_split(text, ' ')) >= 3),
              g0 AS (SELECT doc_id, unnest(generate_series(1, len(w) - 2)) AS i, w FROM w),
              grams AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM g0),
              bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
         SELECT doc_id, count(*) AS n_shared
         FROM grams WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM bench)
         GROUP BY doc_id ORDER BY doc_id""",
    // Same exact semantics as text_decontam: the bloom stage is a lossless
    // pre-filter (false positives removed by the verify join), so the
    // oracle SQL is identical.
    "text_decontam_bloom" ->
      """WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents
                    WHERE len(string_split(text, ' ')) >= 3),
              g0 AS (SELECT doc_id, unnest(generate_series(1, len(w) - 2)) AS i, w FROM w),
              grams AS (SELECT DISTINCT doc_id, w[i] || ' ' || w[i+1] || ' ' || w[i+2] AS g FROM g0),
              bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 97 = 0)
         SELECT doc_id, count(*) AS n_shared
         FROM grams WHERE doc_id % 97 <> 0 AND g IN (SELECT g FROM bench)
         GROUP BY doc_id ORDER BY doc_id""",
    "text_pii_scrub" -> {
      val injected = "text || ' contact user' || CAST(doc_id % 1000 AS VARCHAR)" +
        " || '@example.com or +1 555-01' || printf('%02d', doc_id % 100)" +
        " || ' from 10.0.' || CAST(doc_id % 256 AS VARCHAR) || '.' || CAST(doc_id % 97 AS VARCHAR)"
      s"""WITH inj AS (SELECT doc_id, $injected AS it FROM documents)
         SELECT doc_id,
                CAST(len(regexp_extract_all(it, '$PiiEmail')) AS BIGINT) AS n_email,
                CAST(len(regexp_extract_all(it, '$PiiPhone')) AS BIGINT) AS n_phone,
                md5(regexp_replace(regexp_replace(regexp_replace(it,
                  '$PiiEmail', '<EMAIL>', 'g'), '$PiiPhone', '<PHONE>', 'g'),
                  '$PiiIp', '<IP>', 'g')) AS scrubbed_md5
         FROM inj ORDER BY doc_id"""
    },
    "text_chunk" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              st AS (SELECT doc_id, w,
                            unnest(generate_series(1, greatest(len(w) - $ChunkOverlap, 1), $ChunkStride)) AS start
                     FROM w)
         SELECT doc_id, CAST((start - 1) // $ChunkStride AS BIGINT) AS chunk_id,
                array_to_string(list_slice(w, start, start + ${ChunkSize - 1}), ' ') AS chunk_text,
                CAST(least(len(w) - start + 1, $ChunkSize) AS BIGINT) AS n_chunk_tokens
         FROM st ORDER BY doc_id, chunk_id""",
    "text_repetition" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(text, ' ')) AS w FROM documents),
              wc AS (SELECT doc_id, w, count(*) AS c FROM w GROUP BY 1, 2),
              wa AS (SELECT doc_id, sum(c) AS n_words, count(*) AS n_distinct, max(c) AS top_c
                     FROM wc GROUP BY 1),
              ws AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents
                     WHERE len(string_split(text, ' ')) >= 2),
              b0 AS (SELECT doc_id, unnest(generate_series(1, len(ws) - 1)) AS i, ws FROM ws),
              bg AS (SELECT doc_id, ws[i] || ' ' || ws[i+1] AS b FROM b0),
              bc AS (SELECT doc_id, b, count(*) AS c FROM bg GROUP BY 1, 2),
              ba AS (SELECT doc_id, sum(c) AS n_bigrams, max(c) AS top_bc FROM bc GROUP BY 1)
         SELECT wa.doc_id,
                CAST(wa.n_words AS BIGINT) AS n_words,
                CAST(wa.n_distinct AS BIGINT) AS n_distinct,
                CAST(wa.n_words - wa.n_distinct AS DOUBLE) / CAST(wa.n_words AS DOUBLE) AS dup_word_frac,
                CAST(wa.top_c AS DOUBLE) / CAST(wa.n_words AS DOUBLE) AS top_word_frac,
                CAST(coalesce(ba.n_bigrams, 0) AS BIGINT) AS n_bigrams,
                coalesce(CAST(ba.top_bc AS DOUBLE) / CAST(ba.n_bigrams AS DOUBLE), 0.0) AS top_bigram_frac
         FROM wa LEFT JOIN ba ON wa.doc_id = ba.doc_id
         ORDER BY wa.doc_id""",
    "text_stratified_sample" ->
      s"""SELECT doc_id, lang, CAST(rk AS BIGINT) AS rk FROM (
            SELECT d.doc_id, d.lang,
                   row_number() OVER (PARTITION BY d.lang ORDER BY t.fp, d.doc_id) AS rk
            FROM documents d JOIN (${graft.util.OracleSql.rollingFp("text")}) t
              ON d.doc_id = t.doc_id) r
          WHERE rk <= $StratumN ORDER BY lang, rk""",
    "text_pack" ->
      s"""WITH d AS (SELECT doc_id, len(string_split(text, ' ')) AS n_tokens,
                            doc_id % $PackBuckets AS bucket FROM documents),
              o AS (SELECT doc_id, bucket, n_tokens,
                           sum(n_tokens) OVER (PARTITION BY bucket ORDER BY doc_id) AS end_off
                    FROM d)
         SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
                CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(end_off - n_tokens AS BIGINT) AS start_off,
                CAST((end_off - n_tokens) // $PackWindow AS BIGINT) AS first_seq,
                CAST((end_off - 1) // $PackWindow AS BIGINT) AS last_seq
         FROM o ORDER BY doc_id""",
    "text_mix_sample" ->
      s"""WITH d AS (SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens, fp
                     FROM documents JOIN (${graft.util.OracleSql.rollingFp("text")}) t
                     USING (doc_id)),
              o AS (SELECT doc_id, lang, n_tokens,
                           sum(n_tokens) OVER (PARTITION BY lang ORDER BY fp, doc_id
                             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum_tokens
                    FROM d)
          SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens,
                 CAST(cum_tokens AS BIGINT) AS cum_tokens
          FROM o
          WHERE cum_tokens - n_tokens <
                CASE WHEN lang = 'en' THEN $MixBudgetEn ELSE $MixBudgetOther END
          ORDER BY lang, cum_tokens""",
    // chr(769)/chr(776) = the combining acute/diaeresis of the decomposed
    // (even-doc) marker; the odd-doc branch embeds the composed codepoints.
    "text_normalize" ->
      """WITH inj AS (SELECT doc_id,
                text || CASE WHEN doc_id % 2 = 0
                  THEN ' re' || chr(769) || 'sume' || chr(769) || ' nai' || chr(776) || 've'
                  ELSE ' résumé naïve' END AS it
              FROM documents)
         SELECT doc_id, CAST(length(it) AS BIGINT) AS n_before,
                CAST(length(nfc_normalize(it)) AS BIGINT) AS n_after,
                md5(nfc_normalize(it)) AS norm_md5
         FROM inj ORDER BY doc_id""",
    "text_seg_dedup" ->
      s"""WITH w AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
              s0 AS (SELECT doc_id, w,
                            unnest(generate_series(1, (len(w) + ${SegWidth - 1}) // $SegWidth)) AS i
                     FROM w),
              segs AS (SELECT doc_id, i,
                              array_to_string(list_slice(w, (i-1)*$SegWidth + 1, i*$SegWidth), ' ') AS seg
                       FROM s0),
              freq AS (SELECT seg, count(*) AS c FROM segs GROUP BY seg),
              kept AS (SELECT s.doc_id, s.i, s.seg
                       FROM segs s JOIN freq f USING (seg) WHERE f.c < $SegDropFreq),
              agg AS (SELECT doc_id, count(*) AS n_kept,
                             string_agg(seg, ' ' ORDER BY i) AS cleaned
                      FROM kept GROUP BY doc_id)
         SELECT w.doc_id, CAST((len(w.w) + ${SegWidth - 1}) // $SegWidth AS BIGINT) AS n_segs,
                CAST(coalesce(a.n_kept, 0) AS BIGINT) AS n_kept,
                md5(coalesce(a.cleaned, '')) AS cleaned_md5
         FROM w LEFT JOIN agg a ON w.doc_id = a.doc_id ORDER BY w.doc_id""",
    "text_token_ids" ->
      s"""WITH tok AS (SELECT doc_id, i, w[i] AS tk
                       FROM (SELECT doc_id, string_split(text, ' ') AS w,
                                    unnest(generate_series(1, len(string_split(text, ' ')))) AS i
                             FROM documents)),
              freq AS (SELECT tk, count(*) AS c FROM tok GROUP BY tk),
              vocab AS (SELECT tk, row_number() OVER (ORDER BY c DESC, tk) - 1 AS id
                        FROM freq ORDER BY c DESC, tk LIMIT $VocabV),
              enc AS (SELECT t.doc_id, t.i, coalesce(v.id, -1) AS id
                      FROM tok t LEFT JOIN vocab v ON t.tk = v.tk)
         SELECT doc_id, count(*) AS n_tokens,
                CAST(sum(CASE WHEN id = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_oov,
                string_agg(id, ' ' ORDER BY i) AS ids
         FROM enc GROUP BY doc_id ORDER BY doc_id""",
    "text_vocab" ->
      """SELECT token, count(*) AS freq
         FROM (SELECT unnest(string_split(text, ' ')) AS token FROM documents) t
         GROUP BY token ORDER BY freq DESC, token LIMIT 100""",
    "text_langid" -> {
      val profiles = langProfiles
      val scores = profiles.map { case (lang, ms) =>
        s"len(list_filter(string_split(text, ' '), x -> x IN (${ms.map("'" + _ + "'").mkString(",")}))) AS s_$lang"
      }.mkString(",\n                ")
      val mx = s"greatest(${profiles.map("s_" + _._1).mkString(", ")})"
      val cases = profiles.map { case (lang, _) =>
        s"WHEN s_$lang = $mx THEN '$lang'"
      }.mkString("\n                ")
      s"""WITH sc AS (SELECT doc_id,
                $scores
           FROM documents)
         SELECT doc_id, CASE WHEN $mx = 0 THEN 'und'
                $cases
                END AS pred_lang
         FROM sc ORDER BY doc_id"""
    }
  )
}
