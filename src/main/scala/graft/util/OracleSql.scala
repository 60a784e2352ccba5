package graft.util

/** DuckDB-side SQL builders for oracles of engine-computed values that a
  * plain builtin can't reproduce.
  *
  * [[rollingFp]] replays the custom `rolling_hash` Catalyst expression
  * (graft.functions.ExprUtil.rollingHash — h = (h·131 + byte) mod 2^61−1 over
  * UTF-8 bytes) in pure SQL: bytes come from `hex(encode(...))`, the modular
  * powers of 131 from a tiny recursive CTE (one row per byte position), and
  * the polynomial is summed in HUGEINT (each term < 2^69, so even 10^9-byte
  * documents stay far below the 2^127 overflow line). This upgrades the
  * rolling-hash queries from rows-only checks to full hash-compared oracles.
  */
object OracleSql {
  private val Mod = "2305843009213693951" // 2^61 - 1

  // ------------------------------------------------------------------
  // mod-2^64 arithmetic in DuckDB (HUGEINT representation in [0, 2^64)):
  // the building blocks that let plain SQL replay graft's splitmix64-based
  // hash family bit-exactly (ExprUtil.sm64). DuckDB integer ops error on
  // overflow (like Spark ANSI), so wrapping semantics are spelled out:
  // multiply splits the left operand at 2^32 (each partial product stays
  // under 2^97, far below HUGEINT's 2^127 line), xor round-trips through
  // BIGINT two's complement (bit pattern is representation-invariant),
  // and logical right shift is integer division in the unsigned domain.
  private val M64 = "18446744073709551616" // 2^64
  private val Sign = "9223372036854775808" // 2^63

  /** unsigned [0,2^64) HUGEINT → signed BIGINT two's complement. */
  private def toS(u: String): String =
    s"(CASE WHEN $u >= $Sign THEN CAST($u - $M64 AS BIGINT) ELSE CAST($u AS BIGINT) END)"

  /** signed BIGINT → unsigned [0,2^64) HUGEINT. */
  private def toU(sb: String): String =
    s"(CASE WHEN $sb < 0 THEN CAST($sb AS HUGEINT) + $M64 ELSE CAST($sb AS HUGEINT) END)"

  private def xor64(x: String, y: String): String =
    toU(s"xor(${toS(x)}, ${toS(y)})")

  /** (a * c) mod 2^64 for a in [0,2^64), c a < 2^64 literal. */
  private def mulmod(a: String, c: String): String =
    s"((($a % 4294967296) * $c + ((($a // 4294967296) * ($c % 4294967296)) % 4294967296) * 4294967296) % $M64)"

  /** Six MATERIALIZED CTEs evaluating sm64(`zExpr`) stage by stage. One
    * stage per CTE is load-bearing: DuckDB inlines plain CTEs and lateral
    * aliases textually, and since xor64/mulmod reference their operand up
    * to 8 times, a chained inline expansion grows 8^k-fold — three chained
    * sm64 rounds planned for MINUTES at 500 rows before this split.
    * MATERIALIZED pins each step to one evaluation.
    *
    * @param from  CTE to read from
    * @param z     input expression over `from`'s columns
    * @param carry columns to thread through unchanged
    * @param p     unique CTE/alias prefix; output CTE is `${p}6` with the
    *              result in column `out` */
  private def sm64Ctes(from: String, z: String, carry: Seq[String],
      p: String, out: String): String = {
    val c = if (carry.isEmpty) "" else carry.mkString("", ", ", ", ")
    s"""${p}1 AS MATERIALIZED (SELECT $c(($z + 11400714819323198485) % $M64) AS ${p}v FROM $from),
       |${p}2 AS MATERIALIZED (SELECT $c${xor64(s"${p}v", s"(${p}v // 1073741824)")} AS ${p}v FROM ${p}1),
       |${p}3 AS MATERIALIZED (SELECT $c${mulmod(s"${p}v", "13787848793156543929")} AS ${p}v FROM ${p}2),
       |${p}4 AS MATERIALIZED (SELECT $c${xor64(s"${p}v", s"(${p}v // 134217728)")} AS ${p}v FROM ${p}3),
       |${p}5 AS MATERIALIZED (SELECT $c${mulmod(s"${p}v", "10723151780598845931")} AS ${p}v FROM ${p}4),
       |${p}6 AS MATERIALIZED (SELECT $c${xor64(s"${p}v", s"(${p}v // 2147483648)")} AS $out FROM ${p}5)""".stripMargin
  }

  /** rotate-left by constant k (1..31) of a SIGNED BIGINT, in pure native
    * 64-bit ops — no HUGEINT. DuckDB's HUGEINT % and // are full 128-bit
    * divisions (~µs each); the first cut of the minhash oracle computed
    * its 32 rotations that way and spent 131 of its 154 s in that one
    * projection. Native form: low 63-k bits shifted left (never overflows
    * — DuckDB << errors past the sign bit), wrapped top k bits, and the
    * result's sign bit OR'd in from bit 63-k (bitwise | doesn't
    * range-check). */
  private def rotlS(x: String, k: Int): String = {
    require(k >= 1 && k <= 31)
    val lowMask = (java.math.BigInteger.ONE.shiftLeft(63 - k)).subtract(java.math.BigInteger.ONE)
    val hiMask = (1L << k) - 1
    s"(((($x & $lowMask) << $k) | (($x >> ${64 - k}) & $hiMask)) | (CASE WHEN (($x >> ${63 - k}) & 1) = 1 THEN (-9223372036854775807 - 1) ELSE 0 END))"
  }

  /** CTE chain producing `grams(doc_id, gh)` — the df-capped closed-form
    * hashed shingle set, mirroring Dedup.hashedCapped bit-exactly:
    * per-word 61-bit rolling hash (same polynomial as [[rollingFp]], on the
    * DISTINCT vocabulary), then gh = sm64(sm64(sm64(h1) ^ h2) ^ h3) over
    * each 3-word window, per-doc DISTINCT, df-cap ≤ 64 docs per gram.
    * gh is HUGEINT in [0,2^64) (Spark's signed long, reinterpreted). */
  private def hashedGramsCtes: String =
    s"""pw(k, p) AS (
       |  SELECT 0, CAST(1 AS HUGEINT)
       |  UNION ALL
       |  SELECT k + 1, (p * 131) % $Mod FROM pw
       |  WHERE k < (SELECT max(octet_length(encode(wd)))
       |             FROM (SELECT DISTINCT unnest(string_split(text, ' ')) AS wd
       |                   FROM documents WHERE text IS NOT NULL))
       |),
       |w AS MATERIALIZED (SELECT doc_id, string_split(text, ' ') AS w FROM documents
       |      WHERE len(string_split(text, ' ')) >= 3),
       |vocab AS (SELECT DISTINCT unnest(w) AS wd FROM w),
       |vb AS (
       |  SELECT wd, i,
       |         CAST(16 * (strpos('0123456789abcdef', substr(h, 2*i-1, 1)) - 1)
       |            + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1) AS HUGEINT) AS byte,
       |         len
       |  FROM (SELECT wd, lower(hex(encode(wd))) AS h, octet_length(encode(wd)) AS len
       |        FROM vocab),
       |       unnest(generate_series(1, len)) AS g(i)
       |),
       |vh0 AS (
       |  SELECT vb.wd, sum(vb.byte * pw.p) AS acc
       |  FROM vb JOIN pw ON pw.k = vb.len - vb.i
       |  GROUP BY vb.wd
       |),
       |vh AS MATERIALIZED (SELECT v.wd, CAST(coalesce(h.acc % $Mod, 0) AS HUGEINT) AS h
       |       FROM vocab v LEFT JOIN vh0 h ON h.wd = v.wd),
       |tri AS (SELECT doc_id, w[i] AS w1, w[i+1] AS w2, w[i+2] AS w3
       |        FROM w, unnest(generate_series(1, len(w) - 2)) AS g(i)),
       |trih AS MATERIALIZED (SELECT t.doc_id, a.h AS ha, b.h AS hb, c.h AS hc
       |         FROM tri t JOIN vh a ON a.wd = t.w1
       |         JOIN vh b ON b.wd = t.w2 JOIN vh c ON c.wd = t.w3),
       |trid AS MATERIALIZED (SELECT DISTINCT ha, hb, hc FROM trih),
       |${sm64Ctes("trid", "ha", Seq("ha", "hb", "hc"), "sa", "sa6")},
       |${sm64Ctes("sa6", xor64("sa6", "hb"), Seq("ha", "hb", "hc"), "sb", "sb6")},
       |${sm64Ctes("sb6", xor64("sb6", "hc"), Seq("ha", "hb", "hc"), "sc", "gh")},
       |grams0 AS MATERIALIZED (SELECT DISTINCT t.doc_id, m.gh FROM trih t
       |          JOIN sc6 m ON m.ha = t.ha AND m.hb = t.hb AND m.hc = t.hc),
       |grams AS MATERIALIZED (SELECT doc_id, gh FROM grams0
       |          WHERE gh IN (SELECT gh FROM grams0 GROUP BY gh HAVING count(*) <= 64))""".stripMargin

  /** Full DuckDB oracle for dedup_minhash_lsh: replays the engine's
    * closed-form signature family — h1 = gh, h2 = sm64(gh),
    * h_k = h1 XOR rotl(h2, k) (signed min per doc) — then 16×2 banding by
    * TUPLE equality (the engine's xxhash64 bucket keys are equality-only;
    * a key collision can only add a candidate, P ≈ n²/2⁶⁵), the same ≤64
    * bucket cap, and exact-jaccard verification at ≥ 0.5 over the hashed
    * gram sets. */
  def minhashLshOracle: String = {
    // signed-domain h_k: one HUGEINT→BIGINT conversion per input column
    // (msig), then every rotation/xor/min is a native 64-bit op.
    val mins = (0 until 32).map { k =>
      val rot = if (k == 0) "h2s" else rotlS("h2s", k)
      s"min(xor(ghs, $rot)) AS h$k"
    }.mkString(",\n       ")
    val bandSelects = (0 until 16).map { b =>
      s"SELECT doc_id, $b AS bnd, h${2 * b} AS k0, h${2 * b + 1} AS k1 FROM mh"
    }.mkString("\n       UNION ALL ")
    s"""WITH RECURSIVE
       |$hashedGramsCtes,
       |${sm64Ctes("grams", "gh", Seq("doc_id", "gh"), "m", "h2")},
       |msig AS MATERIALIZED (SELECT doc_id, ${toS("gh")} AS ghs, ${toS("h2")} AS h2s FROM m6),
       |mh AS MATERIALIZED (
       |  SELECT doc_id,
       |       $mins
       |  FROM msig GROUP BY doc_id
       |),
       |bands AS MATERIALIZED (
       |       $bandSelects
       |),
       |bsz AS (SELECT bnd, k0, k1 FROM bands
       |        GROUP BY 1, 2, 3 HAVING count(*) BETWEEN 2 AND 64),
       |cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |         FROM bands a
       |         JOIN bsz s ON s.bnd = a.bnd AND s.k0 = a.k0 AND s.k1 = a.k1
       |         JOIN bands b ON b.bnd = a.bnd AND b.k0 = a.k0 AND b.k1 = a.k1
       |              AND a.doc_id < b.doc_id),
       |sizes AS (SELECT doc_id, count(*) AS sz FROM grams GROUP BY 1),
       |ic AS (SELECT c.a, c.b, count(*) AS ic
       |       FROM cand c
       |       JOIN grams ga ON ga.doc_id = c.a
       |       JOIN grams gb ON gb.doc_id = c.b AND gb.gh = ga.gh
       |       GROUP BY 1, 2)
       |SELECT ic.a, ic.b,
       |       CAST(ic.ic AS DOUBLE) / CAST(sa.sz + sb.sz - ic.ic AS DOUBLE) AS jac
       |FROM ic JOIN sizes sa ON ic.a = sa.doc_id JOIN sizes sb ON ic.b = sb.doc_id
       |WHERE CAST(ic.ic AS DOUBLE) / CAST(sa.sz + sb.sz - ic.ic AS DOUBLE) >= 0.5
       |ORDER BY a, b""".stripMargin
  }

  /** Full DuckDB oracle for dedup_simhash: per-bit majority signature over
    * the closed-form gram hashes, Manku 3-of-6-block candidates by tuple
    * equality (blocks (shift, width) mirror Dedup.simhashBlocks), same ≤64
    * bucket cap, hamming ≤ 3 via bit_count(xor). */
  def simhashOracle: String = {
    val blocks = Seq((0, 11), (11, 11), (22, 10), (32, 11), (43, 11), (54, 10))
    // all per-gram and per-doc bit work in the signed BIGINT domain (one
    // HUGEINT→BIGINT conversion in gs): arithmetic >> then &-mask equals a
    // logical-shift extract, and the 64-way | chain assembles the signature
    // without overflow checks (bitwise | is range-free) — same reasoning
    // as rotlS, HUGEINT // division was the whole cost of the first cut.
    val bitSums = (0 until 64).map { i =>
      s"sum(CASE WHEN ((ghs >> $i) & 1) = 1 THEN 1 ELSE -1 END) AS b$i"
    }.mkString(",\n       ")
    val sigOr = (0 until 64).map { i =>
      val bit = if (i == 63) "(-9223372036854775807 - 1)" else s"${1L << i}"
      s"(CASE WHEN b$i > 0 THEN CAST($bit AS BIGINT) ELSE 0 END)"
    }.mkString(" | ")
    def blockVal(bi: Int): String = {
      val (sh, wd) = blocks(bi)
      s"((us >> $sh) & ${(1L << wd) - 1})"
    }
    val comboSelects = blocks.indices.combinations(3).toSeq.zipWithIndex.map {
      case (c, ci) =>
        s"SELECT doc_id, $ci AS ci, ${blockVal(c(0))} AS b1, ${blockVal(c(1))} AS b2, ${blockVal(c(2))} AS b3 FROM sig"
    }.mkString("\n       UNION ALL ")
    s"""WITH RECURSIVE
       |$hashedGramsCtes,
       |gs AS MATERIALIZED (SELECT doc_id, ${toS("gh")} AS ghs FROM grams),
       |bs AS MATERIALIZED (
       |  SELECT doc_id,
       |       $bitSums
       |  FROM gs GROUP BY doc_id
       |),
       |sig AS MATERIALIZED (SELECT doc_id, $sigOr AS us FROM bs),
       |bands AS MATERIALIZED (
       |       $comboSelects
       |),
       |bsz AS (SELECT ci, b1, b2, b3 FROM bands
       |        GROUP BY 1, 2, 3, 4 HAVING count(*) BETWEEN 2 AND 64),
       |cand AS (SELECT DISTINCT a.doc_id AS a, b.doc_id AS b
       |         FROM bands a
       |         JOIN bsz s ON s.ci = a.ci AND s.b1 = a.b1 AND s.b2 = a.b2 AND s.b3 = a.b3
       |         JOIN bands b ON b.ci = a.ci AND b.b1 = a.b1 AND b.b2 = a.b2 AND b.b3 = a.b3
       |              AND a.doc_id < b.doc_id)
       |SELECT c.a, c.b,
       |       CAST(bit_count(xor(sa.us, sb.us)) AS BIGINT) AS hamming
       |FROM cand c JOIN sig sa ON sa.doc_id = c.a JOIN sig sb ON sb.doc_id = c.b
       |WHERE bit_count(xor(sa.us, sb.us)) <= 3
       |ORDER BY a, b""".stripMargin
  }

  /** SELECT doc_id, fp over `documents`, where fp is the 61-bit polynomial
    * rolling hash of `textExpr` (a SQL expression over documents' columns).
    * Embeddable as a subquery: `FROM (<rollingFp(...)>) t`.
    * NULL text → NULL fp (matching the Catalyst expression's null-intolerant
    * eval); empty text → 0 on both sides. */
  def rollingFp(textExpr: String): String =
    s"""WITH RECURSIVE pw(k, p) AS (
       |  SELECT 0, CAST(1 AS HUGEINT)
       |  UNION ALL
       |  SELECT k + 1, (p * 131) % $Mod FROM pw
       |  WHERE k < (SELECT max(octet_length(encode($textExpr))) FROM documents)
       |),
       |hx AS (
       |  SELECT doc_id, lower(hex(encode($textExpr))) AS h,
       |         octet_length(encode($textExpr)) AS len
       |  FROM documents
       |),
       |b AS (
       |  SELECT doc_id, i,
       |         CAST(16 * (strpos('0123456789abcdef', substr(h, 2*i-1, 1)) - 1)
       |            + (strpos('0123456789abcdef', substr(h, 2*i, 1)) - 1) AS HUGEINT) AS byte,
       |         len
       |  FROM hx, unnest(generate_series(1, len)) AS g(i)
       |),
       |s AS (
       |  SELECT b.doc_id, sum(b.byte * pw.p) AS acc
       |  FROM b JOIN pw ON pw.k = b.len - b.i
       |  GROUP BY b.doc_id
       |)
       |SELECT d.doc_id,
       |       CASE WHEN $textExpr IS NULL THEN NULL
       |            ELSE CAST(coalesce(s.acc % $Mod, 0) AS BIGINT) END AS fp
       |FROM documents d LEFT JOIN s ON d.doc_id = s.doc_id""".stripMargin
}
