package graft

import org.apache.spark.sql.functions._
import graft.functions.{ExprUtil, GraftFunctions}

class FunctionsSpec extends SparkSpec {

  test("erf matches known values through the Column API") {
    import spark.implicits._
    val got = Seq(0.0, 1.0, -1.0).toDF("x")
      .select(GraftFunctions.erf(col("x")).as("e")).collect().map(_.getDouble(0))
    assert(math.abs(got(0)) < 1e-15)
    assert(math.abs(got(1) - 0.8427007929497149) < 1e-12)
    assert(math.abs(got(2) + 0.8427007929497149) < 1e-12)
  }

  test("erf registered for SQL") {
    GraftFunctions.register(spark)
    val v = spark.sql("SELECT erf(1.0) AS e").collect().head.getDouble(0)
    assert(math.abs(v - 0.8427007929497149) < 1e-12)
  }

  test("splitmix64 finalizer: pinned vectors, codegen/interpreted parity") {
    // sm64(0) is the first output of the splitmix64 stream from seed 0
    // (0xE220A8397B1DCDAF — Steele et al.'s published reference value);
    // sm64(1)/sm64(2) pin the finalizer on further inputs (cross-checked
    // against the independent HUGEINT SQL implementation in
    // OracleSql.sm64Ctes — minhash/simhash hash-matching depends on the
    // two implementations agreeing bit-for-bit).
    import graft.functions.ExprUtil.sm64
    assert(sm64(0L) == java.lang.Long.parseUnsignedLong("E220A8397B1DCDAF", 16))
    assert(sm64(1L) == java.lang.Long.parseUnsignedLong("910A2DEC89025CC1", 16))
    assert(sm64(2L) == java.lang.Long.parseUnsignedLong("975835DE1C9756CE", 16))
    // codegen and interpreted paths agree through the Column API
    val df = spark.range(3).toDF("x")
      .select(graft.functions.GraftFunctions.splitmix64(org.apache.spark.sql.functions.col("x")).as("h"))
    assert(df.collect().map(_.getLong(0)).toSeq ==
      Seq(sm64(0L), sm64(1L), sm64(2L)))
  }

  test("rolling_hash: deterministic, content-sensitive, non-negative") {
    import org.apache.spark.unsafe.types.UTF8String
    val h1 = ExprUtil.rollingHash(UTF8String.fromString("hello world"))
    val h2 = ExprUtil.rollingHash(UTF8String.fromString("hello world"))
    val h3 = ExprUtil.rollingHash(UTF8String.fromString("hello worle"))
    assert(h1 == h2 && h1 != h3 && h1 >= 0)
  }

  test("rolling_hash computes the documented h=(h*131+b) mod 2^61-1 recurrence") {
    import org.apache.spark.unsafe.types.UTF8String
    val M = BigInt(2).pow(61) - 1
    for (s <- Seq("", "a", "hello world", "ü™✓ unicode", "x" * 500)) {
      val ref = UTF8String.fromString(s).getBytes.foldLeft(BigInt(0)) { (h, b) =>
        (h * 131 + (b & 0xff)) mod M
      }
      assert(BigInt(ExprUtil.rollingHash(UTF8String.fromString(s))) == ref, s"for '$s'")
    }
  }

  test("rolling_hash: NULL text -> NULL fp, empty text -> 0 (oracle parity)") {
    import spark.implicits._
    val df = Seq(Some("abc"), None, Some("")).toDF("s")
      .select(GraftFunctions.rolling_hash(col("s")).as("fp")).collect()
    assert(!df(0).isNullAt(0))
    assert(df(1).isNullAt(0), "NULL in must be NULL out (OracleSql mirrors this)")
    assert(df(2).getLong(0) == 0L, "empty string hashes to 0 on both sides")
  }

  test("langid: multilingual profiles and the en>de>fr>es>zh tie order") {
    import spark.implicits._
    val docs = Seq(
      (1L, "the cat of the house is big"),          // en
      (2L, "der hund und die katze ist da"),        // de
      (3L, "le chat et la maison est grande"),      // fr
      (4L, "el perro y los gatos es grande"),       // es
      (5L, "的 是 了 在 和"),                        // zh
      (6L, "xyzzy plugh qwfp"),                     // no markers -> und
      (7L, "the der"),                              // en/de tie -> en (priority)
      (8L, "und ist le la"),                        // de(2) vs fr(2) tie -> de
      (9L, "y es el 的 是 了")                       // es(3) vs zh(3) tie -> es
    ).toDF("doc_id", "text")
    val got = graft.data.TextAnalysis.langid(docs)
      .orderBy("doc_id").collect().map(_.getString(1)).toSeq
    assert(got == Seq("en", "de", "fr", "es", "zh", "und", "en", "de", "es"))
  }

  test("random_in_range: half-open bounds, full coverage, SQL registration") {
    import spark.implicits._
    val n = 10000
    val df = (1 to n).toDF("i")
      .select(GraftFunctions.random_in_range(lit(10), lit(20)).as("r"))
    val vals = df.groupBy("r").count().collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(vals.keySet.min == 10L && vals.keySet.max == 19L, s"range must be [10, 20): $vals")
    assert(vals.size == 10, "all 10 values of the half-open range must occur")
    // uniformity sanity: each value within 3σ of n/10 (σ≈30 for p=0.1)
    vals.values.foreach(c => assert(math.abs(c - n / 10) < 150, s"skewed: $vals"))
    val sql = spark.sql(s"SELECT random_in_range(0, 3) AS r FROM range(1000)")
      .groupBy("r").count().collect().map(_.getLong(0)).sorted
    assert(sql.toSeq == Seq(0L, 1L, 2L), "SQL-registered function, [0, 3)")
  }

  test("rolling_hash agrees between interpreted and codegen paths") {
    import spark.implicits._
    val df = Seq("a", "spark native engine", "ü™✓ unicode").toDF("s")
    val viaExpr = df.select(GraftFunctions.rolling_hash(col("s"))).collect().map(_.getLong(0))
    val direct = Seq("a", "spark native engine", "ü™✓ unicode")
      .map(s => ExprUtil.rollingHash(org.apache.spark.unsafe.types.UTF8String.fromString(s)))
    assert(viaExpr.toSeq == direct)
  }

  test("sign_bits equals the CASE-WHEN band construction it replaced") {
    import spark.implicits._
    // the exact formulation Dedup.signBandKeys used before SignBits; the
    // equivalence here is what keeps the closed-form DuckDB oracle valid
    val rnd = new scala.util.Random(7)
    val vecs = Seq.fill(50)(Array.fill(64)((rnd.nextGaussian() - 0.3).toFloat)) :+
      Array.fill(64)(0f) :+ Array.fill(64)(Float.NaN)
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    val whenBands = (0 until 4).map { j =>
      (0 until 16).map { r =>
        when(element_at(col("embedding"), j * 16 + r + 1) >= 0f, lit(1 << r))
          .otherwise(lit(0))
      }.reduce(_ + _).cast("long")
    }
    val bits = GraftFunctions.sign_bits(col("embedding"))
    val bands = (0 until 4).map(j =>
      shiftrightunsigned(bits, 16 * j).bitwiseAND(lit(0xFFFFL)))
    val mismatches = df.select(
      (0 until 4).map(j => (whenBands(j) =!= bands(j)).as(s"m$j")): _*)
      .collect().count(r => (0 until 4).exists(r.getBoolean))
    assert(mismatches == 0)
  }

  test("sign_bits leaves the bit UNSET for NULL array elements") {
    // CASE-WHEN parity: `WHEN null >= 0` is null → ELSE 0, so the replaced
    // formulation never set the bit for a null slot; getFloat on a null slot
    // is undefined, so the eval path needs an explicit isNullAt guard
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val v: Array[java.lang.Float] = Array.tabulate(64)(i =>
      if (i % 7 == 0) null
      else java.lang.Float.valueOf((i - 30).toFloat))
    val schema = StructType(Seq(StructField("embedding",
      ArrayType(FloatType, containsNull = true))))
    val df = spark.createDataFrame(
      java.util.Arrays.asList(Row(v.toSeq)), schema)
    val expected = (0 until 64).foldLeft(0L) { (b, i) =>
      if (v(i) != null && !(v(i).floatValue() < 0f)) b | (1L << i) else b
    }
    val got = df.select(GraftFunctions.sign_bits(col("embedding")))
      .collect().head.getLong(0)
    assert(got == expected)
  }
}
