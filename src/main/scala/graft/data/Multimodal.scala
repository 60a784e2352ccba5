package graft.data

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import graft.Tables

/** Multimodal column plumbing: media as opaque binary columns + typed metadata,
  * with decode/feature-extract as a partition-wise batch operator.
  *
  * The decode step is a clearly-marked STUB (no image/audio libs in this
  * container): it derives deterministic fake dimensions from the byte stream.
  * Everything around it is the real Spark shape a production pipeline needs:
  * binary column in, per-partition batched iteration (one decoder init per
  * partition, not per row — the same reason mapInPandas batches), typed struct
  * out, explodable frame samples. Swap [[decodeStub]] for a real codec and the
  * plan is unchanged.
  */
object Multimodal {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.load(s, d, n)
  type Q = (SparkSession, String) => DataFrame

  case class MediaIn(doc_id: Long, blob: Array[Byte])
  case class MediaMeta(doc_id: Long, n_bytes: Long, width: Long, height: Long, n_frames: Long)

  /** STUB decoder — deterministic fake metadata derived from the bytes.
    * Real implementation would parse the container header here; [[PngCodec]]
    * is that real implementation for the PNG container (mm_png below). */
  private def decodeStub(in: MediaIn): MediaMeta = {
    val n = in.blob.length.toLong
    MediaMeta(in.doc_id, n, n % 640, (n * 7) % 480, n % 16 + 1)
  }

  case class PngRow(doc_id: Long, width: Long, height: Long,
      bit_depth: Long, color_type: Long, n_chunks: Long)

  case class WavRow(doc_id: Long, channels: Long, sample_rate: Long,
      bits: Long, n_samples: Long, duration_ms: Long, n_chunks: Long)

  /** Binary column → decoded metadata via partition-wise batches. */
  def decodeMeta(spark: SparkSession, media: DataFrame): Dataset[MediaMeta] = {
    import spark.implicits._
    media.select(col("doc_id"), col("blob")).as[MediaIn]
      .mapPartitions { it =>
        // per-partition decoder init would go here (e.g. native codec handle)
        it.map(decodeStub)
      }
  }

  val queries: Map[String, Q] = Map(
    // Binary ingestion + metadata extraction (oracle reproduces the stub's
    // arithmetic from octet_length, so the full plumbing is hash-checked).
    "mm_meta" -> ((s, d) => {
      val media = t(s, d, "documents")
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
      decodeMeta(s, media).toDF().orderBy("doc_id")
    }),

    // Frame sampling: explode each media item into its (fake) frames with a
    // deterministic per-frame feature.
    "mm_frames" -> ((s, d) => {
      val media = t(s, d, "documents")
        .filter(col("doc_id") < 100)
        .select(col("doc_id"), col("text").cast("binary").as("blob"))
      decodeMeta(s, media).toDF()
        .select(col("doc_id"), col("n_bytes"),
          explode(sequence(lit(0L), col("n_frames") - 1)).as("frame_idx"))
        .select(col("doc_id"), col("frame_idx"),
          ((col("n_bytes") * 31 + col("frame_idx")) % 997).as("feature"))
        .orderBy("doc_id", "frame_idx")
    }),

    // Real-format decode: each doc gets a complete valid PNG (dimensions are
    // a closed form of doc_id), encoded and then PARSED back through the real
    // container grammar — signature, chunk walk, IHDR CRC — inside executor
    // tasks. The oracle recomputes the dimensions from the same closed form,
    // so a parser that misreads the header hash-mismatches.
    "mm_png" -> ((s, d) => {
      import s.implicits._
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val png = PngCodec.encode((id % 64 + 1).toInt, (id * 7 % 48 + 1).toInt, id.toInt)
            val m = PngCodec.decode(png)
            PngRow(id, m.width, m.height, m.bitDepth, m.colorType, m.nChunks)
          }
        }
        .toDF().orderBy("doc_id")
    }),

    // Audio twin of mm_png: each doc gets a complete valid PCM WAV
    // (params are a closed form of doc_id), encoded then PARSED back
    // through the real RIFF chunk walk inside executor tasks. The oracle
    // recomputes the metadata from the same closed form, so a parser that
    // misreads fmt/data hash-mismatches.
    "mm_wav" -> ((s, d) => {
      import s.implicits._
      val rates = Array(8000, 16000, 44100)
      t(s, d, "documents").filter(col("doc_id") < 200)
        .select(col("doc_id")).as[Long]
        .mapPartitions { it =>
          it.map { id =>
            val ch = (id % 2 + 1).toInt
            val rate = rates((id % 3).toInt)
            val n = (id * 13 % 2000 + 100).toInt
            val wav = WavCodec.encode(ch, rate, n, id.toInt)
            val m = WavCodec.decode(wav)
            WavRow(id, m.channels, m.sampleRate, m.bitsPerSample,
              m.nSamples, m.durationMs, m.nChunks)
          }
        }
        .toDF().orderBy("doc_id")
    })
  )

  val oracle: Map[String, String] = Map(
    "mm_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
                CAST(octet_length(encode(text)) % 640 AS BIGINT) AS width,
                CAST(octet_length(encode(text)) * 7 % 480 AS BIGINT) AS height,
                CAST(octet_length(encode(text)) % 16 + 1 AS BIGINT) AS n_frames
         FROM documents ORDER BY doc_id""",
    "mm_frames" ->
      """WITH m AS (SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
                    FROM documents WHERE doc_id < 100),
              f AS (SELECT doc_id, n_bytes,
                           unnest(generate_series(0, n_bytes % 16)) AS frame_idx
                    FROM m)
         SELECT doc_id, frame_idx, (n_bytes * 31 + frame_idx) % 997 AS feature
         FROM f ORDER BY doc_id, frame_idx""",
    "mm_png" ->
      """SELECT doc_id, CAST(doc_id % 64 + 1 AS BIGINT) AS width,
                CAST(doc_id * 7 % 48 + 1 AS BIGINT) AS height,
                CAST(8 AS BIGINT) AS bit_depth, CAST(0 AS BIGINT) AS color_type,
                CAST(3 AS BIGINT) AS n_chunks
         FROM documents WHERE doc_id < 200 ORDER BY doc_id""",
    "mm_wav" ->
      """WITH p AS (
           SELECT doc_id,
                  CAST(doc_id % 2 + 1 AS BIGINT) AS channels,
                  CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                       ELSE 44100 END AS BIGINT) AS sample_rate,
                  CAST(doc_id * 13 % 2000 + 100 AS BIGINT) AS n_samples
           FROM documents WHERE doc_id < 200)
         SELECT doc_id, channels, sample_rate, CAST(16 AS BIGINT) AS bits,
                n_samples, n_samples * 1000 // sample_rate AS duration_ms,
                CAST(2 AS BIGINT) AS n_chunks
         FROM p ORDER BY doc_id"""
  )
}
