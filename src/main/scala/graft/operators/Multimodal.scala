package graft.operators

import graft.{OpQuery, Tables}
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column pipeline: image/audio/video treated as opaque
  * `binary` payloads with a typed metadata struct, processed by typed
  * `Dataset.mapPartitions` stages (the Scala analog of `mapInPandas` —
  * per-partition batch processing with explicit row shapes).
  *
  * The container has no image/audio codecs, so the DECODE step is a
  * clearly-marked deterministic STUB (`fakeDecode`): it consumes the real
  * bytes and emits a fixed-width feature vector (byte histogram +
  * moments). Everything around the stub — binary column handling, typed
  * metadata, partition-batched UDF shape, frame slicing, explode
  * fan-out — is real and oracle-checked where byte arithmetic allows.
  *
  * Scale notes: payloads stay columnar binary end-to-end (no
  * base64/string round-trips); per-partition processing is streaming
  * (iterator→iterator, no partition materialization), so a 100 TB asset
  * corpus processes at parquet-scan speed with memory bounded by one
  * payload. Frame explode multiplies rows, not bytes-per-row, keeping
  * shuffle records small.
  */
object Multimodal {

  /** Typed asset row: opaque payload + decoded-container metadata. */
  case class Asset(
      doc_id: Long, source: String, format: String,
      width: Int, height: Int, n_frames: Int, payload: Array[Byte])

  case class Features(
      doc_id: Long, n_bytes: Long, byte_mean: Double, h0: Long, h1: Long,
      h2: Long, h3: Long)

  case class Frame(doc_id: Long, frame_idx: Int, frame_len: Int)

  case class Resized(
      doc_id: Long, width: Int, height: Int, new_width: Int,
      new_height: Int, new_len: Int)

  /** Synthesize the asset table from `documents`: payload = UTF-8 bytes
    * of the text (deterministic stand-in for media bytes), metadata
    * derived arithmetically from doc_id so the oracle can reproduce it. */
  def assets(s: SparkSession, d: String): Dataset[Asset] = {
    import s.implicits._
    Tables.load(s, d, "documents")
      .select(
        col("doc_id"), col("source"),
        element_at(array(lit("png"), lit("jpeg"), lit("mp4")),
          (col("doc_id") % 3 + 1).cast("int")).as("format"),
        (lit(64) + (col("doc_id") % 8) * 16).cast("int").as("width"),
        (lit(64) + (col("doc_id") % 5) * 16).cast("int").as("height"),
        when(col("doc_id") % 3 === 2, (col("doc_id") % 8 + 1).cast("int"))
          .otherwise(lit(1)).as("n_frames"),
        col("text").cast("binary").as("payload"))
      .as[Asset]
  }

  /** STUB decode: stands in for a real image/audio decoder (codec libs
    * not present). Deterministic features of the raw bytes: total size,
    * mean byte value, 4-bucket histogram of the high 2 bits. */
  def fakeDecode(a: Asset): Features = {
    val h = new Array[Long](4)
    var sum = 0L
    var i = 0
    while (i < a.payload.length) {
      val b = a.payload(i) & 0xff
      h(b >> 6) += 1
      sum += b
      i += 1
    }
    val n = a.payload.length
    Features(a.doc_id, n.toLong,
      if (n == 0) 0.0 else sum.toDouble / n, h(0), h(1), h(2), h(3))
  }

  /** Split a payload into n contiguous frames (last frame takes the
    * remainder) and keep every `step`-th frame. */
  def sampleFrames(a: Asset, step: Int): Seq[(Int, Array[Byte])] = {
    val n = a.n_frames
    val base = a.payload.length / n
    val rem = a.payload.length % n
    (0 until n by step).map { i =>
      val start = i * base
      val end = if (i == n - 1) a.payload.length else start + base
      (i, java.util.Arrays.copyOfRange(a.payload, start, end))
    }
  }

  /** STUB resize: halves both dimensions; "pixel" payload shrinks by
    * keeping every other byte (deterministic, codec-free). */
  def fakeResize(a: Asset): (Int, Int, Array[Byte]) = {
    val out = new Array[Byte]((a.payload.length + 1) / 2)
    var i = 0
    while (i < out.length) { out(i) = a.payload(2 * i); i += 1 }
    (math.max(a.width / 2, 1), math.max(a.height / 2, 1), out)
  }

  // ------------------------------------------------------------------

  // Metadata plumbing: binary payload + arithmetic metadata, fully
  // reproducible by the oracle from documents.text.
  private val assetMetadata = OpQuery(
    "mm_asset_metadata",
    Some("""
      SELECT doc_id, source,
             CASE CAST(doc_id % 3 AS INT) WHEN 0 THEN 'png' WHEN 1 THEN 'jpeg' ELSE 'mp4' END AS format,
             CAST(64 + (doc_id % 8) * 16 AS INT) AS width,
             CAST(64 + (doc_id % 5) * 16 AS INT) AS height,
             CAST(CASE WHEN doc_id % 3 = 2 THEN doc_id % 8 + 1 ELSE 1 END AS INT) AS n_frames,
             CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes
      FROM documents
      ORDER BY doc_id
    """),
    (s, d) => assets(s, d).toDF()
      .select(col("doc_id"), col("source"), col("format"), col("width"),
        col("height"), col("n_frames"),
        length(col("payload")).cast("long").as("n_bytes"))
      .orderBy("doc_id"))

  // Decode stub through mapPartitions: iterator-in/iterator-out batch
  // shape (no partition materialization). The fixture text is pure ASCII,
  // so payload bytes equal codepoints and the full feature vector
  // (size, mean, high-2-bit histogram) reproduces in the oracle via
  // exact integer arithmetic + one double division.
  private val decodeFeatures = OpQuery(
    "mm_decode_features",
    Some("""
      WITH ch AS (
        SELECT doc_id,
               list_transform(list_filter(string_split(text, ''), c -> c <> ''),
                              c -> unicode(c)) AS cs
        FROM documents)
      SELECT doc_id,
             CAST(len(cs) AS BIGINT) AS n_bytes,
             CASE WHEN len(cs) = 0 THEN 0.0
                  ELSE CAST(list_sum(cs) AS DOUBLE) / len(cs) END AS byte_mean,
             CAST(len(list_filter(cs, x -> x // 64 = 0)) AS BIGINT) AS h0,
             CAST(len(list_filter(cs, x -> x // 64 = 1)) AS BIGINT) AS h1,
             CAST(len(list_filter(cs, x -> x // 64 = 2)) AS BIGINT) AS h2,
             CAST(len(list_filter(cs, x -> x // 64 = 3)) AS BIGINT) AS h3
      FROM ch
      ORDER BY doc_id
    """),
    (s, d) => {
      import s.implicits._
      assets(s, d)
        .mapPartitions(_.map(fakeDecode))
        .toDF()
        .orderBy("doc_id")
    })

  // Frame sampling of "video" assets: every 2nd frame, real byte
  // slicing; per-frame lengths reproduce in the oracle by arithmetic.
  private val frameSample = OpQuery(
    "mm_frame_sample",
    Some("""
      WITH v AS (
        SELECT doc_id,
               CAST(doc_id % 8 + 1 AS INT) AS n_frames,
               octet_length(encode(text)) AS len
        FROM documents WHERE doc_id % 3 = 2)
      SELECT doc_id, CAST(i AS INT) AS frame_idx,
             CAST(CASE WHEN i = n_frames - 1 THEN len - (n_frames - 1) * (len // n_frames)
                       ELSE len // n_frames END AS INT) AS frame_len
      FROM v, LATERAL unnest(generate_series(0, n_frames - 1, 2)) AS t(i)
      ORDER BY doc_id, frame_idx
    """),
    (s, d) => {
      import s.implicits._
      assets(s, d)
        .filter(col("format") === "mp4")
        .flatMap(a => sampleFrames(a, step = 2).map {
          case (i, bytes) => Frame(a.doc_id, i, bytes.length)
        })
        .toDF()
        .orderBy("doc_id", "frame_idx")
    })

  // Resize stub: halved dims + every-other-byte payload; output lengths
  // follow ceil(len/2), reproducible in the oracle.
  private val resize = OpQuery(
    "mm_resize",
    Some("""
      SELECT doc_id,
             CAST(64 + (doc_id % 8) * 16 AS INT) AS width,
             CAST(64 + (doc_id % 5) * 16 AS INT) AS height,
             CAST(greatest((64 + (doc_id % 8) * 16) // 2, 1) AS INT) AS new_width,
             CAST(greatest((64 + (doc_id % 5) * 16) // 2, 1) AS INT) AS new_height,
             CAST((octet_length(encode(text)) + 1) // 2 AS INT) AS new_len
      FROM documents
      ORDER BY doc_id
    """),
    (s, d) => {
      import s.implicits._
      assets(s, d)
        .mapPartitions(_.map { a =>
          val (w, h, bytes) = fakeResize(a)
          Resized(a.doc_id, a.width, a.height, w, h, bytes.length)
        })
        .toDF()
        .orderBy("doc_id")
    })

  val defs: Seq[OpQuery] = Seq(assetMetadata, decodeFeatures, frameSample, resize)
}
