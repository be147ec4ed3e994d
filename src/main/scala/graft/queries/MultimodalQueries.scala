package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.CrossEngine._
import graft.sources.Tables

/** Multimodal-column operators: opaque binary payloads carried alongside
  * typed metadata, joined to the embedding corpus.
  *
  * The decode path (q30) is a REAL binary-format codec: each document is
  * rendered as a genuine 24-bit uncompressed BMP (BITMAPFILEHEADER +
  * BITMAPINFOHEADER + bottom-up stride-padded pixel rows — no external
  * codec library needed), and the decoder recovers every field by
  * parsing the little-endian headers and walking the padded rows. The
  * oracle restates the generation arithmetic independently, so a decoder
  * that misreads any header offset, endianness, or the 4-byte row
  * stride fails the gate.
  */
object MultimodalQueries {

  /** Render `text` as a real 24bpp BMP: width 4-8 from the byte count,
    * height 3-6 from the first byte, pixel bytes = text bytes cycled
    * row-major (bottom-up, BMP's native order), rows padded to 4-byte
    * stride. Runs executor-side; `text` must be non-empty. */
  private[queries] def bmpEncode(text: Array[Byte]): Array[Byte] = {
    val n = text.length
    val w = 4 + n % 5
    val h = 3 + (text(0) & 0xff) % 4
    val stride = ((3 * w + 3) / 4) * 4
    val size = 54 + stride * h
    val buf = java.nio.ByteBuffer.allocate(size)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put('B'.toByte).put('M'.toByte)
    buf.putInt(size) // file size
    buf.putShort(0: Short).putShort(0: Short) // reserved
    buf.putInt(54) // pixel-data offset
    buf.putInt(40) // BITMAPINFOHEADER size
    buf.putInt(w)
    buf.putInt(h)
    buf.putShort(1: Short) // color planes
    buf.putShort(24: Short) // bits per pixel
    buf.putInt(0) // BI_RGB, uncompressed
    buf.putInt(stride * h) // image size
    buf.putInt(2835).putInt(2835) // 72 DPI
    buf.putInt(0).putInt(0) // palette (none)
    var j = 0
    var row = 0
    while (row < h) {
      var i = 0
      while (i < 3 * w) { buf.put(text(j % n)); j += 1; i += 1 }
      var p = 3 * w
      while (p < stride) { buf.put(0: Byte); p += 1 }
      row += 1
    }
    buf.array()
  }

  /** Parse a 24bpp BMP from its bytes alone: validate the magic, read
    * the little-endian header fields, and sum pixel bytes by walking
    * the bottom-up rows at the declared data offset with the 4-byte
    * row stride (padding excluded). Returns
    * (doc_id, width, height, bpp, data_offset, file_size, pixel_sum). */
  private[queries] def bmpDecode(id: Long, b: Array[Byte])
      : (Long, Long, Long, Long, Long, Long, Long) = {
    def u16(o: Int): Int = (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
    def u32(o: Int): Long =
      (b(o) & 0xffL) | ((b(o + 1) & 0xffL) << 8) |
        ((b(o + 2) & 0xffL) << 16) | ((b(o + 3) & 0xffL) << 24)
    if (b.length < 54 || b(0) != 'B'.toByte || b(1) != 'M'.toByte)
      throw new IllegalArgumentException(s"doc $id: not a BMP payload")
    val fileSize = u32(2)
    val off = u32(10)
    val w = u32(18) // signed i32 in the spec; always positive here
    val h = u32(22)
    val bpp = u16(28)
    if (bpp != 24)
      throw new IllegalArgumentException(s"doc $id: expected 24bpp, got $bpp")
    val stride = ((3 * w + 3) / 4) * 4
    // bounds-check the declared geometry BEFORE walking: a payload
    // truncated below its declared size must be rejected with a typed
    // error, not an ArrayIndexOutOfBounds from an executor task
    val need = off + h * stride
    if (need > b.length)
      throw new IllegalArgumentException(
        s"doc $id: truncated BMP — pixel walk needs $need bytes, have ${b.length}")
    var sum = 0L
    var row = 0L
    while (row < h) {
      val base = (off + row * stride).toInt
      var i = 0
      while (i < 3 * w) { sum += b(base + i) & 0xff; i += 1 }
      row += 1
    }
    (id, w, h, bpp.toLong, off, fileSize, sum)
  }

  /** The partition-parallel typed decode over a binary BMP column —
    * the operator shape (per-partition batch iteration, typed output
    * schema, no driver round-trip) a production decoder runs with. */
  def decoded(src: org.apache.spark.sql.Dataset[(Long, Array[Byte])])
      : org.apache.spark.sql.DataFrame = {
    import src.sparkSession.implicits._
    src.mapPartitions(_.map { case (id, bytes) => bmpDecode(id, bytes) })
      .toDF("doc_id", "width", "height", "bpp", "data_offset",
        "file_size", "pixel_sum")
  }

  val all: Seq[QueryDef] = Seq(
    // ------------------------------------------------------------------
    // Binary payload + metadata join: documents.text re-encoded as the
    // opaque binary column (UTF-8), joined 1:1 to its embedding row.
    QueryDef(
      "q29_multimodal_join",
      "binary payload column with typed metadata joined to the embedding corpus (doc_id = vec_id); byte length + first byte from the blob, L2 norm from the vector",
      s"""SELECT doc_id, lang, label,
         |  CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
         |  CAST(ascii(substr(text, 1, 1)) AS BIGINT) AS first_byte,
         |  sqrt(${sqlDotFold("v", "v")}) AS l2_norm
         |FROM documents
         |JOIN (SELECT vec_id, embedding::DOUBLE[] AS v, label FROM embeddings)
         |  ON vec_id = doc_id""".stripMargin) { (s, dir) =>
      val d = Tables.documents(s, dir)
        .select(col("doc_id"), col("lang"),
          col("text").cast("binary").as("payload"), col("text"))
      val e = Tables.embeddings(s, dir)
        .select(col("vec_id"), col("embedding").cast("array<double>").as("v"),
          col("label"))
      d.join(e, d("doc_id") === e("vec_id"))
        .select(col("doc_id"), col("lang"), col("label"),
          length(col("payload")).cast(LongType).as("n_bytes"),
          ascii(substring(col("text"), 1, 1)).cast(LongType).as("first_byte"),
          sqrt(dotFold(col("v"), col("v"))).as("l2_norm"))
    },

    // ------------------------------------------------------------------
    // Partition-parallel typed decode of a REAL binary image format.
    // Each document renders as a genuine 24bpp BMP (bmpEncode, executor-
    // side), and the decoder recovers width/height/bpp/offset/file-size/
    // pixel-sum by actually parsing the bytes: the little-endian multi-
    // byte header fields, the declared pixel-data offset, and the 4-byte
    // row stride with bottom-up rows. The mapPartitions operator isn't
    // ANSI SQL, but the generation arithmetic IS — the oracle restates
    // width/height from the formulas, file_size from 54 + stride*h, and
    // pixel_sum as the fold over the text bytes cycled through 3*w*h
    // pixel positions. A decoder that misreads endianness, the data
    // offset, or the stride padding fails the hash compare.
    QueryDef(
      "q30_multimodal_decode",
      "typed mapPartitions decode of real 24bpp BMP payloads (LE header parse, stride-padded bottom-up rows) -> width/height/bpp/data_offset/file_size/pixel_sum; oracle restates the header arithmetic",
      // documents.text is ASCII by construction, so byte j (0-based in
      // the Scala encode) == char j+1 (1-based in DuckDB substr).
      """SELECT doc_id,
        |  CAST(width AS BIGINT) AS width,
        |  CAST(height AS BIGINT) AS height,
        |  CAST(24 AS BIGINT) AS bpp,
        |  CAST(54 AS BIGINT) AS data_offset,
        |  CAST(54 + ((3 * width + 3) // 4) * 4 * height AS BIGINT) AS file_size,
        |  CAST(list_reduce(list_prepend(0::BIGINT,
        |      list_transform(range(0, 3 * width * height),
        |        j -> ascii(substr(text, CAST(j % n AS INTEGER) + 1, 1)))),
        |      (acc, b) -> acc + b) AS BIGINT) AS pixel_sum
        |FROM (SELECT doc_id, text, octet_length(encode(text)) AS n,
        |        4 + octet_length(encode(text)) % 5 AS width,
        |        3 + ascii(substr(text, 1, 1)) % 4 AS height
        |      FROM documents
        |      WHERE octet_length(encode(text)) > 0)""".stripMargin) { (s, dir) =>
      import s.implicits._
      val payloads = Tables.documents(s, dir)
        .filter(length(col("text")) > 0)
        .select(col("doc_id"), col("text"))
        .as[(Long, String)]
        .map { case (id, t) => (id, bmpEncode(t.getBytes("UTF-8"))) }
      decoded(payloads)
    },

    // ------------------------------------------------------------------
    // Frame sampling: the one-row -> many-rows multimodal shape (a video
    // payload yields every k-th frame). The payload is chunked into
    // fixed-size "frames" and every 4th is emitted with its offset and a
    // frame checksum — the flatMap batch shape (explode cardinality,
    // per-frame typed output) is exactly what a real frame sampler
    // needs; only the decode body is fake. SQL-expressible (frame
    // boundaries are pure arithmetic on the UTF-8 bytes), so this one
    // IS oracle-checked, unlike q30.
    QueryDef(
      "q38_frame_sample",
      "frame sampling over binary payloads: chunk into 64-byte frames, emit every 4th with offset + rolling checksum — one-row->many-rows multimodal shape, fully oracle-checked",
      s"""SELECT doc_id, frame_idx,
         |  CAST(frame_idx * 64 AS BIGINT) AS byte_offset,
         |  list_reduce(list_prepend(0::BIGINT,
         |    list_transform(range(1 + frame_idx*64, 1 + least((frame_idx+1)*64, octet_length(encode(text)))),
         |      i -> ascii(substr(text, i, 1)))),
         |    (acc, b) -> (acc * 131 + b) % 1000003) AS frame_hash
         |FROM (SELECT doc_id, text,
         |        unnest(range(0, CAST(ceil(octet_length(encode(text)) / 64.0) AS BIGINT))) AS frame_idx
         |      FROM documents)
         |WHERE frame_idx % 4 = 0""".stripMargin) { (s, dir) =>
      // documents.text is ASCII by construction, so byte i == char i on
      // both engines (DuckDB substr is char-based, Spark substring too).
      val nFrames = ceil(octet_length(col("text").cast("binary")) / 64.0).cast(LongType)
      Tables.documents(s, dir)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0L), nFrames - 1)).as("frame_idx"))
        .filter(col("frame_idx") % 4 === 0)
        .select(col("doc_id"), col("frame_idx"),
          (col("frame_idx") * 64).cast(LongType).as("byte_offset"),
          // native codegen'd byte loop (ByteExprs) — same arithmetic,
          // same end-clamping as the original HOF chain
          // aggregate(transform(sequence(...), ascii∘substr), ...);
          // ByteExprsSpec holds the HOF form as the executable spec
          byteFold(col("text").cast("binary"),
            lit(1L) + col("frame_idx") * 64, lit(64L),
            131L, 1000003L).as("frame_hash"))
    },

    // ------------------------------------------------------------------
    // Audio-style OVERLAPPING windowing: 96-byte windows with a 48-byte
    // hop (50% overlap — the standard STFT framing shape), each window
    // yielding an integer energy (sum of sample bytes — order-free, so
    // the parallel aggregate is exact) and a peak. Differs from q38's
    // frame sampling in the two ways a real audio featurizer differs
    // from a video frame sampler: windows OVERLAP (each byte lands in
    // up to 2 windows) and the per-window reduction is an energy
    // statistic, not a checksum. The explode multiplies rows ~n/48x
    // BEFORE a stateless projection — no shuffle at all; at 100 TB the
    // plan is embarrassingly parallel and bounded by scan bandwidth.
    QueryDef(
      "q68_audio",
      "overlapping audio-style windowing: 96-byte windows, 48-byte hop (50% overlap), per-window integer energy + peak byte; stateless explode+project, zero shuffle",
      """SELECT doc_id, win_idx,
        |  CAST(win_idx * 48 AS BIGINT) AS byte_offset,
        |  list_reduce(list_prepend(0::BIGINT,
        |    list_transform(range(1 + win_idx*48, 1 + win_idx*48 + 96),
        |      i -> ascii(substr(text, CAST(i AS INTEGER), 1)))),
        |    (acc, b) -> acc + b) AS energy,
        |  list_max(
        |    list_transform(range(1 + win_idx*48, 1 + win_idx*48 + 96),
        |      i -> ascii(substr(text, CAST(i AS INTEGER), 1)))) AS peak
        |FROM (SELECT doc_id, text,
        |        unnest(range(0, (octet_length(encode(text)) - 96) // 48 + 1))
        |          AS win_idx
        |      FROM documents
        |      WHERE octet_length(encode(text)) >= 96)""".stripMargin) { (s, dir) =>
      // documents.text is ASCII (byte == char on both engines); only
      // FULL windows are emitted, so every window is exactly 96 bytes.
      // energy/peak are native codegen'd byte loops (ByteExprs): the
      // sum is byteFold with mult=1 and a mod no 96-byte sum can reach,
      // so (acc*1 + b) % mod degenerates to the plain sum.
      val n = octet_length(col("text").cast("binary")).cast(LongType)
      val winStart = lit(1L) + col("win_idx") * 48
      Tables.documents(s, dir)
        .filter(n >= 96)
        .select(col("doc_id"), col("text"),
          explode(sequence(lit(0L), (n - 96).divide(48).cast(LongType))).as("win_idx"))
        .select(col("doc_id"), col("win_idx"),
          (col("win_idx") * 48).cast(LongType).as("byte_offset"),
          byteFold(col("text").cast("binary"), winStart, lit(96L),
            1L, Long.MaxValue).as("energy"),
          byteMax(col("text").cast("binary"), winStart, lit(96L)).as("peak"))
    })
}
