package graft.queries

import org.apache.spark.sql.functions._

import graft.SparkSpec
import graft.sources.Tables

/** The real-BMP multimodal decode (q30's mapPartitions core): the
  * encoder writes genuine 24bpp BMP bytes, the decoder recovers every
  * field from the bytes alone. These tests pin the codec contract
  * independently of the DuckDB gate: header fields are internally
  * consistent, the pixel walk honors stride padding, and a corrupted
  * payload is rejected rather than misread. */
class MultimodalSpec extends SparkSpec {

  private def payloads = {
    import spark.implicits._
    Tables.documents(spark, sfDir)
      .filter(length(col("text")) > 0)
      .select(col("doc_id"), col("text"))
      .as[(Long, String)]
      .map { case (id, t) => (id, MultimodalQueries.bmpEncode(t.getBytes("UTF-8"))) }
  }

  test("decode recovers internally consistent BMP header fields") {
    val d = MultimodalQueries.decoded(payloads)
    assert(d.count() == payloads.count())
    assert(d.filter(col("width") < 4 || col("width") > 8).count() == 0)
    assert(d.filter(col("height") < 3 || col("height") > 6).count() == 0)
    assert(d.filter(col("bpp") =!= 24 || col("data_offset") =!= 54).count() == 0)
    // file_size must equal 54 + stride*h with the 4-byte row stride
    val stride = (col("width") * 3 + 3).divide(4).cast("long") * 4
    assert(d.filter(col("file_size") =!= lit(54) + stride * col("height"))
      .count() == 0)
  }

  test("pixel sum equals the text bytes cycled through 3*w*h positions") {
    // independent restatement of the encode arithmetic, computed
    // driver-side from the raw text — catches a decoder that reads
    // padding bytes or starts rows at the wrong stride
    val rows = MultimodalQueries.decoded(payloads)
      .join(Tables.documents(spark, sfDir).select(col("doc_id"), col("text")),
        "doc_id")
      .select("doc_id", "width", "height", "pixel_sum", "text")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val t = r.getAs[String]("text").getBytes("UTF-8")
      val need = 3 * r.getAs[Long]("width").toInt * r.getAs[Long]("height").toInt
      val expected = (0 until need).map(j => t(j % t.length) & 0xff).sum.toLong
      assert(r.getAs[Long]("pixel_sum") == expected,
        s"doc ${r.getAs[Long]("doc_id")}: pixel walk diverged from encode order")
    }
  }

  test("a corrupted payload is rejected, not silently misread") {
    val good = MultimodalQueries.bmpEncode("hello world".getBytes("UTF-8"))
    val badMagic = good.clone(); badMagic(0) = 'X'.toByte
    intercept[IllegalArgumentException](MultimodalQueries.bmpDecode(1L, badMagic))
    val badBpp = good.clone(); badBpp(28) = 8.toByte // claim 8bpp
    intercept[IllegalArgumentException](MultimodalQueries.bmpDecode(2L, badBpp))
    val truncated = good.take(20)
    intercept[IllegalArgumentException](MultimodalQueries.bmpDecode(3L, truncated))
    // truncated below the declared pixel-data size but past the header:
    // must be a typed rejection, not an ArrayIndexOutOfBounds mid-walk
    val shortPixels = good.take(60)
    intercept[IllegalArgumentException](MultimodalQueries.bmpDecode(4L, shortPixels))
  }

  test("the encoded payload is a byte-valid BMP (round-trips through decode)") {
    val text = "The quick brown fox jumps over the lazy dog".getBytes("UTF-8")
    val bmp = MultimodalQueries.bmpEncode(text)
    val (_, w, h, bpp, off, size, _) = MultimodalQueries.bmpDecode(7L, bmp)
    assert(w == 4 + text.length % 5)
    assert(h == 3 + (text(0) & 0xff) % 4)
    assert(bpp == 24 && off == 54)
    assert(size == bmp.length) // declared file size matches actual bytes
  }
}
