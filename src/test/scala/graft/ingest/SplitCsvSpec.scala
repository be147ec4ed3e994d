package graft.ingest

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.model.{CountryConfig, Schemas}

/** The splittable multiline-CSV route (round-16 verdict #7): SplitCsv
  * must be ROW-IDENTICAL to Spark's one-task-per-file multiLine reader
  * — on the reference sales files (the golden-count contract) and on
  * adversarial synthetic corpora where quoted newlines, escaped
  * quotes, and CRLF endings straddle chunk boundaries at every
  * alignment a tiny chunk size can produce. */
class SplitCsvSpec extends SparkSpec {

  private def canon(df: DataFrame): DataFrame =
    df.select(df.columns.filterNot(_.startsWith("_"))
      .sorted.map(col).toIndexedSeq: _*)

  private def assertSame(a: DataFrame, b: DataFrame, what: String): Unit = {
    val (ca, cb) = (canon(a), canon(b))
    assert(ca.count() == cb.count(), s"$what: counts differ")
    assert(ca.exceptAll(cb).isEmpty && cb.exceptAll(ca).isEmpty,
      s"$what: row sets differ")
  }

  test("reference sales CSVs: split route == multiLine reader, rows identical") {
    val cc = CountryConfig("IN")
    val mono = SourceLoader.readRaw(spark, refDataDir, cc)
    val split = SplitCsv.read(spark,
      s"$refDataDir/sales/source=IN/format=csv/date=*/*.csv",
      Schemas.inCsvSchema(SourceLoader.CorruptCol), SourceLoader.CorruptCol)
    assert(split.count() == 1931L, "reference golden count")
    assertSame(mono, split, "reference IN sales")
  }

  test("adversarial corpus: boundaries inside quoted newlines at every tiny chunk size") {
    val dir = Files.createTempDirectory("graft_splitcsv")
    // records exercising: embedded \n and \r\n in quotes, escaped ""
    // quotes, empty fields, a record far larger than the chunk size
    // (no valid boundary in several chunks), CRLF record endings
    val rows = (0 until 200).map { i =>
      val addr = i % 4 match {
        case 0 => s""""line$i\nsecond line, with comma""""
        case 1 => s""""say ""hi""\r\nand \n more$i""""
        case 2 => "plain" + i
        case 3 => s""""${"x" * 120}\n${"y" * 120}""""
      }
      val tail = if (i % 7 == 0) "" else s"t$i"
      s"id$i,$addr,$tail"
    }
    val body = "id,address,tag\r\n" + rows.mkString("\r\n") + "\r\n"
    Files.writeString(dir.resolve("a.csv"), body)
    // a second file with LF endings and no trailing newline
    Files.writeString(dir.resolve("b.csv"),
      "id,address,tag\nz1,\"multi\nline\",t\nz2,plain,")

    val schema = StructType(Seq(StructField("id", StringType),
      StructField("address", StringType), StructField("tag", StringType),
      StructField("_bad", StringType)))
    val mono = spark.read
      .option("header", true).option("multiLine", true)
      .option("quote", "\"").option("escape", "\"")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "_bad")
      .schema(schema).csv(dir.toString)
    for (chunk <- Seq(16L, 33L, 64L, 257L, 1L << 20)) {
      val split = SplitCsv.read(spark, s"$dir/*.csv", schema, "_bad", chunk)
      assertSame(mono, split, s"adversarial corpus at chunkBytes=$chunk")
    }
    graft.queries.DedupQueries.rmQuietly(dir.toString)
  }

  test("split route parallelism: many boundary-aligned ranges, not one task per file") {
    // the POINT of the two-pass design: a single multiline file yields
    // as many pass-2 ranges as its record boundaries allow — at 1 KB
    // chunks the reference file must fan out to dozens of tasks
    val f = s"$refDataDir/sales/source=IN/format=csv/date=2020-01-01/order-20200101.csv"
    val split = SplitCsv.read(spark, f,
      Schemas.inCsvSchema(SourceLoader.CorruptCol), SourceLoader.CorruptCol,
      chunkBytes = 1L << 10)
    val parts = split.rdd.getNumPartitions
    assert(parts > 16,
      s"splittable route produced only $parts partitions for a 168 KB file at 1 KB chunks")
    assert(split.count() > 0)
  }
}
