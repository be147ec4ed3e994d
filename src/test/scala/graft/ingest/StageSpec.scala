package graft.ingest

import java.nio.file.Files

import graft.SparkSpec
import graft.model.CountryConfig

/** S2 stage/landing copy: layout preservation + downstream readability. */
class StageSpec extends SparkSpec {

  test("landing copy preserves partition layout and stays readable") {
    val landing = Files.createTempDirectory("graft_landing").toString
    val copied = Stage.copyToLanding(spark, refDataDir, landing)

    // every sales partition path and the forex csv arrive, paths intact
    assert(copied.nonEmpty)
    assert(copied.exists(_.startsWith("sales/source=IN/format=csv/date=")))
    assert(copied.exists(_.startsWith("sales/source=US/format=parquet/date=")))
    assert(copied.exists(_.startsWith("sales/source=FR/format=json/date=")))
    assert(copied.contains("exchange-rate-data.csv"))

    // re-running overwrites idempotently (ref: overwrite=True)
    assert(Stage.copyToLanding(spark, refDataDir, landing) == copied)

    // the landing copy is a drop-in replacement for the drop zone: the
    // multiline-CSV reader sees the same records through the same glob
    val fromLanding = SourceLoader.readRaw(spark, landing, CountryConfig("IN")).count()
    val fromSource = SourceLoader.readRaw(spark, refDataDir, CountryConfig("IN")).count()
    assert(fromLanding == fromSource)
  }
}
