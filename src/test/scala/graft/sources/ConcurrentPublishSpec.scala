package graft.sources

import java.util.concurrent.{CountDownLatch, Executors, TimeUnit}
import java.util.concurrent.atomic.AtomicInteger

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Concurrent-publisher safety of the durable-artifact machinery
  * (round-15 verdict #3). The claims under test, until now comments:
  *
  *   1. the atomic publish — `FileContext.rename(Rename.NONE)` onto the
  *      live path — admits exactly ONE winner of N concurrent
  *      publishers, and every loser LEARNS it lost (so it can discard
  *      its copy and read the winner's). `attachOrBuildFp` is
  *      JVM-serialized by `synchronized`, so the cross-session race is
  *      only reachable at the [[DurableIndex.publishAtomic]] primitive;
  *      racing it from threads exercises the same FS-level interleaving
  *      two JVMs would produce (the lock they don't share is above it);
  *   2. a reader NEVER observes a torn generation: at any instant the
  *      live path is either absent or a COMPLETE build (the rename's
  *      atomicity) — a concurrent attach-and-count loop must only ever
  *      see a full publisher's row count;
  *   3. the cumulative-sidecar protocol (the `sem_del` shape): a later
  *      maintenance generation DERIVES from the live one, so the
  *      superseded generation's rows are a SUBSET of its successor's —
  *      the fold-commute argument that makes the newest-wins
  *      `attachLatest` resolution safe — and publishing the successor
  *      retires the predecessor, leaving exactly one live version.
  */
class ConcurrentPublishSpec extends SparkSpec {

  private def fs = new Path(spark.conf.get("spark.sql.warehouse.dir"))
    .getFileSystem(spark.sparkContext.hadoopConfiguration)

  test("N racing publishers, 20 rounds: one winner, losers told, destination never torn") {
    val base = new Path(spark.conf.get("spark.sql.warehouse.dir"), "graft_race_probe")
    fs.delete(base, true)
    fs.mkdirs(base)

    // each publisher publishes a complete single-file build of a
    // DISTINCT row count, so any torn/mixed read is detectable as a
    // count outside the legal set. The builds are staged ONCE and
    // FS-copied per round: the race window is microseconds wide (the
    // round-19 full-suite run caught it roughly 1-in-N runs on the
    // single-shot version of this test), so the election is looped 20
    // rounds to make the window deterministic enough to trust
    // (round-19 verdict #1); the Spark reader leg — which pins
    // torn-read atomicity, an orthogonal invariant — runs on the first
    // round only.
    val nPub = 8
    val counts = (0 until nPub).map(i => 100L + 10L * i)
    val templates = (0 until nPub).map { i =>
      val t = new Path(base, s"template_$i")
      spark.range(counts(i)).coalesce(1).write.mode("overwrite").parquet(t.toString)
      t
    }
    val hconf = spark.sparkContext.hadoopConfiguration
    for (round <- 0 until 20) {
      val loc = new Path(base, s"race_probe_t_deadbeef$round")
      val tmps = (0 until nPub).map { i =>
        val t = new Path(base, s"race_probe_t_deadbeef$round.build_race$i")
        org.apache.hadoop.fs.FileUtil.copy(fs, templates(i), fs, t, false, hconf)
        t
      }
      raceOnce(loc, tmps, counts, withReader = round == 0)
    }
    fs.delete(base, true): Unit
  }

  /** One 8-publisher race against a fresh destination; asserts the
    * one-winner election, loser cleanup and destination integrity.
    * `withReader` adds the concurrent attach-and-count loop (claim 2). */
  private def raceOnce(loc: Path, tmps: Seq[Path], counts: Seq[Long],
      withReader: Boolean): Unit = {
    val nPub = tmps.length
    val start = new CountDownLatch(1)
    val wins = new AtomicInteger(0)
    val winnerIdx = new AtomicInteger(-1)
    val pool = Executors.newFixedThreadPool(nPub + 1)
    val readerIllegal = new AtomicInteger(0)
    val readerSawRows = new AtomicInteger(0)
    val readerMisses = new AtomicInteger(0) // swallowed FNF-shaped probes
    val stopReader = new java.util.concurrent.atomic.AtomicBoolean(false)

    // the attach-and-count reader loop (claim 2): every successful read
    // must land on a complete publisher's count; a missing path is the
    // legal pre-publish state, any other outcome is a torn generation
    if (withReader) pool.submit(new Runnable { def run(): Unit = {
      start.await()
      while (!stopReader.get()) {
        try {
          val n = spark.read.parquet(loc.toString).count()
          if (counts.contains(n)) readerSawRows.incrementAndGet()
          else readerIllegal.incrementAndGet()
        } catch {
          // absent path is the legal pre-publish state whatever shape it
          // surfaces as: AnalysisException at analysis, or a raw
          // FileNotFoundException from schema inference racing the
          // publish — the reader must keep probing, not die on the
          // first miss
          case e: org.apache.spark.sql.AnalysisException
            if e.getMessage.contains("PATH_NOT_FOUND")
              || e.getMessage.toLowerCase.contains("path does not exist") =>
            readerMisses.incrementAndGet(): Unit
          case e: Throwable
            if Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(6)
              .exists(c => c.isInstanceOf[java.io.FileNotFoundException]
                || String.valueOf(c.getMessage).contains("does not exist")) =>
            // counted, not ignored: a reader whose every probe lands
            // here (e.g. a mid-scan torn read misclassified as the
            // pre-publish state) can no longer pass vacuously — the
            // readerSawRows > 0 assertion below requires at least one
            // COMPLETED legal read (round-16 advice)
            readerMisses.incrementAndGet(): Unit
        }
      }
    }})

    val futures = (0 until nPub).map { i =>
      pool.submit(new Runnable { def run(): Unit = {
        start.await()
        if (DurableIndex.publishAtomic(spark, tmps(i), loc)) {
          wins.incrementAndGet()
          winnerIdx.set(i)
        } else fs.delete(tmps(i), true) // the loser's contract
      }})
    }
    start.countDown()
    futures.foreach(_.get(600, TimeUnit.SECONDS))
    if (withReader) {
      // the race is over and the winner is live: keep the reader running
      // until it completes at least one LEGAL read of the published
      // generation, so the reader leg cannot pass by swallowing every
      // probe as an FNF-shaped miss (round-16 advice)
      val readDeadline = System.nanoTime() + 120L * 1000 * 1000 * 1000
      while (readerSawRows.get() == 0 && readerIllegal.get() == 0
          && System.nanoTime() < readDeadline) Thread.sleep(10)
    }
    stopReader.set(true)
    pool.shutdown()
    assert(pool.awaitTermination(600, TimeUnit.SECONDS))

    assert(wins.get() == 1, s"expected exactly one winning publisher, got ${wins.get()}")
    assert(readerIllegal.get() == 0,
      s"reader observed ${readerIllegal.get()} torn generations (row counts outside the legal set)")
    if (withReader) assert(readerSawRows.get() > 0,
      s"reader never completed one legal read (${readerMisses.get()} probes swallowed as pre-publish misses) — the reader leg was vacuous")
    // destination holds exactly the winner's complete build
    assert(spark.read.parquet(loc.toString).count() == counts(winnerIdx.get()),
      "live path does not hold the winner's build")
    // every loser discarded its copy; nothing nested under the live dir
    val leftovers = fs.listStatus(loc.getParent).map(_.getPath.getName)
      .filter(_.startsWith(s"${loc.getName}.build_race")).toSeq
    assert(leftovers.isEmpty, s"loser build dirs survived: $leftovers")
    assert(!fs.listStatus(loc).exists(_.getPath.getName.contains(".build")),
      "a loser's build dir nested inside the winner's live table")
  }

  test("cumulative sidecar race: successor derives from live, newest wins, one live survives") {
    val family = "race_sidecar"
    val dirTag = "/tmp/graft_race_corpus"
    val base = new Path(spark.conf.get("spark.sql.warehouse.dir"), s"graft_$family")
    fs.delete(base, true)

    // publisher A: the standing takedown log {1, 2}
    val fpA = "aaaa01"
    DurableIndex.attachOrBuildFp(spark, dirTag, family, fpA, None) {
      spark.range(1, 3).select(col("id").as("doc_id"))
    }
    val liveA = DurableIndex.attachLatest(spark, dirTag, family).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(liveA == Set(1L, 2L))

    // publisher B follows the cumulative protocol: DERIVE from the live
    // generation, union the new takedowns, publish under the next fp —
    // while a reader loops attach-and-count across the transition; the
    // set it observes must only ever GROW along the subset chain
    // (A ⊆ B), the fold-commute property that makes newest-wins safe
    val fpB = "bbbb02"
    val observed = scala.collection.mutable.ArrayBuffer[Set[Long]]()
    val stop = new java.util.concurrent.atomic.AtomicBoolean(false)
    val pool = Executors.newFixedThreadPool(1)
    val reader = pool.submit(new Runnable { def run(): Unit = {
      while (!stop.get()) {
        try {
          DurableIndex.attachLatest(spark, dirTag, family).foreach { df =>
            observed.synchronized {
              observed += df.select("doc_id").collect().map(_.getLong(0)).toSet
            }
          }
        } catch {
          // the one benign failure: the generation the reader resolved
          // was parked `.retired` between its read.parquet and its
          // collect — the documented reader contract is to re-attach
          // (the successor that parked it is live); anything else is a
          // real safety violation and must fail the test
          case e: Throwable
            if Iterator.iterate(e)(_.getCause).takeWhile(_ != null).take(6)
              .exists(c => c.isInstanceOf[java.io.FileNotFoundException]
                || String.valueOf(c.getMessage).contains("does not exist")) => ()
        }
      }
    }})
    val derived = DurableIndex.attachLatest(spark, dirTag, family).get
      .select("doc_id")
      .unionByName(spark.range(3, 5).select(col("id").as("doc_id")))
    DurableIndex.attachOrBuildFp(spark, dirTag, family, fpB, None)(derived)
    // one more observation after the publish, then stop
    Thread.sleep(50)
    stop.set(true)
    reader.get(600, TimeUnit.SECONDS)
    pool.shutdown()

    val want = Set(1L, 2L, 3L, 4L)
    val snaps = observed.synchronized(observed.toSeq)
    assert(snaps.forall(s => s == liveA || s == want),
      s"reader observed a set that is neither generation: ${snaps.distinct}")
    // subset chain: once the successor is visible the reader never
    // falls back to the superseded log
    val firstB = snaps.indexWhere(_ == want)
    assert(firstB < 0 || snaps.drop(firstB).forall(_ == want),
      "reader regressed from the successor to the superseded generation")

    // newest wins and the loser is retired: exactly one live version
    val tag = dirTag.replaceAll("[^a-zA-Z0-9]", "_")
    val prefix = s"${family}_${tag}_"
    val names = fs.listStatus(base).map(_.getPath.getName).toSeq
    val live = names.filter(n => n.startsWith(prefix)
      && n.substring(prefix.length).matches("[0-9a-f]+"))
    assert(live == Seq(s"$prefix$fpB"), s"expected only the successor live, got $names")
    assert(names.exists(_.startsWith(s"$prefix$fpA.retired")),
      "superseded generation was purged immediately — no reader grace window")
    val resolved = DurableIndex.attachLatest(spark, dirTag, family).get
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(resolved == want, "attachLatest did not resolve to the successor")
    assert(liveA.subsetOf(resolved),
      "cumulative protocol violated: superseded rows not a subset of the successor")
    fs.delete(base, true): Unit
  }
}
