package graft.ingest

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** SPLITTABLE reading of outer-array JSON — the FR ingest shape
  * (round-18 verdict #1, the symmetric gap to SplitCsv): an
  * array-of-objects document (ref: step_3_load_from_stage_to_source
  * .py:88-109, format DDL 4. Common Schema.sql:15-18) can only be read
  * by Spark's JSON source with `multiLine=true`, which pins ONE task
  * per file — at 100 TB the FR source serializes on file count. This
  * reader makes byte splits provably element-safe with the same
  * two-pass design as [[SplitCsv]], adapted to JSON's lexical rules:
  *
  *   PASS 1 (distributed, one task per ~chunk): each fixed-size byte
  *   chunk is scanned under all THREE string start states a chunk
  *   boundary can land in — outside a string, inside a string, and
  *   inside a string immediately after a backslash (a split can fall
  *   between `\` and `"`). JSON strings toggle on unescaped `"` and a
  *   backslash escapes exactly one following byte (every JSON escape
  *   is ASCII, and UTF-8 continuation bytes never collide with ASCII,
  *   so a byte scan needs no decoding). Per start state the scan
  *   records the net `{[`/`}]` depth delta outside strings, the end
  *   state, and the NEW-MINIMUM closes: the first close reaching each
  *   successively lower relative depth-after. Because depth moves by
  *   ±1 and every downward integer crossing happens at a close, the
  *   recorded values form a contiguous descending range — so the
  *   combine can look up any target depth by index.
  *
  *   PER-FILE COMBINE (distributed, one task per file, metadata only):
  *   a prefix fold resolves each chunk's TRUE start state and absolute
  *   depth. An element boundary is a `}` whose absolute depth-after is
  *   1 — the close of a top-level array element — i.e. the chunk's
  *   recorded close at relative depth `1 - startDepth` (a `]` at that
  *   depth is the outer array's own close or an array-typed element's
  *   end; both are skipped — boundaries are optional, ranges merge).
  *   The fold also fail-fasts on structural damage: unbalanced strings
  *   or brackets leave a non-zero final state and the file is rejected
  *   (the analogue of SplitCsv's quote-parity require — the multiLine
  *   reader degrades a structurally broken file to ONE corrupt row,
  *   which a splittable route cannot reproduce and must not silently
  *   approximate).
  *
  *   PASS 2 (distributed, ~one task per boundary-aligned range): each
  *   range starts right after an element-closing `}` (or at byte 0,
  *   where it consumes the opening `[`), so a fresh scan slices
  *   COMPLETE top-level elements — object, nested-array and scalar
  *   elements alike; `from_json` then parses each element PERMISSIVE
  *   with corrupt-column capture (embedded escaped newlines are fine —
  *   the parser sees one whole element).
  *
  * Corrupt semantics — the one DOCUMENTED divergence (pinned by
  * SplitJsonSpec's corrupt-semantics leg): the multiLine reader's
  * blast radius is the whole file, because in multiLine mode the file
  * IS the record — one type-mismatched element stamps every row's
  * corrupt column with the entire file text, and one null/scalar
  * element degrades the whole file to a single all-null corrupt row.
  * A byte-range reader cannot reproduce a whole-file property from
  * inside one range, and at 100 TB per-file blast radius is the wrong
  * behavior anyway; this route REFINES it — exactly the offending
  * element lands in the corrupt column, null elements (no data) are
  * dropped, well-formed neighbors parse normally. On clean
  * array-of-objects corpora (the FR contract shape) the routes are
  * row-identical, corrupt flags included.
  *
  * Every emitted row carries `_src_file`, `_rec_offset` (the element's
  * absolute byte offset — a deterministic total order within a file)
  * and `_src_mtime`, so SourceLoader can synthesize the `_metadata`
  * lineage shape. Cost: pass 1 reads the bytes once (the boundary
  * ranges are checkpointed, so it never re-runs per action), pass 2
  * once per consuming job — 2x I/O for unbounded parallelism, the
  * same trade SplitCsv makes; the no-schema path pays one extra
  * pass-2 job for inference (pass an explicit schema at scale).
  *
  * Ref behavior matched: SourceLoader.readRaw's json branch
  * (multiLine, PERMISSIVE, corrupt capture, inferred schema);
  * SplitJsonSpec proves row-identical output — corrupt-element
  * classification included — on the reference FR files and on
  * synthetic corpora with escapes, nesting and corrupt elements
  * straddling chunk boundaries at adversarial chunk sizes.
  */
object SplitJson {

  /** Test hook: tuples the last read materialized on the driver — the
    * file listing and nothing else (SplitJsonSpec pins O(#files), like
    * SplitCsv's hook). */
  private[ingest] val lastDriverHeld =
    new java.util.concurrent.atomic.AtomicLong(-1L)

  // string start/end states a chunk boundary can land in
  private final val StOut = 0    // outside any string
  private final val StIn = 1     // inside a string
  private final val StInEsc = 2  // inside a string, next byte is escaped

  /** One start-state's scan of one chunk: end state, net bracket-depth
    * delta outside strings, and the new-minimum closes as parallel
    * arrays — `minVals` is contiguous descending (see scaladoc), so
    * `minVals(0) - target` indexes the close at relative depth-after
    * `target`. `minBrace(i)` distinguishes `}` (an element boundary
    * candidate) from `]`. */
  private case class StateScan(endState: Int, depthDelta: Int,
      minVals: Array[Int], minOffs: Array[Long], minBrace: Array[Boolean])

  /** One pass-1 result: chunk identity (+ its file's length and mtime,
    * carried so the per-file combine needs no driver-built maps) and
    * the three per-start-state scans, indexed by state. */
  private case class ChunkScan(file: String, fileLen: Long, mtime: Long,
      idx: Int, scans: Array[StateScan])

  /** Boundary-aligned read range; the file-leading range consumes the
    * outer `[`. */
  private case class ElemRange(file: String, start: Long, end: Long,
      isFirst: Boolean, mtime: Long)

  private def isWs(b: Byte): Boolean =
    b == ' ' || b == '\t' || b == '\n' || b == '\r'

  /** Scan `buf` (absolute file offset `absStart`) under one assumed
    * string start state. */
  private def scanChunk(buf: Array[Byte], absStart: Long, startState: Int)
      : StateScan = {
    var st = startState
    var depth = 0
    var minSoFar = Int.MaxValue
    val vals = Array.newBuilder[Int]
    val offs = Array.newBuilder[Long]
    val brace = Array.newBuilder[Boolean]
    var n = 0
    var j = 0
    while (j < buf.length) {
      val b = buf(j)
      if (st == StOut) {
        if (b == '"') st = StIn
        else if (b == '{' || b == '[') depth += 1
        else if (b == '}' || b == ']') {
          depth -= 1
          if (depth < minSoFar) {
            minSoFar = depth
            vals += depth; offs += absStart + j; brace += (b == '}')
            n += 1
            // a 32 MB chunk of pure `}` bytes would otherwise build a
            // 33M-entry list — degenerate non-record JSON, fail fast
            require(n <= (1 << 20),
              s"chunk at $absStart: >1M nesting levels close in one " +
                "chunk — not record-shaped JSON")
          }
        }
      } else if (st == StIn) {
        if (b == '"') st = StOut
        else if (b == '\\') st = StInEsc
      } else { // StInEsc: the escaped byte itself (always ASCII in
        st = StIn // valid JSON; a stray high-bit byte is harmless —
      }           // continuation bytes never equal '"' or '\')
      j += 1
    }
    StateScan(st, depth, vals.result(), offs.result(), brace.result())
  }

  /** Read every file matching `pattern` (a Hadoop glob) as outer-array
    * JSON, PERMISSIVE with `corruptCol` capture — the splittable
    * equivalent of the SourceLoader multiLine reader. `schema`, when
    * given, must already include `corruptCol` (same convention as
    * [[SplitCsv.read]]); when absent the element schema is inferred
    * from the sliced elements themselves with Spark's own JSON
    * inference — the same code path the multiLine reader infers with,
    * at the price of one extra pass over the ranges. */
  def read(spark: SparkSession, pattern: String, schema: Option[StructType],
      corruptCol: String, chunkBytes: Long = 32L << 20): DataFrame = {
    val conf = new org.apache.spark.util.SerializableConfiguration(
      spark.sparkContext.hadoopConfiguration)
    val (files, eff) = SplitFiles.listing(spark, pattern, chunkBytes)
    // the ONLY driver-side materialization is this listing (pinned by
    // SplitJsonSpec via the hook): scans and ranges stay in RDDs
    lastDriverHeld.set(files.length)
    val numChunks = files.map { case (_, len, _) => (len + eff - 1) / eff }.sum
    val nTasks = math.max(1L, math.min(numChunks, Int.MaxValue.toLong)).toInt

    // ---- pass 1: distributed chunk scans, one chunk per task ----
    val sc = spark.sparkContext
    val scans = sc
      .parallelize(files.toSeq,
        math.max(1, math.min(files.length, 4 * sc.defaultParallelism)))
      .flatMap { case (f, len, mtime) =>
        (0L until len by eff).iterator.zipWithIndex.map { case (off, i) =>
          (f, len, mtime, i, off, math.min(off + eff, len))
        }
      }
      .repartition(nTasks)
      .map { case (f, len, mtime, i, start, end) =>
        val in = new Path(f).getFileSystem(conf.value).open(new Path(f))
        val buf = new Array[Byte]((end - start).toInt)
        try { in.seek(start); in.readFully(buf) } finally in.close()
        ChunkScan(f, len, mtime, i,
          Array(scanChunk(buf, start, StOut), scanChunk(buf, start, StIn),
            scanChunk(buf, start, StInEsc)))
      }

    // ---- per-file combine (distributed, metadata only): true start
    // states -> element boundaries. One task per file; bounded by the
    // auto-scale at ~262k small tuples even for a single-file corpus.
    val ranges = scans.groupBy(_.file).flatMap { case (f, csIt) =>
      val cs = csIt.toSeq
      val len = cs.head.fileLen
      val fileMtime = cs.head.mtime
      var st = StOut
      var depth = 0L
      val bounds = Seq.newBuilder[Long]
      cs.sortBy(_.idx).foreach { c =>
        val s = c.scans(st)
        // the element close we want is the `}` at absolute depth-after
        // 1, i.e. relative depth-after (1 - depth); minVals descends
        // contiguously from its head, so index arithmetic finds it
        val target = 1L - depth
        if (s.minVals.nonEmpty && target <= s.minVals(0) &&
            target >= s.minVals(s.minVals.length - 1)) {
          val k = (s.minVals(0) - target).toInt
          if (s.minBrace(k)) bounds += s.minOffs(k) + 1
        }
        depth += s.depthDelta
        st = s.endState
      }
      require(st == StOut && depth == 0L,
        s"$f: not well-formed outer-array JSON (unbalanced strings or " +
          "brackets) — the multiLine reader degrades such a file to one " +
          "corrupt row; the splittable route rejects it instead")
      val starts = (0L +: bounds.result()).distinct.filter(_ < len)
      starts.zip(starts.drop(1) :+ len).map { case (a, b) =>
        ElemRange(f, a, b, isFirst = a == 0L, mtime = fileMtime)
      }
    }.localCheckpoint() // metadata-sized (O(#chunks) descriptors):
    // without this every caller ACTION — and the inference path's
    // extra job — re-runs pass 1, which reads every corpus byte;
    // checkpointed, pass 1 runs once per read() call (blocks are
    // cleaned with the RDD)

    // ---- pass 2: boundary-aligned ranges -> complete element texts ----
    import spark.implicits._
    val records = ranges
      .repartition(nTasks) // ~one range per task (ranges <= chunks)
      .flatMap { r =>
        require(r.end - r.start <= Int.MaxValue - 8,
          s"${r.file}: a single element spans ${r.end - r.start} bytes " +
            s"(range ${r.start}..${r.end}) — larger than the 2 GiB " +
            "single-element limit of the splittable route")
        val in = new Path(r.file).getFileSystem(conf.value).open(new Path(r.file))
        val buf = new Array[Byte]((r.end - r.start).toInt)
        try { in.seek(r.start); in.readFully(buf) } finally in.close()
        val out = Seq.newBuilder[(String, String, Long, Long)]
        var j = 0
        if (r.isFirst) {
          // optional UTF-8 BOM, whitespace, then the outer `[`
          if (buf.length >= 3 && (buf(0) & 0xFF) == 0xEF &&
              (buf(1) & 0xFF) == 0xBB && (buf(2) & 0xFF) == 0xBF) j = 3
          while (j < buf.length && isWs(buf(j))) j += 1
          require(j < buf.length && buf(j) == '[',
            s"${r.file}: expected a top-level JSON array (the FR shape); " +
              s"first byte is '${if (j < buf.length) buf(j).toChar else "EOF"}'")
          j += 1
        }
        var st = StOut
        var depth = 1 // inside the outer array
        var recStart = -1
        def emit(endIdx: Int): Unit = {
          var a = recStart; var e = endIdx
          while (a < e && isWs(buf(a))) a += 1
          while (e > a && isWs(buf(e - 1))) e -= 1
          if (e > a) {
            val txt = new String(buf, a, e - a, "UTF-8")
            // the multiLine reader SKIPS null array elements — so does
            // this route (SplitJsonSpec pins the parity)
            if (txt != "null") out += ((r.file, txt, r.start + a, r.mtime))
          }
          recStart = -1
        }
        while (j < buf.length) {
          val b = buf(j)
          if (st == StOut) {
            if (b == '"') { if (depth == 1 && recStart < 0) recStart = j; st = StIn }
            else if (b == '{' || b == '[') {
              if (depth == 1 && recStart < 0) recStart = j
              depth += 1
            } else if (b == '}' || b == ']') {
              depth -= 1
              if (depth == 1) emit(j + 1)       // object/array element closed
              else if (depth == 0) {            // the outer `]`
                if (recStart >= 0) emit(j)      // trailing scalar element
              }
            } else if (depth == 1 && b == ',') {
              if (recStart >= 0) emit(j)        // scalar element ended
            } else if (depth == 1 && !isWs(b) && recStart < 0) {
              recStart = j                      // scalar element starts
            }
          } else if (st == StIn) {
            if (b == '"') st = StOut
            else if (b == '\\') st = StInEsc
          } else st = StIn
          j += 1
        }
        if (recStart >= 0) emit(buf.length) // defensive: combine's
        out.result()                        // require catches imbalance
      }
      .toDF("_src_file", "_rec", "_rec_offset", "_src_mtime")

    // ---- element schema: given, or inferred with Spark's own JSON
    // inference over the sliced elements (the multiLine reader's
    // inference logic, so field types/order match it) ----
    val full = schema.getOrElse {
      val inferred = spark.read
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", corruptCol)
        .json(records.select(col("_rec")).as[String])
        .schema.fields.filterNot(_.name == corruptCol)
      StructType(inferred :+ StructField(corruptCol, StringType))
    }

    // ---- parse: one whole element per from_json call ----
    val opts = Map("mode" -> "PERMISSIVE",
      "columnNameOfCorruptRecord" -> corruptCol)
    records
      .withColumn("_parsed", from_json(col("_rec"), full, opts))
      .select(col("_parsed.*"), col("_src_file"), col("_rec_offset"),
        timestamp_millis(col("_src_mtime")).as("_src_mtime"))
  }
}
