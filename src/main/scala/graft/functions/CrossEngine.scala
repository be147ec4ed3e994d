package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine-deterministic building blocks for the LLM-data-pipeline
  * operators (dedup, similarity, text analysis).
  *
  * Every oracle-checked query needs bit-identical results from Spark and
  * DuckDB. These helpers pin down the three places engines normally
  * diverge:
  *
  *   - **String hashing**: neither engine exposes the other's native hash
  *     (Spark xxhash64 vs DuckDB hash), but both compute identical md5
  *     hex. We take the first 12 hex chars as a 48-bit integer:
  *     Spark `conv(substring(md5(x),1,12),16,10)` ==
  *     DuckDB `('0x' || substr(md5(x),1,12))::BIGINT` (verified).
  *   - **Floating-point reductions**: SUM() order is engine-dependent, so
  *     dot products use an explicit sequential left-fold over the array
  *     — Spark `aggregate(zip_with(a,b,*), 0.0, +)` performs the same
  *     IEEE double operations in the same order as DuckDB
  *     `list_reduce(list_prepend(0.0, list_transform(list_zip(a,b), ...)))`
  *     (verified bit-identical against a Python reference fold).
  *   - **Modular arithmetic**: all hash mixing stays below 2^63 with
  *     positive operands so `%` agrees across engines.
  */
object CrossEngine {

  /** Mersenne prime 2^31-1: keeps (a*h + b) % P products < 2^63. */
  final val P: Long = 2147483647L

  // ---------------------------------------------------------------- Spark

  /** 48-bit integer from the md5 hex prefix of a string column. */
  def md5Hash48(c: Column): Column =
    conv(substring(md5(c.cast("binary")), 1, 12), 16, 10).cast("long")

  /** md5Hash48 reduced mod P — the token-hash domain for minhash/simhash. */
  def tokenHash(c: Column): Column = md5Hash48(c) % P

  /** Universal-hash family member i: h_i(x) = (a_i*x + b_i) mod P. */
  def permHash(h: Column, i: Int): Column =
    (h * lit(permA(i)) + lit(permB(i))) % P
  def permA(i: Int): Long = (1000003L * (i + 1)) % P
  def permB(i: Int): Long = (7777777L * (i + 1)) % P

  /** Whitespace tokens (single-space-joined corpus). */
  def tokens(text: Column): Column = split(text, " ")

  /** Bloom-filter bit position j of a non-negative integer key in an
    * m-bit filter, drawn from the same universal-hash family as the
    * minhash permutations. Shared by q88 and MaintenanceSpec so the
    * tested filter and the production filter can never drift apart. */
  def bloomPos(key: Column, j: Int, m: Int): Column =
    ((key % P) * permA(j) + permB(j)) % P % m

  /** Word n-gram shingles over a PRE-SPLIT tokens column. The tokens
    * must be a bound column (project `tokens(text).as("t")` first), not
    * an inline `split(...)` expression: Spark does not subexpression-
    * eliminate inside lambda bodies, so an inline split is re-evaluated
    * by every `element_at` — n splits per shingle, O(tokens^2) per doc
    * (measured 10.5s -> 0.5s on q86's 13-grams at sf0.1; same trap as
    * the q69 note in TextQueries). */
  def shinglesOf(t: Column, n: Int): Column =
    transform(
      sequence(lit(0), size(t) - n),
      i => concat_ws(" ", (0 until n).map(k => element_at(t, i + k + 1)): _*))

  /** Word n-gram shingles from raw text. Convenience for SMALL inputs
    * only — inlines `split` into the lambda (see [[shinglesOf]]). */
  def shingles(text: Column, n: Int): Column = shinglesOf(tokens(text), n)

  /** Sequential-fold dot product of two array<double> columns — the order
    * of additions is the array order, matching the DuckDB fold exactly.
    * Backed by the native codegen'd DotFold expression (registered by
    * GraftExtensions); bit-identical to [[dotFoldHof]], which is the
    * reference implementation the spec checks it against. */
  def dotFold(a: Column, b: Column): Column =
    call_function("graft_dot", a, b)

  /** The same fold via generic higher-order functions — interpreted,
    * allocates a product array per row; kept as the executable spec for
    * the native expression (VectorExprsSpec asserts bit-equality). */
  def dotFoldHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Cosine similarity via three sequential folds (deterministic). */
  def cosine(a: Column, b: Column): Column =
    dotFold(a, b) / (sqrt(dotFold(a, a)) * sqrt(dotFold(b, b)))

  /** Squared L2 distance as a sequential fold (deterministic). */
  def sqDistFold(a: Column, b: Column): Column =
    call_function("graft_sqdist", a, b)

  /** Rolling polynomial hash `acc = (acc*mult + byte) % mod` over a
    * 1-based, end-clamped byte range of a binary column — the native
    * codegen'd ByteFold (see ByteExprs); bit-identical to the
    * `aggregate(transform(sequence(...), ascii∘substr))` HOF chain on
    * ASCII payloads (ByteExprsSpec). `mult`/`mod` are plan-time
    * constants spliced into the generated loop. */
  def byteFold(data: Column, start: Column, len: Column,
      mult: Long, mod: Long): Column =
    call_function("graft_bytefold", data, start, len, lit(mult), lit(mod))

  /** Max unsigned byte over the same clamped range (null when empty),
    * native codegen'd. */
  def byteMax(data: Column, start: Column, len: Column): Column =
    call_function("graft_bytemax", data, start, len)

  /** HOF reference implementation of [[sqDistFold]]. */
  def sqDistFoldHof(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => (x - y) * (x - y)), lit(0.0), (acc, x) => acc + x)

  // --------------------------------------------------------------- DuckDB
  // SQL-text generators for the oracle side. Each mirrors the Spark
  // helper above operation-for-operation.

  def sqlMd5Hash48(x: String): String =
    s"('0x' || substr(md5($x),1,12))::BIGINT"

  def sqlTokenHash(x: String): String = s"(${sqlMd5Hash48(x)} % $P)"

  def sqlPermHash(h: String, i: Int): String =
    s"(($h * ${permA(i)} + ${permB(i)}) % $P)"

  /** DuckDB lists are 1-indexed; Spark arrays 0-indexed — both produce
    * len(tokens)-n+1 shingles in the same order. */
  def sqlShingles(tokensExpr: String, n: Int): String = {
    val parts = (0 until n).map(k => s"t[i+$k]").mkString(" || ' ' || ")
    s"list_transform(range(1, len($tokensExpr) - ${n - 2}), i -> $parts)"
  }

  def sqlDotFold(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(list_zip($a, $b), p -> p[1] * p[2])), (x, y) -> x + y)"

  def sqlCosine(a: String, b: String): String =
    s"(${sqlDotFold(a, b)} / (sqrt(${sqlDotFold(a, a)}) * sqrt(${sqlDotFold(b, b)})))"

  def sqlSqDistFold(a: String, b: String): String =
    s"list_reduce(list_prepend(0.0::DOUBLE, " +
      s"list_transform(list_zip($a, $b), p -> (p[1] - p[2]) * (p[1] - p[2]))), (x, y) -> x + y)"
}
