package graft.functions.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BinaryType, DataType, LongType}

/** Native byte-range expressions for the multimodal hot path.
  *
  * q38 (frame sampling) and q68 (audio windowing) reduce byte ranges of
  * a payload per output row. Composed from built-ins that is
  * `aggregate(transform(sequence(from, to), i -> ascii(substr(text, i,
  * 1))), ...)` — correct, but per BYTE it allocates a one-char
  * UTF8String, re-walks the string for the substring offset, and
  * dispatches two interpreted lambdas. At 100 TB the payload bytes ARE
  * the inner loop, so these get `doGenCode`: a fused primitive loop
  * over the binary value inside whole-stage codegen — no allocation,
  * no dispatch, one array index per byte.
  *
  * Range contract (shared): `start` is 1-based, the range is the
  * `len`-byte window clamped to the data's end — exactly
  * `sequence(start, least(start + len - 1, n))` in the HOF original,
  * so results are bit-identical (ByteExprsSpec verifies against the
  * HOF chain, and the unchanged DuckDB oracles verify cross-engine).
  * Bytes are read unsigned, matching `ascii()` on the ASCII payloads
  * these operators contract for (documents.text is ASCII by
  * construction — see MultimodalQueries).
  */
abstract class ByteRangeExpr extends TernaryExpression {
  def data: Expression
  def start: Expression
  def len: Expression

  override def first: Expression = data
  override def second: Expression = start
  override def third: Expression = len

  override def checkInputDataTypes(): TypeCheckResult =
    if (data.dataType == BinaryType && start.dataType == LongType &&
        len.dataType == LongType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires (binary, bigint, bigint), got " +
        Seq(data, start, len).map(_.dataType.sql).mkString("(", ", ", ")"))

  override def dataType: DataType = LongType
  override def nullable: Boolean = true
}

/** Sequential polynomial fold over a byte range:
  * `acc = (acc * mult + byte) % mod`, left to right, seed 0 — the
  * rolling-hash step (mult=131, mod=1000003 in q38) and, with mult=1
  * and a large mod, a plain byte sum (q68 energy). An empty range
  * returns the seed, matching `aggregate` over an empty array. */
case class ByteFold(data: Expression, start: Expression, len: Expression,
    mult: Long, mod: Long) extends ByteRangeExpr {
  override def prettyName: String = "graft_bytefold"

  override def nullSafeEval(d: Any, s: Any, l: Any): Any = {
    val bytes = d.asInstanceOf[Array[Byte]]
    val from = math.max(s.asInstanceOf[Long], 1L)
    val end = math.min(from + l.asInstanceOf[Long] - 1, bytes.length.toLong)
    var acc = 0L
    var i = from
    while (i <= end) {
      acc = (acc * mult + (bytes((i - 1).toInt) & 0xff)) % mod
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, s, l) => {
      val i = ctx.freshName("i")
      val from = ctx.freshName("from")
      val end = ctx.freshName("end")
      val acc = ctx.freshName("acc")
      s"""
         |long $from = Math.max($s, 1L);
         |long $end = Math.min($from + $l - 1L, (long) $d.length);
         |long $acc = 0L;
         |for (long $i = $from; $i <= $end; $i++) {
         |  $acc = ($acc * ${mult}L + ($d[(int)($i - 1L)] & 0xFF)) % ${mod}L;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ByteFold =
    copy(data = newFirst, start = newSecond, len = newThird)
}

/** Max unsigned byte over a byte range; an empty range is null,
  * matching `array_max` over an empty array. */
case class ByteMax(data: Expression, start: Expression, len: Expression)
    extends ByteRangeExpr {
  override def prettyName: String = "graft_bytemax"

  override def nullSafeEval(d: Any, s: Any, l: Any): Any = {
    val bytes = d.asInstanceOf[Array[Byte]]
    val from = math.max(s.asInstanceOf[Long], 1L)
    val end = math.min(from + l.asInstanceOf[Long] - 1, bytes.length.toLong)
    if (from > end) null
    else {
      var mx = 0L
      var i = from
      while (i <= end) {
        val b = (bytes((i - 1).toInt) & 0xff).toLong
        if (b > mx) mx = b
        i += 1
      }
      mx
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (d, s, l) => {
      val i = ctx.freshName("i")
      val from = ctx.freshName("from")
      val end = ctx.freshName("end")
      val mx = ctx.freshName("mx")
      val b = ctx.freshName("b")
      s"""
         |long $from = Math.max($s, 1L);
         |long $end = Math.min($from + $l - 1L, (long) $d.length);
         |if ($from > $end) {
         |  ${ev.isNull} = true;
         |} else {
         |  long $mx = 0L;
         |  for (long $i = $from; $i <= $end; $i++) {
         |    long $b = (long) ($d[(int)($i - 1L)] & 0xFF);
         |    if ($b > $mx) $mx = $b;
         |  }
         |  ${ev.value} = $mx;
         |}
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ByteMax =
    copy(data = newFirst, start = newSecond, len = newThird)
}
