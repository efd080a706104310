package graft.expr

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Native Catalyst expression: the K-permutation MinHash signature of a
  * shingle-hash set in one fused, codegen'd double loop.
  *
  * Replaces the declarative fold in [[graft.ext.Dedup.signaturesOf]]
  *
  * {{{
  *   aggregate(
  *     transform(shashes, h -> transform(sequence(0, K-1),
  *       i -> ((2i+1) * (h % M) + i * 2654435761) % M)),
  *     array_repeat(MaxLong, K),
  *     (acc, x) -> zip_with(acc, x, least))
  * }}}
  *
  * which Spark evaluates as INTERPRETED lambdas (higher-order functions
  * never enter whole-stage codegen) and which allocates a K-element
  * intermediate array per shingle. The fused loop allocates one long[K]
  * per document, runs inside codegen, and performs the identical integer
  * arithmetic in the identical order — Long ops are exact, so the
  * signature is bit-for-bit the HOF fold's (ExtensionSpec pins this) and
  * the DuckDB oracle twin is untouched.
  *
  * Semantics matched to the HOF form exactly:
  *   - empty input → array_repeat(MaxLong, K) (the fold's init value);
  *   - null elements are skipped (zip_with's `least(acc, null)` keeps acc).
  */
case class MinHashSig(child: Expression, k: Int, m: Long)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable
  override def prettyName: String = "graft_minhash"

  /** The salt 2654435761 is Knuth's 2^32/φ multiplicative-hash constant —
    * the same one the HOF fold and the DuckDB oracle use.
    */
  private val SALT = 2654435761L

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires array<bigint> input, got ${other.catalogString}")
  }

  override def nullSafeEval(a: Any): Any = {
    val xs = a.asInstanceOf[ArrayData]
    val n = xs.numElements()
    val acc = Array.fill(k)(Long.MaxValue)
    var j = 0
    while (j < n) {
      if (!xs.isNullAt(j)) {
        val hm = xs.getLong(j) % m
        var i = 0
        while (i < k) {
          val v = ((2 * i + 1) * hm + i * SALT) % m
          if (v < acc(i)) acc(i) = v
          i += 1
        }
      }
      j += 1
    }
    new GenericArrayData(acc)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val j = ctx.freshName("j")
      val hm = ctx.freshName("hm")
      val v = ctx.freshName("v")
      val acc = ctx.freshName("acc")
      // classOf keeps the generated reference compile-time-checked — a
      // hand-typed package path here once sent every MinHash query to the
      // interpreted fallback via a Janino CompileException (caught by
      // ExtensionSpec's fallback=false pin)
      val uad =
        classOf[org.apache.spark.sql.catalyst.expressions.UnsafeArrayData].getName
      s"""
         |int $n = $a.numElements();
         |long[] $acc = new long[$k];
         |java.util.Arrays.fill($acc, Long.MAX_VALUE);
         |for (int $j = 0; $j < $n; $j++) {
         |  if (!$a.isNullAt($j)) {
         |    long $hm = $a.getLong($j) % ${m}L;
         |    for (int $i = 0; $i < $k; $i++) {
         |      long $v = ((2L * $i + 1L) * $hm + $i * ${SALT}L) % ${m}L;
         |      if ($v < $acc[$i]) $acc[$i] = $v;
         |    }
         |  }
         |}
         |${ev.value} = $uad.fromPrimitiveArray($acc);
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object MinHashSig {
  /** Canonical engine parameters — [[graft.ext.Dedup]] derives its K/M
    * from here so the SQL registration and the operator library can
    * never drift apart.
    */
  val K = 32
  val M: Long = 1L << 40
}
