package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Fused hashed-classifier scoring expression — the codegen form of
  * `QualityClassifier.scoreHashedExprMicro`'s per-row gate.
  *
  * The gate was previously a higher-order `aggregate` over the token
  * array: correct, but HOFs run interpreted (no whole-stage codegen)
  * and build a per-token expression forest — tokenize → md5 → 8×
  * locate/substring hex parse → array lookup — that measured ~3× the
  * cost of the codegen'd explode path on the same corpus (PLANS.md
  * round-14). This is ONE Catalyst node holding the weight array as a
  * codegen reference object; the generated code calls a tight JVM
  * kernel that tokenizes the UTF8 bytes in place and hashes each token
  * once.
  *
  * Numerical contract (bit-for-bit with the HOF form, the groupBy
  * scorer `scoreHashedWithWeightsMicro`, and the DuckDB oracle replay):
  *
  *  - tokens are `filter(split(lower(text), " "), _ != "")` — the
  *    kernel lowercases via `UTF8String.toLowerCase` (exactly Spark's
  *    `lower`) and scans for 0x20 byte boundaries, equivalent to the
  *    single-space regex split because 0x20 cannot occur inside a
  *    UTF-8 multi-byte sequence;
  *  - `bucket(t) = hexPrefix(md5(seed || t)) % buckets`, where the
  *    8-hex-char prefix parse equals the unsigned big-endian int of
  *    the digest's first 4 bytes;
  *  - `raw = bias + Σ w(bucket)` in exact Long arithmetic (order-free);
  *  - `score_micro = sign(raw) · (|raw|·10⁶ + d div 2) div d` with
  *    `d = 1000·max(dl, 1)` — Long fast path, BigInteger fallback past
  *    the overflow bound (the decimal(38,0) widening of `finishMicro`,
  *    reproduced exactly).
  */
object HashedMicroScore {

  /** Column API: exact integer micro-unit score of `text` under the
    * trained hashed model — one codegen node, no explode, no shuffle.
    */
  def scoreMicro(
      text: Column,
      weightsMilli: Seq[Long],
      biasMilli: Long,
      seed: String): Column = {
    require(weightsMilli.nonEmpty, "empty weight array")
    graftbridge.column(HashedMicroScoreExpr(
      graftbridge.expression(text), weightsMilli, biasMilli, seed))
  }
}

/** See [[HashedMicroScore.scoreMicro]]. */
case class HashedMicroScoreExpr(
    child: Expression,
    weightsMilli: Seq[Long],
    biasMilli: Long,
    seed: String)
    extends UnaryExpression {

  @transient private lazy val wArr: Array[Long] = weightsMilli.toArray
  @transient private lazy val seedBytes: Array[Byte] =
    seed.getBytes(java.nio.charset.StandardCharsets.UTF_8)

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "hashed_micro_score"

  override protected def nullSafeEval(input: Any): Any =
    HashedMicroScoreExpr.score(
      input.asInstanceOf[UTF8String], wArr, biasMilli, seedBytes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val w = ctx.addReferenceObj("weights", wArr, "long[]")
    val sb = ctx.addReferenceObj("seedBytes", seedBytes, "byte[]")
    nullSafeCodeGen(ctx, ev, t => {
      s"${ev.value} = graft.functions.HashedMicroScoreExpr.score($t, $w, ${biasMilli}L, $sb);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): HashedMicroScoreExpr =
    copy(child = newChild)
}

object HashedMicroScoreExpr {

  // MessageDigest is stateful; one instance per thread, reset per token
  private val md5 = ThreadLocal.withInitial[MessageDigest](() =>
    MessageDigest.getInstance("MD5"))

  /** Shared interpreted/codegen kernel. */
  def score(
      text: UTF8String, w: Array[Long], bias: Long, seed: Array[Byte]): Long = {
    val bytes = text.toLowerCase.getBytes
    val digest = md5.get()
    val buckets = w.length
    var raw = bias
    var dl = 0L
    var i = 0
    val n = bytes.length
    while (i <= n) {
      var j = i
      while (j < n && bytes(j) != 0x20) j += 1
      if (j > i) { // non-empty token [i, j)
        digest.reset()
        digest.update(seed)
        digest.update(bytes, i, j - i)
        val d = digest.digest()
        val h = (((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL))
        raw += w((h % buckets).toInt)
        dl += 1L
      }
      i = j + 1
    }
    val den = 1000L * math.max(dl, 1L)
    val half = den / 2L
    val absRaw = math.abs(raw)
    val sign = if (raw < 0L) -1L else 1L
    if (absRaw <= (Long.MaxValue - half) / 1000000L)
      sign * ((absRaw * 1000000L + half) / den)
    else
      sign * java.math.BigInteger.valueOf(absRaw)
        .multiply(java.math.BigInteger.valueOf(1000000L))
        .add(java.math.BigInteger.valueOf(half))
        .divide(java.math.BigInteger.valueOf(den))
        .longValueExact()
  }
}
