package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Viterbi segmentation of a character block under a unigram-LM piece
  * vocabulary (Kudo, ACL'18 — the SentencePiece model family): the
  * per-row DP kernel of [[graft.operators.UnigramLm]], as ONE codegen
  * Catalyst node holding the vocabulary as a codegen reference object.
  *
  * The DP is imperative per row (position-indexed argmax with
  * backtracking — inexpressible as a `transform`/`aggregate` forest),
  * exactly the case for a custom Expression over a UDF: the generated
  * code calls a tight JVM kernel once per row, stays inside
  * whole-stage codegen, and the vocabulary rides the plan as a flat
  * reference object, so plan size is constant in vocab size.
  *
  * Numerical/semantic contract (bit-for-bit with the DuckDB oracle's
  * unrolled dp-CTE chain):
  *
  *  - scores are integer NANONATS: `logp9 * 1e9` of the vocabulary's
  *    `round(ln(cnt/total), 9)` decimal(18,9) log-probabilities — DP
  *    sums are exact Long arithmetic, no float reduction order;
  *  - pieces are 1..`maxPieceLen` CODE POINTS (DuckDB `substr` counts
  *    code points; the kernel indexes code-point boundaries, not
  *    UTF-16 units);
  *  - a code point absent from the vocabulary emits ITSELF as an UNK
  *    piece at the fixed score [[graft.operators.UnigramLm.UnkLogp9Nano]]
  *    — only when absent, so the unk candidate can never tie a real
  *    single-char piece;
  *  - argmax tie-break at each position: higher total score, then
  *    LONGER last piece. (A same-length candidate at one position is
  *    the same substring, so a third key can never fire; the oracle
  *    carries `piece ASC` as a harmless belt.)
  *
  * Returns the segmentation as a space-joined piece string ("pc pc
  * pc") — counts and scores derive downstream by `split`/`explode`
  * against the score table, keeping this node's output primitive and
  * the oracle twin a plain string comparison.
  */
object UnigramViterbi {

  /** Column API: segment `block` under the (piece, nanonat-score)
    * vocabulary. `maxPieceLen` must match the vocabulary's longest
    * piece bound (shorter is wrong, longer only wastes lookups).
    */
  def segment(
      block: Column,
      pieces: Seq[(String, Long)],
      maxPieceLen: Int,
      unkNano: Long): Column = {
    require(pieces.nonEmpty, "empty unigram vocabulary")
    graftbridge.column(UnigramViterbiExpr(
      graftbridge.expression(block),
      pieces.map(_._1).toArray, pieces.map(_._2).toArray,
      maxPieceLen, unkNano))
  }
}

/** See [[UnigramViterbi.segment]]. */
case class UnigramViterbiExpr(
    child: Expression,
    pieces: Array[String],
    scores: Array[Long],
    maxPieceLen: Int,
    unkNano: Long)
    extends UnaryExpression {

  @transient private lazy val vocabMap: java.util.HashMap[String, java.lang.Long] = {
    val m = new java.util.HashMap[String, java.lang.Long](pieces.length * 2)
    var i = 0
    while (i < pieces.length) { m.put(pieces(i), scores(i)); i += 1 }
    m
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires string, got ${other.simpleString}")
  }

  override def dataType: DataType = StringType
  override def prettyName: String = "unigram_viterbi"

  override protected def nullSafeEval(input: Any): Any =
    UnigramViterbiExpr.segment(
      input.asInstanceOf[UTF8String], vocabMap, maxPieceLen, unkNano)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val vm = ctx.addReferenceObj("vocab", vocabMap, "java.util.HashMap")
    nullSafeCodeGen(ctx, ev, b => {
      s"${ev.value} = graft.functions.UnigramViterbiExpr.segment(" +
        s"$b, $vm, $maxPieceLen, ${unkNano}L);"
    })
  }

  override protected def withNewChildInternal(newChild: Expression): UnigramViterbiExpr =
    copy(child = newChild)
}

object UnigramViterbiExpr {

  /** Shared interpreted/codegen kernel: blocked Viterbi over code
    * points. See the contract on [[UnigramViterbi]].
    */
  def segment(
      block: UTF8String,
      vocab: java.util.HashMap[String, java.lang.Long],
      maxPieceLen: Int,
      unkNano: Long): UTF8String = {
    val s = block.toString
    // code-point boundaries: off(i) = UTF-16 offset of code point i
    val n = s.codePointCount(0, s.length)
    if (n == 0) return UTF8String.EMPTY_UTF8
    val off = new Array[Int](n + 1)
    var i = 0
    var u = 0
    while (i < n) { off(i) = u; u = s.offsetByCodePoints(u, 1); i += 1 }
    off(n) = s.length
    val dp = new Array[Long](n + 1)
    val fromLen = new Array[Int](n + 1)
    val fromPiece = new Array[String](n + 1)
    var j = 1
    while (j <= n) {
      var best = Long.MinValue
      var bestL = 0
      var bestPiece: String = null
      val maxL = math.min(maxPieceLen, j)
      var L = 1
      while (L <= maxL) {
        val piece = s.substring(off(j - L), off(j))
        val sc = vocab.get(piece)
        if (sc != null) {
          val tot = dp(j - L) + sc.longValue()
          // tie-break: longer piece wins; L ascends, so strict > on a
          // later L only replaces on a strictly better score — use >=
          // for score so equal-score longer pieces win
          if (tot > best || (tot == best && L > bestL)) {
            best = tot; bestL = L; bestPiece = piece
          }
        }
        L += 1
      }
      // unk candidate: single code point absent from the vocabulary
      // (only then, so it can never tie a real single-char piece)
      val ch = s.substring(off(j - 1), off(j))
      if (!vocab.containsKey(ch)) {
        val tot = dp(j - 1) + unkNano
        if (tot > best || (tot == best && 1 > bestL)) {
          best = tot; bestL = 1; bestPiece = ch
        }
      }
      dp(j) = best
      fromLen(j) = bestL
      fromPiece(j) = bestPiece
      j += 1
    }
    // backtrack
    var cnt = 0
    var p = n
    while (p > 0) { cnt += 1; p -= fromLen(p) }
    val out = new Array[String](cnt)
    p = n
    var k = cnt - 1
    while (p > 0) { out(k) = fromPiece(p); k -= 1; p -= fromLen(p) }
    UTF8String.fromString(out.mkString(" "))
  }
}
