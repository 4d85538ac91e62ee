package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Native text-analysis kernels.
  *
  * tx_tokens' BPE-ish token count was `regexp_count(text,
  * '[a-z]+|[0-9]+|[^a-z0-9 ]')` — an interpreted java.util.regex
  * scan per row, the canonical bottleneck shape at corpus scale
  * (the reference tokenizes every statement line the same way,
  * `extractors/purchase_confirm_extractor.py:35-200`). The kernel
  * below is the same automaton hand-rolled: one pass, no backtracking
  * machinery, no per-match allocation.
  */
object TextKernels {
  /** Non-overlapping match count of `[a-z]+|[0-9]+|[^a-z0-9 ]` scanning
    * left to right — bit-identical to java.util.regex semantics: letter
    * and digit RUNS count once, any other code point (incl. above-BMP,
    * matched per code point by a negated class) counts once, spaces
    * separate.
    */
  def bpeTokenCount(s: UTF8String): Long = {
    val str = s.toString
    val n = str.length
    var i = 0
    var cnt = 0L
    while (i < n) {
      val c = str.charAt(i)
      if (c >= 'a' && c <= 'z') {
        cnt += 1; i += 1
        while (i < n && { val x = str.charAt(i); x >= 'a' && x <= 'z' }) i += 1
      } else if (c >= '0' && c <= '9') {
        cnt += 1; i += 1
        while (i < n && { val x = str.charAt(i); x >= '0' && x <= '9' }) i += 1
      } else if (c == ' ') {
        i += 1
      } else {
        cnt += 1
        i += Character.charCount(str.codePointAt(i))
      }
    }
    cnt
  }

  /** Max multiplicity of any element — one hashmap pass. UTF8String
    * implements equals/hashCode over the bytes, so map keys are exact
    * token identity (the same equality `array_sort` + equal-run uses).
    * NULL elements are skipped, matching the sorted-run HOF twin
    * (array_sort pushes nulls to a run the fold never counts) — the
    * function is SQL-exposed, so arbitrary arrays can reach it.
    */
  def tokenModeCount(arr: org.apache.spark.sql.catalyst.util.ArrayData): Long = {
    val n = arr.numElements()
    if (n == 0) return 0L
    val counts = new java.util.HashMap[UTF8String, java.lang.Long](n * 2)
    var best = 0L
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        val t = arr.getUTF8String(i)
        val prev = counts.get(t)
        val c = if (prev == null) 1L else prev.longValue() + 1L
        counts.put(t, c)
        if (c > best) best = c
      }
      i += 1
    }
    best
  }
}

/** graft_token_count(text) — codegen'd single-pass twin of the regex
  * token counter (TextKernels.bpeTokenCount; the generated code calls
  * the same static kernel the interpreted path uses, so both paths are
  * one implementation).
  */
case class BpeTokenCount(child: Expression)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "graft_token_count"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextKernels.bpeTokenCount(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.bpeTokenCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** graft_token_mode_count(tokens) — the count of the most frequent
  * token in the array (the "top token" of the repetition filters).
  * The HOF formulation (array_sort + an `aggregate` fold tracking the
  * longest equal-run) is interpreted per element; this kernel is one
  * hashmap pass over the tokens — same value by definition (the max
  * run of a sorted array IS the max multiplicity), pinned by a
  * bit-parity spec against the HOF twin. Empty array → 0.
  */
case class TokenModeCount(child: Expression)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "graft_token_mode_count"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any =
    TextKernels.tokenModeCount(
      input.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.functions.TextKernels.tokenModeCount($c)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TextFunctions {
  def bpeTokenCount(c: Column): Column =
    Bridge.column(BpeTokenCount(Bridge.expression(c)))

  def tokenModeCount(c: Column): Column =
    Bridge.column(TokenModeCount(Bridge.expression(c)))
}
