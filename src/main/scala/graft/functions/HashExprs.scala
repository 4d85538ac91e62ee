package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, UnaryExpression, UnsafeArrayData, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graft.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, IntegerType, LongType}

/** Native Catalyst expressions for dedup signature kernels.
  *
  * The MinHash/SimHash signatures were first written as higher-order
  * function chains (`transform`/`aggregate`/`zip_with`); HOFs are
  * interpreted (CodegenFallback) and these kernels are O(perms ×
  * shingles) / O(64 × tokens) per row, so at corpus scale the lambda
  * interpreter dominates the scan. Each expression here generates (and
  * interprets, for the fallback path) one tight primitive loop —
  * identical arithmetic to the HOF originals, so signatures and every
  * downstream LSH bucket stay bit-for-bit the same.
  */

/** minhash_sig(sh_hashes, numPerms): for permutation p, min over
  * shingle hashes h of  ((h mod M) * (2p+1) + p*2654435761) mod M
  * with M = 2^31-1 (Mersenne prime) — exactly the HOF version in
  * Dedup.shingled. Returns null for an empty array (array_min of an
  * empty array is null in the HOF original).
  */
case class MinHashSignature(child: Expression, numPerms: Int)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "graft_minhash_sig"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    if (n == 0) return null
    val out = new Array[Long](numPerms)
    val M = 2147483647L
    var p = 0
    while (p < numPerms) {
      val ca = 2L * p + 1L
      val cb = p.toLong * 2654435761L
      var mn = Long.MaxValue
      var i = 0
      while (i < n) {
        var r = arr.getLong(i) % M
        if (r < 0) r += M
        val v = (r * ca + cb) % M
        if (v < mn) mn = v
        i += 1
      }
      out(p) = mn
      p += 1
    }
    UnsafeArrayData.fromPrimitiveArray(out)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val out = ctx.freshName("out")
      val p = ctx.freshName("p"); val i = ctx.freshName("i")
      val ca = ctx.freshName("ca"); val cb = ctx.freshName("cb")
      val mn = ctx.freshName("mn"); val r = ctx.freshName("r")
      val v = ctx.freshName("v")
      s"""
         |int $n = $a.numElements();
         |if ($n == 0) { ${ev.isNull} = true; } else {
         |  long[] $out = new long[$numPerms];
         |  for (int $p = 0; $p < $numPerms; $p++) {
         |    long $ca = 2L * $p + 1L;
         |    long $cb = ((long) $p) * 2654435761L;
         |    long $mn = Long.MAX_VALUE;
         |    for (int $i = 0; $i < $n; $i++) {
         |      long $r = $a.getLong($i) % 2147483647L;
         |      if ($r < 0) $r += 2147483647L;
         |      long $v = ($r * $ca + $cb) % 2147483647L;
         |      if ($v < $mn) $mn = $v;
         |    }
         |    $out[$p] = $mn;
         |  }
         |  ${ev.value} = org.apache.spark.sql.catalyst.expressions.UnsafeArrayData.fromPrimitiveArray($out);
         |}
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** simhash64(tokens): xxhash64 (seed 42, same as the built-in) each
  * token, vote per bit (+1 if set, −1 if clear), emit the 64-bit
  * majority word — exactly the `aggregate`/`zip_with` chain it
  * replaces, in one pass over the tokens.
  */
case class SimHash64(child: Expression) extends UnaryExpression with Serializable {
  override def prettyName: String = "graft_simhash64"
  override def dataType: DataType = LongType

  override def nullSafeEval(input: Any): Any = {
    val arr = input.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val counts = new Array[Int](64)
    var i = 0
    while (i < n) {
      val h = XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var j = 0
      while (j < 64) {
        if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
        j += 1
      }
      i += 1
    }
    var res = 0L
    var j = 0
    while (j < 64) { if (counts(j) > 0) res |= 1L << j; j += 1 }
    res
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a => {
      val n = ctx.freshName("n"); val counts = ctx.freshName("counts")
      val i = ctx.freshName("i"); val j = ctx.freshName("j")
      val h = ctx.freshName("h"); val res = ctx.freshName("res")
      s"""
         |int $n = $a.numElements();
         |int[] $counts = new int[64];
         |for (int $i = 0; $i < $n; $i++) {
         |  long $h = org.apache.spark.sql.catalyst.expressions.XXH64.hashUTF8String($a.getUTF8String($i), 42L);
         |  for (int $j = 0; $j < 64; $j++) {
         |    if ((($h >> $j) & 1L) == 1L) $counts[$j]++; else $counts[$j]--;
         |  }
         |}
         |long $res = 0L;
         |for (int $j = 0; $j < 64; $j++) { if ($counts[$j] > 0) $res |= 1L << $j; }
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** shingle_hashes(tokens, n): distinct xxhash64 (seed 42) values of
  * the space-joined word n-gram shingles, first-occurrence order —
  * exactly `array_distinct(transform(shingles, xxhash64))` over
  * `concat_ws(' ', toks[i..i+n-1])` windows, with the `size < n`
  * degenerate case hashing the whole space-joined token string (equal
  * to the original `array(norm)` branch: the tokens came from a
  * single-space split of norm, so the join reconstructs it).
  */
case class ShingleHashes(child: Expression, n: Int)
    extends UnaryExpression with Serializable {
  override def prettyName: String = "graft_shingle_hashes"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def nullSafeEval(input: Any): Any =
    ShingleHashes.compute(input.asInstanceOf[ArrayData], n)

  // Codegen is one static call: the per-row work is a JVM loop either
  // way; what matters is staying inside the generated consumer instead
  // of an interpreted HOF expression tree with per-element dispatch.
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.ShingleHashes.compute($a, $n);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ShingleHashes {
  private val space = org.apache.spark.unsafe.types.UTF8String.fromString(" ")

  def compute(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    val toks = new Array[org.apache.spark.unsafe.types.UTF8String](m)
    var i = 0
    while (i < m) { toks(i) = arr.getUTF8String(i); i += 1 }
    if (m < n) {
      val joined = org.apache.spark.unsafe.types.UTF8String.concatWs(space, toks: _*)
      return UnsafeArrayData.fromPrimitiveArray(
        Array(XXH64.hashUTF8String(joined, 42L)))
    }
    val seen = new java.util.HashSet[java.lang.Long](m * 2)
    val out = new Array[Long](m - n + 1)
    var k = 0
    i = 0
    while (i <= m - n) {
      val window = new Array[org.apache.spark.unsafe.types.UTF8String](n)
      var j = 0
      while (j < n) { window(j) = toks(i + j); j += 1 }
      val h = XXH64.hashUTF8String(
        org.apache.spark.unsafe.types.UTF8String.concatWs(space, window: _*), 42L)
      if (seen.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    UnsafeArrayData.fromPrimitiveArray(java.util.Arrays.copyOf(out, k))
  }
}

/** first_colliding_band(sigA, sigB): the minimum LSH band index b in
  * 0..7 where all 4 of the band's signature positions (4b..4b+3)
  * match, or 8 if no band matches. Drives FIRST-BAND-WINS pair
  * emission in Dedup.minhashPairs: a pair colliding in k bands is
  * emitted only from its minimum band, making the band self-join's
  * output exactly one row per pair — no post-join collapse. Written
  * native because this runs once per COLLISION row (≈ bands ×
  * pair-graph size — hundreds of millions at 100×) and the HOF
  * `filter(sequence(..))` form is interpreted per row; the generated
  * loop exits on the first matching band (near-identical docs, the
  * dominant collision source, exit at band 0).
  */
case class FirstCollidingBand(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "graft_first_colliding_band"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = a.asInstanceOf[ArrayData]; val sb = b.asInstanceOf[ArrayData]
    FirstCollidingBand.checkLength(sa.numElements(), sb.numElements())
    var band = 0
    while (band < 8) {
      val o = band * 4
      if (sa.getLong(o) == sb.getLong(o) &&
          sa.getLong(o + 1) == sb.getLong(o + 1) &&
          sa.getLong(o + 2) == sb.getLong(o + 2) &&
          sa.getLong(o + 3) == sb.getLong(o + 3)) return band
      band += 1
    }
    8
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val band = ctx.freshName("band"); val o = ctx.freshName("o")
      val res = ctx.freshName("res")
      s"""
         |graft.functions.FirstCollidingBand.checkLength($a.numElements(), $b.numElements());
         |int $res = 8;
         |for (int $band = 0; $band < 8; $band++) {
         |  int $o = $band * 4;
         |  if ($a.getLong($o) == $b.getLong($o) &&
         |      $a.getLong($o + 1) == $b.getLong($o + 1) &&
         |      $a.getLong($o + 2) == $b.getLong($o + 2) &&
         |      $a.getLong($o + 3) == $b.getLong($o + 3)) { $res = $band; break; }
         |}
         |${ev.value} = $res;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FirstCollidingBand {
  /** The expression reads positions 0..31 of both signatures, and it is
    * SQL-registered (graft_first_colliding_band), so a caller CAN hand
    * it shorter arrays — without this guard that is an unchecked
    * out-of-bounds read on UnsafeArrayData (garbage or a JVM crash),
    * while the sibling kernels (SigMatchCount, IntersectCount) all
    * bound their loops by numElements. Internal callers always pass
    * 32-long MinHash signatures, so the branch never fires in-engine
    * and costs two loads per row.
    */
  def checkLength(na: Int, nb: Int): Unit =
    if (na < 32 || nb < 32)
      throw new IllegalArgumentException(
        s"graft_first_colliding_band requires two signatures of length >= 32, got $na and $nb")
}

/** first_matching_chunk(simA, simB): the minimum PAIR-BAND index k in
  * 0..14 where the two 64-bit SimHash words agree on every bit of BOTH
  * chunks of pair k, or 15 if no pair band matches. The layout is 6
  * chunks of 11/11/11/11/10/10 bits (starts 0,11,22,33,44,54); the 15
  * bands are the C(6,2) ordered chunk pairs enumerated (0,1),(0,2),…,
  * (4,5). Drives FIRST-BAND-WINS emission in Dedup.ddSimhash (round
  * 14 — the [[FirstCollidingBand]] pattern on packed words): a pair
  * sharing several bands is emitted only at its minimum band, so the
  * band-key self-join outputs each candidate pair exactly once.
  *
  * WHY pair bands: hamming ≤ 4 dirties at most 4 of the 6 chunks, so
  * every pair at the verify threshold has ≥ 2 clean chunks — i.e. at
  * least one clean PAIR band (pigeonhole; exact recall at τ ≤ 4,
  * closing the r13 asymmetry where 4×16 single-chunk banding was
  * exact only to ≤ 3). The 21-22-bit composite keys are what keep
  * candidate volume down on a clustered corpus: measured at 25× over
  * 69k distinct signatures, single 13-bit chunks (exactness minimum
  * for τ=4 at 5 bands) put 137M value pairs through the join predicate
  * where the pair bands admit 35M; 8-bit chunks were 10× worse still
  * (~75M probes at doc level, 110 s end-to-end). Early exit at band 0
  * for identical signatures.
  */
case class FirstMatchingChunk(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes with Serializable {
  override def prettyName: String = "graft_first_matching_chunk"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable
  // SQL-registered (graft_first_matching_chunk): without declared input
  // types an external caller passing non-bigint args compiles garbage
  // codegen and then ClassCastExceptions in the interpreted path — the
  // same external-caller hardening FirstCollidingBand's checkLength does
  // for array bounds, done here at analysis time where it belongs
  override def inputTypes: Seq[DataType] = Seq(LongType, LongType)

  override def nullSafeEval(a: Any, b: Any): Any =
    FirstMatchingChunk.compute(a.asInstanceOf[Long], b.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.FirstMatchingChunk.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object FirstMatchingChunk {
  /** (start, width) of the 6 chunks over the 64-bit word. */
  val chunks: IndexedSeq[(Int, Int)] =
    IndexedSeq((0, 11), (11, 11), (22, 11), (33, 11), (44, 10), (54, 10))
  /** The 15 ordered chunk pairs, band k = pairs(k). */
  val pairs: IndexedSeq[(Int, Int)] =
    for { i <- 0 until 6; j <- (i + 1) until 6 } yield (i, j)
  private val pi = pairs.map(_._1).toArray
  private val pj = pairs.map(_._2).toArray
  // chunk starts/widths flattened to primitive arrays: compute() runs
  // once per band-key join probe (tens of millions per sweep), and
  // destructuring boxed (Int, Int) tuples from the IndexedSeq there
  // costs real allocations in the candidate hot loop
  private val chunkStart = chunks.map(_._1).toArray
  private val chunkMask = chunks.map { case (_, w) => (1L << w) - 1L }.toArray

  def compute(a: Long, b: Long): Int = {
    val x = a ^ b
    // cleanliness bitmap of the 6 chunks, one pass
    var clean = 0
    var c = 0
    while (c < 6) {
      if (((x >>> chunkStart(c)) & chunkMask(c)) == 0L) clean |= 1 << c
      c += 1
    }
    var k = 0
    while (k < 15) {
      if ((clean & (1 << pi(k))) != 0 && (clean & (1 << pj(k))) != 0) return k
      k += 1
    }
    15
  }
}

/** sig_match_count(sigA, sigB): number of equal positions between two
  * equal-length signatures — the numerator of the MinHash Jaccard
  * estimate. Replaces the interpreted `aggregate(zip_with(...))` HOF
  * in pair emission (once per emitted pair; tens of millions of rows
  * at 100×) with one generated loop. Same arithmetic, bit-identical
  * estimates.
  */
case class SigMatchCount(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "graft_sig_match_count"
  override def dataType: DataType = IntegerType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any = {
    val sa = a.asInstanceOf[ArrayData]; val sb = b.asInstanceOf[ArrayData]
    val n = math.min(sa.numElements(), sb.numElements())
    var c = 0; var i = 0
    while (i < n) { if (sa.getLong(i) == sb.getLong(i)) c += 1; i += 1 }
    c
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n"); val c = ctx.freshName("c")
      val i = ctx.freshName("i")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |int $c = 0;
         |for (int $i = 0; $i < $n; $i++) {
         |  if ($a.getLong($i) == $b.getLong($i)) $c++;
         |}
         |${ev.value} = $c;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** intersect_count(a, b): |a ∩ b| for two DISTINCT-element long
  * arrays — bit-equal to `size(array_intersect(a, b))` on such inputs
  * (spec-pinned), without materializing the intersection array; the
  * union size then derives arithmetically as |a| + |b| − |∩|, so a
  * Jaccard/containment verify allocates ONE flat long table per pair
  * where the array_intersect + array_union form builds two boxed hash
  * sets and two output arrays. Written native because this runs once
  * per VERIFIED
  * CANDIDATE PAIR — the dominant per-pair cost of the exact-verify
  * family (dd_pair_quality*, dd_ngram_jaccard, dd_containment):
  * tens of millions of pairs × ~100-element arrays at 100×. The
  * smaller side builds one open-addressing long set (power-of-two
  * capacity ≥ 2n, linear probing, 0 reserved as the empty slot with
  * a scalar escape — shingle hashes are xxhash64 values, 0 occurs
  * with p = 2⁻⁶⁴ per element); the larger side probes. DISTINCTNESS
  * of the probe side is what makes hit-counting exact — guaranteed
  * by [[ShingleHashes]] (first-occurrence dedup at construction).
  */
case class IntersectCount(left: Expression, right: Expression)
    extends BinaryExpression with Serializable {
  override def prettyName: String = "graft_intersect_count"
  override def dataType: DataType = LongType
  override def nullable: Boolean = left.nullable || right.nullable

  override def nullSafeEval(a: Any, b: Any): Any =
    IntersectCount.compute(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntersectCount.compute($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object IntersectCount {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val (small, large) =
      if (a.numElements() <= b.numElements()) (a, b) else (b, a)
    val n = small.numElements()
    if (n == 0) return 0L
    // the function is SQL-registered, so guard the open table against
    // a pathological single-row array: past 2^29 elements the
    // power-of-two capacity would overflow Int (and a 2× table would
    // be ≥8 GiB); count via a boxed set instead of looping forever
    if (n >= (1 << 29)) {
      val set = new java.util.HashSet[java.lang.Long](1 << 20)
      var i = 0
      while (i < n) { set.add(small.getLong(i)); i += 1 }
      var c = 0L; var j = 0
      val m = large.numElements()
      while (j < m) { if (set.contains(large.getLong(j))) c += 1; j += 1 }
      return c
    }
    var cap = 2
    while (cap < n * 2) cap <<= 1
    val mask = cap - 1
    val table = new Array[Long](cap) // 0 = empty slot
    var hasZero = false
    var i = 0
    while (i < n) {
      val v = small.getLong(i)
      if (v == 0L) hasZero = true
      else {
        var idx = java.lang.Long.hashCode(v) & mask
        while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & mask
        table(idx) = v
      }
      i += 1
    }
    var c = 0L
    val m = large.numElements()
    var j = 0
    while (j < m) {
      val v = large.getLong(j)
      if (v == 0L) { if (hasZero) c += 1 }
      else {
        var idx = java.lang.Long.hashCode(v) & mask
        while (table(idx) != 0L && table(idx) != v) idx = (idx + 1) & mask
        if (table(idx) == v) c += 1
      }
      j += 1
    }
    c
  }
}

object HashFunctions {
  def minhashSig(hashes: Column, numPerms: Int): Column =
    Bridge.column(MinHashSignature(Bridge.expression(hashes), numPerms))

  def firstCollidingBand(a: Column, b: Column): Column =
    Bridge.column(FirstCollidingBand(Bridge.expression(a), Bridge.expression(b)))

  def firstMatchingChunk(a: Column, b: Column): Column =
    Bridge.column(FirstMatchingChunk(Bridge.expression(a), Bridge.expression(b)))

  def sigMatchCount(a: Column, b: Column): Column =
    Bridge.column(SigMatchCount(Bridge.expression(a), Bridge.expression(b)))

  def intersectCount(a: Column, b: Column): Column =
    Bridge.column(IntersectCount(Bridge.expression(a), Bridge.expression(b)))

  def simhash64(tokens: Column): Column =
    Bridge.column(SimHash64(Bridge.expression(tokens)))

  def shingleHashes(tokens: Column, n: Int): Column =
    Bridge.column(ShingleHashes(Bridge.expression(tokens), n))
}
