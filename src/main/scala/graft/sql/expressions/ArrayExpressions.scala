package graft.sql.expressions

import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst kernels for the LLM-pipeline hot paths.
  *
  * The composed higher-order-function versions (`aggregate(zip_with(…))`,
  * per-bit `aggregate` passes, per-permutation `transform` + `array_min`)
  * are interpreted per element per row — at sf0.1 they dominated the whole
  * bench (simhash 41 s, all-pairs cosine 65 s). These expressions compute
  * the same values in tight JVM loops and stay inside whole-stage codegen
  * (`doGenCode` emits one static call). Numeric semantics are preserved
  * exactly: [[ArrayKernels.dot]] folds in array order, so IEEE addition
  * order — and therefore the DuckDB-oracle hash match — is unchanged.
  */
object ArrayKernels {
  /** Morton interleave: bit i of x → 2i, bit i of y → 2i+1, i < bits. */
  def zInterleave(x: Long, y: Long, bits: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < bits) {
      acc |= ((x >> i) & 1L) << (2 * i)
      acc |= ((y >> i) & 1L) << (2 * i + 1)
      i += 1
    }
    acc
  }

  /** 3-D Morton interleave: bit i of x → 3i, of y → 3i+1, of z → 3i+2,
    * i < bits (bits ≤ 20 keeps the result under 2⁶⁰) — the multi-column
    * OPTIMIZE ZORDER case: most production layouts cluster on three keys
    * (e.g. tenant, date-bucket, entity), not two. */
  def zInterleave3(x: Long, y: Long, z: Long, bits: Int): Long = {
    var acc = 0L
    var i = 0
    while (i < bits) {
      acc |= ((x >> i) & 1L) << (3 * i)
      acc |= ((y >> i) & 1L) << (3 * i + 1)
      acc |= ((z >> i) & 1L) << (3 * i + 2)
      i += 1
    }
    acc
  }

  /** Hilbert-curve distance of cell (x, y) on the 2^bits × 2^bits grid
    * (the classic xy2d bit loop — public domain, e.g. Wikipedia
    * "Hilbert curve"). Unlike the Morton z-value, consecutive Hilbert
    * distances are always Manhattan-adjacent cells — no diagonal jumps
    * across the grid — so range-partitioning on it yields strictly
    * tighter per-file bounding boxes (KernelSpec pins the adjacency
    * property). The quadrant XOR (3·rx)⊕ry is written as the CASE
    * `rx == 0 ? ry : 3 − ry` so the SQL fold forms (Spark AND DuckDB,
    * which has no BIGINT ^) share the identical arithmetic. */
  def hilbertD(x0: Long, y0: Long, bits: Int): Long = {
    // mask to the low `bits` bits (the modulo-2^bits truncation
    // zInterleave applies implicitly): an unmasked coordinate ≥ 2^bits
    // leaks its high bits through the `s − 1 − y` rotation and silently
    // breaks the curve's adjacency property
    val mask = (1L << bits) - 1
    var x = x0 & mask
    var y = y0 & mask
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) > 0) 1L else 0L
      val ry = if ((y & s) > 0) 1L else 0L
      d += s * s * (if (rx == 0) ry else 3 - ry)
      if (ry == 0) { // rotate: flip (when rx=1) then transpose
        val nx = if (rx == 1) s - 1 - y else y
        val ny = if (rx == 1) s - 1 - x else x
        x = nx
        y = ny
      }
      s >>= 1
    }
    d
  }

  /** Sequential-order dot product of two double arrays (length = min). */
  def dot(a: ArrayData, b: ArrayData): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  /** 60-bit SimHash of pre-hashed tokens: bit j set iff the ±1 majority
    * over token-hash bits j is positive (same per-bit rule as the
    * composed TextOps expression and the DuckDB oracle). */
  def simhash60(hs: ArrayData): Long = {
    val n = hs.numElements()
    val counters = new Array[Int](60)
    var t = 0
    while (t < n) {
      val h = hs.getLong(t)
      var j = 0
      while (j < 60) {
        counters(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < 60) {
      if (counters(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** `bits`-wide SimHash — the same ±1 majority rule as [[simhash60]],
    * parameterized for full-range 64-bit token hashes (xxhash64): the
    * production-radius config, where pigeonhole blocks are 16 bits wide.
    * No oracle portability needed (the 60-bit md5 path keeps that role). */
  def simhashBits(hs: ArrayData, bits: Int): Long = {
    val n = hs.numElements()
    val counters = new Array[Int](bits)
    var t = 0
    while (t < n) {
      val h = hs.getLong(t)
      var j = 0
      while (j < bits) {
        counters(j) += (((h >>> j) & 1L).toInt << 1) - 1
        j += 1
      }
      t += 1
    }
    var out = 0L
    var j = 0
    while (j < bits) {
      if (counters(j) > 0) out |= (1L << j)
      j += 1
    }
    out
  }

  /** Feature-hashing (hashing-trick) projection of token hashes into a
    * `dim`-bucket signed-count vector: bucket = floorMod(h, dim) — always
    * in [0, dim) even for negative hashes (Java `%` would go negative and
    * index out of bounds; TextOps only feeds non-negative 60-bit hashes,
    * where floorMod == %, but the SQL function accepts any BIGINT) — and
    * sign = bit 59 of h (±1). One pass over the tokens; integer counts, so
    * the result is exactly reproducible in any engine with the same hash. */
  def featureHash(hs: ArrayData, dim: Int): ArrayData = {
    val v = new Array[Long](dim)
    val n = hs.numElements()
    var i = 0
    while (i < n) {
      val h = hs.getLong(i)
      val sign = if (((h >>> 59) & 1L) == 1L) 1L else -1L
      v(java.lang.Math.floorMod(h, dim.toLong).toInt) += sign
      i += 1
    }
    new GenericArrayData(v.map(x => x: Any))
  }

  /** One-pass int8-range quantization of a double array: returns
    * (qmin, qstep, codes) with codes_i = round((x_i − min)/step), step =
    * (max − min)/255 (0-step arrays quantize to all-zero codes). A single
    * O(dim) loop — the composed SQL version re-evaluated array_min/max
    * inside the per-element lambda after projection collapse, making it
    * O(dim²) per row. Math.round matches Spark's and DuckDB's half-up for
    * the non-negative operands here, so oracle hashes are unchanged. */
  def quantizeI8(v: ArrayData): org.apache.spark.sql.catalyst.InternalRow = {
    val n = v.numElements()
    var mn = Double.MaxValue
    var mx = Double.MinValue
    var i = 0
    while (i < n) {
      // a null, NaN or infinite element cannot quantize to a meaningful
      // code — raise rather than silently storing garbage (null slots read
      // as 0.0 through getDouble, NaN escapes min/max comparisons, and an
      // Inf bound makes step Inf — then (x−min)/step is NaN and
      // Math.round(NaN)=0 collapses every code to 0)
      if (v.isNullAt(i))
        throw new IllegalArgumentException(s"quantize_i8: null element at index $i")
      val x = v.getDouble(i)
      if (java.lang.Double.isNaN(x))
        throw new IllegalArgumentException(s"quantize_i8: NaN element at index $i")
      if (java.lang.Double.isInfinite(x))
        throw new IllegalArgumentException(s"quantize_i8: infinite element at index $i")
      if (x < mn) mn = x
      if (x > mx) mx = x
      i += 1
    }
    if (n == 0) { mn = 0.0; mx = 0.0 }
    val step = (mx - mn) / 255.0
    val codes = new Array[Any](n)
    i = 0
    while (i < n) {
      codes(i) =
        if (step == 0.0) 0
        else Math.round((v.getDouble(i) - mn) / step).toInt
      i += 1
    }
    new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
      Array[Any](mn, step, new GenericArrayData(codes)))
  }

  /** 2^60 — the Gear-hash modulus. Small enough that `2·h + g < 2^62`
    * never overflows a SIGNED 64-bit lane, so the same fold is expressible
    * in DuckDB BIGINT arithmetic (which raises on overflow instead of
    * wrapping); large enough that `h % modulus` boundary decisions are
    * unbiased for any practical chunking modulus. */
  val GearMod: Long = 1L << 60
  private val GearMask: Long = GearMod - 1

  /** The 256-entry Gear table, derived — not chosen — from md5: entry b is
    * the first 15 hex chars of `md5(b.toString)` parsed base 16 (the same
    * portable 60-bit rule as [[graft.ops.TextOps.h60]]). Any engine with
    * md5 re-derives the identical table, which is what lets the DuckDB
    * oracle gate the chunk structure bit-for-bit. */
  lazy val gearTable: Array[Long] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    Array.tabulate(256) { b =>
      md.reset()
      val hex = md.digest(b.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8))
        .map(x => f"$x%02x").mkString
      java.lang.Long.parseLong(hex.substring(0, 15), 16)
    }
  }

  /** Content-defined-chunking boundary positions (the Gear/FastCDC rolling
    * hash family — Xia et al., USENIX ATC'16, public): position `i`
    * (1-based, code points, `i ≥ w`) is a boundary iff the Gear hash of the
    * trailing `w`-gram divides `mod`, where the gram hash is the fold
    * `h = (2·h + G[cp & 255]) mod 2^60` over the gram's code points —
    * identical to a per-gram `list_reduce`/`aggregate` fold, but computed
    * HERE with an O(1) rolling update per position: the outgoing code
    * point's contribution is `G[cp] · 2^w mod 2^60`, and since masking to
    * 60 bits commutes with wrapping add/sub/shift, plain Java wrap-around
    * arithmetic followed by `& mask` is exact mod-2^60 arithmetic. This is
    * the production CDC shape — one table lookup, shift, add, subtract and
    * mask per character — replacing the per-position md5 (substring + hex
    * encode + radix parse per character) that cost 42% of the r10 bench. */
  def cdcBounds(text: UTF8String, w: Int, mod: Int): ArrayData = {
    val s = text.toString
    val G = gearTable
    val win = new Array[Long](w) // G-values of the last w code points, circular
    val out = new java.util.ArrayList[Any]()
    var h = 0L
    var pos = 0 // 1-based code-point position
    var ci = 0  // UTF-16 index
    while (ci < s.length) {
      val cp = s.codePointAt(ci)
      ci += Character.charCount(cp)
      pos += 1
      val gin = G(cp & 255)
      val idx = (pos - 1) % w
      val gout = win(idx) // the G-value from position pos - w
      win(idx) = gin
      h =
        if (pos <= w) ((h << 1) + gin) & GearMask
        else ((h << 1) + gin - (gout << w)) & GearMask
      if (pos >= w && h % mod == 0) out.add(pos)
    }
    new GenericArrayData(out.toArray)
  }

  /** The kept tokens of a span cut: elements of `w` whose index falls in
    * NO [starts(k), ends(k)] range, for ranges sorted by start and
    * pairwise disjoint (the gaps-and-islands output — sorted by start ⟹
    * sorted by end). One two-pointer merge pass, O(tokens + ranges) —
    * replacing the per-token `exists(rs, …)` linear scan whose
    * O(tokens · islands) cost went quadratic on half-contaminated docs
    * (VERDICT r11 nit #1). */
  def spanKeep(w: ArrayData, starts: ArrayData, ends: ArrayData): ArrayData = {
    val n = w.numElements()
    val r = math.min(starts.numElements(), ends.numElements())
    val out = new java.util.ArrayList[Any](n)
    var ri = 0
    var i = 0
    while (i < n) {
      while (ri < r && ends.getInt(ri) < i) ri += 1
      if (!(ri < r && starts.getInt(ri) <= i))
        out.add(if (w.isNullAt(i)) null else w.getUTF8String(i))
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** Deterministic sign-LSH hyperplane table — the SAME md5 derivation as
    * the original inline-SQL version and the DuckDB oracle (component c of
    * plane p = (md5("p:c") hex-prefix mod 2001, centered) / 1000): every
    * step is exact integer arithmetic until one shared double division, so
    * any engine with md5 re-derives the identical table. Memoized per
    * (nPlanes, dim): the table is computed once per JVM, not once per row —
    * and, unlike the former `array(array(0.123D, …))` SQL literal, its size
    * never enters a codegen source string. That literal was the 100 TB
    * limiting factor (ADVICE r16): adaptive banding at N≈10⁹ derives
    * (b, r) ≈ (254, 25) → 6 350 planes × 64 dims ≈ 406 k double literals in
    * ONE expression tree, past any codegen/constant-pool budget. As a
    * reference object the same table is ~3 MB of plain arrays. */
  private val rhpCache =
    new java.util.concurrent.ConcurrentHashMap[Long, Array[Array[Double]]]()
  def rhpPlanes(nPlanes: Int, dim: Int): Array[Array[Double]] =
    rhpCache.computeIfAbsent((nPlanes.toLong << 32) | dim.toLong, _ => {
      val md = java.security.MessageDigest.getInstance("MD5")
      Array.tabulate(nPlanes) { p =>
        Array.tabulate(dim) { c =>
          val hex = md.digest(s"$p:$c".getBytes("UTF-8"))
            .map("%02x".format(_)).mkString.substring(0, 15)
          ((java.lang.Long.parseLong(hex, 16) % 2001L) - 1000L) / 1000.0
        }
      }
    })

  /** Sign signature of `v` against the first `nPlanes` deterministic
    * hyperplanes: bit p = (v · plane_p ≥ 0). The dot folds in array order
    * with the identical operand order as [[dot]] (v(i) · p(i)), so IEEE
    * addition order — and therefore the oracle hash — is unchanged from
    * the composed `transform(planes, p -> array_dot(v, p) >= 0D)` form. */
  def rhpSignature(v: ArrayData, nPlanes: Int, dim: Int): ArrayData = {
    val pl = rhpPlanes(nPlanes, dim)
    val out = new Array[Any](nPlanes)
    val n = math.min(v.numElements(), dim)
    var p = 0
    while (p < nPlanes) {
      val pv = pl(p)
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * pv(i); i += 1 }
      out(p) = acc >= 0.0
      p += 1
    }
    new GenericArrayData(out)
  }

  private val P = 2147483647L // Mersenne 2^31-1, the MinHash hash space

  /** MinHash signature: sig_i = min over hashes of
    * (1000003·(2i+1)·h + 7919·i + 12345) mod P — the same fixed affine
    * family as DedupOps' composed version. Empty input → k nulls
    * (matching `array_min(transform([], …)) = null`). */
  def minhashSig(hs: ArrayData, k: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return new GenericArrayData(new Array[Any](k))
    val sig = Array.fill(k)(Long.MaxValue)
    var t = 0
    while (t < n) {
      val h = hs.getLong(t)
      var i = 0
      while (i < k) {
        val v = (1000003L * (2 * i + 1) * h + 7919L * i + 12345L) % P
        if (v < sig(i)) sig(i) = v
        i += 1
      }
      t += 1
    }
    new GenericArrayData(sig.map(x => x: Any))
  }
}

/** `array_dot(a, b)` → DOUBLE: sequential dot product of two
  * array<double> columns. */
case class ArrayDot(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (a, b) => s"graft.sql.expressions.ArrayKernels.dot($a, $b)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ArrayDot =
    copy(left = newLeft, right = newRight)
}

/** `simhash60(hs)` → BIGINT over array<bigint> of token hashes. */
case class SimHash60(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash60"

  override protected def nullSafeEval(input: Any): Any =
    ArrayKernels.simhash60(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.expressions.ArrayKernels.simhash60($c)")

  override protected def withNewChildInternal(newChild: Expression): SimHash60 =
    copy(child = newChild)
}

/** `simhash_bits(hs, bits)` → BIGINT: `bits`-wide SimHash over
  * array<bigint> token hashes (bits must be a literal ≤ 64). */
case class SimHashBits(child: Expression, bits: Int) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_bits"

  override protected def nullSafeEval(input: Any): Any =
    ArrayKernels.simhashBits(input.asInstanceOf[ArrayData], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.expressions.ArrayKernels.simhashBits($c, $bits)")

  override protected def withNewChildInternal(newChild: Expression): SimHashBits =
    copy(child = newChild)
}

/** `feature_hash(hs, dim)` → array<bigint> of dim signed bucket counts
  * (dim must be a literal). */
case class FeatureHash(child: Expression, dim: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "feature_hash"

  override protected def nullSafeEval(input: Any): Any =
    ArrayKernels.featureHash(input.asInstanceOf[ArrayData], dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.expressions.ArrayKernels.featureHash($c, $dim)")

  override protected def withNewChildInternal(newChild: Expression): FeatureHash =
    copy(child = newChild)
}

/** `quantize_i8(v)` → struct<qmin: double, qstep: double, qv: array<int>>
  * over array<double>: one-pass affine int8-range quantization. */
case class QuantizeI8(child: Expression) extends UnaryExpression {
  override def dataType: DataType = StructType(Seq(
    StructField("qmin", DoubleType, nullable = false),
    StructField("qstep", DoubleType, nullable = false),
    StructField("qv", ArrayType(IntegerType, containsNull = false), nullable = false)))
  override def prettyName: String = "quantize_i8"

  override protected def nullSafeEval(input: Any): Any =
    ArrayKernels.quantizeI8(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.expressions.ArrayKernels.quantizeI8($c)")

  override protected def withNewChildInternal(newChild: Expression): QuantizeI8 =
    copy(child = newChild)
}

/** `minhash_sig(hs, k)` → array<bigint> of k MinHash minima (k must be a
  * literal). */
case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    ArrayKernels.minhashSig(input.asInstanceOf[ArrayData], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.expressions.ArrayKernels.minhashSig($c, $k)")

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

/** `hvalue(x, y, bits)` → BIGINT: Hilbert-curve distance of cell
  * (x, y) on the 2^bits × 2^bits grid — the layout curve with NO
  * diagonal jumps (consecutive distances are Manhattan-adjacent
  * cells), so range partitions are tighter rectangles than the
  * z-curve's. Tight bit loop with `doGenCode`; `bits` must be a
  * literal in [1, 31]. */
case class HilbertValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "hvalue"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.hilbertD(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.sql.expressions.ArrayKernels.hilbertD($a, $b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): HilbertValue =
    copy(left = newLeft, right = newRight)
}

/** `zvalue(x, y, bits)` → BIGINT: Morton bit-interleave of two
  * non-negative BIGINTs, `bits` bits each (x's bit i lands at 2i, y's at
  * 2i+1; high bits beyond `bits` mask off). The z-order layout kernel —
  * a tight shift/or loop with `doGenCode`, so curve computation stays
  * inside whole-stage codegen instead of a per-row higher-order-function
  * eval. `bits` must be a literal in [1, 31]. */
case class ZValue(left: Expression, right: Expression, bits: Int)
    extends BinaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    ArrayKernels.zInterleave(a.asInstanceOf[Long], b.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b) => s"graft.sql.expressions.ArrayKernels.zInterleave($a, $b, $bits)")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): ZValue =
    copy(left = newLeft, right = newRight)
}

/** `span_keep(w, starts, ends)` → array<string>: the elements of `w`
  * whose 0-based index lies in none of the [starts_k, ends_k] ranges
  * (sorted, disjoint — the islands of a span cut). One codegen'd
  * two-pointer pass, O(tokens + ranges). */
case class SpanKeep(first: Expression, second: Expression, third: Expression)
    extends TernaryExpression {
  // containsNull = true: the kernel copies kept elements verbatim, so a
  // null element in the input array survives into the output — the
  // schema must say so (a false promise here lets codegen readers NPE)
  override def dataType: DataType = ArrayType(StringType, containsNull = true)
  override def prettyName: String = "span_keep"

  override protected def nullSafeEval(w: Any, s: Any, e: Any): Any =
    ArrayKernels.spanKeep(w.asInstanceOf[ArrayData],
      s.asInstanceOf[ArrayData], e.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (w, s, e) => s"graft.sql.expressions.ArrayKernels.spanKeep($w, $s, $e)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): SpanKeep =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `zvalue3(x, y, z, bits)` → BIGINT: 3-D Morton bit-interleave, `bits`
  * bits per dimension (bits ≤ 20 keeps the curve under 2⁶⁰). The
  * multi-column z-order layout kernel; same codegen shape as [[ZValue]]. */
case class ZValue3(first: Expression, second: Expression, third: Expression,
                   bits: Int) extends TernaryExpression {
  override def dataType: DataType = LongType
  override def prettyName: String = "zvalue3"

  override protected def nullSafeEval(a: Any, b: Any, c: Any): Any =
    ArrayKernels.zInterleave3(a.asInstanceOf[Long], b.asInstanceOf[Long],
      c.asInstanceOf[Long], bits)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      (a, b, c) => s"graft.sql.expressions.ArrayKernels.zInterleave3($a, $b, $c, $bits)")

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression, newThird: Expression): ZValue3 =
    copy(first = newFirst, second = newSecond, third = newThird)
}

/** `rhp_signature(v, nPlanes, dim)` → array<boolean>: sign-LSH signature of
  * an array<double> vector against the first `nPlanes` deterministic
  * md5-derived hyperplanes (see [[ArrayKernels.rhpPlanes]]). `nPlanes` and
  * `dim` must be integer literals; the plane table is a memoized JVM
  * reference, never a codegen literal — the banding can deepen with N
  * (adaptive sign-LSH at 10⁹ rows needs ~6 000 planes) without the
  * expression source growing at all. */
case class RhpSignature(child: Expression, nPlanes: Int, dim: Int)
    extends UnaryExpression {
  override def dataType: DataType = ArrayType(BooleanType, containsNull = false)
  override def prettyName: String = "rhp_signature"

  override protected def nullSafeEval(input: Any): Any =
    ArrayKernels.rhpSignature(input.asInstanceOf[ArrayData], nPlanes, dim)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev,
      c => s"graft.sql.expressions.ArrayKernels.rhpSignature($c, $nPlanes, $dim)")

  override protected def withNewChildInternal(newChild: Expression): RhpSignature =
    copy(child = newChild)
}

/** `cdc_bounds(text, w, mod)` → array<int> of 1-based content-defined chunk
  * boundary positions: every code-point position `i ≥ w` where the Gear
  * rolling hash of the trailing `w`-gram ≡ 0 (mod `mod`). `w` and `mod`
  * must be integer literals. See [[ArrayKernels.cdcBounds]] for the hash
  * rule (md5-derived 256-entry table, fold mod 2^60 — portable to any
  * engine with md5, O(1) rolling per position here). */
case class CdcBounds(child: Expression, w: Int, mod: Int) extends UnaryExpression {
  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "cdc_bounds"

  override protected def nullSafeEval(input: Any): Any =
    ArrayKernels.cdcBounds(input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], w, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c => s"graft.sql.expressions.ArrayKernels.cdcBounds($c, $w, $mod)")

  override protected def withNewChildInternal(newChild: Expression): CdcBounds =
    copy(child = newChild)
}
