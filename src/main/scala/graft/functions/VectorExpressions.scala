package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types._

/** Native Catalyst expressions for vector math over `array<float>`
  * embedding columns (FIXTURES.md `embeddings.embedding`, dim 64).
  *
  * Why a custom `Expression` and not `functions.aggregate(zip_with(...))`:
  * the higher-order-function route allocates a lambda frame per element
  * and boxes each float; this expression compiles (doGenCode) to a tight
  * primitive loop inside whole-stage codegen — the difference is ~10× on
  * a brute-force k-NN scan, which matters when the 100 TB corpus is
  * scanned for candidate pairs. Interpreted eval is provided for
  * completeness (nullSafeEval), codegen is the hot path.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "cosine_sim"

  /** Element accessor per side: raw float columns stay float (the common
    * embedding storage type); computed vectors (centroids, casts) are
    * double. Resolved once from the child's ArrayType. */
  private def isFloatArr(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val xf = isFloatArr(left); val yf = isFloatArr(right)
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0; var nx = 0.0; var ny = 0.0
    var i = 0
    while (i < n) {
      val xi = if (x.isNullAt(i)) 0.0
        else if (xf) x.getFloat(i).toDouble else x.getDouble(i)
      val yi = if (y.isNullAt(i)) 0.0
        else if (yf) y.getFloat(i).toDouble else y.getDouble(i)
      dot += xi * yi; nx += xi * xi; ny += yi * yi
      i += 1
    }
    if (nx == 0.0 || ny == 0.0) 0.0 else dot / math.sqrt(nx * ny)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (x, y) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val dot = ctx.freshName("dot")
      val nx = ctx.freshName("nx")
      val ny = ctx.freshName("ny")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      val getX = if (isFloatArr(left)) s"(double) $x.getFloat($i)"
        else s"$x.getDouble($i)"
      val getY = if (isFloatArr(right)) s"(double) $y.getFloat($i)"
        else s"$y.getDouble($i)"
      s"""
         |int $n = java.lang.Math.min($x.numElements(), $y.numElements());
         |double $dot = 0.0, $nx = 0.0, $ny = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = $x.isNullAt($i) ? 0.0 : $getX;
         |  double $yi = $y.isNullAt($i) ? 0.0 : $getY;
         |  $dot += $xi * $yi; $nx += $xi * $xi; $ny += $yi * $yi;
         |}
         |${ev.value} = ($nx == 0.0 || $ny == 0.0)
         |  ? 0.0 : $dot / java.lang.Math.sqrt($nx * $ny);
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Winnowing-style document fingerprint: polynomial rolling hash over the
  * UTF-8 bytes with window `w`, returning the MINIMUM window hash — a
  * deterministic, shift-robust fingerprint (two documents sharing any
  * `w`-byte run can collide to the same min-hash, the winnowing property).
  * Base/mod are fixed small primes so the value is reproducible anywhere.
  *
  * CodegenFallback is acceptable here: fingerprinting is one call per
  * document (not per element), so the virtual-call overhead is noise next
  * to the O(bytes) hash loop itself, which lives in compiled Scala.
  */
case class RollingFingerprint(child: Expression, window: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "rolling_fingerprint"

  private val B = 1000003L          // polynomial base
  private val M = 0x7FFFFFFFL       // 2^31 - 1 (Mersenne prime)

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    java.lang.Long.valueOf(RollingFingerprint.minWindowHash(bytes, window, B, M))
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object RollingFingerprint {
  /** Min of rolling polynomial hashes over all `w`-byte windows (whole-doc
    * hash when shorter than `w`). Shared by interpreted + codegen paths. */
  def minWindowHash(bytes: Array[Byte], w: Int, b: Long, m: Long): Long = {
    val n = bytes.length
    if (n == 0) return 0L
    // b^(w-1) mod m for the outgoing byte
    var pow = 1L
    var k = 0
    while (k < w - 1) { pow = pow * b % m; k += 1 }
    var h = 0L
    var min = Long.MaxValue
    var i = 0
    while (i < n) {
      h = (h * b + (bytes(i) & 0xFF)) % m
      if (i >= w - 1) {
        if (h < min) min = h
        h = (h - (bytes(i - w + 1) & 0xFF) * pow % m + m * 256) % m
      }
      i += 1
    }
    if (min == Long.MaxValue) h else min
  }
}

/** Signed-random-projection LSH band keys for an `array<double>` vector:
  * `bands` keys, each packing `bits` hyperplane sign bits (MSB-first).
  * Output array index = band id, value = that band's bucket.
  *
  * The hyperplane weights are NOT data or literals — they derive from a
  * fixed integer hash (Knuth multiplicative, bit 16) of (plane, dim), so
  * any engine can recompute them; the DuckDB oracle for
  * q_dedup_embedding_lsh derives the identical bucketing in plain SQL.
  * Dot products accumulate left-to-right in double, matching both the
  * SQL-HOF spelling and DuckDB's sequential SUM.
  *
  * Why an expression and not `aggregate(zip_with(...))` HOFs: at 64
  * bands × 12 bits the interpreted-lambda route evaluates ~49k boxed
  * lambda frames per row (measured 47 s over sf0.1's 2000 vectors); this
  * compiled loop is the same work in milliseconds. CodegenFallback is
  * acceptable: one virtual call per ROW, and the O(planes × dims) loop
  * inside runs as JIT'd primitive code (same justification as
  * RollingFingerprint).
  */
case class SrpBandKeys(child: Expression, bands: Int, bits: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "srp_band_keys"

  override def nullSafeEval(v: Any): Any = {
    val arr = v.asInstanceOf[ArrayData]
    val n = arr.numElements()
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var bucket = 0L
      var i = 0
      while (i < bits) {
        val p = b * bits + i
        var dot = 0.0
        var j = 0
        while (j < n) {
          // null elements contribute 0, like CosineSimilarity
          if (!arr.isNullAt(j)) dot += arr.getDouble(j) * SrpBandKeys.weight(p, j)
          j += 1
        }
        bucket = bucket * 2 + (if (dot > 0.0) 1L else 0L)
        i += 1
      }
      out(b) = bucket
      b += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object SrpBandKeys {
  /** Deterministic ±1 hyperplane weight for plane `p`, dim `j` (64-dim
    * stride): avalanched multiplicative hash of (p*64+j), low bit.
    *
    * Why the xor-shift rounds and not one Knuth multiply + bit pick:
    * under the single multiply, the weight ROWS of nearby planes are
    * strongly correlated (bit16((x+64c) vs bit16(x) follows a
    * triangle-wave in the plane index), so a band's sign bits carried
    * only a few effective bits of entropy — measured by the ×100 scale
    * probe as 5,000-vector cells of mutually ~orthogonal members (2.5%
    * of the corpus in ONE cell) and a fixture max cell of 98 that the
    * avalanched hash collapses to 9. Two xor-shift/multiply rounds
    * restore per-plane independence; every step is positive-range
    * int64-safe arithmetic (% 2^31 keeps the second multiply under
    * 2^63), so the DuckDB oracle replays it in plain SQL. */
  def weight(p: Int, j: Int): Double = {
    var h = ((p.toLong * 64 + j) * 2654435761L) % 2147483648L
    h ^= h >> 15
    h = (h * 1540483477L) % 2147483648L
    h ^= h >> 12
    if ((h & 1L) == 0L) 1.0 else -1.0
  }
}

/** The per-element DECIMAL(30,12) quantization both decimal kernels
  * share: the unscaled long of `BigDecimal.valueOf(p).setScale(12,
  * HALF_UP)` — i.e. HALF_UP rounding of p's SHORTEST-DECIMAL-STRING
  * value (Double.toString semantics, which is what Spark's
  * double→decimal cast and the DuckDB oracles both compute) at scale
  * 12.
  *
  * r15 optimization (guide §1.2 "per-task work"): the valueOf spelling
  * formats AND re-parses a decimal string per element — measured ~500
  * ns/element, ~6× the cost of the whole remaining kernel (a 2000×44
  * ANN assignment spent 2.8 s here vs 0.5 s for the identical double
  * loop). The fast path below computes round(p·10¹²) in pure double
  * arithmetic and PROVES it equal: with y = fl(p·10¹²) and r the
  * shortest-string decimal of p, |y − r·10¹²| ≤ 3·ulp(y) (½ ulp from
  * the multiply, ≤ 2 ulp from |r−p| ≤ ulp(p)/2 scaled by 10¹²), so
  * whenever y's fractional part is ≥ 8·ulp(y) away from the .5
  * HALF_UP boundary, nearest-integer rounding of y and of r·10¹² agree
  * and ties are unreachable. Inside that window — and past 2⁵⁰ where
  * doubles stop resolving quarters, and for non-finite p — it falls
  * back to the exact valueOf spelling, so the result is bit-identical
  * by construction on every input (VectorExprSpec fuzzes the
  * equivalence, boundary cases included). */
private[graft] object DecimalQuant {
  private val Exact12 = 1L << 50 // |p·1e12| above this: fall back

  @inline def unscaled12(p: Double): Long = {
    val y = p * 1e12
    val a = Math.abs(y)
    if (a < Exact12) {
      val fl = Math.floor(y)
      val frac = y - fl
      // distance to the HALF_UP tie boundary, vs the proven error bound
      if (Math.abs(frac - 0.5) > Math.ulp(y) * 8 + java.lang.Double.MIN_VALUE) {
        if (frac > 0.5) fl.toLong + 1L else fl.toLong
      } else exact(p)
    } else exact(p)
  }

  /** The reference spelling (also the fallback): exact by definition. */
  def exact(p: Double): Long =
    java.math.BigDecimal.valueOf(p)
      .setScale(12, java.math.RoundingMode.HALF_UP)
      .unscaledValue().longValueExact()
}

/** Decimal-exact dot product of two `array<double>` columns: each
  * element-product is rounded to DECIMAL(30,12) (HALF_UP — Spark's own
  * double→decimal cast semantics) and summed exactly, so the result is
  * independent of element/merge order and bit-identical to the SQL
  * spelling `aggregate(zip_with(a, b, (x,y) -> x*y), 0.0BD, (acc,x) ->
  * acc + CAST(x AS DECIMAL(30,12)))` — which is what the DuckDB oracles
  * compute as `SUM(CAST(a.v[i]*b.v[i] AS DECIMAL(30,12)))`.
  *
  * Exists because the HOF spelling runs interpreted per element: at 175k
  * candidate pairs × 3 folds × 64 dims (q_dedup_embedding_lsh, sf0.1)
  * that was ~33 s of lambda frames + boxed decimal ops; this compiled
  * loop is the same arithmetic in under a second. CodegenFallback: one
  * virtual call per row, the O(dims) loop inside is JIT'd; per-element
  * quantization via [[DecimalQuant.unscaled12]] (r15: the valueOf
  * string round-trip was ~85% of the kernel's cost).
  */
case class DecimalDotProduct(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DecimalType(30, 12)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "decimal_dot"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    // Fast path: each per-term DECIMAL(30,12) is carried as its
    // UNSCALED long (exact — same valueOf/setScale rounding, just a
    // cheaper container than O(n) BigDecimal adds; ~2× on the 64-dim
    // similarity kernels). addExact throws past ±2^63/1e12 ≈ ±9.2e6,
    // where the slow path below reproduces the identical arithmetic
    // with arbitrary precision.
    try {
      var acc = 0L
      var i = 0
      while (i < n) {
        // null elements contribute 0, matching the null-skipping cosine
        if (!x.isNullAt(i) && !y.isNullAt(i)) {
          val p = x.getDouble(i) * y.getDouble(i)
          acc = Math.addExact(acc, DecimalQuant.unscaled12(p))
        }
        i += 1
      }
      org.apache.spark.sql.types.Decimal(acc, 30, 12)
    } catch {
      case _: ArithmeticException =>
        var acc = java.math.BigDecimal.ZERO
        var i = 0
        while (i < n) {
          if (!x.isNullAt(i) && !y.isNullAt(i)) {
            val p = x.getDouble(i) * y.getDouble(i)
            acc = acc.add(java.math.BigDecimal.valueOf(p)
              .setScale(12, java.math.RoundingMode.HALF_UP))
          }
          i += 1
        }
        org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(acc), 30, 12)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Decimal-exact squared L2 distance of two `array<double>` columns:
  * each squared difference `(a_i-b_i)²` is two correctly-rounded IEEE
  * ops (identical in every engine), rounded to DECIMAL(30,12) (HALF_UP —
  * Spark's double→decimal cast semantics) and summed exactly. Same
  * order-independence/bit-parity contract as [[DecimalDotProduct]]; the
  * DuckDB twin is `SUM(CAST((a.v[i]-b.v[i])*(a.v[i]-b.v[i]) AS
  * DECIMAL(30,12)))`. Distance (not cosine) is what product-quantization
  * codebook learning and ADC lookups minimize. CodegenFallback: one
  * virtual call per row, O(dims) loop JIT'd.
  */
case class DecimalSqDist(left: Expression, right: Expression)
    extends BinaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = DecimalType(30, 12)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "decimal_sqdist"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    // unscaled-long fast path + arbitrary-precision fallback — see the
    // twin comment in DecimalDotProduct
    try {
      var acc = 0L
      var i = 0
      while (i < n) {
        // null elements contribute 0, matching DecimalDotProduct
        if (!x.isNullAt(i) && !y.isNullAt(i)) {
          val diff = x.getDouble(i) - y.getDouble(i)
          acc = Math.addExact(acc, DecimalQuant.unscaled12(diff * diff))
        }
        i += 1
      }
      org.apache.spark.sql.types.Decimal(acc, 30, 12)
    } catch {
      case _: ArithmeticException =>
        var acc = java.math.BigDecimal.ZERO
        var i = 0
        while (i < n) {
          if (!x.isNullAt(i) && !y.isNullAt(i)) {
            val diff = x.getDouble(i) - y.getDouble(i)
            acc = acc.add(java.math.BigDecimal.valueOf(diff * diff)
              .setScale(12, java.math.RoundingMode.HALF_UP))
          }
          i += 1
        }
        org.apache.spark.sql.types.Decimal(scala.math.BigDecimal(acc), 30, 12)
    }
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-API entry points (the user-facing surface of the expressions). */
/** Engine-neutral 40-bit string hash: byte fold
  * h' = (h · 1000003 + byte) mod 2^40 (compiled loop). Exists so sketch
  * operators built on it (SimHash) can be ORACLE-checked — DuckDB
  * replays the identical fold with list_reduce over the chars, which
  * xxhash64 (Spark-internal) never allows. 40 bits keeps every
  * intermediate product under 2^60, inside DuckDB's overflow-checked
  * BIGINT arithmetic. */
case class NeutralHash40(child: Expression, mult: Long = 1000003L)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression
    with org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback {

  override def dataType: DataType = LongType
  override def prettyName: String = "neutral_hash40"

  override def nullSafeEval(v: Any): Any = {
    val bytes = v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
    var h = 0L
    var i = 0
    while (i < bytes.length) {
      h = (h * mult + (bytes(i) & 0xFF)) & 0xFFFFFFFFFFL
      i += 1
    }
    java.lang.Long.valueOf(h)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** 64×64 Gram matrix (Σ row outer products) of an `array<long>` column
  * as ONE native aggregate: each input row accumulates its outer
  * product into a 4,096-long buffer in place, buffers add elementwise,
  * and Spark runs it partial/final with map-side combine — the
  * tall-skinny Gramian in a single pass with NO per-row cell fan-out.
  * Replaces the explode-4,096-structs-per-row spelling in
  * q_embed_pca_power, which shuffled the same 4,096 cells but paid an
  * 8M-row explode + hash-aggregate at sf0.1 (measured ~4.7 s → ~0.9 s).
  * Cells are exact integer sums (inputs are the 1e6-quantized
  * components; overflow-safe to ~10⁶ rows at fixture magnitudes —
  * the same bound documented at the call site). */
case class GramMatrixAgg(
    child: Expression,
    override val mutableAggBufferOffset: Int = 0,
    override val inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  private val Dim = 64

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_matrix_agg"

  override def createAggregationBuffer(): Array[Long] =
    new Array[Long](Dim * Dim)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val arr = v.asInstanceOf[ArrayData]
      val x = new Array[Long](Dim)
      var i = 0
      val n = math.min(Dim, arr.numElements())
      while (i < n) {
        if (!arr.isNullAt(i)) x(i) = arr.getLong(i)
        i += 1
      }
      var j = 0
      while (j < Dim) {
        val xj = x(j)
        if (xj != 0L) {
          val base = j * Dim
          var k = 0
          while (k < Dim) { buf(base + k) += xj * x(k); k += 1 }
        }
        j += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) += b(i); i += 1 }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = java.nio.ByteBuffer.allocate(buf.length * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = java.nio.ByteBuffer.wrap(bytes)
    Array.fill(Dim * Dim)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(o: Int): GramMatrixAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): GramMatrixAgg =
    copy(inputAggBufferOffset = o)
  override protected def withNewChildrenInternal(
      c: IndexedSeq[Expression]): Expression = copy(child = c.head)
}

object VectorFunctions {
  /** Cosine similarity of two `array<float>` columns (codegen'd). */
  def cosine_sim(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))

  /** Winnowing min-hash fingerprint of a string column. */
  def rolling_fingerprint(c: Column, window: Int = 16): Column =
    Bridge.column(RollingFingerprint(Bridge.expression(c), window))

  /** SRP-LSH band keys of an `array<double>` column (compiled loop). */
  def srp_band_keys(v: Column, bands: Int, bits: Int): Column =
    Bridge.column(SrpBandKeys(Bridge.expression(v), bands, bits))

  /** Decimal-exact (order-independent) dot product of two `array<double>`
    * columns, DECIMAL(30,12) out. */
  def decimal_dot(a: Column, b: Column): Column =
    Bridge.column(DecimalDotProduct(Bridge.expression(a), Bridge.expression(b)))

  /** Decimal-exact (order-independent) squared L2 distance of two
    * `array<double>` columns, DECIMAL(30,12) out. */
  def decimal_sqdist(a: Column, b: Column): Column =
    Bridge.column(DecimalSqDist(Bridge.expression(a), Bridge.expression(b)))

  /** Engine-neutral 40-bit hash of a string column (compiled loop). */
  def neutral_hash40(c: Column): Column =
    Bridge.column(NeutralHash40(Bridge.expression(c)))

  /** The INDEPENDENT second 40-bit fold (multiplier 999983, a different
    * prime): `struct(neutral_hash40(s), neutral_hash40b(s))` is an
    * 80-bit engine-neutral key whose collision envelope (n²/2^81 —
    * ~2e-10 at the ×100 probe's 23M grams) makes it a drop-in
    * fixed-width replacement for a long TEXT grouping key, while each
    * fold stays inside DuckDB's overflow-checked BIGINT (h < 2^40,
    * h·mult < 2^60). */
  def neutral_hash40b(c: Column): Column =
    Bridge.column(NeutralHash40(Bridge.expression(c), 999983L))

  /** Avalanche a [[NeutralHash40]] value down to a uniform 31-bit hash.
    *
    * The raw 40-bit polynomial fold is value-uniform only once the input
    * is long enough to wrap the modulus (~6+ bytes) — trigram shingles
    * qualify (measured: q_agg_distinct_kmv max rel. error 0.056), but
    * SHORT keys like stringified user ids fold to tiny, ordered values,
    * which breaks any ORDER-STATISTIC use of the hash (a bottom-k sketch
    * saw "1".."1500" as the 64 smallest values in the domain and
    * overestimated 125 distinct as 1.26 M). Two xor-shift/multiply
    * rounds (the [[SrpBandKeys.weight]] recipe, every step positive
    * int64-safe) restore uniformity; the 2^31 domain keeps the second
    * multiply under 2^63 so plain-SQL replay is exact. Composition of
    * codegen'd built-ins on purpose — no custom expression needed.
    * SQL twin: [[graft.streaming.EventStreams]] Avalanche31Ctes. */
  def avalanche31(c: Column): Column = {
    import org.apache.spark.sql.functions.{lit, shiftright}
    val m = lit(2147483648L)
    val h0 = c.bitwiseXOR(shiftright(c, 20)) % m
    val h1 = (h0 * lit(2654435761L)) % m
    val h2 = h1.bitwiseXOR(shiftright(h1, 15))
    val h3 = (h2 * lit(1540483477L)) % m
    h3.bitwiseXOR(shiftright(h3, 12))
  }

  /** One-pass 64×64 integer Gram matrix of an `array<long>` column
    * (row-major 4,096-long array out). */
  def gram_matrix_agg(c: Column): Column =
    Bridge.column(GramMatrixAgg(Bridge.expression(c)).toAggregateExpression())
}
