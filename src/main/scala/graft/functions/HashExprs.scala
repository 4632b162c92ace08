package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom Catalyst expressions for sketch hashing (SimHash, MinHash).
  *
  * These are whole-array computations Spark's built-in expression set can't
  * state cleanly (per-bit vote accumulation; k simultaneous min-hash lanes),
  * so per the preference order in SURVEY §7.3 they're native `Expression`s —
  * no SerDe, evaluated on UTF8String bytes directly — rather than Scala UDFs.
  *
  * Codegen: each expression's loop lives in ONE static helper on this
  * object (Scala emits static forwarders, so generated Java calls
  * `graft.functions.HashExprs.simHash(...)` directly), and `doGenCode`
  * emits that call — null-propagating, no boxed `eval`, no InternalRow
  * materialization mid-stage. The interpreted `nullSafeEval` path calls
  * the SAME helper, so both execution modes share one implementation.
  *
  * Hash: FNV-1a 64-bit — public-domain, deterministic across JVMs, no seed
  * material needed at runtime.
  */
object HashExprs {

  @inline final def fnv1a64(bytes: Array[Byte]): Long = {
    var h = 0xcbf29ce484222325L
    var i = 0
    while (i < bytes.length) {
      h ^= (bytes(i) & 0xffL)
      h *= 0x100000001b3L
      i += 1
    }
    h
  }

  /** Static twin for generated code: FNV-1a64 straight off the
    * UTF8String's bytes. */
  final def fnv1a64Utf8(s: UTF8String): Long = fnv1a64(s.getBytes)

  /** Static twin for generated code: the SimHash bit-vote loop. */
  final def simHash(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i).getBytes)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= (1L << b)
      b += 1
    }
    sig
  }

  /** Static twin for generated code: the k-lane MinHash sweep under the
    * caller's lane coefficients. */
  final def minHash(arr: ArrayData, coefA: Array[Long],
                    coefB: Array[Long]): ArrayData = {
    val k = coefA.length
    val sig = Array.fill(k)(Long.MaxValue)
    var i = 0
    while (i < arr.numElements()) {
      if (!arr.isNullAt(i)) {
        val h = fnv1a64(arr.getUTF8String(i).getBytes)
        var lane = 0
        while (lane < k) {
          val v = coefA(lane) * h + coefB(lane)
          if (v < sig(lane)) sig(lane) = v
          lane += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** FNV-1a64 of a string as a signed long — the engine's deterministic,
    * seed-free scalar hash. Used for uniform pseudo-random sampling (e.g.
    * the IVF codebook picks the K corpus rows with the smallest id-hash),
    * where Spark's Murmur3 `hash()`/`xxhash64` would work on the engine
    * side but could not be restated in the DuckDB oracle; this one is
    * (see [[SketchOracleSql.fnvFold]]). */
  case class Fnv1a64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"fnv1a64 expects string, got $other")
    }
    override def nullSafeEval(input: Any): Any =
      fnv1a64Utf8(input.asInstanceOf[UTF8String])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashExprs.fnv1a64Utf8($c)")
    override protected def withNewChildInternal(c: Expression): Fnv1a64 = copy(c)
  }

  /** 64-bit SimHash over a token array: each token votes its hash bits
    * (+1 / -1); the sign of each bit's tally forms the signature. Documents
    * with small Hamming distance between signatures are near-duplicates. */
  case class SimHash64(child: Expression) extends UnaryExpression {
    override def dataType: DataType = LongType
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"simhash64 expects array<string>, got $other")
    }
    override def nullSafeEval(input: Any): Any =
      simHash(input.asInstanceOf[ArrayData])
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.HashExprs.simHash($c)")
    override protected def withNewChildInternal(c: Expression): SimHash64 = copy(c)
  }

  /** MinHash signature (k lanes) over a shingle array: lane i keeps
    * min(a_i * fnv(shingle) + b_i) with fixed odd multipliers derived from
    * the lane index (deterministic, wrap-around Long arithmetic). Jaccard
    * similarity ~ fraction of agreeing lanes. */
  case class MinHashSig(child: Expression, k: Int) extends UnaryExpression {
    override def dataType: DataType = ArrayType(LongType, containsNull = false)
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case other => TypeCheckResult.TypeCheckFailure(
        s"minhash_sig expects array<string>, got $other")
    }
    private lazy val coefA: Array[Long] = Array.tabulate(k) { i =>
      fnv1a64(s"minhash-a-$i".getBytes("UTF-8")) | 1L   // odd multiplier
    }
    private lazy val coefB: Array[Long] = Array.tabulate(k) { i =>
      fnv1a64(s"minhash-b-$i".getBytes("UTF-8"))
    }
    override def nullSafeEval(input: Any): Any =
      minHash(input.asInstanceOf[ArrayData], coefA, coefB)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
      val a = ctx.addReferenceObj("minhashCoefA", coefA, "long[]")
      val b = ctx.addReferenceObj("minhashCoefB", coefB, "long[]")
      defineCodeGen(ctx, ev, c => s"graft.functions.HashExprs.minHash($c, $a, $b)")
    }
    override protected def withNewChildInternal(c: Expression): MinHashSig = copy(child = c)
  }

  // Spark 4 Columns are ColumnNode-backed; GraftGlue bridges to/from
  // Catalyst Expressions (classic.ExpressionUtils is private[sql]).
  import org.apache.spark.sql.GraftGlue
  def simhash64(c: Column): Column =
    GraftGlue.toColumn(SimHash64(GraftGlue.toExpression(c)))
  def fnv1a64Col(c: Column): Column =
    GraftGlue.toColumn(Fnv1a64(GraftGlue.toExpression(c)))
  def minhashSig(c: Column, k: Int): Column =
    GraftGlue.toColumn(MinHashSig(GraftGlue.toExpression(c), k))

  /** Hamming distance between two 64-bit signatures (built-in bit ops). */
  def hamming64(a: Column, b: Column): Column =
    org.apache.spark.sql.functions.bit_count(a.bitwiseXOR(b))
}
