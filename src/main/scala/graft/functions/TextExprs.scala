package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftGlue
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for shingling and set similarity — the hot
  * loops of near-dup detection. The HOF equivalents (transform + slice +
  * concat_ws; array_intersect/array_union) interpret a lambda per element;
  * these run single JVM loops over UTF8String data.
  *
  * Codegen: the loops are static helpers on this object (Scala emits
  * static forwarders), and each `doGenCode` emits the direct call — the
  * dedup pipeline's shingle/verify stages stay inside whole-stage codegen
  * with no boxed eval. `nullSafeEval` calls the same helpers.
  */
object TextExprs {

  private val stringArray = ArrayType(StringType)

  /** Static twin for generated code: distinct word n-gram shingles. */
  final def wordShinglesOf(arr: ArrayData, n: Int): ArrayData = {
    val m = arr.numElements()
    if (m < n) new GenericArrayData(Array.empty[Any])
    else {
      val toks = new Array[UTF8String](m)
      var i = 0
      while (i < m) {
        toks(i) = if (arr.isNullAt(i)) UTF8String.EMPTY_UTF8 else arr.getUTF8String(i)
        i += 1
      }
      val seen = new java.util.LinkedHashSet[UTF8String]()
      val space = UTF8String.fromString(" ")
      i = 0
      while (i <= m - n) {
        val parts = new Array[UTF8String](n)
        var j = 0
        while (j < n) { parts(j) = toks(i + j); j += 1 }
        seen.add(UTF8String.concatWs(space, parts: _*))
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    }
  }

  /** Static twin for generated code: distinct char n-gram shingles. */
  final def charShinglesOf(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) new GenericArrayData(Array[Any](s))
    else {
      val seen = new java.util.LinkedHashSet[UTF8String]()
      var i = 0
      while (i <= len - n) {
        seen.add(s.substringSQL(i + 1, n)) // character-based SQL substring
        i += 1
      }
      new GenericArrayData(seen.toArray.asInstanceOf[Array[Any]])
    }
  }

  /** Static twin for generated code: exact set Jaccard. Boxed Double so
    * the empty-union case can surface as null (one box per ROW — nothing
    * next to the per-element set work). `longs` selects the pre-hashed
    * array<long> form. */
  final def jaccardOf(x: ArrayData, y: ArrayData,
                      longs: Boolean): java.lang.Double = {
    if (longs) {
      val sa = new java.util.HashSet[java.lang.Long]()
      var i = 0
      while (i < x.numElements()) { if (!x.isNullAt(i)) sa.add(x.getLong(i)); i += 1 }
      var inter = 0
      val sb = new java.util.HashSet[java.lang.Long]()
      i = 0
      while (i < y.numElements()) {
        if (!y.isNullAt(i)) {
          val v: java.lang.Long = y.getLong(i)
          if (sb.add(v) && sa.contains(v)) inter += 1
        }
        i += 1
      }
      val union = sa.size + sb.size - inter
      if (union == 0) null else java.lang.Double.valueOf(inter.toDouble / union)
    } else {
      val sa = new java.util.HashSet[UTF8String]()
      var i = 0
      while (i < x.numElements()) { if (!x.isNullAt(i)) sa.add(x.getUTF8String(i)); i += 1 }
      var inter = 0
      val sb = new java.util.HashSet[UTF8String]()
      i = 0
      while (i < y.numElements()) {
        if (!y.isNullAt(i)) {
          val v = y.getUTF8String(i)
          if (sb.add(v) && sa.contains(v)) inter += 1
        }
        i += 1
      }
      val union = sa.size + sb.size - inter
      if (union == 0) null else java.lang.Double.valueOf(inter.toDouble / union)
    }
  }

  /** Distinct word n-gram shingles from a token array (space-joined).
    * Fewer than n tokens -> empty array. */
  case class WordShingles(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1)
    override def dataType: DataType = stringArray
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
      case o => TypeCheckResult.TypeCheckFailure(s"word_shingles expects array<string>, got $o")
    }
    override def nullSafeEval(input: Any): Any =
      wordShinglesOf(input.asInstanceOf[ArrayData], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.wordShinglesOf($c, $n)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Distinct character n-gram shingles of a string. Strings shorter than n
    * yield the string itself (so short docs still have a sketch). */
  case class CharShingles(child: Expression, n: Int)
      extends UnaryExpression {
    require(n >= 1)
    override def dataType: DataType = stringArray
    override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
      case StringType => TypeCheckResult.TypeCheckSuccess
      case o => TypeCheckResult.TypeCheckFailure(s"char_shingles expects string, got $o")
    }
    override def nullSafeEval(input: Any): Any =
      charShinglesOf(input.asInstanceOf[UTF8String], n)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      defineCodeGen(ctx, ev, c => s"graft.functions.TextExprs.charShinglesOf($c, $n)")
    override protected def withNewChildInternal(c: Expression) = copy(child = c)
  }

  /** Exact Jaccard similarity of two arrays treated as sets. Accepts
    * `array<string>` or `array<long>` — the long form is for pre-hashed
    * shingles (`xxhash64` per shingle), which shrinks the candidate-pair
    * shuffle by the average shingle length and is the form used at scale.
    * Null when both sets are empty (undefined ratio), hence
    * `nullable = true` even over non-null children. */
  case class JaccardSim(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true
    override def checkInputDataTypes(): TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
          TypeCheckResult.TypeCheckSuccess
        case o => TypeCheckResult.TypeCheckFailure(
          s"jaccard_sim expects two array<string> or two array<long>, got $o")
      }
    private lazy val longs =
      left.dataType.asInstanceOf[ArrayType].elementType == LongType
    override def nullSafeEval(a: Any, b: Any): Any =
      jaccardOf(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData], longs)
    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val boxed = ctx.freshName("jac")
        s"""
           |java.lang.Double $boxed = graft.functions.TextExprs.jaccardOf($a, $b, $longs);
           |if ($boxed == null) { ${ev.isNull} = true; }
           |else { ${ev.value} = $boxed.doubleValue(); }
         """.stripMargin
      })
    override protected def withNewChildrenInternal(l: Expression, r: Expression) =
      copy(l, r)
  }

  def wordShingles(tokens: Column, n: Int): Column =
    GraftGlue.toColumn(WordShingles(GraftGlue.toExpression(tokens), n))
  def charShingles(s: Column, n: Int): Column =
    GraftGlue.toColumn(CharShingles(GraftGlue.toExpression(s), n))
  def jaccardSim(a: Column, b: Column): Column =
    GraftGlue.toColumn(JaccardSim(GraftGlue.toExpression(a), GraftGlue.toExpression(b)))
}
