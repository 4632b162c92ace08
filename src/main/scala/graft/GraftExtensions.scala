package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.types.IntegerType

import graft.functions.{HashExprs, TextExprs, VectorExprs}

/** SQL front door for the engine's native Catalyst expressions: registered
  * through `SparkSessionExtensions` (`spark.sql.extensions` — wired in
  * [[Session.confFor]]), so `spark.sql("SELECT fnv1a64(text) ...")` plans
  * the SAME expression node as the DataFrame API's column helpers. This is
  * the injection point Spark provides for engine extensions; per-session
  * `udf.register` would wrap rows through Scala closures instead of
  * planning the native expression.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    GraftExtensions.functions.foreach(ext.injectFunction)
    // whole-operator tier: the native as-of and keyed range joins'
    // planner strategies
    ext.injectPlannerStrategy(_ => graft.plans.AsofNative.Strategy)
    ext.injectPlannerStrategy(_ => graft.plans.RangeNative.Strategy)
    ext.injectPlannerStrategy(_ => graft.plans.IntervalNative.Strategy)
  }
}

object GraftExtensions {

  private def intLit(e: Expression, fn: String): Int = e match {
    case Literal(v: Int, IntegerType) => v
    case other => throw new IllegalArgumentException(
      s"$fn: expected an integer literal parameter, got $other")
  }

  private def arity(es: Seq[Expression], n: Int, fn: String): Unit =
    require(es.length == n, s"$fn expects $n arguments, got ${es.length}")

  private def info(name: String): ExpressionInfo =
    new ExpressionInfo(classOf[GraftExtensions].getName, name)

  /** (identifier, info, builder) triples for every injectable native
    * expression. Parameterized ones (shingle width, signature lanes) take
    * the parameter as an integer literal argument. */
  val functions: Seq[(FunctionIdentifier, ExpressionInfo,
      Seq[Expression] => Expression)] = Seq(
    (FunctionIdentifier("fnv1a64"), info("fnv1a64"),
      (es: Seq[Expression]) => { arity(es, 1, "fnv1a64")
        HashExprs.Fnv1a64(es.head) }),
    (FunctionIdentifier("simhash64"), info("simhash64"),
      (es: Seq[Expression]) => { arity(es, 1, "simhash64")
        HashExprs.SimHash64(es.head) }),
    (FunctionIdentifier("minhash_sig"), info("minhash_sig"),
      (es: Seq[Expression]) => { arity(es, 2, "minhash_sig")
        HashExprs.MinHashSig(es.head, intLit(es(1), "minhash_sig")) }),
    (FunctionIdentifier("word_shingles"), info("word_shingles"),
      (es: Seq[Expression]) => { arity(es, 2, "word_shingles")
        TextExprs.WordShingles(es.head, intLit(es(1), "word_shingles")) }),
    (FunctionIdentifier("char_shingles"), info("char_shingles"),
      (es: Seq[Expression]) => { arity(es, 2, "char_shingles")
        TextExprs.CharShingles(es.head, intLit(es(1), "char_shingles")) }),
    (FunctionIdentifier("jaccard_sim"), info("jaccard_sim"),
      (es: Seq[Expression]) => { arity(es, 2, "jaccard_sim")
        TextExprs.JaccardSim(es.head, es(1)) }),
    (FunctionIdentifier("dot_product"), info("dot_product"),
      (es: Seq[Expression]) => { arity(es, 2, "dot_product")
        VectorExprs.DotProduct(es.head, es(1)) }),
    (FunctionIdentifier("cosine_sim"), info("cosine_sim"),
      (es: Seq[Expression]) => { arity(es, 2, "cosine_sim")
        VectorExprs.CosineSim(es.head, es(1)) }),
    (FunctionIdentifier("nfc"), info("nfc"),
      (es: Seq[Expression]) => { arity(es, 1, "nfc")
        graft.functions.UnicodeFns.NfcNormalize(es.head) }),
    (FunctionIdentifier("strip_accents"), info("strip_accents"),
      (es: Seq[Expression]) => { arity(es, 1, "strip_accents")
        graft.functions.UnicodeFns.StripAccents(es.head) }),
    (FunctionIdentifier("bpe_count"), info("bpe_count"),
      (es: Seq[Expression]) => { arity(es, 1, "bpe_count")
        graft.functions.Bpe.BpeCount(es.head, graft.functions.Bpe.merges) }))
}
