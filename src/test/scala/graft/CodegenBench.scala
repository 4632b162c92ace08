package graft

import org.apache.spark.sql.functions._

/** Manual microbenchmark for the round-13 CodegenFallback retirement:
  * times the hot custom expressions under `NO_CODEGEN` (interpreted
  * nullSafeEval — a lower bound on what the old CodegenFallback paid,
  * which added a boxed reflective eval INSIDE compiled projections) vs
  * `CODEGEN_ONLY` (the new doGenCode static-call path), same JVM, same
  * data, warm run discarded.
  *
  *   sbt "Test/runMain graft.CodegenBench"
  *
  * Not a ScalaTest suite on purpose: timing assertions are flaky;
  * correctness parity is pinned by [[CodegenParitySpec]] instead. */
object CodegenBench {
  def main(args: Array[String]): Unit = {
    val spark = Session.build(master = "local[8]",
      shufflePartitions = Some(8), appName = "cgbench")
    spark.sparkContext.setLogLevel("ERROR")
    val sf = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val docs = graft.sources.Tables.documents(spark, sf)
      .select(col("doc_id"), col("text")).localCheckpoint(true)
    val emb = graft.sources.Tables.embeddings(spark, sf).localCheckpoint(true)
    val toks = split(trim(lower(col("text"))), "\\s+")

    def time(mode: String, what: String)(body: => Unit): Double = {
      spark.conf.set("spark.sql.codegen.factoryMode", mode)
      body // warm: triggers compile/interpret setup
      val t0 = System.nanoTime; body
      (System.nanoTime - t0) / 1e6
    }

    val cases: Seq[(String, () => Unit)] = Seq(
      "minhash_sig(64) over word_shingles(3)" -> (() => docs.select(
        graft.functions.HashExprs.minhashSig(
          graft.functions.TextFns.wordShingles(col("text"), 3), 64).as("s"))
        .agg(sum(element_at(col("s"), 1))).collect()),
      "simhash64 over tokens" -> (() => docs.select(
        graft.functions.HashExprs.simhash64(toks).as("s"))
        .agg(sum(col("s"))).collect()),
      "bpe_count" -> (() => docs.select(
        graft.functions.Bpe.tokenCount(col("text")).as("n"))
        .agg(sum(col("n"))).collect()),
      "cosine x20 queries" -> (() => emb.crossJoin(
        emb.limit(20).select(col("embedding").as("q")))
        .select(graft.functions.VectorFns.cosine(col("embedding"), col("q"))
          .as("c"))
        .agg(sum(col("c"))).collect()))

    println(f"${"case"}%-40s ${"interpreted"}%12s ${"generated"}%12s  speedup")
    cases.foreach { case (name, body) =>
      val interp = time("NO_CODEGEN", name)(body())
      val gen = time("CODEGEN_ONLY", name)(body())
      println(f"$name%-40s $interp%10.1f ms $gen%10.1f ms  ${interp / gen}%5.2fx")
    }
    spark.stop()
  }
}
