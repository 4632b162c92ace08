package graft

import org.apache.spark.sql.functions._

import graft.functions.TextFns

class TextFnsSpec extends SparkSpec {
  import spark.implicits._

  test("tokenCount + bpeishCount") {
    val df = Seq("hello world 123", "one-two  three").toDF("t")
      .select(TextFns.tokenCount(col("t")).as("n"),
        TextFns.bpeishCount(col("t")).as("b"))
    val got = df.collect().map(r => (r.getInt(0), r.getInt(1)))
    assert(got(0)._1 == 3)
    assert(got(1)._1 == 2)
    assert(got(0)._2 >= 3) // subword count >= word count for ascii text
  }

  test("langId picks the language with most stopword hits; CJK wins outright") {
    val df = Seq(
      "the cat is in the house and it is warm",
      "der Hund ist nicht mit der Katze und das ist gut",
      "le chat est dans la maison et il est pour toi",
      "el perro es un animal y es bueno en la casa",
      "你好世界 this has chinese characters",
      "xyzzy plugh qwerty").toDF("t")
      .select(TextFns.langId(col("t")).as("l")).as[String].collect()
    assert(df.toSeq == Seq("en", "de", "fr", "es", "zh", "und"))
  }

  test("wordShingles: n-token windows; short docs -> empty") {
    val got = Seq("a b c d", "a b").toDF("t")
      .select(TextFns.wordShingles(col("t"), 3).as("s"))
      .collect().map(_.getAs[scala.collection.Seq[String]]("s").toSeq)
    assert(got(0) == Seq("a b c", "b c d"))
    assert(got(1).isEmpty)
  }

  test("property: Jaccard over xxhash64-hashed shingles equals string-set " +
    "Jaccard on random token sets") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(3)
    val rows = (1 to 50).map { i =>
      val a = Seq.fill(rnd.nextInt(30) + 1)(s"w${rnd.nextInt(40)}")
      val b = Seq.fill(rnd.nextInt(30) + 1)(s"w${rnd.nextInt(40)}")
      (i, a, b)
    }
    val df = rows.toDF("id", "a", "b").select(
      graft.functions.TextExprs.jaccardSim(col("a"), col("b")).as("js"),
      graft.functions.TextExprs.jaccardSim(
        transform(col("a"), x => xxhash64(x)),
        transform(col("b"), x => xxhash64(x))).as("jh"))
    df.collect().foreach(r => assert(r.getDouble(0) == r.getDouble(1)))
  }

  test("redactPii: URL-before-email order, all occurrences, null passthrough") {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq(
      ("mail me: a.b+c@x-corp.io or b@y.co", "mail me: <EMAIL> or <EMAIL>"),
      // the email-shaped token inside the URL is consumed by the URL tag
      ("see https://h.io/u@v.com?q=1 now", "see <URL> now"),
      ("call +55 11 91234-5678 today", "call <PHONE> today"),
      ("clean text stays intact", "clean text stays intact"),
      (null, null))
    rows.toDF("text", "expected")
      .select(TextFns.redactPii(col("text")).as("got"), col("expected"))
      .collect().foreach(r => assert(r.get(0) == r.get(1), r.toString))
  }

  test("fingerprint: whitespace-insensitive, content-sensitive") {
    val got = Seq("a  b\tc", "a b c", "a b d").toDF("t")
      .select(TextFns.fingerprint(col("t")).as("f")).as[Long].collect()
    assert(got(0) == got(1))
    assert(got(1) != got(2))
  }

  test("langid confusion matrix: cells partition each truth class and " +
    "recall millis floor exactly") {
    // NOTE the fixture's lang column is a synthetic LABEL, not the text's
    // actual language (the generator writes English-ish prose under every
    // label) — so no diagonal-dominance assumption holds here, and that
    // disagreement is precisely what the matrix exists to expose. The
    // spec pins the matrix ARITHMETIC, not the detector's accuracy.
    val rows = SparkEntry.queries("text_langid_confusion")(spark, sf0001)
      .collect()
      .map(r => (r.getString(0), r.getString(1), r.getAs[Long]("n"),
        r.getAs[Long]("recall_milli")))
    assert(rows.nonEmpty)
    val total = graft.sources.Tables.documents(spark, sf0001)
      .filter(col("text").isNotNull).count()
    assert(rows.map(_._3).sum == total, "cells must partition the corpus")
    rows.groupBy(_._1).foreach { case (_, cells) =>
      val cls = cells.map(_._3).sum
      cells.foreach { case (_, _, n, rm) => assert(rm == n * 1000 / cls) }
    }
  }
}
