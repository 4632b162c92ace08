package graft

import org.apache.spark.sql.functions._

import graft.operators.Privacy

/** k-anonymity audit + suppression: hand-checked group accounting, NULL
  * quasi-identifiers group together, suppression keeps exactly the
  * passing groups' rows. */
class PrivacySpec extends SparkSpec {
  import spark.implicits._

  private lazy val people = Seq(
    // (zip, age_band, diagnosis)
    ("10001", "30-39", "flu"), ("10001", "30-39", "cold"),
    ("10001", "30-39", "flu"),
    ("10002", "40-49", "flu"),                          // singleton group
    (null: String, "30-39", "ok"), (null: String, "30-39", "ok")
  ).toDF("zip", "age_band", "diagnosis")

  test("audit: group sizes, l-diversity, and the k verdict") {
    val audit = Privacy.kAnonymityAudit(
        people, Seq("zip", "age_band"), "diagnosis", k = 2)
      .collect()
      .map(r => (Option(r.getString(0)).getOrElse("NULL"), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getBoolean(4))).toMap
    assert(audit(("10001", "30-39")) == ((3L, 2L, true)))
    assert(audit(("10002", "40-49")) == ((1L, 1L, false)))
    // NULL QI values form a (re-identifiable) group of their own
    assert(audit(("NULL", "30-39")) == ((2L, 1L, true)))
  }

  test("suppression drops exactly the rows of sub-k groups") {
    val kept = Privacy.suppressSmallGroups(people, Seq("zip", "age_band"),
      k = 2)
    assert(kept.count() == 5, "only the singleton 10002 row drops")
    assert(kept.filter(col("zip") === "10002").count() == 0)
    // idempotent: suppressing an already-k-anonymous table is a no-op
    val again = Privacy.suppressSmallGroups(kept, Seq("zip", "age_band"),
      k = 2)
    assert(again.count() == kept.count())
  }

  test("audit over the customer fixture: sizes sum to the table size") {
    val cust = graft.sources.Tables.customer(spark, sf0001)
    val audit = Privacy.kAnonymityAudit(cust,
      Seq("c_nationkey", "c_mktsegment"), "c_acctbal", k = 10)
    assert(audit.agg(sum(col("group_size"))).head.getLong(0) == cust.count())
  }

  test("dpLaplaceCounts: bounded deterministic noise, no true count leaks") {
    import spark.implicits._
    val df = (1 to 300).map(i => (i.toLong, s"g${i % 3}")).toDF("id", "grp")
    val rel = Privacy.dpLaplaceCounts(df, "grp", epsilon = 0.5)
    assert(rel.columns.toSeq == Seq("grp", "epsilon", "noisy_count"),
      "the true count must not appear in the release")
    val rows = rel.orderBy("grp").collect()
    assert(rows.length == 3)
    rows.foreach { r =>
      // |Laplace^-1(u)| <= b*ln(granularity) for the coarsest hash bucket:
      // 2*ln(8192) < 19; every group's true count is 100
      assert(math.abs(r.getDouble(2) - 100.0) < 19.0,
        s"noise out of the inverse-CDF envelope: $r")
    }
    // deterministic: a repartitioned rerun is bit-identical
    val again = Privacy.dpLaplaceCounts(df.repartition(7), "grp", 0.5)
      .orderBy("grp").collect()
    assert(rows.map(_.getDouble(2)).toSeq == again.map(_.getDouble(2)).toSeq)
    // epsilon scales the noise: smaller epsilon, larger magnitude
    val tight = Privacy.dpLaplaceCounts(df, "grp", epsilon = 5.0)
      .orderBy("grp").collect()
    rows.zip(tight).foreach { case (loose, t) =>
      assert(math.abs(t.getDouble(2) - 100.0) <=
        math.abs(loose.getDouble(2) - 100.0) + 1e-9)
    }
  }

  test("pseudonymize: deterministic, bijective on the fixture, " +
    "seed-sensitive, NULL ids stay NULL, id column dropped") {
    val df = Seq[(Long, java.lang.Long)]((1L, 7L), (2L, 7L), (3L, 9L),
      (4L, null)).toDF("row_id", "uid")
    val got = Privacy.pseudonymize(df, "uid", seed = "s1")
      .orderBy("row_id").collect()
    assert(!got.head.schema.fieldNames.contains("uid"))
    val tok = got.map(r =>
      if (r.isNullAt(r.fieldIndex("token"))) null
      else r.getAs[String]("token"))
    assert(tok(0) == tok(1), "same id, same token")
    assert(tok(0) != tok(2), "different ids, different tokens")
    assert(tok(3) == null, "NULL id stays NULL")
    assert(tok(0).length == 64 && tok(0).matches("[0-9a-f]{64}"))
    // a new seed is a new token universe
    val other = Privacy.pseudonymize(df, "uid", seed = "s2")
      .orderBy("row_id").collect().map(_.getAs[String]("token"))
    assert(other(0) != tok(0))
    // layout invariance
    val again = Privacy.pseudonymize(df.repartition(5), "uid", seed = "s1")
      .orderBy("row_id").collect().map(_.getAs[String]("token"))
    assert(again.toSeq == tok.toSeq)
  }
}
