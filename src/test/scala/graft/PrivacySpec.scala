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
}
