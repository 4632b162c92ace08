package graft

import org.apache.spark.sql.functions._

import graft.operators.{Quarantine, StoreDiff}

/** Quarantine routing and keyed-snapshot diff semantics. */
class QuarantineSpec extends SparkSpec {
  import spark.implicits._

  private def rows = Seq(
    (1L, "12,5%"),                      // clean
    (2L, "-"),                          // blank marker
    (3L, ""),                           // empty
    (4L, "n/d"),                        // unparseable
    (5L, null.asInstanceOf[String])     // NULL cell
  ).toDF("id", "bruto")

  private val rules = Seq(
    "null_cell" -> col("bruto").isNull,
    "blank_cell" -> trim(col("bruto")).isin("", "-"),
    "unparseable_value" ->
      graft.functions.Fns.parseLocaleNumber(col("bruto")).isNull)

  test("first-match rule order; NULL predicates do not fire a later rule " +
    "accidentally; clean + quarantined partition the input exactly") {
    val q = Quarantine.quarantined(rows, rules)
      .collect().map(r => r.getLong(0) -> r.getString(2)).toMap
    assert(q == Map(2L -> "blank_cell", 3L -> "blank_cell",
      4L -> "unparseable_value", 5L -> "null_cell"))
    val c = Quarantine.clean(rows, rules).collect()
    assert(c.map(_.getLong(0)).toSeq == Seq(1L))
    assert(c.head.schema.fieldNames.toSeq == Seq("id", "bruto"),
      "clean side must not leak the tag column")
    assert(q.size + c.length == rows.count())
  }

  test("a NULL-evaluating rule predicate is skipped, not treated as a hit") {
    // value > 0 is NULL for the NULL cell: without an explicit isNull rule
    // first, the row must fall through to NO reason (clean), proving NULL
    // predicates never fire
    val df = Seq((1L, Some(5.0)), (2L, None: Option[Double])).toDF("id", "v")
    val q = Quarantine.quarantined(df,
      Seq("negative" -> (col("v") < 0))).collect()
    assert(q.isEmpty, "NULL predicate fired a quarantine rule")
  }

  test("store diff: only_left / only_right / changed classified; equal " +
    "rows dropped; NULL values compare equal (null-safe)") {
    val l = Seq((1L, Some(1.0), "a"), (2L, Some(2.0), "b"),
      (3L, None: Option[Double], "c"), (4L, Some(4.0), "d"))
      .toDF("k", "v", "s")
    val r = Seq((2L, Some(2.5), "b"), (3L, None: Option[Double], "c"),
      (4L, Some(4.0), "d"), (5L, Some(5.0), "e"))
      .toDF("k", "v", "s")
    val got = StoreDiff.diff(l, r, keys = Seq("k"), valueCols = Seq("v", "s"))
      .collect().map(x => x.getLong(0) -> x.getString(1)).toMap
    assert(got == Map(1L -> "only_left", 2L -> "changed",
      5L -> "only_right"),
      s"k=3 (NULL==NULL) and k=4 (equal) must be dropped: $got")
  }
}
