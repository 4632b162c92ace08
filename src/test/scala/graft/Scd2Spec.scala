package graft

import graft.operators.Scd2

/** SCD2 historization: consecutive-duplicate collapse, half-open interval
  * chaining, NULL runs, same-timestamp tie determinism. */
class Scd2Spec extends SparkSpec {
  import spark.implicits._

  test("runs collapse and intervals chain half-open") {
    val log = Seq(
      (1L, 10L, 1L, "a"), (1L, 20L, 2L, "a"), // duplicate run collapses
      (1L, 30L, 3L, "b"),
      (1L, 40L, 4L, "a")                      // value returns -> NEW interval
    ).toDF("k", "t", "id", "attr")
    val got = Scd2.fromChangeLog(log, "k", Seq("t", "id"), "attr")
      .collect().map(r => (r.getString(1), r.getLong(2), Option(r.get(3)), r.getBoolean(4)))
    assert(got.toSeq.sortBy(_._2) == Seq(
      ("a", 10L, Some(30L), false),
      ("b", 30L, Some(40L), false),
      ("a", 40L, None, true)))
  }

  test("NULL attribute values form runs (null-safe comparison)") {
    val log = Seq(
      (1L, 10L, 1L, null.asInstanceOf[String]),
      (1L, 20L, 2L, null.asInstanceOf[String]),
      (1L, 30L, 3L, "x")
    ).toDF("k", "t", "id", "attr")
    val got = Scd2.fromChangeLog(log, "k", Seq("t", "id"), "attr").collect()
    assert(got.length == 2)
    val nullRun = got.find(_.isNullAt(1)).get
    assert(nullRun.getLong(2) == 10L && nullRun.getLong(3) == 30L)
  }

  test("keys historize independently; single-change key is current from start") {
    val log = Seq((1L, 10L, 1L, "a"), (2L, 5L, 2L, "z")).toDF("k", "t", "id", "attr")
    val got = Scd2.fromChangeLog(log, "k", Seq("t", "id"), "attr")
      .collect().map(r => r.getLong(0) -> r.getBoolean(4)).toMap
    assert(got == Map(1L -> true, 2L -> true))
  }

  test("same-timestamp changes are ordered by the tie-breaker id") {
    val log = Seq(
      (1L, 10L, 1L, "a"), (1L, 10L, 2L, "b"), (1L, 20L, 3L, "c")
    ).toDF("k", "t", "id", "attr")
    val got = Scd2.fromChangeLog(log, "k", Seq("t", "id"), "attr")
      .collect().map(r => (r.getString(1), r.getLong(2), Option(r.get(3)))).toSet
    assert(got == Set(("a", 10L, Some(10L)), ("b", 10L, Some(20L)), ("c", 20L, None)))
  }

  test("property: intervals reconstruct the collapsed run sequence on random logs") {
    val rnd = new scala.util.Random(23)
    for (trial <- 0 until 3) {
      val log = (0 until 60).map { i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(20).toLong, i.toLong,
          Seq("a", "b", "c")(rnd.nextInt(3)))
      }
      // reference: per key, sort by (t, id), collapse consecutive dups
      val expected = log.groupBy(_._1).flatMap { case (k, rows) =>
        val sorted = rows.sortBy(r => (r._2, r._3))
        val runs = sorted.foldLeft(List.empty[(String, Long)]) {
          case (acc, (_, t, _, v)) =>
            if (acc.headOption.exists(_._1 == v)) acc
            else (v, t) :: acc
        }.reverse
        runs.zipAll(runs.drop(1).map(r => Some(r._2)), null, None)
          .collect { case ((v, from), to) =>
            (k, v, from, to.asInstanceOf[Option[Long]], to.isEmpty)
          }
      }.toSet
      val got = Scd2.fromChangeLog(log.toDF("k", "t", "id", "attr"),
          "k", Seq("t", "id"), "attr")
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
          if (r.isNullAt(3)) None else Some(r.getLong(3)), r.getBoolean(4)))
        .toSet
      assert(got == expected, s"trial $trial")
    }
  }

  test("exactly one exchange: both windows share the key partitioning") {
    val log = Seq((1L, 10L, 1L, "a")).toDF("k", "t", "id", "attr")
    val plan = Scd2.fromChangeLog(log, "k", Seq("t", "id"), "attr")
      .queryExecution.executedPlan.toString
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).length
    assert(exchanges == 1, s"expected 1 key exchange, plan:\n$plan")
  }
}
