package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** graft.plans.AsOfJoin — the native whole-operator as-of join. The
  * oracle gate already proves events_asof_native == the DuckDB SQL; this
  * spec pins (1) physical-plan shape, (2) full-set equivalence with the
  * window formulation, and (3) the pinned tie/carry semantics on
  * adversarial random inputs across partitionings. */
class AsOfJoinPlanSpec extends SparkSpec {
  import spark.implicits._

  test("plan: AsOfJoinExec with one exchange per side; no window, no union") {
    val p = Registry.queries("events_asof_native")(spark, Sf)
      .queryExecution.executedPlan.toString
    assert(p.contains("AsOfJoin"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Union"), p)
    assert(p.sliding("Exchange hashpartitioning".length)
      .count(_ == "Exchange hashpartitioning") == 2, p)
  }

  test("full event set: native == window formulation, row for row") {
    val native = Registry.queries("events_asof_native")(spark, Sf)
      .collect().map(_.toSeq).toSet
    val window = Registry.queries("events_asof_lastmark")(spark, Sf)
      .collect().map(_.toSeq).toSet
    assert(native == window)
    assert(native.nonEmpty)
  }

  test("random facts/markers with heavy ties: native == in-memory scan, any partitioning") {
    val rowGen = for {
      key <- Gen.choose(0L, 3L)     // few keys → heavy per-key traffic
      ts <- Gen.choose(0L, 20L)     // tiny ts domain → many exact ties
      id <- Gen.choose(0L, 1000000L)
      isMark <- Gen.oneOf(true, false)
      v <- Gen.choose(0, 1000).map(_ / 7.0)
    } yield (key, ts, id, isMark, v)
    val p = Prop.forAll(Gen.listOfN(60, rowGen), Gen.oneOf(1, 3, 7)) {
      (rows0, nPart) =>
        // distinct ids so the tie-break is total
        val rows = rows0.zipWithIndex
          .map { case ((k, t, _, m, v), i) => (k, t, i.toLong, m, v) }
        val facts = rows.filter(!_._4)
          .map { case (k, t, i, _, _) => (i, k, t) }
          .toDF("event_id", "user_id", "ts_us")
          .repartition(nPart)
        val marks = rows.filter(_._4)
          .map { case (k, t, i, _, v) => (k, t, i, v) }
          .toDF("user_id", "ts_us", "event_id", "m_value")
          .repartition(nPart)
        val got = graft.plans.AsOf
          .join(facts, marks, key = "user_id", time = "ts_us", tie = "event_id")
          .toDF("event_id", "user_id", "ts_us",
            "m_user", "m_ts", "m_id", "m_value")
          .collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(5)) None else Some((r.getLong(5), r.getDouble(6)))))
          .toMap
        val expected = rows.filter(!_._4).map { case (k, t, i, _, _) =>
          val m = rows.filter(r => r._4 && r._1 == k && r._2 <= t)
            .sortBy(r => (r._2, r._3)).lastOption
          i -> m.map(r => (r._3, r._5))
        }.toMap
        got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(30)
        .withInitialSeed(org.scalacheck.rng.Seed(7L)), p)
    assert(res.passed, res.status.toString)
  }

  test("forward direction: full set == window formulation; random ties agree with scan") {
    val native = Registry.queries("events_asof_forward_native")(spark, Sf)
      .collect().map(_.toSeq).toSet
    val window = Registry.queries("events_asof_forward")(spark, Sf)
      .collect().map(_.toSeq).toSet
    assert(native == window)
    assert(native.nonEmpty)

    val rowGen = for {
      key <- Gen.choose(0L, 3L)
      ts <- Gen.choose(0L, 20L)
      isMark <- Gen.oneOf(true, false)
      v <- Gen.choose(0, 1000).map(_ / 7.0)
    } yield (key, ts, isMark, v)
    val p = Prop.forAll(Gen.listOfN(60, rowGen), Gen.oneOf(1, 3, 7)) {
      (rows0, nPart) =>
        val rows = rows0.zipWithIndex
          .map { case ((k, t, m, v), i) => (k, t, i.toLong, m, v) }
        val facts = rows.filter(!_._4)
          .map { case (k, t, i, _, _) => (i, k, t) }
          .toDF("event_id", "user_id", "ts_us").repartition(nPart)
        val marks = rows.filter(_._4)
          .map { case (k, t, i, _, v) => (k, t, i, v) }
          .toDF("user_id", "ts_us", "event_id", "m_value").repartition(nPart)
        val got = graft.plans.AsOf
          .join(facts, marks, "user_id", "ts_us", "event_id", forward = true)
          .toDF("event_id", "user_id", "ts_us",
            "m_user", "m_ts", "m_id", "m_value")
          .collect()
          .map(r => r.getLong(0) ->
            (if (r.isNullAt(5)) None else Some((r.getLong(5), r.getDouble(6)))))
          .toMap
        val expected = rows.filter(!_._4).map { case (k, t, i, _, _) =>
          val m = rows.filter(r => r._4 && r._1 == k && r._2 >= t)
            .sortBy(r => (r._2, r._3)).headOption
          i -> m.map(r => (r._3, r._5))
        }.toMap
        got == expected
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(30)
        .withInitialSeed(org.scalacheck.rng.Seed(13L)), p)
    assert(res.passed, res.status.toString)
  }

  test("AsOf.join rejects a missing column by name") {
    val df = Seq((1L, 2L, 3L)).toDF("a", "b", "c")
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(df, df, key = "nope", time = "b", tie = "c")
    }
    assert(e.getMessage.contains("nope"))
  }

  test("AsOf.join rejects mismatched key/time/tie dataTypes up front") {
    val facts = Seq((1L, 2L, 3L)).toDF("k", "t", "id")
    val markers = Seq((1, 2L, 3L)).toDF("k", "t", "id") // INT key
    val e = intercept[IllegalArgumentException] {
      graft.plans.AsOf.join(facts, markers, key = "k", time = "t", tie = "id")
    }
    assert(e.getMessage.contains("dataType mismatch"), e.getMessage)
    assert(e.getMessage.contains("'k'"), e.getMessage)
  }

  test("null keys and times merge like the window twin instead of crashing") {
    // the window formulation groups NULL keys together (partitionBy)
    // and sorts NULL times first (NULLS FIRST) — the native merge must
    // agree, not NPE in the interpreted ordering
    val facts = Seq[(Option[Long], Option[Long], Long, String)](
      (Some(1L), Some(10L), 1L, "f1"),
      (None, Some(10L), 2L, "f-nullkey"),
      (Some(1L), None, 3L, "f-nulltime"),
      (None, None, 4L, "f-bothnull")
    ).toDF("k", "t", "id", "tag")
    val markers = Seq[(Option[Long], Option[Long], Long, String)](
      (Some(1L), Some(5L), 10L, "m1"),
      (None, Some(5L), 11L, "m-nullkey"),
      (Some(1L), None, 12L, "m-nulltime"),
      (None, None, 13L, "m-bothnull")
    ).toDF("k", "t", "id", "mtag")
    val out = graft.plans.AsOf
      .join(facts, markers, key = "k", time = "t", tie = "id")
      .select(col("tag"), col("mtag"))
      .collect().map(r => r.getString(0) -> r.getString(1)).toMap
    // null time sorts FIRST: a null-time marker is ≤ every fact time;
    // a null-time fact matches only null-time markers
    assert(out("f1") == "m1")             // normal path
    assert(out("f-nullkey") == "m-nullkey")   // null keys group together
    assert(out("f-nulltime") == "m-nulltime") // null time ≤ null time only
    assert(out("f-bothnull") == "m-bothnull")
  }
}
