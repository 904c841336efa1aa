package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.{Dedup, Sources}

class SourcesDedupSpec extends SparkSpec {
  import spark.implicits._

  test("S1 csvSkipping drops 6 preamble lines and 1 footer line") {
    val f = Files.createTempFile("report", ".csv")
    Files.writeString(f,
      """Report generated 2024-06-01
        |Company: Example
        |
        |Filters: none
        |Period: June
        |
        |name,amount
        |alice,1
        |bob,2
        |TOTALS,3
        |""".stripMargin)
    val df = Sources.csvSkipping(spark, f.toString, preamble = 6, footer = 1)
    assert(df.columns.toSeq == Seq("name", "amount"))
    assert(df.count() == 2)
    assert(df.agg(sum("amount")).collect()(0).getLong(0) == 3)
  }

  test("S1 csvSkipping refuses directories") {
    val d = Files.createTempDirectory("reports")
    intercept[IllegalArgumentException] {
      Sources.csvSkipping(spark, d.toString)
    }
  }

  test("P2 positional rename ignores header text") {
    val df = Seq((1, 2, 3)).toDF("a", "b", "c")
    val out = Sources.renamePositional(df, Map(1 -> "x", 5 -> "oob"))
    assert(out.columns.toSeq == Seq("a", "x", "c"))
  }

  test("conditional schema: first present candidate wins") {
    val df = Seq(1).toDF("Status ")
    val out = Sources.renameFirstPresent(df, Seq("Validated Status ", "Status "), "estado")
    assert(out.columns.toSeq == Seq("estado"))
  }

  test("P4 tolerant projection keeps order, skips absent") {
    val df = Seq((1, 2)).toDF("a", "b")
    assert(Sources.projectTolerant(df, Seq("b", "ghost", "a")).columns.toSeq == Seq("b", "a"))
  }

  test("J4 anti-join dedup: only new keys survive; within-batch dups preserved (quirk 4)") {
    val existing = Seq((1, "x"), (2, "y")).toDF("k", "v")
    val incoming = Seq((2, "y"), (3, "z"), (3, "z")).toDF("k", "v") // 3 duplicated in-batch
    val out = Dedup.antiJoinNew(incoming, existing, Seq("k")).collect()
    assert(out.length == 2) // both copies of key 3 insert — no in-batch dedup
    assert(out.forall(_.getInt(0) == 3))
  }

  test("J4 normalized anti-join: keys normalized on both sides, helper cols dropped") {
    val existing = Seq("  A  ").toDF("k")
    val incoming = Seq("a", "b").toDF("k")
    val out = Dedup.antiJoinNewNormalized(
      incoming, existing, Seq("k" -> (c => lower(trim(c)))))
    assert(out.columns.toSeq == Seq("k"))
    assert(out.collect().map(_.getString(0)).toSeq == Seq("b"))
  }

  test("exact dedup keeps the smallest id per content group") {
    val df = Seq((5L, "same"), (1L, "same"), (9L, "other")).toDF("id", "t")
    val out = Dedup.exactDedup(df, Seq("t"), "id")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "same"), (9L, "other")))
  }
}
