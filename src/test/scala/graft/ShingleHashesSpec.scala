package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.{HashFunctions => H, TextFunctions => T}

/** graft.plans.ShingleHashes — the native one-pass shingle kernel must
  * be value-identical (including element ORDER: first-occurrence
  * distinct) to the HOF chain tokenHashes → shingleHashesFrom, because
  * every dedup oracle mirrors that chain. */
class ShingleHashesSpec extends SparkSpec {
  import spark.implicits._

  private val tokGen: Gen[String] = Gen.oneOf(
    Gen.asciiPrintableStr.map(_.take(8)),
    Gen.oneOf("the", "quick", "brown", "ñandú", "中文", "😀", ""))
  private val docGen: Gen[List[String]] =
    Gen.choose(0, 30).flatMap(Gen.listOfN(_, tokGen))

  test("native kernel == HOF chain on random unicode token lists") {
    val p = Prop.forAll(docGen) { toks: List[String] =>
      val row = Seq(Tuple1(toks)).toDF("t")
        .select(
          H.shingleHashesOfTokens(col("t")).as("native"),
          H.shingleHashesFrom(H.tokenHashes(col("t"))).as("hof"))
        .collect()(0)
      row.getSeq[Long](0) == row.getSeq[Long](1)
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(60)
        .withInitialSeed(org.scalacheck.rng.Seed(17L)), p)
    assert(res.passed, res.status.toString)
  }

  test("edges: short docs empty, duplicates deduped first-occurrence, null tokens") {
    def native(toks: Seq[String]) = Seq(Tuple1(toks)).toDF("t")
      .select(H.shingleHashesOfTokens(col("t"))).collect()(0).getSeq[Long](0)
    assert(native(Seq("a", "b")) == Seq()) // < n tokens
    // 7 windows over the repeating trigram (xyz yzx zxy ...) collapse to
    // the 3 distinct shingles, first-occurrence order — checked against
    // the HOF twin
    val rep = native(Seq("x", "y", "z", "x", "y", "z", "x", "y", "z"))
    assert(rep.length == 3)
    val hof = Seq(Tuple1(Seq("x", "y", "z", "x", "y", "z", "x", "y", "z"))).toDF("t")
      .select(H.shingleHashesFrom(H.tokenHashes(col("t")))).collect()(0).getSeq[Long](0)
    assert(rep == hof)
    // null token nulls exactly the shingles containing it (one null kept)
    val withNull = Seq(Tuple1(Seq("a", null, "b", "c", "d"))).toDF("t")
      .select(
        H.shingleHashesOfTokens(col("t")).as("native"),
        H.shingleHashesFrom(H.tokenHashes(col("t"))).as("hof"))
      .collect()(0)
    assert(withNull.getSeq[Any](0) == withNull.getSeq[Any](1))
  }

  test("ordered (positional) shingles: first-occurrence distinct == the deduped chain") {
    // winnowing consumes the POSITIONAL sequence; its distinct must be
    // exactly what every other dedup consumer hashes, or the families
    // would silently index different shingle universes
    val p = Prop.forAll(docGen) { toks: List[String] =>
      val row = Seq(Tuple1(toks)).toDF("t")
        .select(
          H.orderedShingleHashesFrom(H.tokenHashes(col("t"))).as("ordered"),
          H.shingleHashesFrom(H.tokenHashes(col("t"))).as("deduped"),
          H.orderedShingleHashesOfTokens(col("t")).as("native"))
        .collect()(0)
      val ordered = row.getSeq[Any](0)
      val expectedLen = math.max(toks.length - 2, 0)
      ordered.length == expectedLen &&
        ordered.distinct == row.getSeq[Any](1) &&
        row.getSeq[Any](2) == ordered // native ordered kernel == HOF twin
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(60)
        .withInitialSeed(org.scalacheck.rng.Seed(23L)), p)
    assert(res.passed, res.status.toString)
  }
}
