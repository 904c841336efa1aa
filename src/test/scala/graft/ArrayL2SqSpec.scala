package graft

import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.{HashFunctions => H}

/** graft.plans.ArrayL2Sq — the native fused squared-L2 loop must be
  * BIT-identical to the HOF reference formulation (one order-pinned
  * left fold of (x−y)²), because the PQ oracle mirrors that fold. */
class ArrayL2SqSpec extends SparkSpec {
  import spark.implicits._

  private val vecGen: Gen[List[Float]] =
    Gen.choose(1, 96).flatMap(n =>
      Gen.listOfN(n, Gen.choose(-1000000, 1000000).map(_ / 61.0f)))

  test("native == HOF fold, bit for bit, on random float vectors") {
    val p = Prop.forAll(vecGen, vecGen) { (a: List[Float], b0: List[Float]) =>
      val b = (b0 ++ List.fill(math.max(0, a.length - b0.length))(0.25f))
        .take(a.length)
      val row = Seq((a, b)).toDF("a", "b")
        .select(
          H.l2sq(col("a"), col("b")).as("native"),
          H.l2sqHof(col("a"), col("b")).as("hof"))
        .collect()(0)
      java.lang.Double.doubleToRawLongBits(row.getDouble(0)) ==
        java.lang.Double.doubleToRawLongBits(row.getDouble(1))
    }
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(40)
        .withInitialSeed(org.scalacheck.rng.Seed(13L)), p)
    assert(res.passed, res.status.toString)
  }

  test("null array, null element, and length mismatch all yield null") {
    val df = Seq(
      (Some(List(1.0f, 2.0f)), None: Option[List[Float]]),
      (Some(List(1.0f, 2.0f)), Some(List(3.0f))),
      (None: Option[List[Float]], Some(List(3.0f)))
    ).toDF("a", "b")
      .select(H.l2sq(col("a"), col("b")).as("d"))
      .collect()
    assert(df.forall(_.isNullAt(0)))
    // identical vectors → exactly zero
    val z = Seq((List(1.5f, -2.5f), List(1.5f, -2.5f))).toDF("a", "b")
      .select(H.l2sq(col("a"), col("b"))).collect()(0).getDouble(0)
    assert(z == 0.0)
  }
}
