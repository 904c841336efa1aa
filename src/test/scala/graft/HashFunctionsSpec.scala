package graft

import org.apache.spark.sql.functions._
import graft.functions.{HashFunctions => H, TextFunctions => T}

class HashFunctionsSpec extends SparkSpec {
  import spark.implicits._

  test("polyHash matches the reference fold and ignores the trailing split empty") {
    val out = Seq("abc").toDF("x")
      .select(T.polyHash(col("x")).as("h")).collect()(0).getLong(0)
    var acc = 0L
    "abc".foreach(c => acc = (acc * 31 + c.toLong) % T.HashMod)
    assert(out == acc)
  }

  test("shingles: distinct word 3-grams; short docs yield none") {
    val df = Seq("a b c d b a b c d", "a b").toDF("t")
    val out = df.select(H.shingles(T.tokens(col("t"))).as("s"))
      .collect().map(_.getSeq[String](0))
    assert(out(0).toSet == Set("a b c", "b c d", "c d b", "d b a", "b a b"))
    assert(out(1).isEmpty)
  }

  test("identical texts produce identical minhash signatures; est Jaccard 1.0") {
    val docs = Seq((1L, "w1 w2 w3 w4 w5 w6"), (2L, "w1 w2 w3 w4 w5 w6")).toDF("doc_id", "text")
    val exh = docs.select(col("doc_id"),
      explode(H.shingles(T.tokens(col("text")))).as("g"))
      .select(col("doc_id"), T.polyHash(col("g")).as("h"))
    val aggs = H.signatureAggs(col("h"))
    val sig = exh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .orderBy("doc_id").collect()
    assert((1 to H.MinHashK).forall(i => sig(0).get(i) == sig(1).get(i)))
  }

  test("simhash: equal for identical token bags, bit-bounded") {
    val docs = Seq((1L, "alpha beta gamma"), (2L, "alpha beta gamma")).toDF("doc_id", "text")
    val exh = docs.select(col("doc_id"), explode(T.tokens(col("text"))).as("tok"))
      .select(col("doc_id"), T.polyHash(col("tok")).as("h"))
    val aggs = H.bitSumAggs(col("h"))
    val out = exh.groupBy(col("doc_id")).agg(aggs.head, aggs.tail: _*)
      .select(col("doc_id"), H.simhashFromSums.as("sh"))
      .orderBy("doc_id").collect()
    val (a, b) = (out(0).getLong(1), out(1).getLong(1))
    assert(a == b)
    assert(a >= 0 && a < (1L << H.SimHashBits))
  }

  test("cosine: self-similarity is 1.0, orthogonal is 0.0") {
    val df = Seq(
      (Seq(1.0f, 0.0f), Seq(1.0f, 0.0f)),
      (Seq(1.0f, 0.0f), Seq(0.0f, 2.0f))).toDF("a", "b")
    val out = df.select(H.cosine(col("a"), col("b")).as("c")).collect()
    assert(out(0).getDouble(0) == 1.0)
    assert(out(1).getDouble(0) == 0.0)
  }

  test("hyperplane sketch is deterministic and within bit range") {
    val e = Seq((1L, (0 until 64).map(i => (i % 7 - 3).toFloat)))
      .toDF("vec_id", "embedding")
    val s1 = e.select(H.hyperplaneSketch(col("embedding"), 64).as("s"))
      .collect()(0).getLong(0)
    val s2 = e.select(H.hyperplaneSketch(col("embedding"), 64).as("s"))
      .collect()(0).getLong(0)
    assert(s1 == s2 && s1 >= 0 && s1 < (1L << H.NumPlanes))
  }

  test("affine mixes stay within [0, p) for the extreme hash inputs (no long overflow)") {
    val p = T.HashMod
    for (i <- Seq(0, 15, 31)) {
      // worst case: h = p-1 with the largest coefficients
      val worst = H.mixA(i) * (p - 1) + H.mixB(i)
      assert(worst > 0, s"mix $i overflows a long") // no wraparound
      assert(H.mixA(i) > 0 && H.mixA(i) < p && H.mixB(i) >= 0 && H.mixB(i) < p)
    }
    // shingle combine bound: acc < p, so acc*8191 + h < p*8192 < 2^63
    assert(BigInt(p) * 8192 < BigInt(Long.MaxValue))
  }

  test("text metrics: known-answer checks") {
    val df = Seq("The cat and the dog!").toDF("text")
    val out = df.select(
      T.tokenCount(col("text")).as("n"),
      T.lexiconHits(T.tokens(col("text")), T.Stopwords).as("stop"),
      T.langId(col("text")).as("lang")).collect()(0)
    assert(out.getInt(0) == 5)
    assert(out.getInt(1) == 3) // the, and, the
    assert(out.getString(2) == "en")
  }
}
