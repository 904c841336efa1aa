package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}
import graft.functions.{TextFunctions => T}

/** Value-parity pins for the r14 tokens-once refactor: the let-bound
  * single-pass formulations (tokenStats fold + bind) are never allowed
  * to drift from the independent-derivation reference expressions the
  * DuckDB oracles mirror — same kernel/twin discipline as CleanExprSpec
  * and PolyHashSpec. The references below are the pre-refactor trees
  * verbatim (each sub-metric re-deriving tokens(text) on its own). */
class TokenStatsSpec extends SparkSpec {
  import spark.implicits._

  // text-ish generator: words, whitespace runs (incl. tabs/newlines the
  // \s+ split collapses), stopwords from both lexicons, punctuation,
  // unicode, and empties — every branch of the stats fold
  private val texty: Gen[String] = {
    val atoms = Gen.oneOf[String](
      Gen.alphaNumStr.map(_.take(8)),
      Gen.oneOf(T.Stopwords),
      Gen.oneOf(T.LangLexicons.flatMap(_._2)),
      Gen.oneOf(" ", "  ", "\t", "\n", " \r ", ""),
      Gen.oneOf(".", ",", "!!", "#", "$1,2", "…", "漢字", "Ω"),
      Gen.choose(0, 999).map(_.toString))
    Gen.listOf(atoms).map(_.mkString(" "))
  }

  // pre-refactor references: independent derivations, one per metric
  private def stopwordRatioRef(text: Column): Column = {
    val toks = T.tokens(text)
    T.lexiconHits(toks, T.Stopwords).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0))
  }

  private def avgTokenLenRef(text: Column): Column = {
    val toks = T.tokens(text)
    aggregate(toks, lit(0L), (acc, t) => acc + length(t)).cast("double") /
      greatest(size(toks).cast("double"), lit(1.0))
  }

  private def qualityScoreRef(text: Column): Column = {
    val lenTerm = least(T.tokenCount(text).cast("double"), lit(100.0)) / lit(100.0)
    val punctTerm = lit(1.0) - least(T.punctRatio(text) * lit(4.0), lit(1.0))
    val stopTerm = least(stopwordRatioRef(text) * lit(4.0), lit(1.0))
    val wordTerm = lit(1.0) - least(abs(avgTokenLenRef(text) - lit(5.0)) / lit(5.0), lit(1.0))
    lenTerm * lit(0.25) + punctTerm * lit(0.25) + stopTerm * lit(0.25) + wordTerm * lit(0.25)
  }

  /** The r12 when-chain langId (lexicon-order tie-break, und on zero) —
    * the semantics both later rewrites must preserve. */
  private def langIdRef(text: Column): Column = {
    val toks = T.tokens(text)
    val scores = T.LangLexicons.map { case (lang, lex) =>
      lang -> T.lexiconHits(toks, lex)
    }
    val best = greatest(scores.map(_._2): _*)
    scores.foldLeft(when(lit(false), lit("")): Column) { case (acc, (lang, s)) =>
      acc.when(s === best && s > 0, lit(lang))
    }.otherwise(lit("und"))
  }

  private def pinned(input: Seq[String], pairs: (String, Column => Column, Column => Column)*): Boolean = {
    val df = input.toDF("s")
    pairs.forall { case (name, refFn, newFn) =>
      val rows = df.select(refFn(col("s")).as("r"), newFn(col("s")).as("n")).collect()
      rows.zip(input).forall { case (row, in) =>
        val ok = row.get(0) == row.get(1)
        if (!ok) System.err.println(
          s"$name divergence on ${in.take(60)}: ref=${row.get(0)} new=${row.get(1)}")
        ok
      }
    }
  }

  private def checkProp(p: Prop): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default
        .withMinSuccessfulTests(15)
        .withInitialSeed(org.scalacheck.rng.Seed(14L)), p)
    assert(res.passed, res.status.toString)
  }

  test("tokenStats-derived metrics match their independent-derivation references") {
    checkProp(Prop.forAll(Gen.listOfN(30, texty)) { ss =>
      val in = "" +: "   " +: "the of to in a" +: "der die und el la de" +:
        "x" * 300 +: ss
      pinned(in,
        ("stopwordRatio", stopwordRatioRef, T.stopwordRatio),
        ("avgTokenLen", avgTokenLenRef, T.avgTokenLen),
        ("qualityScore", qualityScoreRef, T.qualityScore),
        ("langId", langIdRef, T.langId))
    })
  }

  test("tokenStats field n equals size(tokens) exactly (incl. empty-split rows)") {
    val in = Seq("", " ", "a", "a b", "\t\n", "  a  ").toDF("s")
      .select(T.tokenStats(col("s")).getField("n").as("n"),
        size(T.tokens(col("s"))).cast("long").as("sz"))
      .collect()
    in.foreach(r => assert(r.getLong(0) == r.getLong(1), r.toString))
  }
}
