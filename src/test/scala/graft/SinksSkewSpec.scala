package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.etl.{Sinks, Skew}

class SinksSkewSpec extends SparkSpec {
  import spark.implicits._

  test("S7 probe round-trips") {
    assert(Sinks.probe(spark))
  }

  test("snapshot parquet sink partitions by the stamp column (pruning path)") {
    val dir = Files.createTempDirectory("sink")
    val df = Seq((1L, "2024-06-01"), (2L, "2024-06-02")).toDF("id", "fecha_carga")
    Sinks.appendSnapshotParquet(df, dir.toString, "fecha_carga")
    // appends accumulate
    Sinks.appendSnapshotParquet(df, dir.toString, "fecha_carga")
    assert(Files.exists(dir.resolve("fecha_carga=2024-06-01")))
    val back = spark.read.parquet(dir.toString)
    assert(back.count() == 4)
    assert(back.filter(col("fecha_carga") === "2024-06-02").count() == 2)
  }

  test("compactParquet rewrites many small files into few sized outputs") {
    val in = Files.createTempDirectory("compact-in")
    val out = Files.createTempDirectory("compact-out").resolve("data")
    // 64 tiny files — the accumulation shape incremental appends produce
    spark.range(20000).toDF("id").repartition(64)
      .write.mode("overwrite").parquet(in.toString)
    val smallFiles = Files.list(in).filter(_.toString.endsWith(".parquet")).count()
    assert(smallFiles == 64)
    // target sized so the ~160KB input compacts to exactly 2 outputs
    val n = Sinks.compactParquet(spark, in.toString, out.toString,
      targetBytes = 100L * 1024)
    val outFiles = Files.list(out).filter(_.toString.endsWith(".parquet")).count()
    assert(outFiles == n && n < 64 && n >= 1)
    // content survives the rewrite
    val back = spark.read.parquet(out.toString)
    assert(back.count() == 20000)
    assert(back.agg(sum(col("id"))).collect()(0).getLong(0) == 20000L * 19999 / 2)
    // rebalance path produces the same content
    val out2 = Files.createTempDirectory("compact-out2").resolve("data")
    Sinks.compactParquet(spark, in.toString, out2.toString,
      targetBytes = 100L * 1024, rebalance = true)
    assert(spark.read.parquet(out2.toString).count() == 20000)
  }

  test("compactParquet refuses in-place / overlapping targets") {
    // spark.read is lazy, so overwrite-to-self would delete the source
    // mid-read and destroy the data being compacted; the input must
    // still be intact after each refusal
    val in = Files.createTempDirectory("compact-guard").resolve("data")
    spark.range(100).toDF("id").write.parquet(in.toString)
    for (bad <- Seq(
        in.toString,                       // identical
        in.resolve("nested").toString,     // out inside in
        in.getParent.toString))            // in inside out
      intercept[IllegalArgumentException] {
        Sinks.compactParquet(spark, in.toString, bad)
      }
    assert(spark.read.parquet(in.toString).count() == 100)
  }

  test("salted join returns the same rows as the plain join") {
    val skewed = (1 to 1000).map(i => (if (i % 10 == 0) 1L else i.toLong, i))
      .toDF("k", "v") // heavy key 1
    val dim = Seq((1L, "hot"), (2L, "cold"), (7L, "warm")).toDF("k", "name")
    val plain = skewed.join(dim, Seq("k")).orderBy("v")
      .collect().map(_.toSeq).toSeq
    val salted = Skew.saltedJoin(skewed, dim, Seq("k"), n = 8).orderBy("v")
      .select("k", "v", "name")
      .collect().map(_.toSeq).toSeq
    assert(salted == plain)
    // the point of the salt: the hot key's rows must SPREAD across salt
    // values (a key-derived salt would give them all one value and
    // re-concentrate the skew in a single task)
    val hotSalts = Skew
      .saltSkewed(skewed, 8, skewed.columns.map(skewed(_)).toIndexedSeq: _*)
      .filter(col("k") === 1L)
      .select(countDistinct(col("__salt")))
      .collect()(0).getLong(0)
    assert(hotSalts > 1, s"hot key landed on $hotSalts salt value(s)")
  }

  test("bucketed tables join without a shuffle exchange") {
    val a = (1 to 500).map(i => (i.toLong, s"a$i")).toDF("k", "va")
    val b = (1 to 500).map(i => (i.toLong, s"b$i")).toDF("k", "vb")
    Sinks.writeBucketed(a, "bkt_a", 4, Seq("k"))
    Sinks.writeBucketed(b, "bkt_b", 4, Seq("k"))
    val joined = spark.table("bkt_a").join(spark.table("bkt_b"), "k")
    val plan = joined.queryExecution.executedPlan.toString
    // co-located: sort-merge join reads both sides bucket-aligned —
    // no hashpartitioning Exchange on either side
    assert(!plan.contains("Exchange hashpartitioning"), plan)
    assert(joined.count() == 500)
  }

  test("J2 dim tie-break: duplicate dim keys resolve last-write-wins (pandas dict parity)") {
    val fact = Seq("acme").toDF("k")
    val dim = Seq(("acme", 1L, 10L), ("acme", 2L, 20L), ("other", 3L, 30L))
      .toDF("k", "id", "ord")
    val out = graft.etl.Lookups.enrichFromDim(fact, dim, "k", Seq("id"), tieBreak = "ord")
      .collect()
    assert(out.length == 1 && out(0).getAs[Long]("id") == 2L)
  }

  test("salt is deterministic per key tuple") {
    val df = Seq(("a", 1), ("a", 1), ("b", 2)).toDF("x", "y")
    val out = df.select(Skew.salt(16, col("x"), col("y")).as("s")).collect()
    assert(out(0).getInt(0) == out(1).getInt(0))
    assert(out.forall(r => r.getInt(0) >= 0 && r.getInt(0) < 16))
  }
}
