package graft

import org.apache.spark.sql.functions._

/** Designs behind the round-7 additions that the DuckDB oracles mirror
  * rather than independently check: the skyline aggregate formulation
  * equals brute-force dominance, the theta/CM sketches estimate within
  * their published error shapes, the compaction planner preserves rows
  * and clustering, the Benford expectation table is a distribution. */
class ParetoCompactionSpec extends SparkSpec {

  test("olap_skyline equals brute-force dominance, both directions") {
    val got = Registry.queries("olap_skyline")(spark, Sf).collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2))).toSet
    val all = spark.read.parquet(s"$Sf/part.parquet")
      .select("p_partkey", "p_size", "p_retailprice").collect()
      .map(r => (r.getLong(0), r.getInt(1), r.getDouble(2)))
    def dominates(q: (Long, Int, Double), p: (Long, Int, Double)): Boolean =
      q._2 >= p._2 && q._3 <= p._3 && (q._2 > p._2 || q._3 < p._3)
    val brute = all.filter(p => !all.exists(q => dominates(q, p))).toSet
    assert(got == brute)
    assert(got.nonEmpty)
    // completeness the other way: every non-survivor is dominated by
    // some SURVIVOR (the front itself suffices as a witness set)
    all.filterNot(brute).foreach { p =>
      assert(brute.exists(q => dominates(q, p)))
    }
  }

  test("sketch_theta_intersect: kept sets bounded by k, estimates near exact") {
    val r = Registry.queries("sketch_theta_intersect")(spark, Sf).collect()(0)
    val k = r.getAs[Int]("k")
    assert(r.getAs[Long]("n_common_kept") <= k)
    assert(r.getAs[Long]("n_union_kept") <= 2L * k)
    val exactI = r.getAs[Long]("exact_intersect")
    val exactU = r.getAs[Long]("exact_union")
    assert(exactI > 0 && exactU > exactI) // fixture: partial overlap
    // theta sketches at k=64 carry ~13% relative σ on the union and
    // more on the (smaller) intersection; a wide 3σ-ish band still
    // proves the estimator tracks the truth rather than the hash noise
    val estI = r.getAs[Double]("est_intersect")
    val estU = r.getAs[Double]("est_union")
    assert(math.abs(estU - exactU) <= 0.5 * exactU)
    assert(math.abs(estI - exactI) <= 0.6 * exactI)
  }

  test("sketch_cm_joinsize: one-sided and within the additive error bound") {
    val r = Registry.queries("sketch_cm_joinsize")(spark, Sf).collect()(0)
    val exact = r.getAs[Long]("exact_join_size")
    val est = r.getAs[Long]("est_join_size")
    assert(exact > 0)
    assert(est >= exact) // collisions only ADD mass
    assert(r.getAs[Long]("over_ppm") >= 0)
    // CM additive error per row ≈ |R|·|S|/w; min over d=4 rows should
    // land well inside 3× that envelope
    val nR = r.getAs[Long]("n_click_rows")
    val nS = r.getAs[Long]("n_purchase_rows")
    assert(est - exact <= 3L * nR * nS / 256L)
  }

  test("layout_compaction_bins preserves rows, files, and clustering") {
    val bins = Registry.queries("layout_compaction_bins")(spark, Sf).collect()
    val orders = spark.read.parquet(s"$Sf/orders.parquet")
    val nOrders = orders.count()
    val nFiles = orders
      .selectExpr("date_format(o_orderdate, 'yyyy-MM')", "o_orderkey DIV 100")
      .distinct().count()
    assert(bins.map(_.getAs[Long]("total_rows")).sum == nOrders)
    assert(bins.map(_.getAs[Long]("n_files")).sum == nFiles)
    bins.groupBy(_.getAs[String]("part_month")).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_.getAs[Long]("bin_id"))
      // bin ids dense from 0 (the cumulative-sum planner never skips)
      assert(sorted.head.getAs[Long]("bin_id") == 0L)
      // adjacent coalescing keeps bins' key ranges disjoint and ordered
      sorted.sliding(2).foreach {
        case Array(a, b) =>
          assert(a.getAs[Long]("max_key") < b.getAs[Long]("min_key"))
        case _ =>
      }
      // every bin but the month's last closes at or past its target
      // boundary: cum_before of its last file < (bin_id+1)·target while
      // the NEXT bin exists ⟹ this bin's span reached the boundary
      val target = sorted.head.getAs[Long]("target_bytes")
      val cums = sorted.scanLeft(0L)(_ + _.getAs[Long]("total_bytes")).tail
      sorted.init.zip(cums.init).foreach { case (bin, cumEnd) =>
        assert(cumEnd >= (bin.getAs[Long]("bin_id") + 1L) * target)
      }
    }
  }

  test("dq_benford: counts partition the table, expectation is a distribution") {
    val rows = Registry.queries("dq_benford")(spark, Sf).collect()
    val nOrders = spark.read.parquet(s"$Sf/orders.parquet").count()
    assert(rows.map(_.getAs[Long]("n_obs")).sum == nOrders)
    assert(rows.forall { r =>
      val d = r.getAs[Int]("first_digit"); d >= 1 && d <= 9
    })
    // the nine JVM-precomputed ppm literals must themselves sum to ~1e6
    // (they are a probability distribution, not nine free constants)
    val expSum = (1 to 9)
      .map(d => math.round(math.log10(1.0 + 1.0 / d) * 1000000.0)).sum
    assert(math.abs(expSum - 1000000L) <= 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("dev_ppm") ==
        r.getAs[Long]("obs_ppm") - r.getAs[Long]("exp_ppm"))
    }
  }
}
