package graft

import org.apache.spark.sql.functions._
import graft.Registry.Q
import graft.etl.Sources.table

/** The remaining distinct TPC-H plan shapes (beyond the Q1-Q19 subset in
  * AnalysisQueries): each query here exists because its SHAPE — not its
  * business meaning — is a pattern a 100 TB engine must get right.
  * Columns absent from the synthetic schema (partsupp, l_shipmode,
  * commit/receipt dates) are substituted with available ones while
  * preserving the plan pattern; each Scaladoc names the substitution.
  *
  * All money arithmetic follows Registry's parity rules: exact DECIMAL
  * sums (order-independent on both engines), one cast to DOUBLE at the
  * output edge, total ORDER BY.
  */
object TpchQueries {

  /** DECIMAL revenue term shared by the volume queries. */
  private def rev =
    col("l_extendedprice").cast("decimal(18,2)") *
      (lit(BigDecimal(1)).cast("decimal(18,2)") -
        col("l_discount").cast("decimal(18,2)"))

  private val revSql =
    """CAST(l_extendedprice AS DECIMAL(18,2)) *
      |(CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))""".stripMargin

  /** TPC-H Q7 shape (volume shipping between a nation pair): revenue by
    * (supplier nation, customer nation, ship year) restricted to the two
    * directions of one pair — the DOUBLE-dim-correlated disjunction. The
    * pair predicate touches two different broadcast dims at once, so it
    * can only evaluate after both nation attaches; what CAN push down is
    * the ship-year range on the fact scan. Both nation joins broadcast;
    * the only hash exchange is the final 3-key group (ref: the
    * multi-table enrichment shape of wor2.py:169-214 generalized). */
  val q7VolumeShipping: Q = Q(
    "tpch_q7_volume_shipping",
    (s, dir) => {
      // range form (not year(..) IN): only an explicit min/max range
      // reaches the parquet scan's PushedFilters
      val li = table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_suppkey"),
          year(col("l_shipdate")).as("l_year"),
          col("l_extendedprice"), col("l_discount"))
      val ord = table(s, dir, "orders").select(col("o_orderkey"), col("o_custkey"))
      val cust = table(s, dir, "customer").select(col("c_custkey"), col("c_nationkey"))
      val supp = table(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val natS = table(s, dir, "nation")
        .select(col("n_nationkey").as("sn_key"), col("n_name").as("supp_nation"))
      val natC = table(s, dir, "nation")
        .select(col("n_nationkey").as("cn_key"), col("n_name").as("cust_nation"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(broadcast(natC), col("c_nationkey") === col("cn_key"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(natS), col("s_nationkey") === col("sn_key"))
        .filter(
          (col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
            (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
        .groupBy(col("supp_nation"), col("cust_nation"), col("l_year"))
        .agg(sum(rev).cast("double").as("revenue"),
          count(lit(1)).as("n_lines"))
        .orderBy("supp_nation", "cust_nation", "l_year")
    },
    Some(
      s"""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |       year(l_shipdate) AS l_year,
        |       CAST(SUM($revSql) AS DOUBLE) AS revenue,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN customer ON o_custkey = c_custkey
        |JOIN nation cn ON c_nationkey = cn.n_nationkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation sn ON s_nationkey = sn.n_nationkey
        |WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |  AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2') OR
        |       (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
        |GROUP BY 1, 2, 3
        |ORDER BY supp_nation, cust_nation, l_year""".stripMargin))

  /** TPC-H Q9 shape (product-type profit): profit by supplier nation and
    * order year for parts matching a mid-string name pattern — the
    * filter-on-one-dim, group-by-another-dim shape. The part name LIKE
    * cannot push into the fact scan; instead the FILTERED part dim
    * broadcasts and acts as a semi-filter on the fact before the wider
    * joins (join order matters: part first shrinks the fact ~10×, so
    * the orders/supplier joins see the reduced stream). partsupp's
    * supplycost is substituted by p_retailprice·quantity/10, kept in
    * exact DECIMAL (integer divisor — no literal-fraction scale
    * mismatch between engines). */
  val q9ProductProfit: Q = Q(
    "tpch_q9_product_profit",
    (s, dir) => {
      val partF = table(s, dir, "part")
        .filter(col("p_name").contains("gear"))
        .select(col("p_partkey"), col("p_retailprice"))
      val li = table(s, dir, "lineitem")
        .select(col("l_orderkey"), col("l_partkey"), col("l_suppkey"),
          col("l_quantity"), col("l_extendedprice"), col("l_discount"))
      val ord = table(s, dir, "orders")
        .select(col("o_orderkey"), year(col("o_orderdate")).as("o_year"))
      val supp = table(s, dir, "supplier").select(col("s_suppkey"), col("s_nationkey"))
      val nat = table(s, dir, "nation")
        .select(col("n_nationkey"), col("n_name").as("nation"))
      val cost = (col("p_retailprice").cast("decimal(18,2)") *
        col("l_quantity").cast("decimal(18,2)")) / lit(10).cast("decimal(18,0)")
      li.join(broadcast(partF), col("l_partkey") === col("p_partkey"))
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .groupBy(col("nation"), col("o_year"))
        .agg(sum((rev - cost).cast("decimal(28,8)")).cast("double").as("profit"),
          count(lit(1)).as("n_lines"))
        .orderBy("nation", "o_year")
    },
    Some(
      s"""SELECT n_name AS nation, year(o_orderdate) AS o_year,
        |       CAST(SUM(CAST($revSql -
        |                CAST(p_retailprice AS DECIMAL(18,2)) *
        |                CAST(l_quantity AS DECIMAL(18,2)) /
        |                CAST(10 AS DECIMAL(18,0))
        |                AS DECIMAL(28,8))) AS DOUBLE) AS profit,
        |       count(*) AS n_lines
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |JOIN orders ON l_orderkey = o_orderkey
        |JOIN supplier ON l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE p_name LIKE '%gear%'
        |GROUP BY 1, 2
        |ORDER BY nation, o_year""".stripMargin))

  /** TPC-H Q11 shape (important stock): per-part shipped value within one
    * nation's suppliers, kept only where the part's value exceeds a
    * FRACTION OF THE GLOBAL TOTAL — the grouped-HAVING-vs-scalar-subquery
    * shape. One pass computes the per-part DECIMAL values; the 1-row
    * total re-aggregates FROM THE GROUPED TABLE (never a second fact
    * scan) and broadcasts back as a cross join. The threshold compare is
    * value·1000 > total — integer-scaled DECIMAL on both sides, so no
    * engine-specific fractional-literal rounding can flip a boundary
    * part. */
  val q11ImportantStock: Q = Q(
    "tpch_q11_important_stock",
    (s, dir) => {
      val suppN = table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")
          .filter(col("n_name") === "NATION_3").select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"))
      val perPart = table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"), col("l_extendedprice"))
        .join(broadcast(suppN), col("l_suppkey") === col("s_suppkey"))
        .groupBy(col("l_partkey"))
        .agg(sum(col("l_extendedprice").cast("decimal(18,2)")).as("val_dec"))
      val total = perPart.agg(sum(col("val_dec")).as("total_dec"))
      perPart.crossJoin(broadcast(total))
        .filter(col("val_dec") * lit(1000) > col("total_dec"))
        .select(col("l_partkey"), col("val_dec").cast("double").as("part_value"))
        .orderBy(col("part_value").desc, col("l_partkey"))
    },
    Some(
      """WITH v AS (
        |  SELECT l_partkey,
        |         SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS val_dec
        |  FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  WHERE n_name = 'NATION_3'
        |  GROUP BY l_partkey),
        |t AS (SELECT SUM(val_dec) AS total_dec FROM v)
        |SELECT l_partkey, CAST(val_dec AS DOUBLE) AS part_value
        |FROM v, t
        |WHERE val_dec * 1000 > total_dec
        |ORDER BY part_value DESC, l_partkey""".stripMargin))

  /** TPC-H Q13 shape (customer order-count distribution): how many
    * customers placed k orders, INCLUDING k=0 — the outer-join
    * count-of-counts. The exclusion predicate lives in the JOIN
    * condition (a WHERE would delete the zero-order customers the query
    * exists to count); counting o_orderkey (not *) makes the unmatched
    * left rows count 0. Two aggregations: per-customer counts shuffle on
    * custkey; the distribution re-aggregates the ~|customer| count table
    * — the second shuffle carries one row per customer, never the fact. */
  val q13CustomerDistribution: Q = Q(
    "tpch_q13_customer_distribution",
    (s, dir) => {
      val cust = table(s, dir, "customer").select(col("c_custkey"))
      val ord = table(s, dir, "orders")
        .filter(col("o_orderpriority") =!= "4-NOT SPECIFIED")
        .select(col("o_orderkey"), col("o_custkey"))
      cust.join(ord, col("c_custkey") === col("o_custkey"), "left")
        .groupBy(col("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy(col("c_count"))
        .agg(count(lit(1)).as("custdist"))
        .orderBy(col("custdist").desc, col("c_count").desc)
    },
    Some(
      """SELECT c_count, count(*) AS custdist
        |FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer
        |  LEFT JOIN orders ON c_custkey = o_custkey
        |                  AND o_orderpriority <> '4-NOT SPECIFIED'
        |  GROUP BY c_custkey)
        |GROUP BY c_count
        |ORDER BY custdist DESC, c_count DESC""".stripMargin))

  /** TPC-H Q15 shape (top supplier): suppliers whose 3-month revenue
    * equals the GLOBAL MAX over the per-supplier aggregate — the
    * max-over-view with tie preservation. The max re-aggregates from the
    * ~|supplier| revenue table and broadcasts back; the equality compare
    * stays in DECIMAL (double round-trip could split a tie the SQL
    * formulation keeps). An argmax/limit-1 would silently drop co-equal
    * suppliers. */
  val q15TopSupplier: Q = Q(
    "tpch_q15_top_supplier",
    (s, dir) => {
      val perSupp = table(s, dir, "lineitem")
        .filter(col("l_shipdate").cast("date") >= lit("1996-01-01") &&
          col("l_shipdate").cast("date") < lit("1996-04-01"))
        .groupBy(col("l_suppkey"))
        .agg(sum(rev).as("rev_dec"))
      val maxRev = perSupp.agg(max(col("rev_dec")).as("max_dec"))
      perSupp.crossJoin(broadcast(maxRev))
        .filter(col("rev_dec") === col("max_dec"))
        .join(table(s, dir, "supplier").select(col("s_suppkey"), col("s_name")),
          col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"),
          col("rev_dec").cast("double").as("total_revenue"))
        .orderBy("s_suppkey")
    },
    Some(
      s"""WITH r AS (
        |  SELECT l_suppkey, SUM($revSql) AS rev_dec
        |  FROM lineitem
        |  WHERE CAST(l_shipdate AS DATE) >= DATE '1996-01-01'
        |    AND CAST(l_shipdate AS DATE) <  DATE '1996-04-01'
        |  GROUP BY l_suppkey),
        |m AS (SELECT MAX(rev_dec) AS max_dec FROM r)
        |SELECT s_suppkey, s_name, CAST(rev_dec AS DOUBLE) AS total_revenue
        |FROM r, m
        |JOIN supplier ON l_suppkey = s_suppkey
        |WHERE rev_dec = max_dec
        |ORDER BY s_suppkey""".stripMargin))

  /** TPC-H Q16 shape (supplier count by part attribute): distinct
    * suppliers per (brand, type, size) bucket, excluding a supplier
    * denylist — the count-distinct + NOT-IN shape. The denylist
    * (negative-balance suppliers standing in for the complaints LIKE)
    * applies as a broadcast LEFT ANTI before aggregation; the distinct
    * count is the two-level aggregate (distinct pairs first, then
    * count), never a countDistinct Expand over the joined fact. The
    * part-attribute filters all land on the broadcast dim. */
  val q16SupplierCnt: Q = Q(
    "tpch_q16_supplier_cnt",
    (s, dir) => {
      val partF = table(s, dir, "part")
        .filter(col("p_brand") =!= "Brand#1" && col("p_size") <= 25)
        .select(col("p_partkey"), col("p_brand"), col("p_type"), col("p_size"))
      val badSupp = table(s, dir, "supplier")
        .filter(col("s_acctbal") < 0).select(col("s_suppkey").as("bad_key"))
      val pairs = table(s, dir, "lineitem")
        .select(col("l_partkey"), col("l_suppkey"))
        .join(broadcast(badSupp), col("l_suppkey") === col("bad_key"), "left_anti")
        .join(broadcast(partF), col("l_partkey") === col("p_partkey"))
        .select(col("p_brand"), col("p_type"), col("p_size"), col("l_suppkey"))
        .distinct()
      pairs.groupBy(col("p_brand"), col("p_type"), col("p_size"))
        .agg(count(lit(1)).as("supplier_cnt"))
        .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"),
          col("p_size"))
    },
    Some(
      """SELECT p_brand, p_type, p_size,
        |       count(DISTINCT l_suppkey) AS supplier_cnt
        |FROM lineitem
        |JOIN part ON l_partkey = p_partkey
        |WHERE p_brand <> 'Brand#1' AND p_size <= 25
        |  AND l_suppkey NOT IN
        |      (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
        |GROUP BY 1, 2, 3
        |ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""".stripMargin))

  /** TPC-H Q18 shape (large-volume customers): orders whose total line
    * quantity exceeds a threshold, re-joined to customer detail — the
    * HAVING-subquery-feeding-IN shape. The quantity aggregate runs ONCE:
    * its surviving (orderkey, total_qty) rows — a few hundred — broadcast
    * back onto orders, so neither the IN-subquery's second fact scan nor
    * a second aggregation exists in the plan. Top-100 by quantity is
    * TakeOrdered, never a global sort. */
  val q18LargeVolume: Q = Q(
    "tpch_q18_large_volume",
    (s, dir) => {
      val bigOrders = table(s, dir, "lineitem")
        .groupBy(col("l_orderkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty_dec"))
        .filter(col("qty_dec") > lit(300))
      table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_custkey"),
          col("o_orderdate").cast("date").cast("string").as("o_date"),
          col("o_totalprice"))
        .join(broadcast(bigOrders), col("o_orderkey") === col("l_orderkey"))
        .join(table(s, dir, "customer").select(col("c_custkey"), col("c_name")),
          col("o_custkey") === col("c_custkey"))
        .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
          col("o_date"), col("o_totalprice"),
          col("qty_dec").cast("double").as("total_qty"))
        .orderBy(col("total_qty").desc, col("o_orderkey"))
        .limit(100)
    },
    Some(
      """WITH q AS (
        |  SELECT l_orderkey AS big_key,
        |         SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty_dec
        |  FROM lineitem GROUP BY l_orderkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 300)
        |SELECT c_name, c_custkey, o_orderkey,
        |       CAST(CAST(o_orderdate AS DATE) AS VARCHAR) AS o_date,
        |       o_totalprice, CAST(qty_dec AS DOUBLE) AS total_qty
        |FROM orders
        |JOIN q ON o_orderkey = big_key
        |JOIN customer ON o_custkey = c_custkey
        |ORDER BY total_qty DESC, o_orderkey
        |LIMIT 100""".stripMargin))

  /** TPC-H Q20 shape (part promotion): suppliers in one nation who
    * shipped a meaningful volume of a part family — the nested-semi-join
    * chain. Each stage only narrows: part filter (broadcast semi) →
    * per-(supplier, part) 1996 volume aggregate → HAVING threshold →
    * distinct supplier keys → semi-join the supplier dim → nation
    * attach. No stage widens a row with columns a later stage discards;
    * the final output is supplier rows only. */
  val q20PartPromotion: Q = Q(
    "tpch_q20_part_promotion",
    (s, dir) => {
      val promoParts = table(s, dir, "part")
        .filter(col("p_type") === "PROMO").select(col("p_partkey"))
      val activeSupp = table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
        .select(col("l_partkey"), col("l_suppkey"), col("l_quantity"))
        .join(broadcast(promoParts), col("l_partkey") === col("p_partkey"),
          "left_semi")
        .groupBy(col("l_suppkey"), col("l_partkey"))
        .agg(sum(col("l_quantity").cast("decimal(18,2)")).as("qty_dec"))
        .filter(col("qty_dec") > lit(40))
        .select(col("l_suppkey")).distinct()
      table(s, dir, "supplier")
        .join(broadcast(activeSupp), col("s_suppkey") === col("l_suppkey"),
          "left_semi")
        .join(broadcast(table(s, dir, "nation")
          .filter(col("n_name") === "NATION_5").select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"), "left_semi")
        .select(col("s_suppkey"), col("s_name"))
        .orderBy("s_suppkey")
    },
    Some(
      """SELECT s_suppkey, s_name
        |FROM supplier
        |WHERE s_suppkey IN (
        |  SELECT l_suppkey FROM lineitem
        |  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |    AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        |    AND l_partkey IN (SELECT p_partkey FROM part WHERE p_type = 'PROMO')
        |  GROUP BY l_suppkey, l_partkey
        |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,2))) > 40)
        |AND s_nationkey IN (SELECT n_nationkey FROM nation WHERE n_name = 'NATION_5')
        |ORDER BY s_suppkey""".stripMargin))

  /** TPC-H Q21 shape (suppliers who kept orders waiting): for one
    * nation's suppliers, orders where THIS supplier shipped late
    * (>60 days after order date — standing in for receipt>commit),
    * another supplier participated, and NO other supplier was late — the
    * EXISTS + NOT-EXISTS self-join pair on the fact. Both checks run as
    * semi/anti joins keyed on orderkey with the supplier-inequality in
    * the join condition; the fact projects to (orderkey, suppkey, late)
    * once and feeds all three roles. */
  val q21WaitingOrders: Q = Q(
    "tpch_q21_waiting_orders",
    (s, dir) => {
      val li = table(s, dir, "lineitem")
        .join(table(s, dir, "orders").select(col("o_orderkey"), col("o_orderdate")),
          col("l_orderkey") === col("o_orderkey"))
        .select(col("l_orderkey"), col("l_suppkey"),
          (col("l_shipdate").cast("date") >
            date_add(col("o_orderdate").cast("date"), 60)).as("late"))
      val natSupp = table(s, dir, "supplier")
        .join(broadcast(table(s, dir, "nation")
          .filter(col("n_name") === "NATION_7").select(col("n_nationkey"))),
          col("s_nationkey") === col("n_nationkey"))
        .select(col("s_suppkey"), col("s_name"))
      val l1 = li.filter(col("late"))
        .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
        .select(col("l_orderkey").as("k1"), col("l_suppkey").as("sk1"),
          col("s_name"))
      val l2 = li.select(col("l_orderkey").as("k2"), col("l_suppkey").as("sk2"))
      val l3 = li.filter(col("late"))
        .select(col("l_orderkey").as("k3"), col("l_suppkey").as("sk3"))
      l1.join(l2, col("k1") === col("k2") && col("sk1") =!= col("sk2"),
          "left_semi")
        .join(l3, col("k1") === col("k3") && col("sk1") =!= col("sk3"),
          "left_anti")
        .groupBy(col("s_name"))
        .agg(count(lit(1)).as("numwait"))
        .orderBy(col("numwait").desc, col("s_name"))
    },
    Some(
      """SELECT s_name, count(*) AS numwait
        |FROM lineitem l1
        |JOIN orders ON l1.l_orderkey = o_orderkey
        |JOIN supplier ON l1.l_suppkey = s_suppkey
        |JOIN nation ON s_nationkey = n_nationkey
        |WHERE n_name = 'NATION_7'
        |  AND CAST(l1.l_shipdate AS DATE) > CAST(o_orderdate AS DATE) + INTERVAL 60 DAY
        |  AND EXISTS (
        |    SELECT 1 FROM lineitem l2
        |    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
        |  AND NOT EXISTS (
        |    SELECT 1 FROM lineitem l3
        |    JOIN orders o3 ON l3.l_orderkey = o3.o_orderkey
        |    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
        |      AND CAST(l3.l_shipdate AS DATE) > CAST(o3.o_orderdate AS DATE) + INTERVAL 60 DAY)
        |GROUP BY s_name
        |ORDER BY numwait DESC, s_name""".stripMargin))

  /** TPC-H Q22 shape (global sales opportunity): well-funded customers in
    * a nation subset with no RECENT orders — the scalar-avg filter +
    * anti-join ("never ordered" adapted to "not ordered since 1999";
    * every synthetic customer has some order, and the inactivity variant
    * keeps the identical anti-join shape with a pushed date filter on
    * the anti side). The positive-balance average computes once over the
    * dim, broadcasts as a 1-row frame, and gates the same dim scan; the
    * recency check is a LEFT ANTI against the date-filtered key-only
    * orders projection. The average divides an exact DECIMAL sum by a
    * count in DOUBLE once — both engines produce the identical IEEE
    * value, so the acctbal compare can't flip a boundary customer. */
  val q22GlobalSales: Q = Q(
    "tpch_q22_global_sales",
    (s, dir) => {
      val natSubset = Seq(1, 2, 3, 4, 5, 6, 7)
      val cust = table(s, dir, "customer")
        .filter(col("c_nationkey").isin(natSubset: _*))
        .select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
      val avgBal = cust.filter(col("c_acctbal") > 0)
        .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") /
          count(lit(1)).cast("double")).as("avg_bal"))
      cust.crossJoin(broadcast(avgBal))
        .filter(col("c_acctbal") > col("avg_bal"))
        .join(table(s, dir, "orders")
            .filter(col("o_orderdate").cast("date") >= lit("1999-01-01"))
            .select(col("o_custkey")),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy(col("c_nationkey"))
        .agg(count(lit(1)).as("numcust"),
          sum(col("c_acctbal").cast("decimal(18,2)"))
            .cast("double").as("totacctbal"))
        .orderBy("c_nationkey")
    },
    Some(
      """WITH c AS (
        |  SELECT c_custkey, c_nationkey, c_acctbal FROM customer
        |  WHERE c_nationkey IN (1, 2, 3, 4, 5, 6, 7)),
        |a AS (
        |  SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE)
        |           / CAST(count(*) AS DOUBLE) AS avg_bal
        |  FROM c WHERE c_acctbal > 0)
        |SELECT c_nationkey, count(*) AS numcust,
        |       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
        |FROM c, a
        |WHERE c_acctbal > avg_bal
        |  AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey
        |                  AND CAST(o_orderdate AS DATE) >= DATE '1999-01-01')
        |GROUP BY c_nationkey
        |ORDER BY c_nationkey""".stripMargin))

  /** TPC-H Q12 shape (shipping-mode priority check): per category, count
    * orders split by a priority predicate — the two-CASE-counts-per-
    * group pattern with a pushed date range. l_linestatus stands in for
    * the absent l_shipmode, shipped->60-days-late for the absent
    * commit/receipt pair; the critical predicate (o_orderpriority IN
    * high set) evaluates CROSS-SIDE (order attr under a lineitem group)
    * after the key join, both CASE sums in ONE aggregate pass. The ship-
    * year range lands in the fact scan's PushedFilters. */
  val q12ShipmodePriority: Q = Q(
    "tpch_q12_shipmode_priority",
    (s, dir) => {
      // explicit range, not year(..) IN (..): the function form is not
      // a pushable parquet predicate (verified: only IsNotNull reached
      // PushedFilters), the range lands as min/max row-group filters
      val li = table(s, dir, "lineitem")
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
        .select(col("l_orderkey"), col("l_linestatus"))
      val ord = table(s, dir, "orders")
        .select(col("o_orderkey"), col("o_orderpriority"))
      val isHigh = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("l_linestatus"))
        .agg(
          sum(when(isHigh, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(isHigh, 0L).otherwise(1L)).as("low_line_count"))
        .orderBy("l_linestatus")
    },
    Some(
      """SELECT l_linestatus,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |       CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |                     THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
        |FROM lineitem
        |JOIN orders ON l_orderkey = o_orderkey
        |WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
        |GROUP BY l_linestatus
        |ORDER BY l_linestatus""".stripMargin))

  def all: Seq[Q] = Seq(
    q7VolumeShipping, q9ProductProfit, q11ImportantStock,
    q12ShipmodePriority, q13CustomerDistribution, q15TopSupplier,
    q16SupplierCnt, q18LargeVolume, q20PartPromotion, q21WaitingOrders,
    q22GlobalSales)
}
