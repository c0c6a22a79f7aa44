package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational coverage beyond the reference's streaming dataflow — the
  * aggregate/join/window/set/sort operators a complete engine needs,
  * over the TPC-H-ish star schema. Each has a DuckDB oracle.
  *
  * Plan-shape goals at 100 TB:
  *  - dimension joins (region/nation/customer-side) broadcast;
  *  - aggregations partial (map-side combine) before the shuffle;
  *  - filters and column pruning pushed into the parquet scan;
  *  - sorts only where semantics demand (top-k via TakeOrderedAndProject).
  */
object StarOps {

  import EventOps.tbl

  /** Q1-style full-scan aggregation: partial agg → 1 small shuffle. */
  def q1Agg(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "lineitem")
      .filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        // exact-integer recovery of fixed-decimal sums (cents / 1e-4 units)
        // so double accumulation order can't flip a rounding boundary —
        // see the Determinism note in SparkEntry
        round(sum(col("l_quantity")), 0).cast("long").as("sum_qty"),
        round(sum(col("l_extendedprice")) * 100, 0).cast("long")
          .as("sum_base_price_c"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000, 0)
          .cast("long").as("sum_disc_price_dm"),
        floor(lit(10000.0) * round(sum(col("l_quantity")), 0) / count(lit(1)))
          .cast("long").as("avg_qty_bp"),
        floor(lit(100.0) * round(sum(col("l_discount")) * 100, 0) / count(lit(1)))
          .cast("long").as("avg_disc_bp"),
        count(lit(1)).as("count_order"))

  /** Q3-style shipping-priority join: fact-side filters pushed down; the
    * customer side carries NO broadcast hint — customer scales with SF
    * (15 M rows at SF100), so a forced broadcast would OOM at target scale.
    * AQE / autoBroadcastJoinThreshold picks broadcast when the filtered
    * side is actually small. HAVING avoids LIMIT float-tie risk. */
  def q3Join(spark: SparkSession, dir: String): DataFrame = {
    val cust = tbl(spark, dir, "customer")
      .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
    val ord = tbl(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
    val li = tbl(spark, dir, "lineitem")
      .filter(col("l_shipdate") > lit("1998-01-01").cast("timestamp"))
      .select("l_orderkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .groupBy("o_orderkey", "o_orderdate", "o_orderpriority")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000, 0)
        .cast("long").as("revenue_dm"))
      .filter(col("revenue_dm") > 1000000000L) // revenue > 100,000.0000
  }

  /** Q5-style local-supplier volume: fixed-cardinality dims (region: 5 rows,
    * nation: 25) keep explicit broadcast hints; customer and supplier grow
    * linearly with SF, so they carry NO hint — the optimizer broadcasts them
    * only while their size estimate stays under the threshold, and falls
    * back to a shuffled hash join at cluster scale instead of OOMing. */
  def q5Region(spark: SparkSession, dir: String): DataFrame = {
    val region = tbl(spark, dir, "region").filter(col("r_name") === "ASIA")
    val nation = tbl(spark, dir, "nation")
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .select("n_nationkey", "n_name")
    val cust = tbl(spark, dir, "customer").select("c_custkey", "c_nationkey")
    val ord = tbl(spark, dir, "orders")
      .filter(col("o_orderdate") < lit("1999-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val supp = tbl(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val li = tbl(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(cust.withColumnRenamed("c_nationkey", "cn"),
        col("o_custkey") === col("c_custkey") && col("cn") === col("s_nationkey"))
      .join(broadcast(nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy("n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000, 0)
        .cast("long").as("revenue_dm"))
  }

  /** Q2-shape correlated min-cost subquery: cheapest lineitem per selected
    * part, supplier attached (testdata has no partsupp, so lineitem plays
    * the partsupp role). Catalyst decorrelates the scalar subquery into an
    * aggregate + join — no per-row subquery execution; the equality probe
    * is a SELECTION on stored doubles (no arithmetic), so it is
    * cross-engine exact. */
  def q2MinCost(spark: SparkSession, dir: String): DataFrame =
    SqlViews.withViews(spark,
      "part" -> tbl(spark, dir, "part"),
      "li" -> tbl(spark, dir, "lineitem"),
      "supp" -> tbl(spark, dir, "supplier")) { v =>
      s"""SELECT p.p_partkey, p.p_brand, s.s_name,
         |       CAST(round(l.l_extendedprice * 100, 0) AS LONG) AS min_price_c
         |FROM ${v("part")} p
         |JOIN ${v("li")} l ON l.l_partkey = p.p_partkey
         |JOIN ${v("supp")} s ON s.s_suppkey = l.l_suppkey
         |WHERE p.p_size = 15
         |  AND l.l_extendedprice = (SELECT min(l2.l_extendedprice) FROM ${v("li")} l2
         |                           WHERE l2.l_partkey = p.p_partkey)
         |""".stripMargin
    }

  /** Q7-shape multi-way date-bounded join: bilateral shipping volume
    * between two nations by year. Five joins — nation twice (tiny,
    * broadcast by stats), customer/supplier/orders shuffled on their keys
    * at scale; the shipdate bound is pushed into the lineitem scan. */
  def q7NationVolume(spark: SparkSession, dir: String): DataFrame =
    SqlViews.withViews(spark,
      "supp" -> tbl(spark, dir, "supplier"),
      "li" -> tbl(spark, dir, "lineitem"),
      "ord" -> tbl(spark, dir, "orders"),
      "cust" -> tbl(spark, dir, "customer"),
      "nat" -> tbl(spark, dir, "nation")) { v =>
      s"""SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         |       CAST(year(l.l_shipdate) AS LONG) AS l_year,
         |       CAST(round(sum(l.l_extendedprice * (1 - l.l_discount)) * 10000, 0)
         |            AS LONG) AS revenue_dm
         |FROM ${v("supp")} s
         |JOIN ${v("li")} l ON s.s_suppkey = l.l_suppkey
         |JOIN ${v("ord")} o ON o.o_orderkey = l.l_orderkey
         |JOIN ${v("cust")} c ON c.c_custkey = o.o_custkey
         |JOIN ${v("nat")} n1 ON s.s_nationkey = n1.n_nationkey
         |JOIN ${v("nat")} n2 ON c.c_nationkey = n2.n_nationkey
         |WHERE ((n1.n_name = 'NATION_20' AND n2.n_name = 'NATION_11')
         |    OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_20'))
         |  AND l.l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
         |                       AND TIMESTAMP '1996-12-31 00:00:00'
         |GROUP BY n1.n_name, n2.n_name, year(l.l_shipdate)
         |""".stripMargin
    }

  /** Window function: latest shipment per supplier (rank-1 with full
    * deterministic tie-break). */
  def w1Window(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("l_shipdate").desc, col("l_orderkey"), col("l_linenumber"))
    tbl(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_orderkey"), col("l_linenumber"),
        col("l_shipdate"), row_number().over(w).as("rn"))
      .filter(col("rn") === 1)
      .select("l_suppkey", "l_orderkey", "l_linenumber", "l_shipdate")
  }

  /** Set operations: UNION then EXCEPT over nation keys. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val c = tbl(spark, dir, "customer")
      .select(col("c_nationkey").cast("int").as("nationkey"))
    val s = tbl(spark, dir, "supplier")
      .select(col("s_nationkey").cast("int").as("nationkey"))
    val excluded = tbl(spark, dir, "nation")
      .filter(col("n_regionkey") === 0)
      .select(col("n_nationkey").cast("int").as("nationkey"))
    c.union(s).distinct().exceptAll(excluded.distinct())
  }

  /** Sort + limit (top-k): stored column ordering — no float arithmetic —
    * with key tie-break; plans as TakeOrderedAndProject, no global sort. */
  def topkOrders(spark: SparkSession, dir: String): DataFrame =
    tbl(spark, dir, "orders")
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .limit(20)

  /** Q10-style returned-item report: revenue lost to returns, per
    * customer, top 20. Return-flag + date filters push into the scans;
    * the heavy join is lineitem⋈orders (both SF-scaling, shuffle on the
    * order key); customer carries no hint (AQE broadcasts it only while
    * small) and nation (25 rows) broadcasts explicitly. The LIMIT rides
    * a deterministic integer ordering (revenue, then key), so top-20
    * membership can't float-flip — and plans as TakeOrderedAndProject,
    * never a global sort. */
  def q10Returned(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_extendedprice", "l_discount")
    val ord = tbl(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select("o_orderkey", "o_custkey")
    val cust = tbl(spark, dir, "customer")
      .select("c_custkey", "c_name", "c_nationkey")
    val nat = tbl(spark, dir, "nation").select("n_nationkey", "n_name")
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .groupBy("c_custkey", "c_name", "n_name")
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000, 0)
        .cast("long").as("revenue_dm"))
      .orderBy(col("revenue_dm").desc, col("c_custkey"))
      .limit(20)
  }

  /** Q14-style promotion-revenue share: one fact⋈dim join and ONE pass —
    * both the promo-conditional sum and the total ride the same
    * aggregation (no second scan), and the share is integer division of
    * two exact-recovered decimal sums in floored basis points. */
  def q14PromoBp(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-09-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-10-01").cast("timestamp"))
      .select("l_partkey", "l_extendedprice", "l_discount")
    val part = tbl(spark, dir, "part").select("p_partkey", "p_type")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .agg(
        round(sum(when(col("p_type") === "PROMO",
            col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0.0))) * 10000, 0).cast("long").as("promo_dm"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000, 0)
          .cast("long").as("total_dm"))
      .select(col("promo_dm"), col("total_dm"),
        floor(lit(10000.0) * col("promo_dm") / col("total_dm")).cast("long")
          .as("promo_share_bp"))
  }

  /** Q16-style supplier-count-per-part-class: exact COUNT(DISTINCT) per
    * (brand, type) — the two-phase distinct aggregation (partial distinct
    * within partitions, exact count after one shuffle on the group key),
    * with the excluded brand's filter pushed into the dimension scan
    * before the join. */
  def q16SupplierCnt(spark: SparkSession, dir: String): DataFrame = {
    val part = tbl(spark, dir, "part")
      .filter(col("p_brand") =!= "Brand#1")
      .select("p_partkey", "p_brand", "p_type")
    val li = tbl(spark, dir, "lineitem").select("l_partkey", "l_suppkey")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
  }

  /** Q19-style disjunctive-predicate join: an OR of three
    * (brand, size-range, quantity-range) conjunctions. The residual OR
    * can't become a join key, but its brand/size disjunction PUSHES DOWN
    * to the part scan and the quantity bound to the lineitem scan — the
    * point of the shape: a disjunction is not an excuse for a full scan
    * on either side. */
  def q19Disjunct(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 1 && col("l_quantity") <= 30)
      .select("l_partkey", "l_quantity", "l_extendedprice", "l_discount")
    val part = tbl(spark, dir, "part")
      .filter((col("p_brand") === "Brand#12" && col("p_size").between(1, 15)) ||
        (col("p_brand") === "Brand#23" && col("p_size").between(1, 25)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(1, 35)))
      .select("p_partkey", "p_brand", "p_size")
    li.join(part, col("l_partkey") === col("p_partkey") &&
        ((col("p_brand") === "Brand#12" && col("l_quantity").between(1, 11)) ||
         (col("p_brand") === "Brand#23" && col("l_quantity").between(10, 20)) ||
         (col("p_brand") === "Brand#3" && col("l_quantity").between(20, 30))))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000, 0)
          .cast("long").as("revenue_dm"),
        count(lit(1)).as("n_lines"))
  }

  /** Q8-style market share: one supplier nation's share of yearly revenue
    * into one customer region, in floored basis points per year. The
    * conditional share rides the SAME yearly aggregation as the total
    * (no second pass); the nation/region dimension chain broadcasts; the
    * share is integer division of two exact-recovered decimal sums. */
  def q8MarketShare(spark: SparkSession, dir: String,
      nationKey: Int = 0): DataFrame = {
    val custNation = tbl(spark, dir, "nation")
      .join(broadcast(tbl(spark, dir, "region")
          .filter(col("r_name") === "ASIA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey").as("cn_key"))
    val cust = tbl(spark, dir, "customer")
      .join(broadcast(custNation), col("c_nationkey") === col("cn_key"))
      .select("c_custkey")
    val ord = tbl(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"),
        year(col("o_orderdate")).cast("long").as("o_year"))
    val li = tbl(spark, dir, "lineitem")
      .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
    val supp = tbl(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(cust, col("o_custkey") === col("c_custkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .groupBy("o_year")
      .agg(
        round(sum(when(col("s_nationkey") === nationKey,
            col("l_extendedprice") * (lit(1) - col("l_discount")))
          .otherwise(lit(0.0))) * 10000, 0).cast("long").as("nation_dm"),
        round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000, 0)
          .cast("long").as("total_dm"))
      .select(col("o_year"), col("nation_dm"), col("total_dm"),
        floor(lit(10000.0) * col("nation_dm") / col("total_dm")).cast("long")
          .as("share_bp"))
  }

  /** Q11-style important-part filter: parts whose total shipped quantity
    * exceeds `pctOverMean`% above the MEAN part's — a keyed aggregation
    * guarded by a one-row scalar aggregate that joins in as a broadcast,
    * with the threshold as exact integer cross-multiplication (no
    * fraction or average ever becomes a double). Relative-to-mean, not
    * fraction-of-global: a fixed global share (TPC-H's literal form)
    * empties as the part count grows — 0.01% of the total means 2× the
    * mean at 20k parts but 200× at 2M — where "K× the mean" selects the
    * same tail at every SF. The schema has no partsupp, so lineitem is
    * both sides' source — the "aggregate, then join the one-row scalar"
    * plan shape is the point. */
  def q11ImportantParts(spark: SparkSession, dir: String,
      pctOverMean: Long = 20): DataFrame = {
    val li = tbl(spark, dir, "lineitem").select("l_partkey", "l_quantity")
    val perPart = li.groupBy("l_partkey")
      .agg(round(sum(col("l_quantity")), 0).cast("long").as("sum_qty"))
    val total = perPart.agg(sum(col("sum_qty")).as("total_qty"),
      count(lit(1)).as("n_parts"))
    perPart.crossJoin(broadcast(total))
      // qty > (1 + pct/100)·(total/n) ⟺ qty·n·100 > total·(100+pct)
      .filter(col("sum_qty") * col("n_parts") * 100 >
        col("total_qty") * (100 + pctOverMean))
      .select(col("l_partkey"), col("sum_qty"))
  }

  /** Q15-style top supplier: supplier(s) achieving the maximum revenue in
    * a quarter — max-of-aggregates via a one-row scalar joined back on
    * exact integer equality (ties all surface, no LIMIT-on-float risk).
    * The revenue relation feeds both the max and the final equi-join; on
    * a 100 TB run it would be a cached/reused exchange, here the graph is
    * tiny (one row per supplier). */
  def q15TopSupplier(spark: SparkSession, dir: String): DataFrame = {
    val rev = tbl(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))) * 10000, 0)
        .cast("long").as("revenue_dm"))
    val maxRev = rev.agg(max(col("revenue_dm")).as("max_dm"))
    rev.crossJoin(broadcast(maxRev))
      .filter(col("revenue_dm") === col("max_dm"))
      .join(tbl(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("revenue_dm"))
  }

  /** Q22-style idle-balance customers: above-average account balance and
    * no RECENT orders — a global scalar threshold (exact integer
    * cross-multiplication: balance·n > sum, never a double average) plus
    * a left-anti join against the recent slice of orders (every customer
    * in this data has SOME order, so the window is what makes "idle"
    * non-vacuous; the date filter pushes into the anti-join's scan). */
  def q22IdleBalance(spark: SparkSession, dir: String,
      since: String = "2000-01-01"): DataFrame = {
    val cust = tbl(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"),
        round(col("c_acctbal") * 100, 0).cast("long").as("acctbal_c"))
    val avgPos = cust.filter(col("acctbal_c") > 0)
      .agg(sum(col("acctbal_c")).as("sum_c"), count(lit(1)).as("n_pos"))
    val recent = tbl(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit(since).cast("timestamp"))
      .select("o_custkey")
    cust.crossJoin(broadcast(avgPos))
      // acctbal > avg ⟺ acctbal_c·n_pos > sum_c (exact longs)
      .filter(col("acctbal_c") * col("n_pos") > col("sum_c"))
      .join(recent, col("c_custkey") === col("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_name"), col("acctbal_c"))
  }

  /** Q9-style product-type profit by nation and year: the widest join
    * fan in the suite (lineitem ⋈ part ⋈ supplier ⋈ orders ⋈ nation).
    * The schema has no partsupp, so `p_retailprice` plays the unit-cost
    * role; the name filter (`contains 'red'`, the '%green%' analogue)
    * pushes into the part scan and prunes the fact join early. Profit
    * per line is 4-decimal (2-dec price × 2-dec discount; 2-dec cost ×
    * integral qty), so the sum recovers exactly in decimillis. Facts
    * shuffle on their join keys; only nation (25 rows) is hinted. */
  def q9ProfitNationYear(spark: SparkSession, dir: String): DataFrame = {
    val part = tbl(spark, dir, "part")
      .filter(col("p_name").contains("red"))
      .select("p_partkey", "p_retailprice")
    val li = tbl(spark, dir, "lineitem")
      .select("l_orderkey", "l_partkey", "l_suppkey",
        "l_quantity", "l_extendedprice", "l_discount")
    val supp = tbl(spark, dir, "supplier").select("s_suppkey", "s_nationkey")
    val ord = tbl(spark, dir, "orders").select("o_orderkey", "o_orderdate")
    val nat = tbl(spark, dir, "nation").select("n_nationkey", "n_name")
    li.join(part, col("l_partkey") === col("p_partkey"))
      .join(supp, col("l_suppkey") === col("s_suppkey"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"),
        year(col("o_orderdate")).cast("long").as("o_year"))
      .agg(round(sum(col("l_extendedprice") * (lit(1) - col("l_discount")) -
          col("p_retailprice") * col("l_quantity")) * 10000, 0)
        .cast("long").as("profit_dm"))
  }

  /** Q12-style late-shipment priority split: one fact–fact join whose
    * residual predicate (shipped > 60 days after ordering) cannot become
    * a join key, then a conditional two-way count per line status (the
    * shipmode analogue — the schema has no l_shipmode/commitdate). Both
    * counts ride ONE aggregation pass; the join shuffles on the order
    * key at scale. */
  def q12LatePriority(spark: SparkSession, dir: String): DataFrame = {
    val li = tbl(spark, dir, "lineitem")
      .select("l_orderkey", "l_linestatus", "l_shipdate")
    val ord = tbl(spark, dir, "orders")
      .select("o_orderkey", "o_orderdate", "o_orderpriority")
    val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    li.join(ord, col("l_orderkey") === col("o_orderkey") &&
        col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 60 DAYS"))
      .groupBy("l_linestatus")
      .agg(
        sum(when(high, 1L).otherwise(0L)).cast("long").as("high_line_count"),
        sum(when(high, 0L).otherwise(1L)).cast("long").as("low_line_count"))
  }

  /** Q13-style customer order-count distribution: the filter lives in the
    * OUTER JOIN's ON clause (pre-join filter on the right side — NOT a
    * WHERE, which would turn the join inner and drop order-less
    * customers), then a double aggregation: count per customer (nulls
    * count 0), histogram over the counts. Second agg's input is one row
    * per customer — tiny at any scale. */
  def q13OrderCountDist(spark: SparkSession, dir: String): DataFrame = {
    val cust = tbl(spark, dir, "customer").select("c_custkey")
    val ord = tbl(spark, dir, "orders")
      .filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    cust.join(ord, col("c_custkey") === col("o_custkey"), "left_outer")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
  }

  /** Q20-style excess-shipper semi-join chain: suppliers who shipped
    * more than half of a filtered part's 1997 volume. Aggregate per
    * (part, supplier), re-aggregate per part, integer-exact threshold
    * (qty·2 > total — no fraction materialized), then LEFT SEMI into the
    * supplier dimension — the probe list is O(qualifying suppliers), so
    * the semi-join broadcasts at any corpus size. */
  def q20ExcessShippers(spark: SparkSession, dir: String): DataFrame = {
    val part = tbl(spark, dir, "part")
      .filter(col("p_size") === 15).select("p_partkey")
    val ps = tbl(spark, dir, "lineitem")
      .filter(col("l_shipdate") >= lit("1997-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-01-01").cast("timestamp"))
      .select("l_partkey", "l_suppkey", "l_quantity")
      .join(part, col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(round(sum(col("l_quantity")), 0).cast("long").as("supp_qty"))
    val tot = ps.groupBy("l_partkey").agg(sum(col("supp_qty")).as("part_qty"))
    val excess = ps.join(tot, "l_partkey")
      .filter(col("supp_qty") * 2 > col("part_qty"))
      .select("l_suppkey")
    tbl(spark, dir, "supplier")
      .join(excess, col("s_suppkey") === col("l_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
  }

  /** S3 — catalog scan + broadcast dimension join chain (customers per
    * region through nation → region). */
  def s3CatalogJoin(spark: SparkSession, dir: String): DataFrame = {
    val nation = tbl(spark, dir, "nation").select("n_nationkey", "n_regionkey")
    val region = tbl(spark, dir, "region")
    tbl(spark, dir, "customer")
      .join(broadcast(nation), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(region), col("n_regionkey") === col("r_regionkey"))
      .groupBy("r_name")
      .agg(count(lit(1)).as("n_cust"),
        round(sum(col("c_acctbal")) * 100, 0).cast("long").as("sum_acctbal_c"))
  }
}
