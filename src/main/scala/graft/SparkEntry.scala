package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.functions._
import graft.operators._
import graft.sources.Tables
import graft.streaming.Events

/** Driver contract: one `queries` entry per operator in SURVEY.md §2, with a
  * DuckDB oracle in `oracleSql` where the semantics are SQL-expressible.
  *
  * Determinism rules used throughout (see SURVEY.md §5):
  *  - every query has an ORDER BY on a unique key,
  *  - double measures are summed exactly via decimal(18,x) then cast back,
  *  - similarity scores are rounded AFTER ranking on the raw value.
  */
object SparkEntry {

  /** Exact, order-independent sum of a double measure. */
  private def dsum(c: Column, scale: Int = 2): Column =
    sum(c.cast(s"decimal(18,$scale)")).cast("double")

  /** Flagship query on sf=0.001; driver smoke-checks rows>0. The whole
    * reference pipeline shape in one plan (see [[Pipeline]]). */
  def entry(spark: SparkSession): DataFrame =
    Pipeline.integrationReport(spark, "/root/testdata/sf0.001")

  // ------------------------------------------------------------ relational

  private def q1Agg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(dsum(col("l_quantity")).as("sum_qty"))
      .orderBy("l_returnflag")

  private def qFilterProject(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1995-01-01") && col("l_discount").between(0.03, 0.07))
      .select(
        col("l_orderkey"),
        col("l_linenumber"),
        round(col("l_extendedprice").cast("decimal(18,2)") * (lit(1.0) - col("l_discount")).cast("decimal(8,4)"), 2)
          .cast("double")
          .as("revenue"))
      // (orderkey, linenumber) repeats in the synthetic lineitem — include
      // the payload so the output order (which the driver compares) is total
      .orderBy("l_orderkey", "l_linenumber", "revenue")

  private def qDimJoin(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(count(lit(1)).as("n_customers"), dsum(col("c_acctbal")).as("sum_acctbal"))
      .orderBy("r_name", "n_name")

  private def qHierarchyFlatten(s: SparkSession, d: String): DataFrame = {
    val facts = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
      .select(
        col("c_custkey"),
        concat(lit("R"), col("r_regionkey"), lit("/N"), col("n_nationkey"), lit("/C"), col("c_custkey"))
          .as("path"))
    val dim = Relational.diagonalConcat(Seq(
      Tables.region(s, d).select(concat(lit("R"), col("r_regionkey")).as("id"), col("r_name").as("name")),
      Tables.nation(s, d).select(concat(lit("N"), col("n_nationkey")).as("id"), col("n_name").as("name"))))
    Hierarchy.flatten(facts, dim, "path", "id", "name", Seq(1 -> "region_name", 2 -> "nation_name"))
      .select("c_custkey", "region_name", "nation_name")
      .orderBy("c_custkey")
  }

  private def qDiagonalUnion(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_orderkey").as("id"), lit("orders").as("src"), col("o_totalprice").as("amount"))
    val l = Tables.lineitem(s, d)
      .select(
        (col("l_orderkey") * 10 + col("l_linenumber")).as("id"),
        lit("lineitem").as("src"),
        col("l_quantity").as("qty"))
    Relational.diagonalConcat(Seq(o, l)).orderBy("src", "id")
  }

  /** Two-phase salted aggregation, oracle-checked: the salted plan must
    * produce exactly what a plain GROUP BY produces. */
  private def qSaltedAgg(s: SparkSession, d: String): DataFrame =
    Skew.saltedAggregate(
      Tables.orders(s, d),
      keyCols = Seq("o_orderpriority"),
      aggs = Seq(
        Skew.TwoPhase("sum_price", sum(col("o_totalprice").cast("decimal(18,2)")), n => sum(col(n))),
        Skew.countRows("n")),
      numSalts = 8,
      saltCols = Seq(col("o_orderkey")))
      .select(col("o_orderpriority"), col("sum_price").cast("double").as("sum_price"), col("n"))
      .orderBy("o_orderpriority")

  private def qConditionalAgg(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        Relational.sumIfAnyNotNull(nullif(col("l_tax"), lit(0.0)).cast("decimal(18,4)"))
          .cast("double")
          .as("sum_tax"),
        count(lit(1)).as("n"))
      .orderBy("l_returnflag", "l_linestatus")

  private def qPivot(s: SparkSession, d: String): DataFrame =
    Reshape.pivotWide(
      Tables.lineitem(s, d),
      idCols = Seq("l_linestatus"),
      keyCol = "l_returnflag",
      valueCol = col("l_quantity").cast("decimal(18,2)"),
      knownKeys = Seq("A", "N", "R"))
      .select(
        col("l_linestatus"),
        col("A").cast("double").as("qty_A"),
        col("N").cast("double").as("qty_N"),
        col("R").cast("double").as("qty_R"))
      .orderBy("l_linestatus")

  private def qUnpivot(s: SparkSession, d: String): DataFrame =
    Reshape.unpivotLong(
      qPivot(s, d),
      idCols = Seq("l_linestatus"),
      valueCols = Seq("qty_A", "qty_N", "qty_R"),
      varName = "returnflag",
      valName = "qty")
      .orderBy("l_linestatus", "returnflag")

  private def qPeriodFanout(s: SparkSession, d: String): DataFrame =
    Periods.replicateQuarters(
      Tables.nation(s, d).select(col("n_nationkey"), lit("202412").as("period")),
      "period",
      2024,
      Seq("03", "06", "09", "12"))
      .orderBy("n_nationkey", "period")

  private def qSemiAnti(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    val withO = c.join(o, col("c_custkey") === col("o_custkey"), "left_semi")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .withColumn("status", lit("with_orders"))
    val withoutO = c.join(o, col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment")).agg(count(lit(1)).as("n"))
      .withColumn("status", lit("without_orders"))
    Relational.diagonalConcat(Seq(withO, withoutO))
      .select("c_mktsegment", "status", "n")
      .orderBy("status", "c_mktsegment")
  }

  /** Top-3 per priority written in the PLAIN window idiom — which
    * [[graft.plans.TopKRewriteRule]] rewrites to the native top-k operator
    * at optimization time (TopKPerKeySpec pins both the rewrite and the
    * rank-preserving semantics). Users keep writing windows; graft plans
    * bounded heaps. */
  private def qWindowRank(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("o_orderpriority")).orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= 3)
      .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
      .orderBy("o_orderpriority", "rnk")
  }

  /** Distribution window functions in one pass — ntile quartiles,
    * percent_rank, cume_dist over a tie-free (value, event_id) order per
    * event type. The unique tiebreak makes peer groups singletons, so both
    * rank fractions are exact integer ratios — engine-portable doubles. */
  private def qWindowSuite(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("event_type")).orderBy(col("value"), col("event_id"))
    Tables.events(s, d)
      .select(col("event_type"), col("event_id"), col("value"))
      .withColumn("bucket", ntile(4).over(w))
      .withColumn("pct_rank", percent_rank().over(w))
      .withColumn("cume", cume_dist().over(w))
      .orderBy("event_type", "value", "event_id")
  }

  /** TPC-H Q22 shape (scalar subquery + NOT EXISTS): customers with an
    * above-positive-average balance and no order since 2000 (every
    * synthetic customer has SOME order, so the dormancy cutoff plays
    * Q22's "no orders" role), grouped by nation. The scalar average
    * decorrelates to a 1-row broadcast cross join; the NOT EXISTS to a
    * left-anti join on the customer key with the date filter pushed into
    * the anti side's scan. The threshold is one double division from an
    * exact decimal sum — engine-portable. */
  private def qTpchQ22(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d)
    val avgPos = cust.filter(col("c_acctbal") > lit(0.0))
      .agg((sum(col("c_acctbal").cast("decimal(18,2)")).cast("double") / count(lit(1)))
        .as("__avg"))
    cust.crossJoin(broadcast(avgPos))
      .filter(col("c_acctbal") > col("__avg"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("2000-01-01").cast("timestamp"))
          .select("o_custkey"),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy("c_nationkey")
      .agg(
        count(lit(1)).as("numcust"),
        sum(col("c_acctbal").cast("decimal(18,2)")).cast("double").as("totacctbal"))
      .orderBy("c_nationkey")
  }

  /** Top-3 orders per priority through the NATIVE top-k operator
    * (custom LogicalPlan + Strategy + SparkPlan — see graft.plans). Same
    * result set as the window formulation, no sort anywhere in the plan. */
  private def qTopkNative(s: SparkSession, d: String): DataFrame =
    Relational.topKPerKey(
      Tables.orders(s, d).select("o_orderpriority", "o_orderkey", "o_totalprice"),
      keyCols = Seq("o_orderpriority"),
      sort = Seq("o_totalprice" -> true, "o_orderkey" -> false),
      k = 3)
      .orderBy(col("o_orderpriority"), col("o_totalprice").desc, col("o_orderkey"))

  private def qRollup(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .rollup(col("n_name"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("n_name").asc_nulls_first)

  /** Explicit GROUPING SETS (the general form beneath rollup/cube): nation
    * totals, priority totals and the cross grain in ONE Expand-based
    * aggregate pass — no union of three scans. */
  private def qGroupingSets(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .groupingSets(
        Seq(Seq(col("n_name"), col("o_orderpriority")), Seq(col("n_name")), Seq(col("o_orderpriority"))),
        col("n_name"), col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("sum_price"))
      .orderBy(col("n_name").asc_nulls_first, col("o_orderpriority").asc_nulls_first)

  /** TPC-H Q7 shape (nation-pair volume): revenue shipped between each
    * ordered pair of two chosen nations per year. Both nation dims
    * broadcast; the fact joins stay on their keys — the classic
    * star-with-two-role-playing-dims plan. */
  private def qTpchQ7(s: SparkSession, d: String): DataFrame = {
    val nat = Seq("NATION_3", "NATION_7")
    val suppNat = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    val custNat = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(custNat), col("o_custkey") === col("c_custkey"))
      .filter(col("supp_nation").isin(nat: _*) && col("cust_nation").isin(nat: _*) &&
        col("supp_nation") =!= col("cust_nation"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).as("l_year"))
      .agg((sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
        .cast("long")) / 100.0).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** TPC-H Q10 shape (returned-item revenue ranking): top-20 customers by
    * revenue lost to returns in a quarter — join + aggregate + bounded
    * top-k (TakeOrderedAndProject, never a global sort). */
  private def qTpchQ10(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_returnflag") === "R")
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d).select("c_custkey", "c_name", "c_nationkey"),
        col("o_custkey") === col("c_custkey"))
      .groupBy("c_custkey", "c_name", "c_nationkey")
      .agg((sum(floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
        .cast("long")) / 100.0).as("revenue"))
      .orderBy(col("revenue").desc, col("c_custkey"))
      .limit(20)

  /** Revenue in integer cents: `floor(x*100+0.5)` quantizes BEFORE the sum
    * so the aggregate is exact long arithmetic — partition-order-independent
    * and bit-identical cross-engine (Spark double→long cast truncates,
    * DuckDB rounds; floor(+0.5) sidesteps both). */
  private def volCents: Column =
    floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5).cast("long")

  /** TPC-H Q6 shape (forecast revenue change): the pure scan-filter-agg
    * query — every predicate pushes to the parquet scan, zero joins, the
    * shuffle carries one partial sum per partition. */
  private def qTpchQ6(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp") &&
        col("l_discount").between(0.05, 0.07) && col("l_quantity") < 24)
      .agg((sum(floor(col("l_extendedprice") * col("l_discount") * 100 + 0.5).cast("long")) / 100.0)
        .as("revenue"))

  /** TPC-H Q8 shape (national market share): PROMO-part revenue into
    * AMERICA customers by year, share credited to NATION_3 suppliers. Share
    * = ratio of two exact cent sums (6-dp round of a division of exact
    * ingredients — the proven cross-engine float recipe). */
  private def qTpchQ8(s: SparkSession, d: String): DataFrame = {
    val amerCust = Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(Tables.region(s, d).filter(col("r_name") === "AMERICA")),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"))
    val suppNat = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_type") === "PROMO").select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1998-01-01").cast("timestamp"))
          .select("o_orderkey", "o_custkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(amerCust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(year(col("o_orderdate")).as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3", volCents).otherwise(lit(0L))).cast("double") /
          sum(volCents).cast("double"), 6).as("mkt_share"))
      .orderBy("o_year")
  }

  /** TPC-H Q9 shape (product-type profit by nation and year) adapted to the
    * schema: no partsupp table, so supply cost is the documented surrogate
    * `0.5 * p_retailprice` per unit. Per-row profit quantizes to cents
    * before the sum (exact long agg). */
  private def qTpchQ9(s: SparkSession, d: String): DataFrame = {
    val profitCents = floor((col("l_extendedprice") * (lit(1.0) - col("l_discount")) -
      lit(0.5) * col("p_retailprice") * col("l_quantity")) * 100 + 0.5).cast("long")
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).filter(col("p_name").contains("red"))
          .select("p_partkey", "p_retailprice")),
        col("l_partkey") === col("p_partkey"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).as("o_year"))
      .agg((sum(profitCents) / 100.0).as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** TPC-H Q11 shape (important stock) adapted: lineitem stands in for
    * partsupp as the part-supplier value ledger. Parts whose NATION_3
    * value exceeds 0.01% of the nation total — the threshold compare is
    * exact long arithmetic (`v * 10000 > tot`), no float epsilon. */
  private def qTpchQ11(s: SparkSession, d: String): DataFrame = {
    val natSupp = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d).filter(col("n_name") === "NATION_3")),
        col("s_nationkey") === col("n_nationkey"))
      .select("s_suppkey")
    val byPart = Tables.lineitem(s, d)
      .join(broadcast(natSupp), col("l_suppkey") === col("s_suppkey"))
      .groupBy("l_partkey")
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("__v"))
    val total = byPart.agg(sum(col("__v")).as("__tot"))
    byPart.crossJoin(broadcast(total))
      .filter(col("__v") * 10000 > col("__tot"))
      .select(col("l_partkey"), (col("__v") / 100.0).as("part_value"))
      .orderBy(col("part_value").desc, col("l_partkey"))
  }

  /** TPC-H Q13 shape (customer order-count distribution): LEFT join so
    * zero-order customers survive into the c_count=0 bucket, then the
    * distribution-of-counts second aggregate. Priority filter stands in
    * for the reference's o_comment NOT LIKE filter (no comment column). */
  private def qTpchQ13(s: SparkSession, d: String): DataFrame = {
    val ords = Tables.orders(s, d).filter(col("o_orderpriority") =!= "1-URGENT")
      .select("o_orderkey", "o_custkey")
    Tables.customer(s, d).select("c_custkey")
      .join(ords, col("c_custkey") === col("o_custkey"), "left")
      .groupBy("c_custkey")
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy("c_count")
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** TPC-H Q14 shape (promotion revenue share): one month of lineitem,
    * PROMO share of revenue as a percentage — conditional vs unconditional
    * exact cent sums, divided then rounded at 6 dp. */
  private def qTpchQ14(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-03-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_type")),
        col("l_partkey") === col("p_partkey"))
      .agg(round(lit(100.0) *
        sum(when(col("p_type") === "PROMO", volCents).otherwise(lit(0L))).cast("double") /
        sum(volCents).cast("double"), 6).as("promo_revenue"))

  /** TPC-H Q15 shape (top supplier): quarterly revenue per supplier, keep
    * the max — the scalar-subquery decorrelation: aggregate once, cross
    * join the 1-row max, filter by EXACT long equality on cent sums (the
    * reference's revenue view = max(revenue) equality, float-safe). */
  private def qTpchQ15(s: SparkSession, d: String): DataFrame = {
    val rev = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1996-04-01").cast("timestamp"))
      .groupBy(col("l_suppkey"))
      .agg(sum(volCents).as("__r"))
    val best = rev.agg(max(col("__r")).as("__m"))
    rev.crossJoin(broadcast(best)).filter(col("__r") === col("__m"))
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), (col("__r") / 100.0).as("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** TPC-H Q16 shape (supplier count by part attribute): distinct
    * (part, supplier) pairs from lineitem stand in for partsupp; suppliers
    * with negative account balance stand in for the reference's
    * "complaints" exclusion (no comment column) via anti-join. */
  private def qTpchQ16(s: SparkSession, d: String): DataFrame = {
    val sizes = Seq(3, 9, 14, 19, 23, 36, 45, 49)
    Tables.lineitem(s, d).select(col("l_partkey"), col("l_suppkey")).distinct()
      .join(Tables.supplier(s, d).filter(col("s_acctbal") < 0).select(col("s_suppkey")),
        col("l_suppkey") === col("s_suppkey"), "left_anti")
      .join(broadcast(Tables.part(s, d)
          .filter(col("p_brand") =!= "Brand#1" && col("p_type") =!= "PROMO" &&
            col("p_size").isin(sizes: _*))
          .select("p_partkey", "p_brand", "p_type", "p_size")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct(col("l_suppkey")).as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** TPC-H Q19 shape (discounted revenue, disjunctive predicates): the
    * classic OR-of-conjunctions join filter — Catalyst keeps the equi-join
    * key and evaluates the disjunction post-join; brand/size stand in for
    * brand/container. */
  private def qTpchQ19(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .join(broadcast(Tables.part(s, d).select("p_partkey", "p_brand", "p_size")),
        col("l_partkey") === col("p_partkey") && (
          (col("p_brand") === "Brand#1" && col("p_size").between(1, 5) &&
            col("l_quantity").between(1, 11)) ||
          (col("p_brand") === "Brand#2" && col("p_size").between(1, 10) &&
            col("l_quantity").between(10, 20)) ||
          (col("p_brand") === "Brand#3" && col("p_size").between(1, 15) &&
            col("l_quantity").between(20, 30))))
      .agg((sum(volCents) / 100.0).as("revenue"))

  /** TPC-H Q20 shape (part promotion candidates): suppliers shipping more
    * than 20% of a red part's 1996 volume. Quantities quantize to exact
    * longs; the 20% threshold is the exact integer compare `5*q > total`;
    * the per-part total is a window sum over the already-partitioned
    * aggregate (no second shuffle on part). */
  private def qTpchQ20(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val shipped = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1997-01-01").cast("timestamp"))
      .join(broadcast(Tables.part(s, d).filter(col("p_name").startsWith("red"))
          .select("p_partkey")),
        col("l_partkey") === col("p_partkey"))
      .groupBy("l_partkey", "l_suppkey")
      .agg(sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("__q"))
    shipped
      .withColumn("__tot", sum(col("__q")).over(Window.partitionBy("l_partkey")))
      .filter(col("__q") * 5 > col("__tot"))
      .select("l_suppkey").distinct()
      .join(broadcast(Tables.supplier(s, d).select("s_suppkey", "s_name")),
        col("l_suppkey") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"))
      .orderBy("s_suppkey")
  }

  // ------------------------------------------------------------- functions

  private def qNormalizeText(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .select(col("p_partkey"), normalize_text(col("p_name")).as("norm_name"))
      .orderBy("p_partkey")

  private def qMultiReplace(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(
        col("doc_id"),
        multi_replace(col("text"), Seq("scan" -> "SCAN", "join" -> "JOIN")).as("t"))
      .orderBy("doc_id")

  private def qDeterministicId(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"), deterministic_id(col("c_name")).as("cid"))
      .orderBy("c_custkey")

  /** RFC 4122 uuid5 ids — byte-compatible with the reference's
    * `uuid.uuid5(NAMESPACE_DNS, name)` (utils.py:420-431). `cid` is the
    * canonical hex-dash form; `cid_compact` is the hyphenless form the
    * reference actually stores (utils.py:431 strips the dashes), so a
    * cross-engine id join uses `cid_compact`. Rows-only driver check (DuckDB
    * has no SHA-1); FunctionsSpec pins the public test vectors (python.org
    * et al.) so the bytes are still oracle-grade. */
  private def qDeterministicIdUuid5(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        uuid5(col("c_name")).as("cid"),
        uuid5_compact(col("c_name")).as("cid_compact"))
      .orderBy("c_custkey")

  private def qPeriodParse(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(date_format(col("o_orderdate"), "yyyyMM").as("period"))
      .distinct()
      .withColumn("period_date", Periods.periodToDate(col("period")))
      .orderBy("period")

  private def qAgeSexStandardize(s: SparkSession, d: String): DataFrame = {
    val label = concat(
      when(col("c_custkey") % 2 === 0, lit("Féminin")).otherwise(lit("Masculin")),
      lit(", "),
      when(col("c_acctbal") < 5000.0, lit("<15 ans")).otherwise(lit("15 ans et plus")))
    val mapping = Seq(
      "Féminin, <15" -> "F_<15 ans",
      "Féminin, 15" -> "F_>15 ans",
      "Masculin, <15" -> "M_<15 ans",
      "Masculin, 15" -> "M_>15 ans")
    Tables.customer(s, d)
      .select(
        col("c_custkey"),
        label.as("label"),
        standardize_label(label, mapping, "nosex_noage").as("std"))
      .orderBy("c_custkey")
  }

  /** Type hygiene, oracle-checked: round non-key numerics to long and align
    * to an expected schema (missing column appears as typed null) — the
    * reference's cast/round/fill pass (extract_ist_data.py:135-169). */
  private def qTypeHygiene(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types._
    val slim = Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
    Relational.alignToSchema(
      Relational.roundNumericsToLong(slim, keyCols = Set("l_orderkey", "l_linenumber")),
      Seq(
        "l_orderkey" -> LongType,
        "l_linenumber" -> IntegerType,
        "l_quantity" -> LongType,
        "l_extendedprice" -> LongType,
        "missing_metric" -> DoubleType))
      // duplicate (orderkey, linenumber) pairs exist in the synthetic data:
      // order on every column so row order is total for the hash compare
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_extendedprice")
  }

  // --------------------------------------------------------------- rules

  private def lineitemRules: Seq[Rules.Rule] = Seq(
    Rules.Rule("high_discount", col("l_discount") > 0.06, 3, "RED"),
    Rules.Rule("tax_too_high", col("l_tax") >= 0.07, 2, "ORANGE"),
    Rules.Rule("bulk_quantity", col("l_quantity") > 45.0, 1, "YELLOW"))

  private def qRulesFlag(s: SparkSession, d: String): DataFrame =
    Rules.applyRules(Tables.lineitem(s, d), lineitemRules)
      .filter(col("rule_flag").isNotNull)
      .select("l_orderkey", "l_linenumber", "rule_flag")
      .orderBy("l_orderkey", "l_linenumber", "rule_flag")

  /** Table-level quality expectations over orders: the full check-kind
    * surface (completeness, bounds, set membership, regex conformance, row
    * count, uniqueness, referential containment) in one suite. The
    * row-scalar checks share ONE aggregate pass (PlanSpec-pinned). */
  private def qQualityChecks(s: SparkSession, d: String): DataFrame = {
    import Quality._
    Quality.report(Tables.orders(s, d), Seq(
      Complete("o_custkey"),
      MinAtLeast("o_totalprice", 500.0),
      MaxAtMost("o_totalprice", 400000.0),
      InSet("o_orderstatus", Seq("O", "F"), 0.9),
      MatchesRegex("o_orderpriority", "^[1-5]-"),
      RowCountBetween(1000L, 10000000L),
      Unique(Seq("o_orderkey")),
      FkContained(Seq("o_custkey"), Tables.customer(s, d), Seq("c_custkey"))))
      .select(
        col("check_name"), col("target"),
        round(col("metric"), 6).as("metric"), col("passed"))
      .orderBy("check_name", "target")
  }

  /** Streaming twin of the scalar half of [[qQualityChecks]]: the same
    * check suite as a LIVE data-quality monitor — one streaming aggregate
    * (Structured Streaming's one-agg-per-query rule is exactly why
    * [[Quality.scalarAggs]] exists) maintains the metric state across
    * micro-batches in complete mode; the accumulated 1-row state renders
    * through the same report shape, so the batch oracle's scalar rows gate
    * the stream. Unique/FK checks need a second aggregate/join and stay
    * batch-only (documented on the operator). */
  private def qQualityChecksStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import Quality._
    val checks: Seq[Quality.Check] = Seq(
      Complete("o_custkey"),
      MinAtLeast("o_totalprice", 500.0),
      MaxAtMost("o_totalprice", 400000.0),
      InSet("o_orderstatus", Seq("O", "F"), 0.9),
      MatchesRegex("o_orderpriority", "^[1-5]-"),
      RowCountBetween(1000L, 10000000L))
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
    val aggs = Quality.scalarAggs(checks)
    val name = "graft_quality_checks_stream"
    withStatePartitions(s, 8) {
      val q = stream.agg(aggs.head, aggs.tail: _*)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Quality.renderScalarReport(s.table(name), checks)
      .select(
        col("check_name"), col("target"),
        round(col("metric"), 6).as("metric"), col("passed"))
      .orderBy("check_name", "target")
  }

  private def qRulesSplit(s: SparkSession, d: String): DataFrame = {
    val (consistent, inconsistent) = Rules.splitConsistent(Tables.lineitem(s, d), lineitemRules)
    Relational.diagonalConcat(Seq(
      consistent.agg(count(lit(1)).as("n")).withColumn("part", lit("consistent")),
      inconsistent.agg(count(lit(1)).as("n")).withColumn("part", lit("inconsistent"))))
      .select("part", "n")
      .orderBy("part")
  }

  /** Excel-letter rule formulas compiled straight off their workbook
    * strings (the reference's DICO_RULES_* layout, constants.py:609;
    * letter→column-order resolution per utils.py:292) and applied as one
    * codegen'd priority CASE chain — the consistency audit a user migrates
    * WITHOUT transcribing formulas by hand. */
  private def qRulesFormula(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_orderkey"), col("l_linenumber"),
      floor(col("l_quantity") * 100 + 0.5).cast("long").as("qty100"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("price_c"),
      floor(col("l_discount") * 10000 + 0.5).cast("long").as("disc_bp"),
      floor(col("l_tax") * 10000 + 0.5).cast("long").as("tax_bp"))
    // A=l_orderkey … F=tax_bp; shift=1 aligns A to the first column
    val rules = Rules.rulesFromFormulas(Seq(
      ("rule_1", "(E+F)>1200", "fee_overload", 90),
      ("rule_2", "C>D", "price_below_qty", 80),
      ("rule_3", "E>=900", "deep_discount", 70),
      ("rule_4", "B*C>25000", "bulky_tail_line", 60)),
      li.columns.toSeq, shift = 1)
    Rules.applyRules(li, rules)
      .groupBy(col("rule_flag")).agg(count(lit(1)).as("n"))
      .orderBy(col("rule_flag").asc_nulls_first)
  }

  /** Multi-block melt — the reference's transform_for_pnls_reporting
    * (utils.py:214): per indicator prefix, unpivot its value columns and tag
    * rows with the indicator id; blocks diagonal-concat into one long
    * frame. */
  private def qMeltIndicators(s: SparkSession, d: String): DataFrame = {
    val wide = Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(
        dsum(when(col("l_linestatus") === "F", col("l_quantity"))).as("qty_F"),
        dsum(when(col("l_linestatus") === "O", col("l_quantity"))).as("qty_O"),
        count(when(col("l_linestatus") === "F", lit(1))).cast("double").as("cnt_F"),
        count(when(col("l_linestatus") === "O", lit(1))).cast("double").as("cnt_O"))
    Reshape.meltIndicators(wide, Seq("l_returnflag"), Seq("qty" -> 1, "cnt" -> 2))
      .orderBy("l_returnflag", "indicateur", "variable")
  }

  /** GK approx quantiles per group, in the oracle-checkable regime:
    * relativeError = 1e-6 gives accuracy 1e6 >= every gate group size, so
    * the summary never compresses and each readout is the exact order
    * statistic — SQL-replayable. Production callers keep the default 1%
    * error, whose bound SketchesSpec pins. */
  private def qApproxQuantiles(s: SparkSession, d: String): DataFrame =
    // posexplode to scalar (flag, p, q) rows: the driver's rows-only check
    // sorts the result with pandas, which cannot order an array column
    Sketches.approxQuantiles(
      Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity", Seq(0.25, 0.5, 0.75),
      relativeError = 1e-6)
      .select(col("l_returnflag"), posexplode(col("approx_quantiles")).as(Seq("p_idx", "q_value")))
      .orderBy("l_returnflag", "p_idx")

  /** Colored consistency-matrix export — the reference's
    * `matrice_de_coherence_*.xlsx` deliverable (pipeline.py:351, colors from
    * utils.py:1047 `get_dataframe_color_rules`): write the violating rows
    * with per-cell priority colors, then read the workbook BACK (values via
    * the distributed grid reader, fills via the styles parser) and return
    * one row per painted cell. Rows-only driver check: the assertion of the
    * color semantics is RulesSpec's cell-level round-trip; this query proves
    * the deliverable end-to-end on real table data. */
  private def qRulesMatrixExport(s: SparkSession, d: String): DataFrame = {
    import graft.sources.Xlsx
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_matrix_").toFile
    tmpDir.deleteOnExit()
    val path = new java.io.File(tmpDir, "matrix.xlsx").getPath
    val cols = Seq("l_orderkey", "l_linenumber", "l_quantity", "l_discount")
    Rules.exportMatrix(
      Tables.lineitem(s, d).filter(col("l_orderkey") < 2000).select(cols.map(col): _*),
      columns = cols,
      orderBy = cols,
      colRules = Seq(
        "l_quantity" -> Seq(
          Rules.Rule("qty_warn", col("l_quantity") >= 30, 1, "FFFFFF00"),
          Rules.Rule("qty_crit", col("l_quantity") >= 45, 2, "FFFF0000")),
        "l_discount" -> Seq(
          Rules.Rule("disc_high", col("l_discount") >= 0.08, 1, "FF00B050"))),
      path = path)
    val fills = Xlsx.cellFills(
      java.nio.file.Files.readAllBytes(java.nio.file.Paths.get(path)))
    val painted = fills.zipWithIndex.drop(1).flatMap { case (row, ri) =>
      row.zipWithIndex.collect { case (c, ci) if c != null => (ri, ci, c) }
    }
    import s.implicits._
    painted.toSeq.toDF("row_idx", "col_idx", "color")
      .select(
        col("row_idx").cast("long").as("row_idx"),
        col("col_idx").cast("long").as("col_idx"),
        col("color"))
      .orderBy("row_idx", "col_idx")
  }

  // --------------------------------------------------------------- fuzzy

  private def qFuzzyMatch(s: SparkSession, d: String): DataFrame =
    FuzzyMatch.bestMatch(
      Tables.customer(s, d).select(col("c_custkey"), col("c_name")),
      Seq("c_custkey"),
      "c_name",
      Tables.nation(s, d),
      "n_name")
      .select(col("c_custkey"), col("matched"), round(col("match_score"), 6).as("match_score"))
      .orderBy("c_custkey")

  /** Fuzzy entity resolution under the Jaro–Winkler scorer (prefix-weighted
    * — the classic choice for name matching): same broadcast + keyed min_by
    * reduction as q_fuzzy_match, different similarity expression. The native
    * jaroWinkler is bit-compatible with DuckDB's, so the per-key argmax
    * agrees across engines without rounding games. */
  private def qJaroWinkler(s: SparkSession, d: String): DataFrame =
    FuzzyMatch.bestMatch(
      Tables.supplier(s, d).select(col("s_suppkey"), col("s_name")),
      Seq("s_suppkey"),
      "s_name",
      Tables.nation(s, d),
      "n_name",
      sim = jaro_winkler)
      .select(col("s_suppkey"), col("matched"), round(col("match_score"), 6).as("match_score"))
      .orderBy("s_suppkey")

  /** Unrestricted Damerau–Levenshtein against each supplier's
    * best-matching nation name — transposition-aware typo distance,
    * DuckDB-compatible semantics. */
  private def qDamerau(s: SparkSession, d: String): DataFrame =
    Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
      .crossJoin(broadcast(Tables.nation(s, d).select(col("n_name"))))
      .select(col("s_suppkey"), col("n_name"),
        damerau_levenshtein(col("s_name"), col("n_name")).as("dl"))
      .groupBy(col("s_suppkey"))
      .agg(min(struct(col("dl"), col("n_name"))).as("__best"))
      .select(col("s_suppkey"), col("__best.n_name").as("closest"), col("__best.dl").as("dl"))
      .orderBy("s_suppkey")

  /** Scalable edit-distance self-join on supplier names (SymSpell deletion
    * neighborhoods → equi-join → exact verify): every pair within
    * Levenshtein 1, no cartesian, neither side broadcast. */
  private def qEditJoin(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d).select(col("s_suppkey"), col("s_name"))
    FuzzyMatch.editDistanceJoin(sup, sup, "s_suppkey", "s_name", "s_suppkey", "s_name", maxDist = 1)
      .filter(col("left_id") < col("right_id"))
      .select(col("left_id"), col("right_id"), col("dist").cast("long").as("dist"))
      .orderBy("left_id", "right_id")
  }

  /** Welch two-sample t-test between open and finished orders on the
    * (scale-invariant, pre-scaled) price — exact fixed-point moments. */
  private def qAbTest(s: SparkSession, d: String): DataFrame =
    Sketches.welchTTest(
      Tables.orders(s, d).withColumn("v", col("o_totalprice") / 100000.0),
      "o_orderstatus", "v", a = "O", b = "F")
      .select(
        col("n_a"), col("n_b"),
        round(col("mean_a"), 6).as("mean_a"), round(col("mean_b"), 6).as("mean_b"),
        round(col("t_stat"), 6).as("t_stat"), round(col("dof"), 6).as("dof"))

  /** Encoding-anomaly scorer (T66) over the documents corpus with
    * deterministic mojibake injection (the synthetic text is clean ASCII,
    * so every 37th doc gets a double-decode signature + replacement char
    * and every 53rd a stray control byte — both sides construct it). */
  private def qEncodingAnomalies(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 37 === 0,
        concat(col("text"), lit(" caf\u00C3\u00A9 \uFFFD")))
        .otherwise(col("text")).as("t0"))
      .select(col("doc_id"),
        when(col("doc_id") % 53 === 0, concat(col("t0"), lit("\u0007")))
          .otherwise(col("t0")).as("text"))
    TextAnalysis.encodingAnomalies(base, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Rank-2 ALS matrix factorization (X290) over the (user × event-type)
    * mean-value matrix — 2 alternating ridge sweeps, quantized trajectory,
    * item factors + final RMSE gated. */
  private def qAls(s: SparkSession, d: String): DataFrame = {
    val ratings = Tables.events(s, d)
      .groupBy(col("user_id"), col("event_type"))
      .agg((sum(floor(col("value") * 100 + 0.5).cast("long")).cast("double") / 100.0 /
        count(lit(1)).cast("double")).as("r"))
    Models.alsRank2(ratings, "user_id", "event_type", "r", sweeps = 2, lambda = 0.1)
      .filter(col("entity") === "item")
      .select(col("entity"), col("id"), col("f1"), col("f2"), col("rmse"))
      .orderBy("id")
  }

  /** Luhn PAN audit (T67) over the documents corpus with deterministic
    * injection (the synthetic text has no card numbers): every 41st doc
    * gets a Luhn-valid test PAN, every 67th a Luhn-INVALID 16-digit run
    * — the checksum must separate them identically on both engines. */
  private def qDetectPan(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 41 === 0,
        concat(col("text"), lit(" card 4539 1488 0343 6467 ok")))
        .otherwise(col("text")).as("t0"))
      .select(col("doc_id"),
        when(col("doc_id") % 67 === 0,
          concat(col("t0"), lit(" ref 1234 5678 9012 3456 x")))
          .otherwise(col("t0")).as("text"))
    TextAnalysis.detectPan(base, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Uplift-by-decile / Qini readout (X288): customers ranked by account
    * balance as the "model score", md5 50/50 arms, conversion = any 1997+
    * order — the incremental-targeting evaluation beside q_cuped. */
  private def qUpliftDeciles(s: SparkSession, d: String): DataFrame = {
    val conv = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .select(col("o_custkey")).distinct().withColumn("__conv", lit(true))
    val pop = Tables.customer(s, d)
      .select(col("c_custkey"), col("c_acctbal"))
      .join(conv, col("c_custkey") === col("o_custkey"), "left")
      .withColumn("tr",
        Sampling.hashBucket(concat(col("c_custkey"), lit(":exp9")), 100) < 50)
      .withColumn("y", coalesce(col("__conv"), lit(false)))
    Models.upliftDeciles(pop, "tr", "y", "c_acctbal", Seq("c_custkey"))
      .orderBy("bucket")
  }

  /** End-to-end entity-resolution pipeline (X300) in ONE Catalyst plan —
    * the composition the record-linkage family builds toward (X261
    * soundex blocking → jaro-winkler scoring → per-entity argmax →
    * threshold → survivorship merge): source B is a deterministically
    * perturbed re-feed of parts (every 3rd part, re-keyed, name mangled
    * with a trailing letter, price drifted) and the pipeline must link
    * each B row back to its A original through the phonetic block —
    * typo-robust because the mangle falls beyond soundex's 3 digits.
    * Unmatched B rows survive as NULL links (left join), never dropped. */
  private def qErPipeline(s: SparkSession, d: String): DataFrame = {
    val a = Tables.part(s, d).select(
      col("p_partkey").as("a_key"), col("p_name").as("a_name"),
      col("p_retailprice").as("a_price"))
    val b = Tables.part(s, d).filter(col("p_partkey") % 3 === 0).select(
      (col("p_partkey") + 1000000L).as("b_key"),
      concat(col("p_name"), lit("x")).as("b_name"),
      (col("p_retailprice") + 10.0).as("b_price"))
    val pairs = FuzzyMatch.phoneticBlockJoin(
        b, a.withColumnRenamed("a_name", "a_name0"), "b_name", "a_name0")
      .withColumn("__jw", graft.functions.jaro_winkler(col("b_name"), col("a_name0")))
      .filter(col("__jw") >= 0.9)
    val best = pairs
      .groupBy(col("b_key"))
      .agg(max(struct(col("__jw"), (-col("a_key")).as("__nk"),
        col("a_key"), col("a_name0"), col("a_price"))).as("__m"))
      .select(col("b_key").as("__bk"),
        col("__m.a_key").as("a_key"),
        col("__m.__jw").as("__jw"),
        col("__m.a_name0").as("canonical_name"),
        col("__m.a_price").as("__ap"))
    b.join(best, col("b_key") === col("__bk"), "left")
      .select(
        // UNROUNDED: jw and the merged price are the same doubles on both
        // engines (bit-compatible JW, identical greatest) — rounding the
        // same double can STILL diverge at decimal half-way points
        // (Spark HALF_UP on the shortest repr vs DuckDB on the binary
        // value — the X294 lesson), so don't
        col("b_key"), col("a_key"),
        col("__jw").as("jw"),
        col("canonical_name"),
        when(col("a_key").isNotNull,
          greatest(col("__ap"), col("b_price"))).as("merged_price"))
      .orderBy("b_key")
  }

  /** URL canonicalization (T70) over synthesized crawl URLs (the corpus
    * has no URL column, so both engines derive one per doc id across
    * three messy shapes — mixed case, default ports, tracking params,
    * fragments). */
  private def qCanonicalizeUrls(s: SparkSession, d: String): DataFrame = {
    val id = col("doc_id").cast("string")
    val url = when(col("doc_id") % 3 === 0,
      concat(lit("HTTPS://News.Site"), (col("doc_id") % 7).cast("string"),
        lit(".COM:443/a/"), id, lit("?utm_source=feed&id="), id, lit("#top")))
      .when(col("doc_id") % 3 === 1,
        concat(lit("http://Blog.example"), (col("doc_id") % 5).cast("string"),
          lit(".org:80/p?fbclid=x"), id, lit("&q=1")))
      .otherwise(concat(lit("https://cdn.mirror.net/obj/"), id))
    TextAnalysis.canonicalizeUrls(
      Tables.documents(s, d).select(col("doc_id"), url.as("url")),
      "doc_id", "url")
      .orderBy("doc_id")
  }

  /** Markup strip (T69) with deterministic injection (the synthetic
    * corpus is plain text, so every 29th doc gets wrapped in tag soup
    * with a script payload and entities — both engines construct it). */
  private def qStripMarkup(s: SparkSession, d: String): DataFrame = {
    val base = Tables.documents(s, d).select(col("doc_id"),
      when(col("doc_id") % 29 === 0,
        concat(lit("<div class=\"post\"><h1>T</h1><p>"), col("text"),
          lit("</p><script>var a=1;</script><!-- c --> &amp; &lt;tail&gt;</div>")))
        .otherwise(col("text")).as("text"))
    TextAnalysis.stripMarkup(base, "doc_id", "text")
      .select(col("doc_id"), col("text_clean"), col("n_chars_raw"),
        col("n_chars_clean"),
        round(col("markup_ratio"), 9).as("markup_ratio"))
      .orderBy("doc_id")
  }

  /** Deterministic epoch shuffle + source interleave (T68) over the
    * documents corpus — the reproducible training-order primitive. */
  private def qDeterministicShuffle(s: SparkSession, d: String): DataFrame =
    Sampling.deterministicShuffle(
      Tables.documents(s, d).select(col("doc_id"), col("source")),
      Seq("doc_id"), seed = "epoch1", interleaveBy = Some("source"))
      .select(col("training_order"), col("doc_id"), col("source"),
        col("within_source_rank"))
      .orderBy("training_order")

  /** Neyman optimal allocation (X299): split a 500-unit sample budget
    * across market segments ∝ N_h·S_h of scaled balances — the survey
    * design step before stratified sampling draws anything. */
  private def qNeymanAllocation(s: SparkSession, d: String): DataFrame =
    Sampling.neymanAllocation(
      Tables.customer(s, d)
        .select(col("c_mktsegment"), (col("c_acctbal") / 1000.0).as("v")),
      Seq("c_mktsegment"), "v", totalSample = 500L)
      .orderBy("c_mktsegment")

  /** Nearest-neighbor propensity matching (X294): md5 arms, balance-scaled
    * score, 1997+ spend outcome, caliper 0.001 — the auditable matched-
    * pair table behind an ATT readout. */
  private def qPropensityMatch(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1997-01-01").cast("timestamp"))
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("__cents"))
    val pop = Tables.customer(s, d)
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("c_custkey"),
        (Sampling.hashBucket(concat(col("c_custkey"), lit(":match")), 100) < 50).as("tr"),
        ((col("c_acctbal") + 1000.0) / 12000.0).as("score"),
        (coalesce(col("__cents"), lit(0L)).cast("double") / 100000.0).as("y"))
    Models.propensityMatch(pop, "c_custkey", "tr", "score", "y", caliper = 0.001)
      .orderBy("treated_id")
  }

  /** Fixed-effect meta-analysis (X289): per-nation md5-arm mean-balance
    * differences with Welch SEs, pooled by inverse variance — one effect
    * + the Q/I² heterogeneity audit across 25 segments. */
  private def qMetaAnalysis(s: SparkSession, d: String): DataFrame = {
    def S(e: Column) =
      sum(floor(e * 1000000.0 + 0.5).cast("long")).cast("double") / 1000000.0
    val c = Tables.customer(s, d).select(
      col("c_nationkey").as("nat"),
      (Sampling.hashBucket(concat(col("c_custkey"), lit(":meta")), 100) < 50).as("tr"),
      (col("c_acctbal") / 1000.0).as("v"))
    val g = c.groupBy(col("nat"), col("tr"))
      .agg(count(lit(1)).cast("double").as("__n"),
        S(col("v")).as("__s"), S(col("v") * col("v")).as("__ss"))
    def pick(t: Boolean, cc: String) = max(when(col("tr") === t, col(cc)))
    val wide = g.groupBy(col("nat")).agg(
      pick(true, "__n").as("na"), pick(true, "__s").as("sa"), pick(true, "__ss").as("ssa"),
      pick(false, "__n").as("nb"), pick(false, "__s").as("sb"), pick(false, "__ss").as("ssb"))
    val va = (col("ssa") - col("sa") * col("sa") / col("na")) / (col("na") - 1)
    val vb = (col("ssb") - col("sb") * col("sb") / col("nb")) / (col("nb") - 1)
    val studies = wide.filter(col("na") > 1 && col("nb") > 1)
      .select(
        (col("sa") / col("na") - col("sb") / col("nb")).as("e"),
        sqrt(va / col("na") + vb / col("nb")).as("se"))
    Sketches.metaAnalysis(studies, "e", "se")
  }

  /** A/B power / minimum-detectable-effect readout (X287) on the
    * q_ab_test arms — the design companion to the Welch verdict. */
  private def qAbPower(s: SparkSession, d: String): DataFrame =
    Sketches.abPower(
      Tables.orders(s, d).withColumn("v", col("o_totalprice") / 100000.0),
      "o_orderstatus", "v", a = "O", b = "F",
      alpha = 0.05, power = 0.8, targetEffect = Some(0.01))

  /** STREAMING mSPRT monitor (S46, 44th gate): the always-valid p is
    * DESIGNED for this deployment — per-arm integer moment sums
    * accumulate in the state store (complete mode, TWO state rows —
    * arm-domain-bounded) as orders stream in, and the peeking-safe
    * readout finishes in batch off the sink, honest at EVERY look.
    * Integer state ⇒ stream == batch bit-exactly — shares q_msprt's
    * oracle verbatim. */
  private def qMsprtStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
      .withColumn("v", col("o_totalprice") / 100000.0)
    val name = "graft_msprt_stream"
    withStatePartitions(s, 1) {
      val q = Sketches.msprtMoments(stream, "o_orderstatus", "v", a = "O", b = "F")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Sketches.msprtAssemble(s.table(name), "o_orderstatus", a = "O", b = "F", tau = 0.1)
  }

  /** STREAMING A/B power monitor (S47, 45th gate): the SAME two-row
    * integer moment state as S46 feeds the MDE readout — "what effect
    * could we detect RIGHT NOW" updating per micro-batch. Integer state
    * ⇒ stream == batch bit-exactly, shares q_ab_power's oracle. */
  private def qAbPowerStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
      .withColumn("v", col("o_totalprice") / 100000.0)
    val name = "graft_ab_power_stream"
    withStatePartitions(s, 1) {
      val q = Sketches.msprtMoments(stream, "o_orderstatus", "v", a = "O", b = "F")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Sketches.abPowerAssemble(s.table(name), "o_orderstatus", a = "O", b = "F",
      alpha = 0.05, power = 0.8, targetEffect = Some(0.01))
  }

  /** STREAMING effect-size monitor (S48, 46th gate): Cohen's d / Hedges'
    * g / Glass's Δ off the same two-row integer moment state — the live
    * magnitude dashboard beside the S46 verdict and S47 design monitors.
    * Shares q_effect_size's oracle verbatim. */
  private def qEffectSizeStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
      .withColumn("v", col("o_totalprice") / 100000.0)
    val name = "graft_effect_size_stream"
    withStatePartitions(s, 1) {
      val q = Sketches.msprtMoments(stream, "o_orderstatus", "v", a = "O", b = "F")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Sketches.effectSizeAssemble(s.table(name), "o_orderstatus", a = "O", b = "F")
  }

  /** Standardized effect sizes (X296) on the q_ab_test arms — Cohen's d,
    * Hedges' g, Glass's Δ beside the Welch verdict's p. */
  private def qEffectSize(s: SparkSession, d: String): DataFrame =
    Sketches.effectSize(
      Tables.orders(s, d).withColumn("v", col("o_totalprice") / 100000.0),
      "o_orderstatus", "v", a = "O", b = "F")

  /** Always-valid mSPRT readout (X291) on the q_ab_test arms — the
    * peeking-safe sequential p beside the fixed-n Welch verdict. */
  private def qMsprt(s: SparkSession, d: String): DataFrame =
    Sketches.msprt(
      Tables.orders(s, d).withColumn("v", col("o_totalprice") / 100000.0),
      "o_orderstatus", "v", a = "O", b = "F", tau = 0.1)

  /** First-order Markov transition matrix over per-user event sequences. */
  private def qTransitions(s: SparkSession, d: String): DataFrame =
    Funnel.transitionMatrix(
      Tables.events(s, d), "user_id", "ts", "event_type", tiebreakCols = Seq("event_id"))
      .select(col("state"), col("next_state"), col("n"), round(col("p"), 6).as("p"))
      .orderBy("state", "next_state")

  private def qTokenSetRatio(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), token_set_ratio(col("text"), lit("spark query join table")).as("score"))
      .orderBy("doc_id")

  // --------------------------------------------------------------- dedup

  private def qDedupExact(s: SparkSession, d: String): DataFrame =
    Dedup.exact(Tables.documents(s, d), "doc_id", "text")
      .orderBy("keep_id")

  /** Keep-first-by-order dedup: first lineitem per order. The synthetic
    * lineitem has duplicate (orderkey, linenumber) pairs, so quantity joins
    * the order spec — any rows still tied are identical in every output
    * column, keeping the pick value-deterministic. */
  private def qDedupKeepFirst(s: SparkSession, d: String): DataFrame =
    Relational.dropDuplicatesOrdered(
      Tables.lineitem(s, d).select("l_orderkey", "l_linenumber", "l_quantity"),
      Seq("l_orderkey"),
      Seq(col("l_linenumber").asc, col("l_quantity").asc))
      .orderBy("l_orderkey")

  /** MinHash LSH near-dup detection, oracle-hash-gated on its VERIFIED
    * output: the banded candidate generation is engine-specific hashing,
    * but the pairs that survive the exact 3-gram Jaccard >= 0.7 verify are
    * a deterministic SQL set, and at 128 hashes / 32 bands the band
    * construction's miss probability for a qualifying pair is <= (1-j^4)^32
    * (~1.5e-4 at j = 0.7, vanishing toward j = 1), so the verified output
    * equals the exact all-pairs result on real corpora — asserted
    * pair-for-pair by the DuckDB oracle. Band internals (signature shape,
    * collision recall) stay pinned in DedupSpec. */
  private def qDedupMinhash(s: SparkSession, d: String): DataFrame =
    Dedup.minHashLsh(Tables.documents(s, d), "doc_id", "text",
        numHashes = 128, bands = 32, jaccardThreshold = 0.7)
      .select(col("id1"), col("id2"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("id1", "id2")

  /** Band-structure readout of [[Dedup.minHashBands]] (rows-only by design:
    * band keys are engine-specific 64-bit hashes with no SQL twin). */
  private def qDedupMinhashBands(s: SparkSession, d: String): DataFrame =
    Dedup.minHashBands(Tables.documents(s, d), "doc_id", "text")
      .groupBy(col("doc_id"))
      // xor-fold, not sum: band keys are full-range 64-bit hashes, so a sum
      // overflows LongType under ANSI mode; xor is order-independent and
      // closed over Long.
      .agg(
        count(lit(1)).as("n_bands"),
        expr("bit_xor(band_key)").as("bands_checksum"))
      .orderBy("doc_id")

  private def qDedupSimhash(s: SparkSession, d: String): DataFrame =
    Dedup.simHash(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  private def qDedupJaccard(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Dedup.ngramJaccardTopK(docs, docs.filter(col("doc_id") < 5), "doc_id", "text", k = 3)
      .select(col("query_id"), col("doc_id"), round(col("jaccard"), 6).as("jaccard"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** EXACT near-duplicate pairs via prefix-filtered set-similarity join —
    * the zero-false-negative complement of q_dedup_minhash, against a full
    * DuckDB list-ops oracle. */
  private def qDedupAllpairs(s: SparkSession, d: String): DataFrame =
    Dedup.allPairsJaccard(Tables.documents(s, d), "doc_id", "text", threshold = 0.7)
      .orderBy("id1", "id2")

  /** Directional containment pairs (doc1 ≥80% inside doc2) — the
    * asymmetric near-dup measure for quote/subset duplicates, exact via
    * prefix-filtered candidates + merge-pass verify. */
  private def qContainmentJoin(s: SparkSession, d: String): DataFrame =
    Dedup.containmentJoin(Tables.documents(s, d), "doc_id", "text", threshold = 0.8)
      .orderBy("id1", "id2")

  /** Connected components over the exact near-dup pair graph — the cluster
    * assignment a dedup pipeline keys its keep/drop decision on, via the
    * O(log n)-round star-contraction algorithm (diameter-proof at corpus
    * scale, unlike per-round min-label propagation). Oracle: recursive-CTE
    * min-label closure over the SAME SQL-replayed pair set — tractable
    * because near-dup components are small by construction. */
  private def qConnectedComponents(s: SparkSession, d: String): DataFrame = {
    val pairs = Dedup.allPairsJaccard(Tables.documents(s, d), "doc_id", "text", threshold = 0.7)
    Graph.connectedComponents(pairs, "id1", "id2").orderBy("id")
  }

  // ----------------------------------------------------------- similarity

  private def qCosineTopK(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.bruteForceTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 5)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** K-means assignment against 4 formula-derived fixed centroids
    * (`c[i][j] = ((i+1)·(j+1) mod 7 − 3) / 10`) — pure projection. */
  private def qAssignClusters(s: SparkSession, d: String): DataFrame = {
    val centroids = Seq.tabulate(4, 64)((i, j) => (((i + 1) * (j + 1)) % 7 - 3) / 10.0)
    Similarity.assignClusters(Tables.embeddings(s, d), "embedding", centroids)
      .select(col("vec_id"), col("cluster"), col("dist_sq"))
      .orderBy("vec_id")
  }

  /** SemDeDup over the embedding corpus against the q_assign_clusters
    * formula centroids: intra-cluster pairs at cosine >= 0.4 mark the
    * nearer-to-centroid member dropped — assignment, pair cosines and the
    * keep/drop rule all replay in SQL, so the full semantic-dedup decision
    * is hash-gated (threshold chosen to actually fire on the synthetic
    * corpus: max pairwise cosine is ~0.51). */
  private def qSemDedup(s: SparkSession, d: String): DataFrame = {
    val centroids = Seq.tabulate(4, 64)((i, j) => (((i + 1) * (j + 1)) % 7 - 3) / 10.0)
    Similarity.semDeDup(Tables.embeddings(s, d), "vec_id", "embedding", centroids,
        threshold = 0.4)
      .select(col("vec_id"), col("cluster"), col("dist_sq"), col("kept"))
      .orderBy("vec_id")
  }

  /** Retrieval-quality eval: brute-force cosine top-5 scored against
    * label-match relevance — precision/recall@k, MRR, NDCG@k per query. */
  private def qRankingMetrics(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val queries = emb.filter(col("vec_id") < 8)
    val results = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 5)
    val truth = queries.select(col("vec_id").as("__qid"), col("label").as("__qlab"))
      .join(emb.select(col("vec_id").as("__did"), col("label").as("__dlab")),
        col("__qlab") === col("__dlab"))
      .filter(col("__qid") =!= col("__did"))
      .select(col("__qid").as("query_id"), col("__did").as("vec_id"))
    Similarity.rankingMetrics(results, truth, "query_id", "vec_id", "rnk", k = 5)
      .orderBy("query_id")
  }

  /** IVF ANN with a KMeans coarse quantizer — rows-only check (centroids are
    * engine-specific); brute-force agreement asserted in SimilaritySpec. */
  private def qAnnIvf(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** Embedding near-dup pairs (LSH candidates + exact cosine verify),
    * oracle-hash-gated BY CONSTRUCTION: the corpus is augmented with scaled
    * (x2) copies of every 7th vector — cosine exactly 1, and since positive
    * scaling preserves every hyperplane sign the copy lands in the same
    * bucket of every LSH table, so recall on the planted pairs is exactly
    * 1.0, not probabilistic. At threshold 0.99 the random background never
    * qualifies, making the verified output a deterministic SQL set (the
    * planted pairs) while the bucket join still churns through the full
    * background candidate volume. Background-tail recall stays pinned in
    * SimilaritySpec. */
  private def qDedupEmbedding(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d).select(col("vec_id"), col("embedding"))
    val planted = emb.filter(col("vec_id") % 7 === 0)
      .select((col("vec_id") + lit(1000000)).as("vec_id"),
        transform(col("embedding"), x => x * lit(2.0f)).as("embedding"))
    Similarity.embeddingNearDup(
      emb.unionByName(planted), "vec_id", "embedding", threshold = 0.99, tables = 8, bits = 8)
      .select(col("id1"), col("id2"), round(col("sim"), 6).as("sim"))
      .orderBy("id1", "id2")
  }

  private def qAnnLsh(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.lshTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 3)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** Header-level image sniffing over every (non-image) corpus payload:
    * the oracle pins the no-false-positive contract — text bytes must never
    * sniff as PNG/JPEG/GIF/BMP headers. The positive parse vectors (real
    * headers, all four formats, truncation) are pinned in MultimodalSpec. */
  private def qImageMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"), image_meta(col("payload")).as("m"))
      .select(col("doc_id"), col("m.format").as("format"),
        col("m.width").as("width"), col("m.height").as("height"))
      .orderBy("doc_id")

  /** Association rules over the co-purchase pairs: confidence and lift from
    * the pair supports and broadcast per-item counts — the full
    * market-basket readout (support / confidence / lift) without ever
    * materializing more than the pair table. */
  private def qAssocRules(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey"))
    // max-basket guard: a pathological hot basket would go quadratic in the
    // pair self-join; this schema's baskets have <= 7 lines, so the cap is
    // inert here and exists as the 100x-scale safety (RelationalSpec plants
    // a 10k-line basket against it)
    val baskets = Relational.capGroupSize(li.distinct(), Seq("l_orderkey"), maxRows = 1000)
    val n = baskets.select(count_distinct(col("l_orderkey")).as("__n"))
    val itemCounts = baskets.groupBy(col("l_partkey")).agg(count(lit(1)).as("__cnt"))
    val pairs = baskets
      .join(baskets.select(col("l_orderkey"), col("l_partkey").as("l_partkey2")), Seq("l_orderkey"))
      .filter(col("l_partkey") < col("l_partkey2"))
      .groupBy(col("l_partkey"), col("l_partkey2"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 3)
    pairs
      .join(broadcast(itemCounts.withColumnRenamed("__cnt", "__ca")), Seq("l_partkey"))
      .join(
        broadcast(itemCounts
          .withColumnRenamed("l_partkey", "l_partkey2")
          .withColumnRenamed("__cnt", "__cb")),
        Seq("l_partkey2"))
      .crossJoin(broadcast(n))
      .select(
        col("l_partkey"), col("l_partkey2"), col("support"),
        round(col("support").cast("double") / col("__ca"), 6).as("confidence"),
        round(
          col("support").cast("double") * col("__n") /
            (col("__ca").cast("double") * col("__cb")), 6).as("lift"))
      .orderBy(col("support").desc, col("l_partkey").asc, col("l_partkey2").asc)
      .limit(50)
  }

  /** TPC-H Q12-shaped shipping-priority split: one pass over lineitem with
    * pushed-down OR predicates, conditional sums per priority class — the
    * canonical CASE-inside-aggregate shape. */
  private def qTpchQ12(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(
        col("l_shipdate") >= lit("1995-01-01").cast("timestamp") &&
          col("l_shipdate") < lit("1996-01-01").cast("timestamp") &&
          (col("l_returnflag") === "A" || col("l_returnflag") === "R"))
    li.join(Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("l_returnflag"))
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("high_line_count"),
        sum(when(!col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L))
          .as("low_line_count"))
      .orderBy("l_returnflag")
  }

  /** Chi-square independence test between order status and priority. */
  private def qChiSquare(s: SparkSession, d: String): DataFrame =
    Sketches.chiSquare(Tables.orders(s, d), "o_orderstatus", "o_orderpriority")
      .select(
        col("n"), col("n_cells"), col("dof"),
        round(col("chi2"), 6).as("chi2"),
        round(col("cramers_v"), 6).as("cramers_v"))

  /** G-test of independence (X224): X65's contingency machinery with the
    * log-likelihood-ratio statistic — exact-integer products into ln,
    * 1e-9-quantized terms. */
  private def qGTest(s: SparkSession, d: String): DataFrame =
    Sketches.gTest(Tables.orders(s, d), "o_orderstatus", "o_orderpriority")
      .select(col("n"), col("n_cells"), col("dof"), round(col("g"), 6).as("g"))

  /** STREAMING G-test monitor (S36): the contingency cells accumulate in
    * the state store (complete mode, state bounded by |A|·|B|); the
    * marginal windows + quantized-term assembly run in batch off the
    * sink. Integer state ⇒ stream == batch bit-exactly; shares
    * q_g_test's oracle verbatim. */
  private def qGTestStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
    val name = "graft_gtest_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .filter(col("o_orderstatus").isNotNull && col("o_orderpriority").isNotNull)
        .groupBy(col("o_orderstatus").as("__a"), col("o_orderpriority").as("__b"))
        .agg(count(lit(1)).as("__o"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Sketches.gTestFromCells(s.table(name))
      .select(col("n"), col("n_cells"), col("dof"), round(col("g"), 6).as("g"))
  }

  /** Two-proportion z-test (X225): click-vs-view "conversion" (value > 50)
    * — four exact counters in one partial agg, fixed IEEE assembly. */
  private def qTwoProportion(s: SparkSession, d: String): DataFrame =
    Sketches.twoProportionZ(
      Tables.events(s, d).withColumn("__succ", col("value") > 50.0),
      "event_type", "__succ", a = "click", b = "view")
      .select(
        col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
        round(col("p_pooled"), 6).as("p_pooled"), round(col("z"), 6).as("z"),
        col("reject_95"), col("reject_99"))

  /** STREAMING two-proportion monitor (S34): the live experiment dashboard
    * — the four exact counters accumulate as a GLOBAL streaming aggregate
    * in the state store (complete mode); the z assembly runs in batch off
    * the sink. Integer state ⇒ stream == batch bit-exactly; shares
    * q_two_proportion's oracle verbatim. */
  private def qTwoProportionStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_two_proportion_stream"
    def cnt(g: String, pred: Column) =
      sum(when(col("event_type") === g && pred, 1L).otherwise(0L))
    withStatePartitions(s, 8) {
      val q = stream
        .filter(col("event_type").isin("click", "view"))
        .withColumn("__succ", col("value") > 50.0)
        .groupBy()
        .agg(
          cnt("click", lit(true)).as("n_a"),
          cnt("click", col("__succ")).as("x_a"),
          cnt("view", lit(true)).as("n_b"),
          cnt("view", col("__succ")).as("x_b"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Sketches.twoProportionAssemble(s.table(name))
      .select(
        col("n_a"), col("x_a"), col("n_b"), col("x_b"),
        round(col("p_a"), 6).as("p_a"), round(col("p_b"), 6).as("p_b"),
        round(col("p_pooled"), 6).as("p_pooled"), round(col("z"), 6).as("z"),
        col("reject_95"), col("reject_99"))
  }

  /** Croston intermittent-demand forecast (X227): rare events (value > 95)
    * counted per day over each key's full calendar spine (leading /
    * trailing zero periods included — bounds come from ALL events), then
    * the demand-event-only EWMA recursion. */
  private def qCroston(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val daily = ev.filter(col("value") > 95.0)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(count(lit(1)).as("x"))
    val spine = ev.groupBy(col("event_type"))
      .agg(min(col("ts").cast("date")).as("__lo"), max(col("ts").cast("date")).as("__hi"))
      .select(col("event_type"),
        explode(sequence(col("__lo"), col("__hi"), expr("INTERVAL 1 DAY"))).as("day"))
    val series = spine.join(daily, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    Temporal.crostonForecast(series, Seq("event_type"), "day", "x", alpha = 0.3)
      .orderBy("event_type")
  }

  /** Market-basket co-occurrence: part pairs sharing an order, top-50 by
    * support. One self-join on the order key (co-partitioned equi-join),
    * pair counts via partial agg, global top-50 through TakeOrdered. */
  private def qCopurchase(s: SparkSession, d: String): DataFrame = {
    // same max-basket guard as q_assoc_rules (inert at <= 7 lines/basket)
    val li = Relational.capGroupSize(
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
      Seq("l_orderkey"), maxRows = 1000)
    val pairs = li
      .join(li.select(col("l_orderkey"), col("l_partkey").as("l_partkey2")), Seq("l_orderkey"))
      .filter(col("l_partkey") < col("l_partkey2"))
    pairs
      .groupBy(col("l_partkey"), col("l_partkey2"))
      .agg(count(lit(1)).as("support"))
      .orderBy(col("support").desc, col("l_partkey").asc, col("l_partkey2").asc)
      .limit(50)
  }

  /** Fixed-iteration PageRank over the co-purchase graph (parts linked by
    * shared orders, support >= 3, symmetrized), hash-gated: the
    * quantized-long contribution sums and per-iteration 1e-9 rank
    * quantization make every iteration bit-reproducible, so a DuckDB
    * oracle replays all 5 iterations exactly. Ranks output un-rounded —
    * they are already exact quantization products, identical bits on both
    * engines. */
  private def qPageRank(s: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = baskets
      .join(baskets.select(col("l_orderkey"), col("l_partkey").as("p2")), Seq("l_orderkey"))
      .filter(col("l_partkey") < col("p2"))
      .groupBy(col("l_partkey"), col("p2"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 3)
    val edges = pairs.select(col("l_partkey").as("u"), col("p2").as("v"))
      .unionByName(pairs.select(col("p2").as("u"), col("l_partkey").as("v")))
    Graph.pageRank(edges, "u", "v", iterations = 5)
      .select(col("id").as("part_key"), col("rank"))
      .orderBy("part_key")
  }

  /** Personalized PageRank (X226): proximity-to-seed ranking on the same
    * co-purchase graph as q_pagerank, seeded by every 10th part key —
    * rank decays with distance from the seed set, unreachable parts 0. */
  private def qPersonalizedPageRank(s: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = baskets
      .join(baskets.select(col("l_orderkey"), col("l_partkey").as("p2")), Seq("l_orderkey"))
      .filter(col("l_partkey") < col("p2"))
      .groupBy(col("l_partkey"), col("p2"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 3)
    val edges = pairs.select(col("l_partkey").as("u"), col("p2").as("v"))
      .unionByName(pairs.select(col("p2").as("u"), col("l_partkey").as("v")))
    val seeds = Tables.part(s, d).select(col("p_partkey"))
      .filter(col("p_partkey") % 10 === 0)
    Graph.personalizedPageRank(edges, "u", "v", seeds, "p_partkey", iterations = 5)
      .select(col("id").as("part_key"), col("rank"))
      .orderBy("part_key")
  }

  /** 3-truss of the support>=2 co-purchase graph — the edge-cohesion core
    * (every surviving edge closes a triangle), 4 unrolled peel rounds. */
  private def qKtruss(s: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = baskets
      .join(baskets.select(col("l_orderkey"), col("l_partkey").as("p2")),
        Seq("l_orderkey"))
      .filter(col("l_partkey") < col("p2"))
      .groupBy(col("l_partkey"), col("p2"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
    Graph.kTruss(pairs, "l_partkey", "p2", k = 3, rounds = 4)
      .orderBy("a", "b")
  }

  /** Degree assortativity of the support>=2 co-purchase graph — do popular
    * parts co-sell with popular parts? One exact-moment aggregate. */
  private def qAssortativity(s: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = baskets
      .join(baskets.select(col("l_orderkey"), col("l_partkey").as("p2")),
        Seq("l_orderkey"))
      .filter(col("l_partkey") < col("p2"))
      .groupBy(col("l_partkey"), col("p2"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
    Graph.assortativity(pairs, "l_partkey", "p2")
  }

  /** Adamic–Adar / Jaccard / common-neighbor link prediction on the
    * support>=2 co-purchase graph — which part pairs are "missing edges". */
  private def qLinkPredict(s: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = baskets
      .join(baskets.select(col("l_orderkey"), col("l_partkey").as("p2")),
        Seq("l_orderkey"))
      .filter(col("l_partkey") < col("p2"))
      .groupBy(col("l_partkey"), col("p2"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 2)
      .select(col("l_partkey").as("pu"), col("p2").as("pv"))
    // adamic_adar is spec-pinned, not hashed: JVM/libm ln differ by 1 ulp
    // on real degrees and can flip the term quantization (seen sf0.001)
    Graph.linkPrediction(pairs, "pu", "pv", maxDegree = 200L, minCommon = 2L)
      .select(col("u"), col("v"), col("common_neighbors"), col("jaccard"),
        col("resource_alloc"))
      .orderBy("u", "v")
  }

  /** HITS on the bipartite customer→part purchase graph: hub customers
    * (broad buyers) and authority parts (bought by the big hubs), 3
    * max-normalized quantized iterations replayed by a chained-CTE oracle. */
  private def qHits(s: SparkSession, d: String): DataFrame = {
    val e = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
      .join(Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")),
        col("o_orderkey") === col("l_orderkey"))
      .select(
        concat(lit("c"), col("o_custkey").cast("string")).as("u"),
        concat(lit("p"), col("l_partkey").cast("string")).as("v"))
    Graph.hits(e, "u", "v", iterations = 3).orderBy("node")
  }

  /** Deterministic label-propagation communities over the support>=3
    * co-purchase graph, 4 synchronous sweeps — every round replayed
    * exactly by the chained-CTE oracle. */
  private def qLabelProp(s: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = baskets
      .join(baskets.select(col("l_orderkey"), col("l_partkey").as("p2")), Seq("l_orderkey"))
      .filter(col("l_partkey") < col("p2"))
      .groupBy(col("l_partkey"), col("p2"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 3)
    Graph.labelPropagation(pairs, "l_partkey", "p2", rounds = 4)
      .orderBy("node")
  }

  /** Newman modularity of the 4-sweep label-propagation communities on the
    * co-purchase graph — exact-rational score, one output row. */
  private def qModularity(s: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = baskets
      .join(baskets.select(col("l_orderkey"), col("l_partkey").as("p2")), Seq("l_orderkey"))
      .filter(col("l_partkey") < col("p2"))
      .groupBy(col("l_partkey"), col("p2"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 3)
    val comms = Graph.labelPropagation(pairs, "l_partkey", "p2", rounds = 4)
    Graph.modularity(pairs, comms, "l_partkey", "p2", "node", "community")
  }

  /** Multi-source BFS over the support>=3 co-purchase graph: hop distance
    * from the 5 smallest part keys, bounded at 3 hops — the k-hop
    * proximity feature, replayed by a depth-capped recursive CTE. */
  private def qBfsHops(s: SparkSession, d: String): DataFrame = {
    val baskets = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct()
    val pairs = baskets
      .join(baskets.select(col("l_orderkey"), col("l_partkey").as("p2")), Seq("l_orderkey"))
      .filter(col("l_partkey") < col("p2"))
      .groupBy(col("l_partkey"), col("p2"))
      .agg(count(lit(1)).as("sup"))
      .filter(col("sup") >= 3)
      .select(col("l_partkey").as("u"), col("p2").as("v"))
      // seeds AND edges read the pair aggregate — materialize it once
      .localCheckpoint(true)
    val seeds = pairs.select(col("u")).union(pairs.select(col("v")))
      .distinct().orderBy("u").limit(5)
    Graph.bfsHops(pairs, "u", "v", seeds, "u", maxHops = 3)
      .select(col("id").as("part_key"), col("hops"))
      .orderBy("part_key")
  }

  /** Value-ordered label encoding of order priority onto every order row —
    * the code table built without a single-partition window, broadcast
    * back. */
  private def qLabelEncode(s: SparkSession, d: String): DataFrame =
    Relational.labelEncode(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_orderpriority")),
      "o_orderpriority")
      .select(col("o_orderkey"), col("o_orderpriority"), col("code"))
      .orderBy("o_orderkey")

  /** Smoothed target encoding of order priority against cent-quantized
    * total price (m-estimate prior toward the global mean). */
  private def qTargetEncode(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderpriority"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("y"))
    Relational.targetEncode(o, "o_orderpriority", "y", smoothing = 20)
      .orderBy("o_orderpriority")
  }

  /** Out-of-fold target encoding (X244): the leakage-controlled
    * (priority, fold) encoding map over 5 md5 folds of o_orderkey. */
  private def qTargetEncodeOof(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderpriority"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("y"))
    Relational.targetEncodeOof(o, "o_orderpriority", "y", "o_orderkey",
        folds = 5, smoothing = 20)
      .orderBy("o_orderpriority", "fold")
  }

  /** Nested-struct flattening on an in-plan nested view of orders (two
    * levels deep); the oracle is the equivalent flat projection. */
  private def qFlattenStructs(s: SparkSession, d: String): DataFrame = {
    val nested = Tables.orders(s, d).select(
      col("o_orderkey"),
      struct(
        col("o_orderstatus").as("status"),
        struct(
          col("o_totalprice").as("price"),
          col("o_orderpriority").as("priority")).as("detail")).as("info"))
    Relational.flattenStructs(nested).orderBy("o_orderkey")
  }

  /** The LLM-data preparation pipeline end-to-end as ONE declarative plan:
    * exact dedup (keep the lowest doc id per normalized content key) →
    * token-count quality gate → overlapping chunking → per-document chunk
    * accounting. Four stages, one Catalyst plan — filters and the dedup
    * aggregate all fuse ahead of the chunk explode, the plan-level
    * equivalent of the reference pipeline's staged files. */
  private def qLlmPipeline(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    // stage 1: exact dedup, keep-lowest-id representative
    val keepIds = docs
      .groupBy(md5(to_binary(lower(trim(col("text"))), lit("utf-8"))).as("__key"))
      .agg(min(col("doc_id")).as("doc_id"))
      .select("doc_id")
    val surviving = docs.join(keepIds, Seq("doc_id"), "left_semi")
    // stage 2: cheap quality gate on whitespace token count
    val gated = surviving.filter(
      size(regexp_extract_all(col("text"), lit("\\S+"), lit(0))).between(20, 2000))
    // stage 3 + 4: overlapping chunks, per-doc accounting
    TextAnalysis.chunkText(gated, "doc_id", "text", size = 80, overlap = 20)
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_chunks"),
        sum(length(col("chunk_text"))).as("total_chunk_chars"))
      .orderBy("doc_id")
  }

  /** Benford first-digit audit of the order prices. */
  private def qBenford(s: SparkSession, d: String): DataFrame =
    Quality.benford(Tables.orders(s, d), "o_totalprice")
      .select(
        col("digit"), col("n"),
        round(col("observed_pct"), 6).as("observed_pct"),
        round(col("expected_pct"), 6).as("expected_pct"),
        round(col("deviation"), 6).as("deviation"))
      .orderBy("digit")

  /** Mojibake repair round trip on REAL corpus text: every document is
    * mangled in-plan the way broken pipelines do it (UTF-8 bytes re-decoded
    * as latin-1), then repaired; the oracle is the identity, so the hash
    * match proves exact repair across every non-ASCII character in the
    * corpus AND no false rewrites of clean text. Repair vectors (cp1252
    * smart quotes, double encoding) are pinned in FunctionsSpec. */
  private def qFixMojibake(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("__mangled", decode(encode(col("text"), "UTF-8"), "ISO-8859-1"))
      .select(col("doc_id"), fix_mojibake(col("__mangled")).as("text_fixed"))
      .orderBy("doc_id")

  /** Rolling 7-day distinct users per event type via HLL sketch MERGES over
    * the daily sketch cube — lgK = 18 keeps every daily sketch AND every
    * 7-day union in exact coupon-set mode at the gate scale factors, so the
    * readout equals a windowed COUNT(DISTINCT) and the driver hash-gates it
    * against a correlated-subquery SQL oracle. Production callers keep
    * lgK = 12; SketchesSpec pins that regime's merge-vs-exact error. */
  private def qRollingDistinct(s: SparkSession, d: String): DataFrame = {
    val cube = Sketches.sketchCube(
      Tables.events(s, d)
        .select(col("event_type"), col("ts").cast("date").as("day"), col("user_id")),
      Seq("event_type", "day"), "user_id", lgK = 18)
    Sketches.rollingSketchDistinct(cube, "day", Seq("event_type"), days = 7)
      .select(
        col("event_type"), col("day"), col("n_rows"), col("approx_distinct_rolling"))
      .orderBy("event_type", "day")
  }

  /** Streaming twin of [[qRollingDistinct]]: the per-(event_type, day) HLL
    * cube maintained by a STREAMING aggregate — sketch registers merge
    * across micro-batches in the state store — then the same batch
    * RANGE-window merge readout over the streamed cube. HLL updates and
    * register-max merges are deterministic and order-independent, so the
    * streamed cube equals the batch cube exactly (StreamingSpec pins
    * stream-vs-batch equality row for row). */
  private def qRollingDistinctStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = eventsStream(s, d)
    val name = "graft_rolling_distinct_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .select(
          col("event_type"),
          col("ts").cast("timestamp").cast("date").as("day"),
          col("user_id"))
        .groupBy(col("event_type"), col("day"))
        .agg(
          hll_sketch_agg(col("user_id"), lit(18)).as("hll"),
          count(lit(1)).as("n_rows"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Sketches.rollingSketchDistinct(s.table(name), "day", Seq("event_type"), days = 7)
      .select(
        col("event_type"), col("day"), col("n_rows"), col("approx_distinct_rolling"))
      .orderBy("event_type", "day")
  }

  /** Trailing-window z-score anomaly flags over the event metric stream,
    * hash-gated: the quantized-long window sums make mean/stddev divisions
    * bit-reproducible cross-engine (the corrMatrix recipe applied to a
    * window), so even the boolean outlier flags match exactly. */
  private def qRollingZscore(s: SparkSession, d: String): DataFrame =
    Temporal.rollingZScore(
      Tables.events(s, d).select(col("event_id"), col("event_type"), col("ts"), col("value")),
      Seq("event_type"), Seq("ts", "event_id"), "value")
      .select(
        col("event_id"), col("event_type"), col("n_window"),
        round(col("z"), 6).as("z"), col("is_outlier"))
      .orderBy("event_id")

  /** Multi-format timestamp coercion, hash-gated: order dates rendered
    * in-plan into three messy formats by key (ISO, US slash, compact) plus
    * a planted garbage bucket, then coerced back through the try-parse
    * chain — the recovered timestamps must equal the originals and the
    * garbage must come back null. */
  private def qCoerceTimestamps(s: SparkSession, d: String): DataFrame = {
    val messy = Tables.orders(s, d).select(
      col("o_orderkey"),
      when(col("o_orderkey") % 4 === 0, date_format(col("o_orderdate"), "yyyy-MM-dd HH:mm:ss"))
        .when(col("o_orderkey") % 4 === 1, date_format(col("o_orderdate"), "MM/dd/yyyy"))
        .when(col("o_orderkey") % 4 === 2, date_format(col("o_orderdate"), "yyyyMMdd"))
        .otherwise(lit("not a date")).as("raw"))
    Relational.coerceTimestamps(
      messy, "raw", Seq("yyyy-MM-dd HH:mm:ss", "MM/dd/yyyy", "yyyyMMdd"))
      .select(col("o_orderkey"), col("raw"), unix_micros(col("ts_parsed")).as("parsed_us"))
      .orderBy("o_orderkey")
  }

  /** Winsorized order totals: clamp into the [p01, p99] band (thresholds
    * 4dp-rounded on both engines — the equi-depth edge recipe). */
  private def qWinsorize(s: SparkSession, d: String): DataFrame =
    Sketches.winsorize(
      Tables.orders(s, d).select(col("o_orderkey"), col("o_totalprice")),
      "o_totalprice", lo = 0.01, hi = 0.99)
      .select(col("o_orderkey"), col("o_totalprice"), round(col("winsorized"), 2).as("winsorized"))
      .orderBy("o_orderkey")

  /** PSI distribution drift of the order price between the first and second
    * half of the order history — per-bin drift terms, exact counts. */
  private def qPsiDrift(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val split = lit("1996-07-01").cast("timestamp")
    Sketches.psi(
      ord.filter(col("o_orderdate") < split),
      ord.filter(col("o_orderdate") >= split),
      "o_totalprice", nBins = 10)
      .select(
        col("bin"), col("n_base"), col("n_cur"),
        round(col("base_pct"), 6).as("base_pct"),
        round(col("cur_pct"), 6).as("cur_pct"),
        round(col("psi_term"), 6).as("psi_term"))
      .orderBy("bin")
  }

  /** Jensen–Shannon drift over the same 1996-H1/H2 order-price split as
    * q_psi_drift: bounded symmetric divergence terms per bin, no eps
    * floor — the zero-count bins contribute exactly 0. */
  private def qJsDrift(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val split = lit("1996-07-01").cast("timestamp")
    Sketches.jsDivergence(
        ord.filter(col("o_orderdate") < split),
        ord.filter(col("o_orderdate") >= split),
        "o_totalprice", nBins = 10)
      .select(col("bin"), col("n_base"), col("n_cur"),
        round(col("js_term"), 9).as("js_term"))
      .orderBy("bin")
  }

  /** Hellinger drift (X284): the q_js_drift split scored with the third
    * bounded drift metric — per-bin squared-Hellinger terms. */
  private def qHellingerDrift(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val split = lit("1996-07-01").cast("timestamp")
    Sketches.hellinger(
        ord.filter(col("o_orderdate") < split),
        ord.filter(col("o_orderdate") >= split),
        "o_totalprice", nBins = 10)
      .select(col("bin"), col("n_base"), col("n_cur"),
        round(col("h2_term"), 9).as("h2_term"))
      .orderBy("bin")
  }

  /** Per-node triangle counts over the part co-occurrence graph (parts
    * sharing an order, H1'96): degree-ordered orientation in Spark, plain
    * a&lt;b orientation in the oracle — the triangle SET is
    * orientation-invariant, so both count each triangle exactly once. */
  private def qTriangles(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("k"), col("l_partkey"))
    val pairs = li.select(col("k"), col("l_partkey").as("pa"))
      .join(li.select(col("k"), col("l_partkey").as("pb")), "k")
      .filter(col("pa") =!= col("pb"))
    Graph.triangleCounts(pairs, "pa", "pb").orderBy("node")
  }

  /** Golden-record survivorship per user: most-frequent non-null value per
    * attribute, ties lexicographic — the entity-consolidation finish. */
  private def qGoldenRecord(s: SparkSession, d: String): DataFrame =
    Relational.goldenRecord(Tables.events(s, d), Seq("user_id"), Seq("event_type", "props"))
      .orderBy("user_id")

  /** The STREAMING survivorship twin: the unpivot+count half of
    * goldenRecord runs as a complete-mode aggregate (counts in the state
    * store), the winner-pick/reassembly finishes in batch off the sink;
    * exact counts make stream == batch against the same oracle. */
  private def qGoldenRecordStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_golden_record_stream"
    withStatePartitions(s, 8) {
      val q = Relational
        .goldenUnpivotCounts(stream, Seq("user_id"), Seq("event_type", "props"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Relational.goldenFinish(s.table(name), Seq("user_id"), Seq("event_type", "props"))
      .orderBy("user_id")
  }

  /** The STREAMING PSI drift monitor: the current window arrives as a
    * stream, bins against the STATIC baseline's broadcast bounds, and its
    * per-bin counts accumulate in the state store (complete mode); the
    * PSI terms assemble in batch off the sink. Counts are exact integers,
    * so stream == batch against the identical oracle. */
  private def qPsiDriftStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val split = lit("1996-07-01").cast("timestamp")
    val baseline = Tables.orders(s, d).filter(col("o_orderdate") < split)
    val bounds = Sketches.psiBounds(baseline, "o_totalprice", nBins = 10)
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
      .filter(col("o_orderdate") >= split)
    val name = "graft_psi_drift_stream"
    withStatePartitions(s, 8) {
      val q = Sketches.psiBinCounts(stream, bounds, "o_totalprice", nBins = 10, as = "n_cur")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Sketches.psiAssemble(
      Sketches.psiBinCounts(baseline, bounds, "o_totalprice", nBins = 10, as = "n_base"),
      s.table(name))
      .select(
        col("bin"), col("n_base"), col("n_cur"),
        round(col("base_pct"), 6).as("base_pct"),
        round(col("cur_pct"), 6).as("cur_pct"),
        round(col("psi_term"), 6).as("psi_term"))
      .orderBy("bin")
  }

  /** STREAMING Jensen–Shannon drift twin: the current side's bin counts
    * accumulate in the state store against the static baseline bounds
    * (exactly the q_psi_drift_stream shape), the JSD assembly runs in
    * batch off the sink — integer bin counts make stream == batch exact,
    * so the shared oracle gates it. */
  private def qJsDriftStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val split = lit("1996-07-01").cast("timestamp")
    val baseline = Tables.orders(s, d).filter(col("o_orderdate") < split)
    val bounds = Sketches.psiBounds(baseline, "o_totalprice", nBins = 10)
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
      .filter(col("o_orderdate") >= split)
    val name = "graft_js_drift_stream"
    withStatePartitions(s, 8) {
      val q = Sketches.psiBinCounts(stream, bounds, "o_totalprice", nBins = 10, as = "n_cur")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Sketches.jsAssemble(
        Sketches.psiBinCounts(baseline, bounds, "o_totalprice", nBins = 10, as = "n_base"),
        s.table(name))
      .select(col("bin"), col("n_base"), col("n_cur"),
        round(col("js_term"), 9).as("js_term"))
      .orderBy("bin")
  }

  /** STREAMING Hellinger drift twin (S45): completes the bounded drift
    * family's streaming side (S19 PSI, S26 JS) — current-side bin counts
    * accumulate in the state store against the static baseline bounds;
    * the H² assembly runs in batch off the sink. STATE CONTRACT: exactly
    * nBins rows — BOUNDED BY THE BIN DOMAIN, not the stream (the
    * contrast to S38/S40's per-document state the r9 verdict flagged).
    * Integer bin counts ⇒ stream == batch exact, shared oracle. */
  private def qHellingerDriftStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val split = lit("1996-07-01").cast("timestamp")
    val baseline = Tables.orders(s, d).filter(col("o_orderdate") < split)
    val bounds = Sketches.psiBounds(baseline, "o_totalprice", nBins = 10)
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
      .filter(col("o_orderdate") >= split)
    val name = "graft_hellinger_drift_stream"
    withStatePartitions(s, 8) {
      val q = Sketches.psiBinCounts(stream, bounds, "o_totalprice", nBins = 10, as = "n_cur")
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Sketches.hellingerAssemble(
        Sketches.psiBinCounts(baseline, bounds, "o_totalprice", nBins = 10, as = "n_base"),
        s.table(name))
      .select(col("bin"), col("n_base"), col("n_cur"),
        round(col("h2_term"), 9).as("h2_term"))
      .orderBy("bin")
  }

  /** Unicode script profile per document: per-script character counts over
    * fixed BMP codepoint ranges + dominant script — the script split that
    * gates a multilingual corpus before within-script language ID. */
  private def qScriptDetect(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d).select(
      Seq(col("doc_id")) ++
        TextAnalysis.scriptCounts(col("text")).map { case (n, c) => c.as(n) } :+
        TextAnalysis.dominantScript(col("text")).as("dominant_script"): _*)
      .orderBy("doc_id")

  /** Int8 scalar-quantized ANN with exact rerank — rows-only by design
    * (quantized shortlisting is engine-specific); SimilaritySpec pins
    * recall against brute force. */
  /** SQ8 quantized ANN, oracle-hash-gated against exact brute force: at
    * rerank = 32 the int8 shortlist provably contains the true top-3 on
    * this corpus (the oracle asserts equality pair-for-pair), and the float
    * rerank restores exact ranking. The quantization-error/recall tradeoff
    * at narrower shortlists stays pinned in SimilaritySpec. */
  private def qAnnQuantized(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.quantizedTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding", k = 3,
      rerank = 32)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** Product-quantization ANN (X269): 4×16-codeword sample codebook, ADC
    * lookup-table scoring, exact rerank — at rerank·k = 120 the shortlist
    * provably contains the true top-3, so the gate equals brute force
    * (the SQ8 gate regime). */
  private def qAnnPq(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Similarity.pqTopK(emb, emb.filter(col("vec_id") < 8), "vec_id", "embedding",
      k = 3, m = 4, codes = 16, rerank = 40)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  // -------------------------------------------------------- text analysis

  private def qLangId(s: SparkSession, d: String): DataFrame = {
    val scores = TextAnalysis.langScores(col("text"))
    Tables.documents(s, d)
      .select(
        Seq(col("doc_id")) ++
          scores.map { case (lang, c) => c.as(s"score_$lang") } :+
          TextAnalysis.langId(col("text")).as("pred_lang"): _*)
      .orderBy("doc_id")
  }

  private def qTextQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id") +: TextAnalysis.qualityFeatures(col("text")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")

  /** The fixed retrieval workload for the BM25 oracle: three queries over
    * the corpus vocabulary (one term, "strategy"/"spill", is absent from the
    * corpus and must contribute nothing). */
  private val Bm25Queries = Seq(
    "q1" -> "hash join strategy",
    "q2" -> "window sort spill",
    "q3" -> "stream batch table")

  private def qBm25TopK(s: SparkSession, d: String): DataFrame =
    TextAnalysis.bm25TopK(Tables.documents(s, d), "doc_id", "text", Bm25Queries, topK = 10)
      .orderBy("query_id", "rnk")

  /** Weighted Slope One predictions of each customer's unrated brand
    * quantities — exact-rational CF baseline over the (customer, brand)
    * quantity matrix, first 200 customers. */
  /** Markov removal-effect attribution (X239): data-driven channel credit
    * from the journey chain itself — every removal variant's absorption
    * recursion runs jointly, 20 quantized iterations. */
  private def qMarkovAttribution(s: SparkSession, d: String): DataFrame =
    Funnel.markovAttribution(
      Tables.events(s, d), "user_id", "ts", "event_type",
      convChannel = "purchase", tiebreakCols = Seq("event_id"))
      .select(
        col("channel"),
        round(col("conv_prob_base"), 6).as("conv_prob_base"),
        round(col("conv_prob_without"), 6).as("conv_prob_without"),
        round(col("removal_effect"), 6).as("removal_effect"),
        round(col("share"), 6).as("share"))
      .orderBy("channel")

  /** Shapley channel attribution (X285): exact cooperative-game credit
    * over the 4-channel touch-set coalitions (2⁴ subsets), beside X239's
    * Markov removal effect — integer factorial weights, one division. */
  private def qShapleyAttribution(s: SparkSession, d: String): DataFrame =
    Funnel.shapleyAttribution(
      Tables.events(s, d), "user_id", "ts", "event_type",
      convChannel = "purchase")
      .orderBy("channel")

  /** Survey raking / IPF (X238): calibrate (priority × status) order
    * counts to uniform priority margins and a 2:2:1 status margin. */
  private def qIpfRake(s: SparkSession, d: String): DataFrame =
    Sketches.rake(
      Tables.orders(s, d), "o_orderpriority", "o_orderstatus",
      rowTargets = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
        .map(_ -> 5000L),
      colTargets = Seq(("F", 10000L), ("O", 10000L), ("P", 5000L)),
      iterations = 3)
      .select(
        col("o_orderpriority"), col("o_orderstatus"), col("n_obs"),
        round(col("weight"), 6).as("weight"))
      .orderBy("o_orderpriority", "o_orderstatus")

  /** Difference-in-differences (X237): F-status orders as the "treated"
    * group, 1995-01-01 as the policy date, scaled totalprice outcome. */
  /** Multiple linear regression (X248): order price on order age and
    * account balance — exact normal-equation moments, Cramer solve. */
  private def qLinReg(s: SparkSession, d: String): DataFrame =
    Models.linearRegression(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("v", col("o_totalprice") / 100000.0)
        .withColumn("x1",
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("double") / 2500.0)
        .withColumn("x2", col("c_acctbal") / 10000.0),
      "v", Seq("x1", "x2"))
      .select(col("n"), round(col("beta0"), 6).as("beta0"),
        round(col("beta1"), 6).as("beta1"), round(col("beta2"), 6).as("beta2"),
        round(col("r2"), 6).as("r2"))

  /** Ridge regression (X249): the q_linreg design with λ=1 on the slope
    * diagonal — shrunk coefficients, honest quadratic-form SSE. */
  private def qRidge(s: SparkSession, d: String): DataFrame =
    Models.ridgeRegression(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("v", col("o_totalprice") / 100000.0)
        .withColumn("x1",
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("double") / 2500.0)
        .withColumn("x2", col("c_acctbal") / 10000.0),
      "v", Seq("x1", "x2"), lambda = 1.0)
      .select(col("n"), round(col("beta0"), 6).as("beta0"),
        round(col("beta1"), 6).as("beta1"), round(col("beta2"), 6).as("beta2"),
        round(col("r2"), 6).as("r2"))

  /** χ² keyword selection (X250): top-5 language-discriminative tokens
    * per lang by document-presence chi-square, native bounded-heap top-k. */
  private def qChi2Keywords(s: SparkSession, d: String): DataFrame =
    TextAnalysis.chi2Keywords(Tables.documents(s, d), "doc_id", "text", "lang", k = 5)
      .orderBy("lang", "rank")

  /** Cox proportional hazards (X251): hazard of reaching final status as
    * a function of scaled order price — 5 exact quantized Newton steps on
    * the Breslow partial likelihood, suffix risk sets via the two-pass
    * running sum. */
  private def qCoxPh(s: SparkSession, d: String): DataFrame =
    Models.coxPh(
      Tables.orders(s, d)
        .withColumn("t",
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("long") + 1L)
        .withColumn("ev", col("o_orderstatus") === "F")
        .withColumn("x", col("o_totalprice") / 500000.0),
      "t", "ev", "x", iterations = 5)
      .select(col("n"), col("n_events"), col("beta"),
        round(col("se"), 6).as("se"), round(col("z"), 6).as("z"))

  /** Source ablation (X254): leave-one-language-out influence on the
    * corpus mean document length — the closed-form data-valuation readout. */
  private def qSourceAblation(s: SparkSession, d: String): DataFrame =
    Quality.sourceAblation(
      Tables.documents(s, d)
        .withColumn("v", length(col("text")).cast("double") / 1000.0),
      "lang", "v")
      .orderBy("lang")

  /** Quantile regression (X255): the q_linreg design at the median —
    * robust slopes under the pinball loss, 20 exact subgradient steps. */
  private def qQuantReg(s: SparkSession, d: String): DataFrame =
    Models.quantileRegression(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("v", col("o_totalprice") / 100000.0)
        .withColumn("x1",
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("double") / 2500.0)
        .withColumn("x2", col("c_acctbal") / 10000.0),
      "v", Seq("x1", "x2"), tau = 0.5, iterations = 20, lr = 0.5)
      .select(col("n"), col("tau"), col("w0"), col("w1"), col("w2"),
        round(col("pinball"), 6).as("pinball"))

  /** STREAMING Kish readout (S44, 39th gate): the four quantized-long
    * moment sums accumulate in the state store (complete mode, ONE state
    * row) over the stream-static order⋈customer join; the fixed-chain
    * readout finishes in batch off the sink — integer state ⇒ stream ==
    * batch bit-exactly, sharing q_kish's oracle verbatim. */
  private def qKishStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
    val cust = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    val name = "graft_kish_stream"
    withStatePartitions(s, 1) {
      val y = col("o_totalprice") / 1000.0
      val w = (col("c_acctbal") + 1000.0) / 1000.0
      def q(c: Column): Column = sum(floor(c * 1e6 + 0.5).cast("long"))
      val q1 = stream.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy()
        .agg(count(lit(1)).as("n"),
          q(w).as("__sw"), q(w * y).as("__swy"),
          q(w * w).as("__sww"), q(w * y * y).as("__swyy"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q1.awaitTermination()
    }
    Sketches.kishAssemble(s.table(name))
  }

  /** Poisson regression (X264): order line counts (1..7) on scaled total
    * price + order age — 8 exact GD steps on the log link. */
  private def qPoisson(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("lines"))
    Models.poissonRegression(
      Tables.orders(s, d)
        .join(cnt, col("o_orderkey") === col("l_orderkey"))
        .withColumn("x1", col("o_totalprice") / 500000.0)
        .withColumn("x2",
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("double") / 2500.0),
      "lines", Seq("x1", "x2"), iterations = 8, lr = 0.1, maxCount = 16)
      .select(col("n"), col("w0"), col("w1"), col("w2"),
        round(col("deviance"), 6).as("deviance"),
        round(col("mean_mu"), 6).as("mean_mu"))
  }

  /** Aalen–Johansen competing risks (X265): days-to-first-shipment per
    * order, cause = that line's return flag (R → returned, else
    * fulfilled), open orders censored; one curve per order priority. */
  private def qCompetingRisks(s: SparkSession, d: String): DataFrame = {
    val firstLine = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(min(struct(col("l_shipdate"), col("l_linenumber"),
        col("l_returnflag"))).as("__f"))
      .select(col("l_orderkey"),
        col("__f.l_shipdate").as("first_ship"),
        col("__f.l_returnflag").as("flag"))
    val base = Tables.orders(s, d)
      .join(firstLine, col("o_orderkey") === col("l_orderkey"))
      .withColumn("duration",
        datediff(col("first_ship").cast("date"), col("o_orderdate").cast("date")))
      .withColumn("cause",
        when(col("o_orderstatus") === "O", 0)
          .when(col("flag") === "R", 2).otherwise(1))
    Temporal.aalenJohansen(base, "duration", "cause", Seq("o_orderpriority"))
      .orderBy("o_orderpriority", "duration")
  }

  /** STREAMING sharp-RD monitor (S41, 40th gate): the per-side quantized
    * moments accumulate in the state store (complete mode, TWO state
    * rows) over the stream-static order⋈customer join; the closed-form
    * side fits and the intercept gap finish in batch off the sink —
    * integer state ⇒ stream == batch bit-exactly, sharing q_rdd's
    * oracle verbatim. The live shape of a regression-discontinuity
    * dashboard: the cutoff effect updates as orders stream in. */
  private def qRddStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
    val cust = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    val name = "graft_rdd_stream"
    withStatePartitions(s, 1) {
      val xr = col("c_acctbal") / 1000.0 - 0.0
      def q(c: Column) = floor(c * 1e6 + 0.5).cast("decimal(38,0)")
      val q1 = stream.join(cust, col("o_custkey") === col("c_custkey"))
        .filter(abs(xr) <= 3.0)
        .select((xr >= 0).as("__above"), q(xr).as("__qx"),
          q(col("o_totalprice") / 1000.0).as("__qy"))
        .groupBy(col("__above"))
        .agg(count(lit(1)).as("n"),
          sum(col("__qx")).as("__sx0"), sum(col("__qy")).as("__sy0"),
          sum(col("__qx") * col("__qx")).as("__sxx0"),
          sum(col("__qx") * col("__qy")).as("__sxy0"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q1.awaitTermination()
    }
    Models.rdAssemble(s.table(name))
  }

  /** Chapman capture–recapture (X276): two independent 60% hash crawls
    * of the document corpus — the estimator should land near the true
    * 500-doc population. */
  private def qCaptureRecapture(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"))
    def cap(tag: String) = docs.filter(
      Sampling.hashBucket(concat(col("doc_id"), lit(tag)), 100) < 60)
    Quality.captureRecapture(cap(":capA"), cap(":capB"), "doc_id")
  }

  /** Sharp regression discontinuity (X275): order totals across the zero
    * account-balance cutoff, bandwidth 3000 — local linear both sides. */
  private def qRdd(s: SparkSession, d: String): DataFrame =
    Models.regressionDiscontinuity(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("yv", col("o_totalprice") / 1000.0)
        .withColumn("run", col("c_acctbal") / 1000.0),
      "run", "yv", cutoff = 0.0, bandwidth = 3.0)

  /** STREAMING delete-a-group jackknife (S42, 41st gate): the per-PSU
    * (count, quantized sum) pairs accumulate in the state store (complete
    * mode, one row per nation) over the stream-static order⋈customer
    * join; the leave-one-out means and the (G−1)/G deviation sum finish
    * in batch off the sink — integer state ⇒ stream == batch bit-exactly,
    * sharing q_jackknife's oracle verbatim. */
  private def qJackknifeStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
    val cust = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"), col("c_nationkey"))
    val name = "graft_jackknife_stream"
    withStatePartitions(s, 4) {
      val q1 = stream.join(cust, col("o_custkey") === col("c_custkey"))
        .withColumn("y", col("o_totalprice") / 1000.0)
        .groupBy(col("c_nationkey").as("__g"))
        .agg(count(lit(1)).as("__ng"),
          sum(floor(col("y").cast("double") * 1e6 + 0.5).cast("long")).as("__sg"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q1.awaitTermination()
    }
    Sketches.jackknifeAssemble(s.table(name))
  }

  /** CUPED (X281): a deterministic 50/50 customer-hash experiment over
    * order totals, with pre-experiment account balance as the
    * variance-reducing covariate. */
  private def qCuped(s: SparkSession, d: String): DataFrame =
    Sketches.cuped(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("tr",
          Sampling.hashBucket(concat(col("c_custkey"), lit(":exp9")), 100) < 50)
        .withColumn("y", col("o_totalprice") / 1000.0)
        .withColumn("x", col("c_acctbal") / 1000.0),
      "tr", "y", "x")

  /** STREAMING CUPED monitor (S43, 42nd gate): the pooled + per-arm
    * quantized moment sums accumulate in ONE state row over the
    * stream-static order⋈customer join; the θ/ρ²/ATE chains finish in
    * batch off the sink — integer state ⇒ stream == batch bit-exactly,
    * sharing q_cuped's oracle verbatim. The live experiment dashboard:
    * the adjusted effect updates as orders stream in. */
  private def qCupedStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
    val cust = s.read.parquet(s"$d/customer.parquet")
      .select(col("c_custkey"), col("c_acctbal"))
    val name = "graft_cuped_stream"
    withStatePartitions(s, 1) {
      val tr = Sampling.hashBucket(concat(col("c_custkey"), lit(":exp9")), 100) < 50
      val y = col("o_totalprice") / 1000.0
      val x = col("c_acctbal") / 1000.0
      val t = when(tr, 1.0).otherwise(0.0)
      def q(c: Column): Column = sum(floor(c * 1e6 + 0.5).cast("long"))
      val q1 = stream.join(cust, col("o_custkey") === col("c_custkey"))
        .groupBy()
        .agg(count(lit(1)).as("n"),
          q(x).as("__sx"), q(y).as("__sy"),
          q(x * x).as("__sxx"), q(x * y).as("__sxy"), q(y * y).as("__syy"),
          sum(when(tr, 1L).otherwise(0L)).as("n_t"),
          q(t * y).as("__syt"), q(t * x).as("__sxt"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q1.awaitTermination()
    }
    Sketches.cupedAssemble(s.table(name))
  }

  /** Herfindahl concentration (X280): supplier revenue concentration
    * within each nation — exact cent sums, one division per nation. */
  private def qHerfindahl(s: SparkSession, d: String): DataFrame =
    Sketches.herfindahl(
      Tables.lineitem(s, d)
        .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
          col("l_suppkey") === col("s_suppkey")),
      Seq("s_nationkey"), "l_suppkey", "l_extendedprice")
      .orderBy("s_nationkey")

  /** Bradley–Terry preference strengths (X279): daily event-type volume
    * contests (the busier type that day beats each quieter one) fitted
    * over 5 quantized MM rounds. */
  private def qBradleyTerry(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.events(s, d)
      .groupBy(date_trunc("day", col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    val a = cnt.select(col("day"), col("event_type").as("w"), col("c").as("cw"))
    val b = cnt.select(col("day").as("day2"), col("event_type").as("l"), col("c").as("cl"))
    val outcomes = a.join(b, col("day") === col("day2") && col("cw") > col("cl"))
      .select("w", "l")
    Models.bradleyTerry(outcomes, "w", "l", rounds = 5).orderBy("item")
  }

  /** Poisson overdispersion audit (X277): Cameron–Trivedi NB2 auxiliary
    * on the q_poisson fit — is Var = μ credible for line counts? */
  private def qPoissonDispersion(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("lines"))
    Models.poissonDispersion(
      Tables.orders(s, d)
        .join(cnt, col("o_orderkey") === col("l_orderkey"))
        .withColumn("x1", col("o_totalprice") / 500000.0)
        .withColumn("x2",
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("double") / 2500.0),
      "lines", Seq("x1", "x2"), iterations = 8, lr = 0.1)
  }

  /** Kish survey readout (X262): acctbal-derived weights over scaled
    * order totals — weighted mean, effective n, design effect, SE. */
  private def qKish(s: SparkSession, d: String): DataFrame =
    Sketches.kishWeightedMean(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("y", col("o_totalprice") / 1000.0)
        .withColumn("w", (col("c_acctbal") + 1000.0) / 1000.0),
      "y", "w")

  /** Delete-a-group jackknife (X263): SE of the mean scaled order total
    * with customer nations as the 25 survey PSUs. */
  private def qJackknife(s: SparkSession, d: String): DataFrame =
    Sketches.jackknifeGroupSe(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("y", col("o_totalprice") / 1000.0),
      "y", "c_nationkey")

  /** Portable Soundex blocking audit (X261): phonetic code of each part
    * name's first word → block sizes. Pins the whole encoder chain
    * cross-engine across the real ~90-word color vocabulary. */
  private def qSoundexBlocks(s: SparkSession, d: String): DataFrame =
    Tables.part(s, d)
      .withColumn("w", element_at(split(col("p_name"), " "), 1))
      .withColumn("code", FuzzyMatch.soundexCode(col("w")))
      .groupBy("code")
      .agg(count(lit(1)).as("parts"), countDistinct(col("w")).as("words"))
      .orderBy("code")

  /** Decision stump (X259): exact greedy split of scaled line revenue
    * over two binned candidates — quantity (1..50) and ship month
    * (1..12); quantity drives revenue, so its split must win. */
  private def qStump(s: SparkSession, d: String): DataFrame =
    Models.decisionStump(
      Tables.lineitem(s, d)
        .withColumn("v", col("l_extendedprice") / 1000.0)
        .withColumn("qty_bin", col("l_quantity").cast("long"))
        .withColumn("month_bin", month(col("l_shipdate").cast("date")).cast("long")),
      "v", Seq("qty_bin", "month_bin"))

  /** Bagged stumps (X266): three deterministic 63% hash bags on the
    * q_stump design; the ensemble MSE averages the three stump leaves. */
  private def qBaggedStumps(s: SparkSession, d: String): DataFrame =
    Models.baggedStumps(
      Tables.lineitem(s, d)
        .withColumn("v", col("l_extendedprice") / 1000.0)
        .withColumn("qty_bin", col("l_quantity").cast("long"))
        .withColumn("month_bin", month(col("l_shipdate").cast("date")).cast("long"))
        .withColumn("rid", concat(col("l_orderkey"), lit("-"), col("l_linenumber"))),
      "v", Seq("qty_bin", "month_bin"), "rid", bags = 3)
      .orderBy("bag")

  /** Gradient-boosted stumps (X260): two ν=0.5 rounds on the q_stump
    * design — round 1 must pick quantity; round 2 re-splits the residual. */
  private def qGbStumps(s: SparkSession, d: String): DataFrame =
    Models.gbStumps(
      Tables.lineitem(s, d)
        .withColumn("v", col("l_extendedprice") / 1000.0)
        .withColumn("qty_bin", col("l_quantity").cast("long"))
        .withColumn("month_bin", month(col("l_shipdate").cast("date")).cast("long")),
      "v", Seq("qty_bin", "month_bin"), rounds = 2, shrinkage = 0.5)
      .orderBy("round")

  /** Linear SVM (X256): urgent-order classification over the q_quant_reg
    * base — 20 exact hinge-subgradient steps, L2 on the slopes. */
  private def qSvm(s: SparkSession, d: String): DataFrame =
    Models.svmHinge(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("urgent",
          col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
        .withColumn("x1",
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("double") / 2500.0)
        .withColumn("x2", col("c_acctbal") / 10000.0),
      "urgent", Seq("x1", "x2"), iterations = 20, lr = 0.5, lambda = 0.01)
      .select(col("n"), col("lambda"), col("w0"), col("w1"), col("w2"),
        round(col("hinge"), 6).as("hinge"), round(col("accuracy"), 6).as("accuracy"))

  /** Multinomial Naive Bayes (X247): self-trained language classification
    * of every document — the supervised twin of the marker-word langId,
    * exact quantized log-prob sums, ties to the smallest class. */
  private def qNaiveBayes(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Models.naiveBayesClassify(docs, "doc_id", "text", docs, "lang")
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("predicted"),
        (col("predicted") === col("lang")).as("correct"))
      .orderBy("doc_id")
  }

  /** STREAMING Naive Bayes twin (S40) — model/priors fit in BATCH
    * ([[graft.operators.Models.naiveBayesFit]]) and broadcast into the
    * document stream; per-(doc, class) INTEGER score partials accumulate
    * in the state store (the one streaming aggregate), and the
    * argmax + prior readout runs in batch over the memory sink ⇒ stream
    * == batch bit-exactly, sharing q_naive_bayes's oracle verbatim (the
    * 31st end-to-end streaming gate). */
  private def qNaiveBayesStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = Tables.documents(s, d)
    val (model0, oov0, priors0, ranked0) = Models.naiveBayesFit(docs, "text", "lang")
    val model = model0.localCheckpoint(true)
    val oov = oov0.localCheckpoint(true)
    val priors = priors0.localCheckpoint(true)
    val ranked = ranked0.localCheckpoint(true)
    val raw = s.read.parquet(s"$d/documents.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val name = "graft_nb_stream"
    withStatePartitions(s, 8) {
      val q = Models.naiveBayesTokenScores(
          stream.select(col("doc_id"), col("text")), "doc_id", "text", model, oov)
        .groupBy(col("doc_id"), col("__cls"))
        .agg(sum(col("__q")).as("__sq"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Models.naiveBayesArgmax(s.table(name), "doc_id", priors, ranked)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
      .select(col("doc_id"), col("lang"), col("predicted"),
        (col("predicted") === col("lang")).as("correct"))
      .orderBy("doc_id")
  }

  /** AIPW doubly-robust ATE (X253): the q_ipw_ate design augmented with
    * per-priority stratum outcome means — consistent if either model is
    * right, influence-function SE. */
  private def qAipwAte(s: SparkSession, d: String): DataFrame =
    Models.aipwAte(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal"), col("c_nationkey")), col("o_custkey") === col("c_custkey"))
        .withColumn("treated", col("c_mktsegment") === "BUILDING")
        .withColumn("v", col("o_totalprice") / 100000.0)
        .withColumn("x1", col("c_acctbal") / 10000.0)
        .withColumn("x2", col("c_nationkey").cast("double") / 25.0),
      "treated", "v", Seq("o_orderpriority"), Seq("x1", "x2"),
      iterations = 6, lr = 0.5, clip = 0.01)
      .select(col("n_used"), col("n_dropped"),
        round(col("ate"), 6).as("ate"), round(col("se"), 6).as("se"),
        round(col("t_stat"), 6).as("t_stat"))

  /** IPW ATE (X246): effect of the BUILDING segment on order price with
    * the propensity e(x | account balance, nation) fit by 6 exact
    * quantized GD steps, clipped at [0.01, 0.99] — the model-based causal
    * estimate next to q_strat_ate's binned one. */
  private def qIpwAte(s: SparkSession, d: String): DataFrame =
    Models.ipwAte(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"),
          col("c_acctbal"), col("c_nationkey")), col("o_custkey") === col("c_custkey"))
        .withColumn("treated", col("c_mktsegment") === "BUILDING")
        .withColumn("v", col("o_totalprice") / 100000.0)
        .withColumn("x1", col("c_acctbal") / 10000.0)
        .withColumn("x2", col("c_nationkey").cast("double") / 25.0),
      "treated", "v", Seq("x1", "x2"), iterations = 6, lr = 0.5, clip = 0.01)
      .select(col("n"), col("n_treated"),
        round(col("ate_ht"), 6).as("ate_ht"),
        round(col("ate_hajek"), 6).as("ate_hajek"))

  /** Distributed logistic regression (X245): in-engine propensity fit of
    * 'F' status on scaled price + order age — 8 exact quantized GD steps,
    * the whole trajectory replayed by the oracle's unrolled CTEs. */
  private def qLogistic(s: SparkSession, d: String): DataFrame =
    Models.logisticRegression(
      Tables.orders(s, d)
        .withColumn("y", col("o_orderstatus") === "F")
        .withColumn("x1", col("o_totalprice") / 500000.0)
        .withColumn("x2",
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("double") / 2500.0),
      "y", Seq("x1", "x2"), iterations = 8, lr = 0.5)
      .select(col("n"), col("w0"), col("w1"), col("w2"),
        round(col("log_loss"), 6).as("log_loss"),
        round(col("accuracy"), 6).as("accuracy"))

  /** STREAMING conformal coverage monitor (S39) — the interval fit in
    * BATCH ([[graft.operators.Sketches.conformalFit]]: per-group means,
    * exact order-statistic q̂), then the TEST-bucket stream scores against
    * the broadcast (model, q̂) statelessly per row and two integer
    * counters (n, covered) accumulate in the state store. Integer state ⇒
    * stream == batch bit-exactly; shares q_conformal's oracle verbatim
    * (the 30th end-to-end streaming gate). The live readout is the
    * empirical coverage drifting — the production check that the
    * distribution the interval was calibrated on still holds. */
  private def qConformalStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val alpha = 0.1
    val batch = Tables.orders(s, d).withColumn("v", col("o_totalprice") / 100000.0)
    val (model0, nTrain0, nCal0, qhat0) = Sketches.conformalFit(
      batch, "o_orderkey", Seq("o_orderpriority"), "v", alpha = alpha)
    val model = model0.localCheckpoint(true)
    val nTrain = nTrain0.localCheckpoint(true)
    val nCal = nCal0.localCheckpoint(true)
    val qhat = qhat0.localCheckpoint(true)
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
    val name = "graft_conformal_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .withColumn("__b",
          conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
            .cast("long") % 10)
        .filter(col("__b") >= 8)
        .select(col("o_orderpriority"),
          (col("o_totalprice") / 100000.0).cast("double").as("__v"))
        .join(broadcast(model), Seq("o_orderpriority"))
        .withColumn("__r", abs(col("__v") - col("__yhat")))
        .join(broadcast(qhat), lit(true), "left")
        .groupBy()
        .agg(count(lit(1)).as("n_test"),
          sum(when(col("__qhat").isNull || col("__r") <= col("__qhat"), 1L)
            .otherwise(0L)).as("__cov"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name)
      .crossJoin(broadcast(nTrain)).crossJoin(broadcast(nCal))
      .join(broadcast(qhat), lit(true), "left")
      .select(col("n_train"), col("n_calib"), col("n_test"),
        lit(alpha).as("alpha"), round(col("__qhat"), 6).as("qhat"),
        round((col("__cov").cast("double") / col("n_test").cast("double")), 6)
          .as("coverage"))
  }

  /** Shared scored slice of the calibration pair (X243): per-(priority,
    * nation) 'F'-rate fit on the md5 train split (exact long-count ratio)
    * scores the held-out orders; groups absent from train drop. */
  private def calibScored(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("__bk",
        conv(substring(md5(col("o_orderkey").cast("string")), 1, 8), 16, 10)
          .cast("long") % 10)
      .withColumn("y", col("o_orderstatus") === "F")
    val model = o.filter(col("__bk") < 6)
      .groupBy(col("o_orderpriority"), col("c_nationkey"))
      .agg((sum(when(col("y"), 1L).otherwise(0L)).cast("double") /
        count(lit(1)).cast("double")).as("p"))
    o.filter(col("__bk") >= 6)
      .join(broadcast(model), Seq("o_orderpriority", "c_nationkey"))
  }

  /** Reliability diagram (X243) of the held-out 'F'-status scores. */
  private def qReliability(s: SparkSession, d: String): DataFrame =
    Sketches.reliabilityDiagram(calibScored(s, d), "p", "y", bins = 10)
      .orderBy("bin")

  /** Murphy Brier decomposition (X243) over the same scored slice. */
  private def qBrier(s: SparkSession, d: String): DataFrame =
    Sketches.brierDecomposition(calibScored(s, d), "p", "y", bins = 10)

  /** ECE/MCE (X282): the L1 calibration summary on the q_brier scored
    * hold-out — the metric LLM evals actually quote. */
  private def qCalibrationError(s: SparkSession, d: String): DataFrame =
    Sketches.calibrationError(calibScored(s, d), "p", "y", bins = 10)

  /** Split-conformal prediction intervals (X242): per-priority mean
    * price predictor, md5 hash split 6/2/2, α=0.1 — the empirical test
    * coverage must sit at or above 0.9 by the conformal theorem. */
  private def qConformal(s: SparkSession, d: String): DataFrame =
    Sketches.splitConformal(
      Tables.orders(s, d).withColumn("v", col("o_totalprice") / 100000.0),
      "o_orderkey", Seq("o_orderpriority"), "v", alpha = 0.1)
      .select(col("n_train"), col("n_calib"), col("n_test"), col("alpha"),
        round(col("qhat"), 6).as("qhat"),
        round(col("coverage"), 6).as("coverage"))

  /** Subclassification ATE (X241): effect of the BUILDING market segment
    * on order price, stratified by order priority — every stratum carries
    * both arms here, so nothing drops (the spec exercises dropping). */
  private def qStratAte(s: SparkSession, d: String): DataFrame =
    Sketches.subclassificationAte(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("treated", col("c_mktsegment") === "BUILDING")
        .withColumn("v", col("o_totalprice") / 100000.0),
      "treated", "v", Seq("o_orderpriority"))
      .select(
        col("n_strata_used"), col("n_strata_dropped"), col("n_used"), col("n_dropped"),
        round(col("ate"), 6).as("ate"),
        round(col("se"), 6).as("se"),
        round(col("t_stat"), 6).as("t_stat"))

  private def qDiffInDiff(s: SparkSession, d: String): DataFrame =
    Sketches.diffInDiff(
      Tables.orders(s, d)
        .withColumn("treated", col("o_orderstatus") === "F")
        .withColumn("post", col("o_orderdate").cast("date") >= lit("1995-01-01").cast("date"))
        .withColumn("v", col("o_totalprice") / 100000.0),
      "treated", "post", "v")
      .select(
        col("n_treated_pre"), col("n_treated_post"),
        col("n_control_pre"), col("n_control_post"),
        round(col("mean_treated_pre"), 6).as("mean_treated_pre"),
        round(col("mean_treated_post"), 6).as("mean_treated_post"),
        round(col("mean_control_pre"), 6).as("mean_control_pre"),
        round(col("mean_control_post"), 6).as("mean_control_post"),
        round(col("did"), 6).as("did"),
        round(col("se"), 6).as("se"),
        round(col("t_stat"), 6).as("t_stat"))

  /** Seasonal/trend strength (X236): the Hyndman F-statistics over the
    * weekly decomposition of daily revenue — the "which series are
    * actually seasonal?" triage feature. */
  private def qSeasonalStrength(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(
        col("o_orderdate").cast("date").as("day"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("day"))
      .agg(sum(col("cents")).as("revenue_cents"))
      .withColumn("dow",
        (datediff(col("day"), lit("1990-01-01").cast("date")) % 7).cast("int"))
    Temporal.seasonalStrength(daily, "day", "revenue_cents", "dow", period = 7)
  }

  /** Binned mutual information (X234): quantity vs extended price on an
    * 8×8 equi-width grid — the dependence Pearson sees only linearly. */
  private def qMiBinned(s: SparkSession, d: String): DataFrame =
    Sketches.mutualInfoBinned(
      Tables.lineitem(s, d), "l_quantity", "l_extendedprice", nx = 8, ny = 8)

  /** Experiment assignment + SRM audit (X233): customers hash into a
    * 1:1:2 A/B/C split; the goodness-of-fit chi2 confirms the observed
    * ratios match the declared design. */
  private def qSrmCheck(s: SparkSession, d: String): DataFrame =
    Quality.srmCheck(
      Tables.orders(s, d), "o_custkey",
      arms = Seq(("A", 1), ("B", 1), ("C", 2)), salt = "exp1")
      .select(
        col("arm"), col("weight"), col("n_observed"),
        round(col("n_expected"), 6).as("n_expected"),
        round(col("chi2"), 6).as("chi2"), col("dof"))
      .orderBy("arm")

  /** Laplace noisy-count release (X232): order counts per priority at
    * ε = 0.5 (scale-2 noise) with the deterministic hash draw the oracle
    * replays. */
  private def qNoisyCounts(s: SparkSession, d: String): DataFrame =
    Quality.noisyCounts(Tables.orders(s, d), Seq("o_orderpriority"), epsilon = 0.5)
      .orderBy("o_orderpriority")

  /** Exponential mechanism (X325): privately release the most common order
    * priority — utility = order count per priority, ε = 1, Δ = 1; the
    * Gumbel-max selection over the candidate table. */
  private def qExpMechanism(s: SparkSession, d: String): DataFrame = {
    val cands = Tables.orders(s, d)
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
    Quality.exponentialMechanism(
      cands, Seq("o_orderpriority"), "n_orders", epsilon = 1.0)
  }

  /** Cochran–Armitage trend (X231): does the high-price rate trend with
    * the order-priority severity score (the leading digit of
    * o_orderpriority)? */
  private def qCochranArmitage(s: SparkSession, d: String): DataFrame =
    Sketches.cochranArmitage(
      Tables.orders(s, d)
        .withColumn("score", substring(col("o_orderpriority"), 1, 1).cast("long"))
        .withColumn("outcome", col("o_totalprice") > 150000.0),
      "score", "outcome")
      .select(col("n_groups"), col("n"), col("x"), round(col("z"), 6).as("z"))

  /** Durbin–Watson (X230): residual-autocorrelation audit of the daily
    * revenue trend per event type — is the OLS trend line hiding serial
    * structure? */
  private def qDurbinWatson(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), col("ts").cast("date").as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
    Temporal.durbinWatson(daily, Seq("event_type"), "day", "v")
      .orderBy("event_type")
  }

  /** Fisher's exact test (X229): status-F exposure vs high-price outcome
    * per order priority — small-count exact inference with the integer
    * quantized log-factorial machinery. */
  private def qFisher(s: SparkSession, d: String): DataFrame =
    Sketches.fisherExact(
      Tables.orders(s, d)
        .withColumn("exposed", col("o_orderstatus") === "F")
        .withColumn("outcome", col("o_totalprice") > 150000.0),
      "o_orderpriority", "exposed", "outcome")
      .select(
        col("o_orderpriority"), col("a"), col("b"), col("c"), col("d"), col("n"),
        round(col("odds_ratio"), 6).as("odds_ratio"),
        round(col("p_two_sided"), 6).as("p_two_sided"))
      .orderBy("o_orderpriority")

  /** Recommendation-audit metrics (X228): top-3 parts per customer by
    * purchase count (total order n desc, part asc — the TopKRewrite turns
    * the row_number filter into the native bounded heap), audited against
    * the full purchase log for coverage/novelty/cold-item exposure. */
  private def qRecMetrics(s: SparkSession, d: String): DataFrame = {
    val raw = Tables.lineitem(s, d)
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("user_id"), col("l_partkey").as("item_id"))
    val counts = raw.groupBy(col("user_id"), col("item_id")).agg(count(lit(1)).as("n"))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("n").desc, col("item_id").asc)
    val recs = counts.withColumn("rk", row_number().over(w)).filter(col("rk") <= 3)
    Recommend.recMetrics(recs, "user_id", "item_id", raw, "user_id", "item_id")
      .select(
        col("n_recs"), col("n_rec_items"), col("catalog_size"),
        round(col("coverage"), 6).as("coverage"), col("n_cold"),
        round(col("novelty"), 6).as("novelty"))
  }

  private def qSlopeOne(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
    val o = Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey"))
    val ratings = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_custkey"), col("p_brand"))
      .agg(sum(col("l_quantity").cast("long")).as("qty"))
    Recommend.slopeOne(ratings, "o_custkey", "p_brand", "qty")
      .filter(col("o_custkey") <= 200)
      .orderBy("o_custkey", "p_brand")
  }

  /** Burrows' Delta between document sources — which sources share a
    * stylistic hand over the corpus's 30 most frequent words. */
  private def qBurrowsDelta(s: SparkSession, d: String): DataFrame =
    TextAnalysis.burrowsDelta(Tables.documents(s, d), "source", "text",
        topWords = 30)
      .orderBy("source_a", "source_b")

  /** TextRank top-50 corpus keywords — PageRank over the adjacent-word
    * co-occurrence graph, replayed by the chained-CTE rank oracle. */
  private def qTextRank(s: SparkSession, d: String): DataFrame =
    TextAnalysis.textRank(Tables.documents(s, d), "text", topK = 50)
      .orderBy("rnk")

  /** RAKE top-3 key phrases per document — stopword-boundary candidate
    * phrases scored by degree/freq word statistics. */
  private def qRake(s: SparkSession, d: String): DataFrame =
    TextAnalysis.rakeKeywords(Tables.documents(s, d), "doc_id", "text", topK = 3)
      .orderBy("doc_id", "rnk")

  /** Dirichlet query-likelihood top-10 for the shared query set — the
    * LM-retrieval twin of q_bm25_topk off the same tokenization. */
  private def qQueryLikelihood(s: SparkSession, d: String): DataFrame =
    TextAnalysis.queryLikelihoodTopK(Tables.documents(s, d), "doc_id", "text",
        Bm25Queries, topK = 10)
      .orderBy("query_id", "rnk")

  /** Incremental join-view maintenance: orders/customer each split into
    * old+delta, the view delta computed by the delta-algebra identity,
    * appended to the stored view, and the result aggregated — must equal
    * the oracle's full recompute join exactly. */
  private def qIncrementalJoin(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"), col("o_orderdate"))
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val split = lit("1997-01-01").cast("timestamp")
    val aOld = ord.filter(col("o_orderdate") < split)
    val aDelta = ord.filter(col("o_orderdate") >= split)
    val bOld = cust.filter(col("c_custkey") % 10 =!= 0)
    val bDelta = cust.filter(col("c_custkey") % 10 === 0)
    val vOld = aOld.join(bOld, col("o_custkey") === col("c_custkey"))
    val delta = Relational.incrementalJoinDelta(
      aOld, aDelta, bOld, bDelta, Seq("o_custkey" -> "c_custkey"))
    vOld.unionByName(delta)
      .groupBy(col("c_nationkey"))
      .agg(
        count(lit(1)).as("n"),
        (sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")) / 100.0).as("total"))
      .orderBy("c_nationkey")
  }

  /** Fellegi–Sunter linkage over nation-blocked customer×supplier pairs:
    * three agreement fields, literal 6-dp weights, two thresholds. */
  private def qLinkageScore(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"), col("c_acctbal"))
    val sp = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"), col("s_acctbal"))
    val pairs = c.join(broadcast(sp), col("c_nationkey") === col("s_nationkey"))
      .withColumn("agree_bal", floor(col("c_acctbal") / 1000) === floor(col("s_acctbal") / 1000))
      .withColumn("agree_sign", (col("c_acctbal") >= 0) === (col("s_acctbal") >= 0))
      .withColumn("agree_key", col("c_custkey") % 10 === col("s_suppkey") % 10)
    FuzzyMatch.linkageScore(pairs,
      Seq(
        FuzzyMatch.LinkageField("agree_bal", 0.9, 0.1),
        FuzzyMatch.LinkageField("agree_sign", 0.95, 0.5),
        FuzzyMatch.LinkageField("agree_key", 0.8, 0.1)),
      upper = 2.0, lower = 0.0)
      .select(col("c_custkey"), col("s_suppkey"), col("link_weight"), col("link_class"))
      .orderBy("c_custkey", "s_suppkey")
  }

  /** Sorted-neighborhood blocking over customers keyed by
    * (mktsegment, acctbal): every record pairs with its next 3 neighbors in
    * the global sort order — the O(n·w) candidate generator in front of
    * linkage scoring, rank-bucketed so no range join and no
    * single-partition window. */
  private def qSortedNeighborhood(s: SparkSession, d: String): DataFrame =
    FuzzyMatch.sortedNeighborhoodPairs(
      Tables.customer(s, d), "c_custkey",
      Seq("c_mktsegment", "c_acctbal"), window = 4)
      .orderBy("id1", "id2")

  /** Deflate-ratio redundancy signal per document — rows-only (zlib bytes
    * are engine-specific); ordering properties pinned in spec. */
  private def qCompressionRatio(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"), round(compression_ratio(col("text")), 6).as("deflate_ratio"))
      .orderBy("doc_id")

  private def qGopherQuality(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id") +:
        TextAnalysis.gopherQualityFlags(col("text"), minWords = 5L).map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")

  /** C4 cleaning filter (T63): the synthetic corpus carries no native
    * punctuation or newlines, so the gate synthesizes sentence ends
    * ("data" -> "data.") and 3-word lines (the q_boilerplate
    * line-synthesis recipe) before the filter — the oracle replays the
    * identical transform, then the full line+doc rule cascade. */
  private def qC4Filter(s: SparkSession, d: String): DataFrame =
    TextAnalysis.c4Filter(
      Tables.documents(s, d)
        .select(col("doc_id"),
          regexp_replace(replace(col("text"), lit("data"), lit("data.")),
            "((?:\\S+ ){2}\\S+) ", "$1\n").as("text")),
      "text")
      .select(col("doc_id"), col("clean_text"), col("n_lines_kept"),
        col("n_lines_dropped"), col("n_sentences"), col("flag_sentences"),
        col("flag_lorem"), col("flag_brace"), col("flag_blocklist"), col("keep"))
      .orderBy("doc_id")

  /** Inverted index (T65): term → (doc_freq, top-5 postings) — the gate
    * explodes the postings arrays to scalar rows under a total order so
    * the external rows-check can sort the frame. */
  private def qInvertedIndex(s: SparkSession, d: String): DataFrame =
    TextAnalysis.invertedIndex(Tables.documents(s, d), "doc_id", "text", maxPostings = 5)
      .select(col("term"), col("doc_freq"),
        posexplode(col("postings")).as(Seq("__i", "__e")))
      .select(col("term"), col("doc_freq"), (col("__i") + 1).cast("long").as("rank"),
        col("__e.doc_id").as("doc_id"), col("__e.tf").as("tf"))
      .orderBy("term", "rank")

  /** Vocabulary truncation (T64): top-30 corpus words with a count floor
    * of 2; everything else rewrites to <unk>, per-doc OOV exposure
    * reported. */
  private def qTruncateVocab(s: SparkSession, d: String): DataFrame =
    TextAnalysis.truncateVocabulary(
      Tables.documents(s, d), "doc_id", "text", maxVocab = 30, minCount = 2L)
      .orderBy("doc_id")

  /** STREAMING C4 filter (S37): the cleaning pass as a STATELESS streaming
    * projection (append mode, zero state) — the shape a crawl-ingestion
    * pipeline actually runs; pure per-row logic ⇒ stream == batch
    * trivially, shares q_c4_filter's oracle verbatim. */
  private def qC4FilterStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/documents.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val name = "graft_c4_stream"
    val prepped = stream.select(col("doc_id"),
      regexp_replace(replace(col("text"), lit("data"), lit("data.")),
        "((?:\\S+ ){2}\\S+) ", "$1\n").as("text"))
    val q = TextAnalysis.c4Filter(prepped, "text")
      .select(col("doc_id"), col("clean_text"), col("n_lines_kept"),
        col("n_lines_dropped"), col("n_sentences"), col("flag_sentences"),
        col("flag_lorem"), col("flag_brace"), col("flag_blocklist"), col("keep"))
      .writeStream.format("memory").queryName(name)
      .outputMode("append")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    s.table(name).orderBy("doc_id")
  }

  private def qTokenCount(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id") +: TextAnalysis.tokenCounts(col("text")).map { case (n, c) => c.as(n) }: _*)
      .orderBy("doc_id")

  private def qFingerprint(s: SparkSession, d: String): DataFrame =
    TextAnalysis.fingerprintSummary(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** Winnowing with the engine-portable md5 hash, oracle-hash-gated: the
    * full selection logic (k-gram explode → windowed min with leftmost
    * tie-break → distinct) replays exactly in DuckDB, so the algorithm —
    * not just row counts — is cross-engine-verified. The native
    * fast-hash twin stays rows-only in q_fingerprint. */
  private def qFingerprintWinnow(s: SparkSession, d: String): DataFrame =
    TextAnalysis.winnowFingerprints(Tables.documents(s, d), "doc_id", "text")
      .groupBy(col("doc_id"))
      .agg(
        count(lit(1)).as("n_prints"),
        min(col("print")).as("min_print"),
        max(col("print")).as("max_print"))
      .orderBy("doc_id")

  /** Corpus-level containment summary: for each doc, how many partner docs
    * share >=1 winnowing fingerprint with it, and the strongest overlap.
    * Aggregated per doc (not per pair) so the output is stable and small
    * even on a corpus with no true duplicates. Runs on the PORTABLE md5
    * winnowing prints (position bits shifted off after selection), so the
    * whole pipeline — gram hash, window selection, pair join, containment
    * summary — replays in DuckDB and hash-gates; the native rolling-hash
    * path keeps its rows-only q_fingerprint gate as the perf variant. */
  private def qFingerprintOverlap(s: SparkSession, d: String): DataFrame = {
    // doc_id < 500 keeps the md5-per-gram winnowing + print self-join at a
    // fixed gate size across scale factors (no-op at sf<=0.01, 10x cut at
    // the sf0.1 bench) — the q_hash_features precedent
    val docs = Tables.documents(s, d).filter(col("doc_id") < 500)
    val prints = TextAnalysis.winnowFingerprints(docs, "doc_id", "text")
      .select(col("doc_id"), shiftright(col("print"), 24).as("fp"))
    val pairs = TextAnalysis.fingerprintOverlapFrom(prints, "doc_id", "fp", minShared = 1)
    val bothSides = pairs.select(col("id1").as("doc_id"), col("shared"))
      .unionByName(pairs.select(col("id2").as("doc_id"), col("shared")))
    docs.select(col("doc_id"))
      .join(bothSides, Seq("doc_id"), "left")
      .groupBy(col("doc_id"))
      .agg(
        count(col("shared")).as("n_partners"),
        coalesce(max(col("shared")), lit(0L)).as("max_shared"))
      .orderBy("doc_id")
  }

  /** Frame sampling plumbing, oracle-checked on the byte math: positions and
    * lengths of 16-byte frames per document (the hash column is engine-
    * specific and excluded). */
  private def qMultimodalFrames(s: SparkSession, d: String): DataFrame =
    Multimodal.sampleFrames(
      Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text"),
      "doc_id", frameBytes = 16)
      .select(col("doc_id"), col("frame_pos"), length(col("frame")).as("frame_len"))
      .orderBy("doc_id", "frame_pos")

  private def qMultimodalMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text")
      .select(
        col("doc_id"),
        col("media_meta.byte_len").cast("long").as("byte_len"),
        col("media_meta.mime").as("mime"))
      .orderBy("doc_id")

  // -------------------------------------------------------------- temporal

  /** As-of join: each purchase event picks up the latest preceding click by
    * the same user (ties by max click id). Epoch-micros output so both
    * engines compare on exact integers. */
  private def qAsofJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("p_ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id"), col("user_id"), col("ts"))
    Temporal.asofJoin(
      purchases, clicks,
      keyCols = Seq("user_id"),
      leftTime = "p_ts", rightTime = "ts", rightTiebreak = "event_id",
      rightVals = Seq("event_id" -> "click_id", "ts" -> "c_ts"))
      .filter(col("click_id").isNotNull)
      .select(
        col("purchase_id"),
        col("user_id"),
        unix_micros(col("p_ts")).as("pt_us"),
        col("click_id"),
        unix_micros(col("c_ts")).as("ct_us"))
      .orderBy("purchase_id")
  }

  private def qRangeJoin(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val bins = Seq(("low", 0.0, 50.0), ("mid", 50.0, 150.0), ("high", 150.0, 1000.0))
      .toDF("tier", "lo", "hi")
    Temporal.rangeJoin(Tables.events(s, d), bins, "value", "lo", "hi")
      .groupBy(col("tier"))
      .agg(count(lit(1)).as("n"), dsum(col("value")).as("sum_value"))
      .orderBy("tier")
  }

  /** Rolling 6-month revenue per customer over monthly totals — the
    * reference's rolling-window period calculus (extract_pec_data.py:193) on
    * a RANGE frame, so gaps in a customer's months still bound the window. */
  private def qRollingAgg(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(
        col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")) - 1).cast("int").as("month_idx"))
      .agg(sum(col("o_totalprice").cast("decimal(18,2)")).as("__m"))
    Temporal.rollingAgg(monthly, Seq("o_custkey"), "month_idx", 5, Seq((sum(col("__m")), "__roll")))
      .select(
        col("o_custkey"),
        col("month_idx"),
        col("__roll").cast("double").as("rolling_6m"))
      .orderBy("o_custkey", "month_idx")
  }

  // --------------------------------------------------------------- sketches

  private def qWinsorizeGrouped(s: SparkSession, d: String): DataFrame =
    Sketches.winsorizeGrouped(Tables.events(s, d), "value", Seq("event_type"), pLo = 0.05, pHi = 0.95)
      .select(col("event_id"), col("event_type"), col("value"),
        col("winsor_lo"), col("winsor_hi"), col("value_w"))
      .orderBy("event_id")

  private def qPercentile(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_returnflag"))
      .agg(Sketches.exactPercentiles("l_quantity", Seq(0.25, 0.5, 0.75)).as("__p"))
      .select(
        col("l_returnflag"),
        round(element_at(col("__p"), 1), 6).as("p25"),
        round(element_at(col("__p"), 2), 6).as("p50"),
        round(element_at(col("__p"), 3), 6).as("p75"))
      .orderBy("l_returnflag")

  /** Gaps-and-islands: 30-minute activity intervals per user merged into
    * maximal covered spans (outputs compare as epoch micros). */
  private def qIntervalIslands(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.events(s, d).select(
      col("user_id"),
      col("ts").as("start_ts"),
      (col("ts") + expr("INTERVAL 30 MINUTES")).as("end_ts"))
    Temporal.mergeIntervals(iv, Seq("user_id"), "start_ts", "end_ts")
      .select(
        col("user_id"), col("island_idx"),
        unix_micros(col("island_start")).as("start_us"),
        unix_micros(col("island_end")).as("end_us"),
        col("n_intervals"))
      .orderBy("user_id", "island_idx")
  }

  /** Time-weighted average event value per user (TWAP): tied timestamps
    * pinned by event_id, duration-weighted through exact decimal sums. */
  /** Pareto frontier of lineitem under (max quantity, min price): the
    * multi-criteria shortlist. */
  private def qSkyline(s: SparkSession, d: String): DataFrame =
    Relational.skyline2d(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice")),
      maxCol = "l_quantity", minCol = "l_extendedprice")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_quantity").desc, col("l_extendedprice"), col("l_orderkey"), col("l_partkey"))

  /** Monthly revenue with MoM and YoY deltas — the period-over-period
    * report shape: exact cent sums, lag windows over the (tiny) month
    * table, percentage as a 6-dp round of a division of exact longs. */
  private def qPeriodOverPeriod(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val monthly = Tables.orders(s, d)
      .groupBy(date_format(col("o_orderdate"), "yyyyMM").as("period"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("__c"))
    val w = Window.orderBy("period")
    monthly
      .withColumn("__prev", lag(col("__c"), 1).over(w))
      .withColumn("__yoy", lag(col("__c"), 12).over(w))
      .select(
        col("period"),
        (col("__c") / 100.0).as("revenue"),
        round((col("__c") - col("__prev")).cast("double") / col("__prev").cast("double") * 100.0, 6)
          .as("mom_pct"),
        round((col("__c") - col("__yoy")).cast("double") / col("__yoy").cast("double") * 100.0, 6)
          .as("yoy_pct"))
      .orderBy("period")
  }

  /** Fanout guard for the lineitem self-join on part: top-20 keys by the
    * rows the join WOULD emit — the pre-flight explosion audit. */
  private def qJoinFanout(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    Quality.joinFanout(li, li, Seq("l_partkey" -> "l_partkey"))
      .orderBy(col("out_rows").desc, col("l_partkey"))
      .limit(20)
  }

  /** FD audit over orders: o_orderkey -> o_orderstatus must hold (unique
    * key), o_custkey -> o_orderstatus must not. */
  private def qFdCheck(s: SparkSession, d: String): DataFrame =
    Quality.functionalDependencies(
      Tables.orders(s, d),
      Seq("o_orderkey" -> "o_orderstatus", "o_custkey" -> "o_orderstatus"))
      .orderBy("determinant")

  /** Fixed-width roundtrip: write lineitem keys + cent-quantized quantity
    * as a fixed-width text extract, read it back with the declared layout,
    * and aggregate — hash-matched against DuckDB over the ORIGINAL
    * parquet, so the byte layout, padding, trim and casts all verify. */
  private def qFixedWidthRoundtrip(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.types.{LongType, StringType}
    val tmp = java.nio.file.Files.createTempDirectory("graft_fw_").toFile
    tmp.deleteOnExit()
    val path = new java.io.File(tmp, "lineitem_fw").getPath
    sources.FixedWidth.write(
      Tables.lineitem(s, d).select(
        col("l_orderkey"),
        col("l_returnflag"),
        floor(col("l_quantity") * 100 + 0.5).cast("long").as("qty_cents")),
      path,
      Seq("l_orderkey" -> 12, "l_returnflag" -> 2, "qty_cents" -> 10))
    sources.FixedWidth.read(s, path, Seq(
      ("l_orderkey", 12, LongType),
      ("l_returnflag", 2, StringType),
      ("qty_cents", 10, LongType)))
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        (sum(col("qty_cents")) / 100.0).as("sum_qty"),
        sum(col("l_orderkey")).as("sum_key"))
      .orderBy("l_returnflag")
  }

  /** Quantile-normalize event values per event type onto the pooled
    * distribution — the rank-matching transform. */
  private def qQuantileNormalize(s: SparkSession, d: String): DataFrame =
    Sketches.quantileNormalize(
      Tables.events(s, d).select(col("event_id"), col("event_type"), col("value")),
      "value", Seq("event_type"))
      .select(col("event_id"), col("event_type"), col("value"), col("value_qnorm"))
      .orderBy("event_id")

  /** Mann–Whitney U between event values of two event types — the
    * rank-based A/B check, exact integer midrank arithmetic. */
  private def qMannWhitney(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    Sketches.mannWhitneyU(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      "value")
  }

  /** AMS F2 sketch (X327): estimate lineitem's self-join size on
    * l_partkey with 64 tug-of-war estimators, exact F2 and relative
    * error beside it — the audit of the sketch itself. */
  private def qAmsF2(s: SparkSession, d: String): DataFrame =
    Sketches.amsF2(
      Tables.lineitem(s, d).select(col("l_partkey")), "l_partkey", k = 64)

  /** Cliff's delta + Vargha–Delaney Â (X318) between click and purchase
    * event values — the ordinal effect size beside the q_mann_whitney
    * verdict on the same two samples. */
  private def qCliffsDelta(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .withColumn("cents", floor(col("value") * 100 + 0.5).cast("long"))
    Sketches.cliffsDelta(
      ev.filter(col("event_type") === "click"),
      ev.filter(col("event_type") === "purchase"),
      "cents")
  }

  /** k-anonymity audit over customers: quasi-identifier combos
    * (nation, segment, balance-thousand) describing fewer than 5 records —
    * the privacy linkability report. */
  private def qKAnonymity(s: SparkSession, d: String): DataFrame =
    Quality.kAnonymity(
      Tables.customer(s, d).select(
        col("c_nationkey"), col("c_mktsegment"),
        floor(col("c_acctbal") / 1000).cast("long").as("bal_k")),
      Seq("c_nationkey", "c_mktsegment", "bal_k"), k = 5)
      .orderBy("c_nationkey", "c_mktsegment", "bal_k")

  /** Mutual information between order priority and order status —
    * contingency cells + window margins, 1e-12-quantized terms. */
  private def qMutualInfo(s: SparkSession, d: String): DataFrame =
    Sketches.mutualInformation(Tables.orders(s, d), "o_orderpriority", "o_orderstatus")

  /** Deterministic negative sampling: 4 hash-picked embedding ids per
    * low-id document — reproducible contrastive pairs, no RNG. */
  private def qNegativeSample(s: SparkSession, d: String): DataFrame =
    Sampling.negativeSample(
      Tables.documents(s, d).filter(col("doc_id") < 50), "doc_id",
      Tables.embeddings(s, d), "vec_id", k = 4)
      .orderBy("doc_id", "draw")

  /** DSIR importance scores of every document against the English slice as
    * the target domain — hashed unigram models over 256 md5-mod buckets,
    * add-one smoothing, per-bucket log-ratios 1e-6-quantized before the
    * per-doc sum; the full model fit + scoring replays in SQL. English
    * docs should score high, zh/es/de/fr low — the paper's separation,
    * hash-gated. */
  private def qDsir(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Sampling.dsirScores(docs, docs.filter(col("lang") === "en"),
        "doc_id", "text", numBuckets = 256, minLen = 2)
      .select(col("doc_id"), col("n_tokens"), round(col("score"), 6).as("score"))
      .orderBy("doc_id")
  }

  /** STREAMING DSIR twin — the production "fit offline, score online"
    * shape: the bucket log-ratio model fits in BATCH
    * ([[graft.operators.Sampling.dsirModel]]) and broadcasts into the
    * document stream (stream-static join, stateless per token); per-doc
    * (n_tokens, Σlrq) integer partials accumulate in the state store.
    * Integer state ⇒ stream == batch bit-exactly, shares q_dsir's oracle
    * verbatim (the 23rd end-to-end streaming gate). */
  private def qDsirStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = Tables.documents(s, d)
    val model = Sampling.dsirModel(
      docs, docs.filter(col("lang") === "en"), "text", numBuckets = 256, minLen = 2)
      .localCheckpoint(true)
    val raw = s.read.parquet(s"$d/documents.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val name = "graft_dsir_stream"
    withStatePartitions(s, 8) {
      val q = Sampling.dsirBuckets(
          stream.select(col("doc_id"), col("text")), "text", numBuckets = 256, minLen = 2)
        .join(broadcast(model), "__b")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("__lrq")).as("__sq"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name)
      .select(col("doc_id"), col("n_tokens"),
        round(col("__sq").cast("double") / lit(1e6), 6).as("score"))
      .orderBy("doc_id")
  }

  /** Per-(returnflag, linestatus) OLS price-over-time trend — closed-form
    * regression from five exact decimal sufficient statistics in one
    * partial aggregate; x = epoch days of l_shipdate, y = price cents. */
  private def qOlsTrend(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag"), col("l_linestatus"),
      datediff(col("l_shipdate").cast("date"), lit("1992-01-01").cast("date")).as("x"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
    Sketches.olsTrend(li, Seq("l_returnflag", "l_linestatus"), "x", "y")
      .orderBy("l_returnflag", "l_linestatus")
  }

  /** Two-sample KS drift test between the first and second half of the
    * order history — exact integer supremum over the merged ECDFs. */
  private def qKsTest(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
    val split = lit("1996-07-01").cast("timestamp")
    Sketches.ksTest(
      ord.filter(col("o_orderdate") < split),
      ord.filter(col("o_orderdate") >= split),
      "o_totalprice")
  }

  /** Bounded-lookback EWMA smoothing of event values per type — the
    * recursion-free fixed-window form with 12-dp weight literals and
    * fixed-order accumulation, so the oracle replays it exactly. */
  private def qEwma(s: SparkSession, d: String): DataFrame =
    Temporal.ewma(
      Tables.events(s, d).select(col("event_id"), col("event_type"), col("ts"), col("value")),
      keyCols = Seq("event_type"), orderCols = Seq("ts", "event_id"),
      valueCol = "value", alpha = 0.3, lookback = 6)
      .select(col("event_id"), col("event_type"), col("value"), col("ewma"))
      .orderBy("event_id")

  /** Rolling 20-row Pearson correlation between quantity and price per
    * returnflag — exact windowed sufficient statistics, one fixed-width
    * frame. */
  private def qRollingCorr(s: SparkSession, d: String): DataFrame =
    Temporal.rollingCorr(
      Tables.lineitem(s, d).select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_shipdate"),
        floor(col("l_quantity") * 100 + 0.5).cast("long").as("xq"),
        floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("yq")),
      keyCols = Seq("l_returnflag"),
      // the synthetic lineitem repeats (orderkey, linenumber) — extend the
      // order with the values themselves: remaining ties are full-row
      // duplicates, whose frame assignment is output-multiset-invariant
      orderCols = Seq("l_shipdate", "l_orderkey", "l_linenumber", "xq", "yq"),
      xCol = "xq", yCol = "yq", lookback = 20)
      .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("corr"))
      // duplicate (orderkey, linenumber) rows exist — make the OUTPUT order
      // total too (nulls last matches the SQL default)
      .orderBy(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("corr").asc_nulls_last)

  /** Two-sided CUSUM mean-shift monitor per event type over the event
    * history, deviations quantized to exact micro-units. */
  private def qCusum(s: SparkSession, d: String): DataFrame =
    Temporal.cusum(
      Tables.events(s, d).select(col("event_id"), col("event_type"), col("value")),
      orderCols = Seq("event_id"), valueCol = "value",
      target = 50.0, slack = 5.0, threshold = 200.0,
      keyCols = Seq("event_type"))
      .orderBy("event_type", "event_id")

  private def qTwap(s: SparkSession, d: String): DataFrame =
    Temporal.timeWeightedAvg(
      Tables.events(s, d).select(col("user_id"), col("event_id"), col("ts"), col("value")),
      Seq("user_id"), "ts", "value", tiebreakCols = Seq("event_id"))
      .select(col("user_id"), round(col("twap"), 6).as("twap"), col("n_samples"))
      .orderBy("user_id")

  /** Group-statistic null imputation: nulls planted in-plan (flag on
    * linenumber 3, quantity on linenumber 4), repaired from per-linestatus
    * mode / exact mean. */
  private def qImpute(s: SparkSession, d: String): DataFrame = {
    val holed = Tables.lineitem(s, d)
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_linestatus"),
        when(col("l_linenumber") === 3, lit(null)).otherwise(col("l_returnflag")).as("l_returnflag"),
        when(col("l_linenumber") === 4, lit(null)).otherwise(col("l_quantity")).as("l_quantity"))
    Relational.impute(
      holed, Seq("l_linestatus"),
      modeCols = Seq("l_returnflag"), meanCols = Seq("l_quantity"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_linestatus"),
        col("l_returnflag"), round(col("l_quantity"), 6).as("l_quantity"))
      .orderBy("l_orderkey", "l_linenumber", "l_linestatus", "l_returnflag", "l_quantity")
  }

  /** Key-skew diagnostic over the per-user event distribution (exact
    * percentiles so the oracle reproduces them; `approx=true` is the
    * at-scale default). */
  private def qSkewReport(s: SparkSession, d: String): DataFrame =
    Skew.skewReport(Tables.events(s, d), Seq("user_id"), approx = false)
      .select(
        col("n_rows"), col("n_keys"), col("max_count"),
        round(col("max_share"), 6).as("max_share"),
        round(col("p50_count"), 6).as("p50_count"),
        round(col("p99_count"), 6).as("p99_count"),
        round(col("count_cv"), 6).as("count_cv"))

  /** Equi-depth (quantile-edged) histogram of the lineitem price: edges
    * rounded to 4dp on both engines so binning agrees bit-for-bit. */
  private def qEquidepthHist(s: SparkSession, d: String): DataFrame =
    Sketches.equiDepthHistogram(
      Tables.lineitem(s, d), "l_extendedprice", nBins = 8, edgeRound = Some(4))
      .select(
        col("bin"), round(col("lo"), 2).as("lo"), round(col("hi"), 2).as("hi"), col("n"))
      .orderBy("bin")

  /** HLL distinct-overlap estimate between order and customer keys, in the
    * oracle-checkable regime: lgK = 18 keeps the DataSketches HLL in exact
    * coupon-set mode for the <= 15k keys at the gate scale factors, so the
    * inclusion-exclusion readout equals the exact set SQL (the
    * q_theta_setops recipe). Production callers keep the default lgK = 12;
    * spec pins that regime's accuracy vs exact. */
  private def qOverlapEstimate(s: SparkSession, d: String): DataFrame =
    Sketches.distinctOverlapEstimate(
      Tables.orders(s, d), "o_custkey", Tables.customer(s, d), "c_custkey", lgK = 18)

  /** Calendar proration: 45-day order windows split across the months they
    * span by day count; shares re-sum to the order value. */
  private def qProrate(s: SparkSession, d: String): DataFrame = {
    val iv = Tables.orders(s, d).select(
      col("o_orderkey"),
      col("o_orderdate").cast("date").as("start_d"),
      date_add(col("o_orderdate").cast("date"), 44).as("end_d"),
      col("o_totalprice"))
    Periods.prorateByMonth(iv, "start_d", "end_d", "o_totalprice")
      .select(
        col("o_orderkey"), col("month"), col("overlap_days"),
        round(col("prorated"), 6).as("prorated"))
      .orderBy("o_orderkey", "month")
  }

  /** Robust MAD outliers of lineitem quantity per return flag (k=1.5 so the
    * integer-valued synthetic data actually yields tails). Medians of
    * integers are exact halves, so the flag comparison is deterministic
    * across engines. */
  private def qMadOutliers(s: SparkSession, d: String): DataFrame =
    Sketches.madOutliers(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_returnflag"), col("l_quantity")),
      Seq("l_returnflag"), "l_quantity", k = 1.5)
      .filter(col("is_outlier"))
      .select(
        col("l_orderkey"), col("l_linenumber"), col("l_returnflag"),
        col("l_quantity"), col("median"), col("mad"))
      .orderBy("l_orderkey", "l_linenumber", "l_returnflag", "l_quantity")

  /** HLL distinct-user sketch per event type, with the exact count carried
    * alongside — run in the oracle-checkable regime (the q_cms_counts
    * recipe) through the DataSketches variant: lgK = 18 keeps the sketch
    * in exact coupon-set mode for the <= 1.5k distinct users at the gate
    * scale factors, so every estimate is EXACT and the oracle is a plain
    * COUNT(DISTINCT). (Spark's HLL++ `approx_count_distinct` at equivalent
    * precision allocates its full dense register array per group — 17.8s
    * vs 0.2s here — so the high-precision regime belongs to the sparse
    * DataSketches path; `Sketches.approxDistinct` keeps the Spark-native
    * wrapper at production rsd with its SketchesSpec error bound.) */
  private def qApproxDistinct(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    Sketches.approxDistinctDs(ev, Seq("event_type"), "user_id", lgK = 18)
      .join(Sketches.exactDistinct(ev, Seq("event_type"), "user_id"), "event_type")
      .orderBy("event_type")
  }

  // ------------------------------------------------------- e2e integration

  /** The reference pipeline's whole shape as one declarative plan —
    * see [[Pipeline.integrationReport]]. */
  private def qPipelineE2e(s: SparkSession, d: String): DataFrame =
    Pipeline.integrationReport(s, d)

  private def qWordFreq(s: SparkSession, d: String): DataFrame =
    TextAnalysis.wordFreq(Tables.documents(s, d), "text", topN = 50)

  private def qWordRepetition(s: SparkSession, d: String): DataFrame =
    TextAnalysis.wordRepetition(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** Benchmark decontamination: docs with ids divisible by 50 stand in as
    * the eval set, the rest as training corpus; report every training doc
    * sharing a word 4-gram with the eval set. The Bloom prefilter +
    * broadcast exact verify makes results EXACT — hash-matched against a
    * DuckDB n-gram join oracle. */
  private def qDecontaminate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Decontaminate.contaminationReport(
      docs.filter(col("doc_id") % 50 =!= 0), "doc_id", "text",
      docs.filter(col("doc_id") % 50 === 0), "text",
      n = 4)
      .orderBy("doc_id")
  }

  /** NEAR-DUP decontamination, oracle-hash-gated: docs with ids divisible
    * by 31 stand in as the eval set; every training doc at >= 0.7 exact
    * 3-gram Jaccard to any eval doc is reported. The MinHash cross-corpus
    * candidate join is engine-specific but, at 128 hashes / 32 bands, its
    * recall on qualifying pairs is ~certain (identical docs are certain),
    * so the verified output equals the exact cross all-pairs SQL set —
    * the same gating argument as q_dedup_minhash. */
  private def qDecontaminateNearDup(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Decontaminate.nearDupContamination(
      docs, "doc_id", "text",
      docs.filter(col("doc_id") % 31 === 0)
        .select(col("doc_id").as("eval_id"), col("text")),
      "eval_id", "text")
      .select(col("train_id"), col("eval_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("train_id", "eval_id")
  }

  /** STREAMING near-dup decontamination twin — dedup the incoming crawl
    * against a standing eval corpus: the eval side's band index and texts
    * are STATIC broadcasts; the train stream computes its MinHash bands
    * statelessly (text carried alongside — no stream-stream join-back),
    * candidates verify with exact n-gram Jaccard in-stream, and a
    * complete-mode (train_id, eval_id) aggregate dedups multi-band hits
    * (state bounded by the CONTAMINATED pair count, not the corpus).
    * MinHash signatures are pure per-row functions, so stream == batch
    * exactly and q_decontaminate_neardup's oracle gates both twins (the
    * 24th streaming gate). */
  private def qDecontaminateNearDupStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = Tables.documents(s, d)
    val eval = docs.filter(col("doc_id") % 31 === 0)
      .select(col("doc_id").as("eval_id"), col("text"))
    val eb = Dedup.minHashBands(eval, "eval_id", "text", 128, 32, 3)
      .localCheckpoint(true)
    val evalTexts = eval.select(col("eval_id"), col("text").as("__et"))
      .localCheckpoint(true)
    val raw = s.read.parquet(s"$d/documents.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val name = "graft_decontaminate_neardup_stream"
    withStatePartitions(s, 8) {
      val q = Dedup.minHashBands(
          stream.select(col("doc_id").as("train_id"), col("text")),
          "train_id", "text", 128, 32, 3, keepCols = Seq("text"))
        .join(broadcast(eb), Seq("band", "band_key"))
        .join(broadcast(evalTexts), "eval_id")
        .withColumn("jaccard", graft.functions.ngram_jaccard(col("text"), col("__et"), 3))
        .filter(col("jaccard") >= 0.7)
        .groupBy(col("train_id"), col("eval_id"))
        .agg(max(col("jaccard")).as("jaccard"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name)
      .select(col("train_id"), col("eval_id"), round(col("jaccard"), 6).as("jaccard"))
      .orderBy("train_id", "eval_id")
  }

  /** Gopher duplicate-2-gram repetition filter over the corpus. */
  private def qDupNgrams(s: SparkSession, d: String): DataFrame =
    TextAnalysis.duplicateNgramStats(Tables.documents(s, d), "doc_id", "text", n = 2)
      .orderBy("doc_id")

  /** Duplicate-span detection over the documents corpus at n=4: every
    * maximal token range covered by corpus-repeated 4-grams, per document
    * — the exact-substring dedup report. */
  private def qDupSpans(s: SparkSession, d: String): DataFrame =
    TextAnalysis.duplicateSpans(Tables.documents(s, d), "doc_id", "text", n = 4)
      .orderBy("doc_id", "span_start")

  /** Duplicate-span removal at n=4: corpus-duplicated ranges cut from every
    * document, surviving tokens reassembled in original case and order with
    * kept/removed accounting. */
  private def qDupSpansRemoval(s: SparkSession, d: String): DataFrame =
    TextAnalysis.removeDuplicateSpans(Tables.documents(s, d), "doc_id", "text", n = 4)
      .orderBy("doc_id")

  /** Keep-first duplicate-span removal at n=4: the canonical (globally
    * first) copy of every duplicated gram survives; only later occurrences
    * are cut. */
  private def qDupSpansKeepFirst(s: SparkSession, d: String): DataFrame =
    TextAnalysis.removeDuplicateSpansKeepFirst(Tables.documents(s, d), "doc_id", "text", n = 4)
      .orderBy("doc_id")

  /** Second LLM-pipeline composition in ONE Catalyst plan: duplicate-span
    * removal (T36) → surviving-token quality gate → sharded sequence
    * packing (T18) — the post-r6 corpus-prep chain, end to end, with the
    * whole chain (including the span arithmetic) replayed by the SQL
    * oracle. */
  private def qLlmPipeline2(s: SparkSession, d: String): DataFrame = {
    val cleaned = TextAnalysis.removeDuplicateSpans(
      Tables.documents(s, d), "doc_id", "text", n = 4)
    val kept = cleaned.filter(col("n_tokens_kept") >= 10)
      .select(
        col("doc_id"), pmod(col("doc_id"), lit(8L)).as("shard"),
        col("n_tokens_kept").as("n_tokens"))
    Sampling.packSequences(kept, "shard", "doc_id", "n_tokens", budget = 512)
      .select("doc_id", "shard", "n_tokens", "chunk_id", "chunk_pos")
      .orderBy("doc_id")
  }

  /** Third LLM-pipeline composition in ONE Catalyst plan — the r7 curation
    * chain: Gopher quality gate (T38) → cross-corpus keep-first line dedup
    * (T30) over the gated survivors → per-source temperature weights (T41)
    * computed on the SAME gated corpus, broadcast back. Quality → dedup →
    * mixture, whole chain replayed by the SQL oracle. */
  private def qLlmPipeline3(s: SparkSession, d: String): DataFrame = {
    // corpus-appropriate stop list (the canonical 8 would reject the whole
    // synthetic keyword corpus — the gate must SPLIT, not erase)
    val flags = TextAnalysis.gopherQualityFlags(
      col("text"), minWords = 5L, stopWords = Seq("the", "a", "spark")).toMap
    val gated = Tables.documents(s, d).filter(flags("keep"))
    val lined = gated.select(
      col("doc_id"),
      regexp_replace(col("text"), "((?:\\S+ ){2}\\S+) ", "$1\n").as("text"))
    val deduped = TextAnalysis.dedupLinesKeepFirst(lined, "doc_id", "text")
    val weights = Sampling.temperatureWeights(gated, "source", alpha = 0.7)
      .select(col("source"), col("weight"))
    deduped
      .join(gated.select(col("doc_id"), col("source")), "doc_id")
      .join(broadcast(weights), "source")
      .select(
        col("doc_id"), col("source"),
        col("n_lines_kept"), col("n_lines_removed"), col("weight"))
      .orderBy("doc_id")
  }

  /** LLM pipeline v4 (X235) — the r9 curation chain in ONE Catalyst plan:
    * vocabulary normalization (T64: tail tokens → <unk>, bounded broadcast
    * vocab) → DSIR importance scoring of the REWRITTEN text against the
    * in-corpus English target (T61: broadcast bucket model, one corpus
    * shuffle) → deterministic top-100 selection under the (score desc,
    * doc_id) total order (bounded TakeOrdered, never a global sort). */
  private def qLlmPipeline4(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val rewritten = TextAnalysis.truncateVocabulary(
      docs, "doc_id", "text", maxVocab = 30, minCount = 2L)
      .join(docs.select(col("doc_id"), col("lang")), "doc_id")
    val scored = Sampling.dsirScores(
      rewritten, rewritten.filter(col("lang") === "en"),
      "doc_id", "text_unk", numBuckets = 256, minLen = 2)
    scored
      .orderBy(col("score").desc, col("doc_id"))
      .limit(100)
      .select(col("doc_id"), col("n_tokens"), round(col("score"), 6).as("score"))
      .orderBy("doc_id")
  }

  /** Bucketed co-located join, oracle-checked: write customer and orders
    * bucketed on the join key (external tables in a per-run temp dir), join
    * them with auto-broadcast disabled — the plan is a ZERO-Exchange
    * sort-merge (SinkSpec asserts that shape) — and hash-match the joined
    * aggregate against DuckDB over the original parquet. At 100 TB this is
    * the move that takes the fact-join shuffle out of every query and pays
    * it once at write time. */
  private def qBucketedJoin(s: SparkSession, d: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_bkt_").toFile
    tmpDir.deleteOnExit()
    Sink.writeBucketed(
      Tables.customer(s, d).select("c_custkey", "c_nationkey"),
      "graft_q_bkt_customer", Seq("c_custkey"), nBuckets = 8, sortCols = Seq("c_custkey"),
      path = Some(new java.io.File(tmpDir, "customer").getPath))
    Sink.writeBucketed(
      Tables.orders(s, d).select("o_custkey", "o_totalprice"),
      "graft_q_bkt_orders", Seq("o_custkey"), nBuckets = 8, sortCols = Seq("o_custkey"),
      path = Some(new java.io.File(tmpDir, "orders").getPath))
    val prev = s.conf.get("spark.sql.autoBroadcastJoinThreshold")
    s.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      s.table("graft_q_bkt_customer")
        .join(s.table("graft_q_bkt_orders"), col("c_custkey") === col("o_custkey"))
        .groupBy(col("c_nationkey"))
        .agg(
          count(lit(1)).as("n_orders"),
          dsum(col("o_totalprice")).as("total"))
        .localCheckpoint(true) // evaluate under the no-broadcast conf
        .orderBy("c_nationkey")
    } finally s.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  /** Partitioned export round-trip: write orders partitioned by month (the
    * reference's export_file per-period loop as ONE distributed
    * partitionBy job), read the directory tree back, and hash-compare
    * against DuckDB over the source table — proves values AND the
    * partition column survive the disk round trip. */
  /** ORC round trip: the columnar-format sibling of the parquet sinks —
    * write a lineitem projection as ORC (Spark's native writer, zlib
    * default), read it back; the oracle is the identity (the format must
    * lose nothing, including timestamp fidelity). */
  private def qOrcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_orc_").toFile
    tmpDir.deleteOnExit()
    val out = new java.io.File(tmpDir, "lineitem_orc").getPath
    Tables.lineitem(s, d)
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate", "l_returnflag")
      .write.mode("overwrite").orc(out)
    s.read.orc(out)
      .orderBy("l_orderkey", "l_linenumber", "l_quantity", "l_shipdate", "l_returnflag")
  }

  /** JDBC round trip (Z13): supplier published to the embedded Derby
    * engine (drop/recreate + batched inserts), read BACK through the
    * range-partitioned parallel read (4 key slices, one connection per
    * task — the only JDBC read shape that scales) — the oracle proves
    * type fidelity (BIGINT/VARCHAR/INTEGER/DOUBLE) and losslessness. */
  private def qJdbcRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_jdbc_").toFile
    tmpDir.deleteOnExit()
    System.setProperty("derby.stream.error.file",
      new java.io.File(tmpDir, "derby.log").getPath)
    val url = s"jdbc:derby:${tmpDir.getPath}/db;create=true"
    val src = Tables.supplier(s, d)
      .select("s_suppkey", "s_name", "s_nationkey", "s_acctbal")
    graft.sources.Jdbc.write(src, url, "supplier_j")
    val bounds = src.agg(min(col("s_suppkey")), max(col("s_suppkey"))).head
    graft.sources.Jdbc.readPartitioned(s, url, "supplier_j", "s_suppkey",
      bounds.getLong(0), bounds.getLong(1), numPartitions = 4)
      .orderBy("s_suppkey")
  }

  /** Small-files compaction round trip (X42): an orders projection written
    * deliberately over-parallel (32 KB-scale files), compacted toward the
    * target size in place, then read BACK — the oracle proves compaction
    * loses/duplicates nothing, and the file count lands at the size-derived
    * expectation (1 at the gate scale factors, pinned as a column). */
  private def qCompactRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_compact_").toFile
    tmpDir.deleteOnExit()
    val out = new java.io.File(tmpDir, "orders_small").getPath
    Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .repartition(32)
      .write.mode("overwrite").parquet(out)
    val nFiles = Sink.compactParquet(s, out, targetFileBytes = 64L * 1024 * 1024)
    s.read.parquet(out)
      .withColumn("n_files", lit(nFiles))
      .orderBy("o_orderkey")
  }

  /** Dynamic partition overwrite round trip (X62): full orders published
    * partitioned by priority, then ONLY the 1-URGENT partition re-published
    * with doubled totals — the read-back must show the other four
    * partitions untouched and the urgent one replaced, which is exactly
    * what the CASE oracle replays (a static overwrite would instead drop
    * every other partition and fail the row count). */
  private def qOverwritePartitions(s: SparkSession, d: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_dynover_").toFile
    tmpDir.deleteOnExit()
    val out = new java.io.File(tmpDir, "orders_by_prio").getPath
    val base = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_totalprice", "o_orderpriority")
    Sink.writePartitionedParquet(base, "o_orderpriority", out)
    Sink.overwritePartitions(
      base.filter(col("o_orderpriority") === "1-URGENT")
        .withColumn("o_totalprice", col("o_totalprice") * 2),
      out, Seq("o_orderpriority"))
    s.read.parquet(out)
      .select(col("o_orderkey"), col("o_custkey"), col("o_totalprice"),
        col("o_orderpriority").cast("string").as("o_orderpriority"))
      .orderBy("o_orderkey")
  }

  /** XML write→read roundtrip of an orders projection — Spark 4 built-in
    * xml source; types re-pinned by explicit casts after the (by-design
    * schema-inferred) read. */
  private def qXmlRoundtrip(s: SparkSession, d: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_xml_").toFile
    tmpDir.deleteOnExit()
    val out = new java.io.File(tmpDir, "orders_xml").getPath
    val proj = Tables.orders(s, d)
      .select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderdate")
    graft.sources.Xml.write(proj, out, rootTag = "orders", rowTag = "order")
    // explicit string schema skips the inference pre-scan; the typed casts
    // below are the pinning step either way
    val asStrings = org.apache.spark.sql.types.StructType(
      proj.schema.fieldNames.map(n =>
        org.apache.spark.sql.types.StructField(n, org.apache.spark.sql.types.StringType)))
    graft.sources.Xml.read(s, out, rowTag = "order", schema = Some(asStrings))
      .select(
        col("o_orderkey").cast("long"),
        col("o_custkey").cast("long"),
        col("o_orderstatus").cast("string"),
        col("o_totalprice").cast("double"),
        col("o_orderdate").cast("timestamp"))
      .orderBy("o_orderkey")
  }

  private def qPartitionedExport(s: SparkSession, d: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_export_").toFile
    tmpDir.deleteOnExit()
    val out = new java.io.File(tmpDir, "orders_by_month").getPath
    val src = Tables.orders(s, d)
      .select(
        col("o_orderkey"),
        date_format(col("o_orderdate"), "yyyyMM").as("period"),
        col("o_totalprice"))
      // co-locate each period before the write: one file per period value
      // instead of (tasks x periods) small files — at 100 TB the difference
      // between a healthy table and a small-files incident
      .repartition(col("period"))
    Sink.writePartitionedParquet(src, "period", out)
    s.read.parquet(out)
      .select(col("o_orderkey"), col("period").cast("string").as("period"), col("o_totalprice"))
      .orderBy("o_orderkey")
  }

  /** Snapshot diff: the documents table against a deterministically
    * perturbed "next crawl" (every 97th doc removed, every 89th doc's text
    * changed, adds synthesized above the id range) — classified by one full
    * outer join and hash-matched against the same construction in DuckDB. */
  private def qSnapshotDiff(s: SparkSession, d: String): DataFrame = {
    val old = Tables.documents(s, d).select("doc_id", "text")
    val next = old
      .filter(col("doc_id") % 97 =!= 0)
      .withColumn(
        "text",
        when(col("doc_id") % 89 === 0, concat(col("text"), lit(" [rev2]")))
          .otherwise(col("text")))
      .unionByName(
        old.filter(col("doc_id") % 101 === 0)
          .select((col("doc_id") + 1000000).as("doc_id"), col("text")))
    Relational.snapshotDiff(old, next, Seq("doc_id"), Seq("text"))
      .filter(col("change") =!= "unchanged")
      .orderBy("doc_id")
  }

  /** JSONL shard export round-trip: write documents stats as sharded
    * json-lines, read back, hash-match against DuckDB over the source
    * parquet — the training-data export format made oracle-grade like the
    * parquet export. */
  private def qJsonlExport(s: SparkSession, d: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_jsonl_").toFile
    tmpDir.deleteOnExit()
    val out = new java.io.File(tmpDir, "docs_jsonl").getPath
    Sink.writeJsonl(
      Tables.documents(s, d).select(
        col("doc_id"),
        length(col("text")).cast("long").as("n_chars")),
      out,
      shards = 8)
    s.read.json(out)
      .select(col("doc_id").cast("long"), col("n_chars").cast("long"))
      .orderBy("doc_id")
  }

  /** Streaming exact dedup run end-to-end: AvailableNow over events,
    * dropDuplicatesWithinWatermark on (user_id, event_type); with one input
    * batch the watermark-scoped state covers the whole table, so the
    * surviving KEY SET equals batch DISTINCT — which is what the oracle
    * checks (winning rows are arbitrary, the key set is not). */
  private def qDedupStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = eventsStream(s, d)
    val name = "graft_dedup_stream"
    withStatePartitions(s, 8) {
      val q = Events.dedupStream(stream, Seq("user_id", "event_type"))
        .select("user_id", "event_type")
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("user_id", "event_type")
  }

  /** Keyed upsert: apply a (derived) updates extract over the orders
    * snapshot, latest-wins per key — incremental refresh without a table
    * format, on the native top-k operator. */
  private def qUpsert(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select("o_orderkey", "o_orderdate", "o_totalprice")
    val updates = base.filter(col("o_orderkey") < 1000)
      .withColumn("o_totalprice", col("o_totalprice") * 2)
    Relational.upsert(base, updates, Seq("o_orderkey"), "o_orderdate")
      .select("o_orderkey", "o_totalprice")
      .orderBy("o_orderkey")
  }

  /** CDC MERGE over the orders snapshot: a deterministic three-wave change
    * feed — price-bump updates (seq 1) for keys ≡0 (mod 7), a later
    * status+price rewrite (seq 2) for keys ≡0 (mod 5), tombstones (seq 3)
    * for keys ≡0 (mod 13) — applied last-writer-wins per key through
    * [[Relational.applyCdc]]. Keys hit by both update waves must resolve to
    * seq 2, deletes must override every earlier update, untouched keys must
    * survive byte-identical; the oracle replays the same feed with window
    * SQL. */
  private def qCdcApply(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val u1 = base.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))
      .withColumn("op", lit("U")).withColumn("seq", lit(1L))
    val u2 = base.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
      .withColumn("o_orderstatus", lit("R"))
      .withColumn("op", lit("U")).withColumn("seq", lit(2L))
    val del = base.filter(col("o_orderkey") % 13 === 0)
      .withColumn("op", lit("D")).withColumn("seq", lit(3L))
    Relational.applyCdc(
      base, u1.unionByName(u2).unionByName(del), Seq("o_orderkey"), "seq", "op")
      .orderBy("o_orderkey")
  }

  /** SCD2 history from the same three-wave CDC feed as [[qCdcApply]]: every
    * surviving change becomes a validity interval; deletes close intervals
    * without emitting rows (keys ≡0 mod 13 end with no current version). */
  private def qScd2FromCdc(s: SparkSession, d: String): DataFrame = {
    val base = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val u1 = base.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))
      .withColumn("op", lit("U")).withColumn("seq", lit(1L))
    val u2 = base.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
      .withColumn("o_orderstatus", lit("R"))
      .withColumn("op", lit("U")).withColumn("seq", lit(2L))
    val del = base.filter(col("o_orderkey") % 13 === 0)
      .withColumn("op", lit("D")).withColumn("seq", lit(3L))
    Temporal.scd2FromCdc(
      u1.unionByName(u2).unionByName(del), Seq("o_orderkey"), "seq", "op")
      .select("o_orderkey", "o_orderstatus", "o_totalprice", "valid_from", "valid_to", "is_current")
      .orderBy("o_orderkey", "valid_from")
  }

  /** Streaming twin of [[qCdcApply]]: the same three-wave change feed
    * arrives as a stream, [[Events.cdcStream]] folds it to the
    * highest-sequence change per key in the state store, and the
    * accumulated update-mode output repairs to latest-per-key before the
    * SAME batch merge applies it over the snapshot — so the batch window
    * oracle gates the streamed path end to end. */
  private def qCdcApplyStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val base = Tables.orders(s, d).select("o_orderkey", "o_orderstatus", "o_totalprice")
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
      .select("o_orderkey", "o_orderstatus", "o_totalprice")
    val u1 = stream.filter(col("o_orderkey") % 7 === 0)
      .withColumn("o_totalprice", col("o_totalprice") * lit(1.1))
      .withColumn("op", lit("U")).withColumn("seq", lit(1L))
    val u2 = stream.filter(col("o_orderkey") % 5 === 0)
      .withColumn("o_totalprice", col("o_totalprice") + lit(100.0))
      .withColumn("o_orderstatus", lit("R"))
      .withColumn("op", lit("U")).withColumn("seq", lit(2L))
    val del = stream.filter(col("o_orderkey") % 13 === 0)
      .withColumn("op", lit("D")).withColumn("seq", lit(3L))
    val changes = u1.unionByName(u2).unionByName(del)
      .select(
        col("o_orderkey").as("k"), col("o_orderstatus").as("status"),
        col("o_totalprice").as("price"), col("op"), col("seq"))
      .as[Events.CdcChange]
    val name = "graft_cdc_apply_stream"
    withStatePartitions(s, 8) {
      val q = Events.cdcStream(s, changes)
        .writeStream.format("memory").queryName(name)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val last = s.table(name).select(
      col("k").as("o_orderkey"), col("status").as("o_orderstatus"),
      col("price").as("o_totalprice"), col("op"), col("seq"))
    Relational.applyCdc(base, last, Seq("o_orderkey"), "seq", "op")
      .orderBy("o_orderkey")
  }

  /** TPC-H Q2 shape (correlated MIN subquery): for each part, the
    * supplier(s) quoting exactly the part's minimum price. Decorrelates to
    * a per-key MIN aggregate joined back on (key, value == min) — the
    * join-back-on-aggregate form, vs Q17's scalar-comparison form. The
    * min is an actual data value, so the double equality is exact. */
  private def qTpchQ2(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select("l_partkey", "l_suppkey", "l_extendedprice")
    val minCost = li.groupBy(col("l_partkey").as("mc_partkey"))
      .agg(min(col("l_extendedprice")).as("min_price"))
    li.join(minCost,
        col("l_partkey") === col("mc_partkey") && col("l_extendedprice") === col("min_price"))
      .groupBy("l_partkey", "min_price")
      .agg(
        countDistinct(col("l_suppkey")).as("n_min_suppliers"),
        min(col("l_suppkey")).as("best_suppkey"))
      .orderBy("l_partkey")
  }

  /** TPC-H Q4 shape (EXISTS decorrelated to a left-semi join): orders placed
    * in 1996Q1 having at least one line shipped after the order date,
    * counted by priority. The semi join keeps the probe side pipelined —
    * no fan-out from multi-line matches, no DISTINCT repair afterwards. */
  private def qTpchQ4(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1996-04-01").cast("timestamp"))
    val li = Tables.lineitem(s, d).select("l_orderkey", "l_shipdate")
    ord.join(li,
        ord("o_orderkey") === li("l_orderkey") && li("l_shipdate") > ord("o_orderdate"),
        "left_semi")
      .groupBy("o_orderpriority")
      .agg(count(lit(1)).as("order_count"))
      .orderBy("o_orderpriority")
  }

  /** TPC-H Q21 shape (EXISTS + NOT EXISTS over the same fact): suppliers who
    * were the ONLY late shipper (>30 days after the order date) on a
    * multi-supplier order. Both correlated subqueries decorrelate to
    * self-joins on the order key — a semi join for "another supplier
    * exists" and an anti join for "no other supplier was late" — the plan
    * TPC-H uses to grade exactly this rewrite. The lateness flag is
    * computed once and reused by both sides. */
  private def qTpchQ21(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d).select("o_orderkey", "o_orderdate"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("late"))
    val l1 = li.filter(col("late")).select("l_orderkey", "l_suppkey").distinct()
    val others = li.select(col("l_orderkey").as("o2_orderkey"), col("l_suppkey").as("o2_suppkey"))
      .distinct()
    val lateOthers = li.filter(col("late"))
      .select(col("l_orderkey").as("o3_orderkey"), col("l_suppkey").as("o3_suppkey"))
      .distinct()
    l1.join(others,
        col("l_orderkey") === col("o2_orderkey") && col("l_suppkey") =!= col("o2_suppkey"),
        "left_semi")
      .join(lateOthers,
        col("l_orderkey") === col("o3_orderkey") && col("l_suppkey") =!= col("o3_suppkey"),
        "left_anti")
      .groupBy("l_suppkey")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("l_suppkey"))
      .limit(20)
  }

  /** Incremental aggregate maintenance: the monthly totals state is built
    * from two disjoint slices (simulating a standing state + an arriving
    * delta) and merged — by the monoid property the result is exactly the
    * full-table aggregate, which is what the oracle computes. Averages are
    * derived AFTER the merge from the exact decimal sums. */
  private def qIncrementalAgg(s: SparkSession, d: String): DataFrame = {
    val ord = Tables.orders(s, d)
      .withColumn("order_month", date_trunc("month", col("o_orderdate")).cast("date"))
    val split = lit("1996-07-01").cast("timestamp")
    val keys = Seq("o_orderstatus", "order_month")
    val prev = Relational.aggState(
      ord.filter(col("o_orderdate") < split), keys,
      sumCols = Seq("o_totalprice"), maxCols = Seq("o_totalprice"))
    val delta = Relational.aggState(
      ord.filter(col("o_orderdate") >= split), keys,
      sumCols = Seq("o_totalprice"), maxCols = Seq("o_totalprice"))
    Relational.mergeAggState(prev, delta, keys)
      .select(
        col("o_orderstatus"), col("order_month"), col("cnt"),
        col("sum_o_totalprice").cast("double").as("sum_price"),
        col("max_o_totalprice").as("max_price"),
        round(col("sum_o_totalprice").cast("double") / col("cnt"), 6).as("avg_price"))
      .orderBy("o_orderstatus", "order_month")
  }

  /** Z-order layout round trip: lineitem rewritten clustered on
    * (l_partkey, l_suppkey) — the multi-dimension data-skipping layout —
    * then read back; the oracle is the identity (clustering must lose
    * nothing). SinkSpec asserts the layout property itself (per-file
    * min/max tightness in BOTH dimensions). */
  private def qZorderLayout(s: SparkSession, d: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_zorder_").toFile
    tmpDir.deleteOnExit()
    val out = new java.io.File(tmpDir, "lineitem_z").getPath
    Sink.writeZOrdered(
      Tables.lineitem(s, d)
        .select(col("l_orderkey"), col("l_linenumber"), col("l_partkey"), col("l_suppkey")),
      out, Seq("l_partkey", "l_suppkey"), bits = 8, numFiles = 16)
    s.read.parquet(out)
      .orderBy("l_orderkey", "l_linenumber", "l_partkey", "l_suppkey")
  }

  private def qRedactPii(s: SparkSession, d: String): DataFrame =
    TextAnalysis.redactPii(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** Deterministic 80/10/10 train/valid/test split keyed on a content hash —
    * rerun-stable, corpus-growth-stable, zero shuffle. */
  private def qTrainTestSplit(s: SparkSession, d: String): DataFrame =
    Sampling.deterministicSplit(
      Tables.documents(s, d).select("doc_id"),
      key = "doc_id",
      fractions = Seq("train" -> 0.8, "valid" -> 0.1, "test" -> 0.1))
      .orderBy("doc_id")

  /** Stratified deterministic sample: 10 events per event_type chosen by md5
    * order of the id — runs on the native TopKPerKey operator. */
  private def qStratifiedSample(s: SparkSession, d: String): DataFrame =
    Sampling.stratifiedSample(
      Tables.events(s, d).select("event_type", "event_id"),
      strataCols = Seq("event_type"),
      idCol = "event_id",
      perKey = 10)
      .orderBy("event_type", "event_id")

  /** Sequence packing: documents into 512-token context chunks, 8 parallel
    * shards, deterministic doc_id order within shard. */
  private def qPackSequences(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      col("doc_id"),
      (col("doc_id") % 8).as("shard"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    Sampling.packSequences(docs, "shard", "doc_id", "n_tokens", budget = 512L)
      .orderBy("doc_id")
  }

  /** Packed training rows: the 512-token chunks of q_pack_sequences
    * materialized as one text row per (shard, chunk) via deterministic
    * ordered aggregation. */
  private def qPackText(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      col("doc_id"),
      col("text"),
      (col("doc_id") % 8).as("shard"),
      size(split(col("text"), " ")).cast("long").as("n_tokens"))
    Sampling.packText(
      Sampling.packSequences(docs, "shard", "doc_id", "n_tokens", budget = 512L),
      "shard", "doc_id", "n_tokens", "text", sep = " <|doc|> ")
      .orderBy("shard", "chunk_id")
  }

  /** Deterministic data mixture: three synthetic sources weighted 0.5 / 2.0
    * / 1.25 epochs, replicated/sampled by content hash — the corpus
    * assembly step, hash-matched against the same md5 arithmetic in
    * DuckDB. */
  /** Temperature (alpha = 0.7) source-balancing weights over the corpus's
    * own source column — the derived input for q_weighted_mix's map. */
  private def qTemperatureWeights(s: SparkSession, d: String): DataFrame =
    Sampling.temperatureWeights(Tables.documents(s, d), "source", alpha = 0.7)
      .orderBy("source")

  private def qWeightedMix(s: SparkSession, d: String): DataFrame =
    Sampling.weightedMix(
      Tables.documents(s, d).select(
        col("doc_id"),
        when(col("doc_id") % 3 === 0, "web")
          .when(col("doc_id") % 3 === 1, "books")
          .otherwise("code").as("source")),
      sourceCol = "source",
      keyCol = "doc_id",
      weights = Map("web" -> 0.5, "books" -> 2.0, "code" -> 1.25))
      .orderBy("doc_id", "epoch")

  /** Unit-normalized embeddings, exploded to scalar rows; per-row
    * left-to-right accumulation matches DuckDB's list_aggregate order so
    * even the unrounded doubles agree — rounded to 6dp anyway. */
  private def qL2Normalize(s: SparkSession, d: String): DataFrame =
    Tables.embeddings(s, d)
      .filter(col("vec_id") % 10 === 0)
      .select(col("vec_id"), posexplode(graft.functions.l2_normalize(col("embedding"))).as(Seq("pos", "v")))
      .select(col("vec_id"), col("pos"), round(col("v"), 6).as("v"))
      .orderBy("vec_id", "pos")

  /** Mean-pooled embedding per label class, exploded to (label, pos, m)
    * scalar rows for the cross-engine hash compare. */
  private def qMeanPool(s: SparkSession, d: String): DataFrame =
    Similarity.meanPoolEmbeddings(Tables.embeddings(s, d), Seq("label"), "embedding")
      .select(col("label"), posexplode(col("mean_embedding")).as(Seq("pos", "m")))
      .orderBy("label", "pos")

  /** STREAMING decontamination — the stream-STATIC broadcast join shape: the
    * benchmark gram set is a static table built once, the corpus streams
    * through (AvailableNow file source), each micro-batch joining the
    * broadcast grams map-side; per-doc hit counts aggregate in complete
    * mode and hash-match the batch oracle. (n_distinct_hits is omitted —
    * distinct aggregation is unsupported on streams; the batch twin
    * covers it.) */
  private def qDecontaminateStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = Tables.documents(s, d)
    val grams = docs.filter(col("doc_id") % 50 === 0)
      .select(explode(Decontaminate.wordNgrams(col("text"), 4)).as("__gram"))
      .distinct()
    val raw = s.read.parquet(s"$d/documents.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val name = "graft_decontaminate_stream"
    withStatePartitions(s, 8) {
      val q = stream.filter(col("doc_id") % 50 =!= 0)
        .select(col("doc_id"), explode(Decontaminate.wordNgrams(col("text"), 4)).as("__gram"))
        .join(broadcast(grams), "__gram")
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_hits"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("doc_id")
  }

  /** Corpus overlap between the even- and odd-doc halves: distinct
    * 3-gram counts per side, shared count, Jaccard. */
  private def qCorpusOverlap(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    Decontaminate.corpusOverlap(
      docs.filter(col("doc_id") % 2 === 0), "text",
      docs.filter(col("doc_id") % 2 === 1), "text",
      n = 3)
  }

  /** Character-entropy quality score per document. */
  private def qCharEntropy(s: SparkSession, d: String): DataFrame =
    TextAnalysis.charEntropy(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** Corpus boilerplate-line removal (CCNet/C4 common-line filter). The
    * synthetic documents are single-line, so a deterministic regexp first
    * inserts a newline after every 3rd word — both engines synthesize
    * identical lines — then lines occurring in >= 3 distinct documents are
    * stripped and the texts reassembled in order. */
  private def qBoilerplate(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      col("doc_id"),
      regexp_replace(col("text"), "((?:\\S+ ){2}\\S+) ", "$1\n").as("text"))
    TextAnalysis.removeBoilerplate(docs, "doc_id", "text", minDocs = 3)
      .orderBy("doc_id")
  }

  /** Cross-document keep-first line dedup (C4-style) over the same
    * synthesized line grain as q_boilerplate. */
  private def qDedupLines(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(
      col("doc_id"),
      regexp_replace(col("text"), "((?:\\S+ ){2}\\S+) ", "$1\n").as("text"))
    TextAnalysis.dedupLinesKeepFirst(docs, "doc_id", "text")
      .orderBy("doc_id")
  }

  /** Per-customer monthly order spine with gaps zero-filled. */
  private def qGapFill(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(
        col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    Temporal.fillGaps(
      monthly, Seq("o_custkey"), "month", stepMonths = 1,
      defaults = Seq("n_orders" -> lit(0L), "revenue" -> lit(0.0)))
      .orderBy("o_custkey", "month")
  }

  /** Sparse-to-grid resample with LOCF: the per-customer month spine from
    * [[Temporal.fillGaps]] (orders counted, gaps NULL) forward-filled so
    * each gap month carries the last known revenue. */
  private def qForwardFill(s: SparkSession, d: String): DataFrame = {
    val monthly = Tables.orders(s, d)
      .groupBy(
        col("o_custkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("month"))
      .agg(
        count(lit(1)).as("n_orders"),
        sum(col("o_totalprice").cast("decimal(18,2)")).cast("double").as("revenue"))
    val spine = Temporal.fillGaps(
      monthly, Seq("o_custkey"), "month", stepMonths = 1,
      defaults = Seq("n_orders" -> lit(0L)))
    Temporal.forwardFill(spine, Seq("o_custkey"), "month", Seq("revenue"))
      .orderBy("o_custkey", "month")
  }

  /** SCD2 validity intervals over each user's daily dominant event type
    * (the last event of the day, deterministically by (ts, event_id)). */
  private def qScd2(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .select(
        col("user_id"),
        col("ts").cast("timestamp").cast("date").as("day"),
        struct(
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_id"),
          col("event_type")).as("__e"))
      .groupBy(col("user_id"), col("day"))
      .agg(max(col("__e")).as("__m"))
      .select(col("user_id"), col("day"), col("__m.event_type").as("event_type"))
    Temporal.scd2(daily, Seq("user_id"), "day", Seq("event_type"))
      .orderBy("user_id", "valid_from")
  }

  /** 20-bin equi-width histogram of the event value. */
  private def qHistogram(s: SparkSession, d: String): DataFrame =
    Sketches.histogram(Tables.events(s, d), "value", nBins = 20)
      .orderBy("bin")

  /** Deterministic Pearson correlation matrix over lineitem's numerics.
    * l_extendedprice is pre-scaled by 1e-5 (corr is scale-invariant) so the
    * fixed-point moment terms stay O(1). */
  private def qCorrMatrix(s: SparkSession, d: String): DataFrame =
    Relational.corrMatrix(
      Tables.lineitem(s, d)
        .withColumn("l_extendedprice", col("l_extendedprice") / 100000.0),
      Seq("l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy("col_a", "col_b")

  /** One-pass column profiler over lineitem (ingestion audit). */
  private def qProfile(s: SparkSession, d: String): DataFrame =
    Relational.profile(
      Tables.lineitem(s, d),
      Seq("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag", "l_linestatus"))
      .orderBy("col_name")

  /** Exact ECDF (percentile-rank) normalization of the event value score,
    * quantized to 2 dp so the histogram stays small at any scale. */
  private def qEcdf(s: SparkSession, d: String): DataFrame =
    Sketches.ecdfNormalize(
      Tables.events(s, d).select(col("event_id"), col("value")), "value", dp = 2)
      .select(col("event_id"), round(col("value"), 2).as("value_q"), col("percentile"))
      .orderBy("event_id")

  /** TPC-H Q3-shaped shipping-priority query: the classic 3-table star join
    * (segment-filtered customers → orders → lineitem) with pushed-down date
    * filters, per-order revenue, global top-10 via TakeOrderedAndProject
    * (bounded per-partition heaps, no full sort). Demonstrates Catalyst's
    * join ordering + broadcast choice on the canonical OLAP shape. */
  private def qTpchQ3(s: SparkSession, d: String): DataFrame = {
    val cutoff = "1997-01-01"
    val cust = Tables.customer(s, d).filter(col("c_mktsegment") === "BUILDING")
    val ord = Tables.orders(s, d).filter(col("o_orderdate") < lit(cutoff).cast("timestamp"))
    val li = Tables.lineitem(s, d).filter(col("l_shipdate") > lit(cutoff).cast("timestamp"))
    li.join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("l_orderkey"), col("o_orderdate").cast("date").as("o_orderdate"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
        .cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("l_orderkey").asc)
      .limit(10)
  }

  /** TPC-H Q5-shaped local-supplier-volume query: the 6-table snowflake
    * (region → nation → customer + supplier co-nationality → orders →
    * lineitem) with all four dimension sides broadcast, one fact shuffle. */
  private def qTpchQ5(s: SparkSession, d: String): DataFrame = {
    val asia = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val nat = Tables.nation(s, d)
      .join(broadcast(asia), col("n_regionkey") === col("r_regionkey"))
      .select(col("n_nationkey"), col("n_name"))
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val supp = Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey"))
    val ord = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-01-01").cast("timestamp"))
      .select(col("o_orderkey"), col("o_custkey"))
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_suppkey"), col("l_extendedprice"), col("l_discount"))
      .join(ord, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .join(broadcast(supp),
        col("l_suppkey") === col("s_suppkey") && col("c_nationkey") === col("s_nationkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(sum(round(col("l_extendedprice") * (lit(1.0) - col("l_discount")), 2)
        .cast("decimal(18,2)")).cast("double").as("revenue"))
      .orderBy(col("revenue").desc, col("n_name").asc)
  }

  /** TPC-H Q18-shaped large-volume-customer query: the classic HAVING
    * subquery (orders whose total lineitem quantity exceeds a threshold)
    * re-joined to orders and customer for the report, global top-100.
    * Spark-first shape: lineitem is aggregated ONCE (the query's only
    * shuffle); the selectivity-bounded big-order set then broadcasts into
    * the orders scan, and that reduced join result broadcasts into the
    * customer scan — at 100 TB neither orders nor customer ever shuffles,
    * because each probe side is bounded by the HAVING threshold, not by
    * table size. Top-100 runs as TakeOrderedAndProject (bounded heaps). */
  private def qTpchQ18(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_quantity"))
      .groupBy(col("l_orderkey"))
      .agg(sum(col("l_quantity")).as("total_qty"))
      .filter(col("total_qty") > 300.0)
    val hot = Tables.orders(s, d)
      .join(broadcast(bigOrders), col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderkey"), col("o_custkey"),
        col("o_orderdate").cast("date").as("o_orderdate"),
        round(col("o_totalprice"), 2).as("o_totalprice"), col("total_qty"))
    Tables.customer(s, d)
      .select(col("c_custkey"), col("c_name"))
      .join(broadcast(hot), col("c_custkey") === col("o_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), col("o_totalprice"), col("total_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderdate").asc, col("o_orderkey").asc)
      .limit(100)
  }

  /** TPC-H Q17-shaped small-quantity-order query: the classic correlated
    * subquery (l_quantity < 0.2 * the part's average quantity),
    * decorrelated Spark-first — the brand-filtered part keys broadcast
    * into lineitem, the per-part averages reduce with ONE partial
    * aggregate (the query's only shuffle, carrying brand-filtered rows
    * only), and the tiny threshold table broadcasts back onto a second
    * lineitem scan. Averages of integer-valued quantities are exact in
    * double, so the threshold comparison reproduces across engines. */
  private def qTpchQ17(s: SparkSession, d: String): DataFrame = {
    val target = Tables.part(s, d)
      .filter(col("p_brand") === "Brand#1")
      .select(col("p_partkey"))
    val li = Tables.lineitem(s, d)
      .select(col("l_partkey"), col("l_quantity"), col("l_extendedprice"))
    val limits = li
      .join(broadcast(target), col("l_partkey") === col("p_partkey"))
      .groupBy(col("l_partkey"))
      .agg((lit(0.2) * avg(col("l_quantity"))).as("__lim"))
    li.join(broadcast(limits), Seq("l_partkey"))
      .filter(col("l_quantity") < col("__lim"))
      .agg(
        count(lit(1)).as("n_small"),
        round(dsum(col("l_extendedprice")) / 7.0, 6).as("avg_yearly"))
  }

  /** Top user-journey paths per gap session. */
  private def qSessionPaths(s: SparkSession, d: String): DataFrame =
    Funnel.sessionPaths(Tables.events(s, d), gapSeconds = 1800, topN = 20)

  /** Sequential 2-patterns (X267): gap-allowed a→b support over 30-minute
    * sessions — what contiguous paths and adjacent transitions miss. */
  private def qSeqPatterns(s: SparkSession, d: String): DataFrame =
    Funnel.sequentialPatterns(Tables.events(s, d), gapSeconds = 1800, topN = 25)

  /** Weekly retention cohorts anchored on signup events. */
  private def qRetention(s: SparkSession, d: String): DataFrame =
    Funnel.retentionCohorts(Tables.events(s, d), "signup")
      .orderBy("cohort_week", "week_offset")

  /** Referential-integrity audit: orders pointing at customers missing from
    * a (simulated stale) dimension snapshot, grouped to an orphan report. */
  private def qFkCheck(s: SparkSession, d: String): DataFrame = {
    val staleDim = Tables.customer(s, d).filter(col("c_custkey") < 1200)
    Relational.fkOrphans(
      Tables.orders(s, d), broadcast(staleDim), Seq("o_custkey" -> "c_custkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orphans"), min(col("o_orderkey")).as("first_orderkey"))
      .orderBy("o_orderpriority")
  }

  /** Deterministic weighted sample (exponential clocks on a content hash):
    * 50 documents drawn ∝ length, reproducible in any engine. */
  private def qWeightedSample(s: SparkSession, d: String): DataFrame =
    Sampling.weightedSample(
      Tables.documents(s, d).select(col("doc_id"), col("n_chars")),
      "doc_id", "n_chars", n = 50)
      .select(col("doc_id"), col("n_chars"), round(col("__draw"), 6).as("draw"))
      .orderBy("draw", "doc_id")

  /** Per-event-type (grouped) percentile rank of the event value. */
  private def qEcdfGrouped(s: SparkSession, d: String): DataFrame =
    Sketches.ecdfNormalize(
      Tables.events(s, d).select(col("event_id"), col("event_type"), col("value")),
      "value", dp = 2, keyCols = Seq("event_type"))
      .select(
        col("event_id"), col("event_type"),
        round(col("value"), 2).as("value_q"), col("percentile"))
      .orderBy("event_id")

  /** Sketch-column cube: daily per-type HLL sketches of distinct users,
    * rolled up to event_type by MERGING sketches (never re-reading raw
    * rows). Rows-only by design — Datasketches HLL estimates aren't
    * SQL-reproducible; SketchesSpec pins merge-vs-direct equality and the
    * error bound vs exact distinct counts. */
  private def qSketchCube(s: SparkSession, d: String): DataFrame = {
    // lgK = 18: exact coupon-set regime for the gate cardinalities (<= 1.5k
    // users/type), so the rollup-by-merge readout equals COUNT(DISTINCT) and
    // the cube is SQL-oracle-gated; production cubes keep lgK = 12.
    val cube = Sketches.sketchCube(
      Tables.events(s, d)
        .select(col("event_type"), col("ts").cast("timestamp").cast("date").as("day"), col("user_id")),
      Seq("event_type", "day"), "user_id", lgK = 18)
    Sketches.rollupSketchCube(cube, Seq("event_type"))
      .orderBy("event_type")
  }

  /** Mergeable KLL quantile cube (the quantile twin of q_sketch_cube):
    * per-(event_type, day) binary sketches of the event value, rolled up to
    * event_type by register merge — quantile analytics that never re-scan
    * raw data. Gate regime: k = 8192 exceeds the per-type row count at the
    * gate scale factors, so no compactor ever fires, the merged sketch
    * retains EVERY value, and the inclusive-rank readout equals the exact
    * order statistic at rank ceil(p*n) — a SQL oracle. Production cubes
    * keep k = 200; SketchesSpec pins that regime's rank-error bound and
    * merge-vs-direct agreement. */
  private def qQuantileCube(s: SparkSession, d: String): DataFrame = {
    val cube = Sketches.quantileCube(
      Tables.events(s, d)
        .select(col("event_type"), col("ts").cast("timestamp").cast("date").as("day"), col("value")),
      Seq("event_type", "day"), "value", k = 8192)
    Sketches.rollupQuantileCube(cube, Seq("event_type"),
        probs = Seq(0.25, 0.5, 0.75, 0.95), k = 8192)
      .select(
        col("event_type"), col("n_rows"),
        posexplode(col("quantiles")).as(Seq("q_idx", "estimate")))
      .orderBy("event_type", "q_idx")
  }

  /** Streaming twin of [[qQuantileCube]]: the same mergeable KLL aggregate
    * maintained by a streaming groupBy (sketch partials live in the state
    * store and merge across micro-batches), then the same readout path. */
  private def qQuantileCubeStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_quantile_cube_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .groupBy(col("event_type"))
        .agg(
          graft.functions.kll_sketch(col("value"), k = 8192).as("kll"),
          count(lit(1)).as("n_rows"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name)
      .withColumn("quantiles",
        graft.functions.kll_quantiles(col("kll"), Seq(0.25, 0.5, 0.75, 0.95)))
      .select(
        col("event_type"), col("n_rows"),
        posexplode(col("quantiles")).as(Seq("q_idx", "estimate")))
      .orderBy("event_type", "q_idx")
  }

  /** Count–Min frequency cube in the oracle-checkable regime: per-day CMS
    * sketches over event_type (fine grain), rolled up by counter-wise merge
    * — identical to sketching the whole stream — then point estimates read
    * out for every observed type. With 5 distinct types against a
    * depth-5 × width-8192 sketch no counter collides, so every estimate is
    * EXACT and the oracle is a plain GROUP BY count. The merged sketch is a
    * single row broadcast into the (dim-sized) type list. */
  private def qCmsCounts(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_type"), col("ts").cast("date").as("day"))
    val merged = ev.groupBy("day")
      .agg(graft.functions.cms_sketch(col("event_type")).as("sk"))
      .agg(graft.functions.cms_merge(col("sk")).as("sk"))
    ev.select("event_type").distinct()
      .crossJoin(broadcast(merged))
      .select(col("event_type"),
        graft.functions.cms_estimate(col("sk"), col("event_type")).as("est_count"))
      .orderBy("event_type")
  }

  /** STREAMING calibration monitor: per-bin (n, Σscore_q, n_pos) partials
    * accumulate in the state store (integer state — stream == batch
    * exactly), the reliability/ECE assembly runs in batch off the sink;
    * shares q_calibration's oracle verbatim. */
  private def qCalibrationStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val ev = Tables.events(s, d)
    val mxv = ev.agg(max(col("value"))).head().getDouble(0)
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_calibration_stream"
    withStatePartitions(s, 8) {
      val sc = col("value") / mxv
      val q = stream
        .withColumn("__bin", least(floor(sc * 10).cast("long"), lit(9L)))
        .withColumn("__q", floor(sc * 1e9 + 0.5).cast("long"))
        .withColumn("__pos", (col("event_type") === "purchase").cast("long"))
        .groupBy(col("__bin").as("bin"))
        .agg(count(lit(1)).as("n"), sum(col("__q")).as("__sq"),
          sum(col("__pos")).as("n_pos"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val binned = s.table(name)
    val total = binned.agg(sum(col("n")).as("__nt"))
    binned.crossJoin(broadcast(total))
      .withColumn("mean_score", (col("__sq").cast("double") / col("n")) / 1e9)
      .withColumn("obs_rate", col("n_pos").cast("double") / col("n"))
      .withColumn("gap", abs(col("mean_score") - col("obs_rate")))
      .withColumn("ece_term", (col("n").cast("double") / col("__nt")) * col("gap"))
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("mean_score"), 9).as("mean_score"),
        round(col("obs_rate"), 9).as("obs_rate"),
        round(col("ece_term"), 9).as("ece_term"))
      .orderBy("bin")
  }

  /** Schema contract over the orders table: one contracted column typed
    * wrong on purpose (o_orderstatus as int) and one not contracted
    * (o_orderpriority) — the report must call out exactly those. */
  private def qSchemaContract(s: SparkSession, d: String): DataFrame =
    Quality.schemaContract(Tables.orders(s, d), Seq(
        "o_orderkey" -> "bigint",
        "o_custkey" -> "bigint",
        "o_orderstatus" -> "int",          // deliberate mismatch: actual string
        "o_totalprice" -> "double",
        "o_orderdate" -> "timestamp_ntz",  // parquet reads as NTZ here
        "o_missing_col" -> "string"))      // deliberate absence
      .orderBy("column")

  /** Degree-tail exponent of the co-purchase graph (Hill estimator at
    * d_min = 8): decides whether the hub tail needs skew guards. */
  private def qDegreeTail(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("k"), col("l_partkey"))
    val pairs = li.select(col("k"), col("l_partkey").as("pa"))
      .join(li.select(col("k"), col("l_partkey").as("pb")), "k")
      .filter(col("pa") =!= col("pb"))
    Graph.degreeTailAlpha(pairs, "pa", "pb", dMin = 8L)
  }

  /** Density heatmap: 8×8 equi-width grid over (quantity, extendedprice)
    * — occupied cells only, both axes against broadcast bounds. */
  private def qHistogram2d(s: SparkSession, d: String): DataFrame =
    Sketches.histogram2d(
        Tables.lineitem(s, d), "l_quantity", "l_extendedprice", nx = 8, ny = 8)
      .orderBy("bin_x", "bin_y")

  /** Linear multi-touch attribution: clicks and views in the 1800 s
    * lookback share each purchase's credit equally; credit quantized to
    * exact 1e9-div-k longs so channel totals are exact sums. */
  private def qAttributionLinear(s: SparkSession, d: String): DataFrame =
    Funnel.linearAttribution(
        Tables.events(s, d), "purchase", Seq("click", "view"), windowSec = 1800L)
      .orderBy("channel")

  /** Floored running wallet balance per user (credits = purchase/signup
    * cents, debits = the rest, never below zero): the Lindley reflection
    * closed form — two stacked windows, exact longs. */
  private def qWalletBalance(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type").isin("purchase", "signup"),
          floor(col("value") * 100 + 0.5).cast("long"))
          .otherwise(-floor(col("value") * 100 + 0.5).cast("long")).as("delta"))
    Temporal.flooredRunningBalance(ev, Seq("user_id"),
        Seq(col("ts"), col("event_id")), "delta")
      .groupBy(col("user_id"))
      .agg(
        max_by(col("balance"), struct(col("ts"), col("event_id"))).as("end_balance"),
        max(col("balance")).as("peak_balance"),
        sum((col("balance") === 0L).cast("long")).as("n_floor_touches"),
        count(lit(1)).as("n_events"))
      .orderBy("user_id")
  }

  /** Changepoint scan over each event type's daily revenue series: the
    * split day maximizing between-segment SSE reduction, exact-cent
    * prefix sums, argmax replayed in SQL. */
  private def qChangepoint(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
    Temporal.changepoint(daily, Seq("event_type"), "day", "v")
      .orderBy("event_type")
  }

  /** Holt double-exponential smoothing of each event type's daily revenue
    * (α=0.3, β=0.1): level+trend recursion as a declarative in-row
    * aggregate, replayed step-for-step by a recursive-CTE oracle. */
  private def qHolt(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
    Temporal.holtSmooth(daily, Seq("event_type"), "day", "v", alpha = 0.3, beta = 0.1)
      .orderBy("event_type")
  }

  /** Kalman local-level filter over each event type's daily revenue —
    * optimal recursive smoothing with Q=1e4 (slow drift), R=1e8 (noisy
    * daily observations in cents²). */
  private def qKalman(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
    Temporal.kalmanLevel(daily, Seq("event_type"), "day", "v",
        q = 1e4, r = 1e8)
      .orderBy("event_type")
  }

  /** Holt–Winters weekly-seasonal smoothing of each event type's daily
    * revenue — level/trend/seasonal state after the full fold, bit-exact
    * vs a recursive-CTE replay carrying the seasonal vector. */
  private def qHoltWinters(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
    Temporal.holtWinters(daily, Seq("event_type"), "day", "v",
        period = 7, alpha = 0.3, beta = 0.1, gamma = 0.2)
      .orderBy("event_type")
  }

  /** SAX words (8 segments, 4-letter alphabet) for each event type's daily
    * revenue series — bit-deterministic symbols, SQL-replayed. */
  private def qSax(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
    Temporal.saxWords(daily, Seq("event_type"), "day", "v", segments = 8)
      .orderBy("event_type")
  }

  /** Hurst exponent (R/S) of each event type's daily revenue — is the
    * series trending, mean-reverting, or a random walk. */
  private def qHurst(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
    Temporal.hurstRS(daily, Seq("event_type"), "day", "v", sizes = Seq(4, 8, 16))
      .orderBy("event_type")
  }

  /** Naive vs weekly-seasonal-naive backtest of each event type's daily
    * revenue — exact-cent error sums, MASE as the persistence gate. */
  private def qForecastBacktest(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
    Temporal.forecastBacktest(daily, Seq("event_type"), "day", "v", season = 7)
      .orderBy("event_type")
  }

  /** Kruskal–Wallis rank ANOVA: does `value` distribute identically across
    * the five event types? Exact midrank machinery, tie-corrected H. */
  private def qKruskalWallis(s: SparkSession, d: String): DataFrame =
    Sketches.kruskalWallis(Tables.events(s, d), "event_type", "value")

  /** One-way ANOVA F of event value (exact cents) across event types — the
    * parametric companion readout to q_kruskal_wallis. */
  private def qAnova(s: SparkSession, d: String): DataFrame =
    Sketches.anovaF(
      Tables.events(s, d).select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents")),
      "event_type", "cents")

  /** Theil between/within decomposition of spend inequality across market
    * segments — one row, additivity gap as its own audit. */
  private def qTheilDecomp(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .join(broadcast(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    Sketches.theilDecomposition(spend, "c_mktsegment", "cents")
  }

  /** Theil T inequality of customer spend per market segment — the
    * decomposable companion to the Gini/Lorenz readouts. */
  private def qTheil(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .join(broadcast(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    Sketches.theilIndex(spend, Seq("c_mktsegment"), "cents")
      .orderBy("c_mktsegment")
  }

  /** Lorenz decile table of customer spend per market segment — the curve
    * behind the Gini number: cumulative spend share per spend decile. */
  private def qLorenz(s: SparkSession, d: String): DataFrame = {
    val spend = Tables.orders(s, d)
      .groupBy(col("o_custkey"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
      .join(broadcast(Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))),
        col("o_custkey") === col("c_custkey"))
    Sketches.lorenzDeciles(spend, Seq("c_mktsegment"), "cents", Seq("o_custkey"))
      .orderBy("c_mktsegment", "decile")
  }

  /** Fleiss' kappa across three deterministic event labelers — the
    * multi-annotator agreement gate. */
  private def qFleissKappa(s: SparkSession, d: String): DataFrame = {
    val labeled = Tables.events(s, d).select(
      when(col("value") < 100.0, "low").when(col("value") < 500.0, "mid")
        .otherwise("high").as("rater_a"),
      when(get_json_object(col("props"), "$.k").cast("long") < 33L, "low")
        .when(get_json_object(col("props"), "$.k").cast("long") < 66L, "mid")
        .otherwise("high").as("rater_b"),
      when(col("event_id") % 3 === 0, "low").when(col("event_id") % 3 === 1, "mid")
        .otherwise("high").as("rater_c"))
    Sketches.fleissKappa(labeled, Seq("rater_a", "rater_b", "rater_c"))
  }

  /** Cohen's kappa between two deterministic event labelers (value band
    * vs the props `k` band) — the chance-corrected agreement gate. */
  private def qCohenKappa(s: SparkSession, d: String): DataFrame = {
    val labeled = Tables.events(s, d).select(
      when(col("value") < 100.0, "low").when(col("value") < 500.0, "mid")
        .otherwise("high").as("rater_a"),
      when(get_json_object(col("props"), "$.k").cast("long") < 33L, "low")
        .when(get_json_object(col("props"), "$.k").cast("long") < 66L, "mid")
        .otherwise("high").as("rater_b"))
    Sketches.cohenKappa(labeled, "rater_a", "rater_b")
  }

  /** Cronbach's alpha of the five event-type "items" over user event
    * counts — do the activity dimensions move together. */
  private def qCronbach(s: SparkSession, d: String): DataFrame =
    Sketches.cronbachAlpha(
      Tables.events(s, d).select(col("user_id"), col("event_type"), lit(1L).as("one")),
      "user_id", "event_type", "one")

  /** Kendall tau-b between each event type's daily revenue and daily
    * volume — exact integer concordance over the bounded calendar series. */
  private def qKendall(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("x"),
        count(lit(1)).as("y"))
    Sketches.kendallTau(daily, Seq("event_type"), "x", "y")
      .orderBy("event_type")
  }

  /** Mantel–Haenszel pooled odds ratio (event-type strata): heavy users
    * (even user id as the deterministic exposure proxy) vs high-value
    * events — the crude-vs-adjusted Simpson's-paradox gate. */
  private def qMantelHaenszel(s: SparkSession, d: String): DataFrame =
    Sketches.mantelHaenszel(
      Tables.events(s, d).select(col("event_type"),
        (col("user_id") % 2 === 0).as("exposed"),
        (col("value") > 100.0).as("outcome")),
      "event_type", "exposed", "outcome")

  /** CMH χ² (X322) on the q_mantel_haenszel strata — the adjusted-
    * association verdict beside the pooled OR estimate. */
  private def qCmh(s: SparkSession, d: String): DataFrame =
    Sketches.cmhTest(
      Tables.events(s, d).select(col("event_type"),
        (col("user_id") % 2 === 0).as("exposed"),
        (col("value") > 100.0).as("outcome")),
      "event_type", "exposed", "outcome")

  /** Huber robust mean (k = 100 dollars, 3 IRLS sweeps) of event cents per
    * type, next to the outlier-sensitive plain mean. */
  private def qHuber(s: SparkSession, d: String): DataFrame =
    Sketches.huberLocation(
      Tables.events(s, d).select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents")),
      "event_type", "cents", k = 10000L, iters = 3)
      .orderBy("event_type")

  /** Tukey-style pairwise contrasts between event types' mean values —
    * the post-hoc readout after q_anova's omnibus F. */
  private def qTukey(s: SparkSession, d: String): DataFrame =
    Sketches.tukeyPairs(
      Tables.events(s, d).select(col("event_type"),
        floor(col("value") * 100 + 0.5).cast("long").as("cents")),
      "event_type", "cents")
      .orderBy("group_a", "group_b")

  /** Zipf slope of the corpus word-frequency curve over the top-100 words
    * — the one-row vocabulary-health gate. */
  private def qZipf(s: SparkSession, d: String): DataFrame =
    TextAnalysis.zipfFit(Tables.documents(s, d), "text", topN = 100)

  /** Heaps' law vocabulary-growth fit over the corpus in doc_id order —
    * the growth-curve sibling of q_zipf; first-occurrence aggregate +
    * two-pass prefix sums, OLS from 1e-9-quantized ln points. */
  private def qHeaps(s: SparkSession, d: String): DataFrame =
    TextAnalysis.heapsFit(Tables.documents(s, d), "doc_id", "text")

  /** Top-50 PMI collocations (support >= 5) over the documents corpus —
    * exact-ratio ranking, ln only prices the output. */
  private def qCollocations(s: SparkSession, d: String): DataFrame =
    TextAnalysis.collocations(Tables.documents(s, d), "text", minCount = 5L, topN = 50)

  /** Chao1 + Good–Turing vocabulary coverage — how much vocabulary the
    * corpus has not seen yet. */
  private def qVocabRichness(s: SparkSession, d: String): DataFrame =
    TextAnalysis.vocabRichness(Tables.documents(s, d), "text")

  /** Corpus vocabulary health: type-token ratio + hapax fraction. */
  private def qVocabStats(s: SparkSession, d: String): DataFrame =
    TextAnalysis.vocabStats(Tables.documents(s, d), "text")

  /** Integer-grid k-means (k=3, 3 Lloyd rounds) over per-user
    * (event count, whole-dollar spend) — every iteration exact, the whole
    * run replayed by a chained-CTE oracle. */
  private def qKmeans(s: SparkSession, d: String): DataFrame = {
    val pts = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        floor(sum(floor(col("value") * 100 + 0.5).cast("long")) / lit(100.0))
          .cast("long").as("dollars"))
    Similarity.kMeansGrid(pts, Seq("n_events", "dollars"), k = 3, iters = 3)
      .orderBy("cluster")
  }

  /** Exact-integer DTW distances between the weekly revenue profiles of
    * every market-segment pair — which segments share a weekly shape even
    * when the phase wobbles. */
  private def qDtwProfiles(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"),
      (datediff(col("o_orderdate").cast("date"),
        lit("1990-01-01").cast("date")) % 7).cast("int").as("dow"))
    val seg = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val prof = o.join(broadcast(seg), col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_mktsegment"), col("dow"))
      .agg(sum(col("cents")).as("v"))
      .groupBy(col("c_mktsegment"))
      .agg(transform(sort_array(collect_list(struct(col("dow"), col("v")))),
        x => x("v")).as("series"))
    val right = prof.select(col("c_mktsegment").as("seg_b"),
      col("series").as("series_b"))
    prof.select(col("c_mktsegment").as("seg_a"), col("series").as("series_a"))
      .crossJoin(right)
      .filter(col("seg_a") < col("seg_b"))
      .select(col("seg_a"), col("seg_b"),
        dtw_distance(col("series_a"), col("series_b")).as("dtw"))
      .orderBy("seg_a", "seg_b")
  }

  /** Cross-correlation of daily revenue against daily order count at lags
    * −7..7 — the lead/lag discovery readout next to q_acf. */
  private def qCcf(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderdate").cast("date").as("day"))
      .agg(
        count(lit(1)).as("n_orders"),
        floor(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")) /
          lit(100.0)).cast("long").as("dollars"))
    Temporal.ccf(daily, Nil, "day", "dollars", "n_orders", maxLag = 7)
      .orderBy("lag")
  }

  /** Internal quality of the 3-means user clustering: exact-rational
    * Calinski–Harabasz + quantized Davies–Bouldin against the fitted
    * integer-grid centroids. */
  private def qClusterQuality(s: SparkSession, d: String): DataFrame = {
    val pts = Tables.events(s, d)
      .groupBy(col("user_id"))
      .agg(
        count(lit(1)).as("n_events"),
        floor(sum(floor(col("value") * 100 + 0.5).cast("long")) / lit(100.0))
          .cast("long").as("dollars"))
    val cents = Similarity.kMeansGrid(pts, Seq("n_events", "dollars"),
        k = 3, iters = 3)
      .orderBy("cluster").collect().toSeq
      .map(r => (r.getInt(0), Seq(r.getLong(r.fieldIndex("n_events")),
        r.getLong(r.fieldIndex("dollars")))))
    Similarity.clusterQuality(pts, Seq("n_events", "dollars"), cents)
  }

  /** Spearman rank correlation of quantity vs extended price per return
    * flag — monotone-association readout robust to the price's skew. */
  private def qSpearman(s: SparkSession, d: String): DataFrame =
    Sketches.spearmanCorr(
      Tables.lineitem(s, d), Seq("l_returnflag"), "l_quantity", "l_extendedprice")
      .orderBy("l_returnflag")

  /** Shannon/Simpson diversity of each user's event-type mix — the
    * corpus-balance audit at user grain. */
  private def qDiversity(s: SparkSession, d: String): DataFrame =
    Sketches.diversityIndex(Tables.events(s, d), Seq("user_id"), "event_type")
      .orderBy("user_id")

  /** Time-decay attribution: 2^(−Δt/900 s) recency weights over the same
    * 1800 s lookback as the linear twin, all credit arithmetic on exact
    * quantized longs. */
  private def qAttributionDecay(s: SparkSession, d: String): DataFrame =
    Funnel.timeDecayAttribution(
        Tables.events(s, d), "purchase", Seq("click", "view"),
        windowSec = 1800L, halfLifeSec = 900L)
      .orderBy("channel")

  /** LTTB-downsample the daily revenue series per order priority to 24
    * points — rows-only by design (each pick depends on the previous
    * selection); spike-preservation and endpoint invariants spec-pinned. */
  private def qLttb(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .groupBy(col("o_orderpriority").as("prio"),
        datediff(col("o_orderdate").cast("date"), lit("1995-01-01").cast("date"))
          .cast("long").as("day"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
    Temporal.lttbDownsample(daily, Seq("prio"), "day", "cents", threshold = 24)
      .orderBy("prio", "day")
  }

  /** Calibration audit of a toy purchase-propensity score (event value
    * scaled to [0,1] against the corpus max) vs the actual purchase
    * label: reliability bins + ECE terms, exact quantized-long means. */
  private def qCalibration(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val mx = ev.agg(max(col("value")).as("__mx"))
    val scored = ev.crossJoin(broadcast(mx))
      .withColumn("score", col("value") / col("__mx"))
    Quality.calibration(scored, "score", col("event_type") === "purchase", bins = 10)
      .select(col("bin"), col("n"), col("n_pos"),
        round(col("mean_score"), 9).as("mean_score"),
        round(col("obs_rate"), 9).as("obs_rate"),
        round(col("ece_term"), 9).as("ece_term"))
      .orderBy("bin")
  }

  /** Hamilton largest-remainder apportionment of 10,000 audit slots
    * across nations by customer count: allocations sum EXACTLY to the
    * total, remainder ranking on the two-pass row numbers. */
  private def qApportion(s: SparkSession, d: String): DataFrame = {
    val w = Tables.customer(s, d)
      .groupBy(col("c_nationkey")).agg(count(lit(1)).as("cnt"))
    Relational.apportion(w, "cnt", total = 10000L, tieCols = Seq(col("c_nationkey")))
      .select(col("c_nationkey"), col("cnt"), col("alloc"))
      .orderBy("c_nationkey")
  }

  /** Join-cardinality advisor: predicted |click ⋈ purchase| on user_id
    * from two one-pass CMS inner products (Cormode–Muthukrishnan §4.2) —
    * width 65536 puts the 150-user domain deep in the collision-free
    * regime, so the estimate equals the exact Σ f₁·f₂ and plain SQL
    * oracles it. */
  private def qCmsJoinSize(s: SparkSession, d: String): DataFrame = {
    import graft.functions.{cms_inner_product, cms_sketch}
    val ev = Tables.events(s, d)
    val a = ev.filter(col("event_type") === "click")
      .agg(cms_sketch(col("user_id").cast("string"), width = 65536).as("ska"))
    val b = ev.filter(col("event_type") === "purchase")
      .agg(cms_sketch(col("user_id").cast("string"), width = 65536).as("skb"))
    a.crossJoin(broadcast(b))
      .select(cms_inner_product(col("ska"), col("skb")).as("est_join_rows"))
  }

  /** Theta-sketch set algebra in the exact regime: one user_id sketch per
    * side (click vs purchase), then |A|, |B|, |A ∩ B|, |A \ B| and |A ∪ B|
    * read straight off sketch set operations — the direct-set-algebra
    * upgrade over X57's inclusion-exclusion HLL overlap. Distinct users
    * (≤1500 at test scales) sit far below nominal k = 4096, so every
    * estimate is exact and plain COUNT DISTINCT set SQL is the oracle. */
  private def qThetaSetops(s: SparkSession, d: String): DataFrame = {
    import graft.functions.{theta_anotb, theta_estimate, theta_intersect, theta_sketch, theta_union_pair}
    val sk = Tables.events(s, d)
      .filter(col("event_type").isin("click", "purchase"))
      .groupBy("event_type")
      .agg(theta_sketch(col("user_id")).as("sk"))
    val c = sk.filter(col("event_type") === "click").select(col("sk").as("sk_c"))
    val p = sk.filter(col("event_type") === "purchase").select(col("sk").as("sk_p"))
    c.crossJoin(broadcast(p)).select(
      theta_estimate(col("sk_c")).cast("long").as("n_click"),
      theta_estimate(col("sk_p")).cast("long").as("n_purchase"),
      theta_estimate(theta_intersect(col("sk_c"), col("sk_p"))).cast("long").as("n_both"),
      theta_estimate(theta_anotb(col("sk_c"), col("sk_p"))).cast("long").as("n_click_only"),
      theta_estimate(theta_union_pair(col("sk_c"), col("sk_p"))).cast("long").as("n_either"))
  }

  /** Streaming twin of [[qThetaSetops]]: per-day theta partials maintained
    * in the state store, union-merged at read — a theta sketch is a pure
    * function of the input SET, so the streamed sketches equal the batch
    * ones byte-for-byte and the SAME exact-regime set-SQL oracle gates
    * both twins. */
  private def qThetaSetopsStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import graft.functions.{theta_anotb, theta_estimate, theta_intersect, theta_merge, theta_sketch, theta_union_pair}
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = eventsStream(s, d)
    val name = "graft_theta_setops_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .filter(col("event_type").isin("click", "purchase"))
        .select(col("event_type"), col("ts").cast("date").as("day"), col("user_id"))
        .groupBy(col("event_type"), col("day"))
        .agg(theta_sketch(col("user_id")).as("sk"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val merged = s.table(name).groupBy("event_type")
      .agg(theta_merge(col("sk")).as("sk"))
    val c = merged.filter(col("event_type") === "click").select(col("sk").as("sk_c"))
    val p = merged.filter(col("event_type") === "purchase").select(col("sk").as("sk_p"))
    c.crossJoin(broadcast(p)).select(
      theta_estimate(col("sk_c")).cast("long").as("n_click"),
      theta_estimate(col("sk_p")).cast("long").as("n_purchase"),
      theta_estimate(theta_intersect(col("sk_c"), col("sk_p"))).cast("long").as("n_both"),
      theta_estimate(theta_anotb(col("sk_c"), col("sk_p"))).cast("long").as("n_click_only"),
      theta_estimate(theta_union_pair(col("sk_c"), col("sk_p"))).cast("long").as("n_either"))
  }

  /** Streaming twin of [[qCmsCounts]]: the same CMS aggregate maintained by
    * a streaming groupBy (sketch partials live in the state store and merge
    * across micro-batches). CMS merge is counter-wise addition — fully
    * order-independent — so the streamed sketches equal the batch ones
    * byte-for-byte and the SAME exact-count oracle gates both twins. */
  private def qCmsCountsStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = eventsStream(s, d)
    val name = "graft_cms_counts_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .select(col("event_type"), col("ts").cast("date").as("day"))
        .groupBy(col("day"))
        .agg(graft.functions.cms_sketch(col("event_type")).as("sk"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val merged = s.table(name).agg(graft.functions.cms_merge(col("sk")).as("sk"))
    Tables.events(s, d).select("event_type").distinct()
      .crossJoin(broadcast(merged))
      .select(col("event_type"),
        graft.functions.cms_estimate(col("sk"), col("event_type")).as("est_count"))
      .orderBy("event_type")
  }

  /** Time-to-convert: whole seconds from a user's FIRST signup to their
    * first subsequent purchase — the funnel-latency metric next to X32's
    * depth counts. Two partial-agg mins + one key join; integer-division
    * seconds keep it engine-portable. */
  private def qFunnelLatency(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
    val first = ev.filter(col("event_type") === "signup")
      .groupBy("user_id").agg(min(col("ts")).as("ts_s"))
    ev.filter(col("event_type") === "purchase")
      .join(first, "user_id")
      .filter(col("ts") > col("ts_s"))
      .groupBy(col("user_id"), col("ts_s"))
      .agg(min(col("ts")).as("ts_p"))
      .select(col("user_id"),
        expr("(unix_micros(ts_p) - unix_micros(ts_s)) div 1000000").as("latency_sec"))
      .orderBy("user_id")
  }

  /** Last-touch attribution of purchases to the most recent preceding
    * click/view per user — the IGNORE-NULLS forward-fill window shape;
    * latency in whole seconds via integer division (engine-portable). */
  private def qAttribution(s: SparkSession, d: String): DataFrame =
    Funnel.lastTouchAttribution(
      Tables.events(s, d), conversionType = "purchase", touchTypes = Seq("click", "view"))
      .orderBy("conversion_id")

  /** signup → click → purchase ordered funnel over the event log. */
  private def qFunnel(s: SparkSession, d: String): DataFrame =
    Funnel.funnel(
      Tables.events(s, d), "user_id", "event_type", "ts",
      Seq("signup", "click", "purchase"))
      .orderBy("step_idx")

  /** REAL subword tokenization: a BPE merge table trained from the corpus
    * itself (vocabulary-scale iterations, see
    * [[TextAnalysis.trainBpeMerges]]), then every document encoded and
    * counted. No SQL oracle — the iterative trainer is not SQL-expressible;
    * BpeSpec pins trainer + encoder on the classic Sennrich hand-computed
    * corpus (rows-only by design, like the hash-signature operators). */
  private def qBpe(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val merges = TextAnalysis.trainBpeMerges(docs, "text", numMerges = 12)
    docs.select(
      col("doc_id"),
      bpe_token_count(col("text"), merges).as("n_bpe_tokens"),
      array_join(slice(bpe_tokens(col("text"), merges), 1, 8), " ").as("tokens_head"))
      .orderBy("doc_id")
  }

  /** Self-trained bigram LM quality score per document. */
  private def qLmScore(s: SparkSession, d: String): DataFrame =
    TextAnalysis.lmBigramScore(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** Held-out perplexity (X240, CCNet shape): add-one unigram LM fit on
    * the English slice, EVERY document scored against it — non-English
    * and gibberish text scores high, the filterable tail. */
  private def qPerplexity(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    TextAnalysis.perplexityScore(docs, "doc_id", "text",
        ref = docs.filter(col("lang") === "en"))
      .orderBy("doc_id")
  }

  /** LLM pipeline v5 (X278): the CCNet-style curation chain on the NEW
    * scorer — KN bigram perplexity (fit on the English half) scores every
    * document, and each language keeps its 20 lowest-perplexity docs (the
    * "head bucket") through the native bounded-heap top-k. */
  private def qLlmPipeline5(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val scored = TextAnalysis.knBigramPerplexity(docs, "doc_id", "text",
      ref = docs.filter(col("lang") === "en"), discount = 0.75)
    Relational.topKPerKey(
      scored.join(docs.select(col("doc_id"), col("lang")), "doc_id")
        .select(col("lang"), col("doc_id"), col("n_tokens"), col("cross_entropy")),
      keyCols = Seq("lang"),
      sort = Seq("cross_entropy" -> false, "doc_id" -> false),
      k = 20, rankCol = Some("rnk"))
      .orderBy("lang", "rnk")
  }

  /** Scorer agreement (X283): does the cheap add-k unigram scorer AGREE
    * with the KN bigram one doc-by-doc? Lin's CCC over the two
    * cross-entropies — the scorer-replacement audit. */
  private def qScorerAgreement(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    val ref = docs.filter(col("lang") === "en")
    val uni = TextAnalysis.perplexityScore(docs, "doc_id", "text", ref)
      .select(col("doc_id"), col("cross_entropy").as("x"))
    val kn = TextAnalysis.knBigramPerplexity(docs, "doc_id", "text", ref)
      .select(col("doc_id"), col("cross_entropy").as("y"))
    Sketches.concordanceCcc(uni.join(kn, "doc_id"), "x", "y")
  }

  /** Kneser–Ney bigram perplexity (X273): the q_perplexity workload one
    * n-gram order up, fit on the English half, D = 0.75. */
  private def qKnPerplexity(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d)
    TextAnalysis.knBigramPerplexity(docs, "doc_id", "text",
        ref = docs.filter(col("lang") === "en"), discount = 0.75)
      .orderBy("doc_id")
  }

  /** STREAMING perplexity twin (S35) — fit offline, score online: the
    * unigram model + OOV row fit in BATCH ([[TextAnalysis.unigramLm]]) and
    * broadcast into the document stream (stream-static left join,
    * stateless per token); per-doc (n_tokens, Σlpq) integer partials
    * accumulate in the state store, so stream == batch bit-exactly and the
    * query shares q_perplexity's oracle verbatim (the 29th end-to-end
    * streaming gate). */
  private def qPerplexityStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val docs = Tables.documents(s, d)
    val (model0, oov0) = TextAnalysis.unigramLm(docs.filter(col("lang") === "en"), "text")
    val model = model0.localCheckpoint(true)
    val oov = oov0.localCheckpoint(true)
    val raw = s.read.parquet(s"$d/documents.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "documents.parquet").parquet(d)
    val name = "graft_perplexity_stream"
    withStatePartitions(s, 8) {
      val q = TextAnalysis.lmTokens(stream.select(col("doc_id"), col("text")), "text", 1)
        .join(broadcast(model), Seq("__tok"), "left")
        .crossJoin(broadcast(oov))
        .select(col("doc_id"), coalesce(col("__lpq"), col("__oovq")).as("__q"))
        .groupBy(col("doc_id"))
        .agg(count(lit(1)).as("n_tokens"), sum(col("__q")).as("__sq"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val ce = round(-col("__sq").cast("double") / lit(1e6) / col("n_tokens").cast("double"), 6)
    s.table(name)
      .select(col("doc_id"), col("n_tokens"), ce.as("cross_entropy"),
        round(exp(ce), 6).as("perplexity"))
      .orderBy("doc_id")
  }

  /** RAG-style chunking: 80-char windows with 20-char overlap. */
  private def qChunkText(s: SparkSession, d: String): DataFrame =
    TextAnalysis.chunkText(Tables.documents(s, d), "doc_id", "text", size = 80, overlap = 20)
      .orderBy("doc_id", "chunk_idx")

  /** Top-3 TF-IDF terms per document, cut by the native top-k operator on
    * the rounded score. */
  private def qTfIdf(s: SparkSession, d: String): DataFrame =
    TextAnalysis.tfIdfTopTerms(Tables.documents(s, d), "doc_id", "text", topPerDoc = 3)
      .orderBy(col("doc_id"), col("tfidf").desc, col("term"))

  /** Corpus heavy hitters via the native Misra–Gries aggregate, run in its
    * exact regime (k=256 far exceeds the synthetic vocabulary) so the full
    * word-count oracle hash-matches; SketchesSpec pins the approximate
    * regime's bounds. */
  private def qHeavyHitters(s: SparkSession, d: String): DataFrame =
    Sketches.heavyHitters(
      Tables.documents(s, d)
        .select(explode(split(lower(col("text")), " ")).as("word"))
        .filter(col("word") =!= ""),
      "word", k = 256)
      .select(explode(col("heavy_hitters")).as("e"))
      .select(col("e")("item").as("item"), col("e")("count_lo").as("count_lo"))
      .orderBy(col("count_lo").desc, col("item"))

  /** Global contiguous row numbering in doc_id order via the two-pass
    * range-partition + zipWithIndex operator — no single-partition window
    * Exchange anywhere in the job. */
  private def qGlobalRowNumbers(s: SparkSession, d: String): DataFrame =
    Relational.globalRowNumbers(
      Tables.documents(s, d).select("doc_id"),
      orderCols = Seq(col("doc_id")))
      .orderBy("doc_id")

  /** Corpus quality gate: keep documents inside the [P10, P90] band of
    * character length — exact percentile thresholds broadcast back over the
    * corpus, hash-matched against DuckDB quantile_cont. */
  private def qQualityGate(s: SparkSession, d: String): DataFrame =
    Sketches.filterByQuantileBand(
      Tables.documents(s, d)
        .select(col("doc_id"), length(col("text")).cast("long").as("n_chars")),
      "n_chars", 0.1, 0.9)
      .orderBy("doc_id")

  // ------------------------------------------------------------ streaming

  /** Run `body` (which starts and drains a streaming query) with the state
    * partitioning sized to the job: every stateful operator instantiates
    * state-store providers per shuffle partition, so a short AvailableNow
    * gate pays 32 partitions of store setup for kilobytes of state. The
    * partition count is baked into a streaming checkpoint anyway — it is a
    * per-job decision, not a session default. */
  private def withStatePartitions[A](s: SparkSession, n: Int)(body: => A): A = {
    val prev = s.conf.get("spark.sql.shuffle.partitions")
    s.conf.set("spark.sql.shuffle.partitions", n.toString)
    try body finally s.conf.set("spark.sql.shuffle.partitions", prev)
  }

  /** Streaming read of the events table with `ts` normalized to a
    * session-zoned TIMESTAMP whatever the parquet annotation — a legacy
    * nanosecond file surfaces as a raw long (nanosAsLong), an un-zoned
    * microsecond file as TIMESTAMP_NTZ (Spark 4 inference); watermarks and
    * event-time windows require TimestampType, and the UTC session zone
    * makes the NTZ cast value-preserving. Batch twin: [[Tables.events]]. */
  private def eventsStream(s: SparkSession, d: String): DataFrame = {
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        stream.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampNTZType =>
        stream.withColumn("ts", col("ts").cast("timestamp"))
      case _ => stream
    }
  }

  private def qEventWindow(s: SparkSession, d: String): DataFrame =
    Events.hourlyAggBatch(Tables.events(s, d))
      .orderBy("event_date", "event_hour", "event_type")

  /** The STREAMING window aggregation run end-to-end — AvailableNow file
    * source over the events parquet, watermarked tumbling-window agg,
    * complete-mode memory sink — and hash-compared against the same DuckDB
    * batch oracle as q_event_window: the batch-equivalence claim as a driver
    * gate, not just a spec. */
  private def qEventWindowStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    // the file stream source wants a directory; glob-filter to the one table
    val stream = eventsStream(s, d)
    val name = "graft_event_window_stream"
    withStatePartitions(s, 8) {
      val q = Events.hourlyAggStream(stream)
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("event_date", "event_hour", "event_type")
  }

  /** The STREAMING stateful sessionizer run end-to-end against q_sessionize's
    * batch oracle: AvailableNow file source, evicting
    * flatMapGroupsWithState (event-time timeout), per-event session
    * assignments into a memory sink, then a batch rollup to the session
    * grain — the stream/batch equivalence claim for the CUSTOM-state path,
    * the same gate q_event_window_stream provides for the windowed-agg
    * path. */
  private def qSessionizeStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = eventsStream(s, d)
    val evs = stream.select(
      col("user_id").cast("long").as("user_id"),
      col("event_id").cast("long").as("event_id"),
      unix_micros(col("ts")).as("us")).as[Events.SessionEvent]
    val name = "graft_sessionize_stream"
    withStatePartitions(s, 8) {
      val q = Events.assignSessionsStreamEvicting(s, evs)
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val us = Tables.events(s, d).select(
      col("event_id").cast("long").as("event_id"),
      unix_micros(col("ts").cast("timestamp")).as("us"))
    s.table(name)
      .join(us, "event_id")
      .groupBy("user_id", "session_idx")
      .agg(
        count(lit(1)).as("n_events"),
        min(col("event_id")).as("first_event_id"),
        (max(col("us")) - min(col("us"))).as("duration_us"))
      .orderBy("user_id", "session_idx")
  }

  /** The Misra–Gries heavy-hitters aggregate run as a STREAMING query
    * (AvailableNow file source → streaming groupBy with the custom
    * mergeable TypedImperativeAggregate in complete mode → memory sink),
    * gated against the exact per-key counts: k exceeds the user
    * cardinality, so the sketch is in its exact regime and the stream must
    * reproduce the batch GROUP BY — the stream/batch equivalence gate for
    * the CUSTOM-AGGREGATE path (the other gates cover windowed aggs,
    * custom state, joins and dedup). */
  /** Per-type top-5 single events by value on the mergeable [[TopRowsAgg]]
    * leaderboard aggregate — k rows of state per group at any input size. */
  private def qTopEvents(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .groupBy(col("event_type"))
      .agg(top_rows(col("value"), col("event_id"), 5).as("__top"))
      .select(col("event_type"), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(
        col("event_type"), (col("__p") + 1).cast("int").as("rnk"),
        col("__e.score").as("value"), col("__e.id").as("event_id"))
      .orderBy("event_type", "rnk")

  /** The STREAMING twin: the same leaderboard maintained in the state store
    * across micro-batches (complete mode). Merge is set-union-then-trim —
    * order-independent — so stream == batch EXACTLY, against the same SQL
    * window oracle. */
  private def qTopEventsStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_top_events_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .groupBy(col("event_type"))
        .agg(top_rows(col("value"), col("event_id"), 5).as("__top"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name)
      .select(col("event_type"), posexplode(col("__top")).as(Seq("__p", "__e")))
      .select(
        col("event_type"), (col("__p") + 1).cast("int").as("rnk"),
        col("__e.score").as("value"), col("__e.id").as("event_id"))
      .orderBy("event_type", "rnk")
  }

  private def qHeavyHittersStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_heavy_hitters_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .groupBy(col("event_type"))
        .agg(approx_heavy_hitters(col("user_id").cast("string"), 4096).as("hh"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name)
      .select(col("event_type"), explode(col("hh")).as("e"))
      .select(col("event_type"), col("e.item").as("item"), col("e.count_lo").as("count_lo"))
      .orderBy("event_type", "item")
  }

  /** The STREAMING transition-pair state machine run end-to-end against
    * q_transitions' batch oracle: AvailableNow file source → per-user
    * two-field state emitting consecutive (state, next_state) pairs →
    * memory sink → batch rollup to the matrix. */
  private def qTransitionsStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = eventsStream(s, d)
    val evs = stream.select(
      col("user_id").cast("long").as("user_id"),
      col("event_type").as("et"),
      unix_micros(col("ts").cast("timestamp")).as("us"),
      col("event_id").cast("long").as("event_id")).as[Events.TransEvent]
    val name = "graft_transitions_stream"
    withStatePartitions(s, 8) {
      val q = Events.transitionsStream(s, evs)
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val byState = org.apache.spark.sql.expressions.Window.partitionBy(col("state"))
    s.table(name)
      .groupBy(col("state"), col("next_state"))
      .agg(count(lit(1)).as("n"))
      .withColumn("p", round(col("n") / sum(col("n")).over(byState), 6))
      .orderBy("state", "next_state")
  }

  /** The STREAMING last-touch attribution state machine run end-to-end
    * against q_attribution's batch oracle: AvailableNow file source →
    * per-user three-field touch state emitting one attributed row per
    * conversion → memory sink. Attribution is an online fold, so the
    * stream IS the natural formulation; matching the batch window oracle
    * hash-for-hash is the equivalence gate. */
  private def qAttributionStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = eventsStream(s, d)
    val evs = stream.select(
      col("user_id").cast("long").as("user_id"),
      col("event_type").as("et"),
      unix_micros(col("ts").cast("timestamp")).as("us"),
      col("event_id").cast("long").as("event_id")).as[Events.AttrEvent]
    val name = "graft_attribution_stream"
    withStatePartitions(s, 8) {
      val q = Events.attributionStream(s, evs, "purchase", Set("click", "view"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name)
      .select(
        col("user_id"), col("conversion_id"), col("conversion_us"),
        col("touch_event_id"), col("touch_type"), col("latency_sec"))
      .orderBy("conversion_id")
  }

  /** The STREAMING funnel state machine run end-to-end against q_funnel's
    * batch oracle: AvailableNow file source → per-user mapGroupsWithState
    * depth updates (Update mode) into a memory sink → batch rollup of each
    * user's max depth to the step counts. The stream/batch equivalence gate
    * for the funnel path. */
  private def qFunnelStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    import s.implicits._
    val steps = Seq("signup", "click", "purchase")
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = eventsStream(s, d)
    val evs = stream
      .filter(col("event_type").isin(steps: _*))
      .select(
        col("user_id").cast("long").as("user_id"),
        col("event_type").as("et"),
        unix_micros(col("ts").cast("timestamp")).as("us"))
      .as[Events.FunnelEvent]
    val name = "graft_funnel_stream"
    withStatePartitions(s, 8) {
      val q = Events.funnelStream(s, evs, steps)
        .writeStream.format("memory").queryName(name)
        .outputMode("update")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Funnel.depthCounts(
      s.table(name)
        .groupBy("user_id")
        .agg(max(col("depth")).as("__depth"))
        .filter(col("__depth") >= 1)
        .select(col("__depth")),
      steps)
      .orderBy("step_idx")
  }

  /** Click→purchase attribution pairs: each click joined to the same user's
    * purchases within the next 30 minutes — [[Temporal.intervalJoin]] on
    * real event data, the batch semantics the streaming twin below must
    * reproduce. */
  private def qIntervalJoin(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"), col("ts").cast("timestamp").as("ts"))
    val clicks = ev.filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts").as("pts"))
    Temporal.intervalJoin(
      clicks, purchases,
      keys = Seq("user_id"), leftTs = "ts", rightTs = "pts",
      lowerSec = 0L, upperSec = 1800L)
      .select(col("click_id"), col("purchase_id"))
      .orderBy("click_id", "purchase_id")
  }

  /** The STREAM-STREAM interval join run end-to-end against q_interval_join's
    * batch oracle: both sides stream from the events parquet (AvailableNow),
    * watermarked, joined on user within the 30-minute horizon — the last
    * streaming shape the engine needed (joins, after aggs / sessions /
    * dedup). Watermarks bound the buffered state to the horizon, so at scale
    * state tracks the interval, not the stream. */
  private def qIntervalJoinStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    def stream(): DataFrame =
      eventsStream(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    val clicks = stream().filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val name = "graft_interval_join_stream"
    // a stream-stream join instantiates FOUR state stores per shuffle
    // partition — the strongest case for job-sized state partitioning
    withStatePartitions(s, 8) {
      val q = Events.intervalJoinStream(clicks, purchases, horizonSec = 1800L)
        .select(col("click_id"), col("purchase_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("click_id", "purchase_id")
  }

  /** Spark's NATIVE session_window aggregate on real data, oracle-checked:
    * the engine-managed gap-merge must produce exactly the sessions the
    * manual lag/sum formulation (q_sessionize's oracle) defines —
    * session_start = first event, session_end = last event + gap. */
  private def qSessionWindow(s: SparkSession, d: String): DataFrame =
    Events.sessionWindowAgg(
      Tables.events(s, d).withColumn("ts", col("ts").cast("timestamp")))
      .select(
        col("user_id"),
        unix_micros(col("session_start")).as("start_us"),
        unix_micros(col("session_end")).as("end_us"),
        col("n_events"),
        col("first_event_id"))
      .orderBy("user_id", "start_us")

  private def qSessionize(s: SparkSession, d: String): DataFrame =
    Events.sessionizeBatch(Tables.events(s, d))
      .select(
        col("user_id"),
        col("session_idx"),
        col("n_events"),
        col("first_event_id"),
        col("duration_us"))
      .orderBy("user_id", "session_idx")

  /** Excel grid ingestion, oracle-checked end-to-end: export the nation dim
    * into a decorated .xlsx workbook (two title rows + header, mixed
    * string/numeric cells — the reference's CHU sheet shape,
    * extract_chu_data.py:182), read it back through [[Xlsx.grid]], type the
    * columns, and hash-compare against DuckDB over the original parquet.
    * The driver-side collect builds the 25-row FIXTURE (a dim export, not a
    * data path); the read side is the distributed binaryFile scan. */
  private def qGridIngest(s: SparkSession, d: String): DataFrame = {
    import graft.sources.Xlsx
    // per-run temp dir: no collisions across concurrent runs on the same
    // dataset. Driver-local is fine here only because the read side below
    // runs on the same machine in the local harness; on a real cluster the
    // fixture would be written to the shared filesystem next to the data.
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_grid_").toFile
    tmpDir.deleteOnExit()
    val path = new java.io.File(tmpDir, "nation.xlsx").getPath
    val dim = Tables.nation(s, d)
      .select("n_nationkey", "n_name", "n_regionkey")
      .orderBy("n_nationkey")
      .collect()
      .map(r => Seq[Any](r.getInt(0), r.getString(1), r.getInt(2)))
      .toSeq
    // messy headers on purpose: the reader surfaces them as-is and
    // resolveColumns repairs them against the expected names, the
    // reference's rename_or_drop_column_if_found flow (utils.py:517)
    Xlsx.write(
      path,
      Seq(
        Seq[Any]("PNLS NATION EXPORT", null, null),
        Seq[Any](null, "decorated title block", null),
        Seq[Any]("N NationKey", "n_name", "N-RegionKey")) ++ dim)
    Relational.resolveColumns(
      Xlsx.grid(s, path, skipRows = 2),
      expected = Seq("n_nationkey", "n_name", "n_regionkey"),
      threshold = 80)
      .select(
        col("n_nationkey").cast("int").as("n_nationkey"),
        col("n_name"),
        col("n_regionkey").cast("int").as("n_regionkey"))
      .orderBy("n_nationkey")
  }

  /** HTTP API ingestion, oracle-checked end-to-end: an in-process stub
    * (127.0.0.1, ephemeral port — no real network) serves the nation dim as
    * JSON keyed by region; the query fans URLs out of the region table,
    * fetches per-partition through [[graft.sources.Http.fetch]], parses with
    * from_json, and hash-compares against DuckDB over the original parquet —
    * the reference's paginated API pull (extract_naomi_data.py:72) as an
    * oracle-gated plan. `localCheckpoint(eager)` forces the distributed
    * fetch while the stub is up, so the returned frame outlives it. */
  private def qHttpIngest(s: SparkSession, d: String): DataFrame = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.net.InetSocketAddress
    import org.apache.spark.sql.types._
    val nations = Tables.nation(s, d)
      .select("n_nationkey", "n_name", "n_regionkey").collect()
    def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
    val byRegion: Map[Int, String] = nations.groupBy(_.getInt(2)).map { case (rk, rs) =>
      rk -> rs.sortBy(_.getInt(0))
        .map(r => s"""{"k":${r.getInt(0)},"n":"${esc(r.getString(1))}","r":${r.getInt(2)}}""")
        .mkString("[", ",", "]")
    }
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/nations", (ex: HttpExchange) => {
      val rk = Option(ex.getRequestURI.getQuery).getOrElse("")
        .stripPrefix("region=").toInt
      val bytes = s"""{"region":$rk,"nations":${byRegion.getOrElse(rk, "[]")}}"""
        .getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val urls = Tables.region(s, d)
        .select(col("r_regionkey"))
        .withColumn("url",
          concat(lit(s"http://127.0.0.1:$port/nations?region="), col("r_regionkey")))
      val payload = StructType(Seq(
        StructField("region", IntegerType),
        StructField("nations", ArrayType(StructType(Seq(
          StructField("k", IntegerType),
          StructField("n", StringType),
          StructField("r", IntegerType)))))))
      graft.sources.Http.fetch(urls, "url")
        .filter(col("status") === 200)
        .select(from_json(col("body"), payload).as("p"))
        .select(explode(col("p.nations")).as("x"))
        .select(
          col("x.k").as("n_nationkey"),
          col("x.n").as("n_name"),
          col("x.r").as("n_regionkey"))
        .localCheckpoint(true)
        .orderBy("n_nationkey")
    } finally server.stop(0)
  }

  /** Cursor-following paginated API ingestion, oracle-checked end-to-end:
    * the same in-process stub as [[qHttpIngest]], but each region's nations
    * are served in pages of 2 with a `next` cursor URL in the body — the
    * page count is unknown to the client up front, exactly the reference's
    * `while data:` loop (extract_naomi_data.py:72-75). The plan fans out
    * one seed URL per region, then [[graft.sources.Http.fetchPaged]]
    * follows every chain in distributed page-waves until all cursors are
    * exhausted; the parsed union must reconstruct the nation dim exactly. */
  private def qHttpPaged(s: SparkSession, d: String): DataFrame = {
    import com.sun.net.httpserver.{HttpExchange, HttpServer}
    import java.net.InetSocketAddress
    import org.apache.spark.sql.types._
    val nations = Tables.nation(s, d)
      .select("n_nationkey", "n_name", "n_regionkey").collect()
    def esc(x: String) = x.replace("\\", "\\\\").replace("\"", "\\\"")
    val byRegion: Map[Int, Array[String]] = nations.groupBy(_.getInt(2)).map { case (rk, rs) =>
      rk -> rs.sortBy(_.getInt(0))
        .map(r => s"""{"k":${r.getInt(0)},"n":"${esc(r.getString(1))}","r":${r.getInt(2)}}""")
    }
    val pageSize = 2
    val server = HttpServer.create(new InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/nations", (ex: HttpExchange) => {
      val kv = Option(ex.getRequestURI.getQuery).getOrElse("").split("&")
        .map(_.split("=", 2)).map(a => a(0) -> a.lift(1).getOrElse("")).toMap
      val rk = kv("region").toInt
      val off = kv.getOrElse("offset", "0").toInt
      val all = byRegion.getOrElse(rk, Array.empty[String])
      val slice = all.slice(off, off + pageSize)
      val port = server.getAddress.getPort
      val next =
        if (off + pageSize < all.length)
          s""","next":"http://127.0.0.1:$port/nations?region=$rk&offset=${off + pageSize}""""
        else ""
      val bytes = s"""{"region":$rk,"nations":${slice.mkString("[", ",", "]")}$next}"""
        .getBytes("UTF-8")
      ex.sendResponseHeaders(200, bytes.length.toLong)
      ex.getResponseBody.write(bytes)
      ex.close()
    })
    server.start()
    try {
      val port = server.getAddress.getPort
      val urls = Tables.region(s, d)
        .select(col("r_regionkey"))
        .withColumn("url",
          concat(lit(s"http://127.0.0.1:$port/nations?region="), col("r_regionkey")))
      val payload = StructType(Seq(
        StructField("region", IntegerType),
        StructField("nations", ArrayType(StructType(Seq(
          StructField("k", IntegerType),
          StructField("n", StringType),
          StructField("r", IntegerType)))))))
      // fetchPaged eagerly checkpoints every wave, so the rows survive the
      // stub's shutdown below
      graft.sources.Http.fetchPaged(urls, "url",
          nextUrl = get_json_object(col("body"), "$.next"), maxPages = 16)
        .filter(col("status") === 200)
        .select(from_json(col("body"), payload).as("p"))
        .select(explode(col("p.nations")).as("x"))
        .select(
          col("x.k").as("n_nationkey"),
          col("x.n").as("n_name"),
          col("x.r").as("n_regionkey"))
        .localCheckpoint(true)
        .orderBy("n_nationkey")
    } finally server.stop(0)
  }

  private def qJsonExtract(s: SparkSession, d: String): DataFrame =
    Tables.events(s, d)
      .select(col("event_id"), get_json_object(col("props"), "$.k").cast("long").as("k"))
      .orderBy("event_id")

  /** Radius join between derived supplier and customer coordinates via the
    * grid-bucketed equi-join (never a cartesian — PlanSpec pins it); the
    * oracle brute-forces the same pairs, so the grid's coverage guarantee
    * is what is actually under test. Coordinates derive from the keys by
    * exact integer modular arithmetic (both engines bit-identical), and the
    * haversine inputs are quantized to 0.01° so the 800 km threshold never
    * sits within float noise of a pair. */
  private def qSpatialJoin(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_custkey"),
      ((col("c_custkey").cast("long") * 7919L % 12000L) / 100.0 - 60.0).as("c_lat"),
      ((col("c_custkey").cast("long") * 104729L % 36000L) / 100.0 - 180.0).as("c_lon"))
    val supp = Tables.supplier(s, d).select(
      col("s_suppkey"),
      ((col("s_suppkey").cast("long") * 6367L % 12000L) / 100.0 - 60.0).as("s_lat"),
      ((col("s_suppkey").cast("long") * 9973L % 36000L) / 100.0 - 180.0).as("s_lon"))
    Spatial.radiusJoin(supp, cust, "s_lat", "s_lon", "c_lat", "c_lon",
        radiusKm = 800.0, maxAbsLat = 60.0)
      .select(col("s_suppkey"), col("c_custkey"), round(col("dist_km"), 4).as("dist_km"))
      .orderBy("s_suppkey", "c_custkey")
  }

  /** Kaplan–Meier churn curves per market segment: duration = first→last
    * order span, censored when the last order falls in the log's final 180
    * days. The survival product is exp(Σ ln(1−d/n)) over exact integer
    * d/n — the associative form both engines window identically. */
  private def qSurvival(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"))
    val asOf = o.agg(max(col("od")).as("__max_d"))
    val spans = o.groupBy(col("o_custkey"))
      .agg(min(col("od")).as("__first"), max(col("od")).as("__last"))
      .crossJoin(broadcast(asOf))
      .select(
        col("o_custkey"),
        datediff(col("__last"), col("__first")).cast("long").as("duration"),
        (datediff(col("__max_d"), col("__last")) > 180).as("churned"))
    val seg = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val joined = spans.join(broadcast(seg), spans("o_custkey") === seg("c_custkey"))
    Temporal.kaplanMeier(joined, "duration", "churned", Seq("c_mktsegment"))
      .orderBy("c_mktsegment", "duration")
  }

  /** Greenwood-banded KM (X323) over the q_survival spans — the same churn
    * curves with standard errors and clamped 95% CIs attached. */
  private def qKmGreenwood(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"))
    val asOf = o.agg(max(col("od")).as("__max_d"))
    val spans = o.groupBy(col("o_custkey"))
      .agg(min(col("od")).as("__first"), max(col("od")).as("__last"))
      .crossJoin(broadcast(asOf))
      .select(
        col("o_custkey"),
        datediff(col("__last"), col("__first")).cast("long").as("duration"),
        (datediff(col("__max_d"), col("__last")) > 180).as("churned"))
    val seg = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val joined = spans.join(broadcast(seg), spans("o_custkey") === seg("c_custkey"))
    Temporal.kaplanMeierGreenwood(joined, "duration", "churned", Seq("c_mktsegment"))
      .orderBy("c_mktsegment", "duration")
  }

  /** Restricted mean survival time (X292) per market segment over the
    * q_survival spans, horizon 365 days — the model-free ∫S(t)dt readout
    * beside the KM curve and the log-rank verdict. */
  private def qRmst(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"))
    val asOf = o.agg(max(col("od")).as("__max_d"))
    val spans = o.groupBy(col("o_custkey"))
      .agg(min(col("od")).as("__first"), max(col("od")).as("__last"))
      .crossJoin(broadcast(asOf))
      .select(
        col("o_custkey"),
        datediff(col("__last"), col("__first")).cast("long").as("duration"),
        (datediff(col("__max_d"), col("__last")) > 180).as("churned"))
    val seg = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val joined = spans.join(broadcast(seg), spans("o_custkey") === seg("c_custkey"))
    Temporal.rmst(joined, "duration", "churned", horizon = 365L, Seq("c_mktsegment"))
      .orderBy("c_mktsegment")
  }

  /** WOE/IV of customer nation as a predictor of order urgency — the
    * credit-scoring feature-strength table. */
  private def qWoeIv(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey"),
      (col("o_orderpriority") === "1-URGENT").as("urgent"))
    val c = Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey"))
    val n = Tables.nation(s, d).select(col("n_nationkey"), col("n_name"))
    val j = o.join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
    Sketches.woeIv(j, "n_name", "urgent").orderBy("category")
  }

  /** Decile lift/gains table per market segment: order value targeting
    * urgent orders — response rate, lift and cumulative gain per decile. */
  private def qLiftTable(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(col("o_custkey"), col("o_orderkey"),
      (col("o_orderpriority") === "1-URGENT").as("urgent"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val seg = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val j = o.join(broadcast(seg), o("o_custkey") === seg("c_custkey"))
    Sketches.liftTable(j, Seq("c_mktsegment"), "cents", "urgent",
        Seq("o_orderkey"))
      .orderBy("c_mktsegment", "bucket")
  }

  /** Exact tie-aware ROC AUC of order value as a predictor of urgency —
    * the Mann–Whitney rank identity, one integer division at the end. */
  private def qRocAuc(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      (col("o_orderpriority") === "1-URGENT").as("urgent"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    Sketches.rocAuc(o, "urgent", "cents")
  }

  /** Average precision (X252): the PR-curve area for the urgent-order
    * score, beside q_roc_auc on identical inputs. */
  private def qAveragePrecision(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      (col("o_orderpriority") === "1-URGENT").as("urgent"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    Sketches.averagePrecision(o, "urgent", "cents")
  }

  /** Cramér–von Mises + energy distance on the urgent-vs-low order value
    * split — the ECDF-discrepancy family beside KS and Wasserstein. */
  private def qCramerVonMises(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderpriority").as("prio"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    Sketches.cramerVonMises(o, "prio", "cents", "1-URGENT", "5-LOW")
  }

  /** Yuen trimmed-mean t-test (X298) on the q_cvm urgent-vs-low split —
    * the robust location verdict beside Welch (means) and MW (ranks). */
  private def qYuen(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderpriority").as("prio"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    Sketches.yuenTTest(o, "prio", "cents", "1-URGENT", "5-LOW", trimFrac = 0.2)
  }

  /** Anderson–Darling two-sample statistic (X286) on the q_cvm split —
    * the tail-weighted ECDF test beside KS/CvM/energy/Wasserstein. */
  private def qAndersonDarling(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderpriority").as("prio"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    Sketches.andersonDarling(o, "prio", "cents", "1-URGENT", "5-LOW")
  }

  /** Exact 1-D Wasserstein distance between the order-value distributions
    * of urgent vs low-priority orders — bin-free drift next to PSI/JS. */
  private def qWasserstein(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderpriority").as("prio"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    Sketches.wasserstein1d(o, "prio", "cents", "1-URGENT", "5-LOW")
  }

  /** STREAMING Wasserstein twin: per-(value) integer count pairs
    * accumulate in the state store (complete mode); the exact-rational
    * step assembly runs in batch off the sink — stream == batch exactly,
    * sharing q_wasserstein's oracle verbatim. */
  private def qWassersteinStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
    val name = "graft_wasserstein_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
        .select((col("o_orderpriority") === "1-URGENT").as("__isA"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("__v"))
        .groupBy(col("__v"))
        .agg(
          sum(when(col("__isA"), 1L).otherwise(0L)).as("__cA"),
          sum(when(!col("__isA"), 1L).otherwise(0L)).as("__cB"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Sketches.wassersteinAssemble(s.table(name), "1-URGENT", "5-LOW")
  }

  /** Two-sample log-rank test on the churn curves of two market segments —
    * "do BUILDING and MACHINERY customers churn on the same curve?" off the
    * same span construction as q_survival. */
  private def qLogrank(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderdate").cast("date").as("od"))
    val asOf = o.agg(max(col("od")).as("__max_d"))
    val spans = o.groupBy(col("o_custkey"))
      .agg(min(col("od")).as("__first"), max(col("od")).as("__last"))
      .crossJoin(broadcast(asOf))
      .select(
        col("o_custkey"),
        datediff(col("__last"), col("__first")).cast("long").as("duration"),
        (datediff(col("__max_d"), col("__last")) > 180).as("churned"))
    val seg = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val joined = spans.join(broadcast(seg), spans("o_custkey") === seg("c_custkey"))
    Temporal.logRank(joined, "duration", "churned", "c_mktsegment",
      "BUILDING", "MACHINERY")
  }

  /** Classical weekly decomposition of the daily revenue series — trend /
    * seasonal / remainder from exact cent-quantized integer statistics
    * (engine-deterministic: every output is one correctly-rounded division
    * over exact longs). */
  private def qSeasonal(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(
        col("o_orderdate").cast("date").as("day"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("day"))
      .agg(sum(col("cents")).as("revenue_cents"))
      .withColumn("dow",
        (datediff(col("day"), lit("1990-01-01").cast("date")) % 7).cast("int"))
    Temporal.seasonalDecompose(daily, "day", "revenue_cents", "dow", period = 7)
      .select(col("day"), col("revenue_cents"), col("dow"),
        col("trend"), col("seasonal"), col("remainder"))
      .orderBy("day")
  }

  /** RFM quintiles over the order log — ECDF bucket scores in exact
    * integer arithmetic (tie-stable, unlike ntile), histograms broadcast
    * back so the fact table shuffles once. */
  private def qRfm(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey"), col("o_orderdate"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    Segments.rfm(o, "o_custkey", "o_orderdate", "cents")
      .select(col("o_custkey"), col("recency_days"), col("frequency"),
        col("monetary_cents"), col("r_score"), col("f_score"), col("m_score"),
        col("rfm"))
      .orderBy("o_custkey")
  }

  /** Item-item collaborative-filtering top-3: cosine over co-occurrence
    * counts (cnt_ab / sqrt(cnt_a·cnt_b) — bit-identical doubles on any
    * engine, so no rounding games in the ordering), neighbors picked on
    * the native bounded top-k operator, never a rank window. */
  private def qItemCosine(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(col("l_orderkey"), col("l_partkey")).distinct()
    val baskets = Relational.capGroupSize(li, Seq("l_orderkey"), maxRows = 1000)
    val itemCounts = baskets.groupBy(col("l_partkey")).agg(count(lit(1)).as("__cnt"))
    val pairs = baskets
      .join(baskets.select(col("l_orderkey"), col("l_partkey").as("other_part")),
        Seq("l_orderkey"))
      .filter(col("l_partkey") =!= col("other_part"))
      .groupBy(col("l_partkey"), col("other_part"))
      .agg(count(lit(1)).as("co_cnt"))
      .filter(col("co_cnt") >= 2)
    val sims = pairs
      .join(broadcast(itemCounts.withColumnRenamed("__cnt", "__ca")), Seq("l_partkey"))
      .join(
        broadcast(itemCounts
          .withColumnRenamed("l_partkey", "other_part")
          .withColumnRenamed("__cnt", "__cb")),
        Seq("other_part"))
      .withColumn("cosine",
        col("co_cnt").cast("double") / sqrt((col("__ca") * col("__cb")).cast("double")))
    Relational.topKPerKey(sims, Seq("l_partkey"),
        Seq(("cosine", true), ("other_part", false)), k = 3, rankCol = Some("rnk"))
      .select(col("l_partkey"), col("other_part"),
        round(col("cosine"), 6).as("cosine"), col("rnk"))
      .orderBy("l_partkey", "rnk")
  }

  /** Audio round-trip: build REAL RIFF/WAVE containers in-plan (per-doc
    * deterministic channel/rate/width parameters around the corpus bytes),
    * then introspect them back header-only — the oracle recomputes the
    * expected fields directly, so both the writer's layout and the
    * parser's chunk walk are under the hash. */
  private def qAudioMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"),
        wav_bytes(
          lit(1) + (col("doc_id") % 2).cast("int"),
          element_at(array(lit(8000), lit(16000), lit(44100)),
            (col("doc_id") % 3).cast("int") + 1),
          element_at(array(lit(8), lit(16)), (col("doc_id") % 2).cast("int") + 1),
          col("payload")).as("wav"))
      .select(col("doc_id"), audio_meta(col("wav")).as("m"))
      .select(col("doc_id"), col("m.channels").as("channels"),
        col("m.sample_rate").as("sample_rate"),
        col("m.bits_per_sample").as("bits_per_sample"),
        col("m.data_bytes").as("data_bytes"))
      .orderBy("doc_id")

  /** WebP + TIFF round trip (T74): build REAL VP8X canvas headers and
    * minimal TIFFs (alternating endianness) in-plan from per-doc
    * deterministic dimensions, then introspect both back header-only —
    * the oracle recomputes the expected fields directly, so the builders'
    * layouts AND the RIFF/IFD walks sit under the hash. */
  private def qTiffWebp(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .select(col("doc_id"),
        image_meta(webp_bytes(
          (col("doc_id") % 4096 + 1).cast("int"),
          (col("doc_id") % 3000 + 1).cast("int"))).as("w"),
        image_meta(tiff_bytes(
          (col("doc_id") % 5000).cast("int"),
          (col("doc_id") % 7001).cast("int"),
          col("doc_id") % 2 === 0)).as("t"))
      .select(col("doc_id"),
        col("w.format").as("webp_format"),
        col("w.width").as("webp_width"), col("w.height").as("webp_height"),
        col("t.format").as("tiff_format"),
        col("t.width").as("tiff_width"), col("t.height").as("tiff_height"))
      .orderBy("doc_id")

  /** Nearest supplier within 800 km per customer — the catchment
    * assignment: grid radius join shrunk to one winner per customer on the
    * native top-1 path (distance asc, suppkey tiebreak; haversine doubles
    * are bit-identical so the argmin is engine-deterministic). */
  /** Weiszfeld geometric median of each market segment's customer points
    * (centi-degree grid) vs the outlier-sensitive centroid. */
  private def qGeoMedian(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_mktsegment"),
      (col("c_custkey").cast("long") * 7919L % 12000L - 6000L).as("cx"),
      (col("c_custkey").cast("long") * 104729L % 36000L - 18000L).as("cy"))
    Spatial.geometricMedian(cust, Seq("c_mktsegment"), "cx", "cy", iters = 3)
      .orderBy("c_mktsegment")
  }

  private def qSpatialNearest(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_custkey"),
      ((col("c_custkey").cast("long") * 7919L % 12000L) / 100.0 - 60.0).as("c_lat"),
      ((col("c_custkey").cast("long") * 104729L % 36000L) / 100.0 - 180.0).as("c_lon"))
    val supp = Tables.supplier(s, d).select(
      col("s_suppkey"),
      ((col("s_suppkey").cast("long") * 6367L % 12000L) / 100.0 - 60.0).as("s_lat"),
      ((col("s_suppkey").cast("long") * 9973L % 36000L) / 100.0 - 180.0).as("s_lon"))
    Spatial.nearestWithin(cust, supp, "c_custkey", "c_lat", "c_lon",
        "s_lat", "s_lon", radiusKm = 800.0, tieCol = "s_suppkey", maxAbsLat = 60.0)
      .select(col("c_custkey"), col("s_suppkey"), round(col("dist_km"), 4).as("dist_km"))
      .orderBy("c_custkey")
  }

  /** Seasonal anomaly flags: the X126 decomposition's remainder gated by a
    * 5×MAD robust band (X45's operator over the bit-exact remainders) —
    * "which days broke from their weekly pattern". Only the boolean and
    * the exact remainder are emitted; the median/MAD intermediates stay
    * internal (at 1e8 magnitudes their 6-dp rendering would be the ROUND
    * knife-edge X126 documents). */
  private def qSeasonalAnomaly(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.orders(s, d)
      .select(
        col("o_orderdate").cast("date").as("day"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("day"))
      .agg(sum(col("cents")).as("revenue_cents"))
      .withColumn("dow",
        (datediff(col("day"), lit("1990-01-01").cast("date")) % 7).cast("int"))
    val dec = Temporal.seasonalDecompose(daily, "day", "revenue_cents", "dow", period = 7)
      .filter(col("remainder").isNotNull)
    Sketches.madOutliers(dec, Nil, "remainder", k = 5.0)
      .select(col("day"), col("remainder"), col("is_outlier"))
      .orderBy("day")
  }

  /** Cohort LTV curves: cumulative revenue per signup-month cohort by
    * account age, normalized per cohort member — exact cent sums windowed
    * over the bounded (cohort, age) table, one division at the end. */
  private def qLtvCurve(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey"),
      (year(col("o_orderdate")) * 12 + month(col("o_orderdate"))).as("__m"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val firstM = o.groupBy(col("o_custkey")).agg(min(col("__m")).as("__cm"))
    val sizes = firstM.groupBy(col("__cm")).agg(count(lit(1)).as("cohort_n"))
    val rev = o.join(firstM, "o_custkey")
      .groupBy(col("__cm"), (col("__m") - col("__cm")).as("age_months"))
      .agg(sum(col("cents")).as("rev_cents"))
    val wCum = org.apache.spark.sql.expressions.Window
      .partitionBy(col("__cm")).orderBy(col("age_months"))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, 0)
    rev.withColumn("cum_cents", sum(col("rev_cents")).over(wCum))
      .join(broadcast(sizes), Seq("__cm"))
      .select(col("__cm").as("cohort_month"), col("age_months"),
        col("rev_cents"), col("cum_cents"), col("cohort_n"),
        (col("cum_cents").cast("double") / col("cohort_n")).as("ltv_cents"))
      .orderBy("cohort_month", "age_months")
  }

  /** Revenue-concentration Gini per market segment over per-customer
    * lifetime spend (exact cents). */
  private def qGini(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val perCust = Tables.orders(s, d)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("spend"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    Sketches.gini(perCust, Seq("c_mktsegment"), "spend")
      .orderBy("c_mktsegment")
  }

  /** Theil–Sen robust price trend per part — median pairwise slope under
    * the bounded-group cap; the lower-median SELECTION (never an
    * interpolation) emits one of the bit-exact slope doubles unrounded. */
  private def qTheilSen(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_partkey"),
      datediff(col("l_shipdate").cast("date"), lit("1992-01-01").cast("date")).as("x"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
    val capped = Relational.capGroupSize(li, Seq("l_partkey"), maxRows = 500)
    Sketches.theilSen(capped, Seq("l_partkey"), "x", "y")
      .orderBy("l_partkey")
  }

  /** Exact weighted median unit price per return flag (weight = quantity):
    * a pure integer selection, engine-exact with no interpolation. */
  private def qWeightedMedian(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"),
      col("l_quantity").cast("long").as("qty"))
    Sketches.weightedMedian(li, Seq("l_returnflag"), "cents", "qty")
      .orderBy("l_returnflag")
  }

  /** Benjamini–Hochberg FDR adjustment over a deterministic per-nation
    * p-value table (the md5-uniform idiom, so both engines derive the
    * identical doubles); q-values and reject flags need no rounding — the
    * step-up envelope is a running MIN, a selection. */
  private def qBhAdjust(s: SparkSession, d: String): DataFrame = {
    val tests = Tables.nation(s, d).select(
      col("n_name").as("test_id"),
      (conv(substring(md5(col("n_name")), 1, 8), 16, 10).cast("long") /
        4294967296.0).as("p_value"))
    Quality.bhAdjust(tests, "test_id", "p_value", alpha = 0.2)
      .orderBy("test_id")
  }

  /** Benjamini–Yekutieli adjustment (X295) over the q_bh_adjust family —
    * the dependence-robust sibling (same envelope, harmonic penalty). */
  private def qByAdjust(s: SparkSession, d: String): DataFrame = {
    val tests = Tables.nation(s, d).select(
      col("n_name").as("test_id"),
      (conv(substring(md5(col("n_name")), 1, 8), 16, 10).cast("long") /
        4294967296.0).as("p_value"))
    Quality.byAdjust(tests, "test_id", "p_value", alpha = 0.2)
      .orderBy("test_id")
  }

  /** Holm–Bonferroni step-down (X314) over the q_bh_adjust family — the
    * FWER verdict beside the two FDR siblings on identical p-values. */
  private def qHolmAdjust(s: SparkSession, d: String): DataFrame = {
    val tests = Tables.nation(s, d).select(
      col("n_name").as("test_id"),
      (conv(substring(md5(col("n_name")), 1, 8), 16, 10).cast("long") /
        4294967296.0).as("p_value"))
    Quality.holmAdjust(tests, "test_id", "p_value", alpha = 0.2)
      .orderBy("test_id")
  }

  /** Exact 10% trimmed mean of line-item price per return flag. */
  private def qTrimmedMean(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("cents"))
    Sketches.trimmedMean(li, Seq("l_returnflag"), "cents", trimFrac = 0.1)
      .orderBy("l_returnflag")
  }

  /** STREAMING Gini: the per-customer spend state accumulates in the state
    * store across micro-batches (complete mode — X46's incremental-agg
    * posture), the X132 histogram identity assembles in batch off the
    * sink; exact integer counts make stream == batch against the identical
    * oracle. */
  private def qGiniStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
    val name = "graft_gini_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .select(col("o_custkey"),
          floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("o_custkey")).agg(sum(col("cents")).as("spend"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val perCust = s.table(name)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    Sketches.gini(perCust, Seq("c_mktsegment"), "spend")
      .orderBy("c_mktsegment")
  }

  /** STREAMING diversity twin: per-(user, event_type) integer counts
    * accumulate in the state store (complete mode); the Shannon/Simpson
    * assembly runs in batch off the sink, so stream == batch exactly and
    * the query shares q_diversity's oracle verbatim. */
  private def qDiversityStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_diversity_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .groupBy(col("user_id"), col("event_type"))
        .agg(count(lit(1)).as("__c"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Sketches.diversityAssemble(s.table(name), Seq("user_id"))
      .orderBy("user_id")
  }

  /** STREAMING SAX twin: daily exact-cent sums in the state store
    * (complete mode), the deterministic PAA/symbol assembly in batch off
    * the sink — integer state ⇒ stream == batch, shared oracle. */
  private def qSaxStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_sax_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Temporal.saxWords(s.table(name), Seq("event_type"), "day", "v", segments = 8)
      .orderBy("event_type")
  }

  /** STREAMING Kalman twin (S51): daily exact-cent sums in the state store
    * (complete mode), the recursive local-level filter folding in batch
    * off the sink — integer state ⇒ the sink equals the batch daily table
    * exactly, so the whole filter shares q_kalman's oracle verbatim. */
  private def qKalmanStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_kalman_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Temporal.kalmanLevel(s.table(name), Seq("event_type"), "day", "v",
        q = 1e4, r = 1e8)
      .orderBy("event_type")
  }

  /** STREAMING Croston twin (S35): per-(type, day) demand counters
    * accumulate in the state store (complete mode — every observed day has
    * a row, so the batch side recovers the exact all-events calendar
    * bounds); the spine zero-fill + the demand-event EWMA fold run in
    * batch off the sink. Integer state ⇒ stream == batch bit-exactly;
    * shares q_croston's oracle verbatim. */
  private def qCrostonStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_croston_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(when(col("value") > 95.0, 1L).otherwise(0L)).as("x0"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    val sink = s.table(name)
    // the spine re-joins the same memory sink it derives from — re-alias
    // the grouping key so the self-join gets distinct attribute ids
    val spine = sink.groupBy(col("event_type"))
      .agg(min(col("day")).as("__lo"), max(col("day")).as("__hi"))
      .select(col("event_type").as("event_type"),
        explode(sequence(col("__lo"), col("__hi"), expr("INTERVAL 1 DAY"))).as("day"))
    val series = spine.join(sink, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x0"), lit(0L)))
    Temporal.crostonForecast(series, Seq("event_type"), "day", "x", alpha = 0.3)
      .orderBy("event_type")
  }

  /** STREAMING forecast-backtest twin: daily exact-cent sums accumulate in
    * the state store (complete mode); the lag-window MAE/MASE assembly runs
    * in batch off the sink — integer state ⇒ stream == batch exactly,
    * sharing q_forecast_backtest's oracle verbatim. */
  private def qForecastBacktestStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_forecast_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .groupBy(col("event_type"), to_date(col("ts")).as("day"))
        .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("v"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    Temporal.forecastBacktest(s.table(name), Seq("event_type"), "day", "v", season = 7)
      .orderBy("event_type")
  }

  /** Single-linkage spatial clustering at a 300 km threshold — DBSCAN with
    * minPts=1: the ε-neighbor graph from the grid radius join (X124's
    * self-join form), components via the log-round star contraction
    * (X117), singletons kept as their own cluster. The oracle replays the
    * brute ε-graph plus a recursive-CTE min-label closure. */
  private def qSpatialClusters(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_custkey"),
      ((col("c_custkey").cast("long") * 7919L % 12000L) / 100.0 - 60.0).as("c_lat"),
      ((col("c_custkey").cast("long") * 104729L % 36000L) / 100.0 - 180.0).as("c_lon"))
    // fresh scan (not a rename of `cust`) so the self-join has two
    // unambiguous lineages
    val probe = Tables.customer(s, d).select(
      col("c_custkey").as("c_custkey2"),
      ((col("c_custkey").cast("long") * 7919L % 12000L) / 100.0 - 60.0).as("c_lat2"),
      ((col("c_custkey").cast("long") * 104729L % 36000L) / 100.0 - 180.0).as("c_lon2"))
    val pairs = Spatial.radiusJoin(probe, cust, "c_lat2", "c_lon2",
        "c_lat", "c_lon", radiusKm = 300.0, maxAbsLat = 60.0)
      .filter(col("c_custkey2") < col("c_custkey"))
      .select(col("c_custkey2").as("u"), col("c_custkey").as("v"))
    val comps = Graph.connectedComponents(pairs, "u", "v")
    cust.join(comps, cust("c_custkey") === comps("id"), "left")
      .select(col("c_custkey"),
        coalesce(col("component"), col("c_custkey").cast("long")).as("cluster"))
      .orderBy("c_custkey")
  }

  /** Full DBSCAN (X326) over the hashed customer coordinates: eps=300 km,
    * minPts=3 — core/border/noise roles and smallest-label clusters, the
    * density upgrade over q_spatial_clusters' single-linkage. */
  private def qDbscan(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_custkey"),
      ((col("c_custkey").cast("long") * 7919L % 12000L) / 100.0 - 60.0).as("c_lat"),
      ((col("c_custkey").cast("long") * 104729L % 36000L) / 100.0 - 180.0).as("c_lon"))
    Spatial.dbscan(cust, "c_custkey", "c_lat", "c_lon",
        epsKm = 300.0, minPts = 3, maxAbsLat = 60.0)
      .orderBy("c_custkey")
  }

  /** STREAMING spatial enrichment — the X124 grid radius join run
    * stream-static: the customer stream expands to its wrapped 3×3 cells
    * STATELESSLY and joins the broadcast supplier buckets, so append-mode
    * AvailableNow output equals the batch pair set exactly (same oracle as
    * q_spatial_join). */
  private def qSpatialJoinStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val supp = Tables.supplier(s, d).select(
      col("s_suppkey"),
      ((col("s_suppkey").cast("long") * 6367L % 12000L) / 100.0 - 60.0).as("s_lat"),
      ((col("s_suppkey").cast("long") * 9973L % 36000L) / 100.0 - 180.0).as("s_lon"))
    val raw = s.read.parquet(s"$d/customer.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "customer.parquet").parquet(d)
      .select(
        col("c_custkey"),
        ((col("c_custkey").cast("long") * 7919L % 12000L) / 100.0 - 60.0).as("c_lat"),
        ((col("c_custkey").cast("long") * 104729L % 36000L) / 100.0 - 180.0).as("c_lon"))
    val name = "graft_spatial_join_stream"
    withStatePartitions(s, 8) {
      val q = Spatial.radiusJoin(stream, supp, "c_lat", "c_lon",
          "s_lat", "s_lon", radiusKm = 800.0, maxAbsLat = 60.0)
        .select(col("s_suppkey"), col("c_custkey"),
          round(col("dist_km"), 4).as("dist_km"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("s_suppkey", "c_custkey")
  }

  /** Linear interpolation across synthesized gaps in the event value
    * series (every 7th event nulled), per event type over time. */
  private def qInterpolate(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(
      col("event_id"), col("event_type"),
      unix_micros(col("ts").cast("timestamp")).as("t"),
      when(col("event_id") % 7 =!= 0,
        floor(col("value") * 1e6 + 0.5).cast("long")).as("v"))
    Temporal.interpolateLinear(e, Seq("event_type"), Seq("t", "event_id"), "t", "v")
      .select(col("event_id"), col("event_type"), col("value_interp"))
      .orderBy("event_id")
  }

  /** Time-travel snapshot: the X38 SCD2 intervals filtered to the version
    * valid on 2024-01-15 (mid-range of the event log) — one predicate
    * over the dimension history. */
  private def qScd2Snapshot(s: SparkSession, d: String): DataFrame = {
    val asOf = lit("2024-01-15").cast("date")
    val daily = Tables.events(s, d)
      .select(
        col("user_id"),
        col("ts").cast("timestamp").cast("date").as("day"),
        struct(
          unix_micros(col("ts").cast("timestamp")).as("us"),
          col("event_id"),
          col("event_type")).as("__e"))
      .groupBy(col("user_id"), col("day"))
      .agg(max(col("__e")).as("__m"))
      .select(col("user_id"), col("day"), col("__m.event_type").as("event_type"))
    Temporal.scd2(daily, Seq("user_id"), "day", Seq("event_type"))
      .filter(col("valid_from") <= asOf &&
        (col("valid_to").isNull || col("valid_to") > asOf))
      .orderBy("user_id")
  }

  /** Video-container round-trip — the ISO BMFF twin of q_audio_meta: real
    * ftyp/moov/mdat boxes built in-plan, walked back header-only; the
    * oracle recomputes every field from first principles. */
  private def qVideoMeta(s: SparkSession, d: String): DataFrame =
    Multimodal.attachBinary(Tables.documents(s, d), "doc_id", "text")
      .select(col("doc_id"),
        mp4_bytes(
          when(col("doc_id") % 2 === 0, lit("isom")).otherwise(lit("mp42")),
          col("payload")).as("mp4"))
      .select(col("doc_id"), mp4_meta(col("mp4")).as("m"))
      .select(col("doc_id"), col("m.n_boxes").as("n_boxes"),
        col("m.ftyp_ok").as("ftyp_ok"), col("m.moov_bytes").as("moov_bytes"),
        col("m.mdat_bytes").as("mdat_bytes"))
      .orderBy("doc_id")

  /** Deterministic bootstrap 95% CI for mean customer lifetime spend. */
  private def qBootstrapCi(s: SparkSession, d: String): DataFrame = {
    val perCust = Tables.orders(s, d)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("spend"))
    Sketches.bootstrapCiMean(perCust, "spend", resamples = 40)
  }

  /** Peak concurrent sessions (capacity planning): gap-sessionize the
    * event log (the q_sessionize boundaries), quantize sessions to
    * seconds, sweep — exact integers end to end. */
  private def qPeakConcurrency(s: SparkSession, d: String): DataFrame = {
    val byUser = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("__us"), col("event_id"))
    val sessions = Tables.events(s, d)
      .withColumn("__us", unix_micros(col("ts").cast("timestamp")))
      .withColumn("__new",
        when(col("__us") - lag(col("__us"), 1).over(byUser) > 1800000000L, 1)
          .otherwise(0))
      .withColumn("__sid", sum(col("__new")).over(byUser))
      .groupBy(col("user_id"), col("__sid"))
      .agg(
        expr("min(__us) div 1000000").as("start_sec"),
        expr("max(__us) div 1000000").as("end_sec"))
    val n = sessions.agg(count(lit(1)).as("n_sessions"))
    Temporal.peakConcurrency(sessions, "start_sec", "end_sec")
      .crossJoin(broadcast(n))
      .select(col("n_sessions"), col("peak_concurrency"),
        col("peak_at").as("peak_at_sec"))
  }

  /** Revenue concentration: share of each segment's total spend held by
    * the top 1/5/10/25% of customers — the Lorenz point readout that
    * pairs with q_gini, tie-exact through partial blocks. */
  private def qTopShare(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(col("c_custkey"), col("c_mktsegment"))
    val perCust = Tables.orders(s, d)
      .select(col("o_custkey"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("o_custkey")).agg(sum(col("cents")).as("spend"))
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
    Sketches.topShare(perCust, Seq("c_mktsegment"), "spend", Seq(1, 5, 10, 25))
      .orderBy("c_mktsegment")
  }

  /** Distribution-shape profile per return flag: skewness and excess
    * kurtosis from exact integer power sums (prices in 100-dollar units
    * so fourth powers stay inside a long per row — both statistics are
    * scale-invariant). */
  private def qMoments(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag"),
      floor(col("l_extendedprice") / 100).cast("long").as("v"))
    Sketches.momentStats(li, Seq("l_returnflag"), "v")
      .orderBy("l_returnflag")
  }

  /** Runs test on each event type's daily revenue around its median — do
    * good days streak (z < 0) or alternate (z > 0)? */
  private def qRunsTest(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(col("event_type"), to_date(col("ts")).as("day"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
    Sketches.runsTest(daily, Seq("event_type"), "day", "cents")
      .orderBy("event_type")
  }

  /** Cochran's Q across three order-flagging heuristics — do the value,
    * priority and comment-length rules hit at the same rate row-by-row? */
  private def qCochranQ(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      (col("o_totalprice") > 150000).as("r_value"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("r_priority"),
      (col("o_orderstatus") === "F").as("r_filled"))
    Sketches.cochranQ(o, Seq("r_value", "r_priority", "r_filled"))
  }

  /** Classification report for "price quintile predicts priority": per-class
    * precision/recall/F1 + macro-F1/accuracy of the value-band rule. */
  private def qClassificationReport(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.orderBy(col("o_totalprice").desc, col("o_orderkey"))
    val labels = array(lit("1-URGENT"), lit("2-HIGH"), lit("3-MEDIUM"),
      lit("4-NOT SPECIFIED"), lit("5-LOW"))
    val o = Tables.orders(s, d).select(
      col("o_orderpriority").as("actual"),
      element_at(labels, ntile(5).over(w)).as("predicted"))
    Sketches.classificationReport(o, "actual", "predicted")
      .orderBy("label")
  }

  /** Friedman test: do the event types keep the same daily-revenue ranking
    * across days? Within-day midranks, exact-rational Q ~ χ²(k−1). */
  private def qFriedman(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
    Sketches.friedmanTest(daily, "day", "event_type", "cents")
  }

  /** Chi-square goodness-of-fit (X320): does the order-priority mix match
    * the uniform model the TPC-H generator intends? Expected = the five
    * priorities at weight 1 each. */
  private def qChi2Gof(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val expected = Seq(
      ("1-URGENT", 1L), ("2-HIGH", 1L), ("3-MEDIUM", 1L),
      ("4-NOT SPECIFIED", 1L), ("5-LOW", 1L)).toDF("prio", "w")
    Sketches.chiSquareGof(
      Tables.orders(s, d).select(col("o_orderpriority")),
      "o_orderpriority", expected, "prio", "w")
  }

  /** Jonckheere–Terpstra (X321): do order totals shift monotonically with
    * the ordinal priority level (1-URGENT … 5-LOW)? The ordered
    * alternative the Kruskal–Wallis omnibus can't target. */
  private def qJonckheere(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      substring(col("o_orderpriority"), 1, 1).cast("long").as("prio"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    Sketches.jonckheereTerpstra(o, "prio", "cents")
  }

  /** Page's L (X328): do monthly priority-bucket revenue totals increase
    * with the ordinal priority level? Blocks = order months, treatments =
    * the priority digit, the ordered repeated-measures verdict. */
  private def qPageTrend(s: SparkSession, d: String): DataFrame = {
    val cells = Tables.orders(s, d)
      .groupBy(date_trunc("month", col("o_orderdate")).as("month"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("prio"))
      .agg(sum(floor(col("o_totalprice") * 100 + 0.5).cast("long")).as("cents"))
    Sketches.pageTrendTest(cells, "month", "prio", "cents")
  }

  /** Kendall's W (X319) over the q_friedman layout — how strongly do the
    * days agree on the ranking of event types by daily cents volume. */
  private def qKendallW(s: SparkSession, d: String): DataFrame = {
    val daily = Tables.events(s, d)
      .groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(sum(floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
    Sketches.kendallW(daily, "day", "event_type", "cents")
  }

  /** McNemar's paired test of two urgency heuristics on the same orders —
    * value-based vs priority-based flags, symmetric-disagreement check. */
  private def qMcnemar(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      (col("o_totalprice") > 150000).as("flag_value"),
      col("o_orderpriority").isin("1-URGENT", "2-HIGH").as("flag_priority"))
    Sketches.mcnemar(o, "flag_value", "flag_priority")
  }

  /** Brown–Forsythe spread-homogeneity test across event types — ANOVA on
    * |value − group median| deviations, the q_anova assumption check. */
  private def qLevene(s: SparkSession, d: String): DataFrame = {
    val e = Tables.events(s, d).select(col("event_type"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    Sketches.leveneTest(e, "event_type", "cents")
  }

  /** Jarque–Bera normality gate for the per-flag price distributions —
    * skewness/kurtosis off the q_moments machinery, JB ~ χ²(2). */
  private def qJarqueBera(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d).select(
      col("l_returnflag"),
      floor(col("l_extendedprice") / 100).cast("long").as("v"))
    Sketches.jarqueBera(li, Seq("l_returnflag"), "v")
      .orderBy("l_returnflag")
  }

  /** Local clustering coefficient per node — 2T/(d(d−1)) over X106's
    * exact triangle counts: the community-density readout completing the
    * graph family; one exact-integer division, unrounded. */
  private def qClusteringCoeff(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("k"), col("l_partkey"))
    val pairs = li.select(col("k"), col("l_partkey").as("pa"))
      .join(li.select(col("k"), col("l_partkey").as("pb")), "k")
      .filter(col("pa") =!= col("pb"))
    Graph.triangleCounts(pairs, "pa", "pb")
      .withColumn("clustering",
        when(col("degree") > 1,
          (col("n_triangles") * 2).cast("double") /
            (col("degree") * (col("degree") - 1))))
      .orderBy("node")
  }

  /** STREAMING weighted median: the (value, weight) histogram accumulates
    * in the state store (complete mode — one row per distinct value per
    * key), the exact integer selection finishes in batch off the sink;
    * stream == batch against the identical oracle. Values quantize to
    * DOLLARS here where the batch twin uses cents — the quantization knob
    * is exactly what bounds this state at scale (100× fewer state rows,
    * benched 9.0s → 5.6s at sf0.1; the residual is micro-batch + state IO), and the median over quantized values is
    * still an exact integer selection. */
  private def qWeightedMedianStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/lineitem.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "lineitem.parquet").parquet(d)
    val name = "graft_wmedian_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .select(col("l_returnflag"),
          floor(col("l_extendedprice") + 0.5).cast("long").as("dollars"),
          col("l_quantity").cast("long").as("qty"))
        .groupBy(col("l_returnflag"), col("dollars"))
        .agg(sum(col("qty")).as("__w"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    // re-aggregating the sink histogram inside weightedMedian is exact:
    // sums of disjoint partial sums equal the direct sums
    Sketches.weightedMedian(s.table(name), Seq("l_returnflag"), "dollars", "__w")
      .orderBy("l_returnflag")
  }

  /** Global running revenue over the full order history — X145's two-pass
    * cumulative sum: every core computes its range's prefix, partition
    * offsets broadcast back; no single-partition sort anywhere near the
    * data. */
  private def qRunningTotal(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderkey"), col("o_orderdate"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    Relational.globalRunningSum(
        o, Seq(col("o_orderdate"), col("o_orderkey")), "cents", "running_cents")
      .select(col("o_orderkey"), col("cents"), col("running_cents"))
      .orderBy("o_orderkey")
  }

  /** DAU / WAU / stickiness per day — the product-analytics engagement
    * readout: rolling 7-day EXACT distinct users via a bounded 7-row
    * explode per (user, day) pair (never a distinct-over-window), one
    * exact division for stickiness. */
  private def qActiveUsers(s: SparkSession, d: String): DataFrame = {
    val ud = Tables.events(s, d)
      .select(col("user_id"), col("ts").cast("timestamp").cast("date").as("day"))
      .distinct()
    val wau = ud
      .select(col("user_id"),
        explode(sequence(col("day"), date_add(col("day"), 6))).as("wday"))
      .distinct()
      .groupBy(col("wday")).agg(count(lit(1)).as("wau"))
    val dau = ud.groupBy(col("day")).agg(count(lit(1)).as("dau"))
    dau.join(wau, dau("day") === wau("wday"))
      .select(col("day"), col("dau"), col("wau"),
        (col("dau").cast("double") / col("wau")).as("stickiness"))
      .orderBy("day")
  }

  /** Max drawdown per user over a signed running-balance curve (credits =
    * purchase/signup cents, debits = the rest): exact long selection
    * arithmetic end to end — running sum, running max, max gap. */
  private def qMaxDrawdown(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val byUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val level = Tables.events(s, d)
      .select(col("user_id"), col("ts"), col("event_id"),
        when(col("event_type").isin("purchase", "signup"),
          floor(col("value") * 100 + 0.5).cast("long"))
          .otherwise(-floor(col("value") * 100 + 0.5).cast("long")).as("cents"))
      .withColumn("level", sum(col("cents")).over(byUser))
    Temporal.maxDrawdown(level, Seq("user_id"),
        Seq(col("ts"), col("event_id")), "level")
      .orderBy("user_id")
  }

  /** ABC / Pareto classes over part revenue: per-class item counts and
    * exact cents totals — the three boundary rows verify the integer
    * cross-multiplied 80/95 cut lines end to end. */
  private def qParetoAbc(s: SparkSession, d: String): DataFrame = {
    val perPart = Tables.lineitem(s, d)
      .select(col("l_partkey"),
        floor(col("l_extendedprice") * (lit(1.0) - col("l_discount")) * 100 + 0.5)
          .cast("long").as("cents"))
      .groupBy(col("l_partkey")).agg(sum(col("cents")).as("revenue_cents"))
    Segments.abcClasses(perPart, Seq("l_partkey"), "revenue_cents")
      .groupBy(col("abc_class"))
      .agg(
        count(lit(1)).as("n_items"),
        sum(col("revenue_cents")).as("class_cents"),
        min(col("revenue_cents")).as("min_item_cents"),
        max(col("revenue_cents")).as("max_item_cents"))
      .orderBy("abc_class")
  }

  /** t-closeness audit: nation as the quasi-identifier, market segment as
    * the sensitive attribute, t = 0.2 — per-nation total-variation
    * distance from the corpus segment mix, exact integer cross-multiplies
    * with one final division. */
  private def qTCloseness(s: SparkSession, d: String): DataFrame =
    Quality.tCloseness(
        Tables.customer(s, d).select(col("c_nationkey"), col("c_mktsegment")),
        Seq("c_nationkey"), "c_mktsegment", t = 0.2)
      .select(col("c_nationkey"), col("n"), col("tvd"), col("close"))
      .orderBy("c_nationkey")

  /** One-hot order priority at row grain (zero-shuffle projection with a
    * known vocabulary), then fold to status grain so the oracle verifies
    * every indicator column exactly. */
  private def qOneHot(s: SparkSession, d: String): DataFrame = {
    val known = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")
    val names = known.map(v =>
      "o_orderpriority_" + v.toLowerCase.replaceAll("[^a-z0-9]+", "_")
        .replaceAll("^_+|_+$", ""))
    val hot = Reshape.oneHot(Tables.orders(s, d), "o_orderpriority", knownValues = known)
    hot.groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n_orders"),
        names.map(n => sum(col(n)).as(n)): _*)
      .orderBy("o_orderstatus")
  }

  /** Fightin'-Words keywords separating English documents from the rest of
    * the corpus: informative-Dirichlet weighted log-odds z-scores, top 50
    * English-leaning terms. */
  private def qLogOdds(s: SparkSession, d: String): DataFrame =
    TextAnalysis.logOddsKeywords(
      Tables.documents(s, d), "text", col("lang") === "en")

  /** Recall@10 of PCA-reduced (64-d → 8-d) cosine search against the
    * full-space brute-force truth — the audit that tells you whether the
    * reduced index is safe to serve: both searches ride the native top-k
    * operator, the reduced side broadcast its 8 query vectors. Rows-only
    * by design (eigenbasis-dependent); the PCA fit itself is spec-pinned. */
  private def qPcaAnn(s: SparkSession, d: String): DataFrame = {
    // Euclidean neighbors: the metric PCA actually preserves (pairwise
    // distances are translation-invariant, so centering is harmless and
    // the reduced distance is exact when the data is low-rank — cosine
    // would conflate centering with real recall loss)
    def d2(a: Column, b: Column): Column = aggregate(
      zip_with(a, b, (x, y) => {
        val dx = x.cast("double") - y.cast("double")
        dx * dx
      }),
      lit(0.0), (acc, t) => acc + t)
    def top10(corpus: DataFrame, queries: DataFrame, vc: String): DataFrame = {
      val scored = corpus
        .select(col("vec_id").as("vec_id2"), col(vc).as("__v"))
        .join(broadcast(queries.select(col("vec_id").as("query_id"), col(vc).as("__qv"))))
        .filter(col("vec_id2") =!= col("query_id"))
        .withColumn("dist", d2(col("__qv"), col("__v")))
        .select("query_id", "vec_id2", "dist")
      Relational.topKPerKey(
          scored, Seq("query_id"), Seq("dist" -> false, "vec_id2" -> false), k = 10)
        .select(col("query_id"), col("vec_id2").as("vec_id"))
    }
    val emb = Tables.embeddings(s, d)
    val truth = top10(emb, emb.filter(col("vec_id") < 8), "embedding")
    val model = Similarity.pcaFit(emb, "embedding", dim = 64, k = 8)
    val red = Similarity.pcaProjectAll(emb, "embedding", model)
      .select(col("vec_id"), col("pcs"))
    val redTop = top10(red, red.filter(col("vec_id") < 8), "pcs")
    truth
      .join(redTop.withColumn("__hit", lit(1L)), Seq("query_id", "vec_id"), "left")
      .groupBy(col("query_id"))
      .agg((sum(coalesce(col("__hit"), lit(0L))) / lit(10.0)).as("recall_at_10"))
      .orderBy("query_id")
  }

  /** Grid-bucketed bbox-overlap join between synthetic customer parcels
    * and supplier coverage rectangles (key-derived integer geometry):
    * reference-point dedup means no distinct pass — the oracle is the
    * brute cross-join with the same overlap predicate. */
  private def qBboxJoin(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_custkey"),
      (col("c_custkey") * 7919L % 100000L).as("cxlo"),
      (col("c_custkey") * 7919L % 100000L + 500L + col("c_custkey") % 700L).as("cxhi"),
      (col("c_custkey") * 104729L % 100000L).as("cylo"),
      (col("c_custkey") * 104729L % 100000L + 500L + col("c_custkey") % 900L).as("cyhi"))
    val supp = Tables.supplier(s, d).select(
      col("s_suppkey"),
      (col("s_suppkey") * 6367L % 100000L).as("sxlo"),
      (col("s_suppkey") * 6367L % 100000L + 2000L + col("s_suppkey") % 3000L).as("sxhi"),
      (col("s_suppkey") * 9973L % 100000L).as("sylo"),
      (col("s_suppkey") * 9973L % 100000L + 2000L + col("s_suppkey") % 3000L).as("syhi"))
    Spatial.bboxJoin(cust, supp,
        ("cxlo", "cxhi", "cylo", "cyhi"), ("sxlo", "sxhi", "sylo", "syhi"),
        cellSize = 2000L)
      .select(col("c_custkey"), col("s_suppkey"),
        ((least(col("cxhi"), col("sxhi")) - greatest(col("cxlo"), col("sxlo"))) *
          (least(col("cyhi"), col("syhi")) - greatest(col("cylo"), col("sylo"))))
          .as("overlap_area"))
      .orderBy("c_custkey", "s_suppkey")
  }

  /** Isotonic weekly-revenue trend per order priority: PAV over the week
    * index. Oracle=sql since r10 via the closed minimax identity (see
    * [[isotonicOracle]]) — no pooling unroll needed. */
  private def qIsotonic(s: SparkSession, d: String): DataFrame = {
    val weekly = Tables.orders(s, d)
      .select(col("o_orderpriority").as("prio"),
        floor(datediff(col("o_orderdate").cast("date"),
          lit("1995-01-01").cast("date")) / 7).cast("long").as("week"),
        floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
      .groupBy(col("prio"), col("week")).agg(sum(col("cents")).as("rev"))
    Sketches.isotonic(weekly, Seq("prio"), "week", "rev")
      .orderBy("prio", "week")
  }

  /** Embedding-quality audit over the labeled embeddings corpus:
    * per-label simplified silhouette + nearest-centroid misassignments —
    * exact-long distance folds, label-bounded centroid broadcast. */
  private def qEmbedQuality(s: SparkSession, d: String): DataFrame =
    Similarity.centroidSeparation(
        Tables.embeddings(s, d), "vec_id", "embedding", "label")
      .orderBy("label")

  /** Hashing-trick features over the documents corpus: 64 buckets so the
    * sparse matrix is eyeball-able; the md5-mod hash is engine-portable,
    * so the full (doc, bucket, cnt) matrix is oracle-hash-gated. */
  private def qHashFeatures(s: SparkSession, d: String): DataFrame =
    TextAnalysis.hashedFeatures(
        Tables.documents(s, d).filter(col("doc_id") < 200),
        "doc_id", "text", numBuckets = 64, minLen = 3)
      .orderBy("doc_id", "bucket")

  /** PCA-reduce the embedding corpus 64-d → 8-d: one Gram-aggregate pass
    * (17 KB of sufficient statistics per partition), a driver-side Jacobi
    * eigensolve of the 64×64 covariance, and a broadcast-literal
    * projection — rows-only by design (an eigenbasis is not
    * SQL-expressible); geometry pinned by SimilaritySpec's planted
    * anisotropic data. */
  private def qPca(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val model = Similarity.pcaFit(emb, "embedding", dim = 64, k = 8)
    // Scalar projection (vec_id, component, value) instead of the raw
    // array<double> column: the driver's rows-check sorts through pandas,
    // which cannot lexsort numpy-array cells. round(,6) keeps the dump
    // stable across JVM re-runs of the Jacobi eigensolve.
    Similarity.pcaProjectAll(emb, "embedding", model)
      .select(col("vec_id"), posexplode(col("pcs")).as(Seq("component", "v")))
      .select(col("vec_id"), col("component"),
        round(col("v"), 6).as("value"))
      .orderBy("vec_id", "component")
  }

  /** JL random projection 64-d → 8-d with a pairwise-distortion readout
    * (X258) over a 16-vector probe set: engine-portable md5-derived ±1
    * signs, exact quantized-long distances, ratio = d_proj/d_orig. The
    * 16×16 probe pair join is a bounded nested-loop by design. */
  private def qJlDistortion(s: SparkSession, d: String): DataFrame = {
    val probe = Tables.embeddings(s, d).filter(col("vec_id") < 16)
      .select(col("vec_id"), col("embedding"))
    val proj = Similarity.jlProject(probe, "vec_id", "embedding", dim = 64, k = 8)
    val both = probe.join(proj, "vec_id")
    def qdist(x: Column, y: Column): Column =
      sqrt(aggregate(
        zip_with(x, y, (u, v) =>
          floor((u.cast("double") - v.cast("double")) *
            (u.cast("double") - v.cast("double")) * 1e6 + 0.5).cast("long")),
        lit(0L), (acc, t) => acc + t).cast("double") / 1e6)
    val a = both.select(col("vec_id").as("id1"),
      col("embedding").as("__e1"), col("proj").as("__p1"))
    val b = both.select(col("vec_id").as("id2"),
      col("embedding").as("__e2"), col("proj").as("__p2"))
    a.join(b, col("id1") < col("id2"))
      .withColumn("__do", qdist(col("__e1"), col("__e2")))
      .withColumn("__dp", qdist(col("__p1"), col("__p2")))
      .select(col("id1"), col("id2"),
        round(col("__do"), 6).as("d_orig"),
        round(col("__dp"), 6).as("d_proj"),
        when(col("__do") > 0, round(col("__dp") / col("__do"), 6)).as("ratio"))
      .orderBy("id1", "id2")
  }

  /** 4-core of the 1996-H1 co-purchase graph: fixed 4-round peel whose
    * SQL oracle replays the identical rounds (post-fixpoint rounds are
    * no-ops, so the operator's early exit cannot diverge). */
  /** Hop-bounded pivot betweenness (X274) on the 1996-H1 co-purchase
    * graph: 8 smallest parts as pivots, 3 hops, top-20 bridge nodes. */
  private def qBetweenness(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("k"), col("l_partkey"))
    val pairs = li.select(col("k"), col("l_partkey").as("pa"))
      .join(li.select(col("k"), col("l_partkey").as("pb")), "k")
      .filter(col("pa") =!= col("pb"))
    val srcs = pairs.select(col("pa").as("n")).distinct()
      .orderBy("n").limit(8).collect().map(_.getLong(0)).toSeq
    Graph.betweennessApprox(pairs, "pa", "pb", srcs, maxHops = 3, topK = 20)
      .orderBy(col("betweenness").desc, col("node"))
  }

  private def qKcore(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .join(Tables.orders(s, d)
          .filter(col("o_orderdate") >= lit("1996-01-01").cast("timestamp") &&
            col("o_orderdate") < lit("1996-07-01").cast("timestamp"))
          .select("o_orderkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey").as("k"), col("l_partkey"))
    val pairs = li.select(col("k"), col("l_partkey").as("pa"))
      .join(li.select(col("k"), col("l_partkey").as("pb")), "k")
      .filter(col("pa") =!= col("pb"))
    Graph.kCore(pairs, "pa", "pb", k = 4, rounds = 4)
      .orderBy("node")
  }

  /** STREAMING OHLC twin: open/close come from min_by/max_by over the
    * (ts, event_id) total order — the streaming-legal replacement for the
    * batch row_number windows (selections both ways, so stream == batch
    * bit-exactly against the shared oracle); high/low/volume/sum are plain
    * aggregates in the same state row. */
  private def qOhlcStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/events.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "events.parquet").parquet(d)
    val name = "graft_ohlc_stream"
    withStatePartitions(s, 8) {
      val q = stream
        .select(col("event_type"), date_trunc("day", col("ts")).as("day"),
          col("ts"), col("event_id"), col("value"),
          floor(col("value") * 100 + 0.5).cast("long").as("cents"))
        .groupBy(col("event_type"), col("day"))
        .agg(
          min_by(col("value"), struct(col("ts"), col("event_id"))).as("open"),
          max(col("value")).as("high"),
          min(col("value")).as("low"),
          max_by(col("value"), struct(col("ts"), col("event_id"))).as("close"),
          count(lit(1)).as("volume"),
          sum(col("cents")).as("sum_value"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("event_type", "day")
  }

  // ---------------------------------------------------------------- entry

  /** Wilcoxon signed-rank (X302): did per-customer order spend shift
    * between 1995 and 1996? Pairs = customers with orders in BOTH years
    * (exact cent sums); the paired member of the rank-test family. */
  private def qWilcoxon(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey"),
      year(col("o_orderdate")).as("__y"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val pairs = o.filter(col("__y").isin(1995, 1996))
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(col("__y") === 1995, col("cents"))).as("x"),
        sum(when(col("__y") === 1996, col("cents"))).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    Sketches.wilcoxonSignedRank(pairs, "x", "y")
  }

  /** Sign test (X315) on the q_wilcoxon pairs — the assumption-free paired
    * verdict beside the signed-rank (which assumes symmetric differences). */
  private def qSignTest(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_custkey"),
      year(col("o_orderdate")).as("__y"),
      floor(col("o_totalprice") * 100 + 0.5).cast("long").as("cents"))
    val pairs = o.filter(col("__y").isin(1995, 1996))
      .groupBy(col("o_custkey"))
      .agg(
        sum(when(col("__y") === 1995, col("cents"))).as("x"),
        sum(when(col("__y") === 1996, col("cents"))).as("y"))
      .filter(col("x").isNotNull && col("y").isNotNull)
    Sketches.signTest(pairs, "x", "y")
  }

  /** Krippendorff's α (X303) treating each order as a unit and its line
    * return flags as ratings — the any-number-of-raters reliability
    * coefficient beside Cohen's and Fleiss' κ. */
  private def qKrippendorff(s: SparkSession, d: String): DataFrame =
    Sketches.krippendorffAlpha(
      Tables.lineitem(s, d).select(col("l_orderkey"), col("l_returnflag")),
      "l_orderkey", "l_returnflag")

  /** ICC(1,1) (X316): are line prices consistent WITHIN orders relative to
    * between-order spread? Units = orders, ratings = whole-dollar line
    * prices — the unbalanced one-way ANOVA estimator. */
  private def qIcc(s: SparkSession, d: String): DataFrame =
    Sketches.icc(
      Tables.lineitem(s, d).select(col("l_orderkey"),
        floor(col("l_extendedprice") + 0.5).cast("long").as("dollars")),
      "l_orderkey", "dollars")

  /** Empirical-Bayes rate shrinkage (X324): per-user purchase rate over all
    * events, shrunk toward the corpus mean by the moment-fit beta prior —
    * low-activity users stop dominating either tail. */
  private def qEbShrinkage(s: SparkSession, d: String): DataFrame =
    Models.ebRateShrinkage(
      Tables.events(s, d).select(col("user_id"),
        (col("event_type") === "purchase").as("is_purchase")),
      Seq("user_id"), "is_purchase")
      .orderBy("user_id")

  /** IV / Wald estimator (X317): the price-per-unit effect of quantity on
    * line revenue, instrumented by the COARSENED quantity bucket — a
    * mechanically-relevant instrument chosen to exercise the arithmetic
    * with a strong first stage (a real analysis needs a genuinely
    * exogenous shifter; the operator doc says so). */
  private def qIvWald(s: SparkSession, d: String): DataFrame = {
    val l = Tables.lineitem(s, d).select(
      floor(col("l_quantity") / 10.0).cast("long").as("z"),
      col("l_quantity").cast("long").as("x"),
      floor(col("l_extendedprice") * 100 + 0.5).cast("long").as("y"))
    Models.ivWald(l, "z", "x", "y")
  }

  /** Matthews correlation (X304): a fixed price-tercile rule "predicts"
    * order status; the imbalance-honest single-number readout beside the
    * classification report on the same confusion matrix. */
  private def qMcc(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).select(
      col("o_orderstatus").as("actual"),
      when(col("o_totalprice") > 331000.0, "F")
        .when(col("o_totalprice") > 165000.0, "O")
        .otherwise("P").as("pred"))
    Sketches.matthewsCorr(o, "actual", "pred")
  }

  /** Randomized response (X305): Warner-release of "has positive account
    * balance" over customers at p=0.75, debiased back to π̂ — the
    * local-DP member of the privacy family. */
  private def qRandomizedResponse(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
      .select(col("c_custkey"), (col("c_acctbal") > 0).as("truth"))
    Quality.randomizedResponse(c, "c_custkey", "truth", p = 0.75)
  }

  /** Candidate/reference pairs for the reference-based text-eval gates:
    * doc i as candidate against doc i+1 as reference — a pure equi-join
    * pairing (no data-grain window), deterministic at any scale. */
  private def evalPairs(s: SparkSession, d: String): DataFrame = {
    val docs = Tables.documents(s, d).select(col("doc_id"), col("text"))
    docs.as("c")
      .join(docs.as("r"), col("r.doc_id") === col("c.doc_id") + 1)
      .select(
        col("c.doc_id").as("pair_id"),
        col("c.text").as("cand"),
        col("r.text").as("ref"))
  }

  /** ROUGE-2 per pair (T71): recall/precision/F1 of clipped bigram overlap
    * — the reference-based generation-eval metric over the documents
    * corpus. */
  private def qRouge(s: SparkSession, d: String): DataFrame =
    TextAnalysis.rougeN(evalPairs(s, d), "pair_id", "cand", "ref", n = 2)
      .orderBy("pair_id")

  /** Corpus BLEU-4 (T72): clipped n-gram precisions p1..p4, token totals,
    * exact brevity-penalty exponent and the nested-sqrt geometric mean —
    * everything in BLEU that two engines can agree on bit-for-bit. */
  private def qBleu(s: SparkSession, d: String): DataFrame =
    TextAnalysis.corpusBleu(evalPairs(s, d), "pair_id", "cand", "ref", maxN = 4)

  /** Corpus chrF (T73): clipped character-n-gram F2 for n=1..6, averaged
    * — the tokenization-robust member of the eval family. */
  private def qChrf(s: SparkSession, d: String): DataFrame =
    TextAnalysis.chrF(evalPairs(s, d), "pair_id", "cand", "ref")

  /** Bloom-pruned semi-join (X306): lineitem reduced to the big-part key
    * set map-side before the exact semi-join — the sideways-information-
    * passing shape whose shuffle carries only matches + the fpp sliver. */
  private def qBloomPrune(s: SparkSession, d: String): DataFrame = {
    val dim = Tables.part(s, d).filter(col("p_size") >= 40).select(col("p_partkey"))
    Relational.bloomSemiJoin(
      Tables.lineitem(s, d), "l_partkey", dim, "p_partkey", expectedKeys = 1L << 16)
      .groupBy(col("l_returnflag"))
      .agg(
        count(lit(1)).as("n"),
        sum(floor(col("l_quantity") * 100 + 0.5).cast("long")).as("qty100"))
      .orderBy("l_returnflag")
  }

  /** Point-in-polygon join (X307): customers (hash-derived grid points)
    * assigned to five synthetic irregular pentagon zones built in-plan
    * from the region table — exact-integer ray casting, broadcast
    * polygons, zero point-side shuffle. */
  private def qPointInPolygon(s: SparkSession, d: String): DataFrame = {
    val offs = Seq((2L, 0L), (1L, 2L), (-1L, 1L), (-2L, -1L), (1L, -2L))
    val poly = Tables.region(s, d)
      .select(
        col("r_regionkey").cast("long").as("zone_id"),
        (lit(500000L) + col("r_regionkey").cast("long") * 700000L).as("__cx"),
        (lit(400000L) + col("r_regionkey").cast("long") * 550000L).as("__cy"),
        (lit(150000L) * (col("r_regionkey").cast("long") + 1L)).as("__s"))
      .select(
        col("zone_id"),
        array(offs.map { case (ox, oy) =>
          struct(
            (col("__cx") + lit(ox) * col("__s")).as("x"),
            (col("__cy") + lit(oy) * col("__s")).as("y"))
        }: _*).as("vertices"))
    val pts = Tables.customer(s, d).select(
      col("c_custkey"),
      (col("c_custkey") * 7919L % 4000000L).as("px"),
      (col("c_custkey") * 104729L % 3000000L).as("py"))
    Spatial.pointInPolygonJoin(pts, "px", "py", poly, "vertices")
      .select(col("zone_id"), col("c_custkey"))
      .orderBy("zone_id", "c_custkey")
  }

  /** Confusion cells of the q_mcc tercile rule as a complete-mode streaming
    * aggregate — the shared state of S49/S50 (bounded by the LABEL DOMAIN,
    * K×K integer counts that merge associatively across micro-batches). */
  private def confusionCellsStream(s: SparkSession, d: String, name: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val raw = s.read.parquet(s"$d/orders.parquet")
    val stream = s.readStream.schema(raw.schema)
      .option("pathGlobFilter", "orders.parquet").parquet(d)
    withStatePartitions(s, 1) {
      val q = stream.select(
          col("o_orderstatus").as("__a"),
          when(col("o_totalprice") > 331000.0, "F")
            .when(col("o_totalprice") > 165000.0, "O")
            .otherwise("P").as("__p"))
        .groupBy(col("__a"), col("__p"))
        .agg(count(lit(1)).as("__c"))
        .writeStream.format("memory").queryName(name)
        .outputMode("complete")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name)
  }

  /** STREAMING classification-report monitor (S49): the live model-quality
    * dashboard — per-class precision/recall/F1 assembled in batch off the
    * streaming confusion cells; stream == batch exactly. */
  private def qClassReportStream(s: SparkSession, d: String): DataFrame =
    Sketches.classificationReportFromCells(
      confusionCellsStream(s, d, "graft_class_report_stream"))
      .orderBy("label")

  /** STREAMING MCC monitor (S50): the single-number live readout off the
    * same confusion-cell state shape as S49 — q_mcc's oracle verbatim. */
  private def qMccStream(s: SparkSession, d: String): DataFrame =
    Sketches.matthewsCorrFromCells(
      confusionCellsStream(s, d, "graft_mcc_stream"))

  /** k-NN majority-vote classification (X309): the first 20 embedding rows
    * classified against the labeled remainder, k=10, exact cosine. */
  private def qKnn(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    Models.knnClassify(
      emb.filter(col("vec_id") >= 20), emb.filter(col("vec_id") < 20),
      "vec_id", "embedding", "label", k = 10)
      .orderBy("query_id")
  }

  /** Feature scaling suite (X308): z-score on quantity, min-max on price,
    * robust (median/IQR order statistics) on discount — corpus stats
    * broadcast back onto the fact, one readout slice. */
  private def qFeatureScaling(s: SparkSession, d: String): DataFrame = {
    val scaled = Models.scaleColumn(
      Models.scaleColumn(
        Models.scaleColumn(Tables.lineitem(s, d), "l_quantity", "zscore"),
        "l_extendedprice", "minmax"),
      "l_discount", "robust")
    scaled.filter(col("l_orderkey") < 300)
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_quantity_scaled"), col("l_extendedprice_scaled"),
        col("l_discount_scaled"))
      .orderBy("l_orderkey", "l_linenumber")
  }

  /** Borůvka minimum spanning forest (X310) over the nation-level trade
    * graph (edge weight = exact cross-nation trade cents). Weights are
    * data-derived and distinct at the gate scales, so the MST is unique —
    * the oracle may replay it with ANY algorithm (it unrolls Prim). */
  private def qMst(s: SparkSession, d: String): DataFrame = {
    val e = Tables.lineitem(s, d)
      .join(Tables.supplier(s, d).select(col("s_suppkey"), col("s_nationkey")),
        col("l_suppkey") === col("s_suppkey"))
      .join(Tables.orders(s, d).select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d).select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .filter(col("s_nationkey") =!= col("c_nationkey"))
      .groupBy(
        least(col("s_nationkey"), col("c_nationkey")).as("na"),
        greatest(col("s_nationkey"), col("c_nationkey")).as("nb"))
      .agg(sum(floor(col("l_extendedprice") * 100 + 0.5).cast("long")).as("w"))
    Graph.boruvkaMst(e, "na", "nb", "w").orderBy("w", "a", "b")
  }

  /** A-priori frequent brand triples (X311) over order-level baskets at
    * 0.3% relative support — the depth-3 market-basket readout. */
  private def qFrequentTriples(s: SparkSession, d: String): DataFrame = {
    val base = Tables.lineitem(s, d)
      .join(Tables.part(s, d).select(col("p_partkey"), col("p_brand")),
        col("l_partkey") === col("p_partkey"))
      .select(col("l_orderkey").as("basket"), col("p_brand").as("item"))
    Relational.frequentTriples(base, "basket", "item", minSupportFrac = 0.003)
      .orderBy("item1", "item2", "item3")
  }

  /** Rocchio feedback rerank (X312): queries 0..4 expand toward 5
    * arithmetic-chosen relevant docs and away from 5 non-relevant, then
    * the exact cosine top-5 reruns with the moved vector. */
  private def qRocchio(s: SparkSession, d: String): DataFrame = {
    val emb = Tables.embeddings(s, d)
    val base = emb.filter(col("vec_id") < 5)
      .select(col("vec_id").as("qid"), explode(sequence(lit(0L), lit(4L))).as("kk"))
    val fb = base
      .select(col("qid"), (lit(100L) + col("qid") * 5L + col("kk")).as("doc"),
        lit(true).as("rel"))
      .unionByName(base.select(col("qid"),
        (lit(200L) + col("qid") * 5L + col("kk")).as("doc"), lit(false).as("rel")))
    Similarity.rocchioRerank(
      emb, emb.filter(col("vec_id") < 5), fb,
      "vec_id", "embedding", "qid", "doc", "rel", k = 5)
      .select(col("query_id"), col("vec_id"), round(col("sim"), 6).as("sim"), col("rnk"))
      .orderBy("query_id", "rnk")
  }

  /** Position-based 40/20/40 attribution (X313) on the same
    * click/view→purchase windows as the linear/time-decay gates. */
  private def qAttributionPosition(s: SparkSession, d: String): DataFrame =
    Funnel.positionAttribution(
      Tables.events(s, d), "purchase", Seq("click", "view"), windowSec = 1800L)
      .orderBy("channel")

  /** Compressed JSONL round-trip (Z16): the same docs slice written as
    * .json.gz and .json.bz2 shards, read back by extension, reduced to
    * per-codec checksums — lossless or the hash gate fails. */
  private def qJsonlCompressed(s: SparkSession, d: String): DataFrame = {
    val tmpDir = java.nio.file.Files.createTempDirectory("graft_jsonl_c_").toFile
    tmpDir.deleteOnExit()
    val slim = Tables.documents(s, d).select(
      col("doc_id"), length(col("text")).cast("long").as("n_chars"))
    val parts = Seq("bzip2", "gzip").map { codec =>
      val out = new java.io.File(tmpDir, s"docs_$codec").getPath
      Sink.writeJsonl(slim, out, shards = 4, codec = codec)
      s.read.json(out)
        .select(lit(codec).as("codec"), col("doc_id").cast("long"),
          col("n_chars").cast("long"))
    }
    parts.reduce(_ unionByName _)
      .groupBy(col("codec"))
      .agg(
        count(lit(1)).as("n_docs"),
        sum(col("doc_id")).as("sum_ids"),
        sum(col("n_chars")).as("sum_chars"))
      .orderBy("codec")
  }

  def queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1Agg _),
    "q_filter_project" -> (qFilterProject _),
    "q_dim_join" -> (qDimJoin _),
    "q_hierarchy_flatten" -> (qHierarchyFlatten _),
    "q_diagonal_union" -> (qDiagonalUnion _),
    "q_conditional_agg" -> (qConditionalAgg _),
    "q_salted_agg" -> (qSaltedAgg _),
    "q_pivot" -> (qPivot _),
    "q_unpivot" -> (qUnpivot _),
    "q_period_fanout" -> (qPeriodFanout _),
    "q_semi_anti" -> (qSemiAnti _),
    "q_window_rank" -> (qWindowRank _),
    "q_topk_native" -> (qTopkNative _),
    "q_rollup" -> (qRollup _),
    "q_normalize_text" -> (qNormalizeText _),
    "q_multi_replace" -> (qMultiReplace _),
    "q_deterministic_id" -> (qDeterministicId _),
    "q_deterministic_id_uuid5" -> (qDeterministicIdUuid5 _),
    "q_period_parse" -> (qPeriodParse _),
    "q_age_sex_standardize" -> (qAgeSexStandardize _),
    "q_type_hygiene" -> (qTypeHygiene _),
    "q_rules_flag" -> (qRulesFlag _),
    "q_rules_split" -> (qRulesSplit _),
    "q_rules_formula" -> (qRulesFormula _),
    "q_rules_matrix_export" -> (qRulesMatrixExport _),
    "q_quality_checks" -> (qQualityChecks _),
    "q_quality_checks_stream" -> (qQualityChecksStream _),
    "q_approx_quantiles" -> (qApproxQuantiles _),
    "q_melt_indicators" -> (qMeltIndicators _),
    "q_fuzzy_match" -> (qFuzzyMatch _),
    "q_jaro_winkler" -> (qJaroWinkler _),
    "q_edit_join" -> (qEditJoin _),
    "q_ab_test" -> (qAbTest _),
    "q_ab_power" -> (qAbPower _),
    "q_msprt" -> (qMsprt _),
    "q_effect_size" -> (qEffectSize _),
    "q_msprt_stream" -> (qMsprtStream _),
    "q_ab_power_stream" -> (qAbPowerStream _),
    "q_effect_size_stream" -> (qEffectSizeStream _),
    "q_uplift_deciles" -> (qUpliftDeciles _),
    "q_meta_analysis" -> (qMetaAnalysis _),
    "q_propensity_match" -> (qPropensityMatch _),
    "q_neyman_allocation" -> (qNeymanAllocation _),
    "q_deterministic_shuffle" -> (qDeterministicShuffle _),
    "q_strip_markup" -> (qStripMarkup _),
    "q_canonicalize_urls" -> (qCanonicalizeUrls _),
    "q_er_pipeline" -> (qErPipeline _),
    "q_encoding_anomalies" -> (qEncodingAnomalies _),
    "q_hellinger_drift_stream" -> (qHellingerDriftStream _),
    "q_als" -> (qAls _),
    "q_detect_pan" -> (qDetectPan _),
    "q_transitions" -> (qTransitions _),
    "q_token_set_ratio" -> (qTokenSetRatio _),
    "q_dedup_exact" -> (qDedupExact _),
    "q_dedup_keep_first" -> (qDedupKeepFirst _),
    "q_dedup_minhash" -> (qDedupMinhash _),
    "q_dedup_minhash_bands" -> (qDedupMinhashBands _),
    "q_dedup_simhash" -> (qDedupSimhash _),
    "q_dedup_jaccard" -> (qDedupJaccard _),
    "q_cosine_topk" -> (qCosineTopK _),
    "q_ranking_metrics" -> (qRankingMetrics _),
    "q_assign_clusters" -> (qAssignClusters _),
    "q_semdedup" -> (qSemDedup _),
    "q_ann_lsh" -> (qAnnLsh _),
    "q_dedup_embedding" -> (qDedupEmbedding _),
    "q_ann_ivf" -> (qAnnIvf _),
    "q_ann_quantized" -> (qAnnQuantized _),
    "q_ann_pq" -> (qAnnPq _),
    "q_script_detect" -> (qScriptDetect _),
    "q_rolling_distinct" -> (qRollingDistinct _),
    "q_fix_mojibake" -> (qFixMojibake _),
    "q_benford" -> (qBenford _),
    "q_image_meta" -> (qImageMeta _),
    "q_flatten_structs" -> (qFlattenStructs _),
    "q_chi_square" -> (qChiSquare _),
    "q_g_test" -> (qGTest _),
    "q_g_test_stream" -> (qGTestStream _),
    "q_two_proportion" -> (qTwoProportion _),
    "q_two_proportion_stream" -> (qTwoProportionStream _),
    "q_llm_pipeline" -> (qLlmPipeline _),
    "q_copurchase" -> (qCopurchase _),
    "q_bfs_hops" -> (qBfsHops _),
    "q_label_encode" -> (qLabelEncode _),
    "q_target_encode" -> (qTargetEncode _),
    "q_target_encode_oof" -> (qTargetEncodeOof _),
    "q_assoc_rules" -> (qAssocRules _),
    "q_tpch_q12" -> (qTpchQ12 _),
    "q_psi_drift" -> (qPsiDrift _),
    "q_psi_drift_stream" -> (qPsiDriftStream _),
    "q_golden_record" -> (qGoldenRecord _),
    "q_golden_record_stream" -> (qGoldenRecordStream _),
    "q_llm_pipeline3" -> (qLlmPipeline3 _),
    "q_triangles" -> (qTriangles _),
    "q_lang_id" -> (qLangId _),
    "q_text_quality" -> (qTextQuality _),
    "q_gopher_quality" -> (qGopherQuality _),
    "q_c4_filter" -> (qC4Filter _),
    "q_truncate_vocab" -> (qTruncateVocab _),
    "q_c4_filter_stream" -> (qC4FilterStream _),
    "q_inverted_index" -> (qInvertedIndex _),
    "q_compression_ratio" -> (qCompressionRatio _),
    "q_linkage_score" -> (qLinkageScore _),
    "q_sorted_neighborhood" -> (qSortedNeighborhood _),
    "q_damerau" -> (qDamerau _),
    "q_incremental_join" -> (qIncrementalJoin _),
    "q_bm25_topk" -> (qBm25TopK _),
    "q_token_count" -> (qTokenCount _),
    "q_fingerprint" -> (qFingerprint _),
    "q_fingerprint_winnow" -> (qFingerprintWinnow _),
    "q_fingerprint_overlap" -> (qFingerprintOverlap _),
    "q_multimodal_meta" -> (qMultimodalMeta _),
    "q_multimodal_frames" -> (qMultimodalFrames _),
    "q_pipeline_e2e" -> (qPipelineE2e _),
    "q_word_freq" -> (qWordFreq _),
    "q_word_repetition" -> (qWordRepetition _),
    "q_decontaminate" -> (qDecontaminate _),
    "q_decontaminate_neardup" -> (qDecontaminateNearDup _),
    "q_decontaminate_neardup_stream" -> (qDecontaminateNearDupStream _),
    "q_dup_ngrams" -> (qDupNgrams _),
    "q_dup_spans" -> (qDupSpans _),
    "q_dup_spans_removal" -> (qDupSpansRemoval _),
    "q_dup_spans_keepfirst" -> (qDupSpansKeepFirst _),
    "q_llm_pipeline2" -> (qLlmPipeline2 _),
    "q_window_suite" -> (qWindowSuite _),
    "q_tpch_q22" -> (qTpchQ22 _),
    "q_train_test_split" -> (qTrainTestSplit _),
    "q_redact_pii" -> (qRedactPii _),
    "q_upsert" -> (qUpsert _),
    "q_cdc_apply" -> (qCdcApply _),
    "q_cdc_apply_stream" -> (qCdcApplyStream _),
    "q_scd2_from_cdc" -> (qScd2FromCdc _),
    "q_tpch_q2" -> (qTpchQ2 _),
    "q_tpch_q4" -> (qTpchQ4 _),
    "q_tpch_q6" -> (qTpchQ6 _),
    "q_tpch_q7" -> (qTpchQ7 _),
    "q_tpch_q8" -> (qTpchQ8 _),
    "q_tpch_q9" -> (qTpchQ9 _),
    "q_tpch_q10" -> (qTpchQ10 _),
    "q_tpch_q11" -> (qTpchQ11 _),
    "q_tpch_q13" -> (qTpchQ13 _),
    "q_tpch_q14" -> (qTpchQ14 _),
    "q_tpch_q15" -> (qTpchQ15 _),
    "q_tpch_q16" -> (qTpchQ16 _),
    "q_tpch_q19" -> (qTpchQ19 _),
    "q_tpch_q20" -> (qTpchQ20 _),
    "q_tpch_q21" -> (qTpchQ21 _),
    "q_grouping_sets" -> (qGroupingSets _),
    "q_incremental_agg" -> (qIncrementalAgg _),
    "q_zorder_layout" -> (qZorderLayout _),
    "q_partitioned_export" -> (qPartitionedExport _),
    "q_orc_roundtrip" -> (qOrcRoundtrip _),
    "q_jdbc_roundtrip" -> (qJdbcRoundtrip _),
    "q_compact_roundtrip" -> (qCompactRoundtrip _),
    "q_overwrite_partitions" -> (qOverwritePartitions _),
    "q_xml_roundtrip" -> (qXmlRoundtrip _),
    "q_jsonl_export" -> (qJsonlExport _),
    "q_snapshot_diff" -> (qSnapshotDiff _),
    "q_chunk_text" -> (qChunkText _),
    "q_lm_score" -> (qLmScore _),
    "q_perplexity" -> (qPerplexity _),
    "q_perplexity_stream" -> (qPerplexityStream _),
    "q_char_entropy" -> (qCharEntropy _),
    "q_mean_pool" -> (qMeanPool _),
    "q_l2_normalize" -> (qL2Normalize _),
    "q_corpus_overlap" -> (qCorpusOverlap _),
    "q_decontaminate_stream" -> (qDecontaminateStream _),
    "q_bucketed_join" -> (qBucketedJoin _),
    "q_dedup_stream" -> (qDedupStream _),
    "q_stratified_sample" -> (qStratifiedSample _),
    "q_pack_sequences" -> (qPackSequences _),
    "q_pack_text" -> (qPackText _),
    "q_quality_gate" -> (qQualityGate _),
    "q_global_row_numbers" -> (qGlobalRowNumbers _),
    "q_heavy_hitters" -> (qHeavyHitters _),
    "q_tfidf" -> (qTfIdf _),
    "q_weighted_mix" -> (qWeightedMix _),
    "q_temperature_weights" -> (qTemperatureWeights _),
    "q_interval_join" -> (qIntervalJoin _),
    "q_interval_join_stream" -> (qIntervalJoinStream _),
    "q_asof_join" -> (qAsofJoin _),
    "q_range_join" -> (qRangeJoin _),
    "q_rolling_agg" -> (qRollingAgg _),
    "q_percentile" -> (qPercentile _),
    "q_winsorize_grouped" -> (qWinsorizeGrouped _),
    "q_mad_outliers" -> (qMadOutliers _),
    "q_interval_islands" -> (qIntervalIslands _),
    "q_equidepth_hist" -> (qEquidepthHist _),
    "q_skew_report" -> (qSkewReport _),
    "q_overlap_estimate" -> (qOverlapEstimate _),
    "q_prorate" -> (qProrate _),
    "q_twap" -> (qTwap _),
    "q_cusum" -> (qCusum _),
    "q_ewma" -> (qEwma _),
    "q_rolling_corr" -> (qRollingCorr _),
    "q_ks_test" -> (qKsTest _),
    "q_mann_whitney" -> (qMannWhitney _),
    "q_ols_trend" -> (qOlsTrend _),
    "q_k_anonymity" -> (qKAnonymity _),
    "q_mutual_info" -> (qMutualInfo _),
    "q_negative_sample" -> (qNegativeSample _),
    "q_dsir" -> (qDsir _),
    "q_heaps" -> (qHeaps _),
    "q_dsir_stream" -> (qDsirStream _),
    "q_quantile_normalize" -> (qQuantileNormalize _),
    "q_fixedwidth_roundtrip" -> (qFixedWidthRoundtrip _),
    "q_join_fanout" -> (qJoinFanout _),
    "q_period_over_period" -> (qPeriodOverPeriod _),
    "q_skyline" -> (qSkyline _),
    "q_fd_check" -> (qFdCheck _),
    "q_impute" -> (qImpute _),
    "q_approx_distinct" -> (qApproxDistinct _),
    "q_event_window" -> (qEventWindow _),
    "q_event_window_stream" -> (qEventWindowStream _),
    "q_sessionize" -> (qSessionize _),
    "q_session_window" -> (qSessionWindow _),
    "q_sessionize_stream" -> (qSessionizeStream _),
    "q_json_extract" -> (qJsonExtract _),
    "q_grid_ingest" -> (qGridIngest _),
    "q_http_ingest" -> (qHttpIngest _),
    "q_http_paged" -> (qHttpPaged _),
    "q_boilerplate" -> (qBoilerplate _),
    "q_gap_fill" -> (qGapFill _),
    "q_profile" -> (qProfile _),
    "q_ecdf" -> (qEcdf _),
    "q_funnel" -> (qFunnel _),
    "q_funnel_stream" -> (qFunnelStream _),
    "q_heavy_hitters_stream" -> (qHeavyHittersStream _),
    "q_top_events" -> (qTopEvents _),
    "q_top_events_stream" -> (qTopEventsStream _),
    "q_transitions_stream" -> (qTransitionsStream _),
    "q_bpe" -> (qBpe _),
    "q_tpch_q3" -> (qTpchQ3 _),
    "q_tpch_q18" -> (qTpchQ18 _),
    "q_tpch_q17" -> (qTpchQ17 _),
    "q_tpch_q5" -> (qTpchQ5 _),
    "q_session_paths" -> (qSessionPaths _),
    "q_retention" -> (qRetention _),
    "q_fk_check" -> (qFkCheck _),
    "q_forward_fill" -> (qForwardFill _),
    "q_scd2" -> (qScd2 _),
    "q_histogram" -> (qHistogram _),
    "q_corr_matrix" -> (qCorrMatrix _),
    "q_dedup_allpairs" -> (qDedupAllpairs _),
    "q_connected_components" -> (qConnectedComponents _),
    "q_containment_join" -> (qContainmentJoin _),
    "q_weighted_sample" -> (qWeightedSample _),
    "q_ecdf_grouped" -> (qEcdfGrouped _),
    "q_sketch_cube" -> (qSketchCube _),
    "q_quantile_cube" -> (qQuantileCube _),
    "q_quantile_cube_stream" -> (qQuantileCubeStream _),
    "q_cms_counts" -> (qCmsCounts _),
    "q_cms_counts_stream" -> (qCmsCountsStream _),
    "q_theta_setops" -> (qThetaSetops _),
    "q_funnel_latency" -> (qFunnelLatency _),
    "q_theta_setops_stream" -> (qThetaSetopsStream _),
    "q_rolling_distinct_stream" -> (qRollingDistinctStream _),
    "q_rolling_zscore" -> (qRollingZscore _),
    "q_attribution" -> (qAttribution _),
    "q_attribution_stream" -> (qAttributionStream _),
    "q_pagerank" -> (qPageRank _),
    "q_ppr" -> (qPersonalizedPageRank _),
    "q_hits" -> (qHits _),
    "q_link_predict" -> (qLinkPredict _),
    "q_assortativity" -> (qAssortativity _),
    "q_ktruss" -> (qKtruss _),
    "q_cluster_quality" -> (qClusterQuality _),
    "q_ccf" -> (qCcf _),
    "q_dtw" -> (qDtwProfiles _),
    "q_holt_winters" -> (qHoltWinters _),
    "q_kalman" -> (qKalman _),
    "q_query_likelihood" -> (qQueryLikelihood _),
    "q_rake" -> (qRake _),
    "q_slope_one" -> (qSlopeOne _),
    "q_rec_metrics" -> (qRecMetrics _),
    "q_fisher" -> (qFisher _),
    "q_durbin_watson" -> (qDurbinWatson _),
    "q_cochran_armitage" -> (qCochranArmitage _),
    "q_noisy_counts" -> (qNoisyCounts _),
    "q_srm_check" -> (qSrmCheck _),
    "q_mi_binned" -> (qMiBinned _),
    "q_llm_pipeline4" -> (qLlmPipeline4 _),
    "q_seasonal_strength" -> (qSeasonalStrength _),
    "q_diff_in_diff" -> (qDiffInDiff _),
    "q_strat_ate" -> (qStratAte _),
    "q_conformal" -> (qConformal _),
    "q_reliability" -> (qReliability _),
    "q_brier" -> (qBrier _),
    "q_logistic" -> (qLogistic _),
    "q_conformal_stream" -> (qConformalStream _),
    "q_ipw_ate" -> (qIpwAte _),
    "q_aipw_ate" -> (qAipwAte _),
    "q_source_ablation" -> (qSourceAblation _),
    "q_quant_reg" -> (qQuantReg _),
    "q_svm" -> (qSvm _),
    "q_stump" -> (qStump _),
    "q_gb_stumps" -> (qGbStumps _),
    "q_bagged_stumps" -> (qBaggedStumps _),
    "q_seq_patterns" -> (qSeqPatterns _),
    "q_soundex_blocks" -> (qSoundexBlocks _),
    "q_kish" -> (qKish _),
    "q_poisson" -> (qPoisson _),
    "q_kish_stream" -> (qKishStream _),
    "q_competing_risks" -> (qCompetingRisks _),
    "q_jackknife" -> (qJackknife _),
    "q_naive_bayes" -> (qNaiveBayes _),
    "q_naive_bayes_stream" -> (qNaiveBayesStream _),
    "q_linreg" -> (qLinReg _),
    "q_ridge" -> (qRidge _),
    "q_chi2_keywords" -> (qChi2Keywords _),
    "q_cox_ph" -> (qCoxPh _),
    "q_ipf_rake" -> (qIpfRake _),
    "q_markov_attribution" -> (qMarkovAttribution _),
    "q_shapley_attribution" -> (qShapleyAttribution _),
    "q_jarque_bera" -> (qJarqueBera _),
    "q_levene" -> (qLevene _),
    "q_mcnemar" -> (qMcnemar _),
    "q_friedman" -> (qFriedman _),
    "q_classification_report" -> (qClassificationReport _),
    "q_cochran_q" -> (qCochranQ _),
    "q_runs_test" -> (qRunsTest _),
    "q_textrank" -> (qTextRank _),
    "q_burrows_delta" -> (qBurrowsDelta _),
    "q_winsorize" -> (qWinsorize _),
    "q_coerce_timestamps" -> (qCoerceTimestamps _),
    "q_dedup_lines" -> (qDedupLines _),
    "q_spatial_join" -> (qSpatialJoin _),
    "q_survival" -> (qSurvival _),
    "q_rmst" -> (qRmst _),
    "q_backtest_naive" -> (qBacktestNaive _),
    "q_ols_diagnostics" -> (qOlsDiagnostics _),
    "q_logrank" -> (qLogrank _),
    "q_wasserstein" -> (qWasserstein _),
    "q_wasserstein_stream" -> (qWassersteinStream _),
    "q_cvm" -> (qCramerVonMises _),
    "q_anderson_darling" -> (qAndersonDarling _),
    "q_yuen" -> (qYuen _),
    "q_roc_auc" -> (qRocAuc _),
    "q_avg_precision" -> (qAveragePrecision _),
    "q_lift_table" -> (qLiftTable _),
    "q_woe_iv" -> (qWoeIv _),
    "q_seasonal" -> (qSeasonal _),
    "q_rfm" -> (qRfm _),
    "q_item_cosine" -> (qItemCosine _),
    "q_audio_meta" -> (qAudioMeta _),
    "q_spatial_nearest" -> (qSpatialNearest _),
    "q_seasonal_anomaly" -> (qSeasonalAnomaly _),
    "q_ltv_curve" -> (qLtvCurve _),
    "q_gini" -> (qGini _),
    "q_theil_sen" -> (qTheilSen _),
    "q_weighted_median" -> (qWeightedMedian _),
    "q_bh_adjust" -> (qBhAdjust _),
    "q_by_adjust" -> (qByAdjust _),
    "q_holm_adjust" -> (qHolmAdjust _),
    "q_trimmed_mean" -> (qTrimmedMean _),
    "q_gini_stream" -> (qGiniStream _),
    "q_diversity_stream" -> (qDiversityStream _),
    "q_spatial_clusters" -> (qSpatialClusters _),
    "q_spatial_join_stream" -> (qSpatialJoinStream _),
    "q_interpolate" -> (qInterpolate _),
    "q_scd2_snapshot" -> (qScd2Snapshot _),
    "q_video_meta" -> (qVideoMeta _),
    "q_bootstrap_ci" -> (qBootstrapCi _),
    "q_peak_concurrency" -> (qPeakConcurrency _),
    "q_top_share" -> (qTopShare _),
    "q_moments" -> (qMoments _),
    "q_clustering_coeff" -> (qClusteringCoeff _),
    "q_weighted_median_stream" -> (qWeightedMedianStream _),
    "q_running_total" -> (qRunningTotal _),
    "q_active_users" -> (qActiveUsers _),
    "q_readability" -> (qReadability _),
    "q_ohlc" -> (qOhlc _),
    "q_acf" -> (qAcf _),
    "q_ar_forecast" -> (qArForecast _),
    "q_var1" -> (qVar1 _),
    "q_mann_kendall" -> (qMannKendall _),
    "q_granger" -> (qGranger _),
    "q_seasonal_power" -> (qSeasonalPower _),
    "q_kn_perplexity" -> (qKnPerplexity _),
    "q_betweenness" -> (qBetweenness _),
    "q_rdd" -> (qRdd _),
    "q_capture_recapture" -> (qCaptureRecapture _),
    "q_rdd_stream" -> (qRddStream _),
    "q_poisson_dispersion" -> (qPoissonDispersion _),
    "q_jackknife_stream" -> (qJackknifeStream _),
    "q_llm_pipeline5" -> (qLlmPipeline5 _),
    "q_bradley_terry" -> (qBradleyTerry _),
    "q_herfindahl" -> (qHerfindahl _),
    "q_cuped" -> (qCuped _),
    "q_cuped_stream" -> (qCupedStream _),
    "q_calibration_error" -> (qCalibrationError _),
    "q_scorer_agreement" -> (qScorerAgreement _),
    "q_hellinger_drift" -> (qHellingerDrift _),
    "q_pacf" -> (qPacf _),
    "q_l_diversity" -> (qLDiversity _),
    "q_rank_fusion" -> (qRankFusion _),
    "q_interval_join_outer" -> (qIntervalJoinOuter _),
    "q_interval_join_outer_stream" -> (qIntervalJoinOuterStream _),
    "q_kcenter" -> (qKcenter _),
    "q_cdc_chunks" -> (qCdcChunks _),
    "q_mmr" -> (qMmr _),
    "q_max_drawdown" -> (qMaxDrawdown _),
    "q_pareto_abc" -> (qParetoAbc _),
    "q_t_closeness" -> (qTCloseness _),
    "q_one_hot" -> (qOneHot _),
    "q_log_odds" -> (qLogOdds _),
    "q_kcore" -> (qKcore _),
    "q_ohlc_stream" -> (qOhlcStream _),
    "q_pca" -> (qPca _),
    "q_jl_distortion" -> (qJlDistortion _),
    "q_hash_features" -> (qHashFeatures _),
    "q_js_drift" -> (qJsDrift _),
    "q_js_drift_stream" -> (qJsDriftStream _),
    "q_embed_quality" -> (qEmbedQuality _),
    "q_isotonic" -> (qIsotonic _),
    "q_bbox_join" -> (qBboxJoin _),
    "q_pca_ann" -> (qPcaAnn _),
    "q_cms_join_size" -> (qCmsJoinSize _),
    "q_apportion" -> (qApportion _),
    "q_calibration" -> (qCalibration _),
    "q_lttb" -> (qLttb _),
    "q_histogram2d" -> (qHistogram2d _),
    "q_attribution_linear" -> (qAttributionLinear _),
    "q_degree_tail" -> (qDegreeTail _),
    "q_schema_contract" -> (qSchemaContract _),
    "q_calibration_stream" -> (qCalibrationStream _),
    "q_attribution_decay" -> (qAttributionDecay _),
    "q_wallet_balance" -> (qWalletBalance _),
    "q_changepoint" -> (qChangepoint _),
    "q_label_prop" -> (qLabelProp _),
    "q_holt" -> (qHolt _),
    "q_croston" -> (qCroston _),
    "q_croston_stream" -> (qCrostonStream _),
    "q_anova" -> (qAnova _),
    "q_zipf" -> (qZipf _),
    "q_collocations" -> (qCollocations _),
    "q_kmeans" -> (qKmeans _),
    "q_forecast_backtest" -> (qForecastBacktest _),
    "q_sax" -> (qSax _),
    "q_tukey" -> (qTukey _),
    "q_forecast_backtest_stream" -> (qForecastBacktestStream _),
    "q_sax_stream" -> (qSaxStream _),
    "q_kalman_stream" -> (qKalmanStream _),
    "q_page_trend" -> (qPageTrend _),
    "q_hurst" -> (qHurst _),
    "q_huber" -> (qHuber _),
    "q_geo_median" -> (qGeoMedian _),
    "q_mantel_haenszel" -> (qMantelHaenszel _),
    "q_kendall" -> (qKendall _),
    "q_cronbach" -> (qCronbach _),
    "q_cohen_kappa" -> (qCohenKappa _),
    "q_fleiss_kappa" -> (qFleissKappa _),
    "q_lorenz" -> (qLorenz _),
    "q_theil" -> (qTheil _),
    "q_theil_decomp" -> (qTheilDecomp _),
    "q_modularity" -> (qModularity _),
    "q_vocab_stats" -> (qVocabStats _),
    "q_vocab_richness" -> (qVocabRichness _),
    "q_kruskal_wallis" -> (qKruskalWallis _),
    "q_spearman" -> (qSpearman _),
    "q_bloom_prune" -> (qBloomPrune _),
    "q_point_in_polygon" -> (qPointInPolygon _),
    "q_knn" -> (qKnn _),
    "q_feature_scaling" -> (qFeatureScaling _),
    "q_mst" -> (qMst _),
    "q_frequent_triples" -> (qFrequentTriples _),
    "q_rocchio" -> (qRocchio _),
    "q_attribution_position" -> (qAttributionPosition _),
    "q_jsonl_compressed" -> (qJsonlCompressed _),
    "q_rouge" -> (qRouge _),
    "q_bleu" -> (qBleu _),
    "q_chrf" -> (qChrf _),
    "q_wilcoxon" -> (qWilcoxon _),
    "q_sign_test" -> (qSignTest _),
    "q_icc" -> (qIcc _),
    "q_iv_wald" -> (qIvWald _),
    "q_cliffs_delta" -> (qCliffsDelta _),
    "q_kendall_w" -> (qKendallW _),
    "q_chi2_gof" -> (qChi2Gof _),
    "q_jonckheere" -> (qJonckheere _),
    "q_cmh" -> (qCmh _),
    "q_km_greenwood" -> (qKmGreenwood _),
    "q_eb_shrinkage" -> (qEbShrinkage _),
    "q_exp_mechanism" -> (qExpMechanism _),
    "q_dbscan" -> (qDbscan _),
    "q_ams_f2" -> (qAmsF2 _),
    "q_tiff_webp" -> (qTiffWebp _),
    "q_krippendorff" -> (qKrippendorff _),
    "q_mcc" -> (qMcc _),
    "q_mcc_stream" -> (qMccStream _),
    "q_class_report_stream" -> (qClassReportStream _),
    "q_randomized_response" -> (qRandomizedResponse _),
    "q_diversity" -> (qDiversity _))

  /** k-center greedy coreset over the embeddings corpus — 8 maximally-spread
    * exemplars plus the covering-radius trace. Oracle=sql since r10: the
    * k=8 argmax chain unrolls as MATERIALIZED CTE rounds (see
    * [[kcenterOracle]]); geometry also pinned by SimilaritySpec. */
  private def qKcenter(s: SparkSession, d: String): DataFrame =
    Similarity.kCenterSample(Tables.embeddings(s, d), "vec_id", "embedding", k = 8)
      .orderBy("selection_order")

  /** Content-defined-chunking dedup readout per source — how much of each
    * source's byte stream is redundant at the chunk level. Rows-only by
    * design (the gear rolling hash is not SQL-expressible); the boundary
    * semantics and resync property are pinned in TextAnalysisSpec. */
  private def qCdcChunks(s: SparkSession, d: String): DataFrame =
    TextAnalysis.cdcDedupStats(Tables.documents(s, d), "source", "doc_id", "text")
      .orderBy("source")

  /** MMR diversity rerank of the top-100 longest documents (relevance =
    * n_chars, embeddings joined from the embeddings table), λ=0.7, k=20.
    * Rows-only by design (greedy sequential selection); duplicate
    * suppression is pinned in SimilaritySpec. */
  private def qMmr(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
      .select(col("doc_id"), col("n_chars"))
    val top = docs
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id"))))
      .filter(col("rank") <= 100)
    val cands = top.join(Tables.embeddings(s, d),
        top("doc_id") === col("vec_id"))
      .select(col("doc_id"), col("n_chars").cast("double").as("rel"), col("embedding"))
    Similarity.mmrRerank(cands, "doc_id", "rel", "embedding", k = 20)
      .orderBy("selection_order")
  }

  /** Flesch reading-ease over the documents corpus — the pretraining
    * quality-gate readability signal; pure map-side regex counts + one fixed
    * IEEE chain (TextAnalysis.readability). */
  private def qReadability(s: SparkSession, d: String): DataFrame =
    TextAnalysis.readability(Tables.documents(s, d), "doc_id", "text")
      .orderBy("doc_id")

  /** Daily OHLC bars per event type — resample-to-bars with open/close on
    * the explicit (ts, event_id) TOTAL order and the dollar sum in exact
    * cents; one shuffle (window + group agg share the partitioning). */
  private def qOhlc(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d).select(
      col("event_type"),
      date_trunc("day", col("ts")).as("day"),
      col("ts"), col("event_id"), col("value"),
      floor(col("value") * 100 + 0.5).cast("long").as("cents"))
    Temporal.ohlcBars(ev, Seq("event_type"), "day", "ts", "event_id", "value", "cents")
      .orderBy("event_type", "day")
  }

  /** Autocorrelation (lags 1..7) of each event type's gap-filled daily count
    * series — weekly-seasonality readout; exact integer sufficient
    * statistics, fixed double assembly (Temporal.acf). */
  /** PACF (Durbin–Levinson over the exact-sum acf) of each event type's
    * daily-count series, lags 1..7 — the AR-order readout next to q_acf. */
  private def qPacf(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val spine = cnt.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 DAY"))).as("day"))
    val series = spine.join(cnt, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    Temporal.pacf(series, Seq("event_type"), "day", "x", 7)
      .orderBy("event_type", "lag")
  }

  /** Weekly periodogram power (X272) per event type over the q_acf daily
    * series — the period-7 harmonic's amplitude and variance share. */
  private def qSeasonalPower(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val spine = cnt.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 DAY"))).as("day"))
    val series = spine.join(cnt, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    Temporal.seasonalPower(series, Seq("event_type"), "day", "x", period = 7)
      .orderBy("event_type")
  }

  /** Granger causality (X271) on the q_var1 series: does purchase lag
    * improve view prediction (and vice versa)? Closed-form F tests. */
  private def qGranger(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val spine = cnt.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 DAY"))).as("day"))
    val series = spine.join(cnt, Seq("day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
      .withColumn("y", coalesce(col("y"), lit(0L)))
    Temporal.grangerCausality(series, "day", "x", "y").orderBy("direction")
  }

  /** Mann–Kendall trend test (X270) per event type over the q_acf
    * daily-count series — exact integer pair-sign sums. */
  private def qMannKendall(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val spine = cnt.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 DAY"))).as("day"))
    val series = spine.join(cnt, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    Temporal.mannKendall(series, Seq("event_type"), "day", "x")
      .orderBy("event_type")
  }

  /** Seasonal-naive backtest + MASE (X293) per event type over the
    * q_mann_kendall daily-count spine — m=7 weekly naive, last 7 days
    * held out; the "does any model beat copy-last-week" gate. */
  private def qBacktestNaive(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val spine = cnt.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 DAY"))).as("day"))
    val series = spine.join(cnt, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    Temporal.backtestSeasonalNaive(series, Seq("event_type"), "day", "x",
        period = 7, holdout = 7)
      .orderBy("event_type")
  }

  /** OLS residual diagnostics (X297) on the q_linreg fit — Durbin–Watson
    * serial-correlation readout over order-date order plus the
    * Breusch–Pagan heteroskedasticity LM with its elementary χ²(2) p. */
  private def qOlsDiagnostics(s: SparkSession, d: String): DataFrame =
    Models.olsDiagnostics(
      Tables.orders(s, d)
        .join(Tables.customer(s, d).select(col("c_custkey"), col("c_acctbal")),
          col("o_custkey") === col("c_custkey"))
        .withColumn("v", col("o_totalprice") / 100000.0)
        .withColumn("x1",
          datediff(col("o_orderdate").cast("date"), lit("1992-01-01").cast("date"))
            .cast("double") / 2500.0)
        .withColumn("x2", col("c_acctbal") / 10000.0),
      orderCols = Seq("o_orderdate", "o_orderkey"), "v", Seq("x1", "x2"))

  /** Bivariate VAR(1) (X268): daily view (x) and purchase (y) counts —
    * two exact closed-form OLS equations on the lagged pair + one-step
    * forecasts from the last observation. */
  private def qVar1(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.events(s, d)
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(date_trunc("day", col("ts")).as("day"))
      .agg(sum(when(col("event_type") === "view", 1L).otherwise(0L)).as("x"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L)).as("y"))
    val spine = cnt.agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 DAY"))).as("day"))
    val series = spine.join(cnt, Seq("day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
      .withColumn("y", coalesce(col("y"), lit(0L)))
    Temporal.var1(series, "day", "x", "y").orderBy("equation")
  }

  /** AR(2) Yule–Walker fit + 3-step forecast (X257) per event type over
    * the q_acf daily-count series. */
  private def qArForecast(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val spine = cnt.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 DAY"))).as("day"))
    val series = spine.join(cnt, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    Temporal.arYuleWalker(series, Seq("event_type"), "day", "x", horizon = 3)
      .orderBy("event_type")
  }

  private def qAcf(s: SparkSession, d: String): DataFrame = {
    val cnt = Tables.events(s, d)
      .groupBy(col("event_type"), date_trunc("day", col("ts")).as("day"))
      .agg(count(lit(1)).as("x"))
    val spine = cnt.groupBy(col("event_type"))
      .agg(min(col("day")).as("mn"), max(col("day")).as("mx"))
      .select(col("event_type"),
        explode(sequence(col("mn"), col("mx"), expr("INTERVAL 1 DAY"))).as("day"))
    val series = spine.join(cnt, Seq("event_type", "day"), "left")
      .withColumn("x", coalesce(col("x"), lit(0L)))
    Temporal.acf(series, Seq("event_type"), "day", "x", 7)
      .orderBy("event_type", "lag")
  }

  /** l-diversity privacy audit on the customer dim: quasi-identifiers
    * (nation, segment), sensitive attribute = account-balance band — flags
    * equivalence classes where fewer than 3 distinct bands survive. */
  private def qLDiversity(s: SparkSession, d: String): DataFrame = {
    val cust = Tables.customer(s, d).select(
      col("c_nationkey"), col("c_mktsegment"),
      floor(col("c_acctbal") / 1000).cast("long").as("bal_band"))
    Quality.lDiversity(cust, Seq("c_nationkey", "c_mktsegment"), "bal_band", 3L)
      .orderBy("c_nationkey", "c_mktsegment")
  }

  /** Reciprocal-rank fusion of two document rankings (by length, by distinct
    * word count — stand-ins for the lexical/dense retriever pair), k0=60,
    * top-50 fused — Similarity.rrfFuse over k-bounded top-100 lists. */
  private def qRankFusion(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val docs = Tables.documents(s, d)
    val byLen = docs.select(col("doc_id"),
      row_number().over(Window.orderBy(col("n_chars").desc, col("doc_id"))).as("rank"))
      .filter(col("rank") <= 100)
    val byVocab = docs.select(col("doc_id"),
      row_number().over(Window.orderBy(
        size(array_distinct(regexp_extract_all(lower(col("text")), lit("[a-z]+"), lit(0)))).desc,
        col("doc_id"))).as("rank"))
      .filter(col("rank") <= 100)
    Similarity.rrfFuse(Seq(byLen, byVocab), "doc_id", "rank")
      .orderBy(col("rrf_score").desc, col("doc_id"))
      .limit(50)
  }

  /** Click→purchase attribution as a LEFT-OUTER interval join: every click
    * keeps a row, unconverted clicks carry a null purchase_id. Clicks are
    * bounded to min(max click ts, max purchase ts) − 3601 s: the streaming
    * twin's global watermark is the MIN over both streams' watermarks
    * (30 min each), so every retained click's outer-join state (horizon
    * 30 min) provably expires before end-of-stream — stream == batch. */
  private def outerJoinCutoff(s: SparkSession, d: String): java.sql.Timestamp = {
    val r = Tables.events(s, d).select(col("event_type"), col("ts").cast("timestamp").as("ts"))
      .agg(
        max(when(col("event_type") === "click", col("ts"))).as("mc"),
        max(when(col("event_type") === "purchase", col("ts"))).as("mp"))
      .head
    val (mc, mp) = (r.getTimestamp(0), r.getTimestamp(1))
    if (mc.before(mp)) mc else mp
  }

  private def qIntervalJoinOuter(s: SparkSession, d: String): DataFrame = {
    val ev = Tables.events(s, d)
      .select(col("event_id"), col("user_id"), col("event_type"),
        col("ts").cast("timestamp").as("ts"))
    val cutoff = outerJoinCutoff(s, d)
    val clicks = ev.filter(col("event_type") === "click" &&
        col("ts") <= lit(cutoff) - expr("INTERVAL 3601 SECONDS"))
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id").as("p_user"),
        col("ts").as("pts"))
    clicks.join(purchases,
        col("user_id") === col("p_user") && col("pts") >= col("ts") &&
          col("pts") <= col("ts") + expr("INTERVAL 1800 SECONDS"), "left")
      .select(col("click_id"), col("purchase_id"))
      .orderBy("click_id", "purchase_id")
  }

  /** The STREAM-STREAM left-outer interval join against q_interval_join_outer's
    * batch oracle: outer nulls emit when the watermark passes each click's
    * join horizon, so with watermark 30 min the cutoff filter guarantees
    * every retained click's state expires before end-of-stream — the
    * outer-join state-eviction semantics oracle-gated, not just the inner
    * match set. */
  private def qIntervalJoinOuterStream(s: SparkSession, d: String): DataFrame = {
    import org.apache.spark.sql.streaming.Trigger
    val cutoff = outerJoinCutoff(s, d)
    def stream(): DataFrame =
      eventsStream(s, d)
        .select(col("event_id"), col("user_id"), col("event_type"), col("ts"))
    // the LEFT stream is NOT cutoff-filtered — its tail events keep the
    // left watermark high; the cutoff gates the OUTPUT instead
    val clicks = stream().filter(col("event_type") === "click")
      .select(col("event_id").as("click_id"), col("user_id"), col("ts"))
    val purchases = stream().filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"), col("ts"))
    val name = "graft_interval_join_outer_stream"
    withStatePartitions(s, 8) {
      val q = Events.intervalJoinStream(clicks, purchases, horizonSec = 1800L,
          watermark = "30 minutes", joinType = "left_outer")
        .filter(col("l.ts") <= lit(cutoff) - expr("INTERVAL 3601 SECONDS"))
        .select(col("click_id"), col("purchase_id"))
        .writeStream.format("memory").queryName(name)
        .outputMode("append")
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
    }
    s.table(name).orderBy("click_id", "purchase_id")
  }

  /** q_pagerank oracle: the 5 PageRank iterations unrolled as chained CTEs,
    * each replaying the exact quantization (floor(rank/outdeg*1e12+0.5)
    * long contributions, floor(((1.0-0.85)+0.85*s)*1e9+0.5)/1e9 rank) so
    * the doubles match bit-for-bit. Generated to keep the five rounds
    * structurally identical. */
  /** The q_holt recursive-CTE recipe over a zero-filled daily spine;
    * Croston state (z, p, q) seeds at the first demand, zero periods only
    * advance q — mirrors [[graft.operators.Temporal.crostonForecast]]
    * bit-for-bit. Shared by the batch gate and the streaming twin. */
  private val crostonOracle: String =
    """WITH RECURSIVE daily AS (
         SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS x
         FROM events WHERE value > 95.0 GROUP BY 1, 2),
       b AS (SELECT event_type, MIN(CAST(ts AS DATE)) AS lo, MAX(CAST(ts AS DATE)) AS hi
             FROM events GROUP BY 1),
       spine AS (SELECT event_type,
                        CAST(UNNEST(generate_series(CAST(lo AS TIMESTAMP),
                                                    CAST(hi AS TIMESTAMP),
                                                    INTERVAL 1 DAY)) AS DATE) AS day
                 FROM b),
       z0 AS (SELECT sp.event_type, sp.day, CAST(COALESCE(d.x, 0) AS DOUBLE) AS x
              FROM spine sp LEFT JOIN daily d
                ON sp.event_type = d.event_type AND sp.day = d.day),
       s AS (SELECT event_type AS g, x,
                    ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS step,
                    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
                    CAST(SUM(CASE WHEN x > 0 THEN 1 ELSE 0 END)
                         OVER (PARTITION BY event_type) AS BIGINT) AS nd
             FROM z0),
       cr AS (
         SELECT g, step, n, nd, x,
                CASE WHEN x > 0 THEN x END AS z,
                CASE WHEN x > 0 THEN CAST(1 AS DOUBLE) END AS p,
                CASE WHEN x > 0 THEN CAST(0 AS BIGINT) ELSE CAST(1 AS BIGINT) END AS q
         FROM s WHERE step = 1
         UNION ALL
         SELECT s.g, s.step, s.n, s.nd, s.x,
                CASE WHEN cr.z IS NULL THEN CASE WHEN s.x > 0 THEN s.x END
                     WHEN s.x > 0 THEN 0.3 * s.x + (1.0 - 0.3) * cr.z
                     ELSE cr.z END,
                CASE WHEN cr.z IS NULL THEN CASE WHEN s.x > 0 THEN CAST(cr.q + 1 AS DOUBLE) END
                     WHEN s.x > 0 THEN 0.3 * CAST(cr.q + 1 AS DOUBLE) + (1.0 - 0.3) * cr.p
                     ELSE cr.p END,
                CASE WHEN s.x > 0 THEN CAST(0 AS BIGINT) ELSE cr.q + 1 END
         FROM cr JOIN s ON s.g = cr.g AND s.step = cr.step + 1)
       SELECT g AS event_type, n, nd AS n_demands, z AS size_level,
              p AS interval_level, z / p AS forecast,
              (1.0 - 0.3 / 2) * (z / p) AS sba
       FROM cr WHERE step = n ORDER BY event_type"""

  private val c4FilterOracle: String =
    """WITH d AS (SELECT doc_id,
             regexp_replace(replace(text, 'data', 'data.'),
                            '((?:\S+ ){2}\S+) ', '\1' || chr(10), 'g') AS t
           FROM documents),
         l AS (SELECT doc_id,
                      unnest(string_split(t, chr(10))) AS line,
                      unnest(generate_series(1, len(string_split(t, chr(10))))) AS pos
               FROM d),
         f AS (SELECT doc_id, pos, line,
                      regexp_matches(rtrim(line), '[.!?"]$')
                        AND len(regexp_extract_all(line, '\S+')) >= 3
                        AND NOT contains(lower(line), 'javascript') AS keepl
               FROM l),
         agg AS (SELECT doc_id,
                        COALESCE(string_agg(CASE WHEN keepl THEN line END, chr(10) ORDER BY pos), '') AS clean_text,
                        CAST(SUM(CASE WHEN keepl THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
                        CAST(SUM(CASE WHEN NOT keepl THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_dropped
                 FROM f GROUP BY doc_id),
         fin AS (SELECT doc_id, clean_text, n_lines_kept, n_lines_dropped,
                        CAST(len(regexp_extract_all(clean_text, '[.!?]+')) AS BIGINT) AS n_sentences,
                        NOT contains(lower(clean_text), 'lorem ipsum') AS flag_lorem,
                        NOT contains(clean_text, '{') AS flag_brace,
                        NOT regexp_matches(lower(clean_text), '\bverboten\b') AS flag_blocklist
                 FROM agg)
         SELECT doc_id, clean_text, n_lines_kept, n_lines_dropped, n_sentences,
                n_sentences >= 5 AS flag_sentences, flag_lorem, flag_brace, flag_blocklist,
                n_sentences >= 5 AND flag_lorem AND flag_brace AND flag_blocklist AS keep
         FROM fin ORDER BY doc_id"""

  /** 20 unrolled absorption iterations over the (removal × state) table;
    * er/rl MATERIALIZED (each referenced once per round — un-hinted DuckDB
    * would re-derive the corpus-scale edge build every iteration, the
    * k-truss lesson) — mirrors
    * [[graft.operators.Funnel.markovAttribution]] bit-for-bit. */
  /** Exact Shapley replay: converter touch-set mask histogram, v(S) by
    * bit-containment join over the 16 subsets, integer factorial weights
    * by popcount (computed bit-by-bit — portable across engines), one
    * division by 4! — mirrors
    * [[graft.operators.Funnel.shapleyAttribution]] bit-for-bit (all
    * integer until the single correctly-rounded division). */
  private val shapleyAttributionOracle: String =
    """WITH conv AS (SELECT user_id, MIN(ts) AS ct
              FROM events WHERE event_type = 'purchase' GROUP BY 1),
     t AS (SELECT DISTINCT e.user_id,
                  CASE e.event_type WHEN 'click' THEN 1 WHEN 'error' THEN 2
                       WHEN 'signup' THEN 4 WHEN 'view' THEN 8 END AS b
           FROM events e JOIN conv USING (user_id)
           WHERE e.event_type <> 'purchase' AND e.ts < conv.ct),
     mk AS (SELECT user_id, CAST(SUM(b) AS BIGINT) AS m FROM t GROUP BY 1),
     mc AS (SELECT m, CAST(COUNT(*) AS BIGINT) AS cv FROM mk GROUP BY 1),
     tot AS (SELECT (SELECT COUNT(*) FROM conv) AS nconv,
                    COALESCE((SELECT SUM(cv) FROM mc), 0) AS ntouched),
     s AS (SELECT range AS sid FROM range(16)),
     v AS (SELECT s.sid, COALESCE(SUM(mc.cv), 0) AS vv
           FROM s LEFT JOIN mc ON (mc.m & s.sid) = mc.m GROUP BY 1),
     ch AS (SELECT * FROM (VALUES ('click', 1), ('error', 2),
                                  ('signup', 4), ('view', 8)) AS c(channel, bit)),
     phi AS (SELECT ch.channel,
                    CAST(SUM(CAST(CASE ((s.sid & 1) + ((s.sid >> 1) & 1) +
                                        ((s.sid >> 2) & 1) + ((s.sid >> 3) & 1))
                                  WHEN 0 THEN 6 WHEN 1 THEN 2
                                  WHEN 2 THEN 2 WHEN 3 THEN 6 END AS HUGEINT)
                             * (vi.vv - vs.vv)) AS HUGEINT) AS phin
             FROM s CROSS JOIN ch
             JOIN v vs ON vs.sid = s.sid
             JOIN v vi ON vi.sid = (s.sid | ch.bit)
             WHERE (s.sid & ch.bit) = 0
             GROUP BY 1)
     SELECT channel,
            ROUND(CAST(phin AS DOUBLE) / 24.0, 6) AS conversions,
            CASE WHEN ntouched > 0 THEN
              ROUND(CAST(phin AS DOUBLE) / 24.0 / CAST(ntouched AS DOUBLE), 6)
            END AS share
     FROM phi CROSS JOIN tot
     UNION ALL
     SELECT '__DIRECT__', CAST(nconv - ntouched AS DOUBLE), CAST(NULL AS DOUBLE)
     FROM tot
     ORDER BY channel"""

  /** A/B power replay — shared by the batch gate and the S47 twin. */
  private lazy val abPowerOracle: String =
    """WITH g AS (
           SELECT o_orderstatus AS st,
                  CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(CAST(FLOOR(o_totalprice / 100000.0 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s,
                  CAST(SUM(CAST(FLOOR((o_totalprice / 100000.0) * (o_totalprice / 100000.0) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss
           FROM orders WHERE o_orderstatus IN ('O', 'F') GROUP BY 1),
         w AS (SELECT
           MAX(CASE WHEN st = 'O' THEN n END) AS na,
           MAX(CASE WHEN st = 'O' THEN s END) AS sa,
           MAX(CASE WHEN st = 'O' THEN ss END) AS ssa,
           MAX(CASE WHEN st = 'F' THEN n END) AS nb,
           MAX(CASE WHEN st = 'F' THEN s END) AS sb,
           MAX(CASE WHEN st = 'F' THEN ss END) AS ssb
           FROM g),
         v AS (SELECT na, nb,
                      (ssa - sa * sa / na) / (na - 1) AS va,
                      (ssb - sb * sb / nb) / (nb - 1) AS vb,
                      sa / na - sb / nb AS diff
               FROM w)
         SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                ROUND(diff, 6) AS observed_diff,
                ROUND(SQRT(va / na + vb / nb), 6) AS se_diff,
                ROUND(2.8015852181129683 * SQRT(va / na + vb / nb), 6) AS mde,
                CAST(CEIL(2.8015852181129683 * 2.8015852181129683 * (va + vb) / 0.0001) AS BIGINT)
                  AS n_required_per_arm
         FROM v"""

  /** Effect-size replay — shared by the batch gate and the S48 twin. */
  private lazy val effectSizeOracle: String =
    """WITH g AS (
           SELECT o_orderstatus AS st,
                  CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(CAST(FLOOR(o_totalprice / 100000.0 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s,
                  CAST(SUM(CAST(FLOOR((o_totalprice / 100000.0) * (o_totalprice / 100000.0) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss
           FROM orders WHERE o_orderstatus IN ('O', 'F') GROUP BY 1),
         w AS (SELECT
           MAX(CASE WHEN st = 'O' THEN n END) AS na,
           MAX(CASE WHEN st = 'O' THEN s END) AS sa,
           MAX(CASE WHEN st = 'O' THEN ss END) AS ssa,
           MAX(CASE WHEN st = 'F' THEN n END) AS nb,
           MAX(CASE WHEN st = 'F' THEN s END) AS sb,
           MAX(CASE WHEN st = 'F' THEN ss END) AS ssb
           FROM g),
         v AS (SELECT na, nb,
                      (ssa - sa * sa / na) / (na - 1) AS va,
                      (ssb - sb * sb / nb) / (nb - 1) AS vb,
                      sa / na - sb / nb AS diff
               FROM w),
         e AS (SELECT na, nb, va, vb, diff,
                      SQRT(((na - 1) * va + (nb - 1) * vb) / (na + nb - 2)) AS sp,
                      1.0 - 3.0 / (4.0 * (na + nb) - 9.0) AS corr
               FROM v)
         SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                ROUND(diff, 6) AS mean_diff,
                CASE WHEN sp > 0 THEN ROUND(sp, 6) END AS pooled_sd,
                CASE WHEN sp > 0 THEN ROUND(diff / sp, 6) END AS cohens_d,
                CASE WHEN sp > 0 THEN ROUND(diff / sp * corr, 6) END AS hedges_g,
                CASE WHEN vb > 0 THEN ROUND(diff / SQRT(vb), 6) END AS glass_delta
         FROM e"""

  /** Two-sample mSPRT replay — shared verbatim by the batch gate and
    * the S46 streaming twin (integer moment state ⇒ stream == batch). */
  private lazy val msprtOracle: String =
    """WITH g AS (
           SELECT o_orderstatus AS st,
                  CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(CAST(FLOOR(o_totalprice / 100000.0 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s,
                  CAST(SUM(CAST(FLOOR((o_totalprice / 100000.0) * (o_totalprice / 100000.0) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss
           FROM orders WHERE o_orderstatus IN ('O', 'F') GROUP BY 1),
         w AS (SELECT
           MAX(CASE WHEN st = 'O' THEN n END) AS na,
           MAX(CASE WHEN st = 'O' THEN s END) AS sa,
           MAX(CASE WHEN st = 'O' THEN ss END) AS ssa,
           MAX(CASE WHEN st = 'F' THEN n END) AS nb,
           MAX(CASE WHEN st = 'F' THEN s END) AS sb,
           MAX(CASE WHEN st = 'F' THEN ss END) AS ssb
           FROM g),
         v AS (SELECT na, nb,
                      ((ssa - sa * sa / na) / (na - 1)) / na
                        + ((ssb - sb * sb / nb) / (nb - 1)) / nb AS se2,
                      sa / na - sb / nb AS d
               FROM w),
         l AS (SELECT na, nb, d,
                      0.5 * LN(se2 / (se2 + 0.010000000000000002))
                        + 0.010000000000000002 * (d - 0.0) * (d - 0.0)
                          / (2.0 * se2 * (se2 + 0.010000000000000002)) AS ll
               FROM v)
         SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                ROUND(d, 6) AS diff,
                ROUND(ll, 6) AS log_lambda,
                ROUND(LEAST(1.0, EXP(-ll)), 6) AS p_always_valid,
                LEAST(1.0, EXP(-ll)) <= 0.05 AS reject
         FROM l"""

  /** Full rank-2 ALS replay: 2 alternating ridge sweeps (4 half-steps)
    * unrolled as MATERIALIZED CTEs — mirrors
    * [[graft.operators.Models.alsRank2]] bit-for-bit: factors on the 1e-6
    * long grid, per-row normal-equation terms quantized to 1e-9 HUGEINTs,
    * fixed Cramer chains, deterministic rank-based item init. */
  private val alsOracle: String = {
    def half(out: String, prev: String, solve: String, fixed: String): String =
      s"""$out AS MATERIALIZED (
         SELECT k, CAST(FLOOR((a22 * b1 - a12 * b2) / det * 1000000.0 + 0.5) AS BIGINT) AS f1,
                CAST(FLOOR((a11 * b2 - a12 * b1) / det * 1000000.0 + 0.5) AS BIGINT) AS f2
         FROM (SELECT k, a11, a12, a22, b1, b2, a11 * a22 - a12 * a12 AS det
               FROM (SELECT k,
                       CAST(s11 AS DOUBLE) / 1e9 + 0.1 AS a11,
                       CAST(s12 AS DOUBLE) / 1e9 AS a12,
                       CAST(s22 AS DOUBLE) / 1e9 + 0.1 AS a22,
                       CAST(b1q AS DOUBLE) / 1e9 AS b1,
                       CAST(b2q AS DOUBLE) / 1e9 AS b2
                     FROM (SELECT $solve AS k,
                             SUM(CAST(FLOOR(fd1 * fd1 * 1e9 + 0.5) AS HUGEINT)) AS s11,
                             SUM(CAST(FLOOR(fd1 * fd2 * 1e9 + 0.5) AS HUGEINT)) AS s12,
                             SUM(CAST(FLOOR(fd2 * fd2 * 1e9 + 0.5) AS HUGEINT)) AS s22,
                             SUM(CAST(FLOOR(rd * fd1 * 1e9 + 0.5) AS HUGEINT)) AS b1q,
                             SUM(CAST(FLOOR(rd * fd2 * 1e9 + 0.5) AS HUGEINT)) AS b2q
                           FROM (SELECT r.u, r.i,
                                   CAST(f.f1 AS DOUBLE) / 1000000.0 AS fd1,
                                   CAST(f.f2 AS DOUBLE) / 1000000.0 AS fd2,
                                   CAST(r.rq AS DOUBLE) / 1000000.0 AS rd
                                 FROM ratings r JOIN $prev f ON r.$fixed = f.k)
                           GROUP BY 1))))"""
    s"""WITH ratings AS MATERIALIZED (
           SELECT CAST(user_id AS VARCHAR) AS u, CAST(event_type AS VARCHAR) AS i,
                  CAST(FLOOR((CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS DOUBLE) / 100.0
                              / CAST(COUNT(*) AS DOUBLE)) * 1000000.0 + 0.5) AS BIGINT) AS rq
           FROM events GROUP BY 1, 2),
     it0 AS MATERIALIZED (
           SELECT i AS k, CAST(1000000 AS BIGINT) AS f1,
                  CAST((rk % 7 - 3) * 100000 AS BIGINT) AS f2
           FROM (SELECT i, CAST(ROW_NUMBER() OVER (ORDER BY i) AS BIGINT) AS rk
                 FROM (SELECT DISTINCT i FROM ratings))),
     ${half("uf1", "it0", "u", "i")},
     ${half("it1", "uf1", "i", "u")},
     ${half("uf2", "it1", "u", "i")},
     ${half("it2", "uf2", "i", "u")},
     rmse AS (SELECT ROUND(SQRT(CAST(SUM(CAST(FLOOR(e * e * 1e9 + 0.5) AS HUGEINT)) AS DOUBLE) / 1e9
                               / CAST(COUNT(*) AS DOUBLE)), 6) AS rmse
              FROM (SELECT CAST(r.rq AS DOUBLE) / 1000000.0
                           - (CAST(uf.f1 AS DOUBLE) / 1000000.0 * (CAST(itf.f1 AS DOUBLE) / 1000000.0)
                              + CAST(uf.f2 AS DOUBLE) / 1000000.0 * (CAST(itf.f2 AS DOUBLE) / 1000000.0)) AS e
                    FROM ratings r JOIN uf2 uf ON r.u = uf.k JOIN it2 itf ON r.i = itf.k))
     SELECT 'item' AS entity, k AS id,
            ROUND(CAST(f1 AS DOUBLE) / 1000000.0, 6) AS f1,
            ROUND(CAST(f2 AS DOUBLE) / 1000000.0, 6) AS f2,
            rmse
     FROM it2 CROSS JOIN rmse ORDER BY id"""
  }

  private val markovAttributionOracle: String = {
    val iters = (1 to 20).map { i =>
      s""",
       p$i AS (
         SELECT er.r, er.s AS state,
                CAST(SUM(CAST(FLOOR(CAST(er.c AS DOUBLE) * CAST(p.pq AS DOUBLE)
                                    / CAST(er.rt AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS pq
         FROM er JOIN p${i - 1} p ON er.r = p.r AND er.t2 = p.state
         GROUP BY 1, 2
         UNION ALL
         SELECT r, '__CONV__', CAST(1000000000000 AS BIGINT) FROM rl)"""
    }.mkString
    s"""WITH s0 AS MATERIALIZED (SELECT user_id AS u, event_type AS c,
            ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
          FROM events),
     cp AS MATERIALIZED (SELECT u, MIN(rn) AS cp FROM s0 WHERE c = 'purchase' GROUP BY 1),
     tch AS MATERIALIZED (SELECT s0.u, s0.c, s0.rn, cp.cp
             FROM s0 LEFT JOIN cp ON s0.u = cp.u
             WHERE s0.c <> 'purchase' AND (cp.cp IS NULL OR s0.rn < cp.cp)),
     wn AS (SELECT u, c, cp,
                   LEAD(c) OVER (PARTITION BY u ORDER BY rn) AS nxt,
                   ROW_NUMBER() OVER (PARTITION BY u ORDER BY rn) AS pos
            FROM tch),
     edges0 AS (
       SELECT '__START__' AS s, c AS t FROM wn WHERE pos = 1
       UNION ALL SELECT c, nxt FROM wn WHERE nxt IS NOT NULL
       UNION ALL SELECT c, CASE WHEN cp IS NOT NULL THEN '__CONV__' ELSE '__NULL__' END
                 FROM wn WHERE nxt IS NULL
       UNION ALL SELECT '__START__', '__CONV__'
                 FROM cp WHERE u NOT IN (SELECT DISTINCT u FROM tch)),
     e AS MATERIALIZED (SELECT s, t, CAST(COUNT(*) AS BIGINT) AS c FROM edges0 GROUP BY 1, 2),
     rt AS (SELECT s, CAST(SUM(c) AS BIGINT) AS rt FROM e GROUP BY 1),
     ch AS MATERIALIZED (SELECT DISTINCT c AS ch FROM tch),
     rl AS MATERIALIZED (SELECT '__NONE__' AS r UNION ALL SELECT ch FROM ch),
     er AS MATERIALIZED (
       SELECT rl.r, e.s, CASE WHEN e.t = rl.r THEN '__NULL__' ELSE e.t END AS t2,
              e.c, rt.rt
       FROM e JOIN rt ON e.s = rt.s CROSS JOIN rl
       WHERE e.s <> rl.r),
     p0 AS (SELECT r, '__CONV__' AS state, CAST(1000000000000 AS BIGINT) AS pq FROM rl)$iters,
     st AS (SELECT r, pq FROM p20 WHERE state = '__START__'),
     base AS (SELECT pq AS b FROM st WHERE r = '__NONE__'),
     pc AS (SELECT ch.ch AS channel,
                   CAST(b AS DOUBLE) / 1e12 AS conv_prob_base,
                   CAST(COALESCE(st.pq, 0) AS DOUBLE) / 1e12 AS conv_prob_without,
                   CASE WHEN b > 0 THEN CAST(b - COALESCE(st.pq, 0) AS DOUBLE) / CAST(b AS DOUBLE)
                   END AS removal_effect
            FROM ch LEFT JOIN st ON ch.ch = st.r CROSS JOIN base),
     q AS (SELECT *, CAST(FLOOR(removal_effect * 1e9 + 0.5) AS BIGINT) AS req FROM pc),
     tot AS (SELECT CAST(SUM(CASE WHEN req > 0 THEN req ELSE 0 END) AS BIGINT) AS ps FROM q)
     SELECT channel, ROUND(conv_prob_base, 6) AS conv_prob_base,
            ROUND(conv_prob_without, 6) AS conv_prob_without,
            ROUND(removal_effect, 6) AS removal_effect,
            CASE WHEN ps > 0 AND req > 0
                 THEN ROUND(CAST(req AS DOUBLE) / CAST(ps AS DOUBLE), 6) END AS share
     FROM q CROSS JOIN tot ORDER BY channel"""
  }

  /** md5 hash split; exact-quantized train means; q̂ = the exact
    * order-statistic residual at 0-based rank ceil((n+1)(1−α))−1 —
    * mirrors [[graft.operators.Sketches.splitConformal]]; shared verbatim
    * by the batch query and its streaming coverage-monitor twin. */
  private val conformalOracle: String =
    """WITH b AS (SELECT o_orderpriority AS g, o_totalprice / 100000.0 AS v,
                           ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 AS bk
                    FROM orders),
         m AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS tn,
                      CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS tq
               FROM b WHERE bk < 6 GROUP BY 1),
         my AS (SELECT g, CAST(tq AS DOUBLE) / 1000000.0 / CAST(tn AS DOUBLE) AS yhat FROM m),
         ntr AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_train FROM b WHERE bk < 6),
         cal AS (SELECT ABS(v - yhat) AS r FROM b JOIN my USING (g) WHERE bk >= 6 AND bk < 8),
         nc AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_calib FROM cal),
         rk AS (SELECT r, ROW_NUMBER() OVER (ORDER BY r) - 1 AS rn FROM cal),
         q AS (SELECT r AS qhat FROM rk CROSS JOIN nc
               WHERE rn = CAST(CEIL((CAST(n_calib AS DOUBLE) + 1.0) * 0.9) AS BIGINT) - 1),
         ts AS (SELECT ABS(v - yhat) AS r FROM b JOIN my USING (g) WHERE bk >= 8),
         cv AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_test,
                       MAX(qhat) AS qhat,
                       CAST(SUM(CASE WHEN qhat IS NULL OR r <= qhat THEN 1 ELSE 0 END) AS DOUBLE)
                         / CAST(COUNT(*) AS DOUBLE) AS coverage
                FROM ts LEFT JOIN q ON TRUE)
         SELECT n_train, (SELECT n_calib FROM nc) AS n_calib, n_test, 0.1 AS alpha,
                ROUND(qhat, 6) AS qhat, ROUND(coverage, 6) AS coverage
         FROM cv CROSS JOIN ntr"""

  /** 8 unrolled quantized GD steps as chained 1-row weight CTEs over the
    * MATERIALIZED scaled base — mirrors
    * [[graft.operators.Models.logisticRegression]]'s exact chains:
    * z left-assoc, gradient terms floor((p−y)·x_j·1e6+0.5) as BIGINT
    * sums, update w ← w − floor(lr·g·1000/n + 0.5). */
  /** z(w·x) over the shared (x1, x2) oracle base — the fixed left-assoc
    * chain every GD oracle shares. */
  private def gdZ(w: String) =
    s"(CAST($w.w0 AS DOUBLE)/1e9*1.0 + CAST($w.w1 AS DOUBLE)/1e9*x1 + CAST($w.w2 AS DOUBLE)/1e9*x2)"

  /** The unrolled quantized-GD steps shared by every logistic-fit oracle:
    * requires CTEs base(y, x1, x2), nb(nn) and w0(w0, w1, w2) = 0. */
  private def gdSteps(iters: Int): String = (1 to iters).map { i =>
    s""",
       p$i AS (SELECT y, x1, x2, 1.0/(1.0 + EXP(-${gdZ(s"w${i - 1}")})) AS p
               FROM base CROSS JOIN w${i - 1}),
       g$i AS (SELECT
                 CAST(SUM(CAST(FLOOR((p - y) * 1.0 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g0,
                 CAST(SUM(CAST(FLOOR((p - y) * x1 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g1,
                 CAST(SUM(CAST(FLOOR((p - y) * x2 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g2
               FROM p$i),
       w$i AS (SELECT
                 w0 - CAST(FLOOR(0.5 * CAST(g0 AS DOUBLE) * 1000.0 / CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS w0,
                 w1 - CAST(FLOOR(0.5 * CAST(g1 AS DOUBLE) * 1000.0 / CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS w1,
                 w2 - CAST(FLOOR(0.5 * CAST(g2 AS DOUBLE) * 1000.0 / CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS w2
               FROM w${i - 1} CROSS JOIN g$i CROSS JOIN nb)"""
  }.mkString

  private val logisticOracle: String = {
    def z(w: String) = gdZ(w)
    val iters = gdSteps(8)
    s"""WITH base AS MATERIALIZED (
           SELECT CASE WHEN o_orderstatus = 'F' THEN 1.0 ELSE 0.0 END AS y,
                  o_totalprice / 500000.0 AS x1,
                  CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE)
                    / 2500.0 AS x2
           FROM orders),
     nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
     w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2)$iters,
     pf AS (SELECT y, 1.0/(1.0 + EXP(-${z("w8")})) AS p FROM base CROSS JOIN w8),
     fin AS (SELECT
               CAST(SUM(CAST(FLOOR((CASE WHEN y = 1.0 THEN LN(p) ELSE LN(1.0 - p) END)
                                   * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS llq,
               CAST(SUM(CASE WHEN (CASE WHEN p >= 0.5 THEN 1.0 ELSE 0.0 END) = y
                             THEN 1 ELSE 0 END) AS BIGINT) AS ok
             FROM pf)
     SELECT nn AS n,
            CAST(w0 AS DOUBLE)/1e9 AS w0,
            CAST(w1 AS DOUBLE)/1e9 AS w1,
            CAST(w2 AS DOUBLE)/1e9 AS w2,
            ROUND(-CAST(llq AS DOUBLE)/1e6/CAST(nn AS DOUBLE), 6) AS log_loss,
            ROUND(CAST(ok AS DOUBLE)/CAST(nn AS DOUBLE), 6) AS accuracy
     FROM w8 CROSS JOIN fin CROSS JOIN nb"""
  }

  /** Exact-decimal normal-equation moments + Cramer's rule as the same
    * fixed IEEE chains — mirrors
    * [[graft.operators.Models.linearRegression]] term by term. */
  private val linRegOracle: String =
    """WITH b AS (SELECT
            CAST(FLOOR(o_totalprice / 100000.0 * 1e6 + 0.5) AS HUGEINT) AS y,
            CAST(FLOOR(CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE)
                       / 2500.0 * 1e6 + 0.5) AS HUGEINT) AS a,
            CAST(FLOOR(c_acctbal / 10000.0 * 1e6 + 0.5) AS HUGEINT) AS bb
          FROM orders JOIN customer ON o_custkey = c_custkey),
     m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  SUM(a) AS sa0, SUM(bb) AS sb0,
                  SUM(a * a) AS saa0, SUM(bb * bb) AS sbb0, SUM(a * bb) AS sab0,
                  SUM(y) AS sy0, SUM(a * y) AS say0, SUM(bb * y) AS sby0,
                  SUM(y * y) AS syy0
           FROM b),
     t AS (SELECT n, CAST(n AS DOUBLE) AS nn,
                  CAST(sa0 AS DOUBLE) / 1e6 AS sa, CAST(sb0 AS DOUBLE) / 1e6 AS sb,
                  CAST(saa0 AS DOUBLE) / 1e12 AS saa, CAST(sbb0 AS DOUBLE) / 1e12 AS sbb,
                  CAST(sab0 AS DOUBLE) / 1e12 AS sab,
                  CAST(sy0 AS DOUBLE) / 1e6 AS sy, CAST(say0 AS DOUBLE) / 1e12 AS say,
                  CAST(sby0 AS DOUBLE) / 1e12 AS sby, CAST(syy0 AS DOUBLE) / 1e12 AS syy
           FROM m),
     d AS (SELECT *,
             nn * (saa * sbb - sab * sab) - sa * (sa * sbb - sab * sb)
               + sb * (sa * sab - saa * sb) AS det
           FROM t),
     sv AS (SELECT *,
              CASE WHEN det <> 0.0 THEN
                (sy * (saa * sbb - sab * sab) - sa * (say * sbb - sab * sby)
                  + sb * (say * sab - saa * sby)) / det END AS beta0,
              CASE WHEN det <> 0.0 THEN
                (nn * (say * sbb - sab * sby) - sy * (sa * sbb - sab * sb)
                  + sb * (sa * sby - say * sb)) / det END AS beta1,
              CASE WHEN det <> 0.0 THEN
                (nn * (saa * sby - say * sab) - sa * (sa * sby - say * sb)
                  + sy * (sa * sab - saa * sb)) / det END AS beta2
            FROM d)
     SELECT n, ROUND(beta0, 6) AS beta0, ROUND(beta1, 6) AS beta1,
            ROUND(beta2, 6) AS beta2,
            CASE WHEN det <> 0.0 AND (syy - sy * sy / nn) <> 0.0 THEN
              ROUND(1.0 - (syy - (beta0 * sy + beta1 * say + beta2 * sby))
                          / (syy - sy * sy / nn), 6) END AS r2
     FROM sv"""

  /** linRegOracle's moment pass with λ=1 on the slope diagonal and the
    * honest quadratic-form SSE — mirrors
    * [[graft.operators.Models.ridgeRegression]] term by term. */
  private val ridgeOracle: String =
    """WITH b AS (SELECT
            CAST(FLOOR(o_totalprice / 100000.0 * 1e6 + 0.5) AS HUGEINT) AS y,
            CAST(FLOOR(CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE)
                       / 2500.0 * 1e6 + 0.5) AS HUGEINT) AS a,
            CAST(FLOOR(c_acctbal / 10000.0 * 1e6 + 0.5) AS HUGEINT) AS bb
          FROM orders JOIN customer ON o_custkey = c_custkey),
     m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  SUM(a) AS sa0, SUM(bb) AS sb0,
                  SUM(a * a) AS saa0, SUM(bb * bb) AS sbb0, SUM(a * bb) AS sab0,
                  SUM(y) AS sy0, SUM(a * y) AS say0, SUM(bb * y) AS sby0,
                  SUM(y * y) AS syy0
           FROM b),
     t AS (SELECT n, CAST(n AS DOUBLE) AS nn,
                  CAST(sa0 AS DOUBLE) / 1e6 AS sa, CAST(sb0 AS DOUBLE) / 1e6 AS sb,
                  CAST(saa0 AS DOUBLE) / 1e12 AS saa, CAST(sbb0 AS DOUBLE) / 1e12 AS sbb,
                  CAST(sab0 AS DOUBLE) / 1e12 AS sab,
                  CAST(sy0 AS DOUBLE) / 1e6 AS sy, CAST(say0 AS DOUBLE) / 1e12 AS say,
                  CAST(sby0 AS DOUBLE) / 1e12 AS sby, CAST(syy0 AS DOUBLE) / 1e12 AS syy
           FROM m),
     tp AS (SELECT *, saa + 1.0 AS paa, sbb + 1.0 AS pbb FROM t),
     d AS (SELECT *,
             nn * (paa * pbb - sab * sab) - sa * (sa * pbb - sab * sb)
               + sb * (sa * sab - paa * sb) AS det
           FROM tp),
     sv AS (SELECT *,
              CASE WHEN det <> 0.0 THEN
                (sy * (paa * pbb - sab * sab) - sa * (say * pbb - sab * sby)
                  + sb * (say * sab - paa * sby)) / det END AS beta0,
              CASE WHEN det <> 0.0 THEN
                (nn * (say * pbb - sab * sby) - sy * (sa * pbb - sab * sb)
                  + sb * (sa * sby - say * sb)) / det END AS beta1,
              CASE WHEN det <> 0.0 THEN
                (nn * (paa * sby - say * sab) - sa * (sa * sby - say * sb)
                  + sy * (sa * sab - paa * sb)) / det END AS beta2
            FROM d),
     fz AS (SELECT *,
              syy - 2.0 * (beta0 * sy + beta1 * say + beta2 * sby)
                + (beta0 * beta0 * nn + beta1 * beta1 * saa + beta2 * beta2 * sbb
                   + 2.0 * beta0 * beta1 * sa + 2.0 * beta0 * beta2 * sb
                   + 2.0 * beta1 * beta2 * sab) AS sse
            FROM sv)
     SELECT n, ROUND(beta0, 6) AS beta0, ROUND(beta1, 6) AS beta1,
            ROUND(beta2, 6) AS beta2,
            CASE WHEN det <> 0.0 AND (syy - sy * sy / nn) <> 0.0 THEN
              ROUND(1.0 - sse / (syy - sy * sy / nn), 6) END AS r2
     FROM fz"""

  /** Document-presence 2×2 χ² per (token, class) as ONE exact-integer
    * division; ROUNDED-χ² ordering with token tiebreak — mirrors
    * [[graft.operators.TextAnalysis.chi2Keywords]]. */
  private val chi2KeywordsOracle: String =
    """WITH dt AS MATERIALIZED (
           SELECT DISTINCT d.lang, t.doc_id, t.tk
           FROM (SELECT doc_id, unnest(regexp_extract_all(lower(text), '[a-z0-9]{1,}')) AS tk
                 FROM documents) t JOIN documents d USING (doc_id)),
     a AS (SELECT lang, tk, CAST(COUNT(*) AS BIGINT) AS a FROM dt GROUP BY 1, 2),
     x AS (SELECT lang, tk, a,
                  CAST(SUM(a) OVER (PARTITION BY tk) AS BIGINT) - a AS b
           FROM a),
     cd AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS cdocs FROM documents GROUP BY 1),
     nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM documents),
     z AS (SELECT x.lang, tk, a, b, cdocs - a AS c, n - cdocs - b AS d
           FROM x JOIN cd USING (lang) CROSS JOIN nn),
     chi AS (SELECT lang, tk AS token, a AS n_docs,
               ROUND(CAST(a + b + c + d AS DOUBLE)
                          * CAST(CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS DOUBLE)
                          * CAST(CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c AS DOUBLE)
                     / CAST(CAST(a + b AS HUGEINT) * (c + d) * (a + c) * (b + d) AS DOUBLE),
                     6) AS chi2,
               CAST(a AS HUGEINT) * d - CAST(b AS HUGEINT) * c > 0 AS positive
             FROM z),
     rk AS (SELECT *, CAST(ROW_NUMBER() OVER (PARTITION BY lang ORDER BY chi2 DESC, token ASC) AS INT) AS "rank"
            FROM chi)
     SELECT lang, token, n_docs, chi2, positive, "rank"
     FROM rk WHERE "rank" <= 5 ORDER BY lang, "rank""""

  /** 5 unrolled quantized Newton steps + a final score/information pass
    * at β̂ — mirrors [[graft.operators.Models.coxPh]]: per-time exp sums,
    * suffix risk sets over descending time, 1e-6-quantized U/I terms,
    * update bq ← bq + floor(U/I·1e9 + 0.5). */
  private val coxOracle: String = {
    def step(i: Int): String = {
      val w = s"w${i - 1}"
      s""",
       pt$i AS (SELECT t,
                 CAST(SUM(CAST(FLOOR(EXP(CAST($w.bq AS DOUBLE)/1e9 * x) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w0,
                 CAST(SUM(CAST(FLOOR(EXP(CAST($w.bq AS DOUBLE)/1e9 * x) * x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w1,
                 CAST(SUM(CAST(FLOOR(EXP(CAST($w.bq AS DOUBLE)/1e9 * x) * x * x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS w2
               FROM base CROSS JOIN $w GROUP BY t),
       cs$i AS (SELECT t,
                 CAST(SUM(w0) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s0,
                 CAST(SUM(w1) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s1,
                 CAST(SUM(w2) OVER (ORDER BY t DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS s2
               FROM pt$i),
       ui$i AS (SELECT
                 CAST(SUM(CAST(FLOOR((CAST(e.sxq AS DOUBLE)/1e6
                        - CAST(e.d AS DOUBLE) * CAST(c.s1 AS DOUBLE)/CAST(c.s0 AS DOUBLE))
                        * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS uq,
                 CAST(SUM(CAST(FLOOR(CAST(e.d AS DOUBLE)
                        * (CAST(c.s2 AS DOUBLE)/CAST(c.s0 AS DOUBLE)
                           - (CAST(c.s1 AS DOUBLE)/CAST(c.s0 AS DOUBLE))
                             * (CAST(c.s1 AS DOUBLE)/CAST(c.s0 AS DOUBLE)))
                        * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS iq
               FROM cs$i c JOIN et e USING (t))"""
    }
    val updates = (1 to 5).map { i =>
      step(i) + s""",
       w$i AS (SELECT CASE WHEN iq <> 0
                      THEN bq + CAST(FLOOR(CAST(uq AS DOUBLE)/CAST(iq AS DOUBLE) * 1e9 + 0.5) AS BIGINT)
                      ELSE bq END AS bq
               FROM w${i - 1} CROSS JOIN ui$i)"""
    }.mkString
    s"""WITH base AS MATERIALIZED (SELECT
            CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) + 1 AS t,
            CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS ev,
            o_totalprice / 500000.0 AS x,
            CAST(FLOOR(o_totalprice / 500000.0 * 1e6 + 0.5) AS BIGINT) AS xq
          FROM orders),
     et AS MATERIALIZED (SELECT t, CAST(SUM(ev) AS BIGINT) AS d,
             CAST(SUM(CASE WHEN ev = 1 THEN xq ELSE 0 END) AS BIGINT) AS sxq
           FROM base GROUP BY 1),
     nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                   (SELECT CAST(SUM(d) AS BIGINT) FROM et) AS ne
            FROM base),
     w0 AS (SELECT CAST(0 AS BIGINT) AS bq)$updates${step(6)}
     SELECT nb.n, nb.ne AS n_events,
            CAST(w5.bq AS DOUBLE)/1e9 AS beta,
            CASE WHEN ui6.iq > 0 THEN ROUND(SQRT(1e6/CAST(ui6.iq AS DOUBLE)), 6) END AS se,
            CASE WHEN ui6.iq > 0 THEN
              ROUND((CAST(w5.bq AS DOUBLE)/1e9) / SQRT(1e6/CAST(ui6.iq AS DOUBLE)), 6) END AS z
     FROM w5 CROSS JOIN ui6 CROSS JOIN nb"""
  }

  /** Per-class add-one token log-probs over the global vocab + OOV
    * pseudo-type + doc-count priors, argmax with ties to the smallest
    * class — mirrors [[graft.operators.Models.naiveBayesClassify]]. */
  private val naiveBayesOracle: String =
    """WITH tok AS MATERIALIZED (SELECT doc_id,
            unnest(regexp_extract_all(lower(text), '[a-z0-9]{1,}')) AS tk
          FROM documents),
     tt AS MATERIALIZED (SELECT d.lang AS cls, tk FROM tok JOIN documents d USING (doc_id)),
     ct AS (SELECT cls, tk, CAST(COUNT(*) AS BIGINT) AS c FROM tt GROUP BY 1, 2),
     nc AS (SELECT cls, CAST(SUM(c) AS BIGINT) AS nc FROM ct GROUP BY 1),
     vb AS MATERIALIZED (SELECT DISTINCT tk FROM ct),
     vt AS (SELECT CAST(COUNT(*) AS BIGINT) AS v FROM vb),
     model AS MATERIALIZED (
       SELECT vb.tk, nc.cls,
              CAST(FLOOR(LN((CAST(COALESCE(ct.c, 0) AS DOUBLE) + 1.0)
                            / (CAST(nc.nc AS DOUBLE) + 1.0 * (CAST(vt.v AS DOUBLE) + 1.0)))
                   * 1e6 + 0.5) AS BIGINT) AS lpq
       FROM vb CROSS JOIN nc CROSS JOIN vt
       LEFT JOIN ct ON ct.tk = vb.tk AND ct.cls = nc.cls),
     oov AS (SELECT cls, CAST(FLOOR(LN(1.0 / (CAST(nc AS DOUBLE) + 1.0 * (CAST(v AS DOUBLE) + 1.0)))
                   * 1e6 + 0.5) AS BIGINT) AS oq
             FROM nc CROSS JOIN vt),
     pri AS (SELECT lang AS cls,
                    CAST(FLOOR(LN(CAST(COUNT(*) AS DOUBLE)
                                  / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE))
                         * 1e6 + 0.5) AS BIGINT) AS pq
             FROM documents GROUP BY 1),
     kn AS (SELECT t.doc_id, m.cls, m.lpq AS q FROM tok t JOIN model m ON t.tk = m.tk),
     un AS (SELECT t.doc_id, o.cls, o.oq AS q
            FROM tok t CROSS JOIN oov o
            WHERE t.tk NOT IN (SELECT tk FROM vb)),
     sc AS (SELECT doc_id, cls, CAST(SUM(q) AS BIGINT) AS sq
            FROM (SELECT * FROM kn UNION ALL SELECT * FROM un) GROUP BY 1, 2),
     fin AS (SELECT doc_id, cls, sq + pq AS score FROM sc JOIN pri USING (cls)),
     best AS (SELECT doc_id, cls,
                     ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY score DESC, cls ASC) AS rn
              FROM fin)
     SELECT b.doc_id, d.lang, b.cls AS predicted, b.cls = d.lang AS correct
     FROM best b JOIN documents d USING (doc_id) WHERE rn = 1 ORDER BY b.doc_id"""

  /** 20 unrolled pinball-subgradient steps over the q_linreg base +
    * the exact quantized pinball readout — mirrors
    * [[graft.operators.Models.quantileRegression]] bit-for-bit. Each w$i is
    * referenced twice downstream (q$(i+1) and w$(i+1)), so the weight CTEs
    * are MATERIALIZED — un-hinted DuckDB inlines them and the expression
    * tree doubles per step (2^20 at 20 iterations). */
  private val quantRegOracle: String = {
    val steps = (1 to 20).map { i =>
      val w = s"w${i - 1}"
      s""",
       q$i AS (SELECT (CASE WHEN y <= ${gdZ(w)} THEN 1.0 ELSE 0.0 END) - 0.5 AS gt,
                      x1, x2
               FROM base CROSS JOIN $w),
       g$i AS (SELECT
                 CAST(SUM(CAST(FLOOR(gt * 1.0 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g0,
                 CAST(SUM(CAST(FLOOR(gt * x1 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g1,
                 CAST(SUM(CAST(FLOOR(gt * x2 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g2
               FROM q$i),
       w$i AS MATERIALIZED (SELECT
                 w0 - CAST(FLOOR(0.5 / SQRT(CAST($i AS DOUBLE)) * CAST(g0 AS DOUBLE) * 1000.0 / CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS w0,
                 w1 - CAST(FLOOR(0.5 / SQRT(CAST($i AS DOUBLE)) * CAST(g1 AS DOUBLE) * 1000.0 / CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS w1,
                 w2 - CAST(FLOOR(0.5 / SQRT(CAST($i AS DOUBLE)) * CAST(g2 AS DOUBLE) * 1000.0 / CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS w2
               FROM w${i - 1} CROSS JOIN g$i CROSS JOIN nb)"""
    }.mkString
    s"""WITH base AS MATERIALIZED (
           SELECT o_totalprice / 100000.0 AS y,
                  CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE)
                    / 2500.0 AS x1,
                  c_acctbal / 10000.0 AS x2
           FROM orders JOIN customer ON o_custkey = c_custkey),
     nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
     w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2)$steps,
     pf AS (SELECT GREATEST(0.5 * (y - ${gdZ("w20")}), -0.5 * (y - ${gdZ("w20")})) AS pb
            FROM base CROSS JOIN w20),
     fin AS (SELECT CAST(SUM(CAST(FLOOR(pb * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS pbq FROM pf)
     SELECT nn AS n, CAST(0.5 AS DOUBLE) AS tau,
            CAST(w0 AS DOUBLE)/1e9 AS w0,
            CAST(w1 AS DOUBLE)/1e9 AS w1,
            CAST(w2 AS DOUBLE)/1e9 AS w2,
            ROUND(CAST(pbq AS DOUBLE)/1e6/CAST(nn AS DOUBLE), 6) AS pinball
     FROM w20 CROSS JOIN fin CROSS JOIN nb"""
  }

  /** 20 unrolled hinge-subgradient steps (data term + in-long-domain L2
    * pull on the slopes) over the q_quant_reg base + the exact quantized
    * hinge/accuracy readout — mirrors
    * [[graft.operators.Models.svmHinge]] bit-for-bit. Weight CTEs
    * MATERIALIZED for the same reason as q_quant_reg's. */
  private val svmOracle: String = {
    val steps = (1 to 20).map { i =>
      val w = s"w${i - 1}"
      def upd(g: String, wc: String, reg: Boolean) = {
        val data =
          s"CAST(FLOOR(0.5 / SQRT(CAST($i AS DOUBLE)) * CAST($g AS DOUBLE) * 1000.0 / CAST(nn AS DOUBLE) + 0.5) AS BIGINT)"
        val pull = if (reg)
          s" - CAST(FLOOR(0.5 / SQRT(CAST($i AS DOUBLE)) * 0.01 * CAST($wc AS DOUBLE) + 0.5) AS BIGINT)"
        else ""
        s"$wc - $data$pull AS $wc"
      }
      s""",
       q$i AS (SELECT (CASE WHEN y * ${gdZ(w)} < 1.0 THEN 1.0 ELSE 0.0 END) AS act,
                      y, x1, x2
               FROM base CROSS JOIN $w),
       g$i AS (SELECT
                 CAST(SUM(CAST(FLOOR(-y * act * 1.0 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g0,
                 CAST(SUM(CAST(FLOOR(-y * act * x1 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g1,
                 CAST(SUM(CAST(FLOOR(-y * act * x2 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g2
               FROM q$i),
       w$i AS MATERIALIZED (SELECT
                 ${upd("g0", "w0", reg = false)},
                 ${upd("g1", "w1", reg = true)},
                 ${upd("g2", "w2", reg = true)}
               FROM w${i - 1} CROSS JOIN g$i CROSS JOIN nb)"""
    }.mkString
    s"""WITH base AS MATERIALIZED (
           SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                       THEN 1.0 ELSE -1.0 END AS y,
                  CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE)
                    / 2500.0 AS x1,
                  c_acctbal / 10000.0 AS x2
           FROM orders JOIN customer ON o_custkey = c_custkey),
     nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
     w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2)$steps,
     pf AS (SELECT GREATEST(0.0, 1.0 - y * ${gdZ("w20")}) AS hl,
                   CASE WHEN y * ${gdZ("w20")} > 0.0 THEN 1 ELSE 0 END AS ok
            FROM base CROSS JOIN w20),
     fin AS (SELECT CAST(SUM(CAST(FLOOR(hl * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS hq,
                    CAST(SUM(ok) AS BIGINT) AS okc FROM pf)
     SELECT nn AS n, CAST(0.01 AS DOUBLE) AS lambda,
            CAST(w0 AS DOUBLE)/1e9 AS w0,
            CAST(w1 AS DOUBLE)/1e9 AS w1,
            CAST(w2 AS DOUBLE)/1e9 AS w2,
            ROUND(CAST(hq AS DOUBLE)/1e6/CAST(nn AS DOUBLE), 6) AS hinge,
            ROUND(CAST(okc AS DOUBLE)/CAST(nn AS DOUBLE), 6) AS accuracy
     FROM w20 CROSS JOIN fin CROSS JOIN nb"""
  }

  /** Replays the backreference-free Soundex chain (strip → translate →
    * per-digit H/W collapse → drop 7s → per-digit adjacent dedup → peel
    * the first code → drop 0s → pad) — mirrors
    * [[graft.operators.FuzzyMatch.soundexCode]] verbatim; every regex is
    * RE2-safe and every replace carries the 'g' flag (DuckDB replaces
    * only the first match otherwise). */
  /** The portable soundex chain as nested subqueries over `src`,
    * emitting all of src's columns plus the 4-char `skey` — shared by the
    * ER-pipeline oracle (the q_soundex_blocks chain, parameterized). */
  private def soundexSql(src: String, nameCol: String): String = {
    val hw = (1 to 6).foldLeft("fl")((s, d) =>
      s"regexp_replace($s, '${d}7+$d', '$d', 'g')")
    val dedup = (0 to 6).foldLeft("no7")((s, d) =>
      s"regexp_replace($s, '$d$d+', '$d', 'g')")
    s"""SELECT *, CASE WHEN length(letters) > 0
                  THEN substr(letters, 1, 1) || rpad(substr(digits, 1, 3), 3, '0')
             END AS skey
     FROM (SELECT *, regexp_replace(tail, '0', '', 'g') AS digits
       FROM (SELECT *, CASE WHEN substr(fl, 1, 1) = '7' THEN dd ELSE substr(dd, 2) END AS tail
         FROM (SELECT *, $dedup AS dd
           FROM (SELECT *, regexp_replace(hw, '7', '', 'g') AS no7
             FROM (SELECT *, $hw AS hw
               FROM (SELECT *, translate(letters, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                                                  '01230127022455012623017202') AS fl
                 FROM (SELECT *, upper(regexp_replace($nameCol, '[^A-Za-z]', '', 'g')) AS letters
                   FROM $src)))))))"""
  }

  /** ER pipeline replay: perturbed re-feed, the soundex block join, JW
    * scoring (DuckDB's jaro_winkler_similarity is bit-compatible with the
    * native expression), (jw DESC, a_key ASC) argmax, left-join
    * survivorship — outputs UNROUNDED (same-double discipline). */
  private lazy val erPipelineOracle: String =
    s"""WITH a0 AS (SELECT p_partkey AS a_key, p_name AS a_name0,
                p_retailprice AS a_price FROM part),
     b0 AS (SELECT p_partkey + 1000000 AS b_key, p_name || 'x' AS b_name,
                   p_retailprice + 10.0 AS b_price
            FROM part WHERE p_partkey % 3 = 0),
     a1 AS (${soundexSql("a0", "a_name0")}),
     b1 AS (${soundexSql("b0", "b_name")}),
     pairs AS (SELECT b1.b_key, b1.b_name, b1.b_price,
                      a1.a_key, a1.a_name0, a1.a_price,
                      jaro_winkler_similarity(b1.b_name, a1.a_name0) AS jw
               FROM b1 JOIN a1 ON b1.skey = a1.skey
               WHERE jaro_winkler_similarity(b1.b_name, a1.a_name0) >= 0.9),
     best AS (SELECT b_key AS bk, a_key, jw, a_name0 AS canonical_name, a_price,
                     ROW_NUMBER() OVER (PARTITION BY b_key
                                        ORDER BY jw DESC, a_key ASC) AS rn
              FROM pairs)
     SELECT b0.b_key, best.a_key, best.jw, best.canonical_name,
            CASE WHEN best.a_key IS NOT NULL
                 THEN GREATEST(best.a_price, b0.b_price) END AS merged_price
     FROM b0 LEFT JOIN best ON b0.b_key = best.bk AND best.rn = 1
     ORDER BY b0.b_key"""

  private val soundexBlocksOracle: String = {
    val hw = (1 to 6).foldLeft("fl")((s, d) =>
      s"regexp_replace($s, '${d}7+$d', '$d', 'g')")
    val dedup = (0 to 6).foldLeft("no7")((s, d) =>
      s"regexp_replace($s, '$d$d+', '$d', 'g')")
    s"""WITH w AS (SELECT split_part(p_name, ' ', 1) AS w FROM part),
     c AS (SELECT w,
            upper(regexp_replace(w, '[^A-Za-z]', '', 'g')) AS letters,
            translate(letters, 'ABCDEFGHIJKLMNOPQRSTUVWXYZ',
                               '01230127022455012623017202') AS fl,
            $hw AS hw,
            regexp_replace(hw, '7', '', 'g') AS no7,
            $dedup AS dd,
            CASE WHEN substr(fl, 1, 1) = '7' THEN dd ELSE substr(dd, 2) END AS tail,
            regexp_replace(tail, '0', '', 'g') AS digits,
            CASE WHEN length(letters) > 0
                 THEN substr(letters, 1, 1) || rpad(substr(digits, 1, 3), 3, '0')
            END AS code
           FROM w)
     SELECT code, CAST(COUNT(*) AS BIGINT) AS parts,
            CAST(COUNT(DISTINCT w) AS BIGINT) AS words
     FROM c GROUP BY code ORDER BY code"""
  }

  /** 8 unrolled log-link GD steps + the literal-ln-table deviance —
    * mirrors [[graft.operators.Models.poissonRegression]] bit-for-bit
    * (the ln table is the JVM's doubles rendered verbatim, so no DuckDB
    * libm call touches the hashed output). */
  /** The q_poisson GD prefix (base + 8 unrolled log-link steps) shared
    * with the dispersion oracle. */
  private lazy val poissonGdCtes: String = {
    val steps = (1 to 8).map { i =>
      val w = s"w${i - 1}"
      s""",
       q$i AS (SELECT y, x1, x2, EXP(${gdZ(w)}) AS p FROM base CROSS JOIN $w),
       g$i AS (SELECT
                 CAST(SUM(CAST(FLOOR((p - y) * 1.0 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g0,
                 CAST(SUM(CAST(FLOOR((p - y) * x1 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g1,
                 CAST(SUM(CAST(FLOOR((p - y) * x2 * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS g2
               FROM q$i),
       w$i AS MATERIALIZED (SELECT
                 w0 - CAST(FLOOR(0.1 * CAST(g0 AS DOUBLE) * 1000.0 / CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS w0,
                 w1 - CAST(FLOOR(0.1 * CAST(g1 AS DOUBLE) * 1000.0 / CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS w1,
                 w2 - CAST(FLOOR(0.1 * CAST(g2 AS DOUBLE) * 1000.0 / CAST(nn AS DOUBLE) + 0.5) AS BIGINT) AS w2
               FROM w${i - 1} CROSS JOIN g$i CROSS JOIN nb)"""
    }.mkString
    s"""WITH cnt AS (SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS lines
           FROM lineitem GROUP BY 1),
     base AS MATERIALIZED (
           SELECT CAST(lines AS DOUBLE) AS y,
                  o_totalprice / 500000.0 AS x1,
                  CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE)
                    / 2500.0 AS x2
           FROM orders JOIN cnt ON o_orderkey = l_orderkey),
     nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
     w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2)$steps"""
  }

  private val poissonOracle: String = {
    val lnCase = (1 to 16)
      .map(c => s"WHEN y = $c THEN CAST(${math.log(c.toDouble)} AS DOUBLE)")
      .mkString("CASE ", " ", " END")
    s"""$poissonGdCtes,
     pf AS (SELECT y, EXP(${gdZ("w8")}) AS p,
                   (CASE WHEN y = 0.0 THEN CAST(0 AS DOUBLE)
                         ELSE y * (($lnCase) - ${gdZ("w8")}) END)
                     + (EXP(${gdZ("w8")}) - y) AS term
            FROM base CROSS JOIN w8),
     fin AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(FLOOR(term * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS dv,
                    CAST(SUM(CASE WHEN y < 0.0 OR y > 16.0 THEN 1 ELSE 0 END) AS BIGINT) AS oob,
                    CAST(SUM(CAST(FLOOR(p * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS mu
             FROM pf)
     SELECT n,
            CAST(w0 AS DOUBLE)/1e9 AS w0,
            CAST(w1 AS DOUBLE)/1e9 AS w1,
            CAST(w2 AS DOUBLE)/1e9 AS w2,
            CASE WHEN oob = 0 THEN
              ROUND(CAST(2 AS DOUBLE) * (CAST(dv AS DOUBLE) / 1e6) / CAST(n AS DOUBLE), 6)
            END AS deviance,
            ROUND(CAST(mu AS DOUBLE) / 1e6 / CAST(n AS DOUBLE), 6) AS mean_mu
     FROM fin CROSS JOIN w8"""
  }

  /** The KM at-risk scaffolding + exclusive-frame S(t−) + ordered CIF
    * accumulation — mirrors
    * [[graft.operators.Temporal.aalenJohansen]] bit-for-bit. */
  private val competingRisksOracle: String =
    """WITH fl AS (SELECT l_orderkey, l_shipdate AS first_ship, l_returnflag AS flag
           FROM (SELECT l_orderkey, l_shipdate, l_returnflag,
                        ROW_NUMBER() OVER (PARTITION BY l_orderkey
                                           ORDER BY l_shipdate, l_linenumber) AS rn
                 FROM lineitem) WHERE rn = 1),
     base AS (SELECT o_orderpriority AS pri,
                     CAST(datediff('day', CAST(o_orderdate AS DATE),
                                   CAST(first_ship AS DATE)) AS BIGINT) AS duration,
                     CASE WHEN o_orderstatus = 'O' THEN 0
                          WHEN flag = 'R' THEN 2 ELSE 1 END AS cause
              FROM orders JOIN fl ON o_orderkey = l_orderkey),
     g AS (SELECT pri, duration,
                  CAST(SUM(CASE WHEN cause = 1 THEN 1 ELSE 0 END) AS BIGINT) AS d1,
                  CAST(SUM(CASE WHEN cause = 2 THEN 1 ELSE 0 END) AS BIGINT) AS d2,
                  CAST(COUNT(*) AS BIGINT) AS att
           FROM base GROUP BY 1, 2),
     w1 AS (SELECT *, CAST(SUM(att) OVER (PARTITION BY pri) AS BIGINT)
                      - (CAST(SUM(att) OVER wc AS BIGINT) - att) AS n_risk
            FROM g WINDOW wc AS (PARTITION BY pri ORDER BY duration
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
     w2 AS (SELECT *, CASE WHEN d1 + d2 > 0 THEN
                        LN(GREATEST(1e-300,
                             1.0 - CAST(d1 + d2 AS DOUBLE) / CAST(n_risk AS DOUBLE)))
                      ELSE CAST(0 AS DOUBLE) END AS lt
            FROM w1),
     w3 AS (SELECT *, EXP(COALESCE(SUM(lt) OVER wp, CAST(0 AS DOUBLE))) AS sprev,
                      EXP(SUM(lt) OVER wc) AS scur
            FROM w2 WINDOW wp AS (PARTITION BY pri ORDER BY duration
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                           wc AS (PARTITION BY pri ORDER BY duration
                                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
     SELECT pri AS o_orderpriority, duration, d1, d2, n_risk,
            ROUND(SUM(sprev * CAST(d1 AS DOUBLE) / CAST(n_risk AS DOUBLE)) OVER wc, 6) AS cif1,
            ROUND(SUM(sprev * CAST(d2 AS DOUBLE) / CAST(n_risk AS DOUBLE)) OVER wc, 6) AS cif2,
            ROUND(scur, 6) AS survival
     FROM w3 WINDOW wc AS (PARTITION BY pri ORDER BY duration
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
     ORDER BY o_orderpriority, duration"""

  /** Two portable hash crawls + three exact counts + the Chapman chain —
    * mirrors [[graft.operators.Quality.captureRecapture]] bit-for-bit. */
  private val captureRecaptureOracle: String =
    """WITH a AS (SELECT DISTINCT doc_id FROM documents
               WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':capA'), 1, 8))::BIGINT % 100 < 60),
     b AS (SELECT DISTINCT doc_id FROM documents
           WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':capB'), 1, 8))::BIGINT % 100 < 60),
     c1 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n1 FROM a),
     c2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n2 FROM b),
     ov AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM a
            WHERE EXISTS (SELECT 1 FROM b WHERE b.doc_id = a.doc_id))
     SELECT n1, n2, m AS overlap,
            ROUND(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE) / CAST(m + 1 AS DOUBLE)
                  - 1.0, 6) AS n_hat,
            ROUND(SQRT(CAST(n1 + 1 AS DOUBLE) * CAST(n2 + 1 AS DOUBLE)
                       * CAST(n1 - m AS DOUBLE) * CAST(n2 - m AS DOUBLE)
                       / (CAST(m + 1 AS DOUBLE) * CAST(m + 1 AS DOUBLE)
                          * CAST(m + 2 AS DOUBLE))), 6) AS se
     FROM c1 CROSS JOIN c2 CROSS JOIN ov"""

  /** Per-side quantized moments + the simple-OLS closed forms + the
    * intercept gap — mirrors
    * [[graft.operators.Models.regressionDiscontinuity]] bit-for-bit. */
  private val rddOracle: String =
    """WITH base AS (
           SELECT c_acctbal / 1000.0 >= 0.0 AS above,
                  CAST(FLOOR((c_acctbal / 1000.0 - 0.0) * 1e6 + 0.5) AS HUGEINT) AS qx,
                  CAST(FLOOR(o_totalprice / 1000.0 * 1e6 + 0.5) AS HUGEINT) AS qy
           FROM orders JOIN customer ON o_custkey = c_custkey
           WHERE ABS(c_acctbal / 1000.0 - 0.0) <= 3.0),
     sides AS (SELECT above, CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(qx) AS sx0, SUM(qy) AS sy0,
                      SUM(qx * qx) AS sxx0, SUM(qx * qy) AS sxy0
               FROM base GROUP BY 1),
     fit AS (SELECT above, n,
                    CAST(sx0 AS DOUBLE) / 1e6 AS sx, CAST(sy0 AS DOUBLE) / 1e6 AS sy,
                    CAST(sxx0 AS DOUBLE) / 1e12 AS sxx, CAST(sxy0 AS DOUBLE) / 1e12 AS sxy,
                    CAST(n AS DOUBLE) AS nn
             FROM sides),
     sv AS (SELECT above, n,
                   CASE WHEN nn * sxx - sx * sx <> 0.0 THEN
                     (sy - (nn * sxy - sx * sy) / (nn * sxx - sx * sx) * sx) / nn END AS icept,
                   CASE WHEN nn * sxx - sx * sx <> 0.0 THEN
                     (nn * sxy - sx * sy) / (nn * sxx - sx * sx) END AS slope
            FROM fit),
     lo AS (SELECT MAX(n) AS n_below, MAX(icept) AS ib, MAX(slope) AS sb
            FROM sv WHERE NOT above),
     hi AS (SELECT MAX(n) AS n_above, MAX(icept) AS ia, MAX(slope) AS sa
            FROM sv WHERE above)
     SELECT n_below, n_above,
            ROUND(ib, 6) AS int_below, ROUND(sb, 6) AS slope_below,
            ROUND(ia, 6) AS int_above, ROUND(sa, 6) AS slope_above,
            ROUND(ia - ib, 6) AS tau
     FROM lo CROSS JOIN hi"""

  /** The q_js_drift binning + the 3-op squared-Hellinger bin terms —
    * mirrors [[graft.operators.Sketches.hellinger]] bit-for-bit. */
  private val hellingerDriftOracle: String =
    """WITH b AS (SELECT MIN(o_totalprice) AS lo,
                  (MAX(o_totalprice) - MIN(o_totalprice)) / 10 AS w
           FROM orders WHERE o_orderdate < TIMESTAMP '1996-07-01'),
     base AS (SELECT GREATEST(CAST(LEAST(CASE WHEN b.w = 0 THEN 0
                              ELSE FLOOR((o_totalprice - b.lo) / b.w) END, 9) AS BIGINT), 0) AS bin,
                     COUNT(*) AS n_base
              FROM orders, b WHERE o_orderdate < TIMESTAMP '1996-07-01' GROUP BY 1),
     cur AS (SELECT GREATEST(CAST(LEAST(CASE WHEN b.w = 0 THEN 0
                             ELSE FLOOR((o_totalprice - b.lo) / b.w) END, 9) AS BIGINT), 0) AS bin,
                    COUNT(*) AS n_cur
             FROM orders, b WHERE o_orderdate >= TIMESTAMP '1996-07-01' GROUP BY 1),
     j AS (SELECT COALESCE(base.bin, cur.bin) AS bin,
                  COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur
           FROM base FULL OUTER JOIN cur ON base.bin = cur.bin),
     t AS (SELECT bin, n_base, n_cur,
                  CAST(n_base AS DOUBLE) / SUM(n_base) OVER () AS base_pct,
                  CAST(n_cur AS DOUBLE) / SUM(n_cur) OVER () AS cur_pct
           FROM j)
     SELECT bin, CAST(n_base AS BIGINT) AS n_base, CAST(n_cur AS BIGINT) AS n_cur,
            ROUND((SQRT(base_pct) - SQRT(cur_pct)) * (SQRT(base_pct) - SQRT(cur_pct)) / 2, 9)
              AS h2_term
     FROM t ORDER BY bin"""

  /** Both scorers' oracles composed (the KN CTEs + a u-prefixed unigram
    * replica off the shared token lists) + the CCC moment chains —
    * mirrors qScorerAgreement /
    * [[graft.operators.Sketches.concordanceCcc]] bit-for-bit. */
  private val scorerAgreementOracle: String =
    s"""$knPerplexityCtes,
     res_kn AS (SELECT doc_id,
                  ROUND(-CAST(sq AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE), 6) AS y
                FROM sc),
     utok AS (SELECT doc_id, lang, unnest(l) AS tk FROM toks),
     urc AS MATERIALIZED (
           SELECT tk, CAST(COUNT(*) AS BIGINT) AS c FROM utok WHERE lang = 'en' GROUP BY 1),
     utot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM urc),
     umodel AS MATERIALIZED (
           SELECT tk, CAST(FLOOR(LN((CAST(c AS DOUBLE) + 1.0)
                  / (CAST(n AS DOUBLE) + 1.0 * (CAST(v AS DOUBLE) + 1.0)))
                * 1e6 + 0.5) AS BIGINT) AS lpq
           FROM urc CROSS JOIN utot),
     uoov AS (SELECT CAST(FLOOR(LN(1.0 / (CAST(n AS DOUBLE) + 1.0 * (CAST(v AS DOUBLE) + 1.0)))
                * 1e6 + 0.5) AS BIGINT) AS oq FROM utot),
     usc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(COALESCE(lpq, oq)) AS BIGINT) AS sq
             FROM utok LEFT JOIN umodel ON utok.tk = umodel.tk CROSS JOIN uoov
             GROUP BY 1),
     res_u AS (SELECT doc_id,
                 ROUND(-CAST(sq AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE), 6) AS x
               FROM usc),
     pair AS (SELECT x, y FROM res_u JOIN res_kn USING (doc_id)),
     mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
              CAST(SUM(CAST(FLOOR(x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
              CAST(SUM(CAST(FLOOR(y * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
              CAST(SUM(CAST(FLOOR(x * x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sxx,
              CAST(SUM(CAST(FLOOR(y * y * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS syy,
              CAST(SUM(CAST(FLOOR(x * y * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sxy
            FROM pair),
     rr AS (SELECT n, CAST(n AS DOUBLE) AS nn,
              CAST(sx AS DOUBLE) / 1e6 AS sxd, CAST(sy AS DOUBLE) / 1e6 AS syd,
              CAST(sxx AS DOUBLE) / 1e6 AS sxxd, CAST(syy AS DOUBLE) / 1e6 AS syyd,
              CAST(sxy AS DOUBLE) / 1e6 AS sxyd
            FROM mm),
     ff AS (SELECT n, nn,
              nn * sxyd - sxd * syd AS covn,
              nn * sxxd - sxd * sxd AS vxn,
              nn * syyd - syd * syd AS vyn,
              sxd / nn - syd / nn AS dmean
            FROM rr)
     SELECT n,
            CASE WHEN vxn > 0 AND vyn > 0 THEN ROUND(covn / SQRT(vxn * vyn), 6) END
              AS pearson_r,
            CASE WHEN vxn + vyn + nn * nn * (dmean * dmean) <> 0.0 THEN
              ROUND(CAST(2 AS DOUBLE) * covn
                    / (vxn + vyn + nn * nn * (dmean * dmean)), 6) END AS ccc,
            ROUND(dmean, 6) AS location_shift
     FROM ff"""

  /** The q_brier scored hold-out + equal-width bins + the exact DECIMAL
    * gap reduction — mirrors
    * [[graft.operators.Sketches.calibrationError]] bit-for-bit. */
  private val calibrationErrorOracle: String =
    """WITH b AS (SELECT o_orderpriority AS pr, c_nationkey AS nk,
                  o_orderstatus = 'F' AS y,
                  ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 AS bk
           FROM orders JOIN customer ON o_custkey = c_custkey),
     m AS (SELECT pr, nk,
                  CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
                    / CAST(COUNT(*) AS DOUBLE) AS p
           FROM b WHERE bk < 6 GROUP BY 1, 2),
     sc AS (SELECT CAST(FLOOR(p * 1000000000.0 + 0.5) AS BIGINT) AS pq,
                   CASE WHEN y THEN 1 ELSE 0 END AS yy
            FROM b JOIN m USING (pr, nk) WHERE bk >= 6),
     pb AS (SELECT LEAST(CAST(FLOOR(CAST(pq * 10 AS DOUBLE) / 1000000000.0) AS BIGINT), 9) AS bin,
                   CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(yy) AS BIGINT) AS pos,
                   CAST(SUM(pq) AS BIGINT) AS sp
            FROM sc GROUP BY 1),
     g AS (SELECT nb,
                  ABS(CAST(sp AS DOUBLE) / 1000000000.0 / CAST(nb AS DOUBLE)
                      - CAST(pos AS DOUBLE) / CAST(nb AS DOUBLE)) AS gap
           FROM pb),
     f AS (SELECT CAST(SUM(nb) AS BIGINT) AS n,
                  CAST(COUNT(*) AS BIGINT) AS n_bins_used,
                  SUM(CAST(CAST(nb AS DOUBLE) * gap AS DECIMAL(30,12))) AS sw,
                  MAX(CAST(gap AS DECIMAL(30,12))) AS mx
           FROM g)
     SELECT n, n_bins_used,
            ROUND(CAST(sw AS DOUBLE) / CAST(n AS DOUBLE), 6) AS ece,
            ROUND(CAST(mx AS DOUBLE), 6) AS mce
     FROM f"""

  /** One pooled+per-arm quantized moment pass + the CUPED fixed chains —
    * mirrors [[graft.operators.Sketches.cuped]] bit-for-bit. */
  private val cupedOracle: String =
    """WITH base AS (
           SELECT ('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':exp9'), 1, 8))::BIGINT
                    % 100 < 50 AS tr,
                  o_totalprice / 1000.0 AS y,
                  c_acctbal / 1000.0 AS x
           FROM orders JOIN customer ON o_custkey = c_custkey),
     a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CAST(FLOOR(x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sx,
            CAST(SUM(CAST(FLOOR(y * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sy,
            CAST(SUM(CAST(FLOOR(x * x * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sxx,
            CAST(SUM(CAST(FLOOR(x * y * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sxy,
            CAST(SUM(CAST(FLOOR(y * y * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS syy,
            CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
            CAST(SUM(CAST(FLOOR((CASE WHEN tr THEN 1.0 ELSE 0.0 END) * y * 1e6 + 0.5)
                 AS BIGINT)) AS BIGINT) AS syt,
            CAST(SUM(CAST(FLOOR((CASE WHEN tr THEN 1.0 ELSE 0.0 END) * x * 1e6 + 0.5)
                 AS BIGINT)) AS BIGINT) AS sxt
           FROM base),
     m AS (SELECT *,
            CAST(n AS DOUBLE) AS nn,
            CAST(sx AS DOUBLE) / 1e6 AS sxd, CAST(sy AS DOUBLE) / 1e6 AS syd,
            CAST(sxx AS DOUBLE) / 1e6 AS sxxd, CAST(sxy AS DOUBLE) / 1e6 AS sxyd,
            CAST(syy AS DOUBLE) / 1e6 AS syyd,
            CAST(n_t AS DOUBLE) AS ntd, CAST(n - n_t AS DOUBLE) AS ncd,
            CAST(syt AS DOUBLE) / 1e6 AS sytd, CAST(sxt AS DOUBLE) / 1e6 AS sxtd
           FROM a),
     r AS (SELECT *,
            nn * sxxd - sxd * sxd AS varxn,
            nn * syyd - syd * syd AS varyn,
            (nn * sxyd - sxd * syd) / (nn * sxxd - sxd * sxd) AS theta,
            sytd / ntd AS myt, sxtd / ntd AS mxt,
            (syd - sytd) / ncd AS myc, (sxd - sxtd) / ncd AS mxc
           FROM m)
     SELECT n, n_t, n - n_t AS n_c,
            CASE WHEN varxn <> 0.0 THEN ROUND(theta, 6) END AS theta,
            CASE WHEN varxn <> 0.0 AND varyn <> 0.0 THEN
              ROUND(theta * theta * varxn / varyn, 6) END AS rho2,
            CASE WHEN n_t > 0 AND n_t < n THEN ROUND(myt - myc, 6) END AS ate_raw,
            CASE WHEN n_t > 0 AND n_t < n AND varxn <> 0.0 THEN
              ROUND(myt - theta * mxt - (myc - theta * mxc), 6) END AS ate_cuped
     FROM r"""

  /** Exact cent sums + the single HHI division per nation — mirrors
    * [[graft.operators.Sketches.herfindahl]] bit-for-bit. */
  private val herfindahlOracle: String =
    """WITH ent AS (SELECT s_nationkey, l_suppkey,
                CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS HUGEINT)) AS HUGEINT) AS q
           FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
           GROUP BY 1, 2),
     per AS (SELECT s_nationkey, CAST(COUNT(*) AS BIGINT) AS n_entities,
                    SUM(q) AS sv, SUM(q * q) AS sq2
             FROM ent GROUP BY 1),
     r AS (SELECT s_nationkey, n_entities, sv,
                  CAST(sq2 AS DOUBLE) / (CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)) AS hhi,
                  CAST(n_entities AS DOUBLE) AS nd
           FROM per)
     SELECT s_nationkey, n_entities,
            CASE WHEN sv > 0 THEN ROUND(hhi, 6) END AS hhi,
            CASE WHEN sv > 0 AND n_entities > 1 THEN
              ROUND((hhi - 1.0 / nd) / (1.0 - 1.0 / nd), 6) END AS hhi_norm
     FROM r ORDER BY s_nationkey"""

  /** 5 unrolled MM rounds over the daily-contest games table — mirrors
    * [[graft.operators.Models.bradleyTerry]] bit-for-bit (strength CTEs
    * MATERIALIZED: each round references its predecessor twice). */
  private val bradleyTerryOracle: String = {
    val steps = (1 to 5).map { r =>
      val prev = s"p${r - 1}"
      s""",
     d$r AS (SELECT g.a AS item,
               CAST(SUM(CAST(FLOOR(CAST(g.n AS DOUBLE)
                    / (CAST(pa.pq + pb.pq AS DOUBLE) / 1e9) * 1e9 + 0.5) AS BIGINT))
                 AS BIGINT) AS den
             FROM games g
             JOIN $prev pa ON g.a = pa.item
             JOIN $prev pb ON g.b = pb.item
             GROUP BY 1),
     r$r AS (SELECT i.item,
               CASE WHEN w.wins IS NOT NULL AND d.den > 0 THEN
                 CAST(FLOOR(CAST(w.wins AS DOUBLE) / (CAST(d.den AS DOUBLE) / 1e9)
                      * 1e9 + 0.5) AS BIGINT)
               ELSE CAST(0 AS BIGINT) END AS rq
             FROM items i
             LEFT JOIN wins w ON i.item = w.item
             LEFT JOIN d$r d ON i.item = d.item),
     s$r AS (SELECT CAST(SUM(rq) AS BIGINT) AS s FROM r$r),
     p$r AS MATERIALIZED (
             SELECT item, CAST(FLOOR(CAST(rq AS DOUBLE) / CAST(s AS DOUBLE) * 1e9 + 0.5)
                          AS BIGINT) AS pq
             FROM r$r CROSS JOIN s$r)"""
    }.mkString
    s"""WITH cnt AS (SELECT date_trunc('day', ts) AS day, event_type,
                CAST(COUNT(*) AS BIGINT) AS c FROM events GROUP BY 1, 2),
     o AS MATERIALIZED (
           SELECT a.event_type AS w, b.event_type AS l
           FROM cnt a JOIN cnt b ON a.day = b.day AND a.c > b.c),
     wins AS MATERIALIZED (
           SELECT w AS item, CAST(COUNT(*) AS BIGINT) AS wins FROM o GROUP BY 1),
     items AS MATERIALIZED (
           SELECT DISTINCT item FROM (SELECT w AS item FROM o UNION ALL SELECT l FROM o)),
     games AS MATERIALIZED (
           SELECT a, b, CAST(COUNT(*) AS BIGINT) AS n FROM (
             SELECT w AS a, l AS b FROM o UNION ALL SELECT l, w FROM o) GROUP BY 1, 2),
     gp AS (SELECT a AS item, CAST(SUM(n) AS BIGINT) AS games FROM games GROUP BY 1),
     kk AS (SELECT CAST(COUNT(*) AS BIGINT) AS k FROM items),
     p0 AS MATERIALIZED (
           SELECT item, CAST(FLOOR(1e9 / CAST(k AS DOUBLE) + 0.5) AS BIGINT) AS pq
           FROM items CROSS JOIN kk)$steps
     SELECT i.item, COALESCE(w.wins, 0) AS wins, COALESCE(gp.games, 0) AS games,
            ROUND(CAST(p5.pq AS DOUBLE) / 1e9, 6) AS strength
     FROM items i
     LEFT JOIN wins w ON i.item = w.item
     LEFT JOIN gp ON i.item = gp.item
     JOIN p5 ON i.item = p5.item
     ORDER BY i.item"""
  }

  /** The shared Poisson GD prefix + the closed-form Cameron–Trivedi
    * auxiliary — mirrors
    * [[graft.operators.Models.poissonDispersion]] bit-for-bit. */
  private val poissonDispersionOracle: String =
    s"""$poissonGdCtes,
     dd AS (SELECT y, EXP(${gdZ("w8")}) AS mu FROM base CROSS JOIN w8),
     fin AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(FLOOR(((y - mu) * (y - mu) - y) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS num,
                    CAST(SUM(CAST(FLOOR(mu * mu * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS den,
                    CAST(SUM(CAST(FLOOR((y - mu) * (y - mu) / mu * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS chi
             FROM dd)
     SELECT n,
            CASE WHEN den > 0 THEN ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS alpha,
            CASE WHEN n > 3 THEN
              ROUND(CAST(chi AS DOUBLE) / 1e6 / CAST(n - 3 AS DOUBLE), 6) END AS pearson_ratio
     FROM fin"""

  /** One quantized-moment aggregate + the Kish fixed IEEE chains —
    * mirrors [[graft.operators.Sketches.kishWeightedMean]] bit-for-bit. */
  private val kishOracle: String =
    """WITH base AS (SELECT o_totalprice / 1000.0 AS y,
                  (c_acctbal + 1000.0) / 1000.0 AS w
           FROM orders JOIN customer ON o_custkey = c_custkey),
     a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
            CAST(SUM(CAST(FLOOR(w * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sw,
            CAST(SUM(CAST(FLOOR(w * y * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS swy,
            CAST(SUM(CAST(FLOOR(w * w * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sww,
            CAST(SUM(CAST(FLOOR(w * y * y * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS swyy
           FROM base),
     m AS (SELECT n, sw,
            CAST(sw AS DOUBLE) / 1e6 AS swd,
            CAST(swy AS DOUBLE) / 1e6 AS swyd,
            CAST(sww AS DOUBLE) / 1e6 AS swwd,
            CAST(swyy AS DOUBLE) / 1e6 AS swyyd
           FROM a),
     r AS (SELECT n, sw,
            swyd / swd AS mean_w,
            swd * swd / swwd AS eff_n,
            GREATEST(CAST(0 AS DOUBLE), (swyyd - swyd * swyd / swd) / swd) AS var_w
           FROM m)
     SELECT n,
            CASE WHEN sw > 0 THEN ROUND(mean_w, 6) END AS mean_w,
            CASE WHEN sw > 0 THEN ROUND(eff_n, 6) END AS eff_n,
            CASE WHEN sw > 0 THEN ROUND(CAST(n AS DOUBLE) / eff_n, 6) END AS deff,
            CASE WHEN sw > 0 THEN ROUND(SQRT(var_w / eff_n), 6) END AS se
     FROM r"""

  /** Bounded group aggregate → leave-one-group-out means re-quantized to
    * 1e-9 longs → the (G−1)/G deviation sum — mirrors
    * [[graft.operators.Sketches.jackknifeGroupSe]] bit-for-bit. */
  private val jackknifeOracle: String =
    """WITH base AS (SELECT o_totalprice / 1000.0 AS y, c_nationkey AS g
           FROM orders JOIN customer ON o_custkey = c_custkey),
     ga AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
             CAST(SUM(CAST(FLOOR(y * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sg
            FROM base GROUP BY 1),
     tot AS (SELECT CAST(COUNT(*) AS BIGINT) AS grps, CAST(SUM(ng) AS BIGINT) AS n,
                    CAST(SUM(sg) AS BIGINT) AS s FROM ga),
     tq AS MATERIALIZED (
            SELECT ga.ng, ga.sg, tot.grps, tot.n, tot.s,
                   CAST(FLOOR((CASE WHEN tot.n > ga.ng
                                    THEN CAST(tot.s - ga.sg AS DOUBLE) / 1e6
                                         / CAST(tot.n - ga.ng AS DOUBLE) END)
                              * 1e9 + 0.5) AS BIGINT) AS tqv
            FROM ga CROSS JOIN tot),
     red AS MATERIALIZED (
            SELECT MAX(grps) AS grps, MAX(n) AS n, MAX(s) AS s,
                   CAST(SUM(tqv) AS BIGINT) AS tsum,
                   CAST(SUM(CASE WHEN tqv IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nulls
            FROM tq),
     dev AS (SELECT CAST(SUM(CAST(FLOOR(
                      (CAST(tqv AS DOUBLE) / 1e9
                         - CAST(red.tsum AS DOUBLE) / 1e9 / CAST(red.grps AS DOUBLE))
                      * (CAST(tqv AS DOUBLE) / 1e9
                         - CAST(red.tsum AS DOUBLE) / 1e9 / CAST(red.grps AS DOUBLE))
                      * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sd
             FROM tq CROSS JOIN red)
     SELECT red.grps AS groups, red.n,
            ROUND(CAST(red.s AS DOUBLE) / 1e6 / CAST(red.n AS DOUBLE), 6) AS mean,
            CASE WHEN red.nulls = 0 AND red.grps > 1 THEN
              ROUND(SQRT((CAST(red.grps AS DOUBLE) - 1.0) / CAST(red.grps AS DOUBLE)
                         * (CAST(dev.sd AS DOUBLE) / 1e9)), 6) END AS se_jack
     FROM red CROSS JOIN dev"""

  /** Per-bin exact sufficient statistics + the bounded split scan —
    * mirrors [[graft.operators.Models.decisionStump]] bit-for-bit (the
    * argmax orders on the UNROUNDED gain, ties feature/bin asc). */
  private val stumpOracle: String =
    """WITH base AS MATERIALIZED (
           SELECT l_extendedprice / 1000.0 AS v,
                  CAST(l_quantity AS BIGINT) AS qty_bin,
                  CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) AS month_bin
           FROM lineitem),
     longf AS (SELECT 'qty_bin' AS feature, qty_bin AS bin,
                      CAST(FLOOR(v * 1e6 + 0.5) AS BIGINT) AS yq FROM base
               UNION ALL
               SELECT 'month_bin', month_bin,
                      CAST(FLOOR(v * 1e6 + 0.5) AS BIGINT) FROM base),
     ba AS (SELECT feature, bin, CAST(COUNT(*) AS BIGINT) AS nb,
                   CAST(SUM(yq) AS BIGINT) AS sb
            FROM longf GROUP BY 1, 2),
     cum AS (SELECT feature, bin, nb, sb,
                    CAST(SUM(nb) OVER w AS BIGINT) AS nl,
                    CAST(SUM(sb) OVER w AS BIGINT) AS sl,
                    CAST(SUM(nb) OVER wa AS BIGINT) AS nt,
                    CAST(SUM(sb) OVER wa AS BIGINT) AS st
             FROM ba
             WINDOW w AS (PARTITION BY feature ORDER BY bin),
                    wa AS (PARTITION BY feature)),
     cand AS (SELECT *,
                     CAST(sl AS DOUBLE) / 1e6 AS sld,
                     CAST(st - sl AS DOUBLE) / 1e6 AS srd,
                     CAST(st AS DOUBLE) / 1e6 AS std
              FROM cum WHERE nl < nt),
     g AS (SELECT *,
                  sld * sld / CAST(nl AS DOUBLE) + srd * srd / CAST(nt - nl AS DOUBLE)
                    - std * std / CAST(nt AS DOUBLE) AS gain
           FROM cand)
     SELECT nt AS n, feature, bin AS split_bin, nl AS n_left, nt - nl AS n_right,
            ROUND(sld / CAST(nl AS DOUBLE), 6) AS mean_left,
            ROUND(srd / CAST(nt - nl AS DOUBLE), 6) AS mean_right,
            ROUND(gain, 6) AS gain
     FROM g ORDER BY gain DESC, feature, bin LIMIT 1"""

  /** The sessionPaths sessionizer + per-session DISTINCT precedence pairs
    * + bounded top-k — mirrors
    * [[graft.operators.Funnel.sequentialPatterns]] bit-for-bit. */
  private val seqPatternsOracle: String =
    """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
     f AS (SELECT *, CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                               > 1800000000 THEN 1 ELSE 0 END AS newf
           FROM e),
     g AS (SELECT user_id || '#' || CAST(SUM(newf) OVER (PARTITION BY user_id ORDER BY us, event_id)
                                         AS VARCHAR) AS s,
                  us, event_id, event_type
           FROM f),
     tot AS (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS n FROM g),
     p AS (SELECT DISTINCT a.s, a.event_type AS ante, b.event_type AS cons
           FROM g a JOIN g b ON a.s = b.s
             AND (a.us < b.us OR (a.us = b.us AND a.event_id < b.event_id))),
     c AS (SELECT ante, cons, CAST(COUNT(*) AS BIGINT) AS sessions FROM p GROUP BY 1, 2)
     SELECT ante, cons, sessions,
            ROUND(CAST(sessions AS DOUBLE) / CAST(n AS DOUBLE), 6) AS support
     FROM c CROSS JOIN tot
     ORDER BY sessions DESC, ante, cons LIMIT 25"""

  /** Three hash-bag stump searches + the averaged-leaf ensemble MSE —
    * mirrors [[graft.operators.Models.baggedStumps]] bit-for-bit (the
    * bag draw is the portable md5-bucket, so DuckDB selects the
    * identical rows). */
  private val baggedStumpsOracle: String = {
    def bagCtes(b: Int) =
      s""",
     sub$b AS (SELECT * FROM base
               WHERE ('0x' || substr(md5(id || '#bag$b'), 1, 8))::BIGINT % 100 < 63),
     lf$b AS (SELECT 'qty_bin' AS feature, qty_bin AS bin,
                     CAST(FLOOR(v * 1e6 + 0.5) AS BIGINT) AS yq FROM sub$b
              UNION ALL
              SELECT 'month_bin', month_bin,
                     CAST(FLOOR(v * 1e6 + 0.5) AS BIGINT) FROM sub$b),
     ba$b AS (SELECT feature, bin, CAST(COUNT(*) AS BIGINT) AS nb,
                     CAST(SUM(yq) AS BIGINT) AS sb FROM lf$b GROUP BY 1, 2),
     cum$b AS (SELECT feature, bin,
                      CAST(SUM(nb) OVER w AS BIGINT) AS nl,
                      CAST(SUM(sb) OVER w AS BIGINT) AS sl,
                      CAST(SUM(nb) OVER wa AS BIGINT) AS nt,
                      CAST(SUM(sb) OVER wa AS BIGINT) AS st
               FROM ba$b
               WINDOW w AS (PARTITION BY feature ORDER BY bin),
                      wa AS (PARTITION BY feature)),
     g$b AS (SELECT *, CAST(sl AS DOUBLE) / 1e6 AS sld,
                    CAST(st - sl AS DOUBLE) / 1e6 AS srd,
                    CAST(st AS DOUBLE) / 1e6 AS std
             FROM cum$b WHERE nl < nt),
     win$b AS MATERIALIZED (
             SELECT feature, bin, nl, sl, nt, st,
                    CAST(sl AS DOUBLE) / 1e6 / CAST(nl AS DOUBLE) AS ml,
                    CAST(st - sl AS DOUBLE) / 1e6 / CAST(nt - nl AS DOUBLE) AS mr
             FROM g$b
             ORDER BY sld * sld / CAST(nl AS DOUBLE) + srd * srd / CAST(nt - nl AS DOUBLE)
                      - std * std / CAST(nt AS DOUBLE) DESC, feature, bin
             LIMIT 1)"""
    def leaf(b: Int) =
      s"""(CASE WHEN (CASE WHEN win$b.feature = 'qty_bin' THEN qty_bin ELSE month_bin END)
                     <= win$b.bin THEN win$b.ml ELSE win$b.mr END)"""
    def readout(b: Int) =
      s"""SELECT $b AS bag, feature, bin AS split_bin, nt AS n_bag,
            ROUND(ml, 6) AS mean_left, ROUND(mr, 6) AS mean_right,
            ROUND(CAST(mse.sq AS DOUBLE) / 1e6 / CAST(mse.n AS DOUBLE), 6) AS ensemble_mse
     FROM win$b CROSS JOIN mse"""
    s"""WITH base AS MATERIALIZED (
           SELECT l_extendedprice / 1000.0 AS v,
                  CAST(l_quantity AS BIGINT) AS qty_bin,
                  CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) AS month_bin,
                  l_orderkey || '-' || l_linenumber AS id
           FROM lineitem)${bagCtes(1)}${bagCtes(2)}${bagCtes(3)},
     pred AS (SELECT v, (${leaf(1)} + ${leaf(2)} + ${leaf(3)}) / CAST(3 AS DOUBLE) AS yh
              FROM base CROSS JOIN win1 CROSS JOIN win2 CROSS JOIN win3),
     mse AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(FLOOR((v - yh) * (v - yh) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sq
             FROM pred)
     ${readout(1)} UNION ALL ${readout(2)} UNION ALL ${readout(3)}
     ORDER BY bag"""
  }

  /** Two unrolled boosting rounds over the q_stump design: each round's
    * split search, leaf means, residual update, and quantized MSE replay
    * [[graft.operators.Models.gbStumps]] bit-for-bit (win CTEs
    * MATERIALIZED — each is referenced by both res$r and the readout). */
  private val gbStumpsOracle: String = {
    def roundCtes(r: Int) = {
      val prev = s"res${r - 1}"
      s""",
     lf$r AS (SELECT 'qty_bin' AS feature, qty_bin AS bin,
                     CAST(FLOOR(res * 1e6 + 0.5) AS BIGINT) AS yq FROM $prev
              UNION ALL
              SELECT 'month_bin', month_bin,
                     CAST(FLOOR(res * 1e6 + 0.5) AS BIGINT) FROM $prev),
     ba$r AS (SELECT feature, bin, CAST(COUNT(*) AS BIGINT) AS nb,
                     CAST(SUM(yq) AS BIGINT) AS sb FROM lf$r GROUP BY 1, 2),
     cum$r AS (SELECT feature, bin,
                      CAST(SUM(nb) OVER w AS BIGINT) AS nl,
                      CAST(SUM(sb) OVER w AS BIGINT) AS sl,
                      CAST(SUM(nb) OVER wa AS BIGINT) AS nt,
                      CAST(SUM(sb) OVER wa AS BIGINT) AS st
               FROM ba$r
               WINDOW w AS (PARTITION BY feature ORDER BY bin),
                      wa AS (PARTITION BY feature)),
     g$r AS (SELECT *, CAST(sl AS DOUBLE) / 1e6 AS sld,
                    CAST(st - sl AS DOUBLE) / 1e6 AS srd,
                    CAST(st AS DOUBLE) / 1e6 AS std
             FROM cum$r WHERE nl < nt),
     win$r AS MATERIALIZED (
             SELECT feature, bin, nl, sl, nt, st,
                    CAST(sl AS DOUBLE) / 1e6 / CAST(nl AS DOUBLE) AS ml,
                    CAST(st - sl AS DOUBLE) / 1e6 / CAST(nt - nl AS DOUBLE) AS mr
             FROM g$r
             ORDER BY sld * sld / CAST(nl AS DOUBLE) + srd * srd / CAST(nt - nl AS DOUBLE)
                      - std * std / CAST(nt AS DOUBLE) DESC, feature, bin
             LIMIT 1),
     res$r AS MATERIALIZED (
             SELECT qty_bin, month_bin,
                    res - 0.5 * (CASE WHEN (CASE WHEN win$r.feature = 'qty_bin'
                                                 THEN qty_bin ELSE month_bin END) <= win$r.bin
                                      THEN ml ELSE mr END) AS res
             FROM $prev CROSS JOIN win$r),
     sse$r AS (SELECT CAST(SUM(CAST(FLOOR(res * res * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sq
               FROM res$r)"""
    }
    def readout(r: Int) =
      s"""SELECT $r AS round, feature, bin AS split_bin, nl AS n_left, nt - nl AS n_right,
            ROUND(0.5 * ml, 6) AS delta_left, ROUND(0.5 * mr, 6) AS delta_right,
            ROUND(CAST(sse$r.sq AS DOUBLE) / 1e6 / CAST(nb0.n AS DOUBLE), 6) AS mse
     FROM win$r CROSS JOIN sse$r CROSS JOIN nb0"""
    s"""WITH base AS MATERIALIZED (
           SELECT l_extendedprice / 1000.0 AS v,
                  CAST(l_quantity AS BIGINT) AS qty_bin,
                  CAST(month(CAST(l_shipdate AS DATE)) AS BIGINT) AS month_bin
           FROM lineitem),
     nb0 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                    CAST(SUM(CAST(FLOOR(v * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sq
             FROM base),
     res0 AS MATERIALIZED (
             SELECT qty_bin, month_bin,
                    v - CAST(sq AS DOUBLE) / 1e6 / CAST(n AS DOUBLE) AS res
             FROM base CROSS JOIN nb0)${roundCtes(1)}${roundCtes(2)}
     ${readout(1)}
     UNION ALL
     ${readout(2)}
     ORDER BY round"""
  }

  /** Replays the md5-sign JL projection and both quantized-long distance
    * sums over the 16-vector probe set — mirrors
    * [[graft.operators.Similarity.jlProject]] + qJlDistortion's readout
    * bit-for-bit (the sign grid is engine-portable by construction). */
  private val jlDistortionOracle: String = {
    val sign =
      """(CASE WHEN substring(md5(concat(i, '_', j)), 1, 1)
                    IN ('0','1','2','3','4','5','6','7')
               THEN CAST(1 AS DOUBLE) ELSE CAST(-1 AS DOUBLE) END)"""
    s"""WITH probe AS MATERIALIZED (
           SELECT vec_id, embedding FROM embeddings WHERE vec_id < 16),
     pr AS MATERIALIZED (
           SELECT vec_id,
                  list_transform(range(0, 8), j ->
                    CAST(list_sum(list_transform(range(0, 64), i ->
                      CAST(FLOOR(CAST(embedding[i + 1] AS DOUBLE) * $sign * 1e6 + 0.5)
                           AS BIGINT))) AS DOUBLE) / 1e6 * (1.0 / SQRT(8.0))) AS proj
           FROM probe),
     pairs AS (SELECT a.vec_id AS id1, b.vec_id AS id2,
                      a.embedding AS e1, b.embedding AS e2,
                      pa.proj AS p1, pb.proj AS p2
               FROM probe a JOIN probe b ON a.vec_id < b.vec_id
               JOIN pr pa ON pa.vec_id = a.vec_id
               JOIN pr pb ON pb.vec_id = b.vec_id),
     d AS (SELECT id1, id2,
            SQRT(CAST(list_sum(list_transform(range(0, 64), i ->
              CAST(FLOOR((CAST(e1[i + 1] AS DOUBLE) - CAST(e2[i + 1] AS DOUBLE)) *
                         (CAST(e1[i + 1] AS DOUBLE) - CAST(e2[i + 1] AS DOUBLE)) * 1e6 + 0.5)
                   AS BIGINT))) AS DOUBLE) / 1e6) AS d_orig,
            SQRT(CAST(list_sum(list_transform(range(0, 8), j ->
              CAST(FLOOR((p1[j + 1] - p2[j + 1]) * (p1[j + 1] - p2[j + 1]) * 1e6 + 0.5)
                   AS BIGINT))) AS DOUBLE) / 1e6) AS d_proj
           FROM pairs)
     SELECT id1, id2, ROUND(d_orig, 6) AS d_orig, ROUND(d_proj, 6) AS d_proj,
            CASE WHEN d_orig > 0 THEN ROUND(d_proj / d_orig, 6) END AS ratio
     FROM d ORDER BY id1, id2"""
  }

  /** 6 unrolled GD steps + stratum-mean outcome models + per-row ψ sums
    * — mirrors [[graft.operators.Models.aipwAte]] bit-for-bit. */
  private val aipwOracle: String = {
    s"""WITH base AS MATERIALIZED (
           SELECT o_orderpriority AS g,
                  CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0 ELSE 0.0 END AS y,
                  o_totalprice / 100000.0 AS v,
                  c_acctbal / 10000.0 AS x1,
                  CAST(c_nationkey AS DOUBLE) / 25.0 AS x2
           FROM orders JOIN customer ON o_custkey = c_custkey),
     nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
     w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2)${gdSteps(6)},
     arms AS (SELECT g,
                MAX(CASE WHEN y = 1.0 THEN s END) / MAX(CASE WHEN y = 1.0 THEN an END) AS m1,
                MAX(CASE WHEN y = 0.0 THEN s END) / MAX(CASE WHEN y = 0.0 THEN an END) AS m0
              FROM (SELECT g, y, CAST(COUNT(*) AS DOUBLE) AS an,
                           CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                             / 1000000.0 AS s
                    FROM base GROUP BY 1, 2)
              GROUP BY 1),
     armsf AS (SELECT * FROM arms WHERE m1 IS NOT NULL AND m0 IS NOT NULL),
     pf AS (SELECT b.y, b.v, a.m1, a.m0,
                   LEAST(GREATEST(1.0/(1.0 + EXP(-${gdZ("w6")})), 0.01), 0.99) AS e
            FROM base b JOIN armsf a USING (g) CROSS JOIN w6),
     ps AS (SELECT (m1 - m0) + y * (v - m1) / e - (1.0 - y) * (v - m0) / (1.0 - e) AS psi
            FROM pf),
     agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS nu,
                    CAST(SUM(CAST(FLOOR(psi * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s,
                    CAST(SUM(CAST(FLOOR(psi * psi * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS ss
             FROM ps)
     SELECT nu AS n_used, (SELECT nn FROM nb) - nu AS n_dropped,
            ROUND(CAST(s AS DOUBLE)/1e6/CAST(nu AS DOUBLE), 6) AS ate,
            CASE WHEN nu >= 2 THEN
              ROUND(SQRT(((CAST(ss AS DOUBLE)/1e6
                           - (CAST(s AS DOUBLE)/1e6) * (CAST(s AS DOUBLE)/1e6)/CAST(nu AS DOUBLE))
                          / (CAST(nu AS DOUBLE) - 1.0)) / CAST(nu AS DOUBLE)), 6) END AS se,
            CASE WHEN nu >= 2 AND SQRT(((CAST(ss AS DOUBLE)/1e6
                             - (CAST(s AS DOUBLE)/1e6) * (CAST(s AS DOUBLE)/1e6)/CAST(nu AS DOUBLE))
                            / (CAST(nu AS DOUBLE) - 1.0)) / CAST(nu AS DOUBLE)) > 0.0 THEN
              ROUND((CAST(s AS DOUBLE)/1e6/CAST(nu AS DOUBLE))
                    / SQRT(((CAST(ss AS DOUBLE)/1e6
                             - (CAST(s AS DOUBLE)/1e6) * (CAST(s AS DOUBLE)/1e6)/CAST(nu AS DOUBLE))
                            / (CAST(nu AS DOUBLE) - 1.0)) / CAST(nu AS DOUBLE)), 6) END AS t_stat
     FROM agg"""
  }

  /** 6 unrolled GD steps fitting the propensity, then the clipped IPW
    * sums — mirrors [[graft.operators.Models.ipwAte]] bit-for-bit. */
  private val ipwOracle: String = {
    s"""WITH base AS MATERIALIZED (
           SELECT CASE WHEN c_mktsegment = 'BUILDING' THEN 1.0 ELSE 0.0 END AS y,
                  o_totalprice / 100000.0 AS v,
                  c_acctbal / 10000.0 AS x1,
                  CAST(c_nationkey AS DOUBLE) / 25.0 AS x2
           FROM orders JOIN customer ON o_custkey = c_custkey),
     nb AS (SELECT CAST(COUNT(*) AS BIGINT) AS nn FROM base),
     w0 AS (SELECT CAST(0 AS BIGINT) AS w0, CAST(0 AS BIGINT) AS w1, CAST(0 AS BIGINT) AS w2)${gdSteps(6)},
     pf AS (SELECT y, v,
                   LEAST(GREATEST(1.0/(1.0 + EXP(-${gdZ("w6")})), 0.01), 0.99) AS e
            FROM base CROSS JOIN w6),
     sums AS (SELECT
                CAST(SUM(CASE WHEN y = 1.0 THEN 1 ELSE 0 END) AS BIGINT) AS nt,
                CAST(SUM(CAST(FLOOR(y * v / e * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s1,
                CAST(SUM(CAST(FLOOR(y / e * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS d1,
                CAST(SUM(CAST(FLOOR((1.0 - y) * v / (1.0 - e) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s0,
                CAST(SUM(CAST(FLOOR((1.0 - y) / (1.0 - e) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS d0
              FROM pf)
     SELECT nn AS n, nt AS n_treated,
            ROUND(CAST(s1 - s0 AS DOUBLE)/1e6/CAST(nn AS DOUBLE), 6) AS ate_ht,
            ROUND(CAST(s1 AS DOUBLE)/CAST(d1 AS DOUBLE)
                  - CAST(s0 AS DOUBLE)/CAST(d0 AS DOUBLE), 6) AS ate_hajek
     FROM sums CROSS JOIN nb"""
  }

  /** Add-one unigram LM fit on the English slice + OOV-coalesced scoring,
    * per-token log-probs 1e-6-quantized before the long per-doc sum —
    * mirrors [[graft.operators.TextAnalysis.perplexityScore]] bit-for-bit;
    * shared verbatim by the batch query and its streaming twin. */
  private val perplexityOracle: String =
    """WITH tok AS MATERIALIZED (SELECT doc_id,
            unnest(regexp_extract_all(lower(text), '[a-z0-9]{1,}')) AS tk
          FROM documents),
     rc AS MATERIALIZED (SELECT tk, CAST(COUNT(*) AS BIGINT) AS c
            FROM tok JOIN documents USING (doc_id) WHERE lang = 'en' GROUP BY 1),
     tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS v FROM rc),
     model AS MATERIALIZED (SELECT tk,
              CAST(FLOOR(LN((CAST(c AS DOUBLE) + 1.0)
                            / (CAST(n AS DOUBLE) + 1.0 * (CAST(v AS DOUBLE) + 1.0)))
                   * 1e6 + 0.5) AS BIGINT) AS lpq
            FROM rc CROSS JOIN tot),
     oov AS (SELECT CAST(FLOOR(LN(1.0 / (CAST(n AS DOUBLE) + 1.0 * (CAST(v AS DOUBLE) + 1.0)))
                   * 1e6 + 0.5) AS BIGINT) AS oq FROM tot),
     sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
              CAST(SUM(COALESCE(lpq, oq)) AS BIGINT) AS sq
            FROM tok LEFT JOIN model ON tok.tk = model.tk CROSS JOIN oov
            GROUP BY 1)
     SELECT doc_id, n_tokens,
            ROUND(-CAST(sq AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE), 6) AS cross_entropy,
            ROUND(EXP(ROUND(-CAST(sq AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE), 6)), 6) AS perplexity
     FROM sc ORDER BY doc_id"""

  /** 3 unrolled IPF sweeps (row-scale then column-scale), weights stored
    * as 1e-9-unit BIGINTs so margin sums are exact integers — mirrors
    * [[graft.operators.Sketches.rake]] bit-for-bit. */
  private val rakeOracle: String = {
    val sweeps = (1 to 3).map { i =>
      s""",
       r$i AS (SELECT a, CAST(SUM(wq) AS BIGINT) AS s FROM c${2 * i - 2} GROUP BY a),
       c${2 * i - 1} AS (SELECT c.a, c.b, c.n_obs, c.rt, c.ct,
              CAST(FLOOR(CAST(c.wq AS DOUBLE) * CAST(c.rt AS DOUBLE) / CAST(r$i.s AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS wq
            FROM c${2 * i - 2} c JOIN r$i ON c.a = r$i.a),
       k$i AS (SELECT b, CAST(SUM(wq) AS BIGINT) AS s FROM c${2 * i - 1} GROUP BY b),
       c${2 * i} AS (SELECT c.a, c.b, c.n_obs, c.rt, c.ct,
              CAST(FLOOR(CAST(c.wq AS DOUBLE) * CAST(c.ct AS DOUBLE) / CAST(k$i.s AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS wq
            FROM c${2 * i - 1} c JOIN k$i ON c.b = k$i.b)"""
    }.mkString
    s"""WITH c0 AS (
       SELECT o.o_orderpriority AS a, o.o_orderstatus AS b,
              CAST(COUNT(*) AS BIGINT) AS n_obs, rt.t AS rt, ct.t AS ct,
              CAST(COUNT(*) AS BIGINT) * 1000000000 AS wq
       FROM orders o
       JOIN (VALUES ('1-URGENT', 5000), ('2-HIGH', 5000), ('3-MEDIUM', 5000),
                    ('4-NOT SPECIFIED', 5000), ('5-LOW', 5000)) AS rt(a, t)
         ON o.o_orderpriority = rt.a
       JOIN (VALUES ('F', 10000), ('O', 10000), ('P', 5000)) AS ct(b, t)
         ON o.o_orderstatus = ct.b
       GROUP BY 1, 2, rt.t, ct.t)$sweeps
     SELECT a AS o_orderpriority, b AS o_orderstatus, n_obs,
            ROUND(CAST(wq AS DOUBLE) / 1e9, 6) AS weight
     FROM c6 ORDER BY a, b"""
  }

  private val gTestOracle: String =
    """WITH cells AS (
         SELECT o_orderstatus AS a, o_orderpriority AS b,
                CAST(COUNT(*) AS BIGINT) AS o
         FROM orders GROUP BY 1, 2),
       m AS (SELECT a, b, o,
                    CAST(SUM(o) OVER (PARTITION BY a) AS BIGINT) AS ra,
                    CAST(SUM(o) OVER (PARTITION BY b) AS BIGINT) AS cb,
                    CAST(SUM(o) OVER () AS BIGINT) AS n
             FROM cells),
       t AS (SELECT a, b, n,
                    CAST(FLOOR(CAST(o AS DOUBLE)
                      * ln(CAST(CAST(o AS HUGEINT) * n AS DOUBLE)
                           / CAST(CAST(ra AS HUGEINT) * cb AS DOUBLE))
                      * 1e9 + 0.5) AS HUGEINT) AS tq
             FROM m)
       SELECT MAX(n) AS n, COUNT(*) AS n_cells,
              (COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS dof,
              ROUND(2.0 * CAST(SUM(tq) AS DOUBLE) / 1e9, 6) AS g
       FROM t"""

  // four exact long counters, then fixed IEEE chains — no quantization
  private val twoProportionOracle: String =
    """WITH agg AS (SELECT
           CAST(SUM(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS BIGINT) AS n_a,
           CAST(SUM(CASE WHEN event_type = 'click' AND value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS x_a,
           CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
           CAST(SUM(CASE WHEN event_type = 'view' AND value > 50.0 THEN 1 ELSE 0 END) AS BIGINT) AS x_b
         FROM events WHERE event_type IN ('click', 'view')),
       c AS (SELECT n_a, x_a, n_b, x_b,
                    CAST(x_a AS DOUBLE) / n_a AS pa,
                    CAST(x_b AS DOUBLE) / n_b AS pb,
                    CAST(x_a + x_b AS DOUBLE) / (n_a + n_b) AS ppool
             FROM agg),
       zc AS (SELECT *,
                     (pa - pb) / sqrt(ppool * (1.0 - ppool)
                       * (1.0 / n_a + 1.0 / n_b)) AS z
              FROM c)
       SELECT n_a, x_a, n_b, x_b,
              ROUND(pa, 6) AS p_a, ROUND(pb, 6) AS p_b,
              ROUND(ppool, 6) AS p_pooled, ROUND(z, 6) AS z,
              ABS(z) > 1.959964 AS reject_95,
              ABS(z) > 2.575829 AS reject_99
       FROM zc"""

  /** The pageRankOracle recursion with the teleport mass gated on the seed
    * predicate (id % 10 = 0) and seed-only initial ranks — mirrors
    * [[graft.operators.Graph.personalizedPageRank]] bit-for-bit. */
  private val pprOracle: String = {
    val iters = (1 to 5).map { i =>
      s""",
         c$i AS (SELECT e.v AS id,
                        CAST(SUM(CAST(floor(r.rank / d.outdeg * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
                 FROM edges e JOIN r${i - 1} r ON e.u = r.id JOIN deg d ON e.u = d.id
                 GROUP BY e.v),
         r$i AS (SELECT deg.id,
                        floor(((1.0 - 0.85) * CAST(CASE WHEN deg.id % 10 = 0 THEN 1 ELSE 0 END AS DOUBLE)
                               + 0.85 * (CAST(COALESCE(s, 0) AS DOUBLE) / 1e12)) * 1e9 + 0.5) / 1e9 AS rank
                 FROM deg LEFT JOIN c$i ON deg.id = c$i.id)"""
    }.mkString
    s"""WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       p AS (SELECT a.l_partkey AS pu, b.l_partkey AS pv
             FROM baskets a JOIN baskets b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       edges AS (SELECT pu AS u, pv AS v FROM p UNION ALL SELECT pv AS u, pu AS v FROM p),
       deg AS (SELECT u AS id, COUNT(*) AS outdeg FROM edges GROUP BY 1),
       r0 AS (SELECT id, CAST(CASE WHEN id % 10 = 0 THEN 1 ELSE 0 END AS DOUBLE) AS rank FROM deg)$iters
       SELECT id AS part_key, rank FROM r5 ORDER BY part_key"""
  }

  private val pageRankOracle: String = {
    val iters = (1 to 5).map { i =>
      s""",
         c$i AS (SELECT e.v AS id,
                        CAST(SUM(CAST(floor(r.rank / d.outdeg * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
                 FROM edges e JOIN r${i - 1} r ON e.u = r.id JOIN deg d ON e.u = d.id
                 GROUP BY e.v),
         r$i AS (SELECT deg.id,
                        floor(((1.0 - 0.85) + 0.85 * (CAST(COALESCE(s, 0) AS DOUBLE) / 1e12)) * 1e9 + 0.5) / 1e9 AS rank
                 FROM deg LEFT JOIN c$i ON deg.id = c$i.id)"""
    }.mkString
    s"""WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       p AS (SELECT a.l_partkey AS pu, b.l_partkey AS pv
             FROM baskets a JOIN baskets b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       edges AS (SELECT pu AS u, pv AS v FROM p UNION ALL SELECT pv AS u, pu AS v FROM p),
       deg AS (SELECT u AS id, COUNT(*) AS outdeg FROM edges GROUP BY 1),
       r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM deg)$iters
       SELECT id AS part_key, rank FROM r5 ORDER BY part_key"""
  }

  /** 4 unrolled 3-truss peel rounds — per round a wedge-join support count
    * + threshold filter, mirroring [[graft.operators.Graph.kTruss]]. The
    * round CTEs are MATERIALIZED: each references its predecessor 3×, and
    * DuckDB's default inlining re-evaluates the whole chain exponentially
    * (the un-hinted form did not finish at sf0.01; materialized it is
    * sub-second). */
  private val kTrussOracle: String = {
    val rounds = (0 until 4).map { i =>
      s"""u$i AS MATERIALIZED (SELECT a AS n, b AS z FROM e$i UNION ALL SELECT b, a FROM e$i),
         s$i AS MATERIALIZED (SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS support
                FROM e$i e JOIN u$i x ON e.a = x.n JOIN u$i y
                  ON e.b = y.n AND y.z = x.z
                GROUP BY 1, 2),
         e${i + 1} AS MATERIALIZED (SELECT a, b FROM s$i WHERE support >= 1)"""
    }.mkString(",\n         ")
    s"""WITH baskets AS MATERIALIZED (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS MATERIALIZED (SELECT a.l_partkey AS pu, b.l_partkey AS pv
               FROM baskets a JOIN baskets b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         e0 AS MATERIALIZED (SELECT pu AS a, pv AS b FROM p),
         $rounds,
         u4 AS MATERIALIZED (SELECT a AS n, b AS z FROM e4 UNION ALL SELECT b, a FROM e4),
         s4 AS MATERIALIZED (SELECT e.a, e.b, CAST(COUNT(*) AS BIGINT) AS support
                FROM e4 e JOIN u4 x ON e.a = x.n JOIN u4 y ON e.b = y.n AND y.z = x.z
                GROUP BY 1, 2)
         SELECT e.a, e.b, CAST(COALESCE(s.support, 0) AS BIGINT) AS support
         FROM e4 e LEFT JOIN s4 s ON e.a = s.a AND e.b = s.b
         ORDER BY e.a, e.b"""
  }

  /** Adjacent-token edges + 5 chained PageRank CTEs (the q_pagerank
    * generator on the word graph), mirroring
    * [[graft.operators.TextAnalysis.textRank]]. */
  private val textRankOracle: String = {
    val iters = (1 to 5).map { i =>
      s""",
         c$i AS (SELECT e.v AS id,
                        CAST(SUM(CAST(floor(r.rank / d.outdeg * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
                 FROM und e JOIN r${i - 1} r ON e.u = r.id JOIN deg d ON e.u = d.id
                 GROUP BY e.v),
         r$i AS (SELECT deg.id,
                        floor(((1.0 - 0.85) + 0.85 * (CAST(COALESCE(s, 0) AS DOUBLE) / 1e12)) * 1e9 + 0.5) / 1e9 AS rank
                 FROM deg LEFT JOIN c$i ON deg.id = c$i.id)"""
    }.mkString
    s"""WITH tok AS MATERIALIZED (SELECT list_filter(regexp_extract_all(lower(text), '[a-z0-9]+'),
                        w -> length(w) >= 4) AS lst
                FROM documents),
       p2 AS MATERIALIZED (SELECT lst[i] AS w1, lst[i + 1] AS w2
              FROM tok, unnest(generate_series(1, len(lst) - 1)) AS u(i)
              WHERE len(lst) >= 2),
       e AS MATERIALIZED (SELECT DISTINCT LEAST(w1, w2) AS a, GREATEST(w1, w2) AS b
             FROM p2 WHERE w1 <> w2),
       und AS MATERIALIZED (SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e),
       deg AS MATERIALIZED (SELECT u AS id, COUNT(*) AS outdeg FROM und GROUP BY 1),
       r0 AS (SELECT id, CAST(1.0 AS DOUBLE) AS rank FROM deg)$iters,
       rk AS (SELECT id AS word, rank,
                ROW_NUMBER() OVER (ORDER BY rank DESC, id) AS rn
              FROM r5)
       SELECT word, rank, CAST(rn AS INTEGER) AS rnk
       FROM rk WHERE rn <= 50 ORDER BY rnk"""
  }

  /** 3 chained HITS iterations — per half-step one join+sum CTE quantized
    * at 1e-12 and a max-normalization CTE re-quantized at 1e-9, mirroring
    * [[graft.operators.Graph.hits]] exactly. */
  private val hitsOracle: String = {
    val iters = (1 to 3).map { i =>
      s""",
         a${i}s AS (SELECT e.v AS id,
                     CAST(SUM(CAST(FLOOR(h.hub * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
                   FROM e JOIN h${i - 1} h ON e.u = h.id GROUP BY 1),
         a$i AS (SELECT id, FLOOR(CAST(s AS DOUBLE) / CAST((SELECT MAX(s) FROM a${i}s) AS DOUBLE) * 1e9 + 0.5) / 1e9 AS authority
                 FROM a${i}s),
         h${i}s AS (SELECT e.u AS id,
                     CAST(SUM(CAST(FLOOR(a.authority * 1e12 + 0.5) AS BIGINT)) AS BIGINT) AS s
                   FROM e JOIN a$i a ON e.v = a.id GROUP BY 1),
         h$i AS (SELECT id, FLOOR(CAST(s AS DOUBLE) / CAST((SELECT MAX(s) FROM h${i}s) AS DOUBLE) * 1e9 + 0.5) / 1e9 AS hub
                 FROM h${i}s)"""
    }.mkString
    s"""WITH e AS (SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS u,
                          'p' || CAST(l.l_partkey AS VARCHAR) AS v
               FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey),
       h0 AS (SELECT DISTINCT u AS id, CAST(1.0 AS DOUBLE) AS hub FROM e)$iters
       SELECT COALESCE(h.id, a.id) AS node,
              COALESCE(h.hub, 0.0) AS hub,
              COALESCE(a.authority, 0.0) AS authority
       FROM h3 h FULL OUTER JOIN a3 a ON h.id = a.id ORDER BY node"""
  }

  /** 4 chained label-propagation sweeps — each one count + argmax CTE pair,
    * mirroring [[graft.operators.Graph.labelPropagation]] exactly. */
  private val labelPropOracle: String = {
    val iters = (1 to 4).map { i =>
      s""",
         n$i AS (SELECT e.u, l.label, CAST(COUNT(*) AS BIGINT) AS c
                 FROM edges e JOIN l${i - 1} l ON e.v = l.id GROUP BY 1, 2),
         l$i AS (SELECT u AS id, label FROM (
                   SELECT u, label, ROW_NUMBER() OVER
                     (PARTITION BY u ORDER BY c DESC, label) AS rn FROM n$i)
                 WHERE rn = 1)"""
    }.mkString
    s"""WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
       p AS (SELECT a.l_partkey AS pu, b.l_partkey AS pv
             FROM baskets a JOIN baskets b
               ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
             GROUP BY 1, 2 HAVING COUNT(*) >= 3),
       edges AS (SELECT pu AS u, pv AS v FROM p UNION SELECT pv AS u, pu AS v FROM p),
       l0 AS (SELECT DISTINCT u AS id, u AS label FROM edges)$iters
       SELECT id AS node, label AS community FROM l4 ORDER BY node"""
  }

  /** LPA sweeps (shared CTE builder) + the exact-rational modularity tail. */
  private val modularityOracle: String = {
    val upTo = labelPropOracle.substring(0, labelPropOracle.lastIndexOf("\n       SELECT"))
    upTo + """,
       wc AS (SELECT la.label AS ca, lb.label AS cb
              FROM p JOIN l4 la ON p.pu = la.id JOIN l4 lb ON p.pv = lb.id),
       dc AS (SELECT c, CAST(COUNT(*) AS BIGINT) AS d FROM (
                SELECT ca AS c FROM wc UNION ALL SELECT cb AS c FROM wc) GROUP BY 1),
       ic AS (SELECT ca AS c, CAST(COUNT(*) AS BIGINT) AS l FROM wc
              WHERE ca = cb GROUP BY 1),
       mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM p)
       SELECT m, CAST(COUNT(*) AS BIGINT) AS n_communities,
         ROUND(CAST(SUM(CAST(4 AS HUGEINT) * m * COALESCE(l, 0)
                 - CAST(d AS HUGEINT) * d) AS DOUBLE) /
               (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 6) AS modularity
       FROM dc LEFT JOIN ic USING (c), mm GROUP BY m"""
  }

  /** 3 chained Lloyd rounds on the integer grid — assignment argmin by
    * (exact dist², cluster) row_number, centroid means re-quantized with
    * floor(S/n + 0.5); mirrors [[graft.operators.Similarity.kMeansGrid]]. */
  private val kMeansOracle: String = {
    val iters = (1 to 3).map { i =>
      s""",
         a$i AS (SELECT p.user_id, p.f0, p.f1, c.cl,
                   (p.f0 - c.c0) * (p.f0 - c.c0) + (p.f1 - c.c1) * (p.f1 - c.c1) AS d,
                   ROW_NUMBER() OVER (PARTITION BY p.user_id ORDER BY
                     (p.f0 - c.c0) * (p.f0 - c.c0) + (p.f1 - c.c1) * (p.f1 - c.c1), c.cl) AS rn
                 FROM pts p, c${i - 1} c),
         c$i AS (SELECT cl,
                   CAST(FLOOR(CAST(SUM(f0) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS c0,
                   CAST(FLOOR(CAST(SUM(f1) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS c1
                 FROM a$i WHERE rn = 1 GROUP BY cl)"""
    }.mkString
    s"""WITH pts AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS f0,
           CAST(FLOOR(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) / 100.0) AS BIGINT) AS f1
         FROM events GROUP BY 1),
       c0 AS (SELECT ROW_NUMBER() OVER (ORDER BY f0, f1) - 1 AS cl, f0 AS c0, f1 AS c1
              FROM (SELECT DISTINCT f0, f1 FROM pts ORDER BY f0, f1 LIMIT 3))$iters,
       fin AS (SELECT p.user_id, c.cl,
                 (p.f0 - c.c0) * (p.f0 - c.c0) + (p.f1 - c.c1) * (p.f1 - c.c1) AS d,
                 ROW_NUMBER() OVER (PARTITION BY p.user_id ORDER BY
                   (p.f0 - c.c0) * (p.f0 - c.c0) + (p.f1 - c.c1) * (p.f1 - c.c1), c.cl) AS rn
               FROM pts p, c3 c)
       SELECT f.cl AS cluster, CAST(COUNT(*) AS BIGINT) AS n_points,
         MAX(c.c0) AS n_events, MAX(c.c1) AS dollars, CAST(SUM(f.d) AS BIGINT) AS inertia
       FROM fin f JOIN c3 c ON f.cl = c.cl WHERE f.rn = 1
       GROUP BY f.cl ORDER BY cluster"""
  }

  /** The 7×7 DTW recurrence statically unrolled as lateral column aliases
    * (exact integer costs + LEAST path sums), mirroring
    * [[graft.functions.VectorOps.dtwDistance]] on the weekly profiles. */
  private val dtwOracle: String = {
    val cells = (for (i <- 0 to 6; j <- 0 to 6) yield {
      val c = s"ABS(a$i - b$j)"
      val d = (i, j) match {
        case (0, 0) => c
        case (0, _) => s"d0${j - 1} + $c"
        case (_, 0) => s"d${i - 1}0 + $c"
        case _ => s"LEAST(d${i - 1}$j, d$i${j - 1}, d${i - 1}${j - 1}) + $c"
      }
      s"$d AS d$i$j"
    }).mkString(",\n                 ")
    val avs = (0 to 6).map(i => s"a.v$i AS a$i").mkString(", ")
    val bvs = (0 to 6).map(i => s"b.v$i AS b$i").mkString(", ")
    val piv = (0 to 6).map(i =>
      s"CAST(MAX(CASE WHEN dow = $i THEN v END) AS BIGINT) AS v$i").mkString(",\n                 ")
    s"""WITH o AS (SELECT o_custkey, CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                CAST(datediff('day', DATE '1990-01-01', CAST(o_orderdate AS DATE)) % 7 AS INT) AS dow
              FROM orders),
         j AS (SELECT c.c_mktsegment AS g, o.cents, o.dow
               FROM o JOIN customer c ON o.o_custkey = c.c_custkey),
         byd AS (SELECT g, dow, CAST(SUM(cents) AS BIGINT) AS v FROM j GROUP BY 1, 2),
         prof AS (SELECT g,
                 $piv
                FROM byd GROUP BY 1),
         pairs AS (SELECT a.g AS ga, b.g AS gb, $avs, $bvs
                   FROM prof a JOIN prof b ON a.g < b.g),
         dp AS (SELECT ga, gb,
                 $cells
                FROM pairs)
         SELECT ga AS seg_a, gb AS seg_b, d66 AS dtw
         FROM dp ORDER BY seg_a, seg_b"""
  }

  /** Exact integer sums per lag + the ACF fixed-chain assembly with two
    * series, mirroring [[graft.operators.Temporal.ccf]]. */
  private val ccfOracle: String = {
    val lags = -7 to 7
    def nm(i: Int) = if (i < 0) s"ym${-i}" else s"y$i"
    val lagCols = lags.map { i =>
      val sh = if (i >= 0) s"LAG(y, $i) OVER (ORDER BY day)"
               else s"LEAD(y, ${-i}) OVER (ORDER BY day)"
      s"$sh AS ${nm(i)}"
    }.mkString(",\n                 ")
    val perLag = lags.map { i =>
      val c = nm(i)
      s"""CAST(SUM(CASE WHEN $c IS NOT NULL THEN x * $c END) AS BIGINT) AS p_$c,
                 CAST(SUM(CASE WHEN $c IS NOT NULL THEN x END) AS BIGINT) AS a_$c,
                 CAST(SUM(CASE WHEN $c IS NOT NULL THEN $c END) AS BIGINT) AS b_$c,
                 CAST(COUNT($c) AS BIGINT) AS n_$c"""
    }.mkString(",\n                 ")
    val rows = lags.map { i =>
      val c = nm(i)
      s"""SELECT n, CAST($i AS INT) AS lag,
             CASE WHEN vx > 0 AND vy > 0 AND n_$c > 0
                  THEN ROUND((CAST(p_$c AS DOUBLE) - my * CAST(a_$c AS DOUBLE)
                              - mx * CAST(b_$c AS DOUBLE)
                              + CAST(n_$c AS DOUBLE) * mx * my)
                             / (SQRT(vx) * SQRT(vy)), 6) END AS ccf FROM m"""
    }.mkString("\n           UNION ALL ")
    s"""WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
                CAST(COUNT(*) AS BIGINT) AS y,
                CAST(FLOOR(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) / 100.0) AS BIGINT) AS x
              FROM orders GROUP BY 1),
         lagged AS (SELECT x, y,
                 $lagCols
                FROM daily),
         agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
                 CAST(SUM(x * x) AS BIGINT) AS sxx, CAST(SUM(y * y) AS BIGINT) AS syy,
                 $perLag
                FROM lagged),
         m AS (SELECT agg.*,
                 CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
                 CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS my,
                 CAST(sxx AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS vx,
                 CAST(syy AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) * (CAST(sy AS DOUBLE) / CAST(n AS DOUBLE)) AS vy
               FROM agg)
         SELECT * FROM ($rows) ORDER BY lag"""
  }

  /** Shared batch/stream Wasserstein oracle — the streaming twin's state
    * store holds exactly the distinct-value integer count pairs this SQL
    * rebuilds. */
  private val wassersteinOracle: String =
    """WITH src AS (SELECT o_orderpriority AS g,
              CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
            FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
       h AS (SELECT v,
               CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
               CAST(SUM(CASE WHEN g <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS cb
             FROM src GROUP BY 1),
       w AS (SELECT v,
               CAST(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fa,
               CAST(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fb,
               CAST(SUM(ca) OVER () AS BIGINT) AS na,
               CAST(SUM(cb) OVER () AS BIGINT) AS nb,
               CAST(COALESCE(LEAD(v) OVER (ORDER BY v) - v, 0) AS BIGINT) AS dx
             FROM h)
       SELECT '1-URGENT' AS group_a, '5-LOW' AS group_b,
              MAX(na) AS n_a, MAX(nb) AS n_b,
              ROUND(CAST(SUM(CAST(ABS(fa * nb - fb * na) AS DECIMAL(38,0))
                             * CAST(dx AS DECIMAL(38,0))) AS DOUBLE)
                    / CAST(MAX(na) * MAX(nb) AS DOUBLE), 6) AS wasserstein
       FROM w"""

  /** kMeans replay (shared CTE prefix) + the exact-rational CH and
    * quantized DB tails, mirroring
    * [[graft.operators.Similarity.clusterQuality]]. */
  private val clusterQualityOracle: String = {
    val upTo = kMeansOracle.substring(0, kMeansOracle.indexOf(",\n       fin AS"))
    upTo + """,
       fin AS (SELECT p.user_id, p.f0, p.f1, c.cl,
                 (p.f0 - c.c0) * (p.f0 - c.c0) + (p.f1 - c.c1) * (p.f1 - c.c1) AS d,
                 ROW_NUMBER() OVER (PARTITION BY p.user_id ORDER BY
                   (p.f0 - c.c0) * (p.f0 - c.c0) + (p.f1 - c.c1) * (p.f1 - c.c1), c.cl) AS rn
               FROM pts p, c3 c),
       asg AS (SELECT cl, f0, f1, d FROM fin WHERE rn = 1),
       per AS (SELECT cl, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(d) AS BIGINT) AS w,
                 CAST(SUM(CAST(FLOOR(SQRT(CAST(d AS DOUBLE)) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sq
               FROM asg GROUP BY 1),
       gl AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(f0) AS DECIMAL(38,0)) AS sx,
                       CAST(SUM(f1) AS DECIMAL(38,0)) AS sy FROM asg),
       bagg AS (SELECT MAX(g.n) AS nn, CAST(COUNT(*) AS BIGINT) AS k,
                  CAST(SUM(p.w) AS DECIMAL(38,0)) AS wss,
                  CAST(SUM(CAST(p.n AS DECIMAL(38,0)) *
                    ((CAST(g.n AS DECIMAL(38,0)) * CAST(c.c0 AS DECIMAL(38,0)) - g.sx)
                     * (CAST(g.n AS DECIMAL(38,0)) * CAST(c.c0 AS DECIMAL(38,0)) - g.sx)
                   + (CAST(g.n AS DECIMAL(38,0)) * CAST(c.c1 AS DECIMAL(38,0)) - g.sy)
                     * (CAST(g.n AS DECIMAL(38,0)) * CAST(c.c1 AS DECIMAL(38,0)) - g.sy))) AS DECIMAL(38,0)) AS n2b
                FROM per p JOIN c3 c ON p.cl = c.cl, gl g),
       prs AS (SELECT p1.cl,
                 (CAST(p1.sq AS DOUBLE) / CAST(p1.n AS DOUBLE) / 1e6
                + CAST(p2.sq AS DOUBLE) / CAST(p2.n AS DOUBLE) / 1e6)
                / SQRT(CAST((c1.c0 - c2.c0) * (c1.c0 - c2.c0)
                          + (c1.c1 - c2.c1) * (c1.c1 - c2.c1) AS DOUBLE)) AS ratio
               FROM per p1 JOIN c3 c1 ON p1.cl = c1.cl
                    JOIN per p2 ON p2.cl <> p1.cl JOIN c3 c2 ON p2.cl = c2.cl
               WHERE (c1.c0 - c2.c0) * (c1.c0 - c2.c0)
                   + (c1.c1 - c2.c1) * (c1.c1 - c2.c1) > 0),
       dbv AS (SELECT CAST(SUM(mq) AS BIGINT) AS mqs, CAST(COUNT(*) AS BIGINT) AS kk
               FROM (SELECT cl, CAST(FLOOR(MAX(ratio) * 1e9 + 0.5) AS BIGINT) AS mq
                     FROM prs GROUP BY 1))
       SELECT b.nn AS n, b.k AS k, CAST(b.wss AS BIGINT) AS w_ss,
         ROUND(CAST(b.n2b * (CAST(b.nn AS DECIMAL(38,0)) - CAST(b.k AS DECIMAL(38,0))) AS DOUBLE) /
               CAST(CAST(b.nn AS DECIMAL(38,0)) * CAST(b.nn AS DECIMAL(38,0)) * b.wss
                    * (CAST(b.k AS DECIMAL(38,0)) - 1) AS DOUBLE), 6) AS calinski_harabasz,
         ROUND(CAST(d.mqs AS DOUBLE) / 1e9 / CAST(d.kk AS DOUBLE), 6) AS davies_bouldin
       FROM bagg b, dbv d"""
  }

  /** 3 chained IRLS sweeps — quantized Huber weights, exact DECIMAL
    * weighted sums, grid re-quantization; mirrors
    * [[graft.operators.Sketches.huberLocation]]. */
  private val huberOracle: String = {
    val sweeps = (1 to 3).map { i =>
      s""",
         m$i AS (SELECT g, CAST(FLOOR(CAST(SUM(CAST(wq AS HUGEINT) * v) AS DOUBLE)
                    / CAST(SUM(wq) AS DOUBLE) + 0.5) AS BIGINT) AS m
                 FROM (SELECT e.g, e.v,
                         CAST(FLOOR((CASE WHEN CAST(ABS(e.v - m.m) AS DOUBLE) <= 10000.0
                                     THEN 1.0
                                     ELSE 10000.0 / CAST(ABS(e.v - m.m) AS DOUBLE) END)
                              * 1e9 + 0.5) AS BIGINT) AS wq
                       FROM e JOIN m${i - 1} m ON e.g = m.g)
                 GROUP BY g)"""
    }.mkString
    s"""WITH e AS (SELECT event_type AS g,
           CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events),
       m0 AS (SELECT g, CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS m
              FROM e GROUP BY 1)$sweeps,
       st AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(FLOOR(CAST(SUM(v) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS plain_mean
              FROM e GROUP BY 1)
       SELECT st.g AS event_type, n, plain_mean, m3.m AS huber_mean
       FROM st JOIN m3 ON st.g = m3.g ORDER BY event_type"""
  }


  /** 3 chained Weiszfeld sweeps — quantized 1/d weights, exact DECIMAL
    * coordinate sums, grid re-quantization; mirrors
    * [[graft.operators.Spatial.geometricMedian]]. */
  private val geoMedianOracle: String = {
    val sweeps = (1 to 3).map { i =>
      s""",
         w$i AS (SELECT p.g, p.x, p.y, m.mx, m.my,
                   CASE WHEN SQRT(CAST((p.x - m.mx) * (p.x - m.mx)
                          + (p.y - m.my) * (p.y - m.my) AS DOUBLE)) > 0
                        THEN CAST(FLOOR(1e9 / SQRT(CAST((p.x - m.mx) * (p.x - m.mx)
                          + (p.y - m.my) * (p.y - m.my) AS DOUBLE)) + 0.5) AS BIGINT)
                        ELSE 0 END AS wq
                 FROM pts p JOIN m${i - 1} m ON p.g = m.g),
         m$i AS (SELECT g,
                   CASE WHEN SUM(wq) > 0
                        THEN CAST(FLOOR(CAST(SUM(CAST(wq AS HUGEINT) * x) AS DOUBLE)
                             / CAST(SUM(wq) AS DOUBLE) + 0.5) AS BIGINT)
                        ELSE MAX(mx) END AS mx,
                   CASE WHEN SUM(wq) > 0
                        THEN CAST(FLOOR(CAST(SUM(CAST(wq AS HUGEINT) * y) AS DOUBLE)
                             / CAST(SUM(wq) AS DOUBLE) + 0.5) AS BIGINT)
                        ELSE MAX(my) END AS my
                 FROM w$i GROUP BY g)"""
    }.mkString
    s"""WITH pts AS (SELECT c_mktsegment AS g,
           CAST(c_custkey AS BIGINT) * 7919 % 12000 - 6000 AS x,
           CAST(c_custkey AS BIGINT) * 104729 % 36000 - 18000 AS y
         FROM customer),
       m0 AS (SELECT g,
                CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS mx,
                CAST(FLOOR(CAST(SUM(y) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS my
              FROM pts GROUP BY 1)$sweeps,
       st AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(FLOOR(CAST(SUM(x) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS centroid_x,
                CAST(FLOOR(CAST(SUM(y) AS DOUBLE) / COUNT(*) + 0.5) AS BIGINT) AS centroid_y
              FROM pts GROUP BY 1)
       SELECT st.g AS c_mktsegment, n, centroid_x, centroid_y,
         m3.mx AS median_x, m3.my AS median_y
       FROM st JOIN m3 ON st.g = m3.g ORDER BY c_mktsegment"""
  }

  /** DuckDB oracles. Omitted only where no SQL twin exists — each such
    * query gets a rows-only check plus pinned ScalaTest specs:
    *  - q_dedup_minhash_bands, q_dedup_simhash, q_fingerprint: outputs ARE
    *    engine-specific 64-bit hashes (xxhash64 band keys / SimHash /
    *    rolling-hash winnowing prints) with no DuckDB equivalent function.
    *    (q_fingerprint_overlap runs on the portable md5 winnowing twin and
    *    IS hash-gated below.)
    *  - q_ann_ivf, q_ann_lsh: recall < 1 by design (probe/bucket subsets),
    *    so no closed-form SQL set; brute-force agreement is spec-pinned.
    *  - (The sketch gates — q_approx_distinct, q_approx_quantiles,
    *    q_sketch_cube, q_overlap_estimate, q_rolling_distinct(+_stream),
    *    q_quantile_cube(+_stream) — run in provably exact regimes and
    *    carry full SQL oracles below; production parameter defaults stay
    *    approximate with spec-pinned bounds.)
    *  - q_bpe: iterative trainer (argmax per merge round); SQL cannot
    *    express the loop. Sennrich-corpus vectors are spec-pinned.
    *  - q_deterministic_id_uuid5: RFC 4122 v5 needs sha1, which this
    *    DuckDB build lacks; RFC vectors are spec-pinned.
    *  - q_token_set_ratio: rapidfuzz InDel ratio needs LCS, which DuckDB
    *    has no function for (levenshtein substitutes cost 1, not 2). */
  def oracleSql: Map[String, String] = Map(
    // Exact-regime sketch gates: each query's sketch parameters are sized so
    // the estimate provably equals the exact answer at the gate scale
    // factors (coupon-set HLL / uncompacted KLL), so plain set SQL oracles
    // apply — the q_cms_counts / q_theta_setops recipe.
    "q_approx_distinct" ->
      """SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS approx_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS exact_distinct
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_sketch_cube" ->
      """SELECT event_type,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS approx_distinct,
           CAST(COUNT(*) AS BIGINT) AS n_rows
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_overlap_estimate" ->
      """WITH a AS (SELECT CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS da FROM orders),
              b AS (SELECT CAST(COUNT(DISTINCT c_custkey) AS BIGINT) AS db FROM customer),
              u AS (SELECT CAST(COUNT(*) AS BIGINT) AS du FROM
                      (SELECT o_custkey AS k FROM orders UNION SELECT c_custkey FROM customer))
         SELECT a.da AS distinct_a, b.db AS distinct_b, u.du AS distinct_union,
                CAST(GREATEST(a.da + b.db - u.du, 0) AS BIGINT) AS distinct_overlap
         FROM a, b, u""",
    "q_rolling_distinct" ->
      """WITH days AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM events GROUP BY 1, 2)
         SELECT d.event_type, d.day, d.n_rows,
           CAST((SELECT COUNT(DISTINCT e.user_id) FROM events e
                 WHERE e.event_type = d.event_type
                   AND CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day) AS BIGINT)
             AS approx_distinct_rolling
         FROM days d ORDER BY d.event_type, d.day""",
    "q_rolling_distinct_stream" ->
      """WITH days AS (
           SELECT event_type, CAST(ts AS DATE) AS day, CAST(COUNT(*) AS BIGINT) AS n_rows
           FROM events GROUP BY 1, 2)
         SELECT d.event_type, d.day, d.n_rows,
           CAST((SELECT COUNT(DISTINCT e.user_id) FROM events e
                 WHERE e.event_type = d.event_type
                   AND CAST(e.ts AS DATE) BETWEEN d.day - 6 AND d.day) AS BIGINT)
             AS approx_distinct_rolling
         FROM days d ORDER BY d.event_type, d.day""",
    "q_quantile_cube" ->
      """WITH ranked AS (
           SELECT event_type, value,
                  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                  COUNT(*) OVER (PARTITION BY event_type) AS n
           FROM events),
         probs AS (SELECT * FROM (VALUES (0, 0.25), (1, 0.5), (2, 0.75), (3, 0.95)) AS t(q_idx, p))
         SELECT r.event_type, CAST(r.n AS BIGINT) AS n_rows, p.q_idx, r.value AS estimate
         FROM ranked r JOIN probs p ON r.rn = CAST(CEIL(p.p * r.n) AS BIGINT)
         ORDER BY r.event_type, p.q_idx""",
    "q_approx_quantiles" ->
      """WITH ranked AS (
           SELECT l_returnflag, l_quantity,
                  ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY l_quantity) AS rn,
                  COUNT(*) OVER (PARTITION BY l_returnflag) AS n
           FROM lineitem),
         probs AS (SELECT * FROM (VALUES (0, 0.25), (1, 0.5), (2, 0.75)) AS t(p_idx, p))
         SELECT r.l_returnflag, p.p_idx, r.l_quantity AS q_value
         FROM ranked r JOIN probs p ON r.rn = CAST(CEIL(p.p * r.n) AS BIGINT)
         ORDER BY r.l_returnflag, p.p_idx""",
    "q_quantile_cube_stream" ->
      """WITH ranked AS (
           SELECT event_type, value,
                  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value) AS rn,
                  COUNT(*) OVER (PARTITION BY event_type) AS n
           FROM events),
         probs AS (SELECT * FROM (VALUES (0, 0.25), (1, 0.5), (2, 0.75), (3, 0.95)) AS t(q_idx, p))
         SELECT r.event_type, CAST(r.n AS BIGINT) AS n_rows, p.q_idx, r.value AS estimate
         FROM ranked r JOIN probs p ON r.rn = CAST(CEIL(p.p * r.n) AS BIGINT)
         ORDER BY r.event_type, p.q_idx""",
    "q1_agg" ->
      """SELECT l_returnflag, CAST(SUM(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_filter_project" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(ROUND(CAST(l_extendedprice AS DECIMAL(18,2)) * CAST(1.0 - l_discount AS DECIMAL(8,4)), 2) AS DOUBLE) AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1995-01-01' AND l_discount BETWEEN 0.03 AND 0.07
         ORDER BY l_orderkey, l_linenumber, revenue""",
    "q_dim_join" ->
      """SELECT r_name, n_name, COUNT(*) AS n_customers,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS sum_acctbal
         FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name, n_name ORDER BY r_name, n_name""",
    "q_hierarchy_flatten" ->
      """WITH facts AS (
           SELECT c_custkey,
                  'R' || r_regionkey || '/N' || n_nationkey || '/C' || c_custkey AS path
           FROM customer JOIN nation ON c_nationkey = n_nationkey JOIN region ON n_regionkey = r_regionkey),
         dim AS (
           SELECT 'R' || r_regionkey AS id, r_name AS name FROM region
           UNION ALL
           SELECT 'N' || n_nationkey AS id, n_name AS name FROM nation)
         SELECT f.c_custkey, d1.name AS region_name, d2.name AS nation_name
         FROM facts f
         LEFT JOIN dim d1 ON split_part(f.path, '/', 1) = d1.id
         LEFT JOIN dim d2 ON split_part(f.path, '/', 2) = d2.id
         ORDER BY f.c_custkey""",
    "q_diagonal_union" ->
      """SELECT o_orderkey AS id, 'orders' AS src, o_totalprice AS amount, CAST(NULL AS DOUBLE) AS qty
         FROM orders
         UNION ALL
         SELECT l_orderkey * 10 + l_linenumber, 'lineitem', CAST(NULL AS DOUBLE), l_quantity
         FROM lineitem
         ORDER BY src, id""",
    "q_salted_agg" ->
      """SELECT o_orderpriority,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                COUNT(*) AS n
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_conditional_agg" ->
      """SELECT l_returnflag, l_linestatus,
                CAST(SUM(CAST(NULLIF(l_tax, 0.0) AS DECIMAL(18,4))) AS DOUBLE) AS sum_tax,
                COUNT(*) AS n
         FROM lineitem GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus""",
    "q_pivot" ->
      """SELECT l_linestatus,
                CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_A,
                CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_N,
                CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_R
         FROM lineitem GROUP BY l_linestatus ORDER BY l_linestatus""",
    "q_unpivot" ->
      """WITH pivoted AS (
           SELECT l_linestatus,
                  CAST(SUM(CASE WHEN l_returnflag = 'A' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_A,
                  CAST(SUM(CASE WHEN l_returnflag = 'N' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_N,
                  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_R
           FROM lineitem GROUP BY l_linestatus)
         SELECT l_linestatus, rf AS returnflag, qty FROM (
           SELECT l_linestatus, 'qty_A' AS rf, qty_A AS qty FROM pivoted
           UNION ALL SELECT l_linestatus, 'qty_N', qty_N FROM pivoted
           UNION ALL SELECT l_linestatus, 'qty_R', qty_R FROM pivoted)
         ORDER BY l_linestatus, returnflag""",
    "q_period_fanout" ->
      """SELECT n_nationkey, '2024' || s.sfx AS period
         FROM nation CROSS JOIN (VALUES ('03'), ('06'), ('09'), ('12')) s(sfx)
         ORDER BY n_nationkey, period""",
    "q_semi_anti" ->
      """SELECT c_mktsegment, 'with_orders' AS status, COUNT(*) AS n
         FROM customer WHERE c_custkey IN (SELECT o_custkey FROM orders)
         GROUP BY c_mktsegment
         UNION ALL
         SELECT c_mktsegment, 'without_orders' AS status, COUNT(*) AS n
         FROM customer WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
         GROUP BY c_mktsegment
         ORDER BY status, c_mktsegment""",
    "q_window_rank" ->
      """SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rnk
           FROM orders)
         WHERE rnk <= 3 ORDER BY o_orderpriority, rnk""",
    "q_topk_native" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice FROM (
           SELECT o_orderpriority, o_orderkey, o_totalprice,
                  ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice DESC, o_orderkey) AS rn
           FROM orders)
         WHERE rn <= 3 ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""",
    "q_rollup" ->
      """SELECT n_name, COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
         GROUP BY ROLLUP(n_name) ORDER BY n_name NULLS FIRST""",
    "q_normalize_text" ->
      """SELECT p_partkey,
                lower(replace(replace(trim(regexp_replace(strip_accents(p_name), '[^a-zA-Z0-9_ -]', '', 'g')), 'public', ''), '-', ' ')) AS norm_name
         FROM part ORDER BY p_partkey""",
    "q_multi_replace" ->
      """SELECT doc_id, replace(replace(text, 'scan', 'SCAN'), 'join', 'JOIN') AS t
         FROM documents ORDER BY doc_id""",
    "q_deterministic_id" ->
      """SELECT c_custkey, md5(lower(trim(c_name))) AS cid FROM customer ORDER BY c_custkey""",
    "q_period_parse" ->
      """SELECT DISTINCT strftime(o_orderdate, '%Y%m') AS period,
                CAST(strptime(strftime(o_orderdate, '%Y%m') || '01', '%Y%m%d') AS DATE) AS period_date
         FROM orders ORDER BY period""",
    "q_age_sex_standardize" ->
      """WITH labeled AS (
           SELECT c_custkey,
                  (CASE WHEN c_custkey % 2 = 0 THEN 'Féminin' ELSE 'Masculin' END) || ', ' ||
                  (CASE WHEN c_acctbal < 5000.0 THEN '<15 ans' ELSE '15 ans et plus' END) AS label
           FROM customer)
         SELECT c_custkey, label,
                CASE WHEN label LIKE '%Féminin, <15%' THEN 'F_<15 ans'
                     WHEN label LIKE '%Féminin, 15%' THEN 'F_>15 ans'
                     WHEN label LIKE '%Masculin, <15%' THEN 'M_<15 ans'
                     WHEN label LIKE '%Masculin, 15%' THEN 'M_>15 ans'
                     ELSE 'nosex_noage' END AS std
         FROM labeled ORDER BY c_custkey""",
    "q_type_hygiene" ->
      """SELECT l_orderkey, l_linenumber,
                CAST(ROUND(l_quantity, 0) AS BIGINT) AS l_quantity,
                CAST(ROUND(l_extendedprice, 0) AS BIGINT) AS l_extendedprice,
                CAST(NULL AS DOUBLE) AS missing_metric
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_extendedprice""",
    "q_rules_flag" ->
      """SELECT l_orderkey, l_linenumber,
                CASE WHEN l_discount > 0.06 THEN 'RED'
                     WHEN l_tax >= 0.07 THEN 'ORANGE'
                     WHEN l_quantity > 45.0 THEN 'YELLOW' END AS rule_flag
         FROM lineitem
         WHERE (CASE WHEN l_discount > 0.06 THEN 'RED'
                     WHEN l_tax >= 0.07 THEN 'ORANGE'
                     WHEN l_quantity > 45.0 THEN 'YELLOW' END) IS NOT NULL
         ORDER BY l_orderkey, l_linenumber, rule_flag""",
    "q_rules_split" ->
      """SELECT CASE WHEN l_discount > 0.06 OR l_tax >= 0.07 OR l_quantity > 45.0
                     THEN 'inconsistent' ELSE 'consistent' END AS part,
                COUNT(*) AS n
         FROM lineitem GROUP BY 1 ORDER BY part""",
    // hand-spelled twin of the compiled letter formulas ((E+F)>1200, C>D,
    // E>=900, B*C>25000 against the A..F column order) — this gates the
    // COMPILER's output, so the SQL states the intended semantics directly
    "q_rules_formula" ->
      """WITH li AS (SELECT
           CAST(l_linenumber AS BIGINT) AS lineno,
           CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT) AS qty100,
           CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS price_c,
           CAST(FLOOR(l_discount * 10000 + 0.5) AS BIGINT) AS disc_bp,
           CAST(FLOOR(l_tax * 10000 + 0.5) AS BIGINT) AS tax_bp
         FROM lineitem),
         f AS (SELECT CASE WHEN (disc_bp + tax_bp) > 1200 THEN 'fee_overload'
                           WHEN qty100 > price_c THEN 'price_below_qty'
                           WHEN disc_bp >= 900 THEN 'deep_discount'
                           WHEN lineno * qty100 > 25000 THEN 'bulky_tail_line' END AS rule_flag
               FROM li)
         SELECT rule_flag, CAST(COUNT(*) AS BIGINT) AS n FROM f GROUP BY 1
         ORDER BY rule_flag NULLS FIRST""",
    "q_rules_matrix_export" ->
      """WITH v AS (
           SELECT l_orderkey, l_linenumber, l_quantity, l_discount,
                  CASE WHEN l_quantity >= 45 THEN 'FFFF0000'
                       WHEN l_quantity >= 30 THEN 'FFFFFF00' END AS qcol,
                  CASE WHEN l_discount >= 0.08 THEN 'FF00B050' END AS dcol
           FROM lineitem WHERE l_orderkey < 2000),
         f AS (
           SELECT qcol, dcol,
                  ROW_NUMBER() OVER (ORDER BY l_orderkey, l_linenumber, l_quantity, l_discount) AS rn
           FROM v WHERE qcol IS NOT NULL OR dcol IS NOT NULL)
         SELECT row_idx, col_idx, color FROM (
           SELECT CAST(rn AS BIGINT) AS row_idx, CAST(2 AS BIGINT) AS col_idx, qcol AS color
           FROM f WHERE qcol IS NOT NULL
           UNION ALL
           SELECT CAST(rn AS BIGINT), CAST(3 AS BIGINT), dcol FROM f WHERE dcol IS NOT NULL)
         ORDER BY row_idx, col_idx""",
    "q_quality_checks" ->
      """SELECT check_name, target, ROUND(metric, 6) AS metric, passed FROM (
           SELECT 'complete' AS check_name, 'o_custkey' AS target,
                  AVG(CASE WHEN o_custkey IS NULL THEN 0.0 ELSE 1.0 END) AS metric,
                  AVG(CASE WHEN o_custkey IS NULL THEN 0.0 ELSE 1.0 END) >= 1.0 AS passed
           FROM orders
           UNION ALL
           SELECT 'min_at_least', 'o_totalprice', MIN(o_totalprice),
                  MIN(o_totalprice) >= 500.0 FROM orders
           UNION ALL
           SELECT 'max_at_most', 'o_totalprice', MAX(o_totalprice),
                  MAX(o_totalprice) <= 400000.0 FROM orders
           UNION ALL
           SELECT 'in_set', 'o_orderstatus',
                  AVG(CASE WHEN o_orderstatus IN ('O','F') THEN 1.0 ELSE 0.0 END),
                  AVG(CASE WHEN o_orderstatus IN ('O','F') THEN 1.0 ELSE 0.0 END) >= 0.9
           FROM orders
           UNION ALL
           SELECT 'matches_regex', 'o_orderpriority',
                  AVG(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1.0 ELSE 0.0 END),
                  AVG(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1.0 ELSE 0.0 END) >= 1.0
           FROM orders
           UNION ALL
           SELECT 'row_count_between', '*', CAST(COUNT(*) AS DOUBLE),
                  COUNT(*) BETWEEN 1000 AND 10000000 FROM orders
           UNION ALL
           SELECT 'unique', 'o_orderkey',
                  SUM(CASE WHEN __n = 1 THEN 1.0 ELSE 0.0 END) / SUM(CAST(__n AS DOUBLE)),
                  SUM(CASE WHEN __n = 1 THEN 1.0 ELSE 0.0 END) / SUM(CAST(__n AS DOUBLE)) >= 1.0
           FROM (SELECT COUNT(*) AS __n FROM orders GROUP BY o_orderkey)
           UNION ALL
           SELECT 'fk_contained', 'o_custkey',
                  AVG(CASE WHEN p.c_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END),
                  AVG(CASE WHEN p.c_custkey IS NOT NULL THEN 1.0 ELSE 0.0 END) >= 1.0
           FROM orders LEFT JOIN (SELECT DISTINCT c_custkey FROM customer) p
             ON o_custkey = p.c_custkey
         ) ORDER BY check_name, target""",
    "q_quality_checks_stream" ->
      """SELECT check_name, target, ROUND(metric, 6) AS metric, passed FROM (
           SELECT 'complete' AS check_name, 'o_custkey' AS target,
                  AVG(CASE WHEN o_custkey IS NULL THEN 0.0 ELSE 1.0 END) AS metric,
                  AVG(CASE WHEN o_custkey IS NULL THEN 0.0 ELSE 1.0 END) >= 1.0 AS passed
           FROM orders
           UNION ALL
           SELECT 'min_at_least', 'o_totalprice', MIN(o_totalprice),
                  MIN(o_totalprice) >= 500.0 FROM orders
           UNION ALL
           SELECT 'max_at_most', 'o_totalprice', MAX(o_totalprice),
                  MAX(o_totalprice) <= 400000.0 FROM orders
           UNION ALL
           SELECT 'in_set', 'o_orderstatus',
                  AVG(CASE WHEN o_orderstatus IN ('O','F') THEN 1.0 ELSE 0.0 END),
                  AVG(CASE WHEN o_orderstatus IN ('O','F') THEN 1.0 ELSE 0.0 END) >= 0.9
           FROM orders
           UNION ALL
           SELECT 'matches_regex', 'o_orderpriority',
                  AVG(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1.0 ELSE 0.0 END),
                  AVG(CASE WHEN regexp_matches(o_orderpriority, '^[1-5]-') THEN 1.0 ELSE 0.0 END) >= 1.0
           FROM orders
           UNION ALL
           SELECT 'row_count_between', '*', CAST(COUNT(*) AS DOUBLE),
                  COUNT(*) BETWEEN 1000 AND 10000000 FROM orders
         ) ORDER BY check_name, target""",
    "q_fuzzy_match" ->
      """WITH scored AS (
           SELECT c_custkey, n_name,
                  1.0 - CAST(levenshtein(c_name, n_name) AS DOUBLE) / CAST(greatest(length(c_name), length(n_name)) AS DOUBLE) AS s
           FROM customer CROSS JOIN nation),
         ranked AS (
           SELECT c_custkey, n_name, s,
                  ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY s DESC, n_name) AS rn
           FROM scored)
         SELECT c_custkey, n_name AS matched, ROUND(s, 6) AS match_score
         FROM ranked WHERE rn = 1 ORDER BY c_custkey""",
    "q_jaro_winkler" ->
      """WITH scored AS (
           SELECT s_suppkey, n_name,
                  jaro_winkler_similarity(s_name, n_name) AS s
           FROM supplier CROSS JOIN nation),
         ranked AS (
           SELECT s_suppkey, n_name, s,
                  ROW_NUMBER() OVER (PARTITION BY s_suppkey ORDER BY s DESC, n_name) AS rn
           FROM scored)
         SELECT s_suppkey, n_name AS matched, ROUND(s, 6) AS match_score
         FROM ranked WHERE rn = 1 ORDER BY s_suppkey""",
    "q_edit_join" ->
      """SELECT s1.s_suppkey AS left_id, s2.s_suppkey AS right_id,
                CAST(levenshtein(s1.s_name, s2.s_name) AS BIGINT) AS dist
         FROM supplier s1 JOIN supplier s2 ON s1.s_suppkey < s2.s_suppkey
         WHERE levenshtein(s1.s_name, s2.s_name) <= 1
         ORDER BY left_id, right_id""",
    // lookaround-free candidate regex (RE2 has none); Luhn as integer
    // list arithmetic — list_filter/list_transform mirror Catalyst's
    // filter/transform/aggregate; regexp_replace needs the 'g' flag here
    // (Spark's replaces all matches by default)
    "q_detect_pan" ->
      """WITH t0 AS (SELECT doc_id,
                CASE WHEN doc_id % 41 = 0
                     THEN text || ' card 4539 1488 0343 6467 ok'
                     ELSE text END AS t
              FROM documents),
         base AS (SELECT doc_id,
                CASE WHEN doc_id % 67 = 0 THEN t || ' ref 1234 5678 9012 3456 x'
                     ELSE t END AS text
              FROM t0),
         c AS (SELECT doc_id,
                list_transform(regexp_extract_all(text, '[0-9](?:[ -]?[0-9]){12,18}'),
                               c -> regexp_replace(c, '[ -]', '', 'g')) AS ds
              FROM base)
         SELECT doc_id,
                CAST(LEN(ds) AS BIGINT) AS n_candidates,
                CAST(LEN(list_filter(ds, s ->
                  list_sum(list_transform(range(1, length(s) + 1),
                    i -> CASE WHEN i % 2 = 0 THEN
                           CASE WHEN ascii(substr(s, length(s) - CAST(i AS INTEGER) + 1, 1)) - 48 >= 5
                                THEN 2 * (ascii(substr(s, length(s) - CAST(i AS INTEGER) + 1, 1)) - 48) - 9
                                ELSE 2 * (ascii(substr(s, length(s) - CAST(i AS INTEGER) + 1, 1)) - 48) END
                         ELSE ascii(substr(s, length(s) - CAST(i AS INTEGER) + 1, 1)) - 48 END))
                  % 10 = 0)) AS BIGINT) AS n_luhn_valid,
                LEN(list_filter(ds, s ->
                  list_sum(list_transform(range(1, length(s) + 1),
                    i -> CASE WHEN i % 2 = 0 THEN
                           CASE WHEN ascii(substr(s, length(s) - CAST(i AS INTEGER) + 1, 1)) - 48 >= 5
                                THEN 2 * (ascii(substr(s, length(s) - CAST(i AS INTEGER) + 1, 1)) - 48) - 9
                                ELSE 2 * (ascii(substr(s, length(s) - CAST(i AS INTEGER) + 1, 1)) - 48) END
                         ELSE ascii(substr(s, length(s) - CAST(i AS INTEGER) + 1, 1)) - 48 END))
                  % 10 = 0)) > 0 AS has_pan
         FROM c ORDER BY doc_id""",
    // identical \x{..} ASCII regex text on both engines (Java / RE2 agree
    // on BMP classes); injection built with chr() codepoints; flagged
    // compares the ROUNDED score exactly like the Spark side
    "q_encoding_anomalies" ->
      """WITH t0 AS (SELECT doc_id,
                CASE WHEN doc_id % 37 = 0
                     THEN text || ' caf' || chr(195) || chr(169) || ' ' || chr(65533)
                     ELSE text END AS t
              FROM documents),
         base AS (SELECT doc_id,
                CASE WHEN doc_id % 53 = 0 THEN t || chr(7) ELSE t END AS text
              FROM t0),
         c AS (SELECT doc_id,
                CAST(LENGTH(text) AS BIGINT) AS n_chars,
                CAST(LEN(regexp_extract_all(text, '\x{FFFD}')) AS BIGINT) AS n_replacement,
                CAST(LEN(regexp_extract_all(text, '[\x{00}-\x{08}\x{0B}\x{0C}\x{0E}-\x{1F}]')) AS BIGINT) AS n_control,
                CAST(LEN(regexp_extract_all(text, '[\x{80}-\x{9F}]')) AS BIGINT) AS n_c1,
                CAST(LEN(regexp_extract_all(text, '\x{C3}[\x{80}-\x{FF}]')) AS BIGINT) AS n_mojibake
              FROM base),
         sc AS (SELECT *,
                CASE WHEN n_chars > 0 THEN
                  ROUND(CAST(n_replacement + n_control + n_c1 + n_mojibake AS DOUBLE)
                        / CAST(n_chars AS DOUBLE), 9)
                ELSE 0.0 END AS anomaly_score
              FROM c)
         SELECT doc_id, n_chars, n_replacement, n_control, n_c1, n_mojibake,
                anomaly_score, anomaly_score > 0.001 AS flagged
         FROM sc ORDER BY doc_id""",
    // same synthesized URLs; the canonicalization chain with \1 capture
    // syntax (RE2) where Spark uses $1 — same semantics
    "q_canonicalize_urls" ->
      """WITH u AS (SELECT doc_id,
                CASE WHEN doc_id % 3 = 0
                     THEN 'HTTPS://News.Site' || CAST(doc_id % 7 AS VARCHAR) ||
                          '.COM:443/a/' || CAST(doc_id AS VARCHAR) ||
                          '?utm_source=feed&id=' || CAST(doc_id AS VARCHAR) || '#top'
                     WHEN doc_id % 3 = 1
                     THEN 'http://Blog.example' || CAST(doc_id % 5 AS VARCHAR) ||
                          '.org:80/p?fbclid=x' || CAST(doc_id AS VARCHAR) || '&q=1'
                     ELSE 'https://cdn.mirror.net/obj/' || CAST(doc_id AS VARCHAR)
                END AS url
              FROM documents),
         nf AS (SELECT doc_id, regexp_replace(url, '#[^#]*$', '', 'g') AS v FROM u),
         lo AS (SELECT doc_id,
                       lower(regexp_extract(v, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) ||
                         substr(v, length(regexp_extract(v, '^[A-Za-z][A-Za-z0-9+.-]*://[^/?#]*', 0)) + 1) AS v
                FROM nf),
         np AS (SELECT doc_id,
                       regexp_replace(
                         regexp_replace(v, '^(http://[^/:?#]+):80([/?#]|$)', '\1\2'),
                         '^(https://[^/:?#]+):443([/?#]|$)', '\1\2') AS v
                FROM lo),
         nt AS (SELECT doc_id,
                       regexp_replace(v, '([?&])(utm_[A-Za-z]+|gclid|fbclid)=[^&#]*', '\1', 'g') AS v
                FROM np),
         cn AS (SELECT doc_id,
                       regexp_replace(regexp_replace(regexp_replace(v, '&&+', '&', 'g'),
                         '\?&+', '?', 'g'), '[?&]+$', '', 'g') AS url_canonical
                FROM nt)
         SELECT doc_id, url_canonical,
                regexp_extract(url_canonical, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1) AS host,
                regexp_extract(regexp_extract(url_canonical, '^[a-z][a-z0-9+.-]*://([^/:?#]+)', 1),
                               '([^.]+\.[^.]+)$', 1) AS domain
         FROM cn ORDER BY doc_id""",
    // identical RE2-portable regex chain ((?is), non-greedy, \x{..}
    // whitespace class), entity decode with &amp; LAST; 'g' flags
    "q_strip_markup" ->
      """WITH base AS (SELECT doc_id,
                CASE WHEN doc_id % 29 = 0
                     THEN '<div class="post"><h1>T</h1><p>' || text ||
                          '</p><script>var a=1;</script><!-- c --> &amp; &lt;tail&gt;</div>'
                     ELSE text END AS text
              FROM documents),
         c2 AS (SELECT doc_id, text,
                TRIM(regexp_replace(
                  regexp_replace(
                    regexp_replace(
                      regexp_replace(
                        regexp_replace(
                          regexp_replace(
                            regexp_replace(
                              regexp_replace(
                                regexp_replace(
                                  regexp_replace(text, '(?is)<script[^>]*>.*?</script>', ' ', 'g'),
                                  '(?is)<style[^>]*>.*?</style>', ' ', 'g'),
                                '(?s)<!--.*?-->', ' ', 'g'),
                              '<[^>]+>', ' ', 'g'),
                            '&lt;', '<', 'g'),
                          '&gt;', '>', 'g'),
                        '&quot;', '"', 'g'),
                      '&#39;', chr(39), 'g'),
                    '&amp;', '&', 'g'),
                  '[ \x{09}\x{0A}\x{0D}\x{0C}]+', ' ', 'g')) AS text_clean
              FROM base)
         SELECT doc_id, text_clean,
                CAST(LENGTH(text) AS BIGINT) AS n_chars_raw,
                CAST(LENGTH(text_clean) AS BIGINT) AS n_chars_clean,
                CASE WHEN LENGTH(text) > 0 THEN
                  ROUND(CAST(LENGTH(text) - LENGTH(text_clean) AS DOUBLE)
                        / CAST(LENGTH(text) AS DOUBLE), 9)
                ELSE 0.0 END AS markup_ratio
         FROM c2 ORDER BY doc_id""",
    // md5(id:seed) hash order; within-source 1-based rank, then the
    // interleaved global order (within, source, id); 0-based training_order
    "q_deterministic_shuffle" ->
      """WITH h AS (SELECT doc_id, source,
                md5(CAST(doc_id AS VARCHAR) || ':' || 'epoch1') AS hk
              FROM documents),
         w AS (SELECT doc_id, source, hk,
                      CAST(ROW_NUMBER() OVER (PARTITION BY source ORDER BY hk, doc_id) AS BIGINT)
                        AS within_source_rank
               FROM h)
         SELECT CAST(ROW_NUMBER() OVER (ORDER BY within_source_rank, source, doc_id) - 1 AS BIGINT)
                  AS training_order,
                doc_id, source, within_source_rank
         FROM w ORDER BY training_order""",
    // per-stratum welch moments -> sd chain -> 1e-6 weight quantization ->
    // the q_apportion Hamilton replay (0-based rank < deficit)
    "q_neyman_allocation" ->
      """WITH st AS (SELECT c_mktsegment,
                CAST(COUNT(*) AS BIGINT) AS n_pop,
                CAST(SUM(CAST(FLOOR(c_acctbal / 1000.0 * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s,
                CAST(SUM(CAST(FLOOR((c_acctbal / 1000.0) * (c_acctbal / 1000.0) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss
              FROM customer GROUP BY 1),
         sd AS (SELECT c_mktsegment, n_pop,
                       CASE WHEN n_pop > 1 THEN
                         SQRT(GREATEST((ss - s * s / CAST(n_pop AS DOUBLE)) / (CAST(n_pop AS DOUBLE) - 1.0), 0.0))
                       END AS sdv
                FROM st),
         wq0 AS (SELECT c_mktsegment, n_pop, sdv,
                       COALESCE(CAST(FLOOR(CAST(n_pop AS DOUBLE) * sdv * 1000000.0 + 0.5) AS BIGINT), 0) AS w0
                FROM sd),
         wq AS (SELECT c_mktsegment, n_pop, sdv,
                       CASE WHEN (SELECT SUM(w0) FROM wq0) > 0 THEN w0 ELSE n_pop END AS w
                FROM wq0),
         t AS (SELECT CAST(SUM(w) AS BIGINT) AS wt FROM wq),
         b AS (SELECT c_mktsegment, n_pop, sdv, w,
                      (w * 500) // wt AS q, (w * 500) % wt AS r
               FROM wq, t),
         d AS (SELECT CAST(500 - SUM(q) AS BIGINT) AS deficit FROM b),
         rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY r DESC, c_mktsegment) AS rnk FROM b)
         SELECT c_mktsegment, n_pop, ROUND(sdv, 6) AS sd,
                CAST(q + CASE WHEN rnk <= (SELECT deficit FROM d)
                              THEN 1 ELSE 0 END AS BIGINT) AS n_alloc
         FROM rk ORDER BY c_mktsegment""",
    // caliper-cell band join replay: exact long floor-division cells, one
    // collapsed control per distinct score (min id), argmin by (gap, cid)
    // — mirrors Models.propensityMatch; cq = floor(0.001*1e9+0.5) = 1000000
    "q_propensity_match" ->
      """WITH spend AS (SELECT o_custkey,
                CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
              FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01' GROUP BY 1),
         pop AS (SELECT c_custkey AS id,
                (('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':match'), 1, 8))::BIGINT % 100) < 50 AS tr,
                (c_acctbal + 1000.0) / 12000.0 AS score,
                CAST(COALESCE(cents, 0) AS DOUBLE) / 100000.0 AS y
              FROM customer LEFT JOIN spend ON c_custkey = o_custkey),
         base AS (SELECT id, tr,
                CAST(FLOOR(score * 1e9 + 0.5) AS BIGINT) AS sq,
                CAST(FLOOR(y * 1000000.0 + 0.5) AS BIGINT) AS yq
              FROM pop),
         ctl AS (SELECT sq AS csq, id AS cid, yq AS cyq,
                        (csq - (((csq % 1000000) + 1000000) % 1000000)) // 1000000 AS ccell
                 FROM (SELECT sq, id, yq,
                              ROW_NUMBER() OVER (PARTITION BY sq ORDER BY id, yq) AS rn
                       FROM base WHERE NOT tr)
                 WHERE rn = 1),
         tre AS (SELECT id, sq, yq,
                        (sq - (((sq % 1000000) + 1000000) % 1000000)) // 1000000 AS tcell
                 FROM base WHERE tr),
         cand AS (SELECT t.id, t.sq, t.yq, u.cnd
                  FROM tre t CROSS JOIN
                       unnest([t.tcell - 1, t.tcell, t.tcell + 1]) AS u(cnd)),
         j AS (SELECT c2.id, c2.sq, c2.yq, ctl.cid, ctl.csq, ctl.cyq,
                      ABS(c2.sq - ctl.csq) AS gap,
                      ROW_NUMBER() OVER (PARTITION BY c2.id
                                         ORDER BY ABS(c2.sq - ctl.csq), ctl.cid) AS rn
               FROM cand c2 JOIN ctl ON c2.cnd = ctl.ccell
               WHERE ABS(c2.sq - ctl.csq) <= 1000000)
         SELECT id AS treated_id, cid AS control_id,
                CAST(sq AS DOUBLE) / 1e9 AS score_t,
                CAST(csq AS DOUBLE) / 1e9 AS score_c,
                CAST(gap AS DOUBLE) / 1e9 AS score_gap,
                CAST(yq AS DOUBLE) / 1000000.0 AS y_treated,
                CAST(cyq AS DOUBLE) / 1000000.0 AS y_control
         FROM j WHERE rn = 1 ORDER BY treated_id""",
    // per-nation welch-quantized moments -> effect/se chains -> 1e-6
    // quantized inverse-variance sums, pooled second pass for Q — mirrors
    // qMetaAnalysis + Sketches.metaAnalysis exactly
    "q_meta_analysis" ->
      """WITH c AS (SELECT c_nationkey AS nat,
                (('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':meta'), 1, 8))::BIGINT % 100) < 50 AS tr,
                c_acctbal / 1000.0 AS v
              FROM customer),
         g AS (SELECT nat, tr, CAST(COUNT(*) AS DOUBLE) AS n,
                      CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s,
                      CAST(SUM(CAST(FLOOR(v * v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss
               FROM c GROUP BY 1, 2),
         w AS (SELECT nat,
                      MAX(CASE WHEN tr THEN n END) AS na,
                      MAX(CASE WHEN tr THEN s END) AS sa,
                      MAX(CASE WHEN tr THEN ss END) AS ssa,
                      MAX(CASE WHEN NOT tr THEN n END) AS nb,
                      MAX(CASE WHEN NOT tr THEN s END) AS sb,
                      MAX(CASE WHEN NOT tr THEN ss END) AS ssb
               FROM g GROUP BY 1),
         st AS (SELECT sa / na - sb / nb AS e,
                       SQRT(((ssa - sa * sa / na) / (na - 1)) / na
                            + ((ssb - sb * sb / nb) / (nb - 1)) / nb) AS se
                FROM w WHERE na > 1 AND nb > 1),
         valid AS (SELECT e, se FROM st WHERE se IS NOT NULL AND se > 0 AND e IS NOT NULL),
         f AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                      CAST(SUM(CAST(FLOOR(1.0 / (se * se) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS sw,
                      CAST(SUM(CAST(FLOOR(1.0 / (se * se) * e * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS swe
               FROM valid),
         p AS (SELECT k, sw, swe,
                      (CAST(swe AS DOUBLE) / 1000000.0) / (CAST(sw AS DOUBLE) / 1000000.0) AS pooled
               FROM f),
         q AS (SELECT CAST(SUM(CAST(FLOOR(1.0 / (se * se) * (e - p.pooled) * (e - p.pooled) * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS qq
               FROM valid CROSS JOIN p)
         SELECT k, ROUND(pooled, 6) AS pooled_effect,
                ROUND(SQRT(1.0 / (CAST(sw AS DOUBLE) / 1000000.0)), 6) AS pooled_se,
                CASE WHEN k > 1 THEN ROUND(CAST(qq AS DOUBLE) / 1000000.0, 6) END AS q_stat,
                CASE WHEN k > 1 THEN ROUND(GREATEST(0.0,
                  CASE WHEN CAST(qq AS DOUBLE) / 1000000.0 > 0
                       THEN (CAST(qq AS DOUBLE) / 1000000.0 - CAST(k - 1 AS DOUBLE))
                            / (CAST(qq AS DOUBLE) / 1000000.0)
                       ELSE 0.0 END), 6) END AS i2
         FROM p CROSS JOIN q""",
    // exact 0-based rank -> floor(rn*b/n) buckets (DuckDB / on integers is
    // float division like Spark's), long counts, cumulative window over the
    // 10 bounded bucket rows — mirrors Models.upliftDeciles exactly
    "q_uplift_deciles" ->
      """WITH conv AS (SELECT DISTINCT o_custkey FROM orders
                  WHERE o_orderdate >= TIMESTAMP '1997-01-01'),
         pop AS (SELECT c_custkey, c_acctbal,
                        (('0x' || substr(md5(CAST(c_custkey AS VARCHAR) || ':exp9'), 1, 8))::BIGINT % 100) < 50 AS tr,
                        conv.o_custkey IS NOT NULL AS y
                 FROM customer LEFT JOIN conv ON c_custkey = o_custkey),
         rk AS (SELECT tr, y,
                       CAST(ROW_NUMBER() OVER (ORDER BY c_acctbal DESC, c_custkey ASC) - 1 AS BIGINT) AS rn,
                       CAST(COUNT(*) OVER () AS BIGINT) AS n
                FROM pop),
         pb AS (SELECT CAST(FLOOR(rn * 10 / n) AS INTEGER) + 1 AS bucket,
                       CAST(SUM(CASE WHEN tr THEN 1 ELSE 0 END) AS BIGINT) AS n_t,
                       CAST(SUM(CASE WHEN NOT tr THEN 1 ELSE 0 END) AS BIGINT) AS n_c,
                       CAST(SUM(CASE WHEN tr AND y THEN 1 ELSE 0 END) AS BIGINT) AS conv_t,
                       CAST(SUM(CASE WHEN NOT tr AND y THEN 1 ELSE 0 END) AS BIGINT) AS conv_c
                FROM rk GROUP BY 1),
         cum AS (SELECT bucket, n_t, n_c, conv_t, conv_c,
                        CAST(SUM(n_t) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cnt,
                        CAST(SUM(n_c) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cnc,
                        CAST(SUM(conv_t) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cct,
                        CAST(SUM(conv_c) OVER (ORDER BY bucket ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS ccc
                 FROM pb)
         SELECT bucket, n_t, n_c, conv_t, conv_c,
                CASE WHEN n_t > 0 AND n_c > 0 THEN
                  ROUND(CAST(conv_t AS DOUBLE) / CAST(n_t AS DOUBLE)
                        - CAST(conv_c AS DOUBLE) / CAST(n_c AS DOUBLE), 6) END AS uplift,
                CASE WHEN cnc > 0 THEN
                  ROUND(CAST(cct AS DOUBLE)
                        - CAST(ccc AS DOUBLE) * CAST(cnt AS DOUBLE) / CAST(cnc AS DOUBLE), 6) END AS qini
         FROM cum ORDER BY bucket""",
    // the ab_test moment CTEs -> pooled-sd / bias-corrected chains
    "q_effect_size" -> effectSizeOracle,
    "q_effect_size_stream" -> effectSizeOracle,
    // tau^2 literal is the exact IEEE double 0.1*0.1 the Spark side
    // computes; reject compares the unrounded p like Sketches.msprt;
    // the streaming twin shares it verbatim (integer moment state)
    "q_msprt" -> msprtOracle,
    "q_msprt_stream" -> msprtOracle,
    // z literals are the published normal quantiles; 2.8015852181129683 is
    // the IEEE sum z_{.975}+z_{.8} computed identically on the Spark side,
    // and 0.0001 is exactly the double 0.01*0.01
    "q_ab_power" -> abPowerOracle,
    "q_ab_power_stream" -> abPowerOracle,
    "q_ab_test" ->
      """WITH g AS (
           SELECT o_orderstatus AS st,
                  CAST(COUNT(*) AS DOUBLE) AS n,
                  CAST(SUM(CAST(FLOOR(o_totalprice / 100000.0 * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s,
                  CAST(SUM(CAST(FLOOR((o_totalprice / 100000.0) * (o_totalprice / 100000.0) * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss
           FROM orders WHERE o_orderstatus IN ('O', 'F') GROUP BY 1),
         w AS (SELECT
           MAX(CASE WHEN st = 'O' THEN n END) AS na,
           MAX(CASE WHEN st = 'O' THEN s END) AS sa,
           MAX(CASE WHEN st = 'O' THEN ss END) AS ssa,
           MAX(CASE WHEN st = 'F' THEN n END) AS nb,
           MAX(CASE WHEN st = 'F' THEN s END) AS sb,
           MAX(CASE WHEN st = 'F' THEN ss END) AS ssb
           FROM g)
         SELECT CAST(na AS BIGINT) AS n_a, CAST(nb AS BIGINT) AS n_b,
                ROUND(sa / na, 6) AS mean_a, ROUND(sb / nb, 6) AS mean_b,
                ROUND((sa / na - sb / nb) /
                      SQRT(((ssa - sa * sa / na) / (na - 1)) / na + ((ssb - sb * sb / nb) / (nb - 1)) / nb), 6) AS t_stat,
                ROUND(POW(((ssa - sa * sa / na) / (na - 1)) / na + ((ssb - sb * sb / nb) / (nb - 1)) / nb, 2) /
                      (POW(((ssa - sa * sa / na) / (na - 1)) / na, 2) / (na - 1) +
                       POW(((ssb - sb * sb / nb) / (nb - 1)) / nb, 2) / (nb - 1)), 6) AS dof
         FROM w""",
    "q_transitions" ->
      """WITH pairs AS (
           SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS state,
                  event_type AS next_state
           FROM events),
         c AS (SELECT state, next_state, COUNT(*) AS n
               FROM pairs WHERE state IS NOT NULL GROUP BY 1, 2)
         SELECT state, next_state, n,
                ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY state), 6) AS p
         FROM c ORDER BY state, next_state""",
    "q_transitions_stream" ->
      """WITH pairs AS (
           SELECT LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS state,
                  event_type AS next_state
           FROM events),
         c AS (SELECT state, next_state, COUNT(*) AS n
               FROM pairs WHERE state IS NOT NULL GROUP BY 1, 2)
         SELECT state, next_state, n,
                ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY state), 6) AS p
         FROM c ORDER BY state, next_state""",
    "q_dedup_exact" ->
      """SELECT md5(lower(trim(text))) AS content_key, MIN(doc_id) AS keep_id, COUNT(*) AS dup_count
         FROM documents GROUP BY 1 ORDER BY keep_id""",
    "q_dedup_keep_first" ->
      """SELECT l_orderkey, l_linenumber, l_quantity FROM (
           SELECT l_orderkey, l_linenumber, l_quantity,
                  ROW_NUMBER() OVER (PARTITION BY l_orderkey ORDER BY l_linenumber, l_quantity) AS rn
           FROM lineitem)
         WHERE rn = 1 ORDER BY l_orderkey""",
    "q_dedup_jaccard" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in generate_series(1, len(t)-2)])
                  END AS s
           FROM toks),
         scored AS (
           SELECT q.doc_id AS query_id, c.doc_id AS doc_id,
                  CASE WHEN len(q.s) = 0 AND len(c.s) = 0 THEN 1.0
                       WHEN len(q.s) = 0 OR len(c.s) = 0 THEN 0.0
                       ELSE CAST(len(list_intersect(q.s, c.s)) AS DOUBLE)
                            / CAST(len(q.s) + len(c.s) - len(list_intersect(q.s, c.s)) AS DOUBLE)
                  END AS j
           FROM sh q JOIN sh c ON q.doc_id < 5 AND c.doc_id <> q.doc_id),
         ranked AS (
           SELECT query_id, doc_id, j,
                  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY j DESC, doc_id) AS rn
           FROM scored)
         SELECT query_id, doc_id, ROUND(j, 6) AS jaccard, rn AS rnk
         FROM ranked WHERE rn <= 3 ORDER BY query_id, rnk""",
    "q_cosine_topk" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
         scored AS (
           SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
           FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         ranked AS (
           SELECT query_id, vec_id, sim,
                  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
           FROM scored)
         SELECT query_id, vec_id, ROUND(sim, 6) AS sim, rn AS rnk
         FROM ranked WHERE rn <= 5 ORDER BY query_id, rnk""",
    // assignment replay + intra-cluster pair cosines + the farther-from-
    // centroid suppression rule, all in SQL
    "q_semdedup" ->
      """WITH c AS (
           SELECT i AS cid,
                  list_transform(generate_series(1, 64),
                                 j -> CAST((i + 1) * j % 7 - 3 AS DOUBLE) / 10.0) AS cv
           FROM generate_series(0, 3) t(i)),
         d AS (
           SELECT e.vec_id, c.cid,
                  ROUND(list_sum(list_transform(generate_series(1, 64),
                        j -> (CAST(e.embedding[j] AS DOUBLE) - c.cv[j]) *
                             (CAST(e.embedding[j] AS DOUBLE) - c.cv[j]))), 6) AS dist
           FROM embeddings e CROSS JOIN c),
         r AS (SELECT vec_id, cid, dist,
                      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
               FROM d),
         asg AS (SELECT vec_id, cid AS cluster, dist AS dist_sq FROM r WHERE rn = 1),
         e2 AS (SELECT a.vec_id, a.cluster, a.dist_sq, CAST(e.embedding AS DOUBLE[]) AS v
                FROM asg a JOIN embeddings e USING (vec_id)),
         drp AS (SELECT DISTINCT b.vec_id
                 FROM e2 a JOIN e2 b ON a.cluster = b.cluster AND a.vec_id <> b.vec_id
                 WHERE (a.dist_sq > b.dist_sq OR (a.dist_sq = b.dist_sq AND a.vec_id < b.vec_id))
                   AND ROUND(list_cosine_similarity(a.v, b.v), 6) >= 0.4)
         SELECT a.vec_id, CAST(a.cluster AS INT) AS cluster, a.dist_sq,
                (drp.vec_id IS NULL) AS kept
         FROM asg a LEFT JOIN drp ON a.vec_id = drp.vec_id
         ORDER BY a.vec_id""",
    // hashed unigram target/raw models, add-one smoothing, 1e-6-quantized
    // per-bucket log-ratios, per-doc exact long sums
    "q_dsir" ->
      """WITH rt AS (SELECT doc_id,
                ('0x' || substr(md5(unnest(regexp_extract_all(lower(text), '[a-z0-9]{2,}'))), 1, 8))::BIGINT % 256 AS b
              FROM documents),
         tt AS (SELECT ('0x' || substr(md5(unnest(regexp_extract_all(lower(text), '[a-z0-9]{2,}'))), 1, 8))::BIGINT % 256 AS b
                FROM documents WHERE lang = 'en'),
         tc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS tn FROM tt GROUP BY 1),
         rc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rn FROM rt GROUP BY 1),
         tot AS (SELECT (SELECT CAST(SUM(tn) AS BIGINT) FROM tc) AS ttot,
                        (SELECT CAST(SUM(rn) AS BIGINT) FROM rc) AS rtot),
         lr AS (SELECT COALESCE(rc.b, tc.b) AS b,
                  CAST(FLOOR(ln(CAST((COALESCE(tn, 0) + 1) * (rtot + 256) AS DOUBLE)
                              / CAST((COALESCE(rn, 0) + 1) * (ttot + 256) AS DOUBLE))
                       * 1e6 + 0.5) AS BIGINT) AS lrq
                FROM rc FULL OUTER JOIN tc ON rc.b = tc.b CROSS JOIN tot),
         df AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM rt GROUP BY 1, 2)
         SELECT df.doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                ROUND(CAST(SUM(c * lrq) AS DOUBLE) / 1e6, 6) AS score
         FROM df JOIN lr USING (b) GROUP BY 1 ORDER BY 1""",
    // first-occurrence aggregate + running sums + quantized-ln OLS moments
    "q_heaps" ->
      """WITH toks AS (SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '[a-z0-9]{1,}')) AS w
              FROM documents),
         pdt AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS nt FROM toks GROUP BY 1),
         pdn AS (SELECT fid AS doc_id, CAST(COUNT(*) AS BIGINT) AS nw
                 FROM (SELECT w, MIN(doc_id) AS fid FROM toks GROUP BY 1) GROUP BY 1),
         pd AS (SELECT p.doc_id, nt, COALESCE(nw, 0) AS nw
                FROM pdt p LEFT JOIN pdn USING (doc_id)),
         cum AS (SELECT doc_id,
                   SUM(nt) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ct,
                   SUM(nw) OVER (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cv
                 FROM pd),
         pts AS (SELECT CAST(FLOOR(ln(CAST(ct AS DOUBLE)) * 1e9 + 0.5) AS HUGEINT) AS x,
                        CAST(FLOOR(ln(CAST(cv AS DOUBLE)) * 1e9 + 0.5) AS HUGEINT) AS y
                 FROM cum WHERE ct > 0 AND cv > 0),
         agg AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n, SUM(x) AS sx, SUM(y) AS sy,
                        SUM(x * x) AS sxx, SUM(x * y) AS sxy
                 FROM pts)
         SELECT CAST(n AS BIGINT) AS n_points,
                ROUND(CAST(n * sxy - sx * sy AS DOUBLE)
                      / CAST(n * sxx - sx * sx AS DOUBLE), 6) AS beta,
                ROUND((CAST(sy AS DOUBLE)
                       - (CAST(n * sxy - sx * sy AS DOUBLE)
                          / CAST(n * sxx - sx * sx AS DOUBLE)) * CAST(sx AS DOUBLE))
                      / CAST(n AS DOUBLE) / 1e9, 6) AS ln_k
         FROM agg""",
    "q_dsir_stream" ->
      """WITH rt AS (SELECT doc_id,
                ('0x' || substr(md5(unnest(regexp_extract_all(lower(text), '[a-z0-9]{2,}'))), 1, 8))::BIGINT % 256 AS b
              FROM documents),
         tt AS (SELECT ('0x' || substr(md5(unnest(regexp_extract_all(lower(text), '[a-z0-9]{2,}'))), 1, 8))::BIGINT % 256 AS b
                FROM documents WHERE lang = 'en'),
         tc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS tn FROM tt GROUP BY 1),
         rc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rn FROM rt GROUP BY 1),
         tot AS (SELECT (SELECT CAST(SUM(tn) AS BIGINT) FROM tc) AS ttot,
                        (SELECT CAST(SUM(rn) AS BIGINT) FROM rc) AS rtot),
         lr AS (SELECT COALESCE(rc.b, tc.b) AS b,
                  CAST(FLOOR(ln(CAST((COALESCE(tn, 0) + 1) * (rtot + 256) AS DOUBLE)
                              / CAST((COALESCE(rn, 0) + 1) * (ttot + 256) AS DOUBLE))
                       * 1e6 + 0.5) AS BIGINT) AS lrq
                FROM rc FULL OUTER JOIN tc ON rc.b = tc.b CROSS JOIN tot),
         df AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM rt GROUP BY 1, 2)
         SELECT df.doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                ROUND(CAST(SUM(c * lrq) AS DOUBLE) / 1e6, 6) AS score
         FROM df JOIN lr USING (b) GROUP BY 1 ORDER BY 1""",
    "q_assign_clusters" ->
      """WITH c AS (
           SELECT i AS cid,
                  list_transform(generate_series(1, 64),
                                 j -> CAST((i + 1) * j % 7 - 3 AS DOUBLE) / 10.0) AS cv
           FROM generate_series(0, 3) t(i)),
         d AS (
           SELECT e.vec_id, c.cid,
                  ROUND(list_sum(list_transform(generate_series(1, 64),
                        j -> (CAST(e.embedding[j] AS DOUBLE) - c.cv[j]) *
                             (CAST(e.embedding[j] AS DOUBLE) - c.cv[j]))), 6) AS dist
           FROM embeddings e CROSS JOIN c),
         r AS (SELECT vec_id, cid, dist,
                      ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY dist, cid) AS rn
               FROM d)
         SELECT vec_id, CAST(cid AS INT) AS cluster, dist AS dist_sq
         FROM r WHERE rn = 1 ORDER BY vec_id""",
    "q_ranking_metrics" ->
      """WITH q AS (SELECT vec_id AS query_id, label AS qlab, CAST(embedding AS DOUBLE[]) AS qv
                    FROM embeddings WHERE vec_id < 8),
         scored AS (
           SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
           FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         res AS (
           SELECT query_id, vec_id,
                  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
           FROM scored QUALIFY rn <= 5),
         truth AS (
           SELECT q.query_id, e.vec_id FROM q
           JOIN embeddings e ON e.label = q.qlab AND e.vec_id <> q.query_id),
         perq AS (
           SELECT r.query_id,
                  CAST(SUM(CASE WHEN t.vec_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS hits,
                  MIN(CASE WHEN t.vec_id IS NOT NULL THEN r.rn END) AS minr,
                  CAST(SUM(CASE WHEN t.vec_id IS NOT NULL
                                THEN CAST(FLOOR(1000000.0 / log2(r.rn + 1.0) + 0.5) AS BIGINT)
                                ELSE 0 END) AS BIGINT) AS dcg
           FROM res r LEFT JOIN truth t ON r.query_id = t.query_id AND r.vec_id = t.vec_id
           GROUP BY 1),
         nrel AS (SELECT query_id, CAST(COUNT(*) AS BIGINT) AS n_rel FROM truth GROUP BY 1),
         ideal AS (
           SELECT query_id,
                  CAST(SUM(CAST(FLOOR(1000000.0 / log2(i + 1.0) + 0.5) AS BIGINT)) AS BIGINT) AS idcg
           FROM (SELECT n.query_id, unnest(generate_series(1, LEAST(5, n.n_rel))) AS i FROM nrel n)
           GROUP BY 1)
         SELECT p.query_id,
                COALESCE(n.n_rel, 0) AS n_rel, p.hits,
                ROUND(CAST(p.hits AS DOUBLE) / CAST(5 AS DOUBLE), 6) AS precision_at_k,
                CASE WHEN COALESCE(n.n_rel, 0) > 0
                     THEN ROUND(CAST(p.hits AS DOUBLE) / CAST(n.n_rel AS DOUBLE), 6)
                     ELSE 0.0 END AS recall_at_k,
                CASE WHEN p.minr IS NOT NULL THEN ROUND(1.0 / CAST(p.minr AS DOUBLE), 6)
                     ELSE 0.0 END AS mrr,
                CASE WHEN COALESCE(i.idcg, 0) > 0
                     THEN ROUND(CAST(p.dcg AS DOUBLE) / CAST(i.idcg AS DOUBLE), 6)
                     ELSE 0.0 END AS ndcg_at_k
         FROM perq p LEFT JOIN nrel n USING (query_id) LEFT JOIN ideal i USING (query_id)
         ORDER BY query_id""",
    "q_fix_mojibake" ->
      """SELECT doc_id, text AS text_fixed FROM documents ORDER BY doc_id""",
    "q_image_meta" ->
      """SELECT doc_id, 'unknown' AS format, -1 AS width, -1 AS height
         FROM documents ORDER BY doc_id""",
    // expected fields recomputed from first principles — builder layout
    // and parser walk both under the hash
    "q_tiff_webp" ->
      """SELECT doc_id,
                'webp' AS webp_format,
                CAST(doc_id % 4096 + 1 AS INT) AS webp_width,
                CAST(doc_id % 3000 + 1 AS INT) AS webp_height,
                'tiff' AS tiff_format,
                CAST(doc_id % 5000 AS INT) AS tiff_width,
                CAST(doc_id % 7001 AS INT) AS tiff_height
         FROM documents ORDER BY doc_id""",
    "q_flatten_structs" ->
      """SELECT o_orderkey, o_orderstatus AS info_status,
                o_totalprice AS info_detail_price,
                o_orderpriority AS info_detail_priority
         FROM orders ORDER BY o_orderkey""",
    "q_chi_square" ->
      """WITH cells AS (
           SELECT o_orderstatus AS a, o_orderpriority AS b, COUNT(*) AS o
           FROM orders GROUP BY 1, 2),
         t AS (SELECT a, b, o,
                      SUM(o) OVER (PARTITION BY a) AS ra,
                      SUM(o) OVER (PARTITION BY b) AS cb,
                      SUM(o) OVER () AS n
               FROM cells),
         u AS (SELECT a, b, n,
                      CAST((CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) *
                           (CAST(o AS DOUBLE) - CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) /
                           (CAST(ra AS DOUBLE) * CAST(cb AS DOUBLE) / CAST(n AS DOUBLE)) AS DECIMAL(30,12)) AS term
               FROM t)
         SELECT CAST(MAX(n) AS BIGINT) AS n, COUNT(*) AS n_cells,
                (COUNT(DISTINCT a) - 1) * (COUNT(DISTINCT b) - 1) AS dof,
                ROUND(CAST(SUM(term) AS DOUBLE), 6) AS chi2,
                ROUND(SQRT(CAST(SUM(term) AS DOUBLE) /
                           (CAST(MAX(n) AS DOUBLE) * (LEAST(COUNT(DISTINCT a), COUNT(DISTINCT b)) - 1))), 6) AS cramers_v
         FROM u""",
    // G-test: O·N and R·C stay exact integers (HUGEINT) until ONE
    // nearest-double conversion each; per-cell terms quantize to 1e-9
    // before the sum — mirrors Sketches.gTest bit-for-bit; the streaming
    // twin maintains the cells in the state store and shares the SQL
    "q_g_test" -> gTestOracle,
    "q_g_test_stream" -> gTestOracle,
    // four exact long counters, then fixed IEEE chains — no quantization;
    // the streaming twin maintains the same counters in the state store
    // (integer state => stream == batch bit-exactly) and shares the SQL
    "q_two_proportion" -> twoProportionOracle,
    "q_two_proportion_stream" -> twoProportionOracle,
    "q_label_encode" ->
      """SELECT o_orderkey, o_orderpriority,
                DENSE_RANK() OVER (ORDER BY o_orderpriority) - 1 AS code
         FROM orders ORDER BY o_orderkey""",
    // the m-estimate as ONE exact-integer ratio: (s*N + m*S) / (N*(n+m)),
    // HUGEINT until the single double division
    "q_target_encode" ->
      """WITH b AS (SELECT o_orderpriority,
                           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y
                    FROM orders),
         g AS (SELECT CAST(COUNT(y) AS HUGEINT) AS gn, SUM(CAST(y AS HUGEINT)) AS gs FROM b),
         c AS (SELECT o_orderpriority, CAST(COUNT(y) AS HUGEINT) AS n, SUM(CAST(y AS HUGEINT)) AS s
               FROM b GROUP BY 1)
         SELECT c.o_orderpriority, CAST(c.n AS BIGINT) AS n,
                ROUND(CAST(c.s * g.gn + 20 * g.gs AS DOUBLE) /
                      CAST(g.gn * (c.n + 20) AS DOUBLE), 6) AS encoded
         FROM c, g ORDER BY c.o_orderpriority""",
    // the leave-fold-out m-estimate: targetEncode on corpus-minus-fold as
    // one exact HUGEINT chain; the complete cat × fold domain via cross
    // join with absent cells coalesced to 0 — mirrors
    // Relational.targetEncodeOof
    "q_target_encode_oof" ->
      """WITH b AS (SELECT o_orderpriority AS c,
                           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS y,
                           ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 5 AS f
                    FROM orders),
         cf AS (SELECT c, f, CAST(COUNT(y) AS HUGEINT) AS nf, SUM(CAST(y AS HUGEINT)) AS sf
                FROM b GROUP BY 1, 2),
         dom AS (SELECT DISTINCT c FROM cf),
         fl AS (SELECT unnest(generate_series(0, 4)) AS f),
         full0 AS (SELECT dom.c, fl.f,
                          COALESCE(nf, CAST(0 AS HUGEINT)) AS nf,
                          COALESCE(sf, CAST(0 AS HUGEINT)) AS sf
                   FROM dom CROSS JOIN fl LEFT JOIN cf ON cf.c = dom.c AND cf.f = fl.f),
         t AS (SELECT *,
                 SUM(nf) OVER (PARTITION BY c) AS nc, SUM(sf) OVER (PARTITION BY c) AS sc,
                 SUM(nf) OVER (PARTITION BY f) AS nfold, SUM(sf) OVER (PARTITION BY f) AS sfold,
                 SUM(nf) OVER () AS ng, SUM(sf) OVER () AS sg
               FROM full0)
         SELECT c AS o_orderpriority, CAST(f AS BIGINT) AS fold,
                CAST(nc - nf AS BIGINT) AS n_oof,
                CASE WHEN (ng - nfold) * (nc - nf + 20) <> 0 THEN
                  ROUND(CAST((sc - sf) * (ng - nfold) + 20 * (sg - sfold) AS DOUBLE)
                        / CAST((ng - nfold) * (nc - nf + 20) AS DOUBLE), 6) END AS encoded
         FROM t ORDER BY o_orderpriority, fold""",
    // depth-capped BFS closure: UNION dedups (node, d) pairs so the
    // recursion is bounded by nodes × (maxHops+1) rows
    "q_bfs_hops" ->
      """WITH RECURSIVE pairs AS (
           SELECT a.l_partkey AS u, b.l_partkey AS v
           FROM (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) a
           JOIN (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem) b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING COUNT(*) >= 3),
         e AS (SELECT u, v FROM pairs UNION SELECT v, u FROM pairs),
         seeds AS (SELECT DISTINCT u AS node FROM e ORDER BY 1 LIMIT 5),
         walk AS (SELECT node, 0 AS d FROM seeds
                  UNION
                  SELECT e.v, w.d + 1 FROM walk w JOIN e ON e.u = w.node WHERE w.d < 3)
         SELECT node AS part_key, CAST(MIN(d) AS BIGINT) AS hops
         FROM walk GROUP BY 1 ORDER BY 1""",
    "q_copurchase" ->
      """SELECT a.l_partkey, b.l_partkey AS l_partkey2, COUNT(*) AS support
         FROM lineitem a JOIN lineitem b
           ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
         GROUP BY 1, 2
         ORDER BY support DESC, a.l_partkey, l_partkey2 LIMIT 50""",
    "q_assoc_rules" ->
      """WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         n AS (SELECT COUNT(DISTINCT l_orderkey) AS total FROM baskets),
         ic AS (SELECT l_partkey, COUNT(*) AS cnt FROM baskets GROUP BY 1),
         pairs AS (
           SELECT a.l_partkey, b.l_partkey AS l_partkey2, COUNT(*) AS support
           FROM baskets a JOIN baskets b
             ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
           GROUP BY 1, 2 HAVING COUNT(*) >= 3)
         SELECT p.l_partkey, p.l_partkey2, p.support,
                ROUND(CAST(p.support AS DOUBLE) / ca.cnt, 6) AS confidence,
                ROUND(CAST(p.support AS DOUBLE) * n.total / (CAST(ca.cnt AS DOUBLE) * cb.cnt), 6) AS lift
         FROM pairs p
         JOIN ic ca ON p.l_partkey = ca.l_partkey
         JOIN ic cb ON p.l_partkey2 = cb.l_partkey
         CROSS JOIN n
         ORDER BY support DESC, p.l_partkey, p.l_partkey2 LIMIT 50""",
    "q_tpch_q12" ->
      """SELECT l_returnflag,
                CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
                CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         WHERE l_shipdate >= TIMESTAMP '1995-01-01'
           AND l_shipdate < TIMESTAMP '1996-01-01'
           AND l_returnflag IN ('A', 'R')
         GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_benford" ->
      """WITH d AS (
           SELECT regexp_extract(CAST(ABS(o_totalprice) AS VARCHAR), '[1-9]', 0) AS digit
           FROM orders),
         c AS (SELECT digit, COUNT(*) AS n FROM d WHERE digit <> '' GROUP BY digit)
         SELECT digit, n,
                ROUND(CAST(n AS DOUBLE) / SUM(n) OVER (), 6) AS observed_pct,
                ROUND(LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS expected_pct,
                ROUND(CAST(n AS DOUBLE) / SUM(n) OVER () - LOG10(1.0 + 1.0 / CAST(digit AS DOUBLE)), 6) AS deviation
         FROM c ORDER BY digit""",
    "q_psi_drift" ->
      """WITH b AS (SELECT MIN(o_totalprice) AS lo,
                           (MAX(o_totalprice) - MIN(o_totalprice)) / 10 AS w
                    FROM orders WHERE o_orderdate < TIMESTAMP '1996-07-01'),
         base AS (SELECT GREATEST(CAST(LEAST(CASE WHEN b.w = 0 THEN 0
                                       ELSE FLOOR((o_totalprice - b.lo) / b.w) END, 9) AS BIGINT), 0) AS bin,
                         COUNT(*) AS n_base
                  FROM orders, b WHERE o_orderdate < TIMESTAMP '1996-07-01' GROUP BY 1),
         cur AS (SELECT GREATEST(CAST(LEAST(CASE WHEN b.w = 0 THEN 0
                                      ELSE FLOOR((o_totalprice - b.lo) / b.w) END, 9) AS BIGINT), 0) AS bin,
                        COUNT(*) AS n_cur
                 FROM orders, b WHERE o_orderdate >= TIMESTAMP '1996-07-01' GROUP BY 1),
         j AS (SELECT COALESCE(base.bin, cur.bin) AS bin,
                      COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur
               FROM base FULL OUTER JOIN cur ON base.bin = cur.bin),
         t AS (SELECT bin, n_base, n_cur,
                      GREATEST(CAST(n_base AS DOUBLE) / SUM(n_base) OVER (), 0.0001) AS base_pct,
                      GREATEST(CAST(n_cur AS DOUBLE) / SUM(n_cur) OVER (), 0.0001) AS cur_pct
               FROM j)
         SELECT bin, n_base, n_cur,
                ROUND(base_pct, 6) AS base_pct, ROUND(cur_pct, 6) AS cur_pct,
                ROUND((cur_pct - base_pct) * LN(cur_pct / base_pct), 6) AS psi_term
         FROM t ORDER BY bin""",
    "q_psi_drift_stream" ->
      """WITH b AS (SELECT MIN(o_totalprice) AS lo,
                           (MAX(o_totalprice) - MIN(o_totalprice)) / 10 AS w
                    FROM orders WHERE o_orderdate < TIMESTAMP '1996-07-01'),
         base AS (SELECT GREATEST(CAST(LEAST(CASE WHEN b.w = 0 THEN 0
                                       ELSE FLOOR((o_totalprice - b.lo) / b.w) END, 9) AS BIGINT), 0) AS bin,
                         COUNT(*) AS n_base
                  FROM orders, b WHERE o_orderdate < TIMESTAMP '1996-07-01' GROUP BY 1),
         cur AS (SELECT GREATEST(CAST(LEAST(CASE WHEN b.w = 0 THEN 0
                                      ELSE FLOOR((o_totalprice - b.lo) / b.w) END, 9) AS BIGINT), 0) AS bin,
                        COUNT(*) AS n_cur
                 FROM orders, b WHERE o_orderdate >= TIMESTAMP '1996-07-01' GROUP BY 1),
         j AS (SELECT COALESCE(base.bin, cur.bin) AS bin,
                      COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur
               FROM base FULL OUTER JOIN cur ON base.bin = cur.bin),
         t AS (SELECT bin, n_base, n_cur,
                      GREATEST(CAST(n_base AS DOUBLE) / SUM(n_base) OVER (), 0.0001) AS base_pct,
                      GREATEST(CAST(n_cur AS DOUBLE) / SUM(n_cur) OVER (), 0.0001) AS cur_pct
               FROM j)
         SELECT bin, n_base, n_cur,
                ROUND(base_pct, 6) AS base_pct, ROUND(cur_pct, 6) AS cur_pct,
                ROUND((cur_pct - base_pct) * LN(cur_pct / base_pct), 6) AS psi_term
         FROM t ORDER BY bin""",
    "q_skyline" ->
      """WITH px AS (SELECT l_quantity AS x, MIN(l_extendedprice) AS miny
                     FROM lineitem GROUP BY 1),
         pre AS (SELECT x, miny,
                        MIN(miny) OVER (ORDER BY x DESC
                                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS st
                 FROM px)
         SELECT l_orderkey, l_partkey, l_quantity, l_extendedprice
         FROM lineitem l JOIN pre ON l.l_quantity = pre.x
         WHERE l.l_extendedprice = pre.miny AND (st IS NULL OR l.l_extendedprice < st)
         ORDER BY l_quantity DESC, l_extendedprice, l_orderkey, l_partkey""",
    "q_period_over_period" ->
      """WITH m AS (
           SELECT strftime(o_orderdate, '%Y%m') AS period,
                  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS c
           FROM orders GROUP BY 1),
         l AS (SELECT period, c,
                      LAG(c, 1) OVER (ORDER BY period) AS prev,
                      LAG(c, 12) OVER (ORDER BY period) AS yoy
               FROM m)
         SELECT period, c / 100.0 AS revenue,
                ROUND(CAST(c - prev AS DOUBLE) / CAST(prev AS DOUBLE) * 100.0, 6) AS mom_pct,
                ROUND(CAST(c - yoy AS DOUBLE) / CAST(yoy AS DOUBLE) * 100.0, 6) AS yoy_pct
         FROM l ORDER BY period""",
    "q_join_fanout" ->
      """WITH lc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_left FROM lineitem GROUP BY 1),
         rc AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_right FROM lineitem GROUP BY 1)
         SELECT lc.l_partkey, n_left, n_right,
                CAST(n_left * n_right AS BIGINT) AS out_rows
         FROM lc JOIN rc ON lc.l_partkey = rc.l_partkey
         ORDER BY out_rows DESC, lc.l_partkey LIMIT 20""",
    "q_fd_check" ->
      """WITH a AS (SELECT o_orderkey AS k, CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nv
                    FROM orders GROUP BY 1),
         b AS (SELECT o_custkey AS k, CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS nv
               FROM orders GROUP BY 1)
         SELECT * FROM (
           SELECT 'o_orderkey' AS determinant, 'o_orderstatus' AS dependent,
                  CAST(COUNT(*) AS BIGINT) AS n_keys,
                  CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT) AS violating_keys,
                  CAST(MAX(nv) AS BIGINT) AS max_values,
                  (SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) = 0) AS holds
           FROM a
           UNION ALL
           SELECT 'o_custkey', 'o_orderstatus',
                  CAST(COUNT(*) AS BIGINT),
                  CAST(SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) AS BIGINT),
                  CAST(MAX(nv) AS BIGINT),
                  (SUM(CASE WHEN nv > 1 THEN 1 ELSE 0 END) = 0)
           FROM b)
         ORDER BY determinant""",
    "q_incremental_join" ->
      """SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS total
         FROM orders JOIN customer ON o_custkey = c_custkey
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    // DuckDB's damerau_levenshtein IS the unrestricted variant the kernel
    // implements; (dl, name) min-struct == ROW_NUMBER tie-break replay
    "q_damerau" ->
      """SELECT s_suppkey, n_name AS closest, dl FROM (
           SELECT s.s_suppkey, n.n_name,
                  CAST(damerau_levenshtein(s.s_name, n.n_name) AS INTEGER) AS dl,
                  ROW_NUMBER() OVER (PARTITION BY s.s_suppkey
                                     ORDER BY damerau_levenshtein(s.s_name, n.n_name), n.n_name) AS rn
           FROM supplier s, nation n)
         WHERE rn = 1 ORDER BY s_suppkey""",
    // rank replay: ROW_NUMBER over the identical total order (id tiebreak);
    // the rank-difference predicate is a range join DuckDB handles via
    // IEJoin at oracle scale
    "q_sorted_neighborhood" ->
      """WITH r AS (SELECT c_custkey AS id,
                           ROW_NUMBER() OVER (ORDER BY c_mktsegment, c_acctbal, c_custkey) AS rn
                    FROM customer)
         SELECT a.id AS id1, b.id AS id2, b.rn - a.rn AS dist
         FROM r a JOIN r b ON b.rn - a.rn BETWEEN 1 AND 3
         ORDER BY id1, id2""",
    "q_linkage_score" ->
      """WITH p AS (
           SELECT c_custkey, s_suppkey,
                  (FLOOR(c_acctbal / 1000) = FLOOR(s_acctbal / 1000)) AS ab,
                  ((c_acctbal >= 0) = (s_acctbal >= 0)) AS asg,
                  (c_custkey % 10 = s_suppkey % 10) AS ak
           FROM customer JOIN supplier ON c_nationkey = s_nationkey),
         w AS (
           SELECT c_custkey, s_suppkey,
                  ROUND((CASE WHEN ab THEN 3.169925 ELSE -3.169925 END) +
                        (CASE WHEN asg THEN 0.925999 ELSE -3.321928 END) +
                        (CASE WHEN ak THEN 3.0 ELSE -2.169925 END), 6) AS link_weight
           FROM p)
         SELECT c_custkey, s_suppkey, link_weight,
                CASE WHEN link_weight >= 2.0 THEN 'match'
                     WHEN link_weight >= 0.0 THEN 'possible'
                     ELSE 'non_match' END AS link_class
         FROM w ORDER BY c_custkey, s_suppkey""",
    "q_fixedwidth_roundtrip" ->
      """SELECT l_returnflag,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_qty,
                CAST(SUM(l_orderkey) AS BIGINT) AS sum_key
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_quantile_normalize" ->
      """WITH gh AS (SELECT event_type, ROUND(value, 6) AS v, CAST(COUNT(*) AS BIGINT) AS c
                     FROM events GROUP BY 1, 2),
         gp AS (SELECT event_type, v,
                       ROUND(CAST(SUM(c) OVER (PARTITION BY event_type ORDER BY v
                                               ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
                             CAST(SUM(c) OVER (PARTITION BY event_type) AS DOUBLE), 9) AS p
                FROM gh),
         gl AS (SELECT ROUND(value, 6) AS gv, CAST(COUNT(*) AS BIGINT) AS c
                FROM events GROUP BY 1),
         glp AS (SELECT gv,
                        ROUND(CAST(SUM(c) OVER (ORDER BY gv ROWS UNBOUNDED PRECEDING) AS DOUBLE) /
                              CAST(SUM(c) OVER () AS DOUBLE), 9) AS p
                 FROM gl),
         u AS (SELECT event_type, v, p, CAST(NULL AS DOUBLE) AS gv, 1 AS tag FROM gp
               UNION ALL
               SELECT NULL, NULL, p, gv, 0 FROM glp),
         m AS (SELECT event_type, v, tag,
                      LAST_VALUE(gv IGNORE NULLS) OVER (ORDER BY p DESC, tag
                                                        ROWS UNBOUNDED PRECEDING) AS norm
               FROM u)
         SELECT e.event_id, e.event_type, e.value, m.norm AS value_qnorm
         FROM events e JOIN m ON m.tag = 1 AND m.event_type = e.event_type
                              AND m.v = ROUND(e.value, 6)
         ORDER BY e.event_id""",
    "q_k_anonymity" ->
      """SELECT c_nationkey, c_mktsegment,
                CAST(FLOOR(c_acctbal / 1000) AS BIGINT) AS bal_k, COUNT(*) AS n
         FROM customer GROUP BY 1, 2, 3 HAVING COUNT(*) < 5
         ORDER BY c_nationkey, c_mktsegment, bal_k""",
    // cell terms in double (ln of an exact-integer ratio, PSI precedent),
    // quantized to 1e-12ths before the cross-cell sum — order-independent
    "q_mutual_info" ->
      """WITH cells AS (SELECT o_orderpriority AS a, o_orderstatus AS b, COUNT(*) AS c
                        FROM orders GROUP BY 1, 2),
         m AS (SELECT c,
                      SUM(c) OVER (PARTITION BY a) AS ca,
                      SUM(c) OVER (PARTITION BY b) AS cb,
                      SUM(c) OVER () AS n
               FROM cells),
         t AS (SELECT n, CAST(FLOOR((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
                                    LN(CAST(n * c AS DOUBLE) / CAST(ca * cb AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS tq
               FROM m)
         SELECT CAST(MAX(n) AS BIGINT) AS n, COUNT(*) AS n_cells,
                ROUND(SUM(tq) / 1e12, 6) AS mi
         FROM t""",
    // the deterministicSplit md5 idiom applied to sampling: rank=md5 mod N
    "q_negative_sample" ->
      """WITH r AS (SELECT vec_id, ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS idx
                    FROM (SELECT DISTINCT vec_id FROM embeddings)),
         n AS (SELECT COUNT(*) AS cnt FROM (SELECT DISTINCT vec_id FROM embeddings)),
         q AS (SELECT doc_id FROM documents WHERE doc_id < 50),
         d AS (SELECT q.doc_id, j.draw,
                      ('0x' || substr(md5(CAST(q.doc_id AS VARCHAR) || ':' || CAST(j.draw AS VARCHAR)), 1, 8))::BIGINT % n.cnt AS idx
               FROM q, n, (SELECT unnest(generate_series(0, 3)) AS draw) j)
         SELECT d.doc_id, CAST(d.draw AS BIGINT) AS draw, r.vec_id
         FROM d JOIN r ON d.idx = r.idx
         ORDER BY d.doc_id, d.draw""",
    // five exact HUGEINT sufficient statistics, then the identical
    // double-expression shape as the Spark side (each division casts two
    // exact integers — IEEE-deterministic on any engine)
    "q_ols_trend" ->
      """WITH b AS (SELECT l_returnflag, l_linestatus,
                           datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS x,
                           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
                    FROM lineitem),
         a AS (SELECT l_returnflag, l_linestatus, CAST(COUNT(*) AS HUGEINT) AS n,
                      SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
                      SUM(CAST(x AS HUGEINT) * x) AS sxx, SUM(CAST(y AS HUGEINT) * y) AS syy,
                      SUM(CAST(x AS HUGEINT) * y) AS sxy
               FROM b GROUP BY 1, 2)
         SELECT l_returnflag, l_linestatus, CAST(n AS BIGINT) AS n,
                ROUND(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 6) AS slope,
                ROUND(CAST(sy*(n*sxx - sx*sx) - (n*sxy - sx*sy)*sx AS DOUBLE) /
                      CAST(n*(n*sxx - sx*sx) AS DOUBLE), 6) AS intercept,
                ROUND((CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)) *
                      (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*syy - sy*sy AS DOUBLE)), 6) AS r2
         FROM a ORDER BY 1, 2""",
    "q_mann_whitney" ->
      """WITH ha AS (SELECT ROUND(value, 6) AS s, CAST(COUNT(*) AS BIGINT) AS ca
                     FROM events WHERE event_type = 'click' GROUP BY 1),
         hb AS (SELECT ROUND(value, 6) AS s, CAST(COUNT(*) AS BIGINT) AS cb
                FROM events WHERE event_type = 'purchase' GROUP BY 1),
         m AS (SELECT COALESCE(ha.s, hb.s) AS s, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
               FROM ha FULL OUTER JOIN hb ON ha.s = hb.s),
         c AS (SELECT s, ca, cb, ca + cb AS cc,
                      COALESCE(SUM(ca + cb) OVER (ORDER BY s
                        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prev
               FROM m),
         r AS (SELECT ca, cb, cc, 2 * prev + cc + 1 AS r2, cc * cc * cc - cc AS tie FROM c),
         g AS (SELECT CAST(SUM(ca) AS BIGINT) AS na, CAST(SUM(cb) AS BIGINT) AS nb,
                      CAST(SUM(ca * r2) AS BIGINT) AS ra2, CAST(SUM(tie) AS BIGINT) AS ties
               FROM r),
         f AS (SELECT na, nb,
                      CAST(ra2 - na * (na + 1) AS DOUBLE) / 2.0 AS u_a,
                      ROUND((CAST(ra2 - na * (na + 1) AS DOUBLE) -
                             CAST(na AS DOUBLE) * CAST(nb AS DOUBLE)) /
                            (2.0 * SQRT(CAST(na AS DOUBLE) * CAST(nb AS DOUBLE) / 12.0 *
                              ((CAST(na + nb AS DOUBLE) + 1.0) -
                               CAST(ties AS DOUBLE) /
                               (CAST(na + nb AS DOUBLE) * (CAST(na + nb AS DOUBLE) - 1.0))))),
                            6) AS z
               FROM g)
         SELECT na AS n_a, nb AS n_b, u_a, z,
                (ABS(z) > 1.959964) AS reject_95,
                (ABS(z) > 2.575829) AS reject_99
         FROM f""",
    "q_ks_test" ->
      """WITH ha AS (SELECT ROUND(o_totalprice, 6) AS s, CAST(COUNT(*) AS BIGINT) AS ca
                     FROM orders WHERE o_orderdate < TIMESTAMP '1996-07-01' GROUP BY 1),
         hb AS (SELECT ROUND(o_totalprice, 6) AS s, CAST(COUNT(*) AS BIGINT) AS cb
                FROM orders WHERE o_orderdate >= TIMESTAMP '1996-07-01' GROUP BY 1),
         m AS (SELECT COALESCE(ha.s, hb.s) AS s, COALESCE(ca, 0) AS ca, COALESCE(cb, 0) AS cb
               FROM ha FULL OUTER JOIN hb ON ha.s = hb.s),
         c AS (SELECT s,
                      SUM(ca) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS ia,
                      SUM(cb) OVER (ORDER BY s ROWS UNBOUNDED PRECEDING) AS ib,
                      SUM(ca) OVER () AS n, SUM(cb) OVER () AS mm
               FROM m),
         g AS (SELECT CAST(n AS BIGINT) AS n_a, CAST(mm AS BIGINT) AS n_b,
                      CAST(MAX(ABS(ia * mm - ib * n)) AS BIGINT) AS gap
               FROM c GROUP BY n, mm)
         SELECT n_a, n_b,
                ROUND(CAST(gap AS DOUBLE) / CAST(n_a * n_b AS DOUBLE), 6) AS ks_d,
                ROUND(1.358 * SQRT(CAST(n_a + n_b AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)), 6) AS crit_95,
                ROUND(1.628 * SQRT(CAST(n_a + n_b AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)), 6) AS crit_99,
                (ROUND(CAST(gap AS DOUBLE) / CAST(n_a * n_b AS DOUBLE), 6) >
                 ROUND(1.358 * SQRT(CAST(n_a + n_b AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)), 6)) AS reject_95,
                (ROUND(CAST(gap AS DOUBLE) / CAST(n_a * n_b AS DOUBLE), 6) >
                 ROUND(1.628 * SQRT(CAST(n_a + n_b AS DOUBLE) / CAST(n_a * n_b AS DOUBLE)), 6)) AS reject_99
         FROM g""",
    // exact HUGEINT window sums, double cast only at the final
    // num / sqrt(denx*deny) — the same expression shape as rollingCorr
    "q_rolling_corr" ->
      """WITH b AS (SELECT l_orderkey, l_linenumber, l_returnflag, l_shipdate,
                           CAST(floor(l_quantity * 100 + 0.5) AS BIGINT) AS xq,
                           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS yq
                    FROM lineitem),
         s AS (SELECT l_orderkey, l_linenumber, l_returnflag,
                      CAST(COUNT(*) OVER w AS HUGEINT) AS n,
                      SUM(CAST(xq AS HUGEINT)) OVER w AS sx,
                      SUM(CAST(yq AS HUGEINT)) OVER w AS sy,
                      SUM(CAST(xq AS HUGEINT) * xq) OVER w AS sxx,
                      SUM(CAST(yq AS HUGEINT) * yq) OVER w AS syy,
                      SUM(CAST(xq AS HUGEINT) * yq) OVER w AS sxy
               FROM b
               WINDOW w AS (PARTITION BY l_returnflag
                            ORDER BY l_shipdate, l_orderkey, l_linenumber, xq, yq
                            ROWS BETWEEN 19 PRECEDING AND CURRENT ROW))
         SELECT l_orderkey, l_linenumber, l_returnflag,
                CASE WHEN n*sxx - sx*sx > 0 AND n*syy - sy*sy > 0
                     THEN ROUND(CAST(n*sxy - sx*sy AS DOUBLE) /
                                SQRT(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE)), 6)
                END AS corr
         FROM s ORDER BY l_orderkey, l_linenumber, l_returnflag, corr""",
    // identical 12-dp weight literals (0.7^j) in the identical
    // left-to-right accumulation order as Temporal.ewma — IEEE doubles
    // reproduce bit-for-bit given the same order
    "q_ewma" ->
      """WITH l AS (
           SELECT event_id, event_type, value,
                  lag(value, 1) OVER w AS l1, lag(value, 2) OVER w AS l2,
                  lag(value, 3) OVER w AS l3, lag(value, 4) OVER w AS l4,
                  lag(value, 5) OVER w AS l5
           FROM events
           WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id))
         SELECT event_id, event_type, value,
                ROUND((COALESCE(CAST(1.0 AS DOUBLE) * value, 0)
                       + COALESCE(CAST(0.7 AS DOUBLE) * l1, 0)
                       + COALESCE(CAST(0.49 AS DOUBLE) * l2, 0)
                       + COALESCE(CAST(0.343 AS DOUBLE) * l3, 0)
                       + COALESCE(CAST(0.2401 AS DOUBLE) * l4, 0)
                       + COALESCE(CAST(0.16807 AS DOUBLE) * l5, 0)) /
                      (CASE WHEN value IS NOT NULL THEN CAST(1.0 AS DOUBLE) ELSE 0 END
                       + CASE WHEN l1 IS NOT NULL THEN CAST(0.7 AS DOUBLE) ELSE 0 END
                       + CASE WHEN l2 IS NOT NULL THEN CAST(0.49 AS DOUBLE) ELSE 0 END
                       + CASE WHEN l3 IS NOT NULL THEN CAST(0.343 AS DOUBLE) ELSE 0 END
                       + CASE WHEN l4 IS NOT NULL THEN CAST(0.2401 AS DOUBLE) ELSE 0 END
                       + CASE WHEN l5 IS NOT NULL THEN CAST(0.16807 AS DOUBLE) ELSE 0 END), 6) AS ewma
         FROM l ORDER BY event_id""",
    "q_cusum" ->
      """WITH d AS (
           SELECT event_id, event_type, value,
                  CAST(FLOOR((value - 50.0 - 5.0) * 1000000.0 + 0.5) AS BIGINT) AS dq,
                  CAST(FLOOR((value - 50.0 + 5.0) * 1000000.0 + 0.5) AS BIGINT) AS eq
           FROM events),
         c AS (
           SELECT event_id, event_type, value,
                  SUM(dq) OVER (PARTITION BY event_type ORDER BY event_id
                                ROWS UNBOUNDED PRECEDING) AS cc,
                  SUM(eq) OVER (PARTITION BY event_type ORDER BY event_id
                                ROWS UNBOUNDED PRECEDING) AS dd
           FROM d),
         s AS (
           SELECT event_id, event_type, value,
                  cc - LEAST(0, MIN(cc) OVER (PARTITION BY event_type ORDER BY event_id
                                              ROWS UNBOUNDED PRECEDING)) AS cp,
                  GREATEST(0, MAX(dd) OVER (PARTITION BY event_type ORDER BY event_id
                                            ROWS UNBOUNDED PRECEDING)) - dd AS cn
           FROM c)
         SELECT event_id, event_type, value,
                cp / 1000000.0 AS cusum_pos, cn / 1000000.0 AS cusum_neg,
                cp > 200000000 AS alarm_pos, cn > 200000000 AS alarm_neg
         FROM s ORDER BY event_type, event_id""",
    "q_temperature_weights" ->
      """WITH c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows FROM documents GROUP BY 1),
         t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS N FROM c),
         p AS (SELECT source, n_rows,
                      CAST(n_rows AS DOUBLE) / CAST(N AS DOUBLE) AS pp,
                      CAST(FLOOR(POWER(CAST(n_rows AS DOUBLE) / CAST(N AS DOUBLE), 0.7)
                                 * 1000000000000.0 + 0.5) AS BIGINT) AS paq
               FROM c, t),
         z AS (SELECT CAST(SUM(paq) AS BIGINT) AS Z FROM p)
         SELECT source, n_rows, ROUND(pp, 6) AS p,
                ROUND(CAST(paq AS DOUBLE) / CAST(Z AS DOUBLE), 6) AS q,
                ROUND(CAST(paq AS DOUBLE) / CAST(Z AS DOUBLE) / pp, 6) AS weight
         FROM p, z ORDER BY source""",
    "q_triangles" ->
      """WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem
                     JOIN orders ON l_orderkey = o_orderkey
                     WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                       AND o_orderdate < TIMESTAMP '1996-07-01'),
         e AS (SELECT DISTINCT LEAST(a.p, b.p) AS x, GREATEST(a.p, b.p) AS y
               FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p),
         deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d
                 FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e) GROUP BY 1),
         tri AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
                 FROM e e1 JOIN e e2 ON e1.y = e2.x
                 JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
         tn AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS nt
                FROM (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
                      UNION ALL SELECT c FROM tri) GROUP BY 1)
         SELECT deg.n AS node, deg.d AS degree, COALESCE(tn.nt, 0) AS n_triangles
         FROM deg LEFT JOIN tn ON deg.n = tn.n
         ORDER BY node""",
    "q_golden_record" ->
      """WITH et AS (SELECT user_id, event_type AS v, COUNT(*) AS n FROM events
                     WHERE event_type IS NOT NULL GROUP BY 1, 2),
         we AS (SELECT user_id, v,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, v) AS rn FROM et),
         pr AS (SELECT user_id, props AS v, COUNT(*) AS n FROM events
                WHERE props IS NOT NULL GROUP BY 1, 2),
         wp AS (SELECT user_id, v,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, v) AS rn FROM pr),
         u AS (SELECT DISTINCT user_id FROM events
               WHERE event_type IS NOT NULL OR props IS NOT NULL)
         SELECT u.user_id, e.v AS event_type_golden, p.v AS props_golden
         FROM u
         LEFT JOIN we e ON e.user_id = u.user_id AND e.rn = 1
         LEFT JOIN wp p ON p.user_id = u.user_id AND p.rn = 1
         ORDER BY u.user_id""",
    "q_golden_record_stream" ->
      """WITH et AS (SELECT user_id, event_type AS v, COUNT(*) AS n FROM events
                     WHERE event_type IS NOT NULL GROUP BY 1, 2),
         we AS (SELECT user_id, v,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, v) AS rn FROM et),
         pr AS (SELECT user_id, props AS v, COUNT(*) AS n FROM events
                WHERE props IS NOT NULL GROUP BY 1, 2),
         wp AS (SELECT user_id, v,
                       ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY n DESC, v) AS rn FROM pr),
         u AS (SELECT DISTINCT user_id FROM events
               WHERE event_type IS NOT NULL OR props IS NOT NULL)
         SELECT u.user_id, e.v AS event_type_golden, p.v AS props_golden
         FROM u
         LEFT JOIN we e ON e.user_id = u.user_id AND e.rn = 1
         LEFT JOIN wp p ON p.user_id = u.user_id AND p.rn = 1
         ORDER BY u.user_id""",
    "q_script_detect" ->
      """WITH c AS (
           SELECT doc_id,
                  length(text) - length(regexp_replace(text, '[A-Za-z]', '', 'g')) AS n_latin,
                  length(text) - length(regexp_replace(text, '[\x{0400}-\x{04FF}]', '', 'g')) AS n_cyrillic,
                  length(text) - length(regexp_replace(text, '[\x{4E00}-\x{9FFF}]', '', 'g')) AS n_cjk,
                  length(text) - length(regexp_replace(text, '[\x{0600}-\x{06FF}]', '', 'g')) AS n_arabic
           FROM documents)
         SELECT doc_id, n_latin, n_cyrillic, n_cjk, n_arabic,
                CASE WHEN n_latin + n_cyrillic + n_cjk + n_arabic = 0 THEN 'none'
                     WHEN n_latin >= n_cyrillic AND n_latin >= n_cjk AND n_latin >= n_arabic THEN 'latin'
                     WHEN n_cyrillic >= n_cjk AND n_cyrillic >= n_arabic THEN 'cyrillic'
                     WHEN n_cjk >= n_arabic THEN 'cjk'
                     ELSE 'arabic' END AS dominant_script
         FROM c ORDER BY doc_id""",
    "q_lang_id" ->
      """WITH scores AS (
           SELECT doc_id,
                  CAST(len(regexp_extract_all(lower(text), '\bthe\b')) + len(regexp_extract_all(lower(text), '\ba\b')) + len(regexp_extract_all(lower(text), '\bof\b')) AS BIGINT) AS score_en,
                  CAST(len(regexp_extract_all(lower(text), '\ble\b')) + len(regexp_extract_all(lower(text), '\bla\b')) + len(regexp_extract_all(lower(text), '\bet\b')) AS BIGINT) AS score_fr,
                  CAST(len(regexp_extract_all(lower(text), '\bder\b')) + len(regexp_extract_all(lower(text), '\bund\b')) + len(regexp_extract_all(lower(text), '\bdie\b')) AS BIGINT) AS score_de,
                  CAST(len(regexp_extract_all(lower(text), '\bel\b')) + len(regexp_extract_all(lower(text), '\by\b')) + len(regexp_extract_all(lower(text), '\bque\b')) AS BIGINT) AS score_es
           FROM documents)
         SELECT doc_id, score_en, score_fr, score_de, score_es,
                CASE WHEN score_en > 0 AND score_en = greatest(score_en, score_fr, score_de, score_es) THEN 'en'
                     WHEN score_fr > 0 AND score_fr = greatest(score_en, score_fr, score_de, score_es) THEN 'fr'
                     WHEN score_de > 0 AND score_de = greatest(score_en, score_fr, score_de, score_es) THEN 'de'
                     WHEN score_es > 0 AND score_es = greatest(score_en, score_fr, score_de, score_es) THEN 'es'
                     ELSE 'und' END AS pred_lang
         FROM scores ORDER BY doc_id""",
    "q_text_quality" ->
      """SELECT doc_id,
                CAST(length(text) AS BIGINT) AS n_chars,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+')) AS BIGINT) AS n_words,
                ROUND(CAST(len(regexp_extract_all(text, '[^A-Za-z0-9_\s]')) AS DOUBLE) / CAST(greatest(length(text), 1) AS DOUBLE), 6) AS punct_ratio,
                ROUND(CAST(len(regexp_extract_all(lower(text), '\b(the|a|of|and|is|in|to)\b')) AS DOUBLE) / CAST(greatest(len(regexp_extract_all(text, '[A-Za-z0-9_]+')), 1) AS DOUBLE), 6) AS stopword_ratio
         FROM documents ORDER BY doc_id""",
    "q_bm25_topk" ->
      """WITH q(query_id, term) AS (VALUES
           ('q1','hash'),('q1','join'),('q1','strategy'),
           ('q2','window'),('q2','sort'),('q2','spill'),
           ('q3','stream'),('q3','batch'),('q3','table')),
         tok AS (SELECT doc_id,
                        CAST(len(regexp_extract_all(lower(text), '[^ ]+')) AS BIGINT) AS dl,
                        unnest(regexp_extract_all(lower(text), '[^ ]+')) AS term
                 FROM documents),
         st AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(len(regexp_extract_all(lower(text), '[^ ]+'))) AS BIGINT) AS tot
                FROM documents),
         tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
                FROM tok WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
         dfreq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1),
         per AS (SELECT q.query_id, tf.doc_id,
                        CAST(FLOOR(ln((n - df + 0.5) / (df + 0.5) + 1.0) *
                             (tf * (1.2 + 1.0)) /
                             (tf + 1.2 * (1.0 - 0.75 + 0.75 * dl / (CAST(tot AS DOUBLE) / CAST(n AS DOUBLE)))) *
                             1000000.0 + 0.5) AS BIGINT) AS sc
                 FROM tf JOIN dfreq USING (term) JOIN q ON q.term = tf.term CROSS JOIN st),
         agg AS (SELECT query_id, doc_id, CAST(SUM(sc) AS BIGINT) AS s FROM per GROUP BY 1, 2),
         rk AS (SELECT query_id, doc_id, s,
                       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS rn
                FROM agg)
         SELECT query_id, doc_id, s / 1000000.0 AS score, CAST(rn AS INTEGER) AS rnk
         FROM rk WHERE rn <= 10 ORDER BY query_id, rnk""",
    // deviation sums kept RAW (exact longs) so the prediction is ONE
    // division of exact integers — no per-pair ratio ever materializes
    // T64's rewrite CTEs feed T61's dsir replay on the UNK-normalized
    // text; selection on the UNROUNDED score under the (score desc,
    // doc_id) total order — mirrors qLlmPipeline4's single plan
    "q_llm_pipeline4" ->
      """WITH toks AS (SELECT doc_id,
                unnest(string_split(text, ' ')) AS w,
                unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
              FROM documents),
         cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
         vocab AS (SELECT w FROM (
                     SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk
                     FROM cnt WHERE c >= 2)
                   WHERE rk <= 30),
         rew AS (SELECT t.doc_id,
                        string_agg(CASE WHEN v.w IS NULL THEN '<unk>' ELSE t.w END,
                                   ' ' ORDER BY t.pos) AS tx
                 FROM toks t LEFT JOIN vocab v ON t.w = v.w GROUP BY t.doc_id),
         rl AS (SELECT r.doc_id, r.tx, d.lang FROM rew r JOIN documents d USING (doc_id)),
         rt AS (SELECT doc_id,
                ('0x' || substr(md5(unnest(regexp_extract_all(lower(tx), '[a-z0-9]{2,}'))), 1, 8))::BIGINT % 256 AS b
              FROM rl),
         tt AS (SELECT ('0x' || substr(md5(unnest(regexp_extract_all(lower(tx), '[a-z0-9]{2,}'))), 1, 8))::BIGINT % 256 AS b
                FROM rl WHERE lang = 'en'),
         tc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS tn FROM tt GROUP BY 1),
         rc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS rn FROM rt GROUP BY 1),
         tot AS (SELECT (SELECT CAST(SUM(tn) AS BIGINT) FROM tc) AS ttot,
                        (SELECT CAST(SUM(rn) AS BIGINT) FROM rc) AS rtot),
         lr AS (SELECT COALESCE(rc.b, tc.b) AS b,
                  CAST(FLOOR(ln(CAST((COALESCE(tn, 0) + 1) * (rtot + 256) AS DOUBLE)
                              / CAST((COALESCE(rn, 0) + 1) * (ttot + 256) AS DOUBLE))
                       * 1e6 + 0.5) AS BIGINT) AS lrq
                FROM rc FULL OUTER JOIN tc ON rc.b = tc.b CROSS JOIN tot),
         dfb AS (SELECT doc_id, b, CAST(COUNT(*) AS BIGINT) AS c FROM rt GROUP BY 1, 2),
         sc AS (SELECT dfb.doc_id, CAST(SUM(c) AS BIGINT) AS n_tokens,
                       CAST(SUM(c * lrq) AS DOUBLE) / 1e6 AS score
                FROM dfb JOIN lr USING (b) GROUP BY 1),
         top AS (SELECT * FROM sc ORDER BY score DESC, doc_id LIMIT 100)
         SELECT doc_id, n_tokens, ROUND(score, 6) AS score
         FROM top ORDER BY doc_id""",
    // X163 equi-width bins (broadcast bounds) into X123's 1e-12-quantized
    // MI assembly — mirrors Sketches.mutualInfoBinned
    "q_mi_binned" ->
      """WITH b AS (SELECT CAST(l_quantity AS DOUBLE) AS x,
                           CAST(l_extendedprice AS DOUBLE) AS y
                    FROM lineitem),
         bd AS (SELECT MIN(x) AS xlo, MAX(x) AS xhi, MIN(y) AS ylo, MAX(y) AS yhi FROM b),
         bins AS (SELECT
                    CAST(LEAST(CASE WHEN (xhi - xlo) / 8 = 0.0 THEN 0
                               ELSE FLOOR((x - xlo) / ((xhi - xlo) / 8)) END, 7) AS BIGINT) AS bx,
                    CAST(LEAST(CASE WHEN (yhi - ylo) / 8 = 0.0 THEN 0
                               ELSE FLOOR((y - ylo) / ((yhi - ylo) / 8)) END, 7) AS BIGINT) AS byy
                  FROM b CROSS JOIN bd),
         cells AS (SELECT bx, byy, COUNT(*) AS c FROM bins GROUP BY 1, 2),
         m AS (SELECT c,
                      SUM(c) OVER (PARTITION BY bx) AS ca,
                      SUM(c) OVER (PARTITION BY byy) AS cb,
                      SUM(c) OVER () AS n
               FROM cells),
         t AS (SELECT n, CAST(FLOOR((CAST(c AS DOUBLE) / CAST(n AS DOUBLE)) *
                                    LN(CAST(n * c AS DOUBLE) / CAST(ca * cb AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) AS tq
               FROM m)
         SELECT CAST(MAX(n) AS BIGINT) AS n, COUNT(*) AS n_cells,
                ROUND(SUM(tq) / 1e12, 6) AS mi
         FROM t""",
    // md5 bucket assignment through cumulative weight ranges; per-arm GOF
    // terms exact HUGEINT until one division, 1e-9-quantized — mirrors
    // Quality.srmCheck
    "q_srm_check" ->
      """WITH u AS (SELECT DISTINCT o_custkey AS unit FROM orders),
         asg AS (SELECT unit,
                        ('0x' || substr(md5('exp1' || '|' || CAST(unit AS VARCHAR)), 1, 13))::BIGINT % 4 AS bkt
                 FROM u),
         ob AS (SELECT CASE WHEN bkt < 1 THEN 'A' WHEN bkt < 2 THEN 'B' ELSE 'C' END AS arm,
                       CAST(COUNT(*) AS BIGINT) AS o
                FROM asg GROUP BY 1),
         dec AS (SELECT * FROM (VALUES ('A', 1), ('B', 1), ('C', 2)) AS t(arm, w)),
         j AS (SELECT dec.arm, dec.w, COALESCE(ob.o, 0) AS o
               FROM dec LEFT JOIN ob USING (arm)),
         wn AS (SELECT *, CAST(SUM(o) OVER () AS BIGINT) AS n FROM j),
         t AS (SELECT *,
                      CASE WHEN n > 0 THEN CAST(FLOOR(
                        CAST((CAST(o AS HUGEINT) * 4 - CAST(n AS HUGEINT) * w)
                             * (CAST(o AS HUGEINT) * 4 - CAST(n AS HUGEINT) * w) AS DOUBLE)
                        / CAST(CAST(n AS HUGEINT) * w * 4 AS DOUBLE) * 1e9 + 0.5) AS BIGINT) END AS tq
               FROM wn)
         SELECT arm, CAST(w AS BIGINT) AS weight, o AS n_observed,
                ROUND(CAST(n AS DOUBLE) * CAST(w AS DOUBLE) / 4.0, 6) AS n_expected,
                ROUND(CAST(SUM(tq) OVER () AS DOUBLE) / 1e9, 6) AS chi2,
                CAST(2 AS BIGINT) AS dof
         FROM t ORDER BY arm""",
    // deterministic Laplace draw: md5-of-(seed|key) uniform (h+0.5)/2^52
    // through the inverse CDF — mirrors Quality.noisyCounts
    // the md5→uniform→Gumbel replay, winner by noisy score then key
    "q_exp_mechanism" ->
      """WITH g AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n_orders
                    FROM orders GROUP BY 1),
         h AS (SELECT o_orderpriority, n_orders,
                      ('0x' || substr(md5('graft' || '|' || o_orderpriority), 1, 13))::BIGINT AS hv
               FROM g),
         ns AS (SELECT o_orderpriority, n_orders,
                      CAST(n_orders AS DOUBLE) * 0.5
                        + (-LN(-LN((CAST(hv AS DOUBLE) + 0.5) / 4503599627370496.0))) AS noisy
               FROM h)
         SELECT o_orderpriority, n_orders AS utility,
                1.0 AS epsilon, 1.0 AS sensitivity
         FROM ns ORDER BY noisy DESC, o_orderpriority LIMIT 1""",
    "q_noisy_counts" ->
      """WITH g AS (SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n
                    FROM orders GROUP BY 1),
         h AS (SELECT o_orderpriority, n,
                      ('0x' || substr(md5('graft' || '|' || o_orderpriority), 1, 13))::BIGINT AS hv
               FROM g),
         u AS (SELECT o_orderpriority, n,
                      (CAST(hv AS DOUBLE) + 0.5) / 4503599627370496.0 - 0.5 AS v
               FROM h)
         SELECT o_orderpriority,
                GREATEST(CAST(FLOOR(CAST(n AS DOUBLE)
                                    + (-(2.0) * sign(v) * ln(1.0 - 2.0 * abs(v)))
                                    + 0.5) AS BIGINT), 0) AS n_released,
                2.0 AS noise_scale
         FROM u ORDER BY o_orderpriority""",
    // Tn = N·Σsx − X·Σsn and S2 = N·Σns² − (Σsn)² exact HUGEINT, the
    // variance product a fixed double chain — mirrors
    // Sketches.cochranArmitage
    "q_cochran_armitage" ->
      """WITH b AS (SELECT CAST(substr(o_orderpriority, 1, 1) AS BIGINT) AS s,
                           o_totalprice > 150000.0 AS o
                    FROM orders),
         g AS (SELECT s, CAST(COUNT(*) AS BIGINT) AS n_i,
                      CAST(SUM(CASE WHEN o THEN 1 ELSE 0 END) AS BIGINT) AS x_i
               FROM b GROUP BY 1),
         a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_groups,
                      CAST(SUM(n_i) AS BIGINT) AS n,
                      CAST(SUM(x_i) AS BIGINT) AS x,
                      SUM(CAST(s AS HUGEINT) * n_i) AS sn,
                      SUM(CAST(s AS HUGEINT) * x_i) AS sx,
                      SUM(CAST(s AS HUGEINT) * s * n_i) AS sns2
               FROM g)
         SELECT n_groups, n, x,
                CASE WHEN x > 0 AND x < n AND (n * sns2 - sn * sn) <> 0
                     THEN ROUND(CAST(n * sx - x * sn AS DOUBLE)
                                / sqrt(CAST(x AS DOUBLE) * CAST(n - x AS DOUBLE)
                                       * CAST(n * sns2 - sn * sn AS DOUBLE)
                                       / CAST(n AS DOUBLE)), 6) END AS z
         FROM a""",
    // X118's exact-moment OLS, residuals quantized to 1e-6 longs, DW one
    // division of exact HUGEINT sums — mirrors Temporal.durbinWatson
    "q_durbin_watson" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
               CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
             FROM events GROUP BY 1, 2),
         s AS (SELECT event_type AS g, v AS y,
                      ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS t
               FROM daily),
         a AS (SELECT g, CAST(COUNT(*) AS HUGEINT) AS n,
                      SUM(CAST(t AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
                      SUM(CAST(t AS HUGEINT) * t) AS sxx, SUM(CAST(t AS HUGEINT) * y) AS sxy
               FROM s GROUP BY 1),
         f AS (SELECT g, CAST(n AS BIGINT) AS cnt,
                      CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE) AS slope,
                      CAST(sy*(n*sxx - sx*sx) - (n*sxy - sx*sy)*sx AS DOUBLE) /
                      CAST(n*(n*sxx - sx*sx) AS DOUBLE) AS icept
               FROM a),
         r AS (SELECT s.g, s.t, f.cnt,
                      CAST(FLOOR((CAST(s.y AS DOUBLE) - f.icept - f.slope * CAST(s.t AS DOUBLE))
                                 * 1e6 + 0.5) AS BIGINT) AS eq
               FROM s JOIN f ON s.g = f.g),
         l AS (SELECT g, cnt, eq, LAG(eq) OVER (PARTITION BY g ORDER BY t) AS pl FROM r)
         SELECT g AS event_type, MAX(cnt) AS n,
                CASE WHEN SUM(CAST(eq AS HUGEINT) * eq) <> 0
                     THEN ROUND(CAST(SUM(CAST(eq - pl AS HUGEINT) * (eq - pl)) AS DOUBLE)
                                / CAST(SUM(CAST(eq AS HUGEINT) * eq) AS DOUBLE), 6) END AS dw
         FROM l GROUP BY g ORDER BY event_type""",
    // the integer quantized log-factorial prefix table (1e-12 ln units)
    // makes every table's log-probability an exact integer and the
    // qualifies-as-extreme decision an integer compare — mirrors
    // Sketches.fisherExact bit-for-bit
    "q_fisher" ->
      """WITH lfb AS (SELECT i,
                CASE WHEN i = 0 THEN 0
                     ELSE CAST(FLOOR(ln(CAST(i AS DOUBLE)) * 1e12 + 0.5) AS BIGINT) END AS lnq
              FROM (SELECT UNNEST(generate_series(0, 10000)) AS i)),
         lf AS (SELECT i, SUM(lnq) OVER (ORDER BY i ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lf
                FROM lfb),
         st AS (SELECT o_orderpriority AS g,
                  CAST(SUM(CASE WHEN o_orderstatus = 'F' AND o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT) AS a,
                  CAST(SUM(CASE WHEN o_orderstatus = 'F' AND NOT o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT) AS b,
                  CAST(SUM(CASE WHEN o_orderstatus <> 'F' AND o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT) AS c,
                  CAST(SUM(CASE WHEN o_orderstatus <> 'F' AND NOT o_totalprice > 150000.0 THEN 1 ELSE 0 END) AS BIGINT) AS d,
                  CAST(COUNT(*) AS BIGINT) AS n
                FROM orders GROUP BY 1),
         wide AS (SELECT *, a + b AS r1, c + d AS r2, a + c AS c1, n <= 10000 AS fits FROM st),
         wd2 AS (SELECT w.*, l1.lf + l2.lf + l3.lf + l4.lf - l5.lf AS cnst
                 FROM wide w
                 JOIN lf l1 ON l1.i = w.r1 JOIN lf l2 ON l2.i = w.r2
                 JOIN lf l3 ON l3.i = w.c1 JOIN lf l4 ON l4.i = w.n - w.c1
                 JOIN lf l5 ON l5.i = w.n
                 WHERE w.fits),
         ks AS (SELECT g, a, r1, r2, c1, cnst,
                       UNNEST(generate_series(GREATEST(0, c1 - r2), LEAST(r1, c1))) AS k
                FROM wd2),
         lnp AS (SELECT ks.g, ks.a, ks.k,
                        cnst - lk.lf - lr.lf - lc.lf - ld.lf AS lnq
                 FROM ks JOIN lf lk ON lk.i = ks.k
                         JOIN lf lr ON lr.i = ks.r1 - ks.k
                         JOIN lf lc ON lc.i = ks.c1 - ks.k
                         JOIN lf ld ON ld.i = ks.r2 - ks.c1 + ks.k),
         obs AS (SELECT g, lnq AS lnqa FROM lnp WHERE k = a),
         q AS (SELECT l.g,
                      CAST(FLOOR(exp(CAST(l.lnq AS DOUBLE) / 1e12) * 1e12 + 0.5) AS BIGINT) AS tq
               FROM lnp l JOIN obs ob ON l.g = ob.g
               WHERE l.lnq <= ob.lnqa + 100000),
         pv AS (SELECT g, CAST(SUM(tq) AS BIGINT) AS pq FROM q GROUP BY g)
         SELECT w.g AS o_orderpriority, a, b, c, d, n,
                CASE WHEN b > 0 AND c > 0
                     THEN ROUND(CAST(a * d AS DOUBLE) / CAST(b * c AS DOUBLE), 6) END AS odds_ratio,
                CASE WHEN fits THEN ROUND(CAST(pq AS DOUBLE) / 1e12, 6) END AS p_two_sided
         FROM wide w LEFT JOIN pv ON w.g = pv.g ORDER BY o_orderpriority""",
    // novelty terms ln(nu/pop) of exact longs, 1e-9-quantized before the
    // mean — mirrors Recommend.recMetrics
    "q_rec_metrics" ->
      """WITH raw AS (SELECT o_custkey AS u, l_partkey AS i
                      FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         cnts AS (SELECT u, i, COUNT(*) AS n FROM raw GROUP BY 1, 2),
         recs AS (SELECT u, i FROM (
                    SELECT u, i, ROW_NUMBER() OVER (PARTITION BY u ORDER BY n DESC, i) AS rk
                    FROM cnts)
                  WHERE rk <= 3),
         inter AS (SELECT DISTINCT u, i FROM raw),
         pop AS (SELECT i, CAST(COUNT(*) AS BIGINT) AS pop FROM inter GROUP BY 1),
         tot AS (SELECT CAST(COUNT(DISTINCT u) AS BIGINT) AS nu,
                        CAST(COUNT(DISTINCT i) AS BIGINT) AS cat
                 FROM inter),
         j AS (SELECT r.i, p.pop, t.nu, t.cat
               FROM recs r LEFT JOIN pop p ON r.i = p.i CROSS JOIN tot t),
         t2 AS (SELECT *,
                       CAST(FLOOR(ln(CAST(nu AS DOUBLE) / CAST(pop AS DOUBLE)) * 1e9 + 0.5) AS HUGEINT) AS tq
                FROM j)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_recs,
                CAST(COUNT(DISTINCT i) AS BIGINT) AS n_rec_items,
                MAX(cat) AS catalog_size,
                ROUND(CAST(COUNT(DISTINCT CASE WHEN pop IS NOT NULL THEN i END) AS DOUBLE)
                      / CAST(MAX(cat) AS DOUBLE), 6) AS coverage,
                CAST(SUM(CASE WHEN pop IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_cold,
                ROUND(CAST(SUM(CASE WHEN pop IS NOT NULL THEN tq END) AS DOUBLE) / 1e9
                      / CAST(SUM(CASE WHEN pop IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE), 6) AS novelty
         FROM t2""",
    "q_slope_one" ->
      """WITH r AS (SELECT o.o_custkey AS u, p.p_brand AS i,
                CAST(SUM(CAST(l.l_quantity AS BIGINT)) AS BIGINT) AS rv
              FROM lineitem l
              JOIN part p ON l.l_partkey = p.p_partkey
              JOIN orders o ON l.l_orderkey = o.o_orderkey
              GROUP BY 1, 2),
         dev AS (SELECT b.i AS j, a.i,
                   CAST(SUM(b.rv - a.rv) AS BIGINT) AS d,
                   CAST(COUNT(*) AS BIGINT) AS c
                 FROM r a JOIN r b ON a.u = b.u AND a.i <> b.i
                 GROUP BY 1, 2),
         pr AS (SELECT r.u, dev.j,
                  CAST(SUM(dev.c) AS BIGINT) AS den,
                  CAST(SUM(dev.d + r.rv * dev.c) AS BIGINT) AS num
                FROM r JOIN dev ON r.i = dev.i
                GROUP BY 1, 2),
         miss AS (SELECT pr.* FROM pr LEFT JOIN r ON pr.u = r.u AND pr.j = r.i
                  WHERE r.u IS NULL)
         SELECT u AS o_custkey, j AS p_brand, den AS n_pairs,
                ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) AS prediction
         FROM miss WHERE u <= 200 ORDER BY o_custkey, p_brand""",
    // freq/degree exact longs; word scores one-division 1e-9-quantized
    // longs before the phrase sum; token-list stopword marking (every
    // stopword its own delimiter, any run length) on BOTH engines
    "q_rake" ->
      """WITH pre AS (SELECT doc_id,
             trim(regexp_replace(lower(text), '[^a-z]+', ' ', 'g')) AS norm
           FROM documents),
         mk AS (SELECT doc_id,
             array_to_string(list_transform(string_split(norm, ' '),
               w -> CASE WHEN w IN ('a','an','the','and','or','but','of','to','in','on','for','with','is','are','was','be','that','this','it','as','at','by','from','not','have')
                         THEN '|' ELSE w END), ' ') AS m
           FROM pre),
         ph AS (SELECT doc_id, phrase FROM (
             SELECT doc_id,
                    trim(regexp_replace(unnest(string_split(m, '|')), ' +', ' ', 'g')) AS phrase
             FROM mk) WHERE phrase <> ''),
         phw AS (SELECT doc_id, unnest(string_split(phrase, ' ')) AS w,
                        CAST(len(string_split(phrase, ' ')) AS BIGINT) AS plen
                 FROM ph),
         ws AS (SELECT doc_id, w, CAST(COUNT(*) AS BIGINT) AS freq,
                       CAST(SUM(plen) AS BIGINT) AS deg
                FROM phw GROUP BY 1, 2),
         phd AS (SELECT DISTINCT doc_id, phrase FROM ph),
         pdw AS (SELECT doc_id, phrase, unnest(string_split(phrase, ' ')) AS w
                 FROM phd),
         sc AS (SELECT p.doc_id, p.phrase,
                  CAST(SUM(CAST(FLOOR(CAST(deg AS DOUBLE) / CAST(freq AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS sq
                FROM pdw p JOIN ws ON p.doc_id = ws.doc_id AND p.w = ws.w
                GROUP BY 1, 2),
         rk AS (SELECT doc_id, phrase, sq,
                  ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY sq DESC, phrase) AS rn
                FROM sc)
         SELECT doc_id, phrase, ROUND(CAST(sq AS DOUBLE) / 1e9, 6) AS score,
                CAST(rn AS INTEGER) AS rnk
         FROM rk WHERE rn <= 3 ORDER BY doc_id, rnk""",
    // the bm25 quantized-log-chain discipline with collection-frequency
    // smoothing; per-doc length normalizer quantized before the add
    "q_query_likelihood" ->
      """WITH q(query_id, term, nq) AS (VALUES
           ('q1','hash',3),('q1','join',3),('q1','strategy',3),
           ('q2','window',3),('q2','sort',3),('q2','spill',3),
           ('q3','stream',3),('q3','batch',3),('q3','table',3)),
         tok AS (SELECT doc_id,
                        CAST(len(regexp_extract_all(lower(text), '[^ ]+')) AS BIGINT) AS dl,
                        unnest(regexp_extract_all(lower(text), '[^ ]+')) AS term
                 FROM documents),
         st AS (SELECT CAST(SUM(len(regexp_extract_all(lower(text), '[^ ]+'))) AS BIGINT) AS tot
                FROM documents),
         tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf, MAX(dl) AS dl
                FROM tok WHERE term IN (SELECT DISTINCT term FROM q) GROUP BY 1, 2),
         cf AS (SELECT term, CAST(SUM(tf) AS BIGINT) AS cf FROM tf GROUP BY 1),
         per AS (SELECT q.query_id, tf.doc_id, tf.dl, q.nq,
                        CAST(FLOOR(ln(1.0 + CAST(tf AS DOUBLE) * CAST(tot AS DOUBLE)
                                         / (2000.0 * CAST(cf AS DOUBLE)))
                             * 1000000.0 + 0.5) AS BIGINT) AS sc
                 FROM tf JOIN cf USING (term) JOIN q ON q.term = tf.term CROSS JOIN st),
         agg AS (SELECT query_id, doc_id,
                        CAST(SUM(sc) AS BIGINT)
                        + CAST(FLOOR(CAST(MAX(nq) AS DOUBLE)
                              * ln(2000.0 / (CAST(MAX(dl) AS DOUBLE) + 2000.0))
                              * 1000000.0 + 0.5) AS BIGINT) AS s
                 FROM per GROUP BY 1, 2),
         rk AS (SELECT query_id, doc_id, s,
                       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY s DESC, doc_id) AS rn
                FROM agg)
         SELECT query_id, doc_id, s / 1000000.0 AS score, CAST(rn AS INTEGER) AS rnk
         FROM rk WHERE rn <= 10 ORDER BY query_id, rnk""",
    // (term, doc) tf grain, doc_freq over ALL postings, stored list
    // capped under the (tf desc, doc asc) total order — mirrors
    // TextAnalysis.invertedIndex + the gate's posexplode
    "q_inverted_index" ->
      """WITH toks AS (SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
              FROM documents),
         p AS (SELECT term, doc_id, CAST(COUNT(*) AS BIGINT) AS tf
               FROM toks GROUP BY 1, 2),
         dfq AS (SELECT term, CAST(COUNT(*) AS BIGINT) AS doc_freq FROM p GROUP BY 1),
         rk AS (SELECT term, doc_id, tf,
                       ROW_NUMBER() OVER (PARTITION BY term ORDER BY tf DESC, doc_id) AS rnk
                FROM p)
         SELECT r.term, d.doc_freq, CAST(r.rnk AS BIGINT) AS rank, r.doc_id, r.tf
         FROM rk r JOIN dfq d USING (term)
         WHERE r.rnk <= 5
         ORDER BY r.term, r.rnk""",
    // top-maxVocab under the (count desc, token asc) total order, token
    // left join, positional reassembly — mirrors
    // TextAnalysis.truncateVocabulary
    "q_truncate_vocab" ->
      """WITH toks AS (SELECT doc_id,
                unnest(string_split(text, ' ')) AS w,
                unnest(generate_series(1, len(string_split(text, ' ')))) AS pos
              FROM documents),
         cnt AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1),
         vocab AS (SELECT w FROM (
                     SELECT w, ROW_NUMBER() OVER (ORDER BY c DESC, w) AS rk
                     FROM cnt WHERE c >= 2)
                   WHERE rk <= 30),
         fl AS (SELECT t.doc_id, t.pos,
                       CASE WHEN v.w IS NULL THEN '<unk>' ELSE t.w END AS w2,
                       v.w IS NULL AS oov
                FROM toks t LEFT JOIN vocab v ON t.w = v.w)
         SELECT doc_id,
                string_agg(w2, ' ' ORDER BY pos) AS text_unk,
                CAST(COUNT(*) AS BIGINT) AS n_tokens,
                CAST(SUM(CASE WHEN oov THEN 1 ELSE 0 END) AS BIGINT) AS n_oov
         FROM fl GROUP BY doc_id ORDER BY doc_id""",
    // line synthesis as in q_boilerplate, then the C4 line rules (terminal
    // punctuation, >= 3 words, no "javascript") and doc rules on the
    // CLEANED text — mirrors TextAnalysis.c4Filter exactly; the streaming
    // twin is the same per-row projection (append mode) and shares the SQL
    "q_c4_filter" -> c4FilterOracle,
    "q_c4_filter_stream" -> c4FilterOracle,
    "q_gopher_quality" ->
      """WITH g AS (
           SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS w,
                  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS nonws,
                  CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS BIGINT) AS sym,
                  CAST(len(string_split(text, chr(10))) AS BIGINT) AS nlines,
                  CAST(len(regexp_extract_all(text, '(?m)^[-*•]')) AS BIGINT) AS bul,
                  CAST(len(regexp_extract_all(text, '(?m)(\.\.\.|…)$')) AS BIGINT) AS ell,
                  CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS BIGINT) AS alpha,
                  CAST(CASE WHEN regexp_matches(lower(text), '\bthe\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(lower(text), '\bbe\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(lower(text), '\bto\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(lower(text), '\bof\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(lower(text), '\band\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(lower(text), '\bthat\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(lower(text), '\bhave\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(lower(text), '\bwith\b') THEN 1 ELSE 0 END AS BIGINT) AS stop_hits
           FROM documents),
         m AS (
           SELECT doc_id, w AS n_words,
                  ROUND(CAST(nonws AS DOUBLE) / CAST(greatest(w, 1) AS DOUBLE), 6) AS mean_word_len,
                  ROUND(CAST(sym AS DOUBLE) / CAST(greatest(w, 1) AS DOUBLE), 6) AS symbol_ratio,
                  ROUND(CAST(bul AS DOUBLE) / CAST(nlines AS DOUBLE), 6) AS bullet_ratio,
                  ROUND(CAST(ell AS DOUBLE) / CAST(nlines AS DOUBLE), 6) AS ellipsis_ratio,
                  ROUND(CAST(alpha AS DOUBLE) / CAST(greatest(w, 1) AS DOUBLE), 6) AS alpha_ratio,
                  stop_hits
           FROM g)
         SELECT doc_id, n_words, mean_word_len, symbol_ratio, bullet_ratio,
                ellipsis_ratio, alpha_ratio, stop_hits,
                (n_words >= 5 AND n_words <= 100000) AS flag_word_count,
                (mean_word_len >= 3.0 AND mean_word_len <= 10.0) AS flag_word_length,
                (symbol_ratio <= 0.1) AS flag_symbol_ratio,
                (bullet_ratio <= 0.9) AS flag_bullet,
                (ellipsis_ratio <= 0.3) AS flag_ellipsis,
                (alpha_ratio >= 0.8) AS flag_alpha,
                (stop_hits >= 2) AS flag_stopwords,
                (n_words >= 5 AND n_words <= 100000 AND mean_word_len >= 3.0 AND mean_word_len <= 10.0
                 AND symbol_ratio <= 0.1 AND bullet_ratio <= 0.9 AND ellipsis_ratio <= 0.3
                 AND alpha_ratio >= 0.8 AND stop_hits >= 2) AS keep
         FROM m ORDER BY doc_id""",
    "q_token_count" ->
      """SELECT doc_id,
                CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS ws_tokens,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9_]+|[^A-Za-z0-9_\s]')) AS BIGINT) AS bpe_tokens
         FROM documents ORDER BY doc_id""",
    "q_multimodal_meta" ->
      """SELECT doc_id, CAST(octet_length(encode(text)) AS BIGINT) AS byte_len,
                'application/octet-stream' AS mime
         FROM documents ORDER BY doc_id""",
    "q_multimodal_frames" ->
      """WITH d AS (SELECT doc_id, octet_length(encode(text)) AS blen FROM documents),
         s AS (SELECT i FROM generate_series(0, 65535) t(i))
         SELECT doc_id, CAST(i AS INTEGER) AS frame_pos,
                CAST(LEAST(16, blen - i * 16) AS INTEGER) AS frame_len
         FROM d JOIN s ON i * 16 < blen
         ORDER BY doc_id, frame_pos""",
    "q_pipeline_e2e" ->
      """WITH norm AS (
           SELECT strftime(o.o_orderdate, '%Y%m') AS period,
                  lower(replace(replace(trim(regexp_replace(strip_accents(r.r_name), '[^a-zA-Z0-9_ -]', '', 'g')), 'public', ''), '-', ' ')) AS region,
                  lower(replace(replace(trim(regexp_replace(strip_accents(n.n_name), '[^a-zA-Z0-9_ -]', '', 'g')), 'public', ''), '-', ' ')) AS nation,
                  l.l_returnflag || '_' || l.l_linestatus AS indicator,
                  l.l_quantity, l.l_tax, l.l_linenumber
           FROM lineitem l
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           JOIN nation n ON c.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey),
         unioned AS (
           SELECT period, region, nation, indicator, l_quantity, l_tax FROM norm WHERE l_linenumber <= 3
           UNION ALL
           SELECT period, region, nation, indicator, l_quantity, CAST(NULL AS DOUBLE) FROM norm WHERE l_linenumber > 3),
         agg AS (
           SELECT period, region, nation, indicator,
                  SUM(CAST(l_quantity AS DECIMAL(18,2))) AS qty,
                  SUM(CAST(l_tax AS DECIMAL(18,4))) AS tax
           FROM unioned GROUP BY 1, 2, 3, 4),
         wide AS (
           SELECT period, region, nation,
                  SUM(CASE WHEN indicator = 'A_F' THEN qty END) AS a_f_d,
                  SUM(CASE WHEN indicator = 'N_F' THEN qty END) AS n_f_d,
                  SUM(CASE WHEN indicator = 'N_O' THEN qty END) AS n_o_d,
                  SUM(CASE WHEN indicator = 'R_F' THEN qty END) AS r_f_d,
                  SUM(tax) AS tax_d
           FROM agg GROUP BY 1, 2, 3),
         flagged AS (
           SELECT *, CASE WHEN a_f_d > r_f_d * 2 THEN 'RED'
                          WHEN n_f_d IS NULL AND n_o_d IS NOT NULL THEN 'ORANGE' END AS flag
           FROM wide)
         SELECT period, region, nation,
                CAST(a_f_d AS DOUBLE) AS a_f, CAST(n_f_d AS DOUBLE) AS n_f,
                CAST(n_o_d AS DOUBLE) AS n_o, CAST(r_f_d AS DOUBLE) AS r_f,
                CAST(tax_d AS DOUBLE) AS tax_total
         FROM flagged WHERE flag IS NULL
         ORDER BY period, region, nation""",
    "q_word_freq" ->
      """SELECT word, COUNT(*) AS n FROM (
           SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS word FROM documents)
         GROUP BY word ORDER BY n DESC, word LIMIT 50""",
    "q_word_repetition" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS word FROM documents),
         c AS (SELECT doc_id, word, COUNT(*) AS n FROM w WHERE word <> '' GROUP BY doc_id, word)
         SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_words,
                ROUND(CAST(MAX(n) AS DOUBLE) / SUM(n), 6) AS top_word_ratio
         FROM c GROUP BY doc_id ORDER BY doc_id""",
    "q_decontaminate" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 3, 0))) AS i FROM toks),
         grams AS (SELECT doc_id, array_to_string(t[i : i + 3], ' ') AS g FROM idx),
         bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
         SELECT g.doc_id, COUNT(*) AS n_hits, COUNT(DISTINCT g.g) AS n_distinct_hits
         FROM grams g JOIN bench b ON g.g = b.g
         WHERE g.doc_id % 50 <> 0
         GROUP BY g.doc_id ORDER BY doc_id""",
    "q_dup_ngrams" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i FROM toks),
         grams AS (SELECT doc_id, array_to_string(t[i : i + 1], ' ') AS g FROM idx),
         c AS (SELECT doc_id, g, COUNT(*) AS n, length(g) AS l FROM grams GROUP BY doc_id, g)
         SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_grams,
                ROUND(CAST(SUM(n) - COUNT(*) AS DOUBLE) / SUM(n), 6) AS dup_ngram_fraction,
                ROUND(CAST(COALESCE(SUM(CASE WHEN n > 1 THEN n * l END), 0) AS DOUBLE) / SUM(n * l), 6)
                  AS dup_char_fraction
         FROM c GROUP BY doc_id ORDER BY doc_id""",
    "q_cms_counts" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS est_count
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_cms_counts_stream" ->
      """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS est_count
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q_funnel_latency" ->
      """WITH s0 AS (SELECT user_id, MIN(ts) AS ts_s FROM events
                     WHERE event_type = 'signup' GROUP BY user_id)
         SELECT e.user_id,
                CAST((epoch_us(MIN(e.ts)) - epoch_us(ts_s)) // 1000000 AS BIGINT) AS latency_sec
         FROM events e JOIN s0 ON e.user_id = s0.user_id
         WHERE e.event_type = 'purchase' AND e.ts > ts_s
         GROUP BY e.user_id, ts_s
         ORDER BY e.user_id""",
    "q_theta_setops" ->
      """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
              p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
         SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
                CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
                CAST((SELECT COUNT(*) FROM c JOIN p USING (user_id)) AS BIGINT) AS n_both,
                CAST((SELECT COUNT(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM p)) AS BIGINT) AS n_click_only,
                CAST((SELECT COUNT(*) FROM (SELECT * FROM c UNION SELECT * FROM p)) AS BIGINT) AS n_either""",
    "q_theta_setops_stream" ->
      """WITH c AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'click'),
              p AS (SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase')
         SELECT CAST((SELECT COUNT(*) FROM c) AS BIGINT) AS n_click,
                CAST((SELECT COUNT(*) FROM p) AS BIGINT) AS n_purchase,
                CAST((SELECT COUNT(*) FROM c JOIN p USING (user_id)) AS BIGINT) AS n_both,
                CAST((SELECT COUNT(*) FROM c WHERE user_id NOT IN (SELECT user_id FROM p)) AS BIGINT) AS n_click_only,
                CAST((SELECT COUNT(*) FROM (SELECT * FROM c UNION SELECT * FROM p)) AS BIGINT) AS n_either""",
    "q_dup_spans" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 3, 0))) AS i FROM toks),
         grams AS (SELECT doc_id, i,
                          ('0x' || substr(md5(array_to_string(t[i : i + 3], ' ')), 1, 15))::BIGINT AS gh
                   FROM idx),
         dup AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) >= 2),
         hits AS (SELECT doc_id, i FROM grams WHERE gh IN (SELECT gh FROM dup)),
         flags AS (SELECT doc_id, i,
                          CASE WHEN LAG(i) OVER w IS NULL OR i > LAG(i) OVER w + 4
                               THEN 1 ELSE 0 END AS nf
                   FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         isl AS (SELECT doc_id, i,
                        SUM(nf) OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS island
                 FROM flags)
         SELECT doc_id,
                CAST(MIN(i) - 1 AS BIGINT) AS span_start,
                CAST(MAX(i) + 2 AS BIGINT) AS span_end,
                CAST(MAX(i) + 2 - MIN(i) + 2 AS BIGINT) AS span_tokens,
                CAST(COUNT(*) AS BIGINT) AS n_dup_grams
         FROM isl GROUP BY doc_id, island
         ORDER BY doc_id, span_start""",
    "q_dup_spans_removal" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 3, 0))) AS i FROM toks),
         grams AS (SELECT doc_id, i,
                          ('0x' || substr(md5(array_to_string(t[i : i + 3], ' ')), 1, 15))::BIGINT AS gh
                   FROM idx),
         dup AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) >= 2),
         hits AS (SELECT doc_id, i FROM grams WHERE gh IN (SELECT gh FROM dup)),
         flags AS (SELECT doc_id, i,
                          CASE WHEN LAG(i) OVER w IS NULL OR i > LAG(i) OVER w + 4
                               THEN 1 ELSE 0 END AS nf
                   FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         isl AS (SELECT doc_id, i,
                        SUM(nf) OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS island
                 FROM flags),
         spans AS (SELECT doc_id, MIN(i) - 1 AS s, MAX(i) + 2 AS e
                   FROM isl GROUP BY doc_id, island),
         cov AS (SELECT doc_id, unnest(generate_series(s, e)) AS p FROM spans),
         otoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS j FROM otoks),
         tok AS (SELECT doc_id, j - 1 AS p, t[j] AS w FROM pos),
         kept AS (SELECT tok.doc_id, tok.p, tok.w, cov.p IS NOT NULL AS cut
                  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p)
         SELECT doc_id,
                COALESCE(string_agg(CASE WHEN NOT cut THEN w END, ' ' ORDER BY p), '') AS text_clean,
                CAST(SUM(CASE WHEN NOT cut THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens_kept,
                CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens_removed
         FROM kept GROUP BY doc_id ORDER BY doc_id""",
    "q_dup_spans_keepfirst" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 3, 0))) AS i FROM toks),
         grams AS (SELECT doc_id, i,
                          ('0x' || substr(md5(array_to_string(t[i : i + 3], ' ')), 1, 15))::BIGINT AS gh
                   FROM idx),
         dup AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) >= 2),
         hits AS (SELECT doc_id, i, gh FROM grams WHERE gh IN (SELECT gh FROM dup)),
         ranked AS (SELECT doc_id, i,
                           ROW_NUMBER() OVER (PARTITION BY gh ORDER BY doc_id, i) AS rn
                    FROM hits),
         nf AS (SELECT doc_id, i FROM ranked WHERE rn > 1),
         flags AS (SELECT doc_id, i,
                          CASE WHEN LAG(i) OVER w IS NULL OR i > LAG(i) OVER w + 4
                               THEN 1 ELSE 0 END AS nfg
                   FROM nf WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         isl AS (SELECT doc_id, i,
                        SUM(nfg) OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS island
                 FROM flags),
         spans AS (SELECT doc_id, MIN(i) - 1 AS s, MAX(i) + 2 AS e
                   FROM isl GROUP BY doc_id, island),
         cov AS (SELECT doc_id, unnest(generate_series(s, e)) AS p FROM spans),
         otoks AS (SELECT doc_id, string_split(text, ' ') AS t FROM documents),
         pos AS (SELECT doc_id, t, unnest(generate_series(1, len(t))) AS j FROM otoks),
         tok AS (SELECT doc_id, j - 1 AS p, t[j] AS w FROM pos),
         kept AS (SELECT tok.doc_id, tok.p, tok.w, cov.p IS NOT NULL AS cut
                  FROM tok LEFT JOIN cov ON tok.doc_id = cov.doc_id AND tok.p = cov.p)
         SELECT doc_id,
                COALESCE(string_agg(CASE WHEN NOT cut THEN w END, ' ' ORDER BY p), '') AS text_clean,
                CAST(SUM(CASE WHEN NOT cut THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens_kept,
                CAST(SUM(CASE WHEN cut THEN 1 ELSE 0 END) AS BIGINT) AS n_tokens_removed
         FROM kept GROUP BY doc_id ORDER BY doc_id""",
    "q_llm_pipeline2" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 3, 0))) AS i FROM toks),
         grams AS (SELECT doc_id, i,
                          ('0x' || substr(md5(array_to_string(t[i : i + 3], ' ')), 1, 15))::BIGINT AS gh
                   FROM idx),
         dup AS (SELECT gh FROM grams GROUP BY gh HAVING COUNT(*) >= 2),
         hits AS (SELECT doc_id, i FROM grams WHERE gh IN (SELECT gh FROM dup)),
         flags AS (SELECT doc_id, i,
                          CASE WHEN LAG(i) OVER w IS NULL OR i > LAG(i) OVER w + 4
                               THEN 1 ELSE 0 END AS nf
                   FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY i)),
         isl AS (SELECT doc_id, i,
                        SUM(nf) OVER (PARTITION BY doc_id ORDER BY i ROWS UNBOUNDED PRECEDING) AS island
                 FROM flags),
         spans AS (SELECT doc_id, MIN(i) - 1 AS s, MAX(i) + 2 AS e
                   FROM isl GROUP BY doc_id, island),
         cov AS (SELECT doc_id, CAST(SUM(e - s + 1) AS BIGINT) AS covered FROM spans GROUP BY doc_id),
         kept AS (SELECT tk.doc_id, tk.doc_id % 8 AS shard,
                         CAST(len(tk.t) AS BIGINT) - COALESCE(cov.covered, 0) AS n_tokens
                  FROM toks tk LEFT JOIN cov ON tk.doc_id = cov.doc_id
                  WHERE CAST(len(tk.t) AS BIGINT) - COALESCE(cov.covered, 0) >= 10),
         c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING) AS cum
               FROM kept)
         SELECT doc_id, shard, CAST(n_tokens AS BIGINT) AS n_tokens,
                CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS chunk_id,
                CAST(cum - n_tokens - CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) * 512 AS BIGINT)
                  AS chunk_pos
         FROM c ORDER BY doc_id""",
    "q_window_suite" ->
      """SELECT event_type, event_id, value,
                ntile(4) OVER w AS bucket,
                percent_rank() OVER w AS pct_rank,
                cume_dist() OVER w AS cume
         FROM events
         WINDOW w AS (PARTITION BY event_type ORDER BY value, event_id)
         ORDER BY event_type, value, event_id""",
    "q_tpch_q22" ->
      """WITH a AS (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*) AS av
                    FROM customer WHERE c_acctbal > 0.0)
         SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS numcust,
                CAST(SUM(CAST(c_acctbal AS DECIMAL(18,2))) AS DOUBLE) AS totacctbal
         FROM customer, a
         WHERE c_acctbal > av
           AND NOT EXISTS (SELECT 1 FROM orders
                           WHERE o_custkey = c_custkey
                             AND o_orderdate >= TIMESTAMP '2000-01-01')
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q_partitioned_export" ->
      """SELECT o_orderkey, strftime(o_orderdate, '%Y%m') AS period, o_totalprice
         FROM orders ORDER BY o_orderkey""",
    "q_orc_roundtrip" ->
      """SELECT l_orderkey, l_linenumber, l_quantity, l_shipdate, l_returnflag
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_quantity, l_shipdate, l_returnflag""",
    "q_xml_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate
         FROM orders ORDER BY o_orderkey""",
    "q_jdbc_roundtrip" ->
      """SELECT s_suppkey, s_name, s_nationkey, s_acctbal
         FROM supplier ORDER BY s_suppkey""",
    "q_compact_roundtrip" ->
      """SELECT o_orderkey, o_custkey, o_totalprice, CAST(1 AS INTEGER) AS n_files
         FROM orders ORDER BY o_orderkey""",
    "q_overwrite_partitions" ->
      """SELECT o_orderkey, o_custkey,
                CASE WHEN o_orderpriority = '1-URGENT'
                     THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice,
                o_orderpriority
         FROM orders ORDER BY o_orderkey""",
    "q_jsonl_export" ->
      """SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars
         FROM documents ORDER BY doc_id""",
    "q_decontaminate_stream" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 3, 0))) AS i FROM toks),
         grams AS (SELECT doc_id, array_to_string(t[i : i + 3], ' ') AS g FROM idx),
         bench AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0)
         SELECT g.doc_id, COUNT(*) AS n_hits
         FROM grams g JOIN bench b ON g.g = b.g
         WHERE g.doc_id % 50 <> 0
         GROUP BY g.doc_id ORDER BY doc_id""",
    "q_corpus_overlap" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 2, 0))) AS i FROM toks),
         grams AS (SELECT doc_id, array_to_string(t[i : i + 2], ' ') AS g FROM idx),
         ga AS (SELECT DISTINCT g FROM grams WHERE doc_id % 2 = 0),
         gb AS (SELECT DISTINCT g FROM grams WHERE doc_id % 2 = 1),
         j AS (SELECT ga.g AS a, gb.g AS b FROM ga FULL OUTER JOIN gb ON ga.g = gb.g)
         SELECT COUNT(a) AS grams_a, COUNT(b) AS grams_b,
                COUNT(CASE WHEN a IS NOT NULL AND b IS NOT NULL THEN 1 END) AS grams_shared,
                ROUND(CAST(COUNT(CASE WHEN a IS NOT NULL AND b IS NOT NULL THEN 1 END) AS DOUBLE)
                      / COUNT(*), 6) AS jaccard
         FROM j""",
    "q_l2_normalize" ->
      """WITH n AS (SELECT vec_id, embedding,
                sqrt(list_aggregate(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)), 'sum')) AS nrm
              FROM embeddings WHERE vec_id % 10 = 0),
         e AS (SELECT vec_id,
                unnest(generate_series(0, len(embedding) - 1)) AS pos,
                unnest(list_transform(embedding, x -> CASE WHEN nrm = 0 THEN 0.0 ELSE CAST(x AS DOUBLE) / nrm END)) AS v
              FROM n)
         SELECT vec_id, pos, ROUND(v, 6) AS v FROM e ORDER BY vec_id, pos""",
    "q_mean_pool" ->
      """WITH e AS (SELECT label, unnest(embedding) AS v,
                unnest(generate_series(0, len(embedding) - 1)) AS pos
              FROM embeddings)
         SELECT label, pos, ROUND(AVG(CAST(v AS DOUBLE)), 6) AS m
         FROM e GROUP BY label, pos ORDER BY label, pos""",
    "q_char_entropy" ->
      """WITH ch AS (SELECT doc_id, unnest(regexp_extract_all(text, '(?s).')) AS c FROM documents),
         cc AS (SELECT doc_id, c, COUNT(*) AS n FROM ch GROUP BY doc_id, c)
         SELECT doc_id, CAST(SUM(n) AS BIGINT) AS n_chars,
                ROUND(LN(CAST(SUM(n) AS DOUBLE))
                      - CAST(SUM(CAST(ROUND(n * LN(CAST(n AS DOUBLE)), 6) AS DECIMAL(28,6))) AS DOUBLE)
                        / SUM(n), 6) AS char_entropy
         FROM cc GROUP BY doc_id ORDER BY doc_id""",
    "q_lm_score" ->
      """WITH toks AS (SELECT doc_id, string_split(lower(text), ' ') AS t FROM documents),
         idx AS (SELECT doc_id, t, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i FROM toks),
         bi AS (SELECT doc_id, array_to_string(t[i : i + 1], ' ') AS bigram FROM idx),
         cb AS (SELECT bigram, COUNT(*) AS cb FROM bi GROUP BY bigram),
         cu AS (SELECT split_part(bigram, ' ', 1) AS w1, SUM(cb) AS cu FROM cb GROUP BY 1),
         lp AS (SELECT bi.doc_id,
                       CAST(ROUND(LN(CAST(cb.cb AS DOUBLE) / cu.cu), 6) AS DECIMAL(28,6)) AS lp
                FROM bi JOIN cb USING (bigram)
                JOIN cu ON split_part(bi.bigram, ' ', 1) = cu.w1)
         SELECT doc_id, COUNT(*) AS n_bigrams,
                ROUND(CAST(SUM(lp) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS avg_logprob
         FROM lp GROUP BY doc_id ORDER BY doc_id""",
    "q_perplexity" -> perplexityOracle,
    "q_perplexity_stream" -> perplexityOracle,
    "q_llm_pipeline" ->
      """WITH keep AS (
           SELECT MIN(doc_id) AS doc_id
           FROM documents GROUP BY md5(lower(trim(text)))),
         gated AS (
           SELECT d.doc_id, d.text
           FROM documents d JOIN keep USING (doc_id)
           WHERE len(regexp_extract_all(d.text, '\S+')) BETWEEN 20 AND 2000),
         chunks AS (
           SELECT doc_id, substr(text, start, 80) AS chunk_text
           FROM (SELECT doc_id, text,
                        unnest(generate_series(1, greatest(length(text) - 20, 1), 60)) AS start
                 FROM gated))
         SELECT doc_id, COUNT(*) AS n_chunks,
                CAST(SUM(length(chunk_text)) AS BIGINT) AS total_chunk_chars
         FROM chunks GROUP BY doc_id ORDER BY doc_id""",
    "q_chunk_text" ->
      """WITH s AS (SELECT doc_id, text,
                unnest(generate_series(1, greatest(length(text) - 20, 1), 60)) AS start
              FROM documents)
         SELECT doc_id, (start - 1) // 60 AS chunk_idx, substr(text, start, 80) AS chunk_text
         FROM s ORDER BY doc_id, chunk_idx""",
    "q_snapshot_diff" ->
      """WITH old AS (SELECT doc_id, text FROM documents),
         next AS (
           SELECT doc_id,
                  CASE WHEN doc_id % 89 = 0 THEN text || ' [rev2]' ELSE text END AS text
           FROM old WHERE doc_id % 97 <> 0
           UNION ALL
           SELECT doc_id + 1000000 AS doc_id, text FROM old WHERE doc_id % 101 = 0)
         SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id,
                CASE WHEN o.doc_id IS NULL THEN 'added'
                     WHEN n.doc_id IS NULL THEN 'removed'
                     WHEN o.text IS NOT DISTINCT FROM n.text THEN 'unchanged'
                     ELSE 'changed' END AS change
         FROM old o FULL OUTER JOIN next n ON o.doc_id = n.doc_id
         WHERE NOT (o.doc_id IS NOT NULL AND n.doc_id IS NOT NULL
                    AND o.text IS NOT DISTINCT FROM n.text)
         ORDER BY doc_id""",
    "q_bucketed_join" ->
      """SELECT c_nationkey, COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
         FROM customer JOIN orders ON o_custkey = c_custkey
         GROUP BY c_nationkey ORDER BY c_nationkey""",
    "q_dedup_stream" ->
      """SELECT DISTINCT user_id, event_type FROM events ORDER BY user_id, event_type""",
    "q_upsert" ->
      """SELECT o_orderkey,
                CASE WHEN o_orderkey < 1000 THEN o_totalprice * 2 ELSE o_totalprice END AS o_totalprice
         FROM orders ORDER BY o_orderkey""",
    "q_cdc_apply" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         ch AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1::DOUBLE AS o_totalprice,
                  'U' AS op, 1 AS seq FROM base WHERE o_orderkey % 7 = 0
           UNION ALL
           SELECT o_orderkey, 'R', o_totalprice + 100.0::DOUBLE, 'U', 2
           FROM base WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice, 'D', 3
           FROM base WHERE o_orderkey % 13 = 0),
         last AS (SELECT * FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
             FROM ch) WHERE rn = 1)
         SELECT b.o_orderkey,
                COALESCE(l.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
                COALESCE(l.o_totalprice, b.o_totalprice) AS o_totalprice
         FROM base b LEFT JOIN last l USING (o_orderkey)
         WHERE l.op IS NULL OR l.op <> 'D'
         ORDER BY o_orderkey""",
    "q_cdc_apply_stream" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         ch AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1::DOUBLE AS o_totalprice,
                  'U' AS op, 1 AS seq FROM base WHERE o_orderkey % 7 = 0
           UNION ALL
           SELECT o_orderkey, 'R', o_totalprice + 100.0::DOUBLE, 'U', 2
           FROM base WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice, 'D', 3
           FROM base WHERE o_orderkey % 13 = 0),
         last AS (SELECT * FROM (
             SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderkey ORDER BY seq DESC) AS rn
             FROM ch) WHERE rn = 1)
         SELECT b.o_orderkey,
                COALESCE(l.o_orderstatus, b.o_orderstatus) AS o_orderstatus,
                COALESCE(l.o_totalprice, b.o_totalprice) AS o_totalprice
         FROM base b LEFT JOIN last l USING (o_orderkey)
         WHERE l.op IS NULL OR l.op <> 'D'
         ORDER BY o_orderkey""",
    "q_scd2_from_cdc" ->
      """WITH base AS (SELECT o_orderkey, o_orderstatus, o_totalprice FROM orders),
         ch AS (
           SELECT o_orderkey, o_orderstatus, o_totalprice * 1.1::DOUBLE AS o_totalprice,
                  'U' AS op, CAST(1 AS BIGINT) AS seq FROM base WHERE o_orderkey % 7 = 0
           UNION ALL
           SELECT o_orderkey, 'R', o_totalprice + 100.0::DOUBLE, 'U', 2
           FROM base WHERE o_orderkey % 5 = 0
           UNION ALL
           SELECT o_orderkey, o_orderstatus, o_totalprice, 'D', 3
           FROM base WHERE o_orderkey % 13 = 0),
         v AS (SELECT *, seq AS valid_from,
                      LEAD(seq) OVER (PARTITION BY o_orderkey ORDER BY seq) AS valid_to
               FROM ch)
         SELECT o_orderkey, o_orderstatus, o_totalprice, valid_from, valid_to,
                valid_to IS NULL AS is_current
         FROM v WHERE op <> 'D'
         ORDER BY o_orderkey, valid_from""",
    "q_tpch_q2" ->
      """WITH mc AS (SELECT l_partkey, MIN(l_extendedprice) AS min_price
                     FROM lineitem GROUP BY l_partkey)
         SELECT l.l_partkey, mc.min_price,
                CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS n_min_suppliers,
                MIN(l.l_suppkey) AS best_suppkey
         FROM lineitem l
         JOIN mc ON l.l_partkey = mc.l_partkey AND l.l_extendedprice = mc.min_price
         GROUP BY 1, 2 ORDER BY l.l_partkey""",
    "q_tpch_q4" ->
      """SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS order_count
         FROM orders o
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
           AND EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_tpch_q7" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
                CAST(year(l_shipdate) AS INT) AS l_year,
                CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         WHERE sn.n_name IN ('NATION_3', 'NATION_7')
           AND cn.n_name IN ('NATION_3', 'NATION_7')
           AND sn.n_name <> cn.n_name
         GROUP BY 1, 2, 3
         ORDER BY supp_nation, cust_nation, l_year""",
    "q_tpch_q6" ->
      """SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * l_discount * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
         FROM lineitem
         WHERE l_shipdate >= TIMESTAMP '1996-01-01'
           AND l_shipdate < TIMESTAMP '1997-01-01'
           AND l_discount BETWEEN 0.05 AND 0.07
           AND l_quantity < 24""",
    "q_tpch_q8" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS o_year,
                ROUND(CAST(CAST(SUM(CASE WHEN sn.n_name = 'NATION_3'
                                         THEN CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)
                                         ELSE 0 END) AS BIGINT) AS DOUBLE) /
                      CAST(CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE),
                      6) AS mkt_share
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_type = 'PROMO'
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN nation cn ON c_nationkey = cn.n_nationkey
         JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'AMERICA'
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation sn ON s_nationkey = sn.n_nationkey
         WHERE o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1998-01-01'
         GROUP BY 1 ORDER BY o_year""",
    "q_tpch_q9" ->
      """SELECT n_name AS nation, CAST(year(o_orderdate) AS INT) AS o_year,
                CAST(SUM(CAST(FLOOR((l_extendedprice * (1.0 - l_discount) - 0.5 * p_retailprice * l_quantity) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS sum_profit
         FROM lineitem
         JOIN part ON l_partkey = p_partkey AND p_name LIKE '%red%'
         JOIN supplier ON l_suppkey = s_suppkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN orders ON l_orderkey = o_orderkey
         GROUP BY 1, 2 ORDER BY nation, o_year DESC""",
    "q_tpch_q11" ->
      """WITH ns AS (SELECT s_suppkey FROM supplier JOIN nation ON s_nationkey = n_nationkey
                     WHERE n_name = 'NATION_3'),
         bp AS (SELECT l_partkey,
                       CAST(SUM(CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
                FROM lineitem JOIN ns ON l_suppkey = s_suppkey GROUP BY 1),
         t AS (SELECT CAST(SUM(v) AS BIGINT) AS tot FROM bp)
         SELECT l_partkey, v / 100.0 AS part_value
         FROM bp, t WHERE v * 10000 > tot
         ORDER BY part_value DESC, l_partkey""",
    "q_tpch_q13" ->
      """WITH pc AS (
           SELECT c_custkey, CAST(COUNT(o_orderkey) AS BIGINT) AS c_count
           FROM customer LEFT JOIN orders
             ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
           GROUP BY c_custkey)
         SELECT c_count, CAST(COUNT(*) AS BIGINT) AS custdist
         FROM pc GROUP BY c_count
         ORDER BY custdist DESC, c_count DESC""",
    "q_tpch_q14" ->
      """SELECT ROUND(100.0 *
                  CAST(CAST(SUM(CASE WHEN p_type = 'PROMO'
                                     THEN CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)
                                     ELSE 0 END) AS BIGINT) AS DOUBLE) /
                  CAST(CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS DOUBLE),
                6) AS promo_revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE l_shipdate >= TIMESTAMP '1996-03-01'
           AND l_shipdate < TIMESTAMP '1996-04-01'""",
    "q_tpch_q15" ->
      """WITH rev AS (
           SELECT l_suppkey,
                  CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) AS r
           FROM lineitem
           WHERE l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1996-04-01'
           GROUP BY l_suppkey),
         m AS (SELECT CAST(MAX(r) AS BIGINT) AS mr FROM rev)
         SELECT s_suppkey, s_name, r / 100.0 AS total_revenue
         FROM rev CROSS JOIN m
         JOIN supplier ON l_suppkey = s_suppkey
         WHERE r = mr
         ORDER BY s_suppkey""",
    "q_tpch_q16" ->
      """WITH ps AS (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem),
         ok AS (SELECT l_partkey, l_suppkey FROM ps
                WHERE l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0))
         SELECT p_brand, p_type, p_size,
                CAST(COUNT(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
         FROM ok JOIN part ON l_partkey = p_partkey
         WHERE p_brand <> 'Brand#1' AND p_type <> 'PROMO'
           AND p_size IN (3, 9, 14, 19, 23, 36, 45, 49)
         GROUP BY p_brand, p_type, p_size
         ORDER BY supplier_cnt DESC, p_brand, p_type, p_size""",
    "q_tpch_q19" ->
      """SELECT CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
         FROM lineitem JOIN part ON l_partkey = p_partkey
         WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 5 AND l_quantity BETWEEN 1 AND 11)
            OR (p_brand = 'Brand#2' AND p_size BETWEEN 1 AND 10 AND l_quantity BETWEEN 10 AND 20)
            OR (p_brand = 'Brand#3' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 20 AND 30)""",
    "q_tpch_q20" ->
      """WITH shipped AS (
           SELECT l_partkey, l_suppkey,
                  CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS q
           FROM lineitem JOIN part ON l_partkey = p_partkey
           WHERE p_name LIKE 'red%'
             AND l_shipdate >= TIMESTAMP '1996-01-01'
             AND l_shipdate < TIMESTAMP '1997-01-01'
           GROUP BY 1, 2),
         tot AS (SELECT l_partkey, l_suppkey, q,
                        CAST(SUM(q) OVER (PARTITION BY l_partkey) AS BIGINT) AS t
                 FROM shipped)
         SELECT DISTINCT s_suppkey, s_name
         FROM tot JOIN supplier ON l_suppkey = s_suppkey
         WHERE q * 5 > t
         ORDER BY s_suppkey""",
    "q_tpch_q10" ->
      """SELECT c_custkey, c_name, c_nationkey,
                CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5) AS BIGINT)) AS BIGINT) / 100.0 AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE l_returnflag = 'R'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1996-04-01'
         GROUP BY c_custkey, c_name, c_nationkey
         ORDER BY revenue DESC, c_custkey LIMIT 20""",
    "q_grouping_sets" ->
      """SELECT n_name, o_orderpriority, COUNT(*) AS n_orders,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price
         FROM orders JOIN customer ON o_custkey = c_custkey JOIN nation ON c_nationkey = n_nationkey
         GROUP BY GROUPING SETS ((n_name, o_orderpriority), (n_name), (o_orderpriority))
         ORDER BY n_name NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q_tpch_q21" ->
      """WITH li AS (SELECT l_orderkey, l_suppkey,
                            l_shipdate > o_orderdate + INTERVAL 30 DAY AS late
                     FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
         l1 AS (SELECT DISTINCT l_orderkey, l_suppkey FROM li WHERE late)
         SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS numwait
         FROM l1
         WHERE EXISTS (SELECT 1 FROM li o2
                       WHERE o2.l_orderkey = l1.l_orderkey AND o2.l_suppkey <> l1.l_suppkey)
           AND NOT EXISTS (SELECT 1 FROM li o3
                           WHERE o3.l_orderkey = l1.l_orderkey
                             AND o3.l_suppkey <> l1.l_suppkey AND o3.late)
         GROUP BY l_suppkey
         ORDER BY numwait DESC, l_suppkey
         LIMIT 20""",
    "q_zorder_layout" ->
      """SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey
         FROM lineitem
         ORDER BY l_orderkey, l_linenumber, l_partkey, l_suppkey""",
    "q_incremental_agg" ->
      """SELECT o_orderstatus,
                CAST(date_trunc('month', o_orderdate) AS DATE) AS order_month,
                COUNT(*) AS cnt,
                CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_price,
                MAX(o_totalprice) AS max_price,
                ROUND(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) / COUNT(*), 6) AS avg_price
         FROM orders GROUP BY 1, 2 ORDER BY o_orderstatus, order_month""",
    "q_redact_pii" ->
      """SELECT doc_id,
                regexp_replace(
                  regexp_replace(
                    regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                    '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b', '<IP>', 'g'),
                  '\+[0-9][0-9 ()-]{6,}[0-9]', '<PHONE>', 'g') AS text_redacted,
                CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}'))
                   + len(regexp_extract_all(text, '\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b'))
                   + len(regexp_extract_all(text, '\+[0-9][0-9 ()-]{6,}[0-9]')) AS BIGINT) AS n_redactions
         FROM documents ORDER BY doc_id""",
    "q_train_test_split" ->
      """SELECT doc_id,
                CASE WHEN b < 80 THEN 'train' WHEN b < 90 THEN 'valid' ELSE 'test' END AS split
         FROM (SELECT doc_id,
                      ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 100 AS b
               FROM documents)
         ORDER BY doc_id""",
    "q_pack_sequences" ->
      """WITH t AS (SELECT doc_id, doc_id % 8 AS shard,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents),
         c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING) AS cum
               FROM t)
         SELECT doc_id, shard, n_tokens,
                CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS chunk_id,
                CAST(cum - n_tokens - CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) * 512 AS BIGINT)
                  AS chunk_pos
         FROM c ORDER BY doc_id""",
    "q_pack_text" ->
      """WITH t AS (SELECT doc_id, text, doc_id % 8 AS shard,
                           CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
                    FROM documents),
         c AS (SELECT *, SUM(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
                                             ROWS UNBOUNDED PRECEDING) AS cum
               FROM t),
         p AS (SELECT *, CAST(FLOOR((cum - n_tokens) / 512.0) AS BIGINT) AS chunk_id FROM c)
         SELECT shard, chunk_id, COUNT(*) AS n_docs,
                CAST(SUM(n_tokens) AS BIGINT) AS n_tokens,
                string_agg(text, ' <|doc|> ' ORDER BY doc_id) AS text
         FROM p GROUP BY shard, chunk_id ORDER BY shard, chunk_id""",
    "q_global_row_numbers" ->
      """SELECT doc_id, ROW_NUMBER() OVER (ORDER BY doc_id) - 1 AS row_num
         FROM documents ORDER BY doc_id""",
    "q_heavy_hitters" ->
      """SELECT word AS item, CAST(COUNT(*) AS BIGINT) AS count_lo
         FROM (SELECT unnest(string_split(lower(text), ' ')) AS word FROM documents)
         WHERE word <> '' GROUP BY word ORDER BY count_lo DESC, item""",
    "q_weighted_mix" ->
      """WITH t AS (SELECT doc_id,
                CASE CAST(doc_id % 3 AS INTEGER) WHEN 0 THEN 'web' WHEN 1 THEN 'books' ELSE 'code' END AS source
              FROM documents),
         m AS (SELECT doc_id, source,
                CASE source WHEN 'web' THEN 0 WHEN 'books' THEN 2 ELSE 1 END
                + CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR) || '#mix'), 1, 8))::BIGINT % 10000
                       < CASE source WHEN 'web' THEN 5000 WHEN 'books' THEN 0 ELSE 2500 END
                  THEN 1 ELSE 0 END AS n
              FROM t)
         SELECT doc_id, source, unnest(generate_series(1, n)) AS epoch
         FROM m WHERE n >= 1 ORDER BY doc_id, epoch""",
    "q_tfidf" ->
      """WITH w AS (SELECT doc_id, unnest(string_split(lower(text), ' ')) AS term FROM documents),
         tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM w WHERE term <> '' GROUP BY doc_id, term),
         dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
         n AS (SELECT COUNT(*) AS n FROM documents),
         s AS (SELECT tf.doc_id, tf.term,
                      ROUND(tf.tf * LN(CAST(n.n AS DOUBLE) / dfreq.df), 6) AS tfidf
               FROM tf JOIN dfreq USING (term), n),
         r AS (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                            ORDER BY tfidf DESC, term) AS rk FROM s)
         SELECT doc_id, term, tfidf FROM r WHERE rk <= 3
         ORDER BY doc_id, tfidf DESC, term""",
    "q_quality_gate" ->
      """WITH d AS (SELECT doc_id, CAST(length(text) AS BIGINT) AS n_chars FROM documents),
         b AS (SELECT quantile_cont(n_chars, 0.1) AS lo, quantile_cont(n_chars, 0.9) AS hi FROM d)
         SELECT doc_id, n_chars FROM d, b
         WHERE n_chars >= lo AND n_chars <= hi ORDER BY doc_id""",
    "q_stratified_sample" ->
      """SELECT event_type, event_id FROM (
           SELECT event_type, event_id,
                  ROW_NUMBER() OVER (PARTITION BY event_type
                                     ORDER BY md5(CAST(event_id AS VARCHAR))) AS rn
           FROM events)
         WHERE rn <= 10 ORDER BY event_type, event_id""",
    "q_interval_join" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
         ORDER BY click_id, purchase_id""",
    "q_interval_join_stream" ->
      """SELECT c.event_id AS click_id, p.event_id AS purchase_id
         FROM events c JOIN events p
           ON c.user_id = p.user_id
          AND c.event_type = 'click' AND p.event_type = 'purchase'
          AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
         ORDER BY click_id, purchase_id""",
    "q_asof_join" ->
      """WITH p AS (SELECT event_id AS purchase_id, user_id, ts AS p_ts FROM events WHERE event_type = 'purchase'),
         c AS (SELECT event_id, user_id, ts FROM events WHERE event_type = 'click'),
         j AS (SELECT p.purchase_id, p.user_id, epoch_us(p.p_ts) AS pt_us,
                      c.event_id AS click_id, epoch_us(c.ts) AS ct_us,
                      ROW_NUMBER() OVER (PARTITION BY p.purchase_id ORDER BY c.ts DESC, c.event_id DESC) AS rn
               FROM p JOIN c ON p.user_id = c.user_id AND c.ts <= p.p_ts)
         SELECT purchase_id, user_id, pt_us, click_id, ct_us
         FROM j WHERE rn = 1 ORDER BY purchase_id""",
    "q_range_join" ->
      """SELECT b.tier, COUNT(*) AS n,
                CAST(SUM(CAST(e.value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events e
         JOIN (VALUES ('low', 0.0, 50.0), ('mid', 50.0, 150.0), ('high', 150.0, 1000.0)) b(tier, lo, hi)
           ON e.value >= b.lo AND e.value < b.hi
         GROUP BY b.tier ORDER BY b.tier""",
    "q_rolling_agg" ->
      """WITH monthly AS (
           SELECT o_custkey,
                  CAST(year(o_orderdate) * 12 + month(o_orderdate) - 1 AS INTEGER) AS month_idx,
                  SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
           FROM orders GROUP BY 1, 2)
         SELECT o_custkey, month_idx,
                CAST(SUM(m) OVER (PARTITION BY o_custkey ORDER BY month_idx
                     RANGE BETWEEN 5 PRECEDING AND CURRENT ROW) AS DOUBLE) AS rolling_6m
         FROM monthly ORDER BY o_custkey, month_idx""",
    "q_percentile" ->
      """SELECT l_returnflag,
                ROUND(quantile_cont(l_quantity, 0.25), 6) AS p25,
                ROUND(quantile_cont(l_quantity, 0.50), 6) AS p50,
                ROUND(quantile_cont(l_quantity, 0.75), 6) AS p75
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q_winsorize_grouped" ->
      """WITH b AS (
           SELECT event_type,
                  ROUND(quantile_cont(value, 0.05), 6) AS winsor_lo,
                  ROUND(quantile_cont(value, 0.95), 6) AS winsor_hi
           FROM events GROUP BY event_type)
         SELECT event_id, e.event_type, value, winsor_lo, winsor_hi,
                LEAST(GREATEST(value, winsor_lo), winsor_hi) AS value_w
         FROM events e JOIN b USING (event_type) ORDER BY event_id""",
    "q_skew_report" ->
      """WITH h AS (SELECT user_id, COUNT(*) AS n FROM events GROUP BY user_id),
         a AS (SELECT SUM(n) AS n_rows, COUNT(*) AS n_keys, MAX(n) AS max_count,
                      quantile_cont(n, 0.5) AS p50, quantile_cont(n, 0.99) AS p99,
                      CAST(SUM(CAST(n * n AS HUGEINT)) AS DOUBLE) AS ss
               FROM h)
         SELECT CAST(n_rows AS BIGINT) AS n_rows, n_keys, max_count,
                ROUND(CAST(max_count AS DOUBLE) / n_rows, 6) AS max_share,
                ROUND(p50, 6) AS p50_count, ROUND(p99, 6) AS p99_count,
                ROUND(SQRT(CAST(n_keys AS DOUBLE) * ss - CAST(n_rows AS DOUBLE) * n_rows) / n_rows, 6) AS count_cv
         FROM a""",
    "q_equidepth_hist" ->
      """WITH b AS (SELECT quantile_cont(l_extendedprice,
                             [0.125, 0.25, 0.375, 0.5, 0.625, 0.75, 0.875]) AS q
                    FROM lineitem),
         x AS (SELECT l_extendedprice AS v,
                      CAST((CASE WHEN l_extendedprice > ROUND(q[1], 4) THEN 1 ELSE 0 END) +
                           (CASE WHEN l_extendedprice > ROUND(q[2], 4) THEN 1 ELSE 0 END) +
                           (CASE WHEN l_extendedprice > ROUND(q[3], 4) THEN 1 ELSE 0 END) +
                           (CASE WHEN l_extendedprice > ROUND(q[4], 4) THEN 1 ELSE 0 END) +
                           (CASE WHEN l_extendedprice > ROUND(q[5], 4) THEN 1 ELSE 0 END) +
                           (CASE WHEN l_extendedprice > ROUND(q[6], 4) THEN 1 ELSE 0 END) +
                           (CASE WHEN l_extendedprice > ROUND(q[7], 4) THEN 1 ELSE 0 END) AS BIGINT) AS bin
               FROM lineitem, b)
         SELECT bin, ROUND(MIN(v), 2) AS lo, ROUND(MAX(v), 2) AS hi, COUNT(*) AS n
         FROM x GROUP BY bin ORDER BY bin""",
    "q_prorate" ->
      """WITH iv AS (SELECT o_orderkey, CAST(o_orderdate AS DATE) AS s,
                            CAST(o_orderdate AS DATE) + 44 AS e, o_totalprice
                     FROM orders),
         g AS (SELECT o_orderkey, s, e, o_totalprice,
                      CAST(UNNEST(generate_series(CAST(date_trunc('month', s) AS TIMESTAMP),
                                                  CAST(date_trunc('month', e) AS TIMESTAMP),
                                                  INTERVAL 1 MONTH)) AS DATE) AS m
               FROM iv)
         SELECT o_orderkey, m AS month,
                CAST(date_diff('day', GREATEST(s, m), LEAST(e, last_day(m))) + 1 AS BIGINT) AS overlap_days,
                ROUND(o_totalprice * CAST(date_diff('day', GREATEST(s, m), LEAST(e, last_day(m))) + 1 AS DOUBLE) / 45.0, 6) AS prorated
         FROM g ORDER BY o_orderkey, month""",
    "q_interval_islands" ->
      """WITH iv AS (SELECT user_id, ts AS s, ts + INTERVAL 30 MINUTE AS e FROM events),
         f AS (SELECT user_id, s, e,
                      CASE WHEN MAX(e) OVER w IS NULL OR s > MAX(e) OVER w
                           THEN 1 ELSE 0 END AS nf
               FROM iv
               WINDOW w AS (PARTITION BY user_id ORDER BY s, e
                            ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)),
         g AS (SELECT user_id, s, e,
                      SUM(nf) OVER (PARTITION BY user_id ORDER BY s, e
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island_idx
               FROM f)
         SELECT user_id, CAST(island_idx AS BIGINT) AS island_idx, epoch_us(MIN(s)) AS start_us,
                epoch_us(MAX(e)) AS end_us, COUNT(*) AS n_intervals
         FROM g GROUP BY user_id, island_idx ORDER BY user_id, island_idx""",
    "q_twap" ->
      """WITH d AS (
           SELECT user_id, value,
                  epoch_us(LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)) - epoch_us(ts) AS dt
           FROM events)
         SELECT user_id,
                ROUND(CAST(SUM(CAST(value * dt AS DECIMAL(30,6))) AS DOUBLE) / CAST(SUM(dt) AS DOUBLE), 6) AS twap,
                COUNT(*) AS n_samples
         FROM d WHERE dt IS NOT NULL
         GROUP BY user_id ORDER BY user_id""",
    "q_impute" ->
      """WITH holed AS (
           SELECT l_orderkey, l_linenumber, l_linestatus,
                  CASE WHEN l_linenumber = 3 THEN NULL ELSE l_returnflag END AS l_returnflag,
                  CASE WHEN l_linenumber = 4 THEN NULL ELSE l_quantity END AS l_quantity
           FROM lineitem),
         modes AS (
           SELECT l_linestatus, l_returnflag AS mode_flag FROM (
             SELECT l_linestatus, l_returnflag,
                    ROW_NUMBER() OVER (PARTITION BY l_linestatus
                                       ORDER BY COUNT(*) DESC, l_returnflag) AS rn
             FROM holed WHERE l_returnflag IS NOT NULL
             GROUP BY l_linestatus, l_returnflag)
           WHERE rn = 1),
         means AS (
           SELECT l_linestatus,
                  CAST(SUM(CAST(l_quantity AS DECIMAL(30,6))) AS DOUBLE) / CAST(COUNT(l_quantity) AS DOUBLE) AS mean_qty
           FROM holed GROUP BY l_linestatus)
         SELECT h.l_orderkey, h.l_linenumber, h.l_linestatus,
                COALESCE(h.l_returnflag, m.mode_flag) AS l_returnflag,
                ROUND(COALESCE(h.l_quantity, a.mean_qty), 6) AS l_quantity
         FROM holed h
         LEFT JOIN modes m USING (l_linestatus)
         LEFT JOIN means a USING (l_linestatus)
         ORDER BY l_orderkey, l_linenumber, l_linestatus, l_returnflag, l_quantity""",
    "q_mad_outliers" ->
      """WITH med AS (
           SELECT l_returnflag, quantile_cont(l_quantity, 0.5) AS median
           FROM lineitem GROUP BY 1),
         r AS (
           SELECT l.l_orderkey, l.l_linenumber, l.l_returnflag, l.l_quantity,
                  m.median, abs(l.l_quantity - m.median) AS resid
           FROM lineitem l JOIN med m USING (l_returnflag)),
         mad AS (
           SELECT l_returnflag, quantile_cont(resid, 0.5) AS mad
           FROM r GROUP BY 1)
         SELECT r.l_orderkey, r.l_linenumber, r.l_returnflag, r.l_quantity,
                r.median, m2.mad
         FROM r JOIN mad m2 USING (l_returnflag)
         WHERE r.resid > 1.5 * m2.mad
         ORDER BY l_orderkey, l_linenumber, l_returnflag, l_quantity""",
    "q_event_window" ->
      """SELECT CAST(ts AS DATE) AS event_date, CAST(hour(ts) AS INTEGER) AS event_hour, event_type,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2, 3 ORDER BY event_date, event_hour, event_type""",
    "q_event_window_stream" ->
      """SELECT CAST(ts AS DATE) AS event_date, CAST(hour(ts) AS INTEGER) AS event_hour, event_type,
                COUNT(*) AS n_events,
                CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
         FROM events GROUP BY 1, 2, 3 ORDER BY event_date, event_hour, event_type""",
    "q_sessionize" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         f AS (SELECT user_id, event_id, us,
                      CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000 THEN 1 ELSE 0 END AS newf
               FROM e),
         g AS (SELECT user_id, event_id, us,
                      CAST(SUM(newf) OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS session_idx
               FROM f)
         SELECT user_id, session_idx, COUNT(*) AS n_events, MIN(event_id) AS first_event_id,
                MAX(us) - MIN(us) AS duration_us
         FROM g GROUP BY user_id, session_idx ORDER BY user_id, session_idx""",
    "q_melt_indicators" ->
      """WITH w AS (
           SELECT l_returnflag,
                  CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_f,
                  CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS DECIMAL(18,2)) END) AS DOUBLE) AS qty_o,
                  CAST(COUNT(CASE WHEN l_linestatus = 'F' THEN 1 END) AS DOUBLE) AS cnt_f,
                  CAST(COUNT(CASE WHEN l_linestatus = 'O' THEN 1 END) AS DOUBLE) AS cnt_o
           FROM lineitem GROUP BY l_returnflag)
         SELECT * FROM (
           SELECT l_returnflag, 'qty_F' AS variable, qty_f AS value, 1 AS indicateur FROM w
           UNION ALL SELECT l_returnflag, 'qty_O', qty_o, 1 FROM w
           UNION ALL SELECT l_returnflag, 'cnt_F', cnt_f, 2 FROM w
           UNION ALL SELECT l_returnflag, 'cnt_O', cnt_o, 2 FROM w)
         ORDER BY l_returnflag, indicateur, variable""",
    "q_session_window" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         f AS (SELECT user_id, event_id, us,
                      CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000 THEN 1 ELSE 0 END AS newf
               FROM e),
         g AS (SELECT user_id, event_id, us,
                      CAST(SUM(newf) OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS session_idx
               FROM f)
         SELECT user_id, MIN(us) AS start_us, MAX(us) + 1800000000 AS end_us,
                COUNT(*) AS n_events, MIN(event_id) AS first_event_id
         FROM g GROUP BY user_id, session_idx ORDER BY user_id, start_us""",
    "q_sessionize_stream" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         f AS (SELECT user_id, event_id, us,
                      CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000 THEN 1 ELSE 0 END AS newf
               FROM e),
         g AS (SELECT user_id, event_id, us,
                      CAST(SUM(newf) OVER (PARTITION BY user_id ORDER BY us, event_id) AS BIGINT) AS session_idx
               FROM f)
         SELECT user_id, session_idx, COUNT(*) AS n_events, MIN(event_id) AS first_event_id,
                MAX(us) - MIN(us) AS duration_us
         FROM g GROUP BY user_id, session_idx ORDER BY user_id, session_idx""",
    "q_json_extract" ->
      """SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k
         FROM events ORDER BY event_id""",
    "q_grid_ingest" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",
    "q_http_ingest" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",
    "q_http_paged" ->
      """SELECT n_nationkey, n_name, n_regionkey FROM nation ORDER BY n_nationkey""",
    "q_boilerplate" ->
      """WITH d AS (SELECT doc_id,
                           regexp_replace(text, '((?:\S+ ){2}\S+) ', '\1' || chr(10), 'g') AS t
                    FROM documents),
         l AS (SELECT doc_id,
                      unnest(string_split(t, chr(10))) AS line,
                      unnest(generate_series(1, len(string_split(t, chr(10))))) AS pos
               FROM d),
         b AS (SELECT line
               FROM (SELECT line, COUNT(DISTINCT doc_id) AS nd FROM l GROUP BY line)
               WHERE nd >= 3),
         fl AS (SELECT l.doc_id, l.pos, l.line, b.line IS NOT NULL AS boiler
                FROM l LEFT JOIN b ON l.line = b.line)
         SELECT doc_id,
                COALESCE(string_agg(CASE WHEN NOT boiler THEN line END, chr(10) ORDER BY pos), '') AS text_clean,
                CAST(SUM(CASE WHEN NOT boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
                CAST(SUM(CASE WHEN boiler THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_removed
         FROM fl GROUP BY doc_id ORDER BY doc_id""",
    "q_gap_fill" ->
      """WITH m AS (SELECT o_custkey,
                           CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                           COUNT(*) AS n_orders,
                           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
                    FROM orders GROUP BY 1, 2),
         s AS (SELECT o_custkey,
                      CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month
               FROM (SELECT o_custkey, MIN(month) AS lo, MAX(month) AS hi FROM m GROUP BY 1))
         SELECT s.o_custkey, s.month,
                COALESCE(m.n_orders, 0) AS n_orders,
                COALESCE(m.revenue, 0.0) AS revenue
         FROM s LEFT JOIN m ON s.o_custkey = m.o_custkey AND s.month = m.month
         ORDER BY s.o_custkey, s.month""",
    "q_profile" ->
      """WITH p AS (
           SELECT 'l_orderkey' AS col_name, COUNT(l_orderkey) AS n_non_null,
                  COUNT(*) - COUNT(l_orderkey) AS n_null, COUNT(DISTINCT l_orderkey) AS n_distinct,
                  CAST(MIN(l_orderkey) AS VARCHAR) AS min_value, CAST(MAX(l_orderkey) AS VARCHAR) AS max_value
           FROM lineitem
           UNION ALL
           SELECT 'l_linenumber', COUNT(l_linenumber), COUNT(*) - COUNT(l_linenumber),
                  COUNT(DISTINCT l_linenumber), CAST(MIN(l_linenumber) AS VARCHAR), CAST(MAX(l_linenumber) AS VARCHAR)
           FROM lineitem
           UNION ALL
           SELECT 'l_quantity', COUNT(l_quantity), COUNT(*) - COUNT(l_quantity),
                  COUNT(DISTINCT l_quantity), CAST(MIN(l_quantity) AS VARCHAR), CAST(MAX(l_quantity) AS VARCHAR)
           FROM lineitem
           UNION ALL
           SELECT 'l_returnflag', COUNT(l_returnflag), COUNT(*) - COUNT(l_returnflag),
                  COUNT(DISTINCT l_returnflag), CAST(MIN(l_returnflag) AS VARCHAR), CAST(MAX(l_returnflag) AS VARCHAR)
           FROM lineitem
           UNION ALL
           SELECT 'l_linestatus', COUNT(l_linestatus), COUNT(*) - COUNT(l_linestatus),
                  COUNT(DISTINCT l_linestatus), CAST(MIN(l_linestatus) AS VARCHAR), CAST(MAX(l_linestatus) AS VARCHAR)
           FROM lineitem)
         SELECT * FROM p ORDER BY col_name""",
    "q_ecdf" ->
      """WITH q AS (SELECT event_id, ROUND(value, 2) AS value_q FROM events)
         SELECT event_id, value_q,
                ROUND(CUME_DIST() OVER (ORDER BY value_q), 6) AS percentile
         FROM q ORDER BY event_id""",
    "q_funnel" ->
      """WITH u1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                     WHERE event_type = 'signup' GROUP BY user_id),
         u2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN u1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts >= u1.t1 GROUP BY e.user_id),
         u3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN u2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= u2.t2 GROUP BY e.user_id)
         SELECT * FROM (
           SELECT 1 AS step_idx, 'signup' AS step, (SELECT COUNT(*) FROM u1) AS n_users
           UNION ALL
           SELECT 2, 'click', (SELECT COUNT(*) FROM u2)
           UNION ALL
           SELECT 3, 'purchase', (SELECT COUNT(*) FROM u3))
         ORDER BY step_idx""",
    "q_funnel_stream" ->
      """WITH u1 AS (SELECT user_id, MIN(ts) AS t1 FROM events
                     WHERE event_type = 'signup' GROUP BY user_id),
         u2 AS (SELECT e.user_id, MIN(e.ts) AS t2 FROM events e JOIN u1 USING (user_id)
                WHERE e.event_type = 'click' AND e.ts >= u1.t1 GROUP BY e.user_id),
         u3 AS (SELECT e.user_id, MIN(e.ts) AS t3 FROM events e JOIN u2 USING (user_id)
                WHERE e.event_type = 'purchase' AND e.ts >= u2.t2 GROUP BY e.user_id)
         SELECT * FROM (
           SELECT 1 AS step_idx, 'signup' AS step, (SELECT COUNT(*) FROM u1) AS n_users
           UNION ALL
           SELECT 2, 'click', (SELECT COUNT(*) FROM u2)
           UNION ALL
           SELECT 3, 'purchase', (SELECT COUNT(*) FROM u3))
         ORDER BY step_idx""",
    "q_heavy_hitters_stream" ->
      """SELECT event_type, CAST(user_id AS VARCHAR) AS item,
                CAST(COUNT(*) AS BIGINT) AS count_lo
         FROM events GROUP BY 1, 2 ORDER BY event_type, item""",
    "q_top_events" ->
      """SELECT event_type, CAST(rn AS INTEGER) AS rnk, value, event_id FROM (
           SELECT event_type, value, event_id,
                  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
           FROM events)
         WHERE rn <= 5 ORDER BY event_type, rnk""",
    "q_top_events_stream" ->
      """SELECT event_type, CAST(rn AS INTEGER) AS rnk, value, event_id FROM (
           SELECT event_type, value, event_id,
                  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY value DESC, event_id) AS rn
           FROM events)
         WHERE rn <= 5 ORDER BY event_type, rnk""",
    "q_tpch_q3" ->
      """SELECT l_orderkey, CAST(o_orderdate AS DATE) AS o_orderdate,
                CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount), 2) AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM customer
         JOIN orders ON c_custkey = o_custkey
         JOIN lineitem ON l_orderkey = o_orderkey
         WHERE c_mktsegment = 'BUILDING'
           AND o_orderdate < TIMESTAMP '1997-01-01'
           AND l_shipdate > TIMESTAMP '1997-01-01'
         GROUP BY l_orderkey, CAST(o_orderdate AS DATE)
         ORDER BY revenue DESC, l_orderkey LIMIT 10""",
    "q_tpch_q5" ->
      """SELECT n_name,
                CAST(SUM(CAST(ROUND(l_extendedprice * (1.0 - l_discount), 2) AS DECIMAL(18,2))) AS DOUBLE) AS revenue
         FROM lineitem
         JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
         JOIN nation ON s_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         WHERE r_name = 'ASIA'
           AND o_orderdate >= TIMESTAMP '1996-01-01'
           AND o_orderdate < TIMESTAMP '1997-01-01'
         GROUP BY n_name ORDER BY revenue DESC, n_name""",
    "q_tpch_q18" ->
      """WITH big AS (SELECT l_orderkey, SUM(l_quantity) AS total_qty
                      FROM lineitem GROUP BY l_orderkey
                      HAVING SUM(l_quantity) > 300.0)
         SELECT c_name, c_custkey, o_orderkey,
                CAST(o_orderdate AS DATE) AS o_orderdate,
                ROUND(o_totalprice, 2) AS o_totalprice, total_qty
         FROM orders
         JOIN big ON o_orderkey = big.l_orderkey
         JOIN customer ON o_custkey = c_custkey
         ORDER BY o_totalprice DESC, o_orderdate, o_orderkey LIMIT 100""",
    "q_tpch_q17" ->
      """WITH target AS (SELECT p_partkey FROM part WHERE p_brand = 'Brand#1'),
         avgs AS (SELECT l_partkey AS pk, 0.2 * AVG(l_quantity) AS lim
                  FROM lineitem JOIN target ON l_partkey = p_partkey
                  GROUP BY 1)
         SELECT COUNT(*) AS n_small,
                ROUND(CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) / 7.0, 6) AS avg_yearly
         FROM lineitem JOIN avgs ON l_partkey = pk
         WHERE l_quantity < lim""",
    "q_session_paths" ->
      """WITH e AS (SELECT user_id, event_id, event_type, epoch_us(ts) AS us FROM events),
         f AS (SELECT user_id, event_id, event_type, us,
                      CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id) > 1800000000 THEN 1 ELSE 0 END AS newf
               FROM e),
         g AS (SELECT user_id, event_id, event_type, us,
                      SUM(newf) OVER (PARTITION BY user_id ORDER BY us, event_id) AS session_idx
               FROM f),
         p AS (SELECT user_id, session_idx,
                      string_agg(event_type, '>' ORDER BY us, event_id) AS path
               FROM g GROUP BY user_id, session_idx)
         SELECT path, COUNT(*) AS n_sessions
         FROM p GROUP BY path
         ORDER BY n_sessions DESC, path LIMIT 20""",
    "q_retention" ->
      """WITH c AS (SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS DATE) AS cohort_week
                    FROM events WHERE event_type = 'signup' GROUP BY user_id),
         a AS (SELECT DISTINCT e.user_id, c.cohort_week,
                      CAST(date_diff('day', c.cohort_week, CAST(date_trunc('week', e.ts) AS DATE)) // 7 AS BIGINT) AS week_offset
               FROM events e JOIN c USING (user_id)
               WHERE CAST(date_trunc('week', e.ts) AS DATE) >= c.cohort_week)
         SELECT cohort_week, week_offset, COUNT(*) AS n_users
         FROM a GROUP BY cohort_week, week_offset
         ORDER BY cohort_week, week_offset""",
    "q_fk_check" ->
      """SELECT o_orderpriority, COUNT(*) AS n_orphans, MIN(o_orderkey) AS first_orderkey
         FROM orders o
         WHERE NOT EXISTS (SELECT 1 FROM customer c
                           WHERE c.c_custkey = o.o_custkey AND c.c_custkey < 1200)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q_forward_fill" ->
      """WITH m AS (SELECT o_custkey,
                           CAST(date_trunc('month', o_orderdate) AS DATE) AS month,
                           COUNT(*) AS n_orders,
                           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS revenue
                    FROM orders GROUP BY 1, 2),
         s AS (SELECT o_custkey,
                      CAST(unnest(generate_series(lo, hi, INTERVAL 1 MONTH)) AS DATE) AS month
               FROM (SELECT o_custkey, MIN(month) AS lo, MAX(month) AS hi FROM m GROUP BY 1)),
         j AS (SELECT s.o_custkey, s.month,
                      COALESCE(m.n_orders, 0) AS n_orders, m.revenue
               FROM s LEFT JOIN m ON s.o_custkey = m.o_custkey AND s.month = m.month)
         SELECT o_custkey, month, n_orders,
                last_value(revenue IGNORE NULLS)
                  OVER (PARTITION BY o_custkey ORDER BY month
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS revenue
         FROM j ORDER BY o_custkey, month""",
    "q_scd2" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type, epoch_us(ts) AS us, event_id
                    FROM events),
         dly AS (SELECT user_id, day, event_type
                 FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
                                                    ORDER BY us DESC, event_id DESC) AS rn
                       FROM e)
                 WHERE rn = 1),
         f AS (SELECT user_id, day, event_type,
                      CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY day)
                                IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
               FROM dly),
         g AS (SELECT user_id, day, event_type,
                      SUM(chg) OVER (PARTITION BY user_id ORDER BY day) AS run
               FROM f),
         r AS (SELECT user_id, event_type, MIN(day) AS valid_from
               FROM g GROUP BY user_id, event_type, run)
         SELECT user_id, event_type, valid_from,
                LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to
         FROM r ORDER BY user_id, valid_from""",
    "q_histogram" ->
      """WITH b AS (SELECT MIN(value) AS lo, MAX(value) AS hi,
                           (MAX(value) - MIN(value)) / 20 AS w
                    FROM events),
         x AS (SELECT CAST(LEAST(CASE WHEN b.w = 0 THEN 0
                                      ELSE FLOOR((value - b.lo) / b.w) END, 19) AS BIGINT) AS bin,
                      b.lo, b.w
               FROM events, b)
         SELECT bin, ROUND(lo + bin * w, 6) AS bin_lo, ROUND(lo + (bin + 1) * w, 6) AS bin_hi,
                COUNT(*) AS n
         FROM x GROUP BY bin, lo, w ORDER BY bin""",
    "q_corr_matrix" ->
      """WITH li AS (SELECT l_quantity AS q, l_extendedprice / 100000.0 AS e,
                            l_discount AS d, l_tax AS t
                     FROM lineitem),
         s AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n,
           CAST(SUM(CAST(FLOOR(q * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_q,
           CAST(SUM(CAST(FLOOR(q * q * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss_q,
           CAST(SUM(CAST(FLOOR(e * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_e,
           CAST(SUM(CAST(FLOOR(e * e * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss_e,
           CAST(SUM(CAST(FLOOR(d * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_d,
           CAST(SUM(CAST(FLOOR(d * d * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss_d,
           CAST(SUM(CAST(FLOOR(t * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s_t,
           CAST(SUM(CAST(FLOOR(t * t * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss_t,
           CAST(SUM(CAST(FLOOR(q * e * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sp_qe,
           CAST(SUM(CAST(FLOOR(q * d * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sp_qd,
           CAST(SUM(CAST(FLOOR(q * t * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sp_qt,
           CAST(SUM(CAST(FLOOR(e * d * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sp_ed,
           CAST(SUM(CAST(FLOOR(e * t * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sp_et,
           CAST(SUM(CAST(FLOOR(d * t * 1000000 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS sp_dt
           FROM li)
         SELECT * FROM (
           SELECT 'l_quantity' AS col_a, 'l_extendedprice' AS col_b,
                  ROUND((n * sp_qe - s_q * s_e) / SQRT((n * ss_q - s_q * s_q) * (n * ss_e - s_e * s_e)), 6) AS corr FROM s
           UNION ALL SELECT 'l_quantity', 'l_discount',
                  ROUND((n * sp_qd - s_q * s_d) / SQRT((n * ss_q - s_q * s_q) * (n * ss_d - s_d * s_d)), 6) FROM s
           UNION ALL SELECT 'l_quantity', 'l_tax',
                  ROUND((n * sp_qt - s_q * s_t) / SQRT((n * ss_q - s_q * s_q) * (n * ss_t - s_t * s_t)), 6) FROM s
           UNION ALL SELECT 'l_extendedprice', 'l_discount',
                  ROUND((n * sp_ed - s_e * s_d) / SQRT((n * ss_e - s_e * s_e) * (n * ss_d - s_d * s_d)), 6) FROM s
           UNION ALL SELECT 'l_extendedprice', 'l_tax',
                  ROUND((n * sp_et - s_e * s_t) / SQRT((n * ss_e - s_e * s_e) * (n * ss_t - s_t * s_t)), 6) FROM s
           UNION ALL SELECT 'l_discount', 'l_tax',
                  ROUND((n * sp_dt - s_d * s_t) / SQRT((n * ss_d - s_d * s_d) * (n * ss_t - s_t * s_t)), 6) FROM s)
         ORDER BY col_a, col_b""",
    "q_dedup_allpairs" ->
      """WITH t AS (SELECT doc_id,
                           (SELECT list_distinct(list_transform(generate_series(1, len(w) - 2),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                            FROM (SELECT string_split(text, ' ') AS w)) AS toks
                    FROM documents),
         p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                      ROUND(len(list_intersect(a.toks, b.toks)) * 1.0 /
                            (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) AS jaccard
               FROM t a JOIN t b ON a.doc_id < b.doc_id)
         SELECT id1, id2, jaccard FROM p WHERE jaccard >= 0.7 ORDER BY id1, id2""",
    // same shingling as q_dedup_allpairs; directional pairs, denominator
    // is the CONTAINED side's set size
    "q_containment_join" ->
      """WITH t AS (SELECT doc_id,
                           (SELECT list_distinct(list_transform(generate_series(1, len(w) - 2),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                            FROM (SELECT string_split(text, ' ') AS w)) AS toks
                    FROM documents),
         p AS (SELECT a.doc_id AS id1, b.doc_id AS id2,
                      ROUND(len(list_intersect(a.toks, b.toks)) * 1.0 / len(a.toks), 6) AS containment
               FROM t a JOIN t b ON a.doc_id <> b.doc_id
               WHERE len(a.toks) > 0 AND len(b.toks) > 0)
         SELECT id1, id2, containment FROM p WHERE containment >= 0.8 ORDER BY id1, id2""",
    // same pair construction as q_dedup_allpairs, then min-label closure
    // over the (small) near-dup components as a recursive CTE
    "q_connected_components" ->
      """WITH RECURSIVE t AS (SELECT doc_id,
                           (SELECT list_distinct(list_transform(generate_series(1, len(w) - 2),
                                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))
                            FROM (SELECT string_split(text, ' ') AS w)) AS toks
                    FROM documents),
         p AS (SELECT a.doc_id AS id1, b.doc_id AS id2
               FROM t a JOIN t b ON a.doc_id < b.doc_id
               WHERE ROUND(len(list_intersect(a.toks, b.toks)) * 1.0 /
                           (len(a.toks) + len(b.toks) - len(list_intersect(a.toks, b.toks))), 6) >= 0.7),
         e AS (SELECT id1 AS u, id2 AS v FROM p UNION SELECT id2, id1 FROM p),
         lbl AS (SELECT u AS node, u AS lab FROM e
                 UNION
                 SELECT e.u, l.lab FROM e JOIN lbl l ON e.v = l.node)
         SELECT node AS id, MIN(lab) AS component FROM lbl GROUP BY node ORDER BY id""",
    // exact all-pairs at the same threshold and shingling as minHashLsh's
    // verify step (lowercased \s+ tokens, <3-token short-doc fallback): the
    // LSH output equals this set because band recall at 128/32 is ~certain
    // for j >= 0.7 and the verify is exact
    "q_dedup_minhash" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in generate_series(1, len(t)-2)])
                  END AS s
           FROM toks),
         p AS (
           SELECT a.doc_id AS id1, b.doc_id AS id2,
                  CASE WHEN len(a.s) = 0 AND len(b.s) = 0 THEN 1.0
                       WHEN len(a.s) = 0 OR len(b.s) = 0 THEN 0.0
                       ELSE CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                            / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
                  END AS j
           FROM sh a JOIN sh b ON a.doc_id < b.doc_id)
         SELECT id1, id2, ROUND(j, 6) AS jaccard FROM p WHERE j >= 0.7 ORDER BY id1, id2""",
    // declarative winnowing replayed exactly: same grams, same md5-prefix
    // keys with the packed leftmost tie-break, same full-window rule with
    // the short-doc single-window edge, same distinct
    "q_fingerprint_winnow" ->
      """WITH g AS (
           SELECT doc_id, i AS pos,
                  ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 3)), 1, 9))::BIGINT
                    * 16777216 + i AS key
           FROM documents,
                LATERAL unnest(generate_series(1, greatest(length(text) - 2, 1))) AS t(i)),
         w AS (
           SELECT doc_id, pos,
                  MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
                  COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
           FROM g),
         sels AS (SELECT DISTINCT doc_id, sel FROM w WHERE wn = 4 OR pos = 1)
         SELECT doc_id, COUNT(*) AS n_prints, MIN(sel) AS min_print, MAX(sel) AS max_print
         FROM sels GROUP BY doc_id ORDER BY doc_id""",
    // the winnowing selection above + position strip + print-equality pair
    // join + per-doc containment summary, all replayed
    "q_fingerprint_overlap" ->
      """WITH g AS (
           SELECT doc_id, i AS pos,
                  ('0x' || substr(md5(substr(text, CAST(i AS INTEGER), 3)), 1, 9))::BIGINT
                    * 16777216 + i AS key
           FROM documents,
                LATERAL unnest(generate_series(1, greatest(length(text) - 2, 1))) AS t(i)
           WHERE doc_id < 500),
         w AS (
           SELECT doc_id, pos,
                  MIN(key) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel,
                  COUNT(*) OVER (PARTITION BY doc_id ORDER BY pos
                                 ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS wn
           FROM g),
         sels AS (SELECT DISTINCT doc_id, sel // 16777216 AS fp FROM w WHERE wn = 4 OR pos = 1),
         pr AS (SELECT a.doc_id AS id1, b.doc_id AS id2, CAST(COUNT(*) AS BIGINT) AS shared
                FROM sels a JOIN sels b ON a.fp = b.fp AND a.doc_id < b.doc_id
                GROUP BY 1, 2),
         bs AS (SELECT id1 AS doc_id, shared FROM pr UNION ALL SELECT id2, shared FROM pr)
         SELECT d.doc_id, CAST(COUNT(bs.shared) AS BIGINT) AS n_partners,
                CAST(COALESCE(MAX(bs.shared), 0) AS BIGINT) AS max_shared
         FROM documents d LEFT JOIN bs ON d.doc_id = bs.doc_id
         WHERE d.doc_id < 500
         GROUP BY 1 ORDER BY 1""",
    "q_pagerank" -> pageRankOracle,
    "q_ppr" -> pprOracle,
    "q_hits" -> hitsOracle,
    "q_ktruss" -> kTrussOracle,
    "q_textrank" -> textRankOracle,
    "q_cluster_quality" -> clusterQualityOracle,
    "q_ccf" -> ccfOracle,
    "q_dtw" -> dtwOracle,
    // five exact DECIMAL(38,0) moments, then one fixed cast·sqrt·divide
    // chain — bit-identical on any IEEE engine
    "q_assortativity" ->
      """WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (SELECT a.l_partkey AS pu, b.l_partkey AS pv
               FROM baskets a JOIN baskets b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         und AS (SELECT pu AS a, pv AS b FROM p UNION ALL SELECT pv, pu FROM p),
         deg AS (SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1),
         st AS (SELECT CAST(dx.d AS DECIMAL(38,0)) AS x, CAST(dy.d AS DECIMAL(38,0)) AS y
                FROM und JOIN deg dx ON und.a = dx.n JOIN deg dy ON und.b = dy.n),
         agg AS (SELECT CAST(COUNT(*) AS DECIMAL(38,0)) AS m,
                        CAST(SUM(x) AS DECIMAL(38,0)) AS sx, CAST(SUM(y) AS DECIMAL(38,0)) AS sy,
                        CAST(SUM(x * x) AS DECIMAL(38,0)) AS sxx,
                        CAST(SUM(y * y) AS DECIMAL(38,0)) AS syy,
                        CAST(SUM(x * y) AS DECIMAL(38,0)) AS sxy
                 FROM st)
         SELECT CAST(m / 2 AS BIGINT) AS m_edges,
                CASE WHEN m * sxx - sx * sx <> 0 AND m * syy - sy * sy <> 0
                     THEN ROUND(CAST(m * sxy - sx * sy AS DOUBLE) /
                            SQRT(CAST(m * sxx - sx * sx AS DOUBLE)
                                 * CAST(m * syy - sy * sy AS DOUBLE)), 6)
                END AS assortativity
         FROM agg""",
    // wedge join through capped intermediaries; AA terms 1e-9-quantized
    // longs before the sum, Jaccard one division of exact counts
    "q_link_predict" ->
      """WITH baskets AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         p AS (SELECT a.l_partkey AS pu, b.l_partkey AS pv
               FROM baskets a JOIN baskets b
                 ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
               GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         und AS (SELECT pu AS a, pv AS b FROM p UNION ALL SELECT pv, pu FROM p),
         deg AS (SELECT a AS n, CAST(COUNT(*) AS BIGINT) AS d FROM und GROUP BY 1),
         mid AS (SELECT u.a AS z, u.b AS x, deg.d AS dz
                 FROM und u JOIN deg ON u.a = deg.n WHERE deg.d <= 200),
         wedge AS (SELECT m1.z, m1.x, m2.x AS y, m1.dz
                   FROM mid m1 JOIN mid m2 ON m1.z = m2.z AND m1.x < m2.x),
         pr AS (SELECT x, y, CAST(COUNT(*) AS BIGINT) AS cn,
                  CAST(SUM(CAST(FLOOR(1e9 / CAST(dz AS DOUBLE) + 0.5) AS BIGINT)) AS BIGINT) AS raq
                FROM wedge GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         ne AS (SELECT pr.* FROM pr LEFT JOIN p ON pr.x = p.pu AND pr.y = p.pv
                WHERE p.pu IS NULL)
         SELECT ne.x AS u, ne.y AS v, ne.cn AS common_neighbors,
                ROUND(CAST(ne.cn AS DOUBLE) / CAST(dx.d + dy.d - ne.cn AS DOUBLE), 6) AS jaccard,
                ROUND(CAST(ne.raq AS DOUBLE) / 1e9, 6) AS resource_alloc
         FROM ne JOIN deg dx ON ne.x = dx.n JOIN deg dy ON ne.y = dy.n
         ORDER BY u, v""",
    "q_label_prop" -> labelPropOracle,
    "q_kmeans" -> kMeansOracle,
    "q_modularity" -> modularityOracle,
    "q_huber" -> huberOracle,
    "q_geo_median" -> geoMedianOracle,
    // same format-priority try-parse chain; strftime renders, try_strptime
    // recovers; the garbage bucket must stay NULL on both engines
    "q_coerce_timestamps" ->
      """WITH messy AS (
           SELECT o_orderkey,
                  CASE WHEN o_orderkey % 4 = 0 THEN strftime(o_orderdate, '%Y-%m-%d %H:%M:%S')
                       WHEN o_orderkey % 4 = 1 THEN strftime(o_orderdate, '%m/%d/%Y')
                       WHEN o_orderkey % 4 = 2 THEN strftime(o_orderdate, '%Y%m%d')
                       ELSE 'not a date' END AS raw
           FROM orders)
         SELECT o_orderkey, raw,
                epoch_us(COALESCE(
                  try_strptime(raw, '%Y-%m-%d %H:%M:%S'),
                  try_strptime(raw, '%m/%d/%Y'),
                  try_strptime(raw, '%Y%m%d'))) AS parsed_us
         FROM messy ORDER BY o_orderkey""",
    "q_winsorize" ->
      """WITH b AS (SELECT ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.01), 4) AS lo,
                           ROUND(quantile_cont(CAST(o_totalprice AS DOUBLE), 0.99), 4) AS hi
                    FROM orders)
         SELECT o_orderkey, o_totalprice,
                ROUND(LEAST(GREATEST(CAST(o_totalprice AS DOUBLE), b.lo), b.hi), 2) AS winsorized
         FROM orders, b ORDER BY o_orderkey""",
    // IGNORE NULLS last_value over the strictly-preceding frame — the same
    // forward-fill idiom as q_forward_fill's oracle; integer-div latency
    "q_attribution" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
         t AS (
           SELECT user_id, event_id, event_type, us,
                  last_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END IGNORE NULLS)
                    OVER win AS touch_event_id,
                  last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END IGNORE NULLS)
                    OVER win AS touch_type,
                  last_value(CASE WHEN event_type IN ('click', 'view') THEN us END IGNORE NULLS)
                    OVER win AS touch_us
           FROM e
           WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT user_id, event_id AS conversion_id, us AS conversion_us,
                touch_event_id, touch_type, (us - touch_us) // 1000000 AS latency_sec
         FROM t WHERE event_type = 'purchase' ORDER BY conversion_id""",
    // the streaming fold must land on the batch window's answer exactly
    "q_attribution_stream" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type, epoch_us(ts) AS us
           FROM events),
         t AS (
           SELECT user_id, event_id, event_type, us,
                  last_value(CASE WHEN event_type IN ('click', 'view') THEN event_id END IGNORE NULLS)
                    OVER win AS touch_event_id,
                  last_value(CASE WHEN event_type IN ('click', 'view') THEN event_type END IGNORE NULLS)
                    OVER win AS touch_type,
                  last_value(CASE WHEN event_type IN ('click', 'view') THEN us END IGNORE NULLS)
                    OVER win AS touch_us
           FROM e
           WINDOW win AS (PARTITION BY user_id ORDER BY us, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
         SELECT user_id, event_id AS conversion_id, us AS conversion_us,
                touch_event_id, touch_type, (us - touch_us) // 1000000 AS latency_sec
         FROM t WHERE event_type = 'purchase' ORDER BY conversion_id""",
    // same quantized-long window sums, same division structure — doubles
    // agree bit-for-bit, so z AND the boolean flag hash-match
    "q_rolling_zscore" ->
      """WITH q AS (
           SELECT event_id, event_type, ts, value,
                  CAST(floor(value * 100 + 0.5) AS BIGINT) AS v
           FROM events),
         w AS (
           SELECT event_id, event_type, value,
                  COUNT(*) OVER win AS n,
                  CAST(SUM(v) OVER win AS BIGINT) AS s,
                  CAST(SUM(v * v) OVER win AS BIGINT) AS ss
           FROM q
           WINDOW win AS (PARTITION BY event_type ORDER BY ts, event_id
                          ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)),
         t AS (
           SELECT event_id, event_type, n, value,
                  CAST(s AS DOUBLE) / CAST(n * 100 AS DOUBLE) AS mean,
                  SQRT(GREATEST(
                    (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                      / (CAST(n - 1 AS DOUBLE) * 10000), 0.0)) AS sd
           FROM w),
         z AS (
           SELECT event_id, event_type, n AS n_window,
                  CASE WHEN n >= 5 AND sd > 0.0 THEN (value - mean) / sd END AS zu
           FROM t)
         SELECT event_id, event_type, n_window, ROUND(zu, 6) AS z,
                COALESCE(ABS(zu) > 3.0, false) AS is_outlier
         FROM z ORDER BY event_id""",
    // exact cross-corpus all-pairs at the same threshold/shingling as the
    // near-dup contamination verify (identical-doc pairs are certain LSH
    // hits; near-dup partners follow the q_dedup_minhash recall argument)
    "q_decontaminate_neardup" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in generate_series(1, len(t)-2)])
                  END AS s
           FROM toks),
         ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 31 = 0),
         p AS (
           SELECT t.doc_id AS train_id, e.eval_id,
                  CASE WHEN len(t.s) = 0 AND len(e.s) = 0 THEN 1.0
                       WHEN len(t.s) = 0 OR len(e.s) = 0 THEN 0.0
                       ELSE CAST(len(list_intersect(t.s, e.s)) AS DOUBLE)
                            / CAST(len(t.s) + len(e.s) - len(list_intersect(t.s, e.s)) AS DOUBLE)
                  END AS j
           FROM sh t CROSS JOIN ev e)
         SELECT train_id, eval_id, ROUND(j, 6) AS jaccard
         FROM p WHERE j >= 0.7 ORDER BY train_id, eval_id""",
    "q_decontaminate_neardup_stream" ->
      """WITH toks AS (
           SELECT doc_id, list_filter(string_split_regex(lower(text), '\s+'), x -> x <> '') AS t
           FROM documents),
         sh AS (
           SELECT doc_id,
                  CASE WHEN len(t) = 0 THEN CAST([] AS VARCHAR[])
                       WHEN len(t) < 3 THEN [array_to_string(t, ' ')]
                       ELSE list_distinct([t[i] || ' ' || t[i+1] || ' ' || t[i+2] for i in generate_series(1, len(t)-2)])
                  END AS s
           FROM toks),
         ev AS (SELECT doc_id AS eval_id, s FROM sh WHERE doc_id % 31 = 0),
         p AS (
           SELECT t.doc_id AS train_id, e.eval_id,
                  CASE WHEN len(t.s) = 0 AND len(e.s) = 0 THEN 1.0
                       WHEN len(t.s) = 0 OR len(e.s) = 0 THEN 0.0
                       ELSE CAST(len(list_intersect(t.s, e.s)) AS DOUBLE)
                            / CAST(len(t.s) + len(e.s) - len(list_intersect(t.s, e.s)) AS DOUBLE)
                  END AS j
           FROM sh t CROSS JOIN ev e)
         SELECT train_id, eval_id, ROUND(j, 6) AS jaccard
         FROM p WHERE j >= 0.7 ORDER BY train_id, eval_id""",
    // the planted scaled copies are the only pairs that can reach 0.99
    // cosine; LSH recall on them is exactly 1 (scaling preserves every
    // hyperplane sign), so the full near-dup pipeline must emit precisely
    // this set
    "q_dedup_embedding" ->
      """WITH u AS (
           SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
           UNION ALL
           SELECT vec_id + 1000000 AS vec_id,
                  list_transform(CAST(embedding AS DOUBLE[]), x -> x * 2.0) AS v
           FROM embeddings WHERE vec_id % 7 = 0),
         p AS (
           SELECT a.vec_id AS id1, b.vec_id AS id2, list_cosine_similarity(a.v, b.v) AS sim
           FROM u a JOIN u b ON a.vec_id < b.vec_id)
         SELECT id1, id2, ROUND(sim, 6) AS sim FROM p WHERE sim >= 0.99 ORDER BY id1, id2""",
    // exact brute-force top-3: the SQ8 shortlist (rerank*k = 12) provably
    // contains the true top-3 on this corpus, and the float rerank restores
    // exact ranking, so the quantized path must equal brute force
    "q_ann_quantized" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 8),
         scored AS (
           SELECT q.query_id, e.vec_id, list_cosine_similarity(q.qv, CAST(e.embedding AS DOUBLE[])) AS sim
           FROM embeddings e CROSS JOIN q WHERE e.vec_id <> q.query_id),
         ranked AS (
           SELECT query_id, vec_id, sim,
                  ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
           FROM scored)
         SELECT query_id, vec_id, ROUND(sim, 6) AS sim, rn AS rnk
         FROM ranked WHERE rn <= 3 ORDER BY query_id, rnk""",
    // PQ's 16-codeword sample codebook is too coarse for the exact-regime
    // shortcut — this oracle replays the FULL pipeline instead: encode
    // (per-subspace quantized-long argmin, ties to the lower code), ADC
    // lookup-table sums, the (adc asc, id asc) shortlist, exact rerank
    "q_ann_pq" -> pqOracle,
    "q_kcenter" -> kcenterOracle,
    "q_isotonic" -> isotonicOracle,
    "q_mmr" -> mmrOracle,
    "q_lttb" -> lttbOracle,
    "q_weighted_sample" ->
      """WITH k AS (SELECT doc_id, n_chars,
                           -LN((('0x' || substr(md5(CAST(doc_id AS VARCHAR) || ':graft'), 1, 15))::BIGINT
                                + 0.5) / 1152921504606846976.0) / n_chars AS draw
                    FROM documents)
         SELECT doc_id, n_chars, ROUND(draw, 6) AS draw
         FROM k ORDER BY draw, doc_id LIMIT 50""",
    "q_ecdf_grouped" ->
      """WITH q AS (SELECT event_id, event_type, ROUND(value, 2) AS value_q FROM events)
         SELECT event_id, event_type, value_q,
                ROUND(CUME_DIST() OVER (PARTITION BY event_type ORDER BY value_q), 6) AS percentile
         FROM q ORDER BY event_id""",
    "q_llm_pipeline3" ->
      """WITH g AS (
           SELECT doc_id,
                  CAST(len(regexp_extract_all(text, '\S+')) AS BIGINT) AS w,
                  CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS nonws,
                  CAST(len(regexp_extract_all(text, '#|\.\.\.|…')) AS BIGINT) AS sym,
                  CAST(len(string_split(text, chr(10))) AS BIGINT) AS nlines,
                  CAST(len(regexp_extract_all(text, '(?m)^[-*•]')) AS BIGINT) AS bul,
                  CAST(len(regexp_extract_all(text, '(?m)(\.\.\.|…)$')) AS BIGINT) AS ell,
                  CAST(len(regexp_extract_all(text, '\S*[A-Za-z]\S*')) AS BIGINT) AS alpha,
                  CAST(CASE WHEN regexp_matches(lower(text), '\bthe\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(lower(text), '\ba\b') THEN 1 ELSE 0 END
                     + CASE WHEN regexp_matches(lower(text), '\bspark\b') THEN 1 ELSE 0 END AS BIGINT) AS sh
           FROM documents),
         gk AS (
           SELECT doc_id FROM g
           WHERE w >= 5 AND w <= 100000
             AND ROUND(CAST(nonws AS DOUBLE) / CAST(greatest(w, 1) AS DOUBLE), 6) >= 3.0
             AND ROUND(CAST(nonws AS DOUBLE) / CAST(greatest(w, 1) AS DOUBLE), 6) <= 10.0
             AND ROUND(CAST(sym AS DOUBLE) / CAST(greatest(w, 1) AS DOUBLE), 6) <= 0.1
             AND ROUND(CAST(bul AS DOUBLE) / CAST(nlines AS DOUBLE), 6) <= 0.9
             AND ROUND(CAST(ell AS DOUBLE) / CAST(nlines AS DOUBLE), 6) <= 0.3
             AND ROUND(CAST(alpha AS DOUBLE) / CAST(greatest(w, 1) AS DOUBLE), 6) >= 0.8
             AND sh >= 2),
         kept AS (SELECT d.doc_id, d.source, d.text FROM documents d JOIN gk USING (doc_id)),
         c AS (SELECT source, CAST(COUNT(*) AS BIGINT) AS n_rows FROM kept GROUP BY 1),
         t AS (SELECT CAST(SUM(n_rows) AS BIGINT) AS N FROM c),
         p AS (SELECT source,
                      CAST(n_rows AS DOUBLE) / CAST(N AS DOUBLE) AS pp,
                      CAST(FLOOR(POWER(CAST(n_rows AS DOUBLE) / CAST(N AS DOUBLE), 0.7)
                                 * 1000000000000.0 + 0.5) AS BIGINT) AS paq
               FROM c, t),
         z AS (SELECT CAST(SUM(paq) AS BIGINT) AS Z FROM p),
         wt AS (SELECT source,
                       ROUND(CAST(paq AS DOUBLE) / CAST(Z AS DOUBLE) / pp, 6) AS weight
                FROM p, z),
         dd AS (SELECT doc_id,
                       regexp_replace(text, '((?:\S+ ){2}\S+) ', '\1' || chr(10), 'g') AS t
                FROM kept),
         l AS (SELECT doc_id,
                      unnest(string_split(t, chr(10))) AS line,
                      unnest(generate_series(1, len(string_split(t, chr(10))))) AS pos
               FROM dd),
         w AS (SELECT line, doc_id, pos
               FROM (SELECT line, doc_id, pos,
                            ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
                     FROM l WHERE line <> '')
               WHERE rn = 1),
         fl AS (SELECT l.doc_id, l.pos, l.line, w.line IS NOT NULL AS keep
                FROM l LEFT JOIN w
                  ON l.line = w.line AND l.doc_id = w.doc_id AND l.pos = w.pos),
         agg AS (SELECT doc_id,
                        CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
                        CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_removed
                 FROM fl GROUP BY doc_id)
         SELECT a.doc_id, k.source, a.n_lines_kept, a.n_lines_removed, wt.weight
         FROM agg a JOIN kept k ON a.doc_id = k.doc_id JOIN wt ON k.source = wt.source
         ORDER BY a.doc_id""",
    "q_dedup_lines" ->
      """WITH d AS (SELECT doc_id,
                           regexp_replace(text, '((?:\S+ ){2}\S+) ', '\1' || chr(10), 'g') AS t
                    FROM documents),
         l AS (SELECT doc_id,
                      unnest(string_split(t, chr(10))) AS line,
                      unnest(generate_series(1, len(string_split(t, chr(10))))) AS pos
               FROM d),
         w AS (SELECT line, doc_id, pos
               FROM (SELECT line, doc_id, pos,
                            ROW_NUMBER() OVER (PARTITION BY line ORDER BY doc_id, pos) AS rn
                     FROM l WHERE line <> '')
               WHERE rn = 1),
         fl AS (SELECT l.doc_id, l.pos, l.line, w.line IS NOT NULL AS keep
                FROM l LEFT JOIN w
                  ON l.line = w.line AND l.doc_id = w.doc_id AND l.pos = w.pos)
         SELECT doc_id,
                COALESCE(string_agg(CASE WHEN keep THEN line END, chr(10) ORDER BY pos), '') AS text_clean,
                CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_kept,
                CAST(SUM(CASE WHEN NOT keep THEN 1 ELSE 0 END) AS BIGINT) AS n_lines_removed
         FROM fl GROUP BY doc_id ORDER BY doc_id""",
    // the oracle brute-forces the cross product (trivial at oracle scale);
    // the Spark side must produce the identical pair set through the grid —
    // CAST(100.0/60.0/... AS DOUBLE) forces DuckDB off its decimal literals
    // onto the same IEEE path Spark takes
    "q_spatial_join" ->
      """WITH c AS (SELECT c_custkey,
                           (CAST(c_custkey AS BIGINT) * 7919 % 12000) / CAST(100.0 AS DOUBLE) - CAST(60.0 AS DOUBLE) AS lat,
                           (CAST(c_custkey AS BIGINT) * 104729 % 36000) / CAST(100.0 AS DOUBLE) - CAST(180.0 AS DOUBLE) AS lon
                    FROM customer),
         s AS (SELECT s_suppkey,
                      (CAST(s_suppkey AS BIGINT) * 6367 % 12000) / CAST(100.0 AS DOUBLE) - CAST(60.0 AS DOUBLE) AS lat,
                      (CAST(s_suppkey AS BIGINT) * 9973 % 36000) / CAST(100.0 AS DOUBLE) - CAST(180.0 AS DOUBLE) AS lon
               FROM supplier),
         p AS (SELECT s.s_suppkey, c.c_custkey,
                      2 * 6371.0088 * ASIN(LEAST(CAST(1.0 AS DOUBLE),
                        SQRT(SIN(RADIANS(c.lat - s.lat)/2) * SIN(RADIANS(c.lat - s.lat)/2)
                           + COS(RADIANS(s.lat)) * COS(RADIANS(c.lat))
                             * SIN(RADIANS(c.lon - s.lon)/2) * SIN(RADIANS(c.lon - s.lon)/2)))) AS km
               FROM s CROSS JOIN c)
         SELECT s_suppkey, c_custkey, ROUND(km, 4) AS dist_km
         FROM p WHERE km <= 800.0 ORDER BY s_suppkey, c_custkey""",
    // survival = exp(windowed Σ ln(1-d/n)): counts exact BIGINT to the last
    // step; the GREATEST(1e-300, ·) clamp mirrors the Spark side so the
    // d = n step underflows to 0.0 instead of tripping ±inf semantics
    "q_survival" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders),
         mx AS (SELECT MAX(od) AS maxd FROM o),
         spans AS (SELECT o_custkey,
                          CAST(datediff('day', MIN(od), MAX(od)) AS BIGINT) AS duration,
                          (datediff('day', MAX(od), (SELECT maxd FROM mx)) > 180) AS churned
                   FROM o GROUP BY 1),
         j AS (SELECT c.c_mktsegment, sp.duration, sp.churned
               FROM spans sp JOIN customer c ON sp.o_custkey = c.c_custkey),
         g AS (SELECT c_mktsegment, duration,
                      CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d_events,
                      CAST(COUNT(*) AS BIGINT) AS at_t
               FROM j GROUP BY 1, 2),
         w AS (SELECT c_mktsegment, duration, d_events, at_t,
                      SUM(at_t) OVER (PARTITION BY c_mktsegment) AS tot,
                      SUM(at_t) OVER (PARTITION BY c_mktsegment ORDER BY duration
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM g),
         k AS (SELECT c_mktsegment, duration, d_events,
                      CAST(tot - (cum - at_t) AS BIGINT) AS n_risk,
                      SUM(CASE WHEN d_events > 0
                               THEN LN(GREATEST(CAST(1e-300 AS DOUBLE),
                                        CAST(1.0 AS DOUBLE) - CAST(d_events AS DOUBLE) /
                                          CAST(tot - (cum - at_t) AS DOUBLE)))
                               ELSE CAST(0.0 AS DOUBLE) END)
                        OVER (PARTITION BY c_mktsegment ORDER BY duration
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum,
                      SUM(CAST(d_events AS DOUBLE) / CAST(tot - (cum - at_t) AS DOUBLE))
                        OVER (PARTITION BY c_mktsegment ORDER BY duration
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hsum
               FROM w)
         SELECT c_mktsegment, duration, d_events, n_risk,
                ROUND(EXP(lsum), 6) AS survival,
                ROUND(hsum, 6) AS cum_hazard
         FROM k ORDER BY c_mktsegment, duration""",
    // the q_survival scaffolding + the Greenwood running term and the
    // d=n dead flag; the same sequential window chain both engines replay
    "q_km_greenwood" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders),
         mx AS (SELECT MAX(od) AS maxd FROM o),
         spans AS (SELECT o_custkey,
                          CAST(datediff('day', MIN(od), MAX(od)) AS BIGINT) AS duration,
                          (datediff('day', MAX(od), (SELECT maxd FROM mx)) > 180) AS churned
                   FROM o GROUP BY 1),
         j AS (SELECT c.c_mktsegment, sp.duration, sp.churned
               FROM spans sp JOIN customer c ON sp.o_custkey = c.c_custkey),
         g AS (SELECT c_mktsegment, duration,
                      CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d_events,
                      CAST(COUNT(*) AS BIGINT) AS at_t
               FROM j GROUP BY 1, 2),
         w AS (SELECT c_mktsegment, duration, d_events, at_t,
                      SUM(at_t) OVER (PARTITION BY c_mktsegment) AS tot,
                      SUM(at_t) OVER (PARTITION BY c_mktsegment ORDER BY duration
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM g),
         k AS (SELECT c_mktsegment, duration, d_events,
                      CAST(tot - (cum - at_t) AS BIGINT) AS n_risk,
                      SUM(CASE WHEN d_events > 0
                               THEN LN(GREATEST(CAST(1e-300 AS DOUBLE),
                                        CAST(1.0 AS DOUBLE) - CAST(d_events AS DOUBLE) /
                                          CAST(tot - (cum - at_t) AS DOUBLE)))
                               ELSE CAST(0.0 AS DOUBLE) END)
                        OVER (PARTITION BY c_mktsegment ORDER BY duration
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS lsum,
                      SUM(CASE WHEN d_events > 0 AND d_events < tot - (cum - at_t)
                               THEN CAST(d_events AS DOUBLE) /
                                    (CAST(tot - (cum - at_t) AS DOUBLE) *
                                     CAST(tot - (cum - at_t) - d_events AS DOUBLE))
                               ELSE CAST(0.0 AS DOUBLE) END)
                        OVER (PARTITION BY c_mktsegment ORDER BY duration
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS gsum,
                      MAX(CASE WHEN d_events = tot - (cum - at_t) THEN 1 ELSE 0 END)
                        OVER (PARTITION BY c_mktsegment ORDER BY duration
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dead
               FROM w)
         SELECT c_mktsegment, duration, d_events, n_risk,
                ROUND(EXP(lsum), 6) AS survival,
                CASE WHEN dead = 0 THEN
                  ROUND(SQRT(EXP(lsum) * EXP(lsum) * gsum), 6) END AS se,
                CASE WHEN dead = 0 THEN
                  ROUND(GREATEST(CAST(0.0 AS DOUBLE), EXP(lsum)
                    - 1.959964 * SQRT(EXP(lsum) * EXP(lsum) * gsum)), 6) END AS ci_lo,
                CASE WHEN dead = 0 THEN
                  ROUND(LEAST(CAST(1.0 AS DOUBLE), EXP(lsum)
                    + 1.959964 * SQRT(EXP(lsum) * EXP(lsum) * gsum)), 6) END AS ci_hi
         FROM k ORDER BY c_mktsegment, duration""",
    // the q_survival KM replay + lead/segment integral; interval terms use
    // the 6dp-rounded survival times exact long lengths, 1e-6 quantized —
    // mirrors Temporal.rmst exactly
    "q_rmst" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders),
         mx AS (SELECT MAX(od) AS maxd FROM o),
         spans AS (SELECT o_custkey,
                          CAST(datediff('day', MIN(od), MAX(od)) AS BIGINT) AS duration,
                          (datediff('day', MAX(od), (SELECT maxd FROM mx)) > 180) AS churned
                   FROM o GROUP BY 1),
         j AS (SELECT c.c_mktsegment, sp.duration, sp.churned
               FROM spans sp JOIN customer c ON sp.o_custkey = c.c_custkey),
         g AS (SELECT c_mktsegment, duration,
                      CAST(SUM(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT) AS d_events,
                      CAST(COUNT(*) AS BIGINT) AS at_t
               FROM j GROUP BY 1, 2),
         w AS (SELECT c_mktsegment, duration, d_events, at_t,
                      SUM(at_t) OVER (PARTITION BY c_mktsegment) AS tot,
                      SUM(at_t) OVER (PARTITION BY c_mktsegment ORDER BY duration
                                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
               FROM g),
         k AS (SELECT c_mktsegment, duration,
                      ROUND(EXP(SUM(CASE WHEN d_events > 0
                               THEN LN(GREATEST(CAST(1e-300 AS DOUBLE),
                                        CAST(1.0 AS DOUBLE) - CAST(d_events AS DOUBLE) /
                                          CAST(tot - (cum - at_t) AS DOUBLE)))
                               ELSE CAST(0.0 AS DOUBLE) END)
                        OVER (PARTITION BY c_mktsegment ORDER BY duration
                              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)), 6) AS survival
               FROM w),
         segd AS (SELECT c_mktsegment, duration, survival,
                         GREATEST(CAST(0 AS BIGINT),
                           LEAST(COALESCE(LEAD(duration) OVER
                                   (PARTITION BY c_mktsegment ORDER BY duration), 365), 365)
                           - LEAST(duration, 365)) AS seg,
                         MIN(duration) OVER (PARTITION BY c_mktsegment) AS mind
                  FROM k)
         SELECT c_mktsegment, CAST(365 AS BIGINT) AS horizon,
                ROUND(CAST(MAX(LEAST(mind, 365)) AS DOUBLE)
                      + CAST(SUM(CAST(FLOOR(survival * CAST(seg AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE)
                        / 1000000.0, 6) AS rmst,
                CAST(COUNT(*) AS BIGINT) AS n_times
         FROM segd GROUP BY 1 ORDER BY 1""",
    // exact long cross products feed one-division WOE chains; IV terms
    // quantized to 1e-9 longs before the sum
    "q_woe_iv" ->
      """WITH j AS (SELECT n.n_name AS category,
                CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y
              FROM orders o
              JOIN customer c ON o.o_custkey = c.c_custkey
              JOIN nation n ON c.c_nationkey = n.n_nationkey),
         a AS (SELECT category,
                 CAST(SUM(1 - y) AS BIGINT) AS n_good,
                 CAST(SUM(y) AS BIGINT) AS n_bad
               FROM j GROUP BY 1),
         w AS (SELECT category, n_good, n_bad,
                 CAST(SUM(n_good) OVER () AS BIGINT) AS g,
                 CAST(SUM(n_bad) OVER () AS BIGINT) AS b
               FROM a),
         t AS (SELECT category, n_good, n_bad, g, b,
                 LN(CAST(n_good * b AS DOUBLE) / CAST(n_bad * g AS DOUBLE)) AS woe,
                 CAST(n_good * b - n_bad * g AS DOUBLE) / CAST(g * b AS DOUBLE) AS diff,
                 (n_good > 0 AND n_bad > 0) AS ok
               FROM w)
         SELECT category, n_good, n_bad,
                CASE WHEN ok THEN ROUND(woe, 6) END AS woe,
                CASE WHEN ok THEN ROUND(diff * woe, 6) END AS iv_term,
                ROUND(CAST(SUM(CASE WHEN ok
                        THEN CAST(FLOOR(diff * woe * 1e9 + 0.5) AS BIGINT)
                        ELSE 0 END) OVER () AS DOUBLE) / 1e9, 6) AS iv
         FROM t ORDER BY category""",
    // NTILE over an explicit (score DESC, orderkey) total order; rate and
    // gain single divisions, lift one division of exact cross products
    "q_lift_table" ->
      """WITH j AS (SELECT c.c_mktsegment AS g, o.o_orderkey,
                CASE WHEN o.o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS y,
                CAST(FLOOR(o.o_totalprice * 100 + 0.5) AS BIGINT) AS v
              FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
         bn AS (SELECT g, y,
                 NTILE(10) OVER (PARTITION BY g ORDER BY v DESC, o_orderkey) AS b
                FROM j),
         p AS (SELECT g, b, CAST(COUNT(*) AS BIGINT) AS n,
                      CAST(SUM(y) AS BIGINT) AS r
               FROM bn GROUP BY 1, 2),
         w AS (SELECT g, b, n, r,
                 CAST(SUM(n) OVER (PARTITION BY g) AS BIGINT) AS nt,
                 CAST(SUM(r) OVER (PARTITION BY g) AS BIGINT) AS rt,
                 CAST(SUM(r) OVER (PARTITION BY g ORDER BY b ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS rc
               FROM p)
         SELECT g AS c_mktsegment, b AS bucket, n, r AS responders,
                ROUND(CAST(r AS DOUBLE) / CAST(n AS DOUBLE), 6) AS response_rate,
                CASE WHEN rt > 0 THEN ROUND(CAST(r * nt AS DOUBLE) / CAST(n * rt AS DOUBLE), 6) END AS lift,
                CASE WHEN rt > 0 THEN ROUND(CAST(rc AS DOUBLE) / CAST(rt AS DOUBLE), 6) END AS cum_gain
         FROM w ORDER BY c_mktsegment, bucket""",
    // tie-aware Mann–Whitney rank identity: doubled positive rank-sums are
    // exact longs, AUC is one integer division
        // step-rule AP over the descending distinct-score collapse, per-block
    // terms floor-quantized to 1e-9 — mirrors Sketches.averagePrecision
    "q_avg_precision" ->
      """WITH b AS (SELECT o_orderpriority = '1-URGENT' AS urgent,
                           CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                    FROM orders),
         h AS (SELECT cents AS v,
                      CAST(SUM(CASE WHEN urgent THEN 1 ELSE 0 END) AS BIGINT) AS p,
                      CAST(COUNT(*) AS BIGINT) AS c
               FROM b GROUP BY 1),
         t AS (SELECT CAST(SUM(p) AS BIGINT) AS np, CAST(SUM(c) AS BIGINT) AS nt FROM h),
         cs AS (SELECT v, p, c,
                  CAST(SUM(c) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cn,
                  CAST(SUM(p) OVER (ORDER BY v DESC ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS tp
                FROM h)
         SELECT MAX(np) AS n_pos, MAX(nt) - MAX(np) AS n_neg,
                ROUND(CAST(SUM(CASE WHEN np > 0 THEN
                        CAST(FLOOR(CAST(p * tp AS DOUBLE) / CAST(np * cn AS DOUBLE) * 1e9 + 0.5) AS BIGINT)
                      END) AS DOUBLE) / 1e9, 6) AS ap
         FROM cs CROSS JOIN t""",
    "q_roc_auc" ->
      """WITH src AS (SELECT (o_orderpriority = '1-URGENT') AS pos,
                CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
              FROM orders),
         h AS (SELECT v,
                 CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS p,
                 CAST(COUNT(*) AS BIGINT) AS c
               FROM src GROUP BY 1),
         w AS (SELECT p, c,
                 CAST(SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS BIGINT) AS before
               FROM h)
         SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
                CAST(SUM(c) - SUM(p) AS BIGINT) AS n_neg,
                ROUND(CAST(SUM(p * (before * 2 + c + 1)) - SUM(p) * (SUM(p) + 1) AS DOUBLE)
                      / CAST(SUM(p) * (SUM(c) - SUM(p)) * 2 AS DOUBLE), 6) AS auc
         FROM w""",
    // exact-rational throughout: step numerators |cumA·nB − cumB·nA|·Δx are
    // exact integers in DECIMAL(38,0), the distance ONE division at the end
    "q_wasserstein" -> wassersteinOracle,
    // integer count state ⇒ the streaming twin equals batch bit-exactly
    "q_wasserstein_stream" -> wassersteinOracle,
    // the wasserstein scaffolding with squared common-denominator
    // numerators; each statistic one division of exact DECIMAL integers
    "q_cvm" ->
      """WITH src AS (SELECT o_orderpriority AS g,
                CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
              FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         h AS (SELECT v,
                 CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN g <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS cb
               FROM src GROUP BY 1),
         w AS (SELECT v, ca, cb,
                 CAST(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fa,
                 CAST(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fb,
                 CAST(SUM(ca) OVER () AS BIGINT) AS na,
                 CAST(SUM(cb) OVER () AS BIGINT) AS nb,
                 CAST(COALESCE(LEAD(v) OVER (ORDER BY v) - v, 0) AS BIGINT) AS dx
               FROM h),
         q AS (SELECT ca, cb, dx, na, nb,
                 CAST(fa * nb - fb * na AS DECIMAL(38,0))
                   * CAST(fa * nb - fb * na AS DECIMAL(38,0)) AS num
               FROM w)
         SELECT '1-URGENT' AS group_a, '5-LOW' AS group_b,
                MAX(na) AS n_a, MAX(nb) AS n_b,
                ROUND(CAST(SUM(num * CAST(ca + cb AS DECIMAL(38,0))) AS DOUBLE)
                      / CAST(CAST(MAX(na) + MAX(nb) AS DECIMAL(38,0))
                             * CAST(MAX(na) + MAX(nb) AS DECIMAL(38,0))
                             * CAST(MAX(na) AS DECIMAL(38,0))
                             * CAST(MAX(nb) AS DECIMAL(38,0)) AS DOUBLE), 6) AS cvm,
                ROUND(CAST(SUM(num * CAST(dx AS DECIMAL(38,0))) * 2 AS DOUBLE)
                      / CAST(CAST(MAX(na) AS DECIMAL(38,0)) * CAST(MAX(nb) AS DECIMAL(38,0))
                             * CAST(MAX(na) AS DECIMAL(38,0)) * CAST(MAX(nb) AS DECIMAL(38,0)) AS DOUBLE), 6) AS energy_sq
         FROM q""",
    // histogram + clipped-multiplicity trimmed sums + order-statistic
    // winsorization points + exact HUGEINT winsorized moments — mirrors
    // Sketches.yuenTTest chain for chain (k via the same IEEE floor(n*.2))
    "q_yuen" ->
      """WITH src AS (SELECT o_orderpriority AS g,
                CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
              FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         h AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM src GROUP BY 1, 2),
         w AS (SELECT g, v, c,
                 CAST(SUM(c) OVER (PARTITION BY g ORDER BY v
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                 CAST(SUM(c) OVER (PARTITION BY g) AS BIGINT) AS n
               FROM h),
         kk AS (SELECT *, CAST(FLOOR(CAST(n AS DOUBLE) * 0.2) AS BIGINT) AS k FROM w),
         pts AS (SELECT g, MAX(n) AS n, MAX(k) AS k,
                        MIN(CASE WHEN cum >= k + 1 THEN v END) AS lo,
                        MIN(CASE WHEN cum >= n - k THEN v END) AS hi
                 FROM kk GROUP BY 1),
         agg AS (SELECT kk.g, MAX(kk.n) AS n, MAX(kk.k) AS k,
                        SUM(CAST(GREATEST(0, LEAST(kk.cum, kk.n - kk.k)
                            - GREATEST(kk.cum - kk.c, kk.k)) * kk.v AS HUGEINT)) AS ts,
                        SUM(CAST(kk.c * GREATEST(p.lo, LEAST(p.hi, kk.v)) AS HUGEINT)) AS sw,
                        SUM(CAST(kk.c AS HUGEINT)
                            * CAST(GREATEST(p.lo, LEAST(p.hi, kk.v)) AS HUGEINT)
                            * CAST(GREATEST(p.lo, LEAST(p.hi, kk.v)) AS HUGEINT)) AS sww
                 FROM kk JOIN pts p ON kk.g = p.g GROUP BY 1),
         wide AS (SELECT
                 MAX(CASE WHEN g = '1-URGENT' THEN n END) AS na,
                 MAX(CASE WHEN g = '1-URGENT' THEN k END) AS ka,
                 MAX(CASE WHEN g = '1-URGENT' THEN ts END) AS tsa,
                 MAX(CASE WHEN g = '1-URGENT' THEN sw END) AS swa,
                 MAX(CASE WHEN g = '1-URGENT' THEN sww END) AS swwa,
                 MAX(CASE WHEN g = '5-LOW' THEN n END) AS nb,
                 MAX(CASE WHEN g = '5-LOW' THEN k END) AS kb,
                 MAX(CASE WHEN g = '5-LOW' THEN ts END) AS tsb,
                 MAX(CASE WHEN g = '5-LOW' THEN sw END) AS swb,
                 MAX(CASE WHEN g = '5-LOW' THEN sww END) AS swwb
                 FROM agg),
         sides AS (SELECT na, nb, ka, kb,
                 CAST(na - ka * 2 AS DOUBLE) AS ha, CAST(nb - kb * 2 AS DOUBLE) AS hb,
                 CAST(tsa AS DOUBLE) / CAST(na - ka * 2 AS DOUBLE) AS tma,
                 CAST(tsb AS DOUBLE) / CAST(nb - kb * 2 AS DOUBLE) AS tmb,
                 (CAST(na AS DOUBLE) - 1.0)
                   * ((CAST(swwa AS DOUBLE) - CAST(swa AS DOUBLE) * CAST(swa AS DOUBLE) / CAST(na AS DOUBLE)) / (CAST(na AS DOUBLE) - 1.0))
                   / (CAST(na - ka * 2 AS DOUBLE) * (CAST(na - ka * 2 AS DOUBLE) - 1.0)) AS da,
                 (CAST(nb AS DOUBLE) - 1.0)
                   * ((CAST(swwb AS DOUBLE) - CAST(swb AS DOUBLE) * CAST(swb AS DOUBLE) / CAST(nb AS DOUBLE)) / (CAST(nb AS DOUBLE) - 1.0))
                   / (CAST(nb - kb * 2 AS DOUBLE) * (CAST(nb - kb * 2 AS DOUBLE) - 1.0)) AS db
                 FROM wide)
         SELECT na AS n_a, nb AS n_b,
                na - ka * 2 AS h_a, nb - kb * 2 AS h_b,
                ROUND(tma, 6) AS tmean_a, ROUND(tmb, 6) AS tmean_b,
                CASE WHEN ha > 1.0 AND hb > 1.0 AND (da + db) > 0.0 THEN
                  ROUND((tma - tmb) / SQRT(da + db), 6) END AS t_stat,
                CASE WHEN ha > 1.0 AND hb > 1.0 AND (da + db) > 0.0 THEN
                  ROUND((da + db) * (da + db)
                        / (da * da / (ha - 1.0) + db * db / (hb - 1.0)), 6) END AS dof
         FROM sides""",
    // same hist + prefix scaffolding as q_cvm; per-value terms quantize to
    // 1e-9 longs before the sum (each term has its OWN B(N-B) denominator,
    // so no common-denominator trick applies), final chain mirrors
    // Sketches.andersonDarling exactly
    "q_anderson_darling" ->
      """WITH src AS (SELECT o_orderpriority AS g,
                CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
              FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         h AS (SELECT v,
                 CAST(SUM(CASE WHEN g = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN g <> '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS cb
               FROM src GROUP BY 1),
         w AS (SELECT v, ca, cb,
                 CAST(SUM(ca) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fa,
                 CAST(SUM(cb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS fb,
                 CAST(SUM(ca) OVER () AS BIGINT) AS na,
                 CAST(SUM(cb) OVER () AS BIGINT) AS nb
               FROM h),
         q AS (SELECT na, nb,
                 CASE WHEN fa + fb < na + nb THEN
                   CAST(CAST(ca + cb AS DECIMAL(38,0))
                        * CAST(fa * nb - fb * na AS DECIMAL(38,0))
                        * CAST(fa * nb - fb * na AS DECIMAL(38,0)) AS DOUBLE)
                   / CAST(CAST(fa + fb AS DECIMAL(38,0))
                          * CAST(na + nb - (fa + fb) AS DECIMAL(38,0)) AS DOUBLE)
                 ELSE CAST(0.0 AS DOUBLE) END AS term
               FROM w)
         SELECT '1-URGENT' AS group_a, '5-LOW' AS group_b,
                MAX(na) AS n_a, MAX(nb) AS n_b,
                ROUND((CAST(SUM(CAST(FLOOR(term * 1e9 + 0.5) AS DECIMAL(38,0))) AS DOUBLE) / 1e9)
                      / CAST(CAST(MAX(na) AS DECIMAL(38,0))
                             * CAST(MAX(nb) AS DECIMAL(38,0)) AS DOUBLE),
                      6) AS ad
         FROM q""",
    // per-time e/v terms are fixed left-associated IEEE chains from exact
    // long counts, quantized to 1e-9 longs before the sum (the theil
    // discipline) — the chain order here mirrors the Spark side exactly
    "q_logrank" ->
      """WITH o AS (SELECT o_custkey, CAST(o_orderdate AS DATE) AS od FROM orders),
         mx AS (SELECT MAX(od) AS maxd FROM o),
         spans AS (SELECT o_custkey,
                          CAST(datediff('day', MIN(od), MAX(od)) AS BIGINT) AS duration,
                          (datediff('day', MAX(od), (SELECT maxd FROM mx)) > 180) AS churned
                   FROM o GROUP BY 1),
         j AS (SELECT c.c_mktsegment AS g, sp.duration, sp.churned
               FROM spans sp JOIN customer c ON sp.o_custkey = c.c_custkey
               WHERE c.c_mktsegment IN ('BUILDING', 'MACHINERY')),
         gg AS (SELECT duration AS t,
                 CAST(SUM(CASE WHEN g = 'BUILDING' AND churned THEN 1 ELSE 0 END) AS BIGINT) AS da,
                 CAST(SUM(CASE WHEN g <> 'BUILDING' AND churned THEN 1 ELSE 0 END) AS BIGINT) AS db,
                 CAST(SUM(CASE WHEN g = 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS ca,
                 CAST(SUM(CASE WHEN g <> 'BUILDING' THEN 1 ELSE 0 END) AS BIGINT) AS cb
                FROM j GROUP BY 1),
         w AS (SELECT t, da, db,
                 CAST(SUM(ca) OVER () - (SUM(ca) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - ca) AS BIGINT) AS na,
                 CAST(SUM(cb) OVER () - (SUM(cb) OVER (ORDER BY t ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - cb) AS BIGINT) AS nb
                FROM gg),
         r AS (SELECT t, da, CAST(na + nb AS BIGINT) AS n, na, nb,
                      CAST(da + db AS BIGINT) AS d FROM w),
         q AS (SELECT da,
                 CASE WHEN d > 0 THEN CAST(FLOOR(CAST(d * na AS DOUBLE) / CAST(n AS DOUBLE) * 1e9 + 0.5) AS BIGINT)
                      ELSE 0 END AS eq,
                 CASE WHEN d > 0 AND n > 1 THEN CAST(FLOOR(
                        CAST(d * na AS DOUBLE) / CAST(n AS DOUBLE)
                        * (CAST(nb AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(n - d AS DOUBLE) / CAST(n - 1 AS DOUBLE)) * 1e9 + 0.5) AS BIGINT)
                      ELSE 0 END AS vq
                FROM r)
         SELECT 'BUILDING' AS group_a, 'MACHINERY' AS group_b,
                CAST(SUM(da) AS BIGINT) AS observed_a,
                ROUND(CAST(SUM(eq) AS DOUBLE) / 1e9, 6) AS expected_a,
                ROUND(CAST(SUM(vq) AS DOUBLE) / 1e9, 6) AS variance_a,
                ROUND((CAST(SUM(da) AS DOUBLE) - CAST(SUM(eq) AS DOUBLE) / 1e9)
                      * (CAST(SUM(da) AS DOUBLE) - CAST(SUM(eq) AS DOUBLE) / 1e9)
                      / (CAST(SUM(vq) AS DOUBLE) / 1e9), 6) AS chi2
         FROM q""",
    // exact integer sufficient statistics throughout: wsum/dnum/psum never
    // leave the integer domain, each output is EXACTLY ONE correctly-rounded
    // division (remainder re-associated onto the common denominator) — so
    // the doubles are bit-identical and NO ROUND is applied: ROUND(x,6) at
    // 1e8 magnitudes is engine-divergent (the decimal halfway boundary sits
    // inside an ulp; DuckDB's multiply-round and the JVM's BigDecimal round
    // disagreed on a real row at sf0.01)
    "q_seasonal" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
                               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
                        FROM orders GROUP BY 1),
         w AS (SELECT day, revenue_cents,
                      CAST(datediff('day', DATE '1990-01-01', day) % 7 AS INT) AS dow,
                      CAST(SUM(revenue_cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS wsum,
                      COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wcnt
               FROM daily),
         dt AS (SELECT day, revenue_cents, dow, wsum, wcnt,
                       CASE WHEN wcnt = 7 THEN revenue_cents * 7 - wsum END AS dnum
                FROM w),
         pm AS (SELECT dow, CAST(SUM(dnum) AS BIGINT) AS psum,
                       CAST(COUNT(dnum) AS BIGINT) AS pcnt
                FROM dt WHERE dnum IS NOT NULL GROUP BY 1)
         SELECT d.day, d.revenue_cents, d.dow,
                CASE WHEN d.wcnt = 7 THEN CAST(d.wsum AS DOUBLE) / 7 END AS trend,
                CAST(p.psum AS DOUBLE) / (p.pcnt * 7) AS seasonal,
                CASE WHEN d.dnum IS NOT NULL
                     THEN CAST(d.dnum * p.pcnt - p.psum AS DOUBLE) / (p.pcnt * 7)
                END AS remainder
         FROM dt d JOIN pm p USING (dow) ORDER BY d.day""",
    "q_ipf_rake" -> rakeOracle,
    "q_markov_attribution" -> markovAttributionOracle,
    "q_shapley_attribution" -> shapleyAttributionOracle,
    "q_als" -> alsOracle,
    // welchTTest's quantized moments per (treated, post) cell; DiD, SE and
    // t fixed IEEE chains mirroring Sketches.diffInDiff term order
    "q_diff_in_diff" ->
      """WITH b AS (SELECT o_orderstatus = 'F' AS t,
                           CAST(o_orderdate AS DATE) >= DATE '1995-01-01' AS p,
                           o_totalprice / 100000.0 AS v
                    FROM orders),
         c AS (SELECT t, p, CAST(COUNT(*) AS DOUBLE) AS n,
                      CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s,
                      CAST(SUM(CAST(FLOOR(v * v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss
               FROM b GROUP BY 1, 2),
         w AS (SELECT
                 MAX(CASE WHEN t AND NOT p THEN n END) AS n_t0,
                 MAX(CASE WHEN t AND NOT p THEN s END) AS s_t0,
                 MAX(CASE WHEN t AND NOT p THEN ss END) AS ss_t0,
                 MAX(CASE WHEN t AND p THEN n END) AS n_t1,
                 MAX(CASE WHEN t AND p THEN s END) AS s_t1,
                 MAX(CASE WHEN t AND p THEN ss END) AS ss_t1,
                 MAX(CASE WHEN NOT t AND NOT p THEN n END) AS n_c0,
                 MAX(CASE WHEN NOT t AND NOT p THEN s END) AS s_c0,
                 MAX(CASE WHEN NOT t AND NOT p THEN ss END) AS ss_c0,
                 MAX(CASE WHEN NOT t AND p THEN n END) AS n_c1,
                 MAX(CASE WHEN NOT t AND p THEN s END) AS s_c1,
                 MAX(CASE WHEN NOT t AND p THEN ss END) AS ss_c1
               FROM c),
         f AS (SELECT *,
                 (s_t1 / n_t1 - s_t0 / n_t0) - (s_c1 / n_c1 - s_c0 / n_c0) AS did,
                 ((ss_t1 - s_t1 * s_t1 / n_t1) / (n_t1 - 1)) / n_t1
                 + ((ss_t0 - s_t0 * s_t0 / n_t0) / (n_t0 - 1)) / n_t0
                 + ((ss_c1 - s_c1 * s_c1 / n_c1) / (n_c1 - 1)) / n_c1
                 + ((ss_c0 - s_c0 * s_c0 / n_c0) / (n_c0 - 1)) / n_c0 AS sesq,
                 LEAST(n_t0, n_t1, n_c0, n_c1) AS minn
               FROM w)
         SELECT CAST(n_t0 AS BIGINT) AS n_treated_pre,
                CAST(n_t1 AS BIGINT) AS n_treated_post,
                CAST(n_c0 AS BIGINT) AS n_control_pre,
                CAST(n_c1 AS BIGINT) AS n_control_post,
                ROUND(s_t0 / n_t0, 6) AS mean_treated_pre,
                ROUND(s_t1 / n_t1, 6) AS mean_treated_post,
                ROUND(s_c0 / n_c0, 6) AS mean_control_pre,
                ROUND(s_c1 / n_c1, 6) AS mean_control_post,
                ROUND(did, 6) AS did,
                CASE WHEN minn >= 2.0 THEN ROUND(sqrt(sesq), 6) END AS se,
                CASE WHEN minn >= 2.0 THEN ROUND(did / sqrt(sesq), 6) END AS t_stat
         FROM f""",
    "q_logistic" -> logisticOracle,
    "q_ipw_ate" -> ipwOracle,
    "q_aipw_ate" -> aipwOracle,
    "q_quant_reg" -> quantRegOracle,
    "q_svm" -> svmOracle,
    "q_jl_distortion" -> jlDistortionOracle,
    "q_stump" -> stumpOracle,
    "q_gb_stumps" -> gbStumpsOracle,
    "q_bagged_stumps" -> baggedStumpsOracle,
    "q_seq_patterns" -> seqPatternsOracle,
    "q_soundex_blocks" -> soundexBlocksOracle,
    "q_er_pipeline" -> erPipelineOracle,
    "q_kish" -> kishOracle,
    "q_poisson" -> poissonOracle,
    // the streaming twin accumulates the identical integer sums — shares
    // the batch oracle verbatim
    "q_kish_stream" -> kishOracle,
    "q_competing_risks" -> competingRisksOracle,
    "q_jackknife" -> jackknifeOracle,
    // exact-ratio leave-one-source-out means from one aggregate —
    // mirrors Quality.sourceAblation
    "q_source_ablation" ->
      """WITH b AS (SELECT lang, CAST(LENGTH(text) AS DOUBLE) / 1000.0 AS v FROM documents),
         per AS (SELECT lang, CAST(COUNT(*) AS BIGINT) AS n,
                        CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS BIGINT) AS s
                 FROM b GROUP BY 1),
         tot AS (SELECT CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st FROM per)
         SELECT lang, n,
                ROUND(CAST(s AS DOUBLE)/1000000.0/CAST(n AS DOUBLE), 6) AS mean_source,
                CASE WHEN nt > n THEN
                  ROUND(CAST(st - s AS DOUBLE)/1000000.0/CAST(nt - n AS DOUBLE), 6) END AS mean_without,
                CASE WHEN nt > n THEN
                  ROUND(CAST(st AS DOUBLE)/1000000.0/CAST(nt AS DOUBLE)
                        - CAST(st - s AS DOUBLE)/1000000.0/CAST(nt - n AS DOUBLE), 6) END AS delta
         FROM per CROSS JOIN tot ORDER BY lang""",

    "q_naive_bayes" -> naiveBayesOracle,
    "q_naive_bayes_stream" -> naiveBayesOracle,
    "q_linreg" -> linRegOracle,
    // the linreg chain (UNROUNDED betas) -> raw residuals -> quantized DW
    // lead sums + the same Cramer chain refit on e^2 for Breusch-Pagan;
    // all outputs unrounded exact-chain doubles (knife-edge lesson)
    "q_ols_diagnostics" ->
      """WITH rows_ AS (SELECT o_orderdate AS od, o_orderkey AS ok,
                o_totalprice / 100000.0 AS v,
                CAST(datediff('day', DATE '1992-01-01', CAST(o_orderdate AS DATE)) AS DOUBLE) / 2500.0 AS x1,
                c_acctbal / 10000.0 AS x2
              FROM orders JOIN customer ON o_custkey = c_custkey),
         m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  SUM(CAST(FLOOR(x1 * 1e6 + 0.5) AS HUGEINT)) AS sa0,
                  SUM(CAST(FLOOR(x2 * 1e6 + 0.5) AS HUGEINT)) AS sb0,
                  SUM(CAST(FLOOR(x1 * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(x1 * 1e6 + 0.5) AS HUGEINT)) AS saa0,
                  SUM(CAST(FLOOR(x2 * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(x2 * 1e6 + 0.5) AS HUGEINT)) AS sbb0,
                  SUM(CAST(FLOOR(x1 * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(x2 * 1e6 + 0.5) AS HUGEINT)) AS sab0,
                  SUM(CAST(FLOOR(v * 1e6 + 0.5) AS HUGEINT)) AS sy0,
                  SUM(CAST(FLOOR(x1 * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(v * 1e6 + 0.5) AS HUGEINT)) AS say0,
                  SUM(CAST(FLOOR(x2 * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(v * 1e6 + 0.5) AS HUGEINT)) AS sby0,
                  SUM(CAST(FLOOR(v * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(v * 1e6 + 0.5) AS HUGEINT)) AS syy0
           FROM rows_),
         t AS (SELECT n, CAST(n AS DOUBLE) AS nn,
                  CAST(sa0 AS DOUBLE) / 1e6 AS sa, CAST(sb0 AS DOUBLE) / 1e6 AS sb,
                  CAST(saa0 AS DOUBLE) / 1e12 AS saa, CAST(sbb0 AS DOUBLE) / 1e12 AS sbb,
                  CAST(sab0 AS DOUBLE) / 1e12 AS sab,
                  CAST(sy0 AS DOUBLE) / 1e6 AS sy, CAST(say0 AS DOUBLE) / 1e12 AS say,
                  CAST(sby0 AS DOUBLE) / 1e12 AS sby
           FROM m),
         sv AS (SELECT n,
                  (sy * (saa * sbb - sab * sab) - sa * (say * sbb - sab * sby)
                    + sb * (say * sab - saa * sby))
                  / (nn * (saa * sbb - sab * sab) - sa * (sa * sbb - sab * sb)
                    + sb * (sa * sab - saa * sb)) AS beta0,
                  (nn * (say * sbb - sab * sby) - sy * (sa * sbb - sab * sb)
                    + sb * (sa * sby - say * sb))
                  / (nn * (saa * sbb - sab * sab) - sa * (sa * sbb - sab * sb)
                    + sb * (sa * sab - saa * sb)) AS beta1,
                  (nn * (saa * sby - say * sab) - sa * (sa * sby - say * sb)
                    + sy * (sa * sab - saa * sb))
                  / (nn * (saa * sbb - sab * sab) - sa * (sa * sbb - sab * sb)
                    + sb * (sa * sab - saa * sb)) AS beta2
                FROM t),
         r AS (SELECT od, ok, x1, x2,
                      v - (beta0 + beta1 * x1 + beta2 * x2) AS e
               FROM rows_ CROSS JOIN sv),
         led AS (SELECT e, x1, x2,
                        CAST(FLOOR(e * 1e6 + 0.5) AS BIGINT) AS eq,
                        LEAD(CAST(FLOOR(e * 1e6 + 0.5) AS BIGINT))
                          OVER (ORDER BY od, ok) AS nxt
                 FROM r),
         dw AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                       CAST(SUM(CASE WHEN nxt IS NOT NULL THEN
                         CAST(FLOOR((CAST(eq AS DOUBLE) / 1e6 - CAST(nxt AS DOUBLE) / 1e6)
                                    * (CAST(eq AS DOUBLE) / 1e6 - CAST(nxt AS DOUBLE) / 1e6)
                                    * 1e9 + 0.5) AS BIGINT) ELSE 0 END) AS BIGINT) AS num,
                       CAST(SUM(CAST(FLOOR(CAST(eq AS DOUBLE) / 1e6 * (CAST(eq AS DOUBLE) / 1e6)
                                    * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS den
                FROM led),
         m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  SUM(CAST(FLOOR(x1 * 1e6 + 0.5) AS HUGEINT)) AS sa0,
                  SUM(CAST(FLOOR(x2 * 1e6 + 0.5) AS HUGEINT)) AS sb0,
                  SUM(CAST(FLOOR(x1 * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(x1 * 1e6 + 0.5) AS HUGEINT)) AS saa0,
                  SUM(CAST(FLOOR(x2 * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(x2 * 1e6 + 0.5) AS HUGEINT)) AS sbb0,
                  SUM(CAST(FLOOR(x1 * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(x2 * 1e6 + 0.5) AS HUGEINT)) AS sab0,
                  SUM(CAST(FLOOR(e * e * 1e6 + 0.5) AS HUGEINT)) AS sy0,
                  SUM(CAST(FLOOR(x1 * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(e * e * 1e6 + 0.5) AS HUGEINT)) AS say0,
                  SUM(CAST(FLOOR(x2 * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(e * e * 1e6 + 0.5) AS HUGEINT)) AS sby0,
                  SUM(CAST(FLOOR(e * e * 1e6 + 0.5) AS HUGEINT) * CAST(FLOOR(e * e * 1e6 + 0.5) AS HUGEINT)) AS syy0
           FROM r),
         t2 AS (SELECT n, CAST(n AS DOUBLE) AS nn,
                  CAST(sa0 AS DOUBLE) / 1e6 AS sa, CAST(sb0 AS DOUBLE) / 1e6 AS sb,
                  CAST(saa0 AS DOUBLE) / 1e12 AS saa, CAST(sbb0 AS DOUBLE) / 1e12 AS sbb,
                  CAST(sab0 AS DOUBLE) / 1e12 AS sab,
                  CAST(sy0 AS DOUBLE) / 1e6 AS sy, CAST(say0 AS DOUBLE) / 1e12 AS say,
                  CAST(sby0 AS DOUBLE) / 1e12 AS sby, CAST(syy0 AS DOUBLE) / 1e12 AS syy
           FROM m2),
         d2 AS (SELECT *,
                  nn * (saa * sbb - sab * sab) - sa * (sa * sbb - sab * sb)
                    + sb * (sa * sab - saa * sb) AS det
                FROM t2),
         aux AS (SELECT CASE WHEN det <> 0.0 AND (syy - sy * sy / nn) <> 0.0 THEN
                   1.0 - (syy -
                     (((sy * (saa * sbb - sab * sab) - sa * (say * sbb - sab * sby)
                         + sb * (say * sab - saa * sby)) / det) * sy
                      + ((nn * (say * sbb - sab * sby) - sy * (sa * sbb - sab * sb)
                         + sb * (sa * sby - say * sb)) / det) * say
                      + ((nn * (saa * sby - say * sab) - sa * (sa * sby - say * sb)
                         + sy * (sa * sab - saa * sb)) / det) * sby))
                     / (syy - sy * sy / nn) END AS r2aux
                 FROM d2)
         SELECT dw.n,
                CASE WHEN den > 0 THEN CAST(num AS DOUBLE) / CAST(den AS DOUBLE) END AS dw,
                CASE WHEN den > 0 THEN 1.0 - CAST(num AS DOUBLE) / CAST(den AS DOUBLE) / 2.0 END AS rho1,
                CASE WHEN r2aux IS NOT NULL THEN r2aux * CAST(dw.n AS DOUBLE) END AS bp_lm,
                CASE WHEN r2aux IS NOT NULL THEN EXP(-(r2aux * CAST(dw.n AS DOUBLE) / 2.0)) END AS bp_p
         FROM dw CROSS JOIN aux""",
    "q_ridge" -> ridgeOracle,
    "q_chi2_keywords" -> chi2KeywordsOracle,
    "q_cox_ph" -> coxOracle,
    // shared scored-slice CTEs: md5 split, train 'F'-rates, held-out rows
    // quantized to 1e-9 pq — mirrors calibScored + Sketches.reliabilityDiagram
    "q_reliability" ->
      """WITH b AS (SELECT o_orderpriority AS pr, c_nationkey AS nk,
                           o_orderstatus = 'F' AS y,
                           ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 AS bk
                    FROM orders JOIN customer ON o_custkey = c_custkey),
         m AS (SELECT pr, nk,
                      CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE) AS p
               FROM b WHERE bk < 6 GROUP BY 1, 2),
         sc AS (SELECT CAST(FLOOR(p * 1000000000.0 + 0.5) AS BIGINT) AS pq,
                       CASE WHEN y THEN 1 ELSE 0 END AS yy
                FROM b JOIN m USING (pr, nk) WHERE bk >= 6),
         bn AS (SELECT LEAST(CAST(FLOOR(CAST(pq * 10 AS DOUBLE) / 1000000000.0) AS BIGINT), 9) AS bin,
                       pq, yy
                FROM sc)
         SELECT bin, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(yy) AS BIGINT) AS n_pos,
                ROUND(CAST(SUM(pq) AS DOUBLE) / 1000000000.0 / CAST(COUNT(*) AS DOUBLE), 6) AS mean_pred,
                ROUND(CAST(SUM(yy) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE), 6) AS frac_pos
         FROM bn GROUP BY 1 ORDER BY 1""",
    // same slice; per-row 1e-9 Brier terms, bin REL/RES chains cast to
    // DECIMAL(30,12) — mirrors Sketches.brierDecomposition term order
    "q_brier" ->
      """WITH b AS (SELECT o_orderpriority AS pr, c_nationkey AS nk,
                           o_orderstatus = 'F' AS y,
                           ('0x' || substr(md5(CAST(o_orderkey AS VARCHAR)), 1, 8))::BIGINT % 10 AS bk
                    FROM orders JOIN customer ON o_custkey = c_custkey),
         m AS (SELECT pr, nk,
                      CAST(SUM(CASE WHEN y THEN 1 ELSE 0 END) AS DOUBLE)
                        / CAST(COUNT(*) AS DOUBLE) AS p
               FROM b WHERE bk < 6 GROUP BY 1, 2),
         sc AS (SELECT CAST(FLOOR(p * 1000000000.0 + 0.5) AS BIGINT) AS pq,
                       CASE WHEN y THEN 1 ELSE 0 END AS yy
                FROM b JOIN m USING (pr, nk) WHERE bk >= 6),
         rt AS (SELECT LEAST(CAST(FLOOR(CAST(pq * 10 AS DOUBLE) / 1000000000.0) AS BIGINT), 9) AS bin,
                       pq, yy,
                       CAST(FLOOR((CAST(pq AS DOUBLE) / 1000000000.0 - CAST(yy AS DOUBLE))
                                  * (CAST(pq AS DOUBLE) / 1000000000.0 - CAST(yy AS DOUBLE))
                                  * 1000000000.0 + 0.5) AS BIGINT) AS bt
                FROM sc),
         pb AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS nb, CAST(SUM(yy) AS BIGINT) AS pos,
                       CAST(SUM(pq) AS BIGINT) AS sp, CAST(SUM(bt) AS BIGINT) AS sbt
                FROM rt GROUP BY 1),
         t AS (SELECT *, CAST(SUM(nb) OVER () AS BIGINT) AS nn,
                      CAST(SUM(pos) OVER () AS BIGINT) AS pp,
                      CAST(sp AS DOUBLE) / 1000000000.0 / CAST(nb AS DOUBLE) AS pbar,
                      CAST(pos AS DOUBLE) / CAST(nb AS DOUBLE) AS obar
               FROM pb),
         t2 AS (SELECT *, CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE) AS o,
                       CAST(CAST(nb AS DOUBLE) * (pbar - obar) * (pbar - obar) AS DECIMAL(30,12)) AS rel,
                       CAST(CAST(nb AS DOUBLE) * (obar - CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE))
                            * (obar - CAST(pp AS DOUBLE) / CAST(nn AS DOUBLE)) AS DECIMAL(30,12)) AS res
                FROM t)
         SELECT CAST(MAX(nn) AS BIGINT) AS n,
                ROUND(CAST(SUM(sbt) AS DOUBLE) / 1000000000.0 / CAST(MAX(nn) AS DOUBLE), 6) AS brier,
                ROUND(CAST(SUM(rel) AS DOUBLE) / CAST(MAX(nn) AS DOUBLE), 6) AS reliability,
                ROUND(CAST(SUM(res) AS DOUBLE) / CAST(MAX(nn) AS DOUBLE), 6) AS resolution,
                ROUND(MAX(o) * (1.0 - MAX(o)), 6) AS uncertainty
         FROM t2""",
    "q_conformal" -> conformalOracle,
    "q_conformal_stream" -> conformalOracle,
        // per-(stratum, arm) exact quantized moments; per-stratum ATE/SE terms
    // as fixed IEEE chains cast to DECIMAL(30,12) before the cross-stratum
    // sum — mirrors Sketches.subclassificationAte term order
    "q_strat_ate" ->
      """WITH b AS (SELECT o_orderpriority AS g,
                           c_mktsegment = 'BUILDING' AS t,
                           o_totalprice / 100000.0 AS v
                    FROM orders JOIN customer ON o_custkey = c_custkey),
         c AS (SELECT g, t, CAST(COUNT(*) AS DOUBLE) AS n,
                      CAST(SUM(CAST(FLOOR(v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS s,
                      CAST(SUM(CAST(FLOOR(v * v * 1000000.0 + 0.5) AS BIGINT)) AS DOUBLE) / 1000000.0 AS ss
               FROM b GROUP BY 1, 2),
         st AS (SELECT g,
                  MAX(CASE WHEN t THEN n END) AS n1, MAX(CASE WHEN t THEN s END) AS s1,
                  MAX(CASE WHEN t THEN ss END) AS ss1,
                  MAX(CASE WHEN NOT t THEN n END) AS n0, MAX(CASE WHEN NOT t THEN s END) AS s0,
                  MAX(CASE WHEN NOT t THEN ss END) AS ss0
                FROM c GROUP BY 1),
         su AS (SELECT *, n1 IS NOT NULL AND n0 IS NOT NULL AS used,
                       COALESCE(n1, 0.0) + COALESCE(n0, 0.0) AS ns
                FROM st),
         tm AS (SELECT *,
                  SUM(CASE WHEN used THEN ns ELSE 0.0 END) OVER () AS nn,
                  s1 / n1 - s0 / n0 AS diff
                FROM su),
         tq AS (SELECT *,
                  CASE WHEN used THEN CAST((ns / nn) * diff AS DECIMAL(30,12)) END AS at,
                  CASE WHEN used AND n1 >= 2 AND n0 >= 2 THEN CAST((ns / nn) * (ns / nn) *
                    (((ss1 - s1 * s1 / n1) / (n1 - 1)) / n1
                     + ((ss0 - s0 * s0 / n0) / (n0 - 1)) / n0) AS DECIMAL(30,12)) END AS stt
                FROM tm),
         f AS (SELECT COALESCE(CAST(SUM(CASE WHEN used THEN 1 END) AS BIGINT), 0) AS n_strata_used,
                      COALESCE(CAST(SUM(CASE WHEN NOT used THEN 1 END) AS BIGINT), 0) AS n_strata_dropped,
                      CAST(SUM(CASE WHEN used THEN ns ELSE 0.0 END) AS BIGINT) AS n_used,
                      CAST(SUM(CASE WHEN NOT used THEN ns ELSE 0.0 END) AS BIGINT) AS n_dropped,
                      CAST(SUM(at) AS DOUBLE) AS ate,
                      CAST(SUM(stt) AS DOUBLE) AS sesq,
                      MIN(CASE WHEN used THEN LEAST(n1, n0) END) AS minarm
               FROM tq)
         SELECT n_strata_used, n_strata_dropped, n_used, n_dropped,
                ROUND(ate, 6) AS ate,
                CASE WHEN minarm >= 2.0 THEN ROUND(sqrt(sesq), 6) END AS se,
                CASE WHEN minarm >= 2.0 THEN ROUND(ate / sqrt(sesq), 6) END AS t_stat
         FROM f""",
    // q_seasonal's decomposition CTEs, components quantized to 1e-6
    // longs, strengths as ratios of exact variance NUMERATORS — mirrors
    // Temporal.seasonalStrength
    "q_seasonal_strength" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
                               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
                        FROM orders GROUP BY 1),
         w AS (SELECT day, revenue_cents,
                      CAST(datediff('day', DATE '1990-01-01', day) % 7 AS INT) AS dow,
                      CAST(SUM(revenue_cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS wsum,
                      COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wcnt
               FROM daily),
         dt AS (SELECT day, revenue_cents, dow, wsum, wcnt,
                       CASE WHEN wcnt = 7 THEN revenue_cents * 7 - wsum END AS dnum
                FROM w),
         pm AS (SELECT dow, CAST(SUM(dnum) AS BIGINT) AS psum,
                       CAST(COUNT(dnum) AS BIGINT) AS pcnt
                FROM dt WHERE dnum IS NOT NULL GROUP BY 1),
         comp AS (SELECT
                    CAST(d.dnum * p.pcnt - p.psum AS DOUBLE) / (p.pcnt * 7) AS r,
                    CAST(p.psum AS DOUBLE) / (p.pcnt * 7) AS s,
                    CAST(d.wsum AS DOUBLE) / 7 AS t
                  FROM dt d JOIN pm p USING (dow)
                  WHERE d.dnum IS NOT NULL),
         qz AS (SELECT
                  CAST(FLOOR(r * 1e6 + 0.5) AS HUGEINT) AS rq,
                  CAST(FLOOR((s + r) * 1e6 + 0.5) AS HUGEINT) AS srq,
                  CAST(FLOOR((t + r) * 1e6 + 0.5) AS HUGEINT) AS trq
                FROM comp),
         a AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                      SUM(rq) AS s1r, SUM(rq * rq) AS s2r,
                      SUM(srq) AS s1s, SUM(srq * srq) AS s2s,
                      SUM(trq) AS s1t, SUM(trq * trq) AS s2t
               FROM qz)
         SELECT CAST(n AS BIGINT) AS n,
                CASE WHEN n * s2s - s1s * s1s <> 0
                     THEN ROUND(GREATEST(0.0,
                          1.0 - CAST(n * s2r - s1r * s1r AS DOUBLE)
                              / CAST(n * s2s - s1s * s1s AS DOUBLE)), 6) END AS seasonal_strength,
                CASE WHEN n * s2t - s1t * s1t <> 0
                     THEN ROUND(GREATEST(0.0,
                          1.0 - CAST(n * s2r - s1r * s1r AS DOUBLE)
                              / CAST(n * s2t - s1t * s1t AS DOUBLE)), 6) END AS trend_strength
         FROM a""",
    // quintile scores as exact integer ceil-division over the ECDF
    // histogram — tie-stable by construction (ntile would depend on
    // arbitrary tie order and could not hash-match across engines)
    "q_rfm" ->
      """WITH m AS (SELECT o_custkey,
                           CAST(datediff('day', MAX(CAST(o_orderdate AS DATE)),
                                (SELECT MAX(CAST(o_orderdate AS DATE)) FROM orders)) AS BIGINT) AS recency_days,
                           CAST(COUNT(*) AS BIGINT) AS frequency,
                           CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS monetary_cents
                    FROM orders GROUP BY 1),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM m),
         cr AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM (SELECT recency_days AS v, COUNT(*) AS c FROM m GROUP BY 1)),
         sr AS (SELECT v, CAST(6 - (5 * cum + (SELECT n FROM n) - 1) // (SELECT n FROM n) AS INT) AS r_score FROM cr),
         cf AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM (SELECT frequency AS v, COUNT(*) AS c FROM m GROUP BY 1)),
         sf AS (SELECT v, CAST((5 * cum + (SELECT n FROM n) - 1) // (SELECT n FROM n) AS INT) AS f_score FROM cf),
         cm AS (SELECT v, SUM(c) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
                FROM (SELECT monetary_cents AS v, COUNT(*) AS c FROM m GROUP BY 1)),
         sm AS (SELECT v, CAST((5 * cum + (SELECT n FROM n) - 1) // (SELECT n FROM n) AS INT) AS m_score FROM cm)
         SELECT m.o_custkey, m.recency_days, m.frequency, m.monetary_cents,
                sr.r_score, sf.f_score, sm.m_score,
                CAST(sr.r_score AS VARCHAR) || CAST(sf.f_score AS VARCHAR) ||
                  CAST(sm.m_score AS VARCHAR) AS rfm
         FROM m JOIN sr ON m.recency_days = sr.v
                JOIN sf ON m.frequency = sf.v
                JOIN sm ON m.monetary_cents = sm.v
         ORDER BY m.o_custkey""",
    // cosine = co/sqrt(ca*cb) over exact integers is bit-identical on any
    // IEEE engine (sqrt and division are correctly rounded), so the
    // DESC/tiebreak ordering agrees without rounding tricks
    "q_item_cosine" ->
      """WITH b AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
         g AS (SELECT l_orderkey FROM b GROUP BY 1 HAVING COUNT(*) <= 1000),
         bb AS (SELECT b.l_orderkey, b.l_partkey FROM b JOIN g USING (l_orderkey)),
         ic AS (SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS cnt FROM bb GROUP BY 1),
         p AS (SELECT x.l_partkey, y.l_partkey AS other_part, CAST(COUNT(*) AS BIGINT) AS co_cnt
               FROM bb x JOIN bb y
                 ON x.l_orderkey = y.l_orderkey AND x.l_partkey <> y.l_partkey
               GROUP BY 1, 2 HAVING COUNT(*) >= 2),
         sm AS (SELECT p.l_partkey, p.other_part,
                       CAST(p.co_cnt AS DOUBLE) / SQRT(CAST(a.cnt * c.cnt AS DOUBLE)) AS cosine
                FROM p JOIN ic a ON p.l_partkey = a.l_partkey
                       JOIN ic c ON p.other_part = c.l_partkey),
         r AS (SELECT l_partkey, other_part, cosine,
                      ROW_NUMBER() OVER (PARTITION BY l_partkey
                                         ORDER BY cosine DESC, other_part) AS rnk
               FROM sm)
         SELECT l_partkey, other_part, ROUND(cosine, 6) AS cosine, CAST(rnk AS INT) AS rnk
         FROM r WHERE rnk <= 3 ORDER BY l_partkey, rnk""",
    // the oracle recomputes the WAV fields from first principles — the
    // Spark side has to build a real RIFF container and parse it back to
    // agree, so writer layout AND chunk-walk parser sit under the hash
    "q_audio_meta" ->
      """SELECT doc_id,
                CAST(1 + doc_id % 2 AS INT) AS channels,
                CAST(CASE doc_id % 3 WHEN 0 THEN 8000 WHEN 1 THEN 16000
                     ELSE 44100 END AS INT) AS sample_rate,
                CAST(CASE doc_id % 2 WHEN 0 THEN 8 ELSE 16 END AS INT) AS bits_per_sample,
                CAST(octet_length(encode(text)) AS INT) AS data_bytes
         FROM documents ORDER BY doc_id""",
    // brute argmin replay of the grid+top-1 path; haversine doubles are
    // bit-identical so ORDER BY km, s_suppkey agrees without rounding
    "q_spatial_nearest" ->
      """WITH c AS (SELECT c_custkey,
                           (CAST(c_custkey AS BIGINT) * 7919 % 12000) / CAST(100.0 AS DOUBLE) - CAST(60.0 AS DOUBLE) AS lat,
                           (CAST(c_custkey AS BIGINT) * 104729 % 36000) / CAST(100.0 AS DOUBLE) - CAST(180.0 AS DOUBLE) AS lon
                    FROM customer),
         s AS (SELECT s_suppkey,
                      (CAST(s_suppkey AS BIGINT) * 6367 % 12000) / CAST(100.0 AS DOUBLE) - CAST(60.0 AS DOUBLE) AS lat,
                      (CAST(s_suppkey AS BIGINT) * 9973 % 36000) / CAST(100.0 AS DOUBLE) - CAST(180.0 AS DOUBLE) AS lon
               FROM supplier),
         p AS (SELECT c.c_custkey, s.s_suppkey,
                      2 * 6371.0088 * ASIN(LEAST(CAST(1.0 AS DOUBLE),
                        SQRT(SIN(RADIANS(s.lat - c.lat)/2) * SIN(RADIANS(s.lat - c.lat)/2)
                           + COS(RADIANS(c.lat)) * COS(RADIANS(s.lat))
                             * SIN(RADIANS(s.lon - c.lon)/2) * SIN(RADIANS(s.lon - c.lon)/2)))) AS km
               FROM c CROSS JOIN s),
         r AS (SELECT c_custkey, s_suppkey, km,
                      ROW_NUMBER() OVER (PARTITION BY c_custkey ORDER BY km, s_suppkey) AS rn
               FROM p WHERE km <= 800.0)
         SELECT c_custkey, s_suppkey, ROUND(km, 4) AS dist_km
         FROM r WHERE rn = 1 ORDER BY c_custkey""",
    // X126's exact remainders gated by a 5*MAD band; the medians stay
    // internal to the boolean (their 6-dp rendering would be the ROUND
    // knife-edge) and the compare margin dwarfs any ulp noise
    "q_seasonal_anomaly" ->
      """WITH daily AS (SELECT CAST(o_orderdate AS DATE) AS day,
                               CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS revenue_cents
                        FROM orders GROUP BY 1),
         w AS (SELECT day, revenue_cents,
                      CAST(datediff('day', DATE '1990-01-01', day) % 7 AS INT) AS dow,
                      CAST(SUM(revenue_cents) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS BIGINT) AS wsum,
                      COUNT(*) OVER (ORDER BY day ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) AS wcnt
               FROM daily),
         dt AS (SELECT day, dow, CASE WHEN wcnt = 7 THEN revenue_cents * 7 - wsum END AS dnum FROM w),
         pm AS (SELECT dow, CAST(SUM(dnum) AS BIGINT) AS psum, CAST(COUNT(dnum) AS BIGINT) AS pcnt
                FROM dt WHERE dnum IS NOT NULL GROUP BY 1),
         rem AS (SELECT d.day,
                        CAST(d.dnum * p.pcnt - p.psum AS DOUBLE) / (p.pcnt * 7) AS remainder
                 FROM dt d JOIN pm p USING (dow) WHERE d.dnum IS NOT NULL),
         med AS (SELECT median(remainder) AS m FROM rem),
         resid AS (SELECT day, remainder, ABS(remainder - (SELECT m FROM med)) AS r FROM rem),
         madt AS (SELECT median(r) AS mad FROM resid)
         SELECT day, remainder, (r > 5.0 * (SELECT mad FROM madt)) AS is_outlier
         FROM resid ORDER BY day""",
    "q_ltv_curve" ->
      """WITH o AS (SELECT o_custkey,
                           CAST(year(o_orderdate) * 12 + month(o_orderdate) AS INT) AS m,
                           CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
                    FROM orders),
         f AS (SELECT o_custkey, MIN(m) AS cm FROM o GROUP BY 1),
         sz AS (SELECT cm, CAST(COUNT(*) AS BIGINT) AS cohort_n FROM f GROUP BY 1),
         r AS (SELECT f.cm, o.m - f.cm AS age_months, CAST(SUM(o.cents) AS BIGINT) AS rev_cents
               FROM o JOIN f USING (o_custkey) GROUP BY 1, 2),
         c AS (SELECT cm, age_months, rev_cents,
                      CAST(SUM(rev_cents) OVER (PARTITION BY cm ORDER BY age_months
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_cents
               FROM r)
         SELECT c.cm AS cohort_month, c.age_months, c.rev_cents, c.cum_cents, s.cohort_n,
                CAST(c.cum_cents AS DOUBLE) / s.cohort_n AS ltv_cents
         FROM c JOIN sz s USING (cm) ORDER BY cohort_month, age_months""",
    // the tied-block rank-sum identity v*c*(2*prev+c+1) in HUGEINT mirrors
    // the Spark side's DECIMAL(38,0) — one exact division at the end
    "q_gini" ->
      """WITH pc AS (SELECT o_custkey,
                            CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend
                     FROM orders GROUP BY 1),
         j AS (SELECT c.c_mktsegment, pc.spend FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey),
         h AS (SELECT c_mktsegment, spend AS v, CAST(COUNT(*) AS HUGEINT) AS c FROM j GROUP BY 1, 2),
         wp AS (SELECT c_mktsegment, v, c,
                       SUM(c) OVER (PARTITION BY c_mktsegment ORDER BY v
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS prev
                FROM h),
         a AS (SELECT c_mktsegment, SUM(c) AS n, SUM(CAST(v AS HUGEINT) * c) AS s1,
                      SUM(CAST(v AS HUGEINT) * c * (2 * prev + c + 1)) AS si2
               FROM wp GROUP BY 1)
         SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
                ROUND(CAST(si2 - (n + 1) * s1 AS DOUBLE) / CAST(n * s1 AS DOUBLE), 6) AS gini
         FROM a ORDER BY c_mktsegment""",
    // lower-median ELEMENT selection replayed with the same row_number
    // construction — the k-th sorted value is tie-order-independent, so
    // the slope emitted is one of the bit-exact division results
    "q_theil_sen" ->
      """WITH b AS (SELECT l_partkey,
                           datediff('day', DATE '1992-01-01', CAST(l_shipdate AS DATE)) AS x,
                           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
                    FROM lineitem),
         g AS (SELECT l_partkey FROM b GROUP BY 1 HAVING COUNT(*) <= 500),
         bb AS (SELECT b.l_partkey, b.x, b.y FROM b JOIN g USING (l_partkey)),
         p AS (SELECT a.l_partkey, CAST(c.y - a.y AS DOUBLE) / (c.x - a.x) AS slope
               FROM bb a JOIN bb c ON a.l_partkey = c.l_partkey AND a.x < c.x),
         r AS (SELECT l_partkey, slope,
                      ROW_NUMBER() OVER (PARTITION BY l_partkey ORDER BY slope) AS rn,
                      COUNT(*) OVER (PARTITION BY l_partkey) AS n
               FROM p)
         SELECT l_partkey, CAST(n AS BIGINT) AS n_pairs, slope
         FROM r WHERE rn = (n + 1) // 2 ORDER BY l_partkey""",
    "q_weighted_median" ->
      """WITH h AS (SELECT l_returnflag,
                           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v,
                           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
                    FROM lineitem GROUP BY 1, 2),
         c AS (SELECT l_returnflag, v, w,
                      CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                      CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
               FROM h)
         SELECT l_returnflag,
                CAST(MIN(CASE WHEN cum * 2 >= tot THEN v END) AS BIGINT) AS weighted_median,
                CAST(MAX(tot) AS BIGINT) AS total_weight
         FROM c GROUP BY 1 ORDER BY 1""",
    // q-values need no rounding: p·m/i is two correctly-rounded ops on the
    // identical md5-derived doubles and the envelope is a running MIN
    "q_bh_adjust" ->
      """WITH t AS (SELECT n_name AS test_id,
                           ('0x' || substr(md5(n_name), 1, 8))::BIGINT /
                             CAST(4294967296.0 AS DOUBLE) AS p_value
                    FROM nation),
         r AS (SELECT test_id, p_value,
                      ROW_NUMBER() OVER (ORDER BY p_value, test_id) AS i,
                      COUNT(*) OVER () AS m
               FROM t),
         q AS (SELECT test_id, p_value, i,
                      LEAST(CAST(1.0 AS DOUBLE),
                            MIN(p_value * m / i) OVER (ORDER BY p_value DESC, test_id DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS q_value
               FROM r)
         SELECT test_id, p_value, CAST(i AS BIGINT) AS rank, q_value,
                (q_value <= 0.2) AS reject
         FROM q ORDER BY test_id""",
    // step-down mirror: running MAX of (m-i+1)·p over the ascending order
    "q_holm_adjust" ->
      """WITH t AS (SELECT n_name AS test_id,
                           ('0x' || substr(md5(n_name), 1, 8))::BIGINT /
                             CAST(4294967296.0 AS DOUBLE) AS p_value
                    FROM nation),
         r AS (SELECT test_id, p_value,
                      ROW_NUMBER() OVER (ORDER BY p_value, test_id) AS i,
                      COUNT(*) OVER () AS m
               FROM t),
         q AS (SELECT test_id, p_value, i,
                      LEAST(CAST(1.0 AS DOUBLE),
                            MAX(p_value * CAST(m - i + 1 AS DOUBLE))
                              OVER (ORDER BY p_value, test_id
                                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS p_adj
               FROM r)
         SELECT test_id, p_value, CAST(i AS BIGINT) AS rank, p_adj,
                (p_adj <= 0.2) AS reject
         FROM q ORDER BY test_id""",
    // bh family + in-plan harmonic H_m from 1e-12-quantized 1/rank terms
    "q_by_adjust" ->
      """WITH t AS (SELECT n_name AS test_id,
                           ('0x' || substr(md5(n_name), 1, 8))::BIGINT /
                             CAST(4294967296.0 AS DOUBLE) AS p_value
                    FROM nation),
         r AS (SELECT test_id, p_value,
                      ROW_NUMBER() OVER (ORDER BY p_value, test_id) AS i,
                      COUNT(*) OVER () AS m
               FROM t),
         h AS (SELECT test_id, p_value, i, m,
                      CAST(SUM(CAST(FLOOR(1e12 / CAST(i AS DOUBLE) + 0.5) AS BIGINT)) OVER () AS DOUBLE) / 1e12 AS hm
               FROM r),
         q AS (SELECT test_id, p_value, i,
                      LEAST(CAST(1.0 AS DOUBLE),
                            MIN(p_value * m * hm / i) OVER (ORDER BY p_value DESC, test_id DESC
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) AS q_value
               FROM h)
         SELECT test_id, p_value, CAST(i AS BIGINT) AS rank, q_value,
                (q_value <= 0.2) AS reject
         FROM q ORDER BY test_id""",
    // histogram overlap identity min(cum, n-k) - max(prev, k); k computed
    // with the same IEEE floor(n*0.1) on both engines; one division
    "q_trimmed_mean" ->
      """WITH b AS (SELECT l_returnflag,
                           CAST(floor(l_extendedprice * 100 + 0.5) AS BIGINT) AS v
                    FROM lineitem),
         h AS (SELECT l_returnflag, v, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
         w AS (SELECT l_returnflag, v, c,
                      CAST(SUM(c) OVER (PARTITION BY l_returnflag ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                      CAST(SUM(c) OVER (PARTITION BY l_returnflag) AS BIGINT) AS n
               FROM h),
         k AS (SELECT l_returnflag, v, c, cum, n,
                      CAST(floor(CAST(n AS DOUBLE) * CAST(0.1 AS DOUBLE)) AS BIGINT) AS kk
               FROM w),
         cl AS (SELECT l_returnflag, n, kk,
                       GREATEST(0, LEAST(cum, n - kk) - GREATEST(cum - c, kk)) AS kept, v
                FROM k)
         SELECT l_returnflag, CAST(MAX(n) AS BIGINT) AS n,
                CAST(MAX(kk) AS BIGINT) AS n_trimmed_each_side,
                CAST(SUM(CAST(kept AS HUGEINT) * v) AS DOUBLE) / MAX(n - 2 * kk) AS trimmed_mean
         FROM cl GROUP BY 1 ORDER BY 1""",
    // stream == batch exactly: the state-store per-customer sums equal the
    // batch aggregate, so the batch oracle replays unchanged
    "q_gini_stream" ->
      """WITH pc AS (SELECT o_custkey,
                            CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend
                     FROM orders GROUP BY 1),
         j AS (SELECT c.c_mktsegment, pc.spend FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey),
         h AS (SELECT c_mktsegment, spend AS v, CAST(COUNT(*) AS HUGEINT) AS c FROM j GROUP BY 1, 2),
         wp AS (SELECT c_mktsegment, v, c,
                       SUM(c) OVER (PARTITION BY c_mktsegment ORDER BY v
                                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c AS prev
                FROM h),
         a AS (SELECT c_mktsegment, SUM(c) AS n, SUM(CAST(v AS HUGEINT) * c) AS s1,
                      SUM(CAST(v AS HUGEINT) * c * (2 * prev + c + 1)) AS si2
               FROM wp GROUP BY 1)
         SELECT c_mktsegment, CAST(n AS BIGINT) AS n,
                ROUND(CAST(si2 - (n + 1) * s1 AS DOUBLE) / CAST(n * s1 AS DOUBLE), 6) AS gini
         FROM a ORDER BY c_mktsegment""",
    // brute ε-graph + recursive min-label closure (components are modest
    // at this radius, so the closure's Σ size² rows stay tractable);
    // singletons keep their own key as the cluster label
    // self-inclusive neighbor counts, recursive min-label CC over the
    // core-core graph, border = min in-range core cluster
    "q_dbscan" ->
      """WITH RECURSIVE c AS (SELECT c_custkey,
                           (CAST(c_custkey AS BIGINT) * 7919 % 12000) / CAST(100.0 AS DOUBLE) - CAST(60.0 AS DOUBLE) AS lat,
                           (CAST(c_custkey AS BIGINT) * 104729 % 36000) / CAST(100.0 AS DOUBLE) - CAST(180.0 AS DOUBLE) AS lon
                    FROM customer),
         p AS (SELECT a.c_custkey AS u, b.c_custkey AS v
               FROM c a JOIN c b ON 2 * 6371.0088 * ASIN(LEAST(CAST(1.0 AS DOUBLE),
                       SQRT(SIN(RADIANS(b.lat - a.lat)/2) * SIN(RADIANS(b.lat - a.lat)/2)
                          + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                            * SIN(RADIANS(b.lon - a.lon)/2) * SIN(RADIANS(b.lon - a.lon)/2))))
                     <= 300.0),
         core AS (SELECT u AS id FROM p GROUP BY u HAVING COUNT(*) >= 3),
         e AS (SELECT p.u, p.v FROM p
               JOIN core x ON p.u = x.id JOIN core y ON p.v = y.id
               WHERE p.u <> p.v),
         lbl AS (SELECT u AS node, u AS lab FROM e
                 UNION
                 SELECT e.u, l.lab FROM e JOIN lbl l ON e.v = l.node),
         comp AS (SELECT node, MIN(lab) AS component FROM lbl GROUP BY node),
         corelab AS (SELECT core.id,
                       CAST(COALESCE(comp.component, core.id) AS BIGINT) AS cl
                     FROM core LEFT JOIN comp ON core.id = comp.node),
         border AS (SELECT p.u AS id, MIN(corelab.cl) AS cl
                    FROM p JOIN corelab ON p.v = corelab.id
                    WHERE p.u NOT IN (SELECT id FROM core)
                    GROUP BY p.u)
         SELECT c.c_custkey,
                CASE WHEN corelab.id IS NOT NULL THEN 'core'
                     WHEN border.id IS NOT NULL THEN 'border'
                     ELSE 'noise' END AS role,
                COALESCE(corelab.cl, border.cl) AS cluster
         FROM c LEFT JOIN corelab ON c.c_custkey = corelab.id
                LEFT JOIN border ON c.c_custkey = border.id
         ORDER BY c.c_custkey""",
    "q_spatial_clusters" ->
      """WITH RECURSIVE c AS (SELECT c_custkey,
                           (CAST(c_custkey AS BIGINT) * 7919 % 12000) / CAST(100.0 AS DOUBLE) - CAST(60.0 AS DOUBLE) AS lat,
                           (CAST(c_custkey AS BIGINT) * 104729 % 36000) / CAST(100.0 AS DOUBLE) - CAST(180.0 AS DOUBLE) AS lon
                    FROM customer),
         p AS (SELECT a.c_custkey AS u, b.c_custkey AS v
               FROM c a JOIN c b ON a.c_custkey < b.c_custkey
               WHERE 2 * 6371.0088 * ASIN(LEAST(CAST(1.0 AS DOUBLE),
                       SQRT(SIN(RADIANS(b.lat - a.lat)/2) * SIN(RADIANS(b.lat - a.lat)/2)
                          + COS(RADIANS(a.lat)) * COS(RADIANS(b.lat))
                            * SIN(RADIANS(b.lon - a.lon)/2) * SIN(RADIANS(b.lon - a.lon)/2))))
                     <= 300.0),
         e AS (SELECT u, v FROM p UNION SELECT v, u FROM p),
         lbl AS (SELECT u AS node, u AS lab FROM e
                 UNION
                 SELECT e.u, l.lab FROM e JOIN lbl l ON e.v = l.node),
         comp AS (SELECT node, MIN(lab) AS component FROM lbl GROUP BY node)
         SELECT c.c_custkey,
                CAST(COALESCE(comp.component, c.c_custkey) AS BIGINT) AS cluster
         FROM c LEFT JOIN comp ON c.c_custkey = comp.node
         ORDER BY c.c_custkey""",
    // the stateless stream-static join emits exactly the batch pair set —
    // q_spatial_join's oracle verbatim
    "q_spatial_join_stream" ->
      """WITH c AS (SELECT c_custkey,
                           (CAST(c_custkey AS BIGINT) * 7919 % 12000) / CAST(100.0 AS DOUBLE) - CAST(60.0 AS DOUBLE) AS lat,
                           (CAST(c_custkey AS BIGINT) * 104729 % 36000) / CAST(100.0 AS DOUBLE) - CAST(180.0 AS DOUBLE) AS lon
                    FROM customer),
         s AS (SELECT s_suppkey,
                      (CAST(s_suppkey AS BIGINT) * 6367 % 12000) / CAST(100.0 AS DOUBLE) - CAST(60.0 AS DOUBLE) AS lat,
                      (CAST(s_suppkey AS BIGINT) * 9973 % 36000) / CAST(100.0 AS DOUBLE) - CAST(180.0 AS DOUBLE) AS lon
               FROM supplier),
         p AS (SELECT s.s_suppkey, c.c_custkey,
                      2 * 6371.0088 * ASIN(LEAST(CAST(1.0 AS DOUBLE),
                        SQRT(SIN(RADIANS(c.lat - s.lat)/2) * SIN(RADIANS(c.lat - s.lat)/2)
                           + COS(RADIANS(s.lat)) * COS(RADIANS(c.lat))
                             * SIN(RADIANS(c.lon - s.lon)/2) * SIN(RADIANS(c.lon - s.lon)/2)))) AS km
               FROM s CROSS JOIN c)
         SELECT s_suppkey, c_custkey, ROUND(km, 4) AS dist_km
         FROM p WHERE km <= 800.0 ORDER BY s_suppkey, c_custkey""",
    // identical arithmetic shape: cast-per-exact-int, one product, one
    // division, one add — bit-identical doubles, no rounding; equal-t
    // neighbors fall back to v_prev (0/0 would be NaN)
    "q_interpolate" ->
      """WITH b AS (SELECT event_id, event_type, epoch_us(ts) AS t,
                           CASE WHEN event_id % 7 <> 0
                                THEN CAST(floor(value * 1e6 + 0.5) AS BIGINT) END AS v
                    FROM events),
         w AS (SELECT event_id, event_type, t, v,
                      LAST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY t, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
                      LAST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
                          OVER (PARTITION BY event_type ORDER BY t, event_id
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS tp,
                      FIRST_VALUE(v IGNORE NULLS) OVER (PARTITION BY event_type ORDER BY t, event_id
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn,
                      FIRST_VALUE(CASE WHEN v IS NOT NULL THEN t END IGNORE NULLS)
                          OVER (PARTITION BY event_type ORDER BY t, event_id
                          ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS tn
               FROM b)
         SELECT event_id, event_type,
                CASE WHEN v IS NOT NULL THEN CAST(v AS DOUBLE)
                     WHEN vp IS NOT NULL AND vn IS NOT NULL AND tn = tp THEN CAST(vp AS DOUBLE)
                     WHEN vp IS NOT NULL AND vn IS NOT NULL
                     THEN CAST(vp AS DOUBLE) +
                          (CAST(vn - vp AS DOUBLE) * CAST(t - tp AS DOUBLE)) / CAST(tn - tp AS DOUBLE)
                END AS value_interp
         FROM w ORDER BY event_id""",
    // q_scd2's interval reconstruction filtered to the 2024-01-15 version
    "q_scd2_snapshot" ->
      """WITH e AS (SELECT user_id, CAST(ts AS DATE) AS day, event_type, epoch_us(ts) AS us, event_id
                    FROM events),
         dly AS (SELECT user_id, day, event_type
                 FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, day
                                                    ORDER BY us DESC, event_id DESC) AS rn
                       FROM e)
                 WHERE rn = 1),
         f AS (SELECT user_id, day, event_type,
                      CASE WHEN LAG(event_type) OVER (PARTITION BY user_id ORDER BY day)
                                IS NOT DISTINCT FROM event_type THEN 0 ELSE 1 END AS chg
               FROM dly),
         g AS (SELECT user_id, day, event_type,
                      SUM(chg) OVER (PARTITION BY user_id ORDER BY day) AS run
               FROM f),
         r AS (SELECT user_id, event_type, MIN(day) AS valid_from
               FROM g GROUP BY user_id, event_type, run),
         iv AS (SELECT user_id, event_type, valid_from,
                       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY valid_from) AS valid_to
                FROM r)
         SELECT user_id, event_type, valid_from, valid_to
         FROM iv
         WHERE valid_from <= DATE '2024-01-15'
           AND (valid_to IS NULL OR valid_to > DATE '2024-01-15')
         ORDER BY user_id""",
    // the oracle recomputes the box layout from first principles: ftyp(20)
    // + empty moov(8) + mdat(8 + payload) — builder AND box walk under
    // the hash
    "q_video_meta" ->
      """SELECT doc_id, 3 AS n_boxes, 1 AS ftyp_ok, 0 AS moov_bytes,
                CAST(octet_length(encode(text)) AS INT) AS mdat_bytes
         FROM documents ORDER BY doc_id""",
    // md5-idiom draws replayed; CI bounds are element selections among
    // the 40 resample means (ranks 1 and 39), each mean one exact division
    "q_bootstrap_ci" ->
      """WITH pc AS (SELECT o_custkey,
                            CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend
                     FROM orders GROUP BY 1),
         r AS (SELECT spend AS v, ROW_NUMBER() OVER (ORDER BY spend) - 1 AS idx FROM pc),
         n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(v) AS HUGEINT) AS s FROM r),
         d AS (SELECT b.b, r.idx AS j,
                      ('0x' || substr(md5(CAST(b.b AS VARCHAR) || ':' || CAST(r.idx AS VARCHAR)), 1, 8))::BIGINT
                        % (SELECT n FROM n) AS t
               FROM r, (SELECT unnest(generate_series(0, 39)) AS b) b),
         m AS (SELECT d.b, CAST(SUM(CAST(r2.v AS HUGEINT)) AS DOUBLE) / (SELECT n FROM n) AS mean
               FROM d JOIN r r2 ON d.t = r2.idx GROUP BY 1),
         rk AS (SELECT b, mean, ROW_NUMBER() OVER (ORDER BY mean, b) AS rn FROM m)
         SELECT (SELECT n FROM n) AS n, 40 AS resamples,
                (SELECT CAST(s AS DOUBLE) / n FROM n) AS mean,
                MIN(CASE WHEN rn = 1 THEN mean END) AS ci_lo,
                MIN(CASE WHEN rn = 39 THEN mean END) AS ci_hi
         FROM rk""",
    // same session boundaries as q_sessionize, then the +1/-1 sweep over
    // the distinct change-second histogram — exact integers end to end
    "q_peak_concurrency" ->
      """WITH e AS (SELECT user_id, event_id, epoch_us(ts) AS us FROM events),
         g AS (SELECT user_id, us, event_id,
                      CASE WHEN us - LAG(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
                                > 1800000000 THEN 1 ELSE 0 END AS nw
               FROM e),
         sid AS (SELECT user_id, us,
                        SUM(nw) OVER (PARTITION BY user_id ORDER BY us, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
                 FROM g),
         sess AS (SELECT user_id, sid, MIN(us) // 1000000 AS s, MAX(us) // 1000000 AS en
                  FROM sid GROUP BY 1, 2),
         d AS (SELECT s AS t, 1 AS delta FROM sess
               UNION ALL SELECT en + 1, -1 FROM sess),
         h AS (SELECT t, CAST(SUM(delta) AS BIGINT) AS delta FROM d GROUP BY 1),
         r AS (SELECT t, SUM(delta) OVER (ORDER BY t
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run
               FROM h),
         pk AS (SELECT CAST(MAX(run) AS BIGINT) AS peak FROM r)
         SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM sess) AS n_sessions,
                (SELECT peak FROM pk) AS peak_concurrency,
                CAST((SELECT MIN(t) FROM r WHERE run = (SELECT peak FROM pk)) AS BIGINT) AS peak_at_sec
         FROM (SELECT 1)""",
    // k = ceil(n*p/100) in pure integer arithmetic; the block containing
    // sorted-desc position k contributes (k - prevc) of its c copies —
    // tie-exact; each share is one exact-integer division
    "q_top_share" ->
      """WITH pc AS (SELECT o_custkey,
                            CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS spend
                     FROM orders GROUP BY 1),
         j AS (SELECT c.c_mktsegment, pc.spend FROM pc JOIN customer c ON pc.o_custkey = c.c_custkey),
         h AS (SELECT c_mktsegment, spend AS v, CAST(COUNT(*) AS BIGINT) AS c FROM j GROUP BY 1, 2),
         w AS (SELECT c_mktsegment, v, c,
                      SUM(c) OVER (PARTITION BY c_mktsegment ORDER BY v DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumc,
                      SUM(CAST(v AS HUGEINT) * c) OVER (PARTITION BY c_mktsegment ORDER BY v DESC
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cumv,
                      SUM(c) OVER (PARTITION BY c_mktsegment) AS n,
                      SUM(CAST(v AS HUGEINT) * c) OVER (PARTITION BY c_mktsegment) AS tot
               FROM h),
         x AS (SELECT c_mktsegment, v, c, cumc, cumc - c AS prevc, cumv, n, tot FROM w)
         SELECT c_mktsegment, CAST(MAX(n) AS BIGINT) AS n,
                MAX(CASE WHEN prevc < (n * 1 + 99) // 100 AND (n * 1 + 99) // 100 <= cumc
                         THEN CAST(cumv - CAST(v AS HUGEINT) * c +
                                   CAST(v AS HUGEINT) * ((n * 1 + 99) // 100 - prevc) AS DOUBLE)
                              / CAST(tot AS DOUBLE) END) AS share_top_1,
                MAX(CASE WHEN prevc < (n * 5 + 99) // 100 AND (n * 5 + 99) // 100 <= cumc
                         THEN CAST(cumv - CAST(v AS HUGEINT) * c +
                                   CAST(v AS HUGEINT) * ((n * 5 + 99) // 100 - prevc) AS DOUBLE)
                              / CAST(tot AS DOUBLE) END) AS share_top_5,
                MAX(CASE WHEN prevc < (n * 10 + 99) // 100 AND (n * 10 + 99) // 100 <= cumc
                         THEN CAST(cumv - CAST(v AS HUGEINT) * c +
                                   CAST(v AS HUGEINT) * ((n * 10 + 99) // 100 - prevc) AS DOUBLE)
                              / CAST(tot AS DOUBLE) END) AS share_top_10,
                MAX(CASE WHEN prevc < (n * 25 + 99) // 100 AND (n * 25 + 99) // 100 <= cumc
                         THEN CAST(cumv - CAST(v AS HUGEINT) * c +
                                   CAST(v AS HUGEINT) * ((n * 25 + 99) // 100 - prevc) AS DOUBLE)
                              / CAST(tot AS DOUBLE) END) AS share_top_25
         FROM x GROUP BY 1 ORDER BY 1""",
    // the identical central-moment assembly shape over the identical exact
    // power sums — every step one correctly-rounded double op, then a
    // 6-dp round on O(1) magnitudes
    "q_moments" ->
      """WITH b AS (SELECT l_returnflag, CAST(floor(l_extendedprice / 100) AS BIGINT) AS v
                    FROM lineitem),
         a AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(CAST(v AS HUGEINT)) AS s1,
                      SUM(CAST(v AS HUGEINT) * v) AS s2,
                      SUM(CAST(v AS HUGEINT) * v * v) AS s3,
                      SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT) * CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s4
               FROM b GROUP BY 1),
         m AS (SELECT l_returnflag, n,
                      CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
                      CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                      CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                      CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
               FROM a),
         c AS (SELECT l_returnflag, n, m1,
                      r2 - m1 * m1 AS m2,
                      r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
                      r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 - 3.0 * m1 * m1 * m1 * m1 AS m4
               FROM m)
         SELECT l_returnflag, n, ROUND(m1, 6) AS mean,
                CASE WHEN n > 1 THEN ROUND(m2, 6) END AS m2,
                CASE WHEN n > 2 AND m2 > 0 THEN ROUND(m3 / (m2 * SQRT(m2)), 6) END AS skewness,
                CASE WHEN n > 3 AND m2 > 0 THEN ROUND(m4 / (m2 * m2) - 3.0, 6) END AS excess_kurtosis
         FROM c ORDER BY l_returnflag""",
    // frequencies quantize to 1e-9 longs immediately, so per-word moments
    // are exact integer sums and each z is a fixed chain; |Δz| re-quantizes
    // before the pair sum
    "q_burrows_delta" ->
      """WITH toks AS (SELECT source AS s,
                unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS w
              FROM documents),
         cnt AS (SELECT s, w, CAST(COUNT(*) AS BIGINT) AS c FROM toks GROUP BY 1, 2),
         tot AS (SELECT s, CAST(SUM(c) AS BIGINT) AS t FROM cnt GROUP BY 1),
         top AS (SELECT w FROM (
                  SELECT w, ROW_NUMBER() OVER (ORDER BY SUM(c) DESC, w) AS rn
                  FROM cnt GROUP BY w) WHERE rn <= 30),
         grid AS (SELECT tot.s, top.w,
                 CAST(FLOOR(CAST(COALESCE(cnt.c, 0) AS DOUBLE) / CAST(tot.t AS DOUBLE) * 1e9 + 0.5) AS BIGINT) AS fq
               FROM tot CROSS JOIN top
               LEFT JOIN cnt ON cnt.s = tot.s AND cnt.w = top.w),
         st AS (SELECT s, w, fq,
                 CAST(COUNT(*) OVER (PARTITION BY w) AS BIGINT) AS k,
                 CAST(SUM(fq) OVER (PARTITION BY w) AS BIGINT) AS sf,
                 CAST(SUM(CAST(fq AS HUGEINT) * fq) OVER (PARTITION BY w) AS HUGEINT) AS sf2
               FROM grid),
         z AS (SELECT s, w,
                 (CAST(fq AS DOUBLE) - CAST(sf AS DOUBLE) / CAST(k AS DOUBLE))
                 / SQRT(CAST(sf2 AS DOUBLE) / CAST(k AS DOUBLE)
                        - (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE)) * (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE))) AS z,
                 CAST(sf2 AS DOUBLE) / CAST(k AS DOUBLE)
                   - (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE)) * (CAST(sf AS DOUBLE) / CAST(k AS DOUBLE)) AS var
               FROM st)
         SELECT a.s AS source_a, b.s AS source_b,
                CAST(COUNT(*) AS BIGINT) AS m_words,
                ROUND(CAST(SUM(CAST(FLOOR(ABS(a.z - b.z) * 1e9 + 0.5) AS BIGINT)) AS DOUBLE)
                      / 1e9 / CAST(COUNT(*) AS DOUBLE), 6) AS delta
         FROM z a JOIN z b ON a.w = b.w AND a.s < b.s
         WHERE a.var > 0 AND b.var > 0
         GROUP BY 1, 2 ORDER BY source_a, source_b""",
    // runs/n1/n0 exact longs off one lag window; μ/σ²/z fixed IEEE chains
    "q_runs_test" ->
      """WITH daily AS (SELECT event_type AS g, CAST(ts AS DATE) AS o,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         r AS (SELECT g, o, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
                  CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS nall FROM daily),
         med AS (SELECT g, v AS med FROM r
                 WHERE rn = CAST(FLOOR(CAST(nall + 1 AS DOUBLE) / 2.0) AS BIGINT)),
         sg AS (SELECT d.g, d.o, (d.v > med.med) AS s
                FROM daily d JOIN med ON d.g = med.g WHERE d.v <> med.med),
         ch AS (SELECT g, s,
                  CASE WHEN LAG(s) OVER (PARTITION BY g ORDER BY o) IS NULL
                         OR s <> LAG(s) OVER (PARTITION BY g ORDER BY o)
                       THEN 1 ELSE 0 END AS chg
                FROM sg),
         agg AS (SELECT g, CAST(SUM(chg) AS BIGINT) AS runs,
                   CAST(SUM(CASE WHEN s THEN 1 ELSE 0 END) AS BIGINT) AS n1,
                   CAST(SUM(CASE WHEN NOT s THEN 1 ELSE 0 END) AS BIGINT) AS n0
                 FROM ch GROUP BY 1)
         SELECT g AS event_type, runs, n1 AS n_above, n0 AS n_below,
           CASE WHEN n1 > 0 AND n0 > 0 AND n1 + n0 > 1
                THEN ROUND(CAST(n1 * n0 * 2 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE) + 1.0, 6)
           END AS expected_runs,
           CASE WHEN n1 > 0 AND n0 > 0 AND n1 + n0 > 1
                THEN ROUND((CAST(runs AS DOUBLE)
                            - (CAST(n1 * n0 * 2 AS DOUBLE) / CAST(n1 + n0 AS DOUBLE) + 1.0))
                     / SQRT(CAST((n1 * n0 * 2) * (n1 * n0 * 2 - (n1 + n0)) AS DOUBLE)
                            / CAST((n1 + n0) * (n1 + n0) * (n1 + n0 - 1) AS DOUBLE)), 6)
           END AS z
         FROM agg ORDER BY event_type""",
    // the reassociated (k−1)·Σ(k·T_j−S)² / (k·(k·S−ΣR²)) exact form
    "q_cochran_q" ->
      """WITH f AS (SELECT
                CASE WHEN o_totalprice > 150000 THEN 1 ELSE 0 END AS r1,
                CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END AS r2,
                CASE WHEN o_orderstatus = 'F' THEN 1 ELSE 0 END AS r3
              FROM orders),
         a AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                 CAST(SUM(r1 + r2 + r3) AS BIGINT) AS s,
                 CAST(SUM((r1 + r2 + r3) * (r1 + r2 + r3)) AS BIGINT) AS rr,
                 CAST(SUM(r1) AS BIGINT) AS t1, CAST(SUM(r2) AS BIGINT) AS t2,
                 CAST(SUM(r3) AS BIGINT) AS t3
               FROM f)
         SELECT n, CAST(3 AS BIGINT) AS k, CAST(2 AS BIGINT) AS dof,
           CASE WHEN (s * 3 - rr) * 3 > 0
                THEN ROUND(CAST(((t1 * 3 - s) * (t1 * 3 - s)
                               + (t2 * 3 - s) * (t2 * 3 - s)
                               + (t3 * 3 - s) * (t3 * 3 - s)) * 2 AS DOUBLE)
                           / CAST((s * 3 - rr) * 3 AS DOUBLE), 6) END AS q
         FROM a""",
    // tp/fp/fn exact longs; F1 the reassociated one-division form; macro
    // over 1e-9-quantized class F1s
    "q_classification_report" ->
      """WITH pr AS (SELECT o_orderpriority AS a,
                (['1-URGENT','2-HIGH','3-MEDIUM','4-NOT SPECIFIED','5-LOW'])[
                  NTILE(5) OVER (ORDER BY o_totalprice DESC, o_orderkey)] AS p
              FROM orders),
         cells AS (SELECT a, p, CAST(COUNT(*) AS BIGINT) AS c FROM pr GROUP BY 1, 2),
         act AS (SELECT a AS label, CAST(SUM(c) AS BIGINT) AS actn FROM cells GROUP BY 1),
         prd AS (SELECT p AS label, CAST(SUM(c) AS BIGINT) AS prdn FROM cells GROUP BY 1),
         diag AS (SELECT a AS label, c AS tp FROM cells WHERE a = p),
         per AS (SELECT COALESCE(act.label, prd.label) AS label,
                   COALESCE(tp, 0) AS tp,
                   COALESCE(prdn, 0) - COALESCE(tp, 0) AS fp,
                   COALESCE(actn, 0) - COALESCE(tp, 0) AS fn
                 FROM act FULL OUTER JOIN prd ON act.label = prd.label
                      LEFT JOIN diag ON COALESCE(act.label, prd.label) = diag.label),
         x AS (SELECT label, tp, fp, fn,
                 CAST(tp * 2 AS DOUBLE) / CAST(tp * 2 + fp + fn AS DOUBLE) AS f1,
                 CAST(SUM(tp) OVER () AS BIGINT) AS tpall,
                 CAST(SUM(tp + fn) OVER () AS BIGINT) AS nall
               FROM per)
         SELECT label, CAST(tp + fn AS BIGINT) AS support,
                CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
                CASE WHEN tp + fp > 0
                     THEN ROUND(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END AS precision,
                CASE WHEN tp + fn > 0
                     THEN ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) END AS recall,
                ROUND(f1, 6) AS f1,
                ROUND(CAST(SUM(CAST(FLOOR(f1 * 1e9 + 0.5) AS BIGINT)) OVER () AS DOUBLE)
                      / 1e9 / CAST(COUNT(*) OVER () AS DOUBLE), 6) AS macro_f1,
                ROUND(CAST(tpall AS DOUBLE) / CAST(nall AS DOUBLE), 6) AS accuracy
         FROM x ORDER BY label""",
    // doubled midranks keep rank sums exact; Q is one division of longs
    "q_friedman" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS b, event_type AS t,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         kk AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM daily),
         comp AS (SELECT b FROM daily, kk GROUP BY b, k
                  HAVING COUNT(*) = MAX(k) AND COUNT(DISTINCT t) = MAX(k)),
         kept AS (SELECT d.* FROM daily d JOIN comp USING (b)),
         h AS (SELECT b, v, CAST(COUNT(*) AS BIGINT) AS c FROM kept GROUP BY 1, 2),
         r2 AS (SELECT b, v,
                  CAST((SUM(c) OVER (PARTITION BY b ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c) * 2
                       + c + 1 AS BIGINT) AS r2
                FROM h),
         pt AS (SELECT t, CAST(SUM(r2.r2) AS BIGINT) AS R2,
                       CAST(COUNT(*) AS BIGINT) AS nb
                FROM kept JOIN r2 ON kept.b = r2.b AND kept.v = r2.v
                GROUP BY 1),
         agg AS (SELECT MAX(nb) AS n, CAST(COUNT(*) AS BIGINT) AS k,
                        CAST(SUM(R2 * R2) AS BIGINT) AS sR2 FROM pt)
         SELECT n AS n_blocks, k, k - 1 AS dof,
           ROUND(CAST(sR2 * 3 - n * (k + 1) * 3 * (n * k * (k + 1)) AS DOUBLE)
                 / CAST(n * k * (k + 1) AS DOUBLE), 6) AS q
         FROM agg""",
    // per-stratum deviation/variance terms exact until one division each,
    // decimal(30,12) quantization before the strata sums
    "q_cmh" ->
      """WITH f AS (SELECT event_type AS s,
                (user_id % 2 = 0) AS e, (value > 100.0) AS o FROM events),
         st AS (SELECT s,
                CAST(SUM(CASE WHEN e AND o THEN 1 ELSE 0 END) AS BIGINT) AS a,
                CAST(SUM(CASE WHEN e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS b,
                CAST(SUM(CASE WHEN NOT e AND o THEN 1 ELSE 0 END) AS BIGINT) AS c,
                CAST(SUM(CASE WHEN NOT e AND NOT o THEN 1 ELSE 0 END) AS BIGINT) AS d,
                CAST(COUNT(*) AS BIGINT) AS n
              FROM f GROUP BY 1),
         t AS (SELECT n, a + b AS r1, c + d AS r0, a + c AS c1, b + d AS c0,
                a FROM st),
         terms AS (SELECT n,
                CASE WHEN n > 1 THEN CAST(
                  CAST(CAST(a AS HUGEINT) * n - CAST(r1 AS HUGEINT) * c1
                    AS DOUBLE) / CAST(n AS DOUBLE) AS DECIMAL(30,12))
                  ELSE CAST(0 AS DECIMAL(30,12)) END AS dv,
                CASE WHEN n > 1 THEN CAST(
                  CAST(CAST(r1 AS HUGEINT) * r0 * c1 * c0 AS DOUBLE)
                  / CAST(CAST(n AS HUGEINT) * n * (n - 1) AS DOUBLE)
                  AS DECIMAL(30,12))
                  ELSE CAST(0 AS DECIMAL(30,12)) END AS vr
              FROM t),
         agg AS (SELECT CAST(SUM(n) AS BIGINT) AS n,
                CAST(COUNT(*) AS BIGINT) AS n_strata,
                SUM(dv) AS sd, SUM(vr) AS sv FROM terms)
         SELECT n, n_strata,
                CASE WHEN sv > 0 THEN
                  ROUND(CAST(sd AS DOUBLE) * CAST(sd AS DOUBLE)
                    / CAST(sv AS DOUBLE), 6) END AS chi2_cmh,
                CASE WHEN sv > 0 THEN
                  ROUND(GREATEST(ABS(CAST(sd AS DOUBLE)) - 0.5, 0.0)
                    * GREATEST(ABS(CAST(sd AS DOUBLE)) - 0.5, 0.0)
                    / CAST(sv AS DOUBLE), 6) END AS chi2_cmh_corrected
         FROM agg""",
    // doubled-JT exact HUGEINT dominance sums, z a fixed IEEE chain
    "q_jonckheere" ->
      """WITH b AS (SELECT CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS g,
                CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS v
              FROM orders
              WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL),
         h AS (SELECT g, v, CAST(COUNT(*) AS BIGINT) AS c FROM b GROUP BY 1, 2),
         grp AS (SELECT g, CAST(SUM(c) AS BIGINT) AS ng FROM h GROUP BY 1),
         pr AS (SELECT a.g AS glo, bb.g AS ghi FROM grp a JOIN grp bb
                ON a.g < bb.g),
         contrib AS (SELECT pr.ghi AS g, h.v, CAST(SUM(h.c) AS BIGINT) AS cl
                FROM h JOIN pr ON h.g = pr.glo GROUP BY 1, 2),
         m AS (SELECT COALESCE(h.g, contrib.g) AS g,
                COALESCE(h.v, contrib.v) AS v,
                COALESCE(c, 0) AS c, COALESCE(cl, 0) AS cl
              FROM h FULL OUTER JOIN contrib
                ON h.g = contrib.g AND h.v = contrib.v),
         cells AS (SELECT c, cl,
                COALESCE(SUM(cl) OVER (PARTITION BY g ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS lp
              FROM m),
         jt AS (SELECT COALESCE(SUM(CAST(c AS HUGEINT)
                  * (2 * CAST(lp AS HUGEINT) + CAST(cl AS HUGEINT))),
                  CAST(0 AS HUGEINT)) AS jt2 FROM cells),
         mom AS (SELECT CAST(SUM(ng) AS HUGEINT) AS nn,
                CAST(COUNT(*) AS BIGINT) AS k,
                SUM(CAST(ng AS HUGEINT) * CAST(ng AS HUGEINT)) AS sn2,
                SUM(CAST(ng AS HUGEINT) * CAST(ng AS HUGEINT)
                  * (2 * CAST(ng AS HUGEINT) + 3)) AS sn23
              FROM grp),
         fin AS (SELECT nn, k, jt2,
                2 * jt2 - (nn * nn - sn2) AS num4,
                nn * nn * (2 * nn + 3) - sn23 AS vari
              FROM mom, jt)
         SELECT CAST(nn AS BIGINT) AS n, k,
                CASE WHEN k > 1 THEN ROUND(CAST(jt2 AS DOUBLE) / 2.0, 6) END
                  AS jt,
                CASE WHEN k > 1 AND vari > 0 THEN
                  ROUND(CAST(num4 AS DOUBLE)
                    / (4.0 * SQRT(CAST(vari AS DOUBLE) / 72.0)), 6) END AS z
         FROM fin""",
    // exact-integer term ingredients, decimal(30,12) term quantization
    "q_chi2_gof" ->
      """WITH expd(cat, w) AS (VALUES
             ('1-URGENT', 1), ('2-HIGH', 1), ('3-MEDIUM', 1),
             ('4-NOT SPECIFIED', 1), ('5-LOW', 1)),
         obs AS (SELECT o_orderpriority AS cat, CAST(COUNT(*) AS BIGINT) AS o
                 FROM orders WHERE o_orderpriority IS NOT NULL GROUP BY 1),
         j AS (SELECT COALESCE(o, 0) AS o, CAST(w AS BIGINT) AS w
               FROM obs FULL OUTER JOIN expd ON obs.cat = expd.cat),
         tot AS (SELECT CAST(SUM(o) AS BIGINT) AS n,
                 CAST(SUM(CASE WHEN w IS NULL THEN o ELSE 0 END) AS BIGINT) AS nu,
                 CAST(SUM(w) AS BIGINT) AS bw, MIN(w) AS minw,
                 CAST(SUM(CASE WHEN w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS k
                 FROM j),
         terms AS (SELECT n, nu, k, minw,
                 CASE WHEN n > 0 AND minw > 0 THEN
                   CAST(CAST((CAST(o AS HUGEINT) * bw - CAST(n AS HUGEINT) * w)
                        * (CAST(o AS HUGEINT) * bw - CAST(n AS HUGEINT) * w)
                        AS DOUBLE)
                     / CAST(CAST(n AS HUGEINT) * w * bw AS DOUBLE)
                     AS DECIMAL(30,12)) END AS t
               FROM j, tot WHERE w IS NOT NULL),
         agg AS (SELECT MAX(n) AS n, MAX(nu) AS n_unexpected, MAX(k) AS k,
                 MAX(k) - 1 AS dof, MAX(minw) AS minw, SUM(t) AS chi2q
                 FROM terms)
         SELECT n, k, dof, n_unexpected,
                CASE WHEN n_unexpected = 0 AND minw > 0 AND n > 0
                  THEN ROUND(CAST(chi2q AS DOUBLE), 6) END AS chi2
         FROM agg""",
    // the friedman scaffolding + hypothesized-order ranks; L2 and the
    // null moments exact HUGEINT, z one fixed IEEE chain
    "q_page_trend" ->
      """WITH cells AS (SELECT date_trunc('month', CAST(o_orderdate AS DATE)) AS b,
             CAST(SUBSTRING(o_orderpriority, 1, 1) AS BIGINT) AS t,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM orders GROUP BY 1, 2),
         kk AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM cells),
         comp AS (SELECT b FROM cells, kk GROUP BY b, k
                  HAVING COUNT(*) = MAX(k) AND COUNT(DISTINCT t) = MAX(k)),
         kept AS (SELECT c.* FROM cells c JOIN comp USING (b)),
         h AS (SELECT b, v, CAST(COUNT(*) AS BIGINT) AS c FROM kept GROUP BY 1, 2),
         r2 AS (SELECT b, v,
                  CAST((SUM(c) OVER (PARTITION BY b ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c) * 2
                       + c + 1 AS BIGINT) AS r2
                FROM h),
         pt AS (SELECT t, CAST(SUM(r2.r2) AS BIGINT) AS R2,
                       CAST(COUNT(*) AS BIGINT) AS nb
                FROM kept JOIN r2 ON kept.b = r2.b AND kept.v = r2.v
                GROUP BY 1),
         rk AS (SELECT t, R2, nb, ROW_NUMBER() OVER (ORDER BY t) AS cj FROM pt),
         agg AS (SELECT CAST(MAX(nb) AS HUGEINT) AS m,
                        CAST(COUNT(*) AS HUGEINT) AS k,
                        SUM(CAST(cj AS HUGEINT) * CAST(R2 AS HUGEINT)) AS l2
                 FROM rk),
         fin AS (SELECT m, k, l2,
                  2 * l2 - m * k * (k + 1) * (k + 1) AS num4,
                  m * k * k * (k + 1) * (k + 1) * (k - 1) AS vari
                 FROM agg)
         SELECT CAST(m AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k,
                ROUND(CAST(l2 AS DOUBLE) / 2.0, 6) AS l_stat,
                CASE WHEN k > 1 AND vari > 0 THEN
                  ROUND(CAST(num4 AS DOUBLE)
                    / (4.0 * SQRT(CAST(vari AS DOUBLE) / 144.0)), 6) END AS z
         FROM fin""",
    // the friedman midrank scaffolding + tie sum; W and chi2 each one
    // division of exact HUGEINT operands
    "q_kendall_w" ->
      """WITH daily AS (SELECT CAST(ts AS DATE) AS b, event_type AS t,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         kk AS (SELECT CAST(COUNT(DISTINCT t) AS BIGINT) AS k FROM daily),
         comp AS (SELECT b FROM daily, kk GROUP BY b, k
                  HAVING COUNT(*) = MAX(k) AND COUNT(DISTINCT t) = MAX(k)),
         kept AS (SELECT d.* FROM daily d JOIN comp USING (b)),
         h AS (SELECT b, v, CAST(COUNT(*) AS BIGINT) AS c FROM kept GROUP BY 1, 2),
         tie AS (SELECT COALESCE(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)
                    * CAST(c AS HUGEINT) - CAST(c AS HUGEINT)),
                  CAST(0 AS HUGEINT)) AS tt FROM h),
         r2 AS (SELECT b, v,
                  CAST((SUM(c) OVER (PARTITION BY b ORDER BY v
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - c) * 2
                       + c + 1 AS BIGINT) AS r2
                FROM h),
         pt AS (SELECT t, CAST(SUM(r2.r2) AS BIGINT) AS R2,
                       CAST(COUNT(*) AS BIGINT) AS nb
                FROM kept JOIN r2 ON kept.b = r2.b AND kept.v = r2.v
                GROUP BY 1),
         agg AS (SELECT CAST(MAX(nb) AS HUGEINT) AS m,
                        CAST(COUNT(*) AS HUGEINT) AS k,
                        SUM(CAST(R2 AS HUGEINT) * CAST(R2 AS HUGEINT)) AS sR2
                 FROM pt),
         fin AS (SELECT m, k,
                  3 * (sR2 - m * m * k * (k + 1) * (k + 1)) AS num,
                  m * m * (k * k * k - k) - m * tt AS den
                 FROM agg, tie)
         SELECT CAST(m AS BIGINT) AS n_blocks, CAST(k AS BIGINT) AS k,
                CAST(k - 1 AS BIGINT) AS dof,
                CASE WHEN den > 0 THEN
                  ROUND(CAST(num AS DOUBLE) / CAST(den AS DOUBLE), 6) END AS w,
                CASE WHEN den > 0 THEN
                  ROUND(CAST(num * m * (k - 1) AS DOUBLE)
                    / CAST(den AS DOUBLE), 6) END AS chi2
         FROM fin""",
    // discordant cells exact longs; each statistic one integer division
    "q_mcnemar" ->
      """WITH f AS (SELECT (o_totalprice > 150000) AS a,
                (o_orderpriority IN ('1-URGENT', '2-HIGH')) AS b
              FROM orders),
         agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(CASE WHEN a AND NOT b THEN 1 ELSE 0 END) AS BIGINT) AS b_only,
                  CAST(SUM(CASE WHEN NOT a AND b THEN 1 ELSE 0 END) AS BIGINT) AS c_only
                 FROM f)
         SELECT n, b_only, c_only,
           CASE WHEN b_only + c_only > 0
                THEN ROUND(CAST((b_only - c_only) * (b_only - c_only) AS DOUBLE)
                           / CAST(b_only + c_only AS DOUBLE), 6) END AS chi2,
           CASE WHEN b_only + c_only > 0
                THEN ROUND(CAST((ABS(b_only - c_only) - 1) * (ABS(b_only - c_only) - 1) AS DOUBLE)
                           / CAST(b_only + c_only AS DOUBLE), 6) END AS chi2_corrected
         FROM agg""",
    // selection median (⌊(n+1)/2⌋-th smallest) keeps deviations exact
    // longs; the tail is q_anova's exact-moment chain on those deviations
    "q_levene" ->
      """WITH e AS (SELECT event_type AS g,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events),
         r AS (SELECT g, v, ROW_NUMBER() OVER (PARTITION BY g ORDER BY v) AS rn,
                  CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n FROM e),
         med AS (SELECT g, v AS med FROM r
                 WHERE rn = CAST(FLOOR(CAST(n + 1 AS DOUBLE) / 2.0) AS BIGINT)),
         d AS (SELECT e.g, CAST(ABS(e.v - med.med) AS BIGINT) AS v
               FROM e JOIN med ON e.g = med.g),
         gg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
                  CAST(SUM(v) AS BIGINT) AS sg,
                  SUM(CAST(v AS HUGEINT) * v) AS qg FROM d GROUP BY 1),
         t AS (SELECT *, (SELECT CAST(SUM(ng) AS BIGINT) FROM gg) AS n,
                  (SELECT CAST(SUM(sg) AS BIGINT) FROM gg) AS s FROM gg),
         u AS (SELECT n,
             CAST(ng AS DOUBLE) *
               (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) *
               (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS ssb,
             CAST(qg AS DOUBLE) -
               CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS ssw
           FROM t)
         SELECT n, CAST(COUNT(*) AS BIGINT) AS n_groups,
           ROUND((SUM(ssb) / CAST(COUNT(*) - 1 AS DOUBLE)) /
                 (SUM(ssw) / CAST(n - COUNT(*) AS DOUBLE)), 6) AS f,
           ROUND(SUM(ssb) / (SUM(ssb) + SUM(ssw)), 6) AS eta_sq
         FROM u GROUP BY n""",
    // the q_moments exact-decimal machinery + the n/6·(g1²+g2²/4) chain
    "q_jarque_bera" ->
      """WITH b AS (SELECT l_returnflag, CAST(floor(l_extendedprice / 100) AS BIGINT) AS v
                    FROM lineitem),
         a AS (SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
                      SUM(CAST(v AS HUGEINT)) AS s1,
                      SUM(CAST(v AS HUGEINT) * v) AS s2,
                      SUM(CAST(v AS HUGEINT) * v * v) AS s3,
                      SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT) * CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS s4
               FROM b GROUP BY 1),
         m AS (SELECT l_returnflag, n,
                      CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS m1,
                      CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE) AS r2,
                      CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE) AS r3,
                      CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE) AS r4
               FROM a),
         c AS (SELECT l_returnflag, n,
                      r2 - m1 * m1 AS m2,
                      (r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1) AS m3,
                      (r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 - 3.0 * m1 * m1 * m1 * m1) AS m4
               FROM m),
         g AS (SELECT l_returnflag, n, m2,
                      m3 / (m2 * SQRT(m2)) AS g1,
                      m4 / (m2 * m2) - 3.0 AS g2
               FROM c)
         SELECT l_returnflag, n,
                CASE WHEN n > 3 AND m2 > 0 THEN ROUND(g1, 6) END AS skewness,
                CASE WHEN n > 3 AND m2 > 0 THEN ROUND(g2, 6) END AS excess_kurtosis,
                CASE WHEN n > 3 AND m2 > 0
                     THEN ROUND(CAST(n AS DOUBLE) / 6.0 * (g1 * g1 + g2 * g2 / 4.0), 6) END AS jb
         FROM g ORDER BY l_returnflag""",
    // q_triangles' oracle + the 2T/(d(d-1)) readout — one exact division
    "q_clustering_coeff" ->
      """WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem
                     JOIN orders ON l_orderkey = o_orderkey
                     WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                       AND o_orderdate < TIMESTAMP '1996-07-01'),
         e AS (SELECT DISTINCT LEAST(a.p, b.p) AS x, GREATEST(a.p, b.p) AS y
               FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p),
         deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d
                 FROM (SELECT x AS n FROM e UNION ALL SELECT y FROM e) GROUP BY 1),
         tri AS (SELECT e1.x AS a, e1.y AS b, e2.y AS c
                 FROM e e1 JOIN e e2 ON e1.y = e2.x
                 JOIN e e3 ON e3.x = e1.x AND e3.y = e2.y),
         tn AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS nt
                FROM (SELECT a AS n FROM tri UNION ALL SELECT b FROM tri
                      UNION ALL SELECT c FROM tri) GROUP BY 1)
         SELECT deg.n AS node, deg.d AS degree, COALESCE(tn.nt, 0) AS n_triangles,
                CASE WHEN deg.d > 1
                     THEN CAST(COALESCE(tn.nt, 0) * 2 AS DOUBLE) / (deg.d * (deg.d - 1))
                END AS clustering
         FROM deg LEFT JOIN tn ON deg.n = tn.n
         ORDER BY node""",
    // stream == batch exactly over the DOLLAR-quantized histogram (the
    // state-bounding knob); same selection shape as q_weighted_median
    "q_weighted_median_stream" ->
      """WITH h AS (SELECT l_returnflag,
                           CAST(floor(l_extendedprice + 0.5) AS BIGINT) AS v,
                           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS w
                    FROM lineitem GROUP BY 1, 2),
         c AS (SELECT l_returnflag, v, w,
                      CAST(SUM(w) OVER (PARTITION BY l_returnflag ORDER BY v
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum,
                      CAST(SUM(w) OVER (PARTITION BY l_returnflag) AS BIGINT) AS tot
               FROM h)
         SELECT l_returnflag,
                CAST(MIN(CASE WHEN cum * 2 >= tot THEN v END) AS BIGINT) AS weighted_median,
                CAST(MAX(tot) AS BIGINT) AS total_weight
         FROM c GROUP BY 1 ORDER BY 1""",
    // the two-pass prefix sum equals the plain window running sum —
    // exactly what the oracle replays
    "q_running_total" ->
      """SELECT o_orderkey,
                CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT) AS cents,
                CAST(SUM(CAST(floor(o_totalprice * 100 + 0.5) AS BIGINT))
                     OVER (ORDER BY o_orderdate, o_orderkey
                           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS running_cents
         FROM orders ORDER BY o_orderkey""",
    // WAU as a 7-day explode of distinct (user, day) pairs — exact
    // distinct counting with bounded fan-out, one division for stickiness
    "q_active_users" ->
      """WITH ud AS (SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events),
         ex AS (SELECT DISTINCT user_id, day + i AS wday
                FROM ud, (SELECT CAST(unnest(generate_series(0, 6)) AS INTEGER) AS i)),
         wau AS (SELECT wday, CAST(COUNT(*) AS BIGINT) AS wau FROM ex GROUP BY 1),
         dau AS (SELECT day, CAST(COUNT(*) AS BIGINT) AS dau FROM ud GROUP BY 1)
         SELECT d.day, d.dau, w.wau, CAST(d.dau AS DOUBLE) / w.wau AS stickiness
         FROM dau d JOIN wau w ON d.day = w.wday ORDER BY d.day""",
    // the same three regex counts and the identical fixed IEEE chain
    // 206.835 − 1.015·(w/s) − 84.6·(syl/w); 6-dp round on O(100) magnitudes
    "q_readability" ->
      """WITH c AS (SELECT doc_id,
                CAST(len(regexp_extract_all(text, '[A-Za-z]+')) AS BIGINT) AS n_words,
                CAST(GREATEST(len(regexp_extract_all(text, '[.!?]+')), 1) AS BIGINT) AS n_sentences,
                CAST(len(regexp_extract_all(lower(text), '[aeiouy]+')) AS BIGINT) AS n_syllables
         FROM documents)
         SELECT doc_id, n_words, n_sentences, n_syllables,
                CASE WHEN n_words > 0 THEN
                  ROUND(206.835
                    - 1.015 * (CAST(n_words AS DOUBLE) / CAST(n_sentences AS DOUBLE))
                    - 84.6 * (CAST(n_syllables AS DOUBLE) / CAST(n_words AS DOUBLE)), 6)
                END AS flesch
         FROM c ORDER BY doc_id""",
    // open/close replayed on the identical (ts, event_id) total order;
    // high/low/volume order-free, the sum in exact cents
    "q_ohlc" -> ohlcOracle,
    // stream == batch exactly: min_by/max_by over the same (ts, event_id)
    // total order replaces the batch row_number windows
    "q_ohlc_stream" -> ohlcOracle,
    "q_kcore" -> kCoreOracle,
    // metadata-only audit: the expected report is a constant — the oracle
    // pins it literally (Spark reads the same parquet schema DuckDB does)
    "q_schema_contract" ->
      """SELECT * FROM (VALUES
           ('o_custkey', 'bigint', 'bigint', 'ok'),
           ('o_missing_col', 'string', CAST(NULL AS VARCHAR), 'missing'),
           ('o_orderdate', 'timestamp_ntz', 'timestamp_ntz', 'ok'),
           ('o_orderkey', 'bigint', 'bigint', 'ok'),
           ('o_orderpriority', CAST(NULL AS VARCHAR), 'string', 'unexpected'),
           ('o_orderstatus', 'int', 'string', 'type_mismatch'),
           ('o_totalprice', 'double', 'double', 'ok'))
         AS t("column", expected_type, actual_type, status)
         ORDER BY "column"""",
    // quantize-then-exact-sum discipline on the log terms (the
    // char_entropy precedent) — no order-dependent double SUM
    "q_degree_tail" ->
      """WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate < TIMESTAMP '1996-07-01'),
         e AS (SELECT DISTINCT LEAST(a.p, b.p) AS a, GREATEST(a.p, b.p) AS b
               FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p),
         deg AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS d
                 FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e) GROUP BY 1),
         t AS (SELECT CAST(ROUND(LN(CAST(d AS DOUBLE) / 8), 6) AS DECIMAL(28,6)) AS lt
               FROM deg WHERE d >= 8)
         SELECT CAST(8 AS BIGINT) AS d_min,
                CAST(COUNT(*) AS BIGINT) AS n_tail,
                ROUND(1.0 + CAST(COUNT(*) AS DOUBLE) / CAST(SUM(lt) AS DOUBLE), 6) AS alpha
         FROM t""",
    "q_histogram2d" ->
      """WITH b AS (SELECT MIN(l_quantity) AS xlo, MAX(l_quantity) AS xhi,
                           MIN(l_extendedprice) AS ylo, MAX(l_extendedprice) AS yhi
                    FROM lineitem),
         w AS (SELECT xlo, ylo, (xhi - xlo) / 8 AS wx, (yhi - ylo) / 8 AS wy FROM b),
         g AS (SELECT LEAST(CASE WHEN wx = 0 THEN 0
                                 ELSE FLOOR((l_quantity - xlo) / wx) END, 7) AS bin_x,
                      LEAST(CASE WHEN wy = 0 THEN 0
                                 ELSE FLOOR((l_extendedprice - ylo) / wy) END, 7) AS bin_y
               FROM lineitem, w)
         SELECT CAST(bin_x AS BIGINT) AS bin_x, CAST(bin_y AS BIGINT) AS bin_y,
                CAST(COUNT(*) AS BIGINT) AS n
         FROM g GROUP BY 1, 2 ORDER BY bin_x, bin_y""",
    // Lindley reflection: balance = S - min(0, running min S) — plain
    // windows replay the "sequential" recursion exactly
    "q_wallet_balance" ->
      """WITH sv AS (SELECT user_id, ts, event_id,
                CASE WHEN event_type IN ('purchase', 'signup')
                     THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                     ELSE -CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS delta
              FROM events),
         s1 AS (SELECT user_id, ts, event_id,
                CAST(SUM(delta) OVER w AS BIGINT) AS ps
               FROM sv
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         s2 AS (SELECT user_id, ts, event_id, ps,
                CAST(MIN(ps) OVER w AS BIGINT) AS pm
               FROM s1
               WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
         b AS (SELECT user_id, ts, event_id, ps - LEAST(0, pm) AS balance FROM s2),
         agg AS (SELECT user_id,
                CAST(MAX(balance) AS BIGINT) AS peak_balance,
                CAST(SUM(CASE WHEN balance = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_floor_touches,
                CAST(COUNT(*) AS BIGINT) AS n_events
               FROM b GROUP BY 1),
         lastb AS (SELECT user_id, CAST(balance AS BIGINT) AS end_balance
               FROM (SELECT user_id, balance, ROW_NUMBER() OVER
                       (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
                     FROM b) WHERE rn = 1)
         SELECT agg.user_id, end_balance, peak_balance, n_floor_touches, n_events
         FROM agg JOIN lastb ON agg.user_id = lastb.user_id
         ORDER BY agg.user_id""",
    // cumulative deviations via the exact-prefix closed form P − j·(S/w);
    // the only float SUMs are tiny block averages and the 3-point OLS
    "q_hurst" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         pos AS (SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1 AS i
           FROM daily),
         ex AS (SELECT event_type, v, i, w FROM pos, UNNEST([4, 8, 16]) AS t(w)),
         ex2 AS (SELECT *, CAST(FLOOR(i / w) AS BIGINT) AS b,
             CAST(COUNT(*) OVER (PARTITION BY event_type, w) AS BIGINT) AS nk
           FROM ex),
         ex3 AS (SELECT * FROM ex2 WHERE (b + 1) * w <= nk),
         blk AS (SELECT *,
             CAST(SUM(v) OVER (PARTITION BY event_type, w, b ORDER BY i
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS p,
             CAST(SUM(v) OVER (PARTITION BY event_type, w, b) AS BIGINT) AS sb,
             SUM(CAST(v AS HUGEINT) * v) OVER (PARTITION BY event_type, w, b) AS qb,
             CAST(ROW_NUMBER() OVER (PARTITION BY event_type, w, b ORDER BY i)
               AS DOUBLE) AS j
           FROM ex3),
         cd AS (SELECT *, CAST(p AS DOUBLE)
                  - j * (CAST(sb AS DOUBLE) / CAST(w AS DOUBLE)) AS cd FROM blk),
         pb AS (SELECT event_type, w, b, sb, qb, MAX(cd) - MIN(cd) AS r
                FROM cd GROUP BY 1, 2, 3, 4, 5),
         pb2 AS (SELECT *, SQRT((CAST(qb AS DOUBLE) - CAST(sb AS DOUBLE) * CAST(sb AS DOUBLE)
                   / CAST(w AS DOUBLE)) / CAST(w AS DOUBLE)) AS s FROM pb),
         rs AS (SELECT event_type, w, r / s AS rs FROM pb2 WHERE s > 0),
         ms AS (SELECT event_type, w, AVG(rs) AS mrs FROM rs GROUP BY 1, 2),
         ps AS (SELECT event_type, LN(CAST(w AS DOUBLE)) AS x, LN(mrs) AS y
                FROM ms WHERE mrs > 0)
         SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_sizes,
           ROUND((CAST(COUNT(*) AS DOUBLE) * SUM(x * y) - SUM(x) * SUM(y)) /
                 (CAST(COUNT(*) AS DOUBLE) * SUM(x * x) - SUM(x) * SUM(x)), 6) AS hurst
         FROM ps GROUP BY 1 HAVING COUNT(*) >= 2 ORDER BY event_type""",
    // z / PAA means are fixed IEEE chains from exact integer sums; the
    // ±0.6744897501960817 breakpoints are identical literals on both sides
    "q_sax" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         pos AS (SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1 AS i,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(SUM(v) OVER (PARTITION BY event_type) AS BIGINT) AS s,
             SUM(CAST(v AS HUGEINT) * v) OVER (PARTITION BY event_type) AS q
           FROM daily),
         seg AS (SELECT event_type, n, s, q,
             CAST(FLOOR(i * 8 / n) AS INT) AS sg,
             CAST(SUM(v) AS BIGINT) AS sv, CAST(COUNT(*) AS BIGINT) AS cv
           FROM pos WHERE n >= 8 GROUP BY 1, 2, 3, 4, 5),
         z AS (SELECT event_type, n, sg,
             CASE WHEN SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) > 0
                  THEN (CAST(sv AS DOUBLE) / CAST(cv AS DOUBLE)
                        - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       / SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                  ELSE 0.0 END AS z
           FROM seg),
         sym AS (SELECT event_type, n, sg,
             CASE WHEN z < -0.6744897501960817 THEN 'a'
                  WHEN z < 0.0 THEN 'b'
                  WHEN z < 0.6744897501960817 THEN 'c'
                  ELSE 'd' END AS sym
           FROM z)
         SELECT event_type, MAX(n) AS n,
           STRING_AGG(sym, '' ORDER BY sg) AS sax_word
         FROM sym GROUP BY event_type ORDER BY event_type""",
    // stream twin: integer daily state => stream == batch, shared oracle
    "q_sax_stream" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         pos AS (SELECT event_type, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1 AS i,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n,
             CAST(SUM(v) OVER (PARTITION BY event_type) AS BIGINT) AS s,
             SUM(CAST(v AS HUGEINT) * v) OVER (PARTITION BY event_type) AS q
           FROM daily),
         seg AS (SELECT event_type, n, s, q,
             CAST(FLOOR(i * 8 / n) AS INT) AS sg,
             CAST(SUM(v) AS BIGINT) AS sv, CAST(COUNT(*) AS BIGINT) AS cv
           FROM pos WHERE n >= 8 GROUP BY 1, 2, 3, 4, 5),
         z AS (SELECT event_type, n, sg,
             CASE WHEN SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                      / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE)) > 0
                  THEN (CAST(sv AS DOUBLE) / CAST(cv AS DOUBLE)
                        - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                       / SQRT((CAST(q AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                          / CAST(n AS DOUBLE)) / CAST(n AS DOUBLE))
                  ELSE 0.0 END AS z
           FROM seg),
         sym AS (SELECT event_type, n, sg,
             CASE WHEN z < -0.6744897501960817 THEN 'a'
                  WHEN z < 0.0 THEN 'b'
                  WHEN z < 0.6744897501960817 THEN 'c'
                  ELSE 'd' END AS sym
           FROM z)
         SELECT event_type, MAX(n) AS n,
           STRING_AGG(sym, '' ORDER BY sg) AS sax_word
         FROM sym GROUP BY event_type ORDER BY event_type""",
    // exact long error sums; MAEs one division each, MASE one more
    "q_forecast_backtest" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         l AS (SELECT event_type,
             ABS(v - LAG(v, 1) OVER (PARTITION BY event_type ORDER BY day)) AS d1,
             ABS(v - LAG(v, 7) OVER (PARTITION BY event_type ORDER BY day)) AS dm
           FROM daily),
         a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d1) AS BIGINT) AS s1, CAST(COUNT(d1) AS BIGINT) AS c1,
             CAST(SUM(dm) AS BIGINT) AS sm, CAST(COUNT(dm) AS BIGINT) AS cm
           FROM l GROUP BY 1)
         SELECT event_type, n,
           ROUND(CAST(s1 AS DOUBLE) / CAST(c1 AS DOUBLE), 6) AS mae_naive,
           CASE WHEN cm > 0
                THEN ROUND(CAST(sm AS DOUBLE) / CAST(cm AS DOUBLE), 6) END AS mae_snaive,
           CASE WHEN cm > 0
                THEN ROUND((CAST(s1 AS DOUBLE) / CAST(c1 AS DOUBLE)) /
                           (CAST(sm AS DOUBLE) / CAST(cm AS DOUBLE)), 6) END AS mase
         FROM a ORDER BY event_type""",
    // stream twin: integer daily state => stream == batch, shared oracle
    "q_forecast_backtest_stream" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         l AS (SELECT event_type,
             ABS(v - LAG(v, 1) OVER (PARTITION BY event_type ORDER BY day)) AS d1,
             ABS(v - LAG(v, 7) OVER (PARTITION BY event_type ORDER BY day)) AS dm
           FROM daily),
         a AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(d1) AS BIGINT) AS s1, CAST(COUNT(d1) AS BIGINT) AS c1,
             CAST(SUM(dm) AS BIGINT) AS sm, CAST(COUNT(dm) AS BIGINT) AS cm
           FROM l GROUP BY 1)
         SELECT event_type, n,
           ROUND(CAST(s1 AS DOUBLE) / CAST(c1 AS DOUBLE), 6) AS mae_naive,
           CASE WHEN cm > 0
                THEN ROUND(CAST(sm AS DOUBLE) / CAST(cm AS DOUBLE), 6) END AS mae_snaive,
           CASE WHEN cm > 0
                THEN ROUND((CAST(s1 AS DOUBLE) / CAST(c1 AS DOUBLE)) /
                           (CAST(sm AS DOUBLE) / CAST(cm AS DOUBLE)), 6) END AS mase
         FROM a ORDER BY event_type""",
    // the recursion replayed step-for-step; (1.0 - 0.3) spelled as a
    // SUBTRACTION because the folded 1−α is NOT the same double as a 0.7
    // literal — outputs ship unrounded (identical bits render identically)
    // the q_holt recursive-CTE recipe over a zero-filled daily spine;
    // Croston state (z, p, q) seeds at the first demand, zero periods
    // only advance q — mirrors Temporal.crostonForecast bit-for-bit; the
    // streaming twin maintains the daily counters in the state store
    // (integer state => stream == batch) and shares the SQL
    "q_croston" -> crostonOracle,
    "q_croston_stream" -> crostonOracle,
    "q_holt" ->
      """WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         s AS (SELECT event_type, CAST(v AS DOUBLE) AS x,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS step,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           FROM daily),
         h AS (
           SELECT event_type, step, n, x AS level, CAST(0.0 AS DOUBLE) AS trend
           FROM s WHERE step = 1
           UNION ALL
           SELECT s.event_type, s.step, s.n,
             0.3 * s.x + (1.0 - 0.3) * (h.level + h.trend),
             0.1 * ((0.3 * s.x + (1.0 - 0.3) * (h.level + h.trend)) - h.level)
               + (1.0 - 0.1) * h.trend
           FROM h JOIN s ON s.event_type = h.event_type AND s.step = h.step + 1)
         SELECT event_type, n, level, trend, level + trend AS forecast
         FROM h WHERE step = n ORDER BY event_type""",
    // the q_holt recursive-CTE recipe: predict/gain/update each a fixed
    // IEEE chain, outputs unrounded
    // the streamed complete-mode daily table equals the batch one exactly,
    // so the S51 twin replays q_kalman's oracle verbatim
    "q_kalman_stream" ->
      """WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         s AS (SELECT event_type AS g, CAST(v AS DOUBLE) AS z,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS step,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           FROM daily),
         kf AS (
           SELECT g, step, n, z AS x, CAST(1e8 AS DOUBLE) AS p,
                  CAST(0.0 AS DOUBLE) AS gain, CAST(0.0 AS DOUBLE) AS innov
           FROM s WHERE step = 1
           UNION ALL
           SELECT s.g, s.step, s.n,
             kf.x + ((kf.p + 1e4) / ((kf.p + 1e4) + 1e8)) * (s.z - kf.x),
             (1.0 - (kf.p + 1e4) / ((kf.p + 1e4) + 1e8)) * (kf.p + 1e4),
             (kf.p + 1e4) / ((kf.p + 1e4) + 1e8),
             s.z - kf.x
           FROM kf JOIN s ON s.g = kf.g AND s.step = kf.step + 1)
         SELECT g AS event_type, n, x AS level, p AS p_var, gain,
                innov AS innovation
         FROM kf WHERE step = n ORDER BY event_type""",
    "q_kalman" ->
      """WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         s AS (SELECT event_type AS g, CAST(v AS DOUBLE) AS z,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS step,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           FROM daily),
         kf AS (
           SELECT g, step, n, z AS x, CAST(1e8 AS DOUBLE) AS p,
                  CAST(0.0 AS DOUBLE) AS gain, CAST(0.0 AS DOUBLE) AS innov
           FROM s WHERE step = 1
           UNION ALL
           SELECT s.g, s.step, s.n,
             kf.x + ((kf.p + 1e4) / ((kf.p + 1e4) + 1e8)) * (s.z - kf.x),
             (1.0 - (kf.p + 1e4) / ((kf.p + 1e4) + 1e8)) * (kf.p + 1e4),
             (kf.p + 1e4) / ((kf.p + 1e4) + 1e8),
             s.z - kf.x
           FROM kf JOIN s ON s.g = kf.g AND s.step = kf.step + 1)
         SELECT g AS event_type, n, x AS level, p AS p_var, gain,
                innov AS innovation
         FROM kf WHERE step = n ORDER BY event_type""",
    // the q_holt recursion with the rotating seasonal vector carried as a
    // LIST column; init period sums exact longs, one division each; the
    // (1.0 - α) forms mirror Spark's lit(1.0) - a bit-exactly
    "q_holt_winters" ->
      """WITH RECURSIVE daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         s AS (SELECT event_type AS g, v,
             ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) AS step,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           FROM daily),
         base AS (SELECT g, MAX(n) AS n,
             CAST(SUM(CASE WHEN step <= 7 THEN v END) AS BIGINT) AS s1,
             CAST(SUM(CASE WHEN step BETWEEN 8 AND 14 THEN v END) AS BIGINT) AS s2,
             list(v ORDER BY step) FILTER (WHERE step <= 7) AS first7
           FROM s GROUP BY g HAVING MAX(n) >= 14),
         init AS (SELECT g, n, CAST(7 AS BIGINT) AS step,
             CAST(s1 AS DOUBLE) / 7.0 AS level,
             (CAST(s2 AS DOUBLE) / 7.0 - CAST(s1 AS DOUBLE) / 7.0) / 7.0 AS trend,
             list_transform(first7,
               e -> CAST(e AS DOUBLE) - CAST(s1 AS DOUBLE) / 7.0) AS seas
           FROM base),
         hw AS (
           SELECT g, n, step, level, trend, seas FROM init
           UNION ALL
           SELECT s.g, s.n, s.step,
             0.3 * (CAST(s.v AS DOUBLE) - hw.seas[1])
               + (1.0 - 0.3) * (hw.level + hw.trend),
             0.1 * ((0.3 * (CAST(s.v AS DOUBLE) - hw.seas[1])
                     + (1.0 - 0.3) * (hw.level + hw.trend)) - hw.level)
               + (1.0 - 0.1) * hw.trend,
             list_append(hw.seas[2:],
               0.2 * (CAST(s.v AS DOUBLE)
                      - (0.3 * (CAST(s.v AS DOUBLE) - hw.seas[1])
                         + (1.0 - 0.3) * (hw.level + hw.trend)))
                 + (1.0 - 0.2) * hw.seas[1])
           FROM hw JOIN s ON s.g = hw.g AND s.step = hw.step + 1)
         SELECT g AS event_type, n, level, trend,
                level + trend + seas[1] AS forecast
         FROM hw WHERE step = n ORDER BY event_type""",
    // gains are a fixed expression tree of single IEEE ops on exact longs
    // — bit-identical, so even the double-ordered argmax replays
    "q_changepoint" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM events GROUP BY 1, 2),
         c AS (SELECT event_type, day,
             CAST(SUM(v) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sk,
             CAST(COUNT(*) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS kk,
             CAST(SUM(v) OVER (PARTITION BY event_type) AS BIGINT) AS s,
             CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
           FROM daily),
         g AS (SELECT *,
             CAST((CAST(n AS HUGEINT) * sk - CAST(kk AS HUGEINT) * s)
                  * (CAST(n AS HUGEINT) * sk - CAST(kk AS HUGEINT) * s) AS DOUBLE)
               / CAST(CAST(kk AS HUGEINT) * (n - kk) * n AS DOUBLE) AS gain
           FROM c WHERE kk < n),
         r AS (SELECT *, ROW_NUMBER() OVER
                 (PARTITION BY event_type ORDER BY gain DESC, day) AS rn FROM g)
         SELECT event_type, n, kk AS cp_index, day AS cp_at,
           gain,
           ROUND(CAST(sk AS DOUBLE) / CAST(kk AS DOUBLE), 6) AS mean_left,
           ROUND(CAST(s - sk AS DOUBLE) / CAST(n - kk AS DOUBLE), 6) AS mean_right
         FROM r WHERE rn = 1 ORDER BY event_type""",
    // pooled + per-group quantized terms off one scan; the reported
    // additivity gap is the shared quantization residual
    "q_theil_decomp" ->
      """WITH spend AS (SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM orders GROUP BY 1),
         j AS (SELECT c.c_mktsegment AS g, s.v
               FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey),
         w AS (SELECT g, v,
             CAST(COUNT(*) OVER () AS BIGINT) AS n,
             CAST(SUM(v) OVER () AS BIGINT) AS s,
             CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS ng,
             CAST(SUM(v) OVER (PARTITION BY g) AS BIGINT) AS sg
           FROM j),
         t AS (SELECT *,
             CAST(FLOOR((CASE WHEN v > 0
                  THEN (CAST(v AS DOUBLE) / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                       * LN(CAST(v AS DOUBLE) / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))
                  ELSE 0.0 END) * 1e9 + 0.5) AS BIGINT) AS tqa,
             CAST(FLOOR((CASE WHEN v > 0
                  THEN (CAST(v AS DOUBLE) / (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)))
                       * LN(CAST(v AS DOUBLE) / (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE)))
                  ELSE 0.0 END) * 1e9 + 0.5) AS BIGINT) AS tqg
           FROM w),
         pg AS (SELECT g, n, s, ng, sg, CAST(SUM(tqa) AS BIGINT) AS ta,
                  CAST(SUM(tqg) AS BIGINT) AS tg
                FROM t GROUP BY 1, 2, 3, 4, 5),
         fin AS (SELECT n, CAST(COUNT(*) AS BIGINT) AS n_groups,
             CAST(SUM(ta) AS DOUBLE) / 1e9 / CAST(n AS DOUBLE) AS tt,
             SUM((CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))
               * LN((CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE))
                    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)))) AS tb,
             SUM((CAST(sg AS DOUBLE) / CAST(s AS DOUBLE))
               * (CAST(tg AS DOUBLE) / 1e9 / CAST(ng AS DOUBLE))) AS tw
           FROM pg GROUP BY n)
         SELECT n, n_groups, ROUND(tt, 6) AS t_total, ROUND(tb, 6) AS t_between,
           ROUND(tw, 6) AS t_within, ROUND(tt - (tb + tw), 6) + 0.0 AS additivity_gap
         FROM fin""",
    // per-row terms quantized to 1e-9 longs before the sum (degree-tail
    // discipline) so the float work is per-row single ops only
    "q_theil" ->
      """WITH spend AS (SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS v
           FROM orders GROUP BY 1),
         j AS (SELECT c.c_mktsegment AS g, s.v
               FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey),
         w AS (SELECT g, v,
             CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n,
             CAST(SUM(v) OVER (PARTITION BY g) AS BIGINT) AS sv
           FROM j),
         t AS (SELECT g, n,
             CAST(FLOOR((CASE WHEN v > 0
                  THEN (CAST(v AS DOUBLE) / (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)))
                       * LN(CAST(v AS DOUBLE) / (CAST(sv AS DOUBLE) / CAST(n AS DOUBLE)))
                  ELSE 0.0 END) * 1e9 + 0.5) AS BIGINT) AS tq
           FROM w)
         SELECT g AS c_mktsegment, MAX(n) AS n,
           ROUND(CAST(SUM(tq) AS DOUBLE) / 1e9 / CAST(MAX(n) AS DOUBLE), 6) AS theil_t
         FROM t GROUP BY g ORDER BY c_mktsegment""",
    // NTILE over an explicit total order; shares single divisions of
    // exact long sums
    "q_lorenz" ->
      """WITH spend AS (SELECT o_custkey,
             CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         j AS (SELECT c.c_mktsegment AS g, s.cents AS v, s.o_custkey AS k
               FROM spend s JOIN customer c ON s.o_custkey = c.c_custkey),
         b AS (SELECT g, v, NTILE(10) OVER (PARTITION BY g ORDER BY v, k) AS d FROM j),
         per AS (SELECT g, d, CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(v) AS BIGINT) AS sv FROM b GROUP BY 1, 2),
         t AS (SELECT *, CAST(SUM(sv) OVER (PARTITION BY g) AS BIGINT) AS tt,
                 CAST(SUM(sv) OVER (PARTITION BY g ORDER BY d
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cc
               FROM per)
         SELECT g AS c_mktsegment, d AS decile, n, sv AS value_sum,
           ROUND(CAST(sv AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS share,
           ROUND(CAST(cc AS DOUBLE) / CAST(tt AS DOUBLE), 6) AS cum_share
         FROM t ORDER BY c_mktsegment, decile""",
    // per-subject category-square sums via the pairwise-equality closed
    // form; marginal squares over the 3-label domain only
    "q_fleiss_kappa" ->
      """WITH l AS (SELECT
             CASE WHEN value < 100.0 THEN 'low'
                  WHEN value < 500.0 THEN 'mid' ELSE 'high' END AS a,
             CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) < 33 THEN 'low'
                  WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) < 66 THEN 'mid'
                  ELSE 'high' END AS b,
             CASE event_id % 3 WHEN 0 THEN 'low' WHEN 1 THEN 'mid' ELSE 'high' END AS c
           FROM events),
         subj AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(3 + 2 * ((CASE WHEN a = b THEN 1 ELSE 0 END)
                  + (CASE WHEN a = c THEN 1 ELSE 0 END)
                  + (CASE WHEN b = c THEN 1 ELSE 0 END))) AS BIGINT) AS ss
           FROM l),
         cats AS (SELECT cc, CAST(COUNT(*) AS BIGINT) AS k FROM (
             SELECT a AS cc FROM l UNION ALL SELECT b FROM l
             UNION ALL SELECT c FROM l) GROUP BY 1),
         pe AS (SELECT SUM((CAST(k AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)))
                  * (CAST(k AS DOUBLE) / (3.0 * CAST(n AS DOUBLE)))) AS pe,
                  MAX(n) AS n, MAX(ss) AS ss
                FROM cats, subj)
         SELECT n, 3 AS n_raters,
           ROUND((CAST(ss AS DOUBLE) - 3.0 * CAST(n AS DOUBLE))
                 / (3.0 * (3.0 - 1.0) * CAST(n AS DOUBLE)), 6) AS p_observed,
           ROUND(pe, 6) AS p_chance,
           CASE WHEN pe < 1.0
                THEN ROUND(((CAST(ss AS DOUBLE) - 3.0 * CAST(n AS DOUBLE))
                      / (3.0 * (3.0 - 1.0) * CAST(n AS DOUBLE)) - pe) / (1.0 - pe), 6)
                END AS kappa
         FROM pe""",
    // confusion counts and marginal cross products exact; kappa a fixed
    // chain of single divisions
    "q_cohen_kappa" ->
      """WITH l AS (SELECT
             CASE WHEN value < 100.0 THEN 'low'
                  WHEN value < 500.0 THEN 'mid' ELSE 'high' END AS a,
             CASE WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) < 33 THEN 'low'
                  WHEN CAST(json_extract_string(props, '$.k') AS BIGINT) < 66 THEN 'mid'
                  ELSE 'high' END AS b
           FROM events),
         conf AS (SELECT a, b, CAST(COUNT(*) AS BIGINT) AS c FROM l GROUP BY 1, 2),
         rm AS (SELECT a AS lab, CAST(SUM(c) AS BIGINT) AS ra FROM conf GROUP BY 1),
         cm AS (SELECT b AS lab, CAST(SUM(c) AS BIGINT) AS rb FROM conf GROUP BY 1),
         ch AS (SELECT SUM(CAST(ra AS HUGEINT) * rb) AS pe2
                FROM rm JOIN cm USING (lab)),
         ag AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                  CAST(SUM(CASE WHEN a = b THEN c ELSE 0 END) AS BIGINT) AS diag
                FROM conf)
         SELECT n,
           ROUND(CAST(diag AS DOUBLE) / CAST(n AS DOUBLE), 6) AS p_observed,
           ROUND(CAST(pe2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)), 6)
             AS p_chance,
           CASE WHEN CAST(pe2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)) < 1.0
                THEN ROUND((CAST(diag AS DOUBLE) / CAST(n AS DOUBLE)
                      - CAST(pe2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE)))
                     / (1.0 - CAST(pe2 AS DOUBLE) / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))), 6)
                END AS kappa
         FROM ag, ch""",
    // per-item and total variances from exact integer moments with
    // n = the distinct-subject count (zeros never densified)
    "q_cronbach" ->
      """WITH cells AS (SELECT user_id AS s, event_type AS i,
                  CAST(SUM(1) AS BIGINT) AS v FROM events GROUP BY 1, 2),
         uu AS (SELECT CAST(COUNT(DISTINCT s) AS BIGINT) AS u FROM cells),
         it AS (SELECT i, CAST(SUM(v) AS BIGINT) AS sv,
                  SUM(CAST(v AS HUGEINT) * v) AS q FROM cells GROUP BY 1),
         iv AS (SELECT i, (CAST(q AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                  / CAST(u AS DOUBLE)) / CAST(u AS DOUBLE) AS var FROM it, uu),
         tt AS (SELECT s, CAST(SUM(v) AS BIGINT) AS t FROM cells GROUP BY 1),
         tv AS (SELECT (CAST(q AS DOUBLE) - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE)
                  / CAST(u AS DOUBLE)) / CAST(u AS DOUBLE) AS vart
                FROM (SELECT CAST(SUM(t) AS BIGINT) AS sv,
                        SUM(CAST(t AS HUGEINT) * t) AS q FROM tt), uu)
         SELECT (SELECT u FROM uu) AS n_subjects, CAST(COUNT(*) AS BIGINT) AS n_items,
           CASE WHEN (SELECT vart FROM tv) > 0
                THEN ROUND((CAST(COUNT(*) AS DOUBLE) / (CAST(COUNT(*) AS DOUBLE) - 1.0))
                     * (1.0 - SUM(var) / (SELECT vart FROM tv)), 6) END AS alpha
         FROM iv""",
    // exact integer concordance; the one sqrt prices the output only
    "q_kendall" ->
      """WITH daily AS (SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(FLOOR(value * 100 + 0.5) AS BIGINT)) AS BIGINT) AS x,
             CAST(COUNT(*) AS BIGINT) AS y
           FROM events GROUP BY 1, 2),
         nn AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n FROM daily GROUP BY 1),
         tx AS (SELECT event_type, SUM(c * (c - 1) / 2) AS tx FROM (
                  SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS c
                  FROM daily GROUP BY 1, 2) GROUP BY 1),
         ty AS (SELECT event_type, SUM(c * (c - 1) / 2) AS ty FROM (
                  SELECT event_type, y, CAST(COUNT(*) AS BIGINT) AS c
                  FROM daily GROUP BY 1, 2) GROUP BY 1),
         p AS (SELECT a.event_type,
             CAST(SUM(CASE WHEN SIGN(a.x - b.x) * SIGN(a.y - b.y) = 1
                           THEN 1 ELSE 0 END) AS BIGINT) AS conc,
             CAST(SUM(CASE WHEN SIGN(a.x - b.x) * SIGN(a.y - b.y) = -1
                           THEN 1 ELSE 0 END) AS BIGINT) AS disc
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day
           GROUP BY 1)
         SELECT nn.event_type, n, conc AS concordant, disc AS discordant,
           CASE WHEN (n * (n - 1) / 2 - tx) * (n * (n - 1) / 2 - ty) > 0
                THEN ROUND(CAST(conc - disc AS DOUBLE) /
                       SQRT(CAST(n * (n - 1) / 2 - tx AS DOUBLE) *
                            CAST(n * (n - 1) / 2 - ty AS DOUBLE)), 6) END AS tau_b
         FROM nn JOIN tx USING (event_type) JOIN ty USING (event_type)
           JOIN p USING (event_type)
         ORDER BY event_type""",
    // per-stratum terms single divisions from exact cell counts
    "q_mantel_haenszel" ->
      """WITH e AS (SELECT event_type AS g, user_id % 2 = 0 AS ex, value > 100.0 AS oc
                    FROM events),
         st AS (SELECT g,
             CAST(SUM(CASE WHEN ex AND oc THEN 1 ELSE 0 END) AS BIGINT) AS a,
             CAST(SUM(CASE WHEN ex AND NOT oc THEN 1 ELSE 0 END) AS BIGINT) AS b,
             CAST(SUM(CASE WHEN NOT ex AND oc THEN 1 ELSE 0 END) AS BIGINT) AS c,
             CAST(SUM(CASE WHEN NOT ex AND NOT oc THEN 1 ELSE 0 END) AS BIGINT) AS d,
             CAST(COUNT(*) AS BIGINT) AS n
           FROM e GROUP BY 1),
         t AS (SELECT *,
             CAST(a AS DOUBLE) * CAST(d AS DOUBLE) / CAST(n AS DOUBLE) AS num,
             CAST(b AS DOUBLE) * CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS den
           FROM st)
         SELECT CAST(SUM(n) AS BIGINT) AS n, CAST(COUNT(*) AS BIGINT) AS n_strata,
           CASE WHEN SUM(b) > 0 AND SUM(c) > 0
                THEN ROUND((CAST(SUM(a) AS DOUBLE) * CAST(SUM(d) AS DOUBLE)) /
                           (CAST(SUM(b) AS DOUBLE) * CAST(SUM(c) AS DOUBLE)), 6) END AS or_crude,
           CASE WHEN SUM(den) > 0 THEN ROUND(SUM(num) / SUM(den), 6) END AS or_mh
         FROM t""",
    // pairwise contrasts from the same exact group moments as q_anova
    "q_tukey" ->
      """WITH e AS (SELECT event_type AS g,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events),
         gg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
                  CAST(SUM(v) AS BIGINT) AS sg,
                  SUM(CAST(v AS HUGEINT) * v) AS qg FROM e GROUP BY 1),
         t AS (SELECT g, ng, sg,
                 (SELECT SUM(CAST(qg AS DOUBLE) - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                      / CAST(ng AS DOUBLE)) FROM gg) AS ssw,
                 (SELECT CAST(SUM(ng) AS BIGINT) FROM gg) AS n,
                 (SELECT CAST(COUNT(*) AS BIGINT) FROM gg) AS k
               FROM gg),
         m AS (SELECT g, ng, sg, ssw / CAST(n - k AS DOUBLE) AS msw FROM t)
         SELECT a.g AS group_a, b.g AS group_b,
           ROUND(CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
                 - CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE), 6) AS mean_diff,
           ROUND(SQRT(a.msw / 2.0 * (1.0 / CAST(a.ng AS DOUBLE)
                 + 1.0 / CAST(b.ng AS DOUBLE))), 6) AS se,
           ROUND(ABS(CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
                 - CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE))
                 / SQRT(a.msw / 2.0 * (1.0 / CAST(a.ng AS DOUBLE)
                 + 1.0 / CAST(b.ng AS DOUBLE))), 6) AS q_stat
         FROM m a JOIN m b ON a.g < b.g ORDER BY group_a, group_b""",
    // centered SSB + per-group SSW, every term single IEEE ops from exact
    // integer moments (HUGEINT = Spark DECIMAL(38,0) for the Σv² column)
    "q_anova" ->
      """WITH e AS (SELECT event_type AS g,
                  CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS v FROM events),
         gg AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS ng,
                  CAST(SUM(v) AS BIGINT) AS sg,
                  SUM(CAST(v AS HUGEINT) * v) AS qg FROM e GROUP BY 1),
         t AS (SELECT *, (SELECT CAST(SUM(ng) AS BIGINT) FROM gg) AS n,
                  (SELECT CAST(SUM(sg) AS BIGINT) FROM gg) AS s FROM gg),
         u AS (SELECT n,
             CAST(ng AS DOUBLE) *
               (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) *
               (CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS ssb,
             CAST(qg AS DOUBLE) -
               CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS ssw
           FROM t)
         SELECT n, CAST(COUNT(*) AS BIGINT) AS n_groups,
           ROUND((SUM(ssb) / CAST(COUNT(*) - 1 AS DOUBLE)) /
                 (SUM(ssw) / CAST(n - COUNT(*) AS DOUBLE)), 6) AS f,
           ROUND(SUM(ssb) / (SUM(ssb) + SUM(ssw)), 6) AS eta_sq
         FROM u GROUP BY n""",
    // estimators are single IEEE ops from exact singleton/doubleton counts
    "q_vocab_richness" ->
      """WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
                    FROM documents),
         c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1),
         a AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
                 CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2
               FROM c)
         SELECT n_tokens, n_types, f1, f2,
           ROUND(CAST(n_types AS DOUBLE) +
             CASE WHEN f2 > 0
                  THEN CAST(f1 AS DOUBLE) * CAST(f1 AS DOUBLE) / (2.0 * CAST(f2 AS DOUBLE))
                  ELSE CAST(f1 AS DOUBLE) * CAST(f1 - 1 AS DOUBLE) / 2.0 END, 6) AS chao1,
           ROUND(CAST(f1 AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS gt_unseen_mass
         FROM a""",
    // exact integer counts, two single-division ratios
    "q_vocab_stats" ->
      """WITH w AS (SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS w
                    FROM documents),
         c AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM w GROUP BY 1),
         a AS (SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
                 CAST(COUNT(*) AS BIGINT) AS n_types,
                 CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
               FROM c)
         SELECT n_tokens, n_types, n_hapax,
           ROUND(CAST(n_types AS DOUBLE) / CAST(n_tokens AS DOUBLE), 6) AS ttr,
           ROUND(CAST(n_hapax AS DOUBLE) / CAST(n_types AS DOUBLE), 6) AS hapax_frac
         FROM a""",
    // ranking on the exact-integer-backed ratio double, never on ln
    "q_collocations" ->
      """WITH toks AS (SELECT regexp_extract_all(lower(text), '[a-z0-9_]+') AS ws
                       FROM documents),
         big AS (SELECT ws[i] AS w1, ws[i + 1] AS w2
                 FROM toks, UNNEST(range(1, len(ws))) AS t(i)
                 WHERE len(ws) >= 2),
         uni AS (SELECT w, CAST(COUNT(*) AS BIGINT) AS c FROM (
                   SELECT unnest(ws) AS w FROM toks) GROUP BY 1),
         bc AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS c12
                FROM big GROUP BY 1, 2 HAVING COUNT(*) >= 5),
         nn AS (SELECT CAST(COUNT(*) AS BIGINT) AS n FROM big),
         j AS (SELECT w1, w2, c12,
                 CAST(c12 AS DOUBLE) * CAST(n AS DOUBLE) /
                   (CAST(u1.c AS DOUBLE) * CAST(u2.c AS DOUBLE)) AS ratio
               FROM bc, nn
               JOIN uni u1 ON bc.w1 = u1.w
               JOIN uni u2 ON bc.w2 = u2.w)
         SELECT w1, w2, c12, ROUND(LN(ratio), 6) AS pmi
         FROM j ORDER BY ratio DESC, w1, w2 LIMIT 50""",
    // ln over a bounded top-100 set; deterministic (freq desc, word) ranks
    "q_zipf" ->
      """WITH t AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS n FROM (
             SELECT unnest(regexp_extract_all(lower(text), '[a-z0-9_]+')) AS word
             FROM documents)
           GROUP BY word ORDER BY n DESC, word LIMIT 100),
         r AS (SELECT LN(CAST(ROW_NUMBER() OVER (ORDER BY n DESC, word) AS DOUBLE)) AS x,
                  LN(CAST(n AS DOUBLE)) AS y FROM t)
         SELECT CAST(COUNT(*) AS BIGINT) AS n_points,
           ROUND((CAST(COUNT(*) AS DOUBLE) * SUM(x * y) - SUM(x) * SUM(y)) /
                 (CAST(COUNT(*) AS DOUBLE) * SUM(x * x) - SUM(x) * SUM(x)), 6) AS slope,
           ROUND((SUM(y) - (CAST(COUNT(*) AS DOUBLE) * SUM(x * y) - SUM(x) * SUM(y)) /
                   (CAST(COUNT(*) AS DOUBLE) * SUM(x * x) - SUM(x) * SUM(x)) * SUM(x)) /
                 CAST(COUNT(*) AS DOUBLE), 6) AS intercept
         FROM r""",
    // exact doubled midranks; H in the centered form so the only
    // cross-engine float SUM runs over k centered group terms
    "q_kruskal_wallis" ->
      """WITH h AS (SELECT event_type AS g, value AS s, CAST(COUNT(*) AS BIGINT) AS cg
                    FROM events GROUP BY 1, 2),
         v AS (SELECT s, CAST(SUM(cg) AS BIGINT) AS c FROM h GROUP BY 1),
         v2 AS (SELECT s, c, CAST(COALESCE(SUM(c) OVER
                  (ORDER BY s ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                  AS BIGINT) AS prev FROM v),
         v3 AS (SELECT s, 2 * prev + c + 1 AS r2, c * c * c - c AS tie FROM v2),
         pg AS (SELECT g, CAST(SUM(cg) AS BIGINT) AS ng,
                  CAST(SUM(cg * r2) AS BIGINT) AS rg2
                FROM h JOIN v3 USING (s) GROUP BY 1),
         tt AS (SELECT CAST(SUM(tie) AS BIGINT) AS ties FROM v3),
         nn AS (SELECT CAST(SUM(ng) AS BIGINT) AS n FROM pg),
         terms AS (SELECT ng, n,
                  CAST(rg2 AS DOUBLE) / CAST(ng AS DOUBLE) - CAST(n + 1 AS DOUBLE) AS d
                FROM pg, nn)
         SELECT n, CAST(COUNT(*) AS BIGINT) AS n_groups,
           ROUND((3.0 * SUM(CAST(ng AS DOUBLE) * d * d) /
                    (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0))) /
                 (1.0 - CAST(ties AS DOUBLE) /
                    (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) * CAST(n AS DOUBLE)
                     - CAST(n AS DOUBLE))), 6) AS h
         FROM terms, tt GROUP BY n, ties""",
    // doubled midranks keep every moment integral; HUGEINT (= Spark
    // DECIMAL(38,0)) products, single double ops at the end
    "q_spearman" ->
      """WITH r AS (SELECT l_returnflag AS g,
           2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_quantity)
             + COUNT(*) OVER (PARTITION BY l_returnflag, l_quantity) - 1 AS rx,
           2 * RANK() OVER (PARTITION BY l_returnflag ORDER BY l_extendedprice)
             + COUNT(*) OVER (PARTITION BY l_returnflag, l_extendedprice) - 1 AS ry
         FROM lineitem),
         a AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS n,
           CAST(SUM(rx) AS BIGINT) AS sx, CAST(SUM(ry) AS BIGINT) AS sy,
           CAST(SUM(rx * ry) AS BIGINT) AS sxy,
           CAST(SUM(rx * rx) AS BIGINT) AS sxx,
           CAST(SUM(ry * ry) AS BIGINT) AS syy FROM r GROUP BY 1)
         SELECT g AS l_returnflag, n,
           ROUND(CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE) /
             (SQRT(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx AS DOUBLE)) *
              SQRT(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy AS DOUBLE))), 6)
             AS rho
         FROM a ORDER BY l_returnflag""",
    // entropy terms are single-op doubles from exact longs; single-category
    // users get NULL evenness on both engines
    "q_diversity" ->
      """WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
                    FROM events GROUP BY 1, 2),
         w AS (SELECT user_id, c,
                 CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS n FROM c),
         t AS (SELECT user_id, n, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM w)
         SELECT user_id, MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS n_categories,
           ROUND(-SUM(p * LN(p)), 6) AS shannon,
           ROUND(1.0 - SUM(p * p), 6) AS simpson,
           CASE WHEN COUNT(*) > 1
                THEN ROUND(-SUM(p * LN(p)) / LN(CAST(COUNT(*) AS DOUBLE)), 6) END AS evenness
         FROM t GROUP BY user_id ORDER BY user_id""",
    // stream twin: integer state => stream == batch, shared oracle
    "q_diversity_stream" ->
      """WITH c AS (SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
                    FROM events GROUP BY 1, 2),
         w AS (SELECT user_id, c,
                 CAST(SUM(c) OVER (PARTITION BY user_id) AS BIGINT) AS n FROM c),
         t AS (SELECT user_id, n, CAST(c AS DOUBLE) / CAST(n AS DOUBLE) AS p FROM w)
         SELECT user_id, MAX(n) AS n, CAST(COUNT(*) AS BIGINT) AS n_categories,
           ROUND(-SUM(p * LN(p)), 6) AS shannon,
           ROUND(1.0 - SUM(p * p), 6) AS simpson,
           CASE WHEN COUNT(*) > 1
                THEN ROUND(-SUM(p * LN(p)) / LN(CAST(COUNT(*) AS DOUBLE)), 6) END AS evenness
         FROM t GROUP BY user_id ORDER BY user_id""",
    // brute-force cosine replay (the q_cosine_topk chain), label join,
    // vote counts, (votes desc, label asc) winner
    "q_knn" ->
      """WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv
              FROM embeddings WHERE vec_id < 20),
         c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS v,
                CAST(label AS BIGINT) AS lbl FROM embeddings WHERE vec_id >= 20),
         scored AS (SELECT q.query_id, c.vec_id, c.lbl,
                list_cosine_similarity(q.qv, c.v) AS sim FROM c CROSS JOIN q),
         ranked AS (SELECT query_id, lbl,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
              FROM scored),
         votes AS (SELECT query_id, lbl, CAST(COUNT(*) AS BIGINT) AS n_votes
              FROM ranked WHERE rn <= 10 GROUP BY 1, 2),
         win AS (SELECT query_id, lbl, n_votes,
                ROW_NUMBER() OVER (PARTITION BY query_id
                  ORDER BY n_votes DESC, lbl) AS wr FROM votes)
         SELECT query_id, lbl AS pred_label, n_votes FROM win WHERE wr = 1
         ORDER BY query_id""",
    // corpus stats replayed with the identical quantized chains: exact
    // 1e6 moments (squares HUGEINT), raw-double min/max, lower-order-
    // statistic median/IQR off the value histogram
    "q_feature_scaling" ->
      """WITH zs AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(FLOOR(l_quantity * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS s,
                SUM(CAST(CAST(FLOOR(l_quantity * 1e6 + 0.5) AS BIGINT) AS HUGEINT)
                    * CAST(CAST(FLOOR(l_quantity * 1e6 + 0.5) AS BIGINT) AS HUGEINT)) AS ss
              FROM lineitem),
         mm AS (SELECT MIN(l_extendedprice) AS lo, MAX(l_extendedprice) AS hi
              FROM lineitem),
         h AS (SELECT CAST(FLOOR(l_discount * 1e6 + 0.5) AS BIGINT) AS v,
                CAST(COUNT(*) AS BIGINT) AS c FROM lineitem GROUP BY 1),
         cumt AS (SELECT v, CAST(SUM(c) OVER (ORDER BY v
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
              FROM h),
         tot AS (SELECT MAX(cum) AS n FROM cumt),
         rb AS (SELECT
                MIN(CASE WHEN cum >= CEIL(CAST(n AS DOUBLE) * 0.25) THEN v END) AS q1,
                MIN(CASE WHEN cum >= CEIL(CAST(n AS DOUBLE) * 0.5) THEN v END) AS med,
                MIN(CASE WHEN cum >= CEIL(CAST(n AS DOUBLE) * 0.75) THEN v END) AS q3
              FROM cumt CROSS JOIN tot),
         fin AS (SELECT l_orderkey, l_linenumber,
                CAST(FLOOR(l_quantity * 1e6 + 0.5) AS BIGINT) AS qq,
                l_extendedprice AS p,
                CAST(FLOOR(l_discount * 1e6 + 0.5) AS BIGINT) AS dq,
                n, s, ss, lo, hi, q1, med, q3,
                (CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                   / CAST(n AS DOUBLE)) / (CAST(n AS DOUBLE) - 1.0) AS varc
              FROM lineitem CROSS JOIN zs CROSS JOIN mm CROSS JOIN rb
              WHERE l_orderkey < 300)
         SELECT l_orderkey, l_linenumber,
                CASE WHEN n > 1 AND varc > 0.0 THEN
                  ROUND((CAST(qq AS DOUBLE) - CAST(s AS DOUBLE) / CAST(n AS DOUBLE))
                        / SQRT(varc), 6) END AS l_quantity_scaled,
                CASE WHEN hi > lo THEN
                  ROUND((p - lo) / (hi - lo), 6) END AS l_extendedprice_scaled,
                CASE WHEN q3 > q1 THEN
                  ROUND(CAST(dq - med AS DOUBLE) / CAST(q3 - q1 AS DOUBLE), 6)
                END AS l_discount_scaled
         FROM fin ORDER BY l_orderkey, l_linenumber""",
    // exact-integer ray casting: the same cross-multiplied crossing test
    // (dy-sign flip instead of division) over unnested edges
    "q_point_in_polygon" ->
      """WITH poly AS (SELECT CAST(r_regionkey AS BIGINT) AS pid,
                500000 + CAST(r_regionkey AS BIGINT) * 700000 AS cx,
                400000 + CAST(r_regionkey AS BIGINT) * 550000 AS cy,
                150000 * (CAST(r_regionkey AS BIGINT) + 1) AS s
              FROM region),
         verts AS (SELECT pid, i,
                cx + CASE i WHEN 0 THEN 2 WHEN 1 THEN 1 WHEN 2 THEN -1
                            WHEN 3 THEN -2 WHEN 4 THEN 1 END * s AS vx,
                cy + CASE i WHEN 0 THEN 0 WHEN 1 THEN 2 WHEN 2 THEN 1
                            WHEN 3 THEN -1 WHEN 4 THEN -2 END * s AS vy
              FROM poly, unnest(generate_series(0, 4)) AS t(i)),
         edges AS (SELECT v1.pid, v1.vx AS x1, v1.vy AS y1, v2.vx AS x2, v2.vy AS y2
              FROM verts v1 JOIN verts v2 ON v1.pid = v2.pid AND v2.i = (v1.i + 1) % 5),
         pts AS (SELECT c_custkey AS point_id,
                c_custkey * 7919 % 4000000 AS px,
                c_custkey * 104729 % 3000000 AS py
              FROM customer),
         cross_t AS (SELECT p.point_id, e.pid,
                CASE WHEN (e.y1 > p.py) != (e.y2 > p.py)
                      AND (CASE WHEN e.y2 - e.y1 > 0
                           THEN (p.px - e.x1) * (e.y2 - e.y1)
                                < (e.x2 - e.x1) * (p.py - e.y1)
                           ELSE (p.px - e.x1) * (e.y2 - e.y1)
                                > (e.x2 - e.x1) * (p.py - e.y1) END)
                     THEN 1 ELSE 0 END AS c
              FROM pts p JOIN edges e ON TRUE)
         SELECT pid AS zone_id, point_id AS c_custkey
         FROM cross_t GROUP BY 1, 2 HAVING SUM(c) % 2 = 1
         ORDER BY zone_id, c_custkey""",
    // the sketch only prunes; the exact semi-join defines the result
    "q_bloom_prune" ->
      """SELECT l_returnflag,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CAST(FLOOR(l_quantity * 100 + 0.5) AS BIGINT)) AS BIGINT) AS qty100
         FROM lineitem
         WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_size >= 40)
         GROUP BY 1 ORDER BY 1""",
    // clipped bigram multiset overlap per pair; F1 via the exact micro
    // identity 2·clip/(nc+nr) — one division both engines replay
    "q_rouge" ->
      """WITH pairs AS (SELECT c.doc_id AS pid, c.text AS cand, r.text AS ref
              FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1),
         ct AS (SELECT pid, string_split(lower(cand), ' ') AS t FROM pairs),
         ci AS (SELECT pid, t, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i FROM ct),
         cg AS (SELECT pid, array_to_string(t[i : i + 1], ' ') AS g,
                CAST(COUNT(*) AS BIGINT) AS cc FROM ci GROUP BY 1, 2),
         rt AS (SELECT pid, string_split(lower(ref), ' ') AS t FROM pairs),
         ri AS (SELECT pid, t, unnest(generate_series(1, greatest(len(t) - 1, 0))) AS i FROM rt),
         rg AS (SELECT pid, array_to_string(t[i : i + 1], ' ') AS g,
                CAST(COUNT(*) AS BIGINT) AS cr FROM ri GROUP BY 1, 2),
         j AS (SELECT COALESCE(cg.pid, rg.pid) AS pid,
                LEAST(COALESCE(cc, 0), COALESCE(cr, 0)) AS clip,
                COALESCE(cc, 0) AS cc, COALESCE(cr, 0) AS cr
               FROM cg FULL OUTER JOIN rg ON cg.pid = rg.pid AND cg.g = rg.g),
         agg AS (SELECT pid, CAST(SUM(clip) AS BIGINT) AS n_clip,
                CAST(SUM(cc) AS BIGINT) AS n_cand, CAST(SUM(cr) AS BIGINT) AS n_ref
               FROM j GROUP BY 1)
         SELECT p.pid AS pair_id,
                COALESCE(n_clip, 0) AS n_clip,
                COALESCE(n_cand, 0) AS n_cand,
                COALESCE(n_ref, 0) AS n_ref,
                CASE WHEN COALESCE(n_cand, 0) > 0 THEN
                  ROUND(CAST(n_clip AS DOUBLE) / CAST(n_cand AS DOUBLE), 6) END AS precision,
                CASE WHEN COALESCE(n_ref, 0) > 0 THEN
                  ROUND(CAST(n_clip AS DOUBLE) / CAST(n_ref AS DOUBLE), 6) END AS recall,
                CASE WHEN COALESCE(n_cand, 0) + COALESCE(n_ref, 0) > 0 THEN
                  ROUND(CAST(n_clip AS DOUBLE) * 2.0
                        / CAST(n_cand + n_ref AS DOUBLE), 6) END AS f1
         FROM pairs p LEFT JOIN agg ON p.pid = agg.pid
         ORDER BY pair_id""",
    "q_bleu" -> bleuOracle,
    "q_chrf" -> chrfOracle,
    "q_mst" -> mstOracle,
    // a-priori pruning never changes the result, so the oracle counts
    // triples directly at the same relative threshold
    "q_frequent_triples" ->
      """WITH base AS (SELECT DISTINCT l.l_orderkey AS b, p.p_brand AS i
              FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey),
         nb AS (SELECT CAST(COUNT(DISTINCT b) AS BIGINT) AS n FROM base),
         tri AS (SELECT b1.i AS i1, b2.i AS i2, b3.i AS i3
              FROM base b1
              JOIN base b2 ON b1.b = b2.b AND b1.i < b2.i
              JOIN base b3 ON b2.b = b3.b AND b2.i < b3.i),
         c AS (SELECT i1, i2, i3, CAST(COUNT(*) AS BIGINT) AS support
              FROM tri GROUP BY 1, 2, 3)
         SELECT i1 AS item1, i2 AS item2, i3 AS item3, support, n AS n_baskets
         FROM c, nb WHERE CAST(support AS DOUBLE) >= CAST(n AS DOUBLE) * 0.003
         ORDER BY item1, item2, item3""",
    // centroid means rounded 6dp (the X28 recipe), the SMART expansion
    // chain rounded 6dp and pushed through FLOAT exactly like the engine
    "q_rocchio" ->
      """WITH q AS (SELECT vec_id AS qid, embedding AS qe FROM embeddings WHERE vec_id < 5),
         ks AS (SELECT unnest(generate_series(0, 4)) AS kk),
         fb AS (SELECT qid, 100 + qid * 5 + kk AS doc, TRUE AS rel FROM q, ks
                UNION ALL SELECT qid, 200 + qid * 5 + kk, FALSE FROM q, ks),
         fv AS (SELECT f.qid, f.rel, e.embedding AS v
              FROM fb f JOIN embeddings e ON e.vec_id = f.doc),
         dims AS (SELECT unnest(generate_series(1, 64)) AS j),
         cent AS (SELECT qid, rel, j, ROUND(AVG(CAST(v[j] AS DOUBLE)), 6) AS m
              FROM fv, dims GROUP BY 1, 2, 3),
         qd AS (SELECT q.qid, dims.j, CAST(q.qe[dims.j] AS DOUBLE) AS qv
              FROM q, dims),
         exp0 AS (SELECT qd.qid, qd.j,
                CAST(CAST(ROUND(
                  1.0 * qd.qv
                  + 0.75 * COALESCE(r.m, 0.0)
                  - 0.15 * COALESCE(nn.m, 0.0), 6) AS FLOAT) AS DOUBLE) AS ev
              FROM qd
              LEFT JOIN cent r ON r.qid = qd.qid AND r.j = qd.j AND r.rel
              LEFT JOIN cent nn ON nn.qid = qd.qid AND nn.j = qd.j AND NOT nn.rel),
         evl AS (SELECT qid, list(ev ORDER BY j) AS ev FROM exp0 GROUP BY qid),
         scored AS (SELECT evl.qid AS query_id, e.vec_id,
                list_cosine_similarity(evl.ev, CAST(e.embedding AS DOUBLE[])) AS sim
              FROM embeddings e CROSS JOIN evl WHERE e.vec_id <> evl.qid),
         ranked AS (SELECT query_id, vec_id, sim,
                ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
              FROM scored)
         SELECT query_id, vec_id, ROUND(sim, 6) AS sim, rn AS rnk
         FROM ranked WHERE rn <= 5 ORDER BY query_id, rnk""",
    // per-unit S²/k terms quantized to 1e-2 (decimal sums) feed BOTH sums of
    // squares; the ANOVA chain is one fixed double sequence
    // the md5-sign tug-of-war replay: per-estimator exact HUGEINT sums,
    // one division for the average
    "q_ams_f2" ->
      """WITH h AS (SELECT CAST(l_partkey AS VARCHAR) AS v,
                CAST(COUNT(*) AS BIGINT) AS c
              FROM lineitem WHERE l_partkey IS NOT NULL GROUP BY 1),
         ex AS (SELECT COALESCE(SUM(c), 0) AS n, CAST(COUNT(*) AS BIGINT) AS d,
                COALESCE(SUM(CAST(c AS HUGEINT) * CAST(c AS HUGEINT)),
                  CAST(0 AS HUGEINT)) AS f2 FROM h),
         pe AS (SELECT i, SUM(CAST(CASE WHEN
                  ('0x' || substr(md5(CAST(i AS VARCHAR) || '|' || v), 1, 13))::BIGINT
                    % 2 = 0 THEN c ELSE -c END AS HUGEINT)) AS s
               FROM h, (SELECT UNNEST(RANGE(0, 64)) AS i) GROUP BY 1),
         ea AS (SELECT COALESCE(SUM(s * s), CAST(0 AS HUGEINT)) AS ss FROM pe)
         SELECT CAST(n AS BIGINT) AS n, d AS n_distinct,
                ROUND(CAST(f2 AS DOUBLE), 6) AS f2_exact,
                ROUND(CAST(ss AS DOUBLE) / 64.0, 6) AS f2_est,
                CASE WHEN f2 > 0 THEN
                  ROUND(ABS(CAST(ss AS DOUBLE) / 64.0 - CAST(f2 AS DOUBLE))
                    / CAST(f2 AS DOUBLE), 6) END AS rel_err
         FROM ex, ea""",
    // per-key rate quantized 1e-9 before exact moment sums; the beta-prior
    // fit is a fixed IEEE chain replayed verbatim
    "q_eb_shrinkage" ->
      """WITH per AS (SELECT user_id, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
                  AS BIGINT) AS x
              FROM events GROUP BY 1),
         pq AS (SELECT user_id, n, x,
                CAST(FLOOR(CAST(x AS DOUBLE) / CAST(n AS DOUBLE) * 1e9 + 0.5)
                  AS BIGINT) AS pq FROM per),
         mom AS (SELECT CAST(COUNT(*) AS BIGINT) AS k,
                SUM(CAST(pq AS HUGEINT)) AS sp,
                SUM(CAST(pq AS HUGEINT) * CAST(pq AS HUGEINT)) AS spp FROM pq),
         md AS (SELECT k,
                CAST(sp AS DOUBLE) / CAST(k AS DOUBLE) / 1e9 AS m,
                CAST(CAST(k AS HUGEINT) * spp - sp * sp AS DOUBLE)
                  / CAST(CAST(k AS HUGEINT) * (CAST(k AS HUGEINT) - 1)
                      AS DOUBLE) / 1e18 AS v
              FROM mom),
         ab AS (SELECT k, m, v, m * (1.0 - m) / v - 1.0 AS nu FROM md),
         modl AS (SELECT
                CASE WHEN k > 1 AND v > 0 AND nu > 0 THEN m * nu END AS alpha,
                CASE WHEN k > 1 AND v > 0 AND nu > 0 THEN (1.0 - m) * nu END
                  AS beta FROM ab)
         SELECT user_id, n, x,
                ROUND(CAST(x AS DOUBLE) / CAST(n AS DOUBLE), 6) AS rate_raw,
                CASE WHEN alpha IS NOT NULL THEN
                  ROUND((alpha + CAST(x AS DOUBLE))
                    / (alpha + beta + CAST(n AS DOUBLE)), 6) END AS rate_eb
         FROM pq, modl ORDER BY user_id""",
    // dominance counts off the merged histogram, exact HUGEINT pair math
    "q_cliffs_delta" ->
      """WITH e AS (SELECT event_type,
                CAST(FLOOR(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
         ha AS (SELECT cents AS v, CAST(COUNT(*) AS BIGINT) AS ca FROM e
                WHERE event_type = 'click' AND cents IS NOT NULL GROUP BY 1),
         hb AS (SELECT cents AS v, CAST(COUNT(*) AS BIGINT) AS cb FROM e
                WHERE event_type = 'purchase' AND cents IS NOT NULL GROUP BY 1),
         m AS (SELECT COALESCE(ha.v, hb.v) AS v, COALESCE(ca, 0) AS ca,
                COALESCE(cb, 0) AS cb
              FROM ha FULL OUTER JOIN hb ON ha.v = hb.v),
         mm AS (SELECT ca, cb,
                COALESCE(SUM(cb) OVER (ORDER BY v
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS prevb
              FROM m),
         agg AS (SELECT CAST(SUM(ca) AS BIGINT) AS na,
                CAST(SUM(cb) AS BIGINT) AS nb,
                SUM(CAST(ca AS HUGEINT) * CAST(prevb AS HUGEINT)) AS gt,
                SUM(CAST(ca AS HUGEINT) * CAST(cb AS HUGEINT)) AS tie
              FROM mm),
         fin AS (SELECT na, nb,
                CASE WHEN CAST(na AS HUGEINT) * CAST(nb AS HUGEINT) > 0 THEN
                  ROUND(CAST(gt - (CAST(na AS HUGEINT) * CAST(nb AS HUGEINT)
                      - gt - tie) AS DOUBLE)
                    / CAST(CAST(na AS HUGEINT) * CAST(nb AS HUGEINT) AS DOUBLE),
                    6) END AS delta,
                CASE WHEN CAST(na AS HUGEINT) * CAST(nb AS HUGEINT) > 0 THEN
                  ROUND(CAST(gt * 2 + tie AS DOUBLE)
                    / CAST(CAST(na AS HUGEINT) * CAST(nb AS HUGEINT) * 2
                        AS DOUBLE), 6) END AS a
              FROM agg)
         SELECT na AS n_a, nb AS n_b, delta AS cliffs_delta, a AS vd_a,
                CASE WHEN delta IS NULL THEN NULL
                     WHEN ABS(delta) < 0.147 THEN 'negligible'
                     WHEN ABS(delta) < 0.33 THEN 'small'
                     WHEN ABS(delta) < 0.474 THEN 'medium'
                     ELSE 'large' END AS magnitude
         FROM fin""",
    // six exact HUGEINT sufficient statistics, one division per ratio
    "q_iv_wald" ->
      """WITH b AS (SELECT CAST(FLOOR(l_quantity / 10.0) AS BIGINT) AS z,
                CAST(l_quantity AS BIGINT) AS x,
                CAST(FLOOR(l_extendedprice * 100 + 0.5) AS BIGINT) AS y
              FROM lineitem
              WHERE l_quantity IS NOT NULL AND l_extendedprice IS NOT NULL),
         agg AS (SELECT CAST(COUNT(*) AS HUGEINT) AS n,
                SUM(CAST(z AS HUGEINT)) AS sz, SUM(CAST(x AS HUGEINT)) AS sx,
                SUM(CAST(y AS HUGEINT)) AS sy,
                SUM(CAST(z AS HUGEINT) * CAST(z AS HUGEINT)) AS szz,
                SUM(CAST(z AS HUGEINT) * CAST(x AS HUGEINT)) AS szx,
                SUM(CAST(z AS HUGEINT) * CAST(y AS HUGEINT)) AS szy
              FROM b),
         co AS (SELECT n, n * szz - sz * sz AS varz,
                n * szx - sz * sx AS covzx, n * szy - sz * sy AS covzy
              FROM agg)
         SELECT CAST(n AS BIGINT) AS n,
                CASE WHEN varz != 0 THEN
                  ROUND(CAST(covzx AS DOUBLE) / CAST(varz AS DOUBLE), 6) END
                  AS first_stage,
                CASE WHEN varz != 0 THEN
                  ROUND(CAST(covzy AS DOUBLE) / CAST(varz AS DOUBLE), 6) END
                  AS reduced_form,
                CASE WHEN covzx != 0 THEN
                  ROUND(CAST(covzy AS DOUBLE) / CAST(covzx AS DOUBLE), 6) END
                  AS beta_iv
         FROM co""",
    "q_icc" ->
      """WITH per AS (SELECT l_orderkey AS u, CAST(COUNT(*) AS BIGINT) AS k,
                CAST(SUM(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT)) AS BIGINT) AS s,
                SUM(CAST(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS HUGEINT)
                    * CAST(CAST(FLOOR(l_extendedprice + 0.5) AS BIGINT) AS HUGEINT)) AS ss
              FROM lineitem GROUP BY 1),
         agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
                CAST(SUM(k) AS BIGINT) AS n_ratings,
                CAST(SUM(s) AS BIGINT) AS g, SUM(ss) AS sstot,
                SUM(CAST(FLOOR(CAST(s AS DOUBLE) * CAST(s AS DOUBLE)
                     / CAST(k AS DOUBLE) * 100 + 0.5) AS HUGEINT)) AS tq,
                SUM(CAST(k AS HUGEINT) * CAST(k AS HUGEINT)) AS ksq
              FROM per),
         fin AS (SELECT n_units, n_ratings,
                CAST(n_units AS DOUBLE) AS n, CAST(n_ratings AS DOUBLE) AS bn,
                CAST(g AS DOUBLE) AS gd, CAST(sstot AS DOUBLE) AS sstot,
                CAST(tq AS DOUBLE) / 100.0 AS t, CAST(ksq AS DOUBLE) AS ksqd
              FROM agg),
         ms AS (SELECT n_units, n_ratings, n, bn,
                (sstot - t) / (bn - n) AS msw,
                (t - gd * gd / bn) / (n - 1.0) AS msb,
                (bn - ksqd / bn) / (n - 1.0) AS k0
              FROM fin)
         SELECT n_units, n_ratings,
                CASE WHEN n_units > 1 THEN ROUND(k0, 6) END AS k0,
                CASE WHEN bn > n AND n_units > 1 THEN ROUND(msb, 6) END AS msb,
                CASE WHEN bn > n THEN ROUND(msw, 6) END AS msw,
                CASE WHEN bn > n AND n_units > 1
                      AND (msb + (k0 - 1.0) * msw) > 0.0
                  THEN ROUND((msb - msw) / (msb + (k0 - 1.0) * msw), 6) END AS icc
         FROM ms""",
    // one aggregate; continuity-corrected normal z from exact counts
    "q_sign_test" ->
      """WITH o AS (SELECT o_custkey, year(o_orderdate) AS y,
                CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM orders WHERE year(o_orderdate) IN (1995, 1996)),
         p AS (SELECT o_custkey,
                SUM(CASE WHEN y = 1995 THEN cents END) AS x,
                SUM(CASE WHEN y = 1996 THEN cents END) AS yv
              FROM o GROUP BY 1
              HAVING SUM(CASE WHEN y = 1995 THEN cents END) IS NOT NULL
                 AND SUM(CASE WHEN y = 1996 THEN cents END) IS NOT NULL),
         agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                CAST(SUM(CASE WHEN x - yv != 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_nonzero,
                CAST(SUM(CASE WHEN x - yv > 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_pos
              FROM p),
         fin AS (SELECT n_pairs, n_nonzero, n_pos,
                2.0 * CAST(n_pos AS DOUBLE) - CAST(n_nonzero AS DOUBLE) AS num,
                CAST(n_nonzero AS DOUBLE) AS m
              FROM agg)
         SELECT n_pairs, n_nonzero, n_pos,
                CASE WHEN n_nonzero > 0 THEN
                  ROUND(SIGN(num) * GREATEST(ABS(num) - 1.0, 0.0) / SQRT(m), 6) END AS z,
                CASE WHEN n_nonzero > 0 THEN
                  ABS(ROUND(SIGN(num) * GREATEST(ABS(num) - 1.0, 0.0) / SQRT(m), 6))
                    > 1.959964 END AS reject_95,
                CASE WHEN n_nonzero > 0 THEN
                  ABS(ROUND(SIGN(num) * GREATEST(ABS(num) - 1.0, 0.0) / SQRT(m), 6))
                    > 2.575829 END AS reject_99
         FROM fin""",
    // exact integer 2·midranks over the |d| histogram (the Mann–Whitney
    // discipline), tie sum a long, one double chain at the end
    "q_wilcoxon" ->
      """WITH o AS (SELECT o_custkey, year(o_orderdate) AS y,
                CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT) AS cents
              FROM orders WHERE year(o_orderdate) IN (1995, 1996)),
         p AS (SELECT o_custkey,
                SUM(CASE WHEN y = 1995 THEN cents END) AS x,
                SUM(CASE WHEN y = 1996 THEN cents END) AS yv
              FROM o GROUP BY 1
              HAVING SUM(CASE WHEN y = 1995 THEN cents END) IS NOT NULL
                 AND SUM(CASE WHEN y = 1996 THEN cents END) IS NOT NULL),
         dd AS (SELECT CAST(x - yv AS BIGINT) AS d FROM p),
         h AS (SELECT ABS(d) AS a, CAST(COUNT(*) AS BIGINT) AS c,
                CAST(SUM(CASE WHEN d > 0 THEN 1 ELSE 0 END) AS BIGINT) AS cpos
              FROM dd GROUP BY 1),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS allc FROM h),
         nzr AS (SELECT a, c, cpos,
                CAST(COALESCE(SUM(c) OVER (ORDER BY a
                     ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS prev
              FROM h WHERE a > 0),
         agg AS (SELECT CAST(SUM(c) AS BIGINT) AS n,
                CAST(SUM(cpos * (2 * prev + c + 1)) AS BIGINT) AS wp2,
                CAST(SUM(c * c * c - c) AS BIGINT) AS ties FROM nzr),
         fin AS (SELECT allc, n, wp2,
                CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0) / 4.0 AS mu,
                CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) + 1.0)
                  * (CAST(n AS DOUBLE) * 2.0 + 1.0) / 24.0
                  - CAST(ties AS DOUBLE) / 48.0 AS ssq
              FROM agg CROSS JOIN tot)
         SELECT allc AS n_pairs, n AS n_nonzero,
                CAST(wp2 AS DOUBLE) / 2.0 AS w_plus,
                CASE WHEN n > 0 AND ssq > 0.0 THEN
                  ROUND((CAST(wp2 AS DOUBLE) / 2.0 - mu) / SQRT(ssq), 6) END AS z,
                CASE WHEN n > 0 AND ssq > 0.0 THEN
                  ABS(ROUND((CAST(wp2 AS DOUBLE) / 2.0 - mu) / SQRT(ssq), 6)) > 1.959964
                END AS reject_95,
                CASE WHEN n > 0 AND ssq > 0.0 THEN
                  ABS(ROUND((CAST(wp2 AS DOUBLE) / 2.0 - mu) / SQRT(ssq), 6)) > 2.575829
                END AS reject_99
         FROM fin""",
    // coincidence-matrix identities: per-unit Do terms quantized to 1e-9
    // longs (each owns its (m_u-1) denominator), marginal squares HUGEINT
    "q_krippendorff" ->
      """WITH uv AS (SELECT l_orderkey AS u, l_returnflag AS v,
                CAST(COUNT(*) AS BIGINT) AS nuc FROM lineitem GROUP BY 1, 2),
         um AS (SELECT u, CAST(SUM(nuc) AS BIGINT) AS m,
                CAST(SUM(nuc * (nuc - 1)) AS BIGINT) AS same
              FROM uv GROUP BY 1 HAVING SUM(nuc) >= 2),
         units AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_units,
                CAST(SUM(m) AS BIGINT) AS n,
                CAST(SUM(CAST(FLOOR(CAST(m * (m - 1) - same AS DOUBLE)
                     / CAST(m - 1 AS DOUBLE) * 1e9 + 0.5) AS BIGINT)) AS BIGINT) AS doq
              FROM um),
         marg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_categories,
                SUM(CAST(nc AS HUGEINT) * CAST(nc AS HUGEINT)) AS ncsq FROM (
                  SELECT uv.v, CAST(SUM(uv.nuc) AS BIGINT) AS nc
                  FROM uv JOIN um ON uv.u = um.u GROUP BY 1))
         SELECT n_units, n AS n_ratings, n_categories,
                ROUND(CAST(doq AS DOUBLE) / 1e9 / CAST(n AS DOUBLE), 6) AS do_rate,
                ROUND((CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(ncsq AS DOUBLE))
                      / (CAST(n AS DOUBLE) * (CAST(n AS DOUBLE) - 1.0)), 6) AS de_rate,
                CASE WHEN (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(ncsq AS DOUBLE)) > 0.0
                  THEN ROUND(1.0 - CAST(doq AS DOUBLE) / 1e9 * (CAST(n AS DOUBLE) - 1.0)
                       / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) - CAST(ncsq AS DOUBLE)), 6)
                END AS alpha
         FROM units CROSS JOIN marg""",
    // Gorodkin R_K off the confusion matrix; marginal products HUGEINT
    "q_mcc" ->
      """WITH cm AS (SELECT actual, pred, CAST(COUNT(*) AS BIGINT) AS c FROM (
                SELECT o_orderstatus AS actual,
                       CASE WHEN o_totalprice > 331000.0 THEN 'F'
                            WHEN o_totalprice > 165000.0 THEN 'O' ELSE 'P' END AS pred
                FROM orders) GROUP BY 1, 2),
         ta AS (SELECT actual AS k, CAST(SUM(c) AS BIGINT) AS t FROM cm GROUP BY 1),
         pp AS (SELECT pred AS k, CAST(SUM(c) AS BIGINT) AS q FROM cm GROUP BY 1),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn,
                CAST(SUM(CASE WHEN actual = pred THEN c ELSE 0 END) AS BIGINT) AS diag
              FROM cm),
         x AS (SELECT
                SUM(CAST(COALESCE(t, 0) AS HUGEINT) * CAST(COALESCE(q, 0) AS HUGEINT)) AS tp,
                SUM(CAST(COALESCE(t, 0) AS HUGEINT) * CAST(COALESCE(t, 0) AS HUGEINT)) AS tt,
                SUM(CAST(COALESCE(q, 0) AS HUGEINT) * CAST(COALESCE(q, 0) AS HUGEINT)) AS qq,
                CAST(COUNT(*) AS BIGINT) AS n_classes
              FROM ta FULL OUTER JOIN pp USING (k)),
         fin AS (SELECT nn, diag, n_classes,
                CAST(CAST(nn AS HUGEINT) * CAST(diag AS HUGEINT) - tp AS DOUBLE) AS cov,
                CAST(CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT) - tt AS DOUBLE) AS va,
                CAST(CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT) - qq AS DOUBLE) AS vp
              FROM tot CROSS JOIN x)
         SELECT nn AS n, n_classes,
                ROUND(CAST(diag AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS accuracy,
                CASE WHEN va > 0.0 AND vp > 0.0
                  THEN ROUND(cov / (SQRT(va) * SQRT(vp)), 6) END AS mcc
         FROM fin""",
    // stream twin: integer confusion cells => stream == batch, q_mcc's
    // oracle verbatim
    "q_mcc_stream" ->
      """WITH cm AS (SELECT actual, pred, CAST(COUNT(*) AS BIGINT) AS c FROM (
                SELECT o_orderstatus AS actual,
                       CASE WHEN o_totalprice > 331000.0 THEN 'F'
                            WHEN o_totalprice > 165000.0 THEN 'O' ELSE 'P' END AS pred
                FROM orders) GROUP BY 1, 2),
         ta AS (SELECT actual AS k, CAST(SUM(c) AS BIGINT) AS t FROM cm GROUP BY 1),
         pp AS (SELECT pred AS k, CAST(SUM(c) AS BIGINT) AS q FROM cm GROUP BY 1),
         tot AS (SELECT CAST(SUM(c) AS BIGINT) AS nn,
                CAST(SUM(CASE WHEN actual = pred THEN c ELSE 0 END) AS BIGINT) AS diag
              FROM cm),
         x AS (SELECT
                SUM(CAST(COALESCE(t, 0) AS HUGEINT) * CAST(COALESCE(q, 0) AS HUGEINT)) AS tp,
                SUM(CAST(COALESCE(t, 0) AS HUGEINT) * CAST(COALESCE(t, 0) AS HUGEINT)) AS tt,
                SUM(CAST(COALESCE(q, 0) AS HUGEINT) * CAST(COALESCE(q, 0) AS HUGEINT)) AS qq,
                CAST(COUNT(*) AS BIGINT) AS n_classes
              FROM ta FULL OUTER JOIN pp USING (k)),
         fin AS (SELECT nn, diag, n_classes,
                CAST(CAST(nn AS HUGEINT) * CAST(diag AS HUGEINT) - tp AS DOUBLE) AS cov,
                CAST(CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT) - tt AS DOUBLE) AS va,
                CAST(CAST(nn AS HUGEINT) * CAST(nn AS HUGEINT) - qq AS DOUBLE) AS vp
              FROM tot CROSS JOIN x)
         SELECT nn AS n, n_classes,
                ROUND(CAST(diag AS DOUBLE) / CAST(nn AS DOUBLE), 6) AS accuracy,
                CASE WHEN va > 0.0 AND vp > 0.0
                  THEN ROUND(cov / (SQRT(va) * SQRT(vp)), 6) END AS mcc
         FROM fin""",
    // stream twin of the per-class report on the same tercile rule —
    // the q_classification_report chain with the streamable predictor
    "q_class_report_stream" ->
      """WITH pr AS (SELECT o_orderstatus AS a,
                CASE WHEN o_totalprice > 331000.0 THEN 'F'
                     WHEN o_totalprice > 165000.0 THEN 'O' ELSE 'P' END AS p
              FROM orders),
         cells AS (SELECT a, p, CAST(COUNT(*) AS BIGINT) AS c FROM pr GROUP BY 1, 2),
         act AS (SELECT a AS label, CAST(SUM(c) AS BIGINT) AS actn FROM cells GROUP BY 1),
         prd AS (SELECT p AS label, CAST(SUM(c) AS BIGINT) AS prdn FROM cells GROUP BY 1),
         diag AS (SELECT a AS label, c AS tp FROM cells WHERE a = p),
         per AS (SELECT COALESCE(act.label, prd.label) AS label,
                   COALESCE(tp, 0) AS tp,
                   COALESCE(prdn, 0) - COALESCE(tp, 0) AS fp,
                   COALESCE(actn, 0) - COALESCE(tp, 0) AS fn
                 FROM act FULL OUTER JOIN prd ON act.label = prd.label
                      LEFT JOIN diag ON COALESCE(act.label, prd.label) = diag.label),
         x AS (SELECT label, tp, fp, fn,
                 CAST(tp * 2 AS DOUBLE) / CAST(tp * 2 + fp + fn AS DOUBLE) AS f1,
                 CAST(SUM(tp) OVER () AS BIGINT) AS tpall,
                 CAST(SUM(tp + fn) OVER () AS BIGINT) AS nall
               FROM per)
         SELECT label, CAST(tp + fn AS BIGINT) AS support,
                CAST(tp AS BIGINT) AS tp, CAST(fp AS BIGINT) AS fp, CAST(fn AS BIGINT) AS fn,
                CASE WHEN tp + fp > 0
                     THEN ROUND(CAST(tp AS DOUBLE) / CAST(tp + fp AS DOUBLE), 6) END AS precision,
                CASE WHEN tp + fn > 0
                     THEN ROUND(CAST(tp AS DOUBLE) / CAST(tp + fn AS DOUBLE), 6) END AS recall,
                ROUND(f1, 6) AS f1,
                ROUND(CAST(SUM(CAST(FLOOR(f1 * 1e9 + 0.5) AS BIGINT)) OVER () AS DOUBLE)
                      / 1e9 / CAST(COUNT(*) OVER () AS DOUBLE), 6) AS macro_f1,
                ROUND(CAST(tpall AS DOUBLE) / CAST(nall AS DOUBLE), 6) AS accuracy
         FROM x ORDER BY label""",
    // the md5 coin replays exactly; epsilon = ln(3) enters both engines
    // as the rounded literal (the libm lesson)
    "q_randomized_response" ->
      """WITH r AS (SELECT c_custkey, c_acctbal > 0 AS truth,
                ('0x' || substr(md5('graft|' || CAST(c_custkey AS VARCHAR)), 1, 8))::BIGINT
                  % 10000 < 7500 AS keep
              FROM customer),
         agg AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(CASE WHEN (CASE WHEN keep THEN truth ELSE NOT truth END)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_yes_reported,
                CAST(SUM(CASE WHEN truth THEN 1 ELSE 0 END) AS BIGINT) AS ny
              FROM r),
         fin AS (SELECT n, n_yes_reported, ny,
                CAST(n_yes_reported AS DOUBLE) / CAST(n AS DOUBLE) AS lam
              FROM agg)
         SELECT n, n_yes_reported,
                ROUND(lam, 6) AS lambda_hat,
                ROUND((lam + 0.75 - 1.0) / 0.5, 6) AS pi_hat,
                ROUND(SQRT(lam * (1.0 - lam) / CAST(n AS DOUBLE)) / 0.5, 6) AS se,
                CAST(1.098612 AS DOUBLE) AS epsilon,
                ROUND(CAST(ny AS DOUBLE) / CAST(n AS DOUBLE), 6) AS true_rate
         FROM fin""",
    // 40/20/40 credits as exact 1e-9 integer units on the (time, touch id)
    // total order; middles one integer division each
    "q_attribution_position" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS tus, event_id AS tid,
                event_type AS channel
              FROM events WHERE event_type IN ('click', 'view')),
         c AS (SELECT user_id, epoch_us(ts) AS cus, event_id AS conversion_id
               FROM events WHERE event_type = 'purchase'),
         p AS (SELECT c.conversion_id, t.channel, t.tus, t.tid
               FROM c JOIN t ON c.user_id = t.user_id
                AND t.tus < c.cus AND t.tus >= c.cus - 1800000000),
         k AS (SELECT conversion_id, channel,
                 COUNT(*) OVER (PARTITION BY conversion_id) AS n,
                 ROW_NUMBER() OVER (PARTITION BY conversion_id
                   ORDER BY tus, tid) AS rn
               FROM p),
         cr AS (SELECT conversion_id, channel,
                 CASE WHEN n = 1 THEN 1000000000
                      WHEN n = 2 THEN 500000000
                      WHEN rn = 1 OR rn = n THEN 400000000
                      ELSE 200000000 // (n - 2) END AS credit_q
                FROM k)
         SELECT channel,
                CAST(COUNT(DISTINCT conversion_id) AS BIGINT) AS n_conversions,
                CAST(SUM(credit_q) AS DOUBLE) / 1e9 AS credit
         FROM cr GROUP BY 1 ORDER BY channel""",
    // the compressed shards must round-trip losslessly per codec
    "q_jsonl_compressed" ->
      """SELECT codec,
                CAST(COUNT(*) AS BIGINT) AS n_docs,
                CAST(SUM(doc_id) AS BIGINT) AS sum_ids,
                CAST(SUM(length(text)) AS BIGINT) AS sum_chars
         FROM documents
         CROSS JOIN (SELECT unnest(['bzip2', 'gzip']) AS codec)
         GROUP BY codec ORDER BY codec""",
    // recency weights quantized to 1e-9 longs, per-conversion normalizer
    // an exact window sum, one integer division per pair; ln 2 embedded
    // as a literal so neither engine calls log
    "q_attribution_decay" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS tus, event_type AS channel
                    FROM events WHERE event_type IN ('click', 'view')),
         c AS (SELECT user_id, epoch_us(ts) AS cus, event_id AS conversion_id
               FROM events WHERE event_type = 'purchase'),
         p AS (SELECT c.conversion_id, t.channel,
                      CAST(FLOOR(EXP(-0.6931471805599453 *
                        CAST(c.cus - t.tus AS DOUBLE) / 900000000.0) * 1e9 + 0.5)
                        AS BIGINT) AS wq
               FROM c JOIN t ON c.user_id = t.user_id
                AND t.tus < c.cus AND t.tus >= c.cus - 1800000000),
         k AS (SELECT conversion_id, channel, wq,
                      CAST(SUM(wq) OVER (PARTITION BY conversion_id) AS BIGINT) AS tot
               FROM p),
         q AS (SELECT channel, conversion_id,
                      CASE WHEN tot > 0 THEN (wq * 1000000000) // tot ELSE 0 END AS cq
               FROM k)
         SELECT channel,
                CAST(COUNT(DISTINCT conversion_id) AS BIGINT) AS n_conversions,
                CAST(SUM(cq) AS DOUBLE) / 1e9 AS credit
         FROM q GROUP BY 1 ORDER BY channel""",
    // credit = 1e9 div k exact longs; channel totals are exact integer
    // sums with one final division
    "q_attribution_linear" ->
      """WITH t AS (SELECT user_id, epoch_us(ts) AS tus, event_type AS channel
                    FROM events WHERE event_type IN ('click', 'view')),
         c AS (SELECT user_id, epoch_us(ts) AS cus, event_id AS conversion_id
               FROM events WHERE event_type = 'purchase'),
         p AS (SELECT c.conversion_id, t.channel
               FROM c JOIN t ON c.user_id = t.user_id
                AND t.tus < c.cus AND t.tus >= c.cus - 1800000000),
         k AS (SELECT conversion_id, channel,
                      1000000000 // COUNT(*) OVER (PARTITION BY conversion_id) AS credit_q
               FROM p)
         SELECT channel,
                CAST(COUNT(DISTINCT conversion_id) AS BIGINT) AS n_conversions,
                CAST(SUM(credit_q) AS DOUBLE) / 1e9 AS credit
         FROM k GROUP BY 1 ORDER BY channel""",
    // quantized-long score sums make bin means exact-integer-backed
    // single divisions; identical chains both engines
    "q_calibration" -> calibrationOracle,
    // integer bin-count state: the streaming monitor equals batch exactly
    "q_calibration_stream" -> calibrationOracle,
    // exact integer floor shares + largest-remainder top-up; the oracle's
    // 1-based rank <= deficit mirrors the operator's 0-based rank < deficit
    "q_apportion" ->
      """WITH w AS (SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS cnt
                    FROM customer GROUP BY 1),
         t AS (SELECT CAST(SUM(cnt) AS BIGINT) AS wt FROM w),
         b AS (SELECT c_nationkey, cnt,
                      (cnt * 10000) // wt AS q, (cnt * 10000) % wt AS r
               FROM w, t),
         d AS (SELECT CAST(10000 - SUM(q) AS BIGINT) AS deficit FROM b),
         rk AS (SELECT *, ROW_NUMBER() OVER (ORDER BY r DESC, c_nationkey) AS rnk FROM b)
         SELECT c_nationkey, cnt,
                CAST(q + CASE WHEN rnk <= (SELECT deficit FROM d)
                              THEN 1 ELSE 0 END AS BIGINT) AS alloc
         FROM rk ORDER BY c_nationkey""",
    // collision-free regime: the min-row inner product equals the exact
    // frequency dot product
    "q_cms_join_size" ->
      """WITH a AS (SELECT user_id, COUNT(*) AS f1 FROM events
                    WHERE event_type = 'click' GROUP BY 1),
         b AS (SELECT user_id, COUNT(*) AS f2 FROM events
               WHERE event_type = 'purchase' GROUP BY 1)
         SELECT CAST(SUM(f1 * f2) AS BIGINT) AS est_join_rows
         FROM a JOIN b USING (user_id)""",
    // the oracle is the brute cross join — the grid + reference-point
    // plan must reproduce it pair for pair with no duplicates
    "q_bbox_join" ->
      """WITH c AS (SELECT c_custkey,
                c_custkey * 7919 % 100000 AS cxlo,
                c_custkey * 7919 % 100000 + 500 + c_custkey % 700 AS cxhi,
                c_custkey * 104729 % 100000 AS cylo,
                c_custkey * 104729 % 100000 + 500 + c_custkey % 900 AS cyhi
              FROM customer),
         s AS (SELECT s_suppkey,
                s_suppkey * 6367 % 100000 AS sxlo,
                s_suppkey * 6367 % 100000 + 2000 + s_suppkey % 3000 AS sxhi,
                s_suppkey * 9973 % 100000 AS sylo,
                s_suppkey * 9973 % 100000 + 2000 + s_suppkey % 3000 AS syhi
              FROM supplier)
         SELECT c_custkey, s_suppkey,
                CAST((LEAST(cxhi, sxhi) - GREATEST(cxlo, sxlo)) *
                     (LEAST(cyhi, syhi) - GREATEST(cylo, sylo)) AS BIGINT) AS overlap_area
         FROM c JOIN s ON cxlo <= sxhi AND sxlo <= cxhi
                      AND cylo <= syhi AND sylo <= cyhi
         ORDER BY c_custkey, s_suppkey""",
    // distances fold as exact 1e-6-quantized longs (order-free integer
    // sums), centroids are the shared 6dp mean-pool; only the final
    // sqrt/divide chain is floating point, replayed identically
    "q_embed_quality" ->
      """WITH x AS (SELECT vec_id, label, unnest(embedding) AS v,
                unnest(generate_series(0, len(embedding) - 1)) AS pos
              FROM embeddings),
         c AS (SELECT label AS clabel, pos, ROUND(AVG(CAST(v AS DOUBLE)), 6) AS cm
               FROM x GROUP BY 1, 2),
         t AS (SELECT x.vec_id, x.label, c.clabel,
                CAST(FLOOR(CAST(x.v AS DOUBLE) * 1000000.0 + 0.5) AS BIGINT)
                  - CAST(FLOOR(cm * 1000000.0 + 0.5) AS BIGINT) AS dq
               FROM x JOIN c ON x.pos = c.pos),
         d AS (SELECT vec_id, label, clabel, CAST(SUM(dq * dq) AS BIGINT) AS d2
               FROM t GROUP BY 1, 2, 3),
         p AS (SELECT vec_id, label,
                MIN(CASE WHEN label = clabel THEN d2 END) AS own2,
                MIN(CASE WHEN label <> clabel THEN d2 END) AS oth2
               FROM d GROUP BY 1, 2),
         s AS (SELECT label,
                SQRT(CAST(own2 AS DOUBLE) / 1e12) AS a,
                SQRT(CAST(oth2 AS DOUBLE) / 1e12) AS b,
                (own2 > oth2) AS mis
               FROM p),
         z AS (SELECT label,
                CAST(FLOOR((CASE WHEN GREATEST(a, b) > 0
                                 THEN (b - a) / GREATEST(a, b)
                                 ELSE 0.0 END) * 1e9 + 0.5) AS BIGINT) AS silq,
                CASE WHEN mis THEN 1 ELSE 0 END AS m
               FROM s)
         SELECT label, CAST(COUNT(*) AS BIGINT) AS n_vecs,
                (CAST(SUM(silq) AS DOUBLE) / COUNT(*)) / 1e9 AS avg_silhouette,
                CAST(SUM(m) AS BIGINT) AS n_misassigned
         FROM z GROUP BY 1 ORDER BY label""",
    // same equi-width binning as q_psi_drift; JSD terms need no eps floor
    // (shared verbatim by the streaming twin: integer bin counts make
    // stream == batch exact)
    "q_js_drift" -> jsDriftOracle,
    "q_js_drift_stream" -> jsDriftOracle,
    // engine-portable md5-mod hash: both engines derive identical buckets
    "q_hash_features" ->
      """WITH tok AS (SELECT doc_id,
                unnest(regexp_extract_all(lower(text), '[a-z0-9]{3,}')) AS term
              FROM documents WHERE doc_id < 200)
         SELECT doc_id,
                ('0x' || substr(md5(term), 1, 8))::BIGINT % 64 AS bucket,
                CAST(COUNT(*) AS BIGINT) AS cnt
         FROM tok GROUP BY 1, 2 ORDER BY doc_id, bucket""",
    "q_acf" -> acfOracle,
    "q_ar_forecast" -> arForecastOracle,
    "q_var1" -> var1Oracle,
    "q_mann_kendall" -> mannKendallOracle,
    // same calendar spine as q_mann_kendall; exact long errors, one/two
    // divisions — mirrors Temporal.backtestSeasonalNaive
    "q_backtest_naive" ->
      """WITH cnt AS (SELECT event_type, date_trunc('day', ts) AS day,
                CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
     bounds AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx FROM cnt GROUP BY 1),
     sp AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM bounds),
     s AS (SELECT sp.event_type, sp.day, COALESCE(cnt.x, 0) AS x
           FROM sp LEFT JOIN cnt ON sp.event_type = cnt.event_type AND sp.day = cnt.day),
     t AS (SELECT event_type, x,
                  LAG(x, 7) OVER (PARTITION BY event_type ORDER BY day) AS fc,
                  LAG(x, 1) OVER (PARTITION BY event_type ORDER BY day) AS nv,
                  ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day DESC) AS rnd
           FROM s),
     a AS (SELECT event_type,
                  CAST(SUM(CASE WHEN rnd <= 7 AND fc IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_test,
                  CAST(SUM(CASE WHEN rnd <= 7 AND fc IS NOT NULL THEN ABS(x - fc) ELSE 0 END) AS BIGINT) AS sae,
                  CAST(SUM(CASE WHEN rnd <= 7 AND fc IS NOT NULL THEN (x - fc) * (x - fc) ELSE 0 END) AS BIGINT) AS sse,
                  CAST(SUM(CASE WHEN rnd > 7 AND nv IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn,
                  CAST(SUM(CASE WHEN rnd > 7 AND nv IS NOT NULL THEN ABS(x - nv) ELSE 0 END) AS BIGINT) AS san
           FROM t GROUP BY 1)
     SELECT event_type, n_test,
            CASE WHEN n_test > 0 THEN
              ROUND(CAST(sae AS DOUBLE) / CAST(n_test AS DOUBLE), 6) END AS mae,
            CASE WHEN n_test > 0 THEN
              ROUND(SQRT(CAST(sse AS DOUBLE) / CAST(n_test AS DOUBLE)), 6) END AS rmse,
            CASE WHEN n_test > 0 AND nn > 0 AND san > 0 THEN
              ROUND(CAST(sae AS DOUBLE) / CAST(n_test AS DOUBLE)
                    / (CAST(san AS DOUBLE) / CAST(nn AS DOUBLE)), 6) END AS mase
     FROM a ORDER BY event_type""",
    "q_granger" -> grangerOracle,
    "q_seasonal_power" -> seasonalPowerOracle,
    "q_kn_perplexity" -> knPerplexityOracle,
    "q_betweenness" -> betweennessOracle,
    "q_rdd" -> rddOracle,
    "q_capture_recapture" -> captureRecaptureOracle,
    // the streaming twin accumulates the identical DECIMAL moment sums —
    // shares the batch oracle verbatim
    "q_rdd_stream" -> rddOracle,
    "q_poisson_dispersion" -> poissonDispersionOracle,
    // the streaming twin accumulates the identical per-group integer
    // sums — shares the batch oracle verbatim
    "q_jackknife_stream" -> jackknifeOracle,
    "q_llm_pipeline5" -> llmPipeline5Oracle,
    "q_bradley_terry" -> bradleyTerryOracle,
    "q_herfindahl" -> herfindahlOracle,
    "q_cuped" -> cupedOracle,
    // the streaming twin accumulates the identical integer moment sums —
    // shares the batch oracle verbatim
    "q_cuped_stream" -> cupedOracle,
    "q_calibration_error" -> calibrationErrorOracle,
    "q_scorer_agreement" -> scorerAgreementOracle,
    "q_hellinger_drift" -> hellingerDriftOracle,
    "q_hellinger_drift_stream" -> hellingerDriftOracle,
    "q_pacf" -> pacfOracle,
    // COUNT(DISTINCT band) per equivalence class — the audit readout
    "q_l_diversity" ->
      """SELECT c_nationkey, c_mktsegment,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) AS BIGINT) AS l_distinct,
                COUNT(DISTINCT CAST(floor(c_acctbal / 1000) AS BIGINT)) >= 3 AS diverse
         FROM customer GROUP BY 1, 2 ORDER BY 1, 2""",
    // the same two top-100 rankings full-outer fused with the identical
    // fixed add chain 1/(60+r1) + 1/(60+r2), 9-dp round on O(0.03) values
    "q_rank_fusion" ->
      """WITH r1 AS (SELECT doc_id,
                row_number() OVER (ORDER BY n_chars DESC, doc_id) AS rank
               FROM documents QUALIFY rank <= 100),
         r2 AS (SELECT doc_id,
                row_number() OVER (ORDER BY len(list_distinct(regexp_extract_all(lower(text), '[a-z]+'))) DESC, doc_id) AS rank
               FROM documents QUALIFY rank <= 100)
         SELECT COALESCE(r1.doc_id, r2.doc_id) AS doc_id,
                ROUND(COALESCE(1.0 / (60.0 + CAST(r1.rank AS DOUBLE)), 0.0)
                    + COALESCE(1.0 / (60.0 + CAST(r2.rank AS DOUBLE)), 0.0), 9) AS rrf_score,
                CAST(CASE WHEN r1.rank IS NOT NULL THEN 1 ELSE 0 END
                   + CASE WHEN r2.rank IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS n_lists
         FROM r1 FULL OUTER JOIN r2 ON r1.doc_id = r2.doc_id
         ORDER BY rrf_score DESC, doc_id LIMIT 50""",
    // plain left join under the same cutoff; NULLS FIRST matches Spark's
    // ascending null ordering
    "q_interval_join_outer" -> intervalJoinOuterOracle,
    "q_interval_join_outer_stream" -> intervalJoinOuterOracle,
    // running max is a selection — every intermediate is an exact integer,
    // so peak/drawdown agree bit-for-bit on any engine
    "q_max_drawdown" ->
      """WITH sv AS (SELECT user_id, ts, event_id,
                CASE WHEN event_type IN ('purchase', 'signup')
                     THEN CAST(FLOOR(value * 100 + 0.5) AS BIGINT)
                     ELSE -CAST(FLOOR(value * 100 + 0.5) AS BIGINT) END AS cents
              FROM events),
         lv AS (SELECT user_id, ts, event_id,
                CAST(SUM(cents) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS level
              FROM sv),
         pk AS (SELECT user_id, level,
                CAST(MAX(level) OVER (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS peak
              FROM lv)
         SELECT user_id,
                CAST(MAX(peak - level) AS BIGINT) AS max_drawdown,
                CAST(MAX(peak) AS BIGINT) AS peak_level,
                CAST(COUNT(*) AS BIGINT) AS n_points
         FROM pk GROUP BY 1 ORDER BY user_id""",
    // the 80/95 boundary is an integer cross-multiply on both engines —
    // no revenue share ever becomes a float
    "q_pareto_abc" ->
      """WITH pp AS (SELECT l_partkey,
                CAST(SUM(CAST(FLOOR(l_extendedprice * (1.0 - l_discount) * 100 + 0.5)
                  AS BIGINT)) AS BIGINT) AS revenue_cents
              FROM lineitem GROUP BY 1),
         c AS (SELECT l_partkey, revenue_cents,
                CAST(SUM(revenue_cents) OVER (ORDER BY revenue_cents DESC, l_partkey
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS HUGEINT) AS cum,
                CAST((SELECT SUM(revenue_cents) FROM pp) AS HUGEINT) AS total
              FROM pp),
         k AS (SELECT revenue_cents,
                CASE WHEN cum * 100 <= total * 80 THEN 'A'
                     WHEN cum * 100 <= total * 95 THEN 'B'
                     ELSE 'C' END AS abc_class
              FROM c)
         SELECT abc_class,
                CAST(COUNT(*) AS BIGINT) AS n_items,
                CAST(SUM(revenue_cents) AS BIGINT) AS class_cents,
                CAST(MIN(revenue_cents) AS BIGINT) AS min_item_cents,
                CAST(MAX(revenue_cents) AS BIGINT) AS max_item_cents
         FROM k GROUP BY 1 ORDER BY abc_class""",
    // TVD numerator stays an exact integer sum; the single division uses
    // the same (2*n)*N association as the Spark plan
    "q_t_closeness" ->
      """WITH gs AS (SELECT c_nationkey, c_mktsegment AS s,
                CAST(COUNT(*) AS BIGINT) AS n_gs FROM customer GROUP BY 1, 2),
         g AS (SELECT c_nationkey, CAST(SUM(n_gs) AS BIGINT) AS n FROM gs GROUP BY 1),
         st AS (SELECT c_mktsegment AS s, CAST(COUNT(*) AS BIGINT) AS n_s
                FROM customer GROUP BY 1),
         tot AS (SELECT CAST(SUM(n_s) AS BIGINT) AS nt FROM st),
         grid AS (SELECT g.c_nationkey, g.n, st.n_s, tot.nt,
                COALESCE(gs.n_gs, 0) AS n_gs
              FROM g CROSS JOIN st CROSS JOIN tot
              LEFT JOIN gs ON gs.c_nationkey = g.c_nationkey AND gs.s = st.s),
         agg AS (SELECT c_nationkey, n,
                CAST(SUM(ABS(n_gs * nt - n_s * n)) AS DOUBLE) /
                  (2.0 * CAST(n AS DOUBLE) * CAST(MIN(nt) AS DOUBLE)) AS tvd
              FROM grid GROUP BY 1, 2)
         SELECT c_nationkey, n, tvd, tvd <= 0.2 AS close
         FROM agg ORDER BY c_nationkey""",
    "q_one_hot" ->
      """SELECT o_orderstatus,
              CAST(COUNT(*) AS BIGINT) AS n_orders,
              CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_1_urgent,
              CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_2_high,
              CAST(SUM(CASE WHEN o_orderpriority = '3-MEDIUM' THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_3_medium,
              CAST(SUM(CASE WHEN o_orderpriority = '4-NOT SPECIFIED' THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_4_not_specified,
              CAST(SUM(CASE WHEN o_orderpriority = '5-LOW' THEN 1 ELSE 0 END) AS BIGINT) AS o_orderpriority_5_low
         FROM orders GROUP BY 1 ORDER BY o_orderstatus""",
    // identical float-op chain as the Spark plan (alpha, delta, var, z) —
    // z rounds to 6dp before the ordered top-50 selection on both engines
    "q_log_odds" ->
      """WITH tok AS (SELECT CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS a,
                unnest(regexp_extract_all(lower(text), '[a-z]{3,}')) AS term
              FROM documents),
         t AS (SELECT term, CAST(SUM(a) AS BIGINT) AS y_a,
                CAST(SUM(1 - a) AS BIGINT) AS y_b FROM tok GROUP BY 1),
         tot AS (SELECT CAST(SUM(y_a) AS BIGINT) AS na,
                CAST(SUM(y_b) AS BIGINT) AS nb FROM t),
         sc AS (SELECT term, y_a, y_b,
                (100.0 * CAST(y_a + y_b AS DOUBLE)) / CAST(na + nb AS DOUBLE) AS alpha,
                CAST(na AS DOUBLE) AS nad, CAST(nb AS DOUBLE) AS nbd
              FROM t CROSS JOIN tot),
         z AS (SELECT term, y_a, y_b,
                ROUND((LN((CAST(y_a AS DOUBLE) + alpha) /
                          (nad + 100.0 - CAST(y_a AS DOUBLE) - alpha)) -
                       LN((CAST(y_b AS DOUBLE) + alpha) /
                          (nbd + 100.0 - CAST(y_b AS DOUBLE) - alpha))) /
                      SQRT(1.0 / (CAST(y_a AS DOUBLE) + alpha) +
                           1.0 / (CAST(y_b AS DOUBLE) + alpha)), 6) AS z
              FROM sc)
         SELECT term, y_a, y_b, z FROM z
         ORDER BY z DESC, term LIMIT 50""")

  /** q_acf oracle: the identical exact-integer sufficient statistics
    * (n, Σx, Σx², per-lag Σx·x₋ₖ / Σ'x / Σ'x₋ₖ / n₋ₖ) over the identical
    * gap-filled daily spine, assembled with the same fixed double chain —
    * generated so the seven lags stay structurally identical. */
  /** Shared acf CTE chain (through the per-lag union) for the acf and pacf
    * oracles. */
  private def acfCtes: String = {
    val lagDefs = (1 to 7).map(i => s"LAG(x, $i) OVER w AS l$i").mkString(", ")
    val aggDefs = (1 to 7).map { i =>
      s"""CAST(SUM(CASE WHEN l$i IS NOT NULL THEN x * l$i END) AS BIGINT) AS p$i,
                CAST(SUM(CASE WHEN l$i IS NOT NULL THEN x END) AS BIGINT) AS a$i,
                CAST(SUM(l$i) AS BIGINT) AS b$i,
                CAST(COUNT(l$i) AS BIGINT) AS n$i"""
    }.mkString(",\n                ")
    val lagRows = (1 to 7).map { i =>
      s"""SELECT event_type, n, $i AS lag,
                CASE WHEN den > 0 AND n$i > 0 THEN
                  ROUND((CAST(p$i AS DOUBLE) - mu * CAST(a$i AS DOUBLE) - mu * CAST(b$i AS DOUBLE)
                         + CAST(n$i AS DOUBLE) * mu * mu) / den, 6)
                END AS acf FROM m"""
    }.mkString("\n         UNION ALL\n         ")
    s"""WITH cnt AS (SELECT event_type, date_trunc('day', ts) AS day,
                CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
         bounds AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx FROM cnt GROUP BY 1),
         sp AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM bounds),
         s AS (SELECT sp.event_type, sp.day, COALESCE(cnt.x, 0) AS x
               FROM sp LEFT JOIN cnt ON sp.event_type = cnt.event_type AND sp.day = cnt.day),
         l AS (SELECT event_type, x, $lagDefs
               FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         a AS (SELECT event_type,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS s1,
                CAST(SUM(x * x) AS BIGINT) AS s2,
                $aggDefs
               FROM l GROUP BY 1),
         m AS (SELECT *,
                CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE) * mu * mu AS den
               FROM a),
         af AS (
         $lagRows
         )"""
  }

  private val acfOracle: String =
    acfCtes + "\n         SELECT * FROM af ORDER BY event_type, lag"

  /** Level-unrolled Brandes replay: 3 forward BFS levels with exact σ
    * sums and NOT-EXISTS visited guards, the backward dependency sweep
    * with per-edge 1e-9-quantized terms, exact-long top-20 — mirrors
    * [[graft.operators.Graph.betweennessApprox]] bit-for-bit. */
  private val betweennessOracle: String = {
    def fwd(cur: Int, prev: Int, vis: String) =
      s"""f$cur AS MATERIALIZED (
           SELECT f$prev.src, e.v AS id, CAST(SUM(f$prev.sigma) AS BIGINT) AS sigma
           FROM f$prev JOIN e ON f$prev.id = e.u
           WHERE NOT EXISTS (SELECT 1 FROM $vis x WHERE x.src = f$prev.src AND x.id = e.v)
           GROUP BY 1, 2)"""
    def bwd(cur: Int, next: Int) =
      s"""c$cur AS MATERIALIZED (
           SELECT f$cur.src, f$cur.id,
                  CAST(SUM(CAST(FLOOR(CAST(f$cur.sigma AS DOUBLE) / CAST(w$next.sw AS DOUBLE)
                       * (1.0 + CAST(w$next.dq AS DOUBLE) / 1e9) * 1e9 + 0.5) AS BIGINT))
                    AS BIGINT) AS dq
           FROM f$cur JOIN e ON f$cur.id = e.u
           JOIN w$next ON w$next.src = f$cur.src AND w$next.wid = e.v
           GROUP BY 1, 2)"""
    s"""WITH li AS (SELECT l.l_orderkey AS k, l.l_partkey AS p
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
            WHERE o.o_orderdate >= TIMESTAMP '1996-01-01'
              AND o.o_orderdate < TIMESTAMP '1996-07-01'),
     e AS MATERIALIZED (
           SELECT DISTINCT a.p AS u, b.p AS v FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p),
     srcs AS (SELECT DISTINCT u FROM e ORDER BY u LIMIT 8),
     f0 AS (SELECT u AS src, u AS id, CAST(1 AS BIGINT) AS sigma FROM srcs),
     ${fwd(1, 0, "f0")},
     vis1 AS (SELECT src, id FROM f0 UNION ALL SELECT src, id FROM f1),
     ${fwd(2, 1, "vis1")},
     vis2 AS (SELECT src, id FROM vis1 UNION ALL SELECT src, id FROM f2),
     ${fwd(3, 2, "vis2")},
     d3 AS (SELECT src, id, CAST(0 AS BIGINT) AS dq FROM f3),
     w3 AS (SELECT src, id AS wid, sigma AS sw, CAST(0 AS BIGINT) AS dq FROM f3),
     ${bwd(2, 3)},
     w2 AS (SELECT f2.src, f2.id AS wid, f2.sigma AS sw, COALESCE(c2.dq, 0) AS dq
            FROM f2 LEFT JOIN c2 ON f2.src = c2.src AND f2.id = c2.id),
     ${bwd(1, 2)},
     acc AS (SELECT * FROM d3 UNION ALL SELECT * FROM c2 UNION ALL SELECT * FROM c1),
     bc AS (SELECT id, CAST(SUM(dq) AS BIGINT) AS bq FROM acc GROUP BY 1
            ORDER BY bq DESC, id LIMIT 20)
     SELECT id AS node, ROUND(CAST(bq AS DOUBLE) / 1e9, 6) AS betweenness
     FROM bc ORDER BY betweenness DESC, node"""
  }

  /** Slice-zip bigram extraction + the three KN model tables + the
    * quantized log readout — mirrors
    * [[graft.operators.TextAnalysis.knBigramPerplexity]] bit-for-bit. */
  /** The KN model + scoring CTEs (through per-doc quantized sums `sc`),
    * shared with the pipeline-v5 oracle. */
  private lazy val knPerplexityCtes: String =
    """WITH toks AS MATERIALIZED (
           SELECT doc_id, lang, regexp_extract_all(lower(text), '[a-z0-9]{1,}') AS l
           FROM documents),
     refbg AS (SELECT unnest(list_transform(range(2, length(l) + 1),
                        i -> struct_pack(w1 := l[i - 1], w2 := l[i]))) AS s
               FROM toks WHERE lang = 'en' AND length(l) >= 2),
     big AS MATERIALIZED (
           SELECT s.w1 AS w1, s.w2 AS w2, CAST(COUNT(*) AS BIGINT) AS c12
           FROM refbg GROUP BY 1, 2),
     ctx AS MATERIALIZED (
           SELECT w1, CAST(SUM(c12) AS BIGINT) AS c1, CAST(COUNT(*) AS BIGINT) AS n1l
           FROM big GROUP BY 1),
     cont AS MATERIALIZED (
           SELECT w2, CAST(COUNT(*) AS BIGINT) AS n1r FROM big GROUP BY 1),
     btot AS (SELECT CAST(COUNT(*) AS BIGINT) AS b FROM big),
     terms AS (SELECT doc_id, CAST(NULL AS VARCHAR) AS w1, l[1] AS w2
               FROM toks WHERE length(l) >= 1
               UNION ALL
               SELECT doc_id, s.w1, s.w2 FROM (
                 SELECT doc_id, unnest(list_transform(range(2, length(l) + 1),
                          i -> struct_pack(w1 := l[i - 1], w2 := l[i]))) AS s
                 FROM toks WHERE length(l) >= 2)),
     sc0 AS (SELECT t.doc_id,
               CASE WHEN t.w1 IS NULL OR ctx.c1 IS NULL THEN
                 CAST(COALESCE(cont.n1r, 1) AS DOUBLE) / CAST(btot.b + 1 AS DOUBLE)
               ELSE
                 GREATEST(CAST(COALESCE(big.c12, 0) AS DOUBLE) - 0.75, CAST(0 AS DOUBLE))
                   / CAST(ctx.c1 AS DOUBLE)
                 + 0.75 * CAST(ctx.n1l AS DOUBLE) / CAST(ctx.c1 AS DOUBLE)
                   * (CAST(COALESCE(cont.n1r, 1) AS DOUBLE) / CAST(btot.b + 1 AS DOUBLE))
               END AS p
             FROM terms t
             LEFT JOIN big ON t.w1 = big.w1 AND t.w2 = big.w2
             LEFT JOIN ctx ON t.w1 = ctx.w1
             LEFT JOIN cont ON t.w2 = cont.w2
             CROSS JOIN btot),
     sc AS (SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_tokens,
              CAST(SUM(CAST(FLOOR(LN(p) * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sq
            FROM sc0 GROUP BY 1)"""

  private val knPerplexityOracle: String =
    s"""$knPerplexityCtes
     SELECT doc_id, n_tokens,
            ROUND(-CAST(sq AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE), 6) AS cross_entropy,
            ROUND(EXP(ROUND(-CAST(sq AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE), 6)), 6)
              AS perplexity
     FROM sc ORDER BY doc_id"""

  /** The shared KN scoring CTEs + the per-language lowest-perplexity
    * head selection — mirrors qLlmPipeline5 (the CCNet-style "keep the
    * head bucket" curation chain) bit-for-bit. */
  private val llmPipeline5Oracle: String =
    s"""$knPerplexityCtes,
     res AS (SELECT doc_id, n_tokens,
               ROUND(-CAST(sq AS DOUBLE) / 1e6 / CAST(n_tokens AS DOUBLE), 6) AS ce
             FROM sc),
     j AS (SELECT d.lang, r.doc_id, r.n_tokens, r.ce,
                  ROW_NUMBER() OVER (PARTITION BY d.lang
                                     ORDER BY r.ce, r.doc_id) AS rnk
           FROM res r JOIN documents d USING (doc_id))
     SELECT lang, doc_id, n_tokens, ce AS cross_entropy, rnk
     FROM j WHERE rnk <= 20 ORDER BY lang, rnk"""

  /** The literal phase-grid trig table + quantized projections + the
    * centered readout — mirrors
    * [[graft.operators.Temporal.seasonalPower]] bit-for-bit (the trig
    * values are the JVM's doubles rendered verbatim). */
  private val seasonalPowerOracle: String = {
    def trig(f: Int => Double) = (0 until 7)
      .map(p => s"WHEN $p THEN CAST(${f(p)} AS DOUBLE)")
      .mkString("CASE ph ", " ", " END")
    val cosCase = trig(p => math.cos(2.0 * math.Pi * p / 7))
    val sinCase = trig(p => math.sin(2.0 * math.Pi * p / 7))
    s"""WITH cnt AS (SELECT event_type, date_trunc('day', ts) AS day,
                CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
     bounds AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx FROM cnt GROUP BY 1),
     sp AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM bounds),
     s AS (SELECT sp.event_type, sp.day, COALESCE(cnt.x, 0) AS x
           FROM sp LEFT JOIN cnt ON sp.event_type = cnt.event_type AND sp.day = cnt.day),
     ph AS (SELECT event_type, x,
                   CAST((ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day) - 1) % 7
                        AS INTEGER) AS ph
            FROM s),
     tr AS (SELECT event_type, x, $cosCase AS c, $sinCase AS sn FROM ph),
     a AS (SELECT event_type,
                  CAST(COUNT(*) AS BIGINT) AS n,
                  CAST(SUM(x) AS BIGINT) AS sx,
                  CAST(SUM(x * x) AS BIGINT) AS sxx,
                  CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * c * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS xc,
                  CAST(SUM(CAST(FLOOR(CAST(x AS DOUBLE) * sn * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS xs,
                  CAST(SUM(CAST(FLOOR(c * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS sc,
                  CAST(SUM(CAST(FLOOR(sn * 1e6 + 0.5) AS BIGINT)) AS BIGINT) AS ss
           FROM tr GROUP BY 1),
     r AS (SELECT event_type, n,
                  CAST(n AS DOUBLE) AS nn,
                  CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                  CAST(xc AS DOUBLE) / 1e6
                    - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * (CAST(sc AS DOUBLE) / 1e6) AS cc,
                  CAST(xs AS DOUBLE) / 1e6
                    - CAST(sx AS DOUBLE) / CAST(n AS DOUBLE) * (CAST(ss AS DOUBLE) / 1e6) AS ssn,
                  CAST(sxx AS DOUBLE)
                    - CAST(n AS DOUBLE) * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(sx AS DOUBLE) / CAST(n AS DOUBLE)) AS sst
           FROM a),
     f AS (SELECT *, cc * cc + ssn * ssn AS p2 FROM r)
     SELECT event_type, n,
            ROUND(CAST(2 AS DOUBLE) * SQRT(p2) / nn, 6) AS amplitude,
            CASE WHEN sst > 0 THEN ROUND(CAST(2 AS DOUBLE) * p2 / (nn * sst), 6) END AS power_frac
     FROM f ORDER BY event_type"""
  }

  /** The var1 moment prefix + both directions' restricted/unrestricted
    * closed forms + the F chain — mirrors
    * [[graft.operators.Temporal.grangerCausality]] bit-for-bit. */
  private val grangerOracle: String =
    """WITH cnt AS (SELECT date_trunc('day', ts) AS day,
            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
           FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
     bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM cnt),
     sp AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM bounds),
     s AS (SELECT sp.day, CAST(COALESCE(cnt.x, 0) AS DOUBLE) AS x,
                  CAST(COALESCE(cnt.y, 0) AS DOUBLE) AS y
           FROM sp LEFT JOIN cnt ON sp.day = cnt.day),
     l AS (SELECT x, y, LAG(x) OVER (ORDER BY day) AS xl, LAG(y) OVER (ORDER BY day) AS yl
           FROM s),
     b AS (SELECT CAST(FLOOR(x * 1e6 + 0.5) AS HUGEINT) AS tx,
                  CAST(FLOOR(y * 1e6 + 0.5) AS HUGEINT) AS ty,
                  CAST(FLOOR(xl * 1e6 + 0.5) AS HUGEINT) AS a,
                  CAST(FLOOR(yl * 1e6 + 0.5) AS HUGEINT) AS bb
           FROM l WHERE xl IS NOT NULL AND yl IS NOT NULL),
     m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  SUM(a) AS sa0, SUM(bb) AS sb0,
                  SUM(a * a) AS saa0, SUM(bb * bb) AS sbb0, SUM(a * bb) AS sab0,
                  SUM(tx) AS syx0, SUM(a * tx) AS sayx0, SUM(bb * tx) AS sbyx0,
                  SUM(tx * tx) AS syyx0,
                  SUM(ty) AS syy0s, SUM(a * ty) AS sayy0, SUM(bb * ty) AS sbyy0,
                  SUM(ty * ty) AS syyy0
           FROM b),
     t AS (SELECT n, CAST(n AS DOUBLE) AS nn,
                  CAST(sa0 AS DOUBLE) / 1e6 AS sa, CAST(sb0 AS DOUBLE) / 1e6 AS sb,
                  CAST(saa0 AS DOUBLE) / 1e12 AS saa, CAST(sbb0 AS DOUBLE) / 1e12 AS sbb,
                  CAST(sab0 AS DOUBLE) / 1e12 AS sab,
                  CAST(syx0 AS DOUBLE) / 1e6 AS syx, CAST(sayx0 AS DOUBLE) / 1e12 AS sayx,
                  CAST(sbyx0 AS DOUBLE) / 1e12 AS sbyx, CAST(syyx0 AS DOUBLE) / 1e12 AS syyx,
                  CAST(syy0s AS DOUBLE) / 1e6 AS syy, CAST(sayy0 AS DOUBLE) / 1e12 AS sayy,
                  CAST(sbyy0 AS DOUBLE) / 1e12 AS sbyy, CAST(syyy0 AS DOUBLE) / 1e12 AS syyy
           FROM m),
     d AS (SELECT *,
             nn * (saa * sbb - sab * sab) - sa * (sa * sbb - sab * sb)
               + sb * (sa * sab - saa * sb) AS det
           FROM t),
     dirs AS (
       SELECT 'y->x' AS direction, n, nn, det, sa, sb, saa, sbb, sab,
              syx AS sy, sayx AS say, sbyx AS sby, syyx AS syy_t,
              sa AS so, saa AS soo, sayx AS sown, 2 AS crossid
       FROM d
       UNION ALL
       SELECT 'x->y', n, nn, det, sa, sb, saa, sbb, sab,
              syy, sayy, sbyy, syyy,
              sb, sbb, sbyy, 1
       FROM d),
     bet AS (SELECT *,
              (sy * (saa * sbb - sab * sab) - sa * (say * sbb - sab * sby)
                + sb * (say * sab - saa * sby)) / det AS b0,
              (nn * (say * sbb - sab * sby) - sy * (sa * sbb - sab * sb)
                + sb * (sa * sby - say * sb)) / det AS b1,
              (nn * (saa * sby - say * sab) - sa * (sa * sby - say * sb)
                + sy * (sa * sab - saa * sb)) / det AS b2
             FROM dirs),
     res AS (SELECT *,
              syy_t - (b0 * sy + b1 * say + b2 * sby) AS sse_u,
              nn * soo - so * so AS den_r,
              (nn * sown - so * sy) / (nn * soo - so * so) AS slope_r
             FROM bet),
     fin AS (SELECT *, (sy - slope_r * so) / nn AS b0r FROM res),
     ff AS (SELECT *, syy_t - b0r * sy - slope_r * sown AS sse_r FROM fin)
     SELECT direction, n,
            CASE WHEN det <> 0.0 THEN
              ROUND(CASE WHEN crossid = 2 THEN b2 ELSE b1 END, 6) END AS beta_cross,
            CASE WHEN det <> 0.0 AND den_r <> 0.0 AND sse_u > 0.0 AND nn > 3.0 THEN
              ROUND((sse_r - sse_u) / (sse_u / (nn - 3.0)), 6) END AS f
     FROM ff ORDER BY direction"""

  /** Exact integer pair-sign sum + tie-corrected variance + the two-op Z
    * chain — mirrors [[graft.operators.Temporal.mannKendall]]
    * bit-for-bit over the q_acf series. */
  private val mannKendallOracle: String =
    """WITH cnt AS (SELECT event_type, date_trunc('day', ts) AS day,
                CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
     bounds AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx FROM cnt GROUP BY 1),
     sp AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM bounds),
     s AS (SELECT sp.event_type, sp.day, COALESCE(cnt.x, 0) AS x
           FROM sp LEFT JOIN cnt ON sp.event_type = cnt.event_type AND sp.day = cnt.day),
     pr AS (SELECT a.event_type,
                   CAST(SUM(CAST(SIGN(CAST(b.x - a.x AS DOUBLE)) AS BIGINT)) AS BIGINT) AS sv
            FROM s a JOIN s b ON a.event_type = b.event_type AND a.day < b.day
            GROUP BY 1),
     tg AS (SELECT event_type, x, CAST(COUNT(*) AS BIGINT) AS t FROM s GROUP BY 1, 2),
     ti AS (SELECT event_type, CAST(SUM(t) AS BIGINT) AS n,
                   CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tcorr
            FROM tg GROUP BY 1),
     v AS (SELECT ti.event_type, ti.n, COALESCE(pr.sv, 0) AS sv,
                  CAST(ti.n * (ti.n - 1) * (2 * ti.n + 5) - ti.tcorr AS DOUBLE) / 18.0 AS var_s
           FROM ti LEFT JOIN pr ON pr.event_type = ti.event_type)
     SELECT event_type, n, sv AS s, ROUND(var_s, 6) AS var_s,
            CASE WHEN var_s > 0 THEN ROUND(
              CASE WHEN sv > 0 THEN CAST(sv - 1 AS DOUBLE) / SQRT(var_s)
                   WHEN sv < 0 THEN CAST(sv + 1 AS DOUBLE) / SQRT(var_s)
                   ELSE CAST(0 AS DOUBLE) END, 6) END AS z,
            CAST(SIGN(CAST(sv AS DOUBLE)) AS INTEGER) AS trend
     FROM v ORDER BY event_type"""

  /** Full farthest-first replay: 8 unrolled selection rounds, each one
    * running-min distance update + (d DESC, id ASC) argmax — mirrors
    * [[graft.operators.Similarity.kCenterSample]] bit-for-bit: the
    * distance is the same left-associated (float→double − double)² fold
    * ([[graft.functions.VectorOps.l2DistSqFD]]; DuckDB's list_sum over a
    * list_transform accumulates in list order — verified bit-equal on the
    * real corpus), so both engines pick identical centers and emit
    * identical radius doubles. MATERIALIZED per round: each d_i feeds both
    * p_{i+1} and d_{i+1}, and naive CTE inlining would re-derive the whole
    * prefix exponentially. */
  private val kcenterOracle: String = {
    def dist(a: String, b: String) =
      s"""list_sum(list_transform(range(64), j ->
            (CAST($a[j+1] AS DOUBLE) - CAST($b[j+1] AS DOUBLE)) *
            (CAST($a[j+1] AS DOUBLE) - CAST($b[j+1] AS DOUBLE))))"""
    val k = 8
    val rounds = (2 to k).map { i =>
      s"""p$i AS MATERIALIZED (SELECT id, v, d FROM d${i - 1} ORDER BY d DESC, id ASC LIMIT 1),
     d$i AS MATERIALIZED (SELECT a.id, a.v, LEAST(a.d, ${dist("a.v", s"p$i.v")}) AS d
           FROM d${i - 1} a CROSS JOIN p$i)"""
    }.mkString(",\n     ")
    val readout = (2 to k)
      .map(i => s"SELECT CAST($i AS INTEGER) AS selection_order, id, d AS radius_sq FROM p$i")
      .mkString("\n     UNION ALL ")
    s"""WITH e AS (SELECT vec_id AS id, embedding AS v FROM embeddings),
     c1 AS MATERIALIZED (SELECT id, v FROM e ORDER BY id LIMIT 1),
     d1 AS MATERIALIZED (SELECT e.id, e.v, ${dist("e.v", "c1.v")} AS d
           FROM e CROSS JOIN c1),
     $rounds
     SELECT CAST(1 AS INTEGER) AS selection_order, id, CAST(NULL AS DOUBLE) AS radius_sq FROM c1
     UNION ALL $readout
     ORDER BY selection_order"""
  }

  /** Full MMR replay: 20 unrolled greedy rounds over the top-100 candidate
    * list — mirrors [[graft.operators.Similarity.mmrRerank]] bit-for-bit:
    * cosine's three accumulators are the same left-associated float→double
    * folds (list_sum over list_transform — the k-center-verified
    * convention), the running max-sim is a GREATEST chain, the score is
    * λ·rel − (1−λ)·maxSim with BOTH constants spelled as exact double
    * literals (a bare 0.3 would parse as DECIMAL and convert to the WRONG
    * double — Scala computes 1−0.7 = 0.30000000000000004), and the argmax
    * is (score DESC, id ASC). Round 1 subtracts (1−λ)·0.0, which is
    * IEEE-identical to the kernel's bare λ·rel branch. MATERIALIZED per
    * round for the k-center reason. */
  private val mmrOracle: String = {
    val lam = "CAST('0.7' AS DOUBLE)"
    val oneMinusLam = s"CAST('${(1.0 - 0.7).toString}' AS DOUBLE)"
    def fold(expr: String) =
      s"list_sum(list_transform(range(64), j -> $expr))"
    def cos(a: String, b: String) = {
      val dot = fold(s"CAST($a[j+1] AS DOUBLE) * CAST($b[j+1] AS DOUBLE)")
      val na = fold(s"CAST($a[j+1] AS DOUBLE) * CAST($a[j+1] AS DOUBLE)")
      val nb = fold(s"CAST($b[j+1] AS DOUBLE) * CAST($b[j+1] AS DOUBLE)")
      s"CASE WHEN $na = 0.0 OR $nb = 0.0 THEN 0.0 ELSE $dot / SQRT($na * $nb) END"
    }
    val k = 20
    val rounds = (2 to k).map { i =>
      s"""d$i AS MATERIALIZED (
           SELECT a.id, a.rel, a.v, GREATEST(a.ms, ${cos("a.v", s"p${i - 1}.v")}) AS ms
           FROM d${i - 1} a CROSS JOIN p${i - 1} WHERE a.id <> p${i - 1}.id),
     p$i AS MATERIALIZED (
           SELECT id, rel, v, ms, $lam * rel - $oneMinusLam * ms AS score
           FROM d$i ORDER BY $lam * rel - $oneMinusLam * ms DESC, id LIMIT 1)"""
    }.mkString(",\n     ")
    val readout = (1 to k)
      .map(i => s"SELECT CAST($i AS INTEGER) AS selection_order, id, score AS mmr_score FROM p$i")
      .mkString("\n     UNION ALL ")
    s"""WITH topd AS MATERIALIZED (
           SELECT doc_id AS id, CAST(n_chars AS DOUBLE) AS rel
           FROM documents ORDER BY n_chars DESC, doc_id LIMIT 100),
     d1 AS MATERIALIZED (
           SELECT t.id, t.rel, e.embedding AS v, CAST(0.0 AS DOUBLE) AS ms
           FROM topd t JOIN embeddings e ON t.id = e.vec_id),
     p1 AS MATERIALIZED (
           SELECT id, rel, v, ms, $lam * rel - $oneMinusLam * ms AS score
           FROM d1 ORDER BY $lam * rel - $oneMinusLam * ms DESC, id LIMIT 1),
     $rounds
     $readout
     ORDER BY selection_order"""
  }

  /** Full LTTB replay: the 22 interior-bucket argmax rounds unroll as
    * MATERIALIZED CTEs (each pick feeds the next bucket's triangle
    * anchor), mirroring [[graft.functions.VectorOps.lttb]] bit-for-bit:
    * bucket bounds use the SAME floor((b·(n−2)/22.0)) double products,
    * centroid sums are integer-exact in double at gate scale (≪2^53, so
    * summation order is immaterial), the area is the same fixed chain of
    * single IEEE ops on exact ingredients, and the argmax replays the
    * kernel's strictly-greater scan as (area DESC, pos ASC). Keys with
    * n ≤ threshold bypass the algorithm and emit every point, exactly as
    * the kernel's small-series branch does. */
  private val lttbOracle: String = {
    val th = 24
    val nb = th - 2
    val area =
      """ABS((a.ax - c.avgx) * (CAST(p.y AS DOUBLE) - a.ay)
             - (a.ax - CAST(p.x AS DOUBLE)) * (c.avgy - a.ay))"""
    val rounds = (0 until nb).map { b =>
      val anchor = if (b == 0) "a0" else s"w${b - 1}"
      s"""w$b AS MATERIALIZED (
           SELECT key, pos, x, y, CAST(x AS DOUBLE) AS ax, CAST(y AS DOUBLE) AS ay FROM (
             SELECT p.key, p.pos, p.x, p.y,
                    ROW_NUMBER() OVER (PARTITION BY p.key ORDER BY $area DESC, p.pos) AS rn
             FROM pts p
             JOIN bkt k ON p.key = k.key AND k.b = $b AND p.pos >= k.st AND p.pos < k.en
             JOIN cent c ON c.key = p.key AND c.b = $b
             JOIN $anchor a ON a.key = p.key) WHERE rn = 1)"""
    }.mkString(",\n     ")
    val readout = (0 until nb)
      .map(b => s"SELECT key, x, y FROM w$b")
      .mkString("\n     UNION ALL ")
    s"""WITH daily AS (
           SELECT o_orderpriority AS key,
                  CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) AS BIGINT) AS x,
                  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS y
           FROM orders GROUP BY 1, 2),
     pts0 AS (SELECT key, x, y,
                     CAST(ROW_NUMBER() OVER (PARTITION BY key ORDER BY x, y) - 1 AS BIGINT) AS pos,
                     CAST(COUNT(*) OVER (PARTITION BY key) AS BIGINT) AS n
              FROM daily),
     pts AS MATERIALIZED (SELECT * FROM pts0 WHERE n > $th),
     par AS (SELECT key, MAX(n) AS n, CAST(MAX(n) - 2 AS DOUBLE) / CAST($nb AS DOUBLE) AS every
             FROM pts GROUP BY 1),
     bkt AS MATERIALIZED (
           SELECT key, n, every, b,
                  CAST(FLOOR(CAST(b AS DOUBLE) * every) AS BIGINT) + 1 AS st,
                  LEAST(CAST(FLOOR(CAST(b + 1 AS DOUBLE) * every) AS BIGINT) + 1, n - 1) AS en,
                  LEAST(CAST(FLOOR(CAST(b + 1 AS DOUBLE) * every) AS BIGINT) + 1, n - 1) AS cst,
                  LEAST(CAST(FLOOR(CAST(b + 2 AS DOUBLE) * every) AS BIGINT) + 1, n) AS cen
           FROM par CROSS JOIN (SELECT unnest(range($nb)) AS b)),
     cent AS MATERIALIZED (
           SELECT k.key, k.b,
                  CAST(SUM(p.x) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgx,
                  CAST(SUM(p.y) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgy
           FROM bkt k JOIN pts p ON p.key = k.key AND p.pos >= k.cst AND p.pos < k.cen
           GROUP BY 1, 2),
     a0 AS MATERIALIZED (
           SELECT key, pos, x, y, CAST(x AS DOUBLE) AS ax, CAST(y AS DOUBLE) AS ay
           FROM pts WHERE pos = 0),
     $rounds
     SELECT key AS prio, CAST(x AS BIGINT) AS day, CAST(y AS BIGINT) AS cents FROM (
       SELECT key, x, y FROM pts WHERE pos = 0
       UNION ALL $readout
       UNION ALL SELECT key, x, y FROM pts WHERE pos = n - 1
       UNION ALL SELECT key, x, y FROM pts0 WHERE n <= $th)
     ORDER BY prio, day"""
  }

  /** PAV replay via the closed minimax identity fit_i = max_{k<=i}
    * min_{j>=i} mean(y[k..j]) (exact for unweighted L2 isotonic
    * regression) — mirrors [[graft.operators.Sketches.isotonic]]
    * bit-for-bit without unrolling the sequential pooling: block means on
    * both sides are ONE correctly-rounded division of exact integer
    * ingredients (Spark: pooled long sum / count; here: BIGINT prefix-sum
    * difference / count), equal rationals land on equal doubles, and
    * correctly-rounded conversion is monotone so the double min/max selects
    * the same value the exact-rational min/max would. O(n²) rows via a
    * per-(prio, k) right-to-left running MIN — n is the calendar-bounded
    * week count, so the pair table stays tiny. */
  private val isotonicOracle: String =
    """WITH weekly AS (
           SELECT o_orderpriority AS prio,
                  CAST(FLOOR(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE)) / 7.0) AS BIGINT) AS week,
                  CAST(SUM(CAST(FLOOR(o_totalprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS rev
           FROM orders GROUP BY 1, 2),
     ord AS (SELECT prio, week, rev,
                    CAST(ROW_NUMBER() OVER (PARTITION BY prio ORDER BY week) AS BIGINT) AS i
             FROM weekly),
     s AS (SELECT prio, week, i, rev,
                  CAST(SUM(rev) OVER (PARTITION BY prio ORDER BY i) AS BIGINT) AS cs
           FROM ord),
     m AS (SELECT a.prio, a.i AS k, b.i AS j,
                  CAST(b.cs - (a.cs - a.rev) AS DOUBLE) / CAST(b.i - a.i + 1 AS DOUBLE) AS mn
           FROM s a JOIN s b ON a.prio = b.prio AND b.i >= a.i),
     inn AS (SELECT prio, k, j,
                    MIN(mn) OVER (PARTITION BY prio, k ORDER BY j DESC) AS innermin
             FROM m),
     fit AS (SELECT prio, j AS i, MAX(innermin) AS fit FROM inn GROUP BY 1, 2)
     SELECT f.prio, o.week, f.fit
     FROM fit f JOIN ord o ON f.prio = o.prio AND f.i = o.i
     ORDER BY f.prio, o.week"""

  /** Full PQ replay: sample codebook, per-subspace quantized-long encode
    * argmin, ADC LUT join, bounded shortlist, exact-cosine rerank —
    * mirrors [[graft.operators.Similarity.pqTopK]] bit-for-bit (encode
    * and shortlist rank on exact longs, so both engines select identical
    * rows before the rounded-sim readout). */
  private val pqOracle: String = {
    def subdist(v: String, c: String) =
      s"""list_sum(list_transform(range(0, 16), j ->
            CAST(FLOOR((CAST($v[sub.s * 16 + j + 1] AS DOUBLE) - CAST($c[sub.s * 16 + j + 1] AS DOUBLE))
                       * (CAST($v[sub.s * 16 + j + 1] AS DOUBLE) - CAST($c[sub.s * 16 + j + 1] AS DOUBLE))
                       * 1e6 + 0.5) AS BIGINT)))"""
    s"""WITH cb AS MATERIALIZED (
           SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS code, embedding AS cv
           FROM embeddings ORDER BY vec_id LIMIT 16),
     subs AS (SELECT unnest([0, 1, 2, 3]) AS s),
     sd AS (SELECT e.vec_id, sub.s, cb.code, ${subdist("e.embedding", "cb.cv")} AS d
            FROM embeddings e CROSS JOIN subs sub CROSS JOIN cb),
     enc AS MATERIALIZED (
           SELECT vec_id, s, code FROM (
             SELECT vec_id, s, code,
                    ROW_NUMBER() OVER (PARTITION BY vec_id, s ORDER BY d, code) AS rn
             FROM sd) WHERE rn = 1),
     q AS MATERIALIZED (
           SELECT vec_id AS query_id, embedding AS qv FROM embeddings WHERE vec_id < 8),
     lut AS (SELECT q.query_id, sub.s, cb.code, ${subdist("q.qv", "cb.cv")} AS dq
             FROM q CROSS JOIN subs sub CROSS JOIN cb),
     adc AS (SELECT l.query_id, en.vec_id, CAST(SUM(l.dq) AS BIGINT) AS adc
             FROM enc en JOIN lut l ON en.s = l.s AND en.code = l.code
             WHERE en.vec_id <> l.query_id
             GROUP BY 1, 2),
     short AS (SELECT query_id, vec_id FROM (
                 SELECT query_id, vec_id,
                        ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY adc, vec_id) AS rn
                 FROM adc) WHERE rn <= 120),
     rr AS (SELECT sh.query_id, sh.vec_id,
                   list_cosine_similarity(CAST(q.qv AS DOUBLE[]),
                                          CAST(e.embedding AS DOUBLE[])) AS sim
            FROM short sh JOIN embeddings e ON sh.vec_id = e.vec_id
            JOIN q ON sh.query_id = q.query_id),
     ranked AS (SELECT query_id, vec_id, sim,
                       ROW_NUMBER() OVER (PARTITION BY query_id ORDER BY sim DESC, vec_id) AS rn
                FROM rr)
     SELECT query_id, vec_id, ROUND(sim, 6) AS sim, rn AS rnk
     FROM ranked WHERE rn <= 3 ORDER BY query_id, rnk"""
  }

  /** The shared lag pass + two exact Cramer solves + forecasts through
    * the unrounded coefficients — mirrors
    * [[graft.operators.Temporal.var1]] bit-for-bit. */
  private val var1Oracle: String = {
    def sv(t: String, tag: String) =
      s"""sv$tag AS (SELECT n, nn, det, sa, sb, saa, sbb, sab,
              sy$t AS sy, say$t AS say, sby$t AS sby, syy$t AS syy,
              CASE WHEN det <> 0.0 THEN
                (sy$t * (saa * sbb - sab * sab) - sa * (say$t * sbb - sab * sby$t)
                  + sb * (say$t * sab - saa * sby$t)) / det END AS beta0,
              CASE WHEN det <> 0.0 THEN
                (nn * (say$t * sbb - sab * sby$t) - sy$t * (sa * sbb - sab * sb)
                  + sb * (sa * sby$t - say$t * sb)) / det END AS beta1,
              CASE WHEN det <> 0.0 THEN
                (nn * (saa * sby$t - say$t * sab) - sa * (sa * sby$t - say$t * sb)
                  + sy$t * (sa * sab - saa * sb)) / det END AS beta2
            FROM d)"""
    def readout(tag: String, eq: String) =
      s"""SELECT '$eq' AS equation, n,
            ROUND(beta0, 6) AS beta0, ROUND(beta1, 6) AS beta1, ROUND(beta2, 6) AS beta2,
            CASE WHEN det <> 0.0 AND (syy - sy * sy / nn) <> 0.0 THEN
              ROUND(1.0 - (syy - (beta0 * sy + beta1 * say + beta2 * sby))
                          / (syy - sy * sy / nn), 6) END AS r2,
            ROUND(beta0 + beta1 * lx + beta2 * ly, 6) AS f1
     FROM sv$tag CROSS JOIN lastobs"""
    s"""WITH cnt AS (SELECT date_trunc('day', ts) AS day,
            CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS BIGINT) AS x,
            CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS BIGINT) AS y
           FROM events WHERE event_type IN ('view', 'purchase') GROUP BY 1),
     bounds AS (SELECT MIN(day) AS mn, MAX(day) AS mx FROM cnt),
     sp AS (SELECT unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM bounds),
     s AS (SELECT sp.day, CAST(COALESCE(cnt.x, 0) AS DOUBLE) AS x,
                  CAST(COALESCE(cnt.y, 0) AS DOUBLE) AS y
           FROM sp LEFT JOIN cnt ON sp.day = cnt.day),
     l AS (SELECT x, y, LAG(x) OVER (ORDER BY day) AS xl, LAG(y) OVER (ORDER BY day) AS yl
           FROM s),
     b AS (SELECT CAST(FLOOR(x * 1e6 + 0.5) AS HUGEINT) AS tx,
                  CAST(FLOOR(y * 1e6 + 0.5) AS HUGEINT) AS ty,
                  CAST(FLOOR(xl * 1e6 + 0.5) AS HUGEINT) AS a,
                  CAST(FLOOR(yl * 1e6 + 0.5) AS HUGEINT) AS bb
           FROM l WHERE xl IS NOT NULL AND yl IS NOT NULL),
     m AS (SELECT CAST(COUNT(*) AS BIGINT) AS n,
                  SUM(a) AS sa0, SUM(bb) AS sb0,
                  SUM(a * a) AS saa0, SUM(bb * bb) AS sbb0, SUM(a * bb) AS sab0,
                  SUM(tx) AS syx0, SUM(a * tx) AS sayx0, SUM(bb * tx) AS sbyx0,
                  SUM(tx * tx) AS syyx0,
                  SUM(ty) AS syy0s, SUM(a * ty) AS sayy0, SUM(bb * ty) AS sbyy0,
                  SUM(ty * ty) AS syyy0
           FROM b),
     t AS (SELECT n, CAST(n AS DOUBLE) AS nn,
                  CAST(sa0 AS DOUBLE) / 1e6 AS sa, CAST(sb0 AS DOUBLE) / 1e6 AS sb,
                  CAST(saa0 AS DOUBLE) / 1e12 AS saa, CAST(sbb0 AS DOUBLE) / 1e12 AS sbb,
                  CAST(sab0 AS DOUBLE) / 1e12 AS sab,
                  CAST(syx0 AS DOUBLE) / 1e6 AS syx, CAST(sayx0 AS DOUBLE) / 1e12 AS sayx,
                  CAST(sbyx0 AS DOUBLE) / 1e12 AS sbyx, CAST(syyx0 AS DOUBLE) / 1e12 AS syyx,
                  CAST(syy0s AS DOUBLE) / 1e6 AS syy, CAST(sayy0 AS DOUBLE) / 1e12 AS sayy,
                  CAST(sbyy0 AS DOUBLE) / 1e12 AS sbyy, CAST(syyy0 AS DOUBLE) / 1e12 AS syyy
           FROM m),
     d AS (SELECT *,
             nn * (saa * sbb - sab * sab) - sa * (sa * sbb - sab * sb)
               + sb * (sa * sab - saa * sb) AS det
           FROM t),
     ${sv("x", "x")},
     ${sv("y", "y")},
     lastobs AS (SELECT x AS lx, y AS ly FROM s ORDER BY day DESC LIMIT 1)
     ${readout("x", "x")}
     UNION ALL
     ${readout("y", "y")}
     ORDER BY equation"""
  }

  /** Yule–Walker AR(2) + unrolled 3-step forecast over the q_acf series —
    * mirrors [[graft.operators.Temporal.arYuleWalker]]'s fixed IEEE
    * chains on exact integer sums bit-for-bit. */
  private val arForecastOracle: String =
    s"""WITH cnt AS (SELECT event_type, date_trunc('day', ts) AS day,
                CAST(COUNT(*) AS BIGINT) AS x FROM events GROUP BY 1, 2),
         bounds AS (SELECT event_type, MIN(day) AS mn, MAX(day) AS mx FROM cnt GROUP BY 1),
         sp AS (SELECT event_type, unnest(generate_series(mn, mx, INTERVAL 1 DAY)) AS day FROM bounds),
         s AS (SELECT sp.event_type, sp.day, COALESCE(cnt.x, 0) AS x
               FROM sp LEFT JOIN cnt ON sp.event_type = cnt.event_type AND sp.day = cnt.day),
         l AS (SELECT event_type, x,
                LAG(x, 1) OVER w AS l1, LAG(x, 2) OVER w AS l2,
                ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY day DESC) AS rn
               FROM s WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         a AS (SELECT event_type,
                CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(x) AS BIGINT) AS s1,
                CAST(SUM(x * x) AS BIGINT) AS s2,
                CAST(SUM(CASE WHEN l1 IS NOT NULL THEN x * l1 END) AS BIGINT) AS p1,
                CAST(SUM(CASE WHEN l1 IS NOT NULL THEN x END) AS BIGINT) AS a1,
                CAST(SUM(l1) AS BIGINT) AS b1,
                CAST(COUNT(l1) AS BIGINT) AS n1,
                CAST(SUM(CASE WHEN l2 IS NOT NULL THEN x * l2 END) AS BIGINT) AS p2,
                CAST(SUM(CASE WHEN l2 IS NOT NULL THEN x END) AS BIGINT) AS a2,
                CAST(SUM(l2) AS BIGINT) AS b2,
                CAST(COUNT(l2) AS BIGINT) AS n2,
                MAX(CASE WHEN rn = 1 THEN x END) AS xn,
                MAX(CASE WHEN rn = 2 THEN x END) AS xn1
               FROM l GROUP BY 1),
         m AS (SELECT *,
                CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE) AS mu,
                CAST(s2 AS DOUBLE) - CAST(n AS DOUBLE) * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                  * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) AS den
               FROM a),
         r AS (SELECT *,
                CASE WHEN den > 0 AND n1 > 0 THEN
                  (CAST(p1 AS DOUBLE) - mu * CAST(a1 AS DOUBLE) - mu * CAST(b1 AS DOUBLE)
                   + CAST(n1 AS DOUBLE) * mu * mu) / den END AS r1,
                CASE WHEN den > 0 AND n2 > 0 THEN
                  (CAST(p2 AS DOUBLE) - mu * CAST(a2 AS DOUBLE) - mu * CAST(b2 AS DOUBLE)
                   + CAST(n2 AS DOUBLE) * mu * mu) / den END AS r2
               FROM m),
         p AS (SELECT *,
                CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL AND 1.0 - r1 * r1 <> 0.0 THEN
                  r1 * (1.0 - r2) / (1.0 - r1 * r1) END AS phi1,
                CASE WHEN r1 IS NOT NULL AND r2 IS NOT NULL AND 1.0 - r1 * r1 <> 0.0 THEN
                  (r2 - r1 * r1) / (1.0 - r1 * r1) END AS phi2
               FROM r),
         c AS (SELECT *, mu * (1.0 - phi1 - phi2) AS cc FROM p),
         fa AS (SELECT *, cc + phi1 * CAST(xn AS DOUBLE) + phi2 * CAST(xn1 AS DOUBLE) AS ff1 FROM c),
         fb AS (SELECT *, cc + phi1 * ff1 + phi2 * CAST(xn AS DOUBLE) AS ff2 FROM fa),
         fc AS (SELECT *, cc + phi1 * ff2 + phi2 * ff1 AS ff3 FROM fb)
         SELECT event_type, n, ROUND(r1, 6) AS r1, ROUND(r2, 6) AS r2,
                ROUND(phi1, 6) AS phi1, ROUND(phi2, 6) AS phi2,
                ROUND(cc, 6) AS intercept,
                ROUND(ff1, 6) AS f1, ROUND(ff2, 6) AS f2, ROUND(ff3, 6) AS f3
         FROM fc ORDER BY event_type"""

  /** Durbin–Levinson unrolled to 7 fixed steps over the (rounded) acf
    * values — mirrors [[graft.operators.Temporal.pacf]]'s kernel op-for-op
    * (sequential left-assoc subtractions, den = 0 pins pacf 0). */
  private val pacfOracle: String = {
    val m = 7
    val rs = (1 to m).map(i => s"MAX(CASE WHEN lag = $i THEN acf END) AS r$i").mkString(",\n                ")
    val steps = (2 to m).map { kk =>
      val nm = s"r$kk" + (1 until kk).map(j => s" - f${kk - 1}_$j * r${kk - j}").mkString
      val dn = "1.0" + (1 until kk).map(j => s" - f${kk - 1}_$j * r$j").mkString
      val fs = (1 until kk).map(j =>
        s"f${kk - 1}_$j - p$kk * f${kk - 1}_${kk - j} AS f${kk}_$j").mkString(", ")
      val carryP = (1 until kk).map(j => s"p$j").mkString(", ")
      s""",
         t$kk AS (SELECT *, CASE WHEN ($dn) = 0 THEN 0.0 ELSE ($nm) / ($dn) END AS p$kk
                  FROM s${kk - 1}),
         s$kk AS (SELECT event_type, n, ${(1 to m).map(i => s"r$i").mkString(", ")},
                  $fs, p$kk AS f${kk}_$kk, $carryP, p$kk
                  FROM t$kk)"""
    }.mkString
    val finalRows = (1 to m).map { i =>
      s"SELECT event_type, n, CAST($i AS BIGINT) AS lag, ROUND(p$i, 6) AS pacf FROM s$m"
    }.mkString("\n         UNION ALL\n         ")
    acfCtes + s""",
         r AS (SELECT event_type, MAX(n) AS n,
                $rs
               FROM af GROUP BY 1 HAVING COUNT(acf) = $m),
         s1 AS (SELECT event_type, n, ${(1 to m).map(i => s"r$i").mkString(", ")},
                r1 AS f1_1, r1 AS p1 FROM r)$steps
         SELECT * FROM (
         $finalRows
         ) ORDER BY event_type, lag"""
  }

  /** Shared batch/stream calibration oracle — integer bin partials make
    * the streaming monitor equal the batch audit exactly. */
  private val calibrationOracle: String =
    """WITH mx AS (SELECT MAX(value) AS m FROM events),
         sc AS (SELECT value / m AS score, event_type FROM events, mx),
         b AS (SELECT LEAST(CAST(FLOOR(score * 10) AS BIGINT), 9) AS bin,
                CAST(FLOOR(score * 1e9 + 0.5) AS BIGINT) AS q,
                CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
               FROM sc),
         g AS (SELECT bin, CAST(COUNT(*) AS BIGINT) AS n,
                CAST(SUM(q) AS BIGINT) AS sq, CAST(SUM(pos) AS BIGINT) AS n_pos
               FROM b GROUP BY 1),
         t AS (SELECT CAST(SUM(n) AS BIGINT) AS nt FROM g)
         SELECT bin, n, n_pos,
                ROUND((CAST(sq AS DOUBLE) / n) / 1e9, 9) AS mean_score,
                ROUND(CAST(n_pos AS DOUBLE) / n, 9) AS obs_rate,
                ROUND((CAST(n AS DOUBLE) / nt) *
                      ABS((CAST(sq AS DOUBLE) / n) / 1e9 -
                          CAST(n_pos AS DOUBLE) / n), 9) AS ece_term
         FROM g, t ORDER BY bin"""

  /** Shared batch/stream JSD oracle — integer bin counts make the
    * streaming twin equal the batch path exactly. */
  private val jsDriftOracle: String =
    """WITH b AS (SELECT MIN(o_totalprice) AS lo,
                           (MAX(o_totalprice) - MIN(o_totalprice)) / 10 AS w
                    FROM orders WHERE o_orderdate < TIMESTAMP '1996-07-01'),
         base AS (SELECT GREATEST(CAST(LEAST(CASE WHEN b.w = 0 THEN 0
                                       ELSE FLOOR((o_totalprice - b.lo) / b.w) END, 9) AS BIGINT), 0) AS bin,
                         COUNT(*) AS n_base
                  FROM orders, b WHERE o_orderdate < TIMESTAMP '1996-07-01' GROUP BY 1),
         cur AS (SELECT GREATEST(CAST(LEAST(CASE WHEN b.w = 0 THEN 0
                                      ELSE FLOOR((o_totalprice - b.lo) / b.w) END, 9) AS BIGINT), 0) AS bin,
                        COUNT(*) AS n_cur
                 FROM orders, b WHERE o_orderdate >= TIMESTAMP '1996-07-01' GROUP BY 1),
         j AS (SELECT COALESCE(base.bin, cur.bin) AS bin,
                      COALESCE(n_base, 0) AS n_base, COALESCE(n_cur, 0) AS n_cur
               FROM base FULL OUTER JOIN cur ON base.bin = cur.bin),
         t AS (SELECT bin, n_base, n_cur,
                      CAST(n_base AS DOUBLE) / SUM(n_base) OVER () AS base_pct,
                      CAST(n_cur AS DOUBLE) / SUM(n_cur) OVER () AS cur_pct
               FROM j),
         m AS (SELECT bin, n_base, n_cur, base_pct, cur_pct,
                      (base_pct + cur_pct) / 2 AS m_pct FROM t)
         SELECT bin, CAST(n_base AS BIGINT) AS n_base, CAST(n_cur AS BIGINT) AS n_cur,
                ROUND(CASE WHEN base_pct > 0
                           THEN base_pct * LN(base_pct / m_pct) / 2 ELSE 0.0 END +
                      CASE WHEN cur_pct > 0
                           THEN cur_pct * LN(cur_pct / m_pct) / 2 ELSE 0.0 END, 9) AS js_term
         FROM m ORDER BY bin"""

  /** Shared batch/stream OHLC oracle: open/close are the values at the
    * (ts, event_id) order extremes — a selection, so the streaming
    * min_by/max_by twin lands on identical bits. */
  private val ohlcOracle: String =
    """WITH e AS (SELECT event_type, date_trunc('day', ts) AS day, ts, event_id, value,
                CAST(floor(value * 100 + 0.5) AS BIGINT) AS cents FROM events),
         r AS (SELECT *,
                row_number() OVER (PARTITION BY event_type, day ORDER BY ts, event_id) AS ra,
                row_number() OVER (PARTITION BY event_type, day ORDER BY ts DESC, event_id DESC) AS rd
               FROM e)
         SELECT event_type, day,
                MAX(CASE WHEN ra = 1 THEN value END) AS open,
                MAX(value) AS high,
                MIN(value) AS low,
                MAX(CASE WHEN rd = 1 THEN value END) AS close,
                CAST(COUNT(*) AS BIGINT) AS volume,
                CAST(SUM(cents) AS BIGINT) AS sum_value
         FROM r GROUP BY 1, 2 ORDER BY 1, 2"""

  /** q_kcore oracle: the peel iteration unrolled — each round recomputes
    * degrees and keeps nodes with degree ≥ k, replaying Graph.kCore's
    * fixed 4 rounds verbatim (extra rounds after the fixpoint are no-ops,
    * so early exit on the Spark side cannot diverge). */
  private val kCoreOracle: String = {
    val rounds = (0 until 4).map { i =>
      s"""d$i AS (SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
                FROM (SELECT a AS node FROM e$i UNION ALL SELECT b FROM e$i) GROUP BY 1),
         k$i AS (SELECT node FROM d$i WHERE degree >= 4),
         e${i + 1} AS (SELECT e.a, e.b FROM e$i e
                JOIN k$i x ON e.a = x.node JOIN k$i y ON e.b = y.node)"""
    }.mkString(",\n         ")
    s"""WITH li AS (SELECT l_orderkey AS k, l_partkey AS p FROM lineitem
                JOIN orders ON l_orderkey = o_orderkey
                WHERE o_orderdate >= TIMESTAMP '1996-01-01'
                  AND o_orderdate < TIMESTAMP '1996-07-01'),
         e0 AS (SELECT DISTINCT LEAST(a.p, b.p) AS a, GREATEST(a.p, b.p) AS b
                FROM li a JOIN li b ON a.k = b.k AND a.p <> b.p),
         $rounds
         SELECT node, CAST(COUNT(*) AS BIGINT) AS degree
         FROM (SELECT a AS node FROM e4 UNION ALL SELECT b FROM e4)
         GROUP BY 1 ORDER BY node"""
  }

  /** q_mst oracle: distinct weights make the MST unique, so the oracle
    * replays it with PRIM unrolled — 24 generated MATERIALIZED rounds
    * (25 nations), each picking the minimum (w, a, b)-ordered edge that
    * crosses the frontier; empty picks no-op, so a disconnected tail
    * cannot desync the rounds (Prim then spans node 0's component — the
    * gate graphs are connected at both SFs, asserted by the 24-edge
    * output). */
  private def mstOracle: String = {
    val rounds = (1 to 24).map { k =>
      s"""m$k AS MATERIALIZED (SELECT a, b, w FROM e
           WHERE (a IN (SELECT n FROM f${k - 1})) != (b IN (SELECT n FROM f${k - 1}))
           ORDER BY w, a, b LIMIT 1),
         f$k AS MATERIALIZED (SELECT n FROM f${k - 1} UNION
           SELECT CASE WHEN a IN (SELECT n FROM f${k - 1}) THEN b ELSE a END FROM m$k)"""
    }.mkString(",\n         ")
    val unions = (1 to 24).map(k => s"SELECT * FROM m$k").mkString(" UNION ALL ")
    s"""WITH e AS MATERIALIZED (
           SELECT LEAST(s.s_nationkey, c.c_nationkey) AS a,
                  GREATEST(s.s_nationkey, c.c_nationkey) AS b,
                  CAST(SUM(CAST(FLOOR(l.l_extendedprice * 100 + 0.5) AS BIGINT)) AS BIGINT) AS w
           FROM lineitem l
           JOIN supplier s ON l.l_suppkey = s.s_suppkey
           JOIN orders o ON l.l_orderkey = o.o_orderkey
           JOIN customer c ON o.o_custkey = c.c_custkey
           WHERE s.s_nationkey != c.c_nationkey
           GROUP BY 1, 2),
         f0 AS MATERIALIZED (SELECT MIN(a) AS n FROM e),
         $rounds
         SELECT CAST(a AS BIGINT) AS a, CAST(b AS BIGINT) AS b, w
         FROM ($unions) ORDER BY w, a, b"""
  }

  /** q_bleu oracle: one clipped-precision block per gram size (generated so
    * the four stay structurally identical), corpus totals, the exact
    * brevity-penalty exponent, and the same nested-sqrt geometric mean. */
  private def bleuOracle: String = {
    val blocks = (1 to 4).map { n =>
      s"""cg$n AS (SELECT pid, array_to_string(t[i : i + ${n - 1}], ' ') AS g,
                CAST(COUNT(*) AS BIGINT) AS cc FROM (
              SELECT pid, t, unnest(generate_series(1, greatest(len(t) - ${n - 1}, 0))) AS i
              FROM ct) GROUP BY 1, 2),
         rg$n AS (SELECT pid, array_to_string(t[i : i + ${n - 1}], ' ') AS g,
                CAST(COUNT(*) AS BIGINT) AS cr FROM (
              SELECT pid, t, unnest(generate_series(1, greatest(len(t) - ${n - 1}, 0))) AS i
              FROM rt) GROUP BY 1, 2),
         s$n AS (SELECT CAST(SUM(LEAST(COALESCE(cc, 0), COALESCE(cr, 0))) AS BIGINT) AS clip$n,
                CAST(SUM(COALESCE(cc, 0)) AS BIGINT) AS tot$n
              FROM cg$n FULL OUTER JOIN rg$n ON cg$n.pid = rg$n.pid AND cg$n.g = rg$n.g)"""
    }.mkString(",\n         ")
    def p(n: Int) = s"CAST(clip$n AS DOUBLE) / CAST(tot$n AS DOUBLE)"
    s"""WITH pairs AS (SELECT c.doc_id AS pid, c.text AS cand, r.text AS ref
              FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1),
         ct AS (SELECT pid, string_split(lower(cand), ' ') AS t FROM pairs),
         rt AS (SELECT pid, string_split(lower(ref), ' ') AS t FROM pairs),
         lens AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
                CAST(SUM(len(t)) AS BIGINT) AS c_len FROM ct),
         rlens AS (SELECT CAST(SUM(len(t)) AS BIGINT) AS r_len FROM rt),
         $blocks
         SELECT n_pairs, c_len, r_len,
                ROUND(LEAST(0.0, 1.0 - CAST(r_len AS DOUBLE) / CAST(c_len AS DOUBLE)), 6)
                  AS bp_exponent,
                ROUND(SQRT(SQRT(${p(1)} * ${p(2)} * ${p(3)} * ${p(4)})), 6) AS bleu_nobp,
                ROUND(${p(1)}, 6) AS p1, ROUND(${p(2)}, 6) AS p2,
                ROUND(${p(3)}, 6) AS p3, ROUND(${p(4)}, 6) AS p4
         FROM lens, rlens, s1, s2, s3, s4"""
  }

  /** q_chrf oracle: one clipped-F block per character-gram size; F_β
    * reassociated to the single division (1+β²)·clip/(β²·ref + tot) and
    * the macro mean the same left-to-right chain as the Spark side. */
  private def chrfOracle: String = {
    val blocks = (1 to 6).map { n =>
      s"""cg$n AS (SELECT pid, g, CAST(COUNT(*) AS BIGINT) AS cc FROM (
              SELECT pid, substring(t, i, $n) AS g FROM (
                SELECT pid, t, unnest(generate_series(1, length(t) - ${n - 1})) AS i
                FROM ct)) GROUP BY 1, 2),
         rg$n AS (SELECT pid, g, CAST(COUNT(*) AS BIGINT) AS cr FROM (
              SELECT pid, substring(t, i, $n) AS g FROM (
                SELECT pid, t, unnest(generate_series(1, length(t) - ${n - 1})) AS i
                FROM rt)) GROUP BY 1, 2),
         s$n AS (SELECT CAST(SUM(LEAST(COALESCE(cc, 0), COALESCE(cr, 0))) AS BIGINT) AS clip$n,
                CAST(SUM(COALESCE(cc, 0)) AS BIGINT) AS tot$n,
                CAST(SUM(COALESCE(cr, 0)) AS BIGINT) AS ref$n
              FROM cg$n FULL OUTER JOIN rg$n ON cg$n.pid = rg$n.pid AND cg$n.g = rg$n.g)"""
    }.mkString(",\n         ")
    def f(n: Int) =
      s"""(CASE WHEN (4.0 * CAST(COALESCE(ref$n, 0) AS DOUBLE)
                     + CAST(COALESCE(tot$n, 0) AS DOUBLE)) > 0.0
            THEN 5.0 * CAST(COALESCE(clip$n, 0) AS DOUBLE)
                 / (4.0 * CAST(COALESCE(ref$n, 0) AS DOUBLE)
                    + CAST(COALESCE(tot$n, 0) AS DOUBLE))
            ELSE 0.0 END)"""
    val mean = (1 to 6).map(f).mkString(" + ")
    s"""WITH pairs AS (SELECT c.doc_id AS pid, c.text AS cand, r.text AS ref
              FROM documents c JOIN documents r ON r.doc_id = c.doc_id + 1),
         ct AS (SELECT pid, replace(lower(cand), ' ', '') AS t FROM pairs),
         rt AS (SELECT pid, replace(lower(ref), ' ', '') AS t FROM pairs),
         np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs FROM pairs),
         $blocks
         SELECT n_pairs,
                ${(1 to 6).map(n => s"ROUND(${f(n)}, 6) AS f$n").mkString(", ")},
                ROUND(($mean) / 6.0, 6) AS chrf
         FROM np, s1, s2, s3, s4, s5, s6"""
  }

  /** Shared batch/stream oracle for the left-outer interval join: the cutoff
    * (max ts − 3601 s) keeps exactly the clicks whose outer-join state the
    * streaming twin provably evicts before end-of-stream. */
  private val intervalJoinOuterOracle: String =
    """WITH mx AS (SELECT LEAST(
             MAX(CASE WHEN event_type = 'click' THEN ts END),
             MAX(CASE WHEN event_type = 'purchase' THEN ts END)) AS m FROM events),
       c AS (SELECT event_id AS click_id, user_id, ts FROM events, mx
             WHERE event_type = 'click' AND ts <= m - INTERVAL 3601 SECONDS),
       p AS (SELECT event_id AS purchase_id, user_id, ts AS pts FROM events
             WHERE event_type = 'purchase')
       SELECT click_id, purchase_id
       FROM c LEFT JOIN p ON c.user_id = p.user_id
         AND pts >= c.ts AND pts <= c.ts + INTERVAL 1800 SECONDS
       ORDER BY click_id, purchase_id NULLS FIRST"""
}
