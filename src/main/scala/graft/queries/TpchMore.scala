package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.Tables

/** The rest of the TPC-H query shapes (Q2, Q7-Q9, Q11-Q22), adapted to the
  * fixture star schema (FIXTURES.md). The reference's Table-API dependency
  * declares the full relational surface (`/root/reference/study/pom.xml:147-166`);
  * these queries exercise the decision-support shapes the earlier q1/q3/q4/q5/
  * q6/q10 family left uncovered: correlated min/avg subqueries, HAVING against
  * a scalar subquery, multi-EXISTS anti-correlation, disjunctive predicate
  * pushdown, view + global-max selection, and outer-join count distributions.
  *
  * Schema adaptations (the fixture schema is TPC-H-ish, not TPC-H):
  *  - there is no `partsupp` table — where a shape needs one, the distinct
  *    (l_partkey, l_suppkey) pairs of `lineitem` serve as the part-supplier
  *    relationship (`psDerived`), with summed lineitem quantity standing in
  *    for ps_availqty;
  *  - missing columns (l_commitdate/l_receiptdate/l_shipmode, c_phone,
  *    p_container, ...) are substituted by existing ones with the same
  *    selectivity role; each substitution is noted on the query.
  *
  * Every query keeps the conventions of the registry: deterministic
  * total-order ORDER BY, round() on double aggregates, identical aliases to
  * the DuckDB oracle.
  */
object TpchMore {

  /** The part-supplier relationship derived from the fact table: stands in
    * for TPC-H `partsupp`. One shuffle; at 100 TB this is a groupBy on a
    * two-column key with map-side combine — the canonical way to derive a
    * relationship table from a fact table without a second source of truth. */
  private def psDerived(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .groupBy(col("l_partkey").as("ps_partkey"), col("l_suppkey").as("ps_suppkey"))
      .agg(sum("l_quantity").as("ps_availqty"))

  /** Q2 shape (minimum-cost supplier): for mid-size STANDARD parts, the
    * ASIA-region supplier(s) with the maximum account balance among that
    * part's suppliers (max stands in for min-cost; acctbal for supplycost).
    * The correlated "= (SELECT max(..) ... WHERE same part)" subquery is a
    * per-part window max — one shuffle on partkey, no self-join. Dimension
    * side (supplier⋈nation⋈region) is broadcast at any realistic SF. */
  def q2MinCostSupp(s: SparkSession, d: String): DataFrame = {
    val ps = psDerived(s, d)
    val p = Tables.part(s, d)
      .filter(col("p_type") === "STANDARD" && col("p_size").between(10, 20))
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter(col("r_name") === "ASIA")
    val joined = ps
      .join(p, ps("ps_partkey") === p("p_partkey"))
      .join(broadcast(sup.join(n, sup("s_nationkey") === n("n_nationkey"))
        .join(r, n("n_regionkey") === r("r_regionkey"))),
        ps("ps_suppkey") === col("s_suppkey"))
    val w = Window.partitionBy("p_partkey")
    joined
      .withColumn("__maxbal", max("s_acctbal").over(w))
      .filter(col("s_acctbal") === col("__maxbal"))
      .select(round(col("s_acctbal"), 2).as("s_acctbal"), col("s_name"),
        col("n_name"), col("p_partkey"))
      .orderBy(col("s_acctbal").desc, col("n_name"), col("s_name"), col("p_partkey"))
      .limit(100)
  }

  /** Q7 shape (volume shipping between two nations): revenue flowing between
    * supplier-nation and customer-nation pairs, by ship year. Two broadcast
    * dimension joins on either end of the lineitem⋈orders⋈customer chain;
    * the only fact-fact shuffles are orderkey and custkey. */
  def q7VolumeShipping(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1996-01-01") && col("l_shipdate") < lit("1998-01-01"))
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d)
    val n1 = Tables.nation(s, d).select(col("n_nationkey").as("n1_key"), col("n_name").as("supp_nation"))
    val n2 = Tables.nation(s, d).select(col("n_nationkey").as("n2_key"), col("n_name").as("cust_nation"))
    val sup = Tables.supplier(s, d)
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(broadcast(sup), li("l_suppkey") === sup("s_suppkey"))
      .join(broadcast(n1), col("s_nationkey") === col("n1_key"))
      .join(broadcast(n2), col("c_nationkey") === col("n2_key"))
      .filter((col("supp_nation") === "NATION_1" && col("cust_nation") === "NATION_2") ||
              (col("supp_nation") === "NATION_2" && col("cust_nation") === "NATION_1"))
      .groupBy(col("supp_nation"), col("cust_nation"),
        year(col("l_shipdate")).cast("bigint").as("l_year"))
      .agg(Exact.sumRound2(Exact.dec(col("l_extendedprice"))
        * Exact.dec(lit(1) - col("l_discount"))).as("revenue"))
      .orderBy("supp_nation", "cust_nation", "l_year")
  }

  /** Q8 shape (national market share): of all PROMO-part revenue sold to
    * AMERICA-region customers in 1996-97, the fraction supplied from
    * NATION_3, per order year. The share is a conditional-sum / sum ratio
    * computed in one aggregation pass over the joined fact. */
  def q8MarketShare(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).filter(col("p_type") === "PROMO")
    val o = Tables.orders(s, d)
      .filter(col("o_orderdate") >= lit("1996-01-01") && col("o_orderdate") < lit("1998-01-01"))
    val c = Tables.customer(s, d)
    val nCust = Tables.nation(s, d).select(col("n_nationkey").as("nc_key"), col("n_regionkey").as("nc_region"))
    val r = Tables.region(s, d).filter(col("r_name") === "AMERICA")
    val sup = Tables.supplier(s, d)
    val nSupp = Tables.nation(s, d).select(col("n_nationkey").as("ns_key"), col("n_name").as("supp_nation"))
    Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(nCust), col("c_nationkey") === col("nc_key"))
      .join(broadcast(r), col("nc_region") === col("r_regionkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nSupp), col("s_nationkey") === col("ns_key"))
      .groupBy(year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(round(
        sum(when(col("supp_nation") === "NATION_3",
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0)))
          / sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("mkt_share"))
      .orderBy("o_year")
  }

  /** Q9 shape (product-type profit): profit on 'widget' parts by supplier
    * nation and order year. No supplycost column exists, so profit =
    * discounted extended price (the grouping/join shape is what Q9 tests:
    * a 5-way join aggregated on a dimension attribute × a derived year).
    * The sum runs in DECIMAL space: the source doubles carry ≤2 decimal
    * digits, so decimal(18,4) recovers them exactly and the sum becomes
    * order-independent — a double sum over these many small groups lands
    * on a round(.,2) half-cent boundary often enough to flake the oracle
    * hash (observed in round 3). */
  def q9ProductProfit(s: SparkSession, d: String): DataFrame = {
    val p = Tables.part(s, d).filter(col("p_name").contains("widget"))
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val profit = col("l_extendedprice").cast("decimal(18,4)") *
      (lit(1).cast("decimal(18,4)") - col("l_discount").cast("decimal(18,4)"))
    Tables.lineitem(s, d)
      .join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(n), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"), year(col("o_orderdate")).cast("bigint").as("o_year"))
      .agg(round(sum(profit), 2).cast("double").as("sum_profit"))
      .orderBy(col("nation"), col("o_year").desc)
  }

  /** Q11 shape (important stock): per-part inventory value (derived availqty
    * × retail price) restricted to EUROPE-region suppliers, keeping parts
    * whose value exceeds 4× the average — HAVING against a scalar subquery
    * over the same aggregate. The scalar is one extra reduction, broadcast
    * back; the threshold is relative (× avg) so the query is scale-free. */
  def q11ImportantStock(s: SparkSession, d: String): DataFrame = {
    val sup = Tables.supplier(s, d)
    val n = Tables.nation(s, d)
    val r = Tables.region(s, d).filter(col("r_name") === "EUROPE")
    val euroSupp = broadcast(sup
      .join(n, sup("s_nationkey") === n("n_nationkey"))
      .join(r, n("n_regionkey") === r("r_regionkey"))
      .select(col("s_suppkey")))
    val p = Tables.part(s, d).select("p_partkey", "p_retailprice")
    val value = psDerived(s, d)
      .join(euroSupp, col("ps_suppkey") === col("s_suppkey"))
      .join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .groupBy(col("ps_partkey"))
      .agg(sum(col("ps_availqty") * col("p_retailprice")).as("__value"))
    val avgValue = value.agg(avg("__value").as("__avg"))
    value.crossJoin(broadcast(avgValue))
      .filter(col("__value") > col("__avg") * 4)
      .select(col("ps_partkey"), round(col("__value"), 2).as("stock_value"))
      .orderBy(col("stock_value").desc, col("ps_partkey"))
  }

  /** Q12 shape (shipping-priority lines): for 1997 lines shipped more than
    * 90 days after their order date ("late" — no commit/receipt dates exist),
    * count urgent-vs-other order priorities per return flag: the classic
    * join + dual conditional-count aggregation. */
  def q12LatePriority(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .filter(col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS"))
      .groupBy("l_returnflag")
      .agg(
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 1L).otherwise(0L)).as("high_line_count"),
        sum(when(col("o_orderpriority").isin("1-URGENT", "2-HIGH"), 0L).otherwise(1L)).as("low_line_count"))
      .orderBy("l_returnflag")

  /** Q13 shape (customer order-count distribution): LEFT join so zero-order
    * customers survive with count 0, then the distribution of counts. Two
    * shuffles (custkey, then the tiny count key) — the outer join is the
    * point: an inner join would silently drop the no-order bucket. */
  def q13CustDistribution(s: SparkSession, d: String): DataFrame = {
    val c = Tables.customer(s, d)
    val o = Tables.orders(s, d)
    c.join(o, c("c_custkey") === o("o_custkey"), "left")
      .groupBy(col("c_custkey"))
      .agg(count(col("o_orderkey")).as("c_count"))
      .groupBy(col("c_count"))
      .agg(count(lit(1)).as("custdist"))
      .orderBy(col("custdist").desc, col("c_count").desc)
  }

  /** Q14 shape (promo revenue): single-row percentage — conditional revenue
    * over total revenue for one ship month. Aggregation-only after a
    * broadcast part join; no shuffle of the ratio itself. */
  def q14PromoRevenue(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-09-01") && col("l_shipdate") < lit("1997-10-01"))
      .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
      .agg(round(
        sum(when(col("p_type") === "PROMO",
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(lit(0.0)))
          * 100.0 / sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4)
        .as("promo_revenue"))

  /** Q15 shape (top supplier): a revenue-per-supplier view over one quarter,
    * then the supplier(s) achieving the global maximum — the scalar-subquery
    * selection is a one-row broadcast join against the view, which Spark
    * reuses (same exchange) rather than recomputing. Revenue is rounded
    * before the max-comparison so both engines compare identical values. */
  def q15TopSupplier(s: SparkSession, d: String): DataFrame = {
    val revenue = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1997-04-01"))
      .groupBy(col("l_suppkey").as("supplier_no"))
      .agg(Exact.sumRound2(Exact.dec(col("l_extendedprice"))
        * Exact.dec(lit(1) - col("l_discount"))).as("total_revenue"))
    val maxRev = revenue.agg(max("total_revenue").as("__max"))
    revenue.crossJoin(broadcast(maxRev))
      .filter(col("total_revenue") === col("__max"))
      .join(broadcast(Tables.supplier(s, d)), col("supplier_no") === col("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("total_revenue"))
      .orderBy("s_suppkey")
  }

  /** Q16 shape (supplier count by part attribute): how many distinct
    * suppliers offer each (brand, type, size) combination, excluding one
    * brand and excluding "complaint" suppliers (negative account balance
    * stands in for the comment scan) via an anti join — the NOT IN shape. */
  def q16SupplierCnt(s: SparkSession, d: String): DataFrame = {
    val ps = psDerived(s, d)
    val p = Tables.part(s, d)
      .filter(col("p_brand") =!= "Brand#5" && col("p_type") =!= "PROMO" &&
        col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35))
    val complaints = Tables.supplier(s, d).filter(col("s_acctbal") < 0).select("s_suppkey")
    ps.join(broadcast(p), col("ps_partkey") === col("p_partkey"))
      .join(broadcast(complaints), col("ps_suppkey") === col("s_suppkey"), "left_anti")
      .groupBy("p_brand", "p_type", "p_size")
      .agg(countDistinct("ps_suppkey").as("supplier_cnt"))
      .orderBy(col("supplier_cnt").desc, col("p_brand"), col("p_type"), col("p_size"))
  }

  /** Q17 shape (small-quantity revenue): average yearly revenue lost if
    * Brand#1 orders below 50% of that part's average quantity were not
    * filled. The correlated per-part AVG subquery is a groupBy + broadcast
    * re-join (parts are dimension-sized), not a per-row subquery execution. */
  def q17SmallQtyRevenue(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d).filter(col("p_brand") === "Brand#1").select("p_partkey")
    val branded = li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
    val avgQty = branded.groupBy(col("l_partkey").as("aq_partkey"))
      .agg(avg("l_quantity").as("aq_avg"))
    branded.join(broadcast(avgQty), col("l_partkey") === col("aq_partkey"))
      .filter(col("l_quantity") < col("aq_avg") * 0.5)
      .agg(round(sum(Exact.dec(col("l_extendedprice"))).cast("double") / 7.0, 2)
        .as("avg_yearly"))
  }

  /** Q18 shape (large-volume customers): orders whose total quantity exceeds
    * a threshold (HAVING over the fact groupBy), joined back to orders and
    * customers. The heavy side aggregates BEFORE joining — at scale the
    * HAVING filter collapses the join input from |orders| to the few large
    * ones. */
  def q18LargeVolumeCust(s: SparkSession, d: String): DataFrame = {
    val bigOrders = Tables.lineitem(s, d)
      .groupBy(col("l_orderkey"))
      .agg(sum("l_quantity").as("sum_qty"))
      .filter(col("sum_qty") > 150)
    bigOrders
      .join(Tables.orders(s, d), col("l_orderkey") === col("o_orderkey"))
      .join(Tables.customer(s, d), col("o_custkey") === col("c_custkey"))
      .select(col("c_name"), col("c_custkey"), col("o_orderkey"),
        col("o_orderdate"), round(col("o_totalprice"), 2).as("o_totalprice"),
        round(col("sum_qty"), 2).as("sum_qty"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .limit(100)
  }

  /** Q19 shape (disjunctive predicate join): revenue for three disjoint
    * (brand, size-range, quantity-range) bands OR-ed together. Catalyst
    * pushes the common l_quantity bounds and the whole part-side disjunction
    * into the scans; the join stays a single broadcast-hash join rather than
    * three unioned passes. */
  def q19Disjunctive(s: SparkSession, d: String): DataFrame = {
    val li = Tables.lineitem(s, d)
    val p = Tables.part(s, d)
    li.join(broadcast(p), col("l_partkey") === col("p_partkey"))
      .filter(
        (col("p_brand") === "Brand#1" && col("p_size").between(1, 10) && col("l_quantity").between(1, 15)) ||
        (col("p_brand") === "Brand#2" && col("p_size").between(10, 25) && col("l_quantity").between(10, 25)) ||
        (col("p_brand") === "Brand#3" && col("p_size").between(20, 40) && col("l_quantity").between(25, 40)))
      .agg(Exact.sumRound2(Exact.dec(col("l_extendedprice"))
        * Exact.dec(lit(1) - col("l_discount"))).as("revenue"))
  }

  /** Q20 shape (excess inventory suppliers): suppliers holding more than 50%
    * of a widget part's 1997 shipped quantity (derived availqty vs the
    * correlated per-part demand sum). Nested IN subqueries become two
    * broadcast semi joins — part filter first, then the demand comparison. */
  def q20ExcessSupply(s: SparkSession, d: String): DataFrame = {
    val widgetParts = Tables.part(s, d)
      .filter(col("p_name").contains("widget")).select("p_partkey")
    val demand = Tables.lineitem(s, d)
      .filter(col("l_shipdate") >= lit("1997-01-01") && col("l_shipdate") < lit("1998-01-01"))
      .groupBy(col("l_partkey").as("dm_partkey"))
      .agg(sum("l_quantity").as("dm_qty"))
    val excess = psDerived(s, d)
      .join(broadcast(widgetParts), col("ps_partkey") === col("p_partkey"), "left_semi")
      .join(broadcast(demand), col("ps_partkey") === col("dm_partkey"))
      .filter(col("ps_availqty") > col("dm_qty") * 0.5)
      .select("ps_suppkey").distinct()
    Tables.supplier(s, d)
      .join(broadcast(excess), col("s_suppkey") === col("ps_suppkey"), "left_semi")
      .select("s_suppkey", "s_name")
      .orderBy("s_suppkey")
  }

  /** Q21 shape (suppliers who kept orders waiting): on finished multi-
    * supplier orders, the supplier whose line shipped late (>90 days after
    * the order date — no receipt/commit dates exist) while every OTHER
    * supplier on the order shipped on time: EXISTS(other supplier) AND NOT
    * EXISTS(other late supplier), i.e. a semi join plus an anti join on the
    * same key. */
  def q21WaitingSupplier(s: SparkSession, d: String): DataFrame = {
    val o = Tables.orders(s, d).filter(col("o_orderstatus") === "F")
    val li = Tables.lineitem(s, d)
      .join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("l_orderkey"), col("l_suppkey"),
        (col("l_shipdate") > col("o_orderdate") + expr("INTERVAL 90 DAYS")).as("late"))
    val l1 = li.filter(col("late"))
      .select(col("l_orderkey").as("o1"), col("l_suppkey").as("s1")).distinct()
    val others = li.select(col("l_orderkey").as("o2"), col("l_suppkey").as("s2")).distinct()
    val lateOthers = li.filter(col("late"))
      .select(col("l_orderkey").as("o3"), col("l_suppkey").as("s3")).distinct()
    val waiting = l1
      .join(others, col("o1") === col("o2") && col("s1") =!= col("s2"), "left_semi")
      .join(lateOthers, col("o1") === col("o3") && col("s1") =!= col("s3"), "left_anti")
    waiting
      .join(broadcast(Tables.supplier(s, d)), col("s1") === col("s_suppkey"))
      .groupBy("s_name")
      .agg(count(lit(1)).as("numwait"))
      .orderBy(col("numwait").desc, col("s_name"))
      .limit(10)
  }

  /** Q22 shape (global sales opportunity): well-funded customers (balance
    * above the positive-balance average of their segment group) who never
    * ordered — scalar subquery + anti join, grouped by segment (which stands
    * in for the phone country code). */
  def q22GlobalSalesOpp(s: SparkSession, d: String): DataFrame = {
    val segs = Seq("MACHINERY", "FURNITURE", "BUILDING")
    val c = Tables.customer(s, d).filter(col("c_mktsegment").isin(segs: _*))
    val avgBal = c.filter(col("c_acctbal") > 0).agg(avg("c_acctbal").as("__avg"))
    c.crossJoin(broadcast(avgBal))
      .filter(col("c_acctbal") > col("__avg"))
      .join(Tables.orders(s, d), col("c_custkey") === col("o_custkey"), "left_anti")
      .groupBy(col("c_mktsegment"))
      .agg(count(lit(1)).as("numcust"), round(sum("c_acctbal"), 2).as("totacctbal"))
      .orderBy("c_mktsegment")
  }
}
