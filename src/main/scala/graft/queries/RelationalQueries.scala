package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY §2.11: everything Catalyst supplies
  * for free — aggregation, joins incl. broadcast/semi/anti, windows,
  * rollup, distinct, set ops, top-k, scalar functions).
  *
  * Determinism rules shared with the DuckDB oracles:
  *  - money sums go through `round(x*100)` → BIGINT cents (exact int
  *    arithmetic; never order-dependent double accumulation)
  *  - every query ends in a total ORDER BY
  *  - limits always have a unique tie-break key
  */
object RelationalQueries {
  import Tables._

  private def cents(c: org.apache.spark.sql.Column) =
    round(c * 100).cast("bigint")

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    // TPC-H Q1 shape: full-scan partial-agg; map-side combine keeps the
    // shuffle at |groups| not |rows| — the plan that survives 100 TB.
    "q1_pricing" -> ((s, d) => {
      lineitem(s, d)
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum("l_quantity").cast("bigint").as("sum_qty"),
          sum(cents(col("l_extendedprice"))).as("price_cents"),
          sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
            .as("disc_price_cents"),
          count(lit(1)).as("cnt"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // top-k with deterministic tie-break: sort + limit (TakeOrderedAndProject
    // physical op — no full sort at scale)
    "q2_top_orders" -> ((s, d) => {
      orders(s, d)
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("total_cents"))
        .orderBy(desc("total_cents"), asc("o_orderkey"))
        .limit(10)
    }),

    // 3-way join: orders⋈customer broadcast-able at small SF, lineitem fact
    // stays partitioned; group on dims only
    "q3_revenue" -> ((s, d) => {
      val l = lineitem(s, d)
      val o = orders(s, d)
      val c = customer(s, d)
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .groupBy(col("c_mktsegment"), year(col("o_orderdate")).as("order_year"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"),
          count(lit(1)).as("n_items"))
        .orderBy("c_mktsegment", "order_year")
    }),

    // broadcast dim chain: customer⋈nation⋈region, both dims broadcast
    "q4_region_stats" -> ((s, d) => {
      val c = customer(s, d)
      val n = nation(s, d)
      val r = region(s, d)
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy("r_name")
        .agg(count(lit(1)).as("n_customers"),
          sum(cents(col("c_acctbal"))).as("acctbal_cents"))
        .orderBy("r_name")
    }),

    // window functions: rank orders per customer (row_number, top 3)
    "q5_window_rank" -> ((s, d) => {
      val w = Window.partitionBy("o_custkey")
        .orderBy(desc("total_cents"), asc("o_orderkey"))
      orders(s, d)
        .select(col("o_custkey"), col("o_orderkey"),
          cents(col("o_totalprice")).as("total_cents"))
        .withColumn("rk", row_number().over(w))
        .filter(col("rk") <= 3)
        .orderBy("o_custkey", "rk")
    }),

    // grouping sets / rollup with sentinel labels (null-ordering-proof)
    "q6_rollup" -> ((s, d) => {
      lineitem(s, d)
        .rollup("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").cast("bigint").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("cnt"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    }),

    // distinct aggregation
    "q7_distinct" -> ((s, d) => {
      orders(s, d)
        .groupBy("o_orderstatus")
        .agg(countDistinct("o_custkey").as("n_custs"),
          count(lit(1)).as("n_orders"))
        .orderBy("o_orderstatus")
    }),

    // anti join: customers with no big-ticket orders, counted per nation
    // (filter pushed below the join build side)
    "q8_no_orders" -> ((s, d) => {
      val c = customer(s, d)
      val o = orders(s, d).filter(col("o_totalprice") > 300000)
        .select(col("o_custkey"))
      c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
        .groupBy("c_nationkey")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy("c_nationkey")
    }),

    // semi join: brands having a high-quantity lineitem
    "q9_hot_brands" -> ((s, d) => {
      val p = part(s, d)
      val l = lineitem(s, d).filter(col("l_quantity") >= 45)
        .select(col("l_partkey"))
      p.join(l, p("p_partkey") === l("l_partkey"), "left_semi")
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_parts"))
        .orderBy("p_brand")
    }),

    // set operations: INTERSECT / EXCEPT on user activity
    "q10_setops" -> ((s, d) => {
      val e = events(s, d)
      val buyers = e.filter(col("event_type") === "purchase").select("user_id").distinct()
      val errorers = e.filter(col("event_type") === "error").select("user_id").distinct()
      val signups = e.filter(col("event_type") === "signup").select("user_id").distinct()
      buyers.intersect(errorers).except(signups.filter(col("user_id") % 7 === 0))
        .orderBy("user_id")
    }),

    // scalar function battery: string/math/conditional
    "q11_scalars" -> ((s, d) => {
      part(s, d).select(
        col("p_partkey"),
        upper(substring(col("p_name"), 1, 5)).as("name5"),
        length(col("p_name")).as("name_len"),
        (col("p_size") % 7).as("size_mod7"),
        concat_ws("|", col("p_brand"), col("p_type")).as("brand_type"),
        when(col("p_retailprice") > 1500, "premium")
          .when(col("p_retailprice") > 1000, "standard")
          .otherwise("budget").as("tier"),
        cents(col("p_retailprice")).as("price_cents"))
        .orderBy("p_partkey")
    }),

    // as-of join (no native Spark equivalent — graft.operators
    // RelationalExt union+window formulation, one shuffle): each error
    // event matched to the user's most recent purchase at-or-before it
    "q13_asof" -> ((s, d) => {
      val e = events(s, d)
      val errors = e.filter(col("event_type") === "error")
      val purchases = e.filter(col("event_type") === "purchase")
      graft.operators.RelationalExt.asOfJoin(
        errors, purchases, keys = Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        rightPayload = Seq("event_id", "value"), prefix = "p_",
        rightTiebreak = Some("event_id"))
        .select(col("event_id"), col("user_id"),
          col("p_event_id").as("purchase_id"),
          cents(col("p_value")).as("purchase_cents"))
        .orderBy("event_id")
    }),

    // banded range join (bucketed interval join — cost |left|·density,
    // not |left|·|right|): purchases within the hour before each error
    "q14_range" -> ((s, d) => {
      val e = events(s, d)
      val errors = e.filter(col("event_type") === "error")
        .select(col("event_id"), col("user_id"), col("ts"))
      val purchases = e.filter(col("event_type") === "purchase")
        .select(col("event_id"), col("user_id"), col("ts"))
      graft.operators.RelationalExt.rangeJoin(
        errors, purchases, keys = Seq("user_id"),
        leftTime = "ts", rightTime = "ts",
        before = 3600L * 1000000000L, after = 0L,
        rightPayload = Seq("event_id"), prefix = "p_")
        .select(col("event_id").as("error_id"), col("p_event_id").as("purchase_id"))
        .orderBy("error_id", "purchase_id")
    }),

    // TPC-H Q7 shape: 5-way join chain, fact partitioned, all dims
    // broadcast; nation joined twice under different roles
    "q17_nation_trade" -> ((s, d) => {
      val l = lineitem(s, d)
      val sup = supplier(s, d)
      val o = orders(s, d)
      val c = customer(s, d)
      val sn = nation(s, d).select(col("n_nationkey").as("s_nkey"),
        col("n_name").as("supp_nation"))
      val cn = nation(s, d).select(col("n_nationkey").as("c_nkey"),
        col("n_name").as("cust_nation"))
      l.join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(sn), col("s_nationkey") === col("s_nkey"))
        .join(broadcast(cn), col("c_nationkey") === col("c_nkey"))
        .groupBy("supp_nation", "cust_nation")
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"), count(lit(1)).as("n_items"))
        .orderBy("supp_nation", "cust_nation")
    }),

    // TPC-H Q18 shape: group-having subquery joined back to the fact
    "q18_big_orders" -> ((s, d) => {
      val l = lineitem(s, d)
      val big = l.groupBy("l_orderkey")
        .agg(sum("l_quantity").cast("bigint").as("total_qty"))
        .filter(col("total_qty") > 150)
      orders(s, d).join(big, col("o_orderkey") === big("l_orderkey"))
        .select(col("o_orderkey"), col("o_custkey"),
          cents(col("o_totalprice")).as("total_cents"), col("total_qty"))
        .orderBy("o_orderkey")
    }),

    // exact median via window rank (no approx sketches — deterministic
    // for oracle parity; quantities are integral doubles)
    "q15_median" -> ((s, d) => {
      val w = Window.partitionBy("l_returnflag")
        .orderBy("l_quantity", "l_orderkey", "l_linenumber")
      lineitem(s, d)
        .select(col("l_returnflag"), col("l_quantity"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(w))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
        .filter(col("rn") === expr("(n+1) div 2") || col("rn") === expr("(n+2) div 2"))
        .groupBy("l_returnflag")
        .agg((sum("l_quantity") / count(lit(1))).as("median_qty"),
          max("n").as("n"))
        .orderBy("l_returnflag")
    }),

    // TPC-H Q17 shape (small-quantity revenue): a correlated scalar
    // subquery — avg quantity per part — expressed Spark-first as a
    // per-part aggregate joined back to the fact. The comparison
    // `qty < 0.2·avg` is cross-multiplied to exact integers
    // (5·qty·cnt < sum) so no float threshold wobbles the row set.
    // Both sides shuffle on l_partkey once; the part filter broadcasts.
    "q27_small_qty" -> ((s, d) => {
      val li = lineitem(s, d)
      val parts = part(s, d).filter(col("p_size") <= 15)
        .select("p_partkey", "p_brand")
      val perPart = li.groupBy("l_partkey").agg(
        sum(col("l_quantity").cast("bigint")).as("sum_qty"),
        count(lit(1)).as("cnt_p"))
      li.join(perPart, "l_partkey")
        .filter(col("l_quantity").cast("bigint") * 5 * col("cnt_p") <
          col("sum_qty"))
        .join(broadcast(parts), col("l_partkey") === col("p_partkey"))
        .groupBy("p_brand")
        .agg(count(lit(1)).as("n_small"),
          sum(cents(col("l_extendedprice"))).as("lost_cents"))
        .withColumn("avg_yearly_cents", expr("lost_cents div 7"))
        .orderBy("p_brand")
    }),

    // TPC-H Q5 shape (local supplier volume): the 6-table join. customer
    // and supplier SCALE with the corpus, so they join by shuffle (AQE
    // may still broadcast them while they fit — the plan must not force
    // it); nation/region are fixed-size dims and broadcast explicitly.
    // The co-location predicate (customer and supplier share a nation)
    // prunes join output, not scans. Revenue in exact cents per nation.
    "q29_local_volume" -> ((s, d) => {
      val li = lineitem(s, d).select("l_orderkey", "l_suppkey",
        "l_extendedprice", "l_discount")
      val ord = orders(s, d).filter(year(col("o_orderdate")) === 1996)
        .select("o_orderkey", "o_custkey")
      val cust = customer(s, d).select("c_custkey", "c_nationkey")
      val supp = supplier(s, d).select("s_suppkey", "s_nationkey")
      val nat = nation(s, d).select("n_nationkey", "n_name", "n_regionkey")
      val reg = region(s, d).filter(col("r_name").isin("AMERICA", "ASIA"))
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(cust, col("o_custkey") === col("c_custkey"))
        .join(supp, col("l_suppkey") === col("s_suppkey") &&
          col("c_nationkey") === col("s_nationkey"))
        .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("n_name"))
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"), count(lit(1)).as("n_items"))
        .orderBy(desc("revenue_cents"), col("n_name"))
    }),

    // TPC-H Q14 shape (promo revenue share): conditional aggregation —
    // one scan-join, two sums from the same rows via CASE, the percent
    // as integer basis points (exact cross-multiplied division).
    "q30_promo_share" -> ((s, d) => {
      val li = lineitem(s, d).select("l_partkey", "l_extendedprice",
        "l_discount", "l_shipdate")
      val p = part(s, d).select("p_partkey", "p_type")
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      li.filter(year(col("l_shipdate")) === 1996)
        .join(p, col("l_partkey") === col("p_partkey"))
        .groupBy(month(col("l_shipdate")).as("ship_month"))
        .agg(sum(when(col("p_type") === "PROMO", rev).otherwise(lit(0L)))
          .as("promo_cents"),
          sum(rev).as("total_cents"))
        .withColumn("promo_bps",
          expr("(promo_cents * 10000) div total_cents"))
        .orderBy("ship_month")
    }),

    // TPC-H Q19 shape (disjunctive predicates): an OR of conjunction
    // arms over part × lineitem attributes. The arms push to the join
    // output as ONE predicate (no union of three scans) while the shared
    // p_partkey equality stays the single join key.
    "q31_disjunctive" -> ((s, d) => {
      val li = lineitem(s, d).select("l_partkey", "l_quantity",
        "l_extendedprice", "l_discount")
      val p = part(s, d).select("p_partkey", "p_brand", "p_size")
      val arm1 = col("p_brand") === "Brand#12" && col("p_size") <= 5 &&
        col("l_quantity") >= 1 && col("l_quantity") <= 11
      val arm2 = col("p_brand") === "Brand#23" && col("p_size") <= 10 &&
        col("l_quantity") >= 10 && col("l_quantity") <= 20
      val arm3 = col("p_brand") === "Brand#34" && col("p_size") <= 15 &&
        col("l_quantity") >= 20 && col("l_quantity") <= 30
      li.join(p, col("l_partkey") === col("p_partkey"))
        .filter(arm1 || arm2 || arm3)
        .agg(sum(cents(col("l_extendedprice") * (lit(1.0) - col("l_discount"))))
          .as("revenue_cents"), count(lit(1)).as("n_items"))
    }),

    // TPC-H Q4 shape (priority counts with EXISTS): orders having at
    // least one returned lineitem, counted per priority — the
    // left-semi-join + aggregate composition (never a row-multiplying
    // inner join feeding a distinct).
    "q32_priority_exists" -> ((s, d) => {
      val returned = lineitem(s, d).filter(col("l_returnflag") === "R")
        .select("l_orderkey")
      orders(s, d)
        .join(returned, col("o_orderkey") === col("l_orderkey"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy("o_orderpriority")
    }),

    // exact multi-quantile (p25/p50/p75/p90) per group via window ranks —
    // the deterministic discrete quantile (smallest value with
    // rn = ceil(p·n)); integer rank targets, no interpolation, no approx
    // sketches. One window partition per group (the scale unit).
    "q28_quantiles" -> ((s, d) => {
      // Shape note (r15): a distributed globalRank formulation (range
      // sort + zipWithIndex, no per-group window task) was measured
      // here and LOST — the range partitioner's sampling pass plus the
      // RDD row round-trip cost more than the 3-group window sort at
      // bench scale (2.36 s -> 2.9–3.6 s). The window stays; at a
      // cardinality where one group outgrows a task, Dedup.globalRank
      // is the drop-in replacement (see the hot-bucket rank).
      val w = Window.partitionBy("l_returnflag")
        .orderBy("price_cents", "l_orderkey", "l_linenumber")
      lineitem(s, d)
        .select(col("l_returnflag"), cents(col("l_extendedprice")).as("price_cents"),
          col("l_orderkey"), col("l_linenumber"))
        .withColumn("rn", row_number().over(w).cast("bigint"))
        .withColumn("n", count(lit(1)).over(Window.partitionBy("l_returnflag")))
        .select(col("l_returnflag"), col("price_cents"), col("rn"), col("n"),
          explode(array(lit(25L), lit(50L), lit(75L), lit(90L))).as("pq"))
        .filter(col("rn") === expr("(n * pq + 99) div 100"))
        .select("l_returnflag", "pq", "price_cents")
        .orderBy("l_returnflag", "pq")
    }),

    // cube grouping sets (all 4 combinations)
    "q16_cube" -> ((s, d) => {
      lineitem(s, d)
        .cube("l_returnflag", "l_linestatus")
        .agg(count(lit(1)).as("cnt"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("cnt"))
        .orderBy("returnflag", "linestatus")
    }),

    // date/time functions over orders
    "q12_dates" -> ((s, d) => {
      orders(s, d).select(
        col("o_orderkey"),
        year(col("o_orderdate")).as("y"),
        month(col("o_orderdate")).as("m"),
        dayofmonth(col("o_orderdate")).as("dom"),
        date_format(col("o_orderdate"), "yyyy-MM-dd").as("day_str"))
        .filter(col("y") === 1995)
        .orderBy("o_orderkey")
    }),

    // TPC-H Q8 shape: market share — 6-way join (nation twice under
    // different roles, region filter), conditional-vs-total aggregation
    // per year; all dims broadcast, the one fact-fact join partitioned
    "q19_market_share" -> ((s, d) => {
      val l = lineitem(s, d)
      val o = orders(s, d)
      val c = customer(s, d)
      val sup = supplier(s, d)
      val cn = nation(s, d).select(col("n_nationkey").as("cn_key"),
        col("n_regionkey").as("cn_region"))
      val r = region(s, d).filter(col("r_name") === "ASIA")
      val sn = nation(s, d).select(col("n_nationkey").as("sn_key"),
        col("n_name").as("supp_nation"))
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .join(broadcast(cn), c("c_nationkey") === col("cn_key"))
        .join(broadcast(r), col("cn_region") === r("r_regionkey"))
        .join(broadcast(sup), l("l_suppkey") === sup("s_suppkey"))
        .join(broadcast(sn), sup("s_nationkey") === col("sn_key"))
        .groupBy(year(col("o_orderdate")).as("o_year"))
        .agg(
          sum(when(col("supp_nation") === "NATION_3", rev).otherwise(0L))
            .as("nation_cents"),
          sum(rev).as("total_cents"))
        .withColumn("mkt_share",
          col("nation_cents") * lit(1.0) / col("total_cents"))
        .orderBy("o_year")
    }),

    // TPC-H Q21 shape: exists/not-exists as semi-join + uniqueness test —
    // suppliers who were the SOLE latest shipper on a multi-supplier
    // order. The fact is hash-partitioned on l_orderkey ONCE; every
    // orderkey-keyed step after it (both groupBys, the join, the
    // distinct, the semi join) reuses that clustering — a HashPartitioning
    // on a key satisfies any grouping that includes the key — so the
    // whole exists/not-exists chain costs one fact shuffle plus the
    // final per-supplier aggregation. No correlated per-row subqueries.
    "q20_waiting_supplier" -> ((s, d) => {
      // One fact shuffle, zero fact self-joins: collapse lines to
      // per-(order, supplier) max-ship rows first (the repartition's
      // orderkey clustering satisfies the grouping), then derive the
      // order-level facts — order max ship, supplier count, at-max
      // supplier count — as partition-frame windows over those collapsed
      // rows. The previous join formulation referenced the fact three
      // times (exists + uniqueness as groupBy⋈join⋈semi-join), which
      // planned THREE lineitem scans and rebuilt the aggregation chain
      // inside the semi join's broadcast subtree; the window form keeps
      // the whole exists/not-exists derivation in the single
      // orderkey-clustered stage. Semantics unchanged: a collapsed row
      // sits at the order max iff any of its lines did, n_supp =
      // countDistinct(l_suppkey) = count of collapsed rows, and "sole
      // latest shipper" = exactly one collapsed row at the max.
      val per = lineitem(s, d)
        .select("l_orderkey", "l_suppkey", "l_shipdate")
        .filter(col("l_suppkey").isNotNull)
        .repartition(col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(max("l_shipdate").as("sup_max"))
      val w = Window.partitionBy("l_orderkey")
      per
        .withColumn("max_ship", max("sup_max").over(w))
        .withColumn("n_supp", count(lit(1)).over(w))
        .withColumn("n_max",
          sum(when(col("sup_max") === col("max_ship"), 1L).otherwise(0L))
            .over(w))
        .filter(col("n_supp") >= 2 && col("sup_max") === col("max_ship") &&
          col("n_max") === 1)
        .groupBy("l_suppkey").agg(count(lit(1)).as("numwait"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_name"), col("numwait"))
        .orderBy(desc("numwait"), col("s_name"))
        .limit(20)
    }),

    // TPC-H Q22 shape: scalar "above global average" filter + anti join
    // against a filtered fact (no high-value order). The average is
    // compared by integer cross-multiplication (bal_cents·n > sum_cents)
    // — exact, no double-average drift; the anti-join's filter is pushed
    // into the orders scan.
    "q21_idle_customers" -> ((s, d) => {
      val c = customer(s, d)
      val posAvg = c.filter(col("c_acctbal") > 0)
        .agg(sum(cents(col("c_acctbal"))).as("pos_sum"),
          count(lit(1)).as("pos_n"))
      val bigOrders = orders(s, d).filter(col("o_totalprice") > 300000)
      c.crossJoin(broadcast(posAvg))
        .filter(cents(col("c_acctbal")) * col("pos_n") > col("pos_sum"))
        .join(bigOrders, col("c_custkey") === col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(count(lit(1)).as("n_cust"),
          sum(cents(col("c_acctbal"))).as("bal_cents"))
        .orderBy("c_mktsegment")
    }),

    // TPC-H Q11 shape: GROUP totals filtered against a fraction of the
    // GLOBAL total (HAVING over aggregates vs a scalar subquery). The
    // global total is a one-row broadcast; the group side is one
    // partial-aggregated shuffle on the group key. Integer cents make
    // the 4% threshold exact: total*25 > global (no float division).
    "q22_nation_balance" -> ((s, d) => {
      val perNation = supplier(s, d)
        .join(broadcast(nation(s, d)),
          col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(sum(cents(col("s_acctbal"))).as("bal_cents"))
      val global = perNation.agg(sum("bal_cents").as("global_cents"))
      perNation.crossJoin(broadcast(global))
        .filter(col("bal_cents") * 25 > col("global_cents"))
        .select("n_name", "bal_cents")
        .orderBy(desc("bal_cents"), col("n_name"))
    }),

    // Tumbling-window event aggregation: 10-minute windows per event
    // type — the batch form of the streaming windowed aggregate, as pure
    // integer bucket arithmetic on the nanosecond timestamps (engine-
    // exact; the window id IS floor(ts / width)). One partial-aggregated
    // shuffle on (type, window).
    "q23_event_windows" -> ((s, d) => {
      events(s, d)
        .withColumn("win_id", expr("ts div 600000000000"))
        .groupBy("event_type", "win_id")
        .agg(count(lit(1)).as("n_events"),
          sum(cents(col("value"))).as("value_cents"),
          countDistinct("user_id").as("n_users"))
        .orderBy("event_type", "win_id")
    }),

    // GROUPING SETS with an ASYMMETRIC set list — ((rf,ls),(ls),()) is
    // neither a rollup nor a cube, the shape reporting queries actually
    // use. Spark expands to one Expand + a single partial-aggregated
    // shuffle, same as rollup/cube.
    "q24_grouping_sets" -> ((s, d) => {
      lineitem(s, d)
        .groupingSets(
          Seq(Seq(col("l_returnflag"), col("l_linestatus")),
            Seq(col("l_linestatus")), Seq()),
          col("l_returnflag"), col("l_linestatus"))
        .agg(count(lit(1)).as("cnt"), sum("l_quantity").cast("bigint").as("sum_qty"))
        .select(
          coalesce(col("l_returnflag"), lit("ALL")).as("returnflag"),
          coalesce(col("l_linestatus"), lit("ALL")).as("linestatus"),
          col("cnt"), col("sum_qty"))
        .orderBy("returnflag", "linestatus")
    }),

    // PIVOT: per-order-year revenue by order status. Spark's pivot with
    // EXPLICIT values compiles to one conditional aggregation — no
    // second distinct-values job, which at 100 TB would be an extra full
    // scan just to learn the column list; missing cells coalesce to 0.
    "q25_pivot" -> ((s, d) => {
      orders(s, d)
        .withColumn("yr", year(col("o_orderdate")))
        .withColumn("c", cents(col("o_totalprice")))
        .groupBy("yr")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(sum("c"))
        .select(col("yr"),
          coalesce(col("F"), lit(0L)).as("f_cents"),
          coalesce(col("O"), lit(0L)).as("o_cents"),
          coalesce(col("P"), lit(0L)).as("p_cents"))
        .orderBy("yr")
    }),

    // Rolling 7-day per-user spend over the event stream — a RANGE-frame
    // window (time-interval preceding .. current row), the sliding-
    // aggregate shape behavioral dashboards use. One shuffle on user_id;
    // the frame is a sliding accumulator within each partition, never a
    // self-join. (ts is epoch nanos here — see TESTDATA.md on NANOS.)
    "q26_rolling" -> ((s, d) => {
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("user_id").orderBy("ts")
        .rangeBetween(-7L * 86400L * 1000000000L, 0L)
      events(s, d)
        .withColumn("c", cents(col("value")))
        .withColumn("roll_cents", sum("c").over(w))
        .select(col("event_id"), col("user_id"), col("roll_cents"))
        .orderBy("event_id")
    }),

    // TPC-H Q13 shape (customer order-count distribution): LEFT OUTER
    // join so zero-order customers survive into the c_count=0 bucket.
    // The orders-side filter belongs to the JOIN (outer-join semantics),
    // so it's applied to the right side BEFORE the join and pushes into
    // the orders scan; both sides shuffle on custkey once, and the
    // distribution re-aggregation is |distinct counts| rows.
    "q33_custdist" -> ((s, d) => {
      val c = customer(s, d).select("c_custkey")
      val o = orders(s, d).filter(col("o_orderstatus") =!= "P")
        .select("o_custkey", "o_orderkey")
      c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
        .groupBy(c("c_custkey"))
        .agg(count(col("o_orderkey")).as("c_count"))
        .groupBy("c_count")
        .agg(count(lit(1)).as("custdist"))
        .orderBy(desc("custdist"), desc("c_count"))
    }),

    // TPC-H Q15 shape (top supplier by quarterly revenue): per-supplier
    // aggregate compared against the GLOBAL max — a one-row broadcast,
    // and the equality is on exact integer cents so "all ties win" is
    // deterministic (no float-max drift). One fact shuffle on suppkey.
    "q34_top_supplier" -> ((s, d) => {
      val rev = cents(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      val perSupp = lineitem(s, d)
        .filter(year(col("l_shipdate")) === 1996 &&
          month(col("l_shipdate")) <= 3)
        .groupBy("l_suppkey")
        .agg(sum(rev).as("total_cents"))
      val mx = perSupp.agg(max("total_cents").as("max_cents"))
      perSupp.crossJoin(broadcast(mx))
        .filter(col("total_cents") === col("max_cents"))
        .join(broadcast(supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .select(col("s_suppkey"), col("s_name"), col("total_cents"))
        .orderBy("s_suppkey")
    }),

    // TPC-H Q12 shape (shipping-priority buckets): one scan-join with
    // BOTH counts from the same rows via CASE — never two scans or a
    // pivot job; group keys are low-cardinality so the agg shuffle is
    // tiny and map-side combined.
    "q35_ship_priority" -> ((s, d) => {
      val li = lineitem(s, d).filter(year(col("l_shipdate")) === 1996)
        .select("l_orderkey", "l_linestatus")
      val o = orders(s, d).select("o_orderkey", "o_orderpriority")
      val high = col("o_orderpriority").isin("1-URGENT", "2-HIGH")
      li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy("l_linestatus")
        .agg(sum(when(high, 1L).otherwise(0L)).as("high_line_count"),
          sum(when(!high, 1L).otherwise(0L)).as("low_line_count"))
        .orderBy("l_linestatus")
    }),

    // ntile equal-frequency bucketing (quartiles of order value per
    // priority class): one window partition per priority — the scale
    // unit, same contract as q28 — with a unique tie-break so bucket
    // assignment is deterministic on both engines; the output is the
    // 4-row-per-group histogram (count + bucket bounds).
    "q36_ntile" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("total_cents"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_orderpriority"), col("o_orderkey"),
          cents(col("o_totalprice")).as("total_cents"))
        .withColumn("quartile", ntile(4).over(w))
        .groupBy("o_orderpriority", "quartile")
        .agg(count(lit(1)).as("n"),
          min("total_cents").as("lo_cents"),
          max("total_cents").as("hi_cents"))
        .orderBy("o_orderpriority", "quartile")
    }),

    // lag window: per-user inter-event gap. ts is an epoch-nano int64 on
    // the Spark side but DuckDB TRUNCATES the parquet TIMESTAMP(NANOS)
    // to microseconds on read, so both the gap arithmetic AND the window
    // order run on the truncated micros (`ts div 1000` ≡ epoch_us) —
    // sub-microsecond ordering would otherwise disagree between engines.
    // One shuffle on user_id, the lag itself is a partition-local scan;
    // the first event of each user yields NULL on both engines.
    "q37_event_gaps" -> ((s, d) => {
      val w = Window.partitionBy("user_id").orderBy(col("ts_us"), col("event_id"))
      events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(w))
        .select(col("event_id"), col("user_id"), col("gap_us"))
        .orderBy("event_id")
    }),

    // Gap-based sessionization: a session opens at a user's first event
    // or wherever the inter-event gap exceeds 30 minutes; the session id
    // is the running count of boundary flags. Both windows share the one
    // (user_id) partitioning — a single shuffle, then partition-local lag
    // + running sum merged into one WindowExec; the per-session rollup is
    // an ordinary partial-aggregated groupBy. Timestamps are quantized to
    // micros (`ts div 1000` ≡ epoch_us) for cross-engine order parity,
    // same as q37. The scale unit is the user — no global window, and a
    // 100 TB event log sessionizes in one pass.
    "q47_sessionize" -> ((s, d) => {
      val byUser = Window.partitionBy("user_id")
        .orderBy(col("ts_us"), col("event_id"))
      val running = byUser
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
        .withColumn("gap_us", col("ts_us") - lag("ts_us", 1).over(byUser))
        .withColumn("boundary",
          when(col("gap_us").isNull || col("gap_us") > 1800000000L, 1L)
            .otherwise(0L))
        .withColumn("session_no", sum("boundary").over(running))
        .groupBy("user_id", "session_no")
        .agg(count(lit(1)).as("n_events"),
          (max("ts_us") - min("ts_us")).as("span_us"),
          sum(cents(col("value"))).as("value_cents"),
          countDistinct("event_type").as("n_types"))
        .orderBy("user_id", "session_no")
    }),

    // Ordered conversion funnel: signup → view → click → purchase, each
    // stage counted only when its FIRST occurrence falls strictly after
    // the previous stage's first occurrence. One conditional-min groupBy
    // per user collapses the event log to a 4-timestamp row (map-side
    // partial agg), then a single global roll-up of 0/1 flags — the
    // whole funnel is two aggregates and the heavy one keys on user_id,
    // so a 100 TB event log funnels in one shuffle. Timestamps quantized
    // to micros (`ts div 1000` ≡ epoch_us) as in q37/q47.
    "q48_funnel" -> ((s, d) => {
      def firstTs(t: String) =
        min(when(col("event_type") === t, col("ts_us"))).as(s"t_$t")
      val per = events(s, d)
        .withColumn("ts_us", expr("ts div 1000"))
        .groupBy("user_id")
        .agg(firstTs("signup"), firstTs("view"),
          firstTs("click"), firstTs("purchase"))
      val s1 = col("t_signup").isNotNull
      val s2 = s1 && col("t_view") > col("t_signup")
      val s3 = s2 && col("t_click") > col("t_view")
      val s4 = s3 && col("t_purchase") > col("t_click")
      def flag(c: org.apache.spark.sql.Column) = when(c, 1L).otherwise(0L)
      per.agg(count(lit(1)).as("n_users"),
        sum(flag(s1)).as("n_signup"),
        sum(flag(s2)).as("n_then_view"),
        sum(flag(s3)).as("n_then_click"),
        sum(flag(s4)).as("n_then_purchase"))
    }),

    // JSON extraction: events.props is a JSON string; pull a typed field
    // out in the scan stage (codegen'd path expression, no UDF) and
    // aggregate it — the semi-structured column pattern every event
    // pipeline hits. One scan, partial agg.
    "q38_json" -> ((s, d) => {
      events(s, d)
        .withColumn("k", get_json_object(col("props"), "$.k").cast("bigint"))
        .groupBy("event_type")
        .agg(count(lit(1)).as("n"),
          sum("k").as("sum_k"),
          min("k").as("min_k"),
          max("k").as("max_k"))
        .orderBy("event_type")
    }),

    // UNPIVOT (wide → long): three lineitem measures melt into
    // (measure, value) rows via one Expand over one scan — never three
    // unioned scans — then aggregate per (returnflag, measure). Each
    // measure is pre-quantized to exact integers.
    "q39_unpivot" -> ((s, d) => {
      lineitem(s, d)
        .select(col("l_returnflag"),
          round(col("l_quantity") * 100).cast("bigint").as("qty_c"),
          cents(col("l_extendedprice")).as("price_c"),
          round(col("l_discount") * 10000).cast("bigint").as("disc_bp"))
        .unpivot(Array(col("l_returnflag")),
          Array(col("qty_c"), col("price_c"), col("disc_bp")),
          "measure", "v")
        .groupBy("l_returnflag", "measure")
        .agg(sum("v").as("total"), count(lit(1)).as("n"))
        .orderBy("l_returnflag", "measure")
    }),

    // Ordered string aggregation: the listagg/string_agg shape —
    // collect_set per group, sorted BEFORE joining so the string is
    // deterministic (never rely on aggregation arrival order).
    "q40_stragg" -> ((s, d) => {
      customer(s, d)
        .groupBy("c_nationkey")
        .agg(array_join(array_sort(collect_set("c_mktsegment")), "|")
          .as("segments"),
          countDistinct("c_mktsegment").as("n_segments"))
        .orderBy("c_nationkey")
    }),

    // Pure-SQL entry surface: the engine accepts ANSI SQL directly
    // (spark.sql over registered views) — NOT IN with a subquery plans
    // as a null-aware anti join, the trap-laden form left_anti shortcuts
    // get wrong when the subquery can yield NULLs.
    "q45_sql_notin" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("v_orders")
      customer(s, d).createOrReplaceTempView("v_customer")
      s.sql("""
        SELECT c_custkey, c_mktsegment FROM v_customer
        WHERE c_custkey NOT IN (
          SELECT o_custkey FROM v_orders WHERE o_totalprice > 400000)
        ORDER BY c_custkey""")
    }),

    // Pure-SQL CTE + window dedup (the QUALIFY idiom spelled as a
    // subquery): latest order per customer by date with key tie-break.
    "q46_sql_latest" -> ((s, d) => {
      orders(s, d).createOrReplaceTempView("v_orders")
      s.sql("""
        WITH ranked AS (
          SELECT o_custkey, o_orderkey, o_orderdate,
            row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
          FROM v_orders)
        SELECT o_custkey, o_orderkey,
          date_format(o_orderdate, 'yyyy-MM-dd') AS order_day
        FROM ranked WHERE rn = 1 ORDER BY o_custkey""")
    }),

    // Array / higher-order-function battery surfaced at the query level:
    // collect_list → sort → fold (aggregate), max, distinct-count, and a
    // canonical string form — per-order arrays stay small (lineitems per
    // order), so the collect is bounded by the group, never the table.
    "q43_arrays" -> ((s, d) => {
      lineitem(s, d)
        .select(col("l_orderkey"),
          round(col("l_quantity") * 100).cast("bigint").as("qty_c"))
        .groupBy("l_orderkey")
        .agg(sort_array(collect_list("qty_c")).as("qtys"))
        .select(col("l_orderkey"),
          size(col("qtys")).as("n"),
          aggregate(col("qtys"), lit(0L), (acc, x) => acc + x).as("total"),
          array_max(col("qtys")).as("max_q"),
          size(array_distinct(col("qtys"))).as("n_distinct"),
          array_join(col("qtys"), ",").as("qty_str"))
        .orderBy("l_orderkey")
    }),

    // Bag-semantics set operations (EXCEPT ALL / INTERSECT ALL): keep
    // multiplicity — the dedup-free form `distinct`-based set ops can't
    // express. Planned as hash joins on the value with count matching,
    // not a sort of the whole input.
    "q44_bagops" -> ((s, d) => {
      val e = events(s, d)
      val purchases = e.filter(col("event_type") === "purchase")
        .select("user_id")
      val errors = e.filter(col("event_type") === "error")
        .select("user_id")
      purchases.exceptAll(errors)
        .groupBy("user_id").agg(count(lit(1)).as("n"))
        .orderBy("user_id")
    }),

    // TPC-H Q6 shape (selective-scan revenue): no join at all — the
    // point is the SCAN: every predicate is a plain column comparison
    // (date range, not year() — a function call would block pushdown) so
    // all four filters reach the parquet reader as PushedFilters and
    // row-group stats prune before any row materializes.
    "q42_selective" -> ((s, d) => {
      lineitem(s, d)
        .filter(col("l_shipdate") >= lit("1996-01-01").cast("date") &&
          col("l_shipdate") < lit("1997-01-01").cast("date") &&
          col("l_discount") >= 0.05 && col("l_discount") <= 0.07 &&
          col("l_quantity") < 24)
        .agg(sum(cents(col("l_extendedprice") * col("l_discount")))
          .as("revenue_cents"),
          count(lit(1)).as("n_items"))
    }),

    // Rank-family window battery: percent_rank / cume_dist / nth_value
    // over one per-priority window (the scale unit). The unique
    // tie-break makes the default RANGE frame equal a ROWS frame on both
    // engines; the ratios are single double divisions of exact integer
    // ranks, so they reproduce bit-for-bit.
    "q41_rank_family" -> ((s, d) => {
      val w = Window.partitionBy("o_orderpriority")
        .orderBy(col("total_cents"), col("o_orderkey"))
      orders(s, d)
        .select(col("o_orderkey"), col("o_orderpriority"),
          cents(col("o_totalprice")).as("total_cents"))
        .withColumn("pr", percent_rank().over(w))
        .withColumn("cd", cume_dist().over(w))
        .withColumn("nth10", nth_value(col("total_cents"), 10).over(w))
        .select("o_orderkey", "o_orderpriority", "pr", "cd", "nth10")
        .orderBy("o_orderkey")
    }))

  val oracles: Map[String, String] = Map(
    "q25_pivot" ->
      """SELECT CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'F'
        |    THEN CAST(round(o_totalprice*100) AS BIGINT) END), 0) AS BIGINT) AS f_cents,
        |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'O'
        |    THEN CAST(round(o_totalprice*100) AS BIGINT) END), 0) AS BIGINT) AS o_cents,
        |  CAST(coalesce(sum(CASE WHEN o_orderstatus = 'P'
        |    THEN CAST(round(o_totalprice*100) AS BIGINT) END), 0) AS BIGINT) AS p_cents
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q26_rolling" ->
      """SELECT event_id, user_id,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) OVER (
        |    PARTITION BY user_id ORDER BY ts
        |    RANGE BETWEEN INTERVAL 7 DAYS PRECEDING AND CURRENT ROW)
        |    AS BIGINT) AS roll_cents
        |FROM events ORDER BY event_id""".stripMargin,
    "q24_grouping_sets" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem
        |GROUP BY GROUPING SETS ((l_returnflag, l_linestatus), (l_linestatus), ())
        |ORDER BY 1,2""".stripMargin,
    "q1_pricing" ->
      """SELECT l_returnflag, l_linestatus,
        |  CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) AS price_cents,
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS disc_price_cents,
        |  count(*) AS cnt
        |FROM lineitem GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q2_top_orders" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
        |FROM orders ORDER BY total_cents DESC, o_orderkey LIMIT 10""".stripMargin,
    "q3_revenue" ->
      """SELECT c_mktsegment, CAST(year(o_orderdate) AS INT) AS order_year,
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |GROUP BY 1,2 ORDER BY 1,2""".stripMargin,
    "q4_region_stats" ->
      """SELECT r_name, count(*) AS n_customers,
        |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS acctbal_cents
        |FROM customer JOIN nation ON c_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q5_window_rank" ->
      """SELECT o_custkey, o_orderkey,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS total_cents,
        |  CAST(rk AS INT) AS rk
        |FROM (SELECT o_custkey, o_orderkey, o_totalprice,
        |        row_number() OVER (PARTITION BY o_custkey
        |          ORDER BY o_totalprice DESC, o_orderkey) AS rk
        |      FROM orders)
        |WHERE rk <= 3 ORDER BY o_custkey, rk""".stripMargin,
    "q6_rollup" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus,
        |  count(*) AS cnt, CAST(sum(l_quantity) AS BIGINT) AS sum_qty
        |FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
        |ORDER BY 1,2""".stripMargin,
    "q7_distinct" ->
      """SELECT o_orderstatus, count(DISTINCT o_custkey) AS n_custs,
        |  count(*) AS n_orders
        |FROM orders GROUP BY 1 ORDER BY 1""".stripMargin,
    "q8_no_orders" ->
      """SELECT c_nationkey, count(*) AS n_customers FROM customer
        |WHERE NOT EXISTS (SELECT 1 FROM orders
        |  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q9_hot_brands" ->
      """SELECT p_brand, count(*) AS n_parts FROM part
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_partkey = p_partkey AND l_quantity >= 45)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q10_setops" ->
      """(SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
        | INTERSECT
        | SELECT DISTINCT user_id FROM events WHERE event_type = 'error')
        |EXCEPT
        |SELECT DISTINCT user_id FROM events
        |WHERE event_type = 'signup' AND user_id % 7 = 0
        |ORDER BY user_id""".stripMargin,
    "q11_scalars" ->
      """SELECT p_partkey, upper(substring(p_name, 1, 5)) AS name5,
        |  CAST(length(p_name) AS INT) AS name_len,
        |  CAST(p_size % 7 AS INT) AS size_mod7,
        |  concat_ws('|', p_brand, p_type) AS brand_type,
        |  CASE WHEN p_retailprice > 1500 THEN 'premium'
        |       WHEN p_retailprice > 1000 THEN 'standard'
        |       ELSE 'budget' END AS tier,
        |  CAST(round(p_retailprice*100) AS BIGINT) AS price_cents
        |FROM part ORDER BY p_partkey""".stripMargin,
    "q17_nation_trade" ->
      """SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)) AS BIGINT)
        |    AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem
        |  JOIN supplier ON l_suppkey = s_suppkey
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN nation sn ON s_nationkey = sn.n_nationkey
        |  JOIN nation cn ON c_nationkey = cn.n_nationkey
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q18_big_orders" ->
      """SELECT o_orderkey, o_custkey,
        |  CAST(round(o_totalprice*100) AS BIGINT) AS total_cents, total_qty
        |FROM orders JOIN (
        |  SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
        |  FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 150) big
        |  ON o_orderkey = big.l_orderkey
        |ORDER BY o_orderkey""".stripMargin,
    "q15_median" ->
      """WITH r AS (
        |  SELECT l_returnflag, l_quantity,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY l_quantity, l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem)
        |SELECT l_returnflag,
        |  sum(l_quantity) / count(*) AS median_qty,
        |  CAST(max(n) AS BIGINT) AS n
        |FROM r WHERE rn = (n+1)//2 OR rn = (n+2)//2
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q27_small_qty" ->
      """WITH pp AS (SELECT l_partkey,
        |    CAST(sum(CAST(l_quantity AS BIGINT)) AS BIGINT) AS sum_qty,
        |    count(*) AS cnt_p
        |  FROM lineitem GROUP BY 1),
        |f AS (SELECT l.l_partkey, l.l_extendedprice
        |      FROM lineitem l JOIN pp ON l.l_partkey = pp.l_partkey
        |      WHERE CAST(l.l_quantity AS BIGINT) * 5 * pp.cnt_p < pp.sum_qty)
        |SELECT p_brand, count(*) AS n_small,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT)
        |    AS lost_cents,
        |  CAST(sum(CAST(round(l_extendedprice*100) AS BIGINT)) AS BIGINT) // 7
        |    AS avg_yearly_cents
        |FROM f JOIN part ON f.l_partkey = p_partkey
        |WHERE p_size <= 15
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q29_local_volume" ->
      """SELECT n_name,
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT))
        |    AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem
        |  JOIN orders ON l_orderkey = o_orderkey
        |  JOIN customer ON o_custkey = c_custkey
        |  JOIN supplier ON l_suppkey = s_suppkey
        |    AND c_nationkey = s_nationkey
        |  JOIN nation ON s_nationkey = n_nationkey
        |  JOIN region ON n_regionkey = r_regionkey
        |WHERE year(o_orderdate) = 1996 AND r_name IN ('AMERICA', 'ASIA')
        |GROUP BY 1 ORDER BY revenue_cents DESC, n_name""".stripMargin,
    "q30_promo_share" ->
      """SELECT CAST(month(l_shipdate) AS INT) AS ship_month,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) AS promo_cents,
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT))
        |    AS BIGINT) AS total_cents,
        |  CAST(sum(CASE WHEN p_type = 'PROMO'
        |    THEN CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT)
        |    ELSE 0 END) AS BIGINT) * 10000
        |    // CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT))
        |      AS BIGINT) AS promo_bps
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE year(l_shipdate) = 1996
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q31_disjunctive" ->
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT))
        |    AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem JOIN part ON l_partkey = p_partkey
        |WHERE (p_brand = 'Brand#12' AND p_size <= 5
        |       AND l_quantity BETWEEN 1 AND 11)
        |   OR (p_brand = 'Brand#23' AND p_size <= 10
        |       AND l_quantity BETWEEN 10 AND 20)
        |   OR (p_brand = 'Brand#34' AND p_size <= 15
        |       AND l_quantity BETWEEN 20 AND 30)""".stripMargin,
    "q32_priority_exists" ->
      """SELECT o_orderpriority, count(*) AS n_orders
        |FROM orders
        |WHERE EXISTS (SELECT 1 FROM lineitem
        |              WHERE l_orderkey = o_orderkey AND l_returnflag = 'R')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q28_quantiles" ->
      """WITH r AS (SELECT l_returnflag,
        |    CAST(round(l_extendedprice * 100) AS BIGINT) AS price_cents,
        |    row_number() OVER (PARTITION BY l_returnflag
        |      ORDER BY CAST(round(l_extendedprice * 100) AS BIGINT),
        |        l_orderkey, l_linenumber) AS rn,
        |    count(*) OVER (PARTITION BY l_returnflag) AS n
        |  FROM lineitem),
        |e AS (SELECT l_returnflag, price_cents, rn, n,
        |    unnest([25, 50, 75, 90]) AS pq FROM r)
        |SELECT l_returnflag, CAST(pq AS BIGINT) AS pq, price_cents
        |FROM e WHERE rn = (n * pq + 99) // 100
        |ORDER BY l_returnflag, pq""".stripMargin,
    "q16_cube" ->
      """SELECT coalesce(l_returnflag, 'ALL') AS returnflag,
        |  coalesce(l_linestatus, 'ALL') AS linestatus, count(*) AS cnt
        |FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
        |ORDER BY 1, 2""".stripMargin,
    "q13_asof" ->
      """SELECT e.event_id, e.user_id, p.event_id AS purchase_id,
        |  CAST(round(p.value*100) AS BIGINT) AS purchase_cents
        |FROM (SELECT * FROM events WHERE event_type = 'error') e
        |ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
        |  ON e.user_id = p.user_id AND e.ts >= p.ts
        |ORDER BY e.event_id""".stripMargin,
    "q14_range" ->
      """SELECT e.event_id AS error_id, p.event_id AS purchase_id
        |FROM events e JOIN events p
        |  ON p.user_id = e.user_id
        |  AND e.event_type = 'error' AND p.event_type = 'purchase'
        |  AND p.ts BETWEEN e.ts - INTERVAL 1 HOUR AND e.ts
        |ORDER BY 1, 2""".stripMargin,
    "q12_dates" ->
      """SELECT o_orderkey, CAST(year(o_orderdate) AS INT) AS y,
        |  CAST(month(o_orderdate) AS INT) AS m,
        |  CAST(dayofmonth(o_orderdate) AS INT) AS dom,
        |  strftime(o_orderdate, '%Y-%m-%d') AS day_str
        |FROM orders WHERE year(o_orderdate) = 1995 ORDER BY o_orderkey""".stripMargin,
    "q19_market_share" ->
      """WITH j AS (
        |  SELECT year(o_orderdate) AS o_year, sn.n_name AS supp_nation,
        |    CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT) AS rev
        |  FROM lineitem
        |    JOIN orders ON l_orderkey = o_orderkey
        |    JOIN customer ON o_custkey = c_custkey
        |    JOIN nation cn ON c_nationkey = cn.n_nationkey
        |    JOIN region ON cn.n_regionkey = r_regionkey AND r_name = 'ASIA'
        |    JOIN supplier ON l_suppkey = s_suppkey
        |    JOIN nation sn ON s_nationkey = sn.n_nationkey)
        |SELECT CAST(o_year AS INT) AS o_year,
        |  CAST(sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END) AS BIGINT)
        |    AS nation_cents,
        |  CAST(sum(rev) AS BIGINT) AS total_cents,
        |  sum(CASE WHEN supp_nation = 'NATION_3' THEN rev ELSE 0 END) * 1.0
        |    / sum(rev) AS mkt_share
        |FROM j GROUP BY 1 ORDER BY 1""".stripMargin,
    "q20_waiting_supplier" ->
      """WITH om AS (
        |  SELECT l_orderkey, max(l_shipdate) AS max_ship
        |  FROM lineitem GROUP BY 1 HAVING count(DISTINCT l_suppkey) >= 2),
        |at_max AS (
        |  SELECT DISTINCT l.l_orderkey, l.l_suppkey
        |  FROM lineitem l JOIN om ON l.l_orderkey = om.l_orderkey
        |    AND l.l_shipdate = om.max_ship),
        |sole AS (
        |  SELECT l_orderkey FROM at_max GROUP BY 1 HAVING count(*) = 1)
        |SELECT s_name, numwait FROM (
        |  SELECT l_suppkey, count(*) AS numwait
        |  FROM at_max WHERE l_orderkey IN (SELECT l_orderkey FROM sole)
        |  GROUP BY 1) w JOIN supplier ON l_suppkey = s_suppkey
        |ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin,
    "q21_idle_customers" ->
      """WITH pos AS (
        |  SELECT CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS pos_sum,
        |    count(*) AS pos_n
        |  FROM customer WHERE c_acctbal > 0)
        |SELECT c_mktsegment, count(*) AS n_cust,
        |  CAST(sum(CAST(round(c_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
        |FROM customer, pos
        |WHERE CAST(round(c_acctbal*100) AS BIGINT) * pos_n > pos_sum
        |  AND NOT EXISTS (SELECT 1 FROM orders
        |                  WHERE o_custkey = c_custkey AND o_totalprice > 300000)
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q22_nation_balance" ->
      """WITH per AS (
        |  SELECT n_name,
        |    CAST(sum(CAST(round(s_acctbal*100) AS BIGINT)) AS BIGINT) AS bal_cents
        |  FROM supplier JOIN nation ON s_nationkey = n_nationkey
        |  GROUP BY 1)
        |SELECT n_name, bal_cents FROM per
        |WHERE bal_cents * 25 > (SELECT CAST(sum(bal_cents) AS BIGINT) FROM per)
        |ORDER BY bal_cents DESC, n_name""".stripMargin,
    "q23_event_windows" ->
      """SELECT event_type, epoch_ns(ts) // 600000000000 AS win_id,
        |  count(*) AS n_events,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents,
        |  count(DISTINCT user_id) AS n_users
        |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q33_custdist" ->
      """SELECT c_count, count(*) AS custdist FROM (
        |  SELECT c_custkey, count(o_orderkey) AS c_count
        |  FROM customer LEFT JOIN orders
        |    ON c_custkey = o_custkey AND o_orderstatus <> 'P'
        |  GROUP BY 1)
        |GROUP BY 1 ORDER BY custdist DESC, c_count DESC""".stripMargin,
    "q34_top_supplier" ->
      """WITH r AS (
        |  SELECT l_suppkey,
        |    CAST(sum(CAST(round(l_extendedprice*(1.0-l_discount)*100) AS BIGINT))
        |      AS BIGINT) AS total_cents
        |  FROM lineitem
        |  WHERE year(l_shipdate) = 1996 AND month(l_shipdate) <= 3
        |  GROUP BY 1)
        |SELECT s_suppkey, s_name, total_cents
        |FROM r JOIN supplier ON l_suppkey = s_suppkey
        |WHERE total_cents = (SELECT max(total_cents) FROM r)
        |ORDER BY s_suppkey""".stripMargin,
    "q35_ship_priority" ->
      """SELECT l_linestatus,
        |  CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
        |  CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
        |    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
        |FROM lineitem JOIN orders ON l_orderkey = o_orderkey
        |WHERE year(l_shipdate) = 1996
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q36_ntile" ->
      """SELECT o_orderpriority, CAST(quartile AS INT) AS quartile,
        |  count(*) AS n, min(total_cents) AS lo_cents,
        |  max(total_cents) AS hi_cents
        |FROM (SELECT o_orderpriority, o_orderkey,
        |        CAST(round(o_totalprice*100) AS BIGINT) AS total_cents,
        |        ntile(4) OVER (PARTITION BY o_orderpriority
        |          ORDER BY CAST(round(o_totalprice*100) AS BIGINT),
        |            o_orderkey) AS quartile
        |      FROM orders)
        |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q37_event_gaps" ->
      """SELECT event_id, user_id,
        |  epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |    PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        |FROM events ORDER BY event_id""".stripMargin,
    "q47_sessionize" ->
      """WITH g AS (SELECT event_id, user_id, event_type, value,
        |    epoch_us(ts) AS ts_us,
        |    epoch_us(ts) - lag(epoch_us(ts)) OVER (
        |      PARTITION BY user_id ORDER BY epoch_us(ts), event_id) AS gap_us
        |  FROM events),
        |sess AS (SELECT *, CAST(sum(CASE WHEN gap_us IS NULL
        |      OR gap_us > 1800000000 THEN 1 ELSE 0 END) OVER (
        |    PARTITION BY user_id ORDER BY ts_us, event_id
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
        |    AS session_no
        |  FROM g)
        |SELECT user_id, session_no, count(*) AS n_events,
        |  CAST(max(ts_us) - min(ts_us) AS BIGINT) AS span_us,
        |  CAST(sum(CAST(round(value*100) AS BIGINT)) AS BIGINT) AS value_cents,
        |  CAST(count(DISTINCT event_type) AS BIGINT) AS n_types
        |FROM sess GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q48_funnel" ->
      """WITH per AS (SELECT user_id,
        |    min(CASE WHEN event_type = 'signup' THEN epoch_us(ts) END)
        |      AS t_signup,
        |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END)
        |      AS t_view,
        |    min(CASE WHEN event_type = 'click' THEN epoch_us(ts) END)
        |      AS t_click,
        |    min(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
        |      AS t_purchase
        |  FROM events GROUP BY 1)
        |SELECT count(*) AS n_users,
        |  CAST(sum(CASE WHEN t_signup IS NOT NULL THEN 1 ELSE 0 END)
        |    AS BIGINT) AS n_signup,
        |  CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_then_view,
        |  CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
        |    AND t_click > t_view THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_then_click,
        |  CAST(sum(CASE WHEN t_signup IS NOT NULL AND t_view > t_signup
        |    AND t_click > t_view AND t_purchase > t_click
        |    THEN 1 ELSE 0 END) AS BIGINT) AS n_then_purchase
        |FROM per""".stripMargin,
    "q38_json" ->
      """SELECT event_type, count(*) AS n,
        |  CAST(sum(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS sum_k,
        |  CAST(min(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS min_k,
        |  CAST(max(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT)
        |    AS max_k
        |FROM events GROUP BY 1 ORDER BY 1""".stripMargin,
    "q39_unpivot" ->
      """WITH base AS (SELECT l_returnflag,
        |    CAST(round(l_quantity*100) AS BIGINT) AS qty_c,
        |    CAST(round(l_extendedprice*100) AS BIGINT) AS price_c,
        |    CAST(round(l_discount*10000) AS BIGINT) AS disc_bp
        |  FROM lineitem),
        |long AS (
        |  SELECT l_returnflag, 'qty_c' AS measure, qty_c AS v FROM base
        |  UNION ALL
        |  SELECT l_returnflag, 'price_c', price_c FROM base
        |  UNION ALL
        |  SELECT l_returnflag, 'disc_bp', disc_bp FROM base)
        |SELECT l_returnflag, measure,
        |  CAST(sum(v) AS BIGINT) AS total, count(*) AS n
        |FROM long GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin,
    "q40_stragg" ->
      """SELECT c_nationkey,
        |  string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment)
        |    AS segments,
        |  count(DISTINCT c_mktsegment) AS n_segments
        |FROM customer GROUP BY 1 ORDER BY 1""".stripMargin,
    "q45_sql_notin" ->
      """SELECT c_custkey, c_mktsegment FROM customer
        |WHERE c_custkey NOT IN (
        |  SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
        |ORDER BY c_custkey""".stripMargin,
    "q46_sql_latest" ->
      """WITH ranked AS (
        |  SELECT o_custkey, o_orderkey, o_orderdate,
        |    row_number() OVER (PARTITION BY o_custkey
        |      ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
        |  FROM orders)
        |SELECT o_custkey, o_orderkey,
        |  strftime(o_orderdate, '%Y-%m-%d') AS order_day
        |FROM ranked WHERE rn = 1 ORDER BY o_custkey""".stripMargin,
    "q43_arrays" ->
      """SELECT l_orderkey,
        |  CAST(len(qtys) AS INT) AS n,
        |  CAST(list_aggregate(qtys, 'sum') AS BIGINT) AS total,
        |  CAST(list_aggregate(qtys, 'max') AS BIGINT) AS max_q,
        |  CAST(len(list_distinct(qtys)) AS INT) AS n_distinct,
        |  array_to_string(qtys, ',') AS qty_str
        |FROM (SELECT l_orderkey,
        |        list_sort(list(CAST(round(l_quantity*100) AS BIGINT))) AS qtys
        |      FROM lineitem GROUP BY 1)
        |ORDER BY l_orderkey""".stripMargin,
    "q44_bagops" ->
      """SELECT user_id, count(*) AS n FROM (
        |  SELECT user_id FROM events WHERE event_type = 'purchase'
        |  EXCEPT ALL
        |  SELECT user_id FROM events WHERE event_type = 'error')
        |GROUP BY 1 ORDER BY 1""".stripMargin,
    "q42_selective" ->
      """SELECT
        |  CAST(sum(CAST(round(l_extendedprice*l_discount*100) AS BIGINT))
        |    AS BIGINT) AS revenue_cents,
        |  count(*) AS n_items
        |FROM lineitem
        |WHERE l_shipdate >= DATE '1996-01-01'
        |  AND l_shipdate < DATE '1997-01-01'
        |  AND l_discount >= 0.05 AND l_discount <= 0.07
        |  AND l_quantity < 24""".stripMargin,
    "q41_rank_family" ->
      """SELECT o_orderkey, o_orderpriority,
        |  percent_rank() OVER w AS pr,
        |  cume_dist() OVER w AS cd,
        |  nth_value(total_cents, 10) OVER w AS nth10
        |FROM (SELECT o_orderkey, o_orderpriority,
        |        CAST(round(o_totalprice*100) AS BIGINT) AS total_cents
        |      FROM orders)
        |WINDOW w AS (PARTITION BY o_orderpriority
        |             ORDER BY total_cents, o_orderkey)
        |ORDER BY o_orderkey""".stripMargin)
}
