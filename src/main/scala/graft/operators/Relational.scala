package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.Exact._
import graft.sources.Tables

/** One registered query: Spark formulation + (when SQL-expressible) the
  * byte-equivalent DuckDB oracle text the driver hash-compares against.
  */
final case class Q(name: String, oracle: Option[String])(val fn: Tables => DataFrame)

/** Relational operator inventory — every operator family from SURVEY.md §2
  * (scans S*, projections/filters P*, joins J*, aggregations A*, windows W*,
  * sorts/limits O*, set ops U*, scalar functions F*) re-expressed on the
  * driver's testdata star schema. Reference sites are cited per query.
  *
  * Determinism contract (driver sorts rows, then hashes values):
  *  - float aggregation goes through [[graft.functions.Exact]] (decimal-exact,
  *    one final IEEE division) so Spark and DuckDB agree bit-for-bit;
  *  - every window/limit ordering carries a unique tiebreaker key;
  *  - "randomness" (reference S5–S7 synthetic generators) is an explicit
  *    arithmetic LCG, identical on both sides — never `rand()`.
  */
object Relational {

  // ---- S: scans / sources / sinks -------------------------------------

  /** S1+J8 (dags/spurs_historic_games.py:50-76): "teams active in the last
    * 2 years" = semi-join of the dim against fact existence. */
  val s01 = Q(
    "s01_active_suppliers_semijoin",
    Some(
      "SELECT s.* FROM supplier s WHERE EXISTS " +
        "(SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey)"
    )
  ) { t =>
    t.supplier.join(
      t.lineitem,
      t.supplier("s_suppkey") === t.lineitem("l_suppkey"),
      "left_semi"
    )
  }

  /** S2 (dags/spurs_historic_games.py:78-108): header/rowSet zip-unnest →
    * explode of a split array keeps the parent key on each element row. */
  val s02 = Q(
    "s02_word_explode",
    Some(
      "SELECT p_partkey, unnest(string_split(p_name, ' ')) AS word FROM part"
    )
  ) { t =>
    t.part.select(
      col("p_partkey"),
      explode(split(col("p_name"), " ")).as("word")
    )
  }

  /** S5 (dags/spurs_historic_games.py:185-208): synthetic salary generator
    * `round(uniform(5e5, 4.5e7), 2)` — reproduced with an explicit LCG so
    * the oracle computes the identical stream. */
  val s05 = Q(
    "s05_synthetic_salary",
    Some(
      "SELECT s_suppkey, round(CAST((s_suppkey * 1103515245 + 12345) % 2147483648 AS DOUBLE)" +
        " / 2147483648.0 * 44500000.0 + 500000.0, 2) AS salary_usd FROM supplier"
    )
  ) { t =>
    t.supplier.select(
      col("s_suppkey"),
      round(
        ((col("s_suppkey") * lit(1103515245L) + lit(12345L)) % lit(2147483648L))
          .cast("double") / lit(2147483648.0) * lit(44500000.0) + lit(500000.0),
        2
      ).as("salary_usd")
    )
  }

  /** S6 / Q-2 (dags/spurs_historic_games.py:226-229): last-wins dedup per
    * key — deterministic `row_number` over the "latest first" order, not
    * `dropDuplicates` (which keeps an arbitrary row). */
  val s06 = Q(
    "s06_last_wins_dedup",
    Some(
      "SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderdate, o_orderpriority " +
        "FROM (SELECT *, row_number() OVER (PARTITION BY o_custkey " +
        "ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn FROM orders) WHERE rn = 1"
    )
  ) { t =>
    val w = Window
      .partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate").desc, col("o_orderkey").desc)
    t.orders
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(
        "o_orderkey", "o_custkey", "o_orderstatus",
        "o_totalprice", "o_orderdate", "o_orderpriority"
      )
  }

  /** S7/O4 (dags/spurs_historic_games.py:232,274): fixed-size "random"
    * sample — `orderBy(prng).limit(n)` with an arithmetic key both engines
    * compute identically. */
  val s07 = Q(
    "s07_fixed_sample",
    Some(
      "SELECT * FROM orders ORDER BY (o_orderkey * 48271) % 2147483647, o_orderkey LIMIT 200"
    )
  ) { t =>
    t.orders
      .orderBy(
        ((col("o_orderkey") * lit(48271L)) % lit(2147483647L)).asc,
        col("o_orderkey").asc
      )
      .limit(200)
  }

  // ---- P: projections / filters ---------------------------------------

  /** P1+S10 (dags/spurs_historic_games.py:363-380): silver normalization —
    * rename + every column cast to string (the reference's all-VARCHAR
    * staging layer). */
  val p01 = Q(
    "p01_all_string_normalize",
    Some(
      "SELECT CAST(c_custkey AS VARCHAR) AS custkey, CAST(c_name AS VARCHAR) AS name, " +
        "CAST(c_nationkey AS VARCHAR) AS nationkey, CAST(c_acctbal AS VARCHAR) AS acctbal, " +
        "CAST(c_mktsegment AS VARCHAR) AS mktsegment FROM customer"
    )
  ) { t =>
    t.customer.select(
      col("c_custkey").cast("string").as("custkey"),
      col("c_name").cast("string").as("name"),
      col("c_nationkey").cast("string").as("nationkey"),
      col("c_acctbal").cast("string").as("acctbal"),
      col("c_mktsegment").cast("string").as("mktsegment")
    )
  }

  /** P2 (dags/spurs_historic_games.py:372-378,406-409): first-record
    * projection over semi-structured data — present keys extracted, missing
    * keys become NULL columns. */
  val p02 = Q(
    "p02_json_first_record",
    Some(
      "SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k, " +
        "json_extract_string(props, '$.missing') AS missing_key FROM events"
    )
  ) { t =>
    t.events.select(
      col("event_id"),
      get_json_object(col("props"), "$.k").cast("long").as("k"),
      get_json_object(col("props"), "$.missing").as("missing_key")
    )
  }

  /** P3 (team_weaknesses_unpivoted.sql:16): string equality filter. */
  val p03 = Q(
    "p03_filter_eq",
    Some(
      "SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag FROM lineitem " +
        "WHERE l_returnflag = 'R'"
    )
  ) { t =>
    t.lineitem
      .filter(col("l_returnflag") === "R")
      .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
  }

  /** P4 / Q-5 (home_vs_away.sql:17, streaks_and_rivals.sql:64-66): LIKE with
    * wildcards plus the reference's wildcard-free LIKE (≡ equality). */
  val p04 = Q(
    "p04_like_filters",
    Some(
      "SELECT p_partkey, p_name, p_type FROM part " +
        "WHERE p_name LIKE '%red%' OR p_type LIKE 'PROMO'"
    )
  ) { t =>
    t.part
      .filter(col("p_name").like("%red%") || col("p_type").like("PROMO"))
      .select("p_partkey", "p_name", "p_type")
  }

  /** P5 (players_recommendations.sql:66,...): IN-list predicate. */
  val p05 = Q(
    "p05_in_list",
    Some(
      "SELECT o_orderkey, o_orderpriority FROM orders " +
        "WHERE o_orderpriority IN ('1-URGENT', '2-HIGH')"
    )
  ) { t =>
    t.orders
      .filter(col("o_orderpriority").isin("1-URGENT", "2-HIGH"))
      .select("o_orderkey", "o_orderpriority")
  }

  /** P9 (summary_by_season.sql:13-14 etc.): CASE WHEN scalar conditionals. */
  val p09 = Q(
    "p09_case_when",
    Some(
      "SELECT o_orderkey, CASE WHEN o_orderstatus = 'F' THEN 'Finished' " +
        "WHEN o_orderstatus = 'O' THEN 'Open' ELSE 'Pending' END AS status_label, " +
        "CASE WHEN o_orderpriority LIKE '%URGENT%' THEN 1 ELSE 0 END AS is_urgent FROM orders"
    )
  ) { t =>
    t.orders.select(
      col("o_orderkey"),
      when(col("o_orderstatus") === "F", "Finished")
        .when(col("o_orderstatus") === "O", "Open")
        .otherwise("Pending")
        .as("status_label"),
      when(col("o_orderpriority").like("%URGENT%"), 1)
        .otherwise(0)
        .as("is_urgent")
    )
  }

  // ---- J: joins --------------------------------------------------------

  /** J1 (summary_by_season.sql:6-8): fact ⋈ small dims — both dims are
    * explicitly broadcast (30-row `teams` analog). */
  val j01 = Q(
    "j01_broadcast_join_agg",
    Some(
      "SELECT n_name, " +
        s"${sqlSumDec(s"${sqlDec("l_extendedprice")} * ($sqlDecOne - ${sqlDec("l_discount")})")} AS revenue, " +
        s"$sqlCount AS n_items " +
        "FROM lineitem JOIN supplier ON l_suppkey = s_suppkey " +
        "JOIN nation ON s_nationkey = n_nationkey GROUP BY n_name"
    )
  ) { t =>
    // revenue as a scale-4 limb sum: 2-decimal price × 2-decimal (1-disc)
    // carries ≤4 decimals, so the oracle's scale-8 product and round(·,4)
    // see the same value — accumulated as primitive longs, not BigDecimal
    val rev = unscaledLong(col("l_extendedprice"), 2) *
      (lit(100L) - unscaledLong(col("l_discount"), 2))
    val aggs = limbAggs("rev", rev) :+ count(lit(1)).as("n_items")
    t.lineitem
      .join(broadcast(t.supplier), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(t.nation), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(aggs.head, aggs.tail: _*)
      .select(col("n_name"), limbSumDouble("rev").as("revenue"), col("n_items"))
  }

  /** J3+P6 (players_recommendations.sql:16,48): left join to derive an
    * IS-NOT-NULL boolean flag. */
  val j03 = Q(
    "j03_left_join_flag",
    Some(
      "SELECT c_custkey, c_name, CASE WHEN o.o_custkey IS NOT NULL THEN TRUE ELSE FALSE END " +
        "AS has_orders FROM customer c LEFT JOIN " +
        "(SELECT DISTINCT o_custkey FROM orders) o ON c.c_custkey = o.o_custkey"
    )
  ) { t =>
    val hasOrders = t.orders.select(col("o_custkey")).distinct()
    t.customer
      .join(hasOrders, t.customer("c_custkey") === hasOrders("o_custkey"), "left")
      .select(
        col("c_custkey"),
        col("c_name"),
        when(col("o_custkey").isNotNull, true).otherwise(false).as("has_orders")
      )
  }

  /** J5+A10 (players_recommendations.sql:51): left join against a
    * pre-aggregated (max per key) subquery. */
  val j05 = Q(
    "j05_join_agg_subquery",
    Some(
      "SELECT c_custkey, max_order_value FROM customer c LEFT JOIN " +
        "(SELECT o_custkey, MAX(o_totalprice) AS max_order_value FROM orders GROUP BY o_custkey) o " +
        "ON c.c_custkey = o.o_custkey"
    )
  ) { t =>
    val mx = t.orders
      .groupBy(col("o_custkey"))
      .agg(max(col("o_totalprice")).as("max_order_value"))
    t.customer
      .join(mx, t.customer("c_custkey") === mx("o_custkey"), "left")
      .select(col("c_custkey"), col("max_order_value"))
  }

  /** J9+A12 (streaks_and_rivals.sql:70): global-argmax via scalar subquery,
    * implemented as a broadcast join against the 1-row aggregate (numeric
    * max — the Q-1 decision: intent over the VARCHAR accident). */
  val j09 = Q(
    "j09_scalar_subquery_argmax",
    Some(
      "SELECT l_orderkey, l_linenumber, l_extendedprice FROM lineitem " +
        "WHERE l_extendedprice = (SELECT MAX(l_extendedprice) FROM lineitem)"
    )
  ) { t =>
    val m = t.lineitem.agg(max(col("l_extendedprice")).as("mx"))
    t.lineitem
      .join(broadcast(m), col("l_extendedprice") === col("mx"))
      .select("l_orderkey", "l_linenumber", "l_extendedprice")
  }

  // ---- A: aggregations -------------------------------------------------

  /** A1/A2/F5 (team_weaknesses_unpivoted.sql:4-18): multi-metric grouped
    * AVG/SUM with query-time casts — the TPC-H Q1 shape. */
  val a01 = Q(
    "a01_pricing_summary",
    Some(
      "SELECT l_returnflag, l_linestatus, " +
        s"${sqlSum("l_quantity")} AS sum_qty, " +
        s"${sqlSum("l_extendedprice")} AS sum_base_price, " +
        s"${sqlSumDec(s"${sqlDec("l_extendedprice")} * ($sqlDecOne - ${sqlDec("l_discount")})")} AS sum_disc_price, " +
        s"${sqlSumDec(s"${sqlDec("l_extendedprice")} * ($sqlDecOne - ${sqlDec("l_discount")}) * ($sqlDecOne + ${sqlDec("l_tax")})")} AS sum_charge, " +
        s"${sqlAvg("l_quantity")} AS avg_qty, " +
        s"${sqlAvg("l_extendedprice")} AS avg_price, " +
        s"${sqlAvg("l_discount")} AS avg_disc, " +
        s"$sqlCount AS count_order " +
        "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' " +
        "GROUP BY l_returnflag, l_linestatus"
    )
  ) { t =>
    // All five exact sums as limb sums (primitive-long accumulation).
    // disc_price = 2dp × 2dp → exact at scale 4; charge = 2dp×2dp×2dp →
    // exact at scale 6, rounded to 4 at rebuild exactly as the oracle's
    // round(SUM(decimal), 4) rounds the same rational value.
    val p2 = unscaledLong(col("l_extendedprice"), 2)
    val d2 = unscaledLong(col("l_discount"), 2)
    val t2 = unscaledLong(col("l_tax"), 2)
    val discPrice = p2 * (lit(100L) - d2) // scale 4
    val charge = discPrice * (lit(100L) + t2) // scale 6
    val aggs = limbAggs("qty", unscaledLong(col("l_quantity"), 4)) ++
      limbAggs("price", unscaledLong(col("l_extendedprice"), 4)) ++
      limbAggs("disc", unscaledLong(col("l_discount"), 4)) ++
      limbAggs("dp", discPrice) ++
      limbAggs("ch", charge) :+ count(lit(1)).as("cnt")
    t.lineitem
      .filter(col("l_shipdate") <= lit("1998-09-02 00:00:00").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(aggs.head, aggs.tail: _*)
      .select(
        col("l_returnflag"), col("l_linestatus"),
        limbSumDouble("qty").as("sum_qty"),
        limbSumDouble("price").as("sum_base_price"),
        limbSumDouble("dp").as("sum_disc_price"),
        round(limbValue("ch", 6), 4).cast("double").as("sum_charge"),
        limbAvg("qty", col("cnt")).as("avg_qty"),
        limbAvg("price", col("cnt")).as("avg_price"),
        limbAvg("disc", col("cnt")).as("avg_disc"),
        col("cnt").as("count_order")
      )
  }

  /** A3 (team_weaknesses_unpivoted.sql:37-65): two-level aggregation —
    * per-(segment, nation) AVG, then per-segment MAX/MIN of those AVGs. */
  val a03 = Q(
    "a03_nested_agg",
    Some(
      "SELECT c_mktsegment, MAX(avg_bal) AS best_nation_avg_bal, " +
        "MIN(avg_bal) AS worst_nation_avg_bal FROM " +
        s"(SELECT c_mktsegment, c_nationkey, ${sqlAvg("c_acctbal")} AS avg_bal " +
        "FROM customer GROUP BY c_mktsegment, c_nationkey) GROUP BY c_mktsegment"
    )
  ) { t =>
    t.customer
      .groupBy(col("c_mktsegment"), col("c_nationkey"))
      .agg(exactAvg(col("c_acctbal")).as("avg_bal"))
      .groupBy(col("c_mktsegment"))
      .agg(
        max(col("avg_bal")).as("best_nation_avg_bal"),
        min(col("avg_bal")).as("worst_nation_avg_bal")
      )
  }

  /** A8/A9 (players_recommendations.sql:33,49-50): SELECT DISTINCT. */
  val a08 = Q(
    "a08_distinct",
    Some("SELECT DISTINCT o_orderstatus, o_orderpriority FROM orders")
  ) { t =>
    t.orders.select("o_orderstatus", "o_orderpriority").distinct()
  }

  /** A10 (players_recommendations.sql:51): MAX/MIN/COUNT per key. */
  val a10 = Q(
    "a10_max_per_group",
    Some(
      "SELECT l_partkey, MAX(l_extendedprice) AS max_price, MIN(l_quantity) AS min_qty, " +
        s"$sqlCount AS cnt FROM lineitem GROUP BY l_partkey"
    )
  ) { t =>
    t.lineitem
      .groupBy(col("l_partkey"))
      .agg(
        max(col("l_extendedprice")).as("max_price"),
        min(col("l_quantity")).as("min_qty"),
        count(lit(1)).as("cnt")
      )
  }

  /** A12 (streaks_and_rivals.sql:70,86): global scalar MAX/MIN, one row. */
  val a12 = Q(
    "a12_global_minmax",
    Some(
      "SELECT MAX(l_shipdate) AS max_shipdate, MIN(l_shipdate) AS min_shipdate, " +
        s"MAX(l_extendedprice) AS max_price, $sqlCount AS n_rows FROM lineitem"
    )
  ) { t =>
    t.lineitem.agg(
      max(col("l_shipdate")).as("max_shipdate"),
      min(col("l_shipdate")).as("min_shipdate"),
      max(col("l_extendedprice")).as("max_price"),
      count(lit(1)).as("n_rows")
    )
  }

  // ---- W: windows ------------------------------------------------------

  /** W4 (compiled team_weaknesses.sql:76-79): per-group argmax with a
    * unique tiebreaker for determinism. Runs through Ranks.topKPerGroup:
    * a per-partition bounded-heap prune caps the shuffle at one row per
    * (partition, nation) before the exact window — identical output to
    * the plain ROW_NUMBER form (RanksSpec), 1.7× at sf0.1 and
    * shuffle-bound at cluster scale. */
  val w04 = Q(
    "w04_pergroup_top1",
    Some(
      "SELECT c_nationkey, c_custkey, c_name, c_acctbal FROM " +
        "(SELECT *, row_number() OVER (PARTITION BY c_nationkey " +
        "ORDER BY c_acctbal DESC, c_custkey) AS rn FROM customer) WHERE rn = 1"
    )
  ) { t =>
    Ranks.topKPerGroup(
      t.customer,
      keyCols = Seq("c_nationkey"),
      orderCols = Seq(("c_acctbal", false), ("c_custkey", true)),
      k = 1
    ).select("c_nationkey", "c_custkey", "c_name", "c_acctbal")
  }

  // ---- O: sorts / limits ----------------------------------------------

  /** O1 (streaks_and_rivals.sql:44-45): ORDER BY … LIMIT 1 → Spark plans
    * TakeOrderedAndProject (no global sort). */
  val o01 = Q(
    "o01_orderby_limit1",
    Some(
      "SELECT o_orderkey, o_totalprice FROM orders " +
        "ORDER BY o_totalprice DESC, o_orderkey LIMIT 1"
    )
  ) { t =>
    t.orders
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
      .limit(1)
      .select("o_orderkey", "o_totalprice")
  }

  // ---- F: scalar functions --------------------------------------------

  /** F1 (streaks_and_rivals.sql:63-67): SPLIT_PART opponent extraction. */
  val f01 = Q(
    "f01_split_part",
    Some("SELECT c_custkey, split_part(c_name, '#', 2) AS cust_num FROM customer")
  ) { t =>
    t.customer.select(
      col("c_custkey"),
      split_part(col("c_name"), lit("#"), lit(2)).as("cust_num")
    )
  }

  /** F2 (summary_by_season.sql:28): ROUND(x, n) — on exact decimal so both
    * engines round the identical value (HALF_UP ≡ half-away-from-zero). */
  val f02 = Q(
    "f02_round_decimal",
    Some(
      "SELECT l_orderkey, l_linenumber, " +
        "CAST(round(CAST(l_extendedprice AS DECIMAL(18,4)), 1) AS DOUBLE) AS price_r1 FROM lineitem"
    )
  ) { t =>
    t.lineitem.select(
      col("l_orderkey"),
      col("l_linenumber"),
      round(col("l_extendedprice").cast(Dec), 1).cast("double").as("price_r1")
    )
  }

  // ---- U/J/W/F extensions: core engine surface beyond the reference ---

  /** INTERSECT / EXCEPT set semantics (distinct, like the SQL
    * operators): customer keys ordering in both statuses vs only one. */
  val u04 = Q(
    "u04_intersect_except",
    Some(
      "WITH f AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'), " +
        "o AS (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O') " +
        "SELECT 'both' AS tag, o_custkey FROM (SELECT * FROM f INTERSECT SELECT * FROM o) " +
        "UNION ALL " +
        "SELECT 'only_f' AS tag, o_custkey FROM (SELECT * FROM f EXCEPT SELECT * FROM o)"
    )
  ) { t =>
    val f = t.orders.filter(col("o_orderstatus") === "F").select("o_custkey")
    val o = t.orders.filter(col("o_orderstatus") === "O").select("o_custkey")
    f.intersect(o).select(lit("both").as("tag"), col("o_custkey"))
      .unionAll(f.except(o).select(lit("only_f").as("tag"), col("o_custkey")))
  }

  /** NOT EXISTS correlated subquery as a left-anti join: customers that
    * never ordered. */
  val j11 = Q(
    "j11_not_exists_anti",
    Some(
      "SELECT c_custkey, c_name FROM customer c WHERE NOT EXISTS " +
        "(SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)"
    )
  ) { t =>
    t.customer
      .join(t.orders.select(col("o_custkey")),
        col("c_custkey") === col("o_custkey"), "left_anti")
      .select("c_custkey", "c_name")
  }

  /** The full rank-function family over one window: rank, dense_rank,
    * percent_rank, cume_dist, ntile — each a deterministic value given
    * the unique tiebreak (percent_rank/cume_dist are single-division
    * rationals, identical in both engines). */
  val w05 = Q(
    "w05_rank_functions",
    Some(
      "SELECT o_orderpriority, o_orderkey, " +
        "CAST(rank() OVER w AS BIGINT) AS rnk, " +
        "CAST(dense_rank() OVER w AS BIGINT) AS drnk, " +
        "percent_rank() OVER w AS prnk, " +
        "cume_dist() OVER w AS cdist, " +
        "CAST(ntile(4) OVER w AS BIGINT) AS quartile " +
        "FROM orders WINDOW w AS (PARTITION BY o_orderpriority " +
        "ORDER BY o_totalprice DESC, o_orderkey)"
    )
  ) { t =>
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    t.orders.select(
      col("o_orderpriority"), col("o_orderkey"),
      rank().over(w).cast("long").as("rnk"),
      dense_rank().over(w).cast("long").as("drnk"),
      percent_rank().over(w).as("prnk"),
      cume_dist().over(w).as("cdist"),
      ntile(4).over(w).cast("long").as("quartile")
    )
  }

  /** Date-part extraction + interval arithmetic (year/quarter/month/day
    * agree across engines; +INTERVAL on timestamps is exact). */
  val f03 = Q(
    "f03_date_parts",
    Some(
      "SELECT o_orderkey, " +
        "CAST(year(o_orderdate) AS BIGINT) AS y, " +
        "CAST(quarter(o_orderdate) AS BIGINT) AS q, " +
        "CAST(month(o_orderdate) AS BIGINT) AS m, " +
        "CAST(day(o_orderdate) AS BIGINT) AS d, " +
        "o_orderdate + INTERVAL 30 DAY AS due_ts FROM orders"
    )
  ) { t =>
    t.orders.select(
      col("o_orderkey"),
      year(col("o_orderdate")).cast("long").as("y"),
      quarter(col("o_orderdate")).cast("long").as("q"),
      month(col("o_orderdate")).cast("long").as("m"),
      dayofmonth(col("o_orderdate")).cast("long").as("d"),
      (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due_ts")
    )
  }

  val all: Seq[Q] = Seq(
    s01, s02, s05, s06, s07,
    p01, p02, p03, p04, p05, p09,
    j01, j03, j05, j09, j11, u04, w05, f03,
    a01, a03, a08, a10, a12,
    w04, o01, f01, f02
  )
}
