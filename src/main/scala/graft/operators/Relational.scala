package graft.operators

import graft.Tables
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.types.DecimalType

/** Relational operator surface (SURVEY.md §2.2–§2.8).
  *
  * Re-derives the reference's acceptance-query semantics
  * (`/root/reference/README.MD:277-327`) and batch operators
  * (`/root/reference/libs/scd2_spark_processor.py`) over the driver star
  * schema. Every query has a DuckDB oracle with identical column names
  * and a total ORDER BY for deterministic comparison.
  *
  * Cross-engine exactness rules used throughout:
  *  - SUM/AVG over doubles goes through DECIMAL(18,4): exact, associative,
  *    order-insensitive, so a 32-partition Spark sum and a single-threaded
  *    DuckDB sum agree bit-for-bit. Final values are cast back to DOUBLE
  *    (same decimal → double conversion in both engines).
  *  - Hash inputs (md5) use only string/integer columns — float→string
  *    formatting is engine-specific, int→string is not.
  *  - Timestamp comparisons go through CAST(ts AS DATE) or exact literals.
  */
object Relational {
  type Q = (SparkSession, String) => DataFrame

  /** Exact money arithmetic: double → decimal(18,4). */
  private def dec(c: Column): Column = c.cast(DecimalType(18, 4))

  // ---------------------------------------------------------------- A5/A1/A4
  // TPC-H Q1-shaped pricing summary: grouped agg with multiple sums/avgs.
  // Reference analog: revenue rollup README.MD:281-286 + op breakdown
  // scd2_spark_processor.py:221.
  private val pricingSummary: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_shipdate".cast("date") <= lit(java.sql.Date.valueOf("1998-09-01")))
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(
        sum(dec($"l_quantity")).cast("double").as("sum_qty"),
        sum(dec($"l_extendedprice")).cast("double").as("sum_base_price"),
        sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount")).cast("double").as("sum_disc_price"),
        (sum(dec($"l_quantity")).cast("double") / count(lit(1))).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy($"l_returnflag", $"l_linestatus")
  }
  private val pricingSummarySql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))) AS DOUBLE) AS sum_base_price,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS sum_disc_price,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) / COUNT(*) AS avg_qty,
      |  COUNT(*) AS count_order
      |FROM lineitem
      |WHERE CAST(l_shipdate AS DATE) <= DATE '1998-09-01'
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------- A5 (J4)
  // Category revenue rollup: the README.MD:281-286 acceptance query shape —
  // filter + join + grouped revenue + ORDER BY revenue DESC. `part` is the
  // small dimension → broadcast (no shuffle of lineitem for the join).
  private val revenueRollup: Q = (s, d) => {
    import s.implicits._
    val li = Tables.lineitem(s, d).filter($"l_returnflag" =!= "R")
    val p = Tables.part(s, d)
    li.join(broadcast(p), $"l_partkey" === $"p_partkey")
      .groupBy($"p_brand")
      .agg(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount")).cast("double").as("revenue"),
           count(lit(1)).as("n_items"))
      .orderBy($"revenue".desc, $"p_brand")
  }
  private val revenueRollupSql =
    """SELECT p_brand,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_items
      |FROM lineitem JOIN part ON l_partkey = p_partkey
      |WHERE l_returnflag <> 'R'
      |GROUP BY p_brand
      |ORDER BY revenue DESC, p_brand""".stripMargin

  // ---------------------------------------------------------------- A6
  // Filtered count+sum grouped — README.MD:318-327 federated aggregate shape.
  private val filteredCountSum: Q = (s, d) => {
    import s.implicits._
    val o = Tables.orders(s, d)
    val c = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
    o.join(broadcast(c), $"o_custkey" === $"c_custkey")
      .groupBy($"o_orderpriority")
      .agg(count(lit(1)).as("order_count"),
           sum(dec($"o_totalprice")).cast("double").as("total_revenue"))
      .orderBy($"total_revenue".desc, $"o_orderpriority")
  }
  private val filteredCountSumSql =
    """SELECT o_orderpriority, COUNT(*) AS order_count,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_revenue
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |GROUP BY o_orderpriority
      |ORDER BY total_revenue DESC, o_orderpriority""".stripMargin

  // ---------------------------------------------------------------- O1–O4
  // Ordered limit → Catalyst plans TakeOrderedAndProject (no global sort).
  private val topkOrders: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey", $"o_totalprice", $"o_orderpriority")
      .orderBy($"o_totalprice".desc, $"o_orderkey")
      .limit(25)
  }
  private val topkOrdersSql =
    """SELECT o_orderkey, o_custkey, o_totalprice, o_orderpriority
      |FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 25""".stripMargin

  // ---------------------------------------------------------------- joins
  // Inner 3-way dimension join (customer ⨝ nation ⨝ region) — broadcast both
  // dims; at 100 TB the fact side streams through unshuffled.
  private val joinInner: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .select($"c_custkey", $"c_name", $"n_name", $"r_name")
      .orderBy($"c_custkey")
  }
  private val joinInnerSql =
    """SELECT c_custkey, c_name, n_name, r_name
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |ORDER BY c_custkey""".stripMargin

  // Left outer join + grouped count (null-generating side aggregated).
  private val joinLeftCounts: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .join(Tables.orders(s, d), $"c_custkey" === $"o_custkey", "left")
      .groupBy($"c_custkey")
      .agg(count($"o_orderkey").as("n_orders"),
           coalesce(sum(dec($"o_totalprice")).cast("double"), lit(0.0)).as("spend"))
      .orderBy($"c_custkey")
  }
  private val joinLeftCountsSql =
    """SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
      |  COALESCE(CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE), 0.0) AS spend
      |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
      |GROUP BY c_custkey
      |ORDER BY c_custkey""".stripMargin

  // Left-semi join: EXISTS semantics.
  private val joinSemi: Q = (s, d) => {
    import s.implicits._
    val big = Tables.orders(s, d).filter($"o_totalprice" > 400000.0)
    Tables.customer(s, d)
      .join(big, $"c_custkey" === $"o_custkey", "left_semi")
      .select($"c_custkey", $"c_name", $"c_mktsegment")
      .orderBy($"c_custkey")
  }
  private val joinSemiSql =
    """SELECT c_custkey, c_name, c_mktsegment FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 400000.0)
      |ORDER BY c_custkey""".stripMargin

  // Left-anti join: NOT EXISTS semantics (customers with no large order —
  // the filtered right side keeps the result non-empty at every SF).
  private val joinAnti: Q = (s, d) => {
    import s.implicits._
    val big = Tables.orders(s, d).filter($"o_totalprice" > 450000.0)
    Tables.customer(s, d)
      .join(big, $"c_custkey" === $"o_custkey", "left_anti")
      .select($"c_custkey", $"c_name", $"c_nationkey")
      .orderBy($"c_custkey")
  }
  private val joinAntiSql =
    """SELECT c_custkey, c_name, c_nationkey FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey AND o_totalprice > 450000.0)
      |ORDER BY c_custkey""".stripMargin

  // Keyed range join: equi-join on the key with a residual time-range
  // predicate — the practical shape of event-correlation joins (each
  // signup × same-user events in the following hour). Catalyst plans
  // the equi part as a hash/SMJ join and applies the range residually;
  // no cartesian blowup at any scale.
  private val rangeJoin: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val signups = ev.filter($"event_type" === "signup")
      .select($"user_id", $"event_id".as("signup_event_id"), $"ts".as("signup_ts"))
    val follow = ev.select($"user_id", $"event_id", $"ts")
    signups.join(follow,
        Seq("user_id")).where($"ts" > $"signup_ts" &&
        $"ts" <= expr("signup_ts + INTERVAL 1 HOUR"))
      .groupBy($"user_id", $"signup_event_id")
      .agg(count(lit(1)).as("events_within_1h"),
        min($"event_id").as("first_follow_id"))
      .orderBy($"user_id", $"signup_event_id")
  }
  private val rangeJoinSql =
    """SELECT s.user_id, s.event_id AS signup_event_id,
      |  COUNT(*) AS events_within_1h,
      |  MIN(e.event_id) AS first_follow_id
      |FROM events s JOIN events e
      |  ON e.user_id = s.user_id
      | AND e.ts > s.ts AND e.ts <= s.ts + INTERVAL 1 HOUR
      |WHERE s.event_type = 'signup'
      |GROUP BY s.user_id, s.event_id
      |ORDER BY s.user_id, signup_event_id""".stripMargin

  // ------------------------------------------- interval overlap join
  /** KEYLESS interval-overlap join — the join class Catalyst can only
    * plan as a nested loop (`a.start ≤ b.end AND b.start ≤ a.end` has
    * no equi-conjunct), re-expressed with BIN BLOCKING + the home-bin
    * trick: every 7-day onboarding window explodes to its covered
    * days, the self-join is an EQUI-join on the day bin, and each
    * overlapping pair is kept only in the bin where its overlap
    * STARTS (`day == greatest(start_a, start_b)`) — membership in
    * that bin is exactly the overlap test, so the filter both dedups
    * (each pair surfaces once, no distinct over the pair blowup) and
    * proves overlap. Scale shape: one exchange keyed on the day bin;
    * per-bin work is (intervals covering that day)², never |A|·|B|;
    * no BroadcastNestedLoopJoin at any size. The 1-in-97 user slice
    * keeps the pair count non-degenerate at every SF. */
  private val intervalOverlap: Q = (s, d) => {
    import s.implicits._
    import org.apache.spark.sql.expressions.Window
    // COUNT-BASED pair arithmetic, not pair enumeration (r9 — the 50×
    // soak caught the day-binned self-join at α≈3: per-day density
    // grows with the corpus while the calendar doesn't, so join groups
    // and pair volume grow quadratically even though the OUTPUT is
    // only per-day counts). The overlap count is a function of the
    // per-day signup counts alone: a pair's overlap starts on the
    // LATER of the two day-0s, so with c[D] signups on day D,
    //   n_pairs(D) = C(c[D], 2)  +  c[D] · Σ c[D−6 .. D−1]
    // (same-day unordered pairs + this-day × 6-preceding-days) — an
    // exact combinatorial identity, same rows as the enumeration (the
    // oracle still enumerates; gate-scale DuckDB is fine with that).
    // Scale shape: one map-combinable daily aggregate reduces the
    // corpus to calendar-sized rows; the rolling window runs over DAYS
    // (a dim-sized single partition, like the nation dim), so the
    // query is one scan + O(days) — α≈1 by construction.
    val daily = Tables.events(s, d)
      .filter($"event_type" === "signup" && $"user_id" % 97 === 0)
      .select(expr("unix_date(cast(ts as date))").as("dd"))
      .groupBy($"dd").agg(count(lit(1)).as("c"))
    val w = Window.orderBy($"dd").rangeBetween(-6, -1)
    daily
      .withColumn("prev6", coalesce(sum($"c").over(w), lit(0L)))
      // `div`, not `/`: stays on BIGINT (the oracle column is COUNT(*))
      .select($"dd", expr("c * (c - 1) div 2 + c * prev6").as("n_pairs"))
      .filter($"n_pairs" > 0)
      .select(expr("cast(date_from_unix_date(dd) as string)").as("ostart"),
        $"n_pairs")
      .orderBy($"ostart")
  }
  private val intervalOverlapSql =
    """WITH s AS (
      |  SELECT event_id, CAST(ts AS DATE) AS d0 FROM events
      |  WHERE event_type = 'signup' AND user_id % 97 = 0),
      |p AS (
      |  SELECT GREATEST(a.d0, b.d0) AS ostart
      |  FROM s a JOIN s b ON a.event_id < b.event_id
      |    AND a.d0 <= b.d0 + 6 AND b.d0 <= a.d0 + 6)
      |SELECT CAST(ostart AS VARCHAR) AS ostart, COUNT(*) AS n_pairs
      |FROM p GROUP BY 1 ORDER BY ostart""".stripMargin

  // Full outer join: both null-generating sides at once (supplier ⟗
  // customer per nation — nations may have either side empty at small SF).
  private val joinFullOuter: Q = (s, d) => {
    import s.implicits._
    val sup = Tables.supplier(s, d).groupBy($"s_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_suppliers"))
    val cust = Tables.customer(s, d).groupBy($"c_nationkey".as("nationkey"))
      .agg(count(lit(1)).as("n_customers"))
    sup.join(cust, Seq("nationkey"), "full_outer")
      .select($"nationkey",
        coalesce($"n_suppliers", lit(0L)).as("n_suppliers"),
        coalesce($"n_customers", lit(0L)).as("n_customers"))
      .orderBy($"nationkey")
  }
  private val joinFullOuterSql =
    """SELECT COALESCE(s.nationkey, c.nationkey) AS nationkey,
      |  COALESCE(s.n_suppliers, 0) AS n_suppliers,
      |  COALESCE(c.n_customers, 0) AS n_customers
      |FROM (SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
      |      FROM supplier GROUP BY 1) s
      |FULL OUTER JOIN
      |     (SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
      |      FROM customer GROUP BY 1) c
      |  USING (nationkey)
      |ORDER BY nationkey""".stripMargin

  // Star join across the full dimension chain (J4 federation analog):
  // fact ⨝ orders shuffles on the join key once; all dims broadcast.
  private val starJoin: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .join(Tables.orders(s, d), $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(s, d)), $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "ASIA")
      .groupBy($"n_name")
      .agg(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount")).cast("double").as("revenue"),
           count(lit(1)).as("n_lineitems"))
      .orderBy($"revenue".desc, $"n_name")
  }
  private val starJoinSql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4)) * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |  COUNT(*) AS n_lineitems
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |WHERE r_name = 'ASIA'
      |GROUP BY n_name
      |ORDER BY revenue DESC, n_name""".stripMargin

  // ---------------------------------------------------------------- W1
  // lead() over keyed event-time order — the SCD2 next-version pointer
  // (scd2_spark_processor.py:322-331). Tie-broken by event_id so the frame
  // is total (SURVEY §7.4.7).
  private val windowLead: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .select($"user_id", $"event_id", $"event_type", $"value",
        lead($"event_type", 1).over(w).as("next_type"),
        lead($"event_id", 1).over(w).as("next_event_id"))
      .orderBy($"user_id", $"event_id")
  }
  private val windowLeadSql =
    """SELECT user_id, event_id, event_type, value,
      |  LEAD(event_type, 1) OVER w AS next_type,
      |  LEAD(event_id, 1) OVER w AS next_event_id
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  // ---------------------------------------------------------------- W2/J3
  // Arg-max per key — Pinot upsert "last-write-wins by comparison column"
  // (pinot_tables.yaml:32-36) as row_number over desc order.
  private val argmaxLatest: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(s, d)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", $"value")
      .orderBy($"user_id")
  }
  private val argmaxLatestSql =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events) t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // ---------------------------------------------------------------- U1
  // Union of two shaped streams with an operation_type tag —
  // scd2_spark_processor.py:253-258 (engine uses unionByName, SURVEY §2.7).
  private val unionOps: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val upserts = ev.filter($"event_type".isin("click", "view", "purchase"))
      .select($"event_id", $"user_id", lit("UPSERT").as("operation_type"))
    val deletes = ev.filter($"event_type" === "error")
      .select($"event_id", $"user_id", lit("DELETE").as("operation_type"))
    upserts.unionByName(deletes).orderBy($"event_id")
  }
  private val unionOpsSql =
    """SELECT event_id, user_id, 'UPSERT' AS operation_type FROM events
      |WHERE event_type IN ('click','view','purchase')
      |UNION ALL
      |SELECT event_id, user_id, 'DELETE' AS operation_type FROM events
      |WHERE event_type = 'error'
      |ORDER BY event_id""".stripMargin

  // ---------------------------------------------------------------- A7
  private val distinctPairs: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select($"user_id", $"event_type").distinct()
      .orderBy($"user_id", $"event_type")
  }
  private val distinctPairsSql =
    """SELECT DISTINCT user_id, event_type FROM events
      |ORDER BY user_id, event_type""".stripMargin

  // ---------------------------------------------------------------- F1–F3
  // Record fingerprint: md5(concat_ws('|', coalesce(...))) — the exact
  // SCD2 hash recipe (scd2_spark_processor.py:306-314) incl. the '|'
  // separator and empty-string coalesce. String/int inputs only (§ header).
  private val hashFingerprint: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .select($"c_custkey",
        md5(concat_ws("|",
          coalesce($"c_name", lit("")),
          coalesce($"c_mktsegment", lit("")),
          coalesce($"c_custkey".cast("string"), lit("")),
          coalesce($"c_nationkey".cast("string"), lit("")))).as("record_hash"))
      .orderBy($"c_custkey")
  }
  private val hashFingerprintSql =
    """SELECT c_custkey,
      |  md5(concat_ws('|', COALESCE(c_name,''), COALESCE(c_mktsegment,''),
      |      COALESCE(CAST(c_custkey AS VARCHAR),''), COALESCE(CAST(c_nationkey AS VARCHAR),''))) AS record_hash
      |FROM customer ORDER BY c_custkey""".stripMargin

  // ---------------------------------------------------------------- F9/F10
  // Date bucketing + epoch math — dt partition key derivation
  // (cdc_to_parquet.py:202) and ts_ms→timestamp (F9).
  private val dateBuckets: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .select(date_format($"o_orderdate", "yyyy-MM").as("ym"),
        unix_timestamp($"o_orderdate").as("epoch_s"),
        $"o_orderkey")
      .groupBy($"ym")
      .agg(count(lit(1)).as("n_orders"),
           min($"epoch_s").as("min_epoch"),
           max($"epoch_s").as("max_epoch"))
      .orderBy($"ym")
  }
  private val dateBucketsSql =
    """SELECT strftime(o_orderdate, '%Y-%m') AS ym, COUNT(*) AS n_orders,
      |  CAST(FLOOR(MIN(epoch(o_orderdate))) AS BIGINT) AS min_epoch,
      |  CAST(FLOOR(MAX(epoch(o_orderdate))) AS BIGINT) AS max_epoch
      |FROM orders GROUP BY 1 ORDER BY ym""".stripMargin

  // ---------------------------------------------------------------- F6/F7
  // CASE WHEN op decode (cdc_to_pinot_current.py:258-264) + boolean flag
  // derivation (op='d' → is_delete, :216).
  private val caseDecode: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select(
        when($"event_type" === "click", "CLICKED")
          .when($"event_type" === "view", "VIEWED")
          .when($"event_type" === "purchase", "PURCHASED")
          .when($"event_type" === "signup", "SIGNED_UP")
          .otherwise("OTHER").as("decoded"),
        ($"event_type" === "error").as("is_error"))
      .groupBy($"decoded", $"is_error")
      .agg(count(lit(1)).as("n"))
      .orderBy($"decoded", $"is_error")
  }
  private val caseDecodeSql =
    """SELECT CASE WHEN event_type = 'click' THEN 'CLICKED'
      |            WHEN event_type = 'view' THEN 'VIEWED'
      |            WHEN event_type = 'purchase' THEN 'PURCHASED'
      |            WHEN event_type = 'signup' THEN 'SIGNED_UP'
      |            ELSE 'OTHER' END AS decoded,
      |       (event_type = 'error') AS is_error,
      |       COUNT(*) AS n
      |FROM events GROUP BY 1, 2 ORDER BY decoded, is_error""".stripMargin

  // ---------------------------------------------------------------- A2/A3
  // Global max/min/count — checkpoint advance scan
  // (scd2_spark_processor.py:496-499).
  private val globalAggs: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .agg(count(lit(1)).as("n_events"),
        min($"event_id").as("min_id"),
        max($"event_id").as("max_id"),
        max(unix_timestamp($"ts")).as("max_epoch_s"),
        countDistinct($"user_id").as("n_users"))
  }
  private val globalAggsSql =
    """SELECT COUNT(*) AS n_events, MIN(event_id) AS min_id,
      |  MAX(event_id) AS max_id, CAST(FLOOR(MAX(epoch(ts))) AS BIGINT) AS max_epoch_s,
      |  COUNT(DISTINCT user_id) AS n_users
      |FROM events""".stripMargin

  // ---------------------------------------------------------------- A1
  private val opBreakdown: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d).groupBy($"event_type").count().orderBy($"event_type")
  }
  private val opBreakdownSql =
    """SELECT event_type, COUNT(*) AS count FROM events
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // ---------------------------------------------------------------- P6
  // Incremental checkpoint predicate: strictly-greater event-time filter
  // (scd2_spark_processor.py:211-213) — applied to the RAW nanos column
  // so it reaches the parquet scan as a PushedFilter (row-group pruning;
  // a filter on the rebuilt timestamp column would not push). Pinned by
  // PlanSpec.
  private val incrementalFilter: Q = (s, d) => {
    import s.implicits._
    val ckNanos = java.time.LocalDateTime.parse("2024-01-15T00:00:00")
      .toEpochSecond(java.time.ZoneOffset.UTC) * 1000000000L
    val raw = Tables.load(s, d, "events")
    val pruned = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType => raw.filter($"ts" > ckNanos)
      case _ => raw.filter($"ts" > lit("2024-01-15 00:00:00").cast("timestamp_ntz"))
    }
    Tables.eventsTimestamps(pruned)
      .groupBy($"event_type")
      .agg(count(lit(1)).as("n"), min($"event_id").as("min_id"), max($"event_id").as("max_id"))
      .orderBy($"event_type")
  }
  private val incrementalFilterSql =
    """SELECT event_type, COUNT(*) AS n, MIN(event_id) AS min_id, MAX(event_id) AS max_id
      |FROM events WHERE ts > TIMESTAMP '2024-01-15 00:00:00'
      |GROUP BY event_type ORDER BY event_type""".stripMargin

  // --------------------------------------------------------- rollup
  // Hierarchical aggregate (engine surface beyond the reference's flat
  // GROUP BY — SURVEY §2.4 notes Catalyst provides it): region → nation
  // subtotals + grand total. NULL grouping keys are the subtotal rows.
  private val rollup: Q = (s, d) => {
    import s.implicits._
    Tables.customer(s, d)
      .join(broadcast(Tables.nation(s, d)), $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .rollup($"r_name", $"n_name")
      .agg(count(lit(1)).as("n_customers"),
        sum(dec($"c_acctbal")).cast("double").as("total_acctbal"))
      .orderBy($"r_name".asc_nulls_first, $"n_name".asc_nulls_first)
  }
  private val rollupSql =
    """SELECT r_name, n_name, COUNT(*) AS n_customers,
      |  CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_acctbal
      |FROM customer
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY ROLLUP (r_name, n_name)
      |ORDER BY r_name ASC NULLS FIRST, n_name ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------- window frames
  // Full analytic-window surface beyond lead (SURVEY §2.5): lag, rank,
  // and an explicit rowsBetween running frame over keyed event time.
  private val windowFrames: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .select($"user_id", $"event_id",
        lag($"event_id", 1).over(w).as("prev_event_id"),
        row_number().over(w).as("seq"),
        sum(dec($"value")).over(w.rowsBetween(Window.unboundedPreceding, 0))
          .cast("double").as("running_value"),
        rank().over(Window.partitionBy($"user_id").orderBy($"value".desc, $"event_id"))
          .as("value_rank"))
      .orderBy($"user_id", $"event_id")
  }
  private val windowFramesSql =
    """SELECT user_id, event_id,
      |  LAG(event_id, 1) OVER w AS prev_event_id,
      |  ROW_NUMBER() OVER w AS seq,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4)))
      |    OVER (w ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
      |    AS running_value,
      |  RANK() OVER (PARTITION BY user_id ORDER BY value DESC, event_id)
      |    AS value_rank
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------------ as-of lookup
  // Point-in-time state (the time-travel query shape, README.MD:308-313,
  // SURVEY D7): per key, the last event at or before the cutoff — an
  // as-of join of a constant probe time against the event history.
  private val asofState: Q = (s, d) => {
    import s.implicits._
    val cutoff = lit("2024-01-20 00:00:00").cast("timestamp_ntz")
    val w = Window.partitionBy($"user_id").orderBy($"ts".desc, $"event_id".desc)
    Tables.events(s, d)
      .filter($"ts" <= cutoff)
      .withColumn("rn", row_number().over(w))
      .filter($"rn" === 1)
      .select($"user_id", $"event_id", $"event_type", $"value")
      .orderBy($"user_id")
  }
  private val asofStateSql =
    """SELECT user_id, event_id, event_type, value FROM (
      |  SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id
      |    ORDER BY ts DESC, event_id DESC) AS rn
      |  FROM events WHERE ts <= TIMESTAMP '2024-01-20 00:00:00') t
      |WHERE rn = 1 ORDER BY user_id""".stripMargin

  // --------------------------------------------------- session windows
  // Gaps-and-islands sessionization (30-min inactivity gap): lag → gap
  // flag → running session id → per-session rollup. The batch analog of
  // streaming session windows; one keyed shuffle, windows all reuse the
  // same (user_id, ts) sort.
  private val sessions: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .withColumn("prev_ts", lag($"ts", 1).over(w))
      .withColumn("new_session",
        when($"prev_ts".isNull ||
          unix_micros($"ts".cast("timestamp")) - unix_micros($"prev_ts".cast("timestamp")) > 1800L * 1000000L, 1L)
          .otherwise(0L))
      .withColumn("session_id", sum($"new_session").over(
        w.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy($"user_id", $"session_id")
      .agg(count(lit(1)).as("n_events"),
        min($"event_id").as("first_event"),
        max($"event_id").as("last_event"),
        (unix_micros(max($"ts").cast("timestamp")) -
          unix_micros(min($"ts").cast("timestamp"))).as("duration_us"))
      .orderBy($"user_id", $"session_id")
  }
  private val sessionsSql =
    """WITH flagged AS (
      |  SELECT user_id, event_id, ts,
      |    CASE WHEN LAG(ts) OVER w IS NULL
      |           OR epoch_us(ts) - epoch_us(LAG(ts) OVER w) > 1800000000
      |         THEN 1 ELSE 0 END AS new_session
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
      |sessioned AS (
      |  SELECT *, CAST(SUM(new_session) OVER (PARTITION BY user_id
      |    ORDER BY ts, event_id ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |    AS BIGINT) AS session_id
      |  FROM flagged)
      |SELECT user_id, session_id, COUNT(*) AS n_events,
      |  MIN(event_id) AS first_event, MAX(event_id) AS last_event,
      |  CAST(epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS BIGINT) AS duration_us
      |FROM sessioned
      |GROUP BY user_id, session_id
      |ORDER BY user_id, session_id""".stripMargin

  // ------------------------------------------------------------- cube
  // Grouping-sets lattice over two dimensions (all four subsets).
  private val cube: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .cube($"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec($"o_totalprice")).cast("double").as("revenue"))
      .orderBy($"o_orderstatus".asc_nulls_first, $"o_orderpriority".asc_nulls_first)
  }
  private val cubeSql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM orders
      |GROUP BY CUBE (o_orderstatus, o_orderpriority)
      |ORDER BY o_orderstatus ASC NULLS FIRST, o_orderpriority ASC NULLS FIRST""".stripMargin

  // ------------------------------------------------- exact percentiles
  // Exact continuous percentiles (linear interpolation on the sorted
  // values — same definition in both engines).
  private val percentiles: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .agg(expr("percentile(o_totalprice, 0.5)").as("median_price"),
        expr("percentile(o_totalprice, 0.9)").as("p90_price"),
        count(lit(1)).as("n"))
      .orderBy($"o_orderpriority")
  }
  private val percentilesSql =
    """SELECT o_orderpriority,
      |  quantile_cont(o_totalprice, 0.5) AS median_price,
      |  quantile_cont(o_totalprice, 0.9) AS p90_price,
      |  COUNT(*) AS n
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // --------------------------------------------------- string functions
  private val stringFuncs: Q = (s, d) => {
    import s.implicits._
    Tables.part(s, d)
      .select($"p_partkey",
        upper($"p_brand").as("brand_upper"),
        lower($"p_type").as("type_lower"),
        substring($"p_name", 1, 5).as("name_prefix"),
        length($"p_name").as("name_len"),
        regexp_replace($"p_type", " ", "_").as("type_snake"),
        lpad($"p_partkey".cast("string"), 8, "0").as("key_padded"),
        concat($"p_brand", lit(":"), $"p_type").as("brand_type"))
      .orderBy($"p_partkey")
  }
  private val stringFuncsSql =
    """SELECT p_partkey,
      |  upper(p_brand) AS brand_upper,
      |  lower(p_type) AS type_lower,
      |  substr(p_name, 1, 5) AS name_prefix,
      |  length(p_name) AS name_len,
      |  replace(p_type, ' ', '_') AS type_snake,
      |  lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS key_padded,
      |  p_brand || ':' || p_type AS brand_type
      |FROM part ORDER BY p_partkey""".stripMargin

  // -------------------------------------------------- null semantics
  // Null-safe equality (<=> / IS NOT DISTINCT FROM), NULLIF, and
  // null-aware aggregation over the lead column (last event per user
  // has a null pointer).
  private val nullSemantics: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
    Tables.events(s, d)
      .withColumn("next_type", lead($"event_type", 1).over(w))
      .groupBy($"user_id")
      .agg(
        sum(when($"event_type" <=> $"next_type", 1L).otherwise(0L)).as("n_repeat_pairs"),
        count($"next_type").as("n_with_next"),
        count(lit(1)).as("n"),
        countDistinct(nullif($"event_type", lit("error"))).as("n_types_sans_error"))
      .orderBy($"user_id")
  }
  private val nullSemanticsSql =
    """WITH x AS (
      |  SELECT user_id, event_type,
      |    LEAD(event_type, 1) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |      AS next_type
      |  FROM events)
      |SELECT user_id,
      |  CAST(SUM(CASE WHEN event_type IS NOT DISTINCT FROM next_type
      |       THEN 1 ELSE 0 END) AS BIGINT) AS n_repeat_pairs,
      |  COUNT(next_type) AS n_with_next,
      |  COUNT(*) AS n,
      |  COUNT(DISTINCT NULLIF(event_type, 'error')) AS n_types_sans_error
      |FROM x GROUP BY user_id ORDER BY user_id""".stripMargin

  // ------------------------------------------------- approx aggregates
  // HLL++ sketch surface (SURVEY §2.4: approx aggregates "come free").
  // The raw sketch estimate can't be hash-compared across engines
  // (implementations differ by design), so the gated output carries the
  // exact aggregates plus a DETERMINISTIC error-bound verdict: HLL++ is
  // a pure function of the input multiset, so `within_5pct` is stable
  // run-to-run and the oracle asserts it TRUE — the sketch's accuracy
  // contract is checked as data instead of dropping to rows-only.
  private val approxDistinct: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .groupBy($"event_type")
      // rsd 0.01 so the 5% verdict is a 5-sigma bound (~3e-7 per group)
      // — robust to fixture regeneration, not just to this corpus
      .agg(approx_count_distinct($"user_id", 0.01).as("approx_users"),
        countDistinct($"user_id").as("exact_users"),
        count(lit(1)).as("n"))
      .select($"event_type", $"exact_users", $"n",
        (abs($"approx_users" - $"exact_users").cast("double") / $"exact_users"
          <= 0.05).as("within_5pct"))
      .orderBy($"event_type")
  }
  private val approxDistinctSql =
    """SELECT event_type, COUNT(DISTINCT user_id) AS exact_users,
      |  COUNT(*) AS n, TRUE AS within_5pct
      |FROM events GROUP BY 1 ORDER BY event_type""".stripMargin

  // ------------------------------------------- mergeable HLL sketches
  /** Distinct-count SKETCH MERGE (Apache DataSketches HLL via Spark's
    * hll_sketch_agg / hll_union_agg): per-event-type sketches built
    * independently — the per-shard pattern that makes distinct counts
    * tractable at 100 TB, where exact COUNT(DISTINCT) is a full
    * shuffle of every key but sketches partial-aggregate to lgK=12
    * register arrays per map task and merge associatively. The gate
    * carries the exact counts plus the MERGE LAW as a DETERMINISTIC
    * verdict (the rel_approx_distinct / rel_heavy_hitters recipe, since
    * sketch internals hash differently across engines): the union of
    * the per-type sketches must estimate the global count EXACTLY as a
    * directly-built global sketch does — HLL union is register-wise
    * max, so same lgK + same hash ⇒ identical registers ⇒ identical
    * estimate, a pure function of the input multiset with zero
    * tolerance. The former per-scope `estimate within 5% of exact`
    * verdict was a PROBABILISTIC claim baked into a deterministic
    * oracle as TRUE (at lgK=12 the rse is ~1.6%, so 5% is only ~3σ
    * once a scope leaves exact sparse mode ~4k distincts — a per-build
    * coin flip at larger SFs); the tolerance check lives in
    * RelationalSpec now, where a failure names the bound it broke. */
  private val sketchUnion: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d)
    val perType = ev.groupBy($"event_type")
      .agg(hll_sketch_agg($"user_id", lit(12)).as("sk"),
        countDistinct($"user_id").as("exact_users"))
    val merged = perType.agg(
      hll_sketch_estimate(hll_union_agg($"sk", lit(false))).as("est_merged"))
    // The reference side is a union over HASH-SHARDED sketches, not a
    // directly-built global sketch — r11 sf0.1 finding: a streamed
    // DataSketches HLL estimates with the HIP accumulator but a union
    // RESULT falls back to the register-only composite estimator, so
    // "identical registers" stops implying "identical estimate" once
    // the sketches leave coupon-exact mode (1500 distincts at sf0.1:
    // direct 1499 vs merged 1488; the sf0.01 gate sat in exact mode
    // and never saw it). A single-sketch union does NOT fix it — the
    // first update to an empty union COPIES the sketch, HIP state
    // included. The deterministic merge law is SPLIT-INVARIANCE:
    // register-wise max over any partition of the same value multiset
    // yields the same registers, and two genuine (≥2-input) unions
    // both estimate with the composite estimator — so
    // union(by event_type) ≡ union(by user-hash shard) exactly, at
    // any SF (verified sf0.01 + sf0.1).
    val globalDirect = ev
      .groupBy(pmod(xxhash64($"user_id"), lit(2)).as("shard"))
      .agg(hll_sketch_agg($"user_id", lit(12)).as("gsk"),
        countDistinct($"user_id").as("exact_shard"))
      .agg(hll_sketch_estimate(hll_union_agg($"gsk", lit(false))).as("est_direct"),
        sum($"exact_shard").as("exact_global")) // shards partition users: sum is exact
    val typeRows = perType
      .select($"event_type".as("scope"), $"exact_users",
        lit(true).as("merge_law"))
    val allRow = merged.crossJoin(broadcast(globalDirect))
      .select(lit("ALL").as("scope"), $"exact_global".as("exact_users"),
        ($"est_merged" === $"est_direct").as("merge_law"))
    typeRows.unionByName(allRow).orderBy($"scope")
  }
  private val sketchUnionSql =
    """SELECT event_type AS scope, COUNT(DISTINCT user_id) AS exact_users,
      |  TRUE AS merge_law
      |FROM events GROUP BY 1
      |UNION ALL
      |SELECT 'ALL', COUNT(DISTINCT user_id), TRUE FROM events
      |ORDER BY scope""".stripMargin

  // --------------------------------------------- count-min heavy hitters
  // Count-min sketch (the streaming heavy-hitter sketch) built and
  // queried relationally: depth×width counter grid from one pass
  // (explode ×d, hash-bucket aggregate — map-side combinable, output
  // d·w tiny regardless of input), point estimates = min over the d
  // bucket counters. The raw estimate hashes differently across engines
  // (xxhash64 seeds), so — like rel_approx_distinct — the gate carries
  // the exact counts plus the two DETERMINISTIC sketch laws as data:
  // CMS never underestimates, and a WIDENED ε-bound est ≤ exact +
  // 2e·N/w holds (both pure functions of the input). The widened bound
  // at depth 6 makes a legitimate violation a ≤(2e)^-6 ≈ 4e-5 per-item
  // event (~8e-4 across 20 hitters) — stable under fixture
  // regeneration, unlike the classic e·N/w bound whose ~e^-4 per-item
  // tail gave ~30% failure odds across 20 on fresh data. At 100 TB the
  // sketch aggregate is the only full-data pass and it
  // partial-aggregates to d·w counters per map task.
  // ------------------------------------------------------- 2-D skyline
  /** Skyline / Pareto frontier (dominance query): the (order date,
    * total price) points no other point dominates — latest-and-cheapest
    * order profiles. A new operator FAMILY for the board: dominance is
    * not expressible as a groupBy/join/window over keys, and the naive
    * form is an O(n²) NOT-EXISTS self-join. The 2-D case collapses to a
    * sorted prefix scan — sort by (date DESC, price ASC), keep a point
    * iff its price strictly undercuts the running minimum — but a bare
    * cumulative window over that total order is a SINGLE-REDUCER plan.
    * Here it runs as a DISTRIBUTED PREFIX SCAN (the classic two-phase
    * scan): range-partition on the total order, cumulative min WITHIN
    * each partition (`Window.partitionBy(pid)` — parallel), then the
    * per-partition minima (numPartitions rows, metadata-scale like the
    * manifest/zone collects) broadcast back as each partition's
    * exclusive prefix. Correct for ANY range boundary sampling — the
    * prefix mins are computed from the partitions that actually
    * materialized. Dedup to distinct (date, price) first so dominance
    * ties (exact duplicates, which dominate nothing) fold into the
    * carried count. DECIMAL prices: the strict `<` is exact in both
    * engines. */
  /** The pre-checkpoint local-frontier pipeline, exposed separately so
    * PlanSpec can pin its shape (the checkpoint below is eager and
    * hides the window/range stages from the final query's plan). */
  private[graft] def skylineLocalCandidates(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    val pts = Tables.orders(s, d)
      .select($"o_orderdate".cast("date").as("od"),
        dec($"o_totalprice").as("price"))
      .groupBy($"od", $"price").agg(count(lit(1)).as("n_orders"))
    val parted = pts.repartitionByRange(32, $"od".desc, $"price".asc)
      .sortWithinPartitions($"od".desc, $"price".asc)
      .withColumn("pid", spark_partition_id())
    val w = Window.partitionBy($"pid").orderBy($"od".desc, $"price".asc)
      .rowsBetween(Window.unboundedPreceding, -1)
    parted.withColumn("lmin", min($"price").over(w))
      .filter($"lmin".isNull || $"price" < $"lmin")
  }
  private val skyline: Q = (s, d) => {
    import s.implicits._
    // Local frontier candidates (price strictly under the running
    // partition min), then localCheckpoint: the checkpoint PINS the
    // (pid → rows) assignment so the minima collect below and the
    // final filter read the SAME materialization — without it the two
    // executions can range-partition differently (AQE/sampling) and
    // the prefix map desynchronizes from the pids. The checkpoint is
    // frontier-per-partition-sized (the descending-min chain), never
    // the fact-sized input — safe at any scale.
    val local = skylineLocalCandidates(s, d).localCheckpoint()
    // exclusive prefix min per partition: numPartitions rows (the
    // partition's overall min survives the local filter by definition)
    val mins = local.groupBy($"pid").agg(min($"price").as("m"))
      .collect().map(r => r.getInt(0) -> r.getDecimal(1)).sortBy(_._1)
    // collect (not map): an empty input yields a single 1-element
    // sliding window, which must fold to an empty prefix list, not a
    // MatchError
    val prefix = mins.scanLeft((-1, null: java.math.BigDecimal)) {
      case ((_, acc), (pid, m)) =>
        (pid, if (acc == null || (m != null && m.compareTo(acc) < 0)) m else acc)
    }.sliding(2).collect { case Array((_, accBefore), (pid, _)) =>
      (pid, accBefore)
    }.toSeq
    val preDf = s.createDataFrame(
      s.sparkContext.parallelize(prefix.map { case (pid, m) =>
        org.apache.spark.sql.Row(pid, m) }, 1),
      new org.apache.spark.sql.types.StructType()
        .add("pid", "int", nullable = false)
        .add("gmin", DecimalType(18, 4), nullable = true))
    local.join(broadcast(preDf), "pid")
      .filter($"gmin".isNull || $"price" < $"gmin")
      .select($"od".cast("string").as("od"),
        $"price".cast("double").as("price"), $"n_orders")
      .orderBy($"od".desc)
  }
  private val skylineSql =
    """WITH pts AS (
      |  SELECT CAST(o_orderdate AS DATE) AS od,
      |    CAST(o_totalprice AS DECIMAL(18,4)) AS price, COUNT(*) AS n_orders
      |  FROM orders GROUP BY 1, 2),
      |sky AS (
      |  SELECT * FROM pts p WHERE NOT EXISTS (
      |    SELECT 1 FROM pts q
      |    WHERE q.od >= p.od AND q.price <= p.price
      |      AND (q.od > p.od OR q.price < p.price)))
      |SELECT CAST(od AS VARCHAR) AS od, CAST(price AS DOUBLE) AS price,
      |  n_orders
      |FROM sky ORDER BY od DESC""".stripMargin

  private val heavyHitters: Q = (s, d) => {
    import s.implicits._
    val depth = 6; val width = 256
    val ev = Tables.events(s, d).select($"user_id")
    val seeds = array((1 to depth).map(lit): _*)
    val sketch = ev
      .select($"user_id", explode(seeds).as("i"))
      .select($"i", pmod(xxhash64($"user_id", $"i"), lit(width)).as("b"))
      .groupBy($"i", $"b").agg(count(lit(1)).as("c"))
    val exact = ev.groupBy($"user_id").agg(count(lit(1)).as("exact_n"))
      .orderBy($"exact_n".desc, $"user_id").limit(20)
    val n = ev.agg(count(lit(1)).as("n_total"))
    exact
      .select($"user_id", $"exact_n", explode(seeds).as("i"))
      .select($"user_id", $"exact_n", $"i",
        pmod(xxhash64($"user_id", $"i"), lit(width)).as("b"))
      .join(broadcast(sketch), Seq("i", "b"))
      .groupBy($"user_id", $"exact_n").agg(min($"c").as("est"))
      .crossJoin(broadcast(n))
      .select($"user_id", $"exact_n",
        ($"est" >= $"exact_n").as("never_underestimates"),
        ($"est" <= $"exact_n" + ceil(lit(2 * math.E) * $"n_total" / lit(width))
          .cast("long")).as("within_bound"))
      .orderBy($"exact_n".desc, $"user_id")
  }
  private val heavyHittersSql =
    """WITH x AS (
      |  SELECT user_id, COUNT(*) AS exact_n FROM events
      |  GROUP BY 1 ORDER BY exact_n DESC, user_id LIMIT 20)
      |SELECT user_id, exact_n,
      |  TRUE AS never_underestimates, TRUE AS within_bound
      |FROM x ORDER BY exact_n DESC, user_id""".stripMargin

  // ------------------------------------------------------- as-of join
  // True point-in-time join: each event picks the latest order of the
  // same key at-or-before its timestamp (the reference's Pinot
  // "state as of" lookup generalized to two tables; README.MD:288-295).
  // Spark-first shape: NOT a range join — union both sides tagged,
  // ONE shuffle on the key, then a running last() per key in event-time
  // order (the merge-asof plan; linear per partition, no quadratic
  // candidate set, survives 100× both sides). Orders sort before events
  // at equal timestamps so "at-or-before" is inclusive; o_orderkey is
  // the tiebreak among equal-time orders — total order, both engines.
  private val asofJoin: Q = (s, d) => {
    import s.implicits._
    val ords = Tables.orders(s, d).select(
      $"o_custkey".as("k"), $"o_orderdate".cast("timestamp_ntz").as("t"),
      $"o_orderkey".as("okey"), $"o_totalprice".as("oprice"),
      lit(0).as("is_event"), lit(null).cast("long").as("event_id"),
      lit(null).cast("string").as("event_type"))
    val evs = Tables.events(s, d).select(
      $"user_id".as("k"), $"ts".as("t"),
      lit(null).cast("long").as("okey"), lit(null).cast("double").as("oprice"),
      lit(1).as("is_event"), $"event_id", $"event_type")
    val w = Window.partitionBy($"k").orderBy($"t", $"is_event", $"okey")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ords.unionByName(evs)
      .withColumn("last_order_key", last($"okey", ignoreNulls = true).over(w))
      .withColumn("last_order_price", last($"oprice", ignoreNulls = true).over(w))
      .filter($"is_event" === 1)
      .select($"event_id", $"k".as("user_id"), $"event_type",
        $"last_order_key", $"last_order_price")
      .orderBy($"event_id")
  }
  private val asofJoinSql =
    """WITH u AS (
      |  SELECT o_custkey AS k, o_orderdate AS t, o_orderkey AS okey,
      |         o_totalprice AS oprice, 0 AS is_event,
      |         CAST(NULL AS BIGINT) AS event_id, CAST(NULL AS VARCHAR) AS event_type
      |  FROM orders
      |  UNION ALL
      |  SELECT user_id, ts, CAST(NULL AS BIGINT), CAST(NULL AS DOUBLE), 1,
      |         event_id, event_type
      |  FROM events)
      |SELECT event_id, k AS user_id, event_type,
      |  LAST_VALUE(okey IGNORE NULLS) OVER w AS last_order_key,
      |  LAST_VALUE(oprice IGNORE NULLS) OVER w AS last_order_price
      |FROM u
      |WINDOW w AS (PARTITION BY k ORDER BY t, is_event, okey
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |QUALIFY is_event = 1
      |ORDER BY event_id""".stripMargin

  // ------------------------------------------------------ set operations
  // INTERSECT / EXCEPT (distinct set semantics in both engines): segment
  // customers who have an open order but no large order. Spark plans
  // both as aggregated joins — shuffle on the single key column.
  private val setOps: Q = (s, d) => {
    import s.implicits._
    val building = Tables.customer(s, d)
      .filter($"c_mktsegment" === "BUILDING").select($"c_custkey".as("custkey"))
    val open = Tables.orders(s, d)
      .filter($"o_orderstatus" === "O").select($"o_custkey".as("custkey"))
    val big = Tables.orders(s, d)
      // 450000: keeps the EXCEPT leg selective at every fixture SF —
      // at 300000 it swallowed the whole intersection at sf0.001
      .filter($"o_totalprice" > 450000.0).select($"o_custkey".as("custkey"))
    building.intersect(open).except(big).orderBy($"custkey")
  }
  private val setOpsSql =
    """SELECT c_custkey AS custkey FROM customer WHERE c_mktsegment = 'BUILDING'
      |INTERSECT
      |SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
      |EXCEPT
      |SELECT o_custkey FROM orders WHERE o_totalprice > 450000.0
      |ORDER BY custkey""".stripMargin

  // ------------------------------------------------------------- pivot
  // Pivot (crosstab): order counts by priority × status. Explicit pivot
  // values keep the output schema static (no extra distinct-values job,
  // and the plan is a single hash aggregate — exactly the CASE/FILTER
  // formulation the oracle uses). Missing combinations are 0, not null,
  // to match FILTER-count semantics.
  private val pivotStatus: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .groupBy($"o_orderpriority")
      .pivot("o_orderstatus", Seq("F", "O", "P"))
      .agg(count(lit(1)))
      .select($"o_orderpriority",
        coalesce($"F", lit(0L)).as("status_f"),
        coalesce($"O", lit(0L)).as("status_o"),
        coalesce($"P", lit(0L)).as("status_p"))
      .orderBy($"o_orderpriority")
  }
  private val pivotStatusSql =
    """SELECT o_orderpriority,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'F') AS status_f,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'O') AS status_o,
      |  COUNT(*) FILTER (WHERE o_orderstatus = 'P') AS status_p
      |FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""".stripMargin

  // ------------------------------------------------------ ranking windows
  // rank / dense_rank / ntile / percent_rank / cume_dist over a
  // tie-broken total order (c_custkey tiebreak makes every position —
  // and therefore every ntile bucket — deterministic across engines).
  // percent_rank and cume_dist are exact ratios of identical integers,
  // so the doubles agree bit-for-bit.
  private val windowRanks: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"c_mktsegment").orderBy($"c_acctbal", $"c_custkey")
    Tables.customer(s, d)
      .select($"c_mktsegment", $"c_custkey", $"c_acctbal",
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy($"c_mktsegment", $"c_custkey")
  }
  private val windowRanksSql =
    """SELECT c_mktsegment, c_custkey, c_acctbal,
      |  RANK() OVER w AS rnk,
      |  DENSE_RANK() OVER w AS drnk,
      |  NTILE(4) OVER w AS quartile,
      |  PERCENT_RANK() OVER w AS pct_rank,
      |  CUME_DIST() OVER w AS cume
      |FROM customer
      |WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
      |ORDER BY c_mktsegment, c_custkey""".stripMargin

  // ------------------------------------------- higher-order array functions
  // transform / filter / aggregate / array_distinct over tokenized text —
  // the codegen'd lambda surface (no UDFs; SURVEY §2.11). Pure map over
  // the scan: no shuffle, scales linearly.
  private val arrayFuncs: Q = (s, d) => {
    import s.implicits._
    Tables.documents(s, d)
      .select($"doc_id", split($"text", " ").as("ws"))
      .select($"doc_id",
        size($"ws").cast("long").as("n_tokens"),
        size(filter($"ws", x => length(x) > 4)).cast("long").as("n_long"),
        aggregate(transform($"ws", x => length(x)), lit(0), (a, x) => a + x)
          .cast("long").as("sum_len"),
        size(array_distinct($"ws")).cast("long").as("n_distinct"),
        array_max(transform($"ws", x => length(x))).cast("long").as("max_len"))
      .orderBy($"doc_id")
  }
  private val arrayFuncsSql =
    """SELECT doc_id,
      |  len(ws) AS n_tokens,
      |  CAST(len(list_filter(ws, x -> length(x) > 4)) AS BIGINT) AS n_long,
      |  CAST(list_sum(list_transform(ws, x -> length(x))) AS BIGINT) AS sum_len,
      |  CAST(len(list_distinct(ws)) AS BIGINT) AS n_distinct,
      |  CAST(list_max(list_transform(ws, x -> length(x))) AS BIGINT) AS max_len
      |FROM (SELECT doc_id, string_split(text, ' ') AS ws FROM documents)
      |ORDER BY doc_id""".stripMargin

  // ----------------------------------------------- TPC-H Q3 shipping priority
  // The classic 3-way join + grouped revenue + ordered limit, with the
  // plan you'd want at scale: the segment-filtered dimension broadcasts,
  // the orders⋈lineitem fact join shuffles on the order key, and the
  // final top-10 is TakeOrderedAndProject (no global sort).
  private val shippingPriority: Q = (s, d) => {
    import s.implicits._
    // tz-independent literal: Timestamp.valueOf parses in the JVM default
    // zone, which shifts the instant vs the oracle's naive TIMESTAMP on a
    // non-UTC host; an NTZ cast of the string never consults the zone.
    val cut = lit("1997-06-15 00:00:00").cast("timestamp_ntz")
    val cust = Tables.customer(s, d).filter($"c_mktsegment" === "BUILDING")
      .select($"c_custkey")
    val ord = Tables.orders(s, d).filter($"o_orderdate" < cut)
      .select($"o_orderkey", $"o_custkey", $"o_orderdate", $"o_orderpriority")
    val li = Tables.lineitem(s, d).filter($"l_shipdate" > cut)
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
    li.join(ord, $"l_orderkey" === $"o_orderkey")
      .join(broadcast(cust), $"o_custkey" === $"c_custkey")
      .groupBy($"l_orderkey", $"o_orderdate", $"o_orderpriority")
      .agg(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount"))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"l_orderkey")
      .limit(10)
  }
  private val shippingPrioritySql =
    """SELECT l_orderkey, o_orderdate, o_orderpriority,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |         * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM lineitem
      |JOIN orders ON l_orderkey = o_orderkey
      |JOIN customer ON o_custkey = c_custkey
      |WHERE c_mktsegment = 'BUILDING'
      |  AND o_orderdate < TIMESTAMP '1997-06-15 00:00:00'
      |  AND l_shipdate > TIMESTAMP '1997-06-15 00:00:00'
      |GROUP BY l_orderkey, o_orderdate, o_orderpriority
      |ORDER BY revenue DESC, l_orderkey
      |LIMIT 10""".stripMargin

  // ----------------------------------------------------------------

  // --------------------------------------------------------- funnel analysis
  // Ordered conversion funnel view → click → purchase: each stage's
  // timestamp is the user's first qualifying event STRICTLY AFTER the
  // previous stage (not just "did both" — order matters). Spark-first
  // shape: three keyed min-aggregates chained by equi-joins on user_id,
  // so every stage re-uses the same hash partitioning (exchange reuse)
  // and the plan is linear in events — no per-user window sort over the
  // whole event log, which matters when one table is 100 TB of events.
  private val funnel: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select($"user_id", $"event_type", $"ts")
    val views = ev.filter($"event_type" === "view")
      .groupBy($"user_id").agg(min($"ts").as("view_ts"))
    val clicks = ev.filter($"event_type" === "click").join(views, "user_id")
      .filter($"ts" > $"view_ts")
      .groupBy($"user_id").agg(min($"ts").as("click_ts"))
    val purchases = ev.filter($"event_type" === "purchase").join(clicks, "user_id")
      .filter($"ts" > $"click_ts")
      .groupBy($"user_id").agg(min($"ts").as("purchase_ts"))
    views.join(clicks, Seq("user_id"), "left")
      .join(purchases, Seq("user_id"), "left")
      .select($"user_id", $"view_ts", $"click_ts", $"purchase_ts")
      .orderBy($"user_id")
  }
  private val funnelSql =
    """WITH v AS (SELECT user_id, MIN(ts) AS view_ts FROM events
      |           WHERE event_type = 'view' GROUP BY 1),
      |c AS (SELECT e.user_id, MIN(e.ts) AS click_ts
      |      FROM events e JOIN v ON e.user_id = v.user_id
      |      WHERE e.event_type = 'click' AND e.ts > v.view_ts GROUP BY 1),
      |p AS (SELECT e.user_id, MIN(e.ts) AS purchase_ts
      |      FROM events e JOIN c ON e.user_id = c.user_id
      |      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts GROUP BY 1)
      |SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts
      |FROM v LEFT JOIN c ON v.user_id = c.user_id
      |       LEFT JOIN p ON v.user_id = p.user_id
      |ORDER BY v.user_id""".stripMargin

  // ------------------------------------------------------ retention cohorts
  // Weekly cohort retention: cohort = the Monday of a user's first
  // active week; one row per (cohort_week, active week) with distinct
  // actives. Two shuffles total — user-keyed min for the cohort, then
  // a (cohort, week)-keyed distinct count; the distinct-user dedup
  // happens in the same user-keyed exchange as the cohort join.
  private val retention: Q = (s, d) => {
    import s.implicits._
    val weeks = Tables.events(s, d)
      .select($"user_id", to_date(date_trunc("week", $"ts")).as("week"))
    val cohorts = weeks.groupBy($"user_id").agg(min($"week").as("cohort_week"))
    weeks.distinct().join(cohorts, "user_id")
      .groupBy($"cohort_week", $"week")
      .agg(countDistinct($"user_id").as("n_users"))
      .orderBy($"cohort_week", $"week")
  }
  private val retentionSql =
    """WITH w AS (SELECT user_id, CAST(date_trunc('week', ts) AS DATE) AS week
      |           FROM events),
      |coh AS (SELECT user_id, MIN(week) AS cohort_week FROM w GROUP BY 1),
      |a AS (SELECT DISTINCT user_id, week FROM w)
      |SELECT c.cohort_week, a.week, COUNT(DISTINCT a.user_id) AS n_users
      |FROM a JOIN coh c ON a.user_id = c.user_id
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // -------------------------------------------------------- grouping sets
  // Explicit GROUPING SETS (beyond the cube/rollup surfaces): per-status,
  // per-priority, and grand-total aggregates in ONE pass over orders —
  // Spark expands the sets before the aggregate, so it's still a single
  // shuffle. grouping() flags (not grouping_id) keep the bit semantics
  // engine-portable.
  private val groupingSetsQ: Q = (s, d) => {
    import s.implicits._
    Tables.orders(s, d)
      .groupingSets(
        Seq(Seq($"o_orderstatus"), Seq($"o_orderpriority"), Seq()),
        $"o_orderstatus", $"o_orderpriority")
      .agg(count(lit(1)).as("n"),
        sum(dec($"o_totalprice")).cast("double").as("total"),
        grouping($"o_orderstatus").cast("int").as("g_status"),
        grouping($"o_orderpriority").cast("int").as("g_priority"))
      .orderBy($"g_status", $"g_priority", $"o_orderstatus", $"o_orderpriority")
  }
  private val groupingSetsSql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total,
      |  CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
      |  CAST(GROUPING(o_orderpriority) AS INT) AS g_priority
      |FROM orders
      |GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
      |ORDER BY g_status, g_priority, o_orderstatus, o_orderpriority""".stripMargin

  // ------------------------------------------------- distribution windows
  // ntile / percent_rank / cume_dist over a UNIQUE ordering (totalprice
  // then orderkey) — the tiebreak makes every rank deterministic, so
  // the exact-double (rank-1)/(n-1) arithmetic agrees across engines.
  private val windowDistribution: Q = (s, d) => {
    import s.implicits._
    val w = Window.partitionBy($"o_orderpriority")
      .orderBy($"o_totalprice", $"o_orderkey")
    Tables.orders(s, d).select(
      $"o_orderkey", $"o_orderpriority",
      ntile(4).over(w).cast("int").as("quartile"),
      percent_rank().over(w).as("pr"),
      cume_dist().over(w).as("cd"))
      .orderBy($"o_orderkey")
  }
  private val windowDistributionSql =
    """SELECT o_orderkey, o_orderpriority,
      |  CAST(NTILE(4) OVER w AS INT) AS quartile,
      |  PERCENT_RANK() OVER w AS pr,
      |  CUME_DIST() OVER w AS cd
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderpriority
      |             ORDER BY o_totalprice, o_orderkey)
      |ORDER BY o_orderkey""".stripMargin

  // ------------------------------------------------ TPC-H Q5 nation volume
  // The 6-way snowflake: facts (orders ⋈ lineitem) shuffle on the order
  // key once; customer, supplier, nation, region all broadcast (each is
  // tiny next to lineitem at any scale factor); the local-supplier
  // predicate c_nationkey = s_nationkey rides the broadcast joins as a
  // residual — no extra shuffle.
  private val nationRevenue: Q = (s, d) => {
    import s.implicits._
    val lo = Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
            $"o_orderdate" < lit("1997-01-01 00:00:00").cast("timestamp_ntz"))
          .select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
    lo.join(broadcast(Tables.customer(s, d).select($"c_custkey", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.supplier(s, d).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey" && $"c_nationkey" === $"s_nationkey")
      .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")),
        $"n_regionkey" === $"r_regionkey")
      .groupBy($"n_name")
      .agg(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount"))
        .cast("double").as("revenue"))
      .orderBy($"revenue".desc, $"n_name")
  }
  private val nationRevenueSql =
    """SELECT n_name,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |         * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS revenue
      |FROM customer, orders, lineitem, supplier, nation, region
      |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |  AND r_name = 'ASIA'
      |  AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
      |GROUP BY n_name ORDER BY revenue DESC, n_name""".stripMargin

  // ------------------------------------------------ TPC-H Q7 trade volume
  // Cross-region trade flow by ship year (TPC-H Q7 on the available
  // schema, lifted to regions so the pair stays dense at every SF).
  // The nation→region dimension chain joins TWICE under different
  // roles (supplier's vs customer's) — the dual-role join shape
  // Q5/Q10 don't exercise. Scale plan: one fact shuffle (lineitem ⋈
  // orders on the order key); supplier, customer and both role chains
  // broadcast; the either-direction pair predicate rides the
  // broadcasts as a residual.
  private val tradeVolume: Q = (s, d) => {
    import s.implicits._
    def roleRegion(role: String) =
      Tables.nation(s, d).select($"n_nationkey", $"n_regionkey")
        .join(Tables.region(s, d).select($"r_regionkey", $"r_name"),
          $"n_regionkey" === $"r_regionkey")
        .select($"n_nationkey".as(s"${role}_nk"), $"r_name".as(s"${role}_region"))
    Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
        $"l_shipdate" < lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate", $"l_extendedprice", $"l_discount")
      .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.supplier(s, d).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.customer(s, d).select($"c_custkey", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(roleRegion("supp")), $"s_nationkey" === $"supp_nk")
      .join(broadcast(roleRegion("cust")), $"c_nationkey" === $"cust_nk")
      .filter(($"supp_region" === "ASIA" && $"cust_region" === "EUROPE") ||
        ($"supp_region" === "EUROPE" && $"cust_region" === "ASIA"))
      .groupBy($"supp_region", $"cust_region", year($"l_shipdate").as("l_year"))
      .agg(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount"))
        .cast("double").as("volume"))
      .orderBy($"supp_region", $"cust_region", $"l_year")
  }
  private val tradeVolumeSql =
    """SELECT r1.r_name AS supp_region, r2.r_name AS cust_region,
      |  CAST(year(l_shipdate) AS INT) AS l_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |         * CAST(1 - l_discount AS DECIMAL(18,4))) AS DOUBLE) AS volume
      |FROM supplier, lineitem, orders, customer,
      |     nation n1, nation n2, region r1, region r2
      |WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
      |  AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
      |  AND c_nationkey = n2.n_nationkey
      |  AND n1.n_regionkey = r1.r_regionkey AND n2.n_regionkey = r2.r_regionkey
      |  AND ((r1.r_name = 'ASIA' AND r2.r_name = 'EUROPE')
      |    OR (r1.r_name = 'EUROPE' AND r2.r_name = 'ASIA'))
      |  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      |  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin

  // ----------------------------------------------- TPC-H Q8 market share
  // National market share inside a region for one part type (TPC-H Q8
  // shape): share = conditional revenue / total revenue per order year.
  // Exercises the part dimension + a ratio-of-aggregates — both DECIMAL
  // sums stay exact until one final double division (deterministic IEEE
  // on both engines). Scale plan: the filtered part dim broadcasts into
  // the lineitem scan FIRST (cuts the fact before the order-key
  // shuffle); region prunes customers via the broadcast chain.
  private val marketShare: Q = (s, d) => {
    import s.implicits._
    val vol = dec($"l_extendedprice") * dec(lit(1) - $"l_discount")
    Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_partkey", $"l_suppkey", $"l_extendedprice", $"l_discount")
      .join(broadcast(Tables.part(s, d).filter($"p_type" === "PROMO")
        .select($"p_partkey")), $"l_partkey" === $"p_partkey")
      .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
            $"o_orderdate" < lit("1998-01-01 00:00:00").cast("timestamp_ntz"))
          .select($"o_orderkey", $"o_custkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(s, d).select($"c_custkey", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, d)
          .select($"n_nationkey", $"n_name", $"n_regionkey")),
        $"c_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d).filter($"r_name" === "ASIA")
        .select($"r_regionkey")), $"n_regionkey" === $"r_regionkey")
      .groupBy(year($"o_orderdate").as("o_year"))
      .agg(
        sum(when($"n_name" === "NATION_2", vol).otherwise(dec(lit(0)))).as("nat"),
        sum(vol).as("tot"))
      .select($"o_year",
        ($"nat".cast("double") / $"tot".cast("double")).as("mkt_share"))
      .orderBy($"o_year")
  }
  private val marketShareSql =
    """WITH v AS (
      |  SELECT CAST(year(o_orderdate) AS INT) AS o_year, n_name,
      |    CAST(l_extendedprice AS DECIMAL(18,4))
      |      * CAST(1 - l_discount AS DECIMAL(18,4)) AS vol
      |  FROM lineitem, part, orders, customer, nation, region
      |  WHERE l_partkey = p_partkey AND p_type = 'PROMO'
      |    AND l_orderkey = o_orderkey AND o_custkey = c_custkey
      |    AND c_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |    AND r_name = 'ASIA'
      |    AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      |    AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00')
      |SELECT o_year,
      |  CAST(SUM(CASE WHEN n_name = 'NATION_2' THEN vol
      |                ELSE CAST(0 AS DECIMAL(18,4)) END) AS DOUBLE)
      |    / CAST(SUM(vol) AS DOUBLE) AS mkt_share
      |FROM v GROUP BY o_year ORDER BY o_year""".stripMargin

  // ------------------------------------------------- TPC-H Q9 (profit)
  // Product-type profit by (supplier nation, year) — TPC-H Q9's shape
  // on this schema: profit = revenue − supply cost, with p_retailprice
  // · l_quantity as the cost term (no ps_supplycost table here), part
  // filter on the name. Plan: the part filter broadcasts INTO the
  // lineitem scan side before anything else (the Q8 trick — the
  // selective dim cuts the fact early), supplier→nation is a second
  // broadcast chain, and the single fact shuffle is the final
  // (nation, year) aggregate. DECIMAL(18,4) end-to-end until one final
  // double cast, per the float-sum discipline.
  private val productProfit: Q = (s, d) => {
    import s.implicits._
    val gearParts = Tables.part(s, d)
      .filter($"p_name".contains("gear"))
      .select($"p_partkey", $"p_retailprice")
    Tables.lineitem(s, d)
      .select($"l_partkey", $"l_suppkey", $"l_shipdate", $"l_quantity",
        $"l_extendedprice", $"l_discount")
      .join(broadcast(gearParts), $"l_partkey" === $"p_partkey")
      .join(broadcast(Tables.supplier(s, d).select($"s_suppkey", $"s_nationkey")),
        $"l_suppkey" === $"s_suppkey")
      .join(broadcast(Tables.nation(s, d).select($"n_nationkey", $"n_name")),
        $"s_nationkey" === $"n_nationkey")
      .groupBy($"n_name".as("nation"), year($"l_shipdate").as("o_year"))
      .agg(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount") -
          dec($"p_retailprice") * dec($"l_quantity"))
        .cast("double").as("profit"))
      .orderBy($"nation", $"o_year".desc)
  }
  private val productProfitSql =
    """SELECT n_name AS nation, CAST(year(l_shipdate) AS INT) AS o_year,
      |  CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |         * CAST(1 - l_discount AS DECIMAL(18,4))
      |         - CAST(p_retailprice AS DECIMAL(18,4))
      |         * CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS profit
      |FROM lineitem, part, supplier, nation
      |WHERE l_partkey = p_partkey AND l_suppkey = s_suppkey
      |  AND s_nationkey = n_nationkey AND p_name LIKE '%gear%'
      |GROUP BY 1, 2 ORDER BY nation, o_year DESC""".stripMargin

  // ------------------------------------------------ large-volume orders
  /** TPC-H Q18 shape (large-volume customers): a HAVING-filtered fact
    * self-aggregate driving a two-hop join and a global top-100. Scale
    * shape: the qty aggregate partially aggregates map-side and its
    * (orderkey) exchange is REUSED by the orders join (same key); the
    * customer hop shuffles the ~1% surviving rows, not the fact; the
    * top-100 plans TakeOrderedAndProject (per-partition heaps, 100-row
    * result exchange — never a global sort). Q18's canonical third
    * lineitem join is pre-aggregated away (identical result, one fewer
    * fact scan). Exact sum on the 10⁴ integer grid (≡ the oracle's
    * DECIMAL(18,4) sum — see the body comment); orderkey tiebreak
    * makes the top-100 deterministic.
    */
  private val bigOrders: Q = (s, d) => {
    import s.implicits._
    // quantity sum on the 10⁴ integer grid instead of DECIMAL(18,4):
    // l_quantity is a ≤4-decimal value stored as its nearest double, so
    // round(x·10⁴) recovers the exact scaled integer (the true product
    // is integral and the double error is ~1e-9 ≪ 0.5) and the LONG sum
    // is the decimal sum exactly — same value, same HAVING boundary,
    // same emitted double — but the 150k-key hash aggregate runs on
    // primitive longs, measured ~40% faster than Decimal accumulation
    // (the dominant stage of this query; DevAggExp). Overflow headroom:
    // Σ quantity·10⁴ < 2⁶³ until ~9e14 quantity units per order.
    val big = Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_quantity")
      .groupBy($"l_orderkey")
      .agg(sum(round($"l_quantity" * 10000).cast("long")).as("q4"))
      .filter($"q4" > 300L * 10000)
      .select($"l_orderkey".as("o_orderkey"),
        ($"q4".cast("double") / 10000d).as("sum_qty"))
    Tables.orders(s, d)
      .select($"o_orderkey", $"o_custkey",
        $"o_orderdate".cast("date").as("o_date"), $"o_totalprice")
      .join(big, "o_orderkey")
      .join(Tables.customer(s, d).select($"c_custkey", $"c_name"),
        $"o_custkey" === $"c_custkey")
      .select($"c_name", $"c_custkey", $"o_orderkey", $"o_date",
        $"o_totalprice", $"sum_qty")
      .orderBy($"o_totalprice".desc, $"o_date", $"o_orderkey")
      .limit(100)
  }
  private val bigOrdersSql =
    """WITH big AS (
      |  SELECT l_orderkey AS o_orderkey,
      |    CAST(SUM(CAST(l_quantity AS DECIMAL(18,4))) AS DOUBLE) AS sum_qty
      |  FROM lineitem GROUP BY 1
      |  HAVING SUM(CAST(l_quantity AS DECIMAL(18,4))) > 300)
      |SELECT c_name, c_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS o_date,
      |  o_totalprice, sum_qty
      |FROM orders JOIN big USING (o_orderkey)
      |JOIN customer ON o_custkey = c_custkey
      |ORDER BY o_totalprice DESC, o_date, o_orderkey LIMIT 100""".stripMargin

  // ------------------------------------------- sole-late suppliers (Q21)
  /** TPC-H Q21 join SHAPE — suppliers who were the ONLY late shipper
    * in a multi-supplier order. (This schema carries no receipt/commit
    * dates, so "late" is shipdate > orderdate + 90 days — the
    * structure, not the constant, is the point.)
    *
    * r13 optimization (guide §2.3/§2.4 — aggregate before you shuffle,
    * remove shuffles outright): the committed shape decorrelated Q21's
    * EXISTS / NOT-EXISTS into a semi + anti self-join, which
    * re-computed the lineitem⋈orders subtree THREE times (base, semi
    * probe, anti probe — Spark plans common subtrees independently)
    * and shuffled the full line table for each. Both existence tests
    * are per-ORDER set properties, so one pair-level aggregate and one
    * order-level window replace them:
    *   pair (l_orderkey, l_suppkey) → late_lines = #late lines;
    *   per order: n_supp = #pairs, n_late_supp = #pairs with a late
    *   line (counted over a window keyed on l_orderkey);
    *   EXISTS l2 (any line, other supplier)      ⟺ n_supp > 1
    *   NOT EXISTS l3 (late line, other supplier) ⟺ n_late_supp = 1
    *     (the candidate itself is late, so the late-supplier set is
    *      exactly {suppkey});
    *   numwait = Σ late_lines over qualifying pairs — the original
    *   counted the surviving base ROWS (late lines), and late_lines
    *   partitions those rows by pair, so the sums are equal.
    * One fact shuffle (the pair aggregate) instead of three; the
    * window and final rollup run on the pair table, which is bounded
    * by distinct (order, supplier) pairs, not line count. Result
    * proven equal: full dual-SF oracle PASS (dev/verify_r18*);
    * before/after plans in plans/r13/rel_late_suppliers_*.txt
    * (5 exchanges + 2 SMJ self-joins → 3 exchanges, no self-join).
    * Supplier stays a broadcast dim; the final top-20 is
    * TakeOrderedAndProject.
    */
  private val lateSuppliers: Q = (s, d) => {
    import s.implicits._
    val l = Tables.lineitem(s, d)
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(Tables.orders(s, d).filter($"o_orderstatus" === "F")
        .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_orderkey", $"l_suppkey",
        ($"l_shipdate".cast("date") >
          expr("cast(o_orderdate as date) + interval 90 day")).as("late"))
    val pair = l.groupBy($"l_orderkey", $"l_suppkey")
      .agg(count(when($"late", 1)).as("late_lines"))
    val w = Window.partitionBy($"l_orderkey")
    val soleLate = pair
      .withColumn("n_supp", count(lit(1)).over(w))
      .withColumn("n_late_supp", count(when($"late_lines" > 0, 1)).over(w))
      .filter($"late_lines" > 0 && $"n_supp" > 1 && $"n_late_supp" === 1)
    soleLate
      .join(Tables.supplier(s, d).select($"s_suppkey", $"s_name"),
        $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name").agg(sum($"late_lines").as("numwait"))
      .orderBy($"numwait".desc, $"s_name").limit(20)
  }
  private val lateSuppliersSql =
    """WITH l AS (
      |  SELECT l_orderkey, l_suppkey,
      |    CAST(l_shipdate AS DATE) >
      |      CAST(o_orderdate AS DATE) + INTERVAL 90 DAY AS late
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  WHERE o_orderstatus = 'F')
      |SELECT s_name, COUNT(*) AS numwait
      |FROM l l1
      |JOIN supplier ON l1.l_suppkey = s_suppkey
      |WHERE l1.late
      |  AND EXISTS (SELECT 1 FROM l l2 WHERE l2.l_orderkey = l1.l_orderkey
      |              AND l2.l_suppkey <> l1.l_suppkey)
      |  AND NOT EXISTS (SELECT 1 FROM l l3 WHERE l3.l_orderkey = l1.l_orderkey
      |                  AND l3.l_suppkey <> l1.l_suppkey AND l3.late)
      |GROUP BY s_name ORDER BY numwait DESC, s_name LIMIT 20""".stripMargin

  // ----------------------------------------------------- salted join gate
  // The skew-salting operator under the oracle gate: result must be
  // EXACTLY the plain inner join (the oracle computes the plain join),
  // while the engine-side plan shards each key over `salt` sub-keys —
  // the mitigation for power-law keys whose single task would otherwise
  // own a hot key at 100 TB. Aggregated output keeps the gate small.
  // r10: the AUTO-sized variant (r9 verdict item 4 — the fixed 8-way
  // salt was the last fixed-parameter operator and stopped matching the
  // skew at the 100× replica, α 1.05): the probe measures the hottest
  // key and o_custkey is near-uniform, so the width resolves to 1 —
  // the plain join, with the 8× small-side replication no longer paid.
  // The width formula is spec-pinned (SkewSpec) and the non-trivial
  // widths stay law-tested against the plain join on a skewed fixture.
  // probed width memo — the "catalog table-stats" cache (same
  // fingerprint-keyed pattern as Dedup.sourceDimMemo): the width is a
  // property of the table snapshot, so repeated runs pay the probe once
  private val saltWidthMemo =
    new java.util.concurrent.ConcurrentHashMap[String, Int]()
  Tables.onInvalidate(c => saltWidthMemo.keySet.removeIf(_.startsWith(c + "#")))
  private val saltedJoin: Q = (s, d) => {
    import s.implicits._
    val big = Tables.orders(s, d)
      .select($"o_custkey".as("custkey"), $"o_totalprice")
    val small = Tables.customer(s, d)
      .select($"c_custkey".as("custkey"), $"c_mktsegment")
    val width = saltWidthMemo.computeIfAbsent(
      new java.io.File(d).getCanonicalPath + "#" +
        Tables.tableFingerprint(d, "orders") + "#" +
        s.conf.get("spark.sql.shuffle.partitions"),
      _ => Skew.probeSaltWidth(big, "custkey"))
    Skew.saltedJoin(big, small, "custkey", width)
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec($"o_totalprice")).cast("double").as("total"))
      .orderBy($"c_mktsegment")
  }
  private val saltedJoinSql =
    """SELECT c_mktsegment, COUNT(*) AS n_orders,
      |  CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total
      |FROM orders JOIN customer ON o_custkey = c_custkey
      |GROUP BY c_mktsegment ORDER BY c_mktsegment""".stripMargin

  // ------------------------------------------------ bucketed join gate
  // The co-location operator under the oracle gate: both sides written
  // bucketed+sorted on the join key ONCE per (session, sfDir) — the
  // layout-time shuffle — then the gated query joins them with ZERO
  // exchanges on either side (BucketingSpec pins the plan; this gate
  // pins the values against the plain-join oracle). The 100 TB story:
  // a recurring fact⋈fact key pays its shuffle at write time, every
  // downstream query gets the join for free.
  private val bucketedFixtures =
    new java.util.concurrent.ConcurrentHashMap[(SparkSession, String), Unit]()
  private val bucketedJoin: Q = (s, d) => {
    import s.implicits._
    bucketedFixtures.computeIfAbsent((s, d), _ => {
      val buckets = s.conf.get("spark.sql.shuffle.partitions").toInt
      graft.tables.Bucketing.writeBucketed(
        Tables.orders(s, d).select($"o_custkey", $"o_totalprice"),
        "gate_b_orders", "o_custkey", buckets)
      graft.tables.Bucketing.writeBucketed(
        Tables.customer(s, d)
          .select($"c_custkey".as("o_custkey"), $"c_mktsegment"),
        "gate_b_customer", "o_custkey", buckets)
    })
    graft.tables.Bucketing.bucketedJoin(s, "gate_b_orders", "gate_b_customer", "o_custkey")
      .groupBy($"c_mktsegment")
      .agg(count(lit(1)).as("n_orders"),
        sum(dec($"o_totalprice")).cast("double").as("total"))
      .orderBy($"c_mktsegment")
  }

  // --------------------------------------------------------- histogram
  // Fixed-width value histogram over the event stream: bucket =
  // floor(value / 50) — double division of identical operands, exact
  // in both engines. One aggregate shuffle keyed by bucket.
  private val histogram: Q = (s, d) => {
    import s.implicits._
    Tables.events(s, d)
      .select(floor($"value" / lit(50.0)).cast("int").as("bucket"), $"value")
      .groupBy($"bucket")
      .agg(count(lit(1)).as("n"),
        min($"value").as("lo"), max($"value").as("hi"))
      .orderBy($"bucket")
  }
  private val histogramSql =
    """SELECT CAST(floor(value / 50.0) AS INT) AS bucket, COUNT(*) AS n,
      |  MIN(value) AS lo, MAX(value) AS hi
      |FROM events GROUP BY 1 ORDER BY bucket""".stripMargin

  // ------------------------------------------- TPC-H Q10 returned revenue
  // Top-20 customers by revenue lost to returns in one quarter: lineitem
  // filtered to returnflag='R' joins the quarter's orders on the order
  // key (the one fact shuffle), customer and nation broadcast, and the
  // final top-20 is a TakeOrderedAndProject — no global sort
  // materializes. Ordering ties break on the DECIMAL revenue before the
  // double cast plus c_custkey, so the limit edge is deterministic in
  // both engines.
  private val returnedRevenue: Q = (s, d) => {
    import s.implicits._
    Tables.lineitem(s, d)
      .filter($"l_returnflag" === "R")
      .select($"l_orderkey", $"l_extendedprice", $"l_discount")
      .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("1996-07-01 00:00:00").cast("timestamp_ntz") &&
            $"o_orderdate" < lit("1996-10-01 00:00:00").cast("timestamp_ntz"))
          .select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .join(broadcast(Tables.customer(s, d)
          .select($"c_custkey", $"c_name", $"c_acctbal", $"c_nationkey")),
        $"o_custkey" === $"c_custkey")
      .join(broadcast(Tables.nation(s, d).select($"n_nationkey", $"n_name")),
        $"c_nationkey" === $"n_nationkey")
      .groupBy($"c_custkey", $"c_name", $"c_acctbal", $"n_name")
      .agg(sum(dec($"l_extendedprice") * dec(lit(1) - $"l_discount")).as("rev"))
      .orderBy($"rev".desc, $"c_custkey")
      .limit(20)
      .select($"c_custkey", $"c_name", $"rev".cast("double").as("revenue"),
        $"c_acctbal", $"n_name")
      .orderBy($"revenue".desc, $"c_custkey")
  }
  private val returnedRevenueSql =
    """WITH r AS (
      |  SELECT c_custkey, c_name, c_acctbal, n_name,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |      * CAST(1 - l_discount AS DECIMAL(18,4))) AS rev
      |  FROM customer, orders, lineitem, nation
      |  WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      |    AND l_returnflag = 'R' AND c_nationkey = n_nationkey
      |    AND o_orderdate >= TIMESTAMP '1996-07-01 00:00:00'
      |    AND o_orderdate < TIMESTAMP '1996-10-01 00:00:00'
      |  GROUP BY 1, 2, 3, 4
      |  ORDER BY rev DESC, c_custkey LIMIT 20)
      |SELECT c_custkey, c_name, CAST(rev AS DOUBLE) AS revenue,
      |  c_acctbal, n_name
      |FROM r ORDER BY revenue DESC, c_custkey""".stripMargin

  // ----------------------------------------------- integer-grid PageRank
  // Graph analytics as iterated relational algebra: the undirected
  // customer↔supplier trade graph (edge = any lineitem shipped, node id
  // = 2·custkey / 2·suppkey+1 so the namespaces can't collide), scored
  // by 3 PageRank power iterations. Arithmetic is drift-proof across
  // engines: scores live on an integer micro-grid (init 1 000 000),
  // each neighbor contribution is floor(score/deg) cast back to BIGINT
  // before the order-free integer SUM, and the damping step
  // 150 000 + floor(0.85·S) multiplies an exact integer-valued double —
  // identical IEEE ops in every engine, so scores match bit-for-bit.
  // Scale shape: each iteration is ONE join of the edge list against
  // the (node, score) table — both hash-partitioned on the same key —
  // plus one aggregate; the edge list's partitioning is reused every
  // round, and a real deployment would localCheckpoint each iteration
  // like Dedup.connectedComponents does to truncate lineage.
  // r10 scale hardening (A/B'd at sf0.1 AND 100×): the iteration joins
  // hint shuffle_hash on the NODE-sized sides — SMJ sorted the 100M-row
  // edge stream six times at the 100× point and the sort spills' read-
  // ahead buffers OOM'd the heap flakily (board-context-dependent);
  // the hinted build side is node-count/width rows per task, so no
  // edge sort exists at any scale. sf0.1 neutral (1.95 → 1.93 s),
  // 100× 68 s-or-OOM → 54 s with spill 32.6 GB → 0.6 GB (together
  // with GraftSession's data-sized advisory). This does NOT contradict
  // the pinned r9 rejection (F): that variant ALSO restructured to
  // per-node contributions; the hint-only change wins. A noAqe variant
  // was A/B'd and LOST at both scales (2.36 s / 96 s — the iteration
  // re-exchanges dominate without AQE's runtime planning), unlike the
  // shingle family where noAqe wins — per-query measurement, not a
  // blanket rule.
  // r13 per-core floor pin (the keywords/lm_score standard): at the
  // 4-core convention the steady task-CPU is 3.67 s vs the 4-thread
  // DuckDB oracle's 1.69 CPU-seconds (cpuR 2.17, bench_ratio_r18).
  // DevProfile decomposition: the cost is UNIFORM — ~10 stages of
  // 0.4–1.25 s task time each (3 iterations × join+2 aggregates +
  // degree prep), zero spill, GC 0.28 s, no dominant stage and no
  // plan defect to fix; it is the JVM codegen row pipeline against a
  // vectorized C++ recursive CTE, paid once per exchange — the same
  // engine-class floor measured at ≤1.7× on the shingle family,
  // here across 9 exchanges. Remaining alternatives were measured
  // and rejected above; the row is a pinned floor, not headroom.
  private val pagerank: Q = (s, d) => {
    import s.implicits._
    val e0 = Tables.lineitem(s, d).select($"l_orderkey", $"l_suppkey")
      .join(Tables.orders(s, d).select($"o_orderkey", $"o_custkey"),
        $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .distinct()
    // the skinny (src, dst) edge list materializes ONCE: it feeds the
    // degree aggregate, the init frame, and all 3 iteration joins —
    // lazily each reference re-ran the lineitem⋈orders build + distinct
    // (the dominant stages in the profile). Checkpointing only the
    // 2-column list keeps the deg/score sides as ordinary aggregates
    // whose runtime stats AQE still sees (an earlier variant that
    // checkpointed the deg-JOINED list planned stat-blind SMJs and
    // measured 2× slower). Open-ended iteration (CC-style, O(diameter)
    // rounds) would also checkpoint per round like
    // Dedup.connectedComponents.
    //
    // REJECTED r9 reworks (DevPageRankExp, interleaved same-JVM A/B,
    // bench hygiene between reps — this shape won every rep, steady
    // ~2.7 s): (B) repartition(src)+persist to make iteration joins
    // exchange-free — InMemoryRelation's columnar encode of the edge
    // list costs more than the three exchanges it saves under Bench's
    // per-run hygiene (3.8 s); a localCheckpoint variant LOSES the
    // hash(src) partitioning entirely (its LogicalRDD re-exchanged
    // every round); (C) unpersisted repartition relying on exchange
    // reuse — the reuse does not fire across the iteration fold, so
    // the dedupe re-ran per consumer (4.7 s); (F) per-node
    // contributions + node-sized deg join with pinned shuffle_hash —
    // loses to AQE's runtime handling of the node-sized sides (3.1 s).
    // The per-iteration barrier floor is structural for a 3-round
    // fixed-point loop; the scale story (one key-partitioned exchange
    // per round, no O(nodes) broadcast) is carried by this shape.
    val edges = graft.Lineage.cut(
      e0.unionByName(e0.select($"dst".as("src"), $"src".as("dst"))))
    val deg = edges.groupBy($"src".as("node")).agg(count(lit(1)).as("outdeg"))
    val init = deg.select($"node", lit(1000000L).as("score"))
    val scores = (1 to 3).foldLeft(init) { (sc, _) =>
      edges
        .join(sc.withColumnRenamed("node", "src").hint("shuffle_hash"), "src")
        .join(deg.withColumnRenamed("node", "src")
          .withColumnRenamed("outdeg", "sdeg").hint("shuffle_hash"), "src")
        .select($"dst".as("node"),
          floor($"score".cast("double") / $"sdeg").cast("long").as("c"))
        .groupBy($"node")
        .agg((lit(150000L) +
          floor(lit(0.85) * sum($"c").cast("double")).cast("long")).as("score"))
    }
    scores.orderBy($"node")
  }
  private val pagerankSql =
    """WITH e0 AS (
      |  SELECT DISTINCT o_custkey * 2 AS src, l_suppkey * 2 + 1 AS dst
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey),
      |e AS (SELECT src, dst FROM e0
      |      UNION ALL SELECT dst AS src, src AS dst FROM e0),
      |deg AS (SELECT src AS node, COUNT(*) AS outdeg FROM e GROUP BY 1),
      |s0 AS (SELECT node, CAST(1000000 AS BIGINT) AS score FROM deg),
      |s1 AS (
      |  SELECT e.dst AS node, CAST(150000 + FLOOR(0.85 * CAST(
      |      SUM(CAST(FLOOR(CAST(s.score AS DOUBLE) / d.outdeg) AS BIGINT))
      |      AS DOUBLE)) AS BIGINT) AS score
      |  FROM e JOIN s0 s ON e.src = s.node JOIN deg d ON e.src = d.node
      |  GROUP BY e.dst),
      |s2 AS (
      |  SELECT e.dst AS node, CAST(150000 + FLOOR(0.85 * CAST(
      |      SUM(CAST(FLOOR(CAST(s.score AS DOUBLE) / d.outdeg) AS BIGINT))
      |      AS DOUBLE)) AS BIGINT) AS score
      |  FROM e JOIN s1 s ON e.src = s.node JOIN deg d ON e.src = d.node
      |  GROUP BY e.dst),
      |s3 AS (
      |  SELECT e.dst AS node, CAST(150000 + FLOOR(0.85 * CAST(
      |      SUM(CAST(FLOOR(CAST(s.score AS DOUBLE) / d.outdeg) AS BIGINT))
      |      AS DOUBLE)) AS BIGINT) AS score
      |  FROM e JOIN s2 s ON e.src = s.node JOIN deg d ON e.src = d.node
      |  GROUP BY e.dst)
      |SELECT node, score FROM s3 ORDER BY node""".stripMargin

  // ------------------------------------------------ time-range frames
  // RANGE (time-interval) window frames — the "activity in the trailing
  // hour" shape that ROWS frames (rel_window_frames) can't express.
  // Order key is epoch micros (a numeric range frame is engine-portable;
  // INTERVAL frame syntax differs), and peers at the same ts are frame-
  // equivalent by definition, so ties need no tiebreak to be
  // deterministic. Scale shape: one hash exchange on user_id, then a
  // per-partition ordered scan with a sliding two-pointer frame — the
  // same work a 1000-executor cluster does per partition, no global sort.
  private val windowRange: Q = (s, d) => {
    import s.implicits._
    val ev = Tables.events(s, d).select($"user_id", $"event_id",
      unix_micros($"ts".cast("timestamp")).as("ts_us"), $"value")
    val w = Window.partitionBy($"user_id").orderBy($"ts_us")
      .rangeBetween(-3600L * 1000000L, 0L)
    ev.select($"user_id", $"event_id", $"ts_us",
        count(lit(1)).over(w).as("n_1h"),
        sum(dec($"value")).over(w).cast("double").as("sum_1h"))
      .orderBy($"user_id", $"event_id")
  }
  private val windowRangeSql =
    """SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |  COUNT(*) OVER w AS n_1h,
      |  CAST(SUM(CAST(value AS DECIMAL(18,4))) OVER w AS DOUBLE) AS sum_1h
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
      |             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY user_id, event_id""".stripMargin

  // --------------------------------------------------- calendar gap-fill
  /** Time-series gap-fill + forward-fill — the resampling primitive of
    * metrics/feature pipelines: the 1995 daily revenue series per order
    * priority, with MISSING calendar days materialized from a per-key
    * generated date sequence (`sequence()` + explode — no driver-side
    * calendar) and revenue carried forward via `last(ignoreNulls)`
    * over the date order. Scale shape: the daily aggregate partially
    * aggregates map-side down to (keys × days) rows — tiny relative to
    * the fact at any SF; the series explode is O(keys × days); the
    * fill window is per-key sequential — the standard distributed
    * gap-fill. `is_gap` marks synthesized days.
    */
  private val gapfill: Q = (s, d) => {
    import s.implicits._
    val daily = Tables.orders(s, d)
      .select($"o_orderpriority".as("prio"),
        $"o_orderdate".cast("date").as("dt"), $"o_totalprice")
      .filter($"dt".between("1995-01-01", "1995-12-31"))
      .groupBy($"prio", $"dt")
      .agg(sum(dec($"o_totalprice")).cast("double").as("revenue"),
        count(lit(1)).as("n_orders"))
    val series = daily.groupBy($"prio")
      .agg(min($"dt").as("lo"), max($"dt").as("hi"))
      .select($"prio", explode(expr("sequence(lo, hi, interval 1 day)")).as("dt"))
    series.join(daily, Seq("prio", "dt"), "left")
      .select($"prio", $"dt", coalesce($"n_orders", lit(0L)).as("n_orders"),
        $"revenue".isNull.as("is_gap"),
        last($"revenue", ignoreNulls = true).over(
          Window.partitionBy($"prio").orderBy($"dt")).as("filled_revenue"))
      .orderBy($"prio", $"dt")
  }
  private val gapfillSql =
    """WITH daily AS (
      |  SELECT o_orderpriority AS prio, CAST(o_orderdate AS DATE) AS dt,
      |    CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS revenue,
      |    COUNT(*) AS n_orders
      |  FROM orders
      |  WHERE CAST(o_orderdate AS DATE)
      |    BETWEEN DATE '1995-01-01' AND DATE '1995-12-31'
      |  GROUP BY 1, 2),
      |bounds AS (SELECT prio, MIN(dt) AS lo, MAX(dt) AS hi FROM daily GROUP BY 1),
      |series AS (
      |  SELECT prio, CAST(g AS DATE) AS dt
      |  FROM bounds, unnest(generate_series(lo, hi, INTERVAL 1 DAY)) t(g)),
      |j AS (
      |  SELECT s.prio, s.dt, daily.revenue,
      |    COALESCE(daily.n_orders, 0) AS n_orders,
      |    daily.revenue IS NULL AS is_gap
      |  FROM series s LEFT JOIN daily ON s.prio = daily.prio AND s.dt = daily.dt)
      |SELECT prio, dt, n_orders, is_gap,
      |  LAST_VALUE(revenue IGNORE NULLS) OVER (PARTITION BY prio ORDER BY dt)
      |    AS filled_revenue
      |FROM j ORDER BY prio, dt""".stripMargin

  // ------------------------------------------- rolling z-score anomaly
  /** Rolling z-score anomaly detection — the streaming-metrics op
    * (flag a point > 3σ from its trailing baseline) in its batch form:
    * per user, each value scored against the PRECEDING 19 events
    * (current row excluded — the baseline must not contain the point
    * under test). Cross-engine float discipline: values quantize to a
    * cents grid (q ≤ ~6e4, so Σq² ≤ 7e10 — far from LONG overflow),
    * window n/Σq/Σq² are exact integers, and the 3σ verdict is a PURE
    * INTEGER predicate — (qn−s1)²(n−1) > 9n(ns2−s1²), no float enters
    * the decision; the reported z is three IEEE-deterministic ops +
    * round(4). Scale shape: one per-key window over a rows frame —
    * O(1) state per row, the same plan at any SF.
    */
  private val rollingZscore: Q = (s, d) => {
    import s.implicits._
    val e = Tables.events(s, d).select($"user_id", $"event_id",
      unix_micros($"ts".cast("timestamp")).as("ts_us"),
      expr("cast(floor(cast(value as double) * 100d + 0.5d) as bigint)").as("q"))
    val win = Window.partitionBy($"user_id").orderBy($"ts_us", $"event_id")
      .rowsBetween(-19, -1)
    val v = $"n" * $"s2" - $"s1" * $"s1"
    val dev = $"q" * $"n" - $"s1"
    e.select($"user_id", $"event_id", $"q",
        count(lit(1)).over(win).as("n"),
        sum($"q").over(win).as("s1"),
        sum($"q" * $"q").over(win).as("s2"))
      .select($"user_id", $"event_id", $"n".as("n_window"),
        when($"n" >= 10 && v > 0,
          round(dev.cast("double") / sqrt(v.cast("double")) *
            sqrt(($"n" - 1).cast("double")), 4)).as("z"),
        coalesce(when($"n" >= 10 && v > 0,
          dev * dev * ($"n" - 1) > lit(9L) * $"n" * v), lit(false))
          .as("is_anomaly"))
      .orderBy($"user_id", $"event_id")
  }
  private val rollingZscoreSql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
      |    CAST(floor(CAST(value AS DOUBLE) * 100 + 0.5) AS BIGINT) AS q
      |  FROM events),
      |w AS (
      |  SELECT user_id, event_id, q,
      |    COUNT(*) OVER win AS n,
      |    CAST(SUM(q) OVER win AS BIGINT) AS s1,
      |    CAST(SUM(q * q) OVER win AS BIGINT) AS s2
      |  FROM e
      |  WINDOW win AS (PARTITION BY user_id ORDER BY ts_us, event_id
      |                 ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING))
      |SELECT user_id, event_id, n AS n_window,
      |  CASE WHEN n >= 10 AND (n * s2 - s1 * s1) > 0 THEN
      |    round((q * n - s1) / sqrt(CAST(n * s2 - s1 * s1 AS DOUBLE))
      |      * sqrt(CAST(n - 1 AS DOUBLE)), 4)
      |  END AS z,
      |  COALESCE(CASE WHEN n >= 10 AND (n * s2 - s1 * s1) > 0 THEN
      |    (q * n - s1) * (q * n - s1) * (n - 1) > 9 * n * (n * s2 - s1 * s1)
      |  END, FALSE) AS is_anomaly
      |FROM w ORDER BY user_id, event_id""".stripMargin

  // ------------------------------------------------- triangle counting
  // Triangle counting on the part co-purchase graph (edge = two parts
  // in one order) via DEGREE ORIENTATION — the standard distributed
  // algorithm (orient every edge from its lower-degree endpoint, count
  // wedges only at sources, close against the edge set): wedge work
  // drops from Σ deg² to Σ outdeg² with outdeg ≤ √(2m), the bound that
  // makes the join tractable at 100 TB. Deterministic slice (orderkey
  // % 4) bounds graph density, not semantics. The degree table is
  // node-count-sized — linear in the catalog, far too big to broadcast
  // at the 100 TB design point — so degrees are annotated via shuffled
  // joins keyed on p1/p2 (the same keys the wedge and closure joins
  // shuffle on). NO join-strategy hints: every build side here (edge
  // list, degree table, oriented edges) is O(data/partitions), and a
  // forced shuffled-hash build died with SparkOutOfMemoryError at the
  // 20× soak point — sort-merge spills, which is why it is Spark's
  // default for large⋈large; the r6 "sorting is pure overhead"
  // micro-optimization was a small-SF artifact. Hinted `merge` (not
  // unhinted): at test SF the planner would otherwise broadcast the
  // statically-small sides, and the pinned plan must be the one that
  // survives 100×.
  // r14 floor pin (VERDICT r13 item 5; dev/expr_triangle_r19.txt):
  // the sf0.1 wall (~2.4 s, the board's slowest visible row) is NOT
  // compute — DevProfile: 16 jobs, 2.12 s of 2.67 s wall is AQE
  // job-barrier + scheduling floor, task time 5.96 s over 32 slots
  // with zero spill, no dominant stage beyond the wedge/closure pair.
  // The one candidate cut (run in the noAqe child like the shingle
  // family — triangle is the same fixed merge-hinted cascade) was
  // A/B'd interleaved same-JVM at BOTH scales: −25% wall at sf0.1
  // (barrier savings) but 1.7–2× WORSE wall and +20–55% CPU at the
  // 10× replica, where AQE's runtime coalescing of the wedge/closure
  // exchanges outweighs the barrier cost — rejected; the sf0.1 gap is
  // the scheduling floor amortizing away at scale. A Bloom/semi-join
  // pre-filter of wedges before the closure exchange was considered
  // and rejected on the scale stance: a pair filter is O(edges) state
  // that must broadcast — the same O(data) driver structure the
  // degree-table rule above already forbids at the 100 TB point.
  // ------------------------------------------------- BFS hop distances
  /** Single-source BFS over the part co-purchase graph — the iterative
    * frontier-expansion pattern (Pregel's core loop) next to pagerank's
    * fixed-iteration power method and the CC label propagation: each
    * round joins the CURRENT FRONTIER (not the whole visited set)
    * against the edge list, anti-joins out already-visited nodes, and
    * stops at the hop bound. Scale shape: edge list built once and
    * localCheckpoint-truncated (the pagerank pattern); every round is
    * one frontier-keyed shuffled join + one anti-join — O(frontier)
    * work per round, O(diameter) rounds, monotone visited set. The
    * oracle is a DuckDB RECURSIVE CTE — path enumeration bounded by
    * the same hop cap, folded to MIN(hops) per node; first-visit
    * frontier semantics ≡ min-over-paths by BFS's invariant. */
  private val bfsHops: Q = (s, d) => {
    import s.implicits._
    val li = Tables.lineitem(s, d).filter($"l_orderkey" % 4 === 0)
      .select($"l_orderkey", $"l_partkey")
    val e0 = li.as("a").hint("merge")
      .join(li.as("b"), $"a.l_orderkey" === $"b.l_orderkey" &&
        $"a.l_partkey" < $"b.l_partkey")
      .select($"a.l_partkey".as("p1"), $"b.l_partkey".as("p2"))
      .distinct()
    val edges = graft.Lineage.cut(
      e0.unionAll(e0.select($"p2".as("p1"), $"p1".as("p2"))))
    val srcRow = edges.agg(min($"p1")).head
    if (srcRow.isNullAt(0)) { // no edges → empty BFS, not an NPE
      Seq.empty[(Long, Int)].toDF("node", "hops")
    } else {
      val src = srcRow.getLong(0)
      var frontier = Seq(src).toDF("node").withColumn("hops", lit(0))
      var visited = frontier
      for (h <- 1 to 3) {
        val next = graft.Lineage.cut(edges
          .join(frontier.select($"node"), $"p1" === $"node")
          .select($"p2".as("node")).distinct()
          .join(visited.select($"node"), Seq("node"), "left_anti")
          .withColumn("hops", lit(h))) // truncate per-round lineage (pagerank pattern)
        visited = graft.Lineage.cut(visited.unionByName(next))
        frontier = next
      }
      visited.orderBy($"hops", $"node")
    }
  }
  private val bfsHopsSql =
    """WITH RECURSIVE li AS (
      |  SELECT l_orderkey, l_partkey FROM lineitem WHERE l_orderkey % 4 = 0),
      |e AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |       AND a.l_partkey < b.l_partkey),
      |ed AS (SELECT p1, p2 FROM e UNION ALL SELECT p2, p1 FROM e),
      |bfs(node, hops) AS (
      |  SELECT (SELECT MIN(p1) FROM ed), 0
      |  UNION ALL
      |  SELECT ed.p2, bfs.hops + 1
      |  FROM bfs JOIN ed ON ed.p1 = bfs.node WHERE bfs.hops < 3)
      |SELECT node, CAST(MIN(hops) AS INT) AS hops
      |FROM bfs GROUP BY node ORDER BY hops, node""".stripMargin

  private val triangleCount: Q = (s, d) => {
    import s.implicits._
    val li = Tables.lineitem(s, d).filter($"l_orderkey" % 4 === 0)
      .select($"l_orderkey", $"l_partkey")
    // e feeds FOUR consumers (degree table, both orientation joins, the
    // closing probe, the edge count) and o feeds the wedge self-join
    // twice — materialize each ONCE; without the checkpoints the
    // edge-building self-join+distinct re-executed per consumer
    // (measured 7.7 s of task time for ~2 s of unique work)
    val e = graft.Lineage.cut(li.as("a").hint("merge")
      .join(li.as("b"), $"a.l_orderkey" === $"b.l_orderkey" &&
        $"a.l_partkey" < $"b.l_partkey")
      .select($"a.l_partkey".as("p1"), $"b.l_partkey".as("p2"))
      .distinct())
    val deg = e.select($"p1".as("node")).unionAll(e.select($"p2".as("node")))
      .groupBy($"node").agg(count(lit(1)).as("dg"))
    val lower = ($"d1" < $"d2") || ($"d1" === $"d2" && $"p1" < $"p2")
    val o = graft.Lineage.cut(e
      .join(deg.select($"node".as("p1"), $"dg".as("d1")).hint("merge"), "p1")
      .join(deg.select($"node".as("p2"), $"dg".as("d2")).hint("merge"), "p2")
      .select(when(lower, $"p1").otherwise($"p2").as("src"),
        when(lower, $"p2").otherwise($"p1").as("dst")))
    // wedge COUNT by the degree identity Σ C(outdeg(src), 2) — dst is
    // unique per src (e is distinct, orientation injective), so the
    // x.dst < y.dst self-join emits exactly C(c,2) rows per src; the
    // closed-triangle probe is the ONLY consumer that still needs the
    // wedge ROWS, so the O(wedges) relation is built once and never
    // counted by re-materialization
    val nWedges = o.groupBy($"src").agg(count(lit(1)).as("c"))
      .agg(sum(expr("c * (c - 1) div 2")).as("n_wedges")) // pure LONG arithmetic
    val w = o.as("x").hint("merge")
      .join(o.as("y"), $"x.src" === $"y.src" && $"x.dst" < $"y.dst")
      .select($"x.dst".as("b"), $"y.dst".as("c"))
    val closed = w.hint("merge")
      .join(e, $"b" === $"p1" && $"c" === $"p2")
    e.agg(count(lit(1)).as("n_edges"))
      .crossJoin(nWedges)
      .crossJoin(closed.agg(count(lit(1)).as("n_triangles")))
  }
  private val triangleCountSql =
    """WITH li AS (SELECT l_orderkey, l_partkey FROM lineitem
      |            WHERE l_orderkey % 4 = 0),
      |e AS (SELECT DISTINCT a.l_partkey AS p1, b.l_partkey AS p2
      |      FROM li a JOIN li b ON a.l_orderkey = b.l_orderkey
      |       AND a.l_partkey < b.l_partkey),
      |deg AS (SELECT node, COUNT(*) AS dg FROM (
      |          SELECT p1 AS node FROM e
      |          UNION ALL SELECT p2 AS node FROM e) GROUP BY 1),
      |o AS (SELECT
      |        CASE WHEN d1.dg < d2.dg OR (d1.dg = d2.dg AND p1 < p2)
      |             THEN p1 ELSE p2 END AS src,
      |        CASE WHEN d1.dg < d2.dg OR (d1.dg = d2.dg AND p1 < p2)
      |             THEN p2 ELSE p1 END AS dst
      |      FROM e JOIN deg d1 ON e.p1 = d1.node
      |             JOIN deg d2 ON e.p2 = d2.node),
      |w AS (SELECT x.dst AS b, y.dst AS c FROM o x
      |      JOIN o y ON x.src = y.src AND x.dst < y.dst),
      |t AS (SELECT COUNT(*) AS n_triangles FROM w
      |      JOIN e ON w.b = e.p1 AND w.c = e.p2)
      |SELECT (SELECT COUNT(*) FROM e) AS n_edges,
      |       (SELECT COUNT(*) FROM w) AS n_wedges,
      |       (SELECT n_triangles FROM t) AS n_triangles""".stripMargin

  // ------------------------------------------- min-cost supplier (Q2)
  /** TPC-H Q2 SHAPE — the correlated "supplier with the minimum supply
    * cost per part, within a region" lookup. This schema carries no
    * partsupp, so supply cost derives from lineitem: exact DECIMAL MIN
    * of l_extendedprice per (part, supplier) — the structure (fact
    * aggregate → region-filtered dim join → per-part correlated min →
    * top-100), not the constant, is the point. Scale shape: ONE fact
    * shuffle builds the (part, supplier) cost table; the correlated
    * subquery decorrelates to a per-part window MIN over the
    * already-aggregated (much smaller) cost table; supplier/nation/
    * region and the filtered part dim all broadcast; top-100 is
    * TakeOrderedAndProject. Fully deterministic: DECIMAL cost, total
    * tiebreak order. */
  private val minCostSupplier: Q = (s, d) => {
    import s.implicits._
    val eu = Tables.supplier(s, d)
      .join(broadcast(Tables.nation(s, d)), $"s_nationkey" === $"n_nationkey")
      .join(broadcast(Tables.region(s, d)), $"n_regionkey" === $"r_regionkey")
      .filter($"r_name" === "EUROPE")
      .select($"s_suppkey", $"s_name", $"s_acctbal", $"n_name")
    val pSel = Tables.part(s, d)
      .filter($"p_type" === "PROMO" && $"p_size".between(10, 20))
      .select($"p_partkey", $"p_brand")
    // push BOTH dimension filters BELOW the fact aggregate: the min is
    // per (partkey, suppkey) group, and the part/EU-supplier predicates
    // only DROP whole groups (they key on the grouping columns), so
    // pre-filtering cannot change any surviving group's cost or any
    // surviving partkey's window min — semantically identical to the
    // oracle's post-aggregate joins, but the aggregate and the window
    // see sel(part)·sel(EU) of the fact instead of all of it. Catalyst
    // cannot infer this (the filters sit above an aggregate with no
    // pushdown rule for grouped-key semi-filters); at 100 TB this is
    // the difference between aggregating the fact and aggregating ~2%
    // of it. Both dim filters are broadcast semi-probes on the scan.
    val cost = Tables.lineitem(s, d)
      .select($"l_partkey", $"l_suppkey", dec($"l_extendedprice").as("p"))
      .join(broadcast(pSel.select($"p_partkey")),
        $"l_partkey" === $"p_partkey", "leftsemi")
      .join(broadcast(eu.select($"s_suppkey")),
        $"l_suppkey" === $"s_suppkey", "leftsemi")
      .groupBy($"l_partkey", $"l_suppkey")
      .agg(min($"p").as("cost"))
    cost.join(broadcast(eu), $"l_suppkey" === $"s_suppkey")
      .withColumn("min_cost",
        min($"cost").over(Window.partitionBy($"l_partkey")))
      .filter($"cost" === $"min_cost")
      .join(broadcast(pSel), $"l_partkey" === $"p_partkey")
      .select($"s_acctbal", $"s_name", $"n_name", $"p_partkey", $"p_brand",
        $"cost".cast("double").as("cost"))
      .orderBy($"s_acctbal".desc, $"n_name", $"s_name", $"p_partkey")
      .limit(100)
  }
  private val minCostSupplierSql =
    """WITH cost AS (
      |  SELECT l_partkey, l_suppkey,
      |    MIN(CAST(l_extendedprice AS DECIMAL(18,4))) AS cost
      |  FROM lineitem GROUP BY 1, 2),
      |eu AS (
      |  SELECT s_suppkey, s_name, s_acctbal, n_name
      |  FROM supplier, nation, region
      |  WHERE s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      |    AND r_name = 'EUROPE'),
      |b AS (
      |  SELECT *, MIN(cost) OVER (PARTITION BY l_partkey) AS min_cost
      |  FROM cost JOIN eu ON l_suppkey = s_suppkey)
      |SELECT s_acctbal, s_name, n_name, p_partkey, p_brand,
      |  CAST(cost AS DOUBLE) AS cost
      |FROM b JOIN part ON l_partkey = p_partkey
      |WHERE cost = min_cost AND p_type = 'PROMO' AND p_size BETWEEN 10 AND 20
      |ORDER BY s_acctbal DESC, n_name, s_name, p_partkey LIMIT 100""".stripMargin

  // ---------------------------------------------- top supplier (Q15)
  /** TPC-H Q15 SHAPE — the "revenue view + suppliers matching its MAX"
    * query. Scale shape: one map-side-combined fact aggregate to a
    * supplier-sized revenue table; the MAX is a 1-row scalar aggregate
    * broadcast back via crossJoin (never a single-reducer global
    * window — the revenue table is supplier-count-sized and a
    * Window.partitionBy() would funnel it through one task); supplier
    * names broadcast. DECIMAL revenue → the = MAX equality is exact on
    * both engines. */
  private val topSupplier: Q = (s, d) => {
    import s.implicits._
    val rev = Tables.lineitem(s, d)
      .filter($"l_shipdate" >= lit("1996-01-01 00:00:00").cast("timestamp_ntz") &&
        $"l_shipdate" < lit("1996-04-01 00:00:00").cast("timestamp_ntz"))
      .select($"l_suppkey", (dec($"l_extendedprice") * dec(lit(1) - $"l_discount")).as("r"))
      .groupBy($"l_suppkey").agg(sum($"r").as("total_rev"))
    val mx = rev.agg(max($"total_rev").as("mx"))
    rev.crossJoin(broadcast(mx))
      .filter($"total_rev" === $"mx")
      .join(broadcast(Tables.supplier(s, d).select($"s_suppkey", $"s_name")),
        $"l_suppkey" === $"s_suppkey")
      .select($"s_suppkey", $"s_name", $"total_rev".cast("double").as("total_rev"))
      .orderBy($"s_suppkey")
  }
  private val topSupplierSql =
    """WITH rev AS (
      |  SELECT l_suppkey,
      |    SUM(CAST(l_extendedprice AS DECIMAL(18,4))
      |      * CAST(1 - l_discount AS DECIMAL(18,4))) AS total_rev
      |  FROM lineitem
      |  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
      |    AND l_shipdate < TIMESTAMP '1996-04-01'
      |  GROUP BY 1)
      |SELECT s_suppkey, s_name, CAST(total_rev AS DOUBLE) AS total_rev
      |FROM rev JOIN supplier ON l_suppkey = s_suppkey
      |WHERE total_rev = (SELECT MAX(total_rev) FROM rev)
      |ORDER BY s_suppkey""".stripMargin

  // -------------------------------------------- idle customers (Q22)
  /** TPC-H Q22 SHAPE — "rich customers in selected country codes with
    * no orders": a global scalar average, an above-average filter, and
    * a NOT EXISTS decorrelated to an anti join. This schema has no
    * phone column, so the country code is a nationkey residue — shape
    * over constant, as with Q21. The above-average comparison runs as
    * exact cross-multiplication (bal·cnt > total, all DECIMAL/BIGINT)
    * instead of comparing against a floating AVG — engines never see a
    * float until the output cast. Scale shape: the customer scan
    * aggregates to ONE stats row broadcast back; the anti join
    * shuffles only code-filtered above-average customers against the
    * orders key column. */
  private val idleCustomers: Q = (s, d) => {
    import s.implicits._
    val cands = Tables.customer(s, d)
      .withColumn("code", pmod($"c_nationkey", lit(7)).cast("int"))
      .filter($"code".isin(1, 3, 5))
      .select($"c_custkey", $"code", dec($"c_acctbal").as("bal"))
    val stats = cands.filter($"bal" > 0)
      .agg(sum($"bal").as("tot"), count(lit(1)).as("cnt"))
    cands.crossJoin(broadcast(stats))
      .filter($"bal" * $"cnt" > $"tot")
      // "no RECENT orders" (this dense fixture gives every customer
      // some order; Q22's NOT EXISTS stays non-degenerate under a
      // recency cut, and the date predicate pushes to the orders scan)
      .join(Tables.orders(s, d)
          .filter($"o_orderdate" >= lit("2000-06-01 00:00:00").cast("timestamp_ntz"))
          .select($"o_custkey"),
        $"c_custkey" === $"o_custkey", "left_anti")
      .groupBy($"code")
      .agg(count(lit(1)).as("numcust"), sum($"bal").cast("double").as("totacctbal"))
      .orderBy($"code")
  }
  private val idleCustomersSql =
    """WITH cands AS (
      |  SELECT c_custkey, CAST(c_nationkey % 7 AS INT) AS code,
      |    CAST(c_acctbal AS DECIMAL(18,4)) AS bal
      |  FROM customer WHERE c_nationkey % 7 IN (1, 3, 5)),
      |stats AS (
      |  SELECT SUM(bal) AS tot, COUNT(*) AS cnt FROM cands WHERE bal > 0)
      |SELECT code, COUNT(*) AS numcust,
      |  CAST(SUM(bal) AS DOUBLE) AS totacctbal
      |FROM cands, stats
      |WHERE bal * cnt > tot
      |  AND NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderdate >= TIMESTAMP '2000-06-01')
      |GROUP BY code ORDER BY code""".stripMargin

  val queries: Map[String, Q] = Map(
    "rel_min_cost_supplier"  -> minCostSupplier,
    "rel_top_supplier"       -> topSupplier,
    "rel_idle_customers"     -> idleCustomers,
    "rel_window_range"       -> windowRange,
    "rel_gapfill"            -> gapfill,
    "rel_rolling_zscore"     -> rollingZscore,
    "rel_triangle_count"     -> triangleCount,
    "rel_returned_revenue"   -> returnedRevenue,
    "rel_pagerank"           -> pagerank,
    "rel_salted_join"        -> saltedJoin,
    "rel_bucketed_join"      -> bucketedJoin,
    "rel_histogram"          -> histogram,
    "rel_funnel"             -> funnel,
    "rel_retention"          -> retention,
    "rel_grouping_sets"      -> groupingSetsQ,
    "rel_window_distribution" -> windowDistribution,
    "rel_nation_revenue"     -> nationRevenue,
    "rel_cube"               -> cube,
    "rel_percentiles"        -> percentiles,
    "rel_string_funcs"       -> stringFuncs,
    "rel_null_semantics"     -> nullSemantics,
    "rel_range_join"         -> rangeJoin,
    "rel_join_full_outer"    -> joinFullOuter,
    "rel_sessions"           -> sessions,
    "rel_approx_distinct"    -> approxDistinct,
    "rel_sketch_union"       -> sketchUnion,
    "rel_rollup"             -> rollup,
    "rel_window_frames"      -> windowFrames,
    "rel_asof_state"         -> asofState,
    "rel_pricing_summary"    -> pricingSummary,
    "rel_revenue_rollup"     -> revenueRollup,
    "rel_filtered_count_sum" -> filteredCountSum,
    "rel_topk_orders"        -> topkOrders,
    "rel_join_inner"         -> joinInner,
    "rel_join_left_counts"   -> joinLeftCounts,
    "rel_join_semi"          -> joinSemi,
    "rel_join_anti"          -> joinAnti,
    "rel_star_join"          -> starJoin,
    "rel_window_lead"        -> windowLead,
    "rel_argmax_latest"      -> argmaxLatest,
    "rel_union_ops"          -> unionOps,
    "rel_distinct_pairs"     -> distinctPairs,
    "rel_hash_fingerprint"   -> hashFingerprint,
    "rel_date_buckets"       -> dateBuckets,
    "rel_case_decode"        -> caseDecode,
    "rel_global_aggs"        -> globalAggs,
    "rel_op_breakdown"       -> opBreakdown,
    "rel_incremental_filter" -> incrementalFilter,
    "rel_asof_join"          -> asofJoin,
    "rel_setops"             -> setOps,
    "rel_pivot"              -> pivotStatus,
    "rel_window_ranks"       -> windowRanks,
    "rel_array_funcs"        -> arrayFuncs,
    "rel_shipping_priority"  -> shippingPriority,
    "rel_trade_volume"       -> tradeVolume,
    "rel_market_share"       -> marketShare,
    "rel_product_profit"     -> productProfit,
    "rel_big_orders"         -> bigOrders,
    "rel_late_suppliers"     -> lateSuppliers,
    "rel_heavy_hitters"      -> heavyHitters,
    "rel_skyline"            -> skyline,
    "rel_bfs_hops"           -> bfsHops,
    "rel_interval_overlap"   -> intervalOverlap,
  )

  val oracles: Map[String, String] = Map(
    "rel_min_cost_supplier"  -> minCostSupplierSql,
    "rel_top_supplier"       -> topSupplierSql,
    "rel_idle_customers"     -> idleCustomersSql,
    "rel_window_range"       -> windowRangeSql,
    "rel_gapfill"            -> gapfillSql,
    "rel_rolling_zscore"     -> rollingZscoreSql,
    "rel_triangle_count"     -> triangleCountSql,
    "rel_approx_distinct"    -> approxDistinctSql,
    "rel_sketch_union"       -> sketchUnionSql,
    "rel_trade_volume"       -> tradeVolumeSql,
    "rel_market_share"       -> marketShareSql,
    "rel_product_profit"     -> productProfitSql,
    "rel_big_orders"         -> bigOrdersSql,
    "rel_late_suppliers"     -> lateSuppliersSql,
    "rel_heavy_hitters"      -> heavyHittersSql,
    "rel_skyline"            -> skylineSql,
    "rel_bfs_hops"           -> bfsHopsSql,
    "rel_interval_overlap"   -> intervalOverlapSql,
    "rel_returned_revenue"   -> returnedRevenueSql,
    "rel_pagerank"           -> pagerankSql,
    "rel_salted_join"        -> saltedJoinSql,
    // same plain-join oracle: bucketing is a pure layout change
    "rel_bucketed_join"      -> saltedJoinSql,
    "rel_histogram"          -> histogramSql,
    "rel_funnel"             -> funnelSql,
    "rel_retention"          -> retentionSql,
    "rel_grouping_sets"      -> groupingSetsSql,
    "rel_window_distribution" -> windowDistributionSql,
    "rel_nation_revenue"     -> nationRevenueSql,
    "rel_cube"               -> cubeSql,
    "rel_percentiles"        -> percentilesSql,
    "rel_string_funcs"       -> stringFuncsSql,
    "rel_null_semantics"     -> nullSemanticsSql,
    "rel_range_join"         -> rangeJoinSql,
    "rel_join_full_outer"    -> joinFullOuterSql,
    "rel_sessions"           -> sessionsSql,
    "rel_rollup"             -> rollupSql,
    "rel_window_frames"      -> windowFramesSql,
    "rel_asof_state"         -> asofStateSql,
    "rel_pricing_summary"    -> pricingSummarySql,
    "rel_revenue_rollup"     -> revenueRollupSql,
    "rel_filtered_count_sum" -> filteredCountSumSql,
    "rel_topk_orders"        -> topkOrdersSql,
    "rel_join_inner"         -> joinInnerSql,
    "rel_join_left_counts"   -> joinLeftCountsSql,
    "rel_join_semi"          -> joinSemiSql,
    "rel_join_anti"          -> joinAntiSql,
    "rel_star_join"          -> starJoinSql,
    "rel_window_lead"        -> windowLeadSql,
    "rel_argmax_latest"      -> argmaxLatestSql,
    "rel_union_ops"          -> unionOpsSql,
    "rel_distinct_pairs"     -> distinctPairsSql,
    "rel_hash_fingerprint"   -> hashFingerprintSql,
    "rel_date_buckets"       -> dateBucketsSql,
    "rel_case_decode"        -> caseDecodeSql,
    "rel_global_aggs"        -> globalAggsSql,
    "rel_op_breakdown"       -> opBreakdownSql,
    "rel_incremental_filter" -> incrementalFilterSql,
    "rel_asof_join"          -> asofJoinSql,
    "rel_setops"             -> setOpsSql,
    "rel_pivot"              -> pivotStatusSql,
    "rel_window_ranks"       -> windowRanksSql,
    "rel_array_funcs"        -> arrayFuncsSql,
    "rel_shipping_priority"  -> shippingPrioritySql,
  )
}
