package graft.queries

import graft.Tables
import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.functions.GraftFunctions.roundPinned

/** Oracle-checked queries covering SURVEY.md §2's operator inventory
  * (the reference's own capabilities). Each entry has a DuckDB oracle
  * with identical column names and ORDER BY.
  */
object ParityQueries {

  /** Build the python-literal junk string the repair chain exists for,
    * from a clean source column — identically in Spark and DuckDB, so
    * the repair itself is what's compared.
    */
  private def pythonLiteral(src: org.apache.spark.sql.Column) =
    concat(lit("{'wifi': u'"), src, lit("', 'open': True, 'extra': None}"))

  def queries: Map[String, (SparkSession, String) => DataFrame] = scala.collection.immutable.ListMap(

    // F5–F7: the 6-step python-literal → JSON repair chain.
    "q_string_repair" -> ((s, dir) => {
      Tables.documents(s, dir)
        .withColumn("raw", pythonLiteral(col("lang")))
        .select(col("doc_id"), StringRepair.repair(col("raw")).as("repaired"))
        .orderBy("doc_id")
    }),

    // clean.py:95-106: data-dependent typing. `flag` repairs to
    // true/false on every row → BooleanType wins; `label` (free text)
    // fails every candidate → stays string.
    "q_safe_cast" -> ((s, dir) => {
      // NULL value stays NULL (matches the oracle's `value > 50`
      // three-valued logic; events.value currently has no NULLs but
      // don't bake that in).
      val ev = Tables.events(s, dir).select(
        col("event_id"),
        when(col("value").isNotNull,
          when(col("value") > 50, lit("True")).otherwise(lit("False"))).as("flag"),
        col("event_type").as("label"))
      val repaired = ev.withColumn("flag", StringRepair.repair(col("flag")))
      SafeCast.convertColumns(repaired, Seq("flag", "label"),
        SafeCast.yelpAttributeCandidates).orderBy("event_id")
    }),

    // J1 + P4: One Big Table — lineitem fact ⋈ part, supplier dims,
    // prefixed columns, dup keys dropped. Dims are broadcast (they are
    // orders of magnitude smaller than the fact — the 100 TB plan).
    "q_enrich_obt" -> ((s, dir) => {
      val fact = Tables.lineitem(s, dir)
        .withColumnRenamed("l_partkey", "partkey")
        .withColumnRenamed("l_suppkey", "suppkey")
      val dims = Seq(
        Enrich.Dim("part", Tables.part(s, dir)
          .withColumnRenamed("p_partkey", "partkey"), "partkey"),
        Enrich.Dim("supplier", Tables.supplier(s, dir)
          .withColumnRenamed("s_suppkey", "suppkey"), "suppkey"))
      Enrich.oneBigTable(fact, dims)
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // A1: the reference's only aggregation — before/after null-count
    // validation (safe_convert_string's accept test) as one global agg.
    "q_conditional_count" -> ((s, dir) => {
      Tables.events(s, dir).agg(
        count(when(col("props").isNull, 1)).as("max_allowed_null_count"),
        count(when(col("props").try_cast("boolean").isNull, 1)).as("null_count"))
    }),

    // F1 + F3: CSV-ish split + explode (the checkin shape), with
    // posexplode so row identity is deterministic.
    "q_explode_split" -> ((s, dir) => {
      Tables.documents(s, dir)
        .select(col("doc_id"), posexplode(split(col("text"), " ", -1)))
        .toDF("doc_id", "pos", "token")
        .orderBy("doc_id", "pos")
    }),

    // F4 (deterministic variant): dense surrogate id by natural-key
    // order — the oracle-comparable replacement for
    // monotonically_increasing_id (SURVEY §7.4 item 2), computed with
    // the partition-offset shape (no single-partition global window).
    "q_surrogate_id" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_linenumber")
      Surrogate.withSequentialId(li, "rid", col("l_orderkey"), col("l_linenumber"))
        .select("rid", "l_orderkey", "l_linenumber")
        .orderBy("rid")
    }),

    // Gold-layer aggregation (the reference's motivating TODO,
    // clean.py:31): date-feature bucket × event_type rollup.
    "q_gold_daily" -> ((s, dir) => {
      val ev = DateFeatures.withDateFeatures(Tables.events(s, dir), "ts")
      ev.groupBy(col("ts_date"), col("event_type"))
        .agg(
          count(lit(1)).as("n_events"),
          roundPinned(sum(col("value")), 2).as("total_value"))
        .orderBy("ts_date", "event_type")
    }),

    // Gold-layer week/quarter rollup over the enriched OBT — the
    // aggregation the reference's silver layer was explicitly built to
    // serve (clean.py:31,41 docstrings; gold is the TODO at
    // run-all-pipelines.sh:239): fact ⋈ broadcast dim → date features
    // on the dim's date → groupBy the feature columns. ISO week and
    // calendar year/quarter are per-row functions both engines agree
    // on, so weeks straddling a quarter boundary bucket identically.
    "q_gold_weekly" -> ((s, dir) => {
      val fact = Tables.lineitem(s, dir)
        .withColumnRenamed("l_orderkey", "orderkey")
      val dims = Seq(
        Enrich.Dim("orders", Tables.orders(s, dir)
          .withColumnRenamed("o_orderkey", "orderkey"), "orderkey"))
      val obt = DateFeatures.withDateFeatures(
        Enrich.oneBigTable(fact, dims), "orders_o_orderdate")
      obt.groupBy(
          col("orders_o_orderdate_year").as("order_year"),
          col("orders_o_orderdate_quarter").as("order_quarter"),
          col("orders_o_orderdate_week").as("order_week"))
        .agg(
          countDistinct(col("orderkey")).as("n_orders"),
          count(lit(1)).as("n_lineitems"),
          // money as exact integer cents: the per-row product is the
          // same IEEE double in any engine, per-row rounding is then
          // deterministic, and integer summation is associative — a
          // rounded SUM of doubles differs in the last cent across
          // fold orders (and did, at row 239 of the first cut).
          sum(roundPinned(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long")).as("revenue_cents"))
        .orderBy("order_year", "order_quarter", "order_week")
    }),

    // Skew-salted join vs a PLAIN-join oracle: proves the salting
    // transform is semantics-preserving (hot keys spread over `salts`
    // reducers; the oracle knows nothing about salt).
    "q_salted_join" -> ((s, dir) => {
      val fact = Tables.lineitem(s, dir)
        .select("l_orderkey", "l_linenumber", "l_partkey")
      val dim = Tables.part(s, dir)
        .select(col("p_partkey").as("l_partkey"), col("p_name"))
      Skew.saltedJoin(fact, dim, "l_partkey", salts = 8,
          factSaltSource = col("l_orderkey") * 8 + col("l_linenumber"))
        .select("l_orderkey", "l_linenumber", "l_partkey", "p_name")
        .orderBy("l_orderkey", "l_linenumber")
    }),

    // TPC-H Q1-shaped pricing summary: the bench headline groupBy agg.
    "q1_pricing_summary" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          roundPinned(sum(col("l_quantity")), 2).as("sum_qty"),
          roundPinned(sum(col("l_extendedprice")), 2).as("sum_base_price"),
          roundPinned(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("sum_disc_price"),
          roundPinned(avg(col("l_discount")), 6).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")
    }),

    // TPC-H Q3 (shipping priority, adapted to this schema): selective
    // dim filter → fact join → group → top-k. The customer side is an
    // explicit broadcast (15k rows at sf0.1 — never shuffle lineitem
    // for it); lineitem⋈orders stays a shuffle join, the correct plan
    // when both sides are large. Top-10 lowers to TakeOrderedAndProject.
    "q3_shipping_priority" -> ((s, dir) => {
      val cust = Tables.customer(s, dir)
        .filter(col("c_mktsegment") === "BUILDING").select("c_custkey")
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") < expr("TIMESTAMP_NTZ '1997-01-01'"))
        .select("o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority")
      val li = Tables.lineitem(s, dir)
        .filter(col("l_shipdate") > expr("TIMESTAMP_NTZ '1997-01-01'"))
        .select("l_orderkey", "l_extendedprice", "l_discount")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(roundPinned(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate", "o_orderpriority")
        .orderBy(col("revenue").desc, col("o_orderdate"), col("l_orderkey"))
        .limit(10)
    }),

    // TPC-H Q5 (local supplier volume): the 6-table star join with the
    // classic c_nationkey = s_nationkey co-location predicate. Every
    // dimension broadcasts (supplier/customer/nation/region are all
    // tiny next to lineitem); only lineitem⋈orders shuffles.
    "q5_local_supplier" -> ((s, dir) => {
      val ord = Tables.orders(s, dir)
        .filter(col("o_orderdate") >= expr("TIMESTAMP_NTZ '1996-01-01'") &&
          col("o_orderdate") < expr("TIMESTAMP_NTZ '1997-01-01'"))
        .select("o_orderkey", "o_custkey")
      val asia = broadcast(Tables.nation(s, dir)
        .join(broadcast(Tables.region(s, dir).filter(col("r_name") === "ASIA")),
          col("n_regionkey") === col("r_regionkey"))
        .select("n_nationkey", "n_name"))
      Tables.lineitem(s, dir)
        .select("l_orderkey", "l_suppkey", "l_extendedprice", "l_discount")
        .join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_nationkey")),
          col("o_custkey") === col("c_custkey"))
        .join(broadcast(Tables.supplier(s, dir).select("s_suppkey", "s_nationkey")),
          col("l_suppkey") === col("s_suppkey") &&
            col("c_nationkey") === col("s_nationkey"))
        .join(asia, col("s_nationkey") === col("n_nationkey"))
        .groupBy("n_name")
        .agg(roundPinned(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2)
          .as("revenue"))
        .orderBy(col("revenue").desc, col("n_name"))
    }),

    // TPC-H Q18 (large-volume orders): having-aggregate semi-join
    // feeding the detail join — the IN-subquery shape planned as a
    // left-semi on the shared l_orderkey shuffle key.
    "q18_large_orders" -> ((s, dir) => {
      val li = Tables.lineitem(s, dir).select("l_orderkey", "l_quantity")
      val big = li.groupBy("l_orderkey")
        .agg(sum(col("l_quantity")).as("__q"))
        .filter(col("__q") > 190)
        .select("l_orderkey")
      li.join(big, Seq("l_orderkey"), "left_semi")
        .join(Tables.orders(s, dir)
          .select("o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"),
          col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(Tables.customer(s, dir).select("c_custkey", "c_name")),
          col("o_custkey") === col("c_custkey"))
        .groupBy("c_name", "c_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .agg(roundPinned(sum(col("l_quantity")), 2).as("sum_qty"))
        .orderBy(col("o_totalprice").desc, col("o_orderkey"))
        .limit(100)
    }),

    // TPC-H Q17 (small-quantity revenue): the correlated scalar
    // subquery (per-part 0.2×avg threshold) DECORRELATED into a
    // window over the part key — one lineitem pass + one shuffle,
    // where the naive translation scans lineitem twice and joins the
    // per-part aggregate back. The semi-joined frame still contains
    // every lineitem row of each surviving part, so the window avg
    // equals the full-table correlated avg. Exactness: l_quantity is
    // integral, so per-part sums are exact doubles and the threshold
    // compares identically in both engines.
    "q17_small_quantity" -> ((s, dir) => {
      val pt = Tables.part(s, dir).filter(col("p_size") < 10).select("p_partkey")
      Tables.lineitem(s, dir)
        .select("l_partkey", "l_quantity", "l_extendedprice")
        .join(broadcast(pt), col("l_partkey") === col("p_partkey"), "left_semi")
        .withColumn("__avg_q",
          avg(col("l_quantity")).over(
            org.apache.spark.sql.expressions.Window.partitionBy("l_partkey")))
        .filter(col("l_quantity") < lit(0.2) * col("__avg_q"))
        .agg(roundPinned(sum(col("l_extendedprice")) / lit(7.0), 2).as("avg_yearly"))
    }),

    // Pivot (A2-class relational surface): daily value totals spread
    // across explicit event-type columns. Explicit pivot values keep
    // the output schema static (no extra distinct-scan job) and make
    // the plan a single groupBy — the two-pass auto-discovery variant
    // is the anti-pattern at scale.
    "q_pivot" -> ((s, dir) => {
      Tables.events(s, dir)
        .select(to_date(col("ts")).as("day"), col("event_type"), col("value"))
        .groupBy("day")
        .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
        .agg(roundPinned(sum(col("value")), 2))
        .orderBy("day")
    }),

    // Rollup: subtotal hierarchy over the pricing-summary keys, level
    // tagged by grouping_id. One shuffle — Spark expands grouping sets
    // map-side, it does not re-aggregate per level.
    "q_rollup" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .rollup(col("l_returnflag"), col("l_linestatus"))
        .agg(
          roundPinned(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("count_order"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    }),

    // Cube: all 2^k grouping sets of the same keys.
    "q_cube" -> ((s, dir) => {
      Tables.lineitem(s, dir)
        .cube(col("l_returnflag"), col("l_linestatus"))
        .agg(
          roundPinned(sum(col("l_quantity")), 2).as("sum_qty"),
          count(lit(1)).as("count_order"),
          grouping_id().as("gid"))
        .orderBy(col("gid"), asc_nulls_first("l_returnflag"),
          asc_nulls_first("l_linestatus"))
    }))

  def oracleSql: Map[String, String] = Map(
    "q_string_repair" ->
      """WITH raw AS (
        |  SELECT doc_id,
        |    '{''wifi'': u''' || lang || ''', ''open'': True, ''extra'': None}' AS raw
        |  FROM documents
        |), s1 AS (SELECT doc_id, regexp_replace(raw, '^u''(.*)''$', '\1', 'g') AS v FROM raw
        |), s2 AS (SELECT doc_id, regexp_replace(v, 'u(''.*?'')', '\1', 'g') AS v FROM s1
        |), s3 AS (SELECT doc_id, regexp_replace(v, '''none''', 'none', 'g') AS v FROM s2
        |), s4 AS (SELECT doc_id, CASE WHEN lower(v) = 'none' THEN NULL ELSE v END AS v FROM s3
        |), s5 AS (SELECT doc_id, regexp_replace(v, '[Nn]one', 'null', 'g') AS v FROM s4
        |), s6 AS (SELECT doc_id, regexp_replace(v, 'False', 'false', 'g') AS v FROM s5
        |) SELECT doc_id, regexp_replace(v, 'True', 'true', 'g') AS repaired
        |FROM s6 ORDER BY doc_id""".stripMargin,
    "q_safe_cast" ->
      """SELECT event_id, (value > 50) AS flag, event_type AS label
        |FROM events ORDER BY event_id""".stripMargin,
    "q_enrich_obt" ->
      """SELECT l.l_orderkey, l.partkey, l.suppkey, l.l_linenumber, l.l_quantity,
        |  l.l_extendedprice, l.l_discount, l.l_tax, l.l_returnflag, l.l_linestatus,
        |  l.l_shipdate,
        |  p.p_name AS part_p_name, p.p_brand AS part_p_brand,
        |  p.p_type AS part_p_type, p.p_size AS part_p_size,
        |  p.p_retailprice AS part_p_retailprice,
        |  su.s_name AS supplier_s_name, su.s_nationkey AS supplier_s_nationkey,
        |  su.s_acctbal AS supplier_s_acctbal
        |FROM (SELECT l_orderkey, l_partkey AS partkey, l_suppkey AS suppkey,
        |        l_linenumber, l_quantity, l_extendedprice, l_discount, l_tax,
        |        l_returnflag, l_linestatus, l_shipdate FROM lineitem) l
        |JOIN part p ON l.partkey = p.p_partkey
        |JOIN supplier su ON l.suppkey = su.s_suppkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "q3_shipping_priority" ->
      """SELECT l_orderkey,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
        |  o_orderdate, o_orderpriority
        |FROM customer, orders, lineitem
        |WHERE c_mktsegment = 'BUILDING'
        |  AND c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |  AND l_shipdate > TIMESTAMP '1997-01-01'
        |GROUP BY l_orderkey, o_orderdate, o_orderpriority
        |ORDER BY revenue DESC, o_orderdate, l_orderkey
        |LIMIT 10""".stripMargin,
    "q5_local_supplier" ->
      """SELECT n_name,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
        |FROM customer, orders, lineitem, supplier, nation, region
        |WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
        |  AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
        |  AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
        |  AND r_name = 'ASIA'
        |  AND o_orderdate >= TIMESTAMP '1996-01-01'
        |  AND o_orderdate < TIMESTAMP '1997-01-01'
        |GROUP BY n_name
        |ORDER BY revenue DESC, n_name""".stripMargin,
    "q18_large_orders" ->
      """SELECT c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice,
        |  round(sum(l_quantity), 2) AS sum_qty
        |FROM customer, orders, lineitem
        |WHERE o_orderkey IN (
        |    SELECT l_orderkey FROM lineitem
        |    GROUP BY l_orderkey HAVING sum(l_quantity) > 190)
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |GROUP BY c_name, c_custkey, o_orderkey, o_orderdate, o_totalprice
        |ORDER BY o_totalprice DESC, o_orderkey
        |LIMIT 100""".stripMargin,
    "q17_small_quantity" ->
      """SELECT round(sum(l_extendedprice) / 7.0, 2) AS avg_yearly
        |FROM lineitem, part
        |WHERE p_partkey = l_partkey AND p_size < 10
        |  AND l_quantity < (
        |    SELECT 0.2 * avg(l2.l_quantity) FROM lineitem l2
        |    WHERE l2.l_partkey = p_partkey)""".stripMargin,
    "q_pivot" ->
      """SELECT ts::DATE AS day,
        |  round(sum(CASE WHEN event_type = 'click' THEN value END), 2) AS click,
        |  round(sum(CASE WHEN event_type = 'error' THEN value END), 2) AS error,
        |  round(sum(CASE WHEN event_type = 'purchase' THEN value END), 2) AS purchase,
        |  round(sum(CASE WHEN event_type = 'signup' THEN value END), 2) AS signup,
        |  round(sum(CASE WHEN event_type = 'view' THEN value END), 2) AS view
        |FROM events GROUP BY 1 ORDER BY day""".stripMargin,
    "q_rollup" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS count_order,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY ROLLUP (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_cube" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  count(*) AS count_order,
        |  CAST(GROUPING(l_returnflag, l_linestatus) AS BIGINT) AS gid
        |FROM lineitem
        |GROUP BY CUBE (l_returnflag, l_linestatus)
        |ORDER BY gid, l_returnflag NULLS FIRST, l_linestatus NULLS FIRST""".stripMargin,
    "q_conditional_count" ->
      """SELECT count(CASE WHEN props IS NULL THEN 1 END) AS max_allowed_null_count,
        |  count(CASE WHEN TRY_CAST(props AS BOOLEAN) IS NULL THEN 1 END) AS null_count
        |FROM events""".stripMargin,
    "q_explode_split" ->
      """SELECT doc_id, CAST(u.g - 1 AS INTEGER) AS pos, t.toks[u.g] AS token
        |FROM (SELECT doc_id, string_split(text, ' ') AS toks FROM documents) t,
        |  LATERAL (SELECT unnest(generate_series(1, len(t.toks))) AS g) u
        |ORDER BY doc_id, pos""".stripMargin,
    "q_surrogate_id" ->
      """SELECT CAST(row_number() OVER (ORDER BY l_orderkey, l_linenumber) - 1 AS BIGINT) AS rid,
        |  l_orderkey, l_linenumber
        |FROM lineitem ORDER BY rid""".stripMargin,
    "q_gold_daily" ->
      """SELECT ts::DATE AS ts_date, event_type,
        |  count(*) AS n_events,
        |  round(sum(value), 2) AS total_value
        |FROM events GROUP BY 1, 2 ORDER BY ts_date, event_type""".stripMargin,
    "q_gold_weekly" ->
      """SELECT CAST(year(o.o_orderdate) AS INTEGER) AS order_year,
        |  CAST(quarter(o.o_orderdate) AS INTEGER) AS order_quarter,
        |  CAST(weekofyear(o.o_orderdate) AS INTEGER) AS order_week,
        |  count(DISTINCT l.l_orderkey) AS n_orders,
        |  count(*) AS n_lineitems,
        |  -- outer CAST: DuckDB's sum(BIGINT) is HUGEINT (int128), and the
        |  -- driver's hash encodes HUGEINT != int64 even for equal values
        |  -- (r10's one red row) — Spark's sum(long) is long, so force the
        |  -- oracle back to BIGINT for an identical wire type.
        |  CAST(sum(CAST(round(l.l_extendedprice * (1 - l.l_discount) * 100) AS BIGINT))
        |    AS BIGINT) AS revenue_cents
        |FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        |GROUP BY 1, 2, 3 ORDER BY 1, 2, 3""".stripMargin,
    "q_salted_join" ->
      """SELECT l.l_orderkey, l.l_linenumber, l.l_partkey, p.p_name
        |FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
        |ORDER BY l.l_orderkey, l.l_linenumber""".stripMargin,
    "q1_pricing_summary" ->
      """SELECT l_returnflag, l_linestatus,
        |  round(sum(l_quantity), 2) AS sum_qty,
        |  round(sum(l_extendedprice), 2) AS sum_base_price,
        |  round(sum(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
        |  round(avg(l_discount), 6) AS avg_disc,
        |  count(*) AS count_order
        |FROM lineitem GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
}
