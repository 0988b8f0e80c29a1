package graft.queries

import graft.Tables
import graft.functions.Num
import graft.ops._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** A declared query: Spark plan + (optionally) the semantically identical
  * ANSI SQL the driver runs in DuckDB for the hash-compare (SURVEY §5.2).
  * Column names match between the two on purpose — the driver sorts
  * columns by name before hashing.
  */
final case class Q(name: String,
                   run: (SparkSession, String) => DataFrame,
                   oracle: Option[String])

/** Core operator inventory Q1–Q21 (SURVEY §2). Each query re-expresses a
  * reference behavior (cited in the SURVEY tables) on the driver's
  * TPC-H-ish test tables. Timestamps in outputs are emitted as epoch
  * microseconds (`unix_micros` ↔ DuckDB `epoch_us`) so value comparison
  * is representation-independent.
  */
object CoreQueries {

  /** q70's committed CSV fixture tree — both engines (Spark here, DuckDB
    * driver-side) must read the same files from any clone location.
    * Resolved from `-Dgraft.fixtures.dir` / `GRAFT_FIXTURES_DIR` when
    * set, else relative to the launch cwd (the repo root for sbt/Verify).
    * Resolution must NOT validate: q70's oracle SQL interpolates this at
    * query-REGISTRY construction, so a throw here would abort the whole
    * harness over one query's fixture. [[requireLoomFixtures]] does the
    * fail-fast inside q70's own run closure instead — a missing tree
    * fails q70 (caught per-query by Verify) and nothing else. */
  private lazy val loomFixtureRoot: String =
    sys.props.get("graft.fixtures.dir")
      .orElse(sys.env.get("GRAFT_FIXTURES_DIR"))
      .map(new java.io.File(_))
      .getOrElse(new java.io.File("fixtures/loom"))
      .getAbsolutePath

  /** Fail q70 fast (rather than letting both engines agree on an empty
    * read) — called from its run closure only. */
  private def requireLoomFixtures(): Unit =
    require(new java.io.File(loomFixtureRoot).isDirectory,
      s"loom fixture tree not found at $loomFixtureRoot; " +
        "launch from the repo root or set -Dgraft.fixtures.dir / GRAFT_FIXTURES_DIR")

  /** q119's committed scraped-dimension fixtures (S6–S8 boundary output:
    * option lines, month selects, collector monitor log) — same
    * resolution contract as [[loomFixtureRoot]], own override knob. */
  private lazy val dimsFixtureRoot: String =
    sys.props.get("graft.fixtures.dims.dir")
      .orElse(sys.env.get("GRAFT_DIMS_FIXTURES_DIR"))
      .map(new java.io.File(_))
      .getOrElse(new java.io.File("fixtures/dims"))
      .getAbsolutePath

  /** q136's committed JSON-lines landing-zone fixtures — same
    * resolution contract as [[loomFixtureRoot]], own override knob. */
  private lazy val jsonlFixtureRoot: String =
    sys.props.get("graft.fixtures.jsonl.dir")
      .orElse(sys.env.get("GRAFT_JSONL_FIXTURES_DIR"))
      .map(new java.io.File(_))
      .getOrElse(new java.io.File("fixtures/jsonl"))
      .getAbsolutePath

  private def requireJsonlFixtures(): Unit =
    require(new java.io.File(jsonlFixtureRoot).isDirectory,
      s"jsonl fixture tree not found at $jsonlFixtureRoot; " +
        "launch from the repo root or set -Dgraft.fixtures.jsonl.dir / GRAFT_JSONL_FIXTURES_DIR")

  private def requireDimsFixtures(): Unit =
    require(new java.io.File(dimsFixtureRoot).isDirectory,
      s"dims fixture tree not found at $dimsFixtureRoot; " +
        "launch from the repo root or set -Dgraft.fixtures.dims.dir / GRAFT_DIMS_FIXTURES_DIR")

  def all: Seq[Q] = Seq(

    // Q1 — positional projection + rename + trim (P1/P2,
    // reference src/main_01.py:334-364).
    Q("q01_project_trim",
      (s, d) => Tables.lineitem(s, d).select(
        col("l_orderkey").as("orderkey"),
        col("l_linenumber").as("linenumber"),
        trim(col("l_returnflag")).as("returnflag"),
        col("l_quantity").as("quantity")),
      Some("""SELECT l_orderkey AS orderkey, l_linenumber AS linenumber,
             |trim(l_returnflag) AS returnflag, l_quantity AS quantity
             |FROM lineitem""".stripMargin)),

    // Q2 — short-row filter ≅ non-null key columns (P3,
    // reference src/main_01.py:403-405).
    Q("q02_nonnull_keys",
      (s, d) => Tables.lineitem(s, d)
        .transform(Filters.nonNullKeys(Seq("l_orderkey", "l_partkey", "l_suppkey")))
        .select(col("l_orderkey").as("orderkey"), col("l_partkey").as("partkey"),
          col("l_suppkey").as("suppkey"), col("l_linenumber").as("linenumber")),
      Some("""SELECT l_orderkey AS orderkey, l_partkey AS partkey,
             |l_suppkey AS suppkey, l_linenumber AS linenumber FROM lineitem
             |WHERE l_orderkey IS NOT NULL AND l_partkey IS NOT NULL
             |AND l_suppkey IS NOT NULL""".stripMargin)),

    // Q3 — the desligado-shaped compound predicate: suffix test +
    // coalesce(cast) numeric threshold (P4, reference src/main_01.py:439-458).
    Q("q03_compound_predicate",
      (s, d) => Tables.events(s, d)
        .filter(col("event_type").endsWith("ck") &&
          coalesce(col("value").cast("double"), lit(0.0)) >= 200.0)
        .select("event_id", "user_id", "event_type", "value"),
      Some("""SELECT event_id, user_id, event_type, value FROM events
             |WHERE event_type LIKE '%ck' AND coalesce(value, 0) >= 200""".stripMargin)),

    // Q4 — anti-join gate: keep only keys absent from the other side
    // (P5/J2, reference src/main_01.py:460-473).
    Q("q04_anti_join",
      (s, d) => Tables.customer(s, d).join(Tables.orders(s, d),
          col("c_custkey") === col("o_custkey"), "left_anti")
        .select(col("c_custkey").as("custkey"), col("c_name").as("name")),
      Some("""SELECT c_custkey AS custkey, c_name AS name FROM customer
             |WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)""".stripMargin)),

    // Q5 — regex format filter (P6, reference src/tms_exporter.py:46-49).
    Q("q05_regex_filter",
      (s, d) => Tables.events(s, d)
        .transform(Filters.matching("props", "\"k\": \\d{2}\\}"))
        .select("event_id", "props"),
      Some("""SELECT event_id, props FROM events
             |WHERE regexp_matches(props, '"k": \d{2}\}')""".stripMargin)),

    // Q6 — top-2 recent months drive a semi-join-pruned read (P8+O2,
    // reference src/main_02.py:226-232 / src/tms_exporter.py:77-81).
    Q("q06_topk_month_semi",
      (s, d) => {
        val top2 = Tables.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("c"))
          .orderBy(col("c").desc, col("month")).limit(2).select("month")
        Tables.lineitem(s, d)
          .withColumn("month", date_format(col("l_shipdate"), "yyyy-MM"))
          .join(broadcast(top2), Seq("month"), "left_semi")
          .groupBy("month")
          .agg(count(lit(1)).as("n"), Num.roundz(sum("l_quantity"), 2).as("sum_qty"))
      },
      Some("""WITH m AS (SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS c
             |FROM orders GROUP BY 1 ORDER BY c DESC, month LIMIT 2)
             |SELECT month, count(*) AS n, round(sum(l_quantity), 2) AS sum_qty
             |FROM (SELECT strftime(l_shipdate, '%Y-%m') AS month, l_quantity FROM lineitem)
             |WHERE month IN (SELECT month FROM m) GROUP BY 1""".stripMargin)),

    // Q7 — recency window relative to the data's own max timestamp (P10,
    // reference src/main_02.py:887-891).
    Q("q07_recency_window",
      (s, d) => Tables.events(s, d)
        .transform(Filters.withinOfMax("ts", "24 HOURS"))
        .select(col("event_id"), unix_micros(col("ts")).as("ts_us"), col("user_id")),
      Some("""SELECT event_id, epoch_us(ts) AS ts_us, user_id FROM events
             |WHERE ts > (SELECT max(ts) - INTERVAL 24 HOURS FROM events)""".stripMargin)),

    // Q8 — existence probe as a LEFT SEMI join (J1,
    // reference src/main_01.py:235-253).
    Q("q08_semi_join",
      (s, d) => Tables.lineitem(s, d).join(
          Tables.orders(s, d).filter(col("o_orderstatus") === "F"),
          col("l_orderkey") === col("o_orderkey"), "left_semi")
        .select(col("l_orderkey").as("orderkey"), col("l_linenumber").as("linenumber")),
      Some("""SELECT l_orderkey AS orderkey, l_linenumber AS linenumber FROM lineitem
             |WHERE EXISTS (SELECT 1 FROM orders
             |WHERE o_orderkey = l_orderkey AND o_orderstatus = 'F')""".stripMargin)),

    // Q9 — dimension enrichment chain with broadcast joins (J3,
    // reference src/main_01.py:60-66): fact ⨝ supplier ⨝ nation ⨝ region.
    Q("q09_dim_join_agg",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.supplier(s, d)), col("l_suppkey") === col("s_suppkey"))
        .join(broadcast(Tables.nation(s, d)), col("s_nationkey") === col("n_nationkey"))
        .join(broadcast(Tables.region(s, d)), col("n_regionkey") === col("r_regionkey"))
        .groupBy(col("r_name").as("region"), col("n_name").as("nation"))
        .agg(count(lit(1)).as("n"),
          Num.roundz(sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 2).as("revenue")),
      Some("""SELECT r_name AS region, n_name AS nation, count(*) AS n,
             |round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue
             |FROM lineitem
             |JOIN supplier ON l_suppkey = s_suppkey
             |JOIN nation ON s_nationkey = n_nationkey
             |JOIN region ON n_regionkey = r_regionkey
             |GROUP BY 1, 2""".stripMargin)),

    // Q10 — full-outer alignment of two derived monthly sets (J4,
    // reference src/main_02.py:158-183).
    Q("q10_full_outer_months",
      (s, d) => {
        val o = Tables.orders(s, d)
          .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("o_cnt"))
        val l = Tables.lineitem(s, d)
          .groupBy(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
          .agg(count(lit(1)).as("l_cnt"))
        o.join(l, Seq("month"), "full_outer").select("month", "o_cnt", "l_cnt")
      },
      Some("""SELECT coalesce(a.month, b.month) AS month, a.o_cnt, b.l_cnt FROM
             |(SELECT strftime(o_orderdate, '%Y-%m') AS month, count(*) AS o_cnt
             | FROM orders GROUP BY 1) a
             |FULL JOIN
             |(SELECT strftime(l_shipdate, '%Y-%m') AS month, count(*) AS l_cnt
             | FROM lineitem GROUP BY 1) b
             |ON a.month = b.month""".stripMargin)),

    // Q11 — the signature operator: keyed last-writer-wins merge (U1,
    // reference src/main_01.py:255-305), deterministic tiebreak.
    Q("q11_lww_merge",
      (s, d) => Tables.events(s, d)
        .transform(Merge.lastWriterWins(Seq("user_id", "event_type"),
          Seq(col("ts").desc, col("event_id").desc)))
        .select(col("user_id"), col("event_type"),
          unix_micros(col("ts")).as("ts_us"), col("value"), col("event_id")),
      Some("""SELECT user_id, event_type, epoch_us(ts) AS ts_us, value, event_id
             |FROM (SELECT *, row_number() OVER (PARTITION BY user_id, event_type
             |  ORDER BY ts DESC, event_id DESC) AS rn FROM events)
             |WHERE rn = 1""".stripMargin)),

    // Q12 — set dedup (U2, reference src/tms_exporter.py:50).
    Q("q12_distinct",
      (s, d) => Tables.orders(s, d)
        .select(col("o_orderpriority").as("priority")).distinct(),
      Some("SELECT DISTINCT o_orderpriority AS priority FROM orders")),

    // Q13 — conditional success/error counters (A1,
    // reference src/main_01.py:366-437).
    Q("q13_conditional_counts",
      (s, d) => Tables.lineitem(s, d)
        .groupBy(col("l_returnflag").as("returnflag"))
        .agg(count(lit(1)).as("n"),
          count(when(col("l_quantity") > 25, 1)).as("n_highqty"),
          count(when(col("l_discount") === 0, 1)).as("n_nodisc")),
      Some("""SELECT l_returnflag AS returnflag, count(*) AS n,
             |count(CASE WHEN l_quantity > 25 THEN 1 END) AS n_highqty,
             |count(CASE WHEN l_discount = 0 THEN 1 END) AS n_nodisc
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // Q14 — per-month × per-status summary with size sum (A2/A3,
    // reference src/main_02.py:823-900).
    Q("q14_month_summary",
      (s, d) => Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"),
          col("o_orderstatus").as("status"))
        .agg(count(lit(1)).as("n"), Num.roundz(sum("o_totalprice"), 2).as("total")),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month, o_orderstatus AS status,
             |count(*) AS n, round(sum(o_totalprice), 2) AS total
             |FROM orders GROUP BY 1, 2""".stripMargin)),

    // Q15 — success-rate ratio of conditional sums (A5, TPC-H Q14 shape,
    // reference src/tms_colector.py:293-299).
    Q("q15_promo_ratio",
      (s, d) => Tables.lineitem(s, d)
        .join(broadcast(Tables.part(s, d)), col("l_partkey") === col("p_partkey"))
        .agg(Num.roundz(lit(100.0) *
          sum(when(col("p_type") === "PROMO", col("l_extendedprice") * (lit(1) - col("l_discount")))
            .otherwise(0.0)) /
          sum(col("l_extendedprice") * (lit(1) - col("l_discount"))), 4).as("promo_pct")),
      Some("""SELECT round(100.0 *
             |sum(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0 END) /
             |sum(l_extendedprice * (1 - l_discount)), 4) AS promo_pct
             |FROM lineitem JOIN part ON l_partkey = p_partkey""".stripMargin)),

    // Q16 — totals rollup (A6, reference src/main_01.py:1141-1163).
    // Expressed via spark.sql: the Column-API rollup trips Spark's
    // DetectAmbiguousSelfJoin false positive when stacked on joins; the
    // SQL route builds the identical Aggregate(Expand(...)) plan.
    Q("q16_rollup",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("g_orders")
        Tables.customer(s, d).createOrReplaceTempView("g_customer")
        Tables.nation(s, d).createOrReplaceTempView("g_nation")
        s.sql("""SELECT n_name AS nation, o_orderstatus AS status, count(1) AS n
                |FROM g_orders
                |JOIN g_customer ON o_custkey = c_custkey
                |JOIN g_nation ON c_nationkey = n_nationkey
                |GROUP BY ROLLUP(n_name, o_orderstatus)""".stripMargin)
      },
      Some("""SELECT n_name AS nation, o_orderstatus AS status, count(*) AS n
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY ROLLUP(n_name, o_orderstatus)""".stripMargin)),

    // Q17 — total-order sort with explicit global position (O1,
    // reference src/main_01.py:329-331). Two-phase rank (range shuffle +
    // per-partition offsets, TopK.withPosition) — no single-partition
    // window, fully lazy declarative plan.
    Q("q17_total_order",
      (s, d) => Tables.events(s, d)
        .select(col("event_id"), col("ts"), col("user_id"), col("value"))
        .transform(TopK.withPosition(Seq(col("ts").desc, col("event_id")), "pos"))
        .select(col("pos"), col("event_id"),
          unix_micros(col("ts")).as("ts_us"), col("user_id"), col("value")),
      Some("""SELECT row_number() OVER (ORDER BY ts DESC, event_id) AS pos,
             |event_id, epoch_us(ts) AS ts_us, user_id, value FROM events""".stripMargin)),

    // Q18 — top-k per group (O2, reference src/main_02.py:226-232):
    // top-3 busiest days per event type.
    Q("q18_topk_per_group",
      (s, d) => Tables.events(s, d)
        .groupBy(col("event_type"), date_format(col("ts"), "yyyy-MM-dd").as("day"))
        .agg(count(lit(1)).as("n"))
        .transform(TopK.perGroup(Seq("event_type"), Seq(col("n").desc, col("day")), 3)),
      Some("""WITH dcount AS (SELECT event_type, strftime(ts, '%Y-%m-%d') AS day,
             |count(*) AS n FROM events GROUP BY 1, 2)
             |SELECT event_type, day, n FROM (SELECT *, row_number() OVER
             |(PARTITION BY event_type ORDER BY n DESC, day) AS rk FROM dcount)
             |WHERE rk <= 3""".stripMargin)),

    // Q19 — union + dedup of derived sets (SET1,
    // reference src/main_02.py:241).
    Q("q19_union_distinct",
      (s, d) => Tables.orders(s, d)
        .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .union(Tables.lineitem(s, d).select(date_format(col("l_shipdate"), "yyyy-MM")))
        .union(Tables.events(s, d).select(date_format(col("ts"), "yyyy-MM")))
        .distinct(),
      Some("""SELECT DISTINCT month FROM (
             |SELECT strftime(o_orderdate, '%Y-%m') AS month FROM orders
             |UNION ALL SELECT strftime(l_shipdate, '%Y-%m') FROM lineitem
             |UNION ALL SELECT strftime(ts, '%Y-%m') FROM events)""".stripMargin)),

    // Q20a — scalar-function gauntlet, string half (§2.8): trim / split /
    // translate / upper / endswith / rlike / regexp_extract / cast.
    Q("q20_scalar_text",
      (s, d) => Tables.documents(s, d).select(
        col("doc_id"),
        substring(trim(col("text")), 1, 30).as("head"),
        split(trim(col("text")), "\\s+").getItem(0).as("tok0"),
        translate(col("lang"), "aeiou", "AEIOU").as("lang_t"),
        upper(col("source")).as("src_u"),
        col("text").endsWith("n").as("ends_n"),
        col("text").rlike("merge\\s+join").as("has_mj"),
        regexp_extract(col("source"), "(\\d+)", 1).as("src_num"),
        Num.roundz(col("n_chars").cast("double") / 100.0, 4).as("chars_h")),
      Some("""SELECT doc_id, substr(trim(text), 1, 30) AS head,
             |string_split_regex(trim(text), '\s+')[1] AS tok0,
             |translate(lang, 'aeiou', 'AEIOU') AS lang_t,
             |upper(source) AS src_u,
             |ends_with(text, 'n') AS ends_n,
             |regexp_matches(text, 'merge\s+join') AS has_mj,
             |regexp_extract(source, '(\d+)', 1) AS src_num,
             |round(cast(n_chars AS DOUBLE) / 100.0, 4) AS chars_h
             |FROM documents""".stripMargin)),

    // Q20b — scalar gauntlet, date half (§2.8): date_format / add_months
    // (the reference's correct previous-month algorithm,
    // src/tms_exporter.py:18-29) / translate / extract.
    Q("q20_scalar_date",
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        date_format(col("ts"), "yyyy.MM").as("ym_dot"),
        date_format(add_months(col("ts").cast("date"), -1), "yyyy-MM").as("prev_month"),
        translate(date_format(col("ts"), "yyyy.MM"), ".", "/").as("ym_slash"),
        dayofmonth(col("ts")).cast("long").as("d"),
        hour(col("ts")).cast("long").as("h")),
      Some("""SELECT event_id, strftime(ts, '%Y.%m') AS ym_dot,
             |strftime(ts - INTERVAL 1 MONTH, '%Y-%m') AS prev_month,
             |translate(strftime(ts, '%Y.%m'), '.', '/') AS ym_slash,
             |cast(day(ts) AS BIGINT) AS d, cast(hour(ts) AS BIGINT) AS h
             |FROM events""".stripMargin)),

    // Q49 — sketch aggregates (SCALE.md's distinct-count scale path):
    // HLL approx_count_distinct next to the exact count. Rows-only check
    // (sketch estimates are engine-specific); the exact column is the
    // internal ground truth and q34 oracle-checks exact countDistinct.
    Q("q49_sketches",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(countDistinct(col("o_custkey")).as("n_exact"),
          approx_count_distinct(col("o_custkey"), 0.02).as("n_hll"),
          Num.roundz(expr("approx_percentile(o_totalprice, 0.5, 1000)"), 2).as("p50_sketch"),
          Num.roundz(expr("approx_percentile(o_totalprice, 0.9, 1000)"), 2).as("p90_sketch")),
      None),

    // Q48 — formatting + epoch-seconds scalars (§2.8's f"{x:.1f}" /
    // datetime.fromtimestamp rows): printf-style format and
    // from_unixtime round-trip.
    Q("q48_format",
      (s, d) => Tables.events(s, d).select(
        col("event_id"),
        // pre-round before formatting: printf tie-rounding on raw doubles
        // differs between Java (HALF_UP over decimal expansion) and C
        // (nearest-even over binary); after round(…,1) the value is
        // unambiguous for both
        format_string("v=%.1f", Num.roundz(col("value"), 1)).as("v_fmt"),
        from_unixtime(expr("unix_micros(ts) DIV 1000000")).as("ts_str"),
        unix_micros(timestamp_seconds(expr("unix_micros(ts) DIV 1000000"))).as("ts_s_us")),
      Some("""SELECT event_id, printf('v=%.1f', round(value, 1)) AS v_fmt,
             |strftime(to_timestamp(epoch_us(ts) // 1000000), '%Y-%m-%d %H:%M:%S') AS ts_str,
             |epoch_us(to_timestamp(epoch_us(ts) // 1000000)) AS ts_s_us
             |FROM events""".stripMargin)),

    // Q56 — exact percentile profiling per group (distribution stats, the
    // data-profiling staple of a corpus pipeline). Exact `percentile`
    // carries the DuckDB quantile_cont oracle (identical linear-
    // interpolation semantics); the 100 TB path is the
    // approx_percentile sketch next to the HLL in q49 (rows-only, like
    // every sketch).
    Q("q56_percentiles",
      (s, d) => Tables.events(s, d).groupBy("event_type").agg(
        count(lit(1)).as("n"),
        Num.roundz(min("value"), 4).as("v_min"),
        Num.roundz(expr("percentile(value, 0.5)"), 4).as("v_p50"),
        Num.roundz(expr("percentile(value, 0.9)"), 4).as("v_p90"),
        Num.roundz(max("value"), 4).as("v_max")),
      Some("""SELECT event_type, count(*) AS n, round(min(value), 4) AS v_min,
             |round(quantile_cont(value, 0.5), 4) AS v_p50,
             |round(quantile_cont(value, 0.9), 4) AS v_p90,
             |round(max(value), 4) AS v_max FROM events GROUP BY 1""".stripMargin)),

    // Q57 — corpus data-quality profile per language: row/null/distinct
    // counts and length stats — the sanity dashboard every ingest run
    // emits before training data ships.
    Q("q57_profile",
      (s, d) => Tables.documents(s, d).groupBy("lang").agg(
        count(lit(1)).as("n_rows"),
        sum(when(col("text").isNull || trim(col("text")) === "", 1L)
          .otherwise(0L)).as("n_empty"),
        countDistinct(col("source")).as("n_sources"),
        Num.roundz(avg(length(col("text"))), 4).as("avg_len"),
        min("n_chars").as("min_chars"),
        max("n_chars").as("max_chars")),
      Some("""SELECT lang, count(*) AS n_rows,
             |cast(sum(CASE WHEN text IS NULL OR trim(text) = '' THEN 1 ELSE 0 END) AS BIGINT) AS n_empty,
             |count(DISTINCT source) AS n_sources,
             |round(avg(length(text)), 4) AS avg_len,
             |min(n_chars) AS min_chars, max(n_chars) AS max_chars
             |FROM documents GROUP BY 1""".stripMargin)),

    // Q60 — the custom typed Aggregator (§2.11) on the oracle surface:
    // quantity-weighted mean price per return flag through
    // groupByKey(...).agg(Aggregator.toColumn) — the avg-of-avgs trap the
    // weighted buffer exists to avoid. Mergeable buffers → map-side
    // partials like any built-in aggregate.
    Q("q60_weighted_mean",
      (s, d) => {
        import s.implicits._
        val li = Tables.lineitem(s, d)
          .select(col("l_returnflag"), col("l_extendedprice"), col("l_quantity"))
          .as[(String, Double, Double)]
        val wm = graft.functions.WeightedMeanAgg[(String, Double, Double)](
          r => (r._2, r._3)).toColumn
        li.groupByKey(_._1).agg(wm.name("wmean"))
          .toDF("l_returnflag", "wmean")
          .select(col("l_returnflag"), Num.roundz(col("wmean"), 4).as("wmean"))
      },
      Some("""SELECT l_returnflag,
             |round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 4) AS wmean
             |FROM lineitem GROUP BY 1""".stripMargin)),

    // Q21 — 7-row rolling average per key (§2.9 frame-spec windows).
    Q("q21_rolling_avg",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(-6, 0)
        Tables.events(s, d)
          .withColumn("roll_avg", Num.roundz(avg("value").over(w), 4))
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("roll_avg"))
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             |round(avg(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
             |ROWS BETWEEN 6 PRECEDING AND CURRENT ROW), 4) AS roll_avg
             |FROM events""".stripMargin)),

    // Q32 — as-of join (SURVEY §2.3 north-star row): enrich each click
    // with the user's most recent purchase at-or-before it. DuckDB's
    // native ASOF JOIN is the oracle for our union+carry-forward operator.
    Q("q32_asof_join",
      (s, d) => {
        val ev = Tables.events(s, d)
        val left = ev.filter(col("event_type") === "click")
          .select("user_id", "ts", "event_id", "value")
        val right = ev.filter(col("event_type") === "purchase")
          .select("user_id", "ts", "value")
        AsOfJoin.join(left, right, Seq("user_id"), "ts", Seq("value"))
          .select(col("event_id"), col("user_id"),
            unix_micros(col("ts")).as("ts_us"), col("value"),
            col("matched_value").as("purchase_value"),
            unix_micros(col("matched_ts")).as("purchase_ts_us"))
      },
      Some("""WITH l AS (SELECT user_id, ts, event_id, value FROM events
             |  WHERE event_type = 'click'),
             |r AS (SELECT user_id, ts, value FROM events WHERE event_type = 'purchase')
             |SELECT l.event_id, l.user_id, epoch_us(l.ts) AS ts_us, l.value,
             |r.value AS purchase_value, epoch_us(r.ts) AS purchase_ts_us
             |FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND l.ts >= r.ts""".stripMargin)),

    // Q33 — intersect / except (SURVEY §2.7 "free in Spark" row).
    Q("q33_intersect_except",
      (s, d) => {
        val om = Tables.orders(s, d)
          .select(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        val lm = Tables.lineitem(s, d)
          .select(date_format(col("l_shipdate"), "yyyy-MM").as("month"))
        om.intersect(lm).withColumn("tag", lit("both"))
          .unionByName(lm.except(om).withColumn("tag", lit("li_only")))
          .select("tag", "month")
      },
      Some("""SELECT 'both' AS tag, month FROM (
             |  SELECT strftime(o_orderdate, '%Y-%m') AS month FROM orders
             |  INTERSECT SELECT strftime(l_shipdate, '%Y-%m') FROM lineitem)
             |UNION ALL
             |SELECT 'li_only' AS tag, month FROM (
             |  SELECT strftime(l_shipdate, '%Y-%m') AS month FROM lineitem
             |  EXCEPT SELECT strftime(o_orderdate, '%Y-%m') FROM orders)""".stripMargin)),

    // Q36 — unpivot/stack of metric pairs (SURVEY §1.3: the 71-col loom
    // fact table is (count, minutes) metric pairs, "ideal for stack/
    // unpivot analysis"): melt lineitem's numeric metrics to long form
    // and aggregate per metric.
    Q("q36_unpivot",
      (s, d) => Tables.lineitem(s, d)
        .select(col("l_returnflag"), expr(
          "stack(4, 'quantity', l_quantity, 'extendedprice', l_extendedprice, " +
            "'discount', l_discount, 'tax', l_tax) AS (metric, val)"))
        .groupBy(col("l_returnflag").as("returnflag"), col("metric"))
        .agg(count(lit(1)).as("n"), Num.roundz(sum("val"), 2).as("total")),
      Some("""SELECT l_returnflag AS returnflag, metric, count(*) AS n,
             |round(sum(val), 2) AS total FROM (
             |  SELECT l_returnflag, 'quantity' AS metric, l_quantity AS val FROM lineitem
             |  UNION ALL SELECT l_returnflag, 'extendedprice', l_extendedprice FROM lineitem
             |  UNION ALL SELECT l_returnflag, 'discount', l_discount FROM lineitem
             |  UNION ALL SELECT l_returnflag, 'tax', l_tax FROM lineitem)
             |GROUP BY 1, 2""".stripMargin)),

    // Q37 — semi-structured props parsing (SURVEY §1.4 MapType row):
    // extract the JSON field and aggregate it per event type.
    Q("q37_json_props",
      (s, d) => Tables.events(s, d)
        .select(col("event_type"),
          get_json_object(col("props"), "$.k").try_cast("long").as("k"))
        .groupBy("event_type")
        .agg(count(col("k")).as("n"), sum("k").as("sum_k"),
          Num.roundz(avg("k"), 4).as("avg_k")),
      Some("""SELECT event_type, count(k) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
             |round(avg(k), 4) AS avg_k FROM (
             |  SELECT event_type, CAST(props->>'k' AS BIGINT) AS k FROM events)
             |GROUP BY 1""".stripMargin)),

    // Q34 — distinct aggregation (SURVEY §2.5 "absent in reference" row;
    // the HLL variant approx_count_distinct is the scale path but is not
    // oracle-comparable bit-for-bit).
    Q("q34_distinct_agg",
      (s, d) => Tables.orders(s, d)
        .groupBy(col("o_orderstatus").as("status"))
        .agg(countDistinct(col("o_custkey")).as("n_cust"), count(lit(1)).as("n")),
      Some("""SELECT o_orderstatus AS status, count(DISTINCT o_custkey) AS n_cust,
             |count(*) AS n FROM orders GROUP BY 1""".stripMargin)),

    // Q38 — pivot: months × order-status counts as columns (the
    // wide-report shape of the reference's per-month summary GUI).
    Q("q38_pivot",
      (s, d) => Tables.orders(s, d)
        .groupBy(date_format(col("o_orderdate"), "yyyy-MM").as("month"))
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .select(col("month"), coalesce(col("F"), lit(0L)).as("F"),
          coalesce(col("O"), lit(0L)).as("O"), coalesce(col("P"), lit(0L)).as("P")),
      Some("""SELECT strftime(o_orderdate, '%Y-%m') AS month,
             |count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS F,
             |count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS O,
             |count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS P
             |FROM orders GROUP BY 1""".stripMargin)),

    // Q39 — lead/lag navigation: inter-event gap and value delta per
    // user (§2.9 window family beyond frames).
    Q("q39_lead_lag",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val w = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        Tables.events(s, d)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"),
            (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"),
            Num.roundz(col("value") - lag(col("value"), 1).over(w), 4).as("value_delta"))
      },
      Some("""SELECT user_id, event_id, epoch_us(ts) AS ts_us,
             |epoch_us(ts) - lag(epoch_us(ts), 1) OVER w AS gap_us,
             |round(value - lag(value, 1) OVER w, 4) AS value_delta
             |FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)""".stripMargin)),

    // Q42 — batch sessionization (§2.10's session_window, expressed for
    // batch): gap > 30 min starts a new session; classic lag + running
    // sum of boundary flags. Session id is (user_id, session_idx).
    Q("q42_sessionize",
      (s, d) => {
        import org.apache.spark.sql.expressions.Window
        val byUser = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
        val cum = Window.partitionBy("user_id").orderBy(col("ts"), col("event_id"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        Tables.events(s, d)
          .withColumn("new_sess",
            when(unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(byUser)
              > 30L * 60 * 1000000, 1L).otherwise(0L))
          .withColumn("session_idx", sum("new_sess").over(cum))
          .groupBy("user_id", "session_idx")
          .agg(count(lit(1)).as("n_events"),
            unix_micros(min(col("ts"))).as("start_us"),
            unix_micros(max(col("ts"))).as("end_us"),
            Num.roundz(sum("value"), 4).as("total_value"))
      },
      Some("""WITH flagged AS (SELECT user_id, ts, event_id, value,
             |  CASE WHEN epoch_us(ts) - lag(epoch_us(ts), 1) OVER w > 30*60*1000000
             |    THEN 1 ELSE 0 END AS new_sess
             |  FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
             |sess AS (SELECT *, CAST(sum(new_sess) OVER (PARTITION BY user_id
             |  ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_idx
             |  FROM flagged)
             |SELECT user_id, session_idx, count(*) AS n_events,
             |epoch_us(min(ts)) AS start_us, epoch_us(max(ts)) AS end_us,
             |round(sum(value), 4) AS total_value
             |FROM sess GROUP BY 1, 2""".stripMargin)),

    // Q43 — tumbling shift windows for batch (§2.10's window() agg,
    // epoch-aligned 8-hour buckets mirroring the A/B/C factory shifts).
    Q("q43_shift_windows",
      (s, d) => Tables.events(s, d)
        .withColumn("shift_start_us",
          (floor(unix_micros(col("ts")) / (8L * 3600 * 1000000)) *
            (8L * 3600 * 1000000)).cast("long"))
        .groupBy("shift_start_us", "event_type")
        .agg(count(lit(1)).as("n"), Num.roundz(sum("value"), 4).as("total")),
      Some("""SELECT CAST(epoch_us(ts) // (8::BIGINT*3600*1000000) * (8::BIGINT*3600*1000000) AS BIGINT)
             |  AS shift_start_us, event_type,
             |count(*) AS n, round(sum(value), 4) AS total
             |FROM events GROUP BY 1, 2""".stripMargin)),

    // Q44 — banded range join (point-in-interval without a nested-loop
    // theta join): shipments falling in the week after each sampled
    // order's date. Oracle is DuckDB's plain inequality join — same
    // result, different algorithm.
    Q("q44_range_join",
      (s, d) => {
        val epoch = lit("1970-01-01")
        val o = Tables.orders(s, d).filter(col("o_orderkey") % 100 === 0)
          .select(col("o_orderkey"),
            datediff(col("o_orderdate"), epoch).cast("long").as("start_d"))
          .withColumn("end_d", col("start_d") + 7)
        val l = Tables.lineitem(s, d)
          .select(datediff(col("l_shipdate"), epoch).cast("long").as("d"),
            col("l_quantity"))
        RangeJoin.pointInInterval(l, o, "d", "start_d", "end_d", bandWidth = 7L)
          .groupBy(col("o_orderkey").as("orderkey"))
          .agg(count(lit(1)).as("n"), Num.roundz(sum("l_quantity"), 2).as("sum_qty"))
      },
      Some("""WITH o AS (SELECT o_orderkey,
             |  date_diff('day', DATE '1970-01-01', o_orderdate::DATE) AS s
             |  FROM orders WHERE o_orderkey % 100 = 0),
             |l AS (SELECT date_diff('day', DATE '1970-01-01', l_shipdate::DATE) AS d,
             |  l_quantity FROM lineitem)
             |SELECT o_orderkey AS orderkey, count(*) AS n,
             |round(sum(l_quantity), 2) AS sum_qty
             |FROM o JOIN l ON l.d >= o.s AND l.d < o.s + 7
             |GROUP BY 1""".stripMargin)),

    // Q40 — cube over (nation, status): all grouping-set combinations
    // (§2.5 grouping-sets row). Same spark.sql route as q16 (rollup).
    Q("q40_cube",
      (s, d) => {
        Tables.orders(s, d).createOrReplaceTempView("g_orders")
        Tables.customer(s, d).createOrReplaceTempView("g_customer")
        Tables.nation(s, d).createOrReplaceTempView("g_nation")
        s.sql("""SELECT n_name AS nation, o_orderstatus AS status, count(1) AS n
                |FROM g_orders
                |JOIN g_customer ON o_custkey = c_custkey
                |JOIN g_nation ON c_nationkey = n_nationkey
                |GROUP BY CUBE(n_name, o_orderstatus)""".stripMargin)
      },
      Some("""SELECT n_name AS nation, o_orderstatus AS status, count(*) AS n
             |FROM orders JOIN customer ON o_custkey = c_custkey
             |JOIN nation ON c_nationkey = n_nationkey
             |GROUP BY CUBE(n_name, o_orderstatus)""".stripMargin)),

    // Q70 — the S1–S5 ingest path, oracle-checked end to end for the
    // first time: month-pruned recursive discovery (`LoomCsv.readMonths`
    // lists only the requested `YYYY-MM/daily/` dirs — 2024-01/monthly
    // and 2024-03 never enter the file listing), case-insensitive
    // `*.{csv,CSV}` glob, header-less 71-col positional schema,
    // trim-all + short-row skip (`normalize`), and the reference's
    // `float(x or 0)` coercion (`typedView`). Input is the committed
    // fixture tree under fixtures/loom (the driver's parquet testdata
    // has no CSV surface), mirrored in DuckDB by `read_csv` over the
    // same files — the fixture root resolves to an ABSOLUTE path at
    // query construction (from the repo checkout's working dir), so
    // both engines read identical files from any checkout location.
    Q("q70_loom_csv_ingest",
      (s, _) => {
        requireLoomFixtures()
        val t = graft.ingest.LoomCsv.typedView(graft.ingest.LoomCsv.normalize(
          graft.ingest.LoomCsv.readMonths(s, loomFixtureRoot,
            Seq("2024-01", "2024-02"))))
        t.select(col("month"), col("DataTurno").as("data_turno"),
          col("Tear").as("tear"), col("Artigo").as("artigo"), col("shift"),
          col("Rpm").as("rpm"), col("Eficiencia").as("eficiencia"),
          col("Metros").as("metros"))
      },
      Some(s"""WITH raw AS (
             |  SELECT DataTurno, Tear, Artigo, Rpm, Eficiencia, Metros,
             |         regexp_extract(filename, '(\\d{4}-\\d{2})/[^/]+/[^/]+$$', 1) AS month
             |  FROM read_csv(['$loomFixtureRoot/2024-01/daily/*.[cC][sS][vV]',
             |                 '$loomFixtureRoot/2024-02/daily/*.[cC][sS][vV]'],
             |       header=false, all_varchar=true, filename=true,
             |       names=['DataTurno','Tear','Artigo','Filler','ArtigoGen','Rpm','Eficiencia',
             |              'Funcionando','Parado','Pontos','Metros'])),
             |trimmed AS (
             |  SELECT month,
             |    trim(coalesce(DataTurno,'')) AS data_turno,
             |    trim(coalesce(Tear,'')) AS tear, trim(coalesce(Artigo,'')) AS artigo,
             |    trim(coalesce(Rpm,'')) AS rpm_s, trim(coalesce(Eficiencia,'')) AS ef_s,
             |    trim(coalesce(Metros,'')) AS metros_s
             |  FROM raw),
             |kept AS (SELECT * FROM trimmed WHERE data_turno <> '' AND tear <> '' AND artigo <> '')
             |SELECT month, data_turno, tear, artigo,
             |  split_part(data_turno, '.', -1) AS shift,
             |  CASE WHEN rpm_s = '' THEN 0.0 ELSE try_cast(rpm_s AS DOUBLE) END AS rpm,
             |  CASE WHEN ef_s = '' THEN 0.0 ELSE try_cast(ef_s AS DOUBLE) END AS eficiencia,
             |  CASE WHEN metros_s = '' THEN 0.0 ELSE try_cast(metros_s AS DOUBLE) END AS metros
             |FROM kept""".stripMargin)),

    // Q119 — the scraped-dimension surfaces S6–S8 driver-gated in one
    // query (the last reference-parity tags that were spec-only): S6
    // loom dim from option lines (reference src/main_01.py:48-72 — id =
    // first token, name = rest), S7 month dim with the YYYY.MM format
    // gate + dedup (src/main_02.py:144-192, src/tms_exporter.py:46-49),
    // O2-over-S7 head-2 most-recent months per type
    // (src/main_02.py:226-232), and S8 status-pattern monitor scan
    // (src/tms_colector.py:252-286). Inputs are the committed
    // fixtures/dims boundary files; the three dimension shapes union
    // into one (kind, a, b) frame so the single driver compare covers
    // all three. Scale: each arm is a scan-level projection/filter; the
    // only shuffle is the #month_types-group head-2 window.
    Q("q119_scraped_dims",
      (s, _) => {
        requireDimsFixtures()
        val looms = graft.ingest.Dims.loomDim(
            graft.ingest.Dims.fromTextFiles(s, s"$dimsFixtureRoot/looms.txt"))
          .select(lit("loom").as("kind"), col("tear_id").as("a"),
            col("tear_name").as("b"))
        val months = graft.ingest.Dims.lastTwoMonthsPerType(
            graft.ingest.Dims.monthDim(
              s.read.option("header", "true").csv(s"$dimsFixtureRoot/months.csv")))
          .select(lit("month").as("kind"), col("month_type").as("a"),
            col("month").as("b"))
        val status = graft.ingest.Dims.statusLines(
            graft.ingest.Dims.fromTextFiles(s, s"$dimsFixtureRoot/monitor.txt"))
          .select(lit("status").as("kind"), col("line").as("a"),
            lit("").as("b"))
        looms.unionAll(months).unionAll(status)
      },
      Some(s"""WITH loom_tok AS (
             |  SELECT string_split_regex(trim(line), '\\s+') AS w FROM (
             |    SELECT unnest(string_split(content, chr(10))) AS line
             |    FROM read_text('$dimsFixtureRoot/looms.txt'))),
             |looms AS (SELECT 'loom' AS kind, w[1] AS a,
             |    coalesce(array_to_string(w[2:], ' '), '') AS b
             |  FROM loom_tok WHERE regexp_matches(w[1], '^\\d+$$')),
             |m AS (SELECT DISTINCT month_type, month
             |  FROM read_csv('$dimsFixtureRoot/months.csv',
             |                header=true, all_varchar=true)
             |  WHERE regexp_matches(month, '^\\d{4}\\.\\d{2}$$')),
             |m2 AS (SELECT 'month' AS kind, month_type AS a, month AS b FROM (
             |    SELECT *, row_number() OVER (PARTITION BY month_type
             |      ORDER BY month DESC) AS rk FROM m) WHERE rk <= 2),
             |st AS (SELECT 'status' AS kind, line AS a, '' AS b FROM (
             |    SELECT unnest(string_split(content, chr(10))) AS line
             |    FROM read_text('$dimsFixtureRoot/monitor.txt'))
             |  WHERE line LIKE '%--->%' OR line LIKE '%Sucesso%'
             |     OR line LIKE '%Incorreto%')
             |SELECT * FROM looms UNION ALL SELECT * FROM m2
             |UNION ALL SELECT * FROM st""".stripMargin)),

    // Q136 — JSON-lines landing-zone ingest, driver-gated in batch: the
    // streaming intake's file format (CorpusStream.readDocs) read with
    // the SAME schema and run through the SAME cleanDocs gate chain —
    // one code path for live and backfill, so the gates and the
    // content_hash identity provably cannot drift between them (the
    // q70 CSV-gate story applied to the stream's format). Committed
    // fixtures exercise: whitespace/case variants hashing identically,
    // the minTokens gate, the und-language gate, and a null text field.
    Q("q136_jsonl_ingest",
      (s, _) => {
        requireJsonlFixtures()
        graft.streaming.CorpusStream.cleanDocs(
          s.read.schema(graft.streaming.CorpusStream.schema)
            .json(s"$jsonlFixtureRoot/*.jsonl"))
          .select(col("doc_id"), unix_micros(col("ts")).as("ts_us"),
            col("source"), col("lang"), col("lang_pred"), col("n_tokens"),
            col("content_hash"))
      },
      Some(s"""WITH raw AS (SELECT * FROM read_json(
             |    ['$jsonlFixtureRoot/docs.jsonl', '$jsonlFixtureRoot/docs2.jsonl'],
             |    columns = {doc_id: 'BIGINT', ts: 'TIMESTAMP', text: 'VARCHAR',
             |               lang: 'VARCHAR', source: 'VARCHAR'})),
             |norm AS (SELECT doc_id, ts, lang, source,
             |  regexp_replace(regexp_replace(lower(trim(text)), '[\\x00-\\x1F\\x7F]', ' ', 'g'),
             |    '  +', ' ', 'g') AS norm_text FROM raw),
             |scored AS (SELECT *, string_split_regex(trim(norm_text), '\\s+') AS w FROM norm),
             |langed AS (SELECT *, cast(len(w) AS BIGINT) AS n_tokens,
             |  CASE WHEN mx = 0 THEN 'und'
             |       WHEN h_fr = mx THEN 'fr' WHEN h_es = mx THEN 'es'
             |       WHEN h_en = mx THEN 'en' ELSE 'de' END AS lang_pred
             |  FROM (SELECT *, greatest(h_de, h_en, h_es, h_fr) AS mx FROM (
             |    SELECT *,
             |    len(list_filter(w, x -> list_contains(['der','die','das','und','ist','nicht','ein'], x))) AS h_de,
             |    len(list_filter(w, x -> list_contains(['the','a','of','and','to','in','is','that'], x))) AS h_en,
             |    len(list_filter(w, x -> list_contains(['el','la','de','que','y','los','una'], x))) AS h_es,
             |    len(list_filter(w, x -> list_contains(['le','la','les','des','et','est','une'], x))) AS h_fr
             |    FROM scored)))
             |SELECT doc_id, epoch_us(ts) AS ts_us, source, lang, lang_pred,
             |  n_tokens, md5(norm_text) AS content_hash
             |FROM langed WHERE n_tokens >= 5 AND lang_pred <> 'und'""".stripMargin)),

    // Q127 — ordered conversion funnel with a 24h per-step window over
    // the event stream (the sequence-analytics sibling of q42's
    // sessionization; reference analog: the loom stop-history event
    // stream). One user-keyed Exchange, chained per-step Windows on
    // that partitioning, #steps output rows from one stack generator.
    // The 24h window is what makes the funnel discriminate — unwindowed,
    // a month of events saturates every step for every user.
    Q("q127_event_funnel",
      (s, d) => Tables.events(s, d)
        .transform(EventAnalytics.funnel("user_id", "ts", "event_type",
          Seq("view", "click", "purchase"), withinUs = Some(86400000000L))),
      Some("""WITH u AS (SELECT user_id,
             |    min(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS t1
             |  FROM events GROUP BY 1),
             |s2 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t2 FROM events e
             |  JOIN u ON e.user_id = u.user_id
             |  WHERE u.t1 IS NOT NULL AND e.event_type = 'click'
             |    AND epoch_us(e.ts) > u.t1
             |    AND epoch_us(e.ts) - u.t1 <= 86400000000 GROUP BY 1),
             |s3 AS (SELECT e.user_id, min(epoch_us(e.ts)) AS t3 FROM events e
             |  JOIN s2 ON e.user_id = s2.user_id
             |  WHERE e.event_type = 'purchase' AND epoch_us(e.ts) > s2.t2
             |    AND epoch_us(e.ts) - s2.t2 <= 86400000000 GROUP BY 1),
             |c AS (SELECT (SELECT count(*) FROM u WHERE t1 IS NOT NULL) AS c1,
             |  (SELECT count(*) FROM s2) AS c2, (SELECT count(*) FROM s3) AS c3)
             |SELECT 1::BIGINT AS step, 'view' AS event_type, c1 AS n_users,
             |  round(c1*1.0/c1, 4) + 0.0 AS pct_of_first FROM c
             |UNION ALL SELECT 2, 'click', c2, round(c2*1.0/c1, 4) + 0.0 FROM c
             |UNION ALL SELECT 3, 'purchase', c3, round(c3*1.0/c1, 4) + 0.0 FROM c"""
        .stripMargin)),

    // Q128 — cohort retention matrix: users cohorted by first-ever
    // event day, distinct-active counts per (cohort, day offset),
    // retention vs the cohort's own size. Day keys are epoch-day longs
    // (representation-independent); the per-cohort normalizer is a
    // window over the tiny days×days matrix, never the event table.
    Q("q128_cohort_retention",
      (s, d) => Tables.events(s, d)
        .transform(EventAnalytics.cohortRetention("user_id", "ts")),
      Some("""WITH d AS (SELECT user_id,
             |    date_diff('day', DATE '1970-01-01', ts::DATE) AS d FROM events),
             |f AS (SELECT user_id, min(d) AS c FROM d GROUP BY 1),
             |m AS (SELECT f.c AS cohort_d, d.d - f.c AS offset_d,
             |    count(DISTINCT d.user_id) AS n_active
             |  FROM d JOIN f USING (user_id) GROUP BY 1, 2)
             |SELECT cast(cohort_d AS BIGINT) AS cohort_d,
             |  cast(offset_d AS BIGINT) AS offset_d, n_active,
             |  round(n_active*1.0 / max(CASE WHEN offset_d = 0 THEN n_active END)
             |    OVER (PARTITION BY cohort_d), 4) + 0.0 AS retention
             |FROM m""".stripMargin)),

    // Windowed rate-anomaly detection: per (event_type, hour bucket),
    // flag counts deviating > 3σ from the trailing-24-bucket mean —
    // the volume spike/drop monitor an event intake runs continuously.
    // The z-test is exact integer arithmetic (z² > k² ⟺ (nW−S)² >
    // k²(WQ−S²): no division, no sqrt, no floats — the q140
    // no-arithmetic-left discipline applied to a statistical test);
    // zero-variance windows flag on any deviation by the same
    // inequality. One (type, bucket)-grain aggregate with map-side
    // partials; windows run over the #types·#buckets matrix, never
    // the event table; cold-start buckets (w < 6) withheld.
    Q("q145_rate_anomalies",
      (s, d) => Tables.events(s, d)
        .transform(EventAnalytics.rateAnomalies("ts", "event_type")),
      Some("""WITH c AS (SELECT event_type, epoch_us(ts) // 3600000000 AS bucket,
             |    count(*) AS n
             |  FROM events GROUP BY 1, 2),
             |t AS (SELECT event_type, bucket, n,
             |    count(*) OVER w AS w, sum(n) OVER w AS s, sum(n*n) OVER w AS q
             |  FROM c WINDOW w AS (PARTITION BY event_type ORDER BY bucket
             |    ROWS BETWEEN 24 PRECEDING AND 1 PRECEDING))
             |SELECT event_type, bucket, n, w,
             |  CAST((n*w - s)*(n*w - s) AS BIGINT) AS z2_num,
             |  CAST(w*q - s*s AS BIGINT) AS z2_den,
             |  CAST(CASE WHEN (n*w - s)*(n*w - s) > 9*(w*q - s*s)
             |    THEN 1 ELSE 0 END AS BIGINT) AS anomaly
             |FROM t WHERE w >= 6""".stripMargin)),

    // SCD2 status-interval history: the event stream read as a change
    // log, consecutive repeats collapsed, validity intervals
    // [valid_from_us, valid_to_us) emitted with a NULL-open current
    // row — the snapshot-to-interval build that turns "status at time
    // T" from a log scan into an as-of probe (q32's join against this
    // table). Output size = number of status CHANGES, not events. One
    // Exchange on the user key for both windows and the filter.
    Q("q146_status_intervals",
      (s, d) => Tables.events(s, d)
        .transform(EventAnalytics.statusIntervals(
          "user_id", "ts", "event_type", "event_id")),
      Some("""WITH o AS (SELECT user_id, event_type, event_id,
             |    epoch_us(ts) AS us,
             |    lag(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS prev
             |  FROM events),
             |c AS (SELECT user_id, event_type, us, event_id FROM o
             |  WHERE prev IS NULL OR prev <> event_type)
             |SELECT user_id, event_type AS status, us AS valid_from_us,
             |  lead(us) OVER (PARTITION BY user_id ORDER BY us, event_id)
             |    AS valid_to_us,
             |  CAST(CASE WHEN lead(us) OVER (PARTITION BY user_id
             |      ORDER BY us, event_id) IS NULL
             |    THEN 1 ELSE 0 END AS BIGINT) AS is_current
             |FROM c""".stripMargin)),

    // Rolling active users (q150): per active day, DAU / trailing-7
    // WAU / trailing-30 MAU distinct-user counts plus DAU/MAU
    // stickiness in exact basis points — the engagement trio beside
    // the cohort matrix. Distinct-over-sliding-window doesn't
    // decompose, so the scalable form is coverage fan-out: one
    // corpus-grain dedup to the (user, day) grain, a ≤30-row explode
    // per user-day, one conditional-distinct aggregate; the active-day
    // spine broadcasts into a semi join.
    Q("q150_active_users",
      (s, d) => Tables.events(s, d)
        .transform(EventAnalytics.activeUsers("user_id", "ts")),
      Some("""WITH ud AS (SELECT DISTINCT user_id AS u,
             |    date_diff('day', DATE '1970-01-01', ts::DATE) AS d
             |  FROM events),
             |spine AS (SELECT DISTINCT d AS day FROM ud),
             |fan AS (SELECT u, d + off AS day, off
             |  FROM ud, range(30) AS r(off)),
             |a AS (SELECT day,
             |    count(DISTINCT CASE WHEN off = 0 THEN u END) AS dau,
             |    count(DISTINCT CASE WHEN off <= 6 THEN u END) AS wau,
             |    count(DISTINCT u) AS mau
             |  FROM fan JOIN spine USING (day) GROUP BY 1)
             |SELECT CAST(day AS BIGINT) AS day, dau, wau, mau,
             |  (dau * 10000) // mau AS stickiness_bp
             |FROM a""".stripMargin)),

    // First-order Markov transition matrix (q154): per-user sequences
    // ordered by (ts, event_id), (current → next) transition counts,
    // add-one-smoothed row probabilities over the observed alphabet —
    // the behavior model behind next-event prediction and
    // drift-vs-baseline intake monitoring. One user-keyed Exchange for
    // the successor window; totals and alphabet size are aggregates OF
    // the ≤|types|² matrix (broadcast back), never a second event-table
    // pass.
    Q("q154_markov_transitions",
      (s, d) => Tables.events(s, d)
        .transform(EventAnalytics.markovTransitions(
          "user_id", "ts", "event_type", "event_id")),
      Some("""WITH seqd AS (SELECT event_type,
             |    lead(event_type) OVER (PARTITION BY user_id
             |      ORDER BY epoch_us(ts), event_id) AS nxt
             |  FROM events),
             |tr AS (SELECT event_type AS cur_type, nxt AS next_type,
             |    count(*) AS c
             |  FROM seqd WHERE nxt IS NOT NULL GROUP BY 1, 2),
             |v AS (SELECT count(DISTINCT t) AS v FROM (
             |  SELECT cur_type AS t FROM tr
             |  UNION ALL SELECT next_type FROM tr)),
             |tot AS (SELECT cur_type, sum(c) AS t FROM tr GROUP BY 1)
             |SELECT cur_type, next_type, c,
             |  round((c + 1.0) / (t + v), 4) + 0.0 AS p_q4
             |FROM tr JOIN tot USING (cur_type), v""".stripMargin)),

    // Temporal embargo split (q156): time-ordered train/test with a
    // leakage gap — rows before the 80% cutoff train, the next
    // span/50 of time is embargoed out of BOTH sides, the rest tests.
    // Exact epoch-µs integer arithmetic on non-negative operands (DIV
    // ≡ //); one tiny min/max aggregate broadcast back, then a pure
    // projection — the fact table itself never shuffles.
    Q("q156_temporal_embargo_split",
      (s, d) => Sampling.temporalEmbargoSplit(
        Tables.events(s, d), "event_id", "ts"),
      Some("""WITH b AS (SELECT min(epoch_us(ts)) AS lo,
             |    max(epoch_us(ts)) AS hi FROM events)
             |SELECT event_id, epoch_us(ts) AS us,
             |  CASE WHEN epoch_us(ts) < lo + (hi - lo) * 8 // 10
             |      THEN 'train'
             |    WHEN epoch_us(ts) < lo + (hi - lo) * 8 // 10
             |        + (hi - lo) // 50 THEN 'embargo'
             |    ELSE 'test' END AS split
             |FROM events, b""".stripMargin)),

    // Morton / Z-order curve encoding (q159): the multi-dimensional
    // layout key behind CorpusSink.writeZOrdered — (time, user) scaled
    // to 16 bits by exact overflow-free width division, bit-interleaved
    // by the magic-masks spread, plus the 64-way file-bucket id the
    // range writer would assign. Pure per-row integer projection over
    // a broadcast bounds row: no shuffle, no float surface; the same
    // shift/and/or arithmetic runs verbatim in the oracle, so the
    // curve itself is hash-verified (the layout's skipping effect is
    // CorpusSinkSpec's evidence).
    Q("q159_zorder_curve",
      (s, d) => {
        import graft.functions.ZCurve
        val ev = Tables.events(s, d).select(col("event_id"),
          unix_micros(col("ts")).as("us"), col("user_id"))
        val bounds = ev.agg(
          min("us").as("__tlo"), max("us").as("__thi"),
          min("user_id").as("__ulo"), max("user_id").as("__uhi"))
        ev.crossJoin(broadcast(bounds))
          .select(col("event_id"),
            ZCurve.scaleTo16("us", "__tlo", "__thi").as("zx"),
            ZCurve.scaleTo16("user_id", "__ulo", "__uhi").as("zy"))
          .withColumn("zval", ZCurve.zValue(col("zx"), col("zy")))
          .withColumn("file_bucket", expr("zval * 64 DIV 4294967296"))
      },
      Some("""WITH b AS (SELECT min(epoch_us(ts)) AS tlo,
             |    max(epoch_us(ts)) AS thi, min(user_id) AS ulo,
             |    max(user_id) AS uhi FROM events),
             |s AS (SELECT event_id,
             |    CASE WHEN thi = tlo THEN 0
             |      WHEN thi - tlo <= 100000000000000
             |        THEN ((epoch_us(ts) - tlo) * 65535) // (thi - tlo)
             |      ELSE (epoch_us(ts) - tlo) // ((thi - tlo) // 65536 + 1)
             |      END AS zx,
             |    CASE WHEN uhi = ulo THEN 0
             |      WHEN uhi - ulo <= 100000000000000
             |        THEN ((user_id - ulo) * 65535) // (uhi - ulo)
             |      ELSE (user_id - ulo) // ((uhi - ulo) // 65536 + 1)
             |      END AS zy
             |  FROM events, b),
             |p1 AS (SELECT event_id, zx, zy,
             |    ((zx & 65535) | ((zx & 65535) << 8)) & 16711935 AS ax,
             |    ((zy & 65535) | ((zy & 65535) << 8)) & 16711935 AS ay
             |  FROM s),
             |p2 AS (SELECT event_id, zx, zy,
             |    (ax | (ax << 4)) & 252645135 AS ax,
             |    (ay | (ay << 4)) & 252645135 AS ay FROM p1),
             |p3 AS (SELECT event_id, zx, zy,
             |    (ax | (ax << 2)) & 858993459 AS ax,
             |    (ay | (ay << 2)) & 858993459 AS ay FROM p2),
             |p4 AS (SELECT event_id, zx, zy,
             |    (ax | (ax << 1)) & 1431655765 AS ax,
             |    (ay | (ay << 1)) & 1431655765 AS ay FROM p3)
             |SELECT event_id, zx, zy, (ax | (ay << 1)) AS zval,
             |  ((ax | (ay << 1)) * 64) // 4294967296 AS file_bucket
             |FROM p4""".stripMargin))
  )
}
