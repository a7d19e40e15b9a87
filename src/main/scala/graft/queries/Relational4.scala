package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** Relational operator inventory, part 4 (SURVEY.md §2.2 additions):
  * ordered string aggregation, nested types (struct / map), multiset
  * set-ops, deterministic sampling, null-ordering semantics.
  */
object Relational4 extends QueryModule {
  import Q.t

  def queries: Map[String, Q] = Map(
    // ─── q48: ordered string aggregation + collect_set ───
    "q48_string_agg" -> Q(
      (s, dir) => {
        val joined = t(s, dir, "nation")
          .join(broadcast(t(s, dir, "region")),
            col("n_regionkey") === col("r_regionkey"))
        joined.groupBy(col("r_name"))
          .agg(
            array_join(array_sort(collect_list(col("n_name"))), ",")
              .as("nations_csv"),
            size(array_distinct(collect_list(col("n_regionkey"))))
              .cast("long").as("n_distinct_keys"))
          .orderBy(col("r_name"))
      },
      Some("""SELECT r_name,
          string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
          count(DISTINCT n_regionkey) AS n_distinct_keys
        FROM nation JOIN region ON n_regionkey = r_regionkey
        GROUP BY r_name
        ORDER BY r_name""")),

    // ─── q49: nested types — struct build/access, map access ───
    // The struct is built, then every field is projected back out as a
    // scalar: the driver's pandas comparator cannot hash a raw struct
    // cell, so field access IS the gate (same operator, scalar output).
    "q49_struct_map" -> Q(
      (s, dir) => {
        val regionStruct = struct(col("r_name").as("name"),
          col("r_regionkey").as("key"))
        t(s, dir, "region")
          .select(col("r_regionkey"),
            regionStruct.getField("name").as("struct_name"),
            regionStruct.getField("key").cast("long").as("struct_key"),
            element_at(
              map(lit(1), lit("one"), lit(2), lit("two")),
              (col("r_regionkey") % 2 + 1).cast("int")).as("map_val"))
          .orderBy(col("r_regionkey"))
      },
      Some("""SELECT r_regionkey,
          {'name': r_name, 'key': r_regionkey}.name AS struct_name,
          cast({'name': r_name, 'key': r_regionkey}.key as bigint)
            AS struct_key,
          map([1, 2], ['one', 'two'])[cast(r_regionkey % 2 + 1 as int)][1]
            AS map_val
        FROM region
        ORDER BY r_regionkey""")),

    // ─── q50: deterministic key-hash sampling ───
    // The portable stand-in for TABLESAMPLE: a pure function of the
    // key selects a stable ~10% sample on any engine, any run, any
    // partitioning — which is what reproducible pipeline sampling
    // needs anyway. r12 audit: isolated sf100 median 0.94 s ≈ the
    // 2-numeric-column orders scan floor (0.86 s) — the published
    // 2.97 s / 7.9x row was leg-throttle noise. The sum joins the
    // suite-wide scaled-long policy (dsum; measured a wash here —
    // only the 10% sample pays the cast — adopted so no per-row
    // BigDecimal route survives anywhere).
    "q50_sample" -> Q(
      (s, dir) => {
        t(s, dir, "orders")
          .filter(pmod(col("o_orderkey") * 2654435761L, lit(100)) < 10)
          .agg(count(lit(1)).as("n_sampled"),
            graft.functions.Dnum.dsum(col("o_totalprice"), 2)
              .as("sampled_total"))
      },
      Some("""SELECT count(*) AS n_sampled,
          cast(sum(cast(o_totalprice as decimal(18,2))) as double)
            AS sampled_total
        FROM orders
        WHERE (o_orderkey * 2654435761) % 100 < 10""")),

    // ─── q51: multiset set operations (ALL variants) ───
    // One pushed-filter scan feeds both branches of both set-ops: the
    // naive form re-scanned lineitem FOUR times (a and b each feed
    // intersectAll and exceptAll; exchange reuse cannot merge scans
    // with different pushed filters). The union of the two branch
    // predicates (l_orderkey <= 1500) is row-group-prunable and tiny,
    // so it cache+count-materializes once and the set-ops run on the
    // cached rows — at a 100 TB table, 4 scans -> 1 is the difference
    // that matters (r12 audit: 0.87 -> 0.56 s isolated at sf100; the
    // published 2.17 s / 3.6x row was leg-throttle noise).
    "q51_setops_all" -> Q(
      (s, dir) => {
        val base = t(s, dir, "lineitem")
          .filter(col("l_orderkey") <= 1500)
          .select(col("l_orderkey"), col("l_partkey")).cache()
        base.count() // materialize: both set-ops read the cached rows
        val a = base.filter(col("l_orderkey") <= 1000)
          .select(col("l_partkey"))
        val b = base.filter(col("l_orderkey").between(500, 1500))
          .select(col("l_partkey"))
        val inter = a.intersectAll(b).agg(count(lit(1)).as("n"))
          .withColumn("op", lit("intersect_all"))
        val exc = a.exceptAll(b).agg(count(lit(1)).as("n"))
          .withColumn("op", lit("except_all"))
        inter.union(exc).select(col("op"), col("n")).orderBy(col("op"))
      },
      Some("""WITH a AS (SELECT l_partkey FROM lineitem WHERE l_orderkey <= 1000),
             b AS (SELECT l_partkey FROM lineitem
                   WHERE l_orderkey BETWEEN 500 AND 1500)
        SELECT 'intersect_all' AS op, count(*) AS n
          FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b)
        UNION ALL
        SELECT 'except_all' AS op, count(*) AS n
          FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b)
        ORDER BY op""")),

    // ─── q52: string utilities round 2 ───
    "q52_string_funcs2" -> Q(
      (s, dir) => {
        t(s, dir, "part").filter(col("p_partkey") <= 100)
          .select(col("p_partkey"),
            split_part(col("p_name"), lit(" "), lit(2)).as("second_word"),
            translate(col("p_name"), "aeiou", "AEIOU").as("vowels_up"),
            col("p_name").startsWith("cold").as("is_cold"),
            col("p_name").endsWith("widget").as("is_widget"),
            format_string("%s [%d]", col("p_brand"), col("p_size"))
              .as("labeled"))
          .orderBy(col("p_partkey"))
      },
      Some("""SELECT p_partkey,
          split_part(p_name, ' ', 2) AS second_word,
          translate(p_name, 'aeiou', 'AEIOU') AS vowels_up,
          starts_with(p_name, 'cold') AS is_cold,
          ends_with(p_name, 'widget') AS is_widget,
          printf('%s [%d]', p_brand, p_size) AS labeled
        FROM part WHERE p_partkey <= 100
        ORDER BY p_partkey""")),

    // ─── q57: bitwise aggregates ───
    "q57_bitwise_agg" -> Q(
      (s, dir) => {
        t(s, dir, "lineitem").filter(col("l_orderkey") <= 1000)
          .groupBy(col("l_returnflag"))
          .agg(bit_and(col("l_partkey")).as("band"),
            bit_or(col("l_partkey")).as("bor"),
            bit_xor(col("l_partkey")).as("bxor"))
          .orderBy(col("l_returnflag"))
      },
      Some("""SELECT l_returnflag,
          bit_and(l_partkey) AS band,
          bit_or(l_partkey) AS bor,
          bit_xor(l_partkey) AS bxor
        FROM lineitem WHERE l_orderkey <= 1000
        GROUP BY l_returnflag
        ORDER BY l_returnflag""")),

    // ─── q58: boolean aggregates + count_if ───
    "q58_bool_agg" -> Q(
      (s, dir) => {
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"))
          .agg(every(col("o_totalprice") > 1000).as("all_over_1k"),
            some(col("o_totalprice") > 400000).as("any_over_400k"),
            count_if(col("o_orderpriority") === "1-URGENT").as("n_urgent"))
          .orderBy(col("o_orderstatus"))
      },
      Some("""SELECT o_orderstatus,
          bool_and(o_totalprice > 1000) AS all_over_1k,
          bool_or(o_totalprice > 400000) AS any_over_400k,
          count(*) FILTER (WHERE o_orderpriority = '1-URGENT') AS n_urgent
        FROM orders
        GROUP BY o_orderstatus
        ORDER BY o_orderstatus""")),

    // ─── q55: CUBE + grouping() marker (q16 covers ROLLUP) ───
    "q55_cube" -> Q(
      (s, dir) => {
        // pre-aggregate to the finest grouping BEFORE the cube: Expand
        // multiplies its input by the 4 grouping sets, so cubing raw
        // orders pushes 4x the corpus through the aggregate — cubing
        // the ~15-row (status, priority) pre-agg is free and sums of
        // counts re-derive count(*) exactly. grouping() flags are
        // computed by the cube itself, so they are unaffected.
        t(s, dir, "orders")
          .groupBy(col("o_orderstatus"), col("o_orderpriority"))
          .agg(count(lit(1)).as("pn"))
          .cube(col("o_orderstatus"), col("o_orderpriority"))
          .agg(sum(col("pn")).as("n"),
            grouping(col("o_orderstatus")).cast("long").as("g_status"),
            grouping(col("o_orderpriority")).cast("long").as("g_priority"))
          .select(coalesce(col("o_orderstatus"), lit("ALL")).as("status"),
            coalesce(col("o_orderpriority"), lit("ALL")).as("priority"),
            col("n"), col("g_status"), col("g_priority"))
          .orderBy(col("status"), col("priority"))
      },
      Some("""SELECT coalesce(o_orderstatus, 'ALL') AS status,
          coalesce(o_orderpriority, 'ALL') AS priority,
          count(*) AS n,
          cast(grouping(o_orderstatus) as bigint) AS g_status,
          cast(grouping(o_orderpriority) as bigint) AS g_priority
        FROM orders
        GROUP BY CUBE (o_orderstatus, o_orderpriority)
        ORDER BY status, priority""")),

    // ─── q56: outer explode (rows preserved for empty arrays) ───
    "q56_explode_outer" -> Q(
      (s, dir) => {
        val withArr = t(s, dir, "part").filter(col("p_partkey") <= 50)
          .withColumn("sizes",
            when(col("p_size") % 2 === 0,
              sequence(lit(1), col("p_size") % 3 + 1))
              .otherwise(array().cast("array<int>")))
        withArr.select(col("p_partkey"),
            explode_outer(col("sizes")).as("sz"))
          .select(col("p_partkey"),
            coalesce(col("sz"), lit(-1)).cast("long").as("sz"))
          .orderBy(col("p_partkey"), col("sz"))
      },
      Some("""WITH witharr AS (
          SELECT p_partkey,
            CASE WHEN p_size % 2 = 0
                 THEN range(1, p_size % 3 + 2)
                 ELSE [] END AS sizes
          FROM part WHERE p_partkey <= 50)
        SELECT p_partkey,
          cast(coalesce(u.sz, -1) as bigint) AS sz
        FROM witharr LEFT JOIN LATERAL unnest(sizes) AS u(sz) ON true
        ORDER BY p_partkey, sz""")),

    // ─── q54: RANGE window frames (value-based, vs. q18's ROWS) ───
    // Sliding 1-hour event-time window per user expressed as a RANGE
    // frame over epoch-micros — the value-based frame the streaming
    // window would maintain incrementally.
    // Decimal cast stays off the dsum policy for the same reason as
    // q18: it runs after the scale-fixed user_id <= 30 filter, so the
    // BigDecimal route is O(filtered) while the key's corpus-scale
    // cost is the events scan; no windowed lsumDec form exists.
    "q54_range_frame" -> Q(
      (s, dir) => {
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("user_id"))
          .orderBy(col("ts_us"))
          .rangeBetween(-3600000000L, 0L)
        Q.events(s, dir).filter(col("user_id") <= 30)
          .select(col("user_id"), col("event_id"),
            unix_micros(col("ts")).as("ts_us"), col("value"))
          .select(col("user_id"), col("event_id"),
            count(lit(1)).over(w).as("n_last_hour"),
            sum(col("value").cast(DecimalType(18, 6))).over(w)
              .cast("double").as("value_last_hour"))
          .orderBy(col("user_id"), col("event_id"))
      },
      Some("""SELECT user_id, event_id,
          count(*) OVER w AS n_last_hour,
          cast(sum(cast(value as decimal(18,6))) OVER w as double)
            AS value_last_hour
        FROM (SELECT user_id, event_id, epoch_us(ts) AS ts_us, value
              FROM events WHERE user_id <= 30)
        WINDOW w AS (PARTITION BY user_id ORDER BY ts_us
                     RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
        ORDER BY user_id, event_id""")),

    // ─── q53: null ordering semantics (order captured as a rank column) ───
    "q53_null_order" -> Q(
      (s, dir) => {
        val withNulls = t(s, dir, "orders").filter(col("o_orderkey") <= 100)
          .select(col("o_orderkey"),
            nullif(col("o_orderstatus"), lit("P")).as("st"))
        withNulls.select(col("o_orderkey"), col("st"),
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("st").asc_nulls_first, col("o_orderkey")))
              .cast("long").as("rank_nulls_first"),
            row_number().over(org.apache.spark.sql.expressions.Window
              .orderBy(col("st").asc_nulls_last, col("o_orderkey")))
              .cast("long").as("rank_nulls_last"))
          .orderBy(col("o_orderkey"))
      },
      Some("""SELECT o_orderkey, nullif(o_orderstatus, 'P') AS st,
          row_number() OVER (ORDER BY nullif(o_orderstatus, 'P')
            ASC NULLS FIRST, o_orderkey) AS rank_nulls_first,
          row_number() OVER (ORDER BY nullif(o_orderstatus, 'P')
            ASC NULLS LAST, o_orderkey) AS rank_nulls_last
        FROM orders WHERE o_orderkey <= 100
        ORDER BY o_orderkey""")),

    // ─── q60: adversarial inputs (nulls / empty / non-BMP unicode /
    // malformed JSON / zero-length arrays) ───
    // The generated corpus is clean ASCII, so the dialect edges where
    // Spark and an ANSI engine can silently diverge never get
    // exercised by the other gates. This one builds a deterministic
    // nasty table FROM the nation dim (so the oracle can build the
    // byte-identical table in SQL) and pushes it through the
    // functions most likely to disagree: code-point length and upper
    // on beyond-BMP text, regex word-split of empty strings, JSON
    // extraction from malformed documents (Spark try_parse_json vs a
    // json_valid guard), element access on empty/null arrays
    // (try_element_at vs [] — both NULL, never an error), and md5
    // over multibyte text (byte-level UTF-8 agreement).
    "q60_adversarial" -> Q(
      (s, dir) => {
        val nasty = t(s, dir, "nation")
          .select(col("n_nationkey").cast("long").as("id"))
          .select(col("id"),
            when(col("id") % 5 === 0, lit(null).cast("string"))
              .when(col("id") % 5 === 1, lit(""))
              .when(col("id") % 5 === 2, lit("😀🎉 ünïcödé 漢字 𝔘𝔫𝔦"))
              .when(col("id") % 5 === 3,
                concat(lit("tab\there\nand newline "), col("id")))
              .otherwise(lit("plain ascii text")).as("txt"),
            when(col("id") % 4 === 0, concat(lit("{\"k\":"), col("id"), lit("}")))
              .when(col("id") % 4 === 1, lit("{not json"))
              .when(col("id") % 4 === 2, lit(null).cast("string"))
              .otherwise(lit("{\"k\":null}")).as("js"),
            when(col("id") % 3 === 0, array().cast("array<bigint>"))
              .when(col("id") % 3 === 1, lit(null).cast("array<bigint>"))
              .otherwise(array(col("id"), col("id") * 2)).as("arr"))
        nasty.select(col("id"),
            length(col("txt")).cast("long").as("txt_len"),
            upper(col("txt")).as("txt_up"),
            size(split(trim(col("txt")), "\\s+")).cast("long").as("n_words"),
            try_variant_get(try_parse_json(col("js")), "$.k", "long").as("k"),
            size(col("arr")).cast("long").as("arr_n"),
            try_element_at(col("arr"), lit(1)).as("first_el"),
            md5(coalesce(col("txt"), lit("<null>"))).as("fp"))
          .orderBy(col("id"))
      },
      Some("""WITH nasty AS (
          SELECT cast(n_nationkey as bigint) AS id,
            CASE WHEN n_nationkey % 5 = 0 THEN NULL
                 WHEN n_nationkey % 5 = 1 THEN ''
                 WHEN n_nationkey % 5 = 2
                   THEN '😀🎉 ünïcödé 漢字 𝔘𝔫𝔦'
                 WHEN n_nationkey % 5 = 3
                   THEN 'tab' || chr(9) || 'here' || chr(10)
                        || 'and newline ' || cast(n_nationkey as varchar)
                 ELSE 'plain ascii text' END AS txt,
            CASE WHEN n_nationkey % 4 = 0
                   THEN '{"k":' || cast(n_nationkey as varchar) || '}'
                 WHEN n_nationkey % 4 = 1 THEN '{not json'
                 WHEN n_nationkey % 4 = 2 THEN NULL
                 ELSE '{"k":null}' END AS js,
            CASE WHEN n_nationkey % 3 = 0 THEN []
                 WHEN n_nationkey % 3 = 1 THEN NULL
                 ELSE [cast(n_nationkey as bigint),
                       cast(n_nationkey as bigint) * 2] END AS arr
          FROM nation)
        SELECT id,
          cast(length(txt) as bigint) AS txt_len,
          upper(txt) AS txt_up,
          cast(len(string_split_regex(trim(txt), '\s+')) as bigint)
            AS n_words,
          CASE WHEN json_valid(js)
               THEN cast(json_extract_string(js, '$.k') as bigint) END AS k,
          cast(len(arr) as bigint) AS arr_n,
          arr[1] AS first_el,
          md5(coalesce(txt, '<null>')) AS fp
        FROM nasty
        ORDER BY id""")),

    // ─── q62: dual-dimension fact join (TPC-H Q7 shape) ───
    // The shape Q7 pins that no other gate covers: ONE fact joined
    // through TWO independent dimension paths (supplier→nation and
    // orders→customer→nation) with the group key assembled from both
    // sides plus a derived year. Scale design: both nation attaches
    // happen BEFORE the fact's one big join — supN broadcast-joins
    // lineitem in place, custN broadcast-joins orders in place — so
    // the only corpus-scale exchange pair is the orderkey join, and
    // the ~25·25·|years| output groups collapse map-side. (The first
    // r8 form joined custN AFTER the orderkey join; that sort-merged
    // the whole fact output on custkey — a third corpus-scale
    // exchange — and benched 32.8 s vs DuckDB's 7.3 s at sf100.)
    // Both nation-tagged dims are corpus-proportional, so they are
    // NOT force-broadcast: cache+count materialization (the
    // q3/q5/q41/t10 pattern) shows the size check their true ~25 B/row
    // footprint, planning static broadcasts that degrade to shuffles
    // at the corpus scale where a dim outgrows the threshold.
    "q62_nation_pairs" -> Q(
      (s, dir) => {
        val nation = t(s, dir, "nation")
          .select(col("n_nationkey"), col("n_name"))
        // int nation KEYS ride the corpus-scale exchanges; the ~12 B
        // name strings attach to the 1250-row aggregate at the end
        // (two 25-row broadcasts) — same trick as q5's restructure
        val supN = t(s, dir, "supplier")
          .select(col("s_suppkey"), col("s_nationkey")).cache()
        supN.count() // materialize: the fact join plans on true size
        val custN = t(s, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")).cache()
        custN.count()
        // shuffle_hash, not sort-merge: neither side's custkey order
        // is reusable downstream (the next join keys on orderkey), so
        // hashing the dim side beats sorting 150M orders rows.
        // Partition-fit bound (r14 sf300 spike, the one scale defect
        // it found): the second hint's build side is THIS subtree's
        // output — |orders| rows — so the per-partition hash build is
        // ~|orders|/shuffle.partitions rows and must fit execution
        // memory. At sf300 with the suite's static 32 partitions the
        // build wants ~1 GB/partition and dies ("Can't acquire ...
        // bytes to build hash relation"; AQE's skew split does not
        // rescue uniformly oversized builds) — at 96 partitions the
        // same plan runs (65 s). This is SURVEY §3's sizing rule made
        // measurable: shuffle partitions scale with data (or with
        // executors on a real cluster), and a pinned shuffle_hash on
        // a corpus-x-corpus join is the shape that enforces it.
        val ordN = t(s, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"))
          .join(custN.hint("shuffle_hash"),
            col("o_custkey") === col("c_custkey"))
          .select(col("o_orderkey"), col("c_nationkey"))
        t(s, dir, "lineitem")
          .filter(col("l_shipdate") >= lit("1995-01-01") &&
            col("l_shipdate") < lit("1997-01-01"))
          // scaled-long revenue (suite-wide dsum policy, the q5/q1
          // form): the old cast(DecimalType(18,4)) paid the ~267
          // ns/value toString→BigDecimal route per filtered fact row
          // (~200M at sf100) — the last per-row BigDecimal on a
          // corpus-scale aggregate input (r12 verdict task 2)
          .select(col("l_orderkey"), col("l_suppkey"),
            year(col("l_shipdate")).cast("long").as("l_year"),
            graft.functions.DoubleToScaledLong.of(
              col("l_extendedprice") * (lit(1.0) - col("l_discount")), 4)
              .as("rev1"))
          .join(supN, col("l_suppkey") === col("s_suppkey"))
          .join(ordN.hint("shuffle_hash"),
            col("l_orderkey") === col("o_orderkey"))
          .groupBy(col("s_nationkey"), col("c_nationkey"), col("l_year"))
          .agg(graft.functions.Dnum.lsumDec(col("rev1"), 4)
              .cast("double").as("revenue"),
            count(lit(1)).as("n_items"))
          .join(broadcast(nation),
            col("s_nationkey") === col("n_nationkey"))
          .withColumnRenamed("n_name", "supp_nation")
          .drop("n_nationkey")
          .join(broadcast(nation.withColumnRenamed("n_name", "cust_nation")
            .withColumnRenamed("n_nationkey", "cn_key")),
            col("c_nationkey") === col("cn_key"))
          .select(col("supp_nation"), col("cust_nation"), col("l_year"),
            col("revenue"), col("n_items"))
          .orderBy(col("supp_nation"), col("cust_nation"), col("l_year"))
      },
      Some("""SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
          cast(year(l_shipdate) as bigint) AS l_year,
          cast(sum(cast(l_extendedprice * (1.0 - l_discount)
            as decimal(18,4))) as double) AS revenue,
          count(*) AS n_items
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN orders ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        WHERE l_shipdate >= timestamp '1995-01-01'
          AND l_shipdate < timestamp '1997-01-01'
        GROUP BY supp_nation, cust_nation, l_year
        ORDER BY supp_nation, cust_nation, l_year""")),

    // ─── q63: recursive CTE (WITH RECURSIVE, Spark 4.x) ───
    // Iterative hierarchy walk — the org-chart/BOM query class no
    // plain join chain expresses. The hierarchy is synthesized from
    // the data deterministically: parent(c) = c div 10, roots are
    // custkeys < 10, so every customer has one chain of depth
    // ≈ log10(key). Scale shape: the engine runs one JOIN per
    // recursion LEVEL (bounded by log10(maxkey) ≈ 7 at any corpus
    // size), each level a key-equi-join of the frontier against the
    // dimension — never a self-cross; depth growth, not row growth,
    // bounds the iteration count.
    //
    // Spark guards runaway recursion with a 1M-row accumulator cap
    // (spark.sql.cteRecursionRowLimit). This walk emits each customer
    // exactly once (|customer| total rows — 1.5M at sf10, 15M at
    // sf100), so the default cap trips on row VOLUME, not on depth;
    // raise it to the data scale FOR THIS PLAN ONLY. Scoping matters
    // two ways: (a) setting it on the shared session would leak a 2^30
    // cap that quietly disarms the runaway-recursion guard for every
    // later recursive CTE in a long-lived session (bench/verify JVMs
    // run ~135 queries); (b) a set-then-restore around sql() would be
    // UNSAFE the other way — the loop executes at ACTION time
    // (UnionLoopExec), which is after the builder returns, so the
    // restored 1M cap would trip at sf1+. A cloned session resolves
    // both: the raised cap lives in the clone's conf for the lifetime
    // of the returned DataFrame, and the caller's session is never
    // touched. The real safety net here is the level limit
    // (depth ≈ log10(maxkey) ≤ 9), which stays default.
    "q63_recursive_cte" -> Q(
      (s0, dir) => {
        val s = org.apache.spark.sql.graftbridge.Bridge.cloneSession(s0)
        s.conf.set("spark.sql.cteRecursionRowLimit", (1 << 30).toString)
        t(s, dir, "customer").select(col("c_custkey"))
          .createOrReplaceTempView("graft_cust_rec")
        s.sql("""WITH RECURSIVE h(c, depth) AS (
            SELECT c_custkey, 0 FROM graft_cust_rec WHERE c_custkey < 10
            UNION ALL
            SELECT k.c_custkey, h.depth + 1
            FROM graft_cust_rec k JOIN h ON k.c_custkey div 10 = h.c
            WHERE k.c_custkey >= 10)
          SELECT cast(depth as bigint) AS depth, count(*) AS n,
            cast(sum(c) as bigint) AS key_sum
          FROM h GROUP BY depth ORDER BY depth""")
      },
      Some("""WITH RECURSIVE h(c, depth) AS (
          SELECT c_custkey, 0 FROM customer WHERE c_custkey < 10
          UNION ALL
          SELECT k.c_custkey, h.depth + 1
          FROM customer k JOIN h ON k.c_custkey // 10 = h.c
          WHERE k.c_custkey >= 10)
        SELECT cast(depth as bigint) AS depth, count(*) AS n,
          cast(sum(c) as bigint) AS key_sum
        FROM h GROUP BY depth ORDER BY depth""")),

    // ─── q64: LATERAL correlated subquery join (Spark 4.x) ───
    // Per-outer-row correlated top-n — the "for each region, its 2
    // richest customers" shape. Catalyst DECORRELATES the lateral
    // limit into a window-rank over the inner side joined once (a
    // DomainJoin rewrite), so the plan is one corpus-scale pass, not
    // |outer| re-executions — which is exactly why expressing it as
    // LATERAL (instead of hand-writing the window) is safe at 100 TB.
    "q64_lateral_topn" -> Q(
      (s, dir) => {
        t(s, dir, "region").createOrReplaceTempView("graft_q64_region")
        t(s, dir, "nation").createOrReplaceTempView("graft_q64_nation")
        t(s, dir, "customer").createOrReplaceTempView("graft_q64_customer")
        s.sql("""SELECT r_name, c_custkey, c_acctbal
          FROM graft_q64_region,
            LATERAL (SELECT c_custkey, c_acctbal
                     FROM graft_q64_customer
                     JOIN graft_q64_nation ON c_nationkey = n_nationkey
                     WHERE n_regionkey = r_regionkey
                     ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
          ORDER BY r_name, c_custkey""")
      },
      Some("""SELECT r_name, c_custkey, c_acctbal
        FROM region,
          LATERAL (SELECT c_custkey, c_acctbal
                   FROM customer JOIN nation ON c_nationkey = n_nationkey
                   WHERE n_regionkey = r_regionkey
                   ORDER BY c_acctbal DESC, c_custkey LIMIT 2)
        ORDER BY r_name, c_custkey"""))
  )
}
