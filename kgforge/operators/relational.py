"""Relational operator inventory — SURVEY.md §2 re-expressed Spark-first.

Each query below is one operator family from the reference
(Oracle/PCORNetLoader_ora.sql unless noted), exercised over the driver's
TPC-H-ish testdata so the DuckDB oracle can verify it. The KG pipeline
(kgforge.pipeline) composes the same primitives over `pages`.

Conventions:
- every callable takes (spark, sf_dir) and returns a DataFrame
- every computed column is aliased identically in Spark and oracle SQL
- money aggregates go through exact DECIMAL arithmetic and are cast to
  DOUBLE at the end, so Spark's partial-aggregation order cannot produce
  a different float than DuckDB's serial sum.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgforge.sources import read_table


def _dec(col, p=12, s=4):
    return F.col(col).cast(T.DecimalType(p, s))


# ---------------------------------------------------------------------------
# §2.4 aggregations
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped groupBy: the EAV fact-table roll-up pattern.

    Reference analog: per-emitter INSERT..SELECT aggregations, e.g. the
    dispensing roll-up max(supply)/max(amount) per key
    (Oracle/PCORNetLoader_ora.sql:2324-2348). Catalyst gives partial+final
    hash aggregation; the scan reads only the 7 referenced columns.
    """
    li = read_table(spark, "lineitem", sf_dir)
    one = F.lit(1).cast(T.DecimalType(12, 4))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(_dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(_dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(_dec("l_extendedprice") * (one - _dec("l_discount")))
            .cast("double")
            .alias("sum_disc_price"),
            F.sum(
                _dec("l_extendedprice")
                * (one - _dec("l_discount"))
                * (one + _dec("l_tax"))
            )
            .cast("double")
            .alias("sum_charge"),
            F.count("*").alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


ORACLE_PRICING_SUMMARY = """
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
                (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4)))) AS DOUBLE)
           AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,4)) *
                (CAST(1 AS DECIMAL(12,4)) - CAST(l_discount AS DECIMAL(12,4))) *
                (CAST(1 AS DECIMAL(12,4)) + CAST(l_tax AS DECIMAL(12,4)))) AS DOUBLE)
           AS sum_charge,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""


def q_group_minmax_impute(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group min/max with NVL2-style imputation — the pmnCONDITION emitter
    (min(encounter), min(onset), max(report), NVL2(max(end),'RS','NI');
    Oracle/PCORNetLoader_ora.sql:1561-1578)."""
    ev = read_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.col("user_id").alias("user_id"), F.col("event_type").alias("event_type"))
        .agg(
            F.min("event_id").alias("first_event_id"),
            F.min("ts").alias("onset_ts"),
            F.max("ts").alias("latest_ts"),
            F.when(F.max("value").isNotNull(), F.lit("RS"))
            .otherwise(F.lit("NI"))
            .alias("resolve_status"),
        )
    )


ORACLE_GROUP_MINMAX_IMPUTE = """
SELECT user_id, event_type,
       MIN(event_id) AS first_event_id,
       MIN(ts) AS onset_ts,
       MAX(ts) AS latest_ts,
       CASE WHEN MAX(value) IS NOT NULL THEN 'RS' ELSE 'NI' END AS resolve_status
FROM events GROUP BY user_id, event_type
"""


def q_breakdown_pct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Categorical breakdown with percent-of-total — the validation corpus
    pattern (ADD_SCILHS_100/ETL_dict_queries-MSSQL.sql:23-45). The CTE
    total x group counts becomes a window SUM over an empty frame (one
    shuffle, no crossJoin)."""
    from pyspark.sql.window import Window

    o = read_table(spark, "orders", sf_dir)
    counts = o.groupBy("o_orderstatus").agg(F.count("*").alias("cnt"))
    total = Window.partitionBy()
    return counts.select(
        "o_orderstatus",
        "cnt",
        F.round(F.lit(100.0) * F.col("cnt") / F.sum("cnt").over(total), 2).alias("pct"),
    ).orderBy("o_orderstatus")


ORACLE_BREAKDOWN_PCT = """
SELECT o_orderstatus, COUNT(*) AS cnt,
       ROUND(100.0 * COUNT(*) / SUM(COUNT(*)) OVER (), 2) AS pct
FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus
"""


def q_reconciliation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Source/dest reconciliation counts — the i2pReport discipline
    (count(*), count(distinct patid) per table,
    Oracle/PCORNetLoader_ora.sql:2451-2565). Exact countDistinct here for
    the test gate; monitoring at 10^12 scale uses approx_count_distinct."""
    o = read_table(spark, "orders", sf_dir)
    li = read_table(spark, "lineitem", sf_dir)
    a = o.agg(
        F.lit("orders").alias("tbl"),
        F.count("*").alias("n_rows"),
        F.countDistinct("o_custkey").alias("n_subjects"),
    )
    b = li.agg(
        F.lit("lineitem").alias("tbl"),
        F.count("*").alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_subjects"),
    )
    return a.unionByName(b).orderBy("tbl")


ORACLE_RECONCILIATION_COUNTS = """
SELECT 'orders' AS tbl, COUNT(*) AS n_rows, COUNT(DISTINCT o_custkey) AS n_subjects FROM orders
UNION ALL
SELECT 'lineitem' AS tbl, COUNT(*) AS n_rows, COUNT(DISTINCT l_orderkey) AS n_subjects FROM lineitem
ORDER BY tbl
"""


# ---------------------------------------------------------------------------
# §2.3 joins
# ---------------------------------------------------------------------------

def q_broadcast_linker(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The linker join shape: huge fact inner-join small dimension —
    fact.concept_cd = ontology.c_basecode (Oracle/PCORNetLoader_ora.sql:1499).
    Explicit F.broadcast: dictionary << facts, so no shuffle of the fact
    side; at 100 TB this is the difference between a map-side join and a
    full sort-merge shuffle of the corpus."""
    li = read_table(spark, "lineitem", sf_dir)
    part = read_table(spark, "part", sf_dir)
    return (
        li.join(F.broadcast(part), li.l_partkey == part.p_partkey, "inner")
        .groupBy("p_brand")
        .agg(
            F.count("*").alias("n_lines"),
            F.sum(_dec("l_quantity")).cast("double").alias("total_qty"),
        )
        .orderBy("p_brand")
    )


ORACLE_BROADCAST_LINKER = """
SELECT p_brand, COUNT(*) AS n_lines,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,4))) AS DOUBLE) AS total_qty
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand ORDER BY p_brand
"""


def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IN-subquery decorrelated to left-semi — patient_num IN (SELECT patid
    FROM pmndemographic) (Oracle/PCORNetLoader_ora.sql:2377, :111)."""
    c = read_table(spark, "customer", sf_dir)
    o = read_table(spark, "orders", sf_dir)
    big = o.filter(F.col("o_totalprice") > 150000).select(F.col("o_custkey").alias("c_custkey"))
    return (
        c.join(big, "c_custkey", "left_semi")
        .select("c_custkey", "c_name", "c_mktsegment")
        .orderBy("c_custkey")
    )


ORACLE_SEMI_JOIN = """
SELECT c_custkey, c_name, c_mktsegment FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_totalprice > 150000)
ORDER BY c_custkey
"""


def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NOT-IN codelist exclusion as left-anti join
    (Oracle/PCORNetLoader_ora.sql:1118, :1202). The exclusion side is a
    *partial* codelist (high-value orders), mirroring the reference's
    codelist semantics where survivors always exist — an anti-join against
    ALL orders returns 0 rows at every tested sf and would make the oracle
    comparison vacuous (0 == 0 proves nothing)."""
    c = read_table(spark, "customer", sf_dir)
    o = read_table(spark, "orders", sf_dir)
    big = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    return (
        c.join(big, "c_custkey", "left_anti")
        .select("c_custkey", "c_name")
        .orderBy("c_custkey")
    )


ORACLE_ANTI_JOIN = """
SELECT c_custkey, c_name FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders WHERE o_totalprice > 400000)
ORDER BY c_custkey
"""


def q_theta_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment theta-join turned equi-join: the reference matches raw
    codes inside a quoted-CSV c_dimcode via LIKE '%''code''%'
    (Oracle/PCORNetLoader_ora.sql:1364-1365). Spark-first: explode the
    dictionary's code list once (tiny side) and equi-join — a broadcast
    hash join instead of a quadratic crossJoin+LIKE."""
    seed = spark.createDataFrame(
        [
            ("EXPEDITED", "'1-URGENT','2-HIGH'"),
            ("STANDARD", "'3-MEDIUM'"),
            ("RELAXED", "'4-NOT SPECIFIED','5-LOW'"),
        ],
        "enc_type string, dim_codes string",
    )
    dic = seed.select(
        "enc_type",
        F.explode(F.expr(r"""regexp_extract_all(dim_codes, "'([^']*)'", 1)""")).alias(
            "o_orderpriority"
        ),
    )
    o = read_table(spark, "orders", sf_dir)
    return (
        o.join(F.broadcast(dic), "o_orderpriority", "inner")
        .groupBy("enc_type")
        .agg(F.count("*").alias("n_orders"))
        .orderBy("enc_type")
    )


ORACLE_THETA_CONTAINMENT = """
WITH seed(enc_type, dim_codes) AS (
  VALUES ('EXPEDITED', '''1-URGENT'',''2-HIGH'''),
         ('STANDARD', '''3-MEDIUM'''),
         ('RELAXED', '''4-NOT SPECIFIED'',''5-LOW''')
), dict AS (
  SELECT enc_type, UNNEST(regexp_extract_all(dim_codes, '''([^'']*)''', 1)) AS o_orderpriority
  FROM seed
)
SELECT enc_type, COUNT(*) AS n_orders
FROM orders JOIN dict USING (o_orderpriority)
GROUP BY enc_type ORDER BY enc_type
"""


RANGE_BIN_US = 6 * 3600 * 1_000_000  # 6-hour time buckets


def q_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal range (interval) join: every event matched to every
    promo window whose half-open [start_ts, end_ts) contains the event
    timestamp — the enrollment-period containment idiom
    (Oracle/PCORNetLoader_ora.sql:2041-2069, admit date between period
    start/end) as a general interval join.

    Spark-first 100-TB shape: OSS Spark has no band-join optimization —
    a raw theta join on ts BETWEEN start AND end plans as
    BroadcastNestedLoopJoin, a per-event linear scan of every interval.
    Instead time is binned into fixed 6-hour buckets: each event maps to
    exactly ONE bucket map-side (no fact-side blowup, no post-join
    dedup), each interval EXPLODES to the buckets it overlaps (the
    interval side is the small one; the last bucket uses end-1us so an
    interval ending exactly on a bucket boundary does not claim an empty
    bucket), and the join is a broadcast hash EQUI-join on the bucket id
    followed by the exact containment predicate. If the interval side
    outgrew a broadcast, the identical plan shuffles both sides on the
    bucket id — the bucket width is the skew/size knob. hours_in is one
    IEEE division of exact integer microseconds, so the DuckDB oracle
    (which runs the naive theta join) matches bit-for-bit."""
    from datetime import datetime, timedelta

    t0 = datetime(2024, 1, 1)
    promos = spark.createDataFrame(
        [
            (
                i,
                t0 + timedelta(hours=60 * i),
                t0 + timedelta(hours=60 * i + 24 + 36 * (i % 3)),
            )
            for i in range(12)
        ],
        "promo_id int, start_ts timestamp, end_ts timestamp",
    )
    pb = promos.select(
        "promo_id",
        "start_ts",
        "end_ts",
        F.explode(
            F.sequence(
                (F.unix_micros("start_ts") / RANGE_BIN_US).cast("long"),
                ((F.unix_micros("end_ts") - 1) / RANGE_BIN_US).cast("long"),
            )
        ).alias("bin"),
    )
    # events.ts is TIMESTAMP_NTZ in the parquet; the session pins UTC so
    # the cast to instant-typed TIMESTAMP is exact
    e = read_table(spark, "events", sf_dir).withColumn(
        "ts", F.col("ts").cast("timestamp")
    )
    return (
        e.withColumn("bin", (F.unix_micros("ts") / RANGE_BIN_US).cast("long"))
        .join(F.broadcast(pb), "bin")
        .filter((F.col("ts") >= F.col("start_ts")) & (F.col("ts") < F.col("end_ts")))
        .select(
            "event_id",
            "promo_id",
            "event_type",
            "value",
            (
                (F.unix_micros("ts") - F.unix_micros("start_ts")).cast("double")
                / F.lit(3600000000.0)
            ).alias("hours_in"),
        )
        .orderBy("event_id", "promo_id")
    )


ORACLE_RANGE_JOIN = """
WITH promos AS (
  SELECT CAST(i AS INT) AS promo_id,
         TIMESTAMP '2024-01-01 00:00:00' + to_hours(60 * i) AS start_ts,
         TIMESTAMP '2024-01-01 00:00:00' + to_hours(60 * i + 24 + 36 * (i % 3)) AS end_ts
  FROM range(0, 12) t(i)
)
SELECT e.event_id, p.promo_id, e.event_type, e.value,
       CAST(epoch_us(e.ts) - epoch_us(p.start_ts) AS DOUBLE) / 3600000000.0 AS hours_in
FROM events e JOIN promos p
  ON e.ts >= p.start_ts AND e.ts < p.end_ts
ORDER BY event_id, promo_id
"""


def q_values_seed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES reference data joined to a dimension — the
    PMN_LabNormal seed (Oracle/PCORNetLoader_ora.sql:485-540) joined like
    the lab reference-range left join (:1856)."""
    seed = spark.createDataFrame(
        [(0, "AFRICA_N", 10.0), (1, "AMERICA_N", 20.0), (2, "ASIA_N", 30.0)],
        "r_regionkey int, norm_name string, norm_low double",
    )
    r = read_table(spark, "region", sf_dir)
    n = read_table(spark, "nation", sf_dir)
    return (
        n.join(r, n.n_regionkey == r.r_regionkey, "inner")
        .join(F.broadcast(seed), "r_regionkey", "left")
        .select(
            "n_name",
            "r_name",
            F.coalesce("norm_name", F.lit("NI")).alias("norm_name"),
            F.coalesce("norm_low", F.lit(-1.0)).alias("norm_low"),
        )
        .orderBy("n_name")
    )


ORACLE_VALUES_SEED_JOIN = """
WITH seed(r_regionkey, norm_name, norm_low) AS (
  VALUES (0, 'AFRICA_N', 10.0), (1, 'AMERICA_N', 20.0), (2, 'ASIA_N', 30.0)
)
SELECT n_name, r_name,
       COALESCE(norm_name, 'NI') AS norm_name,
       CAST(COALESCE(norm_low, -1.0) AS DOUBLE) AS norm_low
FROM nation JOIN region ON n_regionkey = r_regionkey
LEFT JOIN seed USING (r_regionkey)
ORDER BY n_name
"""


def q_modifier_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modifier re-attach as ONE groupBy+pivot instead of six stacked left
    self-joins (the reference's basis/freq/quantity/refills/supply/unit
    joins, Oracle/PCORNetLoader_ora.sql:2202-2243). One shuffle replaces
    six — at corpus scale this is the single biggest plan win."""
    ev = read_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .pivot("event_type", ["click", "view", "purchase", "error"])
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            F.coalesce("click", F.lit(0)).alias("n_click"),
            F.coalesce("view", F.lit(0)).alias("n_view"),
            F.coalesce("purchase", F.lit(0)).alias("n_purchase"),
            F.coalesce("error", F.lit(0)).alias("n_error"),
        )
        .orderBy("user_id")
    )


ORACLE_MODIFIER_PIVOT = """
SELECT user_id,
       COALESCE(COUNT(*) FILTER (WHERE event_type = 'click'), 0) AS n_click,
       COALESCE(COUNT(*) FILTER (WHERE event_type = 'view'), 0) AS n_view,
       COALESCE(COUNT(*) FILTER (WHERE event_type = 'purchase'), 0) AS n_purchase,
       COALESCE(COUNT(*) FILTER (WHERE event_type = 'error'), 0) AS n_error
FROM events GROUP BY user_id ORDER BY user_id
"""


def q_eav_pivot_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical EAV->wide pivot: CASE-per-measure then MAX per key —
    the pmnVITAL emitter (Oracle/PCORNetLoader_ora.sql:1644-1660)."""
    ev = read_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id")
        .agg(
            F.max(F.when(F.col("event_type") == "click", F.col("value"))).alias("max_click_value"),
            F.max(F.when(F.col("event_type") == "purchase", F.col("value"))).alias(
                "max_purchase_value"
            ),
            F.max(F.when(F.col("event_type") == "view", F.col("value"))).alias("max_view_value"),
        )
        .orderBy("user_id")
    )


ORACLE_EAV_PIVOT_MAX = """
SELECT user_id,
       MAX(CASE WHEN event_type = 'click' THEN value END) AS max_click_value,
       MAX(CASE WHEN event_type = 'purchase' THEN value END) AS max_purchase_value,
       MAX(CASE WHEN event_type = 'view' THEN value END) AS max_view_value
FROM events GROUP BY user_id ORDER BY user_id
"""


# ---------------------------------------------------------------------------
# §2.5 windows
# ---------------------------------------------------------------------------

def q_dedup_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-by-preference rank, keep rn=1 — the dictionary dedup
    (row_number over partition by c_basecode order by preference,
    Oracle/PCORNetLoader_ora.sql:1852-1857) and DRG-per-encounter dedup
    (:1350-1356). Tiebreak includes the unique key so the winner is
    deterministic across partition layouts."""
    from pyspark.sql.window import Window

    o = read_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
        .orderBy("o_custkey")
    )


ORACLE_DEDUP_RANK = """
SELECT o_custkey, o_orderkey, o_orderdate, o_totalprice FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_custkey
                               ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
  FROM orders
) WHERE rn = 1 ORDER BY o_custkey
"""


def q_ntile_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percentile cohort filter — pcornetprep drops the bottom-k%
    fact-count percentile per (age-decade, sex) stratum via ntile(100)
    (MSSQL/PCORNetLoader.sql:2384-2394). Order includes the unique key so
    ntile is total-ordered (deterministic across engines/parallelism)."""
    from pyspark.sql.window import Window

    c = read_table(spark, "customer", sf_dir)
    o = read_table(spark, "orders", sf_dir)
    facts = o.groupBy(F.col("o_custkey").alias("c_custkey")).agg(F.count("*").alias("n_facts"))
    joined = c.join(facts, "c_custkey", "inner")
    w = Window.partitionBy("c_mktsegment").orderBy("n_facts", "c_custkey")
    return (
        joined.withColumn("pct", F.ntile(100).over(w))
        .filter(F.col("pct") > 5)
        .select("c_custkey", "c_mktsegment", "n_facts", "pct")
        .orderBy("c_custkey")
    )


ORACLE_NTILE_COHORT = """
WITH facts AS (
  SELECT o_custkey AS c_custkey, COUNT(*) AS n_facts FROM orders GROUP BY o_custkey
)
SELECT c_custkey, c_mktsegment, n_facts, pct FROM (
  SELECT c.c_custkey, c.c_mktsegment, f.n_facts,
         NTILE(100) OVER (PARTITION BY c.c_mktsegment ORDER BY f.n_facts, c.c_custkey) AS pct
  FROM customer c JOIN facts f USING (c_custkey)
) WHERE pct > 5 ORDER BY c_custkey
"""


def q_topk_freshness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOP-10-by-date then AVG — the data-freshness metric
    (MSSQL/PCORNetLoader.sql:2516-2524). orderBy(desc).limit(k) lets Spark
    run a distributed TakeOrdered instead of a full sort."""
    ev = read_table(spark, "events", sf_dir)
    top = ev.orderBy(F.desc("ts"), F.desc("event_id")).limit(10)
    return top.agg(
        F.count("*").alias("n"),
        F.round(F.avg(F.unix_timestamp("ts")), 0).cast("long").alias("avg_epoch"),
    )


ORACLE_TOPK_FRESHNESS = """
SELECT COUNT(*) AS n,
       CAST(ROUND(AVG(FLOOR(EPOCH(ts))), 0) AS BIGINT) AS avg_epoch
FROM (SELECT ts FROM events ORDER BY ts DESC, event_id DESC LIMIT 10)
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k per group via window rank — the general form of the
    reference's rn=1 dedups, kept as k=3 to exercise the frame."""
    from pyspark.sql.window import Window

    o = read_table(spark, "orders", sf_dir)
    w = Window.partitionBy("o_orderpriority").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_orderpriority", "rnk", "o_orderkey", "o_totalprice")
        .orderBy("o_orderpriority", "rnk")
    )


ORACLE_TOPK_PER_GROUP = """
SELECT o_orderpriority, rnk, o_orderkey, o_totalprice FROM (
  SELECT o_orderpriority, o_orderkey, o_totalprice,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders
) WHERE rnk <= 3 ORDER BY o_orderpriority, rnk
"""


# ---------------------------------------------------------------------------
# §2.1/§2.2 scans, filters, limits; §2.6 set ops
# ---------------------------------------------------------------------------

def q_filtered_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date-window filtered scan with tight projection — the i2b2visit view
    (start_date >= 2010-01-01 AND ..., Oracle/PCORNetLoader_ora.sql:114).
    Both the filter and the 3-column projection reach the parquet scan
    (PushedFilters/ReadSchema in .explain)."""
    o = read_table(spark, "orders", sf_dir)
    return (
        o.filter(
            (F.col("o_orderdate") >= F.lit("1995-01-01"))
            & (F.col("o_orderdate") < F.lit("1996-01-01"))
        )
        .select("o_orderkey", "o_custkey", "o_orderdate")
        .orderBy("o_orderkey")
    )


ORACLE_FILTERED_SCAN = """
SELECT o_orderkey, o_custkey, o_orderdate FROM orders
WHERE o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1996-01-01 00:00:00'
ORDER BY o_orderkey
"""


def q_distinct_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT + deterministic limit — the active-patient list
    (SELECT DISTINCT patient_num WHERE ROWNUM < 1e8,
    Oracle/PCORNetLoader_ora.sql:102-109). Ordered before limit so the
    result is stable across partition layouts."""
    o = read_table(spark, "orders", sf_dir)
    return o.select("o_custkey").distinct().orderBy("o_custkey").limit(100)


ORACLE_DISTINCT_LIMIT = """
SELECT DISTINCT o_custkey FROM orders ORDER BY o_custkey LIMIT 100
"""


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION-with-dedup — provider ids collected from two output tables
    (Oracle/PCORNetLoader_ora.sql:2432-2436)."""
    c = read_table(spark, "customer", sf_dir)
    s = read_table(spark, "supplier", sf_dir)
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .union(s.select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
        .orderBy("nationkey")
    )


ORACLE_UNION_DISTINCT = """
SELECT c_nationkey AS nationkey FROM customer
UNION
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


# ---------------------------------------------------------------------------
# §2.7 scalar functions
# ---------------------------------------------------------------------------

def q_scheme_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """scheme:value prefix strip — SUBSTR(x, INSTR(x,':')+1) at 10+ call
    sites (Oracle/PCORNetLoader_ora.sql:1474,1602,...). Codes are
    synthesized as 'SEG:<mktsegment>' so the split is real work."""
    c = read_table(spark, "customer", sf_dir)
    coded = c.select(
        "c_custkey", F.concat(F.lit("SEG:"), F.col("c_mktsegment")).alias("code")
    )
    return coded.select(
        "c_custkey",
        "code",
        F.substring_index("code", ":", 1).alias("scheme"),
        F.substring_index("code", ":", -1).alias("value"),
    ).orderBy("c_custkey")


ORACLE_SCHEME_SPLIT = """
SELECT c_custkey, 'SEG:' || c_mktsegment AS code,
       split_part('SEG:' || c_mktsegment, ':', 1) AS scheme,
       split_part('SEG:' || c_mktsegment, ':', 2) AS value
FROM customer ORDER BY c_custkey
"""


def q_time_format(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Separate HH24:MI time-of-day columns — TO_CHAR(date,'HH24:MI')
    (Oracle/PCORNetLoader_ora.sql:1111,1340-1342). Session TZ pinned UTC so
    this is deterministic and oracle-comparable."""
    ev = read_table(spark, "events", sf_dir)
    return ev.select(
        "event_id",
        F.date_format("ts", "yyyy-MM-dd").alias("event_date"),
        F.date_format("ts", "HH:mm").alias("event_time"),
    ).orderBy("event_id")


ORACLE_TIME_FORMAT = """
SELECT event_id, strftime(ts, '%Y-%m-%d') AS event_date,
       strftime(ts, '%H:%M') AS event_time
FROM events ORDER BY event_id
"""


def q_case_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chained CASE decision table with encoded missingness — the
    enc_type/tobacco/comparator maps (Oracle/PCORNetLoader_ora.sql:1344,
    1633-1642, 1915) with NI/UN/OT defaults."""
    ev = read_table(spark, "events", sf_dir)
    mapped = (
        F.when(F.col("event_type") == "click", F.lit("AV"))
        .when(F.col("event_type") == "purchase", F.lit("IP"))
        .when(F.col("event_type") == "view", F.lit("ED"))
        .when(F.col("event_type").isNull(), F.lit("NI"))
        .otherwise(F.lit("OT"))
    )
    return (
        ev.select("event_id", "event_type", mapped.alias("enc_type"))
        .orderBy("event_id")
    )


ORACLE_CASE_MAPPING = """
SELECT event_id, event_type,
       CASE WHEN event_type = 'click' THEN 'AV'
            WHEN event_type = 'purchase' THEN 'IP'
            WHEN event_type = 'view' THEN 'ED'
            WHEN event_type IS NULL THEN 'NI'
            ELSE 'OT' END AS enc_type
FROM events ORDER BY event_id
"""


def q_csv_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quoted-CSV parsing — pcornet_parsecode's 40-line char-loop state
    machine (Oracle/PCORNetLoader_ora.sql:194-231) collapses to one
    regexp_extract_all + explode."""
    n = read_table(spark, "nation", sf_dir)
    csv = n.select(
        "n_nationkey",
        F.concat(F.lit("'"), F.col("n_name"), F.lit("','R"), F.col("n_regionkey").cast("string"), F.lit("'")).alias("dim_code"),
    )
    return (
        csv.select(
            "n_nationkey",
            F.posexplode(F.expr(r"""regexp_extract_all(dim_code, "'([^']*)'", 1)""")).alias(
                "pos", "code"
            ),
        )
        .orderBy("n_nationkey", "pos")
    )


ORACLE_CSV_PARSE = """
WITH csv AS (
  SELECT n_nationkey,
         '''' || n_name || ''',''R' || CAST(n_regionkey AS VARCHAR) || '''' AS dim_code
  FROM nation
)
SELECT n_nationkey,
       CAST(UNNEST(generate_series(1, len(codes))) - 1 AS INT) AS pos,
       UNNEST(codes) AS code
FROM (SELECT n_nationkey, regexp_extract_all(dim_code, '''([^'']*)''', 1) AS codes FROM csv)
ORDER BY n_nationkey, pos
"""


def q_json_qualifier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Qualifier extraction from an encoded-string column — the reference
    parses encoded strings everywhere (paths, scheme:value, quoted CSV);
    the modern analog is a JSON props column."""
    ev = read_table(spark, "events", sf_dir)
    return (
        ev.select(
            "event_id",
            F.get_json_object("props", "$.k").cast("int").alias("k_val"),
        )
        .filter(F.col("k_val") > 90)
        .orderBy("event_id")
    )


ORACLE_JSON_QUALIFIER = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k_val
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS INT) > 90
ORDER BY event_id
"""


def q_value_guard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Outlier suppression + comparator mapping — nval_num <= 10000000
    guard (Oracle/PCORNetLoader_ora.sql:1687,1914) and the E/NE/L/LE/G/GE
    comparator decode (:1915)."""
    ev = read_table(spark, "events", sf_dir)
    return (
        ev.select(
            "event_id",
            F.when(F.col("value") <= 50.0, F.col("value")).alias("value_guarded"),
            F.when(F.col("value") < 10, F.lit("L"))
            .when(F.col("value") > 40, F.lit("G"))
            .otherwise(F.lit("E"))
            .alias("comparator"),
        )
        .orderBy("event_id")
    )


ORACLE_VALUE_GUARD = """
SELECT event_id,
       CASE WHEN value <= 50.0 THEN value END AS value_guarded,
       CASE WHEN value < 10 THEN 'L' WHEN value > 40 THEN 'G' ELSE 'E' END AS comparator
FROM events ORDER BY event_id
"""


# ---------------------------------------------------------------------------
# §2.8 recursion / iteration
# ---------------------------------------------------------------------------

def q_hierarchy_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-ancestor attribute propagation down a tree — the recursive
    CTE that pushes pcori_cui/ndc from ancestors to descendants then keeps
    the nearest via row_number over c_hlevel desc
    (MSSQL/PCORI_MEDS_SCHEMA_CHANGE.sql:34-54).

    Spark-first: POINTER DOUBLING, not level-at-a-time climbing. Round k
    holds, per node, its 2^k-th ancestor pointer and the nearest valued
    node within its first 2^k ancestors (self included); one self-join
    composes two half-segments into the 2^(k+1) state. A depth-D tree
    resolves in ceil(log2 D) rounds instead of D — at a driver-loop cost
    of ~3 jobs/round that is the difference between 5 and 48 rounds on a
    deep hierarchy, and each round still shuffles only (id, ptr, best).
    The tree is synthesized from doc ids (parent = id/2, value on
    multiples of 7) so DuckDB's WITH RECURSIVE can verify it.
    """
    d = read_table(spark, "documents", sf_dir).select("doc_id")
    nodes = d.select(
        F.col("doc_id").alias("id"),
        F.when(F.col("doc_id") > 0, F.floor(F.col("doc_id") / 2).cast("long")).alias(
            "parent_id"
        ),
        F.when(F.col("doc_id") % 7 == 0, F.concat(F.lit("CUI:"), F.col("doc_id"))).alias(
            "own_value"
        ),
    ).cache()

    from kgforge.ontology import pointer_double_nearest_value

    resolved = pointer_double_nearest_value(
        nodes.select("id", F.col("parent_id").alias("parent"), F.col("own_value").alias("value")),
        max_depth=64,  # > the 48-round cap in the oracle's recursive CTE
    )
    return resolved.orderBy("id")


ORACLE_HIERARCHY_PROPAGATION = """
WITH RECURSIVE nodes AS (
  SELECT doc_id AS id,
         CASE WHEN doc_id > 0 THEN CAST(FLOOR(doc_id / 2) AS BIGINT) END AS parent_id,
         CASE WHEN doc_id % 7 = 0 THEN 'CUI:' || CAST(doc_id AS VARCHAR) END AS own_value
  FROM documents
),
walk AS (
  -- climb from each node to its nearest valued ancestor (or self)
  SELECT id, id AS cur, 0 AS depth FROM nodes
  UNION ALL
  SELECT w.id, n.parent_id AS cur, w.depth + 1
  FROM walk w JOIN nodes n ON n.id = w.cur
  JOIN nodes c ON c.id = w.cur
  WHERE c.own_value IS NULL AND n.parent_id IS NOT NULL AND w.depth < 48
),
hit AS (
  SELECT w.id, n.own_value AS value, w.depth,
         ROW_NUMBER() OVER (PARTITION BY w.id ORDER BY w.depth) AS rn
  FROM walk w JOIN nodes n ON n.id = w.cur
  WHERE n.own_value IS NOT NULL
)
SELECT id, value FROM hit WHERE rn = 1 ORDER BY id
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy totals (region -> nation -> total) — beyond the
    reference's flat GROUP BYs, the multi-level reporting shape its
    validation corpus approximates with repeated queries."""
    n = read_table(spark, "nation", sf_dir)
    r = read_table(spark, "region", sf_dir)
    c = read_table(spark, "customer", sf_dir)
    j = c.join(
        F.broadcast(n), c.c_nationkey == n.n_nationkey
    ).join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    return (
        j.rollup("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.sum(_dec("c_acctbal", 18, 4)).cast("double").alias("total_balance"),
        )
        .orderBy(
            F.col("r_name").asc_nulls_first(), F.col("n_name").asc_nulls_first()
        )
    )


ORACLE_ROLLUP = """
SELECT r_name, n_name, COUNT(*) AS n_customers,
       CAST(SUM(CAST(c_acctbal AS DECIMAL(18,4))) AS DOUBLE) AS total_balance
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP (r_name, n_name)
ORDER BY r_name NULLS FIRST, n_name NULLS FIRST
"""


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over both grouping dimensions (all four grouping sets in
    one pass) — the cross-classified reporting twin of rel_rollup's
    hierarchy. Spark computes CUBE with a single expand+aggregate, so
    the fact table is scanned once however many grouping sets the
    report needs — at 100 TB that single-scan property is the whole
    point vs. UNION ALL of per-set GROUP BYs."""
    o = read_table(spark, "orders", sf_dir)
    return (
        o.cube("o_orderstatus", "o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice", 18, 4)).cast("double").alias("total_price"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ORACLE_CUBE = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price
FROM orders
GROUP BY CUBE (o_orderstatus, o_orderpriority)
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the two one-dimension marginals in one
    scan, a set list neither ROLLUP nor CUBE can express (rollup gives
    the hierarchy prefixes, cube all 2^n combinations; a report that
    wants exactly the per-status and per-priority marginals without the
    cross-classification or grand total needs explicit sets). Same
    single expand+aggregate plan as rel_cube: the fact table is scanned
    once however many sets the report asks for — at 100 TB that
    single-scan property is the point vs. UNION ALL of per-set GROUP
    BYs. GROUPING() disambiguates a real NULL key from a superaggregate
    row, exactly as in the SQL standard."""
    o = read_table(spark, "orders", sf_dir)
    return (
        o.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"]],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(_dec("o_totalprice", 18, 4)).cast("double").alias("total_price"),
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_prio"),
        )
        .orderBy(
            F.col("o_orderstatus").asc_nulls_first(),
            F.col("o_orderpriority").asc_nulls_first(),
        )
    )


ORACLE_GROUPING_SETS = """
SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS DOUBLE) AS total_price,
       CAST(GROUPING(o_orderstatus) AS INT) AS g_status,
       CAST(GROUPING(o_orderpriority) AS INT) AS g_prio
FROM orders
GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority))
ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""


def q_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL without dedup — the concept-path seed-list / fact-union
    pattern (Oracle/PCORNetLoader_ora.sql:1674-1688)."""
    c = read_table(spark, "customer", sf_dir)
    s = read_table(spark, "supplier", sf_dir)
    u = c.select(
        F.lit("cust").alias("kind"), F.col("c_nationkey").alias("nationkey")
    ).unionByName(
        s.select(F.lit("supp").alias("kind"), F.col("s_nationkey").alias("nationkey"))
    )
    return u.groupBy("kind", "nationkey").agg(F.count(F.lit(1)).alias("n")).orderBy(
        "kind", "nationkey"
    )


ORACLE_UNION_ALL = """
SELECT kind, nationkey, COUNT(*) AS n FROM (
  SELECT 'cust' AS kind, c_nationkey AS nationkey FROM customer
  UNION ALL
  SELECT 'supp' AS kind, s_nationkey AS nationkey FROM supplier
) GROUP BY kind, nationkey ORDER BY kind, nationkey
"""


def q_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT set difference (available beyond the reference's UNION-only
    surface, SURVEY.md §2.6 note)."""
    c = read_table(spark, "customer", sf_dir)
    o = read_table(spark, "orders", sf_dir)
    buyers = o.filter(F.col("o_totalprice") > 400000).select(
        F.col("o_custkey").alias("c_custkey")
    )
    building = c.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    return building.subtract(buyers).orderBy("c_custkey")  # EXCEPT (distinct)


ORACLE_EXCEPT = """
SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
EXCEPT
SELECT o_custkey AS c_custkey FROM orders WHERE o_totalprice > 400000
ORDER BY c_custkey
"""


def q_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT — nations that have both customers and suppliers."""
    c = read_table(spark, "customer", sf_dir)
    s = read_table(spark, "supplier", sf_dir)
    return (
        c.select(F.col("c_nationkey").alias("nationkey"))
        .intersect(s.select(F.col("s_nationkey").alias("nationkey")))
        .orderBy("nationkey")
    )


ORACLE_INTERSECT = """
SELECT c_nationkey AS nationkey FROM customer
INTERSECT
SELECT s_nationkey AS nationkey FROM supplier
ORDER BY nationkey
"""


def q_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group — the modern form of the
    reference's ntile-based cohort statistics."""
    li = read_table(spark, "lineitem", sf_dir)
    return (
        li.groupBy("l_returnflag")
        .agg(
            F.round(F.expr("percentile(l_quantity, 0.5)"), 6).alias("median_qty"),
            F.round(F.expr("percentile(l_quantity, 0.9)"), 6).alias("p90_qty"),
        )
        .orderBy("l_returnflag")
    )


ORACLE_MEDIAN = """
SELECT l_returnflag,
       ROUND(quantile_cont(l_quantity, 0.5), 6) AS median_qty,
       ROUND(quantile_cont(l_quantity, 0.9), 6) AS p90_qty
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""


def q_unit_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unit-conversion constant multiply — the unit_ht()/unit_wt()
    scalar functions (Oracle/PCORNetLoader_ora.sql:32-45, applied to
    vitals at :1651-1652) as config-driven lit() factors: quantities
    re-expressed in pounds (x2.20462) and sizes in inches (x0.393701).
    No UDF; pure codegen arithmetic."""
    from kgforge.conf import UNIT_HT, UNIT_WT

    li = read_table(spark, "lineitem", sf_dir)
    return (
        li.filter(F.col("l_orderkey") <= 640)
        .select(
            "l_orderkey",
            "l_linenumber",
            F.col("l_quantity").cast("double").alias("qty"),
            F.round(F.col("l_quantity") * F.lit(UNIT_WT), 6).alias("qty_lb"),
            F.round(F.col("l_quantity") * F.lit(UNIT_HT), 6).alias("qty_in"),
        )
        .orderBy("l_orderkey", "l_linenumber")
    )


ORACLE_UNIT_CONVERT = """
SELECT l_orderkey, l_linenumber, CAST(l_quantity AS DOUBLE) AS qty,
       ROUND(l_quantity * 2.20462, 6) AS qty_lb,
       ROUND(l_quantity * 0.393701, 6) AS qty_in
FROM lineitem WHERE l_orderkey <= 640
ORDER BY l_orderkey, l_linenumber
"""


def q_format_lpad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Numeric truncation / zero-padded code formatting — the to_char
    50-char cap (Oracle/PCORNetLoader_ora.sql:1929) and the
    leading-zero harvest codes (:1979): numbers rendered as strings,
    capped with substring, and lpad'ed into fixed-width codes."""
    o = read_table(spark, "orders", sf_dir)
    return (
        o.filter(F.col("o_orderkey") <= 2000)
        .select(
            "o_orderkey",
            F.substring(F.col("o_orderkey").cast("string"), 1, 3).alias("key_trunc"),
            F.lpad(F.col("o_custkey").cast("string"), 9, "0").alias("cust_code"),
            F.substring(F.col("o_orderpriority"), 3, 9).alias("prio_code"),
        )
        .orderBy("o_orderkey")
    )


ORACLE_FORMAT_LPAD = """
SELECT o_orderkey,
       substring(CAST(o_orderkey AS VARCHAR), 1, 3) AS key_trunc,
       lpad(CAST(o_custkey AS VARCHAR), 9, '0') AS cust_code,
       substring(o_orderpriority, 3, 9) AS prio_code
FROM orders WHERE o_orderkey <= 2000 ORDER BY o_orderkey
"""


def q_path_slice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-offset path slice + path-leaf extraction — the
    SUBSTR(c_fullname, 18, 2) dx_type slices
    (Oracle/PCORNetLoader_ora.sql:1475, :1352) and the last-path-segment
    code derivation (MSSQL/ontology_fix_script_ms_v5.sql:8). Paths are
    built deterministically from region/nation, then sliced both ways:
    the robust element_at(split) form AND the raw fixed offset."""
    n = read_table(spark, "nation", sf_dir)
    r = read_table(spark, "region", sf_dir)
    j = n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
    path = F.concat(F.lit("\\KG\\"), F.col("r_name"), F.lit("\\"), F.col("n_name"))
    return j.select(
        "n_nationkey",
        path.alias("path"),
        F.element_at(F.split(path, r"\\"), -1).alias("leaf"),
        F.element_at(F.split(path, r"\\"), 3).alias("domain"),
        F.substring(path, 5, 2).alias("fixed_slice"),
    ).orderBy("n_nationkey")


ORACLE_PATH_SLICE = """
SELECT n_nationkey,
       '\\KG\\' || r_name || '\\' || n_name AS path,
       n_name AS leaf,
       r_name AS domain,
       substring('\\KG\\' || r_name || '\\' || n_name, 5, 2) AS fixed_slice
FROM nation JOIN region ON n_regionkey = r_regionkey
ORDER BY n_nationkey
"""


def q_composite_key_scope(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fact x encounter scoping on a composite 2-col key — every
    reference emitter inner-joins pmnENCOUNTER on (patid, encounterid)
    to scope its facts (Oracle/PCORNetLoader_ora.sql:1445, :1604,
    :1936, :2110). Here: 'encounters' = (user_id, event_type) pairs
    that have a click, facts scoped to them on BOTH columns (a
    sort-merge join on the composite key; AQE splits it if skewed)."""
    ev = read_table(spark, "events", sf_dir)
    enc = (
        ev.filter(F.col("event_type") == "click")
        .select(
            F.col("user_id").alias("enc_user"),
            F.col("event_type").alias("enc_type"),
        )
        .distinct()
    )
    scoped = ev.join(
        enc,
        (F.col("user_id") == F.col("enc_user"))
        & (F.col("event_type") == F.col("enc_type")),
        "inner",
    ).select("user_id", "event_type", "event_id", "value")
    return (
        scoped.groupBy("user_id", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_scoped"),
            F.sum(F.col("value").cast(T.DecimalType(18, 4)))
            .cast("double")
            .alias("sum_value"),
        )
        .orderBy("user_id", "event_type")
    )


ORACLE_COMPOSITE_KEY_SCOPE = """
WITH enc AS (
  SELECT DISTINCT user_id, event_type FROM events WHERE event_type = 'click'
)
SELECT e.user_id, e.event_type, COUNT(*) AS n_scoped,
       CAST(SUM(CAST(e.value AS DECIMAL(18,4))) AS DOUBLE) AS sum_value
FROM events e JOIN enc ON e.user_id = enc.user_id AND e.event_type = enc.event_type
GROUP BY e.user_id, e.event_type ORDER BY e.user_id, e.event_type
"""


def q_loyalty_override(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Enrollment span with loyalty-period override — the per-patient
    enrollment emitter (min/max dates per patient,
    Oracle/PCORNetLoader_ora.sql:1740-1744) self-left-joined to the
    optional loyalty table: when a loyalty period exists it OVERRIDES
    the observed span and flags basis 'L', else the observed span with
    basis 'E'. The loyalty relation is derived deterministically
    (user_id % 5 == 0), mirroring the empty-view fallback semantics
    (:166-177)."""
    ev = read_table(spark, "events", sf_dir)
    span = ev.groupBy("user_id").agg(
        F.min("ts").alias("obs_start"), F.max("ts").alias("obs_end")
    )
    loyalty = (
        ev.filter(F.col("user_id") % 5 == 0)
        .groupBy("user_id")
        .agg(
            F.date_trunc("day", F.min("ts")).alias("loy_start"),
            F.date_trunc("day", F.max("ts")).alias("loy_end"),
        )
    )
    j = span.join(loyalty, "user_id", "left")
    return j.select(
        "user_id",
        F.coalesce("loy_start", "obs_start").alias("enr_start"),
        F.coalesce("loy_end", "obs_end").alias("enr_end"),
        F.when(F.col("loy_start").isNotNull(), F.lit("L"))
        .otherwise(F.lit("E"))
        .alias("enr_basis"),
    ).orderBy("user_id")


ORACLE_LOYALTY_OVERRIDE = """
WITH span AS (
  SELECT user_id, MIN(ts) AS obs_start, MAX(ts) AS obs_end
  FROM events GROUP BY user_id
),
loyalty AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS loy_start,
         date_trunc('day', MAX(ts)) AS loy_end
  FROM events WHERE user_id % 5 = 0 GROUP BY user_id
)
SELECT s.user_id,
       COALESCE(l.loy_start, s.obs_start) AS enr_start,
       COALESCE(l.loy_end, s.obs_end) AS enr_end,
       CASE WHEN l.loy_start IS NOT NULL THEN 'L' ELSE 'E' END AS enr_basis
FROM span s LEFT JOIN loyalty l ON s.user_id = l.user_id
ORDER BY s.user_id
"""


# ---------------------------------------------------------------------------
# MERGE/upsert and salted statistics (driver-checkable operators)
# ---------------------------------------------------------------------------

def merge_upsert(
    base: DataFrame, updates: DataFrame, keys: list[str], pri_col: str
) -> DataFrame:
    """MERGE INTO as dedup-union-latest-wins: union the sources, rank per
    key by priority (updates > base), keep rn=1 — the reference's
    gender-identity/sexual-orientation MERGE post-pass
    (Oracle/PCORNetLoader_ora.sql:1263-1283) without in-place mutation.
    Matched keys take the update row, unmatched updates insert, base
    rows without an update survive — exactly MERGE WHEN MATCHED THEN
    UPDATE / WHEN NOT MATCHED THEN INSERT, as one shuffle on the key."""
    from pyspark.sql.window import Window

    w = Window.partitionBy(*keys).orderBy(F.desc(pri_col))
    return (
        base.unionByName(updates)
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def q_merge_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Driver-checkable MERGE: base = all events; updates = corrected
    rows for every 10th event; inserts = brand-new rows keyed past the
    base id space. Latest-wins on event_id with source priority."""
    ev = read_table(spark, "events", sf_dir)
    base = ev.select(
        "event_id", "user_id", "event_type",
        F.col("value").cast("double").alias("value"),
        F.lit(1).alias("src_pri"),
    )
    updates = (
        ev.filter(F.col("event_id") % 10 == 0)
        .select(
            "event_id", "user_id",
            F.lit("corrected").alias("event_type"),
            (F.col("value") * 2).cast("double").alias("value"),
            F.lit(2).alias("src_pri"),
        )
    )
    inserts = (
        ev.filter(F.col("event_id") % 500 == 0)
        .select(
            (F.col("event_id") + 10000000).alias("event_id"), "user_id",
            F.lit("inserted").alias("event_type"),
            F.col("value").cast("double").alias("value"),
            F.lit(2).alias("src_pri"),
        )
    )
    merged = merge_upsert(base, updates.unionByName(inserts), ["event_id"], "src_pri")
    return merged.select(
        "event_id", "user_id", "event_type", "value",
        F.when(F.col("src_pri") == 2, F.lit("upserted"))
        .otherwise(F.lit("base"))
        .alias("merge_src"),
    ).orderBy("event_id")


ORACLE_MERGE_UPSERT = """
WITH base AS (
  SELECT event_id, user_id, event_type, CAST(value AS DOUBLE) AS value, 1 AS src_pri
  FROM events
), upd AS (
  SELECT event_id, user_id, 'corrected' AS event_type,
         CAST(value * 2 AS DOUBLE) AS value, 2 AS src_pri
  FROM events WHERE event_id % 10 = 0
), ins AS (
  SELECT event_id + 10000000 AS event_id, user_id, 'inserted' AS event_type,
         CAST(value AS DOUBLE) AS value, 2 AS src_pri
  FROM events WHERE event_id % 500 = 0
), merged AS (
  SELECT * FROM base UNION ALL SELECT * FROM upd UNION ALL SELECT * FROM ins
)
SELECT event_id, user_id, event_type, value,
       CASE WHEN src_pri = 2 THEN 'upserted' ELSE 'base' END AS merge_src
FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY event_id ORDER BY src_pri DESC) AS rn
  FROM merged
) WHERE rn = 1 ORDER BY event_id
"""


def q_salted_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact distinct-subject counts per hub key through the SALTED
    two-phase plan (kgforge.canon.salted_distinct_count): event_type is
    a handful of hub values aggregating the whole table — precisely the
    skew shape where a plain countDistinct funnels every row of a hot
    key through one reducer. The salt is hash(user_id) % 16 so partial
    distinct counts are disjoint and their SUM is exact; the oracle is
    the plain COUNT(DISTINCT) the plan must equal."""
    from kgforge.canon import salted_distinct_count

    ev = read_table(spark, "events", sf_dir)
    return (
        salted_distinct_count(ev, ["event_type"], "user_id", salts=16)
        .withColumnRenamed("n_distinct", "n_users")
        .orderBy("event_type")
    )


ORACLE_SALTED_STATS = """
SELECT event_type, COUNT(DISTINCT user_id) AS n_users, COUNT(*) AS n_rows
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_scd2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Slowly-changing-dimension type-2 versioning: each observation of
    a (user_id, event_type) attribute opens a version valid
    [valid_from, valid_to); the newest version is open-ended and flagged
    current. This is the temporal complement of rel_merge_upsert's
    latest-wins MERGE — instead of discarding superseded rows the table
    keeps the full version history (the reference keeps only RAW_*
    provenance of the latest value; a 100-TB KG wants the history,
    e.g. a page's re-crawled assertions over warc_ts).

    Plan: one window exchange on the (user_id, event_type) key computes
    lead/row_number together — versioning is a single shuffle, and the
    partition key has enough cardinality that no salting is needed (the
    skew case is rel_salted_stats' territory)."""
    from pyspark.sql import Window

    e = read_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    nxt = F.lead("ts").over(w)
    return e.select(
        "user_id",
        "event_type",
        F.row_number().over(w).cast("long").alias("version"),
        "event_id",
        "value",
        F.col("ts").alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    ).orderBy("user_id", "event_type", "version")


ORACLE_SCD2 = """
SELECT user_id, event_type,
       CAST(row_number() OVER w AS BIGINT) AS version,
       event_id, value,
       ts AS valid_from,
       lead(ts) OVER w AS valid_to,
       lead(ts) OVER w IS NULL AS is_current
FROM events
WINDOW w AS (PARTITION BY user_id, event_type ORDER BY ts, event_id)
ORDER BY user_id, event_type, version
"""


# ---------------------------------------------------------------------------
# Compound queries — melted multi-operator bundles
# ---------------------------------------------------------------------------
# The driver records at most ~50 CORRECTNESS rows per round; the full §2
# inventory is larger. Cheap operator families are therefore bundled:
# each compound runs the SAME q_* implementations as the standalone
# queries (still registered above for local verification and bench) and
# melts every result cell into one tall frame
#   (section, rk, ck, v_str, v_num)
# — section = the standalone query's name, rk = that row's key, ck = the
# column name, value in v_str (strings) or v_num (numerics; timestamps
# as epoch microseconds, exact in a double). The DuckDB oracle performs
# the identical melt over the standalone oracle SQL, so every original
# cell is still value-hash-compared: consolidation loses no fidelity.

_MELT_KINDS = ("s", "n", "t")


def _melt(df: DataFrame, section: str, key_cols: list[str], cells: list[tuple]) -> DataFrame:
    rk = (
        F.concat_ws("|", *[F.col(c).cast("string") for c in key_cols])
        if key_cols
        else F.lit("")  # single-row aggregate sections
    )
    structs = []
    for name, kind in cells:
        if kind == "s":
            vs, vn = F.col(name).cast("string"), F.lit(None).cast("double")
        elif kind == "n":
            vs, vn = F.lit(None).cast("string"), F.col(name).cast("double")
        elif kind == "t":
            # cast covers TIMESTAMP_NTZ parquet columns; session TZ is
            # pinned UTC so the instant equals DuckDB's epoch_us on the
            # same naive timestamp
            vs, vn = (
                F.lit(None).cast("string"),
                F.unix_micros(F.col(name).cast("timestamp")).cast("double"),
            )
        else:
            raise ValueError(f"unknown melt kind {kind!r}")
        structs.append(
            F.struct(F.lit(name).alias("ck"), vs.alias("v_str"), vn.alias("v_num"))
        )
    return df.select(
        F.lit(section).alias("section"),
        rk.alias("rk"),
        F.explode(F.array(*structs)).alias("c"),
    ).select("section", "rk", "c.ck", "c.v_str", "c.v_num")


def _melt_sql(section: str, base_sql: str, key_cols: list[str], cells: list[tuple]) -> str:
    rk = (
        "concat_ws('|', "
        + ", ".join(f'CAST("{c}" AS VARCHAR)' for c in key_cols)
        + ")"
        if key_cols
        else "''"
    )
    parts = []
    for name, kind in cells:
        if kind == "s":
            vs, vn = f'CAST("{name}" AS VARCHAR)', "CAST(NULL AS DOUBLE)"
        elif kind == "n":
            vs, vn = "CAST(NULL AS VARCHAR)", f'CAST("{name}" AS DOUBLE)'
        else:
            vs, vn = "CAST(NULL AS VARCHAR)", f'CAST(epoch_us("{name}") AS DOUBLE)'
        parts.append(
            f"SELECT '{section}' AS section, {rk} AS rk, '{name}' AS ck, "
            f"{vs} AS v_str, {vn} AS v_num FROM ({base_sql})"
        )
    return "\nUNION ALL\n".join(parts)


def _compound(spark: SparkSession, sf_dir: str, specs: list[tuple]) -> DataFrame:
    out = None
    for section, fn, flt, key_cols, cells in specs:
        df = fn(spark, sf_dir)
        if flt is not None:
            df = df.filter(flt)
        # materialize the melted section once (r06, ADVICE item): the
        # subhash union arm otherwise re-executes the section's whole
        # subtree — Spark has no CSE across union arms — roughly
        # doubling compound-bundle compute. Lazy checkpoint: computed on
        # first action, shared by both arms; melted rows are cell-sized.
        part = _melt(df, section, key_cols, cells).localCheckpoint(eager=False)
        part = part.unionByName(_section_subhash(part))
        out = part if out is None else out.unionByName(part)
    return out


# Per-section subhash (r4 VERDICT item 5): one extra melted row per
# section whose v_str is an order-insensitive fold-sum over every cell
# of that section, computed identically in both engines, so a red
# compound row localizes to a section without a local re-run. The fold
# is the engine-portable md5-first-12-hex-digits -> 48-bit BIGINT idiom
# (the one 64-bit-capable hash Spark and DuckDB share), reduced mod 2^36
# so a SUM over the largest melted section (~3M cells at sf0.1) stays
# far inside BIGINT under ANSI. v_num is rendered as
# floor(v).lpad(round((v-floor(v))*1e9)) built ONLY from IEEE double ops
# (floor/sub/mul) and BIGINT casts — every step is bit-identical across
# engines, unlike decimal casts (DuckDB's double->DECIMAL(38,9) scales
# by 1e9 in double and is inexact past 2^53, measured: 1.7e15 renders
# ...000.025165824 there) or raw double->VARCHAR (scientific-notation
# thresholds differ). NaN/±overflow branch to sentinels before any
# ANSI-throwing BIGINT cast.
_SUBHASH_MOD = 1 << 36


def _num_repr(cast_str: str) -> str:
    b = f"CAST(CAST(floor(v_num) AS BIGINT) AS {cast_str})"
    f9 = (
        f"lpad(CAST(CAST(floor((v_num - floor(v_num)) * 1e9 + 0.5) AS BIGINT) "
        f"AS {cast_str}), 10, '0')"
    )
    return (
        "CASE WHEN v_num IS NULL THEN 'ø' "
        "WHEN isnan(v_num) THEN 'nan' "
        "WHEN v_num >= 8.9e18 THEN 'big' "
        "WHEN v_num <= -8.9e18 THEN '-big' "
        f"ELSE concat({b}, '.', {f9}) END"
    )


_SUBHASH_ROW_REPR_SPARK = (
    f"concat_ws('|', rk, ck, coalesce(v_str, 'ø'), {_num_repr('STRING')})"
)
_SUBHASH_ROW_REPR_SQL = (
    f"concat_ws('|', rk, ck, COALESCE(v_str, 'ø'), {_num_repr('VARCHAR')})"
)


def _section_subhash(part: DataFrame) -> DataFrame:
    fold = F.expr(
        f"aggregate(sequence(1,12), CAST(0 AS BIGINT), (acc, p) -> "
        f"acc * 16 + CAST(instr('0123456789abcdef', "
        f"substr(md5({_SUBHASH_ROW_REPR_SPARK}), p, 1)) - 1 AS BIGINT))"
    )
    return (
        part.select("section", (fold % _SUBHASH_MOD).alias("fold"))
        .groupBy("section")
        .agg(F.sum("fold").alias("subsum"))
        .select(
            "section",
            F.lit("_subhash").alias("rk"),
            F.lit("_subhash").alias("ck"),
            F.col("subsum").cast("string").alias("v_str"),
            F.lit(None).cast("double").alias("v_num"),
        )
    )


def _section_subhash_sql(melted_sql: str) -> str:
    fold = (
        "list_sum(list_transform(range(1,13), p -> "
        f"(strpos('0123456789abcdef', substr(md5({_SUBHASH_ROW_REPR_SQL}), p, 1)) "
        "- 1)::BIGINT << (4*(12-p))))::BIGINT"
    )
    return (
        "SELECT section, '_subhash' AS rk, '_subhash' AS ck, "
        "CAST(CAST(SUM(fold) AS BIGINT) AS VARCHAR) AS v_str, "
        "CAST(NULL AS DOUBLE) AS v_num FROM ("
        f"SELECT section, ({fold}) % {_SUBHASH_MOD} AS fold "
        f"FROM ({melted_sql})"
        ") GROUP BY section"
    )


def _compound_sql(specs: list[tuple]) -> str:
    parts = []
    for section, base_sql, where, key_cols, cells in specs:
        base = f"SELECT * FROM ({base_sql}) WHERE {where}" if where else base_sql
        melted = _melt_sql(section, base, key_cols, cells)
        parts.append(melted)
        parts.append(_section_subhash_sql(melted))
    return "\nUNION ALL\n".join(parts)


# (section, spark filter / SQL where, key cols, cells) per bundled query.
# All sections run UNFILTERED since round 4: every row of every standalone
# query is melted through the driver compare (rel_scalars ≈ 290k cells at
# sf0.01 — a few MB, well within what both engines hash instantly). The
# filter slot is kept so a future section CAN be trimmed, but any trim
# must be documented in SURVEY §9.
_SCALAR_CELLS = {
    "rel_scheme_split": (
        None, ["c_custkey"],
        [("code", "s"), ("scheme", "s"), ("value", "s")],
    ),
    "rel_time_format": (
        None, ["event_id"],
        [("event_date", "s"), ("event_time", "s")],
    ),
    "rel_case_mapping": (
        None, ["event_id"],
        [("event_type", "s"), ("enc_type", "s")],
    ),
    "rel_format_lpad": (
        None, ["o_orderkey"],
        [("key_trunc", "s"), ("cust_code", "s"), ("prio_code", "s")],
    ),
    "rel_path_slice": (
        None, ["n_nationkey"],
        [("path", "s"), ("leaf", "s"), ("domain", "s"), ("fixed_slice", "s")],
    ),
    "rel_unit_convert": (
        None, ["l_orderkey", "l_linenumber"],
        [("qty", "n"), ("qty_lb", "n"), ("qty_in", "n")],
    ),
    "rel_value_guard": (
        None, ["event_id"],
        [("value_guarded", "n"), ("comparator", "s")],
    ),
}

_SETOP_CELLS = {
    "rel_union_all": (None, ["kind", "nationkey"], [("n", "n")]),
    "rel_except": (None, ["c_custkey"], [("c_custkey", "n")]),
    "rel_intersect": (None, ["nationkey"], [("nationkey", "n")]),
    "rel_union_distinct": (None, ["nationkey"], [("nationkey", "n")]),
    "rel_distinct_limit": (None, ["o_custkey"], [("o_custkey", "n")]),
}

_WINDOW_CELLS = {
    "rel_dedup_rank": (
        None, ["o_custkey"],
        [("o_orderkey", "n"), ("o_orderdate", "t"), ("o_totalprice", "n")],
    ),
    "rel_ntile_cohort": (
        None, ["c_custkey"],
        [("c_mktsegment", "s"), ("n_facts", "n"), ("pct", "n")],
    ),
    "rel_topk_per_group": (
        None, ["o_orderpriority", "rnk"],
        [("o_orderkey", "n"), ("o_totalprice", "n")],
    ),
    "rel_topk_freshness": (None, [], [("n", "n"), ("avg_epoch", "n")]),
    "rel_scd2": (
        None, ["user_id", "event_type", "version"],
        [("event_id", "n"), ("value", "n"), ("valid_from", "t"),
         ("valid_to", "t"), ("is_current", "s")],
    ),
}

_PIVOT_CELLS = {
    "rel_modifier_pivot": (
        None, ["user_id"],
        [("n_click", "n"), ("n_view", "n"), ("n_purchase", "n"), ("n_error", "n")],
    ),
    "rel_eav_pivot_max": (
        None, ["user_id"],
        [("max_click_value", "n"), ("max_purchase_value", "n"), ("max_view_value", "n")],
    ),
}

_SCAN_PARSE_CELLS = {
    "rel_filtered_scan": (
        None, ["o_orderkey"], [("o_custkey", "n"), ("o_orderdate", "t")]
    ),
    "rel_csv_parse": (None, ["n_nationkey", "pos"], [("code", "s")]),
    "rel_json_qualifier": (None, ["event_id"], [("k_val", "n")]),
}

_AGG_STATS_CELLS = {
    "rel_median": (None, ["l_returnflag"], [("median_qty", "n"), ("p90_qty", "n")]),
    # ROLLUP NULL keys: concat_ws skips NULLs identically in Spark and
    # DuckDB, and ROLLUP only NULLs key suffixes, so rk stays collision-
    # free ('' = grand total, 'AFRICA' = region subtotal)
    "rel_rollup": (
        None, ["r_name", "n_name"],
        [("n_customers", "n"), ("total_balance", "n")],
    ),
    # CUBE can NULL either key, but the two domains are disjoint
    # (status codes vs '1-URGENT'-style priorities), so the melted key
    # stays collision-free ('' = grand total, 'F' = status subtotal,
    # '1-URGENT' = priority subtotal)
    "rel_cube": (
        None, ["o_orderstatus", "o_orderpriority"],
        [("n_orders", "n"), ("total_price", "n")],
    ),
    # explicit sets: the GROUPING() flag columns disambiguate rows even
    # if a key domain ever contained NULLs, so the melted key adds them
    "rel_grouping_sets": (
        None, ["o_orderstatus", "o_orderpriority", "g_status", "g_prio"],
        [("n_orders", "n"), ("total_price", "n")],
    ),
    "rel_breakdown_pct": (None, ["o_orderstatus"], [("cnt", "n"), ("pct", "n")]),
    "rel_reconciliation_counts": (
        None, ["tbl"], [("n_rows", "n"), ("n_subjects", "n")]
    ),
    "rel_group_minmax_impute": (
        None, ["user_id", "event_type"],
        [("first_event_id", "n"), ("onset_ts", "t"), ("latest_ts", "t"),
         ("resolve_status", "s")],
    ),
}

_SEMI_ANTI_CELLS = {
    "rel_semi_join": (
        None, ["c_custkey"], [("c_name", "s"), ("c_mktsegment", "s")]
    ),
    "rel_anti_join": (None, ["c_custkey"], [("c_name", "s")]),
    "rel_range_join": (
        None, ["event_id", "promo_id"],
        [("event_type", "s"), ("value", "n"), ("hours_in", "n")],
    ),
}


def _compound_sqlless(spark: SparkSession, sf_dir: str, cells_by_section: dict) -> DataFrame:
    specs = [
        (sec, QUERIES[sec], flt, keys, cells)
        for sec, (flt, keys, cells) in cells_by_section.items()
    ]
    return _compound(spark, sf_dir, specs)


def _make_compound_sql(cells_by_section: dict) -> str:
    return _compound_sql(
        [
            (sec, ORACLES[sec], flt, keys, cells)
            for sec, (flt, keys, cells) in cells_by_section.items()
        ]
    )


def q_scalars(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound §2.7 scalar bundle: scheme split, time-of-day format,
    case-mapping decision table, numeric format/lpad, path slice + leaf,
    unit-conversion constants, value-domain guard — the standalone
    queries melted into one oracle-checked frame (see module note)."""
    return _compound_sqlless(spark, sf_dir, _SCALAR_CELLS)


def q_setops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound §2.6 set-op bundle: union-all, except, intersect,
    union-distinct, distinct+limit."""
    return _compound_sqlless(spark, sf_dir, _SETOP_CELLS)


def q_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound §2.5 window bundle: dedup-by-preference rank, ntile
    cohort filter, top-k per group, top-k freshness aggregate."""
    return _compound_sqlless(spark, sf_dir, _WINDOW_CELLS)


def q_pivots(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound pivot bundle: one-pass modifier re-attach pivot and the
    EAV->wide pivot-by-max."""
    return _compound_sqlless(spark, sf_dir, _PIVOT_CELLS)


def q_scan_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound scan/parse bundle: pushdown-filtered scan, quoted-CSV
    regexp parse, JSON qualifier extraction."""
    return _compound_sqlless(spark, sf_dir, _SCAN_PARSE_CELLS)


def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound aggregation bundle: exact percentiles, ROLLUP hierarchy
    totals, breakdown percentage, reconciliation counts, group min/max
    + imputation."""
    return _compound_sqlless(spark, sf_dir, _AGG_STATS_CELLS)


def q_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound join-predicate bundle: IN-subquery decorrelation,
    NOT-IN codelist exclusion, and the binned temporal range join."""
    return _compound_sqlless(spark, sf_dir, _SEMI_ANTI_CELLS)


QUERIES = {
    "rel_merge_upsert": q_merge_upsert,
    "rel_salted_stats": q_salted_stats,
    "rel_rollup": q_rollup,
    "rel_cube": q_cube,
    "rel_grouping_sets": q_grouping_sets,
    "rel_unit_convert": q_unit_convert,
    "rel_format_lpad": q_format_lpad,
    "rel_path_slice": q_path_slice,
    "rel_composite_key_scope": q_composite_key_scope,
    "rel_loyalty_override": q_loyalty_override,
    "rel_union_all": q_union_all,
    "rel_except": q_except,
    "rel_intersect": q_intersect,
    "rel_median": q_median,
    "rel_pricing_summary": q_pricing_summary,
    "rel_group_minmax_impute": q_group_minmax_impute,
    "rel_breakdown_pct": q_breakdown_pct,
    "rel_reconciliation_counts": q_reconciliation_counts,
    "rel_broadcast_linker": q_broadcast_linker,
    "rel_semi_join": q_semi_join,
    "rel_anti_join": q_anti_join,
    "rel_theta_containment": q_theta_containment,
    "rel_range_join": q_range_join,
    "rel_values_seed_join": q_values_seed_join,
    "rel_modifier_pivot": q_modifier_pivot,
    "rel_eav_pivot_max": q_eav_pivot_max,
    "rel_dedup_rank": q_dedup_rank,
    "rel_ntile_cohort": q_ntile_cohort,
    "rel_topk_freshness": q_topk_freshness,
    "rel_topk_per_group": q_topk_per_group,
    "rel_filtered_scan": q_filtered_scan,
    "rel_distinct_limit": q_distinct_limit,
    "rel_union_distinct": q_union_distinct,
    "rel_scheme_split": q_scheme_split,
    "rel_time_format": q_time_format,
    "rel_case_mapping": q_case_mapping,
    "rel_csv_parse": q_csv_parse,
    "rel_json_qualifier": q_json_qualifier,
    "rel_value_guard": q_value_guard,
    "rel_hierarchy_propagation": q_hierarchy_propagation,
    "rel_scd2": q_scd2,
}

ORACLES = {
    "rel_merge_upsert": ORACLE_MERGE_UPSERT,
    "rel_salted_stats": ORACLE_SALTED_STATS,
    "rel_rollup": ORACLE_ROLLUP,
    "rel_cube": ORACLE_CUBE,
    "rel_grouping_sets": ORACLE_GROUPING_SETS,
    "rel_unit_convert": ORACLE_UNIT_CONVERT,
    "rel_format_lpad": ORACLE_FORMAT_LPAD,
    "rel_path_slice": ORACLE_PATH_SLICE,
    "rel_composite_key_scope": ORACLE_COMPOSITE_KEY_SCOPE,
    "rel_loyalty_override": ORACLE_LOYALTY_OVERRIDE,
    "rel_union_all": ORACLE_UNION_ALL,
    "rel_except": ORACLE_EXCEPT,
    "rel_intersect": ORACLE_INTERSECT,
    "rel_median": ORACLE_MEDIAN,
    "rel_pricing_summary": ORACLE_PRICING_SUMMARY,
    "rel_group_minmax_impute": ORACLE_GROUP_MINMAX_IMPUTE,
    "rel_breakdown_pct": ORACLE_BREAKDOWN_PCT,
    "rel_reconciliation_counts": ORACLE_RECONCILIATION_COUNTS,
    "rel_broadcast_linker": ORACLE_BROADCAST_LINKER,
    "rel_semi_join": ORACLE_SEMI_JOIN,
    "rel_anti_join": ORACLE_ANTI_JOIN,
    "rel_theta_containment": ORACLE_THETA_CONTAINMENT,
    "rel_range_join": ORACLE_RANGE_JOIN,
    "rel_values_seed_join": ORACLE_VALUES_SEED_JOIN,
    "rel_modifier_pivot": ORACLE_MODIFIER_PIVOT,
    "rel_eav_pivot_max": ORACLE_EAV_PIVOT_MAX,
    "rel_dedup_rank": ORACLE_DEDUP_RANK,
    "rel_ntile_cohort": ORACLE_NTILE_COHORT,
    "rel_topk_freshness": ORACLE_TOPK_FRESHNESS,
    "rel_topk_per_group": ORACLE_TOPK_PER_GROUP,
    "rel_filtered_scan": ORACLE_FILTERED_SCAN,
    "rel_distinct_limit": ORACLE_DISTINCT_LIMIT,
    "rel_union_distinct": ORACLE_UNION_DISTINCT,
    "rel_scheme_split": ORACLE_SCHEME_SPLIT,
    "rel_time_format": ORACLE_TIME_FORMAT,
    "rel_case_mapping": ORACLE_CASE_MAPPING,
    "rel_csv_parse": ORACLE_CSV_PARSE,
    "rel_json_qualifier": ORACLE_JSON_QUALIFIER,
    "rel_value_guard": ORACLE_VALUE_GUARD,
    "rel_hierarchy_propagation": ORACLE_HIERARCHY_PROPAGATION,
    "rel_scd2": ORACLE_SCD2,
}

# compound bundles — built from the standalone entries above, so they
# must be registered after both dicts exist
_COMPOUNDS = {
    "rel_scalars": (q_scalars, _SCALAR_CELLS),
    "rel_setops": (q_setops, _SETOP_CELLS),
    "rel_windows": (q_windows, _WINDOW_CELLS),
    "rel_pivots": (q_pivots, _PIVOT_CELLS),
    "rel_scan_parse": (q_scan_parse, _SCAN_PARSE_CELLS),
    "rel_agg_stats": (q_agg_stats, _AGG_STATS_CELLS),
    "rel_semi_anti": (q_semi_anti, _SEMI_ANTI_CELLS),
}
for _name, (_fn, _cells) in _COMPOUNDS.items():
    QUERIES[_name] = _fn
    ORACLES[_name] = _make_compound_sql(_cells)

# the driver registry is capped at ~50 recorded rows; these are the
# rel_* names __spark_entry__ registers — standalone operators that are
# not covered by a compound bundle, plus the bundles themselves. The
# remaining standalone entries in QUERIES stay for bench.py,
# tools/verify_local.py and the pytest suite.
DRIVER_REL_QUERIES = [
    "rel_pricing_summary",
    "rel_hierarchy_propagation",
    "rel_broadcast_linker",
    "rel_theta_containment",
    "rel_values_seed_join",
    "rel_composite_key_scope",
    "rel_loyalty_override",
    "rel_merge_upsert",
    "rel_salted_stats",
    "rel_scalars",
    "rel_setops",
    "rel_windows",
    "rel_pivots",
    "rel_scan_parse",
    "rel_agg_stats",
    "rel_semi_anti",
]
