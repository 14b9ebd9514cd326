"""Wave 14: time-series smoothing (EWMA), hour-of-week seasonality, and
RFM customer segmentation — the remaining product-analytics staples.

EWMA is recursive (y_t = αx_t + (1-α)y_{t-1}), which neither engine's
aggregate set expresses directly; both sides use the same closed form
over an ordered running sum (u_i = x_i(1-α)^{-i}), valid because the
series is ≤ ~30 steps so (1-α)^{-t} stays ≪ 1/ε_double — documented
precision bound, not an accident."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from youtube_etl_project_spark.registry import cnt, register
from youtube_etl_project_spark.sources import load_table

_ALPHA = 0.25


@register(
    "events_ewma_daily",
    oracle=f"""
        WITH daily AS (
            SELECT event_type, CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS DOUBLE) AS x
            FROM events GROUP BY 1, 2
        ), numbered AS (
            SELECT event_type, day, x,
                   ROW_NUMBER() OVER w AS t,
                   FIRST_VALUE(x) OVER w AS x1
            FROM daily
            WINDOW w AS (PARTITION BY event_type ORDER BY day)
        ), idx AS (
            SELECT event_type, day, x, t, x1,
                   SUM(x * power(1 - {_ALPHA}, -t))
                       OVER (PARTITION BY event_type ORDER BY day
                             ROWS UNBOUNDED PRECEDING) AS c
            FROM numbered
        )
        SELECT event_type, day,
               CAST(x AS BIGINT) AS n_events,
               ROUND(CASE WHEN t = 1 THEN x
                          ELSE {_ALPHA} * power(1 - {_ALPHA}, t)
                               * (c - x1 / (1 - {_ALPHA}))
                               + power(1 - {_ALPHA}, t - 1) * x1
                     END, 6) AS ewma
        FROM idx
    """,
    doc="Per-type EWMA of daily volume (α=0.25, y_1=x_1) — the smoothed "
        "trend line dashboards plot next to raw counts. The recursion is "
        "rewritten as one ordered running sum of x_i(1-α)^{-i} (running "
        "sums evaluate in window order on both engines, so the doubles "
        "are bit-identical before the final 6-dp round). Numerically "
        "bounded: (1-α)^{-t} ≈ 4e3 at t=30, far from the 1e16 double "
        "cliff; for unbounded series, chunk by (1-α)^{-t} range. One "
        "shuffle on event_type feeds index, running sum, and first-value",
)
def events_ewma_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("double").alias("x")
    )
    w = Window.partitionBy("event_type").orderBy("day")
    wrun = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    a = _ALPHA
    idx = daily.select(
        "event_type",
        "day",
        "x",
        F.row_number().over(w).alias("t"),
        F.sum(
            F.col("x") * F.pow(F.lit(1 - a), -F.row_number().over(w))
        ).over(wrun).alias("c"),
        F.first("x").over(w).alias("x1"),
    )
    ewma = F.when(F.col("t") == 1, F.col("x")).otherwise(
        a
        * F.pow(F.lit(1 - a), F.col("t"))
        * (F.col("c") - F.col("x1") / (1 - a))
        + F.pow(F.lit(1 - a), F.col("t") - 1) * F.col("x1")
    )
    return idx.select(
        "event_type",
        "day",
        F.col("x").cast("long").alias("n_events"),
        F.round(ewma, 6).alias("ewma"),
    )


@register(
    "events_hourly_seasonality",
    oracle="""
        WITH cells AS (
            SELECT isodow(ts) - 1 AS dow, date_part('hour', ts) AS hour,
                   COUNT(*) AS n,
                   COUNT(DISTINCT CAST(ts AS DATE)) AS n_days
            FROM events GROUP BY 1, 2
        )
        SELECT dow, hour,
               CAST(n AS BIGINT) AS n_events,
               ROUND(CAST(n AS DOUBLE) / n_days, 6) AS per_day
        FROM cells
    """,
    doc="Hour-of-week seasonality surface: volume per (weekday, hour) "
        "cell, normalized by how many distinct dates fed the cell so "
        "partial weeks don't bias the profile. Weekday aligned across "
        "engines as Monday=0 (Spark weekday == DuckDB isodow-1). Single "
        "shuffle into 168 cells — the aggregate any 100 TB scan reduces "
        "to trivially",
)
def events_hourly_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.weekday("ts").cast("long").alias("dow"),
            F.hour("ts").cast("long").alias("hour"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.countDistinct(F.to_date("ts")).alias("n_days"),
        )
        .select(
            "dow",
            "hour",
            F.col("n").cast("long").alias("n_events"),
            F.round(F.col("n").cast("double") / F.col("n_days"), 6).alias(
                "per_day"
            ),
        )
    )


@register(
    "orders_rfm_segments",
    oracle="""
        WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS md FROM orders),
        rfm AS (
            SELECT o_custkey,
                   date_diff('day', MAX(CAST(o_orderdate AS DATE)),
                             MIN(mx.md)) AS recency,
                   COUNT(*) AS frequency,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS monetary
            FROM orders CROSS JOIN mx
            GROUP BY o_custkey
        ), tiles AS (
            SELECT o_custkey, monetary,
                   NTILE(4) OVER (ORDER BY recency ASC, o_custkey)
                       AS r_tile,
                   NTILE(4) OVER (ORDER BY frequency DESC, o_custkey)
                       AS f_tile,
                   NTILE(4) OVER (ORDER BY monetary DESC, o_custkey)
                       AS m_tile
            FROM rfm
        )
        SELECT r_tile, f_tile, m_tile,
               CAST(COUNT(*) AS BIGINT) AS n_customers,
               ROUND(CAST(SUM(monetary) AS DOUBLE) / COUNT(*), 4)
                   AS avg_monetary
        FROM tiles
        GROUP BY 1, 2, 3
    """,
    doc="RFM segmentation: per-customer recency/frequency/monetary, "
        "quartiled with NTILE fill-rule semantics and explicit custkey "
        "tiebreaks — identical bucketing on both engines — rolled up to "
        "the 64-segment grid. Monetary sums in the decimal domain. All "
        "THREE quartile assignments ride ONE fused ranking pass "
        "(operators/ranking.exact_ntile_multi: melt to 3n tagged rows, "
        "one range shuffle with the measure index as leading key, "
        "per-partition offsets, partition-local row_number) — "
        "bit-identical to the three NTILE windows the oracle uses, with "
        "no single-partition WindowExec and a third of the shuffles/"
        "pins/collects the per-measure form paid. DESC orders melt as "
        "exact decimal negations",
)
def orders_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    from youtube_etl_project_spark.operators.checkpointing import pin
    from youtube_etl_project_spark.operators.ranking import exact_ntile_multi

    orders = load_table(spark, sf_dir, "orders")
    mx = orders.agg(F.max(F.to_date("o_orderdate")).alias("md"))
    rfm = pin(  # referenced by all three melt branches + the join-back
        orders.crossJoin(F.broadcast(mx))
        .groupBy("o_custkey")
        .agg(
            F.datediff(F.min("md"), F.max(F.to_date("o_orderdate"))).alias(
                "recency"
            ),
            F.count(F.lit(1)).alias("frequency"),
            F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias(
                "monetary"
            ),
        )
    )
    # one melted slot per measure: ascending-sortable, union-compatible
    # decimals (negation + widening are exact — ties and order match the
    # oracle's ASC/DESC NTILE specs bit-for-bit)
    sortable = "decimal(38,6)"
    tiles = exact_ntile_multi(
        rfm,
        4,
        ["o_custkey"],
        [
            ("r_tile", [F.col("recency").cast(sortable), F.col("o_custkey")]),
            ("f_tile", [(-F.col("frequency")).cast(sortable), F.col("o_custkey")]),
            ("m_tile", [(-F.col("monetary")).cast(sortable), F.col("o_custkey")]),
        ],
    )
    return (
        rfm.select("o_custkey", "monetary")
        .join(tiles, "o_custkey")
        .groupBy("r_tile", "f_tile", "m_tile")
        .agg(
            cnt("n_customers"),
            F.round(
                F.sum("monetary").cast("double") / F.count(F.lit(1)), 4
            ).alias("avg_monetary"),
        )
    )


@register(
    "events_ab_ttest",
    oracle="""
        WITH g AS (
            SELECT event_type, user_id % 2 AS variant,
                   CAST(COUNT(value) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(value AS DECIMAL(28,10))
                            * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS s2
            FROM events GROUP BY 1, 2
        ), v AS (
            SELECT event_type, variant, n, s1 / n AS mean,
                   GREATEST(s2 - s1 * s1 / n, 0) / (n - 1) AS var
            FROM g WHERE n >= 2
        ), ab AS (
            SELECT a.event_type,
                   a.n AS n_a, b.n AS n_b,
                   a.mean AS mean_a, b.mean AS mean_b,
                   a.var / a.n + b.var / b.n AS se2,
                   a.var / a.n AS ra, b.var / b.n AS rb,
                   a.n AS na, b.n AS nb
            FROM v a JOIN v b
              ON a.event_type = b.event_type
             AND a.variant = 0 AND b.variant = 1
        )
        SELECT event_type, n_a, n_b,
               ROUND(mean_a, 6) AS mean_a,
               ROUND(mean_b, 6) AS mean_b,
               CASE WHEN se2 > 0
                    THEN ROUND((mean_a - mean_b) / sqrt(se2), 6) END
                   AS t_stat,
               CASE WHEN ra + rb > 0 AND (ra > 0 OR rb > 0)
                    THEN ROUND((ra + rb) * (ra + rb)
                               / (ra * ra / (na - 1) + rb * rb / (nb - 1)),
                               4) END AS welch_df
        FROM ab
    """,
    doc="Experimentation staple: Welch's unequal-variance t-test per "
        "event_type between two deterministic variants (user_id parity — "
        "the hash-bucket assignment every A/B platform uses). Means and "
        "variances come from decimal-exact S1/S2 partial sums (the "
        "zscore_by_type rule: never STDDEV built-ins, their accumulation "
        "order differs between engines), so the t statistic and "
        "Welch-Satterthwaite df are a handful of correctly-rounded "
        "double ops on identical inputs. One shuffle on (type, variant); "
        "the 2×|types| stat table then self-joins broadcast-sized",
)
def events_ab_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d6 = F.col("value").cast("decimal(18,6)")
    d10 = F.col("value").cast("decimal(28,10)")
    g = (
        ev.groupBy("event_type", (F.col("user_id") % 2).alias("variant"))
        .agg(
            F.count("value").cast("long").alias("n"),
            F.sum(d6).cast("double").alias("s1"),
            F.sum(d10 * d10).cast("double").alias("s2"),
        )
        .filter(F.col("n") >= 2)
        .withColumn("mean", F.col("s1") / F.col("n"))
        .withColumn(
            "var",
            F.greatest(
                F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"),
                F.lit(0.0),
            )
            / (F.col("n") - 1),
        )
    )
    a = g.filter("variant = 0").select(
        "event_type",
        F.col("n").alias("n_a"),
        F.col("mean").alias("mean_a"),
        F.col("var").alias("var_a"),
    )
    b = g.filter("variant = 1").select(
        "event_type",
        F.col("n").alias("n_b"),
        F.col("mean").alias("mean_b"),
        F.col("var").alias("var_b"),
    )
    ra = F.col("var_a") / F.col("n_a")
    rb = F.col("var_b") / F.col("n_b")
    se2 = ra + rb
    t = F.when(se2 > 0, (F.col("mean_a") - F.col("mean_b")) / F.sqrt(se2))
    df_ = F.when(
        se2 > 0,
        se2 * se2
        / (ra * ra / (F.col("n_a") - 1) + rb * rb / (F.col("n_b") - 1)),
    )
    return a.join(b, "event_type").select(
        "event_type",
        "n_a",
        "n_b",
        F.round("mean_a", 6).alias("mean_a"),
        F.round("mean_b", 6).alias("mean_b"),
        F.round(t, 6).alias("t_stat"),
        F.round(df_, 4).alias("welch_df"),
    )


@register(
    "events_ab_chi2",
    oracle="""
        WITH cells AS (
            SELECT event_type, user_id % 2 AS variant,
                   CAST(COUNT(*) AS BIGINT) AS o
            FROM events GROUP BY 1, 2
        ), rows_ AS (
            SELECT event_type, CAST(SUM(o) AS BIGINT) AS rt
            FROM cells GROUP BY 1
        ), cols_ AS (
            SELECT variant, CAST(SUM(o) AS BIGINT) AS ct
            FROM cells GROUP BY 1
        ), tot AS (
            SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells
        ), contrib AS (
            SELECT c.o,
                   CAST(r.rt AS DOUBLE) * ct / n AS e
            FROM cells c
            JOIN rows_ r USING (event_type)
            JOIN cols_ USING (variant)
            CROSS JOIN tot
        ), k AS (
            SELECT COUNT(DISTINCT event_type) AS kr,
                   COUNT(DISTINCT variant) AS kc
            FROM cells
        )
        SELECT SUM(CAST(FLOOR((o - e) * (o - e) / e * 1e9 + 0.5)
                        AS BIGINT)) / 1e9 AS chi2_stat,
               CAST((SELECT (kr - 1) * (kc - 1) FROM k) AS BIGINT) AS dof,
               (SELECT n FROM tot) AS n
        FROM contrib
    """,
    doc="Chi-square test of independence over the event_type × variant "
        "contingency table (variant = user-id parity, as in "
        "events_ab_ttest): does traffic mix differ between arms — the "
        "sample-ratio-mismatch guard every experiment needs before "
        "reading its metrics. Observed counts are exact bigints; each "
        "expected count is one double expression from bigint totals, so "
        "the statistic is deterministic across engines. The contingency "
        "table is |types|×2 — the heavy work is one count shuffle",
)
def events_ab_chi2(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cells = (
        ev.groupBy("event_type", (F.col("user_id") % 2).alias("variant"))
        .agg(F.count(F.lit(1)).cast("long").alias("o"))
    )
    wr = Window.partitionBy("event_type")
    wc = Window.partitionBy("variant")
    wt = Window.partitionBy()
    with_e = cells.select(
        "event_type",
        "variant",
        "o",
        (
            F.sum("o").over(wr).cast("double")
            * F.sum("o").over(wc)
            / F.sum("o").over(wt)
        ).alias("e"),
        F.sum("o").over(wt).cast("long").alias("n"),
    )
    kr = F.size(F.collect_set("event_type"))
    kc = F.size(F.collect_set("variant"))
    # each cell's contribution snaps to a 1e-9 grid before the sum:
    # bigint addition is associative, so partial-aggregation order can't
    # perturb the statistic (double SUM order differs between engines)
    contrib = F.floor(
        (F.col("o") - F.col("e"))
        * (F.col("o") - F.col("e"))
        / F.col("e")
        * F.lit(1e9)
        + F.lit(0.5)
    ).cast("long")
    return with_e.agg(
        (F.sum(contrib) / F.lit(1e9)).alias("chi2_stat"),
        ((kr - 1) * (kc - 1)).cast("long").alias("dof"),
        F.max("n").alias("n"),
    )


_CUPED_ORACLE = """
    WITH bounds AS (
        SELECT MIN(CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT)) AS d0,
               MAX(CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT)) AS d1
        FROM events
    ), mid AS (
        SELECT CAST(FLOOR(d0 + 0.5 * (d1 - d0)) AS BIGINT) AS t FROM bounds
    ), per_user AS (
        SELECT user_id, user_id % 2 AS variant,
               CAST(COALESCE(SUM(CASE
                    WHEN CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT) < t
                    THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE)
                   AS x,
               CAST(COALESCE(SUM(CASE
                    WHEN CAST(FLOOR(epoch_ms(ts) / 86400000) AS BIGINT) >= t
                    THEN CAST(value AS DECIMAL(18,6)) END), 0) AS DOUBLE)
                   AS y
        FROM events, mid
        GROUP BY 1, 2
    ), snapped AS (
        SELECT variant,
               CAST(FLOOR(x * 1e6 + 0.5) AS BIGINT) AS x6,
               CAST(FLOOR(y * 1e6 + 0.5) AS BIGINT) AS y6,
               CAST(FLOOR(x * x * 1e6 + 0.5) AS BIGINT) AS xx6,
               CAST(FLOOR(x * y * 1e6 + 0.5) AS BIGINT) AS xy6,
               CAST(FLOOR(y * y * 1e6 + 0.5) AS BIGINT) AS yy6
        FROM per_user
    ), gstats AS (
        SELECT CAST(COUNT(*) AS BIGINT) AS n,
               CAST(SUM(x6) AS BIGINT) AS sx, CAST(SUM(y6) AS BIGINT) AS sy,
               CAST(SUM(xx6) AS BIGINT) AS sxx,
               CAST(SUM(xy6) AS BIGINT) AS sxy,
               CAST(SUM(yy6) AS BIGINT) AS syy
        FROM snapped
    ), model AS (
        SELECT n,
               sx / 1e6 / n AS mean_x,
               (sxy / 1e6 - (sx / 1e6) * (sy / 1e6) / n)
                   / NULLIF(sxx / 1e6 - (sx / 1e6) * (sx / 1e6) / n, 0)
                   AS theta,
               sxx / 1e6 - (sx / 1e6) * (sx / 1e6) / n AS cxx,
               sxy / 1e6 - (sx / 1e6) * (sy / 1e6) / n AS cxy,
               syy / 1e6 - (sy / 1e6) * (sy / 1e6) / n AS cyy
        FROM gstats
    ), pv AS (
        SELECT variant, CAST(COUNT(*) AS BIGINT) AS n_users,
               CAST(SUM(x6) AS BIGINT) / 1e6 AS vx,
               CAST(SUM(y6) AS BIGINT) / 1e6 AS vy
        FROM snapped GROUP BY 1
    )
    SELECT variant, n_users,
           FLOOR(vy / n_users * 1e6 + 0.5) / 1e6 AS mean_y,
           FLOOR((vy / n_users
                  - theta * (vx / n_users - mean_x)) * 1e6 + 0.5) / 1e6
               AS mean_y_cuped,
           FLOOR(theta * 1e6 + 0.5) / 1e6 AS theta,
           FLOOR((1 - (cyy - 2 * theta * cxy + theta * theta * cxx)
                      / NULLIF(cyy, 0)) * 1e6 + 0.5) / 1e6
               AS var_reduction
    FROM pv CROSS JOIN model
"""


@register(
    "events_ab_cuped",
    oracle=_CUPED_ORACLE,
    doc="CUPED variance reduction (Deng et al. 2013, the industry-standard "
        "experiment sensitivity boost): per-user pre-period spend (first "
        "half of the time range) is the covariate X, post-period spend is "
        "the metric Y; theta = cov(X,Y)/var(X) fitted once globally, "
        "adjusted means reported per variant with the achieved variance "
        "reduction. Per-user sums are decimal-exact; every cross-user "
        "moment snaps to a 1e-6 integer grid before summing, so the "
        "partial-aggregation order can't move theta. Two shuffles total "
        "(user rollup, variant rollup); the model is a scalar",
)
def events_ab_cuped(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    day = (F.unix_timestamp("ts") / F.lit(86400)).cast("long")
    bounds = ev.agg(F.min(day).alias("d0"), F.max(day).alias("d1"))
    mid = bounds.select(
        F.floor(F.col("d0") + 0.5 * (F.col("d1") - F.col("d0")))
        .cast("long")
        .alias("t")
    )
    d6 = F.col("value").cast("decimal(18,6)")
    per_user = (
        ev.join(F.broadcast(mid))
        .withColumn("__day", day)
        .groupBy("user_id", (F.col("user_id") % 2).alias("variant"))
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("__day") < F.col("t"), d6)), F.lit(0)
            )
            .cast("double")
            .alias("x"),
            F.coalesce(
                F.sum(F.when(F.col("__day") >= F.col("t"), d6)), F.lit(0)
            )
            .cast("double")
            .alias("y"),
        )
    )

    def snap(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)).cast("long")

    snapped = per_user.select(
        "variant",
        snap(F.col("x")).alias("x6"),
        snap(F.col("y")).alias("y6"),
        snap(F.col("x") * F.col("x")).alias("xx6"),
        snap(F.col("x") * F.col("y")).alias("xy6"),
        snap(F.col("y") * F.col("y")).alias("yy6"),
    )
    glob = snapped.agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        *[F.sum(c).cast("long").alias("s" + c) for c in
          ("x6", "y6", "xx6", "xy6", "yy6")],
    )
    mean_x = F.col("sx6") / 1e6 / F.col("n")
    cxx = F.col("sxx6") / 1e6 - (F.col("sx6") / 1e6) * (F.col("sx6") / 1e6) / F.col("n")
    cxy = F.col("sxy6") / 1e6 - (F.col("sx6") / 1e6) * (F.col("sy6") / 1e6) / F.col("n")
    cyy = F.col("syy6") / 1e6 - (F.col("sy6") / 1e6) * (F.col("sy6") / 1e6) / F.col("n")
    model = glob.select(
        mean_x.alias("mean_x"),
        (cxy / F.when(cxx != 0, cxx)).alias("theta"),
        cxx.alias("cxx"), cxy.alias("cxy"), cyy.alias("cyy"),
    )
    pv = snapped.groupBy("variant").agg(
        F.count(F.lit(1)).cast("long").alias("n_users"),
        (F.sum("x6").cast("long") / F.lit(1e6)).alias("vx"),
        (F.sum("y6").cast("long") / F.lit(1e6)).alias("vy"),
    )

    def grid6(c):
        return F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)

    return pv.join(F.broadcast(model)).select(
        "variant",
        "n_users",
        grid6(F.col("vy") / F.col("n_users")).alias("mean_y"),
        grid6(
            F.col("vy") / F.col("n_users")
            - F.col("theta") * (F.col("vx") / F.col("n_users") - F.col("mean_x"))
        ).alias("mean_y_cuped"),
        grid6(F.col("theta")).alias("theta"),
        grid6(
            F.lit(1)
            - (
                F.col("cyy")
                - 2 * F.col("theta") * F.col("cxy")
                + F.col("theta") * F.col("theta") * F.col("cxx")
            )
            / F.when(F.col("cyy") != 0, F.col("cyy"))
        ).alias("var_reduction"),
    )


_ATTRIB_ORACLE = """
    WITH ev AS (
        SELECT user_id, event_type, value,
               CAST(epoch_us(ts) AS BIGINT) AS us,
               event_id
        FROM events
    ), touched AS (
        SELECT user_id, event_type, value, us, event_id,
               LAST_VALUE(CASE WHEN event_type <> 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER w AS last_touch,
               FIRST_VALUE(CASE WHEN event_type <> 'purchase'
                                THEN event_type END IGNORE NULLS)
                   OVER w AS first_touch
        FROM ev
        WINDOW w AS (PARTITION BY user_id ORDER BY us
                     RANGE BETWEEN 86400000000 PRECEDING AND 1 PRECEDING)
    ), credit AS (
        SELECT * FROM touched WHERE event_type = 'purchase'
    ), lt AS (
        SELECT last_touch AS touch_type,
               CAST(COUNT(*) AS BIGINT) AS n_last,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS value_last
        FROM credit WHERE last_touch IS NOT NULL GROUP BY 1
    ), ft AS (
        SELECT first_touch AS touch_type,
               CAST(COUNT(*) AS BIGINT) AS n_first,
               CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   AS value_first
        FROM credit WHERE first_touch IS NOT NULL GROUP BY 1
    )
    SELECT COALESCE(lt.touch_type, ft.touch_type) AS touch_type,
           COALESCE(n_last, 0) AS n_last,
           COALESCE(ROUND(value_last, 6), 0) AS value_last,
           COALESCE(n_first, 0) AS n_first,
           COALESCE(ROUND(value_first, 6), 0) AS value_first
    FROM lt FULL OUTER JOIN ft ON lt.touch_type = ft.touch_type
"""


@register(
    "events_touch_attribution",
    oracle=_ATTRIB_ORACLE,
    doc="Marketing attribution: each purchase credits its value to the "
        "LAST and FIRST non-purchase touch within a 24h lookback "
        "(range-frame window with IGNORE NULLS on both engines — the "
        "frame is microsecond-epoch ints, so boundaries are exact and "
        "per-user key ties cannot reorder the pick), "
        "rolled up to revenue by touch type under each model. One "
        "shuffle on user_id serves both window passes; value sums stay "
        "in the decimal domain",
)
def events_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("us"),
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-86400000000, -1)
    )
    touch = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    credit = (
        ev.withColumn("last_touch", F.last(touch, ignorenulls=True).over(w))
        .withColumn("first_touch", F.first(touch, ignorenulls=True).over(w))
        .filter(F.col("event_type") == "purchase")
    )
    d6 = F.col("value").cast("decimal(18,6)")
    lt = (
        credit.filter(F.col("last_touch").isNotNull())
        .groupBy(F.col("last_touch").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_last"),
            F.sum(d6).cast("double").alias("value_last"),
        )
    )
    ft = (
        credit.filter(F.col("first_touch").isNotNull())
        .groupBy(F.col("first_touch").alias("touch_type"))
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_first"),
            F.sum(d6).cast("double").alias("value_first"),
        )
    )
    return (
        lt.join(ft, "touch_type", "full_outer")
        .select(
            "touch_type",
            F.coalesce("n_last", F.lit(0)).cast("long").alias("n_last"),
            F.coalesce(F.round("value_last", 6), F.lit(0.0)).alias(
                "value_last"
            ),
            F.coalesce("n_first", F.lit(0)).cast("long").alias("n_first"),
            F.coalesce(F.round("value_first", 6), F.lit(0.0)).alias(
                "value_first"
            ),
        )
    )


_POIS = (
    (0.36787944117144233, 0),
    (0.7357588823428847, 1),
    (0.919698602928606, 2),
    (0.9810118431238462, 3),
    (0.9963401531726563, 4),
    (0.9994058151824183, 5),
)


def _pois_case_sql(u: str) -> str:
    arms = " ".join(
        f"WHEN {u} < {t!r} THEN {k}" for t, k in _POIS
    )
    return f"CASE {arms} ELSE 6 END"


_BOOT_B = 32

_BOOT_ORACLE = f"""
    WITH rep AS (
        SELECT e.user_id % 2 AS variant, e.value, b.b,
               CAST(('0x' || substr(md5(CAST(e.event_id AS VARCHAR)
                                        || ':' || CAST(b.b AS VARCHAR)),
                                    1, 8)) AS BIGINT) / 4294967296.0 AS u
        FROM events e, LATERAL (
            SELECT unnest(range(0, {_BOOT_B})) AS b
        ) b
    ), weighted AS (
        SELECT variant, b, {_pois_case_sql('u')} AS w, value
        FROM rep
    ), means AS (
        SELECT b, variant,
               CAST(SUM(w * CAST(value AS DECIMAL(18,6))) AS DOUBLE)
                   / CAST(SUM(w) AS BIGINT) AS m
        FROM weighted GROUP BY 1, 2
    ), diffs AS (
        SELECT b, MAX(CASE WHEN variant = 1 THEN m END)
                  - MAX(CASE WHEN variant = 0 THEN m END) AS d
        FROM means GROUP BY b
    ), full_ AS (
        SELECT CAST(SUM(CASE WHEN user_id % 2 = 1
                             THEN CAST(value AS DECIMAL(18,6)) END)
                    AS DOUBLE)
               / COUNT(CASE WHEN user_id % 2 = 1 THEN 1 END)
               - CAST(SUM(CASE WHEN user_id % 2 = 0
                               THEN CAST(value AS DECIMAL(18,6)) END)
                      AS DOUBLE)
                 / COUNT(CASE WHEN user_id % 2 = 0 THEN 1 END) AS d
        FROM events
    )
    SELECT CAST({_BOOT_B} AS BIGINT) AS n_replicas,
           ROUND((SELECT d FROM full_), 6) AS mean_diff,
           ROUND(quantile_cont(d, 0.025), 6) AS ci_lo,
           ROUND(quantile_cont(d, 0.975), 6) AS ci_hi
    FROM diffs
"""


@register(
    "events_ab_bootstrap",
    oracle=_BOOT_ORACLE,
    doc="Poisson bootstrap CI (the distributed bootstrap — Chamandy et "
        "al.: resampling n rows with replacement needs global "
        "coordination, but Poisson(1) weights per (row, replica) are "
        "embarrassingly parallel and indistinguishable for large n): 32 "
        "replicas, each row's weight drawn by inverting the Poisson CDF "
        "on an (event_id, b)-seeded md5 uniform — deterministic, "
        "restart-stable, identical on both engines. Per-replica variant "
        "means use decimal-exact weighted sums; the 2.5/97.5 percentile "
        "CI of the A/B mean difference interpolates over just 32 model-"
        "sized rows. The 32x row fan-out happens map-side and collapses "
        "in the same stage's partial aggregation — no shuffled blowup",
)
def events_ab_bootstrap(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    rep = ev.select(
        (F.col("user_id") % 2).alias("variant"),
        "value",
        "event_id",
        F.explode(F.sequence(F.lit(0), F.lit(_BOOT_B - 1))).alias("b"),
    )
    u = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat(
                        F.col("event_id").cast("string"),
                        F.lit(":"),
                        F.col("b").cast("string"),
                    ).cast("binary")
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    w = F.lit(6)
    for t, k in reversed(_POIS):
        w = F.when(u < F.lit(t), F.lit(k)).otherwise(w)
    means = (
        rep.withColumn("w", w)
        .groupBy("b", "variant")
        .agg(
            (
                F.sum(F.col("w") * F.col("value").cast("decimal(18,6)"))
                .cast("double")
                / F.sum("w").cast("long")
            ).alias("m")
        )
    )
    diffs = means.groupBy("b").agg(
        (
            F.max(F.when(F.col("variant") == 1, F.col("m")))
            - F.max(F.when(F.col("variant") == 0, F.col("m")))
        ).alias("d")
    )
    d6 = F.col("value").cast("decimal(18,6)")
    full = ev.agg(
        (
            F.sum(F.when(F.col("user_id") % 2 == 1, d6)).cast("double")
            / F.count(F.when(F.col("user_id") % 2 == 1, F.lit(1)))
            - F.sum(F.when(F.col("user_id") % 2 == 0, d6)).cast("double")
            / F.count(F.when(F.col("user_id") % 2 == 0, F.lit(1)))
        ).alias("full_d")
    )
    return diffs.agg(
        F.lit(_BOOT_B).cast("long").alias("n_replicas"),
        F.round(F.percentile(F.col("d"), F.lit(0.025)), 6).alias("ci_lo"),
        F.round(F.percentile(F.col("d"), F.lit(0.975)), 6).alias("ci_hi"),
    ).join(F.broadcast(full)).select(
        "n_replicas",
        F.round("full_d", 6).alias("mean_diff"),
        "ci_lo",
        "ci_hi",
    )


@register(
    "events_theil_sen_trend",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS x,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ), slopes AS (
            SELECT a.event_type,
                   CAST(b.y - a.y AS DOUBLE) / (b.x - a.x) AS s
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND a.x < b.x
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_pairs,
               ROUND(quantile_cont(s, 0.5), 6) AS ts_slope
        FROM slopes GROUP BY event_type
    """,
    doc="Theil-Sen robust trend per event type: the MEDIAN of all "
        "pairwise day-over-day slopes of daily volume — a single outlier "
        "day (deploy spike, logging gap) that drags the OLS slope "
        "(trend_slope_by_type) barely moves this one; the standard "
        "robust trend for noisy ops metrics. Pairwise slopes are "
        "quadratic in DAYS PER GROUP (the post-aggregation model-sized "
        "frame, ~30 rows/type here; at years of history switch to the "
        "repeated-median or sampled variant), never in events. Each "
        "slope is one division of exact bigint deltas; the median "
        "interpolates identically to DuckDB quantile_cont",
)
def events_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
            "x"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    a = daily.alias("a")
    b = daily.alias("b")
    slopes = a.join(
        b,
        (F.col("a.event_type") == F.col("b.event_type"))
        & (F.col("a.x") < F.col("b.x")),
    ).select(
        F.col("a.event_type").alias("event_type"),
        (
            (F.col("b.y") - F.col("a.y")).cast("double")
            / (F.col("b.x") - F.col("a.x"))
        ).alias("s"),
    )
    return slopes.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_pairs"),
        F.round(F.percentile(F.col("s"), F.lit(0.5)), 6).alias("ts_slope"),
    )


@register(
    "events_forecast_backtest",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS x,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ), joined AS (
            SELECT a.event_type, a.x, a.y, b.y AS yhat
            FROM daily a JOIN daily b
              ON a.event_type = b.event_type AND b.x = a.x - 7
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n_days,
               ROUND(CAST(SUM(ABS(y - yhat)) AS DOUBLE) / COUNT(*), 6)
                   AS mae,
               ROUND(CAST(SUM(ABS(y - yhat)) AS DOUBLE)
                     / CAST(SUM(y) AS BIGINT), 6) AS wape
        FROM joined GROUP BY event_type
    """,
    doc="Forecast backtest with the seasonal-naive baseline (forecast for "
        "day d = actual at d-7, the baseline every real forecast must "
        "beat): per-type MAE and WAPE over all days with a calendar "
        "week-ago ancestor (calendar join on x-7, not LAG(7) rows — gaps "
        "must not shift the season). Error sums are exact bigints; the "
        "two final divisions are the only float ops, so both engines "
        "agree bit-for-bit",
)
def events_forecast_backtest(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
            "x"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    a = daily.alias("a")
    b = daily.select(
        F.col("event_type").alias("bt"),
        (F.col("x") + 7).alias("bx"),
        F.col("y").alias("yhat"),
    )
    joined = a.join(
        b, (F.col("a.event_type") == F.col("bt")) & (F.col("a.x") == F.col("bx"))
    )
    err = F.abs(F.col("y") - F.col("yhat"))
    return joined.groupBy(F.col("a.event_type").alias("event_type")).agg(
        F.count(F.lit(1)).cast("long").alias("n_days"),
        F.round(F.sum(err).cast("double") / F.count(F.lit(1)), 6).alias(
            "mae"
        ),
        F.round(
            F.sum(err).cast("double") / F.sum("y").cast("long"), 6
        ).alias("wape"),
    )


@register(
    "events_cusum_changepoint",
    oracle="""
        WITH daily AS (
            SELECT event_type,
                   date_diff('day', DATE '1970-01-01', CAST(ts AS DATE))
                       AS x,
                   CAST(COUNT(*) AS BIGINT) AS y
            FROM events GROUP BY 1, 2
        ), tot AS (
            SELECT event_type, CAST(SUM(y) AS BIGINT) AS s,
                   CAST(COUNT(*) AS BIGINT) AS n
            FROM daily GROUP BY 1
        ), run AS (
            SELECT d.event_type, d.x, t.n, t.s,
                   ROW_NUMBER() OVER w AS t_idx,
                   CAST(SUM(d.y) OVER (PARTITION BY d.event_type
                                       ORDER BY d.x
                                       ROWS UNBOUNDED PRECEDING)
                        AS BIGINT) AS cy
            FROM daily d JOIN tot t USING (event_type)
            WINDOW w AS (PARTITION BY d.event_type ORDER BY d.x)
        ), stat AS (
            SELECT event_type, x, n, s,
                   ABS(n * cy - t_idx * s) AS cusum_n
            FROM run
        ), best AS (
            SELECT event_type, x, n, s, cusum_n,
                   ROW_NUMBER() OVER (PARTITION BY event_type
                                      ORDER BY cusum_n DESC, x ASC) AS rn
            FROM stat
        )
        SELECT event_type,
               CAST(x AS BIGINT) AS cp_day,
               ROUND(CAST(cusum_n AS DOUBLE) / n, 6) AS cusum_stat
        FROM best WHERE rn = 1
    """,
    doc="CUSUM changepoint per event type: the day where the cumulative "
        "deviation of daily volume from its overall mean peaks — the "
        "standard level-shift detector. The statistic is kept exact by "
        "scaling through n: |n·Σ_{i≤t}y_i − t·Σy| is pure bigint (one "
        "running sum over the ordered day window), divided by n only in "
        "the final projection; argmax ties break on the earliest day. "
        "One shuffle on event_type serves the total, the running sum, "
        "and the argmax window",
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type",
        F.datediff(F.to_date("ts"), F.lit("1970-01-01").cast("date")).alias(
            "x"
        ),
    ).agg(F.count(F.lit(1)).cast("long").alias("y"))
    wt = Window.partitionBy("event_type")
    wo = Window.partitionBy("event_type").orderBy("x")
    wrun = wo.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    stat = daily.select(
        "event_type",
        "x",
        F.sum("y").over(wt).cast("long").alias("s"),
        F.count(F.lit(1)).over(wt).cast("long").alias("n"),
        F.row_number().over(wo).alias("t_idx"),
        F.sum("y").over(wrun).cast("long").alias("cy"),
    ).withColumn(
        "cusum_n",
        F.abs(F.col("n") * F.col("cy") - F.col("t_idx") * F.col("s")),
    )
    best = Window.partitionBy("event_type").orderBy(
        F.col("cusum_n").desc(), F.col("x").asc()
    )
    return (
        stat.withColumn("rn", F.row_number().over(best))
        .filter(F.col("rn") == 1)
        .select(
            "event_type",
            F.col("x").cast("long").alias("cp_day"),
            F.round(F.col("cusum_n").cast("double") / F.col("n"), 6).alias(
                "cusum_stat"
            ),
        )
    )


@register(
    "events_winsorized_stats",
    oracle="""
        WITH cuts AS (
            SELECT event_type,
                   quantile_cont(value, 0.05) AS lo,
                   quantile_cont(value, 0.95) AS hi
            FROM events GROUP BY 1
        ), clipped AS (
            SELECT e.event_type,
                   CAST(FLOOR(LEAST(GREATEST(e.value, c.lo), c.hi) * 1e6
                              + 0.5) AS BIGINT) AS v6
            FROM events e JOIN cuts c USING (event_type)
        )
        SELECT event_type,
               CAST(COUNT(*) AS BIGINT) AS n,
               FLOOR(CAST(SUM(v6) AS BIGINT) / CAST(COUNT(*) AS DOUBLE)
                     + 0.5) / 1e6 AS winsorized_mean
        FROM clipped GROUP BY event_type
    """,
    doc="Winsorized mean per event type — the outlier-robust location "
        "estimate feature pipelines use before z-scaling: values clip to "
        "the per-type [p05, p95] band (identical percentile "
        "interpolation on both engines), then each clipped value snaps "
        "to a 1e-6 integer grid BEFORE the mean so the cross-partition "
        "sum is associative-exact (clipped doubles would otherwise "
        "sum in engine-dependent order). Percentile cuts are a "
        "model-sized per-type table broadcast back onto the stream",
)
def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cuts = ev.groupBy("event_type").agg(
        F.percentile(F.col("value"), F.lit(0.05)).alias("lo"),
        F.percentile(F.col("value"), F.lit(0.95)).alias("hi"),
    )
    clipped = ev.join(F.broadcast(cuts), "event_type").select(
        "event_type",
        F.floor(
            F.least(F.greatest(F.col("value"), F.col("lo")), F.col("hi"))
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("v6"),
    )
    return clipped.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        (
            F.floor(
                F.sum("v6").cast("long") / F.count(F.lit(1)).cast("double")
                + F.lit(0.5)
            )
            / F.lit(1e6)
        ).alias("winsorized_mean"),
    )


@register(
    "events_ab_mannwhitney",
    oracle="""
        WITH vals AS (
            SELECT event_type, value,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN user_id % 2 = 1 THEN 1 ELSE 0 END)
                        AS BIGINT) AS n1v
            FROM events GROUP BY 1, 2
        ), cum AS (
            SELECT event_type, value, n, n1v,
                   CAST(COALESCE(SUM(n) OVER (PARTITION BY event_type
                                              ORDER BY value
                                              ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING), 0)
                        AS BIGINT) AS cb
            FROM vals
        ), per_type AS (
            SELECT event_type,
                   CAST(SUM(n) AS BIGINT) AS nn,
                   CAST(SUM(n1v) AS BIGINT) AS n1,
                   CAST(SUM(n1v * (2 * cb + n + 1)) AS BIGINT) AS r1x2,
                   CAST(SUM(n * n * n - n) AS BIGINT) AS tie3
            FROM cum GROUP BY 1
        )
        SELECT event_type, n1, nn - n1 AS n2,
               (r1x2 - n1 * (n1 + 1)) / 2.0 AS u1,
               CASE WHEN nn > 1 AND n1 > 0 AND nn - n1 > 0
                    AND (CAST(n1 AS DOUBLE) * (nn - n1) / 12.0)
                        * ((nn + 1) - CAST(tie3 AS DOUBLE) / (nn * (nn - 1)))
                        > 0
                    THEN FLOOR(((r1x2 - n1 * (n1 + 1)) / 2.0
                                - CAST(n1 AS DOUBLE) * (nn - n1) / 2.0)
                               / sqrt((CAST(n1 AS DOUBLE) * (nn - n1) / 12.0)
                                      * ((nn + 1)
                                         - CAST(tie3 AS DOUBLE)
                                           / (nn * (nn - 1))))
                               * 1e6 + 0.5) / 1e6
               END AS z
        FROM per_type
    """,
    doc="Mann-Whitney U per event type (variant = user-id parity): the "
        "nonparametric A/B complement to events_ab_ttest — rank-based, "
        "so a heavy-tailed metric can't fake significance through a few "
        "outliers. Doubled tied-average ranks keep the rank sum exact "
        "bigint arithmetic (2·avg_rank = 2·cum_before + n + 1), the "
        "tie-corrected variance uses the exact Σ(t³−t) term, and the "
        "z statistic is a handful of correctly-rounded double ops "
        "floored to 1e-6. One shuffle on (type, value); the per-type "
        "window runs over distinct values, not events",
)
def events_ab_mannwhitney(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    vals = ev.groupBy("event_type", "value").agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("user_id") % 2 == 1).cast("long"))
        .cast("long")
        .alias("n1v"),
    )
    wo = (
        Window.partitionBy("event_type")
        .orderBy("value")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    cum = vals.withColumn(
        "cb", F.coalesce(F.sum("n").over(wo), F.lit(0)).cast("long")
    )
    per_type = cum.groupBy("event_type").agg(
        F.sum("n").cast("long").alias("nn"),
        F.sum("n1v").cast("long").alias("n1"),
        F.sum(
            F.col("n1v") * (2 * F.col("cb") + F.col("n") + 1)
        )
        .cast("long")
        .alias("r1x2"),
        F.sum(F.col("n") * F.col("n") * F.col("n") - F.col("n"))
        .cast("long")
        .alias("tie3"),
    )
    n1 = F.col("n1")
    n2 = F.col("nn") - F.col("n1")
    u1 = (F.col("r1x2") - n1 * (n1 + 1)) / F.lit(2.0)
    var = (n1.cast("double") * n2 / F.lit(12.0)) * (
        (F.col("nn") + 1)
        - F.col("tie3").cast("double") / (F.col("nn") * (F.col("nn") - 1))
    )
    z = F.when(
        (F.col("nn") > 1) & (n1 > 0) & (n2 > 0) & (var > 0),
        F.floor(
            (u1 - n1.cast("double") * n2 / F.lit(2.0))
            / F.sqrt(var)
            * F.lit(1e6)
            + F.lit(0.5)
        )
        / F.lit(1e6),
    )
    return per_type.select(
        "event_type",
        "n1",
        n2.alias("n2"),
        u1.alias("u1"),
        z.alias("z"),
    )


@register(
    "events_decay_attribution",
    oracle="""
        WITH ev AS (
            SELECT user_id, event_type, value,
                   CAST(epoch_us(ts) AS BIGINT) AS us
            FROM events
        ), pur AS (
            SELECT user_id, value, us FROM ev
            WHERE event_type = 'purchase'
        ), touch AS (
            SELECT user_id, event_type, us FROM ev
            WHERE event_type <> 'purchase'
        ), pairs AS (
            SELECT p.user_id, p.value, p.us AS pus,
                   t.event_type AS touch_type,
                   power(0.5, CAST((p.us - t.us) // 3600000000 AS BIGINT))
                       AS w
            FROM pur p JOIN touch t
              ON p.user_id = t.user_id
             AND t.us < p.us AND t.us >= p.us - 86400000000
        ), norm AS (
            SELECT *,
                   SUM(w) OVER (PARTITION BY user_id, pus) AS wsum
            FROM pairs
        )
        SELECT touch_type,
               CAST(COUNT(*) AS BIGINT) AS n_credits,
               CAST(SUM(CAST(FLOOR(CAST(value AS DECIMAL(18,6))
                                   * w / wsum * 1e6 + 0.5) AS BIGINT))
                    AS BIGINT) / 1e6 AS revenue_decay
        FROM norm GROUP BY touch_type
    """,
    doc="Time-decay multi-touch attribution: every purchase splits its "
        "value across ALL its 24h-lookback touches, weighted by "
        "0.5^(whole hours before purchase) — weights are exact powers "
        "of two, so the per-purchase weight sum is exact in double "
        "regardless of order (dyadics spanning 2^0..2^-23 fit one "
        "53-bit mantissa), each credit is a deterministic double, and "
        "credits snap to a 1e-6 grid before the cross-purchase rollup. "
        "Completes the attribution family next to first/last-touch "
        "(events_touch_attribution); the purchase×touch interval join "
        "is per-user bounded — bin it with operators/asof range "
        "machinery at 100 TB",
)
def events_decay_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        "value",
        F.unix_micros("ts").alias("us"),
    )
    pur = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "value", F.col("us").alias("pus")
    )
    touch = ev.filter(F.col("event_type") != "purchase").select(
        "user_id", F.col("event_type").alias("touch_type"),
        F.col("us").alias("tus"),
    )
    pairs = pur.join(touch, "user_id").filter(
        (F.col("tus") < F.col("pus"))
        & (F.col("tus") >= F.col("pus") - F.lit(86400000000))
    ).select(
        "user_id",
        "value",
        "pus",
        "touch_type",
        F.pow(
            F.lit(0.5),
            F.floor((F.col("pus") - F.col("tus")) / F.lit(3600000000))
            .cast("long"),
        ).alias("w"),
    )
    wsum = F.sum("w").over(Window.partitionBy("user_id", "pus"))
    credited = pairs.withColumn("wsum", wsum).select(
        "touch_type",
        F.floor(
            F.col("value").cast("decimal(18,6)")
            * F.col("w")
            / F.col("wsum")
            * F.lit(1e6)
            + F.lit(0.5)
        )
        .cast("long")
        .alias("c6"),
    )
    return credited.groupBy("touch_type").agg(
        F.count(F.lit(1)).cast("long").alias("n_credits"),
        (F.sum("c6").cast("long") / F.lit(1e6)).alias("revenue_decay"),
    )


@register(
    "orders_revenue_gini",
    oracle="""
        WITH cust AS (
            SELECT o_custkey,
                   SUM(CAST(o_totalprice AS DECIMAL(18,4))) AS r
            FROM orders GROUP BY 1
        ), ranked AS (
            SELECT r,
                   ROW_NUMBER() OVER (ORDER BY r ASC, o_custkey ASC) AS i,
                   CAST(COUNT(*) OVER () AS BIGINT) AS n,
                   SUM(r) OVER () AS s
            FROM cust
        ), g AS (
            SELECT MIN(n) AS n,
                   CAST(MIN(s) AS DOUBLE) AS s,
                   CAST(SUM((2 * i - n - 1)
                            * CAST(r AS DECIMAL(28,4))) AS DOUBLE) AS num
            FROM ranked
        ), topd AS (
            SELECT CAST(SUM(CASE WHEN i > n - CAST(CEIL(n / 10.0) AS BIGINT)
                                 THEN r END) AS DOUBLE) AS top_rev
            FROM ranked
        )
        SELECT g.n AS n_customers,
               FLOOR(num / (g.n * g.s) * 1e6 + 0.5) / 1e6 AS gini,
               FLOOR(top_rev / g.s * 1e6 + 0.5) / 1e6 AS top_decile_share
        FROM g CROSS JOIN topd
    """,
    doc="Revenue concentration: exact Gini coefficient over per-customer "
        "revenue (Σ(2i−n−1)·r_i / (n·Σr) on the ascending rank with a "
        "custkey tiebreak) plus the top-decile revenue share — the "
        "whale-dependence readout. Every sum stays in the decimal "
        "domain (customer revenue, the rank-weighted numerator, the "
        "decile slice), so both engines divide identical exact totals; "
        "ranks come from operators/ranking.global_rank (range shuffle + "
        "per-partition offsets), so the customer aggregate is never "
        "funneled through a single-partition window — n arrives as "
        "driver-side model state from the rank pass, like a codebook",
)
def orders_revenue_gini(spark: SparkSession, sf_dir: str) -> DataFrame:
    import math

    from youtube_etl_project_spark.operators.ranking import global_rank

    orders = load_table(spark, sf_dir, "orders")
    cust = orders.groupBy("o_custkey").agg(
        F.sum(F.col("o_totalprice").cast("decimal(18,4)")).alias("r")
    )
    ranked, n = global_rank(
        cust, [F.col("r").asc(), F.col("o_custkey").asc()], "i"
    )
    cut = n - math.ceil(n / 10)
    agg = ranked.agg(
        F.max(F.lit(n)).cast("long").alias("n"),
        F.sum("r").cast("double").alias("s"),
        F.sum(
            (2 * F.col("i") - F.lit(n) - 1)
            * F.col("r").cast("decimal(28,4)")
        )
        .cast("double")
        .alias("num"),
        F.sum(F.when(F.col("i") > F.lit(cut), F.col("r")))
        .cast("double")
        .alias("top_rev"),
    )
    grid6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return agg.select(
        F.col("n").alias("n_customers"),
        grid6(F.col("num") / (F.col("n") * F.col("s"))).alias("gini"),
        grid6(F.col("top_rev") / F.col("s")).alias("top_decile_share"),
    )


@register(
    "events_error_pchart",
    oracle="""
        WITH daily AS (
            SELECT CAST(ts AS DATE) AS day,
                   CAST(COUNT(*) AS BIGINT) AS n,
                   CAST(SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
                        AS BIGINT) AS errs
            FROM events GROUP BY 1
        ), base AS (
            SELECT CAST(SUM(errs) AS BIGINT) AS te,
                   CAST(SUM(n) AS BIGINT) AS tn
            FROM daily
        )
        SELECT day, n, errs,
               FLOOR(CAST(errs AS DOUBLE) / n * 1e6 + 0.5) / 1e6 AS p,
               FLOOR((CAST(te AS DOUBLE) / tn
                      + 3 * sqrt((CAST(te AS DOUBLE) / tn)
                                 * (1 - CAST(te AS DOUBLE) / tn) / n))
                     * 1e6 + 0.5) / 1e6 AS ucl,
               CAST(CAST(errs AS DOUBLE) / n
                    > CAST(te AS DOUBLE) / tn
                      + 3 * sqrt((CAST(te AS DOUBLE) / tn)
                                 * (1 - CAST(te AS DOUBLE) / tn) / n)
                    AS BIGINT) AS out_of_control
        FROM daily CROSS JOIN base
    """,
    doc="p-chart (statistical process control) on the daily error rate: "
        "each day's error proportion against the corpus-wide center "
        "line with a 3-sigma binomial upper control limit scaled to "
        "that day's volume — the SRE anomaly readout that accounts for "
        "small-day variance, unlike a fixed threshold. Counts are exact "
        "bigints; the center/limit/flag are a handful of correctly-"
        "rounded double ops on identical inputs, floored to 1e-6. One "
        "shuffle into days; the baseline is a broadcast scalar",
)
def events_error_pchart(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).cast("long").alias("n"),
        F.sum((F.col("event_type") == "error").cast("long"))
        .cast("long")
        .alias("errs"),
    )
    base = daily.agg(
        F.sum("errs").cast("long").alias("te"),
        F.sum("n").cast("long").alias("tn"),
    )
    pbar = F.col("te").cast("double") / F.col("tn")
    ucl = pbar + 3 * F.sqrt(pbar * (1 - pbar) / F.col("n"))
    grid6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return daily.join(F.broadcast(base)).select(
        "day",
        "n",
        "errs",
        grid6(F.col("errs").cast("double") / F.col("n")).alias("p"),
        grid6(ucl).alias("ucl"),
        (F.col("errs").cast("double") / F.col("n") > ucl)
        .cast("long")
        .alias("out_of_control"),
    )


@register(
    "events_ab_power_mde",
    oracle="""
        WITH g AS (
            SELECT event_type,
                   CAST(COUNT(value) AS BIGINT) AS n,
                   CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS s1,
                   CAST(SUM(CAST(value AS DECIMAL(28,10))
                            * CAST(value AS DECIMAL(28,10))) AS DOUBLE) AS s2
            FROM events GROUP BY 1
        )
        SELECT event_type, n,
               FLOOR(sqrt(GREATEST(s2 - s1 * s1 / n, 0) / (n - 1))
                     * 1e6 + 0.5) / 1e6 AS sd,
               FLOOR((1.959964 + 0.841621)
                     * sqrt(2 * (GREATEST(s2 - s1 * s1 / n, 0) / (n - 1))
                            / (n / 2.0))
                     * 1e6 + 0.5) / 1e6 AS mde_abs,
               FLOOR((1.959964 + 0.841621)
                     * sqrt(2 * (GREATEST(s2 - s1 * s1 / n, 0) / (n - 1))
                            / (n / 2.0))
                     / (s1 / n) * 1e6 + 0.5) / 1e6 AS mde_rel
        FROM g WHERE n >= 2
    """,
    doc="Experiment design: minimum detectable effect per event_type at "
        "80% power / 5% two-sided alpha (z constants 1.959964 + 0.841621 "
        "as exact literals — no quantile function needed), given the "
        "observed metric variance and an even split of today's traffic. "
        "The design-phase complement to the readout stack: how small a "
        "lift COULD this experiment see. Variance comes from the same "
        "decimal-exact S1/S2 sums as events_ab_ttest; every output is "
        "floored to 1e-6",
)
def events_ab_power_mde(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    d6 = F.col("value").cast("decimal(18,6)")
    d10 = F.col("value").cast("decimal(28,10)")
    g = (
        ev.groupBy("event_type")
        .agg(
            F.count("value").cast("long").alias("n"),
            F.sum(d6).cast("double").alias("s1"),
            F.sum(d10 * d10).cast("double").alias("s2"),
        )
        .filter(F.col("n") >= 2)
    )
    var = F.greatest(
        F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"), F.lit(0.0)
    ) / (F.col("n") - 1)
    z = F.lit(1.959964 + 0.841621)
    mde = z * F.sqrt(2 * var / (F.col("n") / F.lit(2.0)))
    grid6 = lambda c: F.floor(c * F.lit(1e6) + F.lit(0.5)) / F.lit(1e6)  # noqa: E731
    return g.select(
        "event_type",
        "n",
        grid6(F.sqrt(var)).alias("sd"),
        grid6(mde).alias("mde_abs"),
        grid6(mde / (F.col("s1") / F.col("n"))).alias("mde_rel"),
    )


@register(
    "orders_ship_lag_percentiles",
    oracle="""
        WITH lag_ AS (
            SELECT o.o_orderpriority,
                   CAST(date_diff('day', CAST(o.o_orderdate AS DATE),
                                  CAST(l.l_shipdate AS DATE)) AS BIGINT)
                       AS lag_days
            FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        )
        SELECT o_orderpriority,
               CAST(COUNT(*) AS BIGINT) AS n_lines,
               ROUND(quantile_cont(lag_days, 0.5), 6) AS p50_days,
               ROUND(quantile_cont(lag_days, 0.9), 6) AS p90_days,
               CAST(MAX(lag_days) AS BIGINT) AS max_days
        FROM lag_ GROUP BY 1
    """,
    doc="Fulfillment-lag SLA readout: days from order to line shipment, "
        "p50/p90/max per order priority — does paying for urgency buy "
        "faster shipping. Lags are exact integer day diffs; percentile "
        "interpolation is identical on both engines. The orderkey join "
        "is the standard fact-fact equi-join (same key distribution the "
        "TPC-H suite exercises); the percentile runs per 5-row priority "
        "group after aggregation pushes partial state map-side",
)
def orders_ship_lag_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    orders = load_table(spark, sf_dir, "orders")
    lag = li.join(orders, li["l_orderkey"] == orders["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.to_date("l_shipdate"), F.to_date("o_orderdate"))
        .cast("long")
        .alias("lag_days"),
    )
    return lag.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).cast("long").alias("n_lines"),
        F.round(F.percentile(F.col("lag_days"), F.lit(0.5)), 6).alias(
            "p50_days"
        ),
        F.round(F.percentile(F.col("lag_days"), F.lit(0.9)), 6).alias(
            "p90_days"
        ),
        F.max("lag_days").cast("long").alias("max_days"),
    )
