"""Statistical-test facade: the registry's hypothesis tests over ANY
DataFrame, not just the events table.

Each function builds the same plan as its registry twin
(events_chi_square_independence, events_ks_test, events_mann_kendall,
events_theilsen_trend, events_runs_test, events_acf_hourly) but takes
generic column names — the Corpus/Graph facade pattern applied to the
stats family. The registry twins delegate HERE, so there is exactly one
implementation and the DuckDB oracles pin this code bit-for-bit.

Exactness contract shared by all of them (the registry discipline):
counts and cross-multiplied comparisons stay in integers; doubles
appear only in a fixed final op sequence (divisions/sqrt) — so results
are reproducible across engines, partitionings, and retries.

Series inputs are (x, y) integer frames — x a gapless ordering
coordinate, y the measurement. Use an hour/day index over a calendar
spine (events.py::_hourly_series) or any rank. The pairwise tests
(Mann-Kendall, Theil-Sen) are quadratic in the SERIES length, which is
the point: the caller domain-compresses first (hours-in-range, never
raw rows), and 100 TB of events still yields a bounded series.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def chi_square(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """(chi2, dof, n): test of independence between two categorical
    columns. One shuffle to the contingency cells; totals re-aggregate
    the cached cells; per-cell contributions are DECIMAL-quantized
    before the final sum so cell order can't perturb bits."""
    o = df.groupBy(
        F.col(a_col).alias("a"), F.col(b_col).alias("b")
    ).agg(F.count(F.lit(1)).alias("o"))
    o = o.cache()  # |a| x |b| cells — tiny
    rt = o.groupBy("a").agg(F.sum("o").alias("rt"))
    ct = o.groupBy("b").agg(F.sum("o").alias("ct"))
    nn = o.agg(F.sum("o").alias("n"))
    cells = (
        o.join(F.broadcast(rt), "a").join(F.broadcast(ct), "b").crossJoin(F.broadcast(nn))
    )
    e = (F.col("rt").cast("decimal(19,0)") * F.col("ct").cast("decimal(19,0)")).cast(
        "double"
    ) / F.col("n").cast("double")
    contrib = (F.col("o").cast("double") - e) * (F.col("o").cast("double") - e) / e
    dof = ((F.countDistinct("a") - 1) * (F.countDistinct("b") - 1)).cast("bigint")
    return cells.agg(
        F.sum(contrib.cast("decimal(28,10)")).cast("double").alias("chi2"),
        dof.alias("dof"),
        F.max(F.col("n")).cast("bigint").alias("n"),
    )


def ks_2sample(
    df: DataFrame, value_col: str, group_col: str, a: str, b: str, scale: int = 100
) -> DataFrame:
    """(n1, n2, d_num, at_cents, d): two-sample Kolmogorov-Smirnov
    statistic between groups ``a`` and ``b`` of ``value_col``. Values
    quantize to integers at ``scale``; the CDF gap is the exact integer
    |n2*c1 - n1*c2| with one final division. The cumulative window runs
    over the value-domain-compressed frame (distinct quantized points),
    the counting-median trick."""
    pts = (
        df.filter(F.col(group_col).isin(a, b))
        .groupBy(
            F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long").alias("m")
        )
        .agg(
            F.count(F.when(F.col(group_col) == a, 1)).alias("a"),
            F.count(F.when(F.col(group_col) == b, 1)).alias("b"),
        )
    )
    nn = F.broadcast(pts.agg(F.sum("a").alias("n1"), F.sum("b").alias("n2")))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = pts.select(
        "m", F.sum("a").over(w).alias("c1"), F.sum("b").over(w).alias("c2")
    )
    gaps = cum.crossJoin(nn).select(
        "m",
        F.abs(F.col("n2") * F.col("c1") - F.col("n1") * F.col("c2")).alias("d_num"),
        "n1",
        "n2",
    )
    return (
        gaps.orderBy(F.col("d_num").desc(), F.col("m").asc())
        .limit(1)
        .select(
            F.col("n1").cast("bigint").alias("n1"),
            F.col("n2").cast("bigint").alias("n2"),
            F.col("d_num").cast("bigint").alias("d_num"),
            F.col("m").cast("bigint").alias("at_cents"),
            (
                F.col("d_num").cast("double")
                / F.nullif((F.col("n1") * F.col("n2")).cast("double"), F.lit(0.0))
            ).alias("d"),
        )
    )


def mann_kendall(series: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """(n_hours, s, var_num, z): Mann-Kendall monotonic-trend test over
    an integer series. S and the tie-corrected variance numerator are
    exact integers; z does the only sqrt/divisions."""
    filled = series.select(F.col(x_col).alias("he"), F.col(y_col).alias("c"))
    j = F.broadcast(filled.select(F.col("he").alias("jhe"), F.col("c").alias("jc")))
    sgn = (
        F.when(F.col("jc") > F.col("c"), 1)
        .when(F.col("jc") < F.col("c"), -1)
        .otherwise(0)
    )
    sstat = F.broadcast(
        filled.join(j, F.col("jhe") > F.col("he")).agg(F.sum(sgn).alias("s"))
    )
    hh = F.broadcast(filled.agg(F.count(F.lit(1)).alias("n")))
    t = F.col("t")
    ties = F.broadcast(
        filled.groupBy("c")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(t > 1)
        .agg(F.coalesce(F.sum(t * (t - 1) * (2 * t + 5)), F.lit(0)).alias("tie_term"))
    )
    var_num = (
        F.col("n") * (F.col("n") - 1) * (2 * F.col("n") + 5) - F.col("tie_term")
    )
    sd = F.sqrt(var_num.cast("double") / F.lit(18.0))
    z = (
        F.when(F.col("s") > 0, (F.col("s") - 1).cast("double") / sd)
        .when(F.col("s") < 0, (F.col("s") + 1).cast("double") / sd)
        .otherwise(F.lit(0.0))
    )
    return (
        sstat.crossJoin(hh)
        .crossJoin(ties)
        .select(
            F.col("n").cast("bigint").alias("n_hours"),
            F.col("s").cast("bigint").alias("s"),
            var_num.cast("bigint").alias("var_num"),
            z.alias("z"),
        )
    )


def theil_sen(series: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """(n_hours, n_pairs, slope, intercept): Theil-Sen robust line fit —
    lower-median pairwise slope, lower-median residual intercept, both
    deterministic rank selections."""
    raw = series.select(F.col(x_col).alias("he"), F.col(y_col).alias("c"))
    x0 = F.broadcast(raw.agg(F.min("he").alias("x0")))
    filled = raw.crossJoin(x0).select((F.col("he") - F.col("x0")).alias("x"), "c")
    j = F.broadcast(filled.select(F.col("x").alias("jx"), F.col("c").alias("jc")))
    slopes = filled.join(j, F.col("jx") > F.col("x")).select(
        F.col("x").alias("ix"),
        "jx",
        (
            (F.col("jc") - F.col("c")).cast("double")
            / (F.col("jx") - F.col("x")).cast("double")
        ).alias("slope"),
    )
    w = Window.orderBy("slope", "ix", "jx")
    ranked = slopes.select(
        "slope",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("p"),
    )
    med = F.broadcast(
        ranked.filter(F.col("rn") == F.floor((F.col("p") + 1) / 2)).select(
            F.col("slope").alias("m"), "p"
        )
    )
    resid = filled.crossJoin(med).select(
        (F.col("c") - F.col("m") * F.col("x")).alias("r"), "x", "m", "p"
    )
    rw = Window.orderBy("r", "x")
    rranked = resid.select(
        "r",
        "m",
        "p",
        F.row_number().over(rw).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy()).alias("nh"),
    )
    return rranked.filter(F.col("rn") == F.floor((F.col("nh") + 1) / 2)).select(
        F.col("nh").cast("bigint").alias("n_hours"),
        F.col("p").cast("bigint").alias("n_pairs"),
        F.col("m").alias("slope"),
        F.col("r").alias("intercept"),
    )


def runs_above_mean(series: DataFrame, x_col: str, y_col: str) -> DataFrame:
    """(n_hours, n_above, n_below, runs, z): Wald-Wolfowitz runs test,
    labels from the cross-multiplied integer above-mean test."""
    filled = series.select(F.col(x_col).alias("he"), F.col(y_col).alias("c"))
    tot = F.broadcast(
        filled.agg(F.count(F.lit(1)).alias("n"), F.sum("c").alias("total"))
    )
    lab = filled.crossJoin(tot).select(
        "he",
        F.when(F.col("c") * F.col("n") > F.col("total"), 1).otherwise(0).alias("ab"),
    )
    w = Window.orderBy("he")
    flagged = lab.select(
        "ab",
        F.when(
            F.lag("ab").over(w).isNull() | (F.col("ab") != F.lag("ab").over(w)), 1
        )
        .otherwise(0)
        .alias("new_run"),
    )
    agg = flagged.agg(
        F.sum("new_run").alias("r"),
        F.sum("ab").alias("n1"),
        F.sum(1 - F.col("ab")).alias("n2"),
    )
    n = F.col("n1") + F.col("n2")
    two_n1n2 = 2 * F.col("n1") * F.col("n2")
    mu = two_n1n2.cast("double") / n.cast("double") + F.lit(1.0)
    sigma = F.nullif(
        F.sqrt(
            (two_n1n2 * (two_n1n2 - n)).cast("double")
            / F.nullif((n * n * (n - 1)).cast("double"), F.lit(0.0))
        ),
        F.lit(0.0),
    )
    return agg.select(
        n.cast("bigint").alias("n_hours"),
        F.col("n1").cast("bigint").alias("n_above"),
        F.col("n2").cast("bigint").alias("n_below"),
        F.col("r").cast("bigint").alias("runs"),
        ((F.col("r").cast("double") - mu) / sigma).alias("z"),
    )


def acf(series: DataFrame, x_col: str, y_col: str, max_lag: int = 12) -> DataFrame:
    """(lag, m, acf) for lags 1..max_lag: Pearson autocorrelation from
    exact cross-multiplied integer sums, one division + two sqrts per
    lag at the end."""
    spark = series.sparkSession
    filled = series.select(F.col(x_col).alias("he"), F.col(y_col).alias("c"))
    lags = F.broadcast(
        spark.range(1, max_lag + 1).select(F.col("id").cast("int").alias("lag"))
    )
    y = F.broadcast(filled.select(F.col("he").alias("yhe"), F.col("c").alias("yc")))
    p = (
        filled.crossJoin(lags)
        .join(y, F.col("yhe") == F.col("he") + F.col("lag"))
        .select("lag", F.col("c").alias("x"), F.col("yc").alias("y"))
    )
    s = p.groupBy("lag").agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.nullif(
        F.sqrt((F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        * F.sqrt((F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
        F.lit(0.0),
    )
    return s.select("lag", "m", (num / den).alias("acf"))


def spearman(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """(n, rho): Spearman rank correlation between two numeric columns,
    EXACT under ties: the average rank of a tie group, (min_rank +
    max_rank)/2, is represented as the INTEGER 2*rank + t - 1 (Pearson
    is affine-invariant, so doubling every rank changes nothing), so
    all sums stay integer-exact and only the final division/sqrts are
    floating point. Two bounded global windows over the input frame —
    callers pass a domain-compressed series, not raw rows."""
    base = df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    sa = (
        2 * F.rank().over(Window.orderBy("a"))
        + F.count(F.lit(1)).over(Window.partitionBy("a"))
        - 1
    )
    sb = (
        2 * F.rank().over(Window.orderBy("b"))
        + F.count(F.lit(1)).over(Window.partitionBy("b"))
        - 1
    )
    ranked = base.select(sa.alias("ra"), sb.alias("rb"))
    s = ranked.agg(
        F.count(F.lit(1)).alias("m"),
        F.sum(F.col("ra") * F.col("rb")).alias("sxy"),
        F.sum("ra").alias("sx"),
        F.sum("rb").alias("sy"),
        F.sum(F.col("ra") * F.col("ra")).alias("sxx"),
        F.sum(F.col("rb") * F.col("rb")).alias("syy"),
    )
    num = (F.col("m") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("double")
    den = F.nullif(
        F.sqrt((F.col("m") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double"))
        * F.sqrt((F.col("m") * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")),
        F.lit(0.0),
    )
    return s.select(
        F.col("m").cast("bigint").alias("n"), (num / den).alias("rho")
    )


def kendall_tau(df: DataFrame, a_col: str, b_col: str) -> DataFrame:
    """(n, s, tau): Kendall's tau-b between two numeric columns —
    concordant-minus-discordant pairs with tie corrections. S, the pair
    count, and both tie terms are exact integers (the Mann-Kendall
    machinery generalized to two variables); tau does the only
    sqrt/division. Quadratic in the INPUT length — callers pass a
    domain-compressed frame (e.g. the hourly series), never raw rows."""
    base = df.select(F.col(a_col).alias("a"), F.col(b_col).alias("b"))
    idx = base.select(
        "a", "b", F.row_number().over(Window.orderBy("a", "b")).alias("i")
    )
    j = F.broadcast(
        idx.select(F.col("i").alias("ji"), F.col("a").alias("ja"), F.col("b").alias("jb"))
    )
    prod = (
        F.when((F.col("ja") > F.col("a")) & (F.col("jb") > F.col("b")), 1)
        .when((F.col("ja") < F.col("a")) & (F.col("jb") < F.col("b")), 1)
        .when((F.col("ja") > F.col("a")) & (F.col("jb") < F.col("b")), -1)
        .when((F.col("ja") < F.col("a")) & (F.col("jb") > F.col("b")), -1)
        .otherwise(0)
    )
    sstat = F.broadcast(
        idx.join(j, F.col("ji") > F.col("i")).agg(F.sum(prod).alias("s"))
    )
    nn = F.broadcast(base.agg(F.count(F.lit(1)).alias("n")))
    t = F.col("t")
    ta = F.broadcast(
        base.groupBy("a")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(t > 1)
        .agg(F.coalesce(F.sum(t * (t - 1)), F.lit(0)).alias("ta2"))  # 2*Ta
    )
    tb = F.broadcast(
        base.groupBy("b")
        .agg(F.count(F.lit(1)).alias("t"))
        .filter(t > 1)
        .agg(F.coalesce(F.sum(t * (t - 1)), F.lit(0)).alias("tb2"))  # 2*Tb
    )
    p2 = F.col("n") * (F.col("n") - 1)  # 2*P
    tau = F.col("s").cast("double") / F.nullif(
        F.sqrt((p2 - F.col("ta2")).cast("double") / F.lit(2.0))
        * F.sqrt((p2 - F.col("tb2")).cast("double") / F.lit(2.0)),
        F.lit(0.0),
    )
    return (
        sstat.crossJoin(nn)
        .crossJoin(ta)
        .crossJoin(tb)
        .select(
            F.col("n").cast("bigint").alias("n"),
            F.col("s").cast("bigint").alias("s"),
            tau.alias("tau"),
        )
    )


def mann_whitney_u(
    df: DataFrame, value_col: str, group_col: str, a: str, b: str, scale: int = 100
) -> DataFrame:
    """(n1, n2, u1_x2, z): Mann-Whitney U (rank-sum) test between
    groups ``a`` and ``b`` — the nonparametric 'same distribution?'
    partner to ks_2sample (U weighs the whole ranking, KS the worst
    CDF gap). EXACT via the counting trick: values quantize to
    integers, ranks come from cumulative counts over the value-domain-
    compressed frame, tie-averaged ranks are represented DOUBLED
    (2*prev + t + 1 is always an integer), so U1 is carried as the
    exact integer 2*U1; the tie-corrected normal z does the only
    divisions/sqrt."""
    pts = (
        df.filter(F.col(group_col).isin(a, b))
        .groupBy(
            F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long").alias("m")
        )
        .agg(
            F.count(F.when(F.col(group_col) == a, 1)).alias("a"),
            F.count(F.when(F.col(group_col) == b, 1)).alias("b"),
        )
    )
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    t = F.col("a") + F.col("b")
    ranked = pts.select(
        "a",
        "b",
        t.alias("t"),
        F.coalesce(F.sum(F.col("a") + F.col("b")).over(w), F.lit(0)).alias("prev"),
    )
    s2 = 2 * F.col("prev") + F.col("t") + 1  # doubled tie-averaged rank
    agg = ranked.agg(
        F.sum("a").alias("n1"),
        F.sum("b").alias("n2"),
        F.sum(F.col("a") * s2).alias("r1_x2"),
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    n1, n2 = F.col("n1"), F.col("n2")
    n = n1 + n2
    u1_x2 = F.col("r1_x2") - n1 * (n1 + 1)  # exact integer 2*U1
    a_d = (n1 * n2).cast("double")
    var4 = a_d * (n + 1).cast("double") / F.lit(3.0) - a_d * F.col("tie3").cast(
        "double"
    ) / F.nullif(F.lit(3.0) * (n * (n - 1)).cast("double"), F.lit(0.0))
    # z = (U1 - mu)/sigma = (2*U1 - n1*n2) / sqrt(4*Var(U))
    z = (u1_x2.cast("double") - a_d) / F.nullif(F.sqrt(var4), F.lit(0.0))
    return agg.select(
        n1.cast("bigint").alias("n1"),
        n2.cast("bigint").alias("n2"),
        u1_x2.cast("bigint").alias("u1_x2"),
        z.alias("z"),
    )


def kruskal_wallis(
    df: DataFrame, value_col: str, group_col: str, groups: list[str], scale: int = 100
) -> DataFrame:
    """(n, k_groups, h, h_tie_corrected): Kruskal-Wallis H across the
    named groups — nonparametric one-way ANOVA, the k-group
    generalization of mann_whitney_u and built from the same doubled
    tie-averaged counting ranks. The k group terms combine in a FIXED
    left-associative chain of named columns, so there is no float
    summation-order ambiguity at any parallelism."""
    k = len(groups)
    pts = (
        df.filter(F.col(group_col).isin(*groups))
        .groupBy(
            F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long").alias("m")
        )
        .agg(
            *[
                F.count(F.when(F.col(group_col) == g, 1)).alias(f"c{i}")
                for i, g in enumerate(groups)
            ]
        )
    )
    tsum = sum(F.col(f"c{i}") for i in range(k))
    w = Window.orderBy("m").rowsBetween(Window.unboundedPreceding, -1)
    ranked = pts.select(
        "*",
        tsum.alias("t"),
        F.coalesce(F.sum(tsum).over(w), F.lit(0)).alias("prev"),
    )
    s2 = 2 * F.col("prev") + F.col("t") + 1
    agg = ranked.agg(
        *[F.sum(f"c{i}").alias(f"n{i}") for i in range(k)],
        *[F.sum(F.col(f"c{i}") * s2).alias(f"r{i}") for i in range(k)],
        F.sum(F.col("t") * F.col("t") * F.col("t") - F.col("t")).alias("tie3"),
    )
    n_all = sum(F.col(f"n{i}") for i in range(k))
    kcnt = sum(F.when(F.col(f"n{i}") > 0, 1).otherwise(0) for i in range(k))
    terms = None
    for i in range(k):
        term = F.when(
            F.col(f"n{i}") > 0,
            F.col(f"r{i}").cast("double")
            * F.col(f"r{i}").cast("double")
            / (F.lit(4.0) * F.col(f"n{i}").cast("double")),
        ).otherwise(F.lit(0.0))
        terms = term if terms is None else terms + term
    h = (
        F.lit(12.0) / (n_all.cast("double") * (n_all + 1).cast("double")) * terms
        - F.lit(3.0) * (n_all + 1).cast("double")
    )
    hc = h / F.nullif(
        F.lit(1.0)
        - F.col("tie3").cast("double")
        / F.nullif((n_all * n_all * n_all - n_all).cast("double"), F.lit(0.0)),
        F.lit(0.0),
    )
    return agg.select(
        n_all.cast("bigint").alias("n"),
        kcnt.cast("bigint").alias("k_groups"),
        h.alias("h"),
        hc.alias("h_tie_corrected"),
    )


def friedman(
    df: DataFrame,
    block_col: str,
    group_col: str,
    value_col: str,
    groups: list[str],
    scale: int = 100,
) -> DataFrame:
    """(n_blocks, k, chi2_f, kendalls_w): Friedman test — the
    repeated-measures companion to kruskal_wallis (does any treatment
    differ, judged WITHIN each block?). Values are quantized to
    ``round(value * scale)`` fixed-point integers before ranking (the
    same knob as ks_2sample/mann_whitney_u/kruskal_wallis; the default
    keeps cents exact — callers with sub-1/scale differences must
    raise it or those values tie). Blocks (e.g. users) missing any
    group are dropped (complete-block design). Each block ranks its
    k group MEANS; mean comparisons are exact integer cross-
    multiplications sum_a*cnt_b vs sum_b*cnt_a (no division), ties get
    the doubled average rank 2*less + t + 1, and the per-group rank
    sums stay exact integers; the chi-square and Kendall's W do the
    only float ops, over a FIXED named-column chain."""
    k = len(groups)
    cents = F.floor(F.col(value_col) * scale + F.lit(0.5)).cast("long")
    ut = (
        df.filter(F.col(group_col).isin(*groups))
        .groupBy(F.col(block_col).alias("blk"), F.col(group_col).alias("g"))
        .agg(F.sum(cents).alias("s"), F.count(F.lit(1)).alias("c"))
    )
    complete = ut.groupBy("blk").agg(F.count(F.lit(1)).alias("ng")).filter(
        F.col("ng") == k
    )
    ut = ut.join(complete.select("blk"), "blk", "left_semi").cache()
    other = ut.select(
        F.col("blk").alias("blk2"),
        F.col("g").alias("g2"),
        F.col("s").alias("s2_"),
        F.col("c").alias("c2_"),
    )
    # mean_other < mean_this  <=>  s2_*c < s*c2_  (counts positive)
    cmp = ut.join(other, F.col("blk") == F.col("blk2")).groupBy("blk", "g").agg(
        F.sum(
            F.when(F.col("s2_") * F.col("c") < F.col("s") * F.col("c2_"), 1).otherwise(0)
        ).alias("less"),
        F.sum(
            F.when(F.col("s2_") * F.col("c") == F.col("s") * F.col("c2_"), 1).otherwise(0)
        ).alias("teq"),  # includes self
    )
    s2rank = 2 * F.col("less") + F.col("teq") + 1  # doubled tie-avg rank
    per_group = cmp.groupBy("g").agg(F.sum(s2rank).alias("r_x2"))
    wide = per_group.groupBy().pivot("g", groups).agg(F.first("r_x2"))
    nb = F.broadcast(complete.agg(F.count(F.lit(1)).alias("n")))
    out = wide.crossJoin(nb)
    terms = None
    for g in groups:
        t = (
            F.coalesce(F.col(f"`{g}`"), F.lit(0)).cast("double")
            * F.coalesce(F.col(f"`{g}`"), F.lit(0)).cast("double")
            / F.lit(4.0)
        )
        terms = t if terms is None else terms + t
    n_d = F.col("n").cast("double")
    chi2 = (
        F.lit(12.0) / F.nullif(n_d * F.lit(float(k)) * F.lit(float(k + 1)), F.lit(0.0))
        * terms
        - F.lit(3.0) * n_d * F.lit(float(k + 1))
    )
    w = chi2 / F.nullif(n_d * F.lit(float(k - 1)), F.lit(0.0))
    return out.select(
        F.col("n").cast("bigint").alias("n_blocks"),
        F.lit(k).cast("bigint").alias("k"),
        chi2.alias("chi2_f"),
        w.alias("kendalls_w"),
    )
