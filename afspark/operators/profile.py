"""Single-pass table profiling (data-quality audit, Deequ-style).

The reference has no profiling surface (SURVEY.md §2 covers feature
kernels, not table audits); this is the engine-side stage a web-pages
ingest pipeline runs FIRST — null fractions, cardinalities, ranges and
length stats per column — to gate a 100-TB batch before the expensive
dedup/score stages touch it.

Scale shape: every metric is an algebraic aggregate computed in ONE
``df.agg`` over one scan — map-side combined, no per-column jobs, no
collect.  Exact multi-column ``count(distinct)`` makes Catalyst plan a
single Expand (rows × #distinct-columns) feeding one partial-aggregate
pass; at 100 TB pass ``exact_distinct=False`` to swap in
``approx_count_distinct`` (HLL++, no Expand, mergeable) — the operator
keeps one scan either way.  The wide 1-row aggregate is reshaped to the
long per-column report with an explode of struct literals (pure
Catalyst on one row).

Determinism contract: sums/means are emitted only for INTEGRAL columns
(exact in float64 up to 2^53, hence summation-order independent); float
columns should be pre-scaled to integer units (see cents trick,
entry_queries.events_samples) by the caller when bit-stable output
matters.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PROFILE_COLUMNS = [
    "col", "n", "n_null", "n_distinct",
    "min_num", "max_num", "mean",
    "min_str", "max_str", "avg_len",
]


def _round6(c: F.Column) -> F.Column:
    # floor(x*1e6+0.5)/1e6 — same IEEE expression the SQL twins use
    # (see entry_queries._r for why not round()).
    return F.floor(c * 1_000_000.0 + F.lit(0.5)) / 1_000_000.0


def profile_table(
    df: DataFrame,
    numeric_cols: Sequence[str] = (),
    string_cols: Sequence[str] = (),
    exact_distinct: bool = True,
) -> DataFrame:
    """Profile ``df`` in one scan; returns one row per profiled column.

    Output (long format, fixed schema PROFILE_COLUMNS):
      col         column name
      n           table row count (same for every row)
      n_null      NULL count in the column
      n_distinct  exact (default) or HLL++ approximate distinct count
      min_num / max_num / mean   for numeric columns (mean = sum/cnt,
                  rounded to 6 digits; exact when the column is integral)
      min_str / max_str / avg_len  for string columns (binary collation
                  min/max; avg_len = sum(length)/cnt rounded to 6)
    """
    ndist = F.countDistinct if exact_distinct else F.approx_count_distinct
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in numeric_cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            ndist(c).alias(f"{c}__nd"),
            F.min(c).cast("double").alias(f"{c}__mn"),
            F.max(c).cast("double").alias(f"{c}__mx"),
            F.sum(F.col(c).cast("double")).alias(f"{c}__sm"),
        ]
    for c in string_cols:
        aggs += [
            F.count(c).alias(f"{c}__nn"),
            ndist(c).alias(f"{c}__nd"),
            F.min(c).alias(f"{c}__mns"),
            F.max(c).alias(f"{c}__mxs"),
            F.sum(F.length(c)).alias(f"{c}__sl"),
        ]
    wide = df.agg(*aggs)

    null_d = F.lit(None).cast("double")
    null_s = F.lit(None).cast("string")
    structs = []
    for c in numeric_cols:
        nn = F.col(f"{c}__nn")
        structs.append(F.struct(
            F.lit(c).alias("col"),
            F.col("__n").alias("n"),
            (F.col("__n") - nn).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            F.col(f"{c}__mn").alias("min_num"),
            F.col(f"{c}__mx").alias("max_num"),
            F.when(nn > 0, _round6(F.col(f"{c}__sm") / nn))
             .otherwise(null_d).alias("mean"),
            null_s.alias("min_str"),
            null_s.alias("max_str"),
            null_d.alias("avg_len"),
        ))
    for c in string_cols:
        nn = F.col(f"{c}__nn")
        structs.append(F.struct(
            F.lit(c).alias("col"),
            F.col("__n").alias("n"),
            (F.col("__n") - nn).alias("n_null"),
            F.col(f"{c}__nd").alias("n_distinct"),
            null_d.alias("min_num"),
            null_d.alias("max_num"),
            null_d.alias("mean"),
            F.col(f"{c}__mns").alias("min_str"),
            F.col(f"{c}__mxs").alias("max_str"),
            F.when(nn > 0, _round6(F.col(f"{c}__sl").cast("double") / nn))
             .otherwise(null_d).alias("avg_len"),
        ))
    return (
        wide.select(F.explode(F.array(*structs)).alias("m"))
        .select(*[F.col(f"m.{f}") for f in PROFILE_COLUMNS])
    )


def chi2_independence(
    df: DataFrame,
    row_col: str,
    col_col: str,
) -> DataFrame:
    """Pearson chi-squared test of independence between two categorical
    columns (e.g. lang x source over a web-pages corpus) + Cramer's V
    effect size — the categorical sibling of psi_drift/ks_drift for
    corpus-mix monitoring.

    chi2 = Σ_cells (o - e)^2 / e with e = row_total * col_total / N over
    the observed contingency table (absent combinations contribute
    o = 0 only when either margin is 0, i.e. never — so the observed
    cross-join of the two margins is the correct support and is built
    WITHOUT materializing absent cells: present cells contribute
    (o-e)^2/e, and the absent-cell mass Σe is added in closed form as
    N - Σ_present e, since Σ_all e = N exactly).

    Determinism: all counts are exact integers; per-cell terms go
    through one identical float expression; the cross-cell float SUM is
    made order-independent by rounding each term to integer nanos first
    (the psi_drift checksum pattern).

    Scale shape: one groupBy(row,col) count, two tiny margin aggregates
    broadcast-joined back, one scalar aggregate.  Cardinalities are
    categorical (languages, sources) so every join side after the first
    aggregate is broadcast-sized by construction.
    """
    cells = df.groupBy(row_col, col_col).agg(F.count(F.lit(1)).alias("_o"))
    rows = cells.groupBy(row_col).agg(F.sum("_o").alias("_rt"))
    cols = cells.groupBy(col_col).agg(F.sum("_o").alias("_ct"))
    tot = cells.agg(F.sum("_o").alias("_n"))
    j = (
        cells.join(F.broadcast(rows), row_col)
        .join(F.broadcast(cols), col_col)
        .crossJoin(F.broadcast(tot))
    )
    e = F.col("_rt") * F.col("_ct") / F.col("_n")
    term = (F.col("_o") - e) * (F.col("_o") - e) / e
    per_cell = j.select(
        F.col("_n").alias("_n"),
        F.col("_rt"),
        F.col("_ct"),
        e.alias("_e"),
        # always nanos: the absent-cell closed form below adds N*1e9 -
        # Σe_nanos, which is only unit-consistent with nano-scaled terms
        # (a raw-float variant would mix units and emit garbage)
        F.floor(term * 1e9 + 0.5).cast("long").alias("_t"),
        # absent-cell correction needs Σ_present e as exact-as-possible
        # float; rounded to nanos for the same order-independence
        F.floor(e * 1e9 + 0.5).cast("long").alias("_e_nanos"),
    )
    r_card = rows.agg(F.count(F.lit(1)).alias("_r")).select("_r")
    c_card = cols.agg(F.count(F.lit(1)).alias("_c")).select("_c")
    out = (
        per_cell.agg(
            F.first("_n").alias("n"),
            F.sum("_t").alias("_chi2_present_nanos"),
            F.sum("_e_nanos").alias("_sum_e_nanos"),
        )
        .crossJoin(F.broadcast(r_card))
        .crossJoin(F.broadcast(c_card))
    )
    # absent cells have o=0 so each contributes e; Σ_all e == N exactly,
    # hence Σ_absent e = N - Σ_present e (in nanos, exact integers)
    chi2_nanos = (
        F.col("_chi2_present_nanos")
        + F.col("n") * F.lit(1_000_000_000)
        - F.col("_sum_e_nanos")
    )
    chi2 = chi2_nanos / 1e9
    dof = (F.col("_r") - 1) * (F.col("_c") - 1)
    mindim = F.least(F.col("_r") - 1, F.col("_c") - 1)
    v = F.when(
        (F.col("n") > 0) & (mindim > 0),
        F.sqrt(chi2 / (F.col("n") * mindim)),
    )
    return out.select(
        "n",
        F.col("_r").cast("long").alias("n_rows"),
        F.col("_c").cast("long").alias("n_cols"),
        dof.cast("long").alias("dof"),
        chi2_nanos.cast("long").alias("chi2_nanos"),
        v.alias("cramers_v"),
    )


def benford_first_digit(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] = (),
    scale: int = 100,
) -> DataFrame:
    """First-digit (Benford) distribution of a numeric column per key —
    the classic fabricated/synthetic-data screen: organically-grown
    magnitudes follow P(d) = log10(1 + 1/d); scripted or truncated
    feeds don't.

    The leading digit is taken from the DECIMAL STRING of the absolute
    fixed-point value (floor(|v|*scale + 0.5); zeros drop out) — string
    heads are engine-exact where float log10-of-value tricks are not.

    Output per (keys, digit): n, p_obs, p_benford, and the chi-squared
    contribution n_total*(p_obs - p_benford)^2 / p_benford in nanos
    (exact-integer per-cell rounding; sum them for the test statistic).
    ALL nine digits are emitted per key — a digit the feed never
    produces appears with n = 0 and contribution n_total*p_benford, so
    the summed statistic keeps the zero-cell mass (a feed that simply
    never leads with 9s must score HIGHER, not lower).

    Scale shape: one groupBy(keys, digit) count (9 digits per key),
    one tiny totals join — map-side combined, broadcast-sized after the
    first aggregate.
    """
    keys = list(keys)
    c = F.floor(F.abs(F.col(value_col)) * scale + 0.5).cast("long")
    base = (
        df.select(*keys, c.alias("_c"))
        .filter(F.col("_c") > 0)
        .select(
            *keys,
            F.substring(F.col("_c").cast("string"), 1, 1)
            .cast("int").alias("digit"),
        )
    )
    counts = base.groupBy(*keys, "digit").agg(F.count(F.lit(1)).alias("n"))
    totals = counts.groupBy(*keys).agg(F.sum("n").alias("n_total"))
    # 9-digit spine per key: absent digits keep their zero-cell mass.
    # Both join sides are O(9·|keys|) keyed aggregates: AQE broadcasts
    # when the key cardinality is small, and at per-domain scale a
    # co-keyed shuffle join is the right shape anyway (a forced
    # broadcast of a millions-of-keys totals table would be the bug).
    spine = totals.withColumn(
        "digit", F.explode(F.sequence(F.lit(1), F.lit(9)))
    )
    j = spine.join(counts, [*keys, "digit"], "left").withColumn(
        "n", F.coalesce(F.col("n"), F.lit(0))
    )
    p_obs = F.col("n") / F.col("n_total")
    p_exp = F.log10(F.lit(1.0) + F.lit(1.0) / F.col("digit"))
    chi2c = (
        F.col("n_total") * (p_obs - p_exp) * (p_obs - p_exp) / p_exp
    )
    return j.select(
        *keys,
        "digit",
        F.col("n").cast("long").alias("n"),
        p_obs.alias("p_obs"),
        p_exp.alias("p_benford"),
        F.floor(chi2c * 1e9 + 0.5).cast("long").alias("chi2c_nanos"),
    )


def gini_concentration(
    df: DataFrame,
    value_col: str,
    keys: Sequence[str] = (),
) -> DataFrame:
    """Gini coefficient of a nonnegative weight distribution per key —
    the standard concentration screen (how much of the corpus' bytes /
    a domain's traffic sits in few entities).  0 = uniform, ->1 = one
    entity holds everything.

    Closed form on the ascending sort: G = 2·Σ i·x_(i) / (n·Σx)
    − (n+1)/n, with i the 1-based rank.  Equal values make Σ i·x_i
    invariant to tie order, so one rank window gives a deterministic
    exact-integer triple (n, Σx, Σ i·x_i) and the final G is a single
    identical float expression per engine.

    Scale shape: one rank window per key (the per-key sort inherent to
    order statistics) + one keyed aggregate.  Frame = the key's entity
    list, bounded by entities-per-key, not by raw event volume when fed
    pre-aggregated weights (pass the distinct tier / per-entity counts,
    not raw rows).
    """
    from pyspark.sql import Window as W

    keys = list(keys)
    part = W.partitionBy(*keys) if keys else W.partitionBy(F.lit(1))
    ranked = df.select(
        *keys,
        F.col(value_col).alias("_x"),
        F.row_number().over(part.orderBy(F.col(value_col))).alias("_i"),
    )
    agg = ranked.groupBy(*keys).agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("_x").alias("total"),
        F.sum(F.col("_i") * F.col("_x")).alias("_ix"),
    )
    n = F.col("n").cast("double")
    g = (
        F.lit(2.0) * F.col("_ix") / (n * F.col("total"))
        - (n + 1.0) / n
    )
    return agg.select(
        *keys,
        F.col("n").cast("long").alias("n"),
        F.col("total").cast("long").alias("total"),
        F.when(F.col("total") > 0, g).alias("gini"),
    )
