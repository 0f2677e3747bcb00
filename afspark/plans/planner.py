"""Planner heuristics: window-assembly strategy + skew salting.

Plain Python cost logic, no Catalyst extension (SURVEY.md §4.2): Catalyst
optimizes the declarative plan; the two decisions it cannot make for us
are (a) which window-assembly dataflow to build and (b) whether a series
key is hot enough to salt.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators.windows import hop_step


@dataclass(frozen=True)
class AssemblyPlan:
    strategy: str  # "tumbling" | "sliding" | "halo"
    replication: float  # expected per-sample data duplication factor
    reason: str


def choose_assembly(
    winlen: int,
    noverlap: int,
    algebraic: bool,
    target_chunk_samples: int = 65_536,
) -> AssemblyPlan:
    """Pick the cheapest correct window-assembly dataflow.

    * algebraic feature + no overlap  -> pure-Catalyst tumbling hash-agg
      (replication 1.0, whole-stage codegen end to end);
    * algebraic + small replication   -> explode-replication sliding agg
      (replication winlen/step), still no Python;
    * otherwise                       -> halo chunks + Arrow kernel pass
      (replication 1 + noverlap/chunk_span — the 100TB-safe default).
    """
    step = hop_step(winlen, noverlap)
    sliding_rep = winlen / step
    chunk_span = max(1, target_chunk_samples // step) * step
    halo_rep = 1.0 + (noverlap / chunk_span)
    if algebraic and noverlap == 0:
        return AssemblyPlan("tumbling", 1.0, "algebraic, no overlap: hash-agg")
    if algebraic and sliding_rep <= 4.0:
        return AssemblyPlan(
            "sliding", sliding_rep, f"algebraic, replication {sliding_rep:.1f}x <= 4x"
        )
    return AssemblyPlan(
        "halo", halo_rep, f"kernel path; halo replication {halo_rep:.4f}x"
    )


def hot_keys(
    df: DataFrame, key_col: str, frac_threshold: float = 0.05, max_keys: int = 64
) -> list:
    """Heavy-hitter keys holding more than frac_threshold of all rows.

    One cheap count aggregation (map-side combined) — the standard
    first-pass skew probe before choosing a salting layout.
    """
    total = df.count()
    if total == 0:
        return []
    rows = (
        df.groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") >= frac_threshold * total)
        .orderBy(F.col("n").desc())
        .limit(max_keys)
        .collect()
    )
    return [r[0] for r in rows]


def salt_series(
    samples: DataFrame,
    hot: list,
    n_salts: int = 8,
    series_col: str = "series_id",
    seq_col: str = "seq",
    span: int = 65_536,
) -> DataFrame:
    """Add a ``salt`` column that splits hot series into contiguous spans.

    Cold series get salt 0; hot series get floor((seq-1)/span) % n_salts —
    contiguity-preserving, so windowed kernels still see dense runs.
    groupBy keys become (series_id, salt, ...) downstream.
    """
    is_hot = F.col(series_col).isin([str(h) for h in hot]) if hot else F.lit(False)
    salt = F.when(
        is_hot, (F.floor((F.col(seq_col) - 1) / span) % n_salts).cast("int")
    ).otherwise(F.lit(0))
    return samples.withColumn("salt", salt)
