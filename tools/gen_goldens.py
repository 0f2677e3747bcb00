"""Generate VALUES-literal golden oracles for the kernel-path queries.

DuckDB has no FFT/ordinal/stable-fit kernels, so those queries cannot
have a hand-written SQL twin.  Instead this script computes the SAME
checksum aggregates with the LOCAL NUMPY TWIN (functions/kernels.py:
score_local — the single-process golden path the distributed operator is
bit-exact against) over the sf0.01 parquet, and emits them as VALUES
literals into afspark/entry_goldens.py.  The driver then runs the Spark
query and the golden SQL side-by-side: two independent execution paths
(distributed Arrow chunk assembly vs single-process stride views)
through the driver's hash gate.

Run:  python tools/gen_goldens.py [sf_dir]     (default /root/testdata/sf0.01)
"""

from __future__ import annotations

import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pandas as pd

from afspark.functions import kernels as K
from afspark.functions.kernels import score_local

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
SF_NAME = os.path.basename(SF_DIR.rstrip("/"))


# ---------------------------------------------------------------------------
# sample-series twins (mirror entry_queries._doc_samples_for_kernels and
# entry_queries.events_samples, re-derived in pandas)
# ---------------------------------------------------------------------------

def doc_series():
    d = pd.read_parquet(
        f"{SF_DIR}/documents.parquet", columns=["doc_id", "source", "text"]
    )
    for src, g in d.sort_values("doc_id").groupby("source"):
        s = "".join(g["text"])
        x = (np.array([ord(c) for c in s], dtype=np.float64) - 127.5) / 127.5
        yield str(src), x


def event_series():
    e = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )
    for uid, g in e.sort_values(["ts", "event_id"]).groupby("user_id"):
        yield str(uid), g["value"].to_numpy(np.float64)


def score_rows(series_iter, feats, winlen, noverlap, fs):
    """Long rows (series_id, win_start, feature, value) via the numpy twin."""
    rows = []
    for sid, x in series_iter:
        if len(x) < winlen:
            continue  # short series emit no windows (reference :876)
        for f in feats:
            starts, names, vals = score_local(
                f, x, fs=fs, winlen=winlen, noverlap=noverlap
            )
            for j, name in enumerate(names):
                for i, st in enumerate(starts):
                    rows.append((sid, int(st), name, float(vals[i, j])))
    return pd.DataFrame(rows, columns=["series_id", "win_start", "feature", "value"])


# ---------------------------------------------------------------------------
# checksum twin (mirror entry_queries._kernel_checksum)
# ---------------------------------------------------------------------------

def checksum(df: pd.DataFrame, keys: list[str]) -> pd.DataFrame:
    v = df["value"].to_numpy(np.float64)
    bad = ~np.isfinite(v)
    micros = np.zeros(len(v), dtype=np.int64)
    micros[~bad] = np.floor(v[~bad] * 1e6 + 0.5).astype(np.int64)
    ws = df["win_start"].to_numpy(np.int64)
    work = df[keys].copy()
    work["_bad"] = bad
    work["_micros"] = np.where(bad, 0, micros)
    work["_pos"] = np.where(bad, 0, ws * (micros % 1009))
    out = []
    for kv, g in work.groupby(keys, sort=True):
        if not isinstance(kv, tuple):
            kv = (kv,)
        good = g.loc[~g["_bad"], "_micros"]
        out.append(
            (*kv,
             len(g),
             int(g["_bad"].sum()),
             int(good.sum()) if len(good) else 0,
             int(good.min()) if len(good) else 0,
             int(good.max()) if len(good) else 0,
             int(g.loc[~g["_bad"], "_pos"].sum()) if len(good) else 0)
        )
    cols = keys + ["cnt", "n_bad", "sum_micros", "min_micros", "max_micros", "pos_check"]
    return pd.DataFrame(out, columns=cols)


def values_sql(df: pd.DataFrame, str_cols: set[str]) -> str:
    """Render a checksum frame as a DuckDB VALUES query with BIGINT casts."""
    def lit(c, x):
        if c in str_cols:
            return "'" + str(x).replace("'", "''") + "'"
        return str(int(x))

    rows = ",\n      ".join(
        "(" + ", ".join(lit(c, r[c]) for c in df.columns) + ")"
        for _, r in df.iterrows()
    )
    sel = ", ".join(
        (c if c in str_cols else f"{c}::BIGINT AS {c}") for c in df.columns
    )
    cols = ", ".join(df.columns)
    return f"\n    SELECT {sel}\n    FROM (VALUES\n      {rows}\n    ) t({cols})\n"


# ---------------------------------------------------------------------------
# the four kernel-path queries
# ---------------------------------------------------------------------------

def golden_kernels_docs():
    feats = [
        K.PermutationEntropy(4),
        K.SpectralCentroid(),
        K.SpectralFlatness(),
        K.Entropy(64, 32),
        K.StatisticalComplexity(3),
        K.ZeroCrossingRate(),
    ]
    df = score_rows(doc_series(), feats, 256, 128, 1000.0)
    return values_sql(checksum(df, ["series_id", "feature"]), {"series_id", "feature"})


def golden_psd_docs():
    df = score_rows(doc_series(), [K.PSD(64, 32, 1000.0)], 512, 0, 1000.0)
    return values_sql(checksum(df, ["feature"]), {"feature"})


def golden_impulse_sas_events():
    feats = [K.ImpulseStats(3.0, 0.004), K.SymmetricAlphaStableStats(), K.Myriad()]
    df = score_rows(event_series(), feats, 32, 0, 1000.0)
    df["sbucket"] = df["series_id"].astype(np.int64) % 8
    return values_sql(checksum(df, ["feature", "sbucket"]), {"feature"})


def golden_freq_contours_docs():
    f = K.FrequencyContours(64, 32, None, 100.0, 95.0, 100.0, 0.01)
    df = score_rows(doc_series(), [f], 1024, 0, 1000.0)
    return values_sql(checksum(df, ["series_id", "feature"]), {"series_id", "feature"})


# ---------------------------------------------------------------------------
# IVF recall golden: full numpy re-implementation of the exact + IVF paths
# with LEFT-FOLD dot products (bit-exact with Spark's F.aggregate fold)
# ---------------------------------------------------------------------------

def lf_dot(a, b):
    s = 0.0
    for x, y in zip(a, b):
        s += x * y
    return s


def golden_ivf_recall():
    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    ids = e["vec_id"].to_numpy(np.int64)
    X = np.stack(e["embedding"].to_numpy()).astype(np.float64)

    # codebook: kmeans-lite, seed 42, first 500 vectors by vec_id
    # (mirrors operators/similarity.py:train_codebook)
    S = X[:500]
    rng = np.random.default_rng(42)
    cents = S[rng.choice(len(S), size=min(8, len(S)), replace=False)]
    for _ in range(8):
        d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for c in range(len(cents)):
            m = assign == c
            if m.any():
                cents[c] = S[m].mean(axis=0)

    cell = ((X[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2).argmin(axis=1)

    qidx = np.argsort(ids, kind="stable")[:5]
    rows = []
    for qi in qidx:
        qv = X[qi]
        qn = math.sqrt(lf_dot(qv, qv))
        cos = np.array(
            [lf_dot(X[ci], qv) / (math.sqrt(lf_dot(X[ci], X[ci])) * qn)
             for ci in range(len(X))]
        )
        order = sorted(range(len(X)), key=lambda i: (-cos[i], ids[i]))
        exact5 = {int(ids[i]) for i in order[:5]}
        d2q = ((cents - qv[None, :]) ** 2).sum(axis=1)
        probed = set(np.argsort(d2q)[:4])
        cand = [i for i in range(len(X)) if cell[i] in probed]
        corder = sorted(cand, key=lambda i: (-cos[i], ids[i]))
        approx5 = {int(ids[i]) for i in corder[:5]}
        rows.append((int(ids[qi]), 5, len(exact5 & approx5)))

    df = pd.DataFrame(rows, columns=["qid", "k", "hits"])
    return values_sql(df, set())


def golden_pq_recall():
    """Numpy twin of entry_queries.q_pq_recall_check: exact cosine top-5
    (left-fold dots, matching Spark's F.aggregate) vs PQ/ADC top-5 with
    the same seeded per-subspace k-means as similarity.train_pq_codebooks
    (naive (x-c)^2 distances, normalize-then-encode)."""
    m, n_codes, iters, seed = 8, 16, 8, 42
    e = pd.read_parquet(f"{SF_DIR}/embeddings.parquet").sort_values("vec_id")
    ids = e["vec_id"].to_numpy(np.int64)
    X = np.stack(e["embedding"].to_numpy()).astype(np.float64)
    nrm = np.sqrt((X * X).sum(axis=1))
    Xn = X / np.where(nrm == 0.0, 1.0, nrm)[:, None]
    dim = X.shape[1]
    dsub = dim // m

    S_all = Xn[:2048]  # sample: first 2048 by vec_id (>= corpus at sf0.01)
    books = np.empty((m, n_codes, dsub))
    for j in range(m):
        S = S_all[:, j * dsub : (j + 1) * dsub]
        rng = np.random.default_rng(seed + j)
        cents = S[rng.choice(len(S), size=min(n_codes, len(S)), replace=False)]
        for _ in range(iters):
            d2 = ((S[:, None, :] - cents[None, :, :]) ** 2).sum(axis=2)
            assign = d2.argmin(axis=1)
            for c in range(len(cents)):
                mk = assign == c
                if mk.any():
                    cents[c] = S[mk].mean(axis=0)
        books[j, : len(cents)] = cents
        if len(cents) < n_codes:
            books[j, len(cents):] = cents[0]

    codes = np.empty((len(Xn), m), dtype=np.int64)
    for j in range(m):
        S = Xn[:, j * dsub : (j + 1) * dsub]
        d2 = ((S[:, None, :] - books[j][None, :, :]) ** 2).sum(axis=2)
        codes[:, j] = d2.argmin(axis=1)

    jj = np.arange(m)
    qidx = np.argsort(ids, kind="stable")[:5]
    rows = []
    for qi in qidx:
        qv = X[qi]
        qn = math.sqrt(lf_dot(qv, qv))
        cos = np.array(
            [lf_dot(X[ci], qv) / (math.sqrt(lf_dot(X[ci], X[ci])) * qn)
             for ci in range(len(X))]
        )
        order = sorted(range(len(X)), key=lambda i: (-cos[i], ids[i]))
        exact5 = {int(ids[i]) for i in order[:5]}

        qnv = Xn[qi]
        lut = np.empty((m, n_codes))
        for j in range(m):
            qs = qnv[j * dsub : (j + 1) * dsub]
            lut[j] = ((books[j] - qs[None, :]) ** 2).sum(axis=1)
        d2 = lut[jj[None, :], codes].sum(axis=1)
        capprox = 1.0 - d2 / 2.0
        aorder = sorted(range(len(X)), key=lambda i: (-capprox[i], ids[i]))
        approx5 = {int(ids[i]) for i in aorder[:5]}
        rows.append((int(ids[qi]), 5, len(exact5 & approx5)))

    df = pd.DataFrame(rows, columns=["qid", "k", "hits"])
    return values_sql(df, set())


def golden_holt_events():
    """Sequential numpy twin of entry_queries.q_holt_forecast_events.

    Same matrix-form recurrence as tsanalytics.holt_linear's local loop,
    run single-process per series over the full (ts, value)-ordered cents
    stream; emits per-series micros BIGINTs with the same +1e-9 bias.
    """
    al, be = 0.3, 0.1
    a11, a12 = 1.0 - al, 1.0 - al
    a21, a22 = -al * be, 1.0 - al * be
    ca, cb = al, al * be
    e = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"])
    e["v"] = np.floor(e["value"].to_numpy(np.float64) * 100 + 0.5)
    rows = []
    for uid, g in e.sort_values(["ts", "v"], kind="mergesort").groupby("user_id"):
        x = g["v"].to_numpy(np.float64)
        l = b = 0.0
        for xi in x:
            l, b = a11 * l + a12 * b + ca * xi, a21 * l + a22 * b + cb * xi
        lvl, tr = l / 100.0, b / 100.0

        def mic(v):
            return int(math.floor((v + 1e-9) * 1e6 + 0.5))

        rows.append(
            (str(uid), len(x), mic(lvl), mic(tr), mic(lvl + 10.0 * tr))
        )
    df = pd.DataFrame(
        rows, columns=["series_id", "n", "level_u", "trend_u", "fc10_u"]
    )
    return values_sql(df, {"series_id"})


def golden_seasonal_holt_events():
    """Sequential numpy twin of entry_queries.q_seasonal_holt_events.

    Classical additive decomposition (24 hour-of-day phases; exact
    integer cents sums make the indices exact rationals) + the same
    Holt recurrence as golden_holt_events on the DESEASONALIZED stream,
    sorted per series by (ts, adjusted) — mirroring holt_linear's
    in-chunk sort key on the adjusted value column.
    """
    al, be = 0.3, 0.1
    a11, a12 = 1.0 - al, 1.0 - al
    a21, a22 = -al * be, 1.0 - al * be
    ca, cb = al, al * be
    e = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"])
    e["v"] = np.floor(e["value"].to_numpy(np.float64) * 100 + 0.5)
    e["es"] = e["ts"].astype("datetime64[s]").astype("int64")
    e["phase"] = (e["es"] % 86400) // 3600

    def mic(v):
        return int(math.floor((v + 1e-9) * 1e6 + 0.5))

    rows = []
    for uid, g in e.groupby("user_id"):
        ps = g.groupby("phase")["v"].sum()
        pn = g.groupby("phase")["v"].count()
        smean = float(g["v"].sum()) / len(g)
        idx = {int(p): float(ps[p]) / int(pn[p]) - smean for p in ps.index}
        g = g.assign(adj=g["v"] - g["phase"].map(idx))
        g = g.sort_values(["ts", "adj"], kind="mergesort")
        l = b = 0.0
        for xi in g["adj"].to_numpy(np.float64):
            l, b = a11 * l + a12 * b + ca * xi, a21 * l + a22 * b + cb * xi
        last_es = int(g["es"].max())
        fp = ((last_es + 3600) % 86400) // 3600
        sx = idx.get(fp)
        if sx is None:
            continue  # inner join in the query drops unseen forecast phases
        rows.append(
            (
                str(uid),
                len(g),
                mic(l / 100.0),
                mic(b / 100.0),
                mic(sx / 100.0),
                mic((l + b + sx) / 100.0),
            )
        )
    df = pd.DataFrame(
        rows, columns=["series_id", "n", "level_u", "trend_u", "sidx_u", "fc1_u"]
    )
    return values_sql(df, {"series_id"})


def golden_holt_winters_events():
    """Sequential numpy twin of entry_queries.q_holt_winters_events.

    Full additive Holt-Winters (alpha=0.3, beta=0.1, gamma=0.2, 24
    hour-of-day phases) run single-process per series over the
    (ts, value)-sorted cents stream with zero-init state — the exact
    recurrence tsanalytics.holt_winters_fit decomposes into (m+2)-dim
    matrix carries; same +1e-9 micros bias as golden_holt_events.
    """
    al, be, ga = 0.3, 0.1, 0.2
    e = pd.read_parquet(f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"])
    e["v"] = np.floor(e["value"].to_numpy(np.float64) * 100 + 0.5)
    e["es"] = e["ts"].astype("datetime64[s]").astype("int64")

    def mic(v):
        return int(math.floor((v + 1e-9) * 1e6 + 0.5))

    rows = []
    for uid, g in e.sort_values(["ts", "v"], kind="mergesort").groupby("user_id"):
        es = g["es"].to_numpy(np.int64)
        ph = (es % 86400) // 3600
        l = b = 0.0
        sv = np.zeros(24)
        for yi, j in zip(g["v"].to_numpy(np.float64), ph):
            lp, bp = l, b
            l = al * (yi - sv[j]) + (1 - al) * (lp + bp)
            b = be * (l - lp) + (1 - be) * bp
            sv[j] = ga * (yi - lp - bp) + (1 - ga) * sv[j]
        last_es = int(es.max())
        fp = ((last_es + 3600) % 86400) // 3600
        sx = float(sv[fp])
        rows.append(
            (
                str(uid),
                len(g),
                mic(l / 100.0),
                mic(b / 100.0),
                mic(sx / 100.0),
                mic((l + b + sx) / 100.0),
            )
        )
    df = pd.DataFrame(
        rows, columns=["series_id", "n", "level_u", "trend_u", "snext_u", "fc1_u"]
    )
    return values_sql(df, {"series_id"})


def golden_dtw_events():
    """Numpy twin of entry_queries.q_dtw_events_1h: 1h cents tier
    assembled in pandas, all 28 ordered pairs of the 8 lowest user ids,
    shared dtw_local DP (radius 24).  Integer cents -> exact distances."""
    from afspark.operators.dtw import dtw_local

    e = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"]
    )
    v = np.floor(e["value"].to_numpy(np.float64) * 100 + 0.5)
    be = (e["ts"].to_numpy("datetime64[s]").astype(np.int64) // 3600) * 3600
    t = pd.DataFrame(
        {"u": e["user_id"].to_numpy(np.int64), "be": be, "v": v}
    ).groupby(["u", "be"], sort=True)["v"].sum().reset_index()
    seqs = {
        int(u): g.sort_values("be")["v"].to_numpy(np.float64)
        for u, g in t.groupby("u")
    }
    ids = sorted(seqs)[:8]
    rows = []
    for i, a in enumerate(ids):
        for b in ids[i + 1:]:
            d = dtw_local(seqs[a], seqs[b], radius=24)
            rows.append(
                (str(a), str(b), len(seqs[a]), len(seqs[b]), int(d))
            )
    df = pd.DataFrame(rows, columns=["sa", "sb", "n_a", "n_b", "dtw_c"])
    return values_sql(df, {"sa", "sb"})


def golden_dominant_period():
    """Numpy twin of entry_queries.q_dominant_period_1h: pandas 1h cents
    tier through the SAME dominant_period_local as the Spark path."""
    from afspark.operators.periodogram import dominant_period_local

    e = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"]
    )
    v = np.floor(e["value"].to_numpy(np.float64) * 100 + 0.5)
    be = (e["ts"].to_numpy("datetime64[s]").astype(np.int64) // 3600) * 3600
    t = pd.DataFrame(
        {"u": e["user_id"].to_numpy(np.int64), "be": be, "v": v}
    ).groupby(["u", "be"], sort=True)["v"].sum().reset_index()
    rows = []
    for u, g in t.groupby("u"):
        got = dominant_period_local(
            g["be"].to_numpy(np.int64), g["v"].to_numpy(np.float64), 3600
        )
        if got is not None:
            rows.append((str(u), *got))
    df = pd.DataFrame(
        rows, columns=["series_id", "n_grid", "k_peak", "period_s", "ratio_micros"]
    )
    return values_sql(df, {"series_id"})


def golden_matrix_profile():
    """Numpy twin of entry_queries.q_matrix_profile_1h: pandas 1h cents
    tier through the SAME matrix_profile_local kernel (m=24)."""
    from afspark.operators.matrixprofile import matrix_profile_local

    e = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"]
    )
    v = np.floor(e["value"].to_numpy(np.float64) * 100 + 0.5)
    be = (e["ts"].to_numpy("datetime64[s]").astype(np.int64) // 3600) * 3600
    t = pd.DataFrame(
        {"u": e["user_id"].to_numpy(np.int64), "be": be, "v": v}
    ).groupby(["u", "be"], sort=True)["v"].sum().reset_index()
    rows = []
    for u, g in t.groupby("u"):
        g = g.sort_values("be", kind="mergesort").reset_index(drop=True)
        got = matrix_profile_local(g["v"].to_numpy(np.float64), 24)
        if got is None:
            continue
        mp, nn = got
        di, mi = int(np.nanargmax(mp)), int(np.nanargmin(mp))
        rows.append(
            (
                str(u), len(g), int(mp.size),
                di, int(g["be"].iloc[di]),
                int(np.floor(mp[di] * 1e6 + 0.5)),
                mi, int(nn[mi]),
                int(np.floor(mp[mi] * 1e6 + 0.5)),
            )
        )
    df = pd.DataFrame(
        rows,
        columns=[
            "series_id", "n_buckets", "n_windows",
            "discord_idx", "discord_epoch", "discord_mp_u",
            "motif_idx", "motif_nn", "motif_mp_u",
        ],
    )
    return values_sql(df, {"series_id"})


def golden_asap_smooth():
    """Numpy twin of entry_queries.q_asap_smooth_1h: pandas 1h cents
    tier through the SAME asap_smooth_local kernel."""
    from afspark.operators.asap import asap_smooth_local

    e = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "ts", "value"]
    )
    v = np.floor(e["value"].to_numpy(np.float64) * 100 + 0.5)
    be = (e["ts"].to_numpy("datetime64[s]").astype(np.int64) // 3600) * 3600
    t = pd.DataFrame(
        {"u": e["user_id"].to_numpy(np.int64), "be": be, "v": v}
    ).groupby(["u", "be"], sort=True)["v"].sum().reset_index()
    rows = []
    for u, g in t.groupby("u"):
        g = g.sort_values("be", kind="mergesort").reset_index(drop=True)
        got = asap_smooth_local(g["v"].to_numpy(np.float64))
        if got is None:
            continue
        w, kr, rr, ko, ro, cs = got
        rows.append(
            (
                str(u), len(g), w,
                int(np.floor(kr * 1e6 + 0.5)), int(np.floor(rr * 1e6 + 0.5)),
                int(np.floor(ko * 1e6 + 0.5)), int(np.floor(ro * 1e6 + 0.5)),
                cs,
            )
        )
    df = pd.DataFrame(
        rows,
        columns=[
            "series_id", "n_buckets", "w_opt", "kurt_raw_u",
            "rough_raw_u", "kurt_opt_u", "rough_opt_u", "sma_checksum",
        ],
    )
    return values_sql(df, {"series_id"})


def golden_sdt_events():
    """Numpy twin of entry_queries.q_sdt_downsample_events: per-series
    swinging-door archive stats over the (ts, event_id)-ordered cents
    stream with the 1-based seq clock; reconstruction tolerance 2000
    cents (the operator runs doors at half-width 1000)."""
    from afspark.operators.sdt import sdt_mask

    e = pd.read_parquet(
        f"{SF_DIR}/events.parquet", columns=["user_id", "event_id", "ts", "value"]
    )
    rows = []
    for uid, g in e.sort_values(["ts", "event_id"], kind="mergesort").groupby(
        "user_id"
    ):
        v = np.floor(g["value"].to_numpy(np.float64) * 100 + 0.5)
        n = len(v)
        t = np.arange(1, n + 1, dtype=np.float64)
        m = sdt_mask(t, v, 1000.0)
        seq = np.arange(1, n + 1, dtype=np.int64)[m]
        vk = v[m].astype(np.int64)
        rows.append(
            (str(uid), n, int(m.sum()), int(vk.sum()),
             int((seq * (vk % 1009)).sum()))
        )
    df = pd.DataFrame(
        rows, columns=["series_id", "n_in", "n_kept", "sum_kept_c", "pos_check"]
    )
    return values_sql(df, {"series_id"})


def main():
    goldens = {
        "score_kernels_docs": golden_kernels_docs(),
        "score_psd_docs": golden_psd_docs(),
        "score_impulse_sas_events": golden_impulse_sas_events(),
        "score_freq_contours_docs": golden_freq_contours_docs(),
        "ivf_recall_check": golden_ivf_recall(),
        "holt_forecast_events": golden_holt_events(),
        "seasonal_holt_events": golden_seasonal_holt_events(),
        "holt_winters_events": golden_holt_winters_events(),
        "pq_recall_check": golden_pq_recall(),
        "dtw_events_1h": golden_dtw_events(),
        "dominant_period_1h": golden_dominant_period(),
        "matrix_profile_1h": golden_matrix_profile(),
        "asap_smooth_1h": golden_asap_smooth(),
        "sdt_downsample_events": golden_sdt_events(),
    }
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "afspark", "entry_goldens.py",
    )
    with open(path, "w") as f:
        f.write('"""GENERATED by tools/gen_goldens.py — do not edit by hand.\n\n')
        f.write(f"VALUES-literal golden oracles computed by the local numpy twin\n")
        f.write(f"(functions/kernels.py:score_local) over {SF_DIR}.  Valid ONLY for\n")
        f.write(f"that scale factor; the driver's correctness gate runs at sf0.01.\n")
        f.write('"""\n\n')
        f.write(f'GOLDEN_SF = "{SF_NAME}"\n\n')
        f.write("GOLDEN_SQL = {\n")
        for name, sql in goldens.items():
            f.write(f'    "{name}": """{sql}""",\n')
        f.write("}\n")
    for name, sql in goldens.items():
        print(f"{name}: {sql.count(chr(10)) - 4} golden rows")
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
