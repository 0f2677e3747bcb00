"""Order-of-magnitude stress of the LSH dedup path (round-5 task #5).

Runs the two production dedup flows — full-corpus ``minhash_lsh_dedup_pairs``
(self-dedup) and ``incremental_dedup_pairs`` (daily batch vs persisted
index) — on a synthetic documents table at 1x (= the sf0.1 corpus size,
5,000 docs) and 10x (50,000 docs), each scale in its OWN subprocess
(fresh JVM, no cache leakage), and reports:

* wall time + docs/s throughput per flow per scale, and the 10x/1x
  throughput ratio (near-linear == ratio ~ 1.0; the LSH pipeline is
  O(total shingles) + O(candidate pairs), so ratio < 1 measures the
  superlinear candidate tail, not the core),
* hot-bucket occupancy (max bucket size, #buckets above the default
  max_bucket=200 cap) — the cap is what bounds the quadratic per-bucket
  pair fan-out; the stress proves the default survives 10x,
* peak per-stage and total shuffle write/read bytes (Spark UI REST API;
  spark.ui.enabled is flipped on just for this tool) — "peak shuffle"
  is the number that must fit the executor fleet at 100 TB.

The corpus is generated DETERMINISTICALLY in Catalyst (xxhash64-seeded
token salad over a fixed vocab, 40-79 tokens/doc ~ the sf0.1 shape) with
a planted 2% near-dup rate (every id % 50 == 1 doc is its predecessor's
body + a 1-token tail, Jaccard >~ 0.9 under char-8 shingles) — the SAME
generative distribution at both scales, so dup density does not drift
with n and the comparison isolates engine scaling.

Usage: python tools/bench_dedup_scale.py [base_n] [scales...]
       (defaults: base_n=5000, scales 1 10; writes a section into
        BENCH/BASELINE.md with --write)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
from datetime import datetime, timezone

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

CHILD = r"""
import json, sys, time, urllib.request
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from afspark.operators import dedup
from afspark.session import get_session

n_docs = {n_docs}
spark = get_session(app_name=f"afspark-dedup-stress-{{n_docs}}",
                    extra_conf={{"spark.ui.enabled": "true"}})

VOCAB = [
    "key", "agg", "row", "scan", "slow", "fast", "table", "value", "part",
    "hash", "merge", "batch", "spark", "order", "data", "column", "join",
    "small", "line", "customer", "query", "big", "vector", "window",
    "group", "filter", "sort", "the", "a", "crawl", "page", "token",
    "shard", "bucket", "tier", "chunk", "series", "epoch", "index",
    "store", "cache", "spill", "probe", "build", "plan", "stage", "task",
    "node", "rack", "codec", "frame", "block", "span", "edge", "rank",
    "site", "host", "path", "fetch", "parse", "clean", "score", "dedup",
]

def gen_docs(n):
    # body seed: near-dup plants (id % 50 == 1) reuse the predecessor's
    # seed, then get a distinct 1-token tail -> Jaccard >~ 0.9.
    # Boilerplate cluster (id % 200 == 3, disjoint from the plants): ALL
    # share one template body -> one LSH bucket per band; at 1x the
    # cluster (n/200 docs) is under the max_bucket=200 cap, at 10x it is
    # over, so the stress exercises BOTH sides of the cap.
    ids = spark.range(n).select(F.col("id").alias("doc_id"))
    is_copy = F.col("doc_id") % 50 == 1
    is_boiler = F.col("doc_id") % 200 == 3
    gid = (
        F.when(is_boiler, F.lit(999_999_999))
        .when(is_copy, F.col("doc_id") - 1)
        .otherwise(F.col("doc_id"))
    )
    ntok = (F.pmod(F.xxhash64(gid, F.lit(7)), F.lit(40)) + 40).cast("int")
    tok = lambda j: F.element_at(
        F.array(*[F.lit(w) for w in VOCAB]),
        (F.pmod(F.xxhash64(gid, j), F.lit(len(VOCAB))) + 1).cast("int"),
    )
    body = F.array_join(
        F.transform(F.sequence(F.lit(1), ntok), tok), " "
    )
    text = F.when(
        is_copy | is_boiler,
        F.concat(body, F.lit(" v"), F.col("doc_id").cast("string")),
    ).otherwise(body)
    return ids.select("doc_id", text.alias("text")).repartition(32)

def shuffle_stats(reset_to=None):
    app = spark.sparkContext.applicationId
    url = spark.sparkContext.uiWebUrl
    data = json.load(urllib.request.urlopen(
        f"{{url}}/api/v1/applications/{{app}}/stages?status=complete"))
    ids = set()
    tw = tr = pk = 0
    for s in data:
        sid = (s["stageId"], s["attemptId"])
        ids.add(sid)
        if reset_to is not None and sid in reset_to:
            continue
        tw += s.get("shuffleWriteBytes", 0)
        tr += s.get("shuffleReadBytes", 0)
        pk = max(pk, s.get("shuffleWriteBytes", 0))
    return ids, {{"shuffle_write_b": tw, "shuffle_read_b": tr,
                  "peak_stage_write_b": pk}}

docs = gen_docs(n_docs)
docs = docs.persist()
docs.count()  # warm: materialize input outside the timed region

out = {{"n_docs": n_docs}}

# -- flow A: full self-dedup ------------------------------------------------
seen, _ = shuffle_stats()
t0 = time.monotonic()
pairs = dedup.minhash_lsh_dedup_pairs(docs, threshold=0.7).count()
out["lsh_self"] = {{"sec": round(time.monotonic() - t0, 3), "pairs": pairs}}
seen2, sh = shuffle_stats(reset_to=seen)
out["lsh_self"].update(sh)

# -- hot-bucket occupancy under the default banding -------------------------
idx = dedup.build_lsh_index(docs)
occ = idx.groupBy("band", "bh").count()
row = occ.agg(
    F.max("count").alias("max_bucket"),
    F.sum((F.col("count") > 200).cast("long")).alias("buckets_over_cap"),
    F.count(F.lit(1)).alias("n_buckets"),
).collect()[0]
out["buckets"] = {{"max_bucket": row.max_bucket,
                   "over_cap_200": row.buckets_over_cap,
                   "n_buckets": row.n_buckets}}

# -- flow B: incremental batch-vs-index -------------------------------------
corpus = docs.filter(F.col("doc_id") % 10 != 0)
batch = docs.filter(F.col("doc_id") % 10 == 0)
index = dedup.build_lsh_index(corpus).persist()
index.count()  # the index is the PERSISTED artifact; build is not the flow
# fresh snapshot HERE: resetting to seen2 would charge the occupancy
# probe and the index build/persist stages to the incremental flow
seen3, _ = shuffle_stats()
t0 = time.monotonic()
ipairs = dedup.incremental_dedup_pairs(index, corpus, batch).count()
out["incremental"] = {{"sec": round(time.monotonic() - t0, 3),
                       "pairs": ipairs}}
_, sh = shuffle_stats(reset_to=seen3)
out["incremental"].update(sh)

print("CHILD_JSON " + json.dumps(out))
"""


def run_scale(n_docs: int) -> dict:
    env = dict(os.environ)
    env.setdefault("SPARK_GRAFT_CPUS", "32")
    proc = subprocess.run(
        [sys.executable, "-c", CHILD.format(repo=REPO, n_docs=n_docs)],
        capture_output=True, text=True, env=env, timeout=3600,
    )
    for line in proc.stdout.splitlines():
        if line.startswith("CHILD_JSON "):
            return json.loads(line[len("CHILD_JSON "):])
    raise RuntimeError(
        f"child failed for n={n_docs}:\n{proc.stdout[-2000:]}\n{proc.stderr[-4000:]}"
    )


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    base_n = int(args[0]) if args else 5000
    scales = [int(a) for a in args[1:]] or [1, 10]
    results = {s: run_scale(base_n * s) for s in scales}
    lo, hi = min(scales), max(scales)
    summary = {"base_n": base_n, "scales": results}
    for flow in ("lsh_self", "incremental"):
        th = {s: results[s]["n_docs"] / results[s][flow]["sec"] for s in scales}
        summary[f"{flow}_docs_per_s"] = {s: round(th[s], 1) for s in scales}
        summary[f"{flow}_throughput_ratio_{hi}x_vs_{lo}x"] = round(
            th[hi] / th[lo], 3
        )
    print(json.dumps(summary, indent=2, default=str))
    if "--write" in sys.argv:
        stamp = datetime.now(timezone.utc).strftime("%Y-%m-%d %H:%MZ")
        r1, rh = results[lo], results[hi]
        lines = [
            "",
            f"## Dedup-path 10x stress ({stamp}, tools/bench_dedup_scale.py)",
            "",
            f"Synthetic corpus, same generative distribution at both scales "
            f"(planted 2% near-dups); local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}], "
            f"fresh JVM per scale.",
            "",
            "| flow | n_docs | sec | pairs | docs/s | peak stage shuffle | total shuffle W |",
            "|---|---|---|---|---|---|---|",
        ]
        for s in (lo, hi):
            r = results[s]
            for flow in ("lsh_self", "incremental"):
                f = r[flow]
                lines.append(
                    f"| {flow} | {r['n_docs']:,} | {f['sec']} | {f['pairs']:,} "
                    f"| {r['n_docs'] / f['sec']:,.0f} "
                    f"| {f['peak_stage_write_b'] / 1e6:,.1f} MB "
                    f"| {f['shuffle_write_b'] / 1e6:,.1f} MB |"
                )
        lines += [
            "",
            f"Throughput ratio {hi}x vs {lo}x: "
            f"lsh_self {summary[f'lsh_self_throughput_ratio_{hi}x_vs_{lo}x']}, "
            f"incremental {summary[f'incremental_throughput_ratio_{hi}x_vs_{lo}x']} "
            f"(1.0 = perfectly linear).",
            f"Hot buckets at {hi}x: max occupancy {rh['buckets']['max_bucket']} "
            f"({lo}x: {r1['buckets']['max_bucket']}), "
            f"{rh['buckets']['over_cap_200']} bucket(s) above the default "
            f"max_bucket=200 cap out of {rh['buckets']['n_buckets']:,} "
            f"({lo}x: {r1['buckets']['over_cap_200']}) — the planted "
            f"boilerplate cluster sits UNDER the cap at {lo}x (its pairs are "
            f"emitted) and OVER it at {hi}x (its quadratic fan-out is "
            f"suppressed by the broadcast anti-join, visible in the pair "
            f"counts). Bounded work on degenerate boilerplate is the designed "
            f"trade; no OOM, no skew stall.",
            "",
        ]
        with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "a") as fh:
            fh.write("\n".join(lines))
        print("wrote BENCH/BASELINE.md section")


if __name__ == "__main__":
    main()
