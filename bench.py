#!/usr/bin/env python3
"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec for the slowest 15 + shared stages},
"qt": [sec for EVERY registered query, positional — qt[i] is the time of
the i-th name in sorted(entry.queries().keys())], "sf": ...}.

Each query is fully materialized through the noop sink — every projected
column is computed executor-side with no driver row transfer.  A bare
count() action would let Catalyst prune computed projections entirely
(non-aggregating queries would time little more than a row count).

The JSON line is compact-separated and kept under the driver's 2000-char
tail window so round-over-round regression comparison stays mechanical;
per-query detail and the streaming pipeline breakdown go to stderr.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Headline set: the reference-surface pipelines + one representative of each
# operator family (join-heavy, analytic-window, dedup, similarity).
HEADLINE = [
    "hot_items_topn",
    "hot_media_tumbling_count",
    "session_window_count",
    "json_parse_project",
    "avg_value_by_type",
    "q3_shipping_priority",
    "asof_join_last_error",
    "dedup_minhash_lsh",
    "embedding_cosine_topk",
    "text_tfidf_top_terms",
    "corpus_curation_pipeline",
]

# The 8 most expensive registered queries (r6 ranking): ALSO measured in a
# fresh JVM each, min-of-3, after the sweep.  Rationale (r5 verdict item
# 5): the in-sweep numbers ride a JVM that just ran 170+ queries — GC and
# code-cache pressure plus host variance (±25% observed between rounds)
# dominate round-over-round deltas on exactly the lines where regressions
# matter most.  The isolated numbers are directly comparable across
# rounds; BENCH records both ("queries"/"qt" = in-sweep, "iso" =
# fresh-JVM).  Isolated runs build cold caches (shared dedup stages
# included), so iso >= in-sweep for shared-stage consumers is expected.
ISOLATED_TOP = [
    # regenerated from the round-8 final sweep's top-8 (shared-stage
    # accounting lines excluded), heaviest first so a budget cut drops
    # the LIGHTEST line, never the heaviest (the r6 failure: the iso
    # budget went to a 1.35 s line while the 7.99 s line went unmeasured).
    # embedding_ivfpq_sampled_search is the PRODUCTION sampled-train
    # IVF-PQ line (r9 split the recall-vs-truth audit out into
    # embedding_ivfpq_sampled_train, which shares this query's memoized
    # codebooks and therefore stays OUT of this list — the same
    # memoized-consumer exclusion as corpus_dup_span_coverage below);
    # dedup_simhash_clusters is the w64 implementation since r8 (the
    # retired w32 form led this list).
    # corpus_dup_span_coverage is EXCLUDED despite its 6.1 s in-sweep
    # cost: its coverage table is session-memoized, so --one's min-of-3
    # reads the first rep's cache and reports ~0.04 s — a shared-stage
    # accounting line, not an isolatable one (the in-sweep number is the
    # honest cost; same exclusion rule as r7's shared dedup stages).
    "embedding_ivfpq_sampled_search",
    "corpus_dedup_cascade_audit",
    "dedup_clusters_incremental",
    "dedup_simhash_clusters",
    "graph_components_knn",
    "graph_ppr_suppliers",
    "graph_kcore_trade",
    "graph_pagerank_trade",
]


# Session memo caches a query OWNS for pricing purposes: --one clears
# these between reps so min-of-3 includes the owned work every rep.
# Without this, rep 1 trains and reps 2-3 read the memo — the min prices
# a TRAINING operator as if codebooks were free (the r9 split of
# embedding_ivfpq_sampled_search exists precisely to surface training
# cost).  Caches NOT listed stay warm by design: they model persisted
# artifacts the operator reads, not work it performs (e.g. the audit
# query reads the production codebooks; _shared_clusters consumers pay
# marginal cost — the sweep prices those stages as their own lines).
_OWNED_CACHES: dict[str, tuple[str, ...]] = {
    "embedding_ivfpq_sampled_search": ("_SAMPLED_BOOKS_CACHE",),
}


def run_one(name: str, reps: int = 3) -> None:
    """`bench.py --one NAME [REPS]`: fresh-process min-of-REPS (default 3)
    of a single query, emitting one JSON line {"name": ..., "sec": ...}.
    Invoked by the parent sweep for ISOLATED_TOP; usable standalone for
    controlled A/B of a query under tuning."""
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    import __spark_entry__ as entry
    from test_flink_spark.plans import llm_data
    from test_flink_spark.session import get_spark

    spark = get_spark("bench-one")
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    fn = entry.queries()[name]
    best = float("inf")
    for _ in range(reps):
        for cache_attr in _OWNED_CACHES.get(name, ()):
            # unpersists any pinned DataFrame entries before dropping
            # (no-op for the codebook tuples _SAMPLED_BOOKS_CACHE holds)
            llm_data.release_pinned_cache(getattr(llm_data, cache_attr))
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
        best = min(best, time.perf_counter() - t0)
    print(json.dumps({"name": name, "sec": round(best, 2)}))


def isolated_timings(names: list[str]) -> dict[str, float]:
    """Spawn `bench.py --one NAME` per query; collect {name: best_sec}.
    Each subprocess is its own JVM — no shared GC/code-cache history.
    Failures degrade to omission (the sweep numbers still cover the
    query).

    Wall-budgeted: external harnesses clamp the WHOLE bench run, and a
    clamp kill mid-isolated-phase would lose the one-JSON-line output
    entirely (sweep included).  `SPARK_GRAFT_BENCH_ISO_BUDGET` seconds
    (default 340) bound this phase: once spent, remaining names are
    skipped with a stderr note — partial iso evidence beats a dead
    process.

    Coverage vs depth (r12 verdict item 4: the 280 s budget ran out after
    7 of the 8 ISOLATED_TOP lines two rounds running, so
    graph_pagerank_trade had no cross-round-comparable number): the top-4
    (heaviest) lines keep min-of-3; the lighter tail runs min-of-2, and
    the default budget gains 60 s.  A min-of-2 line reads ~0-10% above
    what min-of-3 would report (one fewer draw from the noise
    distribution) — disclosed per line in the stderr note; all 8 lines
    reporting beats a third rep on the lightest four."""
    import subprocess

    budget = float(os.environ.get("SPARK_GRAFT_BENCH_ISO_BUDGET", "340"))
    t_start = time.perf_counter()
    out: dict[str, float] = {}
    for i, name in enumerate(names):
        elapsed = time.perf_counter() - t_start
        if elapsed > budget:
            skipped = names[i:]
            print(
                f"# iso budget ({budget:.0f}s) spent after {i} queries; "
                f"skipping {len(skipped)}: {', '.join(skipped)}",
                file=sys.stderr,
            )
            break
        reps = 3 if i < 4 else 2
        try:
            proc = subprocess.run(
                [
                    sys.executable,
                    os.path.abspath(__file__),
                    "--one",
                    name,
                    str(reps),
                ],
                capture_output=True, text=True,
                timeout=max(60.0, budget - elapsed),
            )
            line = proc.stdout.strip().splitlines()[-1]
            rec = json.loads(line)
            out[rec["name"]] = rec["sec"]
            print(
                f"# iso {name}: {rec['sec']:.2f}s (min-of-{reps})",
                file=sys.stderr,
            )
        except Exception as e:  # noqa: BLE001 — auxiliary evidence
            print(f"# iso {name} failed: {e}", file=sys.stderr)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").rsplit("sf", 1)[-1]

    import __spark_entry__ as entry
    from test_flink_spark.session import get_spark

    spark = get_spark("bench")
    # Warm the JVM/codegen paths once so the first measured query doesn't
    # pay JIT + classloading (we measure engine throughput, not startup).
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.createDataFrame([("w", 1.0)], "k STRING, v DOUBLE").groupBy("k").sum("v").collect()

    qs = entry.queries()
    names = [n for n in HEADLINE if n in qs] + [
        n for n in sorted(qs) if n not in HEADLINE
    ]

    # Streaming throughput FIRST: measured after the 100+-query sweep it
    # loses up to 40% to accumulated GC/JIT pressure (22k vs 39k ev/s,
    # round-4 measurement); in a warm-but-quiet JVM it reflects the
    # pipeline, not the harness history.
    stream_out = {}
    # One UNRECORDED warm-up run first, at FULL measurement volume (r13):
    # batch warmup doesn't touch the micro-batch execution paths, and
    # streaming-operator JIT + state-store warmup keeps ramping through a
    # 40k warm-up — measured post-40k-warm-up runs still climbed
    # 49k -> 59k -> 72k ev/s within one session, while after one full
    # 400k warm-up two consecutive median-of-3 measurements read 69,299
    # and 69,215 ev/s (0.1% apart, within-run spread 9-11%).  ~6 s buys
    # a reportable number.
    try:
        streaming_throughput(spark, n_events=400_000)
    except Exception as e:  # noqa: BLE001
        print(f"# streaming warm-up failed: {e}", file=sys.stderr)
    # median-of-3 measured runs at 400k events (r12 verdict item 5: the
    # old best-of-2 at 200k spread 16k-52k ev/s on identical code —
    # micro-batch/state-store warmup dominated the measurement; doubling
    # the volume amortizes the per-run fixed cost and the median of three
    # is robust to one contended run).  The spread (max-min)/median rides
    # along so a reader can judge the number's stability.  Each run is
    # individually guarded so a transient failure on one attempt never
    # discards valid measurements from the others.
    stream_runs = []
    for _ in range(3):
        try:
            stream_runs.append(streaming_throughput(spark, n_events=400_000))
        except Exception as e:  # noqa: BLE001 — throughput is auxiliary evidence
            print(f"# streaming run failed: {e}", file=sys.stderr)
    if stream_runs:
        rates = sorted(s["events_per_sec"] for s in stream_runs)
        med = rates[len(rates) // 2]
        for s in stream_runs:
            print(f"# streaming: {json.dumps(s)}", file=sys.stderr)
        stream_out["stream_eps"] = med
        stream_out["stream_eps_spread_pct"] = round(
            100.0 * (rates[-1] - rates[0]) / med, 1
        )
    else:
        print("# streaming bench skipped: all runs failed", file=sys.stderr)

    # min over reps: rep 1 pays plan compilation + codegen JIT for that plan
    # shape; the min approximates steady-state engine time (what a resident
    # service or repeated production query sees).
    reps = int(os.environ.get("SPARK_GRAFT_BENCH_REPS", "2"))
    timings: dict[str, float] = {}

    # One-time capped pair base (the localCheckpointed inverted-index
    # self-join every exact-Jaccard/containment consumer reads —
    # _shared_pair_base), timed as its OWN line (r12: previously SIX
    # queries each re-ran the identical shingle pass + doc-frequency cap +
    # self-join; now the build runs once per session and consumers report
    # marginal cost, the production accounting — a pipeline persists its
    # pair table per ingest).  Measured FIRST so the shared-clusters line
    # below prices the CC propagation, not the pair join.
    from test_flink_spark.plans.llm_data import (
        _PAIR_BASE_CACHE,
        _shared_pair_base,
        release_pinned_cache,
    )

    best = float("inf")
    for _ in range(reps):
        # unpersist-then-clear (r12 ADVICE): a bare clear() left each
        # superseded rep's eagerly-checkpointed pair table pinned until
        # ContextCleaner GC
        release_pinned_cache(_PAIR_BASE_CACHE)
        t0 = time.perf_counter()
        _shared_pair_base(spark, sf_dir)  # eager localCheckpoint materializes
        best = min(best, time.perf_counter() - t0)
    timings["dedup_pair_base_build"] = round(best, 2)
    print(
        f"# dedup_pair_base_build: {timings['dedup_pair_base_build']:.2f}s",
        file=sys.stderr,
    )

    # One-time shared dedup stage (the localCheckpointed connected-components
    # result consumed by dedup_clusters + the curation/build queries), timed
    # as its OWN line: previously the full propagation price landed on
    # whichever consumer ran first, making dedup_clusters look regressed
    # while every other consumer looked free.  Consumers below now report
    # marginal cost, the production accounting (a pipeline computes its
    # dedup stage once; downstream queries read it).
    from test_flink_spark.plans.llm_data import _CLUSTERS_CACHE, _shared_clusters

    best = float("inf")
    for _ in range(reps):
        release_pinned_cache(_CLUSTERS_CACHE)
        t0 = time.perf_counter()
        _shared_clusters(spark, sf_dir)  # eager localCheckpoint materializes
        best = min(best, time.perf_counter() - t0)
    timings["dedup_shared_stage"] = round(best, 2)
    print(f"# dedup_shared_stage: {timings['dedup_shared_stage']:.2f}s", file=sys.stderr)

    # Same accounting for the incremental-dedup corpus band index (the
    # persisted artifact an ingest pipeline reads, not rebuilds): its own
    # line; dedup_incremental_shard below reports marginal ingest cost.
    from test_flink_spark.plans.llm_data import (
        _SHARD_INDEX_CACHE,
        _shard_corpus_index,
    )

    best = float("inf")
    for _ in range(reps):
        release_pinned_cache(_SHARD_INDEX_CACHE)
        t0 = time.perf_counter()
        _shard_corpus_index(spark, sf_dir)
        best = min(best, time.perf_counter() - t0)
    timings["dedup_index_build"] = round(best, 2)
    print(f"# dedup_index_build: {timings['dedup_index_build']:.2f}s", file=sys.stderr)

    for name in names:
        fn = qs[name]
        best = float("inf")
        for _ in range(reps):
            t0 = time.perf_counter()
            # noop sink: full materialization of every projected column
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 2)
        print(f"# {name}: {timings[name]:.2f}s", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    # Per-query transparency within the driver's 2000-char stdout tail
    # (r4 verdict item: folding hid two-thirds of the fleet from
    # round-over-round diffs).  Two encodings of the same data:
    #   "qt"      — seconds for EVERY registered query, as a positional
    #               array ordered by sorted(queries().keys());
    #               qt[i] belongs to sorted name i.  ~6 chars/query keeps
    #               the full 161-query fleet inside the tail window.
    #   "queries" — name→sec map for the SLOWEST entries plus the two
    #               shared-stage accounting lines (the regression-relevant
    #               subset, human-readable).
    registered = sorted(qs)
    qt = [timings[n] for n in registered if n in timings]
    slowest = dict(
        sorted(timings.items(), key=lambda kv: kv[1], reverse=True)[:15]
    )
    # the shared-stage accounting lines are not registry names, so qt
    # cannot carry them — always itemize them in the map
    for stage in ("dedup_pair_base_build", "dedup_shared_stage", "dedup_index_build"):
        if stage in timings:
            slowest[stage] = timings[stage]
    # 8-hex fingerprint of the sorted name list: lets compare_bench
    # verify the positional qt decode against the registry THAT RAN,
    # instead of trusting a length check (a rename or an add+remove
    # preserves count but silently shifts every later attribution).
    import hashlib

    qt_fp = hashlib.md5("|".join(registered).encode()).hexdigest()[:8]
    # Fresh-JVM min-of-3 for the heavy lines (see ISOLATED_TOP).  Opt out
    # with SPARK_GRAFT_BENCH_ISOLATED=0 for quick local iterations.
    iso: dict[str, float] = {}
    if os.environ.get("SPARK_GRAFT_BENCH_ISOLATED", "1") != "0":
        iso = isolated_timings([n for n in ISOLATED_TOP if n in qs])
    out = {
        "metric": "sum_query_seconds",
        "value": total,
        "unit": "sec",
        "queries": slowest,
        "qt": qt,
        "qt_order": "sorted(queries().keys())",
        "qt_fp": qt_fp,
        "sf": float(sf),
    }
    if iso:
        out["iso"] = iso
    out.update(stream_out)
    line = json.dumps(out, separators=(",", ":"))
    # Backstop if the line ever outgrows the tail window: shrink the
    # itemized map first (qt keeps every query's time regardless).
    while len(line) > 1950 and len(out["queries"]) > 1:
        q = out["queries"]
        fastest = min(q, key=q.get)
        out["folded_n"] = out.get("folded_n", 0) + 1
        out["folded_sec"] = round(out.get("folded_sec", 0.0) + q.pop(fastest), 2)
        line = json.dumps(out, separators=(",", ":"))
    print(line)


def streaming_throughput(spark, n_events: int = 200_000):
    """End-to-end micro-batch throughput of the HotItemAnalysis streaming
    pipeline (CSV parse → filter → watermark → 1 h/5 min sliding count):
    events/sec through Structured Streaming with a memory sink.

    Context for the number: the reference runs at parallelism 1
    (HotItemAnalysis.java:66) with per-record JSON/CSV parsing, so its
    ceiling is one core's parse rate; this measures the same logical
    pipeline across all local cores.
    """
    import shutil
    import tempfile

    from test_flink_spark.pipelines.hot_items import behavior_counts
    from test_flink_spark.sources.files import text_lines

    d = tempfile.mkdtemp(prefix="tfs-bench-stream-")
    try:
        src = os.path.join(d, "src")
        os.makedirs(src)
        per_file = n_events // 4
        row_id = 0
        for f in range(4):
            lines = []
            for _ in range(per_file):
                t = 1_000_000 + row_id * 3  # ascending seconds
                lines.append(f"{row_id},{row_id % 997},7,pv,{t}")
                row_id += 1
            with open(os.path.join(src, f"b{f}.csv"), "w") as fh:
                fh.write("\n".join(lines) + "\n")
        counts = behavior_counts(text_lines(spark, src, streaming=True), streaming=True)
        q = (
            counts.writeStream.queryName("bench_stream")
            .format("memory")
            .outputMode("append")
            .option("checkpointLocation", os.path.join(d, "ckpt"))
            .start()
        )
        t0 = time.perf_counter()
        q.processAllAvailable()
        elapsed = time.perf_counter() - t0
        q.stop()
        emitted = spark.table("bench_stream").count()
        return {
            "pipeline": "hot_items behavior_counts (sliding 1h/5m)",
            "events": row_id,
            "wall_sec": round(elapsed, 3),
            "events_per_sec": round(row_id / elapsed),
            "rows_emitted": emitted,
        }
    finally:
        shutil.rmtree(d, ignore_errors=True)


if __name__ == "__main__":
    if len(sys.argv) >= 3 and sys.argv[1] == "--one":
        run_one(sys.argv[2], int(sys.argv[3]) if len(sys.argv) >= 4 else 3)
    else:
        main()
