"""Benchmark runner — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is fully materialized via the `noop` sink (forces every
operator to execute without collect() driver overhead).

The driver records only the LAST ~2000 bytes of stdout; round 4's
93-query line overflowed that window and the head was cut
(BENCH_r04.json "parsed": null — VERDICT r4 "What's wrong" #2). The
stdout line is therefore byte-budgeted: the FULL per-query table is
written to BENCH_DETAIL.json next to this script, and the printed
"queries" dict always carries the round-1 baseline set (the judge's
contract anchor) first, then as many more queries as fit under the
budget; "n_queries"/"detail" say where the rest live.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from debgpt7_8_with_vectordb_spark.session import get_spark  # noqa: E402

_REPO_DIR = os.path.dirname(os.path.abspath(__file__))

# fallback when BASELINE.json lacks (or loses) the machine-readable map
_REBASE_FALLBACK = {
    "html_strip": "r7",
    "multimodal_decode": "r8",
    "image_pixels": "r8",
    "audio_metadata": "r8",
    "video_metadata": "r8",
}


def load_rebase_map() -> dict[str, str]:
    """query -> earliest valid anchor round, from BASELINE.json's
    ``anchor_rebase`` key (VERDICT r8 #5: the rebase map must live in
    the machine-readable baseline, not only in BENCH stdout). Queries
    absent from the map anchor at their first recorded round."""
    try:
        with open(os.path.join(_REPO_DIR, "BASELINE.json")) as fh:
            m = json.load(fh).get("anchor_rebase", {})
        return {
            str(k): str(v)
            for k, v in m.items()
            if not str(k).startswith("_") and re.fullmatch(r"r\d+", str(v))
        }
    except (OSError, ValueError, AttributeError):
        return dict(_REBASE_FALLBACK)


def normalize_vs_anchor(
    vs_anchor: dict[str, float], anchors: dict[str, dict], calib_sec: float
) -> dict[str, float]:
    """Machine-speed-normalized anchor ratios (VERDICT r11 #1): the 2x
    anchor contract is GATED on these; the raw ratios stay reported. A
    wall measured on a box running 1.5x slower than the anchor-era box
    is not a regression — normalize both sides by their calib_sec:

      vs_calib = (wall_now / calib_now) / (wall_anchor / calib_anchor)
               = raw_ratio * calib_anchor / calib_now

    Queries whose anchor round has no calib entry (or a non-positive
    current calib) are left out — the raw table still carries them."""
    if not calib_sec or calib_sec <= 0:
        return {}
    return {
        q: round(r * anchors[q]["calib"] / calib_sec, 3)
        for q, r in vs_anchor.items()
        if "calib" in anchors.get(q, {})
    }


def _median(values) -> float | None:
    vals = sorted(values)
    return round(vals[len(vals) // 2], 3) if vals else None


def load_anchor_calib() -> dict[str, float]:
    """round ("rN") -> calib_sec of the box that recorded that round's
    BENCH line, from BASELINE.json's ``anchor_calib`` key (VERDICT r11
    #1: the 2x anchor contract is adjudicated machine-speed-normalized;
    r10+ calibs are recorded, r1-r9 inferred — provenance documented in
    the map's _comment)."""
    try:
        with open(os.path.join(_REPO_DIR, "BASELINE.json")) as fh:
            m = json.load(fh).get("anchor_calib", {})
        return {
            str(k): float(v)
            for k, v in m.items()
            if not str(k).startswith("_") and float(v) > 0
        }
    except (OSError, ValueError, AttributeError, TypeError):
        return {}


def _bench_rounds() -> list[tuple[int, dict]]:
    """(round number, per-query seconds) for every recorded BENCH round,
    ascending."""
    out: list[tuple[int, dict]] = []
    for p in glob.glob(os.path.join(_REPO_DIR, "BENCH_r*.json")):
        m = re.search(r"BENCH_r0*(\d+)\.json$", p)
        if not m:
            continue
        try:
            with open(p) as fh:
                q = json.load(fh)["parsed"]["queries"]
        except (OSError, ValueError, KeyError, TypeError):
            continue
        if isinstance(q, dict):
            out.append((int(m.group(1)), q))
    # key on the round number only: padded+unpadded names can both
    # resolve to one round, and tuple sort would then compare the dicts
    return sorted(out, key=lambda t: t[0])


def resolve_anchors(names) -> dict[str, dict]:
    """Per-query perf anchor: the FIRST recorded BENCH value, starting
    at the rebase round when the query's semantics changed —
    ``{query: {"sec": s, "round": "rN"}}``."""
    rebase = load_rebase_map()
    rounds = _bench_rounds()
    calib = load_anchor_calib()
    anchors: dict[str, dict] = {}
    for q in names:
        floor = int(rebase[q][1:]) if q in rebase else 0
        for rn, table in rounds:
            if rn < floor:
                continue
            v = table.get(q)
            if isinstance(v, (int, float)):
                anchors[q] = {"sec": float(v), "round": f"r{rn}"}
                if f"r{rn}" in calib:
                    anchors[q]["calib"] = calib[f"r{rn}"]
                break
    return anchors

HEADLINE = [
    # retrieval / vector core
    "topk_retrieval",
    "topk_retrieval_filtered",
    "knn_join",
    "ann_ivf",
    "ann_ivf_kmeans",
    "ann_srp_lsh",
    "ann_srp_recall",
    "ann_pq",
    "ann_pq_recall",
    "ann_pq_rerank",
    "ann_ivfpq",
    "ann_recall_sweep",
    "vector_normalize",
    # relational / analytics
    "pricing_summary",
    "shipping_priority",
    "local_supplier_volume",
    "top_parts_by_revenue",
    "last_n_window",
    "sessionize_events",
    "asof_join",
    "range_join",
    "hypertable_rollup",
    "rolling_user_stats",
    "event_funnel",
    "retention_cohorts",
    "orders_rollup",
    "dual_store_join",
    # dedup suite
    "dedup_exact",
    "dedup_substring",
    "dedup_substring_clean",
    "dedup_minhash_lsh",
    "dedup_minhash_verified",
    "dedup_lsh_keep",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "dedup_simhash_pairs",
    "dedup_incremental",
    "dedup_incremental_neardup",
    "dedup_clusters",
    "dedup_recall",
    "dedup_recall_sampled",
    "minhash_fidelity",
    "embedding_neardup",
    "dedup_embedding_clusters",
    "sample_stratified",
    "sample_upweight",
    "domain_quota",
    "embedding_quantize",
    "embedding_gram",
    "embedding_pca_project",
    # text analytics / embedding
    "text_stats",
    "quality_score",
    "corpus_quantiles",
    "doc_fingerprint",
    "winnow_fingerprints",
    "fingerprint_overlap",
    "fingerprint_containment",
    "dedup_containment_keep",
    "pii_redact",
    "repetition_stats",
    "topk_ngrams",
    "tfidf_topterms",
    "quality_classifier",
    "quality_classifier_trained",
    "bpe_train_merges",
    "bpe_apply",
    "ngram_lm_score",
    "bm25_search",
    "contamination_check",
    "contamination_filter",
    "corpus_mixture",
    "hash_embedding",
    "provider_embedding",
    "html_strip",
    "section_split",
    "section_lookup",
    "rag_generate",
    "rag_generate_reverse",
    # dataflow / pipeline
    "chunk_documents",
    "binpack_chunks",
    "binpack_crossdoc",
    "pack_sequences",
    "multimodal_metadata",
    "multimodal_decode",
    "audio_metadata",
    "video_metadata",
    "frame_sample",
    "image_pixels",
    "ingest_messages",
    "source_router",
    "cached_fetch",
    "paginated_fetch",
    "sessionize_stream",
    "stream_windowed_topk",
    "stream_neardup_screen",
    "stream_event_funnel",
    "corpus_pipeline",
    # crawl-curation head (round 8: driver-oracled per VERDICT r7 #1)
    "gopher_signals",
    "c4_line_clean",
    "url_normalize",
    "registrable_domains",
    "curate_crawl",
    "sitemap_expand",
    "stream_curate",
    # mapreduce reduce loops (round-2: measure the de-funneled rounds)
    "mapreduce_echo",
    "mapreduce_echo_compact",
]


def _concurrent_load() -> list[str]:
    """Other heavyweight python work on this box (pytest / a second
    Spark driver / oracle sweeps). Round 7 measured concurrent pytest
    contaminating min-of-3 numbers by 1.3-1.7x — benches are only
    comparable machine-quiet, so the runner WAITS for quiet below and
    flags the JSON line when it can't get it."""
    import glob

    # my own ancestry (the driver harness shells mention these keywords
    # in their prompt text — argv matching alone would self-trigger)
    skip = set()
    pid = os.getpid()
    while pid > 1:
        skip.add(pid)
        try:
            stat = open(f"/proc/{pid}/stat").read()
            pid = int(stat.rsplit(")", 1)[1].split()[1])  # ppid
        except (OSError, ValueError, IndexError):
            break
    hot = []
    for p in glob.glob("/proc/[0-9]*/cmdline"):
        try:
            pid = int(p.split("/")[2])
            if pid in skip:
                continue
            argv = open(p, "rb").read().split(b"\x00")
        except (OSError, ValueError):
            continue
        if not argv or not argv[0]:
            continue
        exe = argv[0].rsplit(b"/", 1)[-1]
        if not (exe.startswith(b"python") or exe.startswith(b"java")):
            continue
        args = b" ".join(argv[1:]).decode("utf-8", "replace")
        if exe.startswith(b"java") or any(
            k in args
            for k in (
                "pytest", "check_oracle", "edge_gate", "fuzz_gate",
                "cold_sweep", "bench.py", "scale_",
            )
        ):
            hot.append(f"{pid}:{exe.decode()} {args[:70].strip()}")
    return hot


def calib_workload(spark) -> float:
    """THE machine-speed calibration workload: a FIXED pure-JVM job
    (codegen'd range sum + a small fixed shuffle), one timed run.
    min-of-3 is stamped on the bench line as calib_sec — it makes lines
    comparable ACROSS sessions (r10's quiet wall ran ~1.24x r9's
    uniformly, including untouched pure-JVM TPC-H queries, which only a
    box-speed reference can distinguish from a code regression).

    SINGLE SOURCE OF TRUTH (self-review r13): tools/calib_probe.py
    imports this so the SPARK_GRAFT_CALIB_BEST session probe and the
    in-run pre/post probes always measure the identical workload — the
    1.2x quiet gate in calib_quiet_verdict assumes they do."""
    t0 = time.time()
    spark.range(2_000_000_000).selectExpr("sum(id * 2 + 1)").collect()
    spark.range(4_000_000).selectExpr("id % 1000 AS k").groupBy(
        "k"
    ).count().count()
    return time.time() - t0


def calib_quiet_verdict(
    pre: float, post: float, session_best: "float | None"
) -> bool:
    """Self-verifying quietness (VERDICT r12 #2): a single
    point-in-time calib probe was measured mis-stating the query
    phase's degradation by 30%+ (a calib-1.719 session ran the sweep at
    raw median 0.949). The recorded line therefore carries BOTH a
    pre-sweep and a post-sweep probe and is quiet only when

    - the two probes agree within 25% (the box didn't shift speed
      mid-sweep), and
    - when a session-best probe is supplied (SPARK_GRAFT_CALIB_BEST —
      the standalone calibration taken before recording, per the
      bench-box protocol), the run's better probe is within 1.2x of it
      (the whole sweep didn't run on a uniformly degraded box).
    """
    if min(pre, post) <= 0:
        return False
    if max(pre, post) / min(pre, post) > 1.25:
        return False
    if session_best and session_best > 0:
        if min(pre, post) > 1.2 * session_best:
            return False
    return True


def wait_for_quiet(timeout_s: float = 180.0) -> bool:
    """Block until no concurrent heavy job is running (or timeout).
    Returns True when the machine is quiet."""
    deadline = time.time() + timeout_s
    while time.time() < deadline:
        hot = _concurrent_load()
        if not hot:
            return True
        print(
            f"bench: waiting for machine-quiet ({len(hot)} hot: "
            f"{hot[0]})",
            file=sys.stderr,
        )
        time.sleep(5)
    return not _concurrent_load()


def main() -> None:
    quiet = wait_for_quiet()
    if not quiet:
        print(
            "bench: WARNING — running under concurrent load; timings "
            "are not comparable to quiet runs",
            file=sys.stderr,
        )
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_dir.rstrip("/").split("sf")[-1]
    try:
        sf_val: float | str = float(sf)
    except ValueError:
        sf_val = sf

    from debgpt7_8_with_vectordb_spark.plans import QUERIES

    spark = get_spark(app_name="bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the session so q1 isn't charged for one-time costs that a
    # long-lived cluster never pays per-query: JVM/classloader startup,
    # parquet footer reads, codegen compiler, the Python worker pool
    # (Arrow path), and a first shuffle.
    import pyspark.sql.functions as F

    warm = spark.read.parquet(f"{sf_dir}/region.parquet")
    warm.groupBy("r_name").count().count()

    def _noop_batch(it):
        yield from it

    warm.mapInPandas(_noop_batch, schema=warm.schema).count()

    # spark.ml class loading (KMeans jars/codegen) — also one-time
    from pyspark.ml.clustering import KMeans
    from pyspark.ml.functions import array_to_vector

    tiny = spark.range(8).select(
        F.col("id"),
        array_to_vector(F.array(F.col("id").cast("double"), F.lit(1.0))).alias(
            "features"
        ),
    )
    KMeans(k=2, seed=1, maxIter=1, initMode="random").fit(tiny)

    calib_pre = round(min(calib_workload(spark) for _ in range(3)), 3)

    # min-of-N per query (default 3 since round 7 — VERDICT r6 #3: two
    # queries drifted two rounds running under min-of-2; N=3 plus the
    # per-run spread recorded in BENCH_DETAIL.json separates timing
    # noise from real regressions). A single 90+-query process cannot
    # distinguish a real 2× regression from GC/position noise at the
    # sub-2 s scale (round-2 "regressions" on unchanged code re-timed
    # clean standalone — VERDICT r2 "What's wrong" #3); the min of
    # back-to-back runs strips the noise while still charging every
    # query its real plan+execute cost.
    runs = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3")))

    # Persistent per-corpus artifact caches (minhash signatures, verified
    # pairs, IVF centroids, PQ codebooks) mean ANN/dedup rows charge
    # assignment+probe, not training/verification — the production shape,
    # where those run once at ingest. Set SPARK_GRAFT_BENCH_COLD=1 to
    # clear the caches first and measure the ingest cost too.
    if os.environ.get("SPARK_GRAFT_BENCH_COLD"):
        import shutil

        for d in (
            "/tmp/spark_graft_signatures",
            "/tmp/spark_graft_verified_pairs",
            "/tmp/spark_graft_artifacts",
        ):
            shutil.rmtree(d, ignore_errors=True)
    times: dict[str, float] = {}
    spreads: dict[str, list[float]] = {}
    for name in HEADLINE:
        fn = QUERIES[name]
        samples: list[float] = []
        for _ in range(runs):
            t0 = time.time()
            fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
            samples.append(round(time.time() - t0, 3))
        times[name] = min(samples)
        spreads[name] = samples

    # post-sweep probe: the pre/post PAIR makes quietness self-verifying
    # (VERDICT r12 #2) — a box that degraded (or recovered) mid-sweep
    # shows disagreeing probes and the line flags itself non-quiet.
    calib_post = round(min(calib_workload(spark) for _ in range(3)), 3)
    calib_sec = min(calib_pre, calib_post)
    try:
        session_best: "float | None" = float(
            os.environ.get("SPARK_GRAFT_CALIB_BEST", "") or 0
        ) or None
    except ValueError:
        session_best = None
    calib_ok = calib_quiet_verdict(calib_pre, calib_post, session_best)
    if not calib_ok:
        print(
            f"bench: WARNING — calib probes disagree or exceed session "
            f"best (pre={calib_pre} post={calib_post} "
            f"best={session_best}); marking quiet=false",
            file=sys.stderr,
        )
    quiet = quiet and calib_ok

    total = round(sum(times.values()), 3)
    anchors = resolve_anchors(times)
    vs_anchor = {
        q: round(times[q] / a["sec"], 3)
        for q, a in anchors.items()
        if a["sec"] > 0
    }
    vs_anchor_calib = normalize_vs_anchor(vs_anchor, anchors, calib_sec)
    vs_median = _median(vs_anchor.values())
    vs_calib_median = _median(vs_anchor_calib.values())
    breaches_raw = sorted(q for q, r in vs_anchor.items() if r > 2.0)
    breaches_calib = sorted(
        q for q, r in vs_anchor_calib.items() if r > 2.0
    )
    payload = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_val,
        "runs_per_query": runs,
        "agg": "min",
        "n_queries": len(times),
        "detail": "BENCH_DETAIL.json",
        # queries whose SEMANTICS changed, with the round the perf
        # anchor re-bases at — a ratio vs an older round compares
        # different computations (html_strip r7: JVM tag-regexp strip
        # -> real HTML tokenizer with entity/comment/script handling,
        # VERDICT r6 #2; the regexp chain survives as
        # read_html(fast=True)). r8: the media rotations widened to the
        # full codec breadth per VERDICT r7 #4 — multimodal_decode now
        # synthesizes+parses 8 containers (was 4), image_pixels decodes
        # TIFF strips and VP8L (pure-Python prefix codes) in rotation.
        "rebased": load_rebase_map(),
        # per-query anchors resolved THROUGH the rebase map (first
        # recorded round, or the rebase round after a semantics
        # change); full tables detail-only, the median ratio on stdout
        "vs_anchor_median": vs_median,
        "anchors": anchors,
        "vs_anchor": vs_anchor,
        # machine-speed-normalized ratios: the 2x contract gates on
        # THESE (VERDICT r11 #1); anchor-era calibs from BASELINE.json
        "vs_anchor_calib_median": vs_calib_median,
        "vs_anchor_calib": vs_anchor_calib,
        # queries over the 2x bar, raw and calib-normalized — the
        # normalized list is the contract, the raw one is context
        "breaches_raw": breaches_raw,
        "breaches_calib": breaches_calib,
        # round-7 lesson: concurrent pytest contaminates min-of-3 by
        # 1.3-1.7x; the runner waits for machine-quiet (wait_for_quiet)
        # AND self-verifies via the pre/post calib pair (VERDICT r12
        # #2, calib_quiet_verdict) — false when either check failed
        "quiet": quiet,
        # fixed pure-JVM reference workload (see calib_workload): divide
        # walls by this before comparing across sessions/boxes.
        # calib_sec = min(pre, post); the pair is the quietness proof
        "calib_sec": calib_sec,
        "calib_sec_pre": calib_pre,
        "calib_sec_post": calib_post,
        # per-run samples land only in BENCH_DETAIL.json (stdout line is
        # byte-budgeted); the judge reads the spread to separate noise
        # from drift
        "runs_detail": spreads,
    }
    detail_path = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "BENCH_DETAIL.json"
    )
    with open(detail_path, "w") as fh:
        json.dump(payload, fh, indent=1, sort_keys=True)
    print(_budgeted_line(payload), flush=True)
    spark.stop()


# The round-1 baseline query set — the judge's perf-contract anchor.
# Read from BENCH_r01.json itself (the authoritative record) with a
# static fallback; these per-query figures must always survive the
# driver's stdout tail window.
_R1_FALLBACK = [
    "topk_retrieval", "topk_retrieval_filtered", "knn_join", "ann_ivf",
    "ann_ivf_kmeans", "ann_srp_lsh", "vector_normalize", "pricing_summary",
    "shipping_priority", "local_supplier_volume", "top_parts_by_revenue",
    "last_n_window", "sessionize_events", "asof_join", "range_join",
    "hypertable_rollup", "orders_rollup", "dual_store_join", "dedup_exact",
    "dedup_minhash_lsh", "dedup_minhash_verified", "dedup_lsh_keep",
    "dedup_ngram_jaccard", "dedup_simhash", "embedding_neardup",
    "multimodal_metadata", "text_stats", "quality_score", "doc_fingerprint",
    "hash_embedding", "provider_embedding", "html_strip", "section_split",
    "sessionize_stream", "chunk_documents", "binpack_chunks",
    "source_router", "corpus_pipeline",
]


def _r1_anchor() -> list[str]:
    try:
        with open(
            os.path.join(
                os.path.dirname(os.path.abspath(__file__)), "BENCH_r01.json"
            )
        ) as fh:
            return list(json.load(fh)["parsed"]["queries"])
    except (OSError, ValueError, KeyError, TypeError):
        return list(_R1_FALLBACK)


_R1_ANCHOR = _r1_anchor()

_STDOUT_BUDGET = 1900  # bytes; driver tail is ~2000


def _budgeted_line(payload: dict) -> str:
    """The stdout JSON line, shrunk to fit the driver's tail window:
    r1-anchor queries first, then the rest in headline order until the
    byte budget is hit. When the anchor-only floor STILL overflows
    (long breach lists — a degraded-box run can breach dozens of
    queries raw), the breach lists are truncated tail-first with the
    true counts kept as breaches_raw_n/breaches_calib_n (r13: the r12
    calib-pair keys plus 14 smoke-run breaches measured 1931 bytes —
    over the round-4 parsed:null cliff). BENCH_DETAIL.json always has
    everything."""
    payload = {
        k: v
        for k, v in payload.items()
        if k not in ("runs_detail", "anchors", "vs_anchor", "vs_anchor_calib")
    }
    times = payload["queries"]
    ordered = [n for n in _R1_ANCHOR if n in times] + [
        n for n in times if n not in _R1_ANCHOR
    ]
    keep = dict(times)

    def _line() -> str:
        return json.dumps({**payload, "queries": keep}, separators=(",", ":"))

    # budget is measured in BYTES everywhere (the driver tail is a byte
    # window; a multibyte sf path must not slip past a char count)
    while len(ordered) > len(_R1_ANCHOR):
        if len(_line().encode()) <= _STDOUT_BUDGET:
            break
        keep.pop(ordered.pop())

    # breach lists truncate RAW-first: breaches_calib is the 2x
    # contract (VERDICT r11 #1) and must survive whole as long as
    # possible; breaches_raw is context (self-review r13 — the
    # lockstep trim emptied the short contract list while the long
    # context list still had entries)
    while len(_line().encode()) > _STDOUT_BUDGET and (
        payload.get("breaches_raw") or payload.get("breaches_calib")
    ):
        k = "breaches_raw" if payload.get("breaches_raw") else "breaches_calib"
        lst = payload[k]
        payload.setdefault(f"{k}_n", len(lst))
        payload[k] = lst[:-1]
    line = _line()
    if len(line.encode()) > _STDOUT_BUDGET:
        # anchor floor + fully-drained breach lists STILL over budget
        # (future payload-key growth): make the overflow visible instead
        # of silently risking the driver-tail parsed:null cliff
        # (ADVICE r13 #3)
        print(
            f"WARNING: bench stdout line {len(line.encode())} bytes exceeds "
            f"budget {_STDOUT_BUDGET} after full truncation",
            file=sys.stderr,
        )
    return line


if __name__ == "__main__":
    main()
