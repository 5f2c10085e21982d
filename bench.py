"""Benchmark harness (driver contract: prints ONE JSON line).

Headline: the flagship KG pipeline (read → reassemble → extract → link →
canonicalize → resolve → edge/node materialize → parquet write) over a
deterministic synthetic transcript corpus sized by $GRAFT_SF_DIR's scale
factor, plus representative operator pipelines at the same sf over the
driver testdata tables.

    python bench.py              # one run: ray.init(num_cpus=$RAY_GRAFT_CPUS or 32)
    python bench.py --scaling    # interleaved FRESH-process pairs at N and 4N
                                 # CPUs (default 4 and 16) on the same input →
                                 # median efficiency + per-run raw JSON

The corpus is generated once and cached under /tmp (generation is untimed;
an untimed warm-read precedes timing so page cache doesn't skew the compare).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time
from pathlib import Path

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))
BENCH_CONVS_PER_SF = 125_000  # sf0.1 → 12,500 convs ≈ 100k turns
# --scaling corpus: large enough that per-turn compute dominates fixed
# per-job overhead at the hi width — efficiency measured in the
# overhead-bound regime says nothing about cluster scaling (see BASELINE.md).
# The corpus tracks per-turn compute: each time the extractor gets faster
# the corpus grows to keep the hi leg compute-dominated (round-2 precedent:
# 300k→600k; round-3: the hi leg dropped 34→22 s, so 600k→1.2M — the
# 10^12-turn design point is far deeper into this regime).
SCALING_CONVS = int(os.environ.get("GRAFT_SCALING_CONVS", "1200000"))
KG_ONLY = os.environ.get("GRAFT_BENCH_KG_ONLY") == "1"


def _sf() -> float:
    try:
        return float(Path(SF_DIR).name.replace("sf", ""))
    except ValueError:
        return 0.1


def _ensure_corpus() -> str:
    from cdrc_semantic_search_ray.fixtures import generate_corpus

    override = os.environ.get("GRAFT_BENCH_CONVS")
    n_convs = (int(override) if override
               else max(100, int(BENCH_CONVS_PER_SF * _sf())))
    out = Path("/tmp/cdrc_bench_corpus") / f"convs{n_convs}"
    generate_corpus(out, n_convs=n_convs, seed=42)
    return str(out)


def _warm_cluster() -> None:
    """Spin up task workers + import the package in each (untimed):
    steady-state throughput shouldn't bill one-time cluster start."""
    import ray.data as rd

    def _w(b):
        import cdrc_semantic_search_ray.pipelines.kg  # noqa: F401

        return b

    rd.range(NUM_CPUS * 2, override_num_blocks=NUM_CPUS * 2).map_batches(
        _w, batch_size=None).materialize()


BENCH_REPS = int(os.environ.get("GRAFT_BENCH_REPS", "2"))


def bench_kg(corpus: str, out_dir: str) -> dict:
    """Time the full KG pipeline, best of BENCH_REPS (contention protocol:
    external load only ever ADDS time, so min is the noise-robust
    estimator); returns {sec, n_turns, turns_per_sec, reps, loadavg}."""
    import shutil

    import pyarrow.parquet as pq

    from cdrc_semantic_search_ray.config import DEFAULT_CONFIG as cfg
    from cdrc_semantic_search_ray.pipelines import kg as K

    n_turns = pq.read_table(f"{corpus}/transcripts",
                            columns=["turn_idx"]).num_rows  # warm + count
    reps, loads = [], []
    for _ in range(BENCH_REPS):
        shutil.rmtree(out_dir, ignore_errors=True)
        loads.append(round(os.getloadavg()[0], 2))
        t0 = time.time()
        # production path: read → reassemble → extract → fused resolve+edge
        # agg (extraction chains straight into the edge combiner — one
        # shuffle) → nodes → partitioned writes
        K.build_graph(corpus, cfg, out_dir=out_dir)
        reps.append(round(time.time() - t0, 3))
    sec = min(reps)
    return {"sec": sec, "n_turns": n_turns,
            "turns_per_sec": round(n_turns / sec, 1),
            "reps": reps, "loadavg": loads}


def bench_queries() -> tuple[dict[str, float], dict]:
    """Representative operator pipelines at $GRAFT_SF_DIR.

    Contention protocol (round-3 VERDICT next #1: a 1.47× driver-suite
    swing had no instrumentation to attribute it): the WHOLE suite runs
    BENCH_REPS times, interleaved at suite granularity so a transient host
    spike can't hit the same query in every rep; per-query time is the min
    across reps, and every raw (rep, query, seconds, loadavg-before) is
    returned for the printed JSON."""
    from cdrc_semantic_search_ray.pipelines import queries as Q

    picks = ["q01_pricing_summary", "q06_count_by_group", "q09_topk_per_group",
             "q14_hash_join_agg", "q16_journeys", "q17_exact_dedup",
             "q18_minhash_lsh_dedup", "q21_embedding_neardup",
             "q22_embedding_neardup_lsh", "q23_similarity_topk",
             "q25_token_count", "q26_text_quality",
             "q35_hybrid_topk", "q38_sessionize", "q39_quantiles",
             "q40_asof_join", "q41_embedding_centroids",
             "q43_tfidf_top_terms", "q48_composite_join",
             "q49_approx_distinct", "q50_approx_quantiles",
             "q51_shuffled_export", "q55_response_split",
             "q56_generate_answers", "q57_eval_sweep",
             "q59_redact_terms", "q60_sequence_packing",
             "q61_incremental_dedup", "q62_stratified_sample",
             "q63_decontaminate", "q67_kmeans_clusters",
             "q68_semantic_dedup", "q69_pagerank_entities",
             "q70_temperature_resample", "q71_lm_quality",
             "q72_dataset_card",
             # round-5 additions: PageRank over a relational edge build
             # (hash_join + combiner + node iterations) and the SRP 2-D
             # export (projection matmul + one bucketed join)
             "q73_pagerank_trade", "q74_visualise_embeddings"]
    raw: list[dict] = []
    best: dict[str, float] = {}
    for rep in range(BENCH_REPS):
        for name in picks:
            load = round(os.getloadavg()[0], 2)
            t0 = time.time()
            res = Q.QUERIES[name](SF_DIR)
            # consume fully (streaming) without driver materialization
            n = 0
            for b in res.iter_batches(batch_format="pyarrow"):
                n += len(b)
            sec = round(time.time() - t0, 3)
            raw.append({"rep": rep, "query": name, "sec": sec,
                        "loadavg_before": load})
            if name not in best or sec < best[name]:
                best[name] = sec
    return best, {"reps": BENCH_REPS, "raw": raw}


def run_once() -> dict:
    import ray
    from ray.data import DataContext

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False
    ctx.execution_options.verbose_progress = False

    load_start = round(os.getloadavg()[0], 2)
    corpus = _ensure_corpus()
    out_dir = f"/tmp/cdrc_bench_out/{NUM_CPUS}"
    _warm_cluster()
    kg = bench_kg(corpus, out_dir)
    queries, qproto = ({}, {}) if KG_ONLY else bench_queries()
    total = round(kg["sec"] + sum(queries.values()), 3)
    # Compact result only — round-4 VERDICT #1: the official BENCH_r04.json
    # record was `parsed: null` because per-rep raw arrays inlined in the
    # final stdout line overflowed the driver's tail capture. The full raw
    # protocol trace (per-rep, per-query seconds + loadavg) is written to
    # BENCH_RAW.json next to this file instead; the printed line carries
    # totals + per-query best only.
    result = {
        "metric": "kg_pipeline+operator_suite wall seconds",
        "value": total,
        "unit": "sec",
        "queries": {"kg_pipeline": kg["sec"], **queries},
        "sf": _sf(),
        "num_cpus": NUM_CPUS,
        "kg_turns": kg["n_turns"],
        "kg_turns_per_sec": kg["turns_per_sec"],
        "loadavg": [load_start, round(os.getloadavg()[0], 2)],
        "raw_trace": "BENCH_RAW.json",
    }
    raw = {
        **result,
        "protocol": {
            "best_of": BENCH_REPS,
            "kg_reps": kg["reps"], "kg_loadavg": kg["loadavg"],
            **qproto,
        },
    }
    # KG-only legs (the --scaling subprocesses) must not clobber the full
    # suite trace: the committed BENCH_RAW.json is the round's artifact
    if not KG_ONLY:
        try:
            (Path(__file__).parent / "BENCH_RAW.json").write_text(
                json.dumps(raw, indent=1))
        except OSError:
            pass
    ray.shutdown()
    return result


def run_scaling() -> dict:
    """Robust scaling-efficiency measurement (round-2 VERDICT top item: a
    single (lo, hi) pair did not reproduce under host contention).

    Protocol:
    - one UNTIMED warm-up leg first (discarded): measured on this VM, the
      first run after an idle period is up to 40 % slower than steady state
      (CPU-frequency / host-cache warm-up — loadavg 0.6 runs were the
      SLOWEST in the round-3 trial), which would bias whichever leg runs
      first.
    - ``GRAFT_SCALING_PAIRS`` (default 3) INTERLEAVED (lo, hi) pairs, each
      leg the BEST of ``GRAFT_SCALING_REPS`` (default 2) FRESH processes at
      ``ray.init(num_cpus=N)`` over the same cached corpus — the sandbox
      stand-in for the north rule's two-cluster-size criterion (no real
      multi-node cluster here; see BASELINE.md). Min wall time is the
      standard noise-robust benchmark estimator (external contention only
      ever ADDS time).
    - reported efficiency = MEDIAN of the per-pair efficiencies; spread =
      (min, max) across pairs.
    - contention sentinel: the lo leg is re-run once at the end; if its
      throughput drifted > ``GRAFT_SCALING_DRIFT`` (default 15 %) from the
      median lo throughput, the host was contended mid-trial and the result
      carries ``"contended": true`` — rerun on a quiet host before trusting
      a failing number.
    - every raw per-run record (leg order, seconds, throughput, loadavg
      before the leg) is persisted to ``SCALING_RAW.json`` next to this
      file AND embedded in the printed JSON.

    Corpus sizing: SCALING_CONVS conversations ≈ 8× that in turns — large
    enough that per-turn compute, not fixed per-job overhead, dominates at
    the hi width (efficiency measured in the overhead-bound regime says
    nothing about cluster scaling)."""
    import statistics

    def run(ncpu: int, tag: str) -> dict:
        load_before = os.getloadavg()[0]
        env = dict(os.environ, RAY_GRAFT_CPUS=str(ncpu),
                   GRAFT_BENCH_KG_ONLY="1",
                   GRAFT_BENCH_REPS="1",  # reps are the OUTER fresh-process
                   #                        legs here, not in-process retries
                   GRAFT_BENCH_CONVS=str(SCALING_CONVS))
        out = subprocess.run([sys.executable, __file__], env=env,
                             capture_output=True, text=True, check=True).stdout
        r = json.loads(out.strip().splitlines()[-1])
        return {"tag": tag, "cpus": ncpu,
                "sec": r["queries"]["kg_pipeline"],
                "turns_per_sec": r["kg_turns_per_sec"],
                "loadavg_before": round(load_before, 2)}

    os.environ["GRAFT_BENCH_CONVS"] = str(SCALING_CONVS)
    _ensure_corpus()  # generate once, untimed, shared by all runs
    # 4 → 16 of the host's 32 cores: at full host width the "cluster"
    # competes with Ray's own system processes (raylet, object store, the
    # driver), which caps apparent efficiency for reasons that would not
    # exist on a real 4N-node cluster. Both widths leave host headroom.
    lo, hi = (int(os.environ.get("GRAFT_SCALING_LO", "4")),
              int(os.environ.get("GRAFT_SCALING_HI", "16")))
    n_pairs = int(os.environ.get("GRAFT_SCALING_PAIRS", "3"))
    n_reps = int(os.environ.get("GRAFT_SCALING_REPS", "2"))
    drift_tol = float(os.environ.get("GRAFT_SCALING_DRIFT", "0.15"))

    raws: list[dict] = []

    def best_leg(ncpu: int, tag: str) -> dict:
        reps = [run(ncpu, f"{tag}_rep{j}") for j in range(n_reps)]
        raws.extend(reps)
        return max(reps, key=lambda r: r["turns_per_sec"])

    raws.append(run(hi, "warmup_discard"))  # untimed: VM steady-state
    effs: list[float] = []
    best_los: list[dict] = []
    best_his: list[dict] = []
    for i in range(n_pairs):
        r_lo = best_leg(lo, f"pair{i}_lo")
        r_hi = best_leg(hi, f"pair{i}_hi")
        best_los.append(r_lo)
        best_his.append(r_hi)
        effs.append((r_hi["turns_per_sec"] / r_lo["turns_per_sec"])
                    / (hi / lo))
    # Sentinel BOTH legs (round-4 finding: a lo-only sentinel missed a
    # trial whose lo legs reproduced perfectly while its hi legs ran
    # 15-25 % below the demonstrated ceiling under ambient load — hi-leg
    # degradation is the one that deflates the efficiency ratio).
    sentinel = run(lo, "sentinel_lo")
    raws.append(sentinel)
    sentinel_hi = run(hi, "sentinel_hi")
    raws.append(sentinel_hi)

    med_lo = statistics.median(r["turns_per_sec"] for r in best_los)
    med_hi_tp = statistics.median(r["turns_per_sec"] for r in best_his)
    drift = abs(sentinel["turns_per_sec"] - med_lo) / med_lo
    drift_hi = abs(sentinel_hi["turns_per_sec"] - med_hi_tp) / med_hi_tp
    eff = statistics.median(effs)

    result = {
        "metric": f"kg_pipeline scaling efficiency ({lo} → {hi} CPUs, "
                  f"median of {n_pairs} interleaved fresh-process pairs)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "sf": _sf(),
        "cpus_lo": lo, "cpus_hi": hi,
        "pairs": n_pairs,
        "efficiencies": [round(e, 3) for e in effs],
        "eff_spread": [round(min(effs), 3), round(max(effs), 3)],
        "turns_per_sec_lo": med_lo,
        "turns_per_sec_hi": med_hi_tp,
        "sentinel_lo_drift": round(drift, 3),
        "sentinel_hi_drift": round(drift_hi, 3),
        "contended": drift > drift_tol or drift_hi > drift_tol,
        "scaling_efficiency": round(eff, 3),
    }
    try:
        # raw per-run records go to the side file only (round-4 VERDICT #1:
        # keep the printed line compact enough for the driver's tail capture)
        raw_path = Path(__file__).parent / "SCALING_RAW.json"
        raw_path.write_text(json.dumps({**result, "raw_runs": raws}, indent=1))
    except OSError:
        pass
    return result


def run_session_soak() -> dict:
    """Repeated build_graph in ONE Ray session (round-4 BASELINE caveat /
    round-4 VERDICT next #2: reps 2-3 once measured 74-78 s vs ~47 s fresh
    at 16M turns, cause unknown).  A real cluster runs many jobs per
    session, so repeated-run stability is operational correctness, not a
    bench footnote.  Prints per-rep seconds + driver RSS; ``degraded`` is
    true if any rep beyond the first exceeds rep 1 by >15 %.

    Corpus sized by $GRAFT_SOAK_CONVS (default 2M convs ≈ 16M turns — the
    scale where the round-4 caveat was recorded)."""
    import gc
    import shutil

    import ray
    from ray.data import DataContext

    n_convs = int(os.environ.get("GRAFT_SOAK_CONVS", "2000000"))
    n_reps = int(os.environ.get("GRAFT_SOAK_REPS", "3"))

    def rss_mb() -> int:
        with open("/proc/self/status") as f:
            for line in f:
                if line.startswith("VmRSS"):
                    return int(line.split()[1]) // 1024
        return -1

    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False,
             ignore_reinit_error=True, logging_level="ERROR")
    ctx = DataContext.get_current()
    ctx.enable_progress_bars = False

    from cdrc_semantic_search_ray.config import DEFAULT_CONFIG as cfg
    from cdrc_semantic_search_ray.fixtures import generate_corpus
    from cdrc_semantic_search_ray.pipelines import kg as K

    corpus = str(Path("/tmp/cdrc_bench_corpus") / f"convs{n_convs}")
    generate_corpus(corpus, n_convs=n_convs, seed=42)
    out_dir = f"/tmp/cdrc_bench_out/soak{NUM_CPUS}"
    _warm_cluster()

    reps: list[dict] = []
    for rep in range(n_reps):
        shutil.rmtree(out_dir, ignore_errors=True)
        gc.collect()  # drop prior reps' Dataset refs before timing
        load = round(os.getloadavg()[0], 2)
        t0 = time.time()
        K.build_graph(corpus, cfg, out_dir=out_dir)
        reps.append({"rep": rep, "sec": round(time.time() - t0, 2),
                     "driver_rss_mb": rss_mb(), "loadavg_before": load})
    secs = [r["sec"] for r in reps]
    result = {
        "metric": f"build_graph x{n_reps} in one Ray session "
                  f"({n_convs} convs)",
        "value": round(max(secs[1:]) / secs[0], 3) if len(secs) > 1 else 1.0,
        "unit": "worst_late_rep_over_rep1",
        "reps": reps,
        "degraded": any(s > secs[0] * 1.15 for s in secs[1:]),
        "num_cpus": NUM_CPUS,
    }
    ray.shutdown()
    return result


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling()))
    elif "--session-soak" in sys.argv:
        print(json.dumps(run_session_soak()))
    else:
        print(json.dumps(run_once()))
