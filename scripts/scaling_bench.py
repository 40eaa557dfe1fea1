"""Two-parallelism scaling run (the sandbox stand-in for N vs 4N executors).

Runs bench.py at local[8] and local[32] on the SAME input, reports both
throughputs and the scaling efficiency

    eff = (t_N / t_4N) / 4        (ideal 4x speedup -> eff 1.0)

plus the reference's own efficiency formula
(reference tests/benchmark.py:105-110):

    eff_ref = 1 - (t_n - t_1/n) / (t_1 - t_1/n)   with n = 4, t_1 := t_N

Appends a results block to BENCH_SCALING.md.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run(cpus: int, sf_dir: str, qc_docs: int, max_attempts: int = 3,
        trials: int = 4) -> dict:
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from spatial_bench import steal_pct

    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_SF_DIR=sf_dir,
        SPARK_GRAFT_QC_DOCS=str(qc_docs),
        # scaling efficiency is measured on the flagship pipeline only; the
        # input must be large enough that compute dominates fixed overheads
        SPARK_GRAFT_SKIP_HEADLINE="1",
        # even with the pinned heap + scaled warm-up, the first measured
        # trial occasionally carries residual ramp; extra trials make two
        # clean steady-state samples near-certain (the hi phase is the
        # historically unstable one, so it gets best-of-4; the lo phase's
        # ±6% spread doesn't justify another ~5 min of wall)
        SPARK_GRAFT_QC_TRIALS=os.environ.get("SPARK_GRAFT_QC_TRIALS", str(trials)),
    )
    # a phase whose WHOLE-WINDOW steal exceeds 2% is box noise, not an
    # engine measurement (CLAUDE.md rule 13) — retry it rather than record
    # it; the stamp of the accepted attempt is written either way
    for attempt in range(max_attempts):
        st = steal_pct()
        out = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True,
            text=True,
            env=env,
            timeout=3600,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        d = json.loads(line)
        d["steal_pct_before"] = round(st, 1)
        d["attempts"] = attempt + 1
        if d.get("steal_clean", True):
            return d
        print(
            f"local[{cpus}] phase steal {d.get('steal_pct')}% > 2% — retrying "
            f"({attempt + 1}/{max_attempts})",
            file=sys.stderr,
        )
    return d


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    qc_docs = int(os.environ.get("SPARK_GRAFT_QC_DOCS", "1000000"))
    # N vs 4N within the PHYSICAL core count: this box reports 32 CPUs but
    # a pure-python burn scales 8->32 at only 3.2x (SMT pairs), while
    # 4->16 scales 4.06x — so 4 vs 16 is the honest N-vs-4N measurement
    # surface (a real cluster adds machines, not hyperthreads)
    lo = int(os.environ.get("SPARK_GRAFT_SCALE_LO", "4"))
    hi = int(os.environ.get("SPARK_GRAFT_SCALE_HI", "16"))

    r_lo = run(lo, sf_dir, qc_docs, trials=3)
    r_hi = run(hi, sf_dir, qc_docs, trials=4)

    t_lo = r_lo["queries"]["webtext_qc_pipeline"]
    t_hi = r_hi["queries"]["webtext_qc_pipeline"]
    n = hi // lo
    speedup = t_lo / t_hi
    eff = speedup / n
    eff_ref = 1 - (t_hi - t_lo / n) / (t_lo - t_lo / n)

    block = f"""
## Scaling run {time.strftime('%Y-%m-%d %H:%M:%S')}

Same input (webtext QC pipeline over {qc_docs} generated pages + headline
suite at {sf_dir}), two parallelism levels:

| cores | qc pipeline sec | docs/sec |
|---|---|---|
| local[{lo}] | {t_lo} | {r_lo['qc_docs_per_sec']} |
| local[{hi}] | {t_hi} | {r_hi['qc_docs_per_sec']} |

* speedup {lo}->{hi} cores: **{speedup:.2f}x** (ideal {n}x)
* scaling efficiency (speedup/{n}): **{eff:.2f}** (target >= 0.8)
* reference formula eff (tests/benchmark.py:105-110, t_1 := t_{lo}): {eff_ref:.2f}
* per-trial sec (best/min is the reported number): \
local[{lo}] {r_lo.get('qc_trials_sec')} / local[{hi}] {r_hi.get('qc_trials_sec')}
* WHOLE-WINDOW hypervisor steal per phase: \
{r_lo.get('steal_pct')}% / {r_hi.get('steal_pct')}% \
(clean = <=2%: {bool(r_lo.get('steal_clean'))} / {bool(r_hi.get('steal_clean'))})
"""
    with open(os.path.join(REPO, "BENCH_SCALING.md"), "a") as f:
        f.write(block)
    print(json.dumps({
        "t_lo": t_lo, "t_hi": t_hi, "speedup": round(speedup, 3),
        "efficiency": round(eff, 3), "efficiency_ref": round(eff_ref, 3),
    }))


if __name__ == "__main__":
    main()
