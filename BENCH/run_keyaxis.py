"""Key-cardinality scaling sweep (round 5f): throughput vs distinct-key
count at fixed event volume and fixed parallelism.

The datasweep (run_datasweep.py) scales CHURN — the generator's default
path space saturates distinct (repo, path) at ~855k, so 4M -> 64M events
means 4.8 -> 75 events/key. The 10^10-event regime also grows the KEY
axis (~10^8-9 keys), which stresses the opposite ends of the engine:
the LWW winner set (and hence MoR delta write volume and the final
table) scales with |keys|, not events, and the bucket count sizes from
volume. This sweep holds events fixed at one volume and widens the
generator's path image (``generate --path-mod``, round-5f knob) so
|keys| grows ~21x, then replays the same MoR incremental path and
sha-verifies the final state per point.

Expected honest shape: events/s FALLS as keys grow (more winner rows =
more real write work per event — at 855k keys 98.7% of events lose LWW
and are never written), while per-WINNER cost stays flat-to-falling and
verify stays at zero diffs. A collapse worse than the winner-volume
growth would indicate a structure that scales with key cardinality
(driver state, planning, memory) — the failure mode this sweep exists
to rule out.

Run: python BENCH/run_keyaxis.py [--n-events 64000000] [--mods 997,9973,99991]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from run_scaling import (  # noqa: E402
    SCRATCH, build_zip, cpu_probe, mem_probe, run_submit,
)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--n-events", type=int, default=64_000_000)
    p.add_argument("--runs", type=int, default=2)
    p.add_argument("--mods", default="997,9973,99991")
    p.add_argument("--cores", type=int, default=32)
    p.add_argument("--content-max-reps", type=int, default=2)
    p.add_argument("--flags", default="--mor")
    p.add_argument("--skip-verify", action="store_true")
    p.add_argument("--out", default=None)
    a = p.parse_args()

    mods = [int(m) for m in a.mods.split(",")]
    flags = [f for f in a.flags.split(",") if f]
    master = f"local[{a.cores}]"
    zpath = build_zip()

    def events_dir(mod: int) -> str:
        # mod 997 is the committed default: reuse the datasweep's input
        # byte-identically rather than regenerating it under a new name
        suffix = "" if mod == 997 else f"_pm{mod}"
        return os.path.join(SCRATCH, f"events_{a.n_events}_r{a.content_max_reps}{suffix}")

    for mod in mods:
        ev = events_dir(mod)
        if not os.path.exists(os.path.join(ev, "_SUCCESS")):
            print(f"generating {a.n_events:,} events @ path_mod={mod} -> {ev}",
                  file=sys.stderr)
            run_submit(
                zpath,
                ["generate", "--out", ev, "--n-events", str(a.n_events),
                 "--batch-size", str(a.n_events // 4),
                 "--content-max-reps", str(a.content_max_reps),
                 "--path-mod", str(mod)],
                master=master,
            )

    probes = {"before": {"cpu_hashes_per_sec": round(cpu_probe(8)),
                         "memcpy_gb_per_sec": round(mem_probe(8, iters=15), 1)}}
    print(json.dumps({"probe": "before", **probes["before"]}), file=sys.stderr)

    best: dict[int, dict] = {}
    for run_i in range(a.runs):
        for mod in mods:  # interleaved: a noise burst hits every point
            work = os.path.join(SCRATCH, f"keyaxis_{mod}")
            shutil.rmtree(work, ignore_errors=True)
            t0 = time.time()
            r = run_submit(
                zpath,
                ["replay", "--events", events_dir(mod), "--table", work, *flags],
                master=master,
            )
            if mod not in best or r["events_per_sec"] > best[mod]["events_per_sec"]:
                best[mod] = r
            print(json.dumps({"path_mod": mod, "run": run_i,
                              "events_per_sec": r["events_per_sec"],
                              "sec": r["sec"], "table_rows": r.get("table_rows"),
                              "wall_incl_jvm": round(time.time() - t0, 1)}),
                  file=sys.stderr)
            # last run leaves the table in place for the verify pass
            if not (run_i == a.runs - 1 and not a.skip_verify):
                shutil.rmtree(work, ignore_errors=True)

    verify = {}
    if not a.skip_verify:
        for mod in mods:
            work = os.path.join(SCRATCH, f"keyaxis_{mod}")
            v = run_submit(
                zpath,
                ["verify", "--events", events_dir(mod), "--table", work],
                master=master,
            )
            verify[mod] = v
            print(json.dumps({"verify_path_mod": mod, **v}), file=sys.stderr)
            shutil.rmtree(work, ignore_errors=True)

    probes["after"] = {"cpu_hashes_per_sec": round(cpu_probe(8)),
                       "memcpy_gb_per_sec": round(mem_probe(8, iters=15), 1)}
    print(json.dumps({"probe": "after", **probes["after"]}), file=sys.stderr)

    base = best[mods[0]]
    out = {
        "protocol": f"{master}, {a.n_events} events fixed, replay "
                    f"{' '.join(flags)}, best-of-{a.runs}, mods interleaved, "
                    "sha-verify per point",
        "points": {
            str(mod): {
                "events_per_sec": best[mod]["events_per_sec"],
                "sec": best[mod]["sec"],
                "table_rows": best[mod].get("table_rows"),
                "keys_vs_base": round(
                    (best[mod].get("table_rows") or 0)
                    / max(1, base.get("table_rows") or 1), 2),
                "ev_s_vs_base": round(
                    best[mod]["events_per_sec"] / base["events_per_sec"], 3),
                "us_per_winner_row": round(
                    best[mod]["sec"] * 1e6 / max(1, best[mod].get("table_rows") or 1), 2),
                "verify": verify.get(mod),
            }
            for mod in mods
        },
        "substrate_probes": probes,
    }
    print(json.dumps(out))
    if a.out:
        os.makedirs(os.path.dirname(a.out), exist_ok=True)
        with open(a.out, "w") as fh:
            fh.write(json.dumps(out, indent=1) + "\n")


if __name__ == "__main__":
    main()
