"""SCD2 gate probe (round 5, VERDICT r4 next #8 "done" criterion).

Stores the SCD2 history in the lake's bucketed CoW layout
(sources/scd_table.py), folds the final slice of an N-event changelog in
as one batch, and reports:

- input scanned by the incremental fold (files/rows/bytes of the
  affected buckets vs the whole stored history) — must be proportional
  to the BATCH, not the history;
- wall seconds for bootstrap, incremental fold, and a full rebuild over
  the concatenated raw log;
- bit-identical check: stored history == full rebuild (exceptAll both
  ways empty).

Reproduce: python BENCH/run_scd2_probe.py --n-events 16000000
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

SCRATCH = os.environ.get("SPARK_GRAFT_SCRATCH", "/dev/shm/spark_graft")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n-events", type=int, default=16_000_000)
    ap.add_argument("--batch-pct", type=float, default=0.5)
    ap.add_argument("--num-files", type=int, default=256)
    a = ap.parse_args()

    from pyspark.sql import functions as F

    from pyorchdb_spark.generator import change_events
    from pyorchdb_spark.operators.scd import scd2_history
    from pyorchdb_spark.session import build_session
    from pyorchdb_spark.sources.scd_table import Scd2Table

    spark = build_session(app_name="scd2-gate",
                          extra_conf={"spark.driver.memory": "24g",
                                      "spark.local.dir": os.path.join(SCRATCH, "tmp")})

    ev_dir = os.path.join(SCRATCH, f"scd2_events_{a.n_events}")
    if not os.path.exists(os.path.join(ev_dir, "_SUCCESS")):
        change_events(spark, a.n_events).write.mode("overwrite").parquet(ev_dir)
    ev = spark.read.parquet(ev_dir)

    cut = ev.selectExpr(
        f"percentile_approx(seq, {1.0 - a.batch_pct / 100.0}, 10000) AS c"
    ).collect()[0]["c"]
    base = ev.filter(F.col("seq") <= cut)
    batch = ev.filter(F.col("seq") > cut)
    n_base, n_batch = base.count(), batch.count()

    root = os.path.join(SCRATCH, "scd2_gate")
    shutil.rmtree(root, ignore_errors=True)
    t = Scd2Table(spark, root, key_cols=["repo", "path"], seq_col="seq",
                  state_cols=["op", "lang"])

    t0 = time.time()
    t.apply_batch(base, batch_id="bootstrap", num_files=a.num_files)
    bootstrap_s = time.time() - t0

    # accounting BEFORE the fold: what will the fold read?
    m = t.lake.manifest()
    affected, untouched = t.lake._affected_files(m, batch.select("repo", "path", "seq"))

    def acct(files):
        rows = sum(f["rows"] for f in files)
        nbytes = sum(os.path.getsize(os.path.join(root, f["path"])) for f in files)
        return {"files": len(files), "rows": rows, "mb": round(nbytes / 1e6, 1)}

    scanned, total = acct(affected), acct(m.files)

    t0 = time.time()
    t.apply_batch(batch, batch_id="fold", num_files=a.num_files)
    fold_s = time.time() - t0

    t0 = time.time()
    full = scd2_history(
        ev.select("repo", "path", "seq", "op", "lang"),
        ["repo", "path"], "seq", ["op", "lang"],
    )
    n_full = full.count()
    rebuild_s = time.time() - t0

    cols = ["repo", "path", "valid_from_seq", "valid_to_seq", "is_current",
            "last_seq", "op", "lang"]
    got, exp = t.read().select(*cols), full.select(*cols)
    identical = got.exceptAll(exp).isEmpty() and exp.exceptAll(got).isEmpty()

    # scan-footprint sweep: input scanned tracks the batch's BUCKET
    # footprint — proportional to batch keys until the layout saturates.
    # (A uniform-key batch sprays buckets; at the 100 TB design point the
    # bucket count grows with the table via volume-splitting, so typical
    # micro-batches stay far below saturation.)
    m2 = t.lake.manifest()
    sweep = []
    for nk in (1, 16, 256, 4096):
        probe_keys = (
            ev.select("repo", "path").distinct()
            .orderBy(F.xxhash64("repo", "path")).limit(nk)
            .withColumn("seq", F.lit(0).cast("long"))
        )
        aff, _unt = t.lake._affected_files(m2, probe_keys)
        sweep.append({"batch_keys": nk, **acct(aff),
                      "scan_fraction": round(sum(f["rows"] for f in aff)
                                             / max(sum(f["rows"] for f in m2.files), 1), 4)})

    print(json.dumps({
        "n_events": a.n_events,
        "base_events": n_base,
        "batch_events": n_batch,
        "history_rows": n_full,
        "bootstrap_sec": round(bootstrap_s, 2),
        "incremental_fold_sec": round(fold_s, 2),
        "full_rebuild_sec": round(rebuild_s, 2),
        "fold_input_scanned": scanned,
        "stored_history_total": total,
        "scan_fraction": round(scanned["rows"] / max(total["rows"], 1), 4),
        "bucket_footprint_sweep": sweep,
        "bit_identical_vs_rebuild": identical,
    }))
    shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
