"""Per-round benchmark harness (driver contract).

Runs the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...} plus engine extras (cdc replay
events/sec).

The CDC replay input is generated once per (n_events) into
.bench_data/ and reused byte-identically across runs and parallelism
levels (SURVEY.md section 7, hard part 5).
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
N_EVENTS = int(os.environ.get("SPARK_GRAFT_BENCH_EVENTS", "300000"))
REPO = os.path.dirname(os.path.abspath(__file__))


def _force(df) -> int:
    """Fully execute a plan without driver-side materialization."""
    df.write.format("noop").mode("overwrite").save()
    return 0


def main() -> None:
    from pyorchdb_spark.session import build_session

    spark = build_session(app_name="pyorchdb_bench", master=f"local[{CPUS}]")

    import __spark_entry__ as entrymod

    q = entrymod.queries()
    headline = [
        "cdc_lww",
        "cdc_lww_salted",
        "cdc_merge_upsert",
        "q1_pricing_summary",
        "q3_shipping_priority",
        "q5_local_supplier_volume",
        "dedup_exact",
        "dedup_ngram_jaccard",
        "dedup_minhash_lsh",
        "dedup_simhash",
        "dedup_groups",
        "text_stats",
        "ann_topk",
        "events_windowed",
        "sessionize",
        "asof_latest_click",
        "events_rollup",
    ]

    timings: dict[str, float] = {}
    for name in headline:
        t0 = time.time()
        _force(q[name](spark, SF_DIR))
        timings[name] = round(time.time() - t0, 3)

    # --- CDC replay throughput (the BASELINE.json headline metric) ---
    from pyorchdb_spark.generator import change_events, write_events
    from pyorchdb_spark.ingest import replay
    from pyorchdb_spark.sources.catalog import BatchLedger
    from pyorchdb_spark.sources.lake import LakeTable

    events_dir = os.path.join(REPO, ".bench_data", f"events_{N_EVENTS}")
    if not os.path.exists(os.path.join(events_dir, "_SUCCESS")):
        ev = change_events(spark, N_EVENTS, batch_size=max(N_EVENTS // 4, 1))
        write_events(ev, events_dir)
    events = spark.read.parquet(events_dir)
    n_rows = events.count()

    # A/B the skew strategies + write paths on identical input (SURVEY.md
    # section 4): plain window dedup vs salted two-stage, and copy-on-write
    # vs merge-on-read delta commits.
    replay_stats = {}
    for label, salted, mor in (
        ("cdc_replay", False, False),
        ("cdc_replay_salted", True, False),
        ("cdc_replay_mor", False, True),
    ):
        work = os.path.join(REPO, ".bench_work", label)
        shutil.rmtree(work, ignore_errors=True)
        lake, ledger = LakeTable(spark, work), BatchLedger(spark, work)
        t0 = time.time()
        replay(lake, ledger, events, salted=salted, mor=mor)
        sec = round(time.time() - t0, 3)
        timings[label] = sec
        replay_stats[label] = round(n_rows / sec, 1)
    replay_sec = timings["cdc_replay"]

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline query wall time + CDC replay",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
                "cdc_replay_events": n_rows,
                "cdc_replay_events_per_sec": round(n_rows / replay_sec, 1),
                "cdc_replay_events_per_sec_by_strategy": replay_stats,
                "cpus": CPUS,
            }
        )
    )


if __name__ == "__main__":
    main()
