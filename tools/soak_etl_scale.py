#!/usr/bin/env python
"""walmart_etl_e2e scale soak (SCALE.md §36): run the full reference-
parity pipeline at 1x / 10x / 100x the bundled input size and record
wall, rows/s, and the golden-value + flat-plan assertions.

- Inputs come from tools/scale_etl_inputs.py replicas (value-identical
  rows with shifted join keys), so the 12-row monthly means must be
  IDENTICAL at every factor — the correctness anchor.
- Flat-plan assertion: the OPTIMIZED LOGICAL plan skeleton of the
  extract->transform->aggregate composition (operator names only) must
  be identical at every factor — "one lazy plan" means volume never
  changes what the pipeline computes or how stages compose.  The
  PHYSICAL join strategy is allowed (expected) to adapt with input
  statistics — broadcast-hash while the parquet side fits, sort-merge
  beyond — and is recorded per factor as information, not asserted.

Usage: python tools/soak_etl_scale.py [factors ...]  (default: 1 10 100)
Prints one JSON line per factor plus a summary line.
"""

from __future__ import annotations

import glob
import json
import os
import re
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REF = "/root/reference"
SCALE_DIR = "/tmp/etl_scale"
GOLDEN_FIRST, GOLDEN_LAST = "1,40001.26", "12,44893.31"


def plan_skeleton(df) -> list[str]:
    """Optimized logical operator names in order, expressions stripped."""
    txt = str(df._jdf.queryExecution().optimizedPlan())
    ops = []
    for line in txt.splitlines():
        m = re.match(r"^[\s:+-]*([A-Za-z][A-Za-z0-9]+)", line)
        if m:
            ops.append(m.group(1))
    return ops


def physical_join(df) -> str:
    """Which equi-join strategy the planner picked (informational)."""
    txt = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    joins = re.findall(r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin)", txt)
    return joins[0] if joins else "none"


def run(factor: int, spark, single_file: bool = True) -> dict:
    from walmart_e_commerce_sales_data_pipeline_spark import pipeline as P

    if factor == 1:
        csv_in = f"{REF}/grocery_sales.csv"
        pq_in = f"{REF}/extra_data.parquet"
    else:
        csv_in = f"{SCALE_DIR}/grocery_sales_x{factor}.csv"
        pq_in = f"{SCALE_DIR}/extra_data_x{factor}.parquet"
        if not (os.path.exists(csv_in) and os.path.exists(pq_in)):
            from tools.scale_etl_inputs import generate

            generate(factor, SCALE_DIR)
    out = tempfile.mkdtemp(prefix=f"etl_x{factor}_")
    full = P.avg_weekly_sales_per_month(P.transform(P.extract(spark, csv_in, pq_in)))
    skeleton = plan_skeleton(full)
    join_strategy = physical_join(full)
    t0 = time.monotonic()
    P.main(spark, csv_in, pq_in, output_dir=out, single_file=single_file)
    wall = time.monotonic() - t0
    agg = sorted(
        l.strip()
        for f in glob.glob(f"{out}/agg_data.csv/part-*.csv")
        for l in open(f)
        if l.strip() and not l.startswith("Month")
    )
    clean_rows = sum(
        1 for f in glob.glob(f"{out}/clean_data.csv/part-*.csv") for _ in open(f)
    ) - len(glob.glob(f"{out}/clean_data.csv/part-*.csv"))
    shutil.rmtree(out, ignore_errors=True)
    assert agg[0] == GOLDEN_FIRST and agg[-1].startswith("9,"), agg[:3]
    golden_ok = GOLDEN_LAST in agg
    return {
        "factor": factor,
        "wall_sec": round(wall, 3),
        "clean_rows": clean_rows,
        "rows_per_sec": round(clean_rows / wall),
        "golden_means_identical": golden_ok,
        "join_strategy": join_strategy,
        "single_file_sink": single_file,
        "skeleton": skeleton,
    }


def main() -> None:
    # --partitioned-sink: after the reference-parity (single to_csv file)
    # measurement, re-run each factor with the PRODUCTION sink
    # (load(single_file=False) — one CSV part per partition, parallel
    # write) and record that wall beside the parity number, so the
    # sink-dominated 100x parity wall is never mistaken for the engine's
    # ceiling (r17 VERDICT item 7 / SCALE.md §36).
    args = sys.argv[1:]
    partitioned = "--partitioned-sink" in args
    factors = [int(a) for a in args if a != "--partitioned-sink"] or [1, 10, 100]
    from walmart_e_commerce_sales_data_pipeline_spark.session import get_spark

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_spark(master=f"local[{cpus}]", shuffle_partitions=int(cpus))
    spark.sparkContext.setLogLevel("ERROR")
    results = [run(f, spark) for f in factors]
    base = results[0]
    for r in results:
        flat = r["skeleton"] == base["skeleton"]
        print(
            json.dumps(
                {k: v for k, v in r.items() if k != "skeleton"}
                | {"plan_flat_vs_base": flat}
            )
        )
        assert r["golden_means_identical"], f"golden drift at x{r['factor']}"
        assert flat, f"plan shape changed at x{r['factor']}"
    if partitioned:
        for f, r in zip(factors, results):
            pr = run(f, spark, single_file=False)
            assert pr["golden_means_identical"], f"golden drift at x{f} (partitioned)"
            r["wall_partitioned_sec"] = pr["wall_sec"]
            print(
                json.dumps(
                    {
                        "factor": f,
                        "wall_parity_sec": r["wall_sec"],
                        "wall_partitioned_sec": pr["wall_sec"],
                        "clean_rows": pr["clean_rows"],
                        "join_strategy": pr["join_strategy"],
                    }
                )
            )
    print(
        json.dumps(
            {
                "summary": "etl_scale_soak",
                "factors": factors,
                "walls": [r["wall_sec"] for r in results],
                "rows_per_sec": [r["rows_per_sec"] for r in results],
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
