#!/usr/bin/env python
"""Generate an N-times replica of the reference ETL inputs
(grocery_sales.csv + extra_data.parquet) for the walmart_etl_e2e scale
soak (SCALE.md §36).

Same schema, same null patterns, same per-replica value distributions:
each replica is the original row set with every ``index`` (the join
key) and ``level_0`` shifted by ``replica * STRIDE`` so the inner join
stays 1:1 and key-unique at any factor.  Because replicas are
value-identical, the pipeline's golden 12-row monthly means are
IDENTICAL at every factor — correctness stays checkable while only the
volume grows.

Usage: python tools/scale_etl_inputs.py FACTOR OUT_DIR
Writes OUT_DIR/grocery_sales_x{FACTOR}.csv and
OUT_DIR/extra_data_x{FACTOR}.parquet.
"""

from __future__ import annotations

import os
import sys

import duckdb

REF = "/root/reference"
# one past the larger file's max index (extra_data tops out at 232,418)
STRIDE = 232_419


def generate(factor: int, out_dir: str) -> tuple[str, str]:
    os.makedirs(out_dir, exist_ok=True)
    csv_out = os.path.join(out_dir, f"grocery_sales_x{factor}.csv")
    pq_out = os.path.join(out_dir, f"extra_data_x{factor}.parquet")
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
            SELECT gs.level_0 + r.range * {STRIDE} AS level_0,
                   gs.index + r.range * {STRIDE} AS "index",
                   gs.Store_ID, gs.Date, gs.Dept, gs.Weekly_Sales
            FROM read_csv('{REF}/grocery_sales.csv',
                          header=true,
                          columns={{'level_0': 'BIGINT', 'index': 'BIGINT',
                                    'Store_ID': 'BIGINT', 'Date': 'VARCHAR',
                                    'Dept': 'BIGINT',
                                    'Weekly_Sales': 'DOUBLE'}}) gs
            CROSS JOIN range({factor}) r
            ORDER BY r.range, gs.level_0
        ) TO '{csv_out}' (HEADER)
        """
    )
    con.sql(
        f"""
        COPY (
            SELECT ed.index + r.range * {STRIDE} AS "index",
                   ed.* EXCLUDE ("index")
            FROM read_parquet('{REF}/extra_data.parquet') ed
            CROSS JOIN range({factor}) r
            ORDER BY r.range, ed.index
        ) TO '{pq_out}' (FORMAT PARQUET)
        """
    )
    return csv_out, pq_out


if __name__ == "__main__":
    factor = int(sys.argv[1])
    out_dir = sys.argv[2] if len(sys.argv) > 2 else "/tmp/etl_scale"
    print(generate(factor, out_dir))
