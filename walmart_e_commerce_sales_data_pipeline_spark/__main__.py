"""CLI entry point mirroring the reference's ``__main__`` behavior
(/root/reference/wallmart_pipeline.py:204-208):

    python -m walmart_e_commerce_sales_data_pipeline_spark \
        grocery_sales.csv extra_data.parquet [--output-dir DIR] [--jdbc-url URL]

Runs the full pipeline (extract → transform → aggregate → load → validate)
and writes ``clean_data.csv`` / ``agg_data.csv`` like the reference.
"""

from __future__ import annotations

import argparse
import logging


def cli() -> None:
    logging.basicConfig(
        level=logging.INFO,
        format="%(asctime)s - %(levelname)s - %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
    )
    parser = argparse.ArgumentParser(
        prog="walmart_e_commerce_sales_data_pipeline_spark",
        description="PySpark-native Walmart sales ETL (reference-parity pipeline)",
    )
    parser.add_argument("store_data", help="store sales CSV path")
    parser.add_argument("extra_data", help="extra data parquet path")
    parser.add_argument("--output-dir", default=".", help="sink directory")
    parser.add_argument("--jdbc-url", default=None, help="optional JDBC sink URL")
    args = parser.parse_args()

    from .pipeline import main
    from .session import get_spark

    spark = get_spark()
    try:
        main(
            spark,
            args.store_data,
            args.extra_data,
            output_dir=args.output_dir,
            jdbc_url=args.jdbc_url,
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    cli()
