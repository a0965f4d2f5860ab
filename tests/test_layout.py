"""Z-order layout (operators/layout.py): the measured claim is that a
Morton-clustered table prunes files for predicates on BOTH interleaved
dimensions, where a 1-D sorted layout prunes only its sort key.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF001
from walmart_e_commerce_sales_data_pipeline_spark.operators.layout import (
    files_pruned_by_minmax,
    morton_key,
    zorder_write,
)

N_FILES = 16


def _band(df, col, lo_q, hi_q):
    lo, hi = df.approxQuantile(col, [lo_q, hi_q], 0.0)
    return float(lo), float(hi)


def test_morton_key_locality():
    """Adjacent points in (x, y) space land near each other on the curve:
    the key of (x, y) differs from (x+1, y) in low-order bits only when
    x+1 flips low bits — pin the exact interleave for a few points."""
    import pyspark.sql.types as T
    from pyspark.sql import SparkSession

    spark = SparkSession.getActiveSession() or SparkSession.builder.master(
        "local[2]"
    ).getOrCreate()
    df = spark.createDataFrame(
        [(0, 0), (1, 0), (0, 1), (1, 1), (2, 2), (3, 5)],
        schema=T.StructType(
            [
                T.StructField("x", T.LongType()),
                T.StructField("y", T.LongType()),
            ]
        ),
    )
    rows = df.select(
        "x", "y", morton_key(F.col("x"), F.col("y"), 4).alias("z")
    ).collect()
    got = {(r["x"], r["y"]): r["z"] for r in rows}
    # interleave: z = sum(x_bit_i << 2i) + sum(y_bit_i << (2i+1))
    assert got[(0, 0)] == 0
    assert got[(1, 0)] == 1
    assert got[(0, 1)] == 2
    assert got[(1, 1)] == 3
    assert got[(2, 2)] == 12          # x=10b -> 4, y=10b -> 8
    # x=3 (11b) contributes 1<<0 | 1<<2 = 5; y=5 (101b) contributes
    # 1<<1 | 1<<5 = 34; total 39
    assert got[(3, 5)] == 39


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_extendedprice", "l_quantity"
    )
    # 10%-wide predicate bands on each dimension
    px = _band(li, "l_extendedprice", 0.45, 0.55)
    py = _band(li, "l_partkey", 0.45, 0.55)

    zdir = str(tmp_path / "zorder")
    sdir = str(tmp_path / "sorted1d")
    zorder_write(li, zdir, "l_extendedprice", "l_partkey", n_files=N_FILES)
    (
        li.repartitionByRange(N_FILES, "l_extendedprice")
        .sortWithinPartitions("l_extendedprice")
        .write.mode("overwrite")
        .parquet(sdir)
    )

    z_x = files_pruned_by_minmax(zdir, {"l_extendedprice": px})
    z_y = files_pruned_by_minmax(zdir, {"l_partkey": py})
    s_x = files_pruned_by_minmax(sdir, {"l_extendedprice": px})
    s_y = files_pruned_by_minmax(sdir, {"l_partkey": py})

    # the 1-D layout is perfect on its sort key and blind on the other
    assert s_x["skipped"] >= s_x["total"] * 0.7
    assert s_y["skipped"] == 0
    # the z-ordered layout skips a real fraction of files on BOTH
    # dimensions (the curve trades per-dimension perfection for
    # all-dimension coverage: ~sqrt spread per dim at 2 dims)
    assert z_x["skipped"] >= z_x["total"] * 0.25, z_x
    assert z_y["skipped"] >= z_y["total"] * 0.25, z_y
    # and the 2-D conjunction prunes at least as well as either axis
    z_xy = files_pruned_by_minmax(
        zdir, {"l_extendedprice": px, "l_partkey": py}
    )
    assert z_xy["skipped"] >= max(z_x["skipped"], z_y["skipped"])


def test_zorder_preserves_rows_exactly(spark, tmp_path):
    li = spark.read.parquet(f"{SF001}/lineitem.parquet").select(
        "l_orderkey", "l_partkey", "l_extendedprice"
    )
    zdir = str(tmp_path / "z")
    zorder_write(li, zdir, "l_extendedprice", "l_partkey", n_files=8)
    back = spark.read.parquet(zdir)
    assert back.count() == li.count()
    assert back.columns == li.columns  # _zkey dropped
    a = li.groupBy().agg(
        F.sum("l_extendedprice").alias("s"), F.sum("l_partkey").alias("p")
    ).collect()[0]
    b = back.groupBy().agg(
        F.sum("l_extendedprice").alias("s"), F.sum("l_partkey").alias("p")
    ).collect()[0]
    assert a["p"] == b["p"]  # integer sum: exact
    # double sum is order-dependent at the last ulp after re-layout
    assert abs(a["s"] - b["s"]) < 1e-4 * abs(a["s"])


def _hilbert_ref(bits, x, y):
    """Reference xy->d (classic public-domain iteration)."""
    d = 0
    n = 1 << bits
    s = n // 2
    while s > 0:
        rx = 1 if (x & s) > 0 else 0
        ry = 1 if (y & s) > 0 else 0
        d += s * s * ((3 * rx) ^ ry)
        if ry == 0:
            if rx == 1:
                x = n - 1 - x
                y = n - 1 - y
            x, y = y, x
        s //= 2
    return d


def test_hilbert_distance_matches_reference(spark):
    """The expression-chain xy->d equals the classic iterative reference
    for a grid of points, and the curve is a bijection on the 16x16
    grid (every d in [0, 256) hit exactly once at bits=4)."""
    import pyspark.sql.types as T

    from walmart_e_commerce_sales_data_pipeline_spark.operators.layout import (
        hilbert_d,
    )

    bits = 4
    pts = [(x, y) for x in range(16) for y in range(16)]
    df = spark.createDataFrame(
        pts,
        schema=T.StructType(
            [
                T.StructField("_hx", T.LongType()),
                T.StructField("_hy", T.LongType()),
            ]
        ),
    ).select(F.col("_hx").alias("x"), F.col("_hy").alias("y"), "_hx", "_hy")
    rows = hilbert_d(df, bits).collect()
    got = {(r["x"], r["y"]): r["_hd"] for r in rows}
    for (x, y), d in got.items():
        assert d == _hilbert_ref(bits, x, y), (x, y, d)
    assert sorted(got.values()) == list(range(256))


def test_hilbert_prunes_both_dimensions(spark, tmp_path):
    from walmart_e_commerce_sales_data_pipeline_spark.operators.layout import (
        hilbert_write,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").select(
        "l_partkey", "l_extendedprice"
    )
    px = _band(li, "l_extendedprice", 0.45, 0.55)
    py = _band(li, "l_partkey", 0.45, 0.55)
    hdir = str(tmp_path / "hilbert")
    # hilbert_write routes buckets deterministically (sketch boundaries +
    # hive partitionBy — ADVICE r14 replaced the old repartitionByRange
    # whose random boundary sample made this skip fraction jitter), so
    # ONE write is asserted directly: a dip below the bar is a genuine
    # layout-quality regression, not sampling noise.
    hilbert_write(li, hdir, "l_extendedprice", "l_partkey", n_files=N_FILES)
    h_x = files_pruned_by_minmax(hdir, {"l_extendedprice": px})
    h_y = files_pruned_by_minmax(hdir, {"l_partkey": py})
    assert h_x["skipped"] >= h_x["total"] * 0.25, h_x
    assert h_y["skipped"] >= h_y["total"] * 0.25, h_y
    back = spark.read.parquet(hdir)
    assert back.count() == li.count()


def test_row_group_pruning_is_finer_than_file_pruning(spark, tmp_path):
    """Within-file row-group stats prune FINER than file envelopes on a
    curve-sorted layout: every file-level skip implies its groups skip,
    and straddling files still skip some of their groups."""
    from walmart_e_commerce_sales_data_pipeline_spark.operators.layout import (
        row_groups_pruned_by_minmax,
    )

    li = spark.read.parquet(f"{SF001}/lineitem.parquet").select(
        "l_partkey", "l_extendedprice"
    )
    px = _band(li, "l_extendedprice", 0.45, 0.55)
    zdir = str(tmp_path / "z")
    # few files, small row groups -> many groups per file (the writer
    # option reaches the parquet writer; a runtime spark.conf does not)
    zorder_write(
        li,
        zdir,
        "l_extendedprice",
        "l_partkey",
        n_files=4,
        writer_options={"parquet.block.size": str(64 * 1024)},
    )
    f = files_pruned_by_minmax(zdir, {"l_extendedprice": px})
    rg = row_groups_pruned_by_minmax(zdir, {"l_extendedprice": px})
    assert rg["total"] > f["total"], (rg, f)  # multiple groups per file
    # row-group skipping must beat the file-level skip RATE: straddling
    # files contribute skippable groups the file decision cannot see
    assert rg["skipped"] / rg["total"] > f["skipped"] / f["total"], (rg, f)
