"""Z-order clustering: sorting by the Morton key bounds row groups in
BOTH dimensions; a single-column sort leaves the other dimension
unclustered. Proven on real row-group statistics."""

from __future__ import annotations

import glob
import shutil
import tempfile

import pyarrow.parquet as pq
from pyspark.sql import functions as F

from project2_bigdata_spark.functions.zorder import with_zorder, zorder_key


def _rg_spans(path, col_idx):
    f = glob.glob(f"{path}/*.parquet")[0]
    md = pq.ParquetFile(f).metadata
    spans = []
    for i in range(md.num_row_groups):
        st = md.row_group(i).column(col_idx).statistics
        spans.append(st.max - st.min)
    return spans


def test_zorder_key_is_monotone_in_each_arg(spark):
    df = spark.createDataFrame([(a, b) for a in range(8) for b in range(8)], "a long, b long")
    rows = df.select("a", "b", zorder_key("a", "b", bits=3).alias("z")).collect()
    z = {(r.a, r.b): r.z for r in rows}
    assert len(set(z.values())) == 64  # bijective on the grid
    assert z[(0, 0)] == 0
    # interleave convention: a's bits are the high halves
    assert z[(1, 0)] == 2 and z[(0, 1)] == 1 and z[(1, 1)] == 3


def test_zorder_layout_bounds_both_dimensions(spark):
    d = tempfile.mkdtemp(prefix="zorder_", dir="/root/repo")
    try:
        n = 1 << 16
        df = spark.range(n).select(
            (F.col("id") % 256).alias("x"),
            (F.col("id") / 256).cast("long").alias("y"),
        )
        opt = {"parquet.block.size": str(64 * 1024)}
        # baseline: sort by x only
        df.coalesce(1).sortWithinPartitions("x").write.mode("overwrite") \
            .options(**opt).parquet(f"{d}/xsort")
        # z-order: sort by the interleaved key
        with_zorder(df, "x", "y", bits=8).coalesce(1) \
            .sortWithinPartitions("_zkey").drop("_zkey") \
            .write.mode("overwrite").options(**opt).parquet(f"{d}/zsort")

        # Mean spans: the x-sorted layout leaves y unclustered (every
        # row group spans ~the full y range); z-order bounds BOTH
        # dimensions on average. (Max is the wrong statistic: the one
        # row group crossing the curve's top-level boundary legitimately
        # spans a full dimension.)
        mean = lambda xs: sum(xs) / len(xs)  # noqa: E731
        y_x = _rg_spans(f"{d}/xsort", 1)
        y_z = _rg_spans(f"{d}/zsort", 1)
        assert len(y_z) >= 4
        assert mean(y_z) < 0.6 * mean(y_x), (mean(y_z), mean(y_x))
        x_z = _rg_spans(f"{d}/zsort", 0)
        assert mean(x_z) < 0.6 * 255, mean(x_z)
    finally:
        shutil.rmtree(d, ignore_errors=True)
