"""Z-order clustered write (sources/io.py:write_zordered): file-level
min/max stats must be selective on EVERY clustered column, which a
single-column sort cannot give. Measured directly from parquet footers
via pyarrow — the same stats Spark's reader prunes row groups with."""

from __future__ import annotations

import glob

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from etlutil_spark.sources.io import write_zordered


def overlapping_files(path: str, col: str, lo: float, hi: float) -> tuple[int, int]:
    """(files whose [min,max] of col overlaps [lo,hi], total files)."""
    files = glob.glob(f"{path}/*.parquet")
    hit = 0
    for f in files:
        md = pq.ParquetFile(f).metadata
        fmn, fmx = None, None
        for rg in range(md.num_row_groups):
            for ci in range(md.num_columns):
                c = md.row_group(rg).column(ci)
                if c.path_in_schema == col and c.statistics is not None:
                    s = c.statistics
                    fmn = s.min if fmn is None else min(fmn, s.min)
                    fmx = s.max if fmx is None else max(fmx, s.max)
        assert fmn is not None, f"no stats for {col} in {f}"
        if not (fmx < lo or fmn > hi):
            hit += 1
    return hit, len(files)


@pytest.fixture(scope="module")
def lineitem(spark, sf_dir):
    from etlutil_spark.sources.testdata import load_table

    return load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity", "l_extendedprice"
    )


class TestZorder:
    def test_prunes_on_second_dimension(self, spark, lineitem, tmp_path):
        z_path = str(tmp_path / "z")
        s_path = str(tmp_path / "s")
        write_zordered(
            lineitem, z_path, ["l_quantity", "l_extendedprice"], n_files=16
        )
        # baseline: same file count, clustered on the FIRST column only
        (
            lineitem.repartitionByRange(16, "l_quantity")
            .sortWithinPartitions("l_quantity")
            .write.mode("overwrite")
            .parquet(s_path)
        )
        stats = lineitem.agg(
            F.min("l_extendedprice"), F.max("l_extendedprice")
        ).collect()[0]
        lo = stats[0] + (stats[1] - stats[0]) * 0.45
        hi = stats[0] + (stats[1] - stats[0]) * 0.55
        z_hit, z_total = overlapping_files(z_path, "l_extendedprice", lo, hi)
        s_hit, s_total = overlapping_files(s_path, "l_extendedprice", lo, hi)
        assert z_total == s_total == 16
        # single-column sort leaves the second column unclustered: every
        # file spans it; z-order must prune a real fraction
        assert s_hit == 16
        assert z_hit <= 12, (z_hit, s_hit)

    def test_still_prunes_on_first_dimension(self, spark, lineitem, tmp_path):
        z_path = str(tmp_path / "z1")
        write_zordered(
            lineitem, z_path, ["l_quantity", "l_extendedprice"], n_files=16
        )
        stats = lineitem.agg(F.min("l_quantity"), F.max("l_quantity")).collect()[0]
        lo = stats[0] + (stats[1] - stats[0]) * 0.45
        hi = stats[0] + (stats[1] - stats[0]) * 0.55
        hit, total = overlapping_files(z_path, "l_quantity", lo, hi)
        assert hit < total

    def test_roundtrip_content(self, spark, lineitem, tmp_path):
        p = str(tmp_path / "rt")
        write_zordered(lineitem, p, ["l_quantity", "l_extendedprice"], n_files=4)
        back = spark.read.parquet(p)
        assert back.count() == lineitem.count()
        assert sorted(back.columns) == sorted(lineitem.columns)
        a = lineitem.agg(F.sum("l_extendedprice").cast("decimal(38,4)")).collect()
        b = back.agg(F.sum("l_extendedprice").cast("decimal(38,4)")).collect()
        assert a == b

    def test_key_budget_overflow_raises(self, spark, lineitem):
        # bits * n_cols must fit in one signed bigint (63 bits): past
        # that the interleave silently wraps and pruning degrades
        import pytest

        from etlutil_spark.sources.io import zorder_key

        with pytest.raises(ValueError, match="63-bit key budget"):
            zorder_key(lineitem, ["l_quantity", "l_extendedprice"], bits=32)
        with pytest.raises(ValueError, match="at least one column"):
            zorder_key(lineitem, [])
