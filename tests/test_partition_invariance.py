"""Partitioning-invariance gate (CI subset of tools/partition_invariance.py).

The canonical fixture is one file per table = ONE deterministic scan
partition, so a partition-order-dependent computation (raw SUM(double),
unkeyed collect_list fold, first()-pick) can pass every oracle hash and
still be nondeterministic on a real multi-file layout. This gate rewrites
the tables as 8 round-robin parquet parts and asserts a numerically-risky
query subset produces bit-identical results on both layouts. The full
registry sweep is the tool; run it per-round.
"""

from __future__ import annotations

import pytest

from tools.oracle_check import rows_multiset
from tools.partition_invariance import build_split_copy
from tutorial_iceberg_spark.registry import all_queries

RISKY = [
    "x_embed_label_stats",  # ordered-fold norm total (was a raw sum)
    "x_stream_tumbling_agg",  # decimal streaming sum + dir-robust source
    "x_ema_daily",  # collect_list fold (array_sort keyed)
    "f13_string_agg",  # sorted distinct collect
    "w5_decile_segments",  # distributed_row_number rank
    "x_corpus_shuffle",  # global shuffle position
    "x_retention_bitmap",  # bit_or mask agg
    "x_mixture_sample",  # md5-gated sampling membership
]


@pytest.fixture(scope="module")
def split_dir(spark, sf_dir, tmp_path_factory):
    dest = str(tmp_path_factory.mktemp("split"))
    build_split_copy(spark, sf_dir, dest)
    return dest


@pytest.mark.parametrize("name", RISKY)
def test_result_invariant_under_multi_file_layout(name, spark, sf_dir, split_dir):
    spec = all_queries()[name]
    base_df = spec.builder(spark, sf_dir)
    base = rows_multiset(base_df.collect(), base_df.columns)
    split_df = spec.builder(spark, split_dir)
    split = rows_multiset(split_df.collect(), split_df.columns)
    assert base == split, f"{name} varies with file layout"
