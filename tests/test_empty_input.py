"""Zero-row robustness sweep (SURVEY.md §5.4 layer 3).

Fixtures never exercise the empty relation, but production does: a
partition with no files, a filter that eliminates a shard, day one of a
new tenant.  Operators built from slice/sequence/window/agg logic have
empty-input failure modes (negative slice lengths, descending
sequences, min/max of nothing) that no sf>0 check can catch — so every
registered batch query is run against a 0-row copy of the warehouse
and must plan + execute cleanly to an empty (or constant) result.

Streaming queries are exercised through the bounded-replay harness
elsewhere; replaying an empty directory is a harness concern, not an
operator one, so ``stream_*`` / source adapters are excluded here.
"""

from __future__ import annotations

import pytest

from powertrainstreaming_spark.plans.registry import all_defs
from powertrainstreaming_spark.sources.loaders import TABLE_DDL

_EXCLUDED_PREFIXES = ("stream_", "source_", "sink_")

# Queries whose SEMANTICS require rows (a 1-row probe vector for kNN,
# trained centroids) — they raise a clear error on an empty corpus by
# design, asserted separately below.
_NEEDS_ROWS = {
    "sim_knn_bruteforce",
    "sim_knn_ivf",
    "sim_knn_ivf_kmeans",
    "sim_pq_adc",  # trains per-subspace codebooks from corpus rows
    "sim_knn_ivf_pq",  # trains coarse + residual codebooks from rows
    "dedup_embedding_cluster",  # trains k-means cells from corpus rows
    "dedup_embedding_cluster_mp",  # same trainer, 2-probe assign
}


@pytest.fixture(scope="module")
def empty_sf_dir(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("sf_empty")
    for name, ddl in TABLE_DDL.items():
        # events.parquet carries ts as int64 nanos on disk (TESTDATA.md);
        # the DDL already models the on-disk long, so an empty frame with
        # the DDL schema round-trips through the same loader path.
        spark.createDataFrame([], ddl).write.mode("overwrite").parquet(
            str(root / f"{name}.parquet")
        )
    return str(root)


def _batch_queries():
    return sorted(
        name
        for name in all_defs()
        if not name.startswith(_EXCLUDED_PREFIXES) and name not in _NEEDS_ROWS
    )


@pytest.mark.parametrize("name", _batch_queries())
def test_query_survives_empty_input(spark, empty_sf_dir, name):
    qdef = all_defs()[name]
    rows = qdef.fn(spark, empty_sf_dir).collect()
    # Global aggregates legitimately return one (zero/null) row;
    # everything else must be empty.  Either way: no exception, and a
    # materialized result.
    assert isinstance(rows, list)


@pytest.mark.parametrize("name", sorted(_NEEDS_ROWS))
def test_probe_queries_fail_loudly_on_empty_corpus(spark, empty_sf_dir, name):
    """Operators that must sample a probe/centroid from the corpus
    cannot return a meaningful result on empty input — they should
    raise (any exception), never hang or silently fabricate."""
    qdef = all_defs()[name]
    try:
        rows = qdef.fn(spark, empty_sf_dir).collect()
    except Exception:
        return
    assert rows == []
