"""Checkpoint/resume — superstep state with per-partition lineage + metrics.

North-rule requirement: every iteration's state checkpoints with lineage
and convergence metrics, and a killed run resumes mid-iteration from the
latest complete snapshot (see linkgraph/state.py for the parquet+manifest
stand-in for Iceberg snapshots).
"""

import networkx as nx
import pytest

from linkgraph.graph import from_nx
from linkgraph.algos.pagerank import pagerank
from linkgraph.algos.components import connected_components
from linkgraph.state import CheckpointStore


@pytest.fixture()
def G():
    return nx.barabasi_albert_graph(60, 2, seed=3)


def test_pagerank_resume_equals_straight_run(spark, tmp_path, G):
    g = from_nx(spark, G)
    straight = {
        r["id"]: r["rank"] for r in pagerank(g, fixed_iter=6, check_interval=1).collect()
    }

    store = CheckpointStore(str(tmp_path), "pr", spark)
    pagerank(g, fixed_iter=3, check_interval=1, checkpoint_store=store)
    assert store.latest_iteration() == 2  # iterations 0..2 committed

    resumed = {
        r["id"]: r["rank"]
        for r in pagerank(
            g,
            fixed_iter=6,
            check_interval=1,
            checkpoint_store=store,
            resume=True,
        ).collect()
    }
    assert store.latest_iteration() == 5
    for v in straight:
        assert resumed[v] == pytest.approx(straight[v], abs=1e-12)


def test_manifest_lineage_and_metrics(spark, tmp_path, G):
    g = from_nx(spark, G)
    store = CheckpointStore(str(tmp_path), "pr2", spark)
    pagerank(g, checkpoint_store=store, tol=1e-6)
    hist = store.metrics_history()
    assert len(hist) >= 2
    # convergence metrics recorded and decreasing toward the end
    errs = [m["l1_err"] for m in hist if m.get("l1_err") is not None]
    assert errs and errs[-1] < errs[0]
    # per-partition lineage present in every manifest
    m = store.manifest(store.latest_iteration())
    assert m["partitions"] and all(p["rows"] >= 0 for p in m["partitions"])
    assert m["metrics"]["edges_processed"] > 0


def test_connected_components_resume(spark, tmp_path, G):
    g = from_nx(spark, G)
    want = {r["id"]: r["component"] for r in connected_components(g).collect()}

    store = CheckpointStore(str(tmp_path), "cc", spark)
    connected_components(g, checkpoint_store=store)
    assert store.latest_iteration() >= 0

    resumed = {
        r["id"]: r["component"]
        for r in connected_components(
            g, checkpoint_store=store, resume=True
        ).collect()
    }
    assert resumed == want
