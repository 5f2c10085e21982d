"""connected_components round-budget behaviour (round-1 ADVICE): a
diameter->max_rounds graph must NOT silently return split labels."""

from __future__ import annotations

import pyarrow as pa
import pytest


def _chain(n):
    import ray.data as rd

    return rd.from_arrow(pa.table({
        "a": pa.array([f"n{i:03d}" for i in range(n - 1)], pa.string()),
        "b": pa.array([f"n{i + 1:03d}" for i in range(n - 1)], pa.string()),
    }))


def test_nonconvergence_raises(ray_session):
    from cdrc_semantic_search_ray.pipelines.components import (
        connected_components)

    # a 12-node path has diameter 11 > 2 rounds → must raise, not return
    with pytest.raises(RuntimeError, match="round budget"):
        connected_components(_chain(12), max_rounds=2, driver_threshold=0)


def test_exact_fixpoint_converges_and_matches_driver(ray_session):
    from cdrc_semantic_search_ray.pipelines.components import (
        connected_components)

    dist = connected_components(_chain(9), max_rounds=16,
                                driver_threshold=0).to_pandas()
    drv = connected_components(_chain(9),
                               driver_threshold=10_000).to_pandas()
    key = ["node", "label"]
    assert (dist[key].sort_values(key).reset_index(drop=True)
            .equals(drv[key].sort_values(key).reset_index(drop=True)))
    assert set(dist["label"]) == {"n000"}  # one component, min-label rep
