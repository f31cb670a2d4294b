"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; tests exercise sharding on
xla_force_host_platform_device_count=8 virtual CPU devices (the "fake cluster" the
reference lacks — SURVEY.md §4 implication (d))."""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import numpy as np
import pytest

from vectorgraphlibrary_tpu.io import generation
from vectorgraphlibrary_tpu.io.edges_container import EdgesContainer


@pytest.fixture(scope="session")
def small_rmat() -> EdgesContainer:
    return generation.rmat(scale=10, avg_degree=8, seed=3)


@pytest.fixture(scope="session")
def small_ru() -> EdgesContainer:
    return generation.random_uniform(scale=9, avg_degree=5, seed=7)


def coo_to_dense(ec: EdgesContainer, weights: bool = False) -> np.ndarray:
    """Oracle helper: dense adjacency (dst, src) counts or weight sums."""
    a = np.zeros((ec.vertices_count, ec.vertices_count),
                 dtype=np.float64 if weights else np.int64)
    w = ec.weights if weights else np.ones(ec.edges_count, dtype=np.int64)
    np.add.at(a, (ec.dst_ids, ec.src_ids), w)
    return a
