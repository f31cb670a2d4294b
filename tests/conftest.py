"""Test configuration: run on a virtual 8-device CPU mesh.

Multi-chip hardware is unavailable in CI; tests exercise sharding on
xla_force_host_platform_device_count=8 virtual CPU devices (the "fake cluster" the
reference lacks — SURVEY.md §4 implication (d))."""
import os

# Exercise the routed (gather-free) code paths on the CPU backend: without this
# the backend gates in reorder()/advance_pull_fast() would fall back to gathers
# and CI would never run the program structure the TPU runs.
os.environ.setdefault("VGL_FORCE_ROUTED", "1")
# ... and run the fused Pallas kernels in interpret mode so the fused-finish
# advance path (what the TPU actually executes) is covered suite-wide.
os.environ.setdefault("VGL_PALLAS_INTERPRET", "1")

# NOTE: this environment's sitecustomize imports jax at interpreter startup with
# JAX_PLATFORMS=axon (TPU tunnel), so setting the env var here is too late — use
# jax.config.update, and set XLA_FLAGS before the cpu backend initializes.
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")
# persistent compilation cache: CPU XLA compiles of the tiled kernels dominate test
# wall time; cache them across runs
jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

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
