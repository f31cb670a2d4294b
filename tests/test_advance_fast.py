"""advance_pull_fast (routed, gather-free) vs advance_pull (gather reference)."""
import numpy as np
import pytest
import jax.numpy as jnp

from vectorgraphlibrary_tpu.config import TraversalDirection
from vectorgraphlibrary_tpu.graph.device import import_graph
from vectorgraphlibrary_tpu.graph.edges import build_edge_array_from_host
from vectorgraphlibrary_tpu.io.edges_container import EdgesContainer
from vectorgraphlibrary_tpu.ops.advance import advance_pull, advance_pull_fast

S, G = TraversalDirection.SCATTER, TraversalDirection.GATHER


def _graph(v=700, e=6000, seed=0, weighted=False):
    rng = np.random.default_rng(seed)
    src = rng.integers(0, v, e).astype(np.int32)
    dst = rng.integers(0, v, e).astype(np.int32)
    w = rng.uniform(0.5, 2.0, e).astype(np.float32) if weighted else None
    ec = EdgesContainer(src_ids=src, dst_ids=dst, weights=w, vertices_count=v)
    host = []
    g = import_graph(ec, _host_out=host)
    ea = (build_edge_array_from_host(ec.weights, g, host[0], host[1])
          if weighted else None)
    return ec, g, ea


@pytest.mark.parametrize("direction", [G, S])
@pytest.mark.parametrize("combine", ["add", "min", "max", "or"])
def test_fast_matches_gather(direction, combine):
    ec, g, _ = _graph()
    rng = np.random.default_rng(1)
    if combine == "or":
        x = jnp.asarray(rng.integers(0, 2, g.v_pad).astype(bool))
        op = lambda s, d, w: s["x"]
    else:
        x = jnp.asarray(rng.standard_normal(g.v_pad), jnp.float32)
        op = lambda s, d, w: s["x"]
    ref = advance_pull(g, {"x": x}, op, combine, direction=direction)
    got = advance_pull_fast(g, {"x": x}, op, combine, direction=direction)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fast_with_weights_and_active():
    ec, g, ea = _graph(weighted=True)
    ev = ea.incoming
    rng = np.random.default_rng(2)
    dist = jnp.asarray(rng.uniform(0, 10, g.v_pad), jnp.float32)
    active = jnp.asarray(rng.integers(0, 2, g.v_pad).astype(bool))
    op = lambda s, d, w: s["d"] + w
    ref = advance_pull(g, {"d": dist}, op, "min", edge_values=ev,
                       src_active=active, direction=G)
    got = advance_pull_fast(g, {"d": dist}, op, "min", edge_values=ev,
                            src_active=active, direction=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_fast_with_dst_arrays_multi_src():
    ec, g, _ = _graph()
    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.standard_normal(g.v_pad), jnp.float32)
    b = jnp.asarray(rng.uniform(1, 2, g.v_pad), jnp.float32)
    dvals = jnp.asarray(rng.standard_normal(g.v_pad), jnp.float32)
    op = lambda s, d, w: s["a"] * s["b"] + d["c"]
    ref = advance_pull(g, {"a": a, "b": b}, op, "add",
                       dst_arrays={"c": dvals}, direction=G)
    got = advance_pull_fast(g, {"a": a, "b": b}, op, "add",
                            dst_arrays={"c": dvals}, direction=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-4, atol=1e-4)


def test_fast_falls_back_without_route(monkeypatch):
    ec, g, _ = _graph()
    import dataclasses
    g2 = dataclasses.replace(g, advance_route=None)
    x = jnp.ones(g.v_pad, jnp.float32)
    op = lambda s, d, w: s["x"]
    ref = advance_pull(g, {"x": x}, op, "add", direction=G)
    got = advance_pull_fast(g2, {"x": x}, op, "add", direction=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)
