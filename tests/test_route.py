"""Beneš routing: router correctness + routed advance == gathered advance."""
import numpy as np
import jax.numpy as jnp
import pytest

import vectorgraphlibrary_tpu as vgl
from vectorgraphlibrary_tpu import native
from vectorgraphlibrary_tpu.config import TraversalDirection
from vectorgraphlibrary_tpu.graph.device import import_graph
from vectorgraphlibrary_tpu.graph.edges import build_edge_array_from_host
from vectorgraphlibrary_tpu.ops.route import make_route_plan, apply_route
from vectorgraphlibrary_tpu.ops.advance import advance_pull, advance_pull_routed

G, S = TraversalDirection.GATHER, TraversalDirection.SCATTER


@pytest.mark.parametrize("k", [8, 11])
def test_apply_route_matches_perm(k):
    n = 1 << k
    rng = np.random.default_rng(k)
    perm = rng.permutation(n).astype(np.int64)
    plan = make_route_plan(perm)
    x = jnp.asarray(rng.random(n).astype(np.float32))
    y = apply_route(plan, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[perm])
    # inverse: y[perm] = x
    z = apply_route(plan, x, inverse=True)
    want = np.empty(n, np.float32)
    want[perm] = np.asarray(x)
    np.testing.assert_array_equal(np.asarray(z), want)


@pytest.fixture(scope="module")
def setup(small_rmat):
    ec = small_rmat.with_random_weights(seed=55)
    host = []
    g = import_graph(ec, _host_out=host, build_route=True)
    ea = build_edge_array_from_host(ec.weights, g, host[0], host[1])
    return ec, g, ea


def test_routed_pull_add_matches_gathered(setup):
    ec, g, ea = setup
    rng = np.random.default_rng(1)
    x_g = jnp.asarray(rng.random(g.v_pad).astype(np.float32))  # GATHER ordering
    ref = advance_pull(g, {"x": x_g}, lambda s, d, w: s["x"], "add", direction=G)
    # routed: src_vec must be in SCATTER ordering
    from vectorgraphlibrary_tpu.models import common
    x_s = common.to_direction(g, x_g, G, S)
    got = advance_pull_routed(g, x_s, lambda v, ids, d, w: v, "add", direction=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_routed_pull_min_weighted(setup):
    ec, g, ea = setup
    rng = np.random.default_rng(2)
    x_g = jnp.asarray((rng.random(g.v_pad) * 10).astype(np.float32))
    ref = advance_pull(g, {"x": x_g}, lambda s, d, w: s["x"] + w, "min",
                       edge_values=ea.incoming, direction=G)
    from vectorgraphlibrary_tpu.models import common
    x_s = common.to_direction(g, x_g, G, S)
    got = advance_pull_routed(g, x_s, lambda v, ids, d, w: v + w, "min",
                              edge_values=ea.incoming, direction=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_routed_pull_inverse_direction(setup):
    """Pull over OUTGOING edges via the inverse route (push-dense analog)."""
    ec, g, ea = setup
    rng = np.random.default_rng(3)
    x_s = jnp.asarray(rng.random(g.v_pad).astype(np.float32))  # SCATTER ordering
    # reference: gather-path pull over the outgoing container
    from vectorgraphlibrary_tpu.models import common
    ref = advance_pull(g, {"x": x_s}, lambda s, d, w: s["x"], "add",
                       direction=S)
    x_g = common.to_direction(g, x_s, S, G)
    got = advance_pull_routed(g, x_g, lambda v, ids, d, w: v, "add", direction=S)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)


def test_routed_pull_src_active(setup):
    ec, g, ea = setup
    rng = np.random.default_rng(4)
    x_g = jnp.asarray((rng.random(g.v_pad) * 5).astype(np.float32))
    act_g = jnp.asarray(rng.random(g.v_pad) < 0.3)
    ref = advance_pull(g, {"x": x_g}, lambda s, d, w: s["x"], "min",
                       src_active=act_g, direction=G)
    from vectorgraphlibrary_tpu.models import common
    x_s = common.to_direction(g, x_g, G, S)
    act_s = common.to_direction(g, act_g, G, S)
    got = advance_pull_routed(g, x_s, lambda v, ids, d, w: v, "min",
                              src_active=act_s, direction=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-5)
