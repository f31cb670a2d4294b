"""Fused Pallas route (interpret mode on CPU) vs. the XLA stage path and the
ground-truth permutation."""
import os

os.environ["VGL_PALLAS_INTERPRET"] = "1"

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from vectorgraphlibrary_tpu.ops.route import make_route_plan, apply_route
from vectorgraphlibrary_tpu.ops.pallas import route_fused


@pytest.mark.parametrize("k,kb_max", [(10, 12), (13, 12), (13, 3)])
def test_fused_matches_permutation(k, kb_max, monkeypatch):
    # kb_max=3 forces kq > 0 (big-stage kernels) at test-sized n
    monkeypatch.setattr(route_fused, "_KB_MAX", kb_max)
    n = 1 << k
    rng = np.random.default_rng(7)
    perm = rng.permutation(n)
    plan = make_route_plan(perm)
    assert plan.mid_words is not None
    assert (plan.big_words is not None) == (k - 7 > kb_max)

    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = route_fused.apply_route_fused(plan, x)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[perm])

    # inverse: y2[perm] = x
    y2 = route_fused.apply_route_fused(plan, x, inverse=True)
    exp = np.empty(n, np.float32)
    exp[perm] = np.asarray(x)
    np.testing.assert_array_equal(np.asarray(y2), exp)


def test_fused_int_and_bool():
    n = 1 << 10
    rng = np.random.default_rng(3)
    perm = rng.permutation(n)
    plan = make_route_plan(perm)
    xi = jnp.asarray(rng.integers(0, 1 << 30, n), jnp.int32)
    np.testing.assert_array_equal(
        np.asarray(route_fused.apply_route_fused(plan, xi)),
        np.asarray(xi)[perm])
    xb = jnp.asarray(rng.integers(0, 2, n).astype(bool))
    np.testing.assert_array_equal(
        np.asarray(route_fused.apply_route_fused(plan, xb)),
        np.asarray(xb)[perm])


def test_fused_split_big_kernels(monkeypatch):
    """Outer+inner big-kernel split (large-kq routes past the VMEM budget):
    forward, inverse, and fused finish all through the split path."""
    monkeypatch.setattr(route_fused, "_KB_MAX", 3)
    monkeypatch.setattr(route_fused, "_KQ_SINGLE_MAX", 2)
    n = 1 << 15                  # kb=3, kq=5 -> kq1=3, kq2=2
    rng = np.random.default_rng(13)
    perm = rng.permutation(n)
    flags = rng.integers(0, 4, n).astype(np.uint8)
    plan = make_route_plan(perm, flags_fwd=flags, flags_inv=flags)
    assert plan.kq == 5
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    np.testing.assert_array_equal(
        np.asarray(route_fused.apply_route_fused(plan, x)),
        np.asarray(x)[perm])
    inv = np.empty(n, np.float32)
    inv[perm] = np.asarray(x)
    np.testing.assert_array_equal(
        np.asarray(route_fused.apply_route_fused(plan, x, inverse=True)), inv)
    fin = route_fused.FinishSpec(ident=-7.0, exclude_self_loops=True)
    ok = ((flags & 1) == 1) & ((flags >> 1) == 0)
    got = np.asarray(route_fused.apply_route_fused(plan, x, finish=fin))
    np.testing.assert_allclose(got, np.where(ok, np.asarray(x)[perm], -7.0))
    got_i = np.asarray(route_fused.apply_route_fused(plan, x, inverse=True,
                                                     finish=fin))
    np.testing.assert_allclose(got_i, np.where(ok, inv, -7.0))


@pytest.mark.parametrize("kb_max,weight_op", [(12, "add"), (3, "add"),
                                              (12, None), (3, "min")])
def test_fused_finish_flags(kb_max, weight_op, monkeypatch):
    """Fused finish epilogue: weight combine + static valid/self-loop masking
    in the last kernel, both directions."""
    monkeypatch.setattr(route_fused, "_KB_MAX", kb_max)
    n = 1 << 12
    rng = np.random.default_rng(11)
    perm = rng.permutation(n)
    flags_fwd = rng.integers(0, 4, n).astype(np.uint8)
    flags_inv = rng.integers(0, 4, n).astype(np.uint8)
    plan = make_route_plan(perm, flags_fwd=flags_fwd, flags_inv=flags_inv)
    assert plan.has_flags
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    w = jnp.asarray(rng.standard_normal(n), jnp.float32)
    ident = -5.0
    fin = route_fused.FinishSpec(ident=ident, exclude_self_loops=True,
                                 weight_op=weight_op)
    wts = w if weight_op else None

    def expect(base, flags):
        if weight_op == "add":
            base = base + np.asarray(w)
        elif weight_op == "min":
            base = np.minimum(base, np.asarray(w))
        ok = ((flags & 1) == 1) & ((flags >> 1) == 0)
        return np.where(ok, base, ident).astype(np.float32)

    y = route_fused.apply_route_fused(plan, x, finish=fin, weights=wts)
    np.testing.assert_allclose(np.asarray(y),
                               expect(np.asarray(x)[perm], flags_fwd),
                               rtol=1e-6)
    inv_base = np.empty(n, np.float32)
    inv_base[perm] = np.asarray(x)
    y2 = route_fused.apply_route_fused(plan, x, inverse=True, finish=fin,
                                       weights=wts)
    np.testing.assert_allclose(np.asarray(y2), expect(inv_base, flags_inv),
                               rtol=1e-6)


def test_dispatch_uses_fused_under_interpret_env():
    n = 1 << 10
    rng = np.random.default_rng(5)
    perm = rng.permutation(n)
    plan = make_route_plan(perm)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = apply_route(plan, x)                       # dispatches fused (interpret)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[perm])


def _value_graph(v=900, e=9000, seed=0, loops=True):
    from vectorgraphlibrary_tpu.graph.device import import_graph
    from vectorgraphlibrary_tpu.graph.edges import build_edge_array_from_host
    from vectorgraphlibrary_tpu.io.edges_container import EdgesContainer
    rng = np.random.default_rng(seed)
    src = rng.integers(0, v, e).astype(np.int32)
    dst = rng.integers(0, v, e).astype(np.int32)
    if loops:  # guarantee some self-loops for exclude_self_loops coverage
        src[:50] = dst[:50]
    w = rng.uniform(0.5, 2.0, e).astype(np.float32)
    ec = EdgesContainer(src_ids=src, dst_ids=dst, weights=w, vertices_count=v)
    host = []
    g = import_graph(ec, _host_out=host)
    ea = build_edge_array_from_host(w, g, host[0], host[1])
    return ec, g, ea


@pytest.mark.parametrize("direction_name,combine,weight_op,excl", [
    ("G", "add", None, True),       # PageRank shape
    ("G", "min", "add", False),     # SSSP pull shape
    ("G", "max", "min", False),     # SSWP shape
    ("S", "add", None, False),      # HITS hub phase (inverse route finish)
    ("S", "min", None, False),      # CC hook over out-edges
])
def test_advance_pull_value_fused_matches_gather(direction_name, combine,
                                                 weight_op, excl):
    from vectorgraphlibrary_tpu.config import TraversalDirection
    from vectorgraphlibrary_tpu.ops.advance import (advance_pull,
                                                    advance_pull_value)
    d = (TraversalDirection.GATHER if direction_name == "G"
         else TraversalDirection.SCATTER)
    ec, g, ea = _value_graph()
    assert g.advance_route.has_flags
    ev = ea.incoming if d == TraversalDirection.GATHER else ea.outgoing
    rng = np.random.default_rng(4)
    x = jnp.asarray(rng.uniform(0, 5, g.v_pad), jnp.float32)
    ids = jnp.arange(g.v_pad, dtype=jnp.int32)

    wops = {None: lambda a, b: a, "add": lambda a, b: a + b,
            "min": jnp.minimum, "max": jnp.maximum}
    from vectorgraphlibrary_tpu.ops.advance import _mask_value
    from vectorgraphlibrary_tpu.ops import monoid as M

    def ref_op(s, dd, w):
        out = wops[weight_op](s["x"], w)
        if excl:
            out = jnp.where(s["i"] == dd["i"],
                            jnp.asarray(_mask_value(M.get(combine),
                                                    jnp.float32), jnp.float32),
                            out)
        return out

    ref = advance_pull(g, {"x": x, "i": ids}, ref_op, combine,
                       dst_arrays={"i": ids}, edge_values=ev, direction=d)
    got = advance_pull_value(g, x, combine, edge_values=ev,
                             weight_op=weight_op, exclude_self_loops=excl,
                             direction=d)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=1e-5, atol=1e-5)


def test_advance_pull_value_bool_or_and_active():
    from vectorgraphlibrary_tpu.config import TraversalDirection
    from vectorgraphlibrary_tpu.ops.advance import advance_pull, advance_pull_value
    G = TraversalDirection.GATHER
    ec, g, ea = _value_graph(seed=2)
    rng = np.random.default_rng(6)
    xb = jnp.asarray(rng.integers(0, 2, g.v_pad).astype(bool))
    ref = advance_pull(g, {"x": xb}, lambda s, d, w: s["x"], "or", direction=G)
    got = advance_pull_value(g, xb, "or", direction=G)
    assert got.dtype == jnp.bool_
    np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
    # min with src_active (absorbing-value masking)
    x = jnp.asarray(rng.uniform(0, 5, g.v_pad), jnp.float32)
    act = jnp.asarray(rng.integers(0, 2, g.v_pad).astype(bool))
    ref = advance_pull(g, {"x": x}, lambda s, d, w: s["x"], "min",
                       src_active=act, direction=G)
    got = advance_pull_value(g, x, "min", src_active=act, direction=G)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-6)
