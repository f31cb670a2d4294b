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


def test_dispatch_uses_fused_under_interpret_env():
    n = 1 << 10
    rng = np.random.default_rng(5)
    perm = rng.permutation(n)
    plan = make_route_plan(perm)
    x = jnp.asarray(rng.standard_normal(n), jnp.float32)
    y = apply_route(plan, x)                       # dispatches fused (interpret)
    np.testing.assert_array_equal(np.asarray(y), np.asarray(x)[perm])
