"""Distributed algorithms over the sharded flagship container (ShardedTileGraph).

Execution model (the reference's MPI story, re-built for ICI): state lives
REPLICATED in ORIGINAL vertex order; each device owns one destination-range
shard and runs the SAME routed tiled advance the single-chip path runs
(`ops/advance.advance_pull_value` — Beneš route + fused finish); per-dst
partials merge with one psum/pmin over the shard axis (each destination's
in-edges live wholly in its owner shard, so the "merge" is really a
disjoint-range combine), matching the reference's advance-slice + exchange
(`nec/advance_worker.hpp:239-264`, `common/mpi_exchange.hpp:193-271`).

Two drivers over the same per-shard kernel:
- `make_*` factories: shard_map over a 1-D device mesh axis "e" — multi-chip;
- `*_scan`: lax.scan over the stacked shard axis — one chip processes shards
  sequentially, bounding peak route memory (the RMAT-24 scale path).

The full iteration loop runs INSIDE the shard_map body (lax.while/fori with
collective-synchronized convergence tests), so multi-chip runs have zero host
round-trips per iteration, exactly like the single-chip models.
"""
from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P
from jax.experimental.shard_map import shard_map

from ..config import TraversalDirection
from ..models import common
from ..ops.advance import advance_pull_value
from ..ops import monoid as M
from .mesh import EDGE_AXIS
from .shard_build import ShardedTileGraph, take_shard

O, S, G = (TraversalDirection.ORIGINAL, TraversalDirection.SCATTER,
           TraversalDirection.GATHER)
E = EDGE_AXIS


def _shard_pull_original(g, x_o, combine, direction=G, edge_values=None,
                         weight_op=None, exclude_self_loops=False):
    """One shard's routed pull with input/output in ORIGINAL ordering."""
    d = direction
    x_d = common.to_direction(g, x_o, O, d)
    out = advance_pull_value(g, x_d, combine, edge_values=edge_values,
                             weight_op=weight_op,
                             exclude_self_loops=exclude_self_loops,
                             direction=d)
    return common.to_direction(g, out, d, O)


def _merge(x, combine):
    if combine == "add":
        return jax.lax.psum(x, E)
    if combine == "min":
        return jax.lax.pmin(x, E)
    if combine == "max":
        return jax.lax.pmax(x, E)
    if combine == "or":
        return jax.lax.pmax(x.astype(jnp.int32), E).astype(x.dtype)
    raise ValueError(combine)


def _smap(mesh, fn, n_state_args: int, n_outs: int = 1):
    """shard_map wrapper: first arg = stacked graph pytree (sharded on the
    leading axis), remaining args replicated state; outputs replicated."""
    in_specs = (P(E),) + (P(),) * n_state_args
    out_specs = P() if n_outs == 1 else (P(),) * n_outs
    return jax.jit(shard_map(fn, mesh=mesh, in_specs=in_specs,
                             out_specs=out_specs, check_rep=False))


def pr_consts(ec):
    """Host precompute for PR in ORIGINAL space: (rev_deg, dangling_mask) over
    GLOBAL self-loop-excluded out-degrees (pr.hpp:6-148 semantics)."""
    v = ec.vertices_count
    nonloop = ec.src_ids != ec.dst_ids
    outdeg = np.bincount(ec.src_ids[nonloop], minlength=v).astype(np.float64)
    rev = np.where(outdeg > 0, 1.0 / np.maximum(outdeg, 1), 0.0)
    return rev.astype(np.float32), (outdeg == 0)


def _pad_v(arr, v_pad, fill=0):
    out = np.full(v_pad, fill, arr.dtype)
    out[:len(arr)] = arr
    return out


def make_pr_sharded(sg: ShardedTileGraph, mesh, ec, damping: float = 0.85,
                    max_iterations: int = 100):
    """jitted (stacked, ranks0, rev_deg, dangling_mask) -> ranks [v_pad, O]."""
    v, v_pad = sg.v, sg.v_pad
    k = (1.0 - damping) / v
    real = jnp.arange(v_pad) < v

    def body_fn(gstack, ranks0, rev, dmask):
        g = take_shard(gstack)

        def it(_, ranks):
            dangling = jnp.sum(jnp.where(dmask, ranks, 0.0)) / v
            acc = _shard_pull_original(g, ranks * rev, "add", direction=G,
                                       exclude_self_loops=True)
            acc = jax.lax.psum(jnp.where(real, acc, 0.0), E)
            return jnp.where(real, k + damping * (acc + dangling), 0.0)

        return jax.lax.fori_loop(0, max_iterations, it, ranks0)

    step = _smap(mesh, body_fn, 3)
    rev, dmask = pr_consts(ec)

    def run():
        ranks0 = jnp.where(real, 1.0 / v, 0.0).astype(jnp.float32)
        return step(sg.stacked, ranks0, jnp.asarray(_pad_v(rev, v_pad)),
                    jnp.asarray(_pad_v(dmask, v_pad, fill=False)))
    return run


def make_bfs_sharded(sg: ShardedTileGraph, mesh, max_levels: int = 10_000):
    """Level-synchronous pull BFS. jitted (stacked, source) -> levels [v_pad, O]
    (source level 1, unvisited -1 — reference convention)."""
    v, v_pad = sg.v, sg.v_pad
    INF = jnp.iinfo(jnp.int32).max
    real = jnp.arange(v_pad) < v

    def body_fn(gstack, source):
        g = take_shard(gstack)
        levels0 = jnp.where(jnp.arange(v_pad) == source, 1, INF)
        levels0 = jnp.where(real, levels0, INF)

        def cond(state):
            levels, size, cur = state
            return (size > 0) & (cur < max_levels)

        def it(state):
            levels, _, cur = state
            on = levels == cur
            reached = _shard_pull_original(g, on, "or", direction=G)
            reached = _merge(reached & real, "or")
            newly = reached & (levels == INF)
            return (jnp.where(newly, cur + 1, levels),
                    jnp.sum(newly, dtype=jnp.int32), cur + 1)

        levels, _, _ = jax.lax.while_loop(
            cond, it, (levels0, jnp.int32(1), jnp.int32(1)))
        return jnp.where(levels == INF, -1, levels)

    return _smap(mesh, body_fn, 1)


def make_sssp_sharded(sg: ShardedTileGraph, mesh, weights_stacked,
                      max_iterations: int = 10_000):
    """All-active Bellman-Ford. jitted (stacked, weights, source) -> dist."""
    v, v_pad = sg.v, sg.v_pad
    real = jnp.arange(v_pad) < v

    def body_fn(gstack, wstack, source):
        g = take_shard(gstack)
        ev = take_shard(wstack).incoming
        dist0 = jnp.where(jnp.arange(v_pad) == source, 0.0, jnp.inf)
        dist0 = jnp.where(real, dist0, jnp.inf).astype(jnp.float32)

        def relax(dist):
            cand = _shard_pull_original(g, dist, "min", direction=G,
                                        edge_values=ev, weight_op="add")
            cand = jax.lax.pmin(jnp.where(real, cand, jnp.inf), E)
            return jnp.minimum(dist, cand)

        def cond(state):
            dist, prev, it = state
            return (it < max_iterations) & jnp.any(dist != prev)

        def it_fn(state):
            dist, _, it = state
            return relax(dist), dist, it + 1

        dist, _, _ = jax.lax.while_loop(
            cond, it_fn, (relax(dist0), dist0, jnp.int32(1)))
        return dist

    in_specs = (P(E), P(E), P())
    return jax.jit(shard_map(body_fn, mesh=mesh, in_specs=in_specs,
                             out_specs=P(), check_rep=False))


def make_cc_sharded(sg: ShardedTileGraph, mesh, max_iterations: int = 1000):
    """Shiloach-Vishkin over the undirected neighborhood (hook = per-shard
    min-pulls over BOTH containers + pmin; jump = pointer halving)."""
    v, v_pad = sg.v, sg.v_pad
    real = jnp.arange(v_pad) < v
    ids = jnp.arange(v_pad, dtype=jnp.int32)

    def body_fn(gstack):
        g = take_shard(gstack)
        labels0 = jnp.where(real, ids, jnp.int32(v))
        BIGI = jnp.int32(jnp.iinfo(jnp.int32).max)

        def hook(labels):
            m_in = _shard_pull_original(g, labels, "min", direction=G)
            m_out = _shard_pull_original(g, labels, "min", direction=S)
            m = jnp.minimum(jnp.where(real, m_in, BIGI),
                            jnp.where(real, m_out, BIGI))
            m = jax.lax.pmin(m, E)
            return jnp.minimum(labels, m)

        def jump(labels):
            return jnp.take(labels, jnp.minimum(labels, v_pad - 1), mode="clip")

        def cond(state):
            labels, prev, it = state
            return (it < max_iterations) & jnp.any(labels != prev)

        def it_fn(state):
            labels, _, it = state
            new = jump(jump(hook(labels)))
            new = jnp.where(real, new, jnp.int32(v))
            return new, labels, it + 1

        labels, _, _ = jax.lax.while_loop(
            cond, it_fn, (labels0, jnp.full_like(labels0, -1), jnp.int32(0)))
        return labels

    return _smap(mesh, body_fn, 0)


def make_hits_sharded(sg: ShardedTileGraph, mesh, iterations: int = 20):
    """Alternating auth/hub pulls with L2 normalization (hits.hpp:5-176)."""
    v, v_pad = sg.v, sg.v_pad
    real = (jnp.arange(v_pad) < v).astype(jnp.float32)

    def body_fn(gstack):
        g = take_shard(gstack)
        auth0 = real
        hub0 = real

        def normalize(x):
            n = jnp.sqrt(jnp.sum(x * x))
            return jnp.where(n > 0, x / n, x)

        def it(_, state):
            auth, hub = state
            a = _shard_pull_original(g, hub, "add", direction=G)
            a = jax.lax.psum(a * real, E)
            auth = normalize(a)
            h = _shard_pull_original(g, auth, "add", direction=S)
            h = jax.lax.psum(h * real, E)
            return auth, normalize(h)

        return jax.lax.fori_loop(0, iterations, it, (auth0, hub0))

    return _smap(mesh, body_fn, 0, n_outs=2)


def _shard_pull_arrays_original(g, arrays_o, edge_op, combine, direction=G):
    """Generic multi-array shard pull in ORIGINAL ordering (for edge ops the
    restricted advance can't express, e.g. coloring's priority test)."""
    from ..ops.advance import advance_pull_fast
    arrs = {k: common.to_direction(g, a, O, direction)
            for k, a in arrays_o.items()}
    out = advance_pull_fast(g, arrs, edge_op, combine, direction=direction)
    return common.to_direction(g, out, direction, O)


def make_coloring_sharded(sg: ShardedTileGraph, mesh, seed: int = 0,
                          words: int = 4, max_rounds: int = 10_000):
    """Distributed Jones-Plassmann greedy coloring (reference
    coloring.hpp:66-158): per round, shard-local undirected pulls compute the
    best uncolored-neighbor priority (pmin merge) and the banned-color
    bitmasks (bitwise-or merge via pmax over int32), winners take their
    smallest free color. Returns jitted (stacked,) -> colors [v_pad, O]
    (UNCOLORED=-1 left for vertices whose 32*words window overflowed)."""
    v, v_pad = sg.v, sg.v_pad
    UNCOLORED = jnp.int32(-1)
    real = jnp.arange(v_pad) < v
    rng = np.random.default_rng(seed)
    prio_np = np.full(v_pad, 2**31 - 1, np.int32)
    prio_np[:v] = rng.permutation(v).astype(np.int32)
    prio = jnp.asarray(prio_np)

    def body_fn(gstack):
        g = take_shard(gstack)
        colors0 = jnp.where(real, UNCOLORED, jnp.int32(0))

        def und_min(arrays_o, edge_op):
            m_in = _shard_pull_arrays_original(g, arrays_o, edge_op, "min", G)
            m_out = _shard_pull_arrays_original(g, arrays_o, edge_op, "min", S)
            return jax.lax.pmin(jnp.minimum(m_in, m_out), E)

        def und_or(arrays_o, edge_op):
            m_in = _shard_pull_arrays_original(g, arrays_o, edge_op, "or", G)
            m_out = _shard_pull_arrays_original(g, arrays_o, edge_op, "or", S)
            both = m_in | m_out
            # bitwise-or across devices (pmax would drop bits): gather the
            # per-shard masks and OR-reduce locally
            allm = jax.lax.all_gather(both, E)
            return jax.lax.reduce(allm, jnp.zeros((), both.dtype),
                                  jax.lax.bitwise_or, (0,))

        def round_body(state):
            colors, rnd, _ = state
            uncolored = (colors == UNCOLORED) & real
            nb_best = und_min(
                {"c": colors, "p": prio},
                lambda s, d, w: jnp.where(s["c"] == UNCOLORED, s["p"],
                                          jnp.int32(2**31 - 1)))
            winner = uncolored & (prio <= nb_best)
            cand = jnp.full(v_pad, jnp.int32(words * 32), jnp.int32)
            for w in range(words):
                bw = und_or(
                    {"c": colors},
                    lambda s, d, wt, w=w: jnp.where(
                        (s["c"] >= 0) & (s["c"] // 32 == w),
                        jnp.left_shift(jnp.int32(1), s["c"] % 32),
                        jnp.int32(0)))
                free = jnp.bitwise_not(bw)
                lsb = free & (-free)
                pos = (31 - jnp.clip(jax.lax.clz(lsb.astype(jnp.uint32))
                                     .astype(jnp.int32), 0, 31))
                word_cand = jnp.where(free != 0, 32 * w + pos,
                                      jnp.int32(words * 32))
                cand = jnp.minimum(cand, word_cand)
            assign = winner & (cand < words * 32)
            new_colors = jnp.where(assign, cand, colors)
            return (new_colors, rnd + 1,
                    jnp.sum(assign, dtype=jnp.int32))

        def cond(state):
            colors, rnd, assigned = state
            return (assigned > 0) & (rnd < max_rounds)

        colors, _, _ = jax.lax.while_loop(
            cond, round_body, (colors0, jnp.int32(0), jnp.int32(1)))
        return colors

    return _smap(mesh, body_fn, 0)


# ---------------------------------------------------------------------------
# single-chip sequential-shard execution (scan over the stacked axis)
# ---------------------------------------------------------------------------

def sharded_pull_scan(sg: ShardedTileGraph, x_o: jax.Array, combine,
                      direction=G, weights_stacked=None, weight_op=None,
                      exclude_self_loops: bool = False) -> jax.Array:
    """Combine per-shard routed pulls sequentially on one chip: the out-of-HBM
    path — peak working set is ONE shard's route, not the whole graph's."""
    mon = M.get(combine)
    ident = mon.identity(x_o.dtype if combine != "or" else jnp.bool_)
    init = jnp.full((sg.v_pad,), ident,
                    x_o.dtype if combine != "or" else jnp.bool_)

    if weights_stacked is None:
        def body(acc, g):
            out = _shard_pull_original(g, x_o, combine, direction=direction,
                                       exclude_self_loops=exclude_self_loops)
            return mon.combine(acc, out), None
        acc, _ = jax.lax.scan(body, init, sg.stacked)
    else:
        def body(acc, gw):
            g, w = gw
            out = _shard_pull_original(g, x_o, combine, direction=direction,
                                       edge_values=w.incoming,
                                       weight_op=weight_op,
                                       exclude_self_loops=exclude_self_loops)
            return mon.combine(acc, out), None
        acc, _ = jax.lax.scan(body, init, (sg.stacked, weights_stacked))
    return acc


@functools.partial(jax.jit, static_argnums=(3,))
def _pr_scan_run(sg: ShardedTileGraph, rev, dmask, max_iterations: int):
    v, v_pad = sg.v, sg.v_pad
    real = jnp.arange(v_pad) < v
    k = (1.0 - 0.85) / v

    def it(_, ranks):
        dangling = jnp.sum(jnp.where(dmask, ranks, 0.0)) / v
        acc = sharded_pull_scan(sg, ranks * rev, "add", direction=G,
                                exclude_self_loops=True)
        acc = jnp.where(real, acc, 0.0)
        return jnp.where(real, k + 0.85 * (acc + dangling), 0.0)

    ranks0 = jnp.where(real, 1.0 / v, 0.0).astype(jnp.float32)
    return jax.lax.fori_loop(0, max_iterations, it, ranks0)


def pagerank_sharded_scan(sg: ShardedTileGraph, ec, max_iterations: int = 100
                          ) -> jax.Array:
    """Single-chip PageRank over sequential shards; returns [v_pad] ORIGINAL."""
    rev, dmask = pr_consts(ec)
    return _pr_scan_run(sg, jnp.asarray(_pad_v(rev, sg.v_pad)),
                        jnp.asarray(_pad_v(dmask, sg.v_pad, fill=False)),
                        max_iterations)


@functools.partial(jax.jit, static_argnums=(1,))
def hits_sharded_scan(sg: ShardedTileGraph, iterations: int = 20):
    """Single-chip HITS over sequential shards (hits.hpp:5-176 semantics);
    returns (auth, hub) [v_pad] ORIGINAL."""
    v, v_pad = sg.v, sg.v_pad
    real = (jnp.arange(v_pad) < v).astype(jnp.float32)

    def normalize(x):
        n = jnp.sqrt(jnp.sum(x * x))
        return jnp.where(n > 0, x / n, x)

    def it(_, state):
        auth, hub = state
        a = sharded_pull_scan(sg, hub, "add", direction=G) * real
        auth = normalize(a)
        h = sharded_pull_scan(sg, auth, "add", direction=S) * real
        return auth, normalize(h)

    return jax.lax.fori_loop(0, iterations, it, (real, real))


@functools.partial(jax.jit, static_argnums=(2,))
def bfs_sharded_scan(sg: ShardedTileGraph, source, max_levels: int = 10_000):
    """Single-chip level-synchronous pull BFS over sequential shards;
    (source,) -> levels [v_pad] ORIGINAL (source level 1, unvisited -1)."""
    v, v_pad = sg.v, sg.v_pad
    INF = jnp.iinfo(jnp.int32).max
    real = jnp.arange(v_pad) < v
    levels0 = jnp.where(jnp.arange(v_pad) == source, 1, INF)
    levels0 = jnp.where(real, levels0, INF)

    def cond(state):
        levels, size, cur = state
        return (size > 0) & (cur < max_levels)

    def it(state):
        levels, _, cur = state
        on = levels == cur
        reached = sharded_pull_scan(sg, on, "or", direction=G) & real
        newly = reached & (levels == INF)
        return (jnp.where(newly, cur + 1, levels),
                jnp.sum(newly, dtype=jnp.int32), cur + 1)

    levels, _, _ = jax.lax.while_loop(
        cond, it, (levels0, jnp.int32(1), jnp.int32(1)))
    return jnp.where(levels == INF, -1, levels)


@functools.partial(jax.jit, static_argnums=(1,))
def cc_sharded_scan(sg: ShardedTileGraph, max_iterations: int = 1000):
    """Single-chip Shiloach-Vishkin over sequential shards; -> labels [v_pad]."""
    v, v_pad = sg.v, sg.v_pad
    real = jnp.arange(v_pad) < v
    ids = jnp.arange(v_pad, dtype=jnp.int32)
    labels0 = jnp.where(real, ids, jnp.int32(v))
    BIGI = jnp.int32(jnp.iinfo(jnp.int32).max)

    def hook(labels):
        m_in = sharded_pull_scan(sg, labels, "min", direction=G)
        m_out = sharded_pull_scan(sg, labels, "min", direction=S)
        m = jnp.minimum(jnp.where(real, m_in, BIGI),
                        jnp.where(real, m_out, BIGI))
        return jnp.minimum(labels, m)

    def jump(labels):
        return jnp.take(labels, jnp.minimum(labels, v_pad - 1), mode="clip")

    def cond(state):
        labels, prev, it = state
        return (it < max_iterations) & jnp.any(labels != prev)

    def it_fn(state):
        labels, _, it = state
        new = jump(jump(hook(labels)))
        new = jnp.where(real, new, jnp.int32(v))
        return new, labels, it + 1

    labels, _, _ = jax.lax.while_loop(
        cond, it_fn, (labels0, jnp.full_like(labels0, -1), jnp.int32(0)))
    return labels
