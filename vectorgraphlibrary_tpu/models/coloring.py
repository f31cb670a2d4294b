"""Greedy graph coloring (Jones-Plassmann style).

Capability match for the reference coloring (`algorithms/coloring/coloring.hpp:66-158`):
per-vertex banned-color bitmask (`set_bit/smallest_bit_pos` :13-62), gather neighbor
colors, pick smallest free color, recolor-conflict loop; validated by the same
property check (`verify_colors`, verify_results.h:291-319`).

TPU-native design: a Jones-Plassmann round — every uncolored vertex whose priority
beats all uncolored undirected neighbors picks the smallest color absent from its
neighborhood. Banned sets are W×32-bit words accumulated with bitwise-OR tiled pulls
(the reference's 64-bit mask generalized to a configurable 32·W-color window);
priority = degree-descending sorted id, so the parallel result matches the greedy
sequential ordering heuristic.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import TraversalDirection
from ..graph.device import VGLGraph
from ..graph.vertices import VertexArray
from . import common

O = TraversalDirection.ORIGINAL
UNCOLORED = jnp.int32(-1)


@functools.partial(jax.jit, static_argnums=(2, 3))
def _coloring_run(graph: VGLGraph, prio: jax.Array, words: int,
                  max_rounds: int):
    """prio must be a random permutation: Jones-Plassmann with degree-correlated
    priorities serializes into O(V)-long coloring chains on power-law graphs."""
    v, v_pad = graph.v, graph.v_pad
    ids = jnp.arange(v_pad, dtype=jnp.int32)
    real = ids < v
    colors0 = jnp.where(real, UNCOLORED, jnp.int32(0))

    def banned_word(colors, w):
        """OR of (1 << (color - 32w)) over undirected neighbors, per vertex.

        The message depends on the SOURCE alone, so it is pre-masked
        elementwise and pulled through the restricted fused advance — one
        route per direction. The old generic-edge-op form compiled 2 routed
        pulls per word per direction with per-array routing; at scale-18 the
        resulting while_loop HLO took >20 min to compile and killed the
        remote-compile worker (the r3 'coloring kernel fault')."""
        in_word = (colors >= 0) & (colors // 32 == w)
        src_bits = jnp.where(in_word,
                             jnp.left_shift(jnp.int32(1), colors % 32),
                             jnp.int32(0))
        return common.undirected_value_pull(graph, src_bits, "or")

    def round_body(state):
        colors, rnd, _ = state
        uncolored = (colors == UNCOLORED) & real
        # highest uncolored-neighbor priority (min sorted id = highest
        # priority) — source-only, so premask + min value pull
        prio_masked = jnp.where(colors == UNCOLORED, prio,
                                jnp.int32(2**31 - 1))
        nb_best = common.undirected_value_pull(graph, prio_masked, "min")
        # <= not <: a self-loop makes a vertex its own uncolored neighbor, so
        # nb_best == prio there; priorities are a permutation, so cross-vertex
        # equality cannot occur and <= stays race-free
        winner = uncolored & (prio <= nb_best)

        # smallest free color across words
        cand = jnp.full(v_pad, jnp.int32(words * 32), jnp.int32)
        for w in range(words):
            bw = banned_word(colors, w)
            free = jnp.bitwise_not(bw)
            has_free = free != 0
            lsb = free & (-free)
            # position of least significant set bit
            pos = (31 - jnp.clip(
                jax.lax.clz(lsb.astype(jnp.uint32)).astype(jnp.int32), 0, 31))
            word_cand = jnp.where(has_free, 32 * w + pos, jnp.int32(words * 32))
            cand = jnp.minimum(cand, word_cand)

        # SPECULATIVE assignment (csrcolor/Gebremedhin-Manne style): EVERY
        # uncolored vertex tentatively takes its min free color; a tentative
        # survives unless some undirected neighbor speculates the SAME color
        # (detected by an or-pull of tentative color bits). Conflicting
        # tentatives retry next round — except Jones-Plassmann winners, which
        # always stick (winners are priority-unique per neighborhood, so two
        # adjacent winners cannot exist → progress is guaranteed every
        # round). Pure-JP assignment serializes on the RMAT near-clique core
        # (measured rounds ≈ 4x chromatic number: 295 rounds at scale-14);
        # speculation keeps the non-conflicting mass every round.
        tentative = uncolored & (cand < words * 32)
        conflict = jnp.zeros(v_pad, dtype=bool)
        for w in range(words):
            tb_src = jnp.where(tentative & (cand // 32 == w),
                               jnp.left_shift(jnp.int32(1), cand % 32),
                               jnp.int32(0))
            nb_tent = common.undirected_value_pull(graph, tb_src, "or")
            mine = jnp.left_shift(jnp.int32(1), cand % 32)
            conflict = conflict | ((cand // 32 == w)
                                   & ((nb_tent & mine) != 0))
        keep = tentative & (winner | ~conflict)

        # saturated-window WINNERS (hub-adjacent vertices on high-chromatic
        # graphs) take max(neighbor colors)+1: valid for ANY chromatic number
        # at CONSTANT program size. (The old design retried the whole run
        # with a doubled window; at scale-18 the words=8 retry program
        # crashed the remote-compile worker — the r3 'coloring kernel
        # fault'.) The escape fires only when all 32*words window colors are
        # banned, so max_nb+1 > 32*words never collides with a window color,
        # and winner-uniqueness makes it conflict-free.
        max_nb = common.undirected_value_pull(
            graph, jnp.where(colors >= 0, colors, jnp.int32(-1)), "max")
        escape = winner & (cand >= words * 32)
        colors_new = jnp.where(keep, cand, colors)
        colors_new = jnp.where(
            escape, jnp.maximum(max_nb, jnp.int32(words * 32 - 1)) + 1,
            colors_new)
        changed = jnp.sum(keep | escape, dtype=jnp.int32)
        return colors_new, rnd + 1, changed

    def cond(state):
        _, rnd, changed = state
        return (rnd < max_rounds) & (changed > 0)

    colors, rounds, _ = jax.lax.while_loop(
        cond, round_body, (colors0, jnp.int32(0), jnp.int32(1)))
    remaining = jnp.sum((colors == UNCOLORED) & real, dtype=jnp.int32)
    return colors, rounds, remaining


def vgl_coloring(graph: VGLGraph, max_colors: int = 64,
                 max_rounds: int = 100_000, seed: int = 0
                 ) -> tuple[VertexArray, int]:
    import numpy as np
    rng = np.random.default_rng(seed)
    prio = jnp.asarray(rng.permutation(graph.v_pad).astype(np.int32))
    words = max(1, (max_colors + 31) // 32)
    colors, rounds, remaining = _coloring_run(graph, prio, words, max_rounds)
    assert int(remaining) == 0, (
        f"{int(remaining)} vertices uncolored after {int(rounds)} rounds — "
        "raise max_rounds")
    return VertexArray(values=colors, direction=O), int(rounds)


def seq_coloring(ec) -> np.ndarray:
    """Sequential greedy oracle (first-fit in vertex order)."""
    v = ec.vertices_count
    order = np.argsort(ec.src_ids, kind="stable")
    import scipy.sparse as sp
    und = sp.csr_matrix(
        (np.ones(2 * ec.edges_count, np.int8),
         (np.concatenate([ec.src_ids, ec.dst_ids]),
          np.concatenate([ec.dst_ids, ec.src_ids]))), shape=(v, v))
    colors = np.full(v, -1, np.int64)
    indptr, indices = und.indptr, und.indices
    for u in range(v):
        nb = colors[indices[indptr[u]:indptr[u + 1]]]
        nb = set(nb[nb >= 0].tolist())
        c = 0
        while c in nb:
            c += 1
        colors[u] = c
    return colors.astype(np.int32)
