"""End-to-end validation of the large-tier builder (apps/build_scale25.py):
the parallel numpy-only shard workers must produce artifacts that load through
graph/persistence and run the scan drivers to oracle-correct results — with
STORED per-edge weights round-tripping from disk (VERDICT r4 #1/#2).

Runs the real script as a subprocess at scale 13 (the script is scale-agnostic
via env), then exercises PR / MS-BFS / CC / weighted SSSP on the artifact."""
import json
import os
import subprocess
import sys

import numpy as np
import pytest
import jax.numpy as jnp

from vectorgraphlibrary_tpu.graph import persistence
from vectorgraphlibrary_tpu.io import generation
from vectorgraphlibrary_tpu.models import bfs as bfsm
from vectorgraphlibrary_tpu.models import cc as ccm
from vectorgraphlibrary_tpu.models import pr as prm
from vectorgraphlibrary_tpu.models import sssp as ssspm
from vectorgraphlibrary_tpu.parallel import sharded
from vectorgraphlibrary_tpu.utils import verify

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCALE, DEGREE, SHARDS = 13, 8, 4


@pytest.fixture(scope="module")
def built(tmp_path_factory):
    cache = str(tmp_path_factory.mktemp("s25cache"))
    env = dict(os.environ, VGL_S25_SCALE=str(SCALE),
               VGL_S25_DEGREE=str(DEGREE), VGL_S25_SHARDS=str(SHARDS),
               VGL_S25_WORKERS="2", VGL_S25_CACHE=cache)
    r = subprocess.run([sys.executable,
                        os.path.join(REPO, "apps", "build_scale25.py")],
                       env=env, capture_output=True, text=True, timeout=600)
    assert r.returncode == 0, r.stdout + r.stderr
    prefix = os.path.join(cache, f"rmat{SCALE}_{DEGREE}_slimw")
    ec = generation.rmat(scale=SCALE, avg_degree=DEGREE, seed=42,
                         weighted=True)
    return prefix, ec


def test_meta_and_balance(built):
    prefix, ec = built
    meta = json.load(open(f"{prefix}.meta.json"))
    assert meta["n_shards"] == SHARDS and meta["e"] == ec.edges_count
    eps = meta["edges_per_shard"]
    assert sum(eps) == ec.edges_count
    # the hash partition must beat mod-S's RMAT skew (~3x at mod-2)
    assert max(eps) < 1.5 * min(eps), eps
    # slim-save: no XLA-path arrays in the npz
    z = np.load(f"{prefix}.shard0.npz")
    assert "route.in_masks" not in z.files
    assert "route.mid_words" in z.files and "route.lane_inv" in z.files


def test_pagerank_on_artifact(built):
    prefix, ec = built
    sg = persistence.load_sharded_graph(prefix)
    got = np.asarray(sharded.pagerank_sharded_scan(
        sg, ec, max_iterations=25))[:sg.v]
    want = prm.seq_page_rank(ec, max_iterations=25, use_convergence=False)
    np.testing.assert_allclose(got, want, atol=1e-6)


def test_msbfs_and_cc_on_artifact(built):
    prefix, ec = built
    sg = persistence.load_sharded_graph(prefix)
    roots = np.arange(32, dtype=np.int32) * 7 + 1
    lv = np.asarray(sharded.msbfs_sharded_scan(sg, jnp.asarray(roots)))
    for r in (0, 31):
        want = bfsm.seq_top_down(ec, int(roots[r]))
        np.testing.assert_array_equal(lv[r, :sg.v].astype(np.int32), want)
    hub = int(np.argmax(np.bincount(ec.src_ids, minlength=sg.v)))
    labels, _, _ = sharded.cc_hybrid_sharded_scan(sg, jnp.int32(hub))
    assert verify.equal_components(np.asarray(labels)[:sg.v],
                                   ccm.seq_cc(ec)) == 0


def test_streaming_matches_scan_and_oracle(built):
    """The streaming executor (parallel/streaming.py — the out-of-HBM path
    that runs the RMAT-25 tier) must agree with the scan path / oracles on
    the same artifact: PR, MS-BFS, CC, stored-weight SSSP."""
    from vectorgraphlibrary_tpu.parallel import streaming
    prefix, ec = built
    ssg = streaming.load_streamed(prefix, weights=True)
    assert ssg.n_shards == SHARDS and ssg.e == ec.edges_count

    z = np.load(f"{prefix}.prconsts.npz")
    rev, dmask = z["rev"], z["dmask"]
    pad = ssg.v_pad - len(rev)
    ranks = np.asarray(streaming.pagerank_streamed(
        ssg, np.pad(rev, (0, pad)), np.pad(dmask, (0, pad)), iterations=25))
    want_pr = prm.seq_page_rank(ec, max_iterations=25, use_convergence=False)
    np.testing.assert_allclose(ranks[:ssg.v], want_pr, atol=1e-6)

    roots = np.arange(32, dtype=np.int32) * 5 + 2
    lv, _ = streaming.msbfs_streamed(ssg, roots)
    lv = np.asarray(lv)
    for r in (0, 31):
        want = bfsm.seq_top_down(ec, int(roots[r]))
        np.testing.assert_array_equal(lv[r, :ssg.v].astype(np.int32), want)

    hub = int(np.argmax(np.bincount(ec.src_ids, minlength=ssg.v)))
    labels, fl, hi = streaming.cc_hybrid_streamed(ssg, hub)
    assert verify.equal_components(np.asarray(labels)[:ssg.v],
                                   ccm.seq_cc(ec)) == 0
    assert fl >= 1

    dist, it = streaming.sssp_streamed(ssg, 5)
    want = ssspm.seq_dijkstra(ec, 5)
    assert verify.verify_results(np.asarray(dist)[:ssg.v], want) == 0
    assert it >= 2

    auth, hubv = streaming.hits_streamed(ssg, iterations=5)
    from vectorgraphlibrary_tpu.models import hits as hitsm
    wa, wh = hitsm.seq_hits(ec, iterations=5)
    np.testing.assert_allclose(np.asarray(auth)[:ssg.v], wa, atol=1e-4)
    np.testing.assert_allclose(np.asarray(hubv)[:ssg.v], wh, atol=1e-4)


def test_stored_weight_sssp_matches_oracle(built):
    """The headline ask: SSSP whose weights round-trip from disk equals the
    sequential oracle on the generator's ORIGINAL per-edge weights."""
    prefix, ec = built
    sg = persistence.load_sharded_graph(prefix)
    ws = persistence.load_sharded_weights(prefix, sg.n_shards)
    assert ws.shape == (sg.n_shards, sg.stacked.advance_route.n)
    wst = sharded.slot_weights_stacked(ws)
    src = 5
    dist, iters = sharded.sssp_sharded_scan(sg, wst, jnp.int32(src))
    want = ssspm.seq_dijkstra(ec, src)
    assert verify.verify_results(np.asarray(dist)[:sg.v], want) == 0
    assert int(iters) >= 2
    # partial == all-active on the same stored weights
    dist_a, _ = sharded.sssp_sharded_scan(sg, wst, jnp.int32(src),
                                          partial=False)
    np.testing.assert_allclose(np.asarray(dist), np.asarray(dist_a),
                               rtol=1e-6)
