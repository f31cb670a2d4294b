"""Real-graph corpus: KONECT download + cache + load.

Capability match for the reference harness's corpus machinery
(`apps/scripts/create_graphs_api.py:83-206`, `settings.py:52-86`): named
KONECT graphs are downloaded on demand, converted once to the binary
.el_container format, and served from a local cache. In zero-egress
environments the download step degrades gracefully — any KONECT-format file
(or prepared .el_container) dropped under the cache directory is picked up
by name, and `any_cached_graph()` lets the bench use whatever is present.

Cache dir: $VGL_GRAPH_DIR, else <repo>/.graphs/.
"""
from __future__ import annotations

import os
import tarfile
import tempfile
from typing import Optional, Tuple

import numpy as np

from .edges_container import EdgesContainer
from .konect import import_konect

# KONECT internal names (http://konect.cc/networks/): the reference's corpus
# categories — soc / web / road / rating (create_graphs_api.py:83-206)
KONECT_GRAPHS = {
    "soc-livejournal": "soc-LiveJournal1",
    "soc-pokec": "soc-pokec-relationships",
    "soc-orkut": "orkut-links",
    "soc-youtube": "youtube-u-growth",
    "web-baidu": "zhishi-baidu-internallink",
    "web-wiki-en": "wikipedia_link_en",
    "web-trackers": "trackers-trackers",
    "road-texas": "roadNet-TX",
    "road-california": "roadNet-CA",
    "rating-amazon": "amazon-ratings",
    "rating-netflix": "netflix",
}
_URL = "http://konect.cc/files/download.tsv.{name}.tar.bz2"


def graph_dir() -> str:
    d = os.environ.get("VGL_GRAPH_DIR")
    if not d:
        repo = os.path.dirname(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))))
        d = os.path.join(repo, ".graphs")
    os.makedirs(d, exist_ok=True)
    return d


def _container_path(name: str) -> str:
    return os.path.join(graph_dir(), f"{name}.el_container")


def _find_text_file(name: str) -> Optional[str]:
    """A KONECT text file for `name` anywhere under the cache dir."""
    internal = KONECT_GRAPHS.get(name, name)
    for root, _, files in os.walk(graph_dir()):
        for f in files:
            if f.startswith(("out.", "out_")) and internal in root:
                return os.path.join(root, f)
            if f in (f"{name}.txt", f"{name}.el", f"{internal}.txt"):
                return os.path.join(root, f)
    return None


def download(name: str, timeout: float = 60.0) -> Optional[str]:
    """Fetch + unpack a KONECT tarball into the cache; None on failure
    (offline/zero-egress environments)."""
    internal = KONECT_GRAPHS.get(name, name)
    dest = os.path.join(graph_dir(), internal)
    if os.path.isdir(dest):
        return dest
    url = _URL.format(name=internal)
    try:
        import urllib.request
        with urllib.request.urlopen(url, timeout=timeout) as r, \
                tempfile.NamedTemporaryFile(suffix=".tar.bz2") as tmp:
            tmp.write(r.read())
            tmp.flush()
            with tarfile.open(tmp.name, "r:bz2") as tar:
                tar.extractall(graph_dir(), filter="data")
        return dest if os.path.isdir(dest) else graph_dir()
    except Exception as exc:                      # noqa: BLE001
        print(f"corpus: download of {name} failed ({exc}); "
              f"place the file under {graph_dir()} to use it")
        return None


def load(name: str, fetch: bool = True) -> Optional[EdgesContainer]:
    """Cached-container → cached-text → (optionally) download → None."""
    cpath = _container_path(name)
    if os.path.exists(cpath):
        return EdgesContainer.load_from_binary_file(cpath)
    txt = _find_text_file(name)
    if txt is None and fetch:
        download(name)
        txt = _find_text_file(name)
    if txt is None:
        return None
    ec = import_konect(txt)
    ec.save_to_binary_file(cpath)           # convert once (reference -convert)
    return ec


# real-world graphs shipped IN the repo (zero-egress fallbacks), largest
# first: software-dependency/call networks are a standard KONECT category.
# - pycalls: static function-call graph of the installed Python code
#   (apps/make_call_graph.py — ~495k functions / ~1.51M resolved call edges)
# - pydeps: module import network (apps/make_real_graph.py — ~31.6k modules
#   / ~222k import edges)
BUNDLED = ["pycalls", "pydeps"]


def bundled_graph(name: Optional[str] = None
                  ) -> Tuple[str, Optional[EdgesContainer]]:
    """A real-world graph shipped in the repo, converted once to
    .el_container in the cache. Default: the largest bundled graph."""
    for cand in ([name] if name else BUNDLED):
        cpath = _container_path(cand)
        if os.path.exists(cpath):
            return cand, EdgesContainer.load_from_binary_file(cpath)
        src = os.path.join(os.path.dirname(os.path.dirname(
            os.path.abspath(__file__))), "data", f"{cand}.el.gz")
        if os.path.exists(src):
            ec = import_konect(src)
            ec.save_to_binary_file(cpath)
            return cand, ec
    return (name or "pydeps"), None


def any_cached_graph() -> Tuple[Optional[str], Optional[EdgesContainer]]:
    """(name, EdgesContainer) of some locally available corpus graph, or the
    bundled real graph as last resort. Prefers prepared .el_container files;
    does NOT hit the network."""
    d = graph_dir()
    for f in sorted(os.listdir(d)):
        if f.endswith(".el_container"):
            name = f[:-len(".el_container")]
            return name, EdgesContainer.load_from_binary_file(
                os.path.join(d, f))
    for name in KONECT_GRAPHS:
        ec = load(name, fetch=False)
        if ec is not None:
            return name, ec
    return bundled_graph()
