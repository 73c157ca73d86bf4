"""Pure pandas/numpy oracles for the graph algorithms (FIXTURES.md §4).

No networkx, no GraphX — straight translations of the published algorithm
definitions, used to verify the Spark implementations on small graphs.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

MARKER_RE = re.compile(r"\[\[ref:([^\]]+)\]\]")


def extract_edges_oracle(transcripts: pd.DataFrame, dedupe: bool = True) -> pd.DataFrame:
    rows = []
    for conv_id, text in zip(transcripts["conv_id"], transcripts["text"]):
        if not isinstance(text, str):
            continue
        for m in MARKER_RE.findall(text):
            rows.append((conv_id, m))
    df = pd.DataFrame(rows, columns=["src_conv", "dst_conv"])
    if dedupe:
        df = df.drop_duplicates()
    return df.sort_values(["src_conv", "dst_conv"]).reset_index(drop=True)


def pagerank_oracle(
    edges: np.ndarray,
    n: int,
    damping: float = 0.85,
    tol: float = 1e-6,
    max_iter: int = 100,
    fixed_iters: int | None = None,
) -> np.ndarray:
    """edges: int array [E, 2]. Dangling mass redistributed uniformly."""
    src, dst = edges[:, 0], edges[:, 1]
    out_deg = np.bincount(src, minlength=n).astype(np.float64)
    r = np.full(n, 1.0 / n)
    iters = fixed_iters if fixed_iters is not None else max_iter
    for _ in range(iters):
        contrib = np.zeros(n)
        np.add.at(contrib, dst, r[src] / out_deg[src])
        dangling = r[out_deg == 0].sum()
        new = (1.0 - damping) / n + damping * (contrib + dangling / n)
        delta = np.abs(new - r).sum()
        r = new
        if fixed_iters is None and delta < tol:
            break
    return r


def components_oracle(edges: np.ndarray, n: int) -> np.ndarray:
    """Union-find; component id = min vertex id in the component."""
    parent = np.arange(n)

    def find(x: int) -> int:
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(int(s)), find(int(d))
        if rs != rd:
            lo, hi = min(rs, rd), max(rs, rd)
            parent[hi] = lo
    return np.array([find(i) for i in range(n)])


def label_propagation_oracle(
    edges: np.ndarray, n: int, iters: int
) -> np.ndarray:
    """Synchronous LPA over the undirected graph; most frequent neighbor
    label, ties → min label; isolated vertices keep their own label."""
    sym = np.vstack([edges, edges[:, ::-1]])
    sym = np.unique(sym[sym[:, 0] != sym[:, 1]], axis=0)
    labels = np.arange(n, dtype=np.int64)
    for _ in range(iters):
        new = labels.copy()
        nbr_of = {}
        for u, v in sym:
            nbr_of.setdefault(int(u), []).append(int(v))
        for u, nbrs in nbr_of.items():
            nbr_labels = labels[nbrs]
            vals, counts = np.unique(nbr_labels, return_counts=True)
            best = vals[counts == counts.max()].min()
            new[u] = best
        if np.array_equal(new, labels):
            break
        labels = new
    return labels


def triangles_oracle(edges: np.ndarray, n: int) -> tuple[int, np.ndarray]:
    """Exact triangle count (global + per vertex) over the simple undirected
    graph induced by ``edges`` (self-loops and duplicates removed)."""
    canon = np.unique(
        np.sort(edges[edges[:, 0] != edges[:, 1]], axis=1), axis=0
    )
    adj: dict[int, set[int]] = {}
    for u, v in canon:
        adj.setdefault(int(u), set()).add(int(v))
        adj.setdefault(int(v), set()).add(int(u))
    per_vertex = np.zeros(n, dtype=np.int64)
    total = 0
    for u, v in canon:
        common = adj[int(u)] & adj[int(v)]
        for w in common:
            if w > v:  # u < v < w counted once
                total += 1
                per_vertex[int(u)] += 1
                per_vertex[int(v)] += 1
                per_vertex[w] += 1
    return total, per_vertex
