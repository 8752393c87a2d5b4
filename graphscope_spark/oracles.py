"""Pure-NumPy/Python reference implementations (golden generators).

Replace the reference's gstest golden files (SURVEY.md §5,
FIXTURES.md §3) — each oracle implements the EXACT semantics of the
corresponding reference app, independently of any Spark code, on dense
in-memory arrays. Comparisons: np.allclose(atol=1e-6) for floats, exact
for ints.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np


def _remap(edges: list[tuple[int, int]]):
    """Arbitrary vertex ids → [0, n) index plus inverse map."""
    ids = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(ids)}
    return ids, idx


def oracle_pagerank(
    edges: list[tuple[int, int]],
    vertices: list[int] | None = None,
    alpha: float = 0.85,
    tol: float = 1e-06,
    max_iter: int = 100,
    fixed_rounds: int | None = None,
    personalization: dict | None = None,
    dangling: dict | None = None,
    nstart: dict | None = None,
    weights: list[float] | None = None,
) -> dict[int, float]:
    """apps/pagerank/pagerank_networkx.h:54-151 semantics, generalized
    to the NX wrapper's full option surface (personalization / dangling
    / nstart vectors, edge weights parallel to `edges`)."""
    if vertices is None:
        vertices = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(vertices)}
    n = len(vertices)
    out_w = np.zeros(n)
    adj: dict[int, list[tuple[int, float]]] = defaultdict(list)
    for k, (s, d) in enumerate(edges):
        w = 1.0 if weights is None else float(weights[k])
        out_w[idx[s]] += w
        adj[idx[s]].append((idx[d], w))

    def vec(dic: dict | None, default_uniform: np.ndarray | None) -> np.ndarray:
        if dic is None:
            return default_uniform
        v = np.zeros(n)
        total = float(sum(dic.values()))
        for k, x in dic.items():
            v[idx[k]] = float(x) / total
        return v

    uniform = np.full(n, 1.0 / n)
    p = vec(personalization, uniform)
    d = vec(dangling, p)
    rank = vec(nstart, uniform).copy()
    rounds = fixed_rounds if fixed_rounds is not None else max_iter
    for _ in range(rounds):
        ds = alpha * rank[out_w == 0].sum()
        new = (1 - alpha) * p + ds * d
        contrib = np.where(out_w > 0, rank / np.maximum(out_w, 1e-300), 0.0)
        for i, nbrs in adj.items():
            for j, w in nbrs:
                new[j] += alpha * contrib[i] * w
        eps = np.abs(new - rank).sum()
        rank = new
        if fixed_rounds is None and eps < tol * n:
            break
    return {v: float(rank[idx[v]]) for v in vertices}


def oracle_wcc(
    edges: list[tuple[int, int]], vertices: list[int] | None = None
) -> dict[int, int]:
    """apps/projected/wcc_projected.h:70-180: comp = min id in the
    undirected component (computed exactly via union-find)."""
    if vertices is None:
        vertices = sorted({v for e in edges for v in e})
    parent = {v: v for v in vertices}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for s, d in edges:
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[max(rs, rd)] = min(rs, rd)
    # path-compress to root, root is the min id by construction
    return {v: find(v) for v in vertices}


def oracle_cdlp(
    edges: list[tuple[int, int]],
    vertices: list[int] | None = None,
    max_round: int = 10,
    directed: bool = True,
) -> dict[int, int]:
    """LDBC CDLP: sync rounds, label = mode of neighbor labels (in+out
    for directed, multiplicity counted), min label on ties."""
    if vertices is None:
        vertices = sorted({v for e in edges for v in e})
    nbrs: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        nbrs[d].append(s)
        if directed:
            nbrs[s].append(d)
    if not directed:
        for s, d in edges:
            nbrs[s].append(d)
    label = {v: v for v in vertices}
    for _ in range(max_round):
        new = {}
        for v in vertices:
            if not nbrs[v]:
                new[v] = label[v]
                continue
            counts = Counter(label[u] for u in nbrs[v])
            best = max(counts.items(), key=lambda kv: (kv[1], -kv[0]))
            new[v] = best[0]
        label = new
    return label


def oracle_triangles(
    edges: list[tuple[int, int]], vertices: list[int] | None = None
) -> dict[int, int]:
    """apps/clustering/triangles.h:43-158: per-vertex triangle counts via
    degree-ordered orientation + intersection; all three corners credited."""
    if vertices is None:
        vertices = sorted({v for e in edges for v in e})
    simple = {
        (min(s, d), max(s, d)) for s, d in edges if s != d
    }
    deg = Counter()
    for a, b in simple:
        deg[a] += 1
        deg[b] += 1
    oriented: dict[int, set[int]] = defaultdict(set)
    for a, b in simple:
        if (deg[a], a) < (deg[b], b):
            oriented[a].add(b)
        else:
            oriented[b].add(a)
    tri = Counter()
    for a in list(oriented):
        for b in oriented[a]:
            common = oriented[a] & oriented.get(b, set())
            for w in common:
                tri[a] += 1
                tri[b] += 1
                tri[w] += 1
    return {v: tri.get(v, 0) for v in vertices}


def oracle_hits(
    edges: list[tuple[int, int]],
    vertices: list[int] | None = None,
    tolerance: float = 0.01,
    max_round: int = 100,
    normalized: bool = True,
) -> dict[int, tuple[float, float]]:
    """apps/hits/hits.h:31-204 (hub init 1/N, max-normalize per round,
    L1 stop on hub, final sum-normalize)."""
    if vertices is None:
        vertices = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(vertices)}
    n = len(vertices)
    hub = np.full(n, 1.0 / n)
    auth = np.zeros(n)
    e_idx = [(idx[s], idx[d]) for s, d in edges]
    for _ in range(max_round):
        hub_last = hub.copy()
        auth = np.zeros(n)
        for s, d in e_idx:
            auth[d] += hub_last[s]
        hub = np.zeros(n)
        for s, d in e_idx:
            hub[s] += auth[d]
        hub = hub / (hub.max() or 1.0)
        auth = auth / (auth.max() or 1.0)
        if np.abs(hub - hub_last).sum() <= tolerance:
            break
    if normalized:
        hub = hub / (hub.sum() or 1.0)
        auth = auth / (auth.sum() or 1.0)
    return {v: (float(hub[idx[v]]), float(auth[idx[v]])) for v in vertices}


def oracle_kcore(edges: list[tuple[int, int]], k: int) -> set[int]:
    """apps/kcore/kcore.h peel loop on the simple undirected graph."""
    simple = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    while True:
        deg = Counter()
        for a, b in simple:
            deg[a] += 1
            deg[b] += 1
        keep = {v for v, d in deg.items() if d >= k}
        new = {(a, b) for a, b in simple if a in keep and b in keep}
        if new == simple:
            return {v for e in simple for v in e}
        simple = new


def oracle_sssp(
    edges: list[tuple[int, int, float]],
    src: int,
    vertices: list[int] | None = None,
) -> dict[int, float]:
    """Bellman-Ford (same fixpoint as sssp_projected.h)."""
    if vertices is None:
        vertices = sorted({v for e in edges for v in e[:2]})
    dist = {v: float("inf") for v in vertices}
    dist[src] = 0.0
    for _ in range(len(vertices)):
        changed = False
        for s, d, w in edges:
            if dist[s] + w < dist[d]:
                dist[d] = dist[s] + w
                changed = True
        if not changed:
            break
    return dist


def oracle_bfs_depths(
    edges: list[tuple[int, int]],
    src: int,
    vertices: list[int] | None = None,
    directed: bool = True,
) -> dict[int, int]:
    """BFS levels; unreachable = -1 (grape::BFS output convention)."""
    if vertices is None:
        vertices = sorted({v for e in edges for v in e})
    adj: dict[int, list[int]] = defaultdict(list)
    for s, d in edges:
        adj[s].append(d)
        if not directed:
            adj[d].append(s)
    depth = {v: -1 for v in vertices}
    depth[src] = 0
    frontier = [src]
    lvl = 0
    while frontier:
        lvl += 1
        nxt = []
        for u in frontier:
            for v in adj[u]:
                if depth[v] == -1:
                    depth[v] = lvl
                    nxt.append(v)
        frontier = nxt
    return depth


def oracle_closeness(
    edges: list[tuple[int, int]],
    vertices: list[int] | None = None,
    directed: bool = True,
    wf_improve: bool = True,
) -> dict[int, float]:
    """closeness_centrality.h:121-139: reversed unit-weight distances
    to u; (cnt-1)/tot, WF-scaled by (cnt-1)/(n-1)."""
    if vertices is None:
        vertices = sorted({v for e in edges for v in e})
    n = len(vertices)
    rev = [(d, s) for s, d in edges] if directed else edges
    out = {}
    for u in vertices:
        depths = oracle_bfs_depths(rev, u, vertices=vertices, directed=directed)
        reach = [d for d in depths.values() if d >= 0]
        tot = float(sum(reach))
        cnt = len(reach)
        c = 0.0
        if tot > 0 and n > 1:
            c = (cnt - 1.0) / tot
            if wf_improve:
                c *= (cnt - 1.0) / (n - 1.0)
        out[u] = c
    return out


def oracle_katz(
    edges: list[tuple[int, int]],
    vertices: list[int] | None = None,
    alpha: float = 0.1,
    beta: float = 1.0,
    rounds: int = 5,
    normalized: bool = True,
    weights: list[float] | None = None,
) -> dict[int, float]:
    """katz_centrality.h: x' = alpha*Σ_in x + beta; final L2 norm.
    weights (aligned with edges) makes the sum Σ w·x (NX semantics)."""
    if vertices is None:
        vertices = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(vertices)}
    n = len(vertices)
    x = np.ones(n)
    e_idx = [(idx[s], idx[d]) for s, d in edges]
    ws = weights if weights is not None else [1.0] * len(e_idx)
    for _ in range(rounds):
        inc = np.zeros(n)
        for (s, d), w in zip(e_idx, ws):
            inc[d] += w * x[s]
        x = alpha * inc + beta
    if normalized:
        x = x / (np.sqrt((x * x).sum()) or 1.0)
    return {v: float(x[idx[v]]) for v in vertices}


def oracle_eigenvector(
    edges: list[tuple[int, int]],
    vertices: list[int] | None = None,
    rounds: int = 5,
    weights: list[float] | None = None,
) -> dict[int, float]:
    """eigenvector_centrality.h: x' = x + Σ_in x; per-round L2 norm.
    weights (aligned with edges) makes the sum Σ w·x (NX semantics)."""
    if vertices is None:
        vertices = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(vertices)}
    n = len(vertices)
    x = np.full(n, 1.0 / n)
    e_idx = [(idx[s], idx[d]) for s, d in edges]
    ws = weights if weights is not None else [1.0] * len(e_idx)
    for _ in range(rounds):
        inc = np.zeros(n)
        for (s, d), w in zip(e_idx, ws):
            inc[d] += w * x[s]
        x = x + inc
        x = x / (np.sqrt((x * x).sum()) or 1.0)
    return {v: float(x[idx[v]]) for v in vertices}


def oracle_clustering(
    edges: list[tuple[int, int]], vertices: list[int] | None = None
) -> dict[int, float]:
    """clustering.h via triangles + simple-degree (undirected defn)."""
    if vertices is None:
        vertices = sorted({v for e in edges for v in e})
    tri = oracle_triangles(edges, vertices)
    simple = {(min(s, d), max(s, d)) for s, d in edges if s != d}
    deg = Counter()
    for a, b in simple:
        deg[a] += 1
        deg[b] += 1
    return {
        v: (2.0 * tri[v] / (deg[v] * (deg[v] - 1)) if deg.get(v, 0) >= 2 else 0.0)
        for v in vertices
    }


def oracle_louvain(
    edges: list[tuple[int, int, float]] | list[tuple[int, int]],
    vertices: list[int] | None = None,
    min_progress: int = 1,
    progress_tries: int = 1,
    max_iters_per_level: int = 50,
    max_levels: int = 10,
    fixed_iters: int | None = None,
    fixed_levels: int | None = None,
) -> dict[int, int]:
    """apps/pregel/louvain/louvain.h semantics, synchronous BSP, same
    tie-breaks/parity/halting as algorithms/louvain.py (which mirrors
    the reference; see its docstring for the derivation)."""
    elist = [(e[0], e[1], float(e[2]) if len(e) > 2 else 1.0) for e in edges]
    if vertices is None:
        vertices = sorted({v for e in elist for v in e[:2]})

    # symmetric adjacency with per-pair weight sums, no self-loops
    def symmetrize(el):
        acc: dict[tuple[int, int], float] = {}
        for s, d, w in el:
            if s == d:
                continue
            acc[(s, d)] = acc.get((s, d), 0.0) + w
            acc[(d, s)] = acc.get((d, s), 0.0) + w
        return acc

    adj = symmetrize(elist)
    nodes = {v: 0.0 for v in vertices}  # internal weight
    membership = {v: v for v in vertices}

    def decide_to_halt(history):
        if not history:
            return False
        if history[-1] == 0:
            return True
        previous = history[0]
        count = 0
        for cur in history:
            if previous - cur <= min_progress:
                count += 1
            previous = cur
        return count > progress_tries

    levels = fixed_levels if fixed_levels is not None else max_levels
    prev_q = None
    for _level in range(levels):
        nbrs: dict[int, dict[int, float]] = defaultdict(dict)
        for (s, d), w in adj.items():
            nbrs[s][d] = w
        k = {
            v: sum(nbrs.get(v, {}).values()) + nodes[v] for v in nodes
        }
        m2 = sum(k.values()) or 1.0
        comm = {v: v for v in nodes}
        history: list[int] = []
        max_it = fixed_iters if fixed_iters is not None else max_iters_per_level
        for it in range(max_it):
            sigma = defaultdict(float)
            for v in nodes:
                sigma[comm[v]] += k[v]
            new_comm = {}
            moved = 0
            for v in nodes:
                kvc = defaultdict(float)
                for u, w in nbrs.get(v, {}).items():
                    kvc[comm[u]] += w
                cands = [(comm[v], 0.0)]
                for c, wsum in kvc.items():
                    is_cur = c == comm[v]
                    sig_adj = sigma[c] - (k[v] if is_cur else 0.0)
                    k_i_in = wsum + (nodes[v] if is_cur else 0.0)
                    if is_cur and sig_adj == 0.0:
                        dq = 0.0
                    else:
                        dq = k_i_in - k[v] * sig_adj / m2
                    cands.append((c, dq))
                best = min(cands, key=lambda t: (-t[1], t[0]))[0]
                cur = comm[v]
                if (cur > best and it % 2 == 0) or (cur < best and it % 2 == 1):
                    best = cur
                if best != cur:
                    moved += 1
                new_comm[v] = best
            comm = new_comm
            history.append(moved)
            if fixed_iters is None and decide_to_halt(history):
                break

        membership = {orig: comm[node] for orig, node in membership.items()}

        # compress
        new_internal = defaultdict(float)
        for v, iw in nodes.items():
            new_internal[comm[v]] += iw
        new_adj: dict[tuple[int, int], float] = {}
        for (s, d), w in adj.items():
            cs, cd = comm[s], comm[d]
            if cs == cd:
                new_internal[cs] += w
            else:
                new_adj[(cs, cd)] = new_adj.get((cs, cd), 0.0) + w
        new_nodes = {c: new_internal.get(c, 0.0) for c in set(comm.values())}

        # modularity of the assignment (same form as algorithms/louvain)
        sig = defaultdict(float)
        for v in nodes:
            sig[comm[v]] += k[v]
        q = sum(
            new_nodes[c] / m2 - (sig.get(c, 0.0) / m2) ** 2 for c in new_nodes
        )
        moved_total = sum(history)
        stop_outer = fixed_levels is None and (
            moved_total == 0 or (prev_q is not None and q <= prev_q)
        )
        prev_q = q
        if stop_outer:
            break
        adj, nodes = new_adj, new_nodes

    return membership
