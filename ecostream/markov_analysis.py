"""Driver-local DTMC state classification (SURVEY §2.8 M4).

Re-implements the *capability* of the reference's MarkovChainAnalysis.py
(Tarjan SCC over the positive-probability adjacency, recurrent/transient
split, period per SCC) as a small pure-Python utility.  This runs on the
driver over a collected n×n matrix — sanctioned because the state space
is the event vocabulary (≤ a few dozen states), while the matrix itself
is computed distributed (see queries/markov.py).  For genuinely large
state spaces the SCC step would move to a distributed connected-
components formulation; not needed for parity.
"""

from __future__ import annotations

from math import gcd


def _tarjan_scc(adj: dict[str, list[str]]) -> list[list[str]]:
    """Iterative Tarjan strongly-connected components."""
    index: dict[str, int] = {}
    low: dict[str, int] = {}
    on_stack: set[str] = set()
    stack: list[str] = []
    sccs: list[list[str]] = []
    counter = [0]

    for root in adj:
        if root in index:
            continue
        work = [(root, iter(adj[root]))]
        index[root] = low[root] = counter[0]
        counter[0] += 1
        stack.append(root)
        on_stack.add(root)
        while work:
            node, it = work[-1]
            advanced = False
            for nxt in it:
                if nxt not in index:
                    index[nxt] = low[nxt] = counter[0]
                    counter[0] += 1
                    stack.append(nxt)
                    on_stack.add(nxt)
                    work.append((nxt, iter(adj[nxt])))
                    advanced = True
                    break
                elif nxt in on_stack:
                    low[node] = min(low[node], index[nxt])
            if advanced:
                continue
            work.pop()
            if work:
                parent = work[-1][0]
                low[parent] = min(low[parent], low[node])
            if low[node] == index[node]:
                scc = []
                while True:
                    w = stack.pop()
                    on_stack.discard(w)
                    scc.append(w)
                    if w == node:
                        break
                sccs.append(sorted(scc))
    return sccs


def _scc_period(scc: list[str], adj: dict[str, list[str]]) -> int:
    """Period of an SCC = gcd of cycle lengths through a representative
    (BFS level differences along internal edges)."""
    members = set(scc)
    rep = scc[0]
    level = {rep: 0}
    frontier = [rep]
    g = 0
    while frontier:
        nxt_frontier = []
        for node in frontier:
            for nxt in adj[node]:
                if nxt not in members:
                    continue
                if nxt not in level:
                    level[nxt] = level[node] + 1
                    nxt_frontier.append(nxt)
                else:
                    g = gcd(g, level[node] + 1 - level[nxt])
        frontier = nxt_frontier
    return abs(g) if g else 0


def classify_states(
    probs: dict[str, dict[str, float]], eps: float = 1e-12
) -> dict[str, dict]:
    """Classify DTMC states from a row-stochastic probability mapping.

    Returns per state: ``class`` (recurrent/transient), ``period``
    (0 = not applicable), ``scc`` (component id).  A state is recurrent
    iff its SCC has no edge leaving it (closed communicating class);
    transient otherwise — the standard finite-DTMC criterion.
    """
    states = sorted(probs)
    adj = {
        s: [t for t, p in probs.get(s, {}).items() if p > eps] for s in states
    }
    for s in states:
        for t in adj[s]:
            adj.setdefault(t, [])
    sccs = _tarjan_scc(adj)
    scc_of = {s: i for i, scc in enumerate(sccs) for s in scc}
    result: dict[str, dict] = {}
    for i, scc in enumerate(sccs):
        members = set(scc)
        closed = all(t in members for s in scc for t in adj[s])
        period = _scc_period(scc, adj) if closed else 0
        cls = "recurrent" if closed else "transient"
        for s in scc:
            result[s] = {"class": cls, "period": period, "scc": i}
    return result
