"""Independent reimplementation of FindQtGroups for the q25 oracle.

Same specified algorithm as the engine port (operators/tile_groups.py —
/root/reference/calcqts/qttree.go:508-627 with harvest rule
findGroupIntFlat :369-439 and subtree detach Remove :93-121), but
structurally different on purpose: recursive preorder sweep over
dict-children nodes instead of the arena + iterative-DFS port, with subtree
removals propagated by return value instead of parent-pointer walks.  The
two implementations cross-check each other (pytest property test), and this
one feeds the DuckDB-side oracle (its groups are embedded as VALUES in the
q25 oracle SQL over an independently-computed DuckDB histogram).

Equivalence argument for the deferred total subtraction: the flat reference
sweep decrements ancestor totals immediately on harvest, but a preorder
sweep only ever reads the CURRENT node's total and its direct children's
totals, and ancestors of a harvested node are always visited BEFORE it — so
subtracting the harvested mass after the child loop is observationally
identical.
"""

from __future__ import annotations


class _Node:
    __slots__ = ("qt", "count", "total", "children")

    def __init__(self, qt: int):
        self.qt = qt
        self.count = 0
        self.total = 0
        self.children: dict = {}


def _round(qt: int, level: int) -> int:
    if (qt & 31) < level:
        return qt
    sh = 63 - 2 * level
    return ((qt >> sh) << sh) + level


def _add(root: _Node, qt: int, w: int) -> None:
    if qt < 0:
        return
    t = root
    while True:
        t.total += w
        if qt == t.qt:
            t.count += w
            return
        d = t.qt & 31
        nv = (qt >> (61 - 2 * d)) & 3
        if nv not in t.children:
            t.children[nv] = _Node(_round(qt, d + 1))
        t = t.children[nv]


def _sweep(node: _Node, absmin: int, mn: int, mx: int, out: list):
    """One harvest sweep (findGroupIntFlat semantics).  Returns
    (removed_total, harvested_self)."""
    if node.total < mn:
        return 0, False
    alls = all(c.total <= absmin for c in node.children.values())
    if node.count != 0 and (
        node.total == node.count or node.total <= mx or alls
    ):
        out.append((node.qt, node.total))
        return node.total, True
    removed = 0
    for nv in sorted(node.children):
        child = node.children[nv]
        r, harvested = _sweep(child, absmin, mn, mx, out)
        removed += r
        if harvested:
            del node.children[nv]
    node.total -= removed
    return removed, False


def find_qt_groups_ref(cells, counts, target: int = 8000,
                       minimum: int = 1) -> list:
    """Group a (cell, count) histogram; returns list of (group_cell, total).
    Semantics of FindQtGroups (qttree.go:508-627): harvest window widens by
    50 per round; leftover mass in a single leaf degrades to a root group;
    conservation asserted."""
    root = _Node(0)
    for c, w in zip(cells, counts):
        _add(root, int(c), int(w))
    orig_total = root.total

    mn, mx = target - 50, target + 50
    found_zero = False
    groups: list = []

    while root.total > 1000 and not found_zero:
        cont = True
        while cont and not found_zero:
            out: list = []
            _, root_harvested = _sweep(root, minimum, mn, mx, out)
            if root_harvested:
                found_zero = True
            cont = len(out) > 0
            groups.extend(out)
        if found_zero:
            break
        mn = max(mn - 50, minimum)
        mx += 50
        if mx > 1_000_000:
            break

    if not found_zero and root.total > 0:
        groups.append((0, root.total))

    got_total = sum(t for _, t in groups)
    if got_total != orig_total:
        raise ValueError(f"conservation failed: {got_total} != {orig_total}")
    return groups
