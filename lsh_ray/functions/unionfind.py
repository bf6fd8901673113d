"""Union-find (disjoint set) over arbitrary uint64 ids.

Used by the clustering stage. Cluster ids are stable across resumes and
input orderings: the representative of a component is its MINIMUM member id
(content-derived doc_id), never an insertion-order artifact — fixing the
reference's positional-identity fragility (``lsh.py:263``, ``lsh.py:462-463``).
"""

from __future__ import annotations


class UnionFind:
    __slots__ = ("parent", "rank")

    def __init__(self) -> None:
        self.parent: dict[int, int] = {}
        self.rank: dict[int, int] = {}

    def find(self, x: int) -> int:
        parent = self.parent
        if x not in parent:
            parent[x] = x
            self.rank[x] = 0
            return x
        root = x
        while parent[root] != root:
            root = parent[root]
        while parent[x] != root:  # path compression
            parent[x], x = root, parent[x]
        return root

    def union(self, a: int, b: int) -> None:
        ra, rb = self.find(a), self.find(b)
        if ra == rb:
            return
        if self.rank[ra] < self.rank[rb]:
            ra, rb = rb, ra
        self.parent[rb] = ra
        if self.rank[ra] == self.rank[rb]:
            self.rank[ra] += 1

    def components(self) -> dict[int, int]:
        """node -> min-member-id of its component (deterministic labels)."""
        rep_min: dict[int, int] = {}
        for x in self.parent:
            r = self.find(x)
            cur = rep_min.get(r)
            if cur is None or x < cur:
                rep_min[r] = x
        return {x: rep_min[self.find(x)] for x in self.parent}
