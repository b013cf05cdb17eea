"""Connected-components validity: the iterative min-label propagation
must produce exactly the components a driver-side union-find derives
from the same pair list (independent check of the loop's convergence,
on top of the recursive-CTE oracle)."""

from __future__ import annotations

from flink_hiveorc_spark.registry import QUERIES

SF = "/root/testdata/sf0.001"


def test_components_match_union_find(spark):
    pairs = [
        (r.doc_a, r.doc_b)
        for r in QUERIES["dedup_minhash_lsh_pairs"](spark, SF).collect()
    ]
    assert pairs, "corpus should contain near-duplicate pairs"

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a: int, b: int) -> None:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    expected = {d: find(d) for d in parent}
    # Canonicalize: representative = min doc_id of the component.
    comp_min: dict[int, int] = {}
    for d, r in expected.items():
        comp_min[r] = min(comp_min.get(r, d), d)
    expected = {d: comp_min[r] for d, r in expected.items()}

    got = {
        r.doc_id: r.component
        for r in QUERIES["dedup_cluster_components"](spark, SF).collect()
    }
    assert got == expected
