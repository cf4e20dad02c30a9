"""Connected-components clustering tests: distributed min-label
propagation vs a driver-side union-find oracle on random graphs.
"""

from __future__ import annotations

import random

import pytest
from pyspark.sql import Row

from post_modern_stack_spark.operators.dedup import cluster_pairs


def _union_find(pairs):
    parent: dict[int, int] = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {n: find(n) for n in parent}


def test_clusters_simple_chain(spark):
    # chain 1-2-3-4 plus isolated pair 10-11
    pairs = [(1, 2), (2, 3), (3, 4), (10, 11)]
    df = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in pairs])
    got = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(df).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_clusters_match_union_find_on_random_graph(spark):
    rng = random.Random(7)
    pairs = list({(min(a, b), max(a, b))
                  for a, b in ((rng.randrange(200), rng.randrange(200))
                               for _ in range(300)) if a != b})
    df = spark.createDataFrame([Row(id_a=a, id_b=b) for a, b in pairs])
    got = {r["doc_id"]: r["cluster_id"] for r in cluster_pairs(df).collect()}
    assert got == _union_find(pairs)
