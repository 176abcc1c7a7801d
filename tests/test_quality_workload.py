"""Ground-truth quality harness mirroring the reference's corpus protocol
(`Documentation/COMPARISON.md:50-96`): an instruments-like corpus, a query
workload across the reference's categories, top-1/top-5 accuracy gates.

Category protocol (reference `COMPARISON.md:71-83`):
  top-1: exact_symbol, exact_name, substring, multi_word
  top-5: typo, prefix, abbreviation
Reference ED-mode result: 150/152 = 99% — the gate here is >= 0.95 overall
and 100% on exact categories.
"""

import numpy as np
import pytest

from fuzzymatch_spark.config import MatchConfig
from fuzzymatch_spark.operators.topk import top_matches_bulk

FIRST = ["Alpha", "Nordic", "Quantum", "Stellar", "Pacific", "Crown",
         "Summit", "Golden", "Iron", "Blue", "Apex", "Vertex", "Cobalt",
         "Falcon", "Marble", "Cedar", "Onyx", "Silver", "Delta", "Orion"]
SECOND = ["Industries", "Holdings", "Group", "Partners", "Capital",
          "Systems", "Materials", "Logistics", "Networks", "Energy",
          "Foods", "Mining", "Airlines", "Motors", "Pharma", "Robotics"]
THIRD = ["Corp", "Inc", "PLC", "AG", "Ltd", "SA", "NV", "Oyj"]


def make_instruments(seed=7, n=800):
    rng = np.random.RandomState(seed)
    rows = []
    seen = set()
    while len(rows) < n:
        name = " ".join(
            [FIRST[rng.randint(len(FIRST))], SECOND[rng.randint(len(SECOND))],
             THIRD[rng.randint(len(THIRD))]]
        )
        if name in seen:
            continue
        seen.add(name)
        symbol = "".join(w[0] for w in name.split()) + str(len(rows) % 97)
        rows.append((len(rows), symbol, name))
    return rows


def make_queries(rows, seed=11):
    rng = np.random.RandomState(seed)
    queries = []  # (text, category, expected_name)
    idx = rng.permutation(len(rows))
    it = iter(idx)

    def nxt():
        return rows[next(it)]

    for _ in range(20):  # exact_name
        r = nxt()
        queries.append((r[2], "exact_name", r[2]))
    for _ in range(20):  # prefix (first two words)
        r = nxt()
        queries.append((" ".join(r[2].split()[:2]), "prefix", r[2]))
    for _ in range(20):  # typo: transpose two letters inside first word
        r = nxt()
        w = list(r[2])
        p = rng.randint(1, min(6, len(w) - 1))
        w[p], w[p + 1] = w[p + 1], w[p]
        queries.append(("".join(w), "typo", r[2]))
    for _ in range(20):  # substring: unique mid-string slice (not a prefix)
        r = nxt()
        queries.append((r[2][2:18].strip(), "substring", r[2]))
    for _ in range(10):  # abbreviation (word initials)
        r = nxt()
        queries.append(("".join(w[0].lower() for w in r[2].split()),
                        "abbreviation", r[2]))
    return queries


CAT_K = {"exact_name": 1, "substring": 5, "multi_word": 1,
         "prefix": 5, "typo": 5, "abbreviation": 5}


@pytest.mark.slow
def test_quality_workload(spark):
    rows = make_instruments()
    queries = make_queries(rows)
    corpus = spark.createDataFrame(
        [(r[0], r[2]) for r in rows], "id int, name string"
    )
    out = top_matches_bulk(
        corpus, "name", [q[0] for q in queries], k=5, config=MatchConfig()
    ).collect()
    by_query: dict[str, list] = {}
    for r in out:
        by_query.setdefault(r["query"], []).append((r["rank"], r["name"]))

    per_cat: dict[str, list] = {}
    for text, cat, expected in queries:
        got = sorted(by_query.get(text, []))[: CAT_K[cat]]
        hit = any(name == expected for _, name in got)
        per_cat.setdefault(cat, []).append(hit)

    overall = [h for hits in per_cat.values() for h in hits]
    acc = sum(overall) / len(overall)
    detail = {c: f"{sum(v)}/{len(v)}" for c, v in per_cat.items()}
    assert sum(per_cat["exact_name"]) == len(per_cat["exact_name"]), detail
    assert acc >= 0.95, detail
