"""Planted-duplicate pipeline test (FIXTURES.md §4): candidate generation +
verify + connected components must recover >= 0.99 of planted dup pairs and
match the brute-force all-pairs oracle's cluster assignment at the same
shingle/signature/band config (north rule gate)."""

import itertools

import numpy as np
import pytest
from pyspark.sql import functions as F

from fuzzymatch_spark.config import DedupConfig
from fuzzymatch_spark.kernels.normalize import normalize_bytes
from fuzzymatch_spark.kernels.trigrams import jaccard, trigram_set
from fuzzymatch_spark.operators.cluster import cluster_assignments, connected_components
from fuzzymatch_spark.operators.dedup import (
    candidate_edges,
    compute_signatures,
    exact_dup_edges,
    minhash_band_edges,
    verify_edges,
)

WORDS = (
    "spark shuffle partition join window batch stream table scan merge sort "
    "hash key order fast small dup near exact image caption pixel frame "
    "engine vector query index bucket salt skew band row"
).split()


def make_corpus(seed=42, n_base=120):
    """Base captions + planted duplicate variants with labels."""
    rng = np.random.RandomState(seed)
    rows = []  # (id, text)
    dup_pairs = []  # (a_id, b_id, variant)
    next_id = 0

    def add(text):
        nonlocal next_id
        rid = f"doc{next_id:06d}"
        rows.append((rid, text))
        next_id += 1
        return rid

    for i in range(n_base):
        nw = rng.randint(6, 14)
        words = [WORDS[rng.randint(0, len(WORDS))] for _ in range(nw)]
        base = " ".join(words)
        base_id = add(base)
        r = rng.rand()
        if r < 0.2:  # exact dup
            dup_pairs.append((base_id, add(base), "exact"))
        elif r < 0.4:  # case/diacritic dup
            variant = base.upper() if rng.rand() < 0.5 else base.replace("a", "à")
            dup_pairs.append((base_id, add(variant), "fold"))
        elif r < 0.6:  # single transposition typo
            chars = list(base)
            p = rng.randint(0, len(chars) - 1)
            chars[p], chars[p + 1] = chars[p + 1], chars[p]
            dup_pairs.append((base_id, add("".join(chars)), "typo"))
        elif r < 0.8:  # d<=2 edits
            chars = list(base)
            for _ in range(rng.randint(1, 3)):
                p = rng.randint(0, len(chars))
                chars.insert(p, "x")
            dup_pairs.append((base_id, add("".join(chars)), "edit"))
        # else: singleton
    return rows, dup_pairs


CFG = DedupConfig(min_score=0.72, jaccard_threshold=0.6)


@pytest.fixture(scope="module")
def corpus(spark):
    rows, dup_pairs = make_corpus()
    df = spark.createDataFrame(rows, "doc_id string, text string")
    return df, rows, dup_pairs


def brute_force_edges(rows, cfg):
    """All-pairs oracle at the same config: exact-equality OR
    jaccard >= threshold OR DL-sim >= min_score (same verify semantics)."""
    from fuzzymatch_spark.kernels.editdist import substring_edit_distance

    norm = {rid: normalize_bytes(t.encode()) for rid, t in rows}
    tri = {rid: trigram_set(n) for rid, n in norm.items()}
    edges = set()
    for (a, _), (b, _) in itertools.combinations(rows, 2):
        na, nb = norm[a], norm[b]
        if na == nb:
            edges.add((min(a, b), max(a, b)))
            continue
        j = jaccard(tri[a], tri[b])
        score = j
        q, c = (na, nb) if len(na) <= len(nb) else (nb, na)
        max_ed = int(np.ceil((1 - cfg.min_score) * max(len(q), 1)))
        d = substring_edit_distance(q, c, max_ed)
        if d is not None:
            score = max(score, 1.0 - d / max(len(q), 1))
        if score >= cfg.min_score:
            edges.add((min(a, b), max(a, b)))
    return edges


def test_exact_dup_edges(spark, corpus):
    df, rows, dup_pairs = corpus
    sig = compute_signatures(df, "doc_id", "text", CFG).cache()
    got = {
        tuple(sorted((r["a_id"], r["b_id"])))
        for r in exact_dup_edges(sig).collect()
    }
    norm = {}
    want = set()
    for rid, t in rows:
        n = normalize_bytes(t.encode())
        norm.setdefault(n, []).append(rid)
    for ids in norm.values():
        m = min(ids)
        for other in ids:
            if other != m:
                want.add((m, other))
    assert got == want


def test_exact_dup_mega_group_bounded(spark):
    """A 100k-member boilerplate group must complete as bounded join rows,
    not one giant aggregation row: the plan carries no collect_list and the
    star edges all point at the group minimum."""
    n = 100_000
    df = spark.range(n).select(
        F.concat(F.lit("m"), F.lpad(F.col("id").cast("string"), 7, "0")).alias("id"),
        F.lit("boilerplate caption").alias("caption_norm"),
    )
    edges = exact_dup_edges(df)
    plan = edges._jdf.queryExecution().optimizedPlan().toString().lower()
    assert "collect_list" not in plan
    assert edges.count() == n - 1
    lo, hi = edges.select(F.min("a_id"), F.max("a_id")).first()
    assert lo == hi == "m0000000"


def test_planted_recall_and_oracle_parity(spark, corpus):
    df, rows, dup_pairs = corpus
    sig = compute_signatures(df, "doc_id", "text", CFG).cache()
    cand = candidate_edges(sig, CFG)
    verified = verify_edges(cand, sig, CFG).cache()
    got_edges = {
        tuple(sorted((r["a_id"], r["b_id"]))) for r in verified.collect()
    }

    # 1) recall on planted pairs
    planted = {tuple(sorted((a, b))) for a, b, _ in dup_pairs}
    hit = len(planted & got_edges)
    recall = hit / len(planted)
    assert recall >= 0.99, f"planted recall {recall}: missing {planted - got_edges}"

    # 2) cluster-assignment parity vs brute-force all-pairs oracle
    oracle_edges = brute_force_edges(rows, CFG)
    assert got_edges <= oracle_edges | planted  # no spurious edges beyond oracle
    oracle_df = spark.createDataFrame(
        [(a, b) for a, b in sorted(oracle_edges)], "a_id string, b_id string"
    )
    ids = df.select(F.col("doc_id"))
    got_clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_assignments(verified, ids, id_col="doc_id").collect()
    }
    want_clusters = {
        r["doc_id"]: r["cluster_id"]
        for r in cluster_assignments(oracle_df, ids, id_col="doc_id").collect()
    }
    mismatches = {
        k: (got_clusters[k], want_clusters[k])
        for k in want_clusters
        if got_clusters.get(k) != want_clusters[k]
    }
    agree = 1 - len(mismatches) / len(want_clusters)
    assert agree >= 0.99, f"cluster agreement {agree}: {list(mismatches.items())[:5]}"


def test_connected_components_basic(spark):
    edges = spark.createDataFrame(
        [("b", "a"), ("c", "b"), ("e", "d"), ("f", "f")],
        "a_id string, b_id string",
    )
    got = {
        (r["node"], r["cluster_id"])
        for r in connected_components(edges).collect()
    }
    assert got == {("a", "a"), ("b", "a"), ("c", "a"), ("d", "d"), ("e", "d")}


def test_cc_convergence_checks_are_amortized(spark, monkeypatch):
    """The convergence fingerprint (a full job + driver round-trip) fires on
    every 2nd iteration only — half the driver actions of per-iteration
    checking on the same chain graph, with identical labels."""
    import fuzzymatch_spark.operators.cluster as cl

    calls = {"n": 0}
    orig = cl._fingerprint

    def counting(df):
        calls["n"] += 1
        return orig(df)

    monkeypatch.setattr(cl, "_fingerprint", counting)
    chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(40)]
    edges = spark.createDataFrame(chain, "a_id string, b_id string")
    got = {r["cluster_id"] for r in cl.connected_components(edges).collect()}
    assert got == {"n000"}
    # a 41-node chain converges in ~4-6 star rounds; per-iteration checking
    # would cost that many fingerprints — every-2nd costs at most half + 1
    assert calls["n"] <= 4, calls["n"]


def test_connected_components_chain_and_star(spark):
    # long chain exercises multiple large/small-star rounds
    chain = [(f"n{i:03d}", f"n{i + 1:03d}") for i in range(40)]
    edges = spark.createDataFrame(chain, "a_id string, b_id string")
    got = {r["cluster_id"] for r in connected_components(edges).collect()}
    assert got == {"n000"}
    n = connected_components(edges).count()
    assert n == 41


def test_prefix_filtered_jaccard_equals_full_join(spark):
    """PPJoin prefix filtering is recall-complete: on a shingle-diverse
    corpus with planted near-dups, the prefix-filtered join returns the
    EXACT pair set of the full inverted-index join (all thresholds)."""
    import random
    import string

    from fuzzymatch_spark.config import DedupConfig
    from fuzzymatch_spark.operators.dedup import (
        compute_signatures,
        ngram_jaccard_pairs,
        ngram_jaccard_prefix_pairs,
    )

    rng = random.Random(7)
    rows = []
    for i in range(300):
        t = "".join(rng.choices(string.ascii_lowercase, k=80))
        rows.append((i, t))
        if i < 20:  # planted near-dup: one char changed
            rows.append(
                (100000 + i,
                 t[:40] + ("a" if t[40] != "a" else "b") + t[41:])
            )
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    sig = compute_signatures(docs, "doc_id", "text", DedupConfig()).persist()
    for pct in (95, 90, 70):
        full = {tuple(r) for r in
                ngram_jaccard_pairs(sig, threshold_pct=pct).collect()}
        pref = {tuple(r) for r in
                ngram_jaccard_prefix_pairs(sig, threshold_pct=pct).collect()}
        assert pref == full, f"pct={pct}: {len(pref)} vs {len(full)}"
    # the planted pairs are found
    pairs = {(a, b) for a, b, *_ in pref}
    assert all((i, 100000 + i) in pairs for i in range(20))
    sig.unpersist()


def test_cc_precontract_label_identical(spark):
    """The batch-local union-find pre-pass must not change labels: same
    components, same min-id cluster ids, on a graph with chains, stars,
    and singleton-free structure across partition boundaries."""
    import random

    from fuzzymatch_spark.operators.cluster import connected_components

    rng = random.Random(11)
    edges = []
    # 40 chains of length 6 + extra random intra-chain links
    for c in range(40):
        base = c * 100
        for i in range(5):
            edges.append((base + i, base + i + 1))
        edges.append((base + rng.randint(0, 5), base + rng.randint(0, 5)))
    df = spark.createDataFrame(edges, "a_id long, b_id long").repartition(8)
    plain = {(r["node"], r["cluster_id"])
             for r in connected_components(df).collect()}
    pre = {(r["node"], r["cluster_id"])
           for r in connected_components(df, precontract=True).collect()}
    assert plain == pre
    assert len({c for _, c in plain}) == 40


def test_label_prop_components_matches_star(spark):
    """labelprop is exact: identical (node, cluster_id) sets vs the star
    rounds on cliques, chains, and a random graph — including when
    max_iter forces the star-rounds fallback mid-propagation."""
    import random

    from fuzzymatch_spark.operators.cluster import (
        connected_components,
        label_prop_components,
    )

    rng = random.Random(5)
    edges = []
    # 10 cliques of 6 (diameter 1)
    for c in range(10):
        ids = [c * 50 + i for i in range(6)]
        edges += [(x, y) for x in ids for y in ids if x < y]
    # 5 chains of length 30 (diameter 29 — far beyond max_iter=3)
    for c in range(5):
        base = 10_000 + c * 100
        edges += [(base + i, base + i + 1) for i in range(29)]
    # random noise component
    nodes = [50_000 + i for i in range(40)]
    edges += [tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)]

    df = spark.createDataFrame(edges, "a_id long, b_id long").repartition(8)
    star = {(r["node"], r["cluster_id"])
            for r in connected_components(df).collect()}
    for max_iter in (3, 12):  # 3 forces the fallback on the chains
        lp = {(r["node"], r["cluster_id"])
              for r in label_prop_components(df, max_iter=max_iter).collect()}
        assert lp == star, f"max_iter={max_iter}"


def test_cluster_assignments_labelprop_method(spark):
    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.cluster import cluster_assignments

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], "a_id long, b_id long"
    )
    ids = spark.range(12).select(F.col("id"))
    a = sorted(tuple(r) for r in
               cluster_assignments(edges, ids, id_col="id").collect())
    b = sorted(tuple(r) for r in
               cluster_assignments(edges, ids, id_col="id",
                                   method="labelprop").collect())
    assert a == b


def test_cluster_assignments_auto_selection(spark):
    """Auto mode runs the fold (the every-measured-regime winner); the
    iterative crossover rule stays testable for explicit callers; all
    strategies are label-identical."""
    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.cluster import (
        cluster_assignments,
        pick_cc_method,
    )

    # the iterative decision rule, at the measured crossover
    assert pick_cc_method(948_000) == "star"  # sf0.1 regime
    assert pick_cc_method(9_200_000) == "labelprop"  # sf1 regime
    assert pick_cc_method(2_000_000) == "labelprop"  # threshold inclusive

    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9), (4, 5)], "a_id long, b_id long"
    )
    ids = spark.range(12).select(F.col("id"))
    star = sorted(tuple(r) for r in
                  cluster_assignments(edges, ids, id_col="id",
                                      method="star").collect())
    # auto == fold, label-identical to star
    auto = sorted(tuple(r) for r in
                  cluster_assignments(edges, ids, id_col="id").collect())
    assert auto == star
    fold = sorted(tuple(r) for r in
                  cluster_assignments(edges, ids, id_col="id",
                                      method="fold").collect())
    assert fold == star


def test_fold_components_matches_star(spark):
    """The two-level spanning-forest fold is exact: identical
    (node, cluster_id) sets vs the star rounds on cliques, long chains
    (high diameter), random graphs, and string ids — including when
    ``single_task_max_edges`` forces the labelprop fallback on the
    contracted forest."""
    import random

    from pyspark.sql import functions as F

    from fuzzymatch_spark.operators.cluster import (
        connected_components,
        fold_components,
    )

    rng = random.Random(11)
    edges = []
    for c in range(10):  # cliques of 6
        ids = [c * 50 + i for i in range(6)]
        edges += [(x, y) for x in ids for y in ids if x < y]
    for c in range(5):  # chains of length 30 — diameter 29
        base = 10_000 + c * 100
        edges += [(base + i, base + i + 1) for i in range(29)]
    nodes = [50_000 + i for i in range(40)]
    edges += [tuple(sorted(rng.sample(nodes, 2))) for _ in range(60)]
    # duplicate + reversed edges: fold must not depend on dedup/orientation
    edges += [(b, a) for a, b in edges[:20]] + edges[:10]

    df = spark.createDataFrame(edges, "a_id long, b_id long").repartition(8)
    star = {(r["node"], r["cluster_id"])
            for r in connected_components(df).collect()}
    fold = {(r["node"], r["cluster_id"])
            for r in fold_components(df).collect()}
    assert fold == star
    # threshold 1: level-2 would exceed one task -> exact labelprop finish
    fb = {(r["node"], r["cluster_id"])
          for r in fold_components(df, single_task_max_edges=1).collect()}
    assert fb == star

    # string ids: min label is lexicographic, matching Spark's F.min
    sdf = df.select(
        F.concat(F.lit("n"),
                 F.lpad(F.col("a_id").cast("string"), 6, "0")).alias("a_id"),
        F.concat(F.lit("n"),
                 F.lpad(F.col("b_id").cast("string"), 6, "0")).alias("b_id"),
    )
    star_s = {(r["node"], r["cluster_id"])
              for r in connected_components(sdf).collect()}
    fold_s = {(r["node"], r["cluster_id"])
              for r in fold_components(sdf).collect()}
    assert fold_s == star_s

    # empty edge set
    empty = spark.createDataFrame([], "a_id long, b_id long")
    assert fold_components(empty).count() == 0


def test_dedup_tier_waterfall(spark):
    """Planted 4-tier ladder: totals count each tier alone, marginals
    attribute every pair to its MIN catching rank (summing to the
    distinct pair total), new_ids attribute each node once, and a
    fully-redundant tier reports 0 marginal / 0 new ids; in-tier
    duplicate rows collapse."""
    from fuzzymatch_spark.operators.dedup import dedup_tier_waterfall

    edges = spark.createDataFrame(
        [
            (0, 1, 2), (0, 3, 4),
            (1, 1, 2), (1, 5, 6),
            (2, 3, 4), (2, 5, 6), (2, 7, 8), (2, 7, 8),
            (3, 1, 2),
        ],
        "tier_rank int, a_id long, b_id long",
    )
    out = {
        r["tier_rank"]: (r["total_pairs"], r["marginal_pairs"], r["new_ids"])
        for r in dedup_tier_waterfall(edges).collect()
    }
    assert out == {0: (2, 2, 4), 1: (2, 1, 2), 2: (3, 1, 2), 3: (1, 0, 0)}
    # marginals partition the distinct pair set
    assert sum(m for _, m, _ in out.values()) == 4


def test_decon_tier_waterfall_pattern(spark):
    """The documented decon-ladder reuse of dedup_tier_waterfall: per-tier
    flag rows fed as self-edges give flagged-doc totals and cheapest-tier
    marginal attribution — tier 0 (exact) shadows everything it flags,
    tiers only get credit for docs no cheaper tier caught."""
    from fuzzymatch_spark.operators.dedup import dedup_tier_waterfall

    # (tier, doc): exact flags {1,2}; fuzzy flags {2,3}; embedding {3,4,5}
    rows = [(0, 1), (0, 2), (1, 2), (1, 3), (2, 3), (2, 4), (2, 5)]
    flags = spark.createDataFrame(rows, "tier_rank int, doc_id long")
    wf = {r["tier_rank"]: r for r in dedup_tier_waterfall(
        flags.select("tier_rank",
                     F.col("doc_id").alias("a_id"),
                     F.col("doc_id").alias("b_id"))).collect()}
    assert wf[0]["total_pairs"] == 2 and wf[0]["marginal_pairs"] == 2
    assert wf[1]["total_pairs"] == 2 and wf[1]["marginal_pairs"] == 1  # doc 3
    assert wf[2]["total_pairs"] == 3 and wf[2]["marginal_pairs"] == 2  # 4, 5
    for r in wf.values():
        assert r["new_ids"] == r["marginal_pairs"]  # self-edges: identical
