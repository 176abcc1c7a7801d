"""Arrow-batched pandas UDFs wrapping the numpy kernels.

Design mirrors the reference's fused single-pass preparation
(`Sources/FuzzyMatch/FuzzyMatcher+SmithWaterman.swift:68-81` — one scan emits
everything downstream needs): ``make_signature_udf`` emits every derived
column (normalized text, char bitmask, shingles, MinHash signature, SimHash)
in ONE pass over the corpus so the text is normalized exactly once per row.

All UDFs are scalar pandas UDFs (Arrow transfer, no per-row Python at the
Spark boundary); inner hot loops are numpy-vectorized where the DP structure
allows (see kernels/editdist.py batch kernel).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from fuzzymatch_spark.config import DedupConfig, MatchConfig
from fuzzymatch_spark.kernels.editdist import batch_substring_distance
from fuzzymatch_spark.kernels.normalize import char_bitmask, normalize_bytes
from fuzzymatch_spark.kernels.scoring import PreparedQuery, score_pair
from fuzzymatch_spark.kernels.trigrams import trigram_set

# MinHash universal-hash params: h_i(x) = (a_i * x + b_i) mod P with P the
# smallest prime > 2^32; shingle values are < 2^24 so a*x+b fits in int64.
_MINHASH_P = np.int64(4294967311)


def minhash_params(num_perm: int, seed: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.RandomState(seed)
    a = rng.randint(1, 1 << 31, size=num_perm).astype(np.int64)
    b = rng.randint(0, 1 << 31, size=num_perm).astype(np.int64)
    return a, b


def _token_hash64(token: bytes, seed: int) -> int:
    h = hashlib.blake2b(token, digest_size=8, salt=seed.to_bytes(8, "little"))
    return int.from_bytes(h.digest(), "little")


_BIT_IDX = np.arange(64, dtype=np.uint64)


class _SimHasher:
    """SimHash with a token->±1-bit-vector memo: token frequency is Zipfian,
    so hashing each distinct token once per executor amortizes the blake2b
    and bit-unpack cost across the whole partition."""

    def __init__(self, seed: int, max_cache: int = 1 << 18):
        self.seed = seed
        self.max_cache = max_cache
        self.cache: dict[bytes, np.ndarray] = {}

    def _vec(self, token: bytes) -> np.ndarray:
        v = self.cache.get(token)
        if v is None:
            h = _token_hash64(token, self.seed)
            bits = ((h >> _BIT_IDX) & np.uint64(1)).astype(bool)
            v = np.where(bits, np.int64(1), np.int64(-1))
            if len(self.cache) < self.max_cache:
                self.cache[token] = v
        return v

    def __call__(self, norm: bytes) -> int:
        tokens: dict[bytes, int] = {}
        for t in norm.split():
            tokens[t] = tokens.get(t, 0) + 1
        if not tokens:
            return 0
        v = np.zeros(64, dtype=np.int64)
        for t, cnt in tokens.items():
            v += self._vec(t) * cnt
        out = int(((v > 0).astype(np.uint64) << _BIT_IDX).sum())
        return out - (1 << 64) if out >= (1 << 63) else out


SIGNATURE_SCHEMA = StructType(
    [
        StructField("caption_norm", StringType()),
        StructField("char_mask", LongType()),
        StructField("n_shingles", IntegerType()),
        StructField("shingles", ArrayType(IntegerType())),
        StructField("minhash_sig", ArrayType(LongType())),
        StructField("simhash", LongType()),
    ]
)


def make_signature_udf(cfg: DedupConfig):
    """Fused normalize+signature pandas UDF: text -> SIGNATURE_SCHEMA struct."""
    a_params, b_params = minhash_params(cfg.num_perm, cfg.seed)
    simhasher = _SimHasher(cfg.seed)

    @F.pandas_udf(SIGNATURE_SCHEMA)
    def signature(texts: pd.Series) -> pd.DataFrame:
        n = len(texts)
        norms = [None] * n
        masks = np.zeros(n, dtype=np.int64)
        n_sh = np.zeros(n, dtype=np.int32)
        shingles_out: list = [None] * n
        sigs: list = [None] * n
        simhashes = np.zeros(n, dtype=np.int64)
        for k, text in enumerate(texts):
            raw = (text or "").encode("utf-8")
            norm = normalize_bytes(raw)
            norms[k] = norm.decode("utf-8", errors="replace")
            masks[k] = np.int64(np.uint64(char_bitmask(norm)))
            sh = trigram_set(norm).astype(np.int64)
            n_sh[k] = len(sh)
            shingles_out[k] = sh.astype(np.int32)
            if len(sh):
                # (num_perm, n_shingles) broadcast; min along shingles
                hv = (a_params[:, None] * sh[None, :] + b_params[:, None]) % _MINHASH_P
                sigs[k] = hv.min(axis=1)
            else:
                sigs[k] = np.full(cfg.num_perm, _MINHASH_P, dtype=np.int64)
            simhashes[k] = simhasher(norm)
        return pd.DataFrame(
            {
                "caption_norm": norms,
                "char_mask": masks,
                "n_shingles": n_sh,
                "shingles": shingles_out,
                "minhash_sig": sigs,
                "simhash": simhashes,
            }
        )

    return signature


SCORE_SCHEMA = StructType(
    [
        StructField("score", DoubleType()),
        StructField("kind", StringType()),
    ]
)


# Batch prefilter + vectorized phase pipeline live in kernels/batch_scoring
# (kept importable from here for callers that used the private name).
from fuzzymatch_spark.kernels.batch_scoring import (  # noqa: E402
    BatchCandidates,
    batch_prefilter as _batch_prefilter,
    batch_score_pairs,
)


def make_score_udf(query: PreparedQuery):
    """Reference-parity scorer: candidate text -> (score, kind) or nulls.

    Cheap prefilters run twice by design: once as JVM column predicates
    (when a signature column exists) and once vectorized over the Arrow
    batch here — so the batch phase pipeline only ever sees plausible
    candidates, mirroring the reference's cascade economics.  The whole
    cascade (filters, exact, both DL DPs, subsequence reachability) is
    numpy-vectorized across the Arrow batch (kernels/batch_scoring.py);
    per-row Python runs only for the final arithmetic of actual matches.
    """

    @F.pandas_udf(SCORE_SCHEMA)
    def score(texts: pd.Series) -> pd.DataFrame:
        raws = [(t or "").encode("utf-8") for t in texts]
        scores, kinds = batch_score_pairs(BatchCandidates(raws), query)
        return pd.DataFrame({"score": scores, "kind": kinds})

    return score


DL_SCHEMA = StructType(
    [
        StructField("dl_dist", IntegerType()),
        StructField("dl_sim", DoubleType()),
    ]
)


def make_dl_udf(threshold: float):
    """Banded free-start DL similarity for pre-filtered pairs (tier-2 verify).

    ``dl_sim = 1 - d / len(shorter)`` per the reference's normalizedScore
    shape (`Sources/FuzzyMatch/EditDistance.swift:304-313`, weight 1.0);
    the batch DP is chunked and length-sorted to bound padding waste.
    """

    @F.pandas_udf(DL_SCHEMA)
    def dl_verify(a_norm: pd.Series, b_norm: pd.Series) -> pd.DataFrame:
        n = len(a_norm)
        qs: list[bytes] = [b""] * n
        cs: list[bytes] = [b""] * n
        qlens = np.ones(n, dtype=np.int64)
        for k in range(n):
            ab = (a_norm.iloc[k] or "").encode("utf-8")
            bb = (b_norm.iloc[k] or "").encode("utf-8")
            if len(ab) <= len(bb):
                qs[k], cs[k] = ab, bb
            else:
                qs[k], cs[k] = bb, ab
            qlens[k] = max(len(qs[k]), 1)
        max_eds = ((1.0 - threshold) * qlens).astype(np.int64)
        dists = np.full(n, -1, dtype=np.int32)
        dl_sim = np.zeros(n)
        order = np.argsort([len(c) for c in cs], kind="stable")
        chunk = 1024
        for s in range(0, n, chunk):
            sel = order[s : s + chunk]
            med = int(max_eds[sel].max()) if sel.size else 0
            d = batch_substring_distance(
                [qs[i] for i in sel], [cs[i] for i in sel], med
            )
            dists[sel] = d
            ok = d <= max_eds[sel]
            sim = np.maximum(0.0, 1.0 - d / qlens[sel])
            dl_sim[sel] = np.where(ok, sim, 0.0)
        return pd.DataFrame({"dl_dist": dists, "dl_sim": dl_sim})

    return dl_verify
