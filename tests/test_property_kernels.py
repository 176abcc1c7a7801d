"""Hypothesis property tests for the pure-Python kernels (no Spark
session — these run in milliseconds and sweep input spaces the golden
tests can't enumerate).  Settings are conservative (50 examples, no
deadline) so CI wall time stays flat."""

import numpy as np
from hypothesis import given, settings, strategies as st

from fuzzymatch_spark.kernels.editdist import prefix_edit_distance
from fuzzymatch_spark.kernels.normalize import (
    char_bitmask,
    normalize_bytes,
    normalize_text,
)
from fuzzymatch_spark.sources.png import png_decode, png_encode

_ascii = st.text(
    alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=24
)


@settings(max_examples=50, deadline=None)
@given(_ascii.filter(bool), _ascii)
def test_prefix_distance_zero_when_query_is_prefix(q, suffix):
    # the query is literally a prefix of the candidate -> distance 0
    assert prefix_edit_distance(q.encode(), (q + suffix).encode(), 2) == 0


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abcdefgh", min_size=2, max_size=16),
       st.integers(min_value=0, max_value=15),
       st.sampled_from("xyz"))
def test_prefix_distance_single_substitution_le_one(s, i, ch):
    i = i % len(s)
    mutated = s[:i] + ch + s[i + 1:]
    d = prefix_edit_distance(s.encode(), mutated.encode(), 2)
    assert d is not None and d <= 1


@settings(max_examples=50, deadline=None)
@given(st.text(alphabet="abcdef", min_size=1, max_size=12),
       st.text(alphabet="abcdef", min_size=0, max_size=12),
       st.integers(min_value=1, max_value=3))
def test_prefix_distance_stable_under_wider_band(q, c, k):
    # an in-budget verdict never changes when the band widens
    d = prefix_edit_distance(q.encode(), c.encode(), k)
    if d is not None and d <= k:
        assert prefix_edit_distance(q.encode(), c.encode(), k + 1) == d


@settings(max_examples=30, deadline=None)
@given(st.integers(min_value=1, max_value=13),
       st.integers(min_value=1, max_value=11),
       st.booleans(), st.integers(min_value=0, max_value=2**32 - 1))
def test_png_roundtrip_exact(h, w, rgb, seed):
    rng = np.random.default_rng(seed)
    shape = (h, w, 3) if rgb else (h, w)
    img = rng.integers(0, 256, size=shape, dtype=np.uint8)
    out = png_decode(png_encode(img))
    assert out.shape == img.shape and (out == img).all()


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=40))
def test_normalize_text_idempotent(s):
    once = normalize_text(s)
    assert normalize_text(once) == once


@settings(max_examples=50, deadline=None)
@given(st.binary(max_size=40))
def test_normalize_bytes_idempotent(b):
    once = normalize_bytes(b)
    assert normalize_bytes(once) == once


@settings(max_examples=50, deadline=None)
@given(st.text(max_size=24), st.text(max_size=24))
def test_char_bitmask_is_a_union_homomorphism(a, b):
    # holds for well-formed (valid-UTF-8) inputs: concatenation never
    # splits a character, so the multibyte pairing is unchanged.  (For
    # MALFORMED bytes — a dangling multibyte lead at a boundary — the
    # pairing can differ across a concat; the kernel consumes normalized
    # text, which is always well-formed.)
    na = normalize_bytes(a.encode("utf-8"))
    nb = normalize_bytes(b.encode("utf-8"))
    assert char_bitmask(na + nb) == char_bitmask(na) | char_bitmask(nb)


@settings(max_examples=40, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=8, max_value=57),
    st.integers(min_value=8, max_value=57),
    st.integers(min_value=0, max_value=7),
)
def test_canonical_phash_d4_invariant(seed, h, w, which):
    """phash64_canonical(t(px)) == phash64_canonical(px) for every D4
    transform t, on arbitrary (including non-square, non-multiple-of-32)
    shapes — the exact-group property the mirror-dedup join relies on."""
    import numpy as np

    from fuzzymatch_spark.kernels.phash import (
        dihedral_transforms,
        phash64_canonical,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    t = np.ascontiguousarray(dihedral_transforms(px)[which])
    assert phash64_canonical(t) == phash64_canonical(px)


@settings(max_examples=60, deadline=None)
@given(
    st.integers(min_value=0, max_value=2**32 - 1),
    st.integers(min_value=8, max_value=140),
    st.integers(min_value=8, max_value=140),
)
def test_canonical_phash_fast_path_equals_per_transform(seed, h, w):
    """The one-integral-image fast path is bit-identical to hashing each
    materialized D4 transform (exact-integer box sums make this an
    equality, not an approximation)."""
    import numpy as np

    from fuzzymatch_spark.kernels.phash import (
        dihedral_transforms,
        phash64,
        phash64_canonical,
    )

    rng = np.random.default_rng(seed)
    px = rng.integers(0, 256, size=(h, w), dtype=np.uint8)
    ref = min(
        phash64(np.ascontiguousarray(t)) & 0xFFFFFFFFFFFFFFFF
        for t in dihedral_transforms(px)
    )
    ref = ref - (1 << 64) if ref >= (1 << 63) else ref
    assert phash64_canonical(px) == ref
