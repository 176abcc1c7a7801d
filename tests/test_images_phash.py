"""Image plumbing tests: codec round-trip invariants (input_hint: lossless
exact, lossy PSNR >= 40 dB, caption equality), pHash stability under lossy
re-encode, and the distributed pHash Hamming-band dedup stage."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from fuzzymatch_spark.config import DedupConfig
from fuzzymatch_spark.kernels.phash import hamming64, phash64
from fuzzymatch_spark.operators.dedup import phash_band_edges
from fuzzymatch_spark.sources.images import (
    build_images_df,
    decode_image,
    decode_stats,
    encode_image,
    make_phash_udf,
    psnr,
    synth_pixels,
)


class TestCodec:
    def test_png_lossless(self):
        px = synth_pixels("img_000001")
        assert np.array_equal(decode_image(encode_image(px, "png")), px)

    def test_jpeg_psnr_over_40db_at_corpus_quality(self):
        # the input_hint invariant (PSNR >= 40 dB for lossy rows) at the
        # quality every primary corpus row encodes with
        px = synth_pixels("img_000002")
        out = decode_image(encode_image(px, "jpeg", quality=95))
        assert psnr(px, out) >= 40.0

    def test_jpeg_psnr_at_twin_quality(self):
        # real JPEG rate-distortion on the noisy synth content: q85 lands
        # in the mid-30s (the pre-r6 stand-in codec's uniform quantizer
        # reached ~47 dB because it wasn't doing real frequency-domain
        # coding).  The twin rows' >= 40 dB acceptance bound is on the
        # q95 RE-ENCODE cycle (decode_stats), which stays >= 40 because
        # requantizing already-quantized coefficients is near-idempotent
        # — both bounds pinned here.
        px = synth_pixels("img_000002")
        d85 = decode_image(encode_image(px, "jpeg", quality=85))
        assert 30.0 <= psnr(px, d85) < 40.0
        cycle = decode_image(encode_image(d85, "jpeg", quality=95))
        assert psnr(d85, cycle) >= 40.0

    def test_deterministic(self):
        assert np.array_equal(synth_pixels("a"), synth_pixels("a"))
        assert not np.array_equal(synth_pixels("a"), synth_pixels("b"))


class TestPhash:
    def test_stable_under_lossy_reencode(self):
        for i in range(20):
            px = synth_pixels(f"img_{i:06d}")
            h1 = phash64(decode_image(encode_image(px, "png")))
            h2 = phash64(decode_image(encode_image(px, "jpeg", quality=85)))
            assert hamming64(h1, h2) <= 6, i

    def test_dhash_stable_under_lossy_reencode(self):
        # measured margin: twin dhash max 4 over 319,671 planted twins at
        # 1.6M images (histogram in BENCH.md) — inside the tier-2
        # threshold (8) with 2x headroom; independence from phash is
        # what makes the second digest kill random collisions
        from fuzzymatch_spark.kernels.phash import dhash64

        for i in range(20):
            px = synth_pixels(f"img_{i:06d}")
            d1 = dhash64(decode_image(encode_image(px, "png")))
            d2 = dhash64(decode_image(encode_image(px, "jpeg", quality=85)))
            assert hamming64(d1, d2) <= 4, i

    def test_distinct_images_far_apart(self):
        hashes = [phash64(synth_pixels(f"img_{i:06d}")) for i in range(30)]
        close = sum(
            1
            for i in range(len(hashes))
            for j in range(i + 1, len(hashes))
            if hamming64(hashes[i], hashes[j]) <= 6
        )
        assert close == 0


class TestSparkImages:
    @pytest.fixture(scope="class")
    def images(self, spark, documents):
        return build_images_df(
            spark, documents.limit(120), id_col="doc_id", caption_col="text"
        ).cache()

    def test_schema_and_rows(self, images):
        assert set(images.columns) == {
            "image_id", "bytes", "w", "h", "fmt", "caption", "phash"
        }
        assert images.count() >= 120

    def test_phash_udf_matches_stored(self, images):
        recomputed = images.withColumn("ph2", make_phash_udf()(F.col("bytes")))
        assert recomputed.filter(F.col("ph2") != F.col("phash")).count() == 0

    def test_decode_stats_psnr(self, images):
        stats = decode_stats(images)
        assert stats.filter(F.col("psnr_db") < 40.0).count() == 0

    def test_phash_band_join_finds_planted_twins(self, images):
        cfg = DedupConfig()
        edges = phash_band_edges(images, cfg).collect()
        got = {tuple(sorted((r["a_id"], r["b_id"]))) for r in edges}
        planted = {
            tuple(sorted((r["image_id"].rsplit("_dup", 1)[0], r["image_id"])))
            for r in images.filter(F.col("image_id").endswith("_dup")).collect()
        }
        assert planted, "fixture should plant twins"
        recall = len(planted & got) / len(planted)
        assert recall >= 0.99, f"phash recall {recall}"


class TestTier2Verify:
    """Independent-digest tier-2 verify: the diffuse-background density
    control (`phash_band_edges(verify_col=...)`)."""

    def test_background_collision_killed_twin_kept(self, spark):
        rows = [
            # planted twin: close in BOTH digests
            ("t1", 0x00, 0x10), ("t1_dup", 0x01, 0x11),
            # background collision: phash within 6, dhash ~32 bits apart
            ("b1", 0x00, 0x0000FFFF0000FFFF),
            ("b2", 0x03, 0x00FF00FF00FF00FF),
        ]
        df = spark.createDataFrame(
            rows, "image_id string, phash long, dhash long"
        )
        base = {
            tuple(sorted((r["a_id"], r["b_id"])))
            for r in phash_band_edges(df, DedupConfig()).collect()
        }
        tier2 = {
            tuple(sorted((r["a_id"], r["b_id"])))
            for r in phash_band_edges(
                df, DedupConfig(), verify_col="dhash"
            ).collect()
        }
        assert ("b1", "b2") in base  # tier-1 admits the collision
        assert ("b1", "b2") not in tier2  # tier-2 kills it
        assert ("t1", "t1_dup") in tier2  # twin survives
        assert tier2 <= base

    def test_synth_corpus_full_twin_recall_under_tier2(self, spark, documents):
        from fuzzymatch_spark.sources.images import build_phash_df

        narrow = build_phash_df(
            spark, documents.limit(300), "doc_id", "text", with_dhash=True
        ).cache()
        edges = phash_band_edges(
            narrow, DedupConfig(), verify_col="dhash"
        ).collect()
        got = {tuple(sorted((r["a_id"], r["b_id"]))) for r in edges}
        planted = {
            tuple(sorted((r["image_id"].rsplit("_dup", 1)[0], r["image_id"])))
            for r in narrow.filter(
                F.col("image_id").endswith("_dup")
            ).collect()
        }
        assert planted
        recall = len(planted & got) / len(planted)
        assert recall >= 0.99, f"tier-2 twin recall {recall}"
        narrow.unpersist()


class TestDegreeCap:
    """Density-adaptive pHash control (`degree_cap_edges`): edge volume
    must go linear in corpus size while planted twins survive."""

    def test_capped_is_subset_with_full_twin_recall(self, spark, documents):
        docs = documents.limit(200)
        images = build_images_df(spark, docs, "doc_id", "text").cache()
        base = phash_band_edges(images, DedupConfig())
        capped = phash_band_edges(
            images, DedupConfig(phash_degree_cap=4)
        )
        base_set = {(r["a_id"], r["b_id"]) for r in base.collect()}
        cap_set = {(r["a_id"], r["b_id"]) for r in capped.collect()}
        assert cap_set <= base_set
        planted = {
            tuple(sorted((r["image_id"].rsplit("_dup", 1)[0], r["image_id"])))
            for r in images.filter(
                F.col("image_id").endswith("_dup")
            ).collect()
        }
        assert planted
        got = {tuple(sorted(p)) for p in cap_set}
        recall = len(planted & got) / len(planted)
        assert recall >= 0.99, f"capped twin recall {recall}"
        images.unpersist()

    def test_dense_clique_goes_linear_but_stays_connected(self, spark):
        # 120 identical hashes: radius semantics give C(120,2)=7140 edges;
        # the cap must bound volume near cap*N while keeping ONE component
        n, cap = 120, 4
        rows = [(f"img_{i:04d}", 0x0123456789ABCDEF) for i in range(n)]
        df = spark.createDataFrame(rows, "image_id string, phash long")
        base = phash_band_edges(df, DedupConfig())
        assert base.count() == n * (n - 1) // 2
        capped = phash_band_edges(
            df, DedupConfig(phash_degree_cap=cap)
        ).collect()
        assert len(capped) <= n * cap  # linear bound (union-of-kNN)
        parent = {f"img_{i:04d}": f"img_{i:04d}" for i in range(n)}

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for r in capped:
            parent[find(r["a_id"])] = find(r["b_id"])
        assert len({find(k) for k in parent}) == 1  # still one component

    def test_default_none_is_pure_radius_semantics(self, spark):
        # the oracle default must remain byte-identical radius output
        rows = [
            ("a", 0x00), ("b", 0x01), ("c", 0x03), ("d", 0x07),
        ]
        df = spark.createDataFrame(rows, "image_id string, phash long")
        got = {
            (r["a_id"], r["b_id"])
            for r in phash_band_edges(df, DedupConfig()).collect()
        }
        want = {  # all pairs within Hamming 6 of each other: the full set
            ("a", "b"), ("a", "c"), ("a", "d"),
            ("b", "c"), ("b", "d"), ("c", "d"),
        }
        assert got == want

    def test_cap_validation(self, spark):
        import pytest as _pytest

        from fuzzymatch_spark.operators.dedup import degree_cap_edges

        df = spark.createDataFrame(
            [("a", "b", 1)], "a_id string, b_id string, dist int"
        )
        with _pytest.raises(ValueError, match="cap"):
            degree_cap_edges(df, 0)


def test_build_phash_df_matches_full_table(spark, documents):
    """The signature-only builder (payloads never cross Arrow) must agree
    bit-for-bit with the full images table's pHash column."""
    from fuzzymatch_spark.sources.images import build_images_df, build_phash_df

    docs = documents.limit(300)
    full = {
        r["image_id"]: r["phash"]
        for r in build_images_df(spark, docs, "doc_id", "text")
        .select("image_id", "phash")
        .collect()
    }
    sig = {
        r["image_id"]: r["phash"]
        for r in build_phash_df(spark, docs, "doc_id", "text").collect()
    }
    assert sig == full
    assert len(sig) > 300  # twins present


def test_real_decoder_branch_via_mocked_pil(monkeypatch):
    """The production swap-in path: bytes the stand-in codec does not
    recognize go to Pillow when present.  Pillow is absent in this sandbox,
    so a minimal mock stands in — the test pins the branch wiring (open ->
    grayscale convert -> uint8 ndarray -> pHash-able), which is everything
    the engine owns; the codec itself is Pillow's."""
    import sys
    import types

    import numpy as np

    from fuzzymatch_spark.kernels.phash import phash64
    from fuzzymatch_spark.sources import images

    want = np.arange(48 * 48, dtype=np.uint8).reshape(48, 48)

    class _FakeImg:
        def convert(self, mode):
            assert mode == "L"
            return want

    fake_image_mod = types.SimpleNamespace(
        open=lambda buf: _FakeImg()
    )
    fake_pil = types.ModuleType("PIL")
    fake_pil.Image = fake_image_mod
    monkeypatch.setitem(sys.modules, "PIL", fake_pil)
    monkeypatch.setitem(
        sys.modules, "PIL.Image",
        types.SimpleNamespace(open=fake_image_mod.open),
    )
    monkeypatch.setattr(images, "HAVE_PIL", True)

    # real-world lossy magic (JPEG SOI), unknown to the native codecs
    out = images.decode_image(b"\xff\xd8\xff\xe0...payload...")
    assert out.dtype == np.uint8 and out.shape == (48, 48)
    assert np.array_equal(out, want)
    assert isinstance(phash64(out), int)

    # and with PIL absent, unknown lossy containers still fail loudly
    # (PNG no longer hits this path — it decodes natively)
    monkeypatch.setattr(images, "HAVE_PIL", False)
    import pytest as _pytest

    with _pytest.raises(NotImplementedError):
        images.decode_image(b"\xff\xd8\xff\xe0xxxx")


def test_real_codec_roundtrip_when_pil_available():
    """Opportunistic swap-in validation: skipped where Pillow is absent
    (this sandbox), green in any production environment with it — real
    PNG bytes decode through the Pillow branch, roundtrip losslessly, and
    a real lossy JPEG twin lands within pHash Hamming distance 6."""
    import io

    import numpy as np
    import pytest

    PIL_Image = pytest.importorskip("PIL.Image")

    from fuzzymatch_spark.kernels.phash import phash64
    from fuzzymatch_spark.sources.images import decode_image, psnr, synth_pixels

    px = synth_pixels("real-codec-test", 48, 48)

    buf = io.BytesIO()
    PIL_Image.fromarray(px, mode="L").save(buf, format="PNG")
    decoded = decode_image(buf.getvalue())        # Pillow branch: real PNG
    assert decoded.shape == px.shape
    assert np.array_equal(decoded, px)            # PNG is lossless
    assert psnr(px, decoded) == float("inf")

    jbuf = io.BytesIO()
    PIL_Image.fromarray(px, mode="L").save(jbuf, format="JPEG", quality=90)
    jdecoded = decode_image(jbuf.getvalue())      # Pillow branch: real JPEG
    assert psnr(px, jdecoded) >= 40.0             # input_hint invariant
    ham = bin(phash64(px) ^ phash64(jdecoded)).count("1")
    assert ham <= 6                               # twin within dedup radius


class TestTileDedup:
    """Partial-edit-resistant tile-hash containment (the image-axis
    complement to the whole-image pHash join)."""

    def test_tile_udf_matches_numpy(self, spark):
        from fuzzymatch_spark.sources.images import (
            make_tile_phash_udf,
            synth_pixels,
        )

        ids = [f"img_{i}" for i in range(6)]
        rows = [(i, encode_image(synth_pixels(i), "png")) for i in ids]
        df = spark.createDataFrame(rows, "image_id string, bytes binary")
        got = {r["image_id"]: list(r["ths"]) for r in df.select(
            "image_id", make_tile_phash_udf(3)("bytes").alias("ths")
        ).collect()}
        for i in ids:
            px = synth_pixels(i)
            want = []
            for r in range(3):
                for c in range(3):
                    want.append(phash64(
                        px[r * 48 // 3:(r + 1) * 48 // 3,
                           c * 48 // 3:(c + 1) * 48 // 3]))
            assert got[i] == want, i

    def test_banner_overlay_caught_by_tiles_missed_by_global(self, spark):
        """A caption-banner overlay (bottom third rewritten) pushes the
        GLOBAL pHash far past the radius-6 join, but leaves 6 of 9 tiles
        bit-identical — tile containment at min_frac 0.6 recovers every
        planted pair, and the shared flat banner does NOT link unrelated
        images (its cross-matches stay at 3/9 < 0.6)."""
        import numpy as np

        from fuzzymatch_spark.kernels.phash import hamming64
        from fuzzymatch_spark.operators.multimodal import (
            image_tile_dup_pairs,
        )
        from fuzzymatch_spark.sources.images import synth_pixels

        n = 24
        rows, globals_ = [], {}
        banner = np.zeros((16, 48), dtype=np.uint8)
        banner[:, :] = 235
        banner[6:10, 4:44] = 20  # a fake caption stripe
        for i in range(n):
            px = synth_pixels(f"base_{i}")
            rows.append((f"orig_{i:03d}", encode_image(px, "png")))
            twin = px.copy()
            twin[32:48, :] = banner
            rows.append((f"twin_{i:03d}", encode_image(twin, "png")))
            globals_[i] = hamming64(phash64(px), phash64(twin))
        df = spark.createDataFrame(rows, "image_id string, bytes binary")

        # the edit defeats the whole-image hash for most pairs (this is
        # the regime the operator exists for)
        assert sum(1 for d in globals_.values() if d > 6) >= n * 0.7, globals_

        got = {(r["a_id"], r["b_id"]): r["matched_frac"] for r in
               image_tile_dup_pairs(
                   df, grid=3, max_hamming=2, min_frac=0.6
               ).collect()}
        planted = {(f"orig_{i:03d}", f"twin_{i:03d}") for i in range(n)}
        assert planted <= set(got), sorted(planted - set(got))
        for p in planted:
            assert got[p] >= 0.6
        # no unrelated links: the shared banner alone is 3/9 tiles
        extra = set(got) - planted
        assert not extra, extra


    def test_flat_tile_mega_buckets_are_dropped_not_evidence(self, spark):
        """Boilerplate positions (one hash shared corpus-wide) exceed the
        bucket cap and contribute NO matches: a pair agreeing on 5 flat
        tiles + 2 distinctive tiles is below min_frac (2/9), while a pair
        with 6 distinctive agreements still links — the cap turns the
        containment criterion into 'min_frac of DISCRIMINATIVE
        positions', by design."""
        from fuzzymatch_spark.operators.multimodal import tile_dup_pairs

        rows = []
        for i in range(120):
            for t in range(9):
                if t < 5:
                    th = 42  # corpus-wide flat tile (bucket size 120)
                elif i < 2 and t < 7:
                    th = 1000 + t  # planted pair A: 2 distinctive shares
                elif i in (2, 3) and t != 8:
                    th = 2000 + t  # planted pair B: 6/9 distinctive
                else:
                    th = i * 100 + t  # unique background
                rows.append((f"i{i:03d}", t, th))
        df = spark.createDataFrame(
            rows, "image_id string, tile_idx int, tile_phash long"
        )
        got = {(r["a_id"], r["b_id"]) for r in tile_dup_pairs(
            df, n_tiles=9, max_bucket_size=100
        ).collect()}
        # A agrees on 5 flat (capped) + 2 distinctive = 2/9 counted -> out
        # B agrees on 4 distinctive (t=5,6,7) ... plus flats capped
        assert ("i000", "i001") not in got
        # control: same table with the cap lifted counts the flat tiles
        got2 = {(r["a_id"], r["b_id"]) for r in tile_dup_pairs(
            df, n_tiles=9, max_bucket_size=100_000
        ).collect()}
        assert ("i000", "i001") in got2  # 7/9 with flats counted


    def test_tile_dup_pairs_matches_brute_force_random_tables(self, spark):
        """Randomized cross-check over configs: the banded containment
        join equals an independent numpy brute force (same-position
        Hamming <= k, >= min_frac of n positions) — recall completeness
        (pigeonhole) AND precision (bit_count verify) across (n_bands,
        radius, min_frac)."""
        import itertools

        import numpy as np

        from fuzzymatch_spark.operators.multimodal import tile_dup_pairs

        rng = np.random.default_rng(20260818)
        for n_bands, k, mf in [(4, 2, 0.6), (8, 2, 0.5), (4, 1, 0.4)]:
            n_img, n_t = 40, 6
            # clustered hash pool so near-collisions actually occur
            pool = rng.integers(0, 1 << 20, size=12, dtype=np.int64)
            hashes = pool[rng.integers(0, 12, size=(n_img, n_t))]
            hashes ^= rng.integers(0, 4, size=hashes.shape).astype(np.int64)
            rows = [
                (f"r{i:02d}", t, int(hashes[i, t]))
                for i in range(n_img) for t in range(n_t)
            ]
            df = spark.createDataFrame(
                rows, "image_id string, tile_idx int, tile_phash long"
            )
            got = {
                (r["a_id"], r["b_id"]): r["matched_frac"]
                for r in tile_dup_pairs(
                    df, n_tiles=n_t, max_hamming=k, min_frac=mf,
                    n_bands=n_bands,
                ).collect()
            }
            want = {}
            for i, j in itertools.combinations(range(n_img), 2):
                m = sum(
                    bin(int(hashes[i, t]) ^ int(hashes[j, t])).count("1")
                    <= k
                    for t in range(n_t)
                )
                frac = round(m / n_t, 6)
                if frac >= mf:
                    want[(f"r{i:02d}", f"r{j:02d}")] = frac
            assert got == want, (n_bands, k, mf,
                                 set(got) ^ set(want))

    def test_tile_dup_pairs_validates_n_tiles(self, spark):
        import pytest as _pytest

        from fuzzymatch_spark.operators.multimodal import tile_dup_pairs

        df = spark.createDataFrame(
            [("a", 0, 1)], "image_id string, tile_idx int, tile_phash long"
        )
        with _pytest.raises(ValueError):
            tile_dup_pairs(df, n_tiles=0)


class TestMirrorDedup:
    """Dihedral-canonical pHash: flip/rotation-resistant dedup."""

    def test_canonical_exactly_invariant_under_d4(self):
        from fuzzymatch_spark.kernels.phash import (
            dihedral_transforms,
            phash64_canonical,
        )

        # non-square on purpose: side not a multiple of 32, so the
        # full-res-transform-then-resize order is load-bearing
        for iid, (w, h) in [("m_0", (48, 48)), ("m_1", (50, 34))]:
            px = synth_pixels(iid, w=w, h=h)
            want = phash64_canonical(px)
            for t in dihedral_transforms(px):
                assert phash64_canonical(np.ascontiguousarray(t)) == want

    def test_mirror_twins_recovered_missed_by_plain_phash(self, spark):
        """fliplr defeats the plain pHash for most pairs (odd-column DCT
        signs negate) but the canonical hash restores Hamming 0, so the
        unchanged banded join recovers every planted mirror/rotation
        twin with zero false links."""
        from fuzzymatch_spark.operators.multimodal import mirror_dup_pairs

        n = 20
        rows, plain = [], {}
        for i in range(n):
            px = synth_pixels(f"mb_{i}")
            rows.append((f"orig_{i:03d}", encode_image(px, "png")))
            tw = np.fliplr(px) if i % 2 == 0 else np.rot90(px, 1)
            rows.append(
                (f"twin_{i:03d}", encode_image(np.ascontiguousarray(tw), "png"))
            )
            plain[i] = hamming64(phash64(px), phash64(tw))
        df = spark.createDataFrame(rows, "image_id string, bytes binary")

        # the regime the operator exists for: the plain hash loses most
        # mirrored/rotated twins at the radius-6 join
        assert sum(1 for d in plain.values() if d > 6) >= n * 0.7, plain

        got = {(r["a_id"], r["b_id"]) for r in
               mirror_dup_pairs(df, DedupConfig()).collect()}
        planted = {(f"orig_{i:03d}", f"twin_{i:03d}") for i in range(n)}
        assert planted <= got, sorted(planted - got)
        assert got == planted, sorted(got - planted)


class TestFusedDigests:
    """One-decode fused digest UDF == the four individual digest paths."""

    def test_fused_equals_individual_digests(self, spark):
        from fuzzymatch_spark.kernels.phash import (
            dhash64,
            phash64_canonical,
        )
        from fuzzymatch_spark.sources.images import (
            make_image_digests_udf,
            synth_pixels,
        )

        rows, want = [], {}
        for i in range(8):
            iid = f"fd_{i}"
            px = synth_pixels(iid)
            fmt = "jpeg" if i % 2 else "png"
            data = encode_image(px, fmt, quality=95)
            rows.append((iid, data))
            dec = decode_image(data)  # digests are over DECODED pixels
            tiles = []
            for r in range(3):
                for c in range(3):
                    tiles.append(phash64(
                        dec[r * 16:(r + 1) * 16, c * 16:(c + 1) * 16]))
            want[iid] = (phash64(dec), dhash64(dec),
                         phash64_canonical(dec), tiles)
        rows.append(("fd_null", None))
        df = spark.createDataFrame(rows, "image_id string, bytes binary")
        got = {r["image_id"]: r["d"] for r in df.select(
            "image_id", make_image_digests_udf(3)("bytes").alias("d")
        ).collect()}
        for iid, (p, d, cp, tl) in want.items():
            g = got[iid]
            assert (g["phash"], g["dhash"], g["cphash"]) == (p, d, cp), iid
            assert list(g["tiles"]) == tl, iid
        gn = got["fd_null"]
        assert gn["phash"] is None and gn["tiles"] is None
