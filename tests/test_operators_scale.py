"""Tests for the scale-path operators: dedup (MinHash/SimHash), similarity
search (brute-force + LSH), multimodal plumbing, streaming pipeline."""

from __future__ import annotations

from pyspark.sql import functions as F


def _near_dup_docs(spark):
    """12 docs: 0/1 near-dups, 2/3 near-dups, rest distinct word-soup."""
    base = (
        "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
        "kilo lima mike november oscar papa quebec romeo sierra tango"
    )
    rows = [
        (0, base),
        # one token APPENDED: shingle jaccard 18/19 ≈ 0.95 — high enough
        # that 8x4 LSH banding finds the pair for any decent hash family
        # (a mid-token edit gives j≈0.71 with an ~8% inherent miss rate)
        (1, base + " tangent"),
        (2, "uniform victor whiskey xray yankee zulu one two three four five six"),
        (3, "uniform victor whiskey xray yankee zulu one two three four five seven"),
    ]
    for i in range(4, 12):
        rows.append((i, " ".join(f"w{i}t{j}" for j in range(20))))
    return spark.createDataFrame(rows, ["doc_id", "text"])


def test_minhash_matches_exact_jaccard(spark):
    from htep_spark.operators.dedup import minhash_dedup_pairs

    docs = _near_dup_docs(spark)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["est_jaccard"]
        for r in minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert (0, 1) in pairs
    assert (2, 3) in pairs
    # distinct docs share no shingles → never candidates
    assert all(a in (0, 2) for a, _ in pairs)
    # estimate is in the right neighborhood of the true jaccard (~0.95/0.82)
    assert 0.5 <= pairs[(0, 1)] <= 1.0


def test_simhash_near_dups(spark):
    from htep_spark.operators.dedup import simhash_near_dup_pairs, simhash_udf

    docs = _near_dup_docs(spark)
    sigs = {r["doc_id"]: r["s"] for r in docs.select("doc_id", simhash_udf("text").alias("s")).collect()}
    assert sigs[0] != 0 and isinstance(sigs[0], int)
    # determinism
    sigs2 = {r["doc_id"]: r["s"] for r in docs.select("doc_id", simhash_udf("text").alias("s")).collect()}
    assert sigs == sigs2
    pairs = {
        (r["doc_a"], r["doc_b"]): r["hamming"]
        for r in simhash_near_dup_pairs(docs, "doc_id", "text", max_hamming=8).collect()
    }
    assert (0, 1) in pairs
    assert pairs[(0, 1)] <= 8


def test_lsh_bucket_cap_bounds_degenerate_corpus(spark):
    """Skew guard: a corpus dominated by identical docs must not trigger the
    O(bucket²) band self-join. With the cap, candidate pairs stay O(n) (star
    to the bucket representative) and the keeper verdict is identical to
    exact dedup: one keeper, everything else dropped."""
    import time

    from htep_spark.operators.dedup import (
        connected_components,
        minhash_signatures,
        lsh_candidate_pairs,
        simhash_near_dup_pairs,
    )

    n = 5000
    text = "duplicate boilerplate page body " * 8
    docs = spark.range(n).select(
        F.col("id").alias("doc_id"), F.lit(text).alias("text")
    ).union(
        spark.createDataFrame(
            [(n, "a completely different unique document about spark")],
            ["doc_id", "text"],
        )
    )
    t0 = time.monotonic()
    sig = minhash_signatures(docs, "doc_id", "text")
    pairs = lsh_candidate_pairs(sig, max_bucket_size=100).filter(
        F.col("est_jaccard") >= 0.6
    )
    n_pairs = pairs.count()
    elapsed = time.monotonic() - t0
    # star pairs: one per non-representative duplicate, not n*(n-1)/2
    assert n_pairs == n - 1, n_pairs
    assert elapsed < 120, f"capped LSH took {elapsed:.1f}s"
    comps = connected_components(pairs)
    keepers = {
        r["doc_id"]
        for r in comps.filter(F.col("cluster_id") == F.col("doc_id")).collect()
    }
    assert keepers == {0}  # one keeper for the duplicate cluster
    # simhash path under the same degenerate corpus
    sh_pairs = simhash_near_dup_pairs(
        docs, "doc_id", "text", max_hamming=7, max_bucket_size=100
    )
    assert sh_pairs.count() == n - 1


def test_minhash_base_hash_modes_agree(spark):
    """Production (xxhash64) vs oracle (md5) base hash must yield identical
    candidate pairs and keeper verdicts on the driver corpus — the bridge
    that lets bench run the fast path while the driver hash-checks the md5
    mode (VERDICT r02 #5)."""
    from htep_spark.operators.dedup import (
        MINHASH_QUERY_THRESHOLD,
        dedup_keepers,
        minhash_dedup_pairs,
    )

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    by_mode = {}
    for mode in ("md5", "xxhash64"):
        by_mode[mode] = {
            (r["doc_a"], r["doc_b"])
            for r in minhash_dedup_pairs(
                docs, "doc_id", "text",
                threshold=MINHASH_QUERY_THRESHOLD, base_hash=mode,
            ).collect()
        }
    assert by_mode["md5"] == by_mode["xxhash64"]
    keepers = {}
    for mode in ("md5", "xxhash64"):
        keepers[mode] = {
            (r["doc_id"], r["cluster_id"], r["keep"])
            for r in dedup_keepers(
                docs, "doc_id", "text",
                threshold=MINHASH_QUERY_THRESHOLD, base_hash=mode,
            ).collect()
        }
    assert keepers["md5"] == keepers["xxhash64"]


def test_minhash_bucket_cap_modeled_in_oracle(spark):
    """The DuckDB CTE chain must reproduce the *capped* Spark plan: force a
    tiny cap over a degenerate corpus (one oversized identical-doc bucket)
    and assert pair-set equality between engines (ADVICE r02 #1)."""
    import duckdb
    import pandas as pd

    from htep_spark.operators.dedup import (
        MINHASH_QUERY_THRESHOLD,
        _minhash_pairs_ctes,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    rows = [(i, "identical boilerplate body repeated for every page here") for i in range(8)]
    rows += [
        (100, "the quick brown fox jumps over the lazy dog tonight"),
        (101, "the quick brown fox jumps over the lazy dog today"),
        (102, "completely unrelated text about spark physical planning"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    sig = minhash_signatures(docs, "doc_id", "text", base_hash="md5")
    spark_pairs = {
        (r["doc_a"], r["doc_b"], r["est_jaccard"])
        for r in lsh_candidate_pairs(sig, max_bucket_size=3)
        .filter(F.col("est_jaccard") >= MINHASH_QUERY_THRESHOLD)
        .collect()
    }
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    sql = f"WITH {_minhash_pairs_ctes(max_bucket_size=3)}\nSELECT doc_a, doc_b, est_jaccard FROM mpairs"
    duck_pairs = {
        (int(a), int(b), float(e)) for a, b, e in con.execute(sql).fetchall()
    }
    # oversized bucket (8 identical docs > cap 3) → star pairs only
    star = {(a, b) for a, b, _ in spark_pairs if a == 0}
    assert star == {(0, i) for i in range(1, 8)}
    assert all((i, j) not in {(a, b) for a, b, _ in spark_pairs}
               for i in range(1, 8) for j in range(i + 1, 8))
    assert spark_pairs == duck_pairs


def test_lsh_bucket_cap_noop_on_normal_corpus(spark):
    """Below the cap the candidate set is identical to the uncapped join."""
    from htep_spark.operators.dedup import minhash_dedup_pairs

    docs = _near_dup_docs(spark)
    capped = {
        (r["doc_a"], r["doc_b"])
        for r in minhash_dedup_pairs(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert capped == {(0, 1), (2, 3)}


def test_ann_signature_backends_agree(spark):
    """The expr (JVM fold, DuckDB-oracled) and numpy (BLAS matmul) LSH
    signature backends must produce identical top-k — both quantize the
    hyperplane sign at 6dp, so summation order cannot flip a bit."""
    from htep_spark.operators.similarity import ann_lsh_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = {}
    for mode in ("expr", "numpy"):
        out[mode] = {
            (r["query_id"], r["vec_id"], round(r["cosine"], 6), r["rank"])
            for r in ann_lsh_topk(emb, queries, k=5, signature_mode=mode).collect()
        }
    assert out["expr"] == out["numpy"]


def test_hyperplane_sign_margin():
    """Cross-engine safety of the quantized sign: every (vector, plane) dot
    product on the driver corpora must clear the round-to-6dp decision
    boundary (0.5e-6) by far more than any float summation-order error
    (~1e-12), so Spark/BLAS/DuckDB can never disagree on a bit."""
    import numpy as np
    import pyarrow.parquet as pq

    from htep_spark.operators.similarity import _DIM_DEFAULT, _planes

    planes = _planes(_DIM_DEFAULT)
    for sf in ("sf0.001", "sf0.01", "sf0.1"):
        tbl = pq.read_table(f"/root/testdata/{sf}/embeddings.parquet")
        mat = np.stack(
            [np.asarray(v, dtype=np.float64) for v in tbl["embedding"].to_pylist()]
        )
        dots = mat @ planes.T
        margin = np.abs(np.abs(dots) - 0.5e-6).min()
        assert margin > 1e-9, f"{sf}: sign margin {margin} too small"


def test_ann_lsh_agrees_with_bruteforce_on_top1(spark):
    from htep_spark.operators.similarity import ann_lsh_topk, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    exact = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in cosine_topk(emb, queries, k=3).collect()
    }
    approx = ann_lsh_topk(emb, queries, k=3)
    rows = approx.collect()
    assert rows, "LSH produced no candidates"
    # every LSH hit must carry the exact cosine score ordering per query
    for q in {r["query_id"] for r in rows}:
        ranked = sorted(
            (r for r in rows if r["query_id"] == q), key=lambda r: r["rank"]
        )
        scores = [r["cosine"] for r in ranked]
        assert scores == sorted(scores, reverse=True)
    assert len(exact) == 12  # 4 queries x 3


def test_multimodal_decode_plumbing(spark):
    """Real codecs: strict=True passes on the golden media table (PNG/BMP/
    PPM/WAV/RAWV), dimensions are the true encoded ones, not hash fakes."""
    from htep_spark.operators.multimodal import decode_media, make_media_table

    media = make_media_table(spark, n=12)
    out = decode_media(media, strict=True).collect()
    assert len(out) == 12
    assert all(r["error"] is None for r in out), [r["error"] for r in out]
    by_id = {r["media_id"]: r for r in out}
    img = by_id["m-0000"]
    assert img["kind"] == "image" and img["n_frames"] == 1
    # _synth_image default is 48x32 — real decode must report exactly that
    assert (img["width"], img["height"]) == (48, 32)
    assert img["format"] == "png" and len(img["feature"]) == 8
    assert abs(sum(img["feature"]) - 1.0) < 1e-5  # histogram fractions
    aud = by_id["m-0001"]
    assert aud["format"] == "wav" and aud["n_frames"] == 12000
    assert aud["duration_sec"] == 0.75  # 12000 frames @ 16 kHz
    vid = by_id["m-0002"]
    assert vid["format"] == "rawv" and vid["n_frames"] == 32
    assert (vid["width"], vid["height"]) == (32, 24)
    # image i=9 cycles to the baseline JPEG codec — true dims, real decode
    jpg = by_id["m-0009"]
    assert jpg["format"] == "jpeg" and (jpg["width"], jpg["height"]) == (48, 32)
    # deterministic across runs
    out2 = decode_media(media, strict=True).collect()
    assert sorted(map(str, out)) == sorted(map(str, out2))


def test_multimodal_pixel_roundtrip(spark):
    """Pixel-level: decode(payload) of every image format reproduces the
    exact synthetic source array."""
    import numpy as np

    from htep_spark.functions import codecs
    from htep_spark.operators.multimodal import _synth_image

    src = _synth_image(5)
    for fmt in ("png", "bmp", "ppm"):
        out = codecs.decode_image(codecs.encode_image(src, fmt))
        assert np.array_equal(out, src), fmt
    # JPEG is lossy: near-lossless at the flat default quant, deterministic
    jout = codecs.decode_image(codecs.encode_image(src, "jpeg"))
    assert jout.shape == src.shape
    assert np.abs(jout.astype(int) - src.astype(int)).max() <= 3
    assert codecs.encode_image(src, "jpeg") == codecs.encode_image(src, "jpeg")
    # PNG filters 1-4 decode: round-trip a real-world-filtered image by
    # re-encoding rows with each filter type manually is overkill here;
    # instead verify RGBA + grayscale channel counts survive
    rgba = np.dstack([src, np.full(src.shape[:2], 7, np.uint8)])
    assert codecs.decode_png(codecs.encode_png(rgba)).shape == rgba.shape
    gray = src[:, :, 0]
    assert codecs.decode_png(codecs.encode_png(gray)).shape == (32, 48, 1)


def test_gif_codec_roundtrip():
    """GIF87a/89a: exact-palette round-trip across shapes/palette sizes/
    interlace, dictionary growth past the 12-bit reset, multi-frame
    compositing with GCE transparency, and clean truncation errors."""
    import struct

    import numpy as np
    import pytest

    from htep_spark.functions import codecs as C

    def palimg(h, w, ncol, seed):
        r = np.random.default_rng(seed)
        pal = r.integers(0, 256, (ncol, 3), dtype=np.uint8)
        return pal[r.integers(0, ncol, (h, w))]

    for (h, w, ncol) in [(17, 23, 5), (8, 5, 2), (1, 1, 1), (40, 60, 256)]:
        img = palimg(h, w, ncol, h * 100 + w)
        for il in (False, True):
            b = C.encode_gif(img, interlace=il)
            assert C.sniff_format(b) == "gif"
            frames = C.decode_gif(b)
            assert len(frames) == 1 and np.array_equal(frames[0], img)
    # dictionary reset at 4096 entries exercised by a large repetitive image
    big = palimg(200, 300, 17, 5)
    assert np.array_equal(C.decode_gif(C.encode_gif(big))[0], big)
    assert C.encode_gif(big) == C.encode_gif(big)  # deterministic
    with pytest.raises(ValueError, match="256"):
        C.encode_gif(
            np.random.default_rng(0).integers(0, 256, (64, 64, 3), np.uint8)
        )
    # decode_image dispatch returns the first frame
    img = palimg(6, 9, 4, 3)
    assert np.array_equal(C.decode_image(C.encode_gif(img)), img)
    # multi-frame with transparency: splice a second 2x2 frame at (1,1)
    # whose index 0 is transparent — composite keeps underlying pixels
    base = np.zeros((4, 4, 3), dtype=np.uint8)
    base[:] = [10, 20, 30]
    b = bytearray(C.encode_gif(base))
    assert b[-1] == 0x3B
    # second frame: local color table of 2 colors, indices [[0,1],[1,0]]
    lct = bytes([0, 0, 0, 200, 100, 50])
    lzw = C._gif_lzw_encode(2, bytes([0, 1, 1, 0]))
    gce = bytes([0x21, 0xF9, 4, 0x01, 0, 0, 0, 0])  # transparent idx 0
    frame2 = (
        gce
        + bytes([0x2C])
        + struct.pack("<HHHHB", 1, 1, 2, 2, 0x80)  # LCT flag, size bits 0
        + lct
        + bytes([2])
        + bytes([len(lzw)])
        + lzw
        + b"\x00"
    )
    multi = bytes(b[:-1]) + frame2 + b"\x3b"
    frames = C.decode_gif(multi)
    assert len(frames) == 2
    assert np.array_equal(frames[0], base)
    want = base.copy()
    want[1, 2] = [200, 100, 50]  # idx 1 painted
    want[2, 1] = [200, 100, 50]
    # idx 0 positions (1,1) and (2,2) stay the underlying color
    assert np.array_equal(frames[1], want)
    # truncated LZW data errors cleanly
    good = C.encode_gif(palimg(12, 12, 6, 9))
    with pytest.raises(ValueError):
        C.decode_gif(good[: len(good) // 2])


def test_gif_disposal_methods():
    """GIF89a GCE disposal semantics (ADVICE r04): 2 restores the frame
    region to the background color before the next frame, 3 restores the
    pre-frame canvas, undefined codes 4-7 raise; plus encode_gif_frames
    (animated writer, per-frame local tables) round-trips canvas states
    exactly through decode_gif."""
    import struct

    import numpy as np
    import pytest

    from htep_spark.functions import codecs as C

    def frame_block(x0, y0, fw, fh, colors, indices, disposal, transparent=None):
        packed = (disposal & 0x07) << 2
        tidx = 0
        if transparent is not None:
            packed |= 0x01
            tidx = transparent
        gce = bytes([0x21, 0xF9, 4, packed, 0, 0, tidx, 0])
        bits = max(1, (len(colors) - 1).bit_length())
        lct = bytearray()
        for c in colors:
            lct += bytes(c)
        lct += b"\x00" * (3 * ((1 << bits) - len(colors)))
        mcs = max(2, bits)
        lzw = C._gif_lzw_encode(mcs, bytes(indices))
        return (
            gce
            + bytes([0x2C])
            + struct.pack("<HHHHB", x0, y0, fw, fh, 0x80 | (bits - 1))
            + bytes(lct)
            + bytes([mcs])
            + bytes([len(lzw)])
            + lzw
            + b"\x00"
        )

    # canvas 4x4, GCT = [background red, blue]; frame 1 paints a 2x2 blue
    # square at (1,1) with disposal 2 → frame 2 (full-canvas, transparent)
    # must see the region RESTORED TO RED, not blue
    header = b"GIF89a" + struct.pack("<HHBBB", 4, 4, 0x80, 0, 0)
    gct = bytes([200, 0, 0, 0, 0, 200])  # red bg (idx 0), blue (idx 1)
    f1 = frame_block(1, 1, 2, 2, [(0, 0, 200)], [0, 0, 0, 0], disposal=2)
    # frame 2: full canvas, single transparent color → pure canvas probe
    f2 = frame_block(0, 0, 4, 4, [(9, 9, 9)], [0] * 16, disposal=0, transparent=0)
    gif = header + gct + f1 + f2 + b"\x3b"
    frames = C.decode_gif(gif)
    assert len(frames) == 2
    assert np.array_equal(frames[0][1, 1], [0, 0, 200])  # painted blue
    assert np.array_equal(frames[1][1, 1], [200, 0, 0])  # restored to bg
    assert np.array_equal(frames[1][0, 0], [200, 0, 0])
    # disposal 3: same shape but region must restore the PRE-frame canvas
    # (green base painted by an initial full-canvas frame, not background)
    f0 = frame_block(0, 0, 4, 4, [(0, 150, 0)], [0] * 16, disposal=1)
    f1b = frame_block(1, 1, 2, 2, [(0, 0, 200)], [0, 0, 0, 0], disposal=3)
    gif3 = header + gct + f0 + f1b + f2 + b"\x3b"
    frames3 = C.decode_gif(gif3)
    assert np.array_equal(frames3[1][1, 1], [0, 0, 200])  # shown blue
    assert np.array_equal(frames3[2][1, 1], [0, 150, 0])  # restored green
    # undefined disposal codes error instead of silently compositing
    bad = frame_block(0, 0, 4, 4, [(1, 2, 3)], [0] * 16, disposal=5)
    with pytest.raises(ValueError, match="disposal"):
        C.decode_gif(header + gct + bad + b"\x3b")
    # animated writer round-trip: canvas states come back exactly
    rng = np.random.default_rng(7)
    pal = rng.integers(0, 256, (6, 3), dtype=np.uint8)
    fs = [pal[rng.integers(0, 6, (5, 7))] for _ in range(3)]
    out = C.decode_gif(C.encode_gif_frames(fs))
    assert len(out) == 3
    for got, want in zip(out, fs):
        assert np.array_equal(got, want)
    with pytest.raises(ValueError, match="canvas size"):
        C.encode_gif_frames([fs[0], fs[0][:3]])


def test_png_adam7_interlace():
    """Adam7 interlaced PNGs decode pixel-identically to the source:
    encoder round-trip across shapes (incl. degenerate passes), a
    hand-built stream using non-zero filters INSIDE passes (each pass
    unfilters as an independent image, per spec §8.2), and clean
    rejection of truncated pass data."""
    import struct
    import zlib

    import numpy as np
    import pytest

    from htep_spark.functions import codecs as C

    rng = np.random.default_rng(9)
    for shape in [(17, 23, 3), (8, 5, 1), (1, 1, 1), (7, 1, 3), (1, 9, 3), (9, 9, 4)]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        assert np.array_equal(C.decode_png(C.encode_png(img, interlace=True)), img)
    # hand-built interlaced stream with Sub(1) and Up(2) filters per pass
    img = rng.integers(0, 256, (10, 12, 3), dtype=np.uint8)
    parts = []
    for x0, y0, dx, dy in C._ADAM7:
        sub = img[y0::dy, x0::dx]
        if sub.shape[0] == 0 or sub.shape[1] == 0:
            continue
        flat = sub.reshape(sub.shape[0], -1).astype(np.int32)
        for y in range(flat.shape[0]):
            if y == 0:  # Sub filter
                line = flat[y].copy()
                line[3:] = (line[3:] - flat[y][:-3]) % 256
                parts.append(b"\x01" + line.astype(np.uint8).tobytes())
            else:  # Up filter
                line = (flat[y] - flat[y - 1]) % 256
                parts.append(b"\x02" + line.astype(np.uint8).tobytes())
    ihdr = struct.pack(">IIBBBBB", 12, 10, 8, 2, 0, 0, 1)
    payload = (
        C._PNG_SIG
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", zlib.compress(b"".join(parts)))
        + C._png_chunk(b"IEND", b"")
    )
    assert np.array_equal(C.decode_png(payload), img)
    # truncated interlaced data rejects with a clear error
    short = (
        C._PNG_SIG
        + C._png_chunk(b"IHDR", ihdr)
        + C._png_chunk(b"IDAT", zlib.compress(b"".join(parts)[:-40]))
        + C._png_chunk(b"IEND", b"")
    )
    with pytest.raises(ValueError, match="interlaced"):
        C.decode_png(short)


def test_tiff_codec_roundtrip():
    """TIFF 6.0 writer/reader: lossless round-trip across byte orders
    (II/MM), compression (none/PackBits), strip layouts, gray/RGB; plus
    WhiteIsZero inversion, decode_image dispatch, and the multimodal
    decode path."""
    import struct

    import numpy as np

    from htep_spark.functions import codecs as C

    rng = np.random.default_rng(5)
    imgs = [
        rng.integers(0, 256, (17, 23, 3), dtype=np.uint8),
        rng.integers(0, 256, (8, 5, 1), dtype=np.uint8),
        np.tile(np.arange(16, dtype=np.uint8), (10, 4)).reshape(10, 64, 1),
    ]
    for img in imgs:
        for comp in ("none", "packbits", "lzw"):
            for bo in ("<", ">"):
                for rps in (0, 3):
                    b = C.encode_tiff(
                        img, compression=comp, byteorder=bo, rows_per_strip=rps
                    )
                    assert C.sniff_format(b) == "tiff"
                    assert np.array_equal(C.decode_tiff(b), img), (
                        img.shape, comp, bo, rps,
                    )
    # LZW width transitions + 4094 dictionary resets (TIFF §13 EarlyChange)
    big = np.random.default_rng(4).integers(0, 256, (120, 300, 3), np.uint8)
    assert np.array_equal(
        C.decode_tiff(C.encode_tiff(big, compression="lzw")), big
    )
    assert C._tiff_lzw_decode(C._tiff_lzw_encode(b""), 0) == b""
    b = C.encode_tiff(imgs[0])
    assert np.array_equal(C.decode_image(b), imgs[0])
    assert C.encode_tiff(imgs[0]) == b  # deterministic bytes
    # PhotometricInterpretation 0 (WhiteIsZero) inverts on decode
    b2 = bytearray(C.encode_tiff(imgs[1]))
    n = struct.unpack("<H", b2[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack("<H", b2[off : off + 2])[0] == 262:
            b2[off + 8] = 0
    assert np.array_equal(C.decode_tiff(bytes(b2)), 255 - imgs[1])
    # truncated strip rejects cleanly
    import pytest

    with pytest.raises(ValueError):
        C.decode_tiff(C.encode_tiff(imgs[0])[:-20])
    # PackBits literal-overshoot regression: 127 non-repeating bytes then a
    # 2-run used to emit a 129-byte "literal" with control byte 128 (noop)
    wide = np.zeros((3, 129, 1), dtype=np.uint8)
    wide[:, :127, 0] = (np.arange(127) % 251).astype(np.uint8)
    wide[:, 127:, 0] = 7
    wide[:, 126, 0] = 9  # ensure ...x, 7, 7 tail (2-run after 127 literals)
    pb = C.encode_tiff(wide, compression="packbits")
    assert np.array_equal(C.decode_tiff(pb), wide)
    # missing StripByteCounts: derivable for uncompressed (single- AND
    # multi-strip), hard error for compressed
    for rps in (0, 2):
        raw = bytearray(C.encode_tiff(imgs[0], rows_per_strip=rps))
        n = struct.unpack("<H", raw[8:10])[0]
        for i in range(n):
            off = 10 + 12 * i
            if struct.unpack("<H", raw[off : off + 2])[0] == 279:
                raw[off : off + 2] = struct.pack("<H", 32768)  # unknown tag
        assert np.array_equal(C.decode_tiff(bytes(raw)), imgs[0]), rps
    raw = bytearray(C.encode_tiff(imgs[0], compression="packbits"))
    n = struct.unpack("<H", raw[8:10])[0]
    for i in range(n):
        off = 10 + 12 * i
        if struct.unpack("<H", raw[off : off + 2])[0] == 279:
            raw[off : off + 2] = struct.pack("<H", 32768)
    with pytest.raises(ValueError, match="StripByteCounts"):
        C.decode_tiff(bytes(raw))
    # multimodal metadata path sees tiff as a real image format
    from htep_spark.operators.multimodal import _real_decode

    meta = _real_decode(C.encode_tiff(imgs[0]), "image")
    assert meta["format"] == "tiff" and meta["width"] == 23
    assert meta["height"] == 17


def test_tiff_through_spark_media_operators(spark):
    """A TIFF payload flows through the real decode_media and resize_media
    stages: correct metadata, resized payload re-encoded AS tiff and
    pixel-exact vs the numpy resample."""
    import numpy as np

    from htep_spark.functions import codecs as C
    from htep_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _synth_image,
        decode_media,
        resize_media,
    )

    img = _synth_image(3)
    media = spark.createDataFrame(
        [("m-tiff", "image", bytearray(C.encode_tiff(img)), "image/tiff")],
        MEDIA_SCHEMA,
    )
    meta = decode_media(media).collect()[0]
    assert meta["format"] == "tiff" and meta["error"] is None
    assert (meta["width"], meta["height"]) == (48, 32)
    resized = resize_media(media, 16, 12).collect()[0]
    assert resized["error"] is None
    out = C.decode_tiff(bytes(resized["payload"]))
    assert np.array_equal(out, C.resize_nearest(img, 16, 12))


def test_jpeg_codec_roundtrip():
    """Baseline JPEG codec: 4:4:4 and 4:2:0, grayscale, odd dimensions,
    restart markers — all decode within the lossy tolerance and
    deterministically (ITU T.81 sequential DCT, pure Python)."""
    import numpy as np

    from htep_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from htep_spark.operators.multimodal import _synth_image

    src = _synth_image(3)
    # near-lossless at quant=1, 4:4:4
    out = decode_jpeg(encode_jpeg(src, quant=1))
    assert out.shape == src.shape
    assert np.abs(out.astype(int) - src.astype(int)).max() <= 2
    # 4:2:0 subsampling: chroma box-averaged, still close
    out420 = decode_jpeg(encode_jpeg(src, quant=1, subsampling="420"))
    assert np.abs(out420.astype(int) - src.astype(int)).max() <= 16
    assert np.abs(out420.astype(int) - src.astype(int)).mean() <= 4
    # restart markers decode identically to the unrestarted stream
    rst = decode_jpeg(encode_jpeg(src, quant=1, restart_interval=2))
    assert np.array_equal(rst, out)
    # grayscale is exact at quant=1 (no chroma conversion rounding)
    g = src[:, :, 0]
    gout = decode_jpeg(encode_jpeg(g, quant=1))
    assert gout.shape == (*g.shape, 1)
    assert np.array_equal(gout[..., 0], g)
    # odd (non-multiple-of-8/16) dimensions crop correctly
    odd = src[:29, :45]
    assert decode_jpeg(encode_jpeg(odd, quant=1, subsampling="420")).shape == (29, 45, 3)
    # determinism
    assert encode_jpeg(src, quant=2) == encode_jpeg(src, quant=2)


def test_multimodal_strict_stub_errors(spark):
    """Undecodable payloads (no codec available) must error per-item under
    the strict DEFAULT — metadata stays null, nothing is fabricated; the
    deterministic fake decoder is an explicit strict=False opt-in."""
    from htep_spark.operators.multimodal import MEDIA_SCHEMA, decode_media

    rows = [
        (f"x-{i}", "image", bytearray(b"\x00\x01 junk unknown" * (i + 1)), "application/octet-stream")
        for i in range(3)
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    out = decode_media(media).collect()  # default IS strict
    assert all(r["error"] and "NotImplementedError" in r["error"] for r in out)
    assert all(r["width"] is None and r["feature"] is None for r in out)
    relaxed = decode_media(media, strict=False).collect()
    assert all(r["error"] is None and r["format"] == "fake" for r in relaxed)


def test_streaming_extraction(spark, tmp_path):
    from htep_spark.schema import TRANSCRIPT_SCHEMA
    from htep_spark.sources.io import synthesize_transcripts_pdf
    from htep_spark.streaming.stream import stream_extraction

    pdf = synthesize_transcripts_pdf(40, n_convs=4)
    src = str(tmp_path / "stream_src")
    spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA).write.parquet(src)

    stream = (
        spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    )
    out = stream_extraction(stream)
    assert out.isStreaming
    query = (
        out.writeStream.format("memory")
        .queryName("extraction_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    rows = spark.sql("select count(*) n from extraction_stream").collect()[0]["n"]
    assert rows == 40
    sample = spark.sql(
        "select result.document_type dt from extraction_stream limit 5"
    ).collect()
    assert all(r["dt"] is not None for r in sample)


def test_stream_interval_join(spark, tmp_path):
    """Stream-stream interval join: each turn picks up exactly the
    same-conversation events inside [turn_ts, turn_ts + lag]; state is
    evictable because both sides are watermarked and the condition is
    time-bounded. Expected pairs computed by a pandas replay."""
    from datetime import datetime, timedelta

    from htep_spark.streaming.stream import stream_interval_join

    T0 = datetime(2024, 1, 1, 12, 0, 0)
    turns = [
        ("c1", 0, T0),
        ("c1", 1, T0 + timedelta(minutes=10)),
        ("c2", 0, T0),
    ]
    events = [
        ("c1", 100, "search", T0 + timedelta(seconds=30)),   # -> c1/t0
        ("c1", 101, "code", T0 + timedelta(seconds=400)),    # beyond 300s lag
        ("c1", 102, "search", T0 + timedelta(minutes=10, seconds=5)),  # -> c1/t1
        ("c2", 103, "fetch", T0 + timedelta(seconds=299)),   # -> c2/t0 (edge)
        ("c3", 104, "fetch", T0),                            # no turn
    ]
    tsrc = str(tmp_path / "turns_src")
    esrc = str(tmp_path / "events_src")
    spark.createDataFrame(
        turns, "conv_id string, turn_idx int, ts timestamp"
    ).write.parquet(tsrc)
    spark.createDataFrame(
        events, "conv_id string, event_id long, kind string, ts timestamp"
    ).write.parquet(esrc)

    tstream = spark.readStream.schema(
        "conv_id string, turn_idx int, ts timestamp"
    ).parquet(tsrc)
    estream = spark.readStream.schema(
        "conv_id string, event_id long, kind string, ts timestamp"
    ).parquet(esrc)
    out = stream_interval_join(tstream, estream, max_lag_sec=300)
    assert out.isStreaming
    query = (
        out.writeStream.format("memory")
        .queryName("interval_join_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = {
        (r["conv_id"], r["turn_idx"], r["event_id"])
        for r in spark.sql("select * from interval_join_stream").collect()
    }
    # pandas replay of the interval rule
    want = {
        (tc, ti, eid)
        for tc, ti, tts in turns
        for ec, eid, _k, ets in events
        if tc == ec and tts <= ets <= tts + timedelta(seconds=300)
    }
    assert got == want
    assert ("c1", 0, 101) not in got  # lag bound respected
    assert ("c2", 0, 103) in got  # inclusive edge


def test_streaming_dedup_turns(spark, tmp_path):
    """dropDuplicatesWithinWatermark ingestion guard: replayed
    (conv_id, turn_idx) rows collapse to one, state bounded by watermark."""
    import pandas as pd

    from htep_spark.schema import TRANSCRIPT_SCHEMA
    from htep_spark.sources.io import synthesize_transcripts_pdf
    from htep_spark.streaming.stream import stream_dedup_turns

    pdf = synthesize_transcripts_pdf(30, n_convs=3)
    replayed = pd.concat([pdf, pdf.head(12)], ignore_index=True)  # duplicates
    src = str(tmp_path / "dedup_src")
    spark.createDataFrame(replayed, TRANSCRIPT_SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    out = stream_dedup_turns(stream)
    assert out.isStreaming
    query = (
        out.writeStream.format("memory")
        .queryName("dedup_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    got = spark.sql(
        "select count(*) n, count(distinct conv_id || '#' || turn_idx) d"
        " from dedup_stream"
    ).collect()[0]
    assert got["n"] == 30 and got["d"] == 30


def test_stateful_conversation_stream(spark, tmp_path):
    from htep_spark.schema import TRANSCRIPT_SCHEMA
    from htep_spark.sources.io import synthesize_transcripts_pdf
    from htep_spark.streaming.stream import stream_conversation_state

    pdf = synthesize_transcripts_pdf(60, n_convs=5)
    src = str(tmp_path / "state_src")
    spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA).write.parquet(src)

    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    out = stream_conversation_state(stream)
    assert out.isStreaming
    query = (
        out.writeStream.format("memory")
        .queryName("conv_state")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(180)
    rows = {
        r["conv_id"]: r
        for r in spark.sql(
            "select * from (select *, row_number() over "
            "(partition by conv_id order by n_turns desc) rn from conv_state) "
            "where rn = 1"
        ).collect()
    }
    expected = pdf.groupby("conv_id").size().to_dict()
    for conv_id, n in expected.items():
        assert rows[conv_id]["n_turns"] == n
        assert rows[conv_id]["max_turn"] == n - 1
        assert rows[conv_id]["contiguous"] is True


def test_stream_sessionized_counts(spark, tmp_path):
    """Native session_window streaming sessionization must reproduce a
    pandas gap-rule replay exactly: same per-user session event counts and
    session spans (start = first event; end = last event + gap), including
    the boundary case — an event at exactly prev + gap MERGES into the
    session (session_window's interval is closed on the right; only
    ts > prev + gap opens a new session), pinned by the exact-gap steps
    in the fixture."""
    import datetime as dt

    import pandas as pd

    from htep_spark.streaming.stream import stream_sessionized_counts

    base = dt.datetime(2024, 3, 1)
    gap = dt.timedelta(minutes=30)
    rows = []
    for uid in range(4):
        t = base + dt.timedelta(minutes=uid)
        for j in range(20):
            # deterministic mixture of intra-session steps, an exact-gap
            # boundary step, and clear session breaks
            step = [5, 29, 30, 61][(uid + j) % 4]
            t = t + dt.timedelta(minutes=step)
            rows.append((uid, t))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    src = str(tmp_path / "sess_src")
    spark.createDataFrame(pdf, "user_id long, ts timestamp").write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = stream_sessionized_counts(stream, gap="30 minutes", watermark="0 seconds")
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("sess_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["user_id"], r["session_start"], r["session_end"]): r["n_events"]
        for r in spark.sql("select * from sess_stream").collect()
    }
    # pandas replay: new session only when ts > prev + gap (closed edge)
    want = {}
    for uid, grp in pdf.groupby("user_id"):
        ts = sorted(grp["ts"])
        start, prev, n = ts[0], ts[0], 1
        for t in ts[1:]:
            if t > prev + gap:
                want[(uid, start, prev + gap)] = n
                start, n = t, 0
            n += 1
            prev = t
        want[(uid, start, prev + gap)] = n
    # append mode emits only watermark-finalized sessions; with the corpus
    # fully replayed and watermark 0, every session but possibly each
    # user's LAST may be emitted — require all finalized ones to match
    assert got, "no sessions emitted"
    for k, n in got.items():
        assert want.get(k) == n, (k, n, want.get(k))
    # the big majority of sessions finalize (each user has ~5 breaks)
    assert len(got) >= len(want) - 4


def test_stream_heavy_hitters(spark, tmp_path):
    """Distributed SpaceSaving over a skewed token stream: in the
    exact regime (capacity >= per-shard vocabulary) the summaries equal
    the batch counts exactly; in the tight regime the standard guarantees
    hold — true <= est <= true + err for every summarized token, and every
    token with true count > shard_len/capacity is present. State is
    per-token-shard, so a token's count never splits across shards."""
    import datetime as dt

    import pandas as pd

    from htep_spark.streaming.stream import stream_heavy_hitters

    # deterministic Zipf-ish corpus: token_i appears ~N/(i+1) times
    base = dt.datetime(2024, 1, 1)
    rows = []
    for i in range(40):
        for j in range(200 // (i + 1)):
            rows.append((f"tok{i:02d}", base + dt.timedelta(seconds=len(rows))))
    pdf = pd.DataFrame(rows, columns=["token", "ts"])
    truth = pdf["token"].value_counts().to_dict()
    src = str(tmp_path / "hh_src")
    spark.createDataFrame(pdf, "token string, ts timestamp").write.parquet(src)

    def run(capacity, name):
        stream = spark.readStream.schema("token string, ts timestamp").parquet(src)
        out = stream_heavy_hitters(stream, capacity=capacity, n_shards=4)
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("update")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # latest emission per (shard, token)
        return spark.sql(
            f"select * from (select *, row_number() over (partition by shard, token "
            f"order by est_count desc) rn from {name}) where rn = 1"
        ).collect()

    exact = run(capacity=64, name="hh_exact")
    got = {r["token"]: r for r in exact}
    assert {t: r["est_count"] for t, r in got.items()} == truth
    assert all(r["max_err"] == 0 for r in exact)

    tight = run(capacity=6, name="hh_tight")
    by_shard: dict = {}
    for r in tight:
        by_shard.setdefault(r["shard"], []).append(r)
    shard_of = {r["token"]: r["shard"] for r in exact}
    for shard, rs in by_shard.items():
        assert len(rs) <= 6
        shard_len = sum(c for t, c in truth.items() if shard_of[t] == shard)
        for r in rs:
            true = truth.get(r["token"], 0)
            assert true <= r["est_count"] <= true + r["max_err"], r
        # guarantee: frequent-in-shard tokens must be present
        present = {r["token"] for r in rs}
        for t, c in truth.items():
            if shard_of[t] == shard and c > shard_len / 6:
                assert t in present, (t, c, shard_len)
    # the global top-3 by true count survive the tight summaries
    top_true = sorted(truth, key=lambda t: -truth[t])[:3]
    merged = {r["token"] for r in tight}
    assert set(top_true) <= merged
    # merge_heavy_hitters finalize: in the exact regime the global top-k
    # over the sink equals the true top-k exactly (counts and order)
    from htep_spark.streaming.stream import merge_heavy_hitters

    topk = merge_heavy_hitters(spark.table("hh_exact"), k=5).collect()
    want_top = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:5]
    assert [(r["token"], r["est_count"]) for r in topk] == want_top
    assert [r["rank"] for r in topk] == [1, 2, 3, 4, 5]
    # tight regime: the merged top-k still satisfies the SpaceSaving bound
    ttop = merge_heavy_hitters(spark.table("hh_tight"), k=5).collect()
    for r in ttop:
        true = truth.get(r["token"], 0)
        assert true <= r["est_count"] <= true + r["max_err"], r


def test_merge_heavy_hitters_multi_generation_atomic(spark):
    """A token evicted and re-inserted between micro-batches leaves TWO
    sink generations: (est=1, err=0) then (est=51, err=50). The merge must
    take the latest generation atomically — pairing max(est) with min(err)
    across generations would fabricate (51, 0), violating
    true <= est <= true + err (ADVICE r06)."""
    from htep_spark.streaming.stream import merge_heavy_hitters

    sink = spark.createDataFrame(
        [
            (0, "tok", 1, 0),
            (0, "tok", 51, 50),
            (0, "other", 10, 0),
        ],
        "shard int, token string, est_count long, max_err long",
    )
    rows = {r["token"]: r for r in merge_heavy_hitters(sink, k=5).collect()}
    assert rows["tok"]["est_count"] == 51 and rows["tok"]["max_err"] == 50
    assert rows["other"]["est_count"] == 10 and rows["other"]["max_err"] == 0


def test_decode_wav_rejects_stereo_ima_adpcm():
    """A stereo (nChannels=2) format-0x11 WAV must raise instead of being
    decoded through the mono reconstruction (ADVICE r06)."""
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from htep_spark.functions import codecs

    mono = codecs.encode_wav_ima(
        np.zeros(64, dtype=np.int16).reshape(-1, 1), 8000
    )
    # flip the fmt chunk's channel count to 2 (fmt body starts at 20)
    idx = mono.index(b"fmt ") + 8
    stereo = mono[: idx + 2] + _struct.pack("<H", 2) + mono[idx + 4 :]
    with _pytest.raises(ValueError, match="channel count"):
        codecs.decode_wav(stereo)
    codecs.decode_wav(mono)  # the mono original still decodes


def test_apng_over_on_transparent_is_source():
    """OVER onto a fully transparent region must behave as SOURCE (the
    spec's compositing operator with destination alpha; also the spec's
    first-frame rule — ADVICE r06)."""
    import numpy as np

    from htep_spark.functions import codecs

    base = np.zeros((4, 4, 4), np.uint8)  # fully transparent canvas
    f1 = np.full((2, 2, 4), 200, np.uint8)
    f1[:, :, 3] = 100  # semi-transparent src over dst alpha 0
    pay = codecs.encode_apng(
        [base, f1], offsets=[(0, 0), (1, 1)], dispose_ops=[0, 0],
        blend_ops=[0, 1],
    )
    frames = codecs.decode_png_frames(pay)
    assert np.array_equal(frames[1][1:3, 1:3], f1)  # OVER == SOURCE here


def test_dedup_keepers_connected_components(spark):
    from htep_spark.operators.dedup import connected_components, dedup_keepers

    # chain component {1,2,3} (1-2, 2-3), pair {7,9}, singletons elsewhere
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 9)], ["doc_a", "doc_b"]
    )
    comps = {
        r["doc_id"]: r["cluster_id"] for r in connected_components(pairs).collect()
    }
    assert comps == {1: 1, 2: 1, 3: 1, 7: 7, 9: 7}

    docs = _near_dup_docs(spark)
    verdicts = {
        r["doc_id"]: r
        for r in dedup_keepers(docs, "doc_id", "text", threshold=0.5).collect()
    }
    assert len(verdicts) == 12
    assert verdicts[0]["keep"] and not verdicts[1]["keep"]
    assert verdicts[1]["cluster_id"] == 0
    assert verdicts[2]["keep"] and not verdicts[3]["keep"]
    assert all(verdicts[i]["keep"] for i in range(4, 12))  # singletons kept


def test_winnow_fingerprints(spark):
    from htep_spark.operators.text_analysis import winnow_udf

    docs = _near_dup_docs(spark)
    fps = {
        r["doc_id"]: set(r["f"])
        for r in docs.select("doc_id", winnow_udf("text").alias("f")).collect()
    }
    # deterministic, non-empty, and near-dups share most fingerprints
    assert all(fps[i] for i in fps)
    overlap01 = len(fps[0] & fps[1]) / len(fps[0] | fps[1])
    overlap04 = len(fps[0] & fps[4]) / len(fps[0] | fps[4])
    assert overlap01 > 0.5
    assert overlap04 < 0.1
    # whitespace-normalization invariance
    rows = spark.createDataFrame(
        [(0, "alpha  bravo\ncharlie"), (1, "alpha bravo charlie")], ["i", "t"]
    ).select(winnow_udf("t").alias("f")).collect()
    assert rows[0]["f"] == rows[1]["f"]


def test_winnow_non_ascii_parity(spark):
    """The UDF hashes bytes, the oracle hashes codepoints — parity on
    non-ASCII input is ENFORCED by stripping to ASCII on both sides
    (ADVICE r02): accented text must produce identical fingerprints in
    both engines, equal to the stripped-ASCII text's fingerprints."""
    import duckdb
    import pandas as pd

    from htep_spark.operators.text_analysis import _winnow_ctes, winnow_udf

    rows = [
        (0, "le café du coin est très agréable en été vraiment superbe"),
        (1, "le caf du coin est trs agrable en t vraiment superbe"),
        (2, "plain ascii text with no accents at all in this sentence"),
    ]
    docs = spark.createDataFrame(rows, ["doc_id", "text"])
    spark_fps = {
        r["doc_id"]: list(r["f"])
        for r in docs.select("doc_id", winnow_udf("text").alias("f")).collect()
    }
    # accented row 0 ≡ its ASCII-stripped twin row 1
    assert spark_fps[0] == spark_fps[1] and spark_fps[0]
    con = duckdb.connect()
    con.register("documents", pd.DataFrame(rows, columns=["doc_id", "text"]))
    duck = {
        int(d): sorted(int(x) for x in f)
        for d, f in con.execute(
            f"WITH {_winnow_ctes()} SELECT doc_id, fps FROM fp"
        ).fetchall()
    }
    assert duck == {k: sorted(v) for k, v in spark_fps.items()}


def test_streaming_windowed_metrics(spark, tmp_path):
    from htep_spark.schema import TRANSCRIPT_SCHEMA
    from htep_spark.sources.io import synthesize_transcripts_pdf
    from htep_spark.streaming.stream import stream_windowed_metrics

    pdf = synthesize_transcripts_pdf(48, n_convs=4)
    src = str(tmp_path / "win_src")
    spark.createDataFrame(pdf, TRANSCRIPT_SCHEMA).write.parquet(src)
    stream = spark.readStream.schema(TRANSCRIPT_SCHEMA).parquet(src)
    out = stream_windowed_metrics(stream, window_duration="10 minutes",
                                  watermark="5 minutes")
    query = (
        out.writeStream.format("memory")
        .queryName("win_metrics")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination(120)
    rows = spark.sql(
        "select sum(n_turns) t, count(*) w from win_metrics"
    ).collect()[0]
    # append mode emits only watermark-closed windows; every window but the
    # per-conversation last can close → at least the bulk of turns appear
    assert rows["w"] >= 1
    assert rows["t"] > 0


def test_winnow_overlap_pairs(spark):
    from htep_spark.operators.text_analysis import winnow_overlap_pairs

    docs = _near_dup_docs(spark)
    pairs = {
        (r["doc_a"], r["doc_b"]): r["containment"]
        for r in winnow_overlap_pairs(docs, "doc_id", "text", min_common=3).collect()
    }
    assert (0, 1) in pairs and pairs[(0, 1)] > 0.5
    assert (2, 3) in pairs
    assert all(a in (0, 2) for a, _ in pairs)  # no spurious pairs


def test_ann_ivf_topk(spark):
    from htep_spark.operators.similarity import ann_ivf_topk, cosine_topk

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    queries = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"), F.col("embedding")
    )
    approx = ann_ivf_topk(emb, queries, k=3)
    rows = approx.collect()
    assert rows, "IVF produced no candidates"
    by_q = {}
    for r in rows:
        by_q.setdefault(r["query_id"], []).append(r)
    exact_top1 = {
        r["query_id"]: r["vec_id"]
        for r in cosine_topk(emb, queries, k=1).collect()
    }
    # recall check: IVF top-1 equals exact top-1 for most queries
    hits = sum(
        1
        for q, rs in by_q.items()
        if sorted(rs, key=lambda r: r["rank"])[0]["vec_id"] == exact_top1.get(q)
    )
    assert hits >= len(by_q) * 0.5
    # deterministic across invocations
    again = sorted(map(str, ann_ivf_topk(emb, queries, k=3).collect()))
    assert again == sorted(map(str, rows))


def test_multimodal_resize_and_frame_sample(spark):
    from htep_spark.operators.multimodal import (
        make_media_table,
        resize_media,
        sample_frames,
    )

    import numpy as np

    from htep_spark.functions import codecs
    from htep_spark.operators.multimodal import _synth_image

    media = make_media_table(spark, n=9)
    resized = {r["media_id"]: r for r in resize_media(media, 16, 12).collect()}
    assert len(resized) == 9
    assert all(r["target_w"] == 16 for r in resized.values())
    # images + videos resize for real; audio (WAV) errors per-item under the
    # strict default instead of fabricating a payload
    for r in resized.values():
        if r["kind"] in ("image", "video"):
            assert r["error"] is None and r["payload"] is not None
        else:
            assert r["payload"] is None and "NotImplementedError" in r["error"]
    # pixel-level: the resized image payload decodes to exactly the
    # nearest-neighbor resample of the synthetic source
    out = codecs.decode_image(bytes(resized["m-0000"]["payload"]))
    expect = codecs.resize_nearest(_synth_image(0), 16, 12)
    assert out.shape == (12, 16, 3)
    assert np.array_equal(out, expect)
    # resized RAWV video: every frame resized
    vid = codecs.decode_rawv(bytes(resized["m-0002"]["payload"]))
    assert len(vid) == 32 and vid[0].shape == (12, 16, 3)
    # deterministic payloads (audio rows carry null payloads — skip them)
    again = resize_media(media, 16, 12).collect()
    assert sorted(
        bytes(r["payload"]) for r in resized.values() if r["payload"] is not None
    ) == sorted(bytes(r["payload"]) for r in again if r["payload"] is not None)

    frames = sample_frames(media, every_n=24, max_frames=3).collect()
    assert frames, "no frames sampled"
    by_media = {}
    for f in frames:
        by_media.setdefault(f["media_id"], []).append(f["frame_idx"])
    for idxs in by_media.values():
        assert len(idxs) <= 3
        assert sorted(idxs) == idxs or len(set(idxs)) == len(idxs)
    # pixel-level: sampled frame 24 of m-0002 equals the synthetic source
    f24 = next(
        f for f in frames if f["media_id"] == "m-0002" and f["frame_idx"] == 24
    )
    assert np.array_equal(
        codecs.decode_ppm(bytes(f24["frame_payload"])),
        _synth_image(2 * 100 + 24, w=32, h=24),
    )
    # animated GIF videos demux for real: strided composited frames out
    from htep_spark.operators.multimodal import MEDIA_SCHEMA

    C2 = codecs
    pal = np.array([[0, 0, 0], [200, 40, 10], [5, 250, 90]], dtype=np.uint8)
    base_img = pal[np.zeros((6, 8), dtype=np.int64)]
    gif = bytearray(C2.encode_gif(base_img))
    # append 5 more full-canvas frames cycling colors → 6 frames total
    import struct as _struct

    tail = b""
    for fi in range(1, 6):
        idx = np.full((6, 8), fi % 3, dtype=np.uint8)
        lct = pal.tobytes() + b"\x00" * 3  # 4-entry table (size bits 1)
        lzw = C2._gif_lzw_encode(2, idx.tobytes())
        tail += (
            bytes([0x2C])
            + _struct.pack("<HHHHB", 0, 0, 8, 6, 0x81)
            + lct
            + bytes([2, len(lzw)])
            + lzw
            + b"\x00"
        )
    gif = bytes(gif[:-1]) + tail + b"\x3b"
    assert len(C2.decode_gif(gif)) == 6
    gmedia = spark.createDataFrame(
        [("m-gif", "video", bytearray(gif), "image/gif")], MEDIA_SCHEMA
    )
    gframes = sample_frames(gmedia, every_n=2, max_frames=3).collect()
    assert sorted(f["frame_idx"] for f in gframes) == [0, 2, 4]
    for f in gframes:
        decoded = C2.decode_ppm(bytes(f["frame_payload"]))
        assert np.array_equal(decoded, pal[np.full((6, 8), f["frame_idx"] % 3)])
    # strict mode: an undecodable video yields ONE visible error row (null
    # frame_idx/payload), not a silent drop (ADVICE r03)
    bad = spark.createDataFrame(
        [("m-bad", "video", bytearray(b"not-a-rawv-container"), "video/mp4")],
        MEDIA_SCHEMA,
    )
    bad_rows = sample_frames(bad, every_n=24, max_frames=3).collect()
    assert len(bad_rows) == 1
    assert bad_rows[0]["frame_idx"] is None
    assert bad_rows[0]["frame_payload"] is None
    assert "NotImplementedError" in bad_rows[0]["error"]
    # a corrupt RAWV container (magic ok, body truncated) also errors
    # per-item instead of killing the task (review r04)
    crawv = spark.createDataFrame(
        [("m-crawv", "video", bytearray(b"RAWV\x00\x00"), "video/x-rawv")],
        MEDIA_SCHEMA,
    )
    crow = sample_frames(crawv).collect()
    assert len(crow) == 1 and crow[0]["frame_payload"] is None
    assert crow[0]["error"] is not None
    # good frames carry a null error column
    assert all(f["error"] is None for f in frames)


def test_tiff_multipage_roundtrip():
    """TIFF 6.0 multi-image files: encode_tiff_pages chains one IFD per
    page (pages may differ in size/channels/compression round-trips) and
    decode_tiff_pages walks the chain exactly; decode_tiff keeps returning
    the first page; corrupt chains (out-of-range / cyclic next-IFD offsets)
    raise ValueError instead of looping or crashing."""
    import struct

    import numpy as np
    import pytest

    from htep_spark.functions import codecs as C

    rng = np.random.default_rng(11)
    pages = [
        rng.integers(0, 256, (9, 13, 3), np.uint8),
        rng.integers(0, 256, (5, 7), np.uint8),  # grayscale page
        rng.integers(0, 256, (20, 4, 3), np.uint8),
    ]
    for comp in ("none", "packbits", "lzw"):
        for bo in ("<", ">"):
            b = C.encode_tiff_pages(
                pages, compression=comp, byteorder=bo, rows_per_strip=4
            )
            assert C.sniff_format(b) == "tiff"
            out = C.decode_tiff_pages(b)
            assert len(out) == 3, (comp, bo)
            for got, src in zip(out, pages):
                src3 = src[..., None] if src.ndim == 2 else src
                assert np.array_equal(got, src3), (comp, bo)
            assert np.array_equal(C.decode_tiff(b), pages[0])
    # single-page writer is the 1-page chain
    img = pages[0]
    assert C.encode_tiff(img) == C.encode_tiff_pages([img])
    assert len(C.decode_tiff_pages(C.encode_tiff(img))) == 1
    # corrupt chain: next-IFD pointer past EOF → ValueError (the pointer of
    # page 0 sits at the end of its IFD: header(8) + 2 + 12*n_entries)
    b = bytearray(C.encode_tiff_pages(pages[:2]))
    n_entries = struct.unpack("<H", b[8:10])[0]
    ptr_pos = 10 + 12 * n_entries
    b[ptr_pos : ptr_pos + 4] = struct.pack("<I", len(b) + 100)
    with pytest.raises(ValueError, match="out of range"):
        C.decode_tiff_pages(bytes(b))
    # cyclic chain: pointer back to the first IFD → ValueError, no hang
    b[ptr_pos : ptr_pos + 4] = struct.pack("<I", 8)
    with pytest.raises(ValueError, match="cyclic"):
        C.decode_tiff_pages(bytes(b))


def test_sample_frames_multipage_tiff(spark):
    """Multi-page TIFFs demux through sample_frames like animated GIFs:
    strided page indices come out as PPM frames pixel-identical to the
    source pages; decode_media reports n_frames = page count; resize_media
    resizes every page; a corrupt IFD chain yields ONE visible error row."""
    import struct

    import numpy as np

    from htep_spark.functions import codecs
    from htep_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        resize_media,
        sample_frames,
    )

    rng = np.random.default_rng(21)
    pages = [rng.integers(0, 256, (6, 8, 3), np.uint8) for _ in range(5)]
    payload = codecs.encode_tiff_pages(pages)
    media = spark.createDataFrame(
        [("m-tif", "video", bytearray(payload), "image/tiff")], MEDIA_SCHEMA
    )
    frames = sample_frames(media, every_n=2, max_frames=3).collect()
    assert sorted(f["frame_idx"] for f in frames) == [0, 2, 4]
    for f in frames:
        got = codecs.decode_ppm(bytes(f["frame_payload"]))
        assert np.array_equal(got, pages[f["frame_idx"]])
    # decode_media: n_frames = page count (kind-agnostic payload sniffing)
    imedia = spark.createDataFrame(
        [("m-tif", "image", bytearray(payload), "image/tiff")], MEDIA_SCHEMA
    )
    meta = decode_media(imedia).collect()[0]
    assert meta["n_frames"] == 5 and meta["error"] is None
    # resize keeps all pages
    rz = resize_media(imedia, 16, 12).collect()[0]
    assert rz["error"] is None
    rpages = codecs.decode_tiff_pages(bytes(rz["payload"]))
    assert len(rpages) == 5
    for got, src in zip(rpages, pages):
        assert np.array_equal(got, codecs.resize_nearest(src, 16, 12))
    # corrupt chain → one error row, not a task crash
    bad = bytearray(payload)
    n_entries = struct.unpack("<H", bad[8:10])[0]
    ptr_pos = 10 + 12 * n_entries
    bad[ptr_pos : ptr_pos + 4] = struct.pack("<I", len(bad) + 9)
    bmedia = spark.createDataFrame(
        [("m-bad", "video", bad, "image/tiff")], MEDIA_SCHEMA
    )
    rows = sample_frames(bmedia).collect()
    assert len(rows) == 1 and rows[0]["frame_payload"] is None
    assert "out of range" in rows[0]["error"]


def test_resize_media_animated_gif(spark):
    """Animated GIFs resize EVERY frame (ADVICE r04): n_frames survives
    the resize round trip (decode_media parity before vs after) and each
    resized frame equals the nearest-neighbor resample of the source
    canvas state."""
    import numpy as np

    from htep_spark.functions import codecs
    from htep_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        resize_media,
    )

    pal = np.array([[0, 0, 0], [200, 40, 10], [5, 250, 90]], dtype=np.uint8)
    src_frames = [pal[np.full((6, 8), i % 3)] for i in range(4)]
    payload = codecs.encode_gif_frames(src_frames)
    media = spark.createDataFrame(
        [("m-agif", "image", bytearray(payload), "image/gif")], MEDIA_SCHEMA
    )
    before = decode_media(media).collect()[0]
    assert before["n_frames"] == 4
    out = resize_media(media, 16, 12).collect()[0]
    assert out["error"] is None
    resized_frames = codecs.decode_gif(bytes(out["payload"]))
    assert len(resized_frames) == 4  # no silent single-frame collapse
    for got, src in zip(resized_frames, src_frames):
        assert np.array_equal(got, codecs.resize_nearest(src, 16, 12))
    media_resized = spark.createDataFrame(
        [("m-agif", "image", bytearray(bytes(out["payload"])), "image/gif")],
        MEDIA_SCHEMA,
    )
    after = decode_media(media_resized).collect()[0]
    assert after["n_frames"] == 4 and after["width"] == 16
    # a multi-palette animation whose composited canvas exceeds 256 colors
    # cannot round-trip GIF faithfully → VISIBLE per-item error, never a
    # quantized or frame-dropped payload (review r05): build one from two
    # 256-color frames where frame 2's transparency keeps half of frame 1
    import struct as _st

    palA = np.array(
        [[i, 0, 0] for i in range(256)], dtype=np.uint8
    )  # 256 reds
    # 16x32 canvas: every red appears twice (top and bottom half)
    f1 = palA[np.arange(512).reshape(32, 16) % 256]
    b = bytearray(codecs.encode_gif(f1))
    # frame 2: TOP-HALF sub-region painted with a local table of 256
    # greens → composited state = 256 greens + 256 reds (bottom half
    # untouched) ≈ 511 distinct colors, unencodable per-frame
    palB = bytes(b"".join(bytes([0, g, 0]) for g in range(256)))
    idx2 = (np.arange(256).reshape(16, 16) % 256).astype(np.uint8)
    lzw2 = codecs._gif_lzw_encode(8, idx2.tobytes())
    gce = bytes([0x21, 0xF9, 4, 0x04, 0, 0, 0, 0])  # disposal 1, no transp
    frame2 = (
        gce
        + bytes([0x2C])
        + _st.pack("<HHHHB", 0, 0, 16, 16, 0x87)
        + palB
        + bytes([8])
    )
    for i in range(0, len(lzw2), 255):
        chunk = lzw2[i : i + 255]
        frame2 += bytes([len(chunk)]) + chunk
    frame2 += b"\x00"
    rich = bytes(b[:-1]) + frame2 + b"\x3b"
    states = codecs.decode_gif(rich)
    n_colors = len(np.unique(states[1].reshape(-1, 3), axis=0))
    assert n_colors > 256  # the fixture really is unencodable
    rmedia = spark.createDataFrame(
        [("m-rich", "image", bytearray(rich), "image/gif")], MEDIA_SCHEMA
    )
    rrow = resize_media(rmedia, 16, 32).collect()[0]
    assert rrow["payload"] is None and "256" in rrow["error"]


def test_difflib_match_query_nonvacuous(spark):
    """The difflib_match oracle query must exercise every branch of the
    T4 close-match layer on the fixed corpus: the corrupted-term prelude
    rows are guaranteed matches by construction (1-char substitution of a
    len>=7 term → ratio >= 6/7 = 0.857; deletion → >= 12/13 = 0.923, both
    above the 0.84 cutoff), genuinely fuzzy (<1.0) ratios appear, and the
    below-cutoff None branch fires on corpus tokens."""
    from htep_spark.driver_queries import q_difflib_match

    rows = q_difflib_match(spark, "/root/testdata/sf0.001").collect()
    matched = [r for r in rows if r["match_term"] is not None]
    assert matched, "no close matches at all"
    assert any(r["ratio"] < 1.0 for r in matched), "no fuzzy (<1.0) ratios"
    assert any(r["match_term"] is None for r in rows), "None branch never hit"
    prelude_missed = [
        r for r in rows if r["word_idx"] in (0, 1) and r["match_term"] is None
    ]
    assert not prelude_missed, prelude_missed[:3]


def test_fuzzy_ratio_query_nonvacuous(spark):
    """The fuzzy_ratio oracle query must actually exercise every branch of
    extract_one on the fixed corpus: the corrupted-term prelude rows
    (word_idx 0/1) are GUARANTEED matches by construction (1-char
    substitution of len>=7 → ratio >= 85.71; 1-char deletion → >= 92.3,
    both above the 85 cutoff), genuinely fuzzy scores (<100) must appear,
    and corpus tokens must also hit the below-cutoff None branch — a green
    hash over all-null matches would prove nothing."""
    from htep_spark.driver_queries import q_fuzzy_ratio

    rows = q_fuzzy_ratio(spark, "/root/testdata/sf0.001").collect()
    matched = [r for r in rows if r["match_term"] is not None]
    assert matched, "no fuzzy matches at all"
    assert any(r["ratio"] < 100 for r in matched), "no fuzzy (<100) scores"
    assert any(r["match_term"] is None for r in rows), "None branch never hit"
    prelude_missed = [
        r for r in rows if r["word_idx"] in (0, 1) and r["match_term"] is None
    ]
    assert not prelude_missed, prelude_missed[:3]


def test_lm_heldout_matches_pure_python(spark):
    """CCNet-proper held-out perplexity (Wenzek et al. 2020): the md5
    train/score split, add-k bigram LM trained ONLY on the train half,
    held-out mean log-prob, exact global rank and tercile must all match a
    straightforward pure-Python reimplementation — and the held-out
    smoothing branch (bigram unseen in training) must actually fire, since
    that fallback is exactly what distinguishes this from in-corpus
    lm_score."""
    import hashlib
    import math
    import re

    import pandas as pd

    from htep_spark.driver_queries import LM_SMOOTH_K
    from htep_spark.operators.ranking import (
        LM_HELDOUT_MOD,
        LM_HELDOUT_SALT,
        q_lm_heldout,
    )

    sf_dir = "/root/testdata/sf0.001"
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet")[["doc_id", "text"]]
    tok = re.compile("[a-z0-9]+")

    def bucket(doc_id):
        h = hashlib.md5(f"{LM_HELDOUT_SALT}|{doc_id}".encode()).hexdigest()
        return int(h[:15], 16) % LM_HELDOUT_MOD

    uni, big, held = {}, {}, {}
    for r in docs.itertuples():
        ws = tok.findall(r.text.lower())
        if bucket(r.doc_id) == 0:
            for w in ws:
                uni[w] = uni.get(w, 0) + 1
            for a, b in zip(ws, ws[1:]):
                big[(a, b)] = big.get((a, b), 0) + 1
        else:
            held[r.doc_id] = ws
    vocab = len(uni)
    assert held and uni, "split must produce both halves"
    unseen = 0
    expect = {}
    for d, ws in held.items():
        pairs = list(zip(ws, ws[1:]))
        unseen += sum(1 for p in pairs if p not in big)
        lps = [
            math.log(
                (big.get(p, 0) + LM_SMOOTH_K)
                / (uni.get(p[0], 0) + LM_SMOOTH_K * vocab)
            )
            for p in pairs
        ]
        expect[d] = (
            round(sum(lps) / len(lps), 6) if lps else None,
            len(lps),
        )
    assert unseen > 0, "held-out smoothing branch never fired (vacuous test)"

    got = {r["doc_id"]: r for r in q_lm_heldout(spark, sf_dir).collect()}
    assert set(got) == set(expect)
    for d, (mlp, nb) in expect.items():
        assert got[d]["n_bigrams"] == nb, d
        if mlp is None:
            assert got[d]["mean_logp"] is None, d
        else:  # fold order matches; allow 1-ulp ln() divergence across VMs
            assert abs(got[d]["mean_logp"] - mlp) < 2e-6, (d, got[d], mlp)
    # exact global rank: ascending (mean_logp NULLS FIRST, doc_id)
    order = sorted(
        expect,
        key=lambda d: (
            expect[d][0] is not None,
            expect[d][0] if expect[d][0] is not None else 0.0,
            d,
        ),
    )
    n = len(order)
    for rank, d in enumerate(order, 1):
        assert got[d]["global_rank"] == rank, d
        terc = ("tail", "middle", "head")[math.floor(3 * (rank - 1) / n)]
        assert got[d]["tercile"] == terc, d


def test_bpe_train_matches_pure_python(spark):
    """The distributed BPE loop (superstep pair-count + JVM fold merge)
    must learn exactly the merge table a straightforward pure-Python BPE
    produces — same argmax, same (count desc, pair asc) tie-break, same
    leftmost non-overlapping merge application."""
    from htep_spark.operators.bpe import bpe_train

    corpus = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        + ["aaa"] * 4  # overlap case: (a,a) merges leftmost-first
    )

    def py_bpe(words, k):
        seqs = [list(w) for w in words]
        merges = []
        for _ in range(k):
            counts = {}
            for s in seqs:
                for x, y in zip(s, s[1:]):
                    counts[(x, y)] = counts.get((x, y), 0) + 1
            if not counts:
                break
            best = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
            (a, b), cnt = best
            merges.append((a, b, cnt))
            out = []
            for s in seqs:
                ns, i = [], 0
                while i < len(s):
                    if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                        ns.append(a + b)
                        i += 2
                    else:
                        ns.append(s[i])
                        i += 1
                out.append(ns)
            seqs = out
        return merges

    words = spark.createDataFrame([(w,) for w in corpus], ["word"])
    got = bpe_train(words, "word", k=6)
    want = py_bpe(corpus, 6)
    assert got == want
    # the overlap corpus must produce an (a,a)-style merge somewhere and
    # the learned table must be deterministic across invocations
    assert got == bpe_train(words, "word", k=6)
    assert any(a == b for a, b, _ in got)


def test_bloom_probe_branches(spark):
    """Bloom membership: zero false negatives (every corpus token claims
    present — the structural guarantee), and at the deliberately tight
    m=128 BOTH absent-probe branches fire on the fixed corpus: some
    correct rejections AND some false positives (9/48, pre-verified at
    all three SFs) — a green hash covers the interesting behavior."""
    from htep_spark.driver_queries import q_bloom_probe

    rows = q_bloom_probe(spark, "/root/testdata/sf0.001").collect()
    present = [r for r in rows if r["in_corpus"] == 1]
    absent = [r for r in rows if r["in_corpus"] == 0]
    assert present and absent
    assert all(r["claimed_present"] == 1 for r in present)  # no false negs
    fps = sum(r["false_positive"] for r in absent)
    rejects = sum(1 for r in absent if r["claimed_present"] == 0)
    assert fps > 0 and rejects > 0, (fps, rejects)
    assert fps == 9  # deterministic at m=128 on the fixed corpus


def test_char_entropy_flags_both_tails(spark):
    """The entropy quality signal must discriminate on the fixed corpus:
    both tail flags fire (thresholds sit inside the distribution), the
    unflagged interior dominates, and entropy is within the [0, log2(
    n_distinct_chars)] information-theoretic bound for every doc."""
    import math

    from htep_spark.driver_queries import q_char_entropy

    rows = q_char_entropy(spark, "/root/testdata/sf0.001").collect()
    flags = {r["flag"] for r in rows}
    assert {"low_entropy", "high_entropy", None} <= flags | {None}
    assert "low_entropy" in flags and "high_entropy" in flags
    assert sum(1 for r in rows if r["flag"] is None) > len(rows) * 0.8
    for r in rows:
        assert 0.0 <= r["entropy_bits"] <= math.log2(r["n_distinct_chars"]) + 1e-6
        assert abs(r["unigram_ratio"] - r["entropy_bits"] / 8.0) < 1e-5


def test_curation_funnel_monotone(spark):
    """The composed keep-gate cascade must be a real funnel on the fixed
    corpus: stage counts monotonically non-increasing per source, at least
    two stages strictly discriminate globally, and kept_tokens only counts
    full survivors (0 whenever sampled is 0)."""
    from htep_spark.driver_queries import q_curation_funnel

    rows = q_curation_funnel(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert (
            r["n_docs"]
            >= r["pass_quality"]
            >= r["pass_repetition"]
            >= r["pass_dedup"]
            >= r["sampled"]
            >= 0
        ), r
        if r["sampled"] == 0:
            assert r["kept_tokens"] == 0, r
    tot = {
        k: sum(r[k] for r in rows)
        for k in ("n_docs", "pass_quality", "pass_dedup", "sampled")
    }
    assert tot["pass_quality"] < tot["n_docs"]
    assert tot["pass_dedup"] < tot["pass_quality"]
    assert tot["sampled"] < tot["pass_dedup"]


def test_count_min_bounds(spark):
    """Count-Min guarantee on the fixed corpus: est >= true for EVERY
    token (min over d counters can never undercount), and at the
    deliberately tight width both branches fire — some tokens exact, some
    overcounted by collisions — so the hash covers the sketch's actual
    error behavior."""
    from htep_spark.driver_queries import q_count_min

    rows = q_count_min(spark, "/root/testdata/sf0.001").collect()
    assert rows
    assert all(r["est_count"] >= r["true_count"] for r in rows)
    assert all(r["overcount"] == r["est_count"] - r["true_count"] for r in rows)
    assert any(r["overcount"] > 0 for r in rows), "no collisions — vacuous"
    assert any(r["overcount"] == 0 for r in rows), "no exact cells"


def test_approx_distinct_hll_accuracy(spark):
    """The from-scratch HLL must actually estimate: on the corpus (31
    distinct tokens — the linear-counting branch) AND on a synthetic
    50k-cardinality set (the raw-estimator branch, where m=64 gives
    ~1.04/sqrt(64) = 13% standard error). Checks both branches fire and
    the estimate lands within 3 standard errors."""
    from pyspark.sql import functions as F

    from htep_spark.driver_queries import q_approx_distinct
    from htep_spark.functions.hashing import md5_prefix60_spark

    row = q_approx_distinct(spark, "/root/testdata/sf0.001").collect()[0]
    assert row["n_exact"] > 0
    assert row["rel_error"] < 0.2  # linear-counting regime is tight

    # raw-estimator regime: 50k distinct synthetic tokens through the
    # same register construction (inline, no parquet needed)
    n = 50_000
    toks = spark.range(n).select(
        F.concat(F.lit("syn-"), F.col("id")).alias("token")
    )
    h = md5_prefix60_spark(F.col("token"))
    rest = F.shiftrightunsigned(h, 6)
    bitlen = F.length(F.conv(rest.cast("string"), 10, 2))
    rho = F.when(rest == 0, F.lit(55)).otherwise(55 - bitlen)
    regs = (
        toks.select(F.pmod(h, F.lit(64)).alias("bucket"), rho.alias("rho"))
        .groupBy("bucket")
        .agg(F.max("rho").alias("reg"))
    )
    rows = regs.collect()
    present = {r["bucket"]: r["reg"] for r in rows}
    s = sum(2.0 ** -present.get(b, 0) for b in range(64))
    est = 0.709 * 64 * 64 / s
    assert est > 2.5 * 64  # raw branch (no small-range correction)
    assert abs(est - n) / n < 3 * 1.04 / (64 ** 0.5), est


def test_mixture_plan_sane(spark):
    """The executable sampling plan must be a valid plan: rates within
    [0, 10000] permyriad, expected_tokens = floor(n_tokens*rate/10000)
    exactly, and the APPLIED plan's aggregate token yield within 10% of
    the budget target (per-source deviation is legitimately high at 25
    docs/source — doc-level Bernoulli noise — so the gate is corpus-level,
    where the binomial SE is ~4.5%)."""
    import math

    from htep_spark.driver_queries import MIXTURE_BUDGET_FRAC, q_mixture_plan

    rows = q_mixture_plan(spark, "/root/testdata/sf0.001").collect()
    assert rows
    total = sum(r["n_tokens"] for r in rows)
    kept = sum(r["kept_tokens"] for r in rows)
    for r in rows:
        assert 0 <= r["rate_permyriad"] <= 10_000, r
        assert r["expected_tokens"] == math.floor(
            r["n_tokens"] * r["rate_permyriad"] / 10_000
        ), r
        assert 0 <= r["kept_tokens"] <= r["n_tokens"], r
    assert abs(kept - MIXTURE_BUDGET_FRAC * total) / total < 0.10, (kept, total)


def test_contamination_both_verdicts(spark):
    """Benchmark contamination: every clinical snippet with >= k tokens
    MUST be flagged (the prelude embeds it verbatim in every ctext), every
    clean item MUST NOT be (they appear nowhere), and the <k-token snippet
    exercises the zero-gram path — so a green hash cannot be one-sided."""
    from htep_spark.driver_queries import (
        CONTAM_CLEAN_ITEMS,
        _contam_items,
        q_contamination,
    )

    rows = {
        r["bench_id"]: r
        for r in q_contamination(spark, "/root/testdata/sf0.001").collect()
    }
    items = dict(_contam_items())
    n_clean = len(CONTAM_CLEAN_ITEMS)
    n_bench = len(items)
    assert set(rows) == set(range(n_bench))
    for bid, r in rows.items():
        clinical = bid < n_bench - n_clean
        if clinical and r["n_grams"] > 0:
            assert r["contaminated"] == 1 and r["n_docs_hit"] > 0, (bid, r)
            assert r["n_grams_hit"] == r["n_grams"], (bid, r)  # verbatim
        if not clinical:
            assert r["contaminated"] == 0 and r["n_grams"] > 0, (bid, r)
    assert any(
        r["contaminated"] == 1 for r in rows.values()
    ) and any(r["contaminated"] == 0 for r in rows.values())


def test_dup_spans_nonvacuous_and_sane(spark):
    """The exact-substring duplication signal (Lee et al. 2022 measure)
    must actually discriminate on the fixed corpus: shared clinical
    preludes guarantee cross-doc duplicate windows, word-soup bodies
    guarantee unique ones — so dup_frac must span both regimes and BOTH
    keep verdicts must occur (a one-sided gate would be green-but-vacuous).
    Also pins the bounds invariants n_dup <= n_windows, frac in [0, 1]."""
    from htep_spark.driver_queries import q_dup_spans

    rows = q_dup_spans(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 500
    assert any(r["n_dup_windows"] > 0 for r in rows), "no duplicate windows"
    assert any(r["dup_frac"] < 0.2 for r in rows), "no mostly-unique docs"
    keeps = {r["keep"] for r in rows}
    assert keeps == {0, 1}, f"keep gate one-sided: {keeps}"
    for r in rows:
        assert 0 <= r["n_dup_windows"] <= r["n_windows"]
        assert 0.0 <= r["dup_frac"] <= 1.0


def test_bpe_encode_matches_pure_python(spark):
    """Tokenizer application: bpe_encode_col must apply a learned merge
    table with exactly the pure-Python leftmost non-overlapping semantics
    (the same apply loop as the trainer differential), including chained
    merges where a later rule consumes an earlier rule's output symbol."""
    from pyspark.sql import functions as F

    from htep_spark.operators.bpe import bpe_encode_col, bpe_train

    corpus = (
        ["low"] * 5 + ["lower"] * 2 + ["newest"] * 6 + ["widest"] * 3
        + ["aaa"] * 4
    )
    words = spark.createDataFrame([(w,) for w in corpus], ["word"])
    merges = bpe_train(words, "word", k=6)

    def py_apply(w):
        s = list(w)
        for a, b, _ in merges:
            ns, i = [], 0
            while i < len(s):
                if i + 1 < len(s) and s[i] == a and s[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(s[i])
                    i += 1
            s = ns
        return s

    uniq = sorted(set(corpus))
    uw = spark.createDataFrame([(w,) for w in uniq], ["word"])
    got = {
        r["word"]: list(r["s"])
        for r in uw.select(
            "word", bpe_encode_col(F.col("word"), merges).alias("s")
        ).collect()
    }
    for w in uniq:
        assert got[w] == py_apply(w), (w, got[w], py_apply(w))
    # merges actually compress: at least one word shrinks below char count
    assert any(len(got[w]) < len(w) for w in uniq)


def test_sample_hash_is_stratified_and_deterministic(spark):
    from htep_spark.driver_queries import q_sample_hash

    sf = "/root/testdata/sf0.001"
    rows = q_sample_hash(spark, sf).collect()
    assert rows, "sampler kept nothing"
    rates = {r["rate_permyriad"] for r in rows}
    assert len(rates) >= 2, "only one stratum fired"
    assert all(r["bucket"] < r["rate_permyriad"] for r in rows)
    again = q_sample_hash(spark, sf).collect()
    assert sorted(map(str, rows)) == sorted(map(str, again))


def test_audio_features_spectral(spark):
    """Real DSP check: a pure sine's spectral centroid lands on its
    frequency; features match a direct numpy computation on the known
    synthetic samples; non-WAV audio rows carry the error column."""
    import numpy as np

    from htep_spark.functions import codecs
    from htep_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        _audio_spectral,
        audio_features,
        make_media_table,
    )

    # audio sits at i % 3 == 1 → every synthetic tone is 440·(1+1) = 880 Hz
    media = make_media_table(spark, n=9)
    rows = {r["media_id"]: r for r in audio_features(media).collect()}
    assert set(rows) == {"m-0001", "m-0004", "m-0007"}
    for mid, r in rows.items():
        assert r["error"] is None and r["sample_rate"] == 16000
        # pure tone → centroid within a few Hz of the fundamental
        assert abs(r["spectral_centroid_hz"] - 880.0) < 20.0, (
            mid, r["spectral_centroid_hz"],
        )
        assert abs(r["spectral_rolloff_hz"] - 880.0) < 20.0
        assert 0.4 < r["rms"] * np.sqrt(2) * 32768.0 / 12000.0 < 1.1
    # differential vs direct computation on the exact synthetic signal
    t = np.arange(8000 + (7 % 3) * 4000)
    samples = (np.sin(2 * np.pi * 880.0 * t / 16000.0) * 12000).astype(np.int16)
    want = _audio_spectral(samples, 16000)
    got = rows["m-0007"]
    for k, v in want.items():
        assert got[k] == v, (k, got[k], v)
    # non-WAV audio payload errors per item
    bad = spark.createDataFrame(
        [("m-bad", "audio", bytearray(b"mp3-ish-bytes"), "audio/mpeg")],
        MEDIA_SCHEMA,
    )
    brow = audio_features(bad).collect()[0]
    assert brow["rms"] is None and "NotImplementedError" in brow["error"]
    # decode_wav sanity: codec round-trips the samples the test recomputes
    assert np.array_equal(
        codecs.decode_wav(codecs.encode_wav(samples, rate=16000))[0][:, 0],
        samples,
    )


def test_connected_components_long_chain(spark):
    """A 60-node chain must converge (pointer jumping: O(log n) rounds)."""
    from htep_spark.operators.dedup import connected_components

    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(59)], ["doc_a", "doc_b"]
    )
    comps = {
        r["doc_id"]: r["cluster_id"]
        for r in connected_components(pairs, max_iterations=10).collect()
    }
    assert len(comps) == 60
    assert set(comps.values()) == {0}


def test_asof_join_semantics(spark):
    """asof_join: most recent right row with r.ts <= l.ts per key —
    inclusive ties, null when no prior, tolerance nulls stale matches."""
    from datetime import datetime

    from htep_spark.operators.joins import asof_join

    T = datetime
    left = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 0, 0), "L1"),
            (1, T(2024, 1, 1, 12, 0, 0), "L2"),
            (2, T(2024, 1, 1, 9, 0, 0), "L3"),   # before any right row
            (3, T(2024, 1, 1, 10, 0, 0), "L4"),  # exact-tie with right
        ],
        ["user_id", "ts", "lbl"],
    )
    right = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 9, 30, 0), 100),
            (1, T(2024, 1, 1, 11, 0, 0), 101),
            (2, T(2024, 1, 1, 9, 30, 0), 102),
            (3, T(2024, 1, 1, 10, 0, 0), 103),
        ],
        ["user_id", "ts", "rid"],
    )
    out = {r["lbl"]: r for r in asof_join(left, right).collect()}
    assert out["L1"]["rid_r"] == 100
    assert out["L2"]["rid_r"] == 101
    assert out["L3"]["rid_r"] is None and out["L3"]["ts_r"] is None
    assert out["L4"]["rid_r"] == 103  # inclusive tie
    # tolerance: L2's match is 1h old -> kept at 3600s, nulled at 1800s
    tight = {
        r["lbl"]: r
        for r in asof_join(left, right, tolerance_sec=1800).collect()
    }
    assert tight["L1"]["rid_r"] == 100  # 30 min old
    assert tight["L2"]["rid_r"] is None
    assert tight["L4"]["rid_r"] == 103  # 0 s old
    # suffixed-name collision must raise, not silently duplicate (ADVICE r03)
    import pytest

    with pytest.raises(ValueError, match="collide"):
        asof_join(left.withColumnRenamed("lbl", "rid_r"), right)


def test_range_join_semantics(spark):
    """range_join: containment (closed interval) per key via bucket
    expansion — including intervals spanning many buckets and points
    outside any interval."""
    from datetime import datetime

    from htep_spark.operators.joins import range_join

    T = datetime
    points = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 30), "P1"),   # inside I1
            (1, T(2024, 1, 1, 13, 0), "P2"),    # inside multi-bucket I2
            (1, T(2024, 1, 1, 23, 0), "P3"),    # in no interval
            (2, T(2024, 1, 1, 10, 30), "P4"),   # other key, no interval
            (1, T(2024, 1, 1, 10, 0), "P5"),    # exactly at I1 start
            (1, T(2024, 1, 1, 11, 0), "P6"),    # exactly at I1 end
        ],
        ["user_id", "ts", "lbl"],
    )
    intervals = spark.createDataFrame(
        [
            (1, T(2024, 1, 1, 10, 0), T(2024, 1, 1, 11, 0), "I1"),
            (1, T(2024, 1, 1, 12, 0), T(2024, 1, 1, 18, 0), "I2"),  # 6h span
        ],
        ["user_id", "s", "e", "iv"],
    )
    out = {
        (r["lbl"], r["iv"])
        for r in range_join(
            points, intervals, point_col="ts", start_col="s", end_col="e",
            by=("user_id",), bucket_sec=3600,
        ).collect()
    }
    assert out == {("P1", "I1"), ("P2", "I2"), ("P5", "I1"), ("P6", "I1")}


def test_jpeg_decoder_rejects_corrupt_input():
    """Decoder robustness: corrupt/truncated payloads raise clean Python
    exceptions (never hang, never return garbage silently); the multimodal
    operator surfaces them in the error column."""
    import numpy as np
    import pytest

    from htep_spark.functions.jpeg import decode_jpeg, encode_jpeg
    from htep_spark.operators.multimodal import _synth_image

    good = encode_jpeg(_synth_image(1), quant=1)
    rng = np.random.default_rng(7)
    # not a JPEG at all
    with pytest.raises(Exception):
        decode_jpeg(b"definitely not a jpeg payload")
    # truncations at varied points
    for cut in (2, 20, len(good) // 2, len(good) - 3):
        with pytest.raises(Exception):
            decode_jpeg(good[:cut])
    # random byte corruption in the entropy segment (post-headers): must
    # either decode to a same-shape image or raise — never hang/crash hard
    for _ in range(20):
        b = bytearray(good)
        idx = int(rng.integers(len(good) // 2, len(good) - 4))
        b[idx] = int(rng.integers(0, 256))
        try:
            out = decode_jpeg(bytes(b))
            assert out.shape == (32, 48, 3)
        except Exception:
            pass  # clean rejection is acceptable
    # flipping a baseline stream's marker to SOF2 yields an invalid
    # progressive scan script — rejected cleanly
    prog = bytearray(good)
    sof = prog.find(b"\xff\xc0")
    prog[sof + 1] = 0xC2
    with pytest.raises(ValueError):
        decode_jpeg(bytes(prog))


def test_jpeg_progressive_matches_baseline():
    """Spectral-selection progressive streams decode to EXACTLY the pixels
    of the baseline encoding of the same image at the same quant (identical
    coefficient pipeline) — across subsampling modes, grayscale, odd
    dimensions, and an all-flat image that exercises EOB-run coding."""
    import numpy as np

    from htep_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from htep_spark.operators.multimodal import _synth_image

    src = _synth_image(4)
    for sub in ("444", "420"):
        for q in (1, 4):
            prog = decode_jpeg(encode_jpeg_progressive(src, quant=q, subsampling=sub))
            base = decode_jpeg(encode_jpeg(src, quant=q, subsampling=sub))
            assert np.array_equal(prog, base), (sub, q)
    flat = np.full((40, 56, 3), 130, np.uint8)  # all-zero AC bands -> EOBRUN
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(flat, quant=2)),
        decode_jpeg(encode_jpeg(flat, quant=2)),
    )
    gray = src[:29, :45, 0]
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(gray, quant=1)),
        decode_jpeg(encode_jpeg(gray, quant=1)),
    )
    # determinism
    assert encode_jpeg_progressive(src) == encode_jpeg_progressive(src)


def test_jpeg_successive_approximation_matches_baseline():
    """Successive-approximation progressive streams (Ah>0 DC and AC
    refinement scans with correction-bit coding, T.81 G.1.2.3 — the shape
    libjpeg's default progressive scan scripts use) decode to EXACTLY the
    baseline pixels, across refinement depths, subsampling, grayscale,
    odd dimensions, and random content (VERDICT r03 #2)."""
    import numpy as np

    from htep_spark.functions.jpeg import (
        decode_jpeg,
        encode_jpeg,
        encode_jpeg_progressive,
    )
    from htep_spark.operators.multimodal import _synth_image

    rng = np.random.default_rng(11)
    cases = [
        (_synth_image(4), "444", 2),
        (_synth_image(5), "420", 2),
        (rng.integers(0, 256, (33, 47, 3), dtype=np.uint8), "420", 1),
        (rng.integers(0, 256, (24, 40, 3), dtype=np.uint8), "444", 4),
    ]
    for img, sub, q in cases:
        base = decode_jpeg(encode_jpeg(img, quant=q, subsampling=sub))
        for levels in (1, 2, 3):
            prog = decode_jpeg(
                encode_jpeg_progressive(
                    img, quant=q, subsampling=sub, levels=levels
                )
            )
            assert np.array_equal(prog, base), (sub, q, levels)
    # grayscale + flat image (all-EOB refinement scans: correction bits only)
    gray = _synth_image(6)[:29, :45, 0]
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(gray, quant=1, levels=2)),
        decode_jpeg(encode_jpeg(gray, quant=1)),
    )
    flat = np.full((40, 56, 3), 130, np.uint8)
    assert np.array_equal(
        decode_jpeg(encode_jpeg_progressive(flat, quant=2, levels=2)),
        decode_jpeg(encode_jpeg(flat, quant=2)),
    )
    # determinism of the SA stream
    assert encode_jpeg_progressive(cases[0][0], levels=2) == (
        encode_jpeg_progressive(cases[0][0], levels=2)
    )


def test_jpeg_advice_r03_edge_cases():
    """ADVICE r03 lows: (a) quant=1 full-amplitude checkerboard produces
    AC magnitude 1024 — must clamp to the T.81 +/-1023 range, not
    KeyError; (b) a baseline stream whose scans cover component subsets
    must never silently return a Y-only image — single-component
    sequential scans now DECODE (multiscan accumulation), and the exotic
    strict-subset multi-component scan raises."""
    import numpy as np
    import pytest

    from htep_spark.functions.jpeg import decode_jpeg, encode_jpeg

    # full-amplitude alternating pattern maximizes one AC coefficient
    xs = np.indices((16, 16)).sum(axis=0) % 2
    checker = (xs * 255).astype(np.uint8)
    payload = encode_jpeg(checker, quant=1)  # used to KeyError (cat 11)
    out = decode_jpeg(payload)
    assert out.shape == (16, 16, 1)
    # non-interleaved baseline (one full scan per component) decodes
    # pixel-identically to the interleaved encoding of the same image
    rng = np.random.default_rng(13)
    for shape, sub in [((32, 48, 3), "444"), ((33, 47, 3), "420")]:
        img = rng.integers(0, 256, shape, dtype=np.uint8)
        inter = decode_jpeg(encode_jpeg(img, quant=2, subsampling=sub))
        multi = decode_jpeg(
            encode_jpeg(img, quant=2, subsampling=sub, interleaved=False)
        )
        assert np.array_equal(inter, multi), (shape, sub)
    # a strict-subset MULTI-component scan (2 of 3) is the one remaining
    # unsupported layout — hand-craft its SOS header and expect a raise
    good = bytearray(
        encode_jpeg(np.zeros((16, 16, 3), np.uint8), quant=2, interleaved=False)
    )
    sos = good.find(b"\xff\xda")
    assert sos > 0
    partial = (
        bytes(good[:sos])
        + b"\xff\xda" + (10).to_bytes(2, "big")
        + bytes([2, 1, 0, 2, 0x11])
        + b"\x00\x3f\x00"
        + bytes(good[sos + 10 :])
    )
    with pytest.raises(NotImplementedError, match="subset"):
        decode_jpeg(partial)
    # restart markers are an interleaved-only writer feature
    with pytest.raises(ValueError, match="interleaved"):
        encode_jpeg(
            np.zeros((16, 16, 3), np.uint8), restart_interval=2, interleaved=False
        )
    # T.81 B.1.1.2 fill bytes before a between-scan marker, and a DQT
    # segment arriving between scans, must both decode (review r04 finds)
    import struct

    b = encode_jpeg(
        rng.integers(0, 256, (16, 24, 3), np.uint8), quant=2, interleaved=False
    )
    pos = b.find(b"\xff\xda", b.find(b"\xff\xda") + 2)
    assert pos > 0
    with_fill = b[:pos] + b"\xff" + b[pos:]
    assert np.array_equal(decode_jpeg(with_fill), decode_jpeg(b))
    dqt = b"\xff\xdb" + struct.pack(">H", 67) + bytes([1]) + bytes([2] * 64)
    with_dqt = b[:pos] + dqt + b[pos:]
    assert np.array_equal(decode_jpeg(with_dqt), decode_jpeg(b))


def test_exact_global_rank_semantics(spark):
    """exact_global_rank equals a driver-side sorted enumeration — exact,
    deterministic, 1-based, with explicit tie-breaks — at any partition
    count, including n_partitions larger than the row count."""
    from htep_spark.operators.ranking import exact_global_rank

    rows = [(i, float((i * 37) % 11)) for i in range(200)]
    df = spark.createDataFrame(rows, "id long, score double")
    want = {
        rid: rank + 1
        for rank, (rid, _s) in enumerate(
            sorted(rows, key=lambda r: (r[1], r[0]))
        )
    }
    for n_parts in (1, 4, 64, 300):
        got = {
            r["id"]: r["global_rank"]
            for r in exact_global_rank(
                df, "score", tie_cols=("id",), n_partitions=n_parts
            ).collect()
        }
        assert got == want, n_parts
    out = exact_global_rank(df, "score", tie_cols=("id",)).collect()
    assert all(r["global_count"] == 200 for r in out)


def test_stream_windowed_count_min(spark, tmp_path):
    """Streaming per-window Count-Min: the emitted (window, row, col, cnt)
    counters must equal a batch replay of the same md5 cell positions over
    the same data, window by window — i.e. the streaming sketch is exactly
    the batch `count_min` counter table computed per tumbling window. Every
    emitted counter must also satisfy the CM guarantee (cnt >= any single
    token's true in-window count hashing there)."""
    import datetime as dt
    import hashlib

    import pandas as pd

    from htep_spark.driver_queries import CM_D, CM_W
    from htep_spark.streaming.stream import stream_windowed_count_min

    def cm_pos(token, j):
        h = int(
            hashlib.md5(f"{token}|cm{j}".encode()).hexdigest()[:15], 16
        )
        return h % CM_W

    base = dt.datetime(2024, 5, 1)
    rows = []
    for i in range(600):
        tok = f"tok{i % 17:02d}"
        # three 10-minute windows, one event per second
        rows.append((tok, base + dt.timedelta(seconds=i * 3)))
    pdf = pd.DataFrame(rows, columns=["token", "ts"])
    src = str(tmp_path / "cm_src")
    spark.createDataFrame(pdf, "token string, ts timestamp").write.parquet(src)
    stream = spark.readStream.schema("token string, ts timestamp").parquet(src)
    out = stream_windowed_count_min(
        stream, window_duration="10 minutes", watermark="0 seconds"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("cm_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        (r["window_start"], r["row"], r["col"]): r["cnt"]
        for r in spark.sql("select * from cm_stream").collect()
    }
    assert got, "no counters emitted"
    # batch replay: same cells per window
    want: dict = {}
    win = dt.timedelta(minutes=10)
    for tok, ts in rows:
        wstart = base + ((ts - base) // win) * win
        for j in range(CM_D):
            k = (wstart, j, cm_pos(tok, j))
            want[k] = want.get(k, 0) + 1
    emitted_windows = {k[0] for k in got}
    assert len(emitted_windows) >= 2  # last window may await the watermark
    for k, cnt in got.items():
        assert want.get(k) == cnt, (k, cnt, want.get(k))
    # all counters of an emitted window are present (the full d x w slice
    # that has any mass) -> per-window point estimates are computable
    for k, cnt in want.items():
        if k[0] in emitted_windows:
            assert got.get(k) == cnt, (k, cnt)
    # CM guarantee inside each emitted window: estimate >= true count
    truth: dict = {}
    for tok, ts in rows:
        wstart = base + ((ts - base) // win) * win
        truth[(wstart, tok)] = truth.get((wstart, tok), 0) + 1
    for (wstart, tok), true_cnt in truth.items():
        if wstart in emitted_windows:
            est = min(
                got[(wstart, j, cm_pos(tok, j))] for j in range(CM_D)
            )
            assert est >= true_cnt


def test_stream_windowed_qdigest(spark, tmp_path):
    """Streaming q-digest: the per-window histogram emitted by the stream,
    fed through the SHARED deterministic compaction, must produce exactly
    the digest and quantile estimates a batch q-digest computes over the
    same window's values — the feed/finalize split is lossless."""
    import datetime as dt

    import pandas as pd

    from htep_spark.operators.qdigest import (
        QDIGEST_D,
        exact_quantile,
        qdigest_compact,
        qdigest_rank_query,
    )
    from htep_spark.streaming.stream import stream_windowed_qdigest_histogram

    base = dt.datetime(2024, 6, 1)
    rows = []
    for i in range(900):
        # three 10-minute windows, skewed values
        rows.append(((i * 37) % 256 + (i % 3) * 100, base + dt.timedelta(seconds=i * 2)))
    pdf = pd.DataFrame(rows, columns=["value", "ts"])
    src = str(tmp_path / "qd_src")
    spark.createDataFrame(pdf, "value long, ts timestamp").write.parquet(src)
    stream = spark.readStream.schema("value long, ts timestamp").parquet(src)
    out = stream_windowed_qdigest_histogram(
        stream, window_duration="10 minutes", watermark="0 seconds"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("qd_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = spark.sql("select * from qd_stream").collect()
    assert got, "no histogram rows emitted"
    wins: dict = {}
    for r in got:
        wins.setdefault(r["window_start"], {})[r["v"]] = r["cnt"]
    assert len(wins) >= 2
    win = dt.timedelta(minutes=10)
    for wstart, hist in wins.items():
        # batch replay of the same window
        want: dict = {}
        for v, ts in rows:
            if base + ((ts - base) // win) * win == wstart:
                want[v] = want.get(v, 0) + 1
        assert hist == want, wstart
        n = sum(hist.values())
        sigma = n // 64
        digest = qdigest_compact(hist, QDIGEST_D, sigma)
        assert sum(c for _, _, c in digest) == n
        r_mid = (n + 1) // 2
        est = min(qdigest_rank_query(digest, r_mid), max(hist))
        exact = exact_quantile(hist, r_mid)
        # the digest answers within the proven rank bound for the median
        cum = sum(c for v, c in hist.items() if v <= est)
        assert abs(cum - r_mid) <= QDIGEST_D * sigma + max(hist.values())
        assert est >= exact  # q-digest answers never under-shoot the rank


def test_stream_windowed_topk(spark, tmp_path):
    """Per-window distributed SpaceSaving with event-time-timeout close:
    each (window, shard) summary is emitted exactly once when the
    watermark passes the window end. Exact regime (capacity >= per-shard
    in-window vocabulary): emitted counts equal the batch per-window
    counts, err 0, and `merge_windowed_topk` equals the true per-window
    top-k (counts AND order). Tight regime: per-(window, shard) bounds
    hold (true <= est <= true + err; frequent-in-shard tokens present).
    The final window stays open (watermark never passes its end)."""
    import datetime as dt

    import pandas as pd

    from htep_spark.streaming.stream import (
        merge_windowed_topk,
        stream_windowed_topk,
    )

    # three 10-minute windows of a Zipf-ish stream whose head token
    # DIFFERS per window (tok00/tok01/tok02) so per-window ranking is
    # actually window-dependent
    base = dt.datetime(2024, 7, 1)
    rows = []
    for w in range(3):
        for i in range(20):
            tok = f"tok{(i + w) % 20:02d}"
            for j in range(120 // (i + 1)):
                rows.append(
                    (tok, base + dt.timedelta(minutes=10 * w, seconds=len(rows) % 500))
                )
    pdf = pd.DataFrame(rows, columns=["token", "ts"])
    win = dt.timedelta(minutes=10)
    pdf["win_start"] = pdf["ts"].apply(lambda t: base + ((t - base) // win) * win)
    truth = (
        pdf.groupby(["win_start", "token"]).size().to_dict()
    )  # (window_start, token) -> true in-window count
    src = str(tmp_path / "wtopk_src")
    spark.createDataFrame(
        pdf[["token", "ts"]], "token string, ts timestamp"
    ).write.parquet(src)

    def run(capacity, name):
        stream = spark.readStream.schema("token string, ts timestamp").parquet(src)
        out = stream_windowed_topk(
            stream,
            window_duration="10 minutes",
            watermark="0 seconds",
            capacity=capacity,
            n_shards=4,
        )
        assert out.isStreaming
        q = (
            out.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        return spark.table(name).collect()

    exact = run(capacity=64, name="wtopk_exact")
    assert exact, "no windows closed"
    emitted = {r["window_start"] for r in exact}
    # watermark = max event time -> the last window's end is never passed
    assert emitted == {base, base + win}, emitted
    got = {(r["window_start"], r["token"]): r for r in exact}
    assert len(got) == len(exact), "duplicate (window, token) emission"
    for (ws, tok), r in got.items():
        assert r["est_count"] == truth[(ws, tok)], (ws, tok)
        assert r["max_err"] == 0
        assert r["window_end"] == ws + win
    for (ws, tok), cnt in truth.items():
        if ws in emitted:
            assert (ws, tok) in got, (ws, tok, cnt)

    # finalize: per-window global top-5 equals the true per-window top-5
    topk = merge_windowed_topk(spark.table("wtopk_exact"), k=5).collect()
    for ws in emitted:
        want = sorted(
            ((t, c) for (w, t), c in truth.items() if w == ws),
            key=lambda kv: (-kv[1], kv[0]),
        )[:5]
        rs = sorted(
            (r for r in topk if r["window_start"] == ws), key=lambda r: r["rank"]
        )
        assert [(r["token"], r["est_count"]) for r in rs] == want
        assert [r["rank"] for r in rs] == [1, 2, 3, 4, 5]
    # the two emitted windows rank DIFFERENT heads (window-dependence)
    heads = {
        r["window_start"]: r["token"] for r in topk if r["rank"] == 1
    }
    assert len(set(heads.values())) == 2, heads

    # tight regime: capacity 6 < 20-token vocabulary
    tight = run(capacity=6, name="wtopk_tight")
    shard_of = {}
    for r in spark.sql(
        "select distinct token, pmod(xxhash64(token), 4) as shard from wtopk_exact"
    ).collect():
        shard_of[r["token"]] = r["shard"]
    by_ws_shard: dict = {}
    for r in tight:
        assert r["window_start"] in emitted  # same close rule
        by_ws_shard.setdefault((r["window_start"], r["shard"]), []).append(r)
    for (ws, shard), rs in by_ws_shard.items():
        assert len(rs) <= 6
        shard_len = sum(
            c for (w, t), c in truth.items() if w == ws and shard_of[t] == shard
        )
        present = {r["token"] for r in rs}
        for r in rs:
            true = truth.get((ws, r["token"]), 0)
            assert true <= r["est_count"] <= true + r["max_err"], r
        for (w, t), c in truth.items():
            if w == ws and shard_of[t] == shard and c > shard_len / 6:
                assert t in present, (t, c, shard_len)


def test_stream_windowed_jsd(spark, tmp_path):
    """Streaming windowed JSD: the per-window histograms emitted by the
    stream, finalized with merge_windowed_jsd against a fixed reference,
    must equal a pure-Python JSD computed over the same windows — and the
    planted drift must show: window A is sampled ref-like (low JSD),
    window B is skewed toward one token (high JSD). Zero-count support
    terms (p = 0) and the OTHER bucket must both be exercised."""
    import datetime as dt
    import math

    import pandas as pd

    from htep_spark.streaming.stream import (
        JSD_STREAM_OTHER,
        merge_windowed_jsd,
        stream_windowed_jsd,
    )

    support = ["alpha", "beta", "gamma", "delta"]
    ref_counts = {"alpha": 40, "beta": 30, "gamma": 20, "delta": 10,
                  JSD_STREAM_OTHER: 20}
    base = dt.datetime(2024, 7, 1)
    rows = []
    # window A (minute 0-10): ref-like mix incl. out-of-support tokens
    mix_a = (["alpha"] * 4 + ["beta"] * 3 + ["gamma"] * 2 + ["delta"]
             + ["misc1", "misc2"])
    for i in range(240):
        rows.append((mix_a[i % len(mix_a)], base + dt.timedelta(seconds=i * 2)))
    # window B (minute 10-20): heavy alpha skew, delta never occurs (p=0)
    mix_b = ["alpha"] * 9 + ["beta"]
    for i in range(240):
        rows.append(
            (mix_b[i % len(mix_b)],
             base + dt.timedelta(minutes=10, seconds=i * 2))
        )
    # window C exists only to push the watermark past A and B
    for i in range(30):
        rows.append(("alpha", base + dt.timedelta(minutes=25, seconds=i)))
    pdf = pd.DataFrame(rows, columns=["token", "ts"])
    src = str(tmp_path / "jsd_src")
    spark.createDataFrame(pdf, "token string, ts timestamp").write.parquet(src)
    stream = spark.readStream.schema("token string, ts timestamp").parquet(src)
    out = stream_windowed_jsd(
        stream, support, window_duration="10 minutes", watermark="0 seconds"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("jsd_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    sink = spark.sql("select * from jsd_stream")
    got = {
        (r["window_start"], r["window_end"]): dict()
        for r in sink.collect()
    }
    for r in sink.collect():
        got[(r["window_start"], r["window_end"])][r["term"]] = r["cnt"]
    assert len(got) >= 2, "windows A and B must have closed"
    fin = {
        (r["window_start"]): r
        for r in merge_windowed_jsd(sink, ref_counts).collect()
    }
    qtot = sum(ref_counts.values())
    win = dt.timedelta(minutes=10)
    truth: dict = {}
    for tok, ts in rows:
        wstart = base + ((ts - base) // win) * win
        term = tok if tok in support else JSD_STREAM_OTHER
        truth.setdefault(wstart, {})
        truth[wstart][term] = truth[wstart].get(term, 0) + 1
    for (ws, _we), counts in got.items():
        assert counts == truth[ws], (ws, counts, truth[ws])
        wtot = sum(counts.values())
        klp = klq = 0.0
        for term in sorted(ref_counts):
            c = counts.get(term, 0)
            p, qq = c / wtot, ref_counts[term] / qtot
            m = (p + qq) / 2.0
            if c > 0:
                klp += p * math.log(p / m)
            if qq > 0:
                klq += qq * math.log(qq / m)
        jsd = (klp + klq) / 2.0
        r = fin[ws]
        assert r["jsd"] == round(jsd, 6), (ws, r["jsd"], jsd)
        assert r["n_tokens"] == wtot
        assert r["n_present"] == sum(1 for t in ref_counts if counts.get(t, 0) > 0)
    wa, wb = base, base + dt.timedelta(minutes=10)
    assert wa in fin and wb in fin
    # planted drift: the skewed window diverges far more than the ref-like
    assert fin[wb]["jsd"] > 4 * fin[wa]["jsd"], (fin[wa]["jsd"], fin[wb]["jsd"])
    # branch proofs: OTHER carries mass in A; delta is a p=0 term in B
    assert truth[wa][JSD_STREAM_OTHER] > 0
    assert "delta" not in truth[wb] and fin[wb]["n_present"] < len(ref_counts)


def test_apng_codec_roundtrip():
    """APNG codec: sub-rectangle frames with dispose 0/1/2 and blend 0/1
    composite exactly like a reference simulation; the default image
    keeps the file a valid still PNG for decode_png; sequence-number
    corruption and oversize frames raise ValueError."""
    import numpy as np
    import pytest as _pytest

    from htep_spark.functions import codecs

    rng = np.random.default_rng(11)
    base = rng.integers(0, 256, (16, 20, 4), np.uint8)
    f1 = rng.integers(0, 256, (6, 8, 4), np.uint8)
    f2 = rng.integers(0, 256, (5, 7, 4), np.uint8)
    pay = codecs.encode_apng(
        [base, f1, f2],
        offsets=[(0, 0), (3, 2), (9, 8)],
        dispose_ops=[0, 1, 2],
        blend_ops=[0, 0, 1],
    )
    frames = codecs.decode_png_frames(pay)
    assert len(frames) == 3
    assert np.array_equal(frames[0], base)
    exp1 = base.copy()
    exp1[2:8, 3:11] = f1
    assert np.array_equal(frames[1], exp1)
    # dispose 1 cleared f1's region to zero, then f2 blends OVER with the
    # spec compositing operator (dst alpha respected; over the cleared
    # dst-alpha-0 pixels OVER degenerates to SOURCE — ADVICE r06)
    canvas = base.copy()
    canvas[2:8, 3:11] = 0
    dst = canvas[8:13, 9:16].astype(np.uint32)
    sa = f2[:, :, 3:4].astype(np.uint32)
    da = dst[:, :, 3:4]
    num_a = sa * 255 + da * (255 - sa)
    num_rgb = f2.astype(np.uint32)[:, :, :3] * sa * 255 + dst[:, :, :3] * da * (
        255 - sa
    )
    safe = np.maximum(num_a, 1)
    comp = np.zeros_like(f2)
    comp[:, :, :3] = np.where(num_a > 0, (num_rgb + safe // 2) // safe, 0)
    comp[:, :, 3:4] = (num_a + 127) // 255
    exp2 = canvas.copy()
    exp2[8:13, 9:16] = comp
    assert np.array_equal(frames[2], exp2)
    # still-PNG compatibility: default image == frame 0
    assert np.array_equal(codecs.decode_png(pay), base)
    assert len(codecs.decode_png_frames(codecs.encode_png(base))) == 1
    # corrupt the fcTL sequence number of frame 2 (rebuild chunk CRC)
    import struct as _struct
    import zlib as _zlib

    idx = pay.index(b"fcTL", pay.index(b"fcTL") + 4) - 4
    (ln,) = _struct.unpack(">I", pay[idx : idx + 4])
    body = bytearray(pay[idx + 8 : idx + 8 + ln])
    body[:4] = _struct.pack(">I", 99)
    crc = _zlib.crc32(b"fcTL" + bytes(body)) & 0xFFFFFFFF
    bad = (
        pay[: idx + 8] + bytes(body) + _struct.pack(">I", crc)
        + pay[idx + 8 + ln + 4 :]
    )
    with _pytest.raises(ValueError, match="sequence"):
        codecs.decode_png_frames(bad)
    with _pytest.raises(ValueError, match="exceeds canvas"):
        codecs.encode_apng([base, f1], offsets=[(0, 0), (15, 14)])


def test_apng_through_spark_media_operators(spark):
    """APNG flows through the media operators with the GIF/TIFF
    no-silent-collapse contract: decode_media reports the animation's
    frame count, resize_media resizes every composited frame, and
    sample_frames strides over the composited sequence."""
    import numpy as np

    from htep_spark.functions import codecs
    from htep_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        decode_media,
        resize_media,
        sample_frames,
    )

    rng = np.random.default_rng(31)
    canvas = [rng.integers(0, 256, (10, 12, 3), np.uint8) for _ in range(4)]
    payload = codecs.encode_apng(canvas)
    media = spark.createDataFrame(
        [("m-apng", "image", bytearray(payload), "image/png")], MEDIA_SCHEMA
    )
    meta = decode_media(media).collect()[0]
    assert meta["n_frames"] == 4 and meta["error"] is None
    assert meta["format"] == "png"
    rz = resize_media(media, 24, 20).collect()[0]
    assert rz["error"] is None
    rframes = codecs.decode_png_frames(bytes(rz["payload"]))
    assert len(rframes) == 4
    for got, src in zip(rframes, canvas):
        assert np.array_equal(got, codecs.resize_nearest(src, 24, 20))
    vmedia = spark.createDataFrame(
        [("m-apng", "video", bytearray(payload), "image/png")], MEDIA_SCHEMA
    )
    frames = sample_frames(vmedia, every_n=2, max_frames=3).collect()
    assert sorted(f["frame_idx"] for f in frames) == [0, 2]
    for f in frames:
        got = codecs.decode_ppm(bytes(f["frame_payload"]))
        assert np.array_equal(got, canvas[f["frame_idx"]])
    # a still PNG keeps its single-image behavior end to end
    still = spark.createDataFrame(
        [("m-png", "image", bytearray(codecs.encode_png(canvas[0])),
          "image/png")],
        MEDIA_SCHEMA,
    )
    smeta = decode_media(still).collect()[0]
    assert smeta["n_frames"] == 1 and smeta["error"] is None


def test_ima_adpcm_codec_and_media_flow(spark):
    """IMA ADPCM WAV (format 0x0011): decode(encode(x)) must be
    bit-identical to an independent pure-Python reference simulation of
    the IMA spec reconstruction; SNR on a sine must exceed 20 dB (4-bit
    ADPCM quality bound); PCM WAVs are unaffected; decode_media /
    audio_features accept ADPCM payloads transparently; truncated blocks
    and bad step indices raise ValueError."""
    import struct as _struct

    import numpy as np
    import pytest as _pytest

    from htep_spark.functions import codecs
    from htep_spark.functions.codecs import _IMA_INDEX, _IMA_STEPS
    from htep_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        audio_features,
        decode_media,
    )

    t = np.arange(3000) / 16000.0
    sine = (np.sin(2 * np.pi * 440 * t) * 12000).astype(np.int16)
    pay = codecs.encode_wav_ima(sine, 16000)
    dec, rate = codecs.decode_wav(pay)
    assert rate == 16000 and dec.shape == (3000, 1)
    err = dec[:, 0].astype(float) - sine.astype(float)
    snr = 10 * np.log10(
        (sine.astype(float) ** 2).mean() / (err**2).mean()
    )
    assert snr > 20, snr

    # independent reference simulation, bit-for-bit
    def ref_decode(payload):
        pos = 12
        data = n = ba = None
        while pos + 8 <= len(payload):
            tag = payload[pos : pos + 4]
            (ln,) = _struct.unpack("<I", payload[pos + 4 : pos + 8])
            body = payload[pos + 8 : pos + 8 + ln]
            if tag == b"fmt ":
                ba = _struct.unpack("<H", body[12:14])[0]
            elif tag == b"fact":
                (n,) = _struct.unpack("<I", body[:4])
            elif tag == b"data":
                data = body
            pos += 8 + ln + (ln & 1)
        out = []
        for b0 in range(0, len(data), ba):
            blk = data[b0 : b0 + ba]
            pred, index, _r = _struct.unpack("<hBB", blk[:4])
            out.append(pred)
            for byte in blk[4:]:
                for nib in (byte & 0xF, byte >> 4):
                    step = _IMA_STEPS[index]
                    delta = step >> 3
                    if nib & 4:
                        delta += step
                    if nib & 2:
                        delta += step >> 1
                    if nib & 1:
                        delta += step >> 2
                    pred = pred - delta if nib & 8 else pred + delta
                    pred = max(-32768, min(32767, pred))
                    index = max(0, min(88, index + _IMA_INDEX[nib & 7]))
                    out.append(pred)
        return np.asarray(out[:n], dtype=np.int16)

    assert np.array_equal(ref_decode(pay), dec[:, 0])
    # PCM path untouched
    d2, r2 = codecs.decode_wav(codecs.encode_wav(sine, 16000))
    assert np.array_equal(d2[:, 0], sine) and r2 == 16000
    # media operators accept ADPCM transparently
    media = spark.createDataFrame(
        [("m-adpcm", "audio", bytearray(pay), "audio/wav")], MEDIA_SCHEMA
    )
    meta = decode_media(media).collect()[0]
    assert meta["error"] is None and meta["n_frames"] == 3000
    feats = audio_features(media).collect()[0]
    assert feats["error"] is None
    # the decoded tone's DOMINANT bin is still 440 Hz (the magnitude-
    # weighted centroid itself sits higher — ADPCM's quantization noise
    # floor spreads across the band at ~28 dB SNR, which is expected)
    spec = np.abs(np.fft.rfft(dec[:, 0].astype(float)))
    peak_hz = np.fft.rfftfreq(dec.shape[0], 1 / 16000.0)[int(spec.argmax())]
    assert abs(peak_hz - 440.0) < 10.0, peak_hz
    assert feats["spectral_centroid_hz"] > 0
    # corrupt stream: truncated final block header
    data_at = pay.rindex(b"data")
    bad = pay[: data_at + 8 + 2]
    with _pytest.raises(ValueError):
        codecs.decode_wav(
            b"RIFF" + _struct.pack("<I", len(bad) - 4) + bad[8:]
        ) if False else codecs._ima_decode(bad[data_at + 8 :], 256, 10)
    # bad step index in a block header
    blk = bytearray(16)
    blk[2] = 99
    with _pytest.raises(ValueError, match="out of range"):
        codecs._ima_decode(bytes(blk), 16, 5)
    # stereo input refused (flattening would interleave channels)
    with _pytest.raises(ValueError, match="mono-only"):
        codecs.encode_wav_ima(np.zeros((100, 2), dtype=np.int16))


def test_image_dhash_near_dup(spark):
    """Perceptual image dedup: a PNG master, its JPEG re-encode and a
    +4-brightness variant must land within Hamming 7 of each other and
    group as near-dup pairs via the 8x8-band join; unrelated images must
    NOT pair; the banding is provably candidate-generating (pair count
    from bands == brute-force pairs under the threshold); a corrupt
    payload surfaces as an error row."""
    import numpy as np

    from htep_spark.functions import codecs
    from htep_spark.functions.jpeg import encode_jpeg
    from htep_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        image_dhash,
        media_near_dup,
    )

    rng = np.random.default_rng(41)
    # smooth gradient-rich base (pure noise would be JPEG-fragile)
    yy, xx = np.mgrid[0:32, 0:48]
    base = np.stack(
        [
            (xx * 5 + yy * 2) % 256,
            (xx * 3 + 40) % 256,
            (yy * 6 + 10) % 256,
        ],
        axis=-1,
    ).astype(np.uint8)
    other = rng.integers(0, 256, (32, 48, 3), np.uint8)
    bright = np.clip(base.astype(np.int16) + 4, 0, 255).astype(np.uint8)
    rows = [
        ("png-master", "image", bytearray(codecs.encode_png(base)), "image/png"),
        ("jpeg-copy", "image", bytearray(encode_jpeg(base)), "image/jpeg"),
        ("bright-var", "image", bytearray(codecs.encode_png(bright)), "image/png"),
        ("unrelated", "image", bytearray(codecs.encode_png(other)), "image/png"),
        ("corrupt", "image", bytearray(b"\x89PNG\r\n\x1a\njunk"), "image/png"),
        ("audio-row", "audio", bytearray(b""), "audio/wav"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    hashes = image_dhash(media)
    got = {r["media_id"]: r for r in hashes.collect()}
    assert set(got) == {
        "png-master", "jpeg-copy", "bright-var", "unrelated", "corrupt"
    }
    assert got["corrupt"]["error"] is not None
    assert got["corrupt"]["dhash"] is None
    for mid in ("png-master", "jpeg-copy", "bright-var", "unrelated"):
        assert got[mid]["error"] is None
        assert got[mid]["width"] == 48 and got[mid]["height"] == 32
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in media_near_dup(hashes).collect()
    }
    trio = {"png-master", "jpeg-copy", "bright-var"}
    exp_pairs = {tuple(sorted(p)) for p in
                 [("png-master", "jpeg-copy"), ("png-master", "bright-var"),
                  ("jpeg-copy", "bright-var")]}
    # brute-force check: banding found exactly the <=7-hamming pairs
    import itertools

    vals = {m: got[m]["dhash"] for m in got if got[m]["dhash"] is not None}
    brute = {
        tuple(sorted((a, b))): bin((va ^ vb) & ((1 << 64) - 1)).count("1")
        for (a, va), (b, vb) in itertools.combinations(vals.items(), 2)
        if bin((va ^ vb) & ((1 << 64) - 1)).count("1") <= 7
    }
    assert set(pairs) == set(brute), (pairs, brute)
    assert exp_pairs <= set(pairs), pairs
    for (a, b), d in pairs.items():
        assert {a, b} <= trio, "unrelated image paired"
        assert d == brute[(a, b)]


def test_scene_cuts_rawv_and_apng(spark):
    """Scene-cut detection: planted scene boundaries (big frame jumps)
    are detected exactly — through RAWV and through an APNG animation —
    with within-scene jitter staying below threshold; scene ids are the
    running cut count; a corrupt payload yields one error row."""
    import numpy as np

    from htep_spark.functions import codecs
    from htep_spark.operators.multimodal import (
        MEDIA_SCHEMA,
        scene_cuts,
    )

    rng = np.random.default_rng(51)

    def scene_frames(base_val, n):
        out = []
        for _ in range(n):
            f = np.full((12, 16, 3), base_val, np.uint8)
            jitter = rng.integers(0, 3, (12, 16, 3), np.uint8)
            out.append(np.clip(f.astype(np.int16) + jitter, 0, 255).astype(np.uint8))
        return out

    frames = scene_frames(30, 4) + scene_frames(140, 3) + scene_frames(220, 5)
    exp_cut_idx = {4, 7}
    rows = [
        ("v-rawv", "video", bytearray(codecs.encode_rawv(frames)), "video/raw"),
        ("v-apng", "video", bytearray(codecs.encode_apng(frames)), "image/png"),
        ("v-bad", "video", bytearray(b"RAWVjunk"), "video/raw"),
    ]
    media = spark.createDataFrame(rows, MEDIA_SCHEMA)
    got = scene_cuts(media).collect()
    by_id: dict = {}
    for r in got:
        by_id.setdefault(r["media_id"], []).append(r)
    for mid in ("v-rawv", "v-apng"):
        rs = sorted(by_id[mid], key=lambda r: r["frame_idx"])
        assert len(rs) == len(frames)
        cuts = {r["frame_idx"] for r in rs if r["is_cut"] == 1}
        assert cuts == exp_cut_idx, (mid, cuts)
        # scene id = running cut count; 3 scenes of sizes 4/3/5
        scenes: dict = {}
        for r in rs:
            scenes.setdefault(r["scene_id"], []).append(r["frame_idx"])
        assert {k: len(v) for k, v in scenes.items()} == {0: 4, 1: 3, 2: 5}
        for r in rs:
            if r["frame_idx"] not in exp_cut_idx and r["frame_idx"] > 0:
                assert r["diff"] <= 12.0, r
    bad = by_id["v-bad"]
    assert len(bad) == 1 and bad[0]["error"] is not None


def test_stream_active_users(spark, tmp_path):
    """Streaming windowed distinct actives (`stream_active_users`): the
    chained dropDuplicates -> windowed-count plan must emit, per tumbling
    window, EXACTLY the batch COUNT(DISTINCT user) — verified against a
    brute-force replay over the same synthetic stream (users revisit
    windows, so dedup genuinely fires: raw events >> distinct pairs)."""
    import datetime as dt

    import pandas as pd

    from htep_spark.streaming.stream import stream_active_users

    base = dt.datetime(2024, 5, 1)
    rows = []
    for i in range(600):
        # 7 users cycling over 3 ten-minute windows; heavy revisits
        rows.append((i % 7, base + dt.timedelta(seconds=i * 3)))
    pdf = pd.DataFrame(rows, columns=["user_id", "ts"])
    src = str(tmp_path / "au_src")
    spark.createDataFrame(pdf, "user_id long, ts timestamp").write.parquet(src)
    stream = spark.readStream.schema("user_id long, ts timestamp").parquet(src)
    out = stream_active_users(
        stream, window_duration="10 minutes", watermark="0 seconds"
    )
    assert out.isStreaming
    q = (
        out.writeStream.format("memory")
        .queryName("au_stream")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        r["window_start"]: r["dau"]
        for r in spark.sql("select * from au_stream").collect()
    }
    assert got, "no windows emitted"
    win = dt.timedelta(minutes=10)
    want = {}
    seen = set()
    for u, ts in rows:
        wstart = base + ((ts - base) // win) * win
        if (wstart, u) not in seen:
            seen.add((wstart, u))
            want[wstart] = want.get(wstart, 0) + 1
    # append mode emits a window only once the watermark passes its end —
    # the FINAL window stays open at end-of-stream (the standard
    # availableNow tail, same as the other stream_windowed_* tests)
    assert len(got) >= 2
    assert got == {k: want[k] for k in got}, (got, want)
    missing = set(want) - set(got)
    assert missing <= {max(want)}, missing
    assert sum(want.values()) < len(rows)  # dedup genuinely fired
