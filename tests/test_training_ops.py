"""Training-data operators: dedup family, ANN, text analysis, multimodal
plumbing, distributed connected components."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from robokop_build_ray.stages import ann, dedup, multimodal, text_analysis as ta
from robokop_build_ray.stages.components import connected_components

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs():
    return rd.read_parquet(f"{SF}/documents.parquet").materialize()


@pytest.fixture(scope="module")
def emb():
    return rd.read_parquet(f"{SF}/embeddings.parquet").materialize()


def test_token_stats(docs):
    out = ta.token_stats(docs).take_all()
    raw = {r["doc_id"]: r["text"] for r in docs.take_all()}
    assert len(out) == len(raw)
    for r in out[:50]:
        assert r["n_tokens"] == len(raw[r["doc_id"]].split())
        assert r["n_chars"] == len(raw[r["doc_id"]])


def test_langid_deterministic(docs):
    a = sorted((r["doc_id"], r["pred_lang"]) for r in ta.langid(docs).take_all())
    b = sorted((r["doc_id"], r["pred_lang"]) for r in ta.langid(docs).take_all())
    assert a == b
    assert {l for _, l in a} <= {"en", "de", "es", "fr", "zh"}


def test_exact_dedup_with_planted_duplicates():
    base = [
        {"doc_id": 1, "text": "alpha beta gamma"},
        {"doc_id": 2, "text": "Alpha Beta Gamma"},   # dup after lower()
        {"doc_id": 3, "text": "something else"},
        {"doc_id": 4, "text": "alpha beta gamma "},  # dup after trim
    ]
    ds = rd.from_items(base)
    survivors = sorted(r["doc_id"] for r in dedup.exact_dedup(ds).take_all())
    assert survivors == [1, 3]


def test_dsir_weights_shift_toward_target():
    """Docs made of target-slice-only vocabulary must outweigh docs of
    non-target vocabulary; weights are exact integer sums of per-token
    floor(Q*ln) terms."""
    import math

    from robokop_build_ray.stages import vocab as vb

    rows = [
        {"doc_id": 1, "lang": "en", "text": "apple apple banana"},
        {"doc_id": 2, "lang": "en", "text": "apple banana banana"},
        {"doc_id": 3, "lang": "de", "text": "katze hund katze"},
        {"doc_id": 4, "lang": "de", "text": "hund hund katze"},
    ]
    got = {r["doc_id"]: (r["n_tokens"], r["logratio_q"], r["logratio"])
           for r in vb.dsir_weights(rd.from_items(rows),
                                    n_buckets=4).take_all()}
    # hand recompute: V=4, Nr=12, Nt=6; c_r(apple)=3, c_t(apple)=3 ...
    q = 1_000_000

    def t(cr, ct):
        return math.floor(q * math.log(
            float((ct + 1) * (12 + 4)) / float((cr + 1) * (6 + 4))))

    ta, tb = t(3, 3), t(3, 3)      # apple, banana: all occurrences en
    tk, th = t(3, 0), t(3, 0)      # katze, hund: none en
    assert got[1] == (3, 2 * ta + tb, (2 * ta + tb) / q)
    assert got[3] == (3, 2 * tk + th, (2 * tk + th) / q)
    # en-vocab docs outweigh de-vocab docs
    assert got[1][1] > got[3][1] and got[2][1] > got[4][1]


def test_incremental_dedup_planted():
    # new shard = doc_id % 3 == 0: ids 3, 6, 9, 12
    rows = [
        {"doc_id": 1, "text": "seen before"},        # base
        {"doc_id": 2, "text": "base only"},          # base
        {"doc_id": 3, "text": "Seen Before "},       # new, dup of base 1
        {"doc_id": 6, "text": "brand new"},          # new, unique -> keep
        {"doc_id": 9, "text": "repeated new"},       # new, dup-of-new
        {"doc_id": 12, "text": "repeated NEW"},      # new, dup-of-new
    ]
    got = sorted(r["doc_id"] for r in
                 dedup.incremental_dedup(rd.from_items(rows)).take_all())
    assert got == [6, 9]  # base-dup 3 dropped; keep-first within new


def test_ccnet_buckets_monotone_in_lm_score():
    """Bucket assignment is monotone in the LM score (higher avg_p_ppm
    can never land in a lower bucket) and spans all three tertiles when
    scores are distinct."""
    from robokop_build_ray.stages import vocab as vb

    # doc i mixes a shared prefix "the" with i distinct continuations:
    # more distinct continuations -> lower conditional probs
    rows = [{"doc_id": i,
             "text": " ".join(f"the w{i}c{j % (i + 1)}"
                              for j in range(12))}
            for i in range(6)]
    ds = rd.from_items(rows)
    score = {r["doc_id"]: (r["score_sum"], r["n_bigrams"])
             for r in vb.lm_score(ds, n_buckets=4).take_all()}
    got = {r["doc_id"]: r["bucket"]
           for r in vb.ccnet_buckets(ds, n_buckets=4).take_all()}
    assert len(got) == 6 and set(got.values()) == {1, 2, 3}
    for a in got:
        for b in got:
            sa = score[a][0] / score[a][1]
            sb = score[b][0] / score[b][1]
            if sa > sb:
                assert got[a] >= got[b], (a, b, sa, sb, got)


def test_conversation_dedup_planted():
    """Whole-conversation repost (same turn texts in the same order)
    collapses to the min conv_id; turn ORDER matters (c4 reverses c1's
    turns and must survive separately); both hash modes agree."""
    rows = []
    for cid, texts in [("c1", ["hello", "world"]),
                       ("c2", ["hello", "world"]),   # repost of c1
                       ("c3", ["different", "conv"]),
                       ("c4", ["world", "hello"])]:  # reversed order
        for i, t in enumerate(texts):
            rows.append({"conv_id": cid, "turn_idx": i, "text": t})
    for par in (True, False):
        got = sorted(r["conv_id"] for r in dedup.conversation_dedup(
            rd.from_items(rows), n_buckets=4, parity=par).take_all())
        assert got == ["c1", "c3", "c4"], (par, got)


def test_winnow_pairs_planted_overlap():
    """Docs sharing a long passage pair up with n_shared >= 2 in BOTH
    hash modes; unrelated docs never pair."""
    shared = " ".join(f"common{i}" for i in range(40))
    rows = [
        {"doc_id": 1, "text": shared + " tail one"},
        {"doc_id": 2, "text": "head two " + shared},
        {"doc_id": 3, "text": " ".join(f"other{i}" for i in range(40))},
    ]
    for par in (True, False):
        got = {(r["id_a"], r["id_b"]): r["n_shared"]
               for r in dedup.winnow_pairs(rd.from_items(rows),
                                           parity=par).take_all()}
        assert (1, 2) in got and got[(1, 2)] >= 2, (par, got)
        assert not any(3 in k for k in got)


def test_minhash_lsh_finds_planted_near_dups():
    text_a = " ".join(f"tok{i}" for i in range(100))
    text_b = " ".join(f"tok{i}" for i in range(99)) + " changed"
    rows = [{"doc_id": 1, "text": text_a}, {"doc_id": 2, "text": text_b}] + [
        {"doc_id": 10 + i, "text": " ".join(f"w{i}x{j}" for j in range(50))}
        for i in range(10)
    ]
    pairs = dedup.minhash_lsh_pairs(rd.from_items(rows), threshold=0.5).take_all()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found
    assert all(a == 1 and b == 2 for a, b in found)


def test_ngram_jaccard_exact_values():
    text_a = " ".join(f"tok{i}" for i in range(50))
    text_b = " ".join(f"tok{i}" for i in range(49)) + " zzz"
    rows = [{"doc_id": 1, "text": text_a}, {"doc_id": 2, "text": text_b}]
    pairs = dedup.ngram_jaccard_pairs(rd.from_items(rows), threshold=0.5).take_all()
    assert len(pairs) == 1
    A = set(dedup.shingle_hashes(text_a).tolist())
    B = set(dedup.shingle_hashes(text_b).tolist())
    expect = len(A & B) / len(A | B)
    assert abs(pairs[0]["jaccard"] - expect) < 1e-12


def test_simhash_bit_balance_and_determinism():
    """Unrelated docs must land ~32 bits apart (the uint64 vote-wrap bug
    collapsed every simhash to near-all-ones, hamming ~0); values must be
    process-stable (no randomized hash())."""
    rng = np.random.default_rng(3)
    texts = [" ".join(f"w{v}" for v in rng.integers(0, 5000, size=120))
             for _ in range(2)]
    h = dedup.simhash_values(texts)
    assert h.dtype == np.uint64
    pop = [bin(int(x)).count("1") for x in h]
    assert all(14 <= p <= 50 for p in pop), pop
    ham = bin(int(h[0]) ^ int(h[1])).count("1")
    assert 15 <= ham <= 49, ham
    assert np.array_equal(h, dedup.simhash_values(texts))
    # empty / sub-shingle docs are well-defined
    small = dedup.simhash_values(["", "one two"])
    assert small[0] == 0 and small[1] != 0


def test_pii_redaction_planted():
    """The corpus carries no PII, so the redaction semantics are pinned on
    planted strings here (the driver oracle still hash-checks text
    pass-through equality)."""
    df = pd.DataFrame(
        {"doc_id": [1, 2, 3],
         "text": ["mail me at bob@example.com now",
                  "call +1 (919) 555-0100 ok",
                  "nothing sensitive here"]}
    )
    out = ta.PiiRedactor()(df)
    assert "<EMAIL>" in out["text_redacted"][0]
    assert "bob@" not in out["text_redacted"][0]
    assert "<PHONE>" in out["text_redacted"][1]
    assert "555" not in out["text_redacted"][1]
    assert list(out["n_redactions"]) == [1, 1, 0]
    assert out["text_redacted"][2] == "nothing sensitive here"


def test_bpe_token_stats():
    df = pd.DataFrame({"doc_id": [1], "text": ["I can't do 42 things, really!"]})
    out = ta.bpe_token_stats_batch(df)
    # pieces: I / ' can / 't / ' do / ' 42 / ' things / ',' / ' really / '!'
    assert out["n_bpe_tokens"][0] == 9


def test_rolling_fingerprint_deterministic():
    df = pd.DataFrame({"doc_id": [1, 2],
                       "text": ["alpha beta gamma " * 10, "short text"]})
    # parity mode: md5 hex, byte-verifiable by the DuckDB oracle
    a = ta.rolling_fingerprints_batch(df, parity=True)
    b = ta.rolling_fingerprints_batch(df.copy(), parity=True)
    assert list(a["rolling_fp"]) == list(b["rolling_fp"])
    assert all(len(fp) == 32 for fp in a["rolling_fp"])  # md5 hex
    # default fast mode: vectorized siphash, int64, equally deterministic
    f1 = ta.rolling_fingerprints_batch(df, parity=False)
    f2 = ta.rolling_fingerprints_batch(df.copy(), parity=False)
    assert list(f1["rolling_fp"]) == list(f2["rolling_fp"])
    assert f1["rolling_fp"].dtype == "int64"
    # equal docs agree, distinct docs differ, in both modes
    assert a["rolling_fp"][0] != a["rolling_fp"][1]
    assert f1["rolling_fp"][0] != f1["rolling_fp"][1]


def test_simhash_identical_and_near_docs():
    text = " ".join(f"tok{i}" for i in range(80))
    near = " ".join(f"tok{i}" for i in range(79)) + " other"
    rows = [
        {"doc_id": 1, "text": text},
        {"doc_id": 2, "text": text},
        {"doc_id": 3, "text": near},
        {"doc_id": 4, "text": " ".join(f"z{i}" for i in range(80))},
    ]
    pairs = dedup.simhash_pairs(rd.from_items(rows), max_hamming=3).take_all()
    found = {(r["id_a"], r["id_b"]): r["hamming"] for r in pairs}
    assert found[(1, 2)] == 0
    assert (1, 4) not in found


def test_embedding_cosine_pairs(emb):
    pairs = dedup.embedding_cosine_pairs(emb, threshold=0.99).take_all()
    # verify each reported pair against numpy ground truth
    vecs = {r["vec_id"]: np.asarray(r["embedding"], dtype=np.float64)
            for r in emb.take_all()}
    for r in pairs:
        a, b = vecs[r["id_a"]], vecs[r["id_b"]]
        cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cos >= 0.99 - 1e-9


def test_ann_bruteforce_matches_numpy(emb):
    qref = ann.make_query_ref(emb, n_queries=3)
    got = ann.brute_force_topk(emb, qref, k=5).take_all()
    rows = emb.take_all()
    ids = np.array([r["vec_id"] for r in rows])
    M = np.stack([np.asarray(r["embedding"], dtype=np.float64) for r in rows])
    M = M / np.linalg.norm(M, axis=1, keepdims=True)
    import ray as _ray

    qids, Q = _ray.get(qref)
    Qn = Q / np.linalg.norm(Q, axis=1, keepdims=True)
    S = Qn @ M.T
    for qi, qid in enumerate(qids):
        mask = ids != qid
        order = np.lexsort((ids[mask], -S[qi][mask]))[:5]
        want = ids[mask][order].tolist()
        mine = [r["neighbor_id"] for r in sorted(
            (r for r in got if r["query_id"] == qid), key=lambda r: r["rank"])]
        assert mine == want


def test_ann_ivf_recall(emb):
    qref = ann.make_query_ref(emb, n_queries=3)
    brute = ann.brute_force_topk(emb, qref, k=10).take_all()
    ivf = ann.ivf_topk(emb, qref, k=10, nprobe=2).take_all()
    b = {(r["query_id"], r["neighbor_id"]) for r in brute}
    v = {(r["query_id"], r["neighbor_id"]) for r in ivf}
    recall = len(b & v) / len(b)
    assert recall >= 0.5  # nprobe=2 of 3 labels


def test_ann_lsh_recall_and_self_bucket(emb):
    qref = ann.make_query_ref(emb, n_queries=3)
    brute = ann.brute_force_topk(emb, qref, k=10).take_all()
    lsh = ann.lsh_topk(emb, qref, k=10, n_planes=6, multiprobe=1).take_all()
    b = {(r["query_id"], r["neighbor_id"]) for r in brute}
    v = {(r["query_id"], r["neighbor_id"]) for r in lsh}
    assert len(b & v) / len(b) >= 0.3  # hyperplane LSH, 1-bit multiprobe
    # a query's own bucket is always probed, so near-identical vectors
    # (cosine ~1) must be found
    import ray as _ray

    qids, Q = _ray.get(qref)
    top1 = {r["query_id"]: r["neighbor_id"] for r in lsh if r["rank"] == 1}
    assert set(top1) == set(int(q) for q in qids)


def test_multimodal_plumbing():
    media = rd.from_arrow(multimodal.synthesize_media(30))
    feats = multimodal.decode_features(media).take_all()
    assert len(feats) == 30
    assert all(len(r["feature"]) == multimodal.FEATURE_DIM for r in feats)
    again = multimodal.decode_features(
        rd.from_arrow(multimodal.synthesize_media(30))
    ).take_all()
    assert sorted(r["media_id"] for r in feats) == sorted(
        r["media_id"] for r in again
    )
    a = {r["media_id"]: r["feature"] for r in feats}
    b = {r["media_id"]: r["feature"] for r in again}
    assert a == b  # deterministic stub


def test_multimodal_codecs_roundtrip():
    import numpy as np

    rng = np.random.default_rng(3)
    img = rng.integers(0, 256, size=(11, 17, 3), dtype=np.uint8)
    assert (multimodal.decode_ppm(multimodal.encode_ppm(img)) == img).all()
    samples = rng.integers(-30000, 30000, size=777, dtype=np.int16)
    got, rate = multimodal.decode_wav(multimodal.encode_wav(samples, 8000))
    assert rate == 8000 and (got == samples).all()
    # nearest-neighbor resize: exact corner pixels survive
    thumb = multimodal.resize_nearest(img, 4, 4)
    assert thumb.shape == (4, 4, 3) and (thumb[0, 0] == img[0, 0]).all()


def test_multimodal_real_decode_features():
    import numpy as np

    media = rd.from_arrow(multimodal.synthesize_media(6))
    feats = {r["media_id"]: r for r in
             multimodal.decode_features(media).take_all()}
    # every row decodes for real (id 2 = mp4 video)
    assert feats[0]["decoded"] and feats[1]["decoded"]
    assert feats[2]["decoded"]
    # image feature = (w, h, mean RGB, ...) — check against direct decode
    tbl = multimodal.synthesize_media(6)
    img = multimodal.decode_ppm(tbl["payload"][0].as_py())
    f = feats[0]["feature"]
    assert (f[0], f[1]) == (img.shape[1], img.shape[0])
    assert abs(f[2] - img.reshape(-1, 3).mean(axis=0)[0]) < 1e-3
    # audio feature carries n_samples, rate, RMS > 0
    samples, rate = multimodal.decode_wav(tbl["payload"][1].as_py())
    fa = feats[1]["feature"]
    assert (fa[0], fa[1]) == (len(samples), rate) and fa[2] > 0


def test_multimodal_thumbnails():
    media = rd.from_arrow(multimodal.synthesize_media(12))
    out = {r["media_id"]: r for r in
           multimodal.thumbnails(media, out_w=5, out_h=4).take_all()}
    mimes = {r["media_id"]: r["mime"] for r in media.take_all()}
    decoders = {multimodal.PPM_MIME: multimodal.decode_ppm,
                multimodal.PNG_MIME: multimodal.decode_png,
                multimodal.GIF_MIME: multimodal.decode_gif,
                multimodal.JPEG_MIME: multimodal.decode_jpeg}
    for mid, r in out.items():
        if mid % 3 == 0:  # image rows: re-encoded at thumb size, same codec
            assert r["resized"]
            assert decoders[mimes[mid]](r["payload"]).shape == (4, 5, 3)
        else:  # pass-through untouched
            assert not r["resized"]
    # all four real image codecs appear among the image rows (ids 0,3,6,9)
    assert [mimes[0], mimes[3], mimes[6], mimes[9]] == [
        multimodal.PPM_MIME, multimodal.PNG_MIME, multimodal.GIF_MIME,
        multimodal.JPEG_MIME]


def test_png_roundtrip_all_filters():
    import numpy as np

    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(10, 7, 3), dtype=np.uint8)
    # every row filter type (None/Sub/Up/Average/Paeth) must reconstruct
    for f in range(5):
        got = multimodal.decode_png(multimodal.encode_png(img, [f] * 10))
        assert (got == img).all(), f"filter {f} round-trip failed"
    # mixed per-row filters
    got = multimodal.decode_png(
        multimodal.encode_png(img, [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]))
    assert (got == img).all()
    # corrupt CRC raises (not silently wrong)
    payload = bytearray(multimodal.encode_png(img))
    payload[40] ^= 0xFF
    with pytest.raises(ValueError):
        multimodal.decode_png(bytes(payload))


def test_png_gray_and_rgba_decode():
    import struct
    import zlib

    import numpy as np

    def make_png(arr, ctype):
        h, w = arr.shape[:2]
        ch = 1 if arr.ndim == 2 else arr.shape[2]
        raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))

        def chunk(tag, data):
            return (struct.pack(">I", len(data)) + tag + data
                    + struct.pack(">I", zlib.crc32(tag + data) & 0xFFFFFFFF))

        ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
        return (b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
                + chunk(b"IDAT", zlib.compress(raw)) + chunk(b"IEND", b""))

    rng = np.random.default_rng(5)
    gray = rng.integers(0, 256, size=(6, 9), dtype=np.uint8)
    assert (multimodal.decode_png(make_png(gray, 0)) == gray).all()
    rgba = rng.integers(0, 256, size=(5, 4, 4), dtype=np.uint8)
    assert (multimodal.decode_png(make_png(rgba, 6)) == rgba).all()


def test_gif_roundtrip():
    import numpy as np

    rng = np.random.default_rng(7)
    for (h, w, n) in [(12, 16, 5), (33, 47, 256), (1, 1, 2), (64, 64, 17)]:
        pal = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, size=(h, w), dtype=np.uint8)
        got = multimodal.decode_gif(multimodal.encode_gif(idx, pal))
        assert got.shape == (h, w, 3) and (got == pal[idx]).all(), (h, w, n)
    # structured image: good LZW compressibility + the 12-bit
    # dictionary-overflow CLEAR/reset path
    idx = (np.add.outer(np.arange(200), np.arange(300)) % 256).astype(np.uint8)
    pal = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    payload = multimodal.encode_gif(idx, pal)
    assert len(payload) < idx.size  # actually compresses
    assert (multimodal.decode_gif(payload) == pal[idx]).all()
    # truncated stream raises (not silently wrong)
    with pytest.raises(ValueError):
        multimodal.decode_gif(payload[: len(payload) // 2] + b"\x00\x3B")


def test_gif_interlace_decode():
    import numpy as np

    # reorder rows the way an interlaced GIF writer would, flip the
    # interlace bit, and check the decoder de-scrambles back
    rng = np.random.default_rng(13)
    h, w = 17, 9
    idx = rng.integers(0, 16, size=(h, w), dtype=np.uint8)
    pal = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    order = np.concatenate([np.arange(0, h, 8), np.arange(4, h, 8),
                            np.arange(2, h, 4), np.arange(1, h, 2)])
    body = bytearray(multimodal.encode_gif(idx[order], pal))
    desc = 6 + 7 + 3 * 16  # header + logical screen descriptor + GCT(16)
    assert body[desc] == 0x2C
    body[desc + 9] |= 0x40  # image-descriptor interlace flag
    assert (multimodal.decode_gif(bytes(body)) == pal[idx]).all()


def test_jpeg_roundtrip():
    import numpy as np

    from robokop_build_ray.stages.jpeg import decode_jpeg, encode_jpeg

    rng = np.random.default_rng(5)
    # hand-computed known-answer: solid gray 200 at quality 50. Y block
    # is 72 after level shift -> DC coefficient 8*72 = 576; Annex-K
    # luma QT[0] = 16 and quality-50 scaling is the identity, so the
    # quantized DC is exactly 36 and decode returns 36*16/8 + 128 = 200;
    # chroma of gray is exactly 128 -> DC 0. Round trip must be EXACT.
    solid = np.full((24, 24, 3), 200, dtype=np.uint8)
    assert (decode_jpeg(encode_jpeg(solid, quality=50)) == 200).all()
    assert (decode_jpeg(encode_jpeg(solid, quality=50,
                                    subsample=True)) == 200).all()
    # block-constant image: DC-only blocks survive near-exactly
    tiles = rng.integers(0, 256, size=(3, 4, 3), dtype=np.uint8)
    img = np.repeat(np.repeat(tiles, 8, axis=0), 8, axis=1)
    err = np.abs(decode_jpeg(encode_jpeg(img, quality=95)).astype(int)
                 - img.astype(int))
    assert err.max() <= 6
    # smooth gradient: high PSNR through both sampling layouts
    y, x = np.mgrid[0:40, 0:56]
    img = np.stack([(x * 4) % 256, (y * 5) % 256, ((x + y) * 3) % 256],
                   axis=-1).astype(np.uint8)
    for sub, floor in ((False, 35.0), (True, 28.0)):
        got = decode_jpeg(encode_jpeg(img, quality=90, subsample=sub))
        mse = float(np.mean((got.astype(float) - img.astype(float)) ** 2))
        psnr = 10 * np.log10(255 ** 2 / mse)
        assert psnr > floor, (sub, psnr)
    # odd sizes through the 4:2:0 path (16-padding + crop), determinism,
    # truncation raises
    img = rng.integers(0, 256, size=(19, 21, 3), dtype=np.uint8)
    payload = encode_jpeg(img, quality=90, subsample=True)
    assert decode_jpeg(payload).shape == (19, 21, 3)
    assert payload == encode_jpeg(img, quality=90, subsample=True)
    with pytest.raises(ValueError):
        decode_jpeg(payload[: len(payload) // 2])


def test_mulaw_wav_roundtrip():
    import numpy as np

    x = np.array([0, 1, -1, 33, 1000, -1000, 32635, -32635, 32767, -32768],
                 dtype=np.int16)
    payload = multimodal.encode_wav_mulaw(x, 8000)
    got, rate = multimodal.decode_wav(payload)
    assert rate == 8000 and len(got) == len(x)
    # companding is lossy but value-idempotent and error-bounded
    again, _ = multimodal.decode_wav(multimodal.encode_wav_mulaw(got, 8000))
    assert (again == got).all()
    err = np.abs(got.astype(np.int32) - np.clip(x, -32635, 32635))
    assert err.max() <= 1024  # top-segment step bound
    # mu-law payload is half the PCM16 size (44-byte headers aside)
    assert len(payload) - 44 == (len(multimodal.encode_wav(x, 8000)) - 44) // 2


def test_media_probe_recovers_metadata():
    # the probe re-derives geometry/duration from payload bytes alone;
    # every decodable row must agree with the metadata columns it never
    # reads (the driver oracle's exact check, locally)
    tbl = multimodal.synthesize_media(24)
    meta = {r["media_id"]: r for r in tbl.to_pylist()}
    rows = multimodal.media_probe(rd.from_arrow(tbl)).take_all()
    assert len(rows) == 24
    for r in rows:
        m = meta[r["media_id"]]
        assert r["n_bytes"] == len(m["payload"])
        assert r["decoded"]  # every format decodes for real now
        if m["kind"] in ("image", "video"):
            assert (r["probe_w"], r["probe_h"]) == (m["width"], m["height"])
        else:
            assert (r["probe_w"], r["probe_h"]) == (-1, -1)
        if m["kind"] in ("audio", "video"):
            assert r["probe_dur"] == m["duration_ms"]
        else:
            assert r["probe_dur"] == -1


def test_multimodal_strict_raises():
    # a format with no codec in this module hits the strict guard
    import pyarrow as pa

    unknown = pa.table(
        {
            "media_id": pa.array([0], pa.int64()),
            "kind": pa.array(["video"], pa.string()),
            "payload": pa.array([b"\x1a\x45\xdf\xa3 webm-ish"], pa.binary()),
            "mime": pa.array(["video/webm"], pa.string()),
            "width": pa.array([-1], pa.int32()),
            "height": pa.array([-1], pa.int32()),
            "duration_ms": pa.array([-1], pa.int32()),
            "energy": pa.array([0], pa.int64()),
            "ac_lag1": pa.array([0], pa.int64()),
        },
        schema=multimodal.MEDIA_SCHEMA,
    )
    with pytest.raises(Exception):  # NotImplementedError surfaces as RayTaskError
        multimodal.decode_features(rd.from_arrow(unknown),
                                   strict=True).take_all()
    # non-strict: deterministic fake feature, flagged undecoded
    rows = multimodal.decode_features(rd.from_arrow(unknown)).take_all()
    assert len(rows) == 1 and not rows[0]["decoded"]


def test_connected_components_chain_and_clique():
    edges = [("a", "b"), ("b", "c"), ("x", "y"), ("p", "q"), ("q", "r"),
             ("r", "p")]
    want = {"a": "a", "b": "a", "c": "a", "x": "x", "y": "x",
            "p": "p", "q": "p", "r": "p"}
    ds = rd.from_items([{"a": a, "b": b} for a, b in edges])
    # distributed min-label propagation (local_threshold=0 pins the
    # corpus-scale path) and the local union-find finish must agree
    dist = {r["id"]: r["component"] for r in
            connected_components(ds, num_partitions=2,
                                 local_threshold=0).take_all()}
    local = {r["id"]: r["component"] for r in
             connected_components(ds, num_partitions=2).take_all()}
    assert dist == want
    assert local == want


def test_multimodal_frame_sampling():
    media = rd.from_arrow(multimodal.synthesize_media(30))
    frames = multimodal.sample_frames(media, n_frames=4).take_all()
    vids = {r["media_id"] for r in frames}
    # only video rows explode into frames, 4 each, deterministic
    assert all(mid % 3 == 2 for mid in vids)
    assert len(frames) == len(vids) * 4
    per = {}
    for r in frames:
        per.setdefault(r["media_id"], []).append(r["frame_idx"])
        assert isinstance(r["frame"], bytes) and len(r["frame"]) > 0
    assert all(sorted(v) == [0, 1, 2, 3] for v in per.values())
    # EVERY video row (AVI and mp4 alike) emits REAL frames: each a
    # standalone decodable baseline JPEG of the synthesized geometry
    from robokop_build_ray.stages.jpeg import decode_jpeg

    for r in frames:
        assert r["frame"][:2] == b"\xFF\xD8"
        assert decode_jpeg(r["frame"]).shape == (24, 32, 3)


def test_avi_mjpeg_roundtrip():
    import numpy as np

    rng = np.random.default_rng(9)
    frames = []
    for t in range(6):
        y, x = np.mgrid[0:24, 0:32]
        frames.append(np.stack([(x * 5 + t * 16) % 256, (y * 7) % 256,
                                ((x + y) * 3 + t * 8) % 256],
                               axis=-1).astype(np.uint8))
    avi = multimodal.encode_avi_mjpeg(frames, fps=5)
    got = multimodal.decode_avi_mjpeg(avi)
    assert len(got) == 6
    for f, g in zip(frames, got):
        mse = float(np.mean((g.astype(float) - f.astype(float)) ** 2))
        assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 28
    # deterministic bytes; truncation and wrong-RIFF-kind raise
    assert multimodal.encode_avi_mjpeg(frames, fps=5) == avi
    with pytest.raises(ValueError):
        multimodal.avi_frame_payloads(avi[: len(avi) // 2])
    with pytest.raises(ValueError):
        multimodal.avi_frame_payloads(b"RIFF\x04\x00\x00\x00WAVE")
    # decoder features: real video rows decode with n_frames/w/h + motion
    media = rd.from_arrow(multimodal.synthesize_media(6))
    feats = {r["media_id"]: r for r in
             multimodal.decode_features(media).take_all()}
    assert feats[5]["decoded"]  # id 5 = AVI row
    f = feats[5]["feature"]
    assert (f[0], f[1], f[2]) == (4, 32, 24) and f[5] > 0
    # id 2 = mp4 row: real decode through the ISO-BMFF sample table
    assert feats[2]["decoded"]
    f2 = feats[2]["feature"]
    assert (f2[0], f2[1], f2[2]) == (3 + 2 % 3, 32, 24) and f2[5] > 0


def test_mp4_mjpeg_roundtrip():
    import numpy as np

    frames = []
    for t in range(5):
        y, x = np.mgrid[0:20, 0:28]
        frames.append(np.stack([(x * 9 + t * 31) % 256, (y * 11) % 256,
                                ((x + y) * 5 + t * 13) % 256],
                               axis=-1).astype(np.uint8))
    # single-chunk and multi-chunk stsc/stco layouts must decode alike
    for spc in (0, 2, 3):
        mp4 = multimodal.encode_mp4_mjpeg(frames, fps=5,
                                          samples_per_chunk=spc)
        got = multimodal.decode_mp4_mjpeg(mp4)
        assert len(got) == 5
        for f, g in zip(frames, got):
            mse = float(np.mean((g.astype(float) - f.astype(float)) ** 2))
            assert 10 * np.log10(255 ** 2 / max(mse, 1e-9)) > 28
        # header-only probes: mvhd duration (timescale 1000), tkhd dims
        assert multimodal.mp4_duration_ms(mp4) == 5 * (1000 // 5)
        assert multimodal.mp4_dimensions(mp4) == (28, 20)
    # deterministic bytes; truncation and non-BMFF payloads raise
    assert multimodal.encode_mp4_mjpeg(frames, fps=5) == \
        multimodal.encode_mp4_mjpeg(frames, fps=5)
    with pytest.raises(ValueError):
        multimodal.mp4_frame_payloads(mp4[: len(mp4) // 3])
    with pytest.raises(ValueError):
        multimodal.mp4_frame_payloads(b"RIFF\x04\x00\x00\x00AVI ")
    # mid-file sample-byte corruption: the JPEG layer (not the container)
    # rejects it — find a sample offset and flip its SOI marker
    sample0 = multimodal.mp4_frame_payloads(mp4)[0]
    pos = mp4.index(sample0)
    bad = mp4[:pos] + b"\x00\x00" + mp4[pos + 2:]
    with pytest.raises(Exception):
        multimodal.decode_mp4_mjpeg(bad)


def test_near_dup_clusters_composition():
    base = " ".join(f"tok{i}" for i in range(100))
    rows = [
        {"doc_id": 1, "text": base},
        {"doc_id": 2, "text": base + " x"},
        {"doc_id": 3, "text": base + " y"},
        {"doc_id": 9, "text": " ".join(f"z{i}" for i in range(60))},
    ]
    out = {r["doc_id"]: r["cluster"] for r in
           dedup.near_dup_clusters(rd.from_items(rows), threshold=0.5).take_all()}
    assert out[1] == out[2] == out[3] == 1  # dup group collapses to min id
    assert out[9] == 9                      # singleton keeps its own id


def test_misra_gries_exact_and_bounded():
    from robokop_build_ray.functions.sketches import MisraGries, heavy_hitters

    # exact when capacity >= cardinality
    sk = MisraGries(10)
    sk.add_counts({"a": 5, "b": 3})
    sk2 = MisraGries(10)
    sk2.add_counts({"a": 2, "c": 1})
    sk.merge(sk2)
    assert sk.top(2) == [("a", 7), ("b", 3)]
    # bounded memory under adversarial cardinality
    big = MisraGries(8)
    for i in range(10_000):
        big.add_counts({f"k{i}": 1, "hot": 3})
    assert len(big.counts) <= 8
    assert big.top(1)[0][0] == "hot"  # frequent key survives

    ds = rd.from_items([{"v": "x"}] * 30 + [{"v": "y"}] * 20 + [{"v": "z"}] * 5)
    out = heavy_hitters(ds, "v", k=2, capacity=100).take_all()
    assert [(r["v"], r["n"]) for r in out] == [("x", 30), ("y", 20)]


def test_chunk_spans_batch_hand_values():
    b = pd.DataFrame({"doc_id": [1, 2, 3],
                      "text": ["w " * 130, "w " * 64, ""]})
    out = ta.chunk_spans_batch(b, chunk_tokens=64)
    got = list(zip(out["doc_id"], out["chunk_idx"], out["n_tokens"]))
    # 130 tokens -> 64 + 64 + 2; 64 -> one full chunk; empty doc -> none
    assert got == [(1, 0, 64), (1, 1, 64), (1, 2, 2), (2, 0, 64)]


def test_train_split_deterministic_and_proportional():
    b = pd.DataFrame({"doc_id": range(2000), "lang": ["en"] * 2000})
    a1 = ta.split_batch(b)
    a2 = ta.split_batch(b.sample(frac=1.0, random_state=3).reset_index(
        drop=True)).sort_values("doc_id").reset_index(drop=True)
    # same assignment regardless of row order (pure function of doc_id)
    assert (a1["split"].to_numpy()
            == a2["split"].to_numpy()).all()
    frac = (a1["split"] == "train").mean()
    assert 0.75 < frac < 0.85  # ~0.8 by construction


def test_contamination_check_planted():
    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    rows = [
        {"doc_id": 0, "text": f"intro {span} outro"},        # eval doc
        {"doc_id": 1, "text": f"training doc copies {span} here"},
        {"doc_id": 2, "text": "clean doc with none of those words at all"},
        {"doc_id": 50, "text": "another eval doc nothing shared"},
    ]
    out = dedup.contamination_check(rd.from_items(rows), eval_mod=50,
                                    window=8).take_all()
    got = {r["doc_id"]: r["n_eval_grams"] for r in out}
    assert 1 in got and got[1] >= 1   # contaminated doc flagged
    assert 2 not in got               # clean doc passes
    assert 0 not in got and 50 not in got  # eval docs never self-flag


def test_contamination_check_external_eval_table():
    """The production contract: eval grams come from a SEPARATE bounded
    benchmark table; every row of the training stream is screened (no id
    carve-out) and the gram-cap gate fails loudly on an oversized eval."""
    import pytest

    span = "alpha beta gamma delta epsilon zeta eta theta"  # 8 tokens
    train = rd.from_items([
        {"doc_id": 0, "text": f"id zero is training here {span} yes"},
        {"doc_id": 50, "text": f"fifty is training too {span} indeed"},
        {"doc_id": 2, "text": "clean doc with none of those words at all"},
    ])
    evals = rd.from_items([{"doc_id": 9000, "text": f"bench {span} item"}])
    got = {r["doc_id"]: r["n_eval_grams"]
           for r in dedup.contamination_check(
               train, eval_docs=evals, window=8).take_all()}
    # ids 0 and 50 would be carved out under eval_mod=50 slicing; with an
    # external eval table they are training docs and get flagged
    assert got.get(0, 0) >= 1 and got.get(50, 0) >= 1
    assert 2 not in got
    with pytest.raises(ValueError, match="eval gram set"):
        dedup.contamination_check(train, eval_docs=evals, window=8,
                                  eval_gram_cap=1).take_all()


def test_pack_assignments_hand_values():
    """Packing with budget 256: doc token counts 100+100+100 straddle the
    first boundary at the third doc; a zero-token doc holds zero span."""
    ds = rd.from_items([
        {"doc_id": 0, "text": " ".join(["w"] * 100)},
        {"doc_id": 1, "text": " ".join(["w"] * 100)},
        {"doc_id": 2, "text": " ".join(["w"] * 100)},
        {"doc_id": 3, "text": ""},
        {"doc_id": 1000, "text": " ".join(["w"] * 300)},  # next shard
    ])
    got = {r["doc_id"]: r
           for r in ta.pack_assignments(ds, n_buckets=4).take_all()}
    assert (got[0]["offset"], got[0]["pack_first"], got[0]["pack_last"]) \
        == (0, 0, 0)
    assert (got[1]["offset"], got[1]["pack_first"], got[1]["pack_last"]) \
        == (100, 0, 0)
    # doc 2 spans tokens 200..299 -> packs 0 and 1
    assert (got[2]["offset"], got[2]["pack_first"], got[2]["pack_last"]) \
        == (200, 0, 1)
    # zero-token doc: zero span at its offset
    assert (got[3]["offset"], got[3]["pack_first"], got[3]["pack_last"]) \
        == (300, 1, 1)
    # new shard restarts offsets; 300 tokens span packs 0 and 1
    assert got[1000]["shard"] == 1
    assert (got[1000]["offset"], got[1000]["pack_first"],
            got[1000]["pack_last"]) == (0, 0, 1)


def test_filter_pipeline_planted_gates():
    """One doc per failure mode + one clean keeper; fail_reason reports the
    FIRST failing gate in SPEC order (length, stopword, repetition,
    language)."""
    rows = [
        # kept: enough tokens, has stopwords, varied, English
        {"doc_id": 1, "text": "the quick brown fox jumps over a lazy dog "
                              "and runs into the green field today"},
        # length: under 5 tokens
        {"doc_id": 2, "text": "too short here"},
        # stopword: >=5 tokens, zero stopword hits
        {"doc_id": 3, "text": "zebra quartz viper nimbus krypton flux"},
        # repetition: one bigram dominates (has 'the' so stop gate passes)
        {"doc_id": 4, "text": "the buy now buy now buy now buy now buy now "
                              "buy now buy now buy now"},
        # language: German markers outnumber English ('the' present once)
        {"doc_id": 5, "text": "der hund und die katze ist nicht der feind "
                              "und die maus ist the"},
    ]
    out = {r["doc_id"]: r for r in
           ta.filter_pipeline(rd.from_items(rows)).take_all()}
    assert out[1]["kept"] and out[1]["fail_reason"] == ""
    assert not out[2]["kept"] and out[2]["fail_reason"] == "length"
    assert not out[3]["kept"] and out[3]["fail_reason"] == "stopword"
    assert not out[4]["kept"] and out[4]["fail_reason"] == "repetition"
    assert not out[5]["kept"] and out[5]["fail_reason"] == "language"
    # gate booleans are individually reported, not only folded into kept
    assert out[4]["pass_length"] and out[4]["pass_stop"]
    assert not out[4]["pass_rep"]


def test_stratified_sample_deterministic_and_scoped():
    import hashlib

    rows = [{"doc_id": i, "lang": ("en" if i % 2 == 0 else "de"),
             "text": "x"} for i in range(400)]
    ds = rd.from_items(rows)
    kept = {(r["doc_id"], r["lang"])
            for r in ta.stratified_sample(ds).take_all()}
    # every non-downsampled language survives whole
    assert all((i, "de") in kept for i in range(400) if i % 2 == 1)
    # en keeps exactly the docs below the SPEC salted-md5 threshold
    for i in range(0, 400, 2):
        h = hashlib.md5(f"{ta.SAMPLE_SALT}{i}".encode()).hexdigest()[:8]
        assert ((i, "en") in kept) == (h < ta.SAMPLE_THRESHOLDS["en"])
    # deterministic across runs (resharding-stability analog)
    again = {(r["doc_id"], r["lang"])
             for r in ta.stratified_sample(ds.repartition(7)).take_all()}
    assert kept == again


def test_pq_fit_bit_identical_to_sequential(emb):
    C_d = ann.pq_fit(emb)
    C_s = ann.pq_fit_sequential(SF)
    assert C_d.shape == (ann.PQ_M, ann.PQ_K, 64 // ann.PQ_M)
    assert np.array_equal(C_d, C_s)  # bit-identical, not allclose
    # parallelism/batching cannot perturb the quantized partial sums
    C_r = ann.pq_fit(emb.repartition(7))
    assert np.array_equal(C_d, C_r)


def test_pq_topk_shape_determinism_and_recall(emb):
    qref = ann.make_query_ref(emb, n_queries=5)
    C = ann.pq_fit(emb)
    out = ann.pq_topk(emb, qref, k=10, codebook=C).take_all()
    assert len(out) == 50
    by_q = {}
    for r in out:
        by_q.setdefault(r["query_id"], []).append(r)
    for qid, rows in by_q.items():
        assert sorted(r["rank"] for r in rows) == list(range(1, 11))
        assert all(r["neighbor_id"] != qid for r in rows)
    again = ann.pq_topk(emb.repartition(5), qref, k=10, codebook=C).take_all()
    key = lambda rs: sorted((r["query_id"], r["rank"], r["neighbor_id"])
                            for r in rs)
    assert key(out) == key(again)
    # quantized distances must still find most true neighbors
    brute = ann.brute_force_topk(emb, qref, k=10).take_all()
    bs, ps = {}, {}
    for r in brute:
        bs.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    for r in out:
        ps.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    recall = sum(len(bs[q] & ps[q]) for q in bs) / sum(len(bs[q]) for q in bs)
    assert recall >= 0.5, recall


def test_mixture_sample_rates_and_stability():
    import numpy as np
    import pandas as pd

    from robokop_build_ray.stages import text_analysis as ta

    # large synthetic pool: per-source keep fraction tracks the SPEC rate
    n = 4000
    df = pd.DataFrame({
        "doc_id": np.arange(n, dtype=np.int64),
        "source": [f"src{i % 20}" for i in range(n)],
    })
    kept = ta.mixture_sample_batch(df)
    for s, grp in kept.groupby("source"):
        want = ta.mixture_rate_permille(s) / 1000
        got = len(grp) / (n / 20)
        assert abs(got - want) < 0.12, (s, got, want)
    # stable across re-sharding: same decisions from any batch split
    parts = [ta.mixture_sample_batch(p.reset_index(drop=True))
             for p in np.array_split(df, 7)]
    again = pd.concat(parts, ignore_index=True)
    assert sorted(again["doc_id"]) == sorted(kept["doc_id"])
    # independent of the train/val/test hash (different salt): the kept
    # set is not simply the 'train' split of any rate
    splits = ta.split_batch(df.assign(lang="en"))
    tr = set(splits.loc[splits["split"] == "train", "doc_id"])
    assert set(kept["doc_id"]) - tr and set(kept["doc_id"]) & tr


def test_epoch_order_properties():
    import numpy as np
    import pandas as pd

    from robokop_build_ray.stages import text_analysis as ta

    df = pd.DataFrame({"doc_id": np.arange(500, dtype=np.int64)})
    out = ta.epoch_order_batch(df, n_epochs=3)
    assert len(out) == 1500
    assert all(len(k) == 16 for k in out["shuffle_key"])
    # epochs produce genuinely different orders
    o0 = out[out["epoch"] == 0].sort_values("shuffle_key")["doc_id"].tolist()
    o1 = out[out["epoch"] == 1].sort_values("shuffle_key")["doc_id"].tolist()
    assert o0 != o1 and sorted(o0) == sorted(o1)
    # stable across re-sharding (pure function of doc_id + epoch)
    parts = pd.concat([ta.epoch_order_batch(p.reset_index(drop=True), 3)
                       for p in np.array_split(df, 7)], ignore_index=True)
    a = out.sort_values(["epoch", "doc_id"], ignore_index=True)
    b = parts.sort_values(["epoch", "doc_id"], ignore_index=True)
    assert a.equals(b)


def test_chunk_dedup_hand_values():
    # chunk_tokens=2: doc1 = [A B][C D], doc2 = [A B][E F], doc3 = [E F],
    # doc4 repeats [G H] twice WITHIN itself (kept — cross-doc only)
    rows = [
        {"doc_id": 1, "text": "a b c d"},
        {"doc_id": 2, "text": "a b e f"},
        {"doc_id": 3, "text": "e f"},
        {"doc_id": 4, "text": "g h g h"},
    ]
    got = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
           for r in dedup.chunk_dedup(rd.from_items(rows), chunk_tokens=2,
                                      n_buckets=4).take_all()}
    assert got == {
        1: ("c d", 1, 1),       # "a b" appears in docs 1+2 -> dropped
        2: ("", 0, 2),          # both chunks cross-doc duplicated
        3: ("", 0, 1),          # "e f" shared with doc 2
        4: ("g h g h", 2, 0),   # within-doc repeat survives
    }


def test_chunk_dedup_tail_chunk_not_merged():
    # 3 tokens at chunk_tokens=2 -> chunks "a b" and "c"; the short tail
    # is its own chunk and dedups independently
    rows = [{"doc_id": 1, "text": "a b c"}, {"doc_id": 2, "text": "c"}]
    got = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
           for r in dedup.chunk_dedup(rd.from_items(rows), chunk_tokens=2,
                                      n_buckets=4).take_all()}
    assert got == {1: ("a b", 1, 1), 2: ("", 0, 1)}


def test_chunk_dedup_keepfirst_hand_values():
    # "a b" duplicated across docs 1, 2: doc 1's occurrence (min doc_id)
    # survives, doc 2's drops; doc 2's unique tail chunk survives
    rows = [
        {"doc_id": 1, "text": "a b c d"},
        {"doc_id": 2, "text": "a b e f"},
    ]
    got = {r["doc_id"]: (r["clean_text"], r["n_kept"], r["n_dropped"])
           for r in dedup.chunk_dedup_keepfirst(
               rd.from_items(rows), chunk_tokens=2, n_buckets=4).take_all()}
    assert got == {1: ("a b c d", 2, 0), 2: ("e f", 1, 1)}


def test_pps_sample_exact_decision_rule():
    import hashlib

    rows = [{"doc_id": i, "n_chars": (i % 7 + 1) * 40} for i in range(200)]
    # one heavyweight doc: k*w >= W -> always included (p capped at 1)
    rows.append({"doc_id": 999, "n_chars": 10_000_000})
    docs = rd.from_items(rows).repartition(4)
    k = 10
    got = sorted(r["doc_id"]
                 for r in ta.pps_sample(docs, k=k).take_all())
    W = sum(r["n_chars"] for r in rows)
    want = sorted(
        r["doc_id"] for r in rows
        if int(hashlib.md5(f"{r['doc_id']}:pps".encode()).hexdigest()[:8],
               16) * W < (k << 32) * r["n_chars"])
    assert got == want
    assert 999 in got  # capped-probability doc always kept
    # re-sharding never changes the sample
    got2 = sorted(r["doc_id"]
                  for r in ta.pps_sample(docs.repartition(9),
                                         k=k).take_all())
    assert got2 == got


def test_overlap_containment_catches_quote_jaccard_misses():
    # short doc quoted wholesale inside a long one: overlap = 1.0 while
    # Jaccard stays far below any dedup threshold (Broder containment)
    quote = "alpha beta gamma delta epsilon zeta"
    filler = " ".join(f"w{i} x{i} y{i}" for i in range(60))
    docs = rd.from_items([
        {"doc_id": 1, "text": quote},
        {"doc_id": 2, "text": filler + " " + quote + " " + filler},
        {"doc_id": 3, "text": "totally different content here only"},
    ])
    got = dedup.overlap_coefficient_pairs(docs, threshold=0.9).take_all()
    assert [(r["id_a"], r["id_b"], r["overlap"]) for r in got] == [
        (1, 2, 1.0)]
    # the SAME pair is invisible to jaccard at its own 0.3 threshold
    j = dedup.ngram_jaccard_pairs(docs, threshold=0.3).take_all()
    assert all((r["id_a"], r["id_b"]) != (1, 2) for r in j)


def test_overlap_hot_shingle_cap_warns():
    import warnings

    shared = "same same same common trigram here"
    docs = rd.from_items(
        [{"doc_id": i, "text": shared} for i in range(10)])
    got = dedup.overlap_coefficient_pairs(docs, threshold=0.9,
                                          max_df=4).take_all()
    assert got == []  # every posting list hot -> all pairs skipped
    # the skip is warned, not silent (group fn runs in workers, so the
    # warning is asserted on the function directly)
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        out = dedup._rare_shingle_pairs(
            pd.DataFrame({"doc_id": range(10)}), max_df=4)
    assert len(out) == 0
    assert any("max_df" in str(x.message) for x in w)


def test_cm_sketch_overestimates_under_collisions():
    from robokop_build_ray.functions.sketches import cm_sketch_estimates

    # 40 keys into width=4 buckets: collisions guaranteed -> est >= n,
    # with strict overestimate somewhere; merging across shards must not
    # change the sketch (re-partition invariance)
    rows = [{"k": i} for i in range(40) for _ in range(i % 5 + 1)]
    ds = rd.from_items(rows).repartition(6)
    got = {r["key"]: (r["n"], r["est"])
           for r in cm_sketch_estimates(ds, "k", k=10, width=4).take_all()}
    assert all(est >= n for n, est in got.values())
    assert any(est > n for n, est in got.values())
    got2 = {r["key"]: (r["n"], r["est"])
            for r in cm_sketch_estimates(ds.repartition(2), "k", k=10,
                                         width=4).take_all()}
    assert got2 == got


def test_cm_sketch_exact_when_collision_free():
    from robokop_build_ray.functions.sketches import cm_sketch_estimates

    rows = [{"k": i} for i in range(5) for _ in range(i + 1)]
    got = cm_sketch_estimates(rd.from_items(rows), "k", k=5).take_all()
    # 5 keys, width 256: collision-free -> every estimate exact;
    # ordering count desc then key asc
    assert [(r["key"], r["n"], r["est"]) for r in got] == [
        (4, 5, 5), (3, 4, 4), (2, 3, 3), (1, 2, 2), (0, 1, 1)]


def test_hll_exact_registers_and_merge_invariance():
    from robokop_build_ray.functions.sketches import (
        HLL_LC_TABLE,
        HLL_M,
        HLL_WBITS,
        _hll_h64,
        hll_distinct,
    )

    rows = [{"k": i} for i in range(200) for _ in range(2)]  # dup rows
    ds = rd.from_items(rows).repartition(7)
    got = hll_distinct(ds, "k").take_all()[0]
    assert got["n_exact"] == 200
    # independent register re-derivation
    regs = {}
    for i in range(200):
        h = _hll_h64(i)
        j, w = h % HLL_M, h >> 6
        rank = HLL_WBITS + 1 if w == 0 else HLL_WBITS - w.bit_length() + 1
        regs[j] = max(regs.get(j, 0), rank)
    z = sum(1 << (62 - regs.get(j, 0)) for j in range(HLL_M))
    est = (70934 * HLL_M * HLL_M << 62) // (100000 * z)
    v = HLL_M - len(regs)
    if v > 0 and est <= 5 * HLL_M // 2:
        est = HLL_LC_TABLE[v - 1]
    assert got["est"] == est
    # estimate within the ~3 sigma HLL band (1.04/sqrt(64) ~ 13%)
    assert abs(got["est"] - 200) <= 0.4 * 200
    # merging shards never changes registers
    got2 = hll_distinct(ds.repartition(2), "k").take_all()[0]
    assert got2 == got


def test_hll_small_range_linear_counting():
    from robokop_build_ray.functions.sketches import hll_distinct

    ds = rd.from_items([{"k": i} for i in range(10)])
    got = hll_distinct(ds, "k").take_all()[0]
    assert got["n_exact"] == 10
    # LC regime: estimate close to truth, not the raw ~alpha*m bias
    assert abs(got["est"] - 10) <= 5


def test_rolling_fp_numeric_fast_path_properties():
    # shard stability: a doc's fast-path fingerprint is independent of
    # batch composition; short and empty docs are well-defined
    texts = ["alpha beta gamma " * 10, "short text", "",
             " ".join(f"t{i}" for i in range(30))]
    df = pd.DataFrame({"doc_id": [1, 2, 3, 4], "text": texts})
    full = ta.rolling_fingerprints_batch(df, parity=False)
    for i in range(4):
        solo = ta.rolling_fingerprints_batch(df.iloc[[i]], parity=False)
        assert solo["rolling_fp"].iloc[0] == full["rolling_fp"].iloc[i]
    assert full["rolling_fp"].dtype == "int64"
    assert len(set(full["rolling_fp"])) == 4  # distinct docs differ


def test_audio_stats_probe_roundtrip(ray_session):
    import ray.data as rd

    from robokop_build_ray.stages.multimodal import (
        WAV_MIME, media_audio_stats, synthesize_media)

    tbl = synthesize_media(36, seed=7)
    want = {m: (e, a)
            for m, mime, e, a in zip(tbl["media_id"].to_pylist(),
                                     tbl["mime"].to_pylist(),
                                     tbl["energy"].to_pylist(),
                                     tbl["ac_lag1"].to_pylist())
            if mime == WAV_MIME}
    assert want and all(e > 0 for e, _ in want.values())
    got = {r["media_id"]: (r["energy"], r["ac_lag1"])
           for r in media_audio_stats(rd.from_arrow(tbl)).take_all()}
    # decode-from-bytes recomputation matches generator ground truth for
    # BOTH encodings (PCM16 exact; mu-law through the companded domain)
    assert got == want


def test_prefix_jaccard_complete_vs_bruteforce():
    """Prefix filtering is PROVABLY complete: the engine's pair set and
    jaccard values must equal the exact all-pairs computation, including
    boundary pairs sitting exactly at the threshold."""
    rng = np.random.default_rng(11)
    rows = []
    base = [f"w{v}" for v in rng.integers(0, 400, size=60)]
    for d in range(30):
        toks = list(base)
        # vary few tokens (near-dups, J above 0.5) for half the docs and
        # many for the rest so pair similarities sweep across 0.5
        k = int(rng.integers(0, 8)) if d % 2 == 0 else int(
            rng.integers(8, 60))
        for pos in rng.choice(60, size=k, replace=False):
            toks[pos] = f"x{d}_{pos}"
        rows.append({"doc_id": d, "text": " ".join(toks)})
    expect = []
    sets = {r["doc_id"]: set(dedup.shingle_hashes(r["text"]).tolist())
            for r in rows}
    for a in range(30):
        for b in range(a + 1, 30):
            inter = len(sets[a] & sets[b])
            union = len(sets[a] | sets[b])
            if union and inter * 2 >= union:
                expect.append((a, b, inter / union))
    got = sorted((r["id_a"], r["id_b"], r["jaccard"])
                 for r in dedup.prefix_jaccard_pairs(
                     rd.from_items(rows)).take_all())
    assert got == sorted(expect) and len(expect) >= 3


def test_prefix_jaccard_threshold_is_exact_integer():
    # 3 shared grams of 4 vs 4: union 5, inter 3 -> 0.6 >= 1/2 kept;
    # with threshold 2/3 the same pair needs inter*3 >= union*2 (9 >= 10
    # fails) -> dropped. No float rounding in either decision.
    a = "p q r s t u"   # grams: pqr qrs rst stu
    b = "p q r s t v"   # grams: pqr qrs rst stv
    rows = [{"doc_id": 1, "text": a}, {"doc_id": 2, "text": b}]
    kept = dedup.prefix_jaccard_pairs(rd.from_items(rows), 1, 2).take_all()
    assert [(r["id_a"], r["id_b"]) for r in kept] == [(1, 2)]
    assert abs(kept[0]["jaccard"] - 0.6) < 1e-15
    dropped = dedup.prefix_jaccard_pairs(rd.from_items(rows), 2, 3).take_all()
    assert dropped == []


def test_synthesize_media_near_dupes():
    """near_dupes appends PPM image variants: even = byte-exact copy of
    a source PPM image (dHash Hamming 0), odd = +2 brightness re-encode;
    the banded pair op finds every exact-copy pair at hamming 0."""
    from robokop_build_ray.stages import multimodal as mm

    base = mm.synthesize_media(24)
    tbl = mm.synthesize_media(24, near_dupes=4)
    assert tbl.num_rows == 28 and base.num_rows == 24
    assert tbl.slice(0, 24).equals(base)  # base rows untouched
    tail = tbl.slice(24).to_pylist()
    assert all(r["kind"] == "image" and r["mime"] == mm.PPM_MIME
               for r in tail)
    # source PPM images in the first 24 rows: i = 0, 12 (i%3==0,
    # (i//3)%4==0); variant 0 is a byte-exact copy of image 0
    src = {r["media_id"]: r["payload"] for r in base.to_pylist()}
    assert tail[0]["payload"] == src[0]
    assert tail[1]["payload"] != src[12]  # brightness variant differs
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in mm.image_dhash_pairs(
               rd.from_arrow(tbl), max_hamming=3).take_all()}
    assert got.get((0, 24)) == 0   # exact copy pair
    assert got.get((24, 26)) == 0  # two exact copies of image 0 pair up


def test_image_dhash_pairs_planted_duplicates():
    """Plant a near-duplicate (same gradient structure, +8 brightness,
    different codec) and an unrelated noise image: the pair op must find
    exactly the planted pair with small hamming, symmetric across PPM/PNG
    encodings of identical pixels (hamming 0)."""
    from robokop_build_ray.stages import multimodal as mm

    rng = np.random.default_rng(5)
    yy, xx = np.mgrid[0:12, 0:16]
    base = np.stack([(xx * 9) % 256, (yy * 13) % 256,
                     ((xx + yy) * 5) % 256], axis=-1).astype(np.uint8)
    bright = np.clip(base.astype(np.int32) + 8, 0, 255).astype(np.uint8)
    noise = rng.integers(0, 256, size=(12, 16, 3), dtype=np.uint8)
    rows = [
        {"media_id": 0, "kind": "image", "mime": mm.PPM_MIME,
         "payload": mm.encode_ppm(base)},
        {"media_id": 1, "kind": "image", "mime": mm.PNG_MIME,
         "payload": mm.encode_png(base)},        # identical pixels
        {"media_id": 2, "kind": "image", "mime": mm.PPM_MIME,
         "payload": mm.encode_ppm(bright)},      # near-dup
        {"media_id": 3, "kind": "image", "mime": mm.PPM_MIME,
         "payload": mm.encode_ppm(noise)},       # unrelated
        {"media_id": 4, "kind": "audio", "mime": mm.WAV_MIME,
         "payload": mm.encode_wav(np.zeros(64, dtype=np.int16))},
    ]
    got = {(r["id_a"], r["id_b"]): r["hamming"]
           for r in mm.image_dhash_pairs(
               rd.from_items(rows), max_hamming=10).take_all()}
    assert got.get((0, 1)) == 0          # codec-invariant: same pixels
    assert (0, 2) in got and (1, 2) in got
    assert all(h <= 10 for h in got.values())
    assert not any(3 in k for k in got)  # noise image pairs with nothing
