"""CLI surface (query/convert), IVF ANN recall, spelling-recall pipeline."""

import json

import numpy as np
import pytest


def test_cli_query_and_convert(tmp_path, capsys):
    from liblevenshtein_rust_ray.cli import main

    words = tmp_path / "words.txt"
    words.write_text("test\nbest\nrest\ntesting\n")
    assert main(["query", "--dict", str(words), "--term", "test", "-n", "1"]) == 0
    got = json.loads(capsys.readouterr().out)
    assert got == [
        {"term": "test", "distance": 0},
        {"term": "best", "distance": 1},
        {"term": "rest", "distance": 1},
    ]

    pq_path = tmp_path / "dict.parquet"
    assert main(["convert", "--input", str(words), "--output", str(pq_path)]) == 0
    capsys.readouterr()
    assert main(["query", "--dict", str(pq_path), "--term", "tes", "-n", "0",
                 "--prefix", "--backend", "trie"]) == 0
    got = json.loads(capsys.readouterr().out)
    assert {g["term"] for g in got} == {"test", "testing"}


def test_ann_ivf_recall(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.similarity import ann_brute_topk, ann_ivf_topk

    rng = np.random.default_rng(5)
    centers = rng.standard_normal((10, 24))
    rows = []
    for c in range(10):
        for j in range(30):
            v = centers[c] + 0.1 * rng.standard_normal(24)
            rows.append({"vec_id": c * 30 + j, "embedding": v.tolist()})
    ds = rd.from_items(rows)
    queries = {
        "ids": np.arange(5, dtype=np.int64),
        "matrix": np.array([rows[i * 30]["embedding"] for i in range(5)]),
    }
    brute = ann_brute_topk(ds, queries, k=5).to_pandas()
    ivf = ann_ivf_topk(ds, queries, k=5, n_clusters=10, n_probe=3,
                       sample_size=300).to_pandas()
    b = {(q, m) for q, m in zip(brute["query_id"], brute["match_id"])}
    v = {(q, m) for q, m in zip(ivf["query_id"], ivf["match_id"])}
    assert len(v & b) / len(b) >= 0.9


def test_spelling_recall_is_one(ray_session):
    import ray.data as rd

    from liblevenshtein_rust_ray.pipelines.spelling import spelling_recall

    vocab = rd.from_items(
        [{"tok": w} for w in
         ["apple", "banana", "cherry", "orange", "grape", "melon", "papaya",
          "kiwi", "mango", "plum", "apricot", "fig"]]
    )
    out = spelling_recall(vocab, "tok", n=2, per_word=3).to_pandas()
    assert len(out) == 1
    assert out["recall"].iloc[0] == 1.0
    assert out["n_misspellings"].iloc[0] > 0


# ---------------------------------------------------------------------------
# Format auto-detection chain (reference cli/detect.rs:52-261).
# ---------------------------------------------------------------------------
def test_format_detection_chain(tmp_path):
    import gzip
    import json

    from liblevenshtein_rust_ray.state.dictionary_io import (
        detect_format,
        read_terms,
        write_terms,
    )

    terms = ["beta", "alpha", "alpha", "gamma"]
    want = ["alpha", "beta", "gamma"]

    # parquet: magic bytes win even with a lying extension
    p = tmp_path / "dict.bin"
    write_terms(terms, str(p), fmt="parquet")
    assert detect_format(str(p)) == "parquet"
    assert read_terms(str(p)) == want

    # gzip magic + inner json/text discrimination
    gj = tmp_path / "dict1.whatever"
    with gzip.open(gj, "wt") as f:
        json.dump(terms, f)
    assert detect_format(str(gj)) == "json_gzip"
    assert read_terms(str(gj)) == want
    gt = tmp_path / "dict2.whatever"
    with gzip.open(gt, "wt") as f:
        f.write("\n".join(terms))
    assert detect_format(str(gt)) == "text_gzip"
    assert read_terms(str(gt)) == want

    # extension
    j = tmp_path / "dict.json"
    j.write_text(json.dumps(terms))
    assert detect_format(str(j)) == "json"
    # content heuristic on an unknown extension
    j2 = tmp_path / "dict.noext"
    j2.write_text(json.dumps(terms))
    assert detect_format(str(j2)) == "json"
    # default text
    t = tmp_path / "dict.unknownext"
    t.write_text("\n".join(terms))
    assert detect_format(str(t)) == "text"
    assert read_terms(str(t)) == want

    # user override beats everything (detect.rs user-specified arm)
    assert detect_format(str(p), user_format="text") == "text"

    # round-trips through every writer format
    for fmt, name in [("json", "d.json"), ("text", "d.txt"),
                      ("json_gzip", "d.json.gz"), ("text_gzip", "d.gz"),
                      ("parquet", "d.parquet")]:
        out = tmp_path / name
        write_terms(terms, str(out))
        assert read_terms(str(out)) == want, (fmt, name)


def test_cli_convert_gzip_roundtrip(tmp_path):
    import gzip
    import json as _json

    from liblevenshtein_rust_ray.cli import main

    src = tmp_path / "words.txt"
    src.write_text("cherry\napple\nbanana\n")
    out = tmp_path / "words.json.gz"
    rc = main(["convert", "--input", str(src), "--output", str(out)])
    assert rc == 0
    with gzip.open(out, "rt") as f:
        assert _json.load(f) == ["apple", "banana", "cherry"]


# ---------------------------------------------------------------------------
# Multimodal: REAL codec-free decoders (PPM images, PCM16 WAV) + numpy
# resize/feature kernels; compressed codecs remain the documented stub.
# ---------------------------------------------------------------------------
def _ppm(h=6, w=8, seed=0):
    import numpy as np

    from liblevenshtein_rust_ray.stages.multimodal import encode_ppm

    rng = np.random.default_rng(seed)
    arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
    return arr, encode_ppm(arr)


def test_ppm_roundtrip_and_resize():
    import numpy as np

    from liblevenshtein_rust_ray.stages.multimodal import (
        decode_ppm,
        image_features,
        resize_bilinear,
        IMAGE_FEATURE_DIM,
    )

    arr, payload = _ppm()
    back = decode_ppm(payload)
    assert np.array_equal(arr, back)
    # comment + odd whitespace in header parses too
    weird = b"P6 #c\n# comment line\n 8\t6\n255\n" + arr.tobytes()
    assert np.array_equal(decode_ppm(weird), arr)
    r = resize_bilinear(arr, 3, 4)
    assert r.shape == (3, 4, 3)
    # constant image resizes to the same constant
    const = np.full((5, 7, 3), 42, dtype=np.uint8)
    assert np.allclose(resize_bilinear(const, 9, 2), 42)
    f = image_features(arr)
    assert f.shape == (IMAGE_FEATURE_DIM,)
    assert 0.0 <= f.min() and f.max() <= 1.0


def test_wav_roundtrip_and_features():
    import numpy as np

    from liblevenshtein_rust_ray.stages.multimodal import (
        AUDIO_FEATURE_DIM,
        audio_features,
        decode_wav,
        encode_wav,
    )

    t = np.arange(1600) / 16000.0
    sig = 0.5 * np.sin(2 * np.pi * 440 * t)
    payload = encode_wav(sig, 16000)
    back, rate = decode_wav(payload)
    assert rate == 16000
    assert np.allclose(back, sig, atol=1e-3)
    f = audio_features(back, rate)
    assert f.shape == (AUDIO_FEATURE_DIM,)
    # 440 Hz tone: low spectral centroid, band 0 dominates
    assert f[2] < 0.1 and f[3] > 0.9


def test_frame_sampling():
    import numpy as np

    from liblevenshtein_rust_ray.stages.multimodal import encode_ppm, sample_frames

    frames = [np.full((4, 4, 3), i * 10, dtype=np.uint8) for i in range(6)]
    video = b"".join(encode_ppm(f) for f in frames)
    got = sample_frames(video, every_k=2)
    assert len(got) == 3
    assert [int(g[0, 0, 0]) for g in got] == [0, 20, 40]


def test_image_feature_stage_actor_pool(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.multimodal import (
        IMAGE_FEATURE_DIM,
        image_feature_stage,
    )

    rows = []
    for i in range(12):
        _arr, payload = _ppm(seed=i)
        rows.append({"id": i, "payload": payload})
    rows.append({"id": 99, "payload": b"\xff\xd8\xffJPEG-ish"})  # codec stub row
    ds = rd.from_arrow(pa.table({
        "id": [r["id"] for r in rows],
        "payload": pa.array([r["payload"] for r in rows], type=pa.binary()),
    }))
    out = image_feature_stage(ds, concurrency=2, batch_size=4).to_pandas()
    assert len(out) == 13  # fake fallback keeps the undecodable row
    assert all(len(f) == IMAGE_FEATURE_DIM for f in out["features"])
    # skip mode drops it
    from liblevenshtein_rust_ray.stages.multimodal import ImageFeatures

    out2 = ds.map_batches(
        ImageFeatures,
        fn_constructor_kwargs={"on_undecodable": "skip"},
        batch_format="pyarrow", batch_size=4, concurrency=2,
    ).to_pandas()
    assert len(out2) == 12 and 99 not in set(out2["id"])


def test_audio_feature_stage(ray_session):
    import numpy as np
    import pyarrow as pa
    import ray.data as rd

    from liblevenshtein_rust_ray.stages.multimodal import (
        AUDIO_FEATURE_DIM,
        audio_feature_stage,
        encode_wav,
    )

    rng = np.random.default_rng(1)
    rows = [encode_wav(rng.standard_normal(800) * 0.1) for _ in range(6)]
    ds = rd.from_arrow(pa.table({
        "id": list(range(6)),
        "payload": pa.array(rows, type=pa.binary()),
    }))
    out = audio_feature_stage(ds, concurrency=2, batch_size=2).to_pandas()
    assert len(out) == 6
    assert (out["sample_rate"] == 16000).all()
    assert all(len(f) == AUDIO_FEATURE_DIM for f in out["features"])


def test_cli_run_ingest(tmp_path, capsys, ray_session):
    import json

    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from liblevenshtein_rust_ray.cli import main

    src = tmp_path / "pages"
    src.mkdir()
    pq.write_table(pa.table({
        "url": ["https://a.com/x?utm_source=f", "https://a.com/x/",
                "https://b.com/y"],
        "warc_ts": pd.to_datetime([100, 200, 50], unit="s"),
        "text": ["old", "new", "solo"],
    }), str(src / "p.parquet"))
    out = tmp_path / "canon"
    rc = main(["run-ingest", "--input", str(src), "--output", str(out),
               "--carry", "text"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["canonical_urls"] == 2
    got = pq.read_table(str(out)).to_pandas().sort_values(
        "canonical_url").reset_index(drop=True)
    assert got["canonical_url"].tolist() == ["https://a.com/x", "https://b.com/y"]
    assert got["text"].tolist() == ["new", "solo"]
    assert got["n_snapshots"].tolist() == [2, 1]


def test_cli_run_bpe(tmp_path, capsys, ray_session):
    import json

    import pyarrow as pa
    import pyarrow.parquet as pq

    from liblevenshtein_rust_ray.cli import main

    src = tmp_path / "docs"
    src.mkdir()
    pq.write_table(pa.table({
        "text": ["aaab aaab ab", "aaab ab"],
    }), str(src / "d.parquet"))
    out = tmp_path / "merges.parquet"
    rc = main(["run-bpe", "--input", str(src), "--output", str(out),
               "--n-merges", "2"])
    assert rc == 0
    payload = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert payload["merges"] == 2
    got = pq.read_table(str(out)).to_pandas()
    assert list(got.itertuples(index=False, name=None)) == [
        (1, "a", "a", 6), (2, "a", "b", 5)]
