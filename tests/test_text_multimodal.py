"""Text extraction spec vectors + multimodal binary plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from raven_spark.functions.text import (
    extract_links,
    extract_text,
    fingerprint_py,
    simhash_py,
)


def test_extract_text_vectors():
    assert extract_text("<p>hello</p><p>world</p>") == "hello\nworld"
    assert extract_text("<b>bold</b> text") == "bold text"
    assert extract_text("<script>var x=1;</script>visible") == "visible"
    assert extract_text("<style>.a{}</style>shown") == "shown"
    assert extract_text("a &amp; b &lt;c&gt; &#65;&#x42;") == "a & b <c> AB"
    assert extract_text("<!-- gone --><!DOCTYPE html>kept") == "kept"
    assert extract_text("  spaced\t\tout  ") == "spaced out"
    assert extract_text("<ul><li>one</li><li>two</li></ul>") == "one\ntwo"
    # head content (incl. title) is dropped wholesale
    assert extract_text("<head><title>T</title></head><body>B</body>") == "B"


def test_extract_text_deterministic_and_idempotent_shape():
    h = "<div>a<p>b</p><table><tr><td>c</td></tr></table></div>"
    assert extract_text(h) == extract_text(h) == "a\nb\nc"


def test_extract_links():
    html = '<a href="http://x/1">one</a> <a class=q href=\'http://x/2\'>two</a> <a>none</a>'
    assert extract_links(html) == ["http://x/1", "http://x/2"]


def test_fingerprint_and_simhash_stability():
    # pinned values: any change to the hash spec must be intentional
    assert fingerprint_py("hello") == fingerprint_py("hello")
    assert fingerprint_py("hello") != fingerprint_py("hellp")
    a = simhash_py("the quick brown fox jumps over the lazy dog")
    b = simhash_py("the quick brown fox jumps over the sleepy dog")
    c = simhash_py("completely unrelated words appear here instead today")
    ham_ab = bin((a ^ b) & ((1 << 64) - 1)).count("1")
    ham_ac = bin((a ^ c) & ((1 << 64) - 1)).count("1")
    assert ham_ab < ham_ac


def test_pack_unpack_roundtrip():
    from raven_spark.functions.multimodal import pack_floats, unpack_floats

    v = np.array([1.5, -2.25, 3.125, 0.0], dtype=np.float32)
    out = unpack_floats(pack_floats(v))
    assert np.array_equal(v, out)
    with pytest.raises(ValueError):
        unpack_floats(b"XXXX....")


def test_decode_stubs_raise():
    from raven_spark.functions.multimodal import decode_audio, decode_image

    with pytest.raises(NotImplementedError):
        decode_image(b"...")
    with pytest.raises(NotImplementedError):
        decode_audio(b"...")


def test_media_feature_extraction(spark):
    from raven_spark.functions.multimodal import (
        embeddings_as_assets,
        extract_media_features,
        unpack_floats_udf,
    )
    from pyspark.sql import functions as F

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet").limit(50)
    assets = embeddings_as_assets(emb)
    feats = extract_media_features(assets, feature_dim=8).collect()
    assert len(feats) == 50
    assert all(len(r["feature"]) == 8 for r in feats)
    assert all(r["n_bytes"] == 4 + 5 + 64 * 4 for r in feats)  # header + 64 f32
    assert all(r["width"] >= 64 and r["n_frames"] == 1 for r in feats)
    # binary round-trip is lossless through Spark binary columns
    back = assets.select(F.col("asset_id").alias("vec_id"), unpack_floats_udf("payload").alias("v"))
    j = back.join(emb, "vec_id").select("vec_id", "v", "embedding").collect()
    for r in j:
        assert np.allclose(np.array(r["v"]), np.array(r["embedding"]), atol=0)
