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


def test_gopher_rules_vectors(spark):
    """Each published Gopher rule (Rae et al. 2021 A1.1) trips on a
    crafted document and passes on a plain one — boundary conditions
    included (symbol ratio exactly 0.1 passes; 2 required words pass,
    1 fails)."""
    from pyspark.sql import functions as F

    from raven_spark.functions.text import gopher_rules_cols

    passing = (
        "The quick brown fox jumps over the lazy dog and then decides "
        "that it would have been wiser to rest with friends of its own "
        "kind for a while. " * 3
    ).strip()
    docs = [
        ("ok", passing),
        ("short", "The dog and that cat have fun with all of it."),
        # >100k words
        ("long", ("word " * 100_001).strip()),
        # mean word len < 3 but otherwise passing-ish
        ("tiny_words", ("an is at of the be to and it we " * 20).strip()),
        # symbol-heavy: one '#' per word
        ("hashes", " ".join(f"#tag{i}" for i in range(80))
         + " the be to of and"),
        # 10 of 11 non-empty lines start with a bullet
        ("bullets", "\n".join(["- item one of the list be to and"] * 10
                              + ["a closing line that have with text"])),
        # half the lines end with ellipsis
        ("ellipses", "\n".join(
            ["this line trails off into the distance somewhere ..."] * 5
            + ["this line is a complete sentence of the usual kind."] * 5
        )),
        # words are mostly digits
        ("numeric", " ".join(str(i) for i in range(100))
         + " the be to of and that have with"),
        # only one required word ("the")
        ("one_stop", ("the zebra gallops quickly across endless plains "
                      "while zebras graze near waterholes seeking shade "
                      "under acacia trees during scorching afternoons "
                      "when lions rest quietly between distant rocky "
                      "outcrops overlooking vast golden savannas full "
                      "grass swaying gently beneath warm african winds "
                      "carrying scents from faraway herds moving slowly "
                      "toward northern grazing grounds every summer")),
    ]
    df = spark.createDataFrame(docs, "name string, text string")
    out = df.select(
        "name", *[c.alias(k) for k, c in gopher_rules_cols(F.col("text")).items()]
    )
    r = {row["name"]: row for row in out.collect()}

    assert r["ok"]["gopher_pass"] is True
    assert all(r["ok"][k] for k in r["ok"].asDict() if k.startswith("ok_"))
    assert r["short"]["ok_word_count"] is False and r["short"]["n_words"] < 50
    assert r["long"]["ok_word_count"] is False
    assert r["tiny_words"]["ok_mean_word_len"] is False
    assert r["hashes"]["ok_symbol_ratio"] is False
    assert r["bullets"]["ok_bullet_lines"] is False   # 10/11 > 0.9
    assert r["ellipses"]["ok_ellipsis_lines"] is False  # 0.5 >= 0.3
    assert r["numeric"]["ok_alpha_words"] is False
    assert r["one_stop"]["ok_stop_words"] is False
    assert r["one_stop"]["stop_hits"] == 1
    for name in ("short", "long", "tiny_words", "hashes", "bullets",
                 "ellipses", "numeric", "one_stop"):
        assert r[name]["gopher_pass"] is False, name


def test_gopher_rules_null_and_empty(spark):
    from pyspark.sql import functions as F

    from raven_spark.functions.text import gopher_rules_cols

    df = spark.createDataFrame(
        [("empty", ""), ("null", None)], "name string, text string"
    )
    out = {
        row["name"]: row
        for row in df.select(
            "name",
            *[c.alias(k) for k, c in gopher_rules_cols(F.col("text")).items()],
        ).collect()
    }
    assert out["empty"]["n_words"] == 0
    assert out["empty"]["gopher_pass"] is False
    assert out["null"]["gopher_pass"] is None  # NULL propagates, never True


def test_gopher_rules_paper_fidelity(spark):
    """Review-pass fixes, paper-exact semantics (Rae et al. 2021 A1.1):
    hash and ellipsis symbol ratios are tested SEPARATELY (each <= 0.1),
    removal is only STRICTLY beyond the 90%/30% line boundaries, and a
    trailing newline must not mint a phantom word."""
    from pyspark.sql import functions as F

    from raven_spark.functions.text import gopher_rules_cols

    words49 = " ".join(f"alpha{i}" for i in range(44)) + \
        " the be to of and"
    base100 = " ".join(f"w{i} word" for i in range(47)) + \
        " the be to of and that"  # 100 words, stop words present
    docs = [
        # 49 words + trailing newline: n_words must be 49, not 50
        ("newline_49", words49 + "\n"),
        # whitespace-only text: zero words
        ("ws_only", "\n\t \n"),
        # 6 '#' + 6 '...' in 100 words: each ratio 0.06 <= 0.1 -> OK
        ("split_symbols", base100 + " " + "#x " * 6 + "y... " * 6),
        # exactly 9 of 10 lines bulleted: frac 0.9 -> kept (not > 0.9)
        ("boundary_bullets",
         "\n".join(["- item of the usual be to and kind"] * 9
                   + ["closing line with that text have words"])),
        # exactly 3 of 10 lines end in ellipsis: frac 0.3 -> kept
        ("boundary_ellipsis",
         "\n".join(["drifting off into the distance there ..."] * 3
                   + ["a complete sentence of the usual be kind."] * 7)),
    ]
    df = spark.createDataFrame(docs, "name string, text string")
    out = df.select(
        "name",
        *[c.alias(k) for k, c in gopher_rules_cols(F.col("text")).items()],
    )
    r = {row["name"]: row for row in out.collect()}
    assert r["newline_49"]["n_words"] == 49
    assert r["newline_49"]["ok_word_count"] is False
    assert r["ws_only"]["n_words"] == 0
    assert r["split_symbols"]["ok_symbol_ratio"] is True
    assert abs(r["split_symbols"]["hash_ratio"] - 6 / 112.0) < 1e-6
    assert r["boundary_bullets"]["ok_bullet_lines"] is True
    assert r["boundary_bullets"]["bullet_frac"] == 0.9
    assert r["boundary_ellipsis"]["ok_ellipsis_lines"] is True
    assert r["boundary_ellipsis"]["ellipsis_frac"] == 0.3


def test_script_profile_scripts_and_ties(spark):
    from raven_spark.functions.text import with_script_profile

    rows = [
        (0, "hello world"),
        (1, "Привет мир"),
        (2, "مرحبا بالعالم"),
        (3, "こんにちは世界"),      # 5 kana + 2 han -> kana dominant
        (4, "안녕하세요"),
        (5, None),
        (6, "12345 !!!"),           # no scripted codepoints
        (7, "ab ПР"),               # 2 latin vs 2 cyrillic: declaration-order tie -> latin
        (8, "naïve café"),          # latin-1 supplement letters count as latin
    ]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    out = {r["doc_id"]: r for r in with_script_profile(df).collect()}

    assert out[0]["dominant_script"] == "latin" and out[0]["latin_n"] == 10
    assert out[1]["dominant_script"] == "cyrillic" and out[1]["cyrillic_n"] == 9
    assert out[2]["dominant_script"] == "arabic"
    assert out[3]["dominant_script"] == "kana"
    assert out[3]["kana_n"] == 5 and out[3]["han_n"] == 2
    assert out[4]["dominant_script"] == "hangul"
    assert out[5]["dominant_script"] == "none" and out[5]["n_scripted"] == 0
    assert out[6]["dominant_script"] == "none"
    # strict-greater dominance: a tie keeps the earlier-declared script
    assert out[7]["latin_n"] == out[7]["cyrillic_n"] == 2
    assert out[7]["dominant_script"] == "latin"
    assert out[8]["dominant_script"] == "latin" and out[8]["latin_n"] == 9


def test_readability_hand_counts(spark):
    from raven_spark.functions.text import readability

    df = spark.createDataFrame(
        [
            (0, "The cat sat. The dog ran!"),
            (1, None),
            (2, "beautiful"),
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in readability(df).collect()}
    r0 = got[0]
    # sentences: 'the cat sat' / 'the dog ran'; words 6; syllables all 1
    assert (r0["n_sents"], r0["n_words"], r0["n_syllables"]) == (2, 6, 6)
    import math

    flesch = round(206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6), 6)
    assert math.isclose(r0["flesch"], flesch)
    assert got[1]["n_words"] == 0 and got[1]["n_sents"] == 0
    # beau-ti-ful -> vowel groups 'eau','i','u' = 3
    assert got[2]["n_syllables"] == 3


def test_kwic_snippets_window_and_counts(spark):
    from raven_spark.functions.text import kwic_snippets

    pad = "x" * 50
    df = spark.createDataFrame(
        [
            (0, pad + "NEEDLE" + pad),          # interior match
            (1, "NEEDLE right at the start"),    # left clamp
            (2, "no match here"),
            (3, "two needle then needle again"),  # case-insensitive x2
        ],
        "doc_id bigint, text string",
    )
    got = {r["doc_id"]: r for r in
           kwic_snippets(df, term="needle", width=10).collect()}
    assert 2 not in got
    r0 = got[0]
    assert r0["pos"] == 51 and r0["n_matches"] == 1
    assert r0["snippet"] == "x" * 10 + "NEEDLE" + "x" * 10
    r1 = got[1]
    assert r1["pos"] == 1 and r1["snippet"].startswith("NEEDLE")
    assert got[3]["n_matches"] == 2 and got[3]["pos"] == 5


def test_html_stats_hand_computed(spark):
    from raven_spark.functions.text import with_html_stats

    h1 = '<html><head><script src="x"></script></head><body><a href="/l">go</a><p>hi there</p></body></html>'
    df = spark.createDataFrame(
        [(1, h1), (2, "no markup at all"), (3, ""), (4, None),
         (5, "<A HREF=x>caps</A><SCRIPT>s</SCRIPT>")],
        "doc_id long, html string",
    )
    rows = {r["doc_id"]: r for r in with_html_stats(df).collect()}
    r1 = rows[1]
    # tags: html head script /script /head body a /a p /p /body /html = 12
    assert r1["n_tags"] == 12
    assert r1["n_anchors"] == 1
    assert r1["n_scripts"] == 1
    assert r1["visible_chars"] == len("go") + len("hi there")
    assert r1["n_bytes"] == len(h1.encode())
    assert r1["text_ratio"] == round(10 / len(h1), 6)
    assert r1["anchor_density"] == 100.0  # 1 anchor / 10 visible chars
    r2 = rows[2]
    assert (r2["n_tags"], r2["n_anchors"], r2["n_scripts"]) == (0, 0, 0)
    assert r2["text_ratio"] == 1.0
    r3 = rows[3]
    assert (r3["visible_chars"], r3["text_ratio"]) == (0, 0.0)
    assert rows[4]["n_tags"] is None and rows[4]["text_ratio"] is None
    # case-insensitive anchor/script matching
    assert rows[5]["n_anchors"] == 1 and rows[5]["n_scripts"] == 1


def test_html_stats_shuffle_free(spark):
    from raven_spark.functions.text import with_html_stats

    df = spark.createDataFrame([(1, "<p>x</p>")], "doc_id long, html string")
    plan = with_html_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Python" not in plan


def test_segment_html_blocks_content_vs_boilerplate(spark):
    from raven_spark.functions.text import segment_html_blocks

    prose = ("This is a long paragraph of real article prose that easily "
             "clears the minimum visible length threshold for content.")
    nav = '<a href="/a">Home</a> <a href="/b">News</a> <a href="/c">Shop</a>'
    html = (
        "<html><head><title>t</title><style>p{color:red}</style></head>"
        "<body><nav>" + nav + "</nav>"
        "<p>" + prose + "</p>"
        "<script>var hidden = 'should never appear';</script>"
        "<p>" + prose + " Second block with more words.</p>"
        "<footer>" + nav + "</footer></body></html>"
    )
    df = spark.createDataFrame([(1, html), (2, None), (3, "<p></p>")],
                               "doc_id long, html string")
    out = {r["id"]: r for r in segment_html_blocks(df).collect()}
    r = out[1]
    assert r["n_content_blocks"] == 2
    assert r["main_text"].startswith(prose)
    assert "hidden" not in r["main_text"]
    assert "Home" not in r["main_text"]
    assert r["boiler_chars"] > 0
    assert r["main_chars"] == len(r["main_text"]) - 1  # joiner space
    # NULL html and empty blocks degrade to zero-row summaries
    assert out[2]["n_blocks"] == 0 and out[2]["main_text"] == ""
    assert out[3]["n_blocks"] == 0


def test_segment_html_blocks_shuffle_free(spark):
    from raven_spark.functions.text import segment_html_blocks

    df = spark.createDataFrame(
        [(i, f"<p>block {i} with enough text to count as real content here</p>")
         for i in range(20)],
        "doc_id long, html string",
    )
    q = segment_html_blocks(df)
    plan = q._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "EvalPython" not in plan
    assert q.count() == 20


def test_langid_confusion_rollup(spark):
    from raven_spark.functions.text import langid_confusion

    df = spark.createDataFrame(
        [
            (1, "en", "the quick brown fox and the lazy dog with some words"),
            (2, "en", "this is another english sentence with the usual words"),
            (3, "de", "der schnelle braune fuchs und die katze sind hier"),
            (4, "fr", "le renard brun rapide et le chien paresseux sont la"),
            (5, None, "unlabeled row must be excluded entirely"),
        ],
        "doc_id long, lang string, text string",
    )
    out = {(r["label"], r["pred"]): r for r in langid_confusion(df).collect()}
    assert sum(r["n"] for r in out.values()) == 4
    assert ("en", "en") in out and out[("en", "en")]["frac"] == 1.0
    # fractions per label sum to 1
    for lbl in {"en", "de", "fr"}:
        s = sum(r["frac"] for (l, _), r in out.items() if l == lbl)
        assert abs(s - 1.0) < 1e-6


def test_lang_id_tie_break_and_null(spark):
    """Documented contract: ties break to the alphabetically earlier
    language code; NULL/zero-hit text -> 'und'. (The fold previously
    inverted the tie-break; latent until a tie existed.)"""
    from pyspark.sql import functions as F

    from raven_spark.functions.text import lang_id_col

    df = spark.createDataFrame(
        [
            # one 'de' marker (der) and one 'en' marker (the): tie -> de
            (1, "der x the y"),
            (2, None),
            (3, "zzz qqq www"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["l"] for r in
           df.select("doc_id", lang_id_col(F.col("text")).alias("l")).collect()}
    assert out[2] == "und" and out[3] == "und"
    assert out[1] == "de", out[1]
