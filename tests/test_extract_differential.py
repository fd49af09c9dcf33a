"""extract_text hot path vs the reference state machine (the pinned spec).

The corpus golden `text` column and the fetch stage both call
extract_text; _extract_text_reference is the original tag-by-tag loop.
Byte-identical equivalence IS the input_hint invariant's foundation."""

from __future__ import annotations

import numpy as np

from raven_spark.functions.text import _extract_text_reference, extract_text
from raven_spark.sources.corpus import _gen_batch

EDGE_CASES = [
    "", "plain text", "<p>a</p>", "a <b>bold</b> c", "<script>x=1</script>hi",
    "<head><title>T</title><style>s</style></head><body>B</body>",
    "<SCRIPT>a</SCRIPT>ok", "<script>never closed", "<style >x</style >y",
    "<script src='a>b'>code</script>tail", "<p>&amp; &lt; &#65; &#x42; &bogus;</p>",
    "<div><ul><li>x</li></ul></div>", "<br>line<br/>two", "<pre>  spaced  </pre>",
    "<noscript><p>alt</p></noscript>after", "<template><h1>t</h1></template>z",
    '<p class="x>y">attr trap</p>', "text < not a tag >", "<p>unclosed",
    "<head><script>s</script><title>T</title></head>B",
    '<a href="u">link</a>', "<P>UPPER</P>", "<pre>p</pre><p>q</p>",
    "<h1>h</h1><h6>i</h6><hr>", "<td>c</td><th>d</th><tr></tr><table></table>",
    "<script>a</script><script>b</script>c", "<style>p{color:<red>}</style>q",
    "<!-- <script> -->safe", "<!doctype html>x", "<?pi ?>y",
    "a\tb\r\nc \n\n d", " \n \n ", "x \v y \f z",
]


def test_edge_cases_match_reference():
    for c in EDGE_CASES:
        assert extract_text(c) == _extract_text_reference(c), repr(c)


def test_corpus_pages_match_reference():
    pdf = _gen_batch(np.arange(150, dtype=np.uint64), 5000, 50, seed=42, size_factor=3)
    cs_map = {"shift_jis": "shift_jis", "euc-jp": "euc_jp",
              "windows-1251": "cp1251", "utf-8": "utf-8"}
    for html_b, cs in zip(pdf["html"], pdf["charset"]):
        s = bytes(html_b).decode(cs_map[cs], "replace")
        assert extract_text(s) == _extract_text_reference(s)


def test_malformed_long_tags_linear_and_equal():
    # possessive attr grammar: unterminated tags must (a) still match the
    # spec byte-for-byte and (b) fail in linear time — char-wise
    # backtracking here cost ~4ms per 20k-char junk tag before
    import time

    cases = [
        "<a " + "x" * 20000,                    # unterminated tag, no quotes
        '<a href="' + "y" * 20000,              # unterminated quote
        "<a " + 'b="c" ' * 3000,                # many quoted attrs, no close
        "pre<div " + "z" * 10000 + ">post",     # eventually closes
    ]
    t0 = time.perf_counter()
    for c in cases:
        assert extract_text(c) == _extract_text_reference(c), c[:40]
    assert time.perf_counter() - t0 < 2.0  # generous; was O(n^2)-ish before


def test_fuzz_match_reference():
    rng = np.random.default_rng(7)
    alphabet = list("<>/ab cp&#;\"'=!-x\n\theadscriptstyle")
    for _ in range(3000):
        s = "".join(rng.choice(alphabet, size=rng.integers(0, 150)))
        assert extract_text(s) == _extract_text_reference(s), repr(s)
