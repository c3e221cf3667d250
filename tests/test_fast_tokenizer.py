"""Fast-path vs html.parser tokenizer equivalence.

The fast scanner may only produce output when it tokenizes EXACTLY like
html.parser; anything else must bail to the slow path. These tests compare
``parse_payload`` with and without ``force_slow`` over every corpus we have:
fixtures, the adversarial fuzz corpus, hypothesis-generated tag soup, and a
targeted list of tricky constructs (the documented bail conditions).
"""

from __future__ import annotations

import random

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark.html_blocks import parse_payload

TRICKY = [
    b"<p>a &amp; b</p>",                      # entities -> bail
    b"<!-- c --><p>the data of it</p>",       # comment -> bail
    b"<!DOCTYPE html><p>the data of it</p>",
    b"<?xml version='1'?><p>x</p>",
    b"<p a='>'>quoted gt</p>",
    b'<p a=">">quoted gt</p>',
    b"<a href=/x/>unquoted self-close ambiguity</a>",
    b"<br/><br /><img src='x'/>",
    b"</p x>bogus end tag</p>",
    b"<script>var a = 1 < 2;</script><p>the data of it stays</p>",
    b"<script>'</p>'</script><p>the data of it</p>",   # cdata containing markup
    b"<script x>unclosed",
    # closer variants: space/tab/lead-space forms DO close per html.parser's
    # endtagfind; `</script x>` / `</script/>` do NOT (3.11 swallows the
    # rest as unterminated CDATA) — fast and slow paths must agree on both
    b"<script>a()</script ><p>the data of it</p>",
    b"<style>p{}</style\t><p>the data of it</p>",
    b"<script>b()</ script><p>the data of it</p>",
    b"<script>c()</script x><p>never seen</p>",
    b"<script>d()</script/><p>never seen</p>",
    b"<style>p{color:red}</style><p>the data of it</p>",
    b"<SCRIPT>UP</SCRIPT><P>the upper case of it</P>",
    b"<script></scriptx></script><p>x</p>",
    b"< p>not a tag</p>",
    b"<p>trailing lt <",
    b"<p>lone > gt</p>",
    b"<foo-bar>custom of the element</foo-bar>",
    b"<p\x00nul>weird</p>",
    b"<p title='it''s'>quote soup</p>",
    b"<td>cell</td></tr>stray closes</table>",
    b"<ul><li>the item of it<li>implicit close</ul>",
    # tag names outside [a-zA-Z0-9-]: html.parser takes the full run as the
    # name (`p:x`), so the fast path must bail, not split into name + attrs
    b"<p:x>a<p>the data of it</p>",
    b"<o:p>the word of it</o:p><p>the data of it</p>",
    b"<div.cls>a<div>the data of it</div>",
    b"<a:b href='x'>ns link</a:b><a href='/y'>real link</a>",
    b"<P=>odd</P=><p>the data of it</p>",
    b"<p_u>under</p_u><p>the data of it</p>",
]


def _sig(html: bytes, lang: str | None):
    kind, blocks, links, meta, tables = parse_payload(html, lang)
    return kind, [
        (b["block_id"], b["tag"], b["depth"], b["text"], b["n_link_chars"],
         b["stopword_density"]) for b in blocks
    ], links, meta, tables


def _sig_slow(html: bytes, lang: str | None):
    kind, blocks, links, meta, tables = parse_payload(
        html, lang, force_slow=True
    )
    return kind, [
        (b["block_id"], b["tag"], b["depth"], b["text"], b["n_link_chars"],
         b["stopword_density"]) for b in blocks
    ], links, meta, tables


def test_tricky_constructs_agree():
    for html in TRICKY:
        assert _sig(html, "en") == _sig_slow(html, "en"), html


def test_fixture_corpus_agrees():
    from ocr_spark.gen import fixture_pages

    for page in fixture_pages():
        assert _sig(page["html"], page["lang"]) == _sig_slow(
            page["html"], page["lang"]
        ), page["url"]


def test_adversarial_corpus_agrees():
    from tests.test_properties import _adversarial_corpus

    for name, html, lang in _adversarial_corpus():
        assert _sig(html, lang) == _sig_slow(html, lang), name


_CHUNK = st.sampled_from(
    ["<p>", "</p>", "<div>", "</div>", "<a href='/x'>", "</a>", "<br/>",
     "<br />", "<script>", "</script>", "<style>", "</style>", "<!-- z -->",
     "&amp;", "&", "<", ">", "</", "<>", "< q>", "'", '"', "=", "/>",
     "the of it is", "xyzzy 123", " ", "<img src=x/>", "<p a='>'>",
     "</p x>", "<FOO>", "</foo>", "\x00", "é", "中文",
     "<p:x>", "</p:x>", "<o:p>", "<div.cls>", "<P=>",
     # CDATA closer variants: valid (space/tab/after-slash forms) and the
     # attr-bearing one that 3.11 treats as NOT closing (swallow mode)
     "</script >", "</ script>", "</style\t>", "</script x>", "</script/>",
     "<w:sdt>", "</w:sdt>",
     # SPEC §6 metadata surface (title capture, meta/link attr parsing)
     "<title>", "</title>", "<title/>", "<meta name=description content=d>",
     '<meta name="description" content="d d">', "<meta content=c>",
     '<meta property="og:title" content="o">', "<link rel=canonical href=/c>",
     '<link rel="alternate canonical" href=" /c ">', "<link rel=canonical>",
     "<meta name=description>", "<svg>", "</svg>"]
)


@settings(max_examples=300, deadline=None)
@given(st.lists(_CHUNK, max_size=30))
def test_hypothesis_soup_agrees(chunks):
    html = "".join(chunks).encode("utf-8")
    assert _sig(html, "en") == _sig_slow(html, "en"), html


def test_fast_path_actually_taken():
    """Guard against the fast path silently bailing on the mainline shape."""
    from ocr_spark.html_blocks import _BlockParser, _fast_scan

    p = _BlockParser()
    assert _fast_scan(
        '<html><body><nav><a href="/a">x</a></nav><p>the data of it</p>'
        "</body></html>", p,
    )
    p2 = _BlockParser()
    assert _fast_scan(
        "<style>p{}</style><script>1 &lt; 2</script>".replace("&lt;", "x"),
        p2,
    )
