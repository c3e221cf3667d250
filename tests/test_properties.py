"""Property-based + adversarial tests (SURVEY.md §5.3, verify-skill probes).

Two layers:

1. hypothesis over the pure-Python golden reference (fast, hundreds of
   examples): generated pages with KNOWN content blocks round-trip exactly.
2. differential fuzz between the two independent implementations: the Spark
   pipeline must byte-match goldenref on a seeded corpus of adversarial and
   randomly structured documents (deep nesting, MAX_BLOCKS overflow, random
   bytes, malformed markup/JSON, NaN bboxes, null payloads).
"""

from __future__ import annotations

import json
import random

from hypothesis import given, settings
from hypothesis import strategies as st

from ocr_spark import spec
from ocr_spark.goldenref import extract_document

# stopword-rich filler: guarantees stopword_density >= STOP_GOOD
_STOP_FILLER = "the is a of to in and it with for"


def _content_para(words: list[str]) -> str:
    # prepend filler so the block is long (>= LEN_SHORT) and 'good'
    return f"{_STOP_FILLER} {' '.join(words)}" if words else _STOP_FILLER


_word = st.text(
    alphabet="abcdefghijklmnopqrstuvwxyz0123456789", min_size=1, max_size=10
)


@settings(max_examples=200, deadline=None)
@given(
    paras=st.lists(st.lists(_word, max_size=8), min_size=1, max_size=6),
    n_nav_links=st.integers(min_value=1, max_value=8),
    lang=st.sampled_from(["en", "de", "xx", None]),
)
def test_generator_roundtrip_goldenref(paras, n_nav_links, lang):
    """Pages built from known content paragraphs + link-only boilerplate
    extract to exactly those paragraphs, regardless of structure knobs."""
    texts = [_content_para(w) for w in paras]
    nav = "".join(f'<a href="/x{i}">link {i} here</a> ' for i in range(n_nav_links))
    html = (
        "<html><body><nav>" + nav + "</nav>"
        + "".join(f"<p>{t}</p>" for t in texts)
        + '<footer><a href="/t">terms page</a></footer></body></html>'
    ).encode("utf-8")
    # NOTE: content paras use "en" filler; classification thresholds only
    # guarantee 'good' when the stopword list matches — so pin stopwords by
    # choosing langs that fall back to en ("xx"/None) or are en itself,
    # plus "de" to prove boilerplate stays boilerplate under any list.
    got = extract_document("u", html, lang)
    if lang in ("en", "xx", None):
        expected = spec.SEP.join(" ".join(t.split()) for t in texts)
        assert got["extracted_text"] == expected
    # link-farm nav/footer never leak into content in any language
    assert "link 0 here" not in got["extracted_text"]
    assert "terms page" not in got["extracted_text"]


@settings(max_examples=200, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(min_value=0, max_value=600, allow_nan=False),
            st.floats(min_value=0, max_value=800, allow_nan=False),
            st.floats(min_value=1, max_value=300, allow_nan=False),
            st.floats(min_value=1, max_value=100, allow_nan=False),
            st.lists(_word, min_size=1, max_size=6),
        ),
        max_size=12,
    )
)
def test_pdf_payloads_never_crash_and_keep_all_text(boxes):
    """Any finite bbox soup extracts every block's text exactly once
    (pdf payloads are all-content; grouping is a permutation)."""
    payload = {
        "kind": "pdf",
        "blocks": [
            {
                "text": " ".join(w),
                "x0": x, "y0": y, "x1": x + dx, "y1": y + dy,
            }
            for (x, y, dx, dy, w) in boxes
        ],
    }
    got = extract_document("u", json.dumps(payload).encode(), "en")
    expected_texts = sorted(" ".join(w.split()) for (_, _, _, _, ws) in [
        (x, y, dx, dy, " ".join(ws)) for (x, y, dx, dy, ws) in boxes
    ] for w in [ws] if w)
    got_texts = sorted(
        t for t in got["extracted_text"].split(spec.SEP) if t
    ) if got["extracted_text"] else []
    assert got_texts == expected_texts


def _random_doc(rng: random.Random) -> bytes:
    """Seeded adversarial html: random tag soup, entities, malformed bits."""
    tags = ["div", "p", "span", "a", "li", "ul", "table", "td", "script",
            "style", "h1", "nav", "foo", "bar-baz", "br", "img", "a", "a"]
    out = []
    depth = 0
    for _ in range(rng.randint(1, 60)):
        r = rng.random()
        if r < 0.35 and depth < 30:
            t = rng.choice(tags)
            attr = ' class="x" data-k="v"' if rng.random() < 0.3 else ""
            if t == "a" and rng.random() < 0.8:
                # fuzz the SPEC §5 href surface: quoted/unquoted/valueless,
                # whitespace soup, discard schemes, fragments, self-closing
                attr += rng.choice([
                    ' href="/x/1"', " href=/unquoted", ' href=""',
                    " href", ' href="#frag"', ' href="javascript:v(1)"',
                    ' href="MAILTO:a@b"', ' href=" \t/ws\npath "',
                    ' href="https://h.example/p?q=1"', ' HREF="/caps"',
                    ' href="//proto.rel/x"', ' id="z" href="/second-attr"',
                    ' href="tel:+1"', ' href="data:text/plain,x"',
                ])
                if rng.random() < 0.15:
                    out.append(f"<{t}{attr}/>")
                    continue
            out.append(f"<{t}{attr}>")
            depth += 1
        elif r < 0.55 and depth > 0:
            out.append(f"</{rng.choice(tags)}>")
            depth -= 1
        elif r < 0.6:
            out.append(rng.choice(["<!-- c -->", "<![CDATA[zz]]>", "<?pi?>",
                                   "&amp;", "&#100;", "&unknown;", "<",
                                   "</", "<>", "< p>"]))
        else:
            n = rng.randint(1, 25)
            words = [
                rng.choice(["the", "is", "of", "data", "engine", "xyzzy",
                            "qwerty", "123", "a"])
                for _ in range(n)
            ]
            out.append(" ".join(words))
    return "".join(out).encode("utf-8")


def _adversarial_corpus() -> list[tuple[str, bytes | None, str | None]]:
    rng = random.Random(1234)
    docs: list[tuple[str, bytes | None, str | None]] = [
        ("deep-nesting", b"<div>" * 30000 + b"the data is here of it and the rest"
         + b"</div>" * 30000, "en"),
        ("max-blocks-overflow",
         b"".join(b"<p>the data of it is block %d and more</p>" % i
                  for i in range(3000)), "en"),
        ("pdf-nan-bbox",
         b'{"kind":"pdf","blocks":[{"text":"ok here","x0":NaN,"y0":0,'
         b'"x1":10,"y1":5},{"text":"two blk","x0":0,"y0":1,"x1":4,"y1":2}]}',
         "en"),
        ("pdf-inf-bbox",
         b'{"kind":"pdf","blocks":[{"text":"inf blk","x0":-Infinity,"y0":0,'
         b'"x1":Infinity,"y1":5}]}', "en"),
        ("json-deep", b"[" * 5000 + b"]" * 5000, "en"),
        ("huge-attr", b'<p x="' + b"a" * 100000 + b'">the data of it is fine</p>',
         "en"),
        ("null-payload", None, None),
        ("only-brs", b"<br><br/><br >", "en"),
    ]
    for i in range(120):
        docs.append((f"fuzz-{i}", _random_doc(rng), rng.choice(
            ["en", "de", "es", "fr", "zh", "xx", None]
        )))
    for i in range(20):
        blob = bytes(rng.randrange(256) for _ in range(rng.randint(1, 4000)))
        docs.append((f"bytes-{i}", blob, "en"))
    return docs


def test_differential_fuzz_spark_equals_goldenref(spark):
    """The distributed pipeline and the frozen single-threaded reference are
    independent implementations of SPEC.md — they must byte-agree on the
    whole adversarial corpus (MAX_BLOCKS cap, depth, junk bytes included)."""
    import datetime as dt

    from ocr_spark.operators.extract import extract_pages
    from ocr_spark.schemas import PAGES_SCHEMA

    corpus = _adversarial_corpus()
    golden = {
        name: extract_document(name, html, lang) for name, html, lang in corpus
    }
    rows = [
        {
            "url": name,
            "warc_ts": dt.datetime(2024, 1, 1),
            "html": html,
            "text": None,
            "lang": lang,
        }
        for name, html, lang in corpus
    ]
    df = spark.createDataFrame(rows, schema=PAGES_SCHEMA).repartition(16)
    got = {r.url: r for r in extract_pages(df).collect()}
    assert len(got) == len(golden)
    for name, g in golden.items():
        r = got[name]
        assert r.extracted_text == g["extracted_text"], name
        assert r.text_sha256 == g["text_sha256"], name
        assert r.n_blocks == g["n_blocks"], name
        assert [(s.block_id, s.start, s.end) for s in r.spans] == [
            (s["block_id"], s["start"], s["end"]) for s in g["spans"]
        ], name
    # the cap actually engaged
    assert golden["max-blocks-overflow"]["n_blocks"] == spec.MAX_BLOCKS


def test_differential_fuzz_links_spark_equals_goldenref(spark):
    """SPEC §5 differential over the same adversarial corpus: the pipeline's
    outlink product must equal the frozen reference's links exactly —
    href bytes, anchor bytes, link_id order — including on tag soup,
    junk-byte payloads and fuzzy href shapes."""
    import datetime as dt

    from ocr_spark.operators.extract import extract_outlinks
    from ocr_spark.schemas import PAGES_SCHEMA

    corpus = _adversarial_corpus()
    golden = {
        name: extract_document(name, html, lang)["links"]
        for name, html, lang in corpus
    }
    rows = [
        {
            "url": name,
            "warc_ts": dt.datetime(2024, 1, 1),
            "html": html,
            "text": None,
            "lang": lang,
        }
        for name, html, lang in corpus
    ]
    df = spark.createDataFrame(rows, schema=PAGES_SCHEMA).repartition(16)
    got: dict = {name: [] for name, _, _ in corpus}
    for r in extract_outlinks(df).collect():
        got[r.url].append((r.link_id, r.href, r.anchor))
    n_links = 0
    for name, want in golden.items():
        have = sorted(got[name])
        expect = [(lk["link_id"], lk["href"], lk["anchor"]) for lk in want]
        assert have == expect, name
        n_links += len(expect)
    assert n_links > 30  # the fuzz surface actually generated links


# --- charset sniffer differential (SPEC.md §0 step 2 v2, round 4) ------------
# The two decoders are written independently (regex scan vs manual scan);
# these pin them byte-identical across the BOM / declaration / probe /
# fallback arms on arbitrary bytes, not just the golden corpus.

_SNIFF_LABELS = [
    "gbk", "gb2312", "big5", "shift_jis", "sjis", "euc-jp", "euc-kr",
    "koi8", "koi8-r", "windows-1251", "cp1252", "iso-8859-1", "latin1",
    "utf-8", "x-unknown-enc", "utf-16le",  # last two must fall through
]


@settings(max_examples=300, deadline=None)
@given(raw=st.binary(max_size=2000))
def test_sniff_decode_implementations_agree_on_raw_bytes(raw):
    from ocr_spark.goldenref import _sniff_decode
    from ocr_spark.html_blocks import sniff_decode

    assert sniff_decode(raw) == _sniff_decode(raw)


@settings(max_examples=300, deadline=None)
@given(
    label=st.sampled_from(_SNIFF_LABELS),
    quote=st.sampled_from(['', '"', "'"]),
    ws=st.sampled_from(["", " ", "  ", "\t"]),
    prefix=st.binary(max_size=200),
    body=st.binary(max_size=500),
    bom=st.sampled_from([b"", b"\xef\xbb\xbf", b"\xff\xfe", b"\xfe\xff",
                         b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff"]),
)
def test_sniff_decode_agrees_on_synthesized_declarations(
    label, quote, ws, prefix, body, bom
):
    from ocr_spark.goldenref import _sniff_decode
    from ocr_spark.html_blocks import sniff_decode

    decl = f"<meta charset{ws}={ws}{quote}{label}{quote}>".encode("ascii")
    raw = bom + prefix + decl + body
    assert sniff_decode(raw) == _sniff_decode(raw)


def _random_table_doc(rng: random.Random) -> bytes:
    """Seeded §7/§6-focused tag soup: table structure events (tr/td/th,
    section tags, captions, forms, nesting, self-closing, svg skips, span
    attributes, stray text) interleaved with metadata surface (title,
    meta name/property/content, link rel/href) — the torture the round-5
    golden families pin one case at a time, fuzzed in combination."""
    out = []
    struct_tags = ["table", "tr", "td", "th", "tbody", "thead", "tfoot",
                   "caption", "form", "div", "svg"]
    metas = [
        '<title>fuzz title</title>', '<title/>',
        '<title>second title</title>',
        '<meta name=description content="fuzz desc">',
        '<meta name=" Description " content=dq>',
        '<meta property="og:title" content="fuzz og">',
        '<meta name=description property="og:title" content="both">',
        '<meta name=description>', '<meta content="valueless name">',
        '<link rel=canonical href="/c1">',
        '<link rel="alternate canonical" href=" /c2 ">',
        '<link rel=canonical href="">', '<link rel=canonical>',
    ]
    for _ in range(rng.randint(1, 50)):
        r = rng.random()
        if r < 0.32:
            t = rng.choice(struct_tags)
            attr = ""
            if t in ("td", "th") and rng.random() < 0.5:
                attr = rng.choice(
                    [' colspan=2', ' rowspan="3"', " COLSPAN='02'",
                     ' colspan="2>"', ' title="a>b"', ' colspan']
                )
            if rng.random() < 0.12:
                out.append(f"<{t}{attr}/>")
            else:
                out.append(f"<{t}{attr}>")
        elif r < 0.44:
            # a guaranteed-productive well-formed row, dropped INTO the
            # surrounding soup (so misnesting context still applies)
            out.append(
                f"<tr><td>kept {rng.randint(0, 99)}</td>"
                f"<th>head {rng.randint(0, 99)}</th></tr>"
            )
        elif r < 0.62:
            out.append(f"</{rng.choice(struct_tags)}>")
        elif r < 0.70:
            out.append(rng.choice(metas))
        elif r < 0.75:
            out.append(rng.choice(["&amp;", "&#65;", "<!-- x -->", "</",
                                   "&lt;td&gt;"]))
        else:
            n = rng.randint(1, 8)
            out.append(" ".join(
                rng.choice(["the", "cell", "of", "data", "row", "42", " "])
                for _ in range(n)
            ))
    # half the docs start inside an open table so row snippets attach
    prefix = "<table>" if rng.random() < 0.5 else ""
    return (prefix + "".join(out)).encode("utf-8")


def test_differential_fuzz_tables_meta_spark_equals_goldenref(spark):
    """SPEC §6/§7 differential over table/metadata tag soup: the
    pipeline's cell-fragment and metadata products must equal the frozen
    reference exactly — ids, header flags, cell bytes, field claims —
    including misnested/self-closing structure, span-attribute noise,
    '>' inside quoted attributes, and skip-region ghosts. (The golden
    corpus pins these one named case at a time; this fuzzes them in
    combination, 150 seeded docs.)"""
    import datetime as dt

    from ocr_spark.operators.extract import extract_metadata, extract_tables
    from ocr_spark.schemas import PAGES_SCHEMA

    rng = random.Random(987)
    corpus = [(f"tfuzz-{i}", _random_table_doc(rng), "en")
              for i in range(150)]
    golden = {
        name: extract_document(name, html, lang)
        for name, html, lang in corpus
    }
    rows = [
        {"url": name, "warc_ts": dt.datetime(2024, 1, 1), "html": html,
         "text": None, "lang": lang}
        for name, html, lang in corpus
    ]
    df = spark.createDataFrame(rows, schema=PAGES_SCHEMA).repartition(16)
    got_cells: dict = {name: [] for name, _, _ in corpus}
    for r in extract_tables(df).collect():
        got_cells[r.url].append(
            (r.table_id, r.row_id, r.cell_id, r.header, r.cell_text)
        )
    got_meta = {
        r.url: {"title": r.title, "description": r.description,
                "canonical": r.canonical, "og_title": r.og_title}
        for r in extract_metadata(df).collect()
    }
    n_frags = 0
    for name, g in golden.items():
        want = [(c["table_id"], c["row_id"], c["cell_id"], c["header"],
                 c["text"]) for c in g["tables"]]
        assert sorted(got_cells[name]) == sorted(want), name
        assert got_meta[name] == g["meta"], name
        n_frags += len(want)
    # the fuzz actually exercises the surface (not all-empty docs)
    assert n_frags > 100
    assert sum(1 for g in golden.values() if g["meta"]["title"]) > 10
