"""Batch HTML/PDF-payload → block-array parser (engine side, SPEC.md §1–3).

This is the hot Python path of the whole engine: it runs inside
``mapInArrow`` / scalar-iter ``pandas_udf`` workers over Arrow batches
(SURVEY.md §2 ops 11, 57, 60). Everything downstream of it (classification,
smoothing, span offsets, assembly) is pure JVM-side Spark SQL.

It is one of TWO independent implementations of SPEC.md — the other is the
frozen single-threaded ``ocr_spark.goldenref`` used to produce golden
fixtures. The byte-identity pytest gate (tests/test_golden.py) holds the two
together. Do not import goldenref here (and vice versa).

Scale notes (100 TB design point): per-document parsing is inherently
sequential Python, but it is embarrassingly parallel across documents and
amortized per Arrow batch; parser instances are recycled via
``HTMLParser.reset()`` to avoid per-doc allocation churn. MAX_BLOCKS caps
pathological documents so a single page can never blow up a task.
"""

from __future__ import annotations

import json
import re
from html.parser import HTMLParser

from ocr_spark import spec

_EDGE = ("good", "bad")  # classification edge labels (SPEC.md §2)

# --- charset sniffing (SPEC.md §0 step 2, v2) --------------------------------
# Real crawls carry a long legacy-encoded tail; decoding everything as UTF-8
# silently turns GBK/Shift-JIS/windows-125x pages into mojibake. BOM →
# first-1KiB charset declaration → strict-UTF-8 probe → latin-1, all stdlib.

_BOMS: tuple[tuple[bytes, str], ...] = (
    (b"\xef\xbb\xbf", "utf-8"),
    (b"\xff\xfe\x00\x00", "utf-32-le"),  # before utf-16-le (prefix overlap)
    (b"\x00\x00\xfe\xff", "utf-32-be"),
    (b"\xff\xfe", "utf-16-le"),
    (b"\xfe\xff", "utf-16-be"),
)

_CHARSET_RX = re.compile(r"charset\s*=\s*[\"']?\s*([a-z0-9_.:\-]+)")

# frozen label table (SPEC.md §0): WHATWG-inspired subset of encoding labels
# that stdlib codecs cover; utf-16/32 labels deliberately absent (BOM-only)
_ENC_LABELS: dict[str, str] = {}
for _codec, _labels in (
    ("utf-8", "utf-8 utf8 unicode-1-1-utf-8"),
    ("gbk", "gbk gb2312 gb_2312 gb_2312-80 csgb2312 x-gbk chinese"
            " iso-ir-58 csiso58gb231280"),
    ("gb18030", "gb18030"),
    ("big5", "big5 big5-hkscs csbig5 cn-big5 x-x-big5"),
    ("shift_jis", "shift_jis shift-jis sjis s_jis x-sjis ms_kanji"
                  " csshiftjis windows-31j ms932"),
    ("euc-jp", "euc-jp x-euc-jp cseucpkdfmtjapanese"),
    ("euc-kr", "euc-kr korean csksc56011987 ks_c_5601-1987 windows-949"),
    ("koi8-r", "koi8-r koi8_r cskoi8r koi8"),
    ("windows-1252", "iso-8859-1 iso8859-1 latin1 latin-1 l1 ascii"
                     " us-ascii"),
    ("iso-8859-2", "iso-8859-2 iso8859-2 latin2"),
    ("iso-8859-5", "iso-8859-5 iso8859-5 cyrillic"),
    ("iso-8859-7", "iso-8859-7 iso8859-7 greek greek8"),
    ("iso-8859-15", "iso-8859-15 iso8859-15 latin9"),
):
    for _lb in _labels.split():
        _ENC_LABELS[_lb] = _codec
for _x in range(9):
    for _pat in ("windows-125{}", "cp125{}", "x-cp125{}"):
        _ENC_LABELS[_pat.format(_x)] = f"windows-125{_x}"
del _codec, _labels, _lb, _x, _pat


def sniff_decode(raw: bytes) -> str:
    """Decode a page payload per the frozen SPEC.md §0 charset algorithm."""
    for bom, codec in _BOMS:
        if raw.startswith(bom):
            return raw[len(bom):].decode(codec, errors="replace")
    m = _CHARSET_RX.search(raw[:1024].decode("latin-1").lower())
    if m:
        codec = _ENC_LABELS.get(m.group(1))
        if codec is not None:
            return raw.decode(codec, errors="replace")
    try:
        return raw.decode("utf-8")
    except UnicodeDecodeError:
        return raw.decode("latin-1")


# SPEC.md §5.4–5.5 href normalization. A scheme prefix per RFC 3986.
_SCHEME_RX = re.compile(r"([A-Za-z][A-Za-z0-9+.\-]*):")
_HREF_STRIP = " \t\n\r\f\v"  # ASCII whitespace (not full Unicode str.strip)
_HREF_DEL = {9: None, 10: None, 13: None}  # TAB/LF/CR removed anywhere


def _norm_href(value: str | None) -> str | None:
    """Normalize a raw href attribute value; None = not a web outlink.

    Hot path (runs per anchor): the strip/translate/scheme work is guarded
    by cheap membership checks so the overwhelmingly common clean relative
    href ('/path') costs two `in` scans and one index.
    """
    if value is None:
        return None
    v = value
    if v[:1] in _HREF_STRIP or v[-1:] in _HREF_STRIP:
        v = v.strip(_HREF_STRIP)
    if "\t" in v or "\n" in v or "\r" in v:
        v = v.translate(_HREF_DEL)
    if not v or v[0] == "#":
        return None
    if ":" in v:
        m = _SCHEME_RX.match(v)
        if m and m.group(1).lower() in spec.SKIP_SCHEMES:
            return None
    return v


def _norm_meta_href(value: str | None) -> str | None:
    """SPEC §6.5 canonical-href normalization: §5.4 only (strip + TAB/LF/CR
    removal) — no fragment/scheme discards. None = not a candidate."""
    if value is None:
        return None
    v = value
    if v[:1] in _HREF_STRIP or v[-1:] in _HREF_STRIP:
        v = v.strip(_HREF_STRIP)
    if "\t" in v or "\n" in v or "\r" in v:
        v = v.translate(_HREF_DEL)
    return v or None


class _BlockParser(HTMLParser):
    """HTMLParser subclass implementing the SPEC.md §1 event rules."""

    __slots__ = (
        "stack",
        "skip_depth",
        "anchor_depth",
        "buf",
        "link_chars",
        "ctx_tag",
        "ctx_depth",
        "blocks",
        "stopset",
        "links",
        "link_href",
        "link_buf",
        "title_text",
        "title_open",
        "title_buf",
        "meta_desc",
        "meta_canon",
        "meta_og",
        "table_stack",
        "n_tables_opened",
        "tables",
    )

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self._reset_doc(frozenset())

    def _reset_doc(self, stopset: frozenset[str]) -> None:
        self.stack: list[str] = []
        self.skip_depth = 0
        self.anchor_depth = 0
        self.buf: list[str] = []
        self.link_chars = 0
        self.ctx_tag: str | None = None
        self.ctx_depth = 0
        self.blocks: list[dict] = []
        self.stopset = stopset
        self.links: list[dict] = []
        self.link_href: str | None = None
        self.link_buf: list[str] = []
        self.title_text: str | None = None  # None = title not yet claimed
        self.title_open = False
        self.title_buf: list[str] = []
        self.meta_desc: str | None = None
        self.meta_canon: str | None = None
        self.meta_og: str | None = None
        # SPEC §7: innermost-last stack of [table_id, row_counter, n_kept]
        self.table_stack: list[list[int]] = []
        self.n_tables_opened = 0
        self.tables: list[dict] = []

    # --- event handlers (SPEC.md §1, §5, §6, §7) -----------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in spec.BLOCK_TAGS:
            self._flush()
        if tag in spec.SKIP_TAGS and tag not in spec.VOID_TAGS:
            self.skip_depth += 1
        if tag == "a":
            self.anchor_depth += 1
            if self.skip_depth == 0:
                # SPEC §5.2: any <a> start implicitly closes the open link
                if self.link_href is not None:
                    self._finalize_link()
                href = None
                for k, v in attrs:
                    if k == "href":
                        href = v
                        break
                href = _norm_href(href)
                if href is not None:
                    self.link_href = href
        elif self.skip_depth == 0:
            if tag == "title":
                if self.title_text is None and not self.title_open:
                    self.title_open = True
            elif tag == "meta":
                self._meta_tag(attrs)
            elif tag == "link":
                self._link_tag(attrs)
        if self.skip_depth == 0:
            # SPEC §7.2/§7.3: table structure events
            if tag == "table":
                self.table_stack.append([self.n_tables_opened, -1, 0])
                self.n_tables_opened += 1
            elif tag == "tr" and self.table_stack:
                self.table_stack[-1][1] += 1
        if tag not in spec.VOID_TAGS:
            self.stack.append(tag)

    def handle_endtag(self, tag: str) -> None:
        if tag in spec.BLOCK_TAGS:
            self._flush()
        if tag in spec.SKIP_TAGS and self.skip_depth > 0:
            self.skip_depth -= 1
        if tag == "a":
            if self.anchor_depth > 0:
                self.anchor_depth -= 1
            if self.skip_depth == 0:
                self._finalize_link()
        elif tag == "title" and self.title_open and self.skip_depth == 0:
            self._close_title()
        if tag == "table" and self.skip_depth == 0 and self.table_stack:
            # SPEC §7.4: close the innermost open table
            self.table_stack.pop()
        stack = self.stack
        if tag in stack:
            # pop up to and including the last occurrence (implicit closes)
            idx = len(stack) - 1 - stack[::-1].index(tag)
            del stack[idx:]

    def handle_startendtag(self, tag: str, attrs) -> None:
        if tag in spec.BLOCK_TAGS:
            self._flush()
        if tag == "a" and self.skip_depth == 0:
            # SPEC §5.6: <a href=x/> opens and finalizes immediately
            self._finalize_link()
            href = _norm_href(next(
                (v for k, v in attrs if k == "href"), None
            ))
            if href is not None:
                self.link_href = href
                self._finalize_link()
        elif self.skip_depth == 0:
            # SPEC §6: <meta .../> and <link .../> carry metadata; a
            # self-closing <title/> is ignored (§6.2)
            if tag == "meta":
                self._meta_tag(attrs)
            elif tag == "link":
                self._link_tag(attrs)

    def handle_data(self, data: str) -> None:
        if self.skip_depth > 0 or not data:
            return
        if self.link_href is not None:
            self.link_buf.append(data)
        if self.title_open:
            self.title_buf.append(data)
        if self.ctx_tag is None and not data.isspace():
            tag = "body"
            for t in reversed(self.stack):
                if t in spec.BLOCK_TAGS:
                    tag = t
                    break
            self.ctx_tag = tag
            self.ctx_depth = len(self.stack)
        self.buf.append(data)
        if self.anchor_depth > 0:
            self.link_chars += len(" ".join(data.split()))

    # --- link emission (SPEC.md §5) -----------------------------------------
    def _finalize_link(self) -> None:
        if self.link_href is None:
            return
        if len(self.links) < spec.MAX_LINKS:
            buf = self.link_buf
            anchor = " ".join("".join(buf).split()) if buf else ""
            self.links.append(
                {
                    "link_id": len(self.links),
                    "href": self.link_href,
                    "anchor": anchor,
                }
            )
        self.link_href = None
        if self.link_buf:
            self.link_buf = []

    # --- metadata capture (SPEC.md §6) ---------------------------------------
    def _close_title(self) -> None:
        self.title_text = " ".join("".join(self.title_buf).split())
        self.title_open = False
        self.title_buf = []

    def _meta_tag(self, attrs) -> None:
        if self.meta_desc is not None and self.meta_og is not None:
            return
        # first OCCURRENCE of each attr wins, even when value-less (None):
        # a later valued duplicate must not override (SPEC §6.3 "first")
        first: dict = {}
        for k, v in attrs:
            if k not in first:
                first[k] = v
        name = first.get("name")
        prop = first.get("property")
        content = first.get("content")
        if content is None:
            return
        if (
            self.meta_desc is None
            and name is not None
            and name.strip(_HREF_STRIP).lower() == "description"
        ):
            self.meta_desc = " ".join(content.split())
        if (
            self.meta_og is None
            and prop is not None
            and prop.strip(_HREF_STRIP).lower() == "og:title"
        ):
            self.meta_og = " ".join(content.split())

    def _link_tag(self, attrs) -> None:
        if self.meta_canon is not None:
            return
        first: dict = {}
        for k, v in attrs:
            if k not in first:
                first[k] = v
        rel = first.get("rel")
        href = first.get("href")
        if rel is None or "canonical" not in (
            t.lower() for t in rel.split()
        ):
            return
        norm = _norm_meta_href(href)
        if norm is not None:
            self.meta_canon = norm

    def _finalize_meta(self) -> None:
        """End of document: close an unterminated title (SPEC §6.2)."""
        if self.title_open:
            self._close_title()

    def meta_result(self) -> dict:
        return {
            "title": self.title_text or "",
            "description": self.meta_desc or "",
            "canonical": self.meta_canon or "",
            "og_title": self.meta_og or "",
        }

    # --- block emission ----------------------------------------------------
    def _flush(self) -> None:
        if self.buf:
            text = " ".join("".join(self.buf).split())
            if text and len(self.blocks) < spec.MAX_BLOCKS:
                self.blocks.append(
                    _make_block(
                        len(self.blocks),
                        self.ctx_tag or "body",
                        self.ctx_depth,
                        text,
                        self.link_chars,
                        None,
                        self.stopset,
                    )
                )
            if text and self.table_stack:
                # SPEC §7.5: nearest structural tag decides cell membership
                near = None
                for t in reversed(self.stack):
                    if t in spec.TABLE_SCAN_TAGS:
                        near = t
                        break
                if (
                    near in ("td", "th")
                    and len(self.tables) < spec.MAX_TABLE_CELLS
                ):
                    top = self.table_stack[-1]
                    self.tables.append(
                        {
                            "table_id": top[0],
                            "row_id": top[1] if top[1] > 0 else 0,
                            "cell_id": top[2],
                            "header": near == "th",
                            "text": text,
                        }
                    )
                    top[2] += 1
            self.buf = []
        self.link_chars = 0
        self.ctx_tag = None
        self.ctx_depth = 0


# word -> is-stopword memo, one plain-string-keyed dict PER stopset (the
# frozensets in spec.STOPWORDS are stable module-level objects, so id() is a
# valid per-process key). Web text repeats words heavily, so this turns most
# lower()/strip()/set-lookup work into one dict get; selecting the sub-dict
# once per block instead of building a (sid, word) tuple per WORD removes a
# tuple allocation + tuple hash from the innermost loop — measured ~25% off
# the whole parse on the bench corpus. Bounded per set to keep long-lived
# reused Python workers from growing without limit.
_STOP_MEMOS: dict[int, dict[str, bool]] = {}
_STOP_MEMO_MAX = 1_000_000


def _make_block(
    block_id: int,
    tag: str,
    depth: int,
    text: str,
    link_chars: int,
    bbox: dict | None,
    stopset: frozenset[str],
) -> dict:
    """Compute SPEC.md §2 features for one normalized text block."""
    text_len = len(text)
    words = text.split(" ")
    n_words = len(words)
    punct = spec.PUNCT
    sid = id(stopset)
    memo = _STOP_MEMOS.get(sid)
    if memo is None:
        memo = _STOP_MEMOS.setdefault(sid, {})
    memo_get = memo.get
    n_stop = 0
    for w in words:
        hit = memo_get(w)
        if hit is None:
            hit = w.lower().strip(punct) in stopset
            if len(memo) < _STOP_MEMO_MAX:
                memo[w] = hit
        if hit:
            n_stop += 1
    ld = link_chars / text_len
    return {
        "block_id": block_id,
        "tag": tag,
        "depth": depth,
        "text": text,
        "text_len": text_len,
        "n_words": n_words,
        "n_link_chars": link_chars,
        "link_density": ld if ld < 1.0 else 1.0,
        "char_density": text_len / n_words,
        "stopword_density": n_stop / n_words,
        "bbox": bbox,
    }


def _pdf_blocks(obj: dict, stopset: frozenset[str]) -> list[dict]:
    """SPEC.md §3: column clustering + reading order for PDF-like payloads."""
    cleaned: list[tuple[float, float, float, float, str]] = []
    for b in obj.get("blocks") or []:
        if not isinstance(b, dict):
            continue
        try:
            x0 = float(b["x0"])
            y0 = float(b["y0"])
            x1 = float(b["x1"])
            y1 = float(b["y1"])
            text = " ".join(str(b["text"]).split())
        except (KeyError, TypeError, ValueError):
            continue
        if text:
            cleaned.append((x0, y0, x1, y1, text))
    if not cleaned:
        return []
    # single-linkage column clustering on x-interval overlap
    by_x = sorted(cleaned, key=lambda t: (t[0], t[1], t[2], t[4]))
    cols: dict[tuple, int] = {}
    col_id = -1
    cur_x1 = float("-inf")
    for t in by_x:
        if t[0] > cur_x1:
            col_id += 1
            cur_x1 = t[2]
        elif t[2] > cur_x1:
            cur_x1 = t[2]
        cols[t] = col_id
    reading = sorted(cleaned, key=lambda t: (cols[t], t[1], t[0], t[2], t[4]))
    out = []
    for i, (x0, y0, x1, y1, text) in enumerate(reading[: spec.MAX_BLOCKS]):
        out.append(
            _make_block(
                i, "pdfblock", 0, text, 0,
                {"x0": x0, "y0": y0, "x1": x1, "y1": y1},
                stopset,
            )
        )
    return out


# --- fast-path tokenizer ----------------------------------------------------
# A regex scanner for "simple" markup: no entities, no comments/doctype/PI,
# every `<` opening a plain tag. Measured ~2x end-to-end vs html.parser on
# template pages. It feeds the SAME _BlockParser handlers, and BAILS to
# html.parser on anything it cannot prove it tokenizes identically — the
# differential tests (fast vs forced-slow over the adversarial corpus and
# hypothesis-generated soup) hold the two tokenizations together.

# The name charset here is NARROWER than html.parser's tagfind_tolerant
# (`[a-zA-Z][^\t\n\r\f />\x00]*`), so the lookahead is load-bearing: a name
# that continues with a char outside [a-zA-Z0-9-] (e.g. `<o:p>`, `<div.cls>`
# — namespaced tags are common in Word-exported HTML) must FAIL the match and
# bail to html.parser, not be silently split into name + attrs (html.parser
# would take `o:p` as the whole tag name, changing block boundaries).
_SIMPLE_TAG = re.compile(
    r"<(/?)([a-zA-Z][a-zA-Z0-9-]*)(?=[\t\n\r\f />])"
    r"((?:[^<>\"']|\"[^\"<]*\"|'[^'<]*')*?)(/?)>"
)

# Strict attribute item for the fast path, parsed ONLY for <a> tags (the
# other tags' attributes are semantically ignored). Deliberately a SUBSET of
# html.parser's attrfind_tolerant: names must start with a letter, values
# must be cleanly quoted or quote/space/=-free. Anything the subset can't
# fully consume bails the document to html.parser — the same discipline the
# rest of the fast path uses for every ambiguity (fast and slow must agree
# byte-for-byte, so the fast path only handles what it can prove).
_FAST_ATTR = re.compile(
    r"\s+([a-zA-Z][a-zA-Z0-9_:.\-]*)"
    r"(?:\s*=\s*(\"[^\"]*\"|'[^']*'|[^\s\"'=<>`]+))?"
)


# the overwhelmingly common anchor shape gets a single-regex fast path
_ONLY_HREF = re.compile(r"\s+href\s*=\s*\"([^\"<]*)\"\s*$")


def _fast_attrs(raw: str) -> list[tuple[str, str | None]] | None:
    """Parse a fast-path attribute string; None = bail to html.parser.

    The fast path guarantees `raw` contains no '&' (charrefs bail earlier),
    so values need no unescaping — html.parser would produce the same text.
    """
    m = _ONLY_HREF.match(raw)
    if m is not None:
        return [("href", m.group(1))]
    out: list[tuple[str, str | None]] = []
    pos = 0
    n = len(raw)
    while pos < n:
        m = _FAST_ATTR.match(raw, pos)
        if m is None:
            return None if raw[pos:].strip() else out
        name, val = m.group(1), m.group(2)
        if val is not None and val[:1] in ('"', "'"):
            val = val[1:-1]
        out.append((name.lower(), val))
        pos = m.end()
    return out
# tags whose attributes carry frozen-SPEC state (§5 href, §6 metadata) —
# the fast path must parse their attrs instead of dropping them
_FAST_ATTR_TAGS = frozenset(("a", "meta", "link"))

# html.parser gives only <script>/<style> CDATA treatment
_CDATA_ELEMS = frozenset(("script", "style"))
_CDATA_CLOSE = {
    name: (
        re.compile(rf"</\s*{name}\s*>", re.IGNORECASE),
        re.compile(rf"</\s*{name}", re.IGNORECASE),
    )
    for name in _CDATA_ELEMS
}

# _CDATA_CLOSE mirrors CPython 3.11's set_cdata_mode pattern (`</\s*name`-
# style closers). CPython 3.13+ tightened it to `</name(?=[\t\n\r\f />])`;
# probe the running interpreter at import and, if the pattern ever differs,
# disable the CDATA fast path entirely (always bail to html.parser) rather
# than risk a silent fast/slow divergence after a Python upgrade.
def _cdata_fast_ok() -> bool:
    probe = HTMLParser()
    try:
        probe.set_cdata_mode("script")
        return probe.interesting.pattern == r"</\s*script\s*>"
    except Exception:
        return False


_CDATA_FAST = _cdata_fast_ok()


def _fast_scan(decoded: str, h: _BlockParser) -> bool:
    """Tokenize simple markup into handler events; False = use html.parser.

    May have emitted events before bailing — the caller must reset the
    handler before falling back.
    """
    if (
        "&" in decoded or "<!" in decoded or "<?" in decoded
        or "\x00" in decoded  # html.parser treats NUL-bearing tags as data
    ):
        return False
    pos = 0
    find = decoded.find
    match = _SIMPLE_TAG.match
    n = len(decoded)
    while True:
        lt = find("<", pos)
        if lt == -1:
            if pos < n:
                h.handle_data(decoded[pos:])
            return True
        if lt > pos:
            h.handle_data(decoded[pos:lt])
        m = match(decoded, lt)
        if m is None:
            return False  # bogus `<`: html.parser has bespoke tolerance
        closing, name, attrs, selfclose = m.groups()
        name = name.lower()
        if closing:
            if attrs.strip() or selfclose:
                return False  # `</p x>` is a bogus-comment in html.parser
            h.handle_endtag(name)
        elif selfclose:
            # `<a href=x/>`: html.parser folds the `/` into the unquoted
            # attribute value (NOT self-closing) — bail on that ambiguity
            if "=" in attrs and attrs.rstrip()[-1:] not in ('"', "'"):
                return False
            if name in _FAST_ATTR_TAGS and attrs.strip():
                parsed = _fast_attrs(attrs)
                if parsed is None:
                    return False
                h.handle_startendtag(name, parsed)
            else:
                h.handle_startendtag(name, ())
        else:
            if name in _FAST_ATTR_TAGS and attrs.strip():
                parsed = _fast_attrs(attrs)
                if parsed is None:
                    return False
                h.handle_starttag(name, parsed)
            else:
                h.handle_starttag(name, ())
            if name in _CDATA_ELEMS:
                if not _CDATA_FAST:
                    return False  # html.parser CDATA rules changed: bail
                close_rx, prefix_rx = _CDATA_CLOSE[name]
                mc = close_rx.search(decoded, m.end())
                mp = prefix_rx.search(decoded, m.end())
                if mc is None or mp is None or mp.start() != mc.start():
                    # unterminated or gnarly (`</script x>`) content
                    return False
                if mc.start() > m.end():
                    h.handle_data(decoded[m.end() : mc.start()])
                h.handle_endtag(name)
                pos = mc.end()
                continue
        pos = m.end()


_EMPTY_META = {
    "title": "", "description": "", "canonical": "", "og_title": "",
}


def parse_payload(
    html: bytes | None,
    lang: str | None,
    parser: _BlockParser | None = None,
    force_slow: bool = False,
) -> tuple[str, list[dict], list[dict], dict, list[dict]]:
    """Parse one page payload → (kind, blocks, links, meta, tables).
    SPEC.md §0 dispatch; meta per §6, tables per §7 (all-empty for
    pdf/empty payloads).

    ``force_slow`` disables the fast-path tokenizer (used by the
    differential tests that prove the two tokenizers agree).
    """
    if not html:
        return "empty", [], [], _EMPTY_META, []
    stopset = spec.stopword_set(lang)
    decoded = sniff_decode(html)
    stripped = decoded.lstrip()
    if stripped.startswith("{"):
        try:
            obj = json.loads(decoded)
        except (ValueError, RecursionError):
            obj = None
        if (
            isinstance(obj, dict)
            and obj.get("kind") == "pdf"
            and isinstance(obj.get("blocks"), list)
        ):
            return "pdf", _pdf_blocks(obj, stopset), [], _EMPTY_META, []
    if parser is None:
        parser = _BlockParser()
    parser.reset()  # HTMLParser internal state
    parser._reset_doc(stopset)
    if not force_slow and _fast_scan(decoded, parser):
        parser._flush()
        parser._finalize_link()
        parser._finalize_meta()
        return (
            "html", parser.blocks, parser.links, parser.meta_result(),
            parser.tables,
        )
    parser.reset()  # discard any partial fast-path events
    parser._reset_doc(stopset)
    try:
        parser.feed(decoded)
        parser.close()
    except Exception:
        # html.parser is tolerant, but guard the 100 TB run anyway:
        # a pathological page yields whatever was flushed so far.
        pass
    parser._flush()
    parser._finalize_link()
    parser._finalize_meta()
    return (
        "html", parser.blocks, parser.links, parser.meta_result(),
        parser.tables,
    )


def parse_batch(
    htmls: list[bytes | None], langs: list[str | None]
) -> tuple[
    list[str], list[list[dict]], list[list[dict]], list[dict],
    list[list[dict]],
]:
    """Parse an Arrow batch of payloads; reuses one parser instance."""
    parser = _BlockParser()
    kinds: list[str] = []
    blocks: list[list[dict]] = []
    links: list[list[dict]] = []
    metas: list[dict] = []
    tables: list[list[dict]] = []
    for html, lang in zip(htmls, langs):
        k, b, ln, m, tb = parse_payload(html, lang, parser)
        kinds.append(k)
        blocks.append(b)
        links.append(ln)
        metas.append(m)
        tables.append(tb)
    return kinds, blocks, links, metas, tables


_BLOCK_FIELDS = (
    "block_id", "tag", "depth", "text", "text_len", "n_words",
    "n_link_chars", "link_density", "char_density", "stopword_density",
)


def parse_batch_columnar(
    htmls: list[bytes | None], langs: list[str | None]
) -> tuple[
    list[str], list[int], dict[str, list], list[bool],
    list[int], list[str], list[str], dict[str, list],
    list[int], dict[str, list],
]:
    """Parse a batch into FLAT columns + list offsets for zero-inference
    Arrow construction.

    ``pa.array`` over list-of-dicts walks Python objects with per-value type
    dispatch; building primitive columns + ``StructArray.from_arrays`` +
    ``ListArray.from_arrays`` measured ~2x faster end-to-end in the
    mapInArrow worker. Returns (kinds, offsets, columns, bbox_is_null,
    link_offsets, hrefs, anchors, meta_cols) where offsets/link_offsets
    have len(htmls)+1 entries and each flat column is the concatenation
    over all documents in order (links per SPEC.md §5; link_id is implicit
    — the position within a document's slice; meta_cols per SPEC.md §6,
    one value per document; table cell fragments per SPEC.md §7 as
    (table_offsets, table_cols), same flat layout as links).
    """
    parser = _BlockParser()
    kinds: list[str] = []
    offsets: list[int] = [0]
    cols: dict[str, list] = {f: [] for f in _BLOCK_FIELDS}
    cols.update({"x0": [], "y0": [], "x1": [], "y1": []})
    bbox_null: list[bool] = []
    link_offsets: list[int] = [0]
    hrefs: list[str] = []
    anchors: list[str] = []
    meta_cols: dict[str, list] = {
        f: [] for f in ("title", "description", "canonical", "og_title")
    }
    table_offsets: list[int] = [0]
    table_cols: dict[str, list] = {
        f: [] for f in ("table_id", "row_id", "cell_id", "header", "text")
    }
    appenders = [(f, cols[f].append) for f in _BLOCK_FIELDS]
    x0a, y0a, x1a, y1a = (
        cols["x0"].append, cols["y0"].append, cols["x1"].append,
        cols["y1"].append,
    )
    bna = bbox_null.append
    n = 0
    nl = 0
    nt = 0
    for html, lang in zip(htmls, langs):
        kind, blocks, links, meta, tabs = parse_payload(html, lang, parser)
        kinds.append(kind)
        n += len(blocks)
        offsets.append(n)
        nl += len(links)
        link_offsets.append(nl)
        for lk in links:
            hrefs.append(lk["href"])
            anchors.append(lk["anchor"])
        for f, vals in meta_cols.items():
            vals.append(meta[f])
        nt += len(tabs)
        table_offsets.append(nt)
        for tc in tabs:
            for f, vals in table_cols.items():
                vals.append(tc[f])
        for b in blocks:
            for f, app in appenders:
                app(b[f])
            bbox = b["bbox"]
            if bbox is None:
                bna(True)
                x0a(None); y0a(None); x1a(None); y1a(None)
            else:
                bna(False)
                x0a(bbox["x0"]); y0a(bbox["y0"])
                x1a(bbox["x1"]); y1a(bbox["y1"])
    return (
        kinds, offsets, cols, bbox_null, link_offsets, hrefs, anchors,
        meta_cols, table_offsets, table_cols,
    )
