"""Frozen extraction constants — the single source of truth for SPEC.md.

Both the golden reference (`ocr_spark.goldenref`) and the Spark pipeline
(`ocr_spark.html_blocks`, `ocr_spark.operators.extract`) read these values.
Changing anything here is a breaking spec change: regenerate goldens with
``python scripts/make_goldens.py`` and expect the byte-identity gate
(tests/test_golden.py) to flag every affected fixture.

Provenance: reference repo dun933/ocr was unavailable (empty checkout, see
SURVEY.md §0); thresholds are jusText/Boilerpipe-inspired per
BASELINE.json's north_star and frozen here as the reference spec.
"""

from __future__ import annotations

# --- separators / limits -------------------------------------------------
SEP = "\n"  # joins content blocks into extracted_text (byte-identity gate)
MAX_BLOCKS = 2000  # per-document block cap (spill/skew guard at 100 TB)

# --- outlinks (SPEC.md §5) -------------------------------------------------
MAX_LINKS = 1000  # per-document outlink cap (link-farm guard)
# hrefs with these schemes are not web outlinks and are discarded
SKIP_SCHEMES = frozenset(("javascript", "mailto", "data", "tel"))

# --- tables (SPEC.md §7) ----------------------------------------------------
MAX_TABLE_CELLS = 500  # per-document cell-fragment cap (scraped-grid guard)
# at flush time the nearest of these decides cell membership (§7.5)
TABLE_SCAN_TAGS = frozenset(("td", "th", "tr", "table"))

# --- classification thresholds (SPEC.md §2) ------------------------------
MAX_LINK_DENSITY = 0.33
LEN_SHORT = 20
STOP_GOOD = 0.30
STOP_NEAR = 0.15

# token cleanup before stopword membership
PUNCT = ".,;:!?\"'()[]{}"

# --- tag sets (SPEC.md §1) ------------------------------------------------
BLOCK_TAGS = frozenset(
    """address article aside blockquote body br caption dd div dl dt fieldset
    figcaption figure footer form h1 h2 h3 h4 h5 h6 header hr html li main
    nav ol p pre section table tbody td tfoot th thead title tr ul""".split()
)

SKIP_TAGS = frozenset("script style noscript template svg iframe".split())

VOID_TAGS = frozenset(
    """area base br col embed hr img input link meta param source track
    wbr""".split()
)

# --- frozen per-language stopword lists (SPEC.md §2) ----------------------
# Small, frozen lists (not exhaustive linguistics): enough signal for the
# jusText-style density features over the synthetic corpora. Keys are
# 2-letter language prefixes; unknown languages fall back to "en".
STOPWORDS: dict[str, frozenset[str]] = {
    "en": frozenset(
        """a an and are as at be by for from has he in is it its of on that
        the to was were will with this these those not or but if then so
        there their they them we you your i me my our us what which who whom
        when where why how all any both each few more most other some such
        no nor only own same than too very can just do does did have had
        having""".split()
    ),
    "de": frozenset(
        """der die das und ist in zu den von mit sich des auf für nicht ein
        eine als auch es an werden aus er hat dass sie nach wird bei einer um
        am sind noch wie einem über einen so zum war haben nur oder aber vor
        zur bis mehr durch man sein wurde sei""".split()
    ),
    "es": frozenset(
        """de la que el en y a los del se las por un para con no una su al lo
        como más pero sus le ya o este sí porque esta entre cuando muy sin
        sobre también me hasta hay donde quien desde todo nos durante todos
        uno les ni contra otros ese eso ante ellos e esto mí antes algunos
        qué unos yo otro otras otra él""".split()
    ),
    "fr": frozenset(
        """de la le et les des en un du une que est pour qui dans a par plus
        pas au sur ne se ce il sont la être avec tout fait son mais on ou nous
        comme ces dans elle aux leur si deux même ses cette sa ont été je bien
        où sans peut""".split()
    ),
    "zh": frozenset(
        """的 了 是 在 和 有 我 他 这 就 不 人 都 一 也 上 中 到 说 们 为 子 与
        着 或 把 被 之 其 但 并 很 会 对 能 要 于 而 你 她 它""".split()
    ),
}
DEFAULT_LANG = "en"


def stopword_set(lang: str | None) -> frozenset[str]:
    """Resolve the frozen stopword list for a page's ``lang`` tag."""
    lang2 = (lang or DEFAULT_LANG)[:2].lower()
    return STOPWORDS.get(lang2, STOPWORDS[DEFAULT_LANG])
