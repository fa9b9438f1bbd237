"""Deterministic trafilatura-style HTML -> main-text extraction.

Analog of the reference's image decode step
(/root/reference/modules/feature_extraction.py:41-51 — bytes -> cv2 ndarray): the
single deterministic transform from the raw payload column to the working
representation.  Per the north rule, extraction must be byte-identical per url
with the corpus' pre-extracted ``text`` column, which is what
``tests/test_extract.py`` asserts on the fixture corpus.

Strategy (pure regex, no external deps, deterministic):
1. decode UTF-8 (errors="replace"),
2. drop <script>/<style>/<nav>/<header>/<footer>/<aside> subtrees and comments,
3. if a <main>/<article> element exists: the text is the concatenation of its
   <p> paragraph texts joined by "\\n\\n" (entities unescaped),
4. else fall back to stripping all tags from <body> and collapsing whitespace.
"""

from __future__ import annotations

import html as _html
import re

_RE_DROP = re.compile(
    r"<(script|style|nav|header|footer|aside)\b[^>]*>.*?</\1\s*>",
    re.IGNORECASE | re.DOTALL,
)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.DOTALL)
_RE_MAIN = re.compile(r"<(main|article)\b[^>]*>(.*?)</\1\s*>", re.IGNORECASE | re.DOTALL)
_RE_PARA = re.compile(r"<p\b[^>]*>(.*?)</p\s*>", re.IGNORECASE | re.DOTALL)
_RE_TAG = re.compile(r"<[^>]+>")
_RE_BODY = re.compile(r"<body\b[^>]*>(.*?)</body\s*>", re.IGNORECASE | re.DOTALL)


def extract_text(html_bytes: bytes) -> str:
    """Extract the main text of a page.  Deterministic pure function."""
    raw = html_bytes.decode("utf-8", errors="replace")
    raw = _RE_COMMENT.sub(" ", raw)
    raw = _RE_DROP.sub(" ", raw)
    m = _RE_MAIN.search(raw)
    if m is not None:
        paras = [_html.unescape(_RE_TAG.sub("", p)).strip() for p in _RE_PARA.findall(m.group(2))]
        paras = [p for p in paras if p]
        if paras:
            return "\n\n".join(paras)
        inner = _html.unescape(_RE_TAG.sub(" ", m.group(2)))
        return " ".join(inner.split())
    b = _RE_BODY.search(raw)
    scope = b.group(1) if b is not None else raw
    stripped = _html.unescape(_RE_TAG.sub(" ", scope))
    return " ".join(stripped.split())
