"""Deterministic DOM-pruning HTML→text extraction and page-event parsing.

The ``input_hint`` invariant: extracted text per url must be byte-identical
across runs/workers — so the extractor is pure Python ``html.parser`` with
pinned rules, no version-floating third-party parser behavior.

Pruning rules (pinned):
  * content of ``script``, ``style``, ``noscript``, ``template``, ``head``,
    ``nav``, ``footer``, ``aside`` is dropped entirely;
  * text of every other element is collected;
  * block-level elements (p, div, li, h1..h6, ul, ol, table, tr, br,
    article, section, blockquote, pre) introduce a line break;
  * within a line, runs of whitespace collapse to a single space;
  * leading/trailing whitespace per line is stripped; empty lines dropped;
  * lines joined with ``\\n``.

Besides visible text, pages carry structured revision markers (the web-page
generalization of the reference's per-commit file list,
ProvenanceService.java:161-183):

  <meta name="author" content="login">            author login ('' → null)
  <meta name="author-name" content="Name">        display name (ST2 fallback)
  <li class="res" data-name data-status data-additions data-changes
      data-deletions>                              one resource event
  <a rel="parent" href="#sha">                     parent snapshot pointer
  <title>                                          snapshot label (message)

``parse_page`` returns both the pruned text and the event records so the
engine extracts everything in a single pass over the html bytes.
"""

from __future__ import annotations

from html.parser import HTMLParser

_DROP_TAGS = frozenset(
    {"script", "style", "noscript", "template", "head", "nav", "footer", "aside"}
)
_BLOCK_TAGS = frozenset(
    {
        "p", "div", "li", "h1", "h2", "h3", "h4", "h5", "h6",
        "ul", "ol", "table", "tr", "br", "article", "section",
        "blockquote", "pre", "body", "html", "title",
    }
)


class _PageParser(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.depth_dropped = 0
        self.parts: list[list[str]] = [[]]  # lines of word-chunks
        self.author: str | None = None
        self.author_name: str | None = None
        self.label: str = ""
        self._in_title = False
        self._title_chunks: list[str] = []
        self.resources: list[dict] = []
        self.parents: list[str] = []

    # -- structure ---------------------------------------------------------
    def handle_starttag(self, tag, attrs):
        if tag in _DROP_TAGS:
            self.depth_dropped += 1
            return
        a = dict(attrs)
        if tag == "meta":
            nm, content = a.get("name"), a.get("content", "")
            if nm == "author":
                self.author = content or None
            elif nm == "author-name":
                self.author_name = content or None
        elif tag == "li" and "res" in (a.get("class") or "").split():
            self.resources.append(
                {
                    "name": a.get("data-name", ""),
                    "status": a.get("data-status", ""),
                    "additions": int(a.get("data-additions", "0") or 0),
                    "changes": int(a.get("data-changes", "0") or 0),
                    "deletions": int(a.get("data-deletions", "0") or 0),
                }
            )
        elif tag == "a" and a.get("rel") == "parent":
            href = a.get("href", "")
            self.parents.append(href.lstrip("#"))
        if tag == "title":
            self._in_title = True
        if tag in _BLOCK_TAGS:
            self._newline()

    def handle_endtag(self, tag):
        if tag in _DROP_TAGS:
            self.depth_dropped = max(0, self.depth_dropped - 1)
            return
        if tag == "title":
            self._in_title = False
            self.label = " ".join("".join(self._title_chunks).split())
        if tag in _BLOCK_TAGS:
            self._newline()

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        if tag in _DROP_TAGS:
            # a self-closing drop tag (<script src="x"/>) has no content:
            # undo the start-tag increment or all following text is dropped
            self.depth_dropped = max(0, self.depth_dropped - 1)

    # -- text --------------------------------------------------------------
    def handle_data(self, data):
        if self._in_title:
            self._title_chunks.append(data)
        if self.depth_dropped == 0 and data:
            self.parts[-1].append(data)

    def _newline(self):
        if self.parts[-1]:
            self.parts.append([])

    def text(self) -> str:
        lines = []
        for chunks in self.parts:
            line = " ".join("".join(chunks).split())
            if line:
                lines.append(line)
        return "\n".join(lines)


def parse_page(html: bytes | str) -> dict:
    """Parse one html payload → pruned text + revision-event structure.

    Deterministic: same bytes in, same dict out. Decoding is pinned to
    UTF-8 with ``errors="replace"``.
    """
    if isinstance(html, (bytes, bytearray, memoryview)):
        html = bytes(html).decode("utf-8", errors="replace")
    p = _PageParser()
    p.feed(html)
    p.close()
    return {
        "text": p.text(),
        "label": p.label,
        "author": p.author,
        "author_name": p.author_name,
        "resources": p.resources,
        "parents": p.parents,
    }


def extract_text(html: bytes | str) -> str:
    """Text-only pruning (the byte-identity invariant surface)."""
    return parse_page(html)["text"]
