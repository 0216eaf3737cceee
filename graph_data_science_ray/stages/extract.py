"""html → (text, links) extraction — the stateful ingest stage.

The reference consumes a pre-built graph store; this graft builds the graph
from Common-Crawl-style pages (BASELINE.json north_star): a stateful
actor-pool ``map_batches`` stage parses html → visible text + outgoing
links per url. The extraction contract is fully deterministic so the
per-url extracted text is byte-identical across runs, workers and
parallelism levels (BASELINE.json input_hint):

- Parser: stdlib ``html.parser.HTMLParser`` (lxml/bs4 are absent in the
  target environment; stdlib also removes version-drift risk).
- Visible text: all character data outside <script>/<style>/<template>,
  entities decoded (convert_charrefs), whitespace runs collapsed to a
  single space, ends stripped.
- Links: every <a href>, resolved against the page url (urljoin),
  normalized (scheme+host lowercased, default ports dropped, fragment
  stripped), http(s) only, self-links kept (dropped later as graph
  self-loops where algorithms require).

Use as ``ds.map_batches(ExtractTextAndLinks, batch_format="pyarrow",
concurrency=N)`` — parser instance and normalization state are built once
per actor in ``__init__`` (SURVEY.md §2.3).
"""

from __future__ import annotations

import hashlib
from html.parser import HTMLParser
from urllib.parse import urljoin, urlsplit, urlunsplit

import pyarrow as pa
import pyarrow.compute as pc

_SKIP_TAGS = {"script", "style", "template"}
_DEFAULT_PORTS = {"http": ":80", "https": ":443"}


class _VisibleTextParser(HTMLParser):
    """Collects visible text chunks and <a href> values in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.chunks: list[str] = []
        self.hrefs: list[str] = []
        self._skip_depth = 0

    def reset_doc(self) -> None:
        self.reset()
        self.chunks = []
        self.hrefs = []
        self._skip_depth = 0

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SKIP_TAGS:
            self._skip_depth += 1
        elif tag == "a":
            for k, v in attrs:
                if k == "href" and v:
                    self.hrefs.append(v)
                    break

    def handle_endtag(self, tag: str) -> None:
        if tag in _SKIP_TAGS and self._skip_depth > 0:
            self._skip_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._skip_depth == 0 and data:
            self.chunks.append(data)


def normalize_url(url: str) -> str | None:
    """Deterministic url normalization: lowercase scheme/host, strip
    fragment and default port; http(s) only, else None."""
    try:
        parts = urlsplit(url)
    except ValueError:
        return None
    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None
    netloc = parts.netloc.lower()
    if netloc.endswith(_DEFAULT_PORTS[scheme]):
        netloc = netloc[: -len(_DEFAULT_PORTS[scheme])]
    return urlunsplit((scheme, netloc, parts.path, parts.query, ""))


def extract_one(url: str, html: bytes, parser: _VisibleTextParser | None = None) -> tuple[str, list[str]]:
    """Extract (visible_text, normalized_out_links) from one page."""
    p = parser or _VisibleTextParser()
    p.reset_doc()
    try:
        p.feed(html.decode("utf-8", errors="replace"))
        p.close()
    except Exception:
        # Malformed html: keep whatever was parsed before the failure —
        # still deterministic (same bytes → same partial parse).
        pass
    text = " ".join(" ".join(p.chunks).split())
    links = []
    for href in p.hrefs:
        h = href.strip()
        if not h or h.startswith(("javascript:", "mailto:", "#", "data:")):
            continue
        try:
            resolved = urljoin(url, h)
        except ValueError:
            continue
        norm = normalize_url(resolved)
        if norm:
            links.append(norm)
    return text, links


class ExtractTextAndLinks:
    """Actor-pool batch transform: pages(url, html, ...) →
    (url, text, text_sha256, links: list<string>).

    Parser instance is reused across batches (reset per document); the
    per-row loop is unavoidable (an html parse is inherently sequential
    per document) but each parse is stdlib-C-assisted and documents are
    independent, so throughput scales with the actor pool.
    """

    def __init__(self) -> None:
        self._parser = _VisibleTextParser()

    def __call__(self, batch: pa.Table) -> pa.Table:
        urls = batch.column("url").to_pylist()
        htmls = batch.column("html").to_pylist()
        texts: list[str] = []
        shas: list[str] = []
        links_col: list[list[str]] = []
        for url, html in zip(urls, htmls):
            text, links = extract_one(url, html or b"", self._parser)
            texts.append(text)
            shas.append(hashlib.sha256(text.encode("utf-8")).hexdigest())
            links_col.append(links)
        return pa.table(
            {
                "url": pa.array(urls, pa.string()),
                "text": pa.array(texts, pa.string()),
                "text_sha256": pa.array(shas, pa.string()),
                "links": pa.array(links_col, pa.list_(pa.string())),
            }
        )


def explode_links(batch: pa.Table) -> pa.Table:
    """(url, links) → (src_url, dst_url) rows, vectorized via Arrow
    list_flatten/list_parent_indices (no Python loop)."""
    links = batch.column("links")
    if links.num_chunks > 1:  # combine_chunks for stable parent indices
        links = links.combine_chunks()
    flat = pc.list_flatten(links)
    parents = pc.list_parent_indices(links)
    src = pc.take(batch.column("url").combine_chunks(), parents)
    return pa.table({"src_url": src, "dst_url": flat})
