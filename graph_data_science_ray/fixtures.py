"""Deterministic test fixtures (FIXTURES.md): pages html corpus + edge graphs.

Everything here is seeded and wall-clock-free; regenerating a fixture twice
yields byte-identical output (required by the byte-identical-extraction
invariant, BASELINE.json input_hint).

The `pages` generator produces the mandated input shape
``(url: string, warc_ts: timestamp[us], html: binary, text: string,
lang: string)``; anchor targets follow a Zipf(1.3) distribution over the
url universe to create realistic hub skew.
"""

from __future__ import annotations

import hashlib
import random

import numpy as np
import pyarrow as pa

_LOREM = (
    "lorem ipsum dolor sit amet consectetur adipiscing elit sed do eiusmod "
    "tempor incididunt ut labore et dolore magna aliqua enim ad minim veniam "
    "quis nostrud exercitation ullamco laboris nisi aliquip ex ea commodo "
    "consequat duis aute irure in reprehenderit voluptate velit esse cillum "
    "fugiat nulla pariatur excepteur sint occaecat cupidatat non proident "
    "sunt culpa qui officia deserunt mollit anim id est laborum"
).split()

_LANGS = ["en"] * 9 + ["de", "fr"]  # seeded choice ⇒ ~82% en

EPOCH_2021_US = 1_609_459_200_000_000  # 2021-01-01T00:00:00Z in microseconds


def hash64(s: str) -> int:
    """Stable 63-bit id from a string: first 8 bytes of sha256, sign bit masked.

    This is the engine's IdMap equivalent (SURVEY.md §1.2): no global
    counter, no coordination — the same url hashes to the same node id on
    every worker of every run.
    """
    h = hashlib.sha256(s.encode("utf-8")).digest()
    return int.from_bytes(h[:8], "big") & 0x7FFF_FFFF_FFFF_FFFF


def url_universe(n_pages: int) -> list[str]:
    """n_pages unique lowercase urls, no fragments, across ~sqrt(n) sites."""
    n_sites = max(1, int(n_pages**0.5))
    per_site = (n_pages + n_sites - 1) // n_sites
    urls = []
    for k in range(n_sites):
        for j in range(per_site):
            if len(urls) >= n_pages:
                break
            urls.append(f"https://site{k}.example/p{j}")
    return urls


def _zipf_cum_weights(n: int, a: float = 1.3) -> list[float]:
    w = np.arange(1, n + 1, dtype=np.float64) ** (-a)
    return np.cumsum(w).tolist()


def page_html(url: str, universe: list[str], cum_weights: list[float], seed: int = 42) -> bytes:
    """Deterministic html for one url (FIXTURES.md §1).

    Contains: title, 1–20 <p> paragraphs of seeded lorem words, 0–15
    <a href> anchors with Zipf-distributed targets (some relative), nested
    div/span wrappers, a <script> and <style> block the extractor must
    drop, and HTML entities.
    """
    rng = random.Random(seed ^ hash64(url))
    parts = [
        "<html><head><title>Page ",
        url.rsplit("/", 1)[-1],
        "</title>",
        "<style>body { color: #333; } .x { display: none }</style>",
        "</head><body>",
        "<script>var x = 1 < 2 && 3 > 2; console.log('skip me');</script>",
    ]
    n_para = rng.randint(1, 20)
    n_links = rng.randint(0, 15)
    targets = rng.choices(universe, cum_weights=cum_weights, k=n_links) if n_links else []
    link_slots = sorted(rng.randint(0, n_para - 1) for _ in range(n_links))
    ti = 0
    for p in range(n_para):
        words = rng.choices(_LOREM, k=rng.randint(5, 40))
        depth = rng.randint(0, 2)
        parts.append("<div>" * depth)
        parts.append("<p>")
        parts.append(" ".join(words))
        if rng.random() < 0.3:
            parts.append(" &amp; more &#169; 2021")
        while ti < n_links and link_slots[ti] == p:
            t = targets[ti]
            # ~30% of hrefs are relative paths that must resolve against `url`
            if rng.random() < 0.3 and t.startswith(url.rsplit("/", 1)[0]):
                href = t.rsplit("/", 1)[-1]
            else:
                href = t
            parts.append(f' <span><a href="{href}">link {ti}</a></span>')
            ti += 1
        parts.append("</p>")
        parts.append("</div>" * depth)
    parts.append("</body></html>")
    return "".join(parts).encode("utf-8")


def pages_table(n_pages: int, seed: int = 42) -> pa.Table:
    """The mandated pages input table, deterministic at any size."""
    universe = url_universe(n_pages)
    cw = _zipf_cum_weights(len(universe))
    htmls, langs, tss = [], [], []
    for i, url in enumerate(universe):
        rng = random.Random(seed ^ hash64(url) ^ 0x5EED)
        htmls.append(page_html(url, universe, cw, seed=seed))
        langs.append(rng.choice(_LANGS))
        tss.append(EPOCH_2021_US + (hash64(url) % (365 * 86_400)) * 1_000_000)
    return pa.table(
        {
            "url": pa.array(universe, pa.string()),
            "warc_ts": pa.array(tss, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array([None] * n_pages, pa.string()),
            "lang": pa.array(langs, pa.string()),
        }
    )


def write_pages_parquet(path: str, n_pages: int, seed: int = 42, row_group_size: int = 1000) -> str:
    import pyarrow.parquet as pq

    pq.write_table(pages_table(n_pages, seed), path, row_group_size=row_group_size)
    return path


# ---------------------------------------------------------------------------
# Edge-list fixtures (FIXTURES.md §2). Schema: src_id, dst_id [, weight].
# ---------------------------------------------------------------------------


def edges_table(pairs: list[tuple[int, int]], weights: list[float] | None = None) -> pa.Table:
    cols = {
        "src_id": pa.array([p[0] for p in pairs], pa.int64()),
        "dst_id": pa.array([p[1] for p in pairs], pa.int64()),
    }
    if weights is not None:
        cols["weight"] = pa.array(weights, pa.float64())
    return pa.table(cols)


def tiny_chain() -> pa.Table:
    return edges_table([(0, 1), (1, 2), (2, 3)])


def tiny_cycle() -> pa.Table:
    return edges_table([(0, 1), (1, 2), (2, 0)])


def star_hub() -> pa.Table:
    return edges_table([(i, 0) for i in range(1, 10)])


def two_components() -> pa.Table:
    # {0,1,2} directed triangle ∪ {3→4}
    return edges_table([(0, 1), (1, 2), (2, 0), (3, 4)])


def self_loop() -> pa.Table:
    return edges_table([(0, 0), (0, 1)])


def weighted_tri() -> pa.Table:
    return edges_table([(0, 1), (1, 2), (2, 0)], weights=[1.0, 2.0, 4.0])


def paper_graph() -> pa.Table:
    """The 11-node web-site graph of the GDS PageRank manual example
    (Home/About/Links/Product/Sites A–D topology), rebuilt generatively
    from its public description. Node ids: Home=0 About=1 Product=2
    Links=3 SiteA=4 SiteB=5 SiteC=6 SiteD=7."""
    pairs = [
        (0, 1), (0, 3), (0, 2),          # Home → About, Links, Product
        (1, 0), (2, 0), (3, 0),          # back links to Home
        (3, 4), (3, 5), (3, 6), (3, 7),  # Links → Sites A–D
        (4, 0), (5, 0), (6, 0), (7, 0),  # Sites → Home
    ]
    return edges_table(pairs)


def er_random(n: int, p: float, seed: int) -> pa.Table:
    """Erdős–Rényi directed G(n, p), deduped, no self loops."""
    rng = np.random.default_rng(seed)
    mask = rng.random((n, n)) < p
    np.fill_diagonal(mask, False)
    src, dst = np.nonzero(mask)
    return pa.table({"src_id": pa.array(src, pa.int64()), "dst_id": pa.array(dst, pa.int64())})


def powerlaw(n: int, zipf_a: float = 1.3, seed: int = 7, mean_deg: float = 8.0) -> pa.Table:
    """Out-degrees ~ Zipf-ish heavy tail, targets uniform; deduped, no loops.

    Exercises hub skew (a few nodes own a large share of edges), the path
    the reference handles with degree partitioning and we handle with
    hub splitting + per-shard combiners (SURVEY.md §4.3).
    """
    rng = np.random.default_rng(seed)
    raw = rng.zipf(zipf_a, size=n).astype(np.int64)
    deg = np.minimum(raw, n - 1)
    deg = np.maximum((deg * mean_deg / max(1.0, deg.mean())).astype(np.int64), 1)
    deg = np.minimum(deg, n - 1)
    src = np.repeat(np.arange(n, dtype=np.int64), deg)
    dst = rng.integers(0, n, size=src.shape[0], dtype=np.int64)
    keep = src != dst
    src, dst = src[keep], dst[keep]
    uniq = np.unique(np.stack([src, dst], axis=1), axis=0)
    return pa.table(
        {"src_id": pa.array(uniq[:, 0], pa.int64()), "dst_id": pa.array(uniq[:, 1], pa.int64())}
    )
