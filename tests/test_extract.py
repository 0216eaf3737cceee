"""Extraction determinism (the byte-identical invariant) + ingest e2e."""

import hashlib
import json
import os

import pyarrow.parquet as pq
import pytest

from graph_data_science_ray import fixtures
from graph_data_science_ray.stages.extract import ExtractTextAndLinks, extract_one, normalize_url

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens", "extract_sha256_n200.json")


def _corpus(n=200):
    return fixtures.pages_table(n)


def test_normalize_url():
    assert normalize_url("HTTP://Example.COM:80/A/b?q=1#frag") == "http://example.com/A/b?q=1"
    assert normalize_url("https://x.org:443/") == "https://x.org/"
    assert normalize_url("ftp://x.org/a") is None
    assert normalize_url("javascript:void(0)") is None


def test_extract_drops_script_style_and_decodes_entities():
    html = (b"<html><head><title>T</title><style>p{}</style></head>"
            b"<body><script>var x=1;</script><p>a &amp; b &#169;</p></body></html>")
    text, links = extract_one("https://s.example/p", html)
    assert "var x" not in text and "p{}" not in text
    assert "a & b \xa9" in text
    assert links == []


def test_extract_resolves_relative_links():
    html = b'<a href="p2">x</a><a href="https://Other.example/Q#f">y</a><a href="mailto:a@b">z</a>'
    _, links = extract_one("https://site0.example/p1", html)
    assert links == ["https://site0.example/p2", "https://other.example/Q"]


def test_extraction_goldens_byte_identical():
    """sha256(text) per url equals the committed goldens; regenerating the
    corpus and re-extracting must be byte-identical (BASELINE.json)."""
    t = _corpus()
    actor = ExtractTextAndLinks()
    out = actor(t)
    got = dict(zip(out.column("url").to_pylist(), out.column("text_sha256").to_pylist()))
    if not os.path.exists(GOLDEN_PATH):
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(got, f, indent=0, sort_keys=True)
        pytest.skip("goldens written on first run — commit them")
    with open(GOLDEN_PATH) as f:
        want = json.load(f)
    assert got == want


def test_extraction_deterministic_across_instances():
    t = _corpus(50)
    a = ExtractTextAndLinks()(t)
    b = ExtractTextAndLinks()(t)
    assert a.equals(b)


def test_ingest_end_to_end(tmp_path):
    """Full Ray pipeline vs a pure-python reference ingest on 200 pages."""
    import numpy as np

    from graph_data_science_ray.fixtures import hash64
    from graph_data_science_ray.pipelines.ingest import ingest_pages

    t = _corpus()
    pages_path = str(tmp_path / "pages.parquet")
    pq.write_table(t, pages_path)
    out_dir = str(tmp_path / "out")
    stats = ingest_pages(pages_path, out_dir, num_buckets=8, concurrency=2, num_partitions=2)

    # pure-python reference
    want_edges = set()
    for url, html in zip(t.column("url").to_pylist(), t.column("html").to_pylist()):
        _, links = extract_one(url, html)
        for l in links:
            want_edges.add((hash64(url), hash64(l)))

    got = pq.read_table(f"{out_dir}/edges")
    got_edges = set(
        zip(got.column("src_id").to_pylist(), got.column("dst_id").to_pylist())
    )
    assert got_edges == want_edges
    assert stats["edges"] == len(want_edges)
    assert stats["pages"] == 200
    # bucket partitioning exists on disk
    assert any(d.startswith("bucket=") for d in os.listdir(f"{out_dir}/edges"))
