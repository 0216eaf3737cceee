"""GDL fixture loader + seeded algorithms on GDL graphs."""

import pytest

from graph_data_science_ray.sources.gdl import GdlParseError, parse_gdl


def test_parse_simple_chain():
    t, ids, labels = parse_gdl("(a)-->(b), (b)-->(c)")
    assert ids == {"a": 0, "b": 1, "c": 2}
    assert t.column("src_id").to_pylist() == [0, 1]
    assert t.column("dst_id").to_pylist() == [1, 2]
    assert "weight" not in t.column_names


def test_parse_types_weights_labels_isolated():
    t, ids, labels = parse_gdl(
        "(a:Person)-[:KNOWS]->(b), (b)-[{weight: 2.5}]->(c), (d:Org:Node)"
    )
    assert labels["a"] == ["Person"] and labels["d"] == ["Org", "Node"]
    assert ids["d"] == 3
    assert t.column("weight").to_pylist() == [1.0, 2.5]


def test_parse_path_clause():
    t, ids, _ = parse_gdl("(a)-->(b)-->(c)-->(a)")
    assert t.num_rows == 3
    assert t.column("dst_id").to_pylist() == [1, 2, 0]


def test_parse_error():
    with pytest.raises(GdlParseError):
        parse_gdl("(a)--(b)")  # undirected syntax not in the subset


def test_gdl_pagerank_matches_manual_fixture():
    from graph_data_science_ray.algos.pagerank import pagerank
    from graph_data_science_ray.oracles import pagerank_oracle
    from graph_data_science_ray.sources.gdl import from_gdl

    ds, ids, _ = from_gdl("(h)-->(a), (h)-->(l), (a)-->(h), (l)-->(h)")
    res = pagerank(ds, max_iterations=20, num_partitions=2)
    pairs = [(ids["h"], ids["a"]), (ids["h"], ids["l"]), (ids["a"], ids["h"]), (ids["l"], ids["h"])]
    want = pagerank_oracle(pairs, max_iter=20)
    got = res.as_dict()
    for k, v in want.items():
        assert got[k] == pytest.approx(v, abs=1e-6)
