"""splitRelationships (gds.alpha.ml.splitRelationships parity)."""

import numpy as np

from graph_data_science_ray import fixtures


def test_split_relationships():
    from graph_data_science_ray.pipelines.ml import split_relationships
    from graph_data_science_ray.sources.edges import from_arrow

    t = fixtures.er_random(80, 0.08, seed=41)
    out = split_relationships(from_arrow(t), holdout_fraction=0.25, negative_ratio=1.0, seed=3)
    train, test = out["train"], out["test"]
    n_pos_total = train.num_rows + int(
        np.asarray(test.column("label").to_numpy(zero_copy_only=False)).sum()
    )
    # every distinct loop-free unordered positive is in exactly one side
    pairs = set()
    for s, d in zip(t.column("src_id").to_pylist(), t.column("dst_id").to_pylist()):
        if s != d:
            pairs.add((min(s, d), max(s, d)))
    assert n_pos_total == len(pairs)
    # negatives are genuine non-edges, labels 0
    lab = test.column("label").to_numpy(zero_copy_only=False)
    ts = test.column("src_id").to_numpy(zero_copy_only=False)
    td = test.column("dst_id").to_numpy(zero_copy_only=False)
    for s, d, l in zip(ts.tolist(), td.tolist(), lab.tolist()):
        if l == 0:
            assert (min(s, d), max(s, d)) not in pairs
    # negative count matches the ratio
    assert int((lab == 0).sum()) == int((lab == 1).sum())
    # deterministic
    out2 = split_relationships(from_arrow(t), holdout_fraction=0.25, negative_ratio=1.0, seed=3)
    assert out2["test"].equals(test) and out2["train"].equals(train)
