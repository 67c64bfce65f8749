"""End-to-end golden pins (SURVEY §5 item 3): the deterministic
synthetic corpus must produce byte-identical tile assignments and kNN
join output rows across sessions, machines and refactors. Regenerate
ONLY for intentional semantic changes: python tools/gen_goldens.py."""

import json
import os

import tools.gen_goldens as gg

GOLDEN = os.path.join(os.path.dirname(__file__), "goldens", "golden.json")


def test_golden_tile_assignments_and_knn(spark):
    with open(GOLDEN) as f:
        want = json.load(f)
    got = gg.compute_goldens(spark)
    assert got["n_nodes"] == want["n_nodes"]
    assert got["n_tile_rows"] == want["n_tile_rows"]
    assert got["tile_assignments_sha256"] == want["tile_assignments_sha256"]
    assert got["tile_sample"] == want["tile_sample"]
    assert got["knn_rows"] == want["knn_rows"]
