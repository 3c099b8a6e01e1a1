"""Registry-consistency pins for the mechanical sf1 gate (r10).

No Spark: asserts the gate tool's row registry and the committed
expectations file cannot drift apart silently (a renamed entry would
otherwise measure as NEW and stop being gated)."""

from __future__ import annotations

import ast
import json
import os

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _registry_keys() -> set[str]:
    """The string keys of check_sf1_gate.py's ROWS dict, read from the
    AST so importing the tool (which builds Spark frames at module
    main) is not needed."""
    tree = ast.parse(open(os.path.join(HERE, "tools",
                                       "check_sf1_gate.py")).read())
    for node in ast.walk(tree):
        if (isinstance(node, ast.AnnAssign)
                and isinstance(node.target, ast.Name)
                and node.target.id == "ROWS"):
            return {k.value for k in node.value.keys}
    raise AssertionError("ROWS registry not found")


def test_gate_registry_matches_expectations():
    exp = json.load(open(os.path.join(HERE, "BASELINE_SF1.json")))
    assert exp["gate"] == 1.5
    keys = _registry_keys()
    assert keys == set(exp["sf1_sec"]), (
        "gate registry and BASELINE_SF1.json drifted: "
        f"only-registry={keys - set(exp['sf1_sec'])}, "
        f"only-json={set(exp['sf1_sec']) - keys}")
    # every expectation is a positive wall reading
    assert all(v > 0 for v in exp["sf1_sec"].values())


def test_gated_entries_are_registered_or_index_faces():
    """Each gated row is a registered queries() entry, or one of the
    named index build/probe faces whose operators the entries use."""
    import sys
    sys.path.insert(0, HERE)
    import __spark_entry__ as m
    registered = set(m.queries())
    faces = {"bm25 index build", "bm25 indexed probe",
             "ann lsh indexed probe", "ann pq indexed probe",
             "warc boilerplate_card"}
    for k in _registry_keys():
        assert k in registered or k in faces, k
