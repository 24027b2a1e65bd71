"""docs/REGISTRY.md must stay in sync with the live registry: any query
added/moved without regenerating the index (scripts/gen_registry.py)
fails here — the same pin discipline bench.py applies to HEADLINE."""

from __future__ import annotations

import importlib.util
import os

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_registry_md_matches_live_registry():
    spec = importlib.util.spec_from_file_location(
        "gen_registry", os.path.join(REPO, "scripts", "gen_registry.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    with open(os.path.join(REPO, "docs", "REGISTRY.md")) as fh:
        committed = fh.read()
    assert committed == mod.build(), (
        "docs/REGISTRY.md is stale — run `python scripts/gen_registry.py`"
    )
