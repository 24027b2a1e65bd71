"""dataset_card — the capstone artifact: ONE JSON dataset card composed
from the registry's own hash-checked reports, written next to (or for)
a published corpus.

Every curation decision this engine makes already has a value-verified
query behind it; a dataset card is those tables COMPOSED, not new
analysis. This module runs the bounded-output registry queries and
assembles their rows verbatim — so every number on the card is the same
number the correctness gate checks, and the card can never drift from
the engine's published accounting:

- corpus profile: x93 per-source datasheet (|sources| rows);
- quality funnel: x270's five-gate survival table (5 rows);
- curation accounting: x282 verdict/strip table (|sources| rows);
- quality delta: x285 before/after-strip profile (|sources| rows);
- curriculum: x155's phase plan (4 rows);
- packing: x148's context-fit waste curve (4 rows) + x291's
  straddling-vs-padding policy table (|langs| rows);
- split: x92's leakage-safe cluster split audit (2 rows: the
  cluster-keyed split's zero cross-split leak vs the naive split's
  measured leak count) + x238's GroupKFold per-fold balance (5 rows).

Everything collected is a bounded aggregate (tens of rows per section —
the |sources| x |checks| shape, never the corpus); at 100 TB the card
costs what its component queries cost, and sections share scans when
run through the same session. Output is deterministic: sections are
row-sorted by their queries' own ORDER BY and serialized with sorted
keys."""

from __future__ import annotations

import json
import os

from pyspark.sql import SparkSession

#: card section -> registry query (all bounded-output, all in the
#: correctness gate; x289's occupancy joins when an index dir is given)
CARD_SECTIONS = {
    "corpus_profile": "x93_corpus_datasheet",
    "quality_funnel": "x270_filter_funnel",
    "curation_accounting": "x282_curated_accounting",
    "curation_quality_delta": "x285_curation_quality_delta",
    "curriculum_phases": "x155_curriculum_plan",
    "context_fit_waste": "x148_context_fit_report",
    "packing_policy": "x291_packing_policy_tradeoff",
    "split_leakage_audit": "x92_leakage_safe_split",
    "split_fold_balance": "x238_group_kfold_split",
}


def dataset_card(
    spark: SparkSession,
    sf_dir: str,
    out_path: str | None = None,
    sections: dict[str, str] | None = None,
    artifacts: dict[str, str] | None = None,
) -> dict:
    """Compose the dataset card from the registry queries over
    ``sf_dir`` and (optionally) write it as JSON to ``out_path``.
    Returns the card dict. Each section's rows are the query's rows
    verbatim (``Row.asDict()`` per row, query-ordered) — pinned
    row-for-row against the registry in tests/test_dataset_card.py.

    ``artifacts`` binds published artifact directories into the card:
    ``{"curated": dir, "packed": dir, "ann_index": dir, ...}`` — each
    dir's ``_MANIFEST.json`` is embedded verbatim under
    ``card["artifacts"][name]`` with its path, so the card a consumer
    reads names the exact artifacts (and their own pinned accounting)
    it describes. A missing manifest is an error, not a silent hole:
    a card must not claim an artifact that is not there."""
    from ..queries import QUERIES
    from .curate import MANIFEST_NAME

    sections = CARD_SECTIONS if sections is None else sections
    card: dict = {
        "op": "dataset_card",
        "source_dir": sf_dir,
        "sections": {},
        "provenance": {
            name: qname for name, qname in sorted(sections.items())
        },
    }
    for name, qname in sorted(sections.items()):
        rows = QUERIES[qname](spark, sf_dir).collect()  # bounded per section
        card["sections"][name] = [r.asDict() for r in rows]
    if artifacts:
        card["artifacts"] = {}
        for name, adir in sorted(artifacts.items()):
            with open(os.path.join(adir, MANIFEST_NAME)) as f:
                card["artifacts"][name] = {
                    "path": adir,
                    "manifest": json.load(f),
                }
    if out_path is not None:
        os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
        with open(out_path, "w") as f:
            json.dump(card, f, indent=2, sort_keys=True, default=str)
    return card
