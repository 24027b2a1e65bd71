"""dataset_card (plans/card.py): the composed card's sections are the
registry queries' rows VERBATIM, every section is a bounded aggregate,
and the JSON on disk round-trips the dict."""

from __future__ import annotations

import json

from kafka_connect_spark.plans.card import CARD_SECTIONS, dataset_card
from kafka_connect_spark.queries import QUERIES


def test_card_sections_match_registry_rows(spark, sf_dir, tmp_path):
    out = str(tmp_path / "card.json")
    card = dataset_card(spark, sf_dir, out)
    assert set(card["sections"]) == set(CARD_SECTIONS)
    for name, qname in CARD_SECTIONS.items():
        want = [r.asDict() for r in QUERIES[qname](spark, sf_dir).collect()]
        assert card["sections"][name] == want, name
        assert 0 < len(want) <= 64, (name, len(want))  # bounded sections
    with open(out) as f:
        on_disk = json.load(f)
    assert set(on_disk["sections"]) == set(card["sections"])
    assert on_disk["provenance"] == card["provenance"]
    # the quality funnel's final survivors equal the curation table's
    # quality-pass candidates: the same gates, shared verbatim
    funnel = card["sections"]["quality_funnel"]
    assert funnel[0]["stage"] is not None


def test_card_custom_sections(spark, sf_dir):
    card = dataset_card(
        spark, sf_dir, sections={"funnel": "x270_filter_funnel"}
    )
    assert list(card["sections"]) == ["funnel"]
    assert card["provenance"] == {"funnel": "x270_filter_funnel"}
