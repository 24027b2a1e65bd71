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


def test_card_binds_published_artifacts(spark, sf_dir, tmp_path):
    """The card embeds the bound artifacts' manifests verbatim (the
    curate -> pack chain's own accounting travels WITH the card), and
    refuses to claim a missing artifact."""
    import pytest

    from kafka_connect_spark.plans.curate import curated_write
    from kafka_connect_spark.plans.pack import packed_write

    cur = str(tmp_path / "curated")
    m_cur = curated_write(spark, sf_dir, cur)
    packed = str(tmp_path / "packed")
    m_pack = packed_write(
        spark, sf_dir, packed, docs=spark.read.parquet(cur), source_dir=cur
    )
    card = dataset_card(
        spark,
        sf_dir,
        sections={"funnel": "x270_filter_funnel"},
        artifacts={"curated": cur, "packed": packed},
    )
    assert card["artifacts"]["curated"]["manifest"] == m_cur
    assert card["artifacts"]["packed"]["manifest"] == m_pack
    assert card["artifacts"]["packed"]["path"] == packed
    # the chain is visible IN the card: the packed artifact's recorded
    # source is the curated artifact the same card binds
    assert card["artifacts"]["packed"]["manifest"]["source_dir"] == cur

    with pytest.raises(FileNotFoundError):
        dataset_card(
            spark,
            sf_dir,
            sections={"funnel": "x270_filter_funnel"},
            artifacts={"ghost": str(tmp_path / "nope")},
        )


def test_card_custom_sections(spark, sf_dir):
    card = dataset_card(
        spark, sf_dir, sections={"funnel": "x270_filter_funnel"}
    )
    assert list(card["sections"]) == ["funnel"]
    assert card["provenance"] == {"funnel": "x270_filter_funnel"}
