"""End-to-end test of the reference's native workflow: TSV review files in,
LSA + TextRank summaries out (SURVEY.md §3.1-3.2).

The fixture mimics the reference dataset's shape — one ``<product_id>.txt``
TSV per product, header row, 6 tab-separated fields (BigData-Final.pdf p.2
§IV.B) — generated deterministically so assertions are stable.
"""

from __future__ import annotations

import os

import pytest

from bigdataanalytics_textsummarization_spark import reviews as rv
from bigdataanalytics_textsummarization_spark.io import read_reviews_tsv

HEADER = "review_id\tproduct_title\tstar_rating\tvine\tverified_purchase\treview_body"

WORDS = [
    "battery", "screen", "camera", "quality", "excellent", "terrible",
    "shipping", "arrived", "quickly", "broken", "replacement", "support",
    "works", "great", "product", "using", "months", "still", "perfect",
    "display", "bright", "colors", "sound", "volume", "speaker",
]


def _review_body(seed: int) -> str:
    # 3 sentences of 12-16 words each => passes both pipelines' length bands
    sents = []
    for s in range(3):
        n = 12 + (seed + s) % 5
        sents.append(
            " ".join(WORDS[(seed * 7 + s * 3 + i) % len(WORDS)] for i in range(n))
        )
    return ". ".join(sents) + "."


@pytest.fixture(scope="module")
def reviews_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("reviews")
    for p in range(3):
        lines = [HEADER]
        for r in range(12):
            rid = f"R{p}_{r}"
            lines.append(
                f"{rid}\tProduct {p}\t{1 + (r % 5)}\tN\tY\t{_review_body(p * 12 + r)}"
            )
        (d / f"B00000000{p}.txt").write_text("\n".join(lines) + "\n")
    return str(d)


def test_tsv_reader_contract(spark, reviews_dir):
    df = read_reviews_tsv(spark, reviews_dir)
    rows = df.collect()
    assert len(rows) == 36  # 3 files x 12 reviews, headers stripped
    assert set(r["product_id"] for r in rows) == {
        "B000000000", "B000000001", "B000000002"
    }
    assert all(r["star_rating"] in (1, 2, 3, 4, 5) for r in rows)


def test_tsv_bad_record_quarantine(spark, tmp_path):
    bad = tmp_path / "BADPROD.txt"
    bad.write_text(
        HEADER
        + "\nR1\tGood product\t5\tN\tY\tworks great. five stars."
        + "\nthis line has\tonly three\tfields"
        + "\nR3\tAnother\t4\tY\tN\tfine product overall. recommended.\textra_field\n"
    )
    df = read_reviews_tsv(spark, str(bad)).cache()
    rows = df.collect()
    assert len(rows) == 3
    corrupt = [r for r in rows if r["_corrupt_record"] is not None]
    ok = [r for r in rows if r["_corrupt_record"] is None]
    assert len(ok) == 1 and ok[0]["review_id"] == "R1"
    assert len(corrupt) == 2  # short row and long row both quarantined
    df.unpersist()


def test_lsa_review_summary_shape(spark, reviews_dir):
    out = rv.lsa_review_summary(spark, reviews_dir).toPandas()
    assert set(out["source"]) == {"B000000000", "B000000001", "B000000002"}
    assert set(out["kind"]) == {"sentence", "keyword"}
    # every sentence row joined back to its text; keyword rows have none
    sent_rows = out[out["kind"] == "sentence"]
    assert sent_rows["sentence"].notna().all()
    assert out[out["kind"] == "keyword"]["sentence"].isna().all()
    # 5 concepts x 3 items per kind per product (corpus is big enough)
    per = sent_rows.groupby("source").size()
    assert (per == 15).all()


def test_textrank_review_summary_shape(spark, reviews_dir):
    out = rv.textrank_review_summary(spark, reviews_dir).toPandas()
    assert set(out["source"]) == {"B000000000", "B000000001", "B000000002"}
    # top-5 per product, ranks positive, descending within product
    for _, grp in out.groupby("source"):
        grp = grp.sort_values("rk")
        assert len(grp) == 5
        assert (grp["rank"] > 0).all()
        assert grp["rank"].is_monotonic_decreasing or (
            grp["rank"].diff().dropna() <= 1e-9
        ).all()
        # reference invariant: rank = 0.15 + 0.85 * sum(contribs) >= 0.15
        assert (grp["rank"] >= 0.15 - 1e-9).all()


def test_pipelines_deterministic(spark, reviews_dir):
    a = rv.textrank_review_summary(spark, reviews_dir).toPandas()
    b = rv.textrank_review_summary(spark, reviews_dir).toPandas()
    key = ["source", "rk"]
    a = a.sort_values(key).reset_index(drop=True)
    b = b.sort_values(key).reset_index(drop=True)
    assert a.equals(b)
