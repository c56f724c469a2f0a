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

TOPIC = [
    "battery", "screen", "camera", "quality", "display", "speaker",
    "shipping", "delivery", "packaging", "warranty", "excellent", "perfect",
]

# Real review corpora have a few "hub" sentences carrying the product's
# core vocabulary and many tail sentences that mostly share words with the
# hubs — that skew is what puts the reference's top-5 TextRank ranks in
# the ~1.0-1.5 band (pdf p.4 Fig-2) despite the 0.15 init and 5 iterations
# (a uniform similarity graph saturates near 0.62-0.70).  Five hubs of
# decreasing topic-word count give descending ranks; tail filler words are
# globally unique ALPHABETIC strings (digits would be split off by the
# [A-Za-z]+ tokenizer, accidentally creating shared tokens).
_HUB_SIZES = (10, 9, 8, 7, 6)


def _uniq_words():
    import itertools

    for tup in itertools.product("abcdefghijklmnopqrstuvwxyz", repeat=4):
        yield "zq" + "".join(tup)


@pytest.fixture(scope="module")
def reviews_dir(tmp_path_factory):
    d = tmp_path_factory.mktemp("reviews")
    gen = _uniq_words()
    for p in range(3):
        lines = [HEADER]
        for r in range(12):
            sents = []
            for s in range(3):
                gi = r * 3 + s
                if gi < len(_HUB_SIZES):
                    ht = _HUB_SIZES[gi]
                    ws = [TOPIC[(p + i) % len(TOPIC)] for i in range(ht)]
                    ws += [next(gen) for _ in range(12 - ht)]
                else:
                    ws = [TOPIC[(p + (gi % 4) + i) % len(TOPIC)] for i in range(2)]
                    ws += [next(gen) for _ in range(10)]
                sents.append(" ".join(ws))
            lines.append(
                f"R{p}_{r}\tProduct {p}\t{1 + (r % 5)}\tN\tY\t"
                + ". ".join(sents)
                + "."
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


def test_tsv_keep_header_row_bit_parity(spark, reviews_dir):
    """keep_header_row=True replays the reference's LSA header quirk
    (BigdataProjectCode.py:43-45: the header line parses as a review):
    one extra row per product file whose review_body is the literal
    column-name string, star_rating nulled + quarantined under
    PERMISSIVE (the typed schema cannot hold the string)."""
    df = read_reviews_tsv(spark, reviews_dir, keep_header_row=True)
    rows = df.collect()
    assert len(rows) == 39  # 3 files x (1 header + 12 reviews)
    hdr = [r for r in rows if r["review_body"] == "review_body"]
    assert len(hdr) == 3  # one header-as-review per product file
    assert all(r["star_rating"] is None for r in hdr)
    assert all(r["_corrupt_record"] is not None for r in hdr)
    assert all(r["review_id"] == "review_id" for r in hdr)
    # the default reader strips exactly those three rows
    assert len(read_reviews_tsv(spark, reviews_dir).collect()) == 36


def test_tsv_keep_header_row_rejects_failfast(spark, reviews_dir):
    """keep_header_row=True + FAILFAST is a contradiction — the header
    row itself can never satisfy the typed schema, so the read would
    abort on every file (ADVICE r15): reject it loudly up front."""
    import pytest

    with pytest.raises(ValueError, match="FAILFAST"):
        read_reviews_tsv(
            spark, reviews_dir, mode="FAILFAST", keep_header_row=True
        )


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


def test_reference_quality_shape(spark, reviews_dir):
    """§6 / pdf p.4 Fig-2 reproduction on a review-shaped fixture:

    - TextRank top-5 ranks land in the reference's ~1.0-1.5 band,
      strictly descending per product (Fig-2 prints 1.42/1.29/1.15/
      1.09/1.04 for B0035PBHX6 — same init 0.15, d=0.85, 5 iters);
    - LSA emits 5 concepts x 3 sentences per product;
    - the per-product ROUGE sweep yields a bounded mean per product.
    """
    tr = rv.textrank_review_summary(spark, reviews_dir).toPandas()
    for src, grp in tr.groupby("source"):
        grp = grp.sort_values("rk")
        assert len(grp) == 5, src
        ranks = list(grp["rank"])
        # Fig-2's band: top-5 ranks a little above 1.0, below 1.5,
        # decaying toward the tail (hub skew, not normalization)
        assert all(1.0 <= r <= 1.5 for r in ranks), (src, ranks)
        assert all(a >= b for a, b in zip(ranks, ranks[1:])), (src, ranks)
        assert ranks[0] > ranks[-1], (src, ranks)

    lsa = rv.lsa_review_summary(spark, reviews_dir).toPandas()
    sent_rows = lsa[lsa["kind"] == "sentence"]
    for src, grp in sent_rows.groupby("source"):
        assert sorted(grp["concept"].unique()) == [0, 1, 2, 3, 4], src
        assert (grp.groupby("concept").size() == 3).all(), src
        assert grp["sentence"].notna().all(), src

    sweep = rv.review_rouge_sweep(spark, reviews_dir).toPandas()
    assert len(sweep) == 3  # one mean row per product
    for col in ["rouge1_f", "rouge2_f"]:
        assert ((sweep[col] >= 0) & (sweep[col] <= 1)).all()
    # the two summaries draw from the same sentence pool, so unigram
    # overlap must be substantial (degenerate zero overlap would mean a
    # broken pipeline, not a quality property)
    assert (sweep["rouge1_f"] > 0.2).all()
