"""Masking/repetition behavior of the new corpus-hygiene operators on
adversarial inputs (the synthetic corpus is clean, so the gated oracle
only proves plumbing — these pin the semantics)."""

from __future__ import annotations

from pyspark.sql import functions as F

from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
    PII_DIGITS,
    PII_EMAIL,
    PII_URL,
)


def _scrub(col):
    clean = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(col, PII_EMAIL, "<EMAIL>"), PII_URL, "<URL>"
        ),
        PII_DIGITS,
        "<NUM>",
    )
    return clean


def test_pii_masking_semantics(spark):
    rows = [
        ("contact me at jane.doe+spam@example.co.uk today",
         "contact me at <EMAIL> today"),
        ("see https://example.com/a?b=1 and http://x.io",
         "see <URL> and <URL>"),
        ("call 5551234567 now", "call <NUM> now"),
        ("short 123456 stays", "short 123456 stays"),  # < 7 digits kept
        ("a@b.co plus https://y.z/p and 99999999",
         "<EMAIL> plus <URL> and <NUM>"),
        ("no pii here", "no pii here"),
    ]
    df = spark.createDataFrame([(t,) for t, _ in rows], ["text"])
    got = [r["c"] for r in df.select(_scrub(F.col("text")).alias("c")).collect()]
    for (raw, want), g in zip(rows, got):
        assert g == want, (raw, g, want)


def test_pii_masking_matches_duckdb():
    """Spark (Java regex) and DuckDB (RE2) agree on the shared patterns."""
    import duckdb

    texts = [
        "jane.doe+x@sub.example.org wrote https://a.b/c?d=e#f",
        "digits 12345678901 and email x_y-z@h.io",
        "edge http://h .com@ 1234567",
    ]
    con = duckdb.connect()
    con.execute("CREATE TABLE t(text VARCHAR)")
    con.executemany("INSERT INTO t VALUES (?)", [(t,) for t in texts])
    duck = [
        r[0]
        for r in con.sql(
            f"""SELECT regexp_replace(regexp_replace(regexp_replace(text,
                '{PII_EMAIL}', '<EMAIL>', 'g'),
                '{PII_URL}', '<URL>', 'g'),
                '{PII_DIGITS}', '<NUM>', 'g') FROM t"""
        ).fetchall()
    ]
    import re

    py = []
    for t in texts:
        s = re.sub(PII_EMAIL, "<EMAIL>", t)
        s = re.sub(PII_URL, "<URL>", s)
        s = re.sub(PII_DIGITS, "<NUM>", s)
        py.append(s)
    assert duck == py


def test_doc_repetition_extremes(spark):
    from bigdataanalytics_textsummarization_spark.extensions import (
        text_analysis as ta,
    )

    df = spark.createDataFrame(
        [
            (1, "spam spam spam spam spam spam"),
            (2, "one two three four five six"),
        ],
        ["doc_id", "text"],
    )
    base = df.select("doc_id", F.split(F.lower("text"), " ", -1).alias("w"))
    out = {
        r["doc_id"]: r
        for r in base.select(
            "doc_id",
            (
                1.0
                - F.size(F.array_distinct("w")) / F.size("w")
            ).alias("dup"),
        ).collect()
    }
    assert out[1]["dup"] > 0.8  # 6 copies of one token
    assert out[2]["dup"] == 0.0  # all distinct
    # and the full operator runs on the corpus with bounded outputs
    pdf = ta.doc_repetition(spark, "/root/testdata/sf0.001").toPandas()
    for c in ["dup_unigram_frac", "dup_bigram_frac", "dup_trigram_frac"]:
        assert ((pdf[c] >= 0) & (pdf[c] <= 1)).all()
    # trigram dup <= bigram dup <= unigram dup is the usual ordering on
    # natural-ish text; don't assert strictly, but unigram must dominate
    assert (pdf["dup_unigram_frac"] >= pdf["dup_trigram_frac"] - 1e-9).all()


def test_compression_ratio_pinned_to_zlib(spark):
    import zlib

    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        compression_ratio,
    )
    from bigdataanalytics_textsummarization_spark.io import load_table

    pdf = compression_ratio(spark, "/root/testdata/sf0.001").toPandas()
    docs = load_table(spark, "/root/testdata/sf0.001", "documents").select(
        "doc_id", "text"
    ).toPandas()
    truth = {
        r.doc_id: len(zlib.compress(r.text.encode("utf-8"), 6))
        for r in docs.itertuples()
    }
    assert len(pdf) == len(docs)
    for r in pdf.itertuples():
        assert r.zlib_bytes == truth[r.doc_id]
        assert 0 < r.compression_ratio <= 1.5
    # redundancy ordering: repeated text compresses below distinct text
    rep = len(zlib.compress(b"spam " * 200, 6)) / 1000
    assert rep < 0.1


def test_pack_sequences_invariants(spark):
    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        PACK_CTX,
        pack_sequences,
    )

    pdf = pack_sequences(spark, "/root/testdata/sf0.001").toPandas()
    for _, grp in pdf.groupby("source"):
        grp = grp.sort_values("doc_id").reset_index(drop=True)
        # spans are contiguous and non-overlapping within a corpus
        assert (grp["start_tok"].iloc[0]) == 0
        assert (
            grp["start_tok"].iloc[1:].values
            == (grp["end_tok"].iloc[:-1].values + 1)
        ).all()
        # pack ids consistent with the spans
        assert (grp["start_pack"] == grp["start_tok"] // PACK_CTX).all()
        assert (grp["end_pack"] == grp["end_tok"] // PACK_CTX).all()
        # a doc never spans more packs than its length requires
        assert (
            grp["end_pack"] - grp["start_pack"]
            <= grp["n_tokens"] // PACK_CTX + 1
        ).all()


def test_pmi_edges_semantics(spark):
    import math

    from bigdataanalytics_textsummarization_spark.extensions.text_analysis import (
        PMI_MIN_PAIR,
        PMI_TOP_WORDS,
        pmi_edges,
    )
    from bigdataanalytics_textsummarization_spark.io import load_table
    from tests.conftest import SF_DIR

    out = pmi_edges(spark, SF_DIR).toPandas()
    assert len(out) > 0
    # edges are oriented, support floor holds, vocabulary is bounded
    assert (out.w_a < out.w_b).all()
    assert (out.c_ab >= PMI_MIN_PAIR).all()
    assert len(set(out.w_a) | set(out.w_b)) <= PMI_TOP_WORDS
    # co-occurrence can never exceed either marginal
    assert (out.c_ab <= out[["c_a", "c_b"]].min(axis=1)).all()
    # pmi recomputes from the counts it ships
    n_docs = load_table(spark, SF_DIR, "documents").count()
    for r in out.itertuples():
        want = math.log((float(n_docs) * r.c_ab) / (float(r.c_a) * r.c_b))
        assert abs(r.pmi - round(want, 6)) < 1e-9
