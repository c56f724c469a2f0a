"""Porter stemmer unit tests — examples from the published algorithm
(Porter 1980) — and the stemmed ROUGE variant's behavior."""

from __future__ import annotations

import pytest

from bigdataanalytics_textsummarization_spark.porter import stem

# (input, expected) pairs taken from the worked examples in the paper
CASES = [
    ("caresses", "caress"),
    ("ponies", "poni"),
    ("ties", "ti"),
    ("caress", "caress"),
    ("cats", "cat"),
    ("feed", "feed"),
    ("agreed", "agre"),
    ("plastered", "plaster"),
    ("bled", "bled"),
    ("motoring", "motor"),
    ("sing", "sing"),
    ("conflated", "conflat"),
    ("troubled", "troubl"),
    ("sized", "size"),
    ("hopping", "hop"),
    ("tanned", "tan"),
    ("falling", "fall"),
    ("hissing", "hiss"),
    ("fizzed", "fizz"),
    ("failing", "fail"),
    ("filing", "file"),
    ("happy", "happi"),
    ("sky", "sky"),
    ("relational", "relat"),
    ("conditional", "condit"),
    ("rational", "ration"),
    ("valenci", "valenc"),
    ("digitizer", "digit"),
    ("operator", "oper"),
    ("feudalism", "feudal"),
    ("decisiveness", "decis"),
    ("hopefulness", "hope"),
    ("callousness", "callous"),
    ("formaliti", "formal"),
    ("sensitiviti", "sensit"),
    ("sensibiliti", "sensibl"),
    ("triplicate", "triplic"),
    ("formative", "form"),
    ("formalize", "formal"),
    ("electriciti", "electr"),
    ("electrical", "electr"),
    ("hopeful", "hope"),
    ("goodness", "good"),
    ("revival", "reviv"),
    ("allowance", "allow"),
    ("inference", "infer"),
    ("airliner", "airlin"),
    ("gyroscopic", "gyroscop"),
    ("adjustable", "adjust"),
    ("defensible", "defens"),
    ("irritant", "irrit"),
    ("replacement", "replac"),
    ("adjustment", "adjust"),
    ("dependent", "depend"),
    ("adoption", "adopt"),
    ("homologou", "homolog"),
    ("communism", "commun"),
    ("activate", "activ"),
    ("angulariti", "angular"),
    ("homologous", "homolog"),
    ("effective", "effect"),
    ("bowdlerize", "bowdler"),
    ("probate", "probat"),
    ("rate", "rate"),
    ("cease", "ceas"),
    ("controll", "control"),
    ("roll", "roll"),
]


@pytest.mark.parametrize("word,expected", CASES)
def test_porter_examples(word, expected):
    assert stem(word) == expected


def test_stemmed_rouge_not_below_unstemmed(spark):
    """Stemming merges token variants, so matches can only stay or grow."""
    from bigdataanalytics_textsummarization_spark.rouge import (
        rouge_n,
        rouge_n_stemmed,
    )
    from tests.conftest import SF_DIR

    plain = rouge_n(spark, SF_DIR).toPandas().set_index("pair_id")
    stemmed = rouge_n_stemmed(spark, SF_DIR).toPandas().set_index("pair_id")
    assert len(plain) == len(stemmed)
    joined = plain.join(stemmed, lsuffix="_p", rsuffix="_s")
    assert (joined["match1_s"] >= joined["match1_p"]).all()


def _sql_stems(words: list[str]) -> dict[str, str]:
    import duckdb

    from bigdataanalytics_textsummarization_spark.porter_sql import (
        STEM_DICT_CTES,
    )

    con = duckdb.connect()
    con.execute("CREATE TABLE advw(orig VARCHAR)")
    # the stemmer chain requires a DISTINCT vocabulary (profiles partition
    # by orig), matching how rouge.py builds its vocab CTE
    con.executemany("INSERT INTO advw VALUES (?)", [(w,) for w in set(words)])
    rows = con.sql(
        f"WITH vocab AS (SELECT orig FROM advw),\n{STEM_DICT_CTES}\n"
        "SELECT orig, stem FROM stems"
    ).fetchall()
    return dict(rows)


def test_sql_stemmer_matches_python_on_examples():
    """The SQL-compiled Porter (the rouge_n_stemmed oracle) agrees with
    porter.py on the documented cases plus y-run and digit edge words."""
    words = [w for w, _ in CASES] + [
        "yy", "syzygy", "sayy", "enjoyy", "toy", "by", "y",
        "3rd", "a1b2", "oed", "eed", "communicating", "possibilities",
        "sensibiliti", "hopefulness", "conditional",
    ]
    got = _sql_stems(words)
    for w in words:
        assert got[w] == stem(w), (w, got[w], stem(w))


def test_sql_stemmer_matches_python_fuzz():
    """Randomized suffix-rich words: SQL Porter == Python Porter."""
    import random
    import string

    rng = random.Random(707)
    sufs = [
        "s", "es", "ies", "sses", "ed", "eed", "ing", "ational", "tional",
        "enci", "anci", "izer", "abli", "alli", "entli", "eli", "ousli",
        "ization", "ation", "ator", "alism", "iveness", "fulness",
        "ousness", "aliti", "iviti", "biliti", "icate", "ative", "alize",
        "iciti", "ical", "ful", "ness", "al", "ance", "ence", "er", "ic",
        "able", "ible", "ant", "ement", "ment", "ent", "ion", "ou", "ism",
        "ate", "iti", "ous", "ive", "ize", "e", "ll", "y",
    ]
    words = set()
    for _ in range(500):
        base = "".join(
            rng.choices(string.ascii_lowercase, k=rng.randint(1, 8))
        )
        words.add(base + rng.choice(sufs))
        words.add(base)
    got = _sql_stems(sorted(words))
    for w in words:
        assert got[w] == stem(w), (w, got[w], stem(w))
