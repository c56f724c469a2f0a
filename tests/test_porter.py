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
