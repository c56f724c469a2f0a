"""Porter stemmer expressed as pure DuckDB SQL — the oracle twin of
``porter.py``.

Why this exists: the reference scores ROUGE with ``use_stemmer=True``
(BigdataProjectCode.py:183), so the faithful ROUGE operators stem tokens.
The driver's correctness gate can only run ANSI-ish SQL through DuckDB, and
DuckDB ships no stemmer in this container — so the stemmer itself is
compiled to SQL here, making ``rouge_n_stemmed`` value-checkable instead of
rows-only.

Design.  Porter's conditions (measure m, *v*, *d, *o) all evaluate on
PREFIXES of the word as it stands at each step, and the consonant/vowel
classification of position i depends only on characters at positions <= i.
So one per-word "profile" — arrays ``cons[i]`` (is-consonant), ``cumv[i]``
(cumulative vowel count), ``cumm[i]`` (cumulative VC-transition count) —
answers every condition for every prefix with O(1) list indexing:

    measure(prefix of length L)  = cumm[L]
    has_vowel(prefix of length L) = cumv[L] > 0
    cvc / double-consonant checks = cons[] lookups at fixed offsets

Replacement steps (1b's +e, 1c's y->i, steps 2/3) produce words that are
NOT prefixes of the previous stage, so the profile is recomputed before
each step that needs conditions (6 profiles total).  The 'y' rule is the
only context-dependent classification; a run of k consecutive y's after a
non-y char (or word start) alternates consonant/vowel with closed-form
parity, which one window ``max`` over non-y positions resolves.

``stemmer_ctes()`` emits the chain mapping ``w_long(orig, w)`` (distinct
lowercase words, length > 2) to ``pst_s5(orig, w)``; tests/test_porter.py
asserts SQL == porter.py over the corpus vocabulary and adversarial words.
"""

from __future__ import annotations

from .porter import _STEP2, _STEP3, _STEP4

_VOWEL_LIST = "('a','e','i','o','u')"


def _profile(name: str, src: str) -> str:
    """CTEs computing the char profile of ``{src}(orig, w)`` -> ``{name}``
    with (orig, cons[], cumv[], cumm[])."""
    return f"""
{name}_ch AS MATERIALIZED (
  SELECT orig, w, unnest(range(1, length(w)+1)) AS i FROM {src}
),
{name}_cl AS MATERIALIZED (
  SELECT orig, w, i, substr(w, i, 1) AS c,
         max(CASE WHEN substr(w, i, 1) <> 'y' THEN i END)
           OVER (PARTITION BY orig ORDER BY i) AS lny
  FROM {name}_ch
),
{name}_co AS MATERIALIZED (
  SELECT orig, i,
         CASE WHEN c = 'y' THEN
           CASE WHEN lny IS NULL OR substr(w, lny, 1) IN {_VOWEL_LIST}
                THEN ((i - coalesce(lny, 0)) % 2) = 1
                ELSE ((i - lny) % 2) = 0 END
         ELSE c NOT IN {_VOWEL_LIST} END AS isc
  FROM {name}_cl
),
{name}_lg AS MATERIALIZED (
  SELECT orig, i, isc,
         lag(isc) OVER (PARTITION BY orig ORDER BY i) AS pisc
  FROM {name}_co
),
{name}_cm AS MATERIALIZED (
  SELECT orig, i, isc,
         sum(CASE WHEN NOT isc THEN 1 ELSE 0 END)
           OVER (PARTITION BY orig ORDER BY i) AS cumv,
         sum(CASE WHEN isc AND NOT coalesce(pisc, true) THEN 1 ELSE 0 END)
           OVER (PARTITION BY orig ORDER BY i) AS cumm
  FROM {name}_lg
),
{name} AS MATERIALIZED (
  SELECT orig, list(isc ORDER BY i) AS cons,
         list(cumv ORDER BY i) AS cumv,
         list(cumm ORDER BY i) AS cumm
  FROM {name}_cm GROUP BY orig
)"""


def _m(length_expr: str) -> str:
    """measure() of the prefix of the profiled word with given length."""
    return f"(CASE WHEN ({length_expr}) < 1 THEN 0 ELSE cumm[({length_expr})] END)"


def _hasv(length_expr: str) -> str:
    return f"(({length_expr}) >= 1 AND cumv[({length_expr})] > 0)"


def _cvc(w: str, n: str) -> str:
    """*o: prefix (length n) ends cons-vowel-cons, final not w/x/y."""
    return (
        f"(({n}) >= 3 AND cons[({n})-2] AND NOT cons[({n})-1] AND cons[({n})]"
        f" AND substr({w}, ({n}), 1) NOT IN ('w','x','y'))"
    )


def _dbl(w: str, n: str) -> str:
    """*d: prefix (length n) ends with a double consonant."""
    return (
        f"(({n}) >= 2 AND substr({w}, ({n}), 1) = substr({w}, ({n})-1, 1)"
        f" AND cons[({n})])"
    )


def _rule_case(pairs: list[tuple[str, str]], min_m: int) -> str:
    """Steps 2/3: first suffix match wins (Porter breaks on match even when
    the measure condition then fails); replace only if m(base) > min_m."""
    whens = []
    for suf, rep in pairs:
        k = len(suf)
        whens.append(
            f"WHEN ends_with(w, '{suf}') THEN"
            f" CASE WHEN {_m(f'n-{k}')} > {min_m}"
            f" THEN substr(w, 1, n-{k}) || '{rep}' ELSE w END"
        )
    return "CASE " + " ".join(whens) + " ELSE w END"


def stemmer_ctes() -> str:
    """CTE chain from ``w_long(orig, w)`` (lowercase words, length > 2) to
    ``pst_s5(orig, w)`` holding the Porter stem.  Callers add ``WITH``, the
    ``w_long`` input, and union length<=2 words back in unchanged."""
    step2 = _rule_case(_STEP2, 0)
    step3 = _rule_case(_STEP3, 0)

    step4_whens = []
    for suf in _STEP4:
        k = len(suf)
        if suf == "ion":
            # base must end in s/t; otherwise the scan continues, but no
            # later step-4 suffix can match a word ending 'ion' -> no-op
            step4_whens.append(
                f"WHEN ends_with(w, 'ion') THEN"
                f" CASE WHEN substr(w, n-3, 1) IN ('s','t')"
                f" AND {_m('n-3')} > 1 THEN substr(w, 1, n-3) ELSE w END"
            )
        else:
            step4_whens.append(
                f"WHEN ends_with(w, '{suf}') THEN"
                f" CASE WHEN {_m(f'n-{k}')} > 1"
                f" THEN substr(w, 1, n-{k}) ELSE w END"
            )
    step4 = "CASE " + " ".join(step4_whens) + " ELSE w END"

    return f"""
pst_s1a AS MATERIALIZED (
  SELECT orig,
    CASE WHEN ends_with(w, 'sses') THEN substr(w, 1, length(w)-2)
         WHEN ends_with(w, 'ies')  THEN substr(w, 1, length(w)-2)
         WHEN ends_with(w, 'ss')   THEN w
         WHEN ends_with(w, 's')    THEN substr(w, 1, length(w)-1)
         ELSE w END AS w
  FROM w_long
),
{_profile('pst_p1', 'pst_s1a')},
pst_s1b_in AS MATERIALIZED (
  SELECT s.orig, s.w, length(s.w) AS n, p.cons, p.cumv, p.cumm
  FROM pst_s1a s JOIN pst_p1 p USING (orig)
),
pst_s1b_strip AS MATERIALIZED (
  SELECT orig, cons, cumv, cumm,
    CASE WHEN ends_with(w, 'eed') THEN
           CASE WHEN {_m('n-3')} > 0 THEN substr(w, 1, n-1) ELSE w END
         WHEN ends_with(w, 'ed') AND {_hasv('n-2')} THEN substr(w, 1, n-2)
         WHEN ends_with(w, 'ing') AND {_hasv('n-3')} THEN substr(w, 1, n-3)
         ELSE w END AS w,
    CASE WHEN ends_with(w, 'eed') THEN false
         WHEN ends_with(w, 'ed') AND {_hasv('n-2')} THEN true
         WHEN ends_with(w, 'ing') AND {_hasv('n-3')} THEN true
         ELSE false END AS flag
  FROM pst_s1b_in
),
pst_s1b AS MATERIALIZED (
  -- fixups run on the stripped base, a prefix of pst_p1's word
  SELECT orig,
    CASE WHEN NOT flag THEN w
         WHEN ends_with(w, 'at') OR ends_with(w, 'bl') OR ends_with(w, 'iz')
           THEN w || 'e'
         WHEN {_dbl('w', 'n')} AND substr(w, n, 1) NOT IN ('l','s','z')
           THEN substr(w, 1, n-1)
         WHEN {_m('n')} = 1 AND {_cvc('w', 'n')} THEN w || 'e'
         ELSE w END AS w
  FROM (SELECT *, length(w) AS n FROM pst_s1b_strip)
),
{_profile('pst_p2', 'pst_s1b')},
pst_s1c AS MATERIALIZED (
  SELECT s.orig,
    CASE WHEN ends_with(s.w, 'y') AND {_hasv('length(s.w)-1')}
         THEN substr(s.w, 1, length(s.w)-1) || 'i' ELSE s.w END AS w
  FROM pst_s1b s JOIN pst_p2 p USING (orig)
),
{_profile('pst_p3', 'pst_s1c')},
pst_s2 AS MATERIALIZED (
  SELECT orig, {step2} AS w
  FROM (SELECT s.orig, s.w, length(s.w) AS n, p.cumm
        FROM pst_s1c s JOIN pst_p3 p USING (orig))
),
{_profile('pst_p4', 'pst_s2')},
pst_s3 AS MATERIALIZED (
  SELECT orig, {step3} AS w
  FROM (SELECT s.orig, s.w, length(s.w) AS n, p.cumm
        FROM pst_s2 s JOIN pst_p4 p USING (orig))
),
{_profile('pst_p5', 'pst_s3')},
pst_s4 AS MATERIALIZED (
  SELECT orig, {step4} AS w
  FROM (SELECT s.orig, s.w, length(s.w) AS n, p.cumm
        FROM pst_s3 s JOIN pst_p5 p USING (orig))
),
{_profile('pst_p6', 'pst_s4')},
pst_s5a AS MATERIALIZED (
  SELECT orig, cons, cumm,
    CASE WHEN ends_with(w, 'e') AND
           ({_m('n-1')} > 1 OR ({_m('n-1')} = 1 AND NOT {_cvc('w', 'n-1')}))
         THEN substr(w, 1, n-1) ELSE w END AS w
  FROM (SELECT s.orig, s.w, length(s.w) AS n, p.cons, p.cumm
        FROM pst_s4 s JOIN pst_p6 p USING (orig))
),
pst_s5 AS MATERIALIZED (
  -- 5b: the stripped candidate ends 'll' (l is always a consonant)
  SELECT orig,
    CASE WHEN ends_with(w, 'll') AND {_m('length(w)')} > 1
         THEN substr(w, 1, length(w)-1) ELSE w END AS w
  FROM pst_s5a
)"""


STEM_DICT_CTES = (
    "w_short AS MATERIALIZED (SELECT orig FROM vocab WHERE length(orig) <= 2),\n"
    "w_long AS MATERIALIZED (SELECT orig, orig AS w FROM vocab WHERE length(orig) > 2),"
    + stemmer_ctes()
    + """,
stems AS MATERIALIZED (
  SELECT orig, w AS stem FROM pst_s5
  UNION ALL
  SELECT orig, orig AS stem FROM w_short
)"""
)
