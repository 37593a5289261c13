"""BPE merge-learning (operators/bpe.py): the left-to-right
non-overlapping fold is the part with classic off-by-one hazards —
property-test it against a straightforward Python reference."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from prefect_flow_arc_alto_to_json_spark.operators.bpe import (
    _apply_merge,
    bpe_learn_merges,
)


def _ref_merge(syms: list[str], a: str, b: str) -> list[str]:
    out: list[str] = []
    i = 0
    while i < len(syms):
        if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return out


SYM = st.sampled_from(["a", "b", "c", "ab", "bc"])


@settings(max_examples=30, deadline=None)
@given(st.lists(SYM, min_size=1, max_size=8), SYM, SYM)
def test_apply_merge_matches_reference(spark, syms, a, b):
    df = spark.createDataFrame([(syms,)], "syms array<string>")
    got = df.select(
        _apply_merge(F.col("syms"), F.lit(a), F.lit(b)).alias("m")
    ).collect()[0]["m"]
    assert got == _ref_merge(syms, a, b), (syms, a, b)


def test_learn_merges_on_tiny_corpus(spark, sf_dir):
    # 'aaab' x3 + 'ab': step1 merges (a,a) [count 2*3+0=6... positions:
    # 'aaab' has (a,a) twice, (a,b) once; 'ab' has (a,b) once].
    docs = spark.createDataFrame(
        [(1, "aaab aaab aaab ab")], "doc_id long, text string"
    )
    rows = {
        r["step"]: (r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in bpe_learn_merges(docs, k=2).collect()
    }
    # vocab: aaab (n=3), ab (n=1). step1: (a,a)=6 beats (a,b)=4.
    assert rows[1] == ("a", "a", "aa", 6)
    # after merge: aaab -> [aa, a, b]; pairs: (aa,a)=3, (a,b)=3+1=4.
    assert rows[2] == ("a", "b", "ab", 4)
