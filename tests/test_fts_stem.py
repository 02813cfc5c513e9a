"""Porter stemmer (pipeline/stem.py; reference
extension/fts/fts_indexing.cpp stemmer option): validated against the
published algorithm's example vocabulary (M.F. Porter, Program 14(3)
1980), plus the stemmed-FTS equivalence invariant."""

from __future__ import annotations

import pytest

from data_chunk_compaction_in_duckdb_spark.pipeline.stem import porter_stem

# full-algorithm outputs (all five steps), spot-checked against the
# published reference implementation's behavior
_VOCAB = {
    "caresses": "caress", "ponies": "poni", "ties": "ti",
    "caress": "caress", "cats": "cat", "feed": "feed", "agreed": "agre",
    "plastered": "plaster", "bled": "bled", "motoring": "motor",
    "sing": "sing", "conflated": "conflat", "troubled": "troubl",
    "sized": "size", "hopping": "hop", "tanned": "tan", "falling": "fall",
    "hissing": "hiss", "fizzed": "fizz", "failing": "fail",
    "filing": "file", "happy": "happi", "sky": "sky",
    "relational": "relat", "conditional": "condit", "rational": "ration",
    "valenci": "valenc", "hesitanci": "hesit", "digitizer": "digit",
    "conformabli": "conform", "radicalli": "radic", "vileli": "vile",
    "analogousli": "analog", "vietnamization": "vietnam",
    "predication": "predic", "operator": "oper", "feudalism": "feudal",
    "decisiveness": "decis", "hopefulness": "hope",
    "callousness": "callous", "formaliti": "formal",
    "sensitiviti": "sensit", "sensibiliti": "sensibl",
    "triplicate": "triplic", "formative": "form", "formalize": "formal",
    "electriciti": "electr", "electrical": "electr", "hopeful": "hope",
    "goodness": "good", "revival": "reviv", "allowance": "allow",
    "inference": "infer", "airliner": "airlin", "gyroscopic": "gyroscop",
    "adjustable": "adjust", "defensible": "defens", "irritant": "irrit",
    "replacement": "replac", "adjustment": "adjust",
    "dependent": "depend", "adoption": "adopt", "communism": "commun",
    "activate": "activ", "angulariti": "angular",
    "homologous": "homolog", "effective": "effect",
    "bowdlerize": "bowdler", "probate": "probat", "rate": "rate",
    "cease": "ceas", "controll": "control", "roll": "roll",
    "differentli": "differ",
}


def test_porter_published_vocabulary():
    bad = {
        w: (porter_stem(w), want)
        for w, want in _VOCAB.items()
        if porter_stem(w) != want
    }
    assert not bad, bad


def test_porter_short_words_untouched():
    for w in ("a", "is", "by", "the"):
        assert porter_stem(w) in (w, "the")
    assert porter_stem("the") == "the"


def test_stemmed_search_equals_plain_search_on_base_corpus(spark, sf_dir):
    """Invariant: inflecting the corpus 1:1 (join->joining, ...) and
    searching with stemmer='porter' reproduces the UNSTEMMED scores on
    the original corpus bit-for-bit — tf, df, dl and the corpus stats
    are all preserved under a per-token bijection, and porter folds the
    variants back to one stem class per word."""
    from pyspark.sql import functions as F

    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.pipeline import bm25_scores

    docs = load_table(spark, sf_dir, "documents")
    plain = bm25_scores(docs, "doc_id", "text", ["join", "merge", "sort"])
    inflected = docs.select(
        "doc_id",
        F.expr(
            "replace(replace(replace(lower(text), "
            "'join', 'joining'), 'merge', 'merges'), 'sort', 'sorted')"
        ).alias("text"),
    )
    stemmed = bm25_scores(
        inflected, "doc_id", "text", ["joins", "merging", "sorts"],
        stemmer="porter",
    )
    # 'merge'/'sort' stem to 'merg'/'sort' in BOTH paths? No: the plain
    # path does NOT stem, so compare on rounded score multisets keyed
    # by doc — the score math sees identical tf/df/dl either way.
    a = {r["doc"]: round(r["score"], 6) for r in plain.collect()}
    b = {r["doc"]: round(r["score"], 6) for r in stemmed.collect()}
    assert a == b


def test_fts_index_persists_stemmer(spark, sf_dir, tmp_path):
    from data_chunk_compaction_in_duckdb_spark.catalog import load_table
    from data_chunk_compaction_in_duckdb_spark.pipeline import FTSIndex

    docs = load_table(spark, sf_dir, "documents").limit(50)
    idx = FTSIndex.build(
        spark, str(tmp_path / "ix"), docs, "doc_id", "text",
        stemmer="porter",
    )
    assert idx.meta["stemmer"] == "porter"
    # reopened index stems query terms the same way
    idx2 = FTSIndex(spark, str(tmp_path / "ix"))
    out = {
        r["doc"] for r in idx2.search(["merges", "merging"]).collect()
    }
    direct = {r["doc"] for r in idx.search(["merge"]).collect()}
    assert out == direct and out
