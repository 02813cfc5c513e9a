"""CSV dialect matrix, validated against DuckDB's read_csv on the SAME
bytes (reference test/sql/copy/csv/ — DELIM/QUOTE/ESCAPE/NULLSTR/
HEADER/compression each have their own test files there)."""

from __future__ import annotations

import gzip

import duckdb
import pytest

from data_chunk_compaction_in_duckdb_spark.sources.readers import read_csv

SCHEMA = "a STRING, b STRING, c INT"


def _nullsort(rows):
    return sorted(
        (tuple(r) for r in rows),
        key=lambda t: tuple((v is None, v) if v is not None else (True, "")
                            for v in t),
    )


def _spark_rows(spark, path, **kw):
    df = read_csv(spark, str(path), schema=SCHEMA, **kw)
    return _nullsort(df.collect())


def _duck_rows(path, **kw):
    def lit(v):
        if isinstance(v, str):
            return "'" + v.replace("'", "''") + "'"
        return str(v)

    opts = ", ".join(
        [
            "columns = {'a': 'VARCHAR', 'b': 'VARCHAR', 'c': 'INT'}",
            *[f"{k} = {lit(v)}" for k, v in kw.items()],
        ]
    )
    rows = duckdb.connect().execute(
        f"SELECT * FROM read_csv('{path}', {opts})"
    ).fetchall()
    return _nullsort(rows)


def test_rfc4180_quote_doubling(spark, tmp_path):
    p = tmp_path / "q.csv"
    p.write_text(
        'a,b,c\n"x,1","say ""hi""",3\nplain,val,4\n'
    )
    s = _spark_rows(spark, p)
    d = _duck_rows(p, header=True)
    assert s == d == [("plain", "val", 4), ("x,1", 'say "hi"', 3)]


def test_custom_delimiter_and_quote(spark, tmp_path):
    p = tmp_path / "pipe.csv"
    p.write_text("a|b|c\n'x|1'|y|2\nu|v|3\n")
    s = _spark_rows(spark, p, delimiter="|", quote="'", escape="'")
    d = _duck_rows(p, header=True, delim="|", quote="'")
    assert s == d
    assert ("x|1", "y", 2) in s


def test_null_string(spark, tmp_path):
    p = tmp_path / "n.csv"
    p.write_text("a,b,c\nNULL,x,1\ny,NULL,2\n")
    s = _spark_rows(spark, p, null_str="NULL")
    d = _duck_rows(p, header=True, nullstr="NULL")
    assert s == d
    assert (None, "x", 1) in s and ("y", None, 2) in s


def test_backslash_escape(spark, tmp_path):
    p = tmp_path / "e.csv"
    p.write_text('a,b,c\n"x \\"inner\\"","y",5\n')
    s = _spark_rows(spark, p, escape="\\")
    d = _duck_rows(p, header=True, escape="\\")
    assert s == d == [('x "inner"', "y", 5)]


def test_headerless(spark, tmp_path):
    p = tmp_path / "h.csv"
    p.write_text("r1,s1,1\nr2,s2,2\n")
    s = _spark_rows(spark, p, header=False)
    d = _duck_rows(p, header=False)
    assert s == d and len(s) == 2


def test_gzip_transparent(spark, tmp_path):
    p = tmp_path / "z.csv.gz"
    with gzip.open(p, "wt") as f:
        f.write("a,b,c\ng1,g2,9\n")
    s = _spark_rows(spark, p)
    d = _duck_rows(p, header=True)
    assert s == d == [("g1", "g2", 9)]


def test_comment_lines_spark_side(spark, tmp_path):
    # comment-prefix skipping is Spark-side only (DuckDB's comment
    # option landed later than the local build) — assert behavior, not
    # parity
    p = tmp_path / "c.csv"
    p.write_text("a,b,c\n#skip me\nx,y,1\n")
    s = _spark_rows(spark, p, comment="#")
    assert s == [("x", "y", 1)]


def test_date_format_roundtrip(spark, tmp_path):
    p = tmp_path / "d.csv"
    p.write_text("a,d\nrow1,14/08/2026\n")
    df = read_csv(
        spark, str(p), schema="a STRING, d DATE", date_format="dd/MM/yyyy"
    )
    [(a, d)] = [tuple(r) for r in df.collect()]
    assert a == "row1" and str(d) == "2026-08-14"
