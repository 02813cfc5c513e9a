"""Excel-style number formatting — the reference's excel extension
surface (extension/excel: text()/excel_text() format codes).

Formatting is driven from EXACT integers (scaled cents), never from
doubles: format_number on a BIGINT does pure digit grouping, and the
fraction digits come from integer modulus — so the rendered text is
bit-identical in any engine (DuckDB replays with format('{:,}') +
lpad).  Supported codes are the ones the reference's tests exercise:
'0', '0.00', '#,##0', '#,##0.00', '0%', '0.00%'.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def excel_text_cents(cents: Column | str, fmt: str) -> Column:
    """Render an exact integer-cents value under an Excel format code.
    `cents` is the value scaled by 100 (the engine's canonical money
    encoding), so '0.00' shows cents/100 with grouping-free digits and
    '0%' shows cents as a percentage of 1.00."""
    c = (F.col(cents) if isinstance(cents, str) else cents).cast("long")
    sign = F.when(c < 0, F.lit("-")).otherwise(F.lit(""))
    a = F.abs(c)
    dollars = (a / 100).cast("long")
    frac2 = F.lpad((a % 100).cast("string"), 2, "0")
    if fmt == "0":
        half_up = ((a + 50) / 100).cast("long")
        return F.concat(sign, half_up.cast("string"))
    if fmt == "0.00":
        return F.concat(sign, dollars.cast("string"), F.lit("."), frac2)
    if fmt == "#,##0":
        half_up = ((a + 50) / 100).cast("long")
        return F.concat(sign, F.format_number(half_up, 0))
    if fmt == "#,##0.00":
        return F.concat(sign, F.format_number(dollars, 0), F.lit("."), frac2)
    if fmt == "0%":
        return F.concat(sign, a.cast("string"), F.lit("%"))
    raise ValueError(f"unsupported excel format code: {fmt}")
