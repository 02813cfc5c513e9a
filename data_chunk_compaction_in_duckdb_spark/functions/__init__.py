"""Gap functions: reference scalar/aggregate functions with no Spark
built-in (SURVEY.md §2.8 mapping table "gaps to implement").

Scalar gaps (string similarity, gamma family, gcd/lcm) are vectorized
pandas UDFs — the honest analog of DuckDB's vector-at-a-time C++ UDFs
(reference src/main/udf_wrapper.cpp).  Aggregate gaps (mad, entropy,
deterministic mode, exact discrete quantile) are DataFrame combinators
built from shuffles Spark already plans well.
"""

from data_chunk_compaction_in_duckdb_spark.functions.scalar import (  # noqa: F401
    damerau_levenshtein,
    gamma_udf,
    gcd_udf,
    hamming,
    jaccard,
    jaro_winkler,
    lcm_udf,
    lgamma_udf,
    nextafter_udf,
)
from data_chunk_compaction_in_duckdb_spark.functions.aggregates import (  # noqa: F401
    bitstring_agg,
    entropy_agg,
    mad_agg,
    mode_deterministic,
    quantile_disc,
)
