"""The research delta, Spark-native: data-chunk compaction.

The reference (SIGMOD'25 "Data Chunk Compaction in Vectorized Execution")
keeps 2048-tuple vectors full between operators by caching undersized
chunks and re-emitting them compacted (CompactingPhysicalOperator,
src/execution/physical_operator.cpp:250-311), choosing the threshold with
a UCB1 bandit (CompactTuner, src/include/duckdb/common/negative_feedback.hpp).

Spark's execution unit is the partition, and the same computation —
"detect undersized data units, adaptively coalesce them to a learned
target before the next operator" — appears as the small-partition /
small-file problem.  This package provides:

- profiler.py   partition-size stats + chunk-factor metrics
                (BeeProfiler/ZebraProfiler/HashJoinProfiler analog)
- compact.py    compact()/pipeline_break() DataFrame operators
                (CompactingPhysicalOperator / PhysicalPipelineBreaker)
- tuner.py      UCB1 multi-armed bandit learning target sizes per named
                stage (CompactTuner/MultiArmedBandit)
- auto.py       AutoCompactFrame — the operator-wrapper analog: filters/
                joins mark compaction points, settled automatically
                before the next consumer (Engine(auto_compact=True))
"""

from data_chunk_compaction_in_duckdb_spark.compaction.auto import (  # noqa: F401
    AutoCompactFrame,
    unwrap,
)

from data_chunk_compaction_in_duckdb_spark.compaction.compact import (  # noqa: F401
    compact,
    fan_out,
    pipeline_break,
)
from data_chunk_compaction_in_duckdb_spark.compaction.profiler import (  # noqa: F401
    chunk_factor,
    fragmentation_report,
    partition_histogram,
    partition_row_counts,
)
from data_chunk_compaction_in_duckdb_spark.compaction.tuner import (  # noqa: F401
    CompactTuner,
    UCB1Bandit,
)
from data_chunk_compaction_in_duckdb_spark.compaction.integration import (  # noqa: F401
    run_stage_tuned,
)
