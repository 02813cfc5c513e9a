"""Persistent versioned table storage (reference src/storage/).

The reference persists tables as row groups in a single-file block
store, with a WAL for in-flight commits, MVCC snapshots for readers,
and a checkpoint that folds the WAL into the block file
(storage_manager.cpp, checkpoint_manager.cpp, data_table.cpp).

On Spark the durable analog is file-granularity copy-on-write over
parquet (the design Delta Lake / Iceberg standardized): every commit
writes NEW immutable data files plus one JSON manifest naming the
exact file set of that version.  Readers resolve a manifest — latest
or AS OF an older version — so snapshot isolation and time travel fall
out of immutability instead of an MVCC chain.
"""

from data_chunk_compaction_in_duckdb_spark.storage.sequence import (
    Sequence,
    SequenceExhausted,
    with_sequence,
)
from data_chunk_compaction_in_duckdb_spark.storage.transaction import (
    Transaction,
    TransactionAborted,
)
from data_chunk_compaction_in_duckdb_spark.storage.versioned import (
    CommitConflictError,
    ConstraintViolation,
    VersionedTable,
)

__all__ = [
    "CommitConflictError",
    "ConstraintViolation",
    "Sequence",
    "SequenceExhausted",
    "Transaction",
    "TransactionAborted",
    "VersionedTable",
    "with_sequence",
]
