"""Logical MERGE INTO plan, expressed as a pure DataFrame rewrite.

Replaces the reference's append-then-override SQL load
(PyOrchDB/utilities/tools.py:103-133) with true upsert/delete semantics:

    MERGE INTO target t USING source s
      ON t.repo = s.repo AND t.path = s.path
      WHEN MATCHED AND s.op = 'delete' AND s.seq > t.seq THEN DELETE
      WHEN MATCHED AND s.seq > t.seq THEN UPDATE SET *
      WHEN NOT MATCHED AND s.op <> 'delete' THEN INSERT *

Because the engine's conflict rule is total (last-writer-wins over
``seq`` with deterministic tiebreakers), the whole statement collapses to
one algebraic form:

    merged = final_state( target_rows  UNION BY NAME  source_rows )

which Catalyst executes as one hash-partitioned aggregate — no join at
all, and it is *idempotent*: re-applying an already-applied batch is a
no-op (the ``s.seq > t.seq`` guard falls out of the LWW ordering). That
is what makes a crash between data commit and marker write safe
(SURVEY.md section 7, hard part 1).

**Tombstones are retained in stored state** (op='delete' rows survive the
merge; they are filtered out of user-facing reads). This is load-bearing
for out-of-order delivery ACROSS batches: if batch B1 applies a delete at
seq 200 and batch B2 later delivers an upsert at seq 100, only the
retained tombstone can veto the resurrection. Tombstone GC happens at
compaction time (LakeTable.compact) once the ingest low-watermark passes
the tombstone's seq — the same contract as Kafka compacted topics /
Cassandra tombstones / Iceberg MoR deletes.

``unionByName(allowMissingColumns=True)`` is simultaneously the additive
schema-evolution mechanism: a batch introducing a new column unions with
old target rows carrying null (SURVEY.md section 4 item 3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame

from pyorchdb_spark.operators.dedup import DEFAULT_KEYS, lww_dedup, lww_dedup_salted


def resolve_merge(
    target_rows: DataFrame,
    source_events: DataFrame,
    keys: Sequence[str] = DEFAULT_KEYS,
    seq_col: str = "seq",
    salted: bool = False,
    n_salts: int = 16,
) -> DataFrame:
    """Return the post-merge stored state of the given target slice.

    Both inputs carry the ``op`` column; the result is the LWW winner per
    key *including* tombstone winners (see module docstring). Callers
    expose user-facing state by filtering ``op != 'delete'``.
    """
    unioned = target_rows.unionByName(source_events, allowMissingColumns=True)
    if salted:
        return lww_dedup_salted(unioned, keys=keys, seq_col=seq_col, n_salts=n_salts)
    return lww_dedup(unioned, keys=keys, seq_col=seq_col)
