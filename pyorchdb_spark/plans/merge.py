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

which Catalyst executes as one hash-partitioned window — no join at all,
and it is *idempotent*: re-applying an already-applied batch is a no-op
(the ``s.seq > t.seq`` guard falls out of row_number ordering). That is
what makes a crash between data commit and marker write safe
(SURVEY.md section 7, hard part 1).

``unionByName(allowMissingColumns=True)`` is simultaneously the additive
schema-evolution mechanism: a batch introducing a new column unions with
old target rows carrying null (SURVEY.md section 4 item 3).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from pyorchdb_spark.operators.dedup import DEFAULT_KEYS, final_state

# Columns that exist only in the change-event envelope, never in the
# stored table state.
EPHEMERAL_COLS = ("op",)


def resolve_merge(
    target_rows: DataFrame,
    source_events: DataFrame,
    keys: Sequence[str] = DEFAULT_KEYS,
    seq_col: str = "seq",
    salted: bool = False,
    n_salts: int = 16,
) -> DataFrame:
    """Return the post-merge state of the given target slice.

    ``target_rows``: current rows (no ``op`` column — stored state holds
    upserts only). ``source_events``: raw change events for this batch
    (may contain duplicates, out-of-order seqs, tombstones).
    """
    t = target_rows.withColumn("op", F.lit("upsert"))
    unioned = t.unionByName(source_events, allowMissingColumns=True)
    merged = final_state(unioned, keys=keys, seq_col=seq_col, salted=salted, n_salts=n_salts)
    return merged.drop(*EPHEMERAL_COLS)
