"""Scatter update — the Spark replacement for positional assignment
(SURVEY.md §2 J3).

Reference parity: ``imputed.loc[list(na.index), column] = predictions``
(scikit_learn_imputer.py:272, 350) — write predicted values into the missing
cells of one column, leaving every other cell untouched.

Scale notes: expressed as a key equi-join + coalesce. The updates side is
only the missing rows (a small fraction of the table), so it is broadcast
when below the hint threshold — no shuffle of the base table. With a large
updates side, Catalyst/AQE falls back to a shuffled hash join on the id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def scatter_update(
    base: DataFrame,
    updates: DataFrame,
    id_col: str,
    col: str,
    update_col: str | None = None,
    broadcast_updates: bool = True,
) -> DataFrame:
    """Return ``base`` with ``col`` replaced by the update value on rows whose
    ``id_col`` appears in ``updates``; NULL-only semantics come from
    coalesce order: base value wins when present."""
    update_col = update_col or col
    upd = updates.select(
        F.col(id_col), F.col(update_col).alias("__upd")
    )
    if broadcast_updates:
        upd = F.broadcast(upd)
    joined = base.join(upd, on=id_col, how="left")
    return joined.select(
        *[
            (
                F.coalesce(F.col(c), F.col("__upd")).alias(c)
                if c == col
                else F.col(c)
            )
            for c in base.columns
        ]
    )
