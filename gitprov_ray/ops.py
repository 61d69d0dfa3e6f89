"""Reusable distributed operator helpers: salted aggregation for hot-key
skew (SURVEY.md §4.2 "Shuffles" row; the north rule's explicit skew
handling).

A power-law key (one domain holding 20% of rows, one ubiquitous agent)
makes a plain ``groupby(key)`` place that key's entire weight on one
reducer. ``salted_*`` split each key into ``num_salts`` sub-keys during the
partial phase so the heavy key's work spreads across reducers, then a small
second-phase combine removes the salt. Exact for decomposable aggregates
(count/sum/min/max).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def salted_value_counts(ds, col: str, num_salts: int = 16,
                        final: str = "driver"):
    """Exact per-value counts with salted two-phase aggregation.

    Phase 1 (map): per-batch partial counts keyed by (value, salt) where
    salt = row_position % num_salts — a hot value's partials spread over
    ``num_salts`` reducer keys instead of one.
    Phase 2: combine per value with the salt dropped. ``final='driver'``
    merges the (tiny) salted partials on the driver; ``final='shuffle'``
    runs a bucketed groupby for high-cardinality value domains.
    Returns a pandas DataFrame (value, n) sorted by value.
    """

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        salt = np.arange(len(df), dtype=np.int64) % num_salts
        g = pd.DataFrame({col: df[col].to_numpy(), "salt": salt, "n": 1})
        a = g.groupby([col, "salt"], sort=False)["n"].sum()
        return a.reset_index()

    partials = ds.map_batches(partial, batch_format="pandas")

    if final == "shuffle":
        from .stages.versions import stable_bucket

        def bucketize(df: pd.DataFrame) -> pd.DataFrame:
            df = df.copy()
            s = df[col].astype(str)
            df["bucket"] = stable_bucket(s, s, max(8, num_salts))
            return df

        combined = (partials.map_batches(bucketize, batch_format="pandas")
                    .groupby("bucket")
                    .map_groups(lambda df: df.groupby(col, sort=False,
                                                      as_index=False)["n"].sum(),
                                batch_format="pandas")
                    .to_pandas())
        return combined.sort_values(col).reset_index(drop=True)

    merged = partials.to_pandas().groupby(col, as_index=False)["n"].sum()
    return merged.sort_values(col).reset_index(drop=True)


def salted_sum(ds, key_col: str, val_col: str, num_salts: int = 16):
    """Exact per-key integer sum with salted two-phase aggregation."""

    def partial(df: pd.DataFrame) -> pd.DataFrame:
        salt = np.arange(len(df), dtype=np.int64) % num_salts
        g = pd.DataFrame({key_col: df[key_col].to_numpy(), "salt": salt,
                          "v": df[val_col].to_numpy()})
        return g.groupby([key_col, "salt"], sort=False)["v"].sum().reset_index()

    merged = (ds.map_batches(partial, batch_format="pandas")
              .to_pandas().groupby(key_col, as_index=False)["v"].sum())
    return merged.rename(columns={"v": f"sum_{val_col}"}) \
                 .sort_values(key_col).reset_index(drop=True)
