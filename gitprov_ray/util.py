"""Small shared helpers."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def pandas_to_arrow(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """Normalize a (possibly empty/column-less) pandas block to an Arrow
    table with the canonical schema — keeps every operator's output schema
    stable regardless of empty shuffle partitions."""
    if df is None or len(df) == 0 or df.shape[1] == 0:
        return pa.Table.from_pylist([], schema=schema)
    return pa.Table.from_pandas(df, schema=schema, preserve_index=False)
