"""Small shared helpers."""

from __future__ import annotations

import pandas as pd
import pyarrow as pa


def tune_context() -> None:
    """Size Ray Data's shuffle/read parallelism to the actual CPU count.

    The default of 200 partitions creates hundreds of near-empty shuffle
    tasks at small scale (pure scheduling overhead: a 6-group aggregate was
    spending 20s of wall on ~2s of compute). 2×CPUs keeps every core busy
    while bounding task count; at real cluster scale the CPU count grows and
    the setting scales with it. Idempotent and cheap — called from every
    pipeline entry point."""
    import ray
    from ray.data import DataContext

    ctx = DataContext.get_current()
    try:
        ncpu = int(ray.cluster_resources().get("CPU", 8)) if ray.is_initialized() else 8
    except Exception:
        ncpu = 8
    p = max(16, 2 * ncpu)
    for attr in ("min_parallelism", "read_op_min_num_blocks",
                 "default_hash_shuffle_parallelism"):
        if hasattr(ctx, attr):
            setattr(ctx, attr, p)


def read_parquet_clean(path, columns=None, **kwargs):
    """``rd.read_parquet`` with the file's pandas schema metadata stripped.

    Parquet written by pandas embeds a ``b'pandas'`` metadata dict in the
    file schema; Ray propagates it into every downstream block, and a
    pa.Schema carrying metadata is UNHASHABLE — defeating Ray's
    reduce-side schema dedup and flooding every shuffle's logs with
    "Failed to hash the schemas (for deduplication)" warnings (VERDICT r2
    #9). Passing an explicit metadata-free schema keeps every read block
    clean at the source; one driver-side footer read, no extra map stage.
    """
    import pyarrow.parquet as pq
    import ray.data as rd

    if "schema" not in kwargs:
        first = path[0] if isinstance(path, (list, tuple)) else path
        try:
            sch = pq.read_schema(first).remove_metadata()
            if columns is not None:
                sch = pa.schema([sch.field(c) for c in columns])
            kwargs["schema"] = sch
        except Exception:
            pass  # directory paths / odd stores: fall back to plain read
    return rd.read_parquet(path, columns=columns, **kwargs)


def pandas_to_arrow(df: pd.DataFrame, schema: pa.Schema) -> pa.Table:
    """Normalize a (possibly empty/column-less) pandas block to an Arrow
    table with the canonical schema — keeps every operator's output schema
    stable regardless of empty shuffle partitions.

    The pandas metadata dict ``from_pandas`` attaches is stripped: it is
    unhashable, which defeats Ray's reduce-side schema dedup and floods the
    logs with "Failed to hash the schemas" warnings."""
    if df is None or len(df) == 0 or df.shape[1] == 0:
        return pa.Table.from_pylist([], schema=schema)
    return pa.Table.from_pandas(df, schema=schema,
                                preserve_index=False).replace_schema_metadata(None)
