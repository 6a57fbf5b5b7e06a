"""Join utilities.

``Dataset.join`` (hash-shuffle, Acero per partition) crashes when either
side arrives with zero schema-bearing blocks ("No match or multiple
matches for key field"), which legitimately happens here: a corpus with
no hot buckets, no exact dups, or no candidate pairs produces empty
intermediate tables. ``inner_join``/``left_outer_join`` materialize the
inputs (the join is a full shuffle barrier anyway, so this changes
buffering, not asymptotics), short-circuit the empty cases, and return a
schema-correct empty Dataset instead.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data


def _empty(schema: pa.Schema) -> ray.data.Dataset:
    return ray.data.from_arrow(schema.empty_table())


def _base_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Schema of ``ds``, robust to Ray's zero-column empty blocks: when
    blocks mix real and schema-less-empty (hash-aggregate output), the
    reported schema can itself be the zero-column one — recover the real
    schema from the first actual row."""
    s = ds.schema()
    schema = s.base_schema if s is not None else pa.schema([])
    if len(schema) == 0:
        try:
            sample = ds.take_batch(1, batch_format="pyarrow")
            schema = sample.schema
        except Exception:
            pass  # genuinely empty dataset
    return schema


def _drop_empty_blocks(ds: ray.data.Dataset) -> ray.data.Dataset:
    """Strip zero-row blocks from a materialized dataset. Ray's hash
    aggregate emits zero-COLUMN empty blocks for empty partitions
    ("RefBundle with a different schema ... new schema: ." warnings);
    ``map_batches`` skips empty blocks without calling the UDF, so they
    survive every downstream transform and poison Acero joins ("No match
    ... for key field"). Driver-side metadata filter over block refs —
    no data moves."""
    refs = []
    for bundle in ds.iter_internal_ref_bundles():
        for ref, meta in bundle.blocks:
            if meta.num_rows is None or meta.num_rows > 0:
                refs.append(ref)
    if not refs:
        return _empty(_base_schema(ds))
    return ray.data.from_arrow_refs(refs)


def _joined_schema(left: ray.data.Dataset, right: ray.data.Dataset,
                   on: tuple, right_on: tuple | None) -> pa.Schema:
    ls = _base_schema(left)
    rs = _base_schema(right)
    rkeys = set(right_on or on)
    fields = list(ls)
    for f in rs:
        if f.name not in rkeys and f.name not in ls.names:
            fields.append(f)
    return pa.schema(fields)


_TARGET_PARTITION_BYTES = 64 << 20   # ~64 MiB of input per join partition
_MIN_JOIN_PARTS, _MAX_JOIN_PARTS = 4, 512


def _auto_partitions(left: ray.data.Dataset, right: ray.data.Dataset) -> int:
    """Join partition count sized by DATA VOLUME, not core count: every
    hash partition costs one aggregator actor (spin-up + shuffle fan-in),
    so partitions must each carry enough bytes to amortize it. Measured
    on the flagship at 480k docs: the same verify joins ran 16.9 s at 8
    partitions and 42.2 s at 16 — more partitions than the data supports
    makes joins SLOWER, at every CPU count. Inputs are materialized, so
    in-memory sizes are exact."""
    import math

    try:
        total = (left.size_bytes() or 0) + (right.size_bytes() or 0)
    except Exception:
        total = 0
    if total <= 0:
        return _MIN_JOIN_PARTS
    return max(_MIN_JOIN_PARTS,
               min(_MAX_JOIN_PARTS, math.ceil(total / _TARGET_PARTITION_BYTES)))


def inner_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple,
    right_on: tuple | None = None,
    num_partitions: int | None = None,
    empty_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    """``empty_schema``: the joined schema to use for the short-circuit
    empty result — pass it whenever an empty side is a legitimate outcome
    (a filtered-to-empty Dataset loses its schema entirely, so it cannot
    be composed from the inputs). ``num_partitions=None`` sizes the hash
    partition count from the materialized input bytes."""
    left = left.materialize()
    right = right.materialize()
    if left.count() == 0 or right.count() == 0:
        return _empty(empty_schema or _joined_schema(left, right, on, right_on))
    if num_partitions is None:
        num_partitions = _auto_partitions(left, right)
    left = _drop_empty_blocks(left)
    right = _drop_empty_blocks(right)
    return left.join(right, "inner", num_partitions=num_partitions,
                     on=on, right_on=right_on)


def left_outer_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    on: tuple,
    right_on: tuple | None = None,
    num_partitions: int | None = None,
    empty_schema: pa.Schema | None = None,
) -> ray.data.Dataset:
    left = left.materialize()
    right = right.materialize()
    if num_partitions is None:
        num_partitions = _auto_partitions(left, right)
    if left.count() == 0:
        return _empty(empty_schema or _joined_schema(left, right, on, right_on))
    if right.count() == 0:
        # left rows with nulls for every right payload column
        schema = empty_schema or _joined_schema(left, right, on, right_on)
        lnames = set(_base_schema(left).names)

        def pad(t: pa.Table) -> pa.Table:
            for f in schema:
                if f.name not in lnames:
                    t = t.append_column(f.name, pa.nulls(len(t), type=f.type))
            return t

        return left.map_batches(pad, batch_format="pyarrow")
    left = _drop_empty_blocks(left)
    right = _drop_empty_blocks(right)
    return left.join(right, "left_outer", num_partitions=num_partitions,
                     on=on, right_on=right_on)


# below this many small-side rows, an inner join on a UNIQUE key is a
# broadcast lookup (ray.put once + per-batch pc.index_in), not a shuffle
_BROADCAST_JOIN_CAP = 2_000_000


def broadcast_inner_join(
    left: ray.data.Dataset,
    small: ray.data.Dataset,
    on: str,
    empty_schema: pa.Schema | None = None,
    cap: int = _BROADCAST_JOIN_CAP,
) -> ray.data.Dataset:
    """Inner join against a small side with UNIQUE join keys (e.g. a
    canonical-per-group table): when ``small`` has <= ``cap`` rows it is
    packed into one Arrow table, ``ray.put`` once, and resolved per
    batch with a vectorized ``pc.index_in`` — zero shuffles, zero
    aggregator actors; the streaming left side never materializes.
    Above the cap (or for non-unique keys, which a lookup cannot
    express) callers get the hash-shuffle ``inner_join`` fallback.

    Key uniqueness on the small side is asserted at pack time — a
    lookup silently drops duplicate matches, so a violated assumption
    must fail loudly rather than return fewer rows than the join would.
    """
    import pyarrow.compute as pc
    import ray

    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    small = small.materialize()
    if small.count() == 0 or cap <= 0 or small.count() > cap:
        return inner_join(left, small, on=(on,), empty_schema=empty_schema)

    packed = pa.concat_tables(
        small.iter_batches(batch_size=None, batch_format="pyarrow")
    ).combine_chunks()
    keys = packed[on]
    n_unique = len(pc.unique(keys))
    if n_unique != len(packed):
        raise ValueError(
            f"broadcast_inner_join: small-side key '{on}' is not unique "
            f"({len(packed)} rows, {n_unique} distinct)"
        )
    ref = ray.put(packed)

    def lookup(t: pa.Table) -> pa.Table:
        lut: pa.Table = _get_broadcast(ref)
        idx = pc.index_in(t[on], value_set=lut[on]).combine_chunks()
        valid = pc.is_valid(idx)
        matched = t.filter(valid)
        taken = lut.take(idx.drop_null())
        for name in lut.column_names:
            if name != on and name not in matched.column_names:
                matched = matched.append_column(name, taken[name])
        return matched

    return left.map_batches(lookup, batch_format="pyarrow")


def broadcast_anti_join(
    left: ray.data.Dataset,
    keys: ray.data.Dataset,
    on: str,
    cap: int = _BROADCAST_JOIN_CAP,
) -> ray.data.Dataset:
    """left rows whose ``on`` does NOT appear in ``keys`` — the
    left_outer_join + is_null filter idiom without the shuffle: the key
    set broadcasts once and each batch filters with ``pc.index_in``.
    Falls back to the shuffle idiom above ``cap`` keys."""
    import pyarrow.compute as pc
    import ray

    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    keys = keys.materialize()
    if keys.count() == 0:
        return left
    if cap <= 0 or keys.count() > cap:
        marked = keys.map_batches(
            lambda t: pa.table({on: t[on],
                                "__anti": pa.array([True] * len(t))}),
            batch_format="pyarrow",
        )
        return left_outer_join(left, marked, on=(on,)).map_batches(
            lambda t: t.filter(pc.is_null(t["__anti"])).drop_columns(["__anti"]),
            batch_format="pyarrow",
        )

    packed = pa.concat_tables(
        keys.iter_batches(batch_size=None, batch_format="pyarrow")
    ).combine_chunks()
    key_arr = pc.unique(packed[on])
    ref = ray.put(key_arr)

    def filt(t: pa.Table) -> pa.Table:
        ks = _get_broadcast(ref)
        idx = pc.index_in(t[on], value_set=ks)
        return t.filter(pc.is_null(idx))

    return left.map_batches(filt, batch_format="pyarrow")


def broadcast_left_join(
    left: ray.data.Dataset,
    small: ray.data.Dataset,
    on: str,
    empty_schema: pa.Schema | None = None,
    cap: int = _BROADCAST_JOIN_CAP,
) -> ray.data.Dataset:
    """Left-outer flavor of ``broadcast_inner_join``: unmatched left
    rows pass through with nulls in the small side's payload columns.
    Same unique-key requirement and shuffle fallback."""
    import pyarrow.compute as pc
    import ray

    from ordinarydumpdeduplicator_ray.stages.verify import _get_broadcast

    small = small.materialize()
    n_small = small.count()
    if cap <= 0 or n_small > cap:
        return left_outer_join(left, small, on=(on,), empty_schema=empty_schema)
    if n_small == 0:
        schema = empty_schema
        if schema is None:
            return left

        def pad(t: pa.Table) -> pa.Table:
            for f in schema:
                if f.name not in t.column_names:
                    t = t.append_column(f.name, pa.nulls(len(t), type=f.type))
            return t

        return left.map_batches(pad, batch_format="pyarrow")

    packed = pa.concat_tables(
        small.iter_batches(batch_size=None, batch_format="pyarrow")
    ).combine_chunks()
    keys = packed[on]
    n_unique = len(pc.unique(keys))
    if n_unique != len(packed):
        raise ValueError(
            f"broadcast_left_join: small-side key '{on}' is not unique "
            f"({len(packed)} rows, {n_unique} distinct)"
        )
    ref = ray.put(packed)

    def lookup(t: pa.Table) -> pa.Table:
        lut: pa.Table = _get_broadcast(ref)
        idx = pc.index_in(t[on], value_set=lut[on]).combine_chunks()
        for name in lut.column_names:
            if name != on and name not in t.column_names:
                t = t.append_column(name, lut[name].take(idx))
        return t

    return left.map_batches(lookup, batch_format="pyarrow")
