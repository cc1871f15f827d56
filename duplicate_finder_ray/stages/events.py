"""Windowed aggregates over the events table.

The reference has no streaming/window operators (SURVEY.md §2.5); these
are the batch equivalents a training-data pipeline needs for event-log
hygiene: tumbling-window aggregation and gap-based sessionization.

Execution shape:

* tumbling windows: window key is derived row-locally (timestamp
  truncation — no shuffle), then ONE distributed groupby-aggregate over
  (window, key) with per-batch partial aggregation folded in by Ray's
  sort-based aggregate. Monetary values aggregate as integer cents so
  distributed double-summation order can never change the result.
* sessionization: per-user gap analysis needs each user's events
  together and time-ordered ⇒ ONE barrier-free hash exchange keyed by
  ``hash(user_id) % P`` (stages/exchange.py), then a fully vectorized
  per-PARTITION kernel: lexsort by (user, ts, event_id), boundary flags
  from diffs, sessions as index arithmetic over the flag positions —
  the same two-level shape as exact.py's partition kernels, so the
  interpreter cost is P calls, not one per user (round-2 VERDICT item).
  Skew note: the hottest user's event count bounds nothing here (a
  partition holds many users); balance needs user_id cardinality ≫ P.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Count, Max, Sum

_HOUR_US = 3_600_000_000


def hourly_rollup(events: ray.data.Dataset) -> ray.data.Dataset:
    """Tumbling 1-hour windows per event_type: event count + exact
    value sum in cents. Output: (window_start_us, event_type, n_events,
    sum_value_cents)."""

    def add_window(batch: pa.Table) -> pa.Table:
        # force µs before the int cast (sources vary between us/ns units)
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        window = pc.multiply(pc.divide(ts_us, _HOUR_US), _HOUR_US)
        # floor(x*100 + 0.5): explicit round-half-up on BOTH the engine and
        # the DuckDB oracle (Arrow pc.round is half-to-even, DuckDB round()
        # is half-away-from-zero — either alone diverges on exact .5 cents)
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["value"], 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {
                "window_start_us": window,
                "event_type": batch["event_type"],
                "value_cents": cents,
            }
        )

    return (
        events.select_columns(["ts", "event_type", "value"])
        .map_batches(add_window, batch_format="pyarrow")
        .groupby(["window_start_us", "event_type"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )


def seasonality_profile(events: ray.data.Dataset) -> ray.data.Dataset:
    """Calendar seasonality: event count + exact cent sum per
    (day-of-week, hour-of-day) cell — the 7×24 heatmap behind traffic
    shaping and anomaly baselines. Pure integer calendar decode on the
    epoch lattice: hour = (epoch_us // 3600e6) % 24, dow =
    ((epoch_days + 3) % 7) + 1 with Monday=1..Sunday=7 ISO numbering
    matched to DuckDB's isodow() (1970-01-01 was a Thursday: day 0 →
    (3 % 7) + 1 = 4) — no timezone lib, identical arithmetic in the
    SQL twin. Scan-side combiner → ONE ≤168-row
    groupby."""
    _DAY_US = 86_400_000_000

    def decode(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        t = ts_us.to_numpy()
        hour = (t // _HOUR_US) % 24
        # epoch day 0 = Thursday; ISO dow: Mon=1..Sun=7
        dow = ((t // _DAY_US) + 3) % 7 + 1
        cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["value"], 100.0), 0.5)),
            pa.int64(),
        )
        return pa.table(
            {
                "dow": pa.array(dow, pa.int64()),
                "hour": pa.array(hour, pa.int64()),
                "value_cents": cents,
            }
        )

    return (
        events.select_columns(["ts", "value"])
        .map_batches(decode, batch_format="pyarrow")
        .groupby(["dow", "hour"])
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )


def hourly_dense(events: ray.data.Dataset, n_parts: int = 16) -> ray.data.Dataset:
    """Gap-filled hourly event counts: every hour between the corpus
    min and max hour appears, zero-count hours included — the dense
    time series downstream anomaly detection / rate charts need (a
    sparse groupby silently hides outage hours). Output:
    (hour_us, n_events).

    Scale shape: per-batch hour-count partials → one hours-cardinality
    groupby-sum (tiny: 8 760 rows/year), materialized once; the hour
    DIMENSION is synthesized with ``ray.data.range`` off two scalar
    folds and left-joined back on the barrier-free shuffle hash join —
    the raw event rows never shuffle."""
    from ray.data.aggregate import Sum as _Sum

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        hour = pc.multiply(pc.divide(ts_us, _HOUR_US), _HOUR_US)
        vc = pc.value_counts(hour.combine_chunks())
        return pa.table(
            {
                "hour_us": vc.field("values"),
                "n": vc.field("counts").cast(pa.int64()),
            }
        )

    counts = (
        events.select_columns(["ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("hour_us")
        .aggregate(_Sum("n", alias_name="n_events"))
        .materialize()  # hours-cardinality (tiny); reused by folds + join
    )
    out_schema = pa.schema([("hour_us", pa.int64()), ("n_events", pa.int64())])
    lo = counts.min("hour_us")
    if lo is None:  # empty events table: empty dense series
        return ray.data.from_arrow(out_schema.empty_table())
    hi = counts.max("hour_us")
    n_hours = (int(hi) - int(lo)) // _HOUR_US + 1
    lo = int(lo)

    def to_hours(batch: pa.Table) -> pa.Table:
        i = batch.column("id").to_numpy()
        return pa.table(
            {"hour_us": pa.array(lo + i * _HOUR_US, pa.int64())}
        )

    hours = ray.data.range(n_hours).map_batches(to_hours, batch_format="pyarrow")

    from duplicate_finder_ray.stages.join import shuffle_hash_join

    joined = shuffle_hash_join(
        hours, counts, "hour_us", "hour_us", n_parts, how="left"
    )

    def fill(batch: pa.Table) -> pa.Table:
        return pa.table(
            {
                "hour_us": batch["hour_us"],
                "n_events": pc.coalesce(
                    batch["n_events"], pa.scalar(0, pa.int64())
                ),
            }
        )

    return joined.map_batches(fill, batch_format="pyarrow")


def sliding_rollup(
    events: ray.data.Dataset,
    window_minutes: int = 60,
    step_minutes: int = 15,
) -> ray.data.Dataset:
    """Sliding-window aggregate: windows of ``window_minutes`` starting
    every ``step_minutes`` (window_minutes must be a multiple of
    step_minutes). Each event lands in window_minutes/step_minutes
    windows — the fan-out is done ROW-LOCALLY inside map_batches
    (numpy tile/repeat, no shuffle), then ONE distributed groupby sums
    integer cents. Amplification = window/step (bounded, chosen by the
    caller), never data-dependent. Output: (window_start_us, n_events,
    sum_value_cents) for windows with ≥1 event."""
    if window_minutes % step_minutes:
        raise ValueError("window_minutes must be a multiple of step_minutes")
    step_us = step_minutes * 60_000_000
    fanout = window_minutes // step_minutes

    def explode_windows(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(
            pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy()
        cents = (
            np.floor(batch["value"].to_numpy() * 100.0 + 0.5).astype(np.int64)
        )
        base = (ts_us // step_us) * step_us
        ks = np.arange(fanout, dtype=np.int64) * step_us
        starts = np.repeat(base, fanout) - np.tile(ks, len(base))
        return pa.table(
            {
                "window_start_us": pa.array(starts, pa.int64()),
                "value_cents": pa.array(np.repeat(cents, fanout), pa.int64()),
            }
        )

    return (
        events.select_columns(["ts", "value"])
        .map_batches(explode_windows, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(
            Count(alias_name="n_events"),
            Sum("value_cents", alias_name="sum_value_cents"),
        )
    )


def sessionize(
    events: ray.data.Dataset,
    gap_minutes: int = 30,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Gap-based sessions per user: a new session starts when the time
    since the user's previous event exceeds ``gap_minutes``. Output one
    row per session: (user_id, session_id, n_events, session_start_us,
    session_end_us); session_id is 1-based in time order per user.

    Two-level execution (coarse partition + vectorized in-partition
    kernel, mirroring stages/exact.py): users are co-located by
    ``hash(user_id) % P`` through the barrier-free hash exchange, and
    each partition computes ALL of its users' sessions in one numpy
    pass — a lexsort, two diff-derived boundary flag arrays, and index
    arithmetic over the session-start positions. No per-user Python
    call, no sort-based groupby barrier."""
    gap_us = gap_minutes * 60_000_000
    if num_partitions is None:
        try:
            num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_partitions = 16

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("session_start_us", pa.int64()),
            ("session_end_us", pa.int64()),
        ]
    )

    def to_us(batch: pa.Table) -> pa.Table:
        # normalize ts to int64 µs row-locally so the exchange carries
        # fixed-width ints only
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "ts_us": ts_us,
                "event_id": pc.cast(batch["event_id"], pa.int64()),
            }
        )

    def user_part(tbl: pa.Table, n: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy()
        return (pd.util.hash_array(u.copy()) % np.uint64(n)).astype(np.int64)

    def sessions_partition(p: int, tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        if n == 0:
            return out_schema.empty_table()
        u = tbl.column("user_id").to_numpy()
        t = tbl.column("ts_us").to_numpy()
        e = tbl.column("event_id").to_numpy()
        order = np.lexsort((e, t, u))  # by user, then ts, then event_id
        u, t = u[order], t[order]
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        brk = np.empty(n, dtype=bool)
        brk[0] = True
        brk[1:] = (t[1:] - t[:-1]) > gap_us
        starts = np.nonzero(new_user | brk)[0]
        ends = np.append(starts[1:], n)  # exclusive session ends
        user_of = u[starts]
        # 1-based per-user session index: position minus the index of
        # the user's first session (sessions are user-contiguous)
        first_of_user = np.maximum.accumulate(
            np.where(new_user[starts], np.arange(len(starts)), 0)
        )
        session_id = np.arange(len(starts)) - first_of_user + 1
        return pa.table(
            {
                "user_id": pa.array(user_of, pa.int64()),
                "session_id": pa.array(session_id, pa.int64()),
                "n_events": pa.array(ends - starts, pa.int64()),
                "session_start_us": pa.array(t[starts], pa.int64()),
                "session_end_us": pa.array(t[ends - 1], pa.int64()),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    slim = events.select_columns(["event_id", "ts", "user_id"]).map_batches(
        to_us, batch_format="pyarrow"
    )
    return hash_exchange(
        slim, user_part, num_partitions, sessions_partition, out_schema.empty_table()
    )


def running_totals(
    events: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-user running totals — the window-function shape
    ``SUM(...) OVER (PARTITION BY user ORDER BY ts)`` — batch-computed:
    each event is annotated with the cumulative value (exact integer
    cents) and the 1-based event index over the user's time-ordered
    history.

    Same two-level execution as ``sessionize``: ONE barrier-free hash
    exchange by ``hash(user_id) % P``, then a fully vectorized
    per-partition kernel (lexsort + grouped cumulative sums via one
    global cumsum minus the per-user offset at each user's first row).
    No per-user Python call; cents make distributed summation
    order-independent."""
    if num_partitions is None:
        try:
            num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_partitions = 16

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_seq", pa.int64()),
            ("cum_value_cents", pa.int64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        val = batch["value"]
        v_cents = pc.cast(
            pc.floor(pc.add(pc.multiply(val, 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "ts_us": ts_us,
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "v_cents": v_cents,
            }
        )

    def user_part(tbl: pa.Table, n: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy()
        return (pd.util.hash_array(u.copy()) % np.uint64(n)).astype(np.int64)

    def cumsum_partition(p: int, tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        if n == 0:
            return out_schema.empty_table()
        u = tbl.column("user_id").to_numpy()
        t = tbl.column("ts_us").to_numpy()
        e = tbl.column("event_id").to_numpy()
        v = tbl.column("v_cents").to_numpy()
        order = np.lexsort((e, t, u))  # by user, then ts, then event_id
        u, e, v = u[order], e[order], v[order]
        cs = np.cumsum(v)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.nonzero(new_user)[0]
        # cumulative sum BEFORE each user's first row, spread to rows
        base = np.repeat(np.where(starts > 0, cs[starts - 1], 0),
                         np.diff(np.append(starts, n)))
        seq_base = np.repeat(starts, np.diff(np.append(starts, n)))
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "event_seq": pa.array(
                    np.arange(n, dtype=np.int64) - seq_base + 1, pa.int64()
                ),
                "cum_value_cents": pa.array(cs - base, pa.int64()),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    slim = events.select_columns(
        ["event_id", "ts", "user_id", "value"]
    ).map_batches(prep, batch_format="pyarrow")
    return hash_exchange(
        slim, user_part, num_partitions, cumsum_partition, out_schema.empty_table()
    )


def lag_deltas(
    events: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Per-user LAG(): each event annotated with the previous event's
    id and the microsecond gap since it (``-1`` sentinels on each
    user's first event, keeping the columns plain non-null int64 —
    exact on every engine). The inter-event-gap shape feeds bot
    detection, session features and rate limiting.

    Same two-level execution as ``running_totals``: ONE barrier-free
    hash exchange by ``hash(user_id) % P``, then a vectorized lexsort +
    shift-by-one kernel per partition — no per-user Python call."""
    if num_partitions is None:
        try:
            num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_partitions = 16

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("prev_event_id", pa.int64()),
            ("gap_us", pa.int64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "ts_us": ts_us,
                "event_id": pc.cast(batch["event_id"], pa.int64()),
            }
        )

    def user_part(tbl: pa.Table, n: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy()
        return (pd.util.hash_array(u.copy()) % np.uint64(n)).astype(np.int64)

    def lag_partition(p: int, tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        if n == 0:
            return out_schema.empty_table()
        u = tbl.column("user_id").to_numpy()
        t = tbl.column("ts_us").to_numpy()
        e = tbl.column("event_id").to_numpy()
        order = np.lexsort((e, t, u))  # by user, then ts, then event_id
        u, t, e = u[order], t[order], e[order]
        prev_e = np.empty(n, dtype=np.int64)
        gap = np.empty(n, dtype=np.int64)
        prev_e[1:] = e[:-1]
        gap[1:] = t[1:] - t[:-1]
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        prev_e[first] = -1
        gap[first] = -1
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "prev_event_id": pa.array(prev_e, pa.int64()),
                "gap_us": pa.array(gap, pa.int64()),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    slim = events.select_columns(["event_id", "ts", "user_id"]).map_batches(
        prep, batch_format="pyarrow"
    )
    return hash_exchange(
        slim, user_part, num_partitions, lag_partition, out_schema.empty_table()
    )


def dedup_retry_events(
    events: ray.data.Dataset,
    window_us: int = 5_000_000,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Telemetry retry/double-fire dedup: drop an event when the
    PREVIOUS event of the same (user, event_type) — kept or not — is
    within ``window_us`` (LAG semantics, exactly DuckDB's
    ``lag() OVER (PARTITION BY user_id, event_type ORDER BY ts,
    event_id)``; the alternative debounce-from-last-KEPT semantics is a
    sequential per-key scan and deliberately NOT what this computes).
    Survivors carry ``gap_same_us`` (-1 on each key's first event) for
    the downstream rate audit.

    Same two-level shape as ``lag_deltas``: ONE barrier-free hash
    exchange by ``hash(user_id) % P``, then a vectorized lexsort +
    shift-by-one kernel per partition; event_type grouping rides a
    per-partition factorize (codes only group, never order across
    partitions). No per-key Python."""
    if window_us < 0:
        raise ValueError("window_us must be non-negative")
    if num_partitions is None:
        try:
            num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_partitions = 16

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("ts_us", pa.int64()),
            ("gap_same_us", pa.int64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "event_type": batch["event_type"],
                "ts_us": ts_us,
                "event_id": pc.cast(batch["event_id"], pa.int64()),
            }
        )

    def user_part(tbl: pa.Table, n: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy()
        return (pd.util.hash_array(u.copy()) % np.uint64(n)).astype(np.int64)

    def kernel(p: int, tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        if n == 0:
            return out_schema.empty_table()
        u = tbl.column("user_id").to_numpy()
        ty = tbl.column("event_type").to_numpy(zero_copy_only=False)
        t = tbl.column("ts_us").to_numpy()
        e = tbl.column("event_id").to_numpy()
        codes, uniq = pd.factorize(ty, sort=False)
        order = np.lexsort((e, t, codes, u))  # by (user, type), then ts, id
        u, c, t, e = u[order], codes[order], t[order], e[order]
        gap = np.empty(n, dtype=np.int64)
        gap[1:] = t[1:] - t[:-1]
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = (u[1:] != u[:-1]) | (c[1:] != c[:-1])
        gap[first] = -1
        keep = first | (gap > window_us)
        ty_sorted = uniq.take(c[keep]) if keep.any() else uniq[:0]
        return pa.table(
            {
                "event_id": pa.array(e[keep], pa.int64()),
                "user_id": pa.array(u[keep], pa.int64()),
                "event_type": pa.array(
                    np.asarray(ty_sorted, dtype=object), pa.string()
                ),
                "ts_us": pa.array(t[keep], pa.int64()),
                "gap_same_us": pa.array(gap[keep], pa.int64()),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    slim = events.select_columns(
        ["event_id", "ts", "user_id", "event_type"]
    ).map_batches(prep, batch_format="pyarrow")
    return hash_exchange(
        slim, user_part, num_partitions, kernel, out_schema.empty_table()
    )


def rolling_sum_rows(
    events: ray.data.Dataset,
    window: int = 5,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Rows-based rolling window — ``SUM(value) OVER (PARTITION BY user
    ORDER BY ts ROWS BETWEEN window-1 PRECEDING AND CURRENT ROW)`` in
    exact integer cents (the moving-total feature of rate limiting and
    burst detection; time-based windows live in ``sliding_counts``).

    Same two-level execution as ``running_totals``; the window sum is
    the cumulative-sum difference against a start index clamped to each
    user's first row — one vectorized pass, any window size."""
    if window <= 0:
        raise ValueError("window must be positive")
    if num_partitions is None:
        try:
            num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_partitions = 16

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("win_value_cents", pa.int64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        v_cents = pc.cast(
            pc.floor(pc.add(pc.multiply(batch["value"], 100.0), 0.5)), pa.int64()
        )
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "ts_us": ts_us,
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "v_cents": v_cents,
            }
        )

    def user_part(tbl: pa.Table, n: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy()
        return (pd.util.hash_array(u.copy()) % np.uint64(n)).astype(np.int64)

    def window_partition(p: int, tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        if n == 0:
            return out_schema.empty_table()
        u = tbl.column("user_id").to_numpy()
        t = tbl.column("ts_us").to_numpy()
        e = tbl.column("event_id").to_numpy()
        v = tbl.column("v_cents").to_numpy()
        order = np.lexsort((e, t, u))
        u, e, v = u[order], e[order], v[order]
        cs = np.cumsum(v)
        new_user = np.empty(n, dtype=bool)
        new_user[0] = True
        new_user[1:] = u[1:] != u[:-1]
        starts = np.nonzero(new_user)[0]
        user_start = np.repeat(starts, np.diff(np.append(starts, n)))
        lo = np.maximum(user_start, np.arange(n, dtype=np.int64) - (window - 1))
        win = cs - np.where(lo > 0, cs[lo - 1], 0)
        return pa.table(
            {
                "event_id": pa.array(e, pa.int64()),
                "user_id": pa.array(u, pa.int64()),
                "win_value_cents": pa.array(win, pa.int64()),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    slim = events.select_columns(
        ["event_id", "ts", "user_id", "value"]
    ).map_batches(prep, batch_format="pyarrow")
    return hash_exchange(
        slim, user_part, num_partitions, window_partition, out_schema.empty_table()
    )


def event_sequences(
    events: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Ordered STRING_AGG per user: the comma-joined event_type
    sequence in (ts, event_id) order plus its length — the behavioral
    n-gram / Markov-chain input of session mining (SQL twin:
    ``string_agg(event_type, ',' ORDER BY ts, event_id)``).

    ONE barrier-free hash exchange by ``hash(user_id) % P``, then a
    vectorized lexsort per partition; the joins themselves run as one
    pandas C-loop groupby-agg over the partition (a Python str.join per
    USER, not per event — cost bounded by users/P per task, and each
    output row is inherently a per-user Python string)."""
    if num_partitions is None:
        try:
            num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_partitions = 16

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("n_events", pa.int64()),
            ("seq", pa.string()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "ts_us": ts_us,
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "event_type": batch["event_type"],
            }
        )

    def user_part(tbl: pa.Table, n: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy()
        return (pd.util.hash_array(u.copy()) % np.uint64(n)).astype(np.int64)

    def seq_partition(p: int, tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        if n == 0:
            return out_schema.empty_table()
        u = tbl.column("user_id").to_numpy()
        t = tbl.column("ts_us").to_numpy()
        e = tbl.column("event_id").to_numpy()
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        df = pd.DataFrame({"u": u[order], "et": et[order]})
        g = df.groupby("u", sort=True)["et"].agg(n_events="size", seq=",".join)
        g = g.reset_index()
        return pa.table(
            {
                "user_id": pa.array(g["u"].to_numpy(), pa.int64()),
                "n_events": pa.array(
                    g["n_events"].to_numpy().astype(np.int64), pa.int64()
                ),
                "seq": pa.array(g["seq"], pa.string()),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    slim = events.select_columns(
        ["event_id", "ts", "user_id", "event_type"]
    ).map_batches(prep, batch_format="pyarrow")
    return hash_exchange(
        slim, user_part, num_partitions, seq_partition, out_schema.empty_table()
    )


def user_first_last(
    events: ray.data.Dataset,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """FIRST_VALUE / LAST_VALUE per user on the (ts, event_id) order:
    each user's first and last event type and timestamp — the
    account-lifecycle shape (acquisition event → latest activity).

    Combiner first: every batch collapses to ≤2 boundary rows per user
    (vectorized lexsort + edge masks), so the exchange carries
    O(users × blocks) rows, never the event stream; then the same
    kernel picks the global boundaries per partition."""
    if num_partitions is None:
        try:
            num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_partitions = 16

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("first_event", pa.string()),
            ("first_ts_us", pa.int64()),
            ("last_event", pa.string()),
            ("last_ts_us", pa.int64()),
        ]
    )

    def _boundaries(
        u: np.ndarray, t: np.ndarray, e: np.ndarray, et: np.ndarray
    ) -> tuple[np.ndarray, np.ndarray]:
        """Indices of each user's first and last row after the
        (user, ts, event_id) lexsort; returns (order, edge_mask)."""
        order = np.lexsort((e, t, u))
        us = u[order]
        n = len(us)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = us[1:] != us[:-1]
        last = np.empty(n, dtype=bool)
        last[-1] = True
        last[:-1] = us[1:] != us[:-1]
        return order, first | last

    def partial(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        tbl = pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "ts_us": ts_us,
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "event_type": batch["event_type"],
            }
        )
        if len(tbl) == 0:
            return tbl
        order, edge = _boundaries(
            tbl.column("user_id").to_numpy(),
            tbl.column("ts_us").to_numpy(),
            tbl.column("event_id").to_numpy(),
            tbl.column("event_type").to_numpy(zero_copy_only=False),
        )
        return tbl.take(pa.array(order[edge]))

    def user_part(tbl: pa.Table, n: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy()
        return (pd.util.hash_array(u.copy()) % np.uint64(n)).astype(np.int64)

    def pick_partition(p: int, tbl: pa.Table) -> pa.Table:
        n = len(tbl)
        if n == 0:
            return out_schema.empty_table()
        u = tbl.column("user_id").to_numpy()
        t = tbl.column("ts_us").to_numpy()
        e = tbl.column("event_id").to_numpy()
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        order = np.lexsort((e, t, u))
        u, t, et = u[order], t[order], et[order]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        first[1:] = u[1:] != u[:-1]
        last = np.empty(len(u), dtype=bool)
        last[-1] = True
        last[:-1] = u[1:] != u[:-1]
        fi = np.nonzero(first)[0]
        li = np.nonzero(last)[0]
        return pa.table(
            {
                "user_id": pa.array(u[fi], pa.int64()),
                "first_event": pa.array(et[fi], pa.string()),
                "first_ts_us": pa.array(t[fi], pa.int64()),
                "last_event": pa.array(et[li], pa.string()),
                "last_ts_us": pa.array(t[li], pa.int64()),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    slim = events.select_columns(
        ["event_id", "ts", "user_id", "event_type"]
    ).map_batches(partial, batch_format="pyarrow")
    return hash_exchange(
        slim, user_part, num_partitions, pick_partition, out_schema.empty_table()
    )


def windowed_distinct(
    events: ray.data.Dataset,
    window_us: int = _HOUR_US,
    num_partitions: int | None = None,
) -> ray.data.Dataset:
    """Windowed deduplication: keep only the FIRST event per
    (user, event_type, tumbling window) on the (ts, event_id) order —
    the at-least-once-delivery hygiene step (retry storms and duplicate
    webhooks collapse to one row per window).

    Same combiner-then-exchange shape as ``user_first_last``: every
    batch collapses to its local per-key first rows (vectorized lexsort
    + edge mask — ≤1 row per (user, type, window) per block), then one
    exchange picks the global first. The window id is derived
    row-locally; no corpus-wide shuffle ever carries the stream."""
    if window_us <= 0:
        raise ValueError("window_us must be positive")
    if num_partitions is None:
        try:
            num_partitions = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
        except Exception:
            num_partitions = 16

    out_schema = pa.schema(
        [
            ("event_id", pa.int64()),
            ("user_id", pa.int64()),
            ("event_type", pa.string()),
            ("window_start_us", pa.int64()),
            ("ts_us", pa.int64()),
        ]
    )

    def _first_rows(tbl: pa.Table) -> pa.Table:
        u = tbl.column("user_id").to_numpy()
        w = tbl.column("window_start_us").to_numpy()
        t = tbl.column("ts_us").to_numpy()
        e = tbl.column("event_id").to_numpy()
        et = tbl.column("event_type").to_numpy(zero_copy_only=False)
        # sort by (user, type, window, ts, event_id); numpy sorts the
        # string key via pandas factorize for a pure-int lexsort
        et_codes = pd.factorize(et, sort=True)[0]
        order = np.lexsort((e, t, w, et_codes, u))
        us, ws, ets = u[order], w[order], et_codes[order]
        n = len(us)
        first = np.empty(n, dtype=bool)
        first[0] = True
        first[1:] = (
            (us[1:] != us[:-1]) | (ets[1:] != ets[:-1]) | (ws[1:] != ws[:-1])
        )
        return tbl.take(pa.array(order[first]))

    def prep(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        win = pc.multiply(
            pc.divide(ts_us, pa.scalar(window_us, pa.int64())),
            pa.scalar(window_us, pa.int64()),
        )
        tbl = pa.table(
            {
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "event_type": batch["event_type"],
                "window_start_us": win,
                "ts_us": ts_us,
            }
        )
        if len(tbl) == 0:
            return out_schema.empty_table()
        return _first_rows(tbl)

    def key_part(tbl: pa.Table, n: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy()
        w = tbl.column("window_start_us").to_numpy()
        return (
            (pd.util.hash_array(u.copy()) ^ pd.util.hash_array(w.copy()))
            % np.uint64(n)
        ).astype(np.int64)

    def pick_partition(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return out_schema.empty_table()
        return _first_rows(tbl)

    from duplicate_finder_ray.stages.exchange import hash_exchange

    slim = events.select_columns(
        ["event_id", "ts", "user_id", "event_type"]
    ).map_batches(prep, batch_format="pyarrow")
    return hash_exchange(
        slim, key_part, num_partitions, pick_partition, out_schema.empty_table()
    )


def funnel_conversions(
    events: ray.data.Dataset,
    first_type: str = "signup",
    then_type: str = "purchase",
) -> ray.data.Dataset:
    """Two-step funnel: users whose earliest ``first_type`` event
    strictly precedes their earliest ``then_type`` event, with both
    timestamps and the conversion delay — the product-analytics
    conversion query (and, for training-data work, the "document
    ingested before it was labeled" lineage check).

    One corpus pass: rows of other types are dropped map-side, each
    batch collapses to ≤1 (user, min_first, min_then) partial row via
    a pandas C groupby (absent steps carry an int64 sentinel that Min
    ignores), ONE users-sized groupby takes the global minima, and a
    final vectorized filter keeps converting users. The event stream
    never crosses a shuffle — only user-keyed partial rows do."""
    _SENT = np.int64(1) << 62

    def partial(batch: pa.Table) -> pa.Table:
        mask = pc.is_in(
            batch["event_type"], value_set=pa.array([first_type, then_type])
        )
        batch = batch.filter(mask)
        if len(batch) == 0:
            return pa.table(
                {
                    "user_id": pa.array([], pa.int64()),
                    "first_us": pa.array([], pa.int64()),
                    "then_us": pa.array([], pa.int64()),
                }
            )
        ts = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
        et = batch.column("event_type").to_numpy(zero_copy_only=False)
        u = batch.column("user_id").to_numpy().astype(np.int64)
        is_first = et == first_type
        out = (
            pd.DataFrame(
                {
                    "user_id": u,
                    "first_us": np.where(is_first, ts, _SENT),
                    "then_us": np.where(~is_first, ts, _SENT),
                }
            )
            .groupby("user_id", sort=False)
            .min()
            .reset_index()
        )
        return pa.Table.from_pandas(out, preserve_index=False)

    from ray.data.aggregate import Min

    mins = (
        events.select_columns(["user_id", "event_type", "ts"])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Min("first_us", alias_name="first_us"),
            Min("then_us", alias_name="then_us"),
        )
    )

    def finish(batch: pa.Table) -> pa.Table:
        f = batch.column("first_us").to_numpy().astype(np.int64)
        t = batch.column("then_us").to_numpy().astype(np.int64)
        keep = (f < _SENT) & (t < _SENT) & (t > f)
        out = batch.filter(pa.array(keep))
        f, t = f[keep], t[keep]
        return pa.table(
            {
                "user_id": out.column("user_id"),
                "first_us": pa.array(f, pa.int64()),
                "then_us": pa.array(t, pa.int64()),
                "delay_us": pa.array(t - f, pa.int64()),
            }
        )

    return mins.map_batches(finish, batch_format="pyarrow")


def retention_cohorts(
    events: ray.data.Dataset,
    ts_col: str = "ts",
    user_col: str = "user_id",
    bucket_us: int = 86_400_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Retention-cohort matrix: users cohorted by their FIRST active
    time bucket, counted per (cohort, bucket offset) — the product-
    analytics triangle behind every retention chart. Output:
    (cohort_us, day_offset, n_users).

    Shape: per-batch distinct-(user, bucket) combiner (slim int64
    rows), ONE user-keyed hash exchange (all of a user's buckets
    co-locate, so the first bucket and the offsets are partition-local),
    per-partition (cohort, offset) count partials, one tiny
    cohorts × offsets groupby-sum. The event stream itself never
    shuffles."""
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")
    B = bucket_us

    from duplicate_finder_ray.stages.exchange import hash_exchange

    slim_schema = pa.schema([("u", pa.int64()), ("b", pa.int64())])
    part_schema = pa.schema(
        [
            ("cohort_us", pa.int64()),
            ("day_offset", pa.int64()),
            ("n_users", pa.int64()),
        ]
    )

    def distinct_user_bucket(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return slim_schema.empty_table()
        ts_us = pc.cast(
            pc.cast(batch[ts_col], pa.timestamp("us")), pa.int64()
        ).to_numpy()
        u = batch[user_col].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (ts_us // B) * B
        order = np.lexsort((b, u))
        u, b = u[order], b[order]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        np.logical_or(u[1:] != u[:-1], b[1:] != b[:-1], out=first[1:])
        return pa.table(
            {"u": pa.array(u[first], pa.int64()), "b": pa.array(b[first], pa.int64())}
        )

    slim = events.select_columns([user_col, ts_col]).map_batches(
        distinct_user_bucket, batch_format="pyarrow"
    )

    def user_part(tbl: pa.Table, p: int) -> np.ndarray:
        u = tbl.column("u").to_numpy().astype(np.uint64)
        return (pd.util.hash_array(u.copy()) % np.uint64(p)).astype(np.int64)

    def cohort_partials(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return part_schema.empty_table()
        u = tbl.column("u").to_numpy().astype(np.int64)
        b = tbl.column("b").to_numpy().astype(np.int64)
        order = np.lexsort((b, u))
        u, b = u[order], b[order]
        first = np.empty(len(u), dtype=bool)
        first[0] = True
        np.logical_or(u[1:] != u[:-1], b[1:] != b[:-1], out=first[1:])
        u, b = u[first], b[first]  # global distinct (user, bucket)
        ustart = np.nonzero(np.r_[True, u[1:] != u[:-1]])[0]
        counts = np.diff(np.append(ustart, len(u)))
        cohort = np.repeat(b[ustart], counts)  # sorted ⇒ first = min
        offset = (b - cohort) // B
        key = pd.DataFrame({"c": cohort, "o": offset})
        agg = key.groupby(["c", "o"], sort=False).size().reset_index(name="n")
        return pa.table(
            {
                "cohort_us": pa.array(agg["c"].to_numpy(), pa.int64()),
                "day_offset": pa.array(agg["o"].to_numpy(), pa.int64()),
                "n_users": pa.array(agg["n"].to_numpy(), pa.int64()),
            }
        )

    partials = hash_exchange(
        slim, user_part, num_partitions, cohort_partials,
        part_schema.empty_table(),
    )
    return (
        partials.groupby(["cohort_us", "day_offset"])
        .aggregate(Sum("n_users", alias_name="n_users"))
    )


def session_funnel(
    events: ray.data.Dataset,
    step_a: str,
    step_b: str,
    gap_us: int = 1_800_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Within-session funnel: for every (user, session) — sessions cut
    at ``gap_us`` inactivity, the engine's sessionize convention — did
    the first ``step_a`` strictly precede the first ``step_b`` INSIDE
    the session? Output (user_id, session_id, n_events, converted 0/1);
    session_id is 1-based per user in time order, matching
    ``events_sessions``.

    Composition of the sessionize and funnel shapes in ONE user-keyed
    exchange of slim (user, event_id, ts, type flag) rows: a user's
    whole stream co-locates, so session boundaries, per-session first-A
    / first-B and the conversion flag are a single vectorized pass
    (lexsort + gap diff + cumsum + minimum.at) — no per-user Python, no
    second shuffle."""
    if gap_us <= 0:
        raise ValueError("gap_us must be positive")
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")
    if step_a == step_b:
        raise ValueError("step_a and step_b must differ")
    G = np.int64(gap_us)

    slim_schema = pa.schema(
        [
            ("u", pa.int64()),
            ("eid", pa.int64()),
            ("t", pa.int64()),
            ("f", pa.int8()),
        ]
    )
    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("converted", pa.int64()),
        ]
    )

    def slim(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return slim_schema.empty_table()
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        et = batch["event_type"]
        flag = pc.add(
            pc.cast(pc.equal(et, step_a), pa.int8()),
            pc.multiply(pc.cast(pc.equal(et, step_b), pa.int8()), pa.scalar(2, pa.int8())),
        )
        return pa.table(
            {
                "u": pc.cast(batch["user_id"], pa.int64()),
                "eid": pc.cast(batch["event_id"], pa.int64()),
                "t": ts_us,
                "f": flag,
            }
        )

    slim_ds = events.select_columns(
        ["user_id", "event_id", "ts", "event_type"]
    ).map_batches(slim, batch_format="pyarrow")

    def user_part(tbl: pa.Table, p: int) -> np.ndarray:
        u = tbl.column("u").to_numpy().astype(np.uint64)
        return (pd.util.hash_array(u.copy()) % np.uint64(p)).astype(np.int64)

    def funnel_partition(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return out_schema.empty_table()
        u = tbl.column("u").to_numpy().astype(np.int64)
        eid = tbl.column("eid").to_numpy().astype(np.int64)
        t = tbl.column("t").to_numpy().astype(np.int64)
        f = tbl.column("f").to_numpy().astype(np.int8)
        order = np.lexsort((eid, t, u))
        u, eid, t, f = u[order], eid[order], t[order], f[order]
        new_user = np.r_[True, u[1:] != u[:-1]]
        gap = np.r_[True, (t[1:] - t[:-1]) > G]
        new_sess = new_user | gap
        sid_global = np.cumsum(new_sess) - 1  # 0-based global session idx
        n_sess = int(sid_global[-1]) + 1
        # 1-based per-user numbering: subtract the user's first session id
        user_start = np.nonzero(new_user)[0]
        first_sid_of_user = np.repeat(
            sid_global[user_start], np.diff(np.append(user_start, len(u)))
        )
        sess_local = sid_global - first_sid_of_user + 1
        INF = np.iinfo(np.int64).max
        first_a = np.full(n_sess, INF, dtype=np.int64)
        first_b = np.full(n_sess, INF, dtype=np.int64)
        a_rows = f == 1
        b_rows = f == 2
        np.minimum.at(first_a, sid_global[a_rows], t[a_rows])
        np.minimum.at(first_b, sid_global[b_rows], t[b_rows])
        sess_start = np.nonzero(new_sess)[0]
        n_events = np.diff(np.append(sess_start, len(u))).astype(np.int64)
        converted = (
            (first_a < first_b) & (first_b < INF)
        ).astype(np.int64)
        return pa.table(
            {
                "user_id": pa.array(u[sess_start], pa.int64()),
                "session_id": pa.array(
                    sess_local[sess_start].astype(np.int64), pa.int64()
                ),
                "n_events": pa.array(n_events, pa.int64()),
                "converted": pa.array(converted, pa.int64()),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    return hash_exchange(
        slim_ds, user_part, num_partitions, funnel_partition,
        out_schema.empty_table(),
    )


def event_transitions(
    events: ray.data.Dataset,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-user event-type transition counts — the first-order Markov
    matrix (``from_type``, ``to_type``, ``n``) over each user's
    time-ordered event stream.  The LAG-then-GROUP shape behind funnel
    exploration, bot detection and next-action models.

    Execution: slim ``(user_id, ts_us, event_id, event_type)`` rows
    cross ONE user-keyed hash exchange; each partition lexsorts by
    (user, ts, event_id), pairs every event with its successor under a
    same-user mask, and emits (from, to) count partials via a pandas
    groupby — the interpreter cost is P calls.  The final aggregate is
    a tiny |event_types|² groupby-sum.  SQL twin:
    ``LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts,
    event_id)``."""
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")

    slim_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("ts_us", pa.int64()),
            ("event_id", pa.int64()),
            ("event_type", pa.string()),
        ]
    )
    part_schema = pa.schema(
        [
            ("from_type", pa.string()),
            ("to_type", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def prep(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return slim_schema.empty_table()
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64())
        return pa.table(
            {
                "user_id": pc.cast(batch["user_id"], pa.int64()),
                "ts_us": ts_us,
                "event_id": pc.cast(batch["event_id"], pa.int64()),
                "event_type": batch["event_type"],
            }
        )

    slim = events.select_columns(
        ["user_id", "ts", "event_id", "event_type"]
    ).map_batches(prep, batch_format="pyarrow")

    def user_part(tbl: pa.Table, p: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy().astype(np.uint64)
        return (pd.util.hash_array(u.copy()) % np.uint64(p)).astype(np.int64)

    def transition_partials(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) < 2:
            return part_schema.empty_table()
        u = tbl.column("user_id").to_numpy()
        t = tbl.column("ts_us").to_numpy()
        e = tbl.column("event_id").to_numpy()
        # factorize (C-level hash) instead of np.unique (O(n log n)
        # Python-object compares) — the combiner runs on every row
        codes, types = pd.factorize(
            np.asarray(tbl.column("event_type").to_pylist(), dtype=object)
        )
        types = np.asarray(types, dtype=object)
        order = np.lexsort((e, t, u))
        u, codes = u[order], codes[order]
        same_user = u[1:] == u[:-1]
        frm = codes[:-1][same_user]
        to = codes[1:][same_user]
        if len(frm) == 0:
            return part_schema.empty_table()
        agg = (
            pd.DataFrame({"f": frm, "t": to})
            .groupby(["f", "t"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "from_type": pa.array(types[agg["f"].to_numpy()], pa.string()),
                "to_type": pa.array(types[agg["t"].to_numpy()], pa.string()),
                "n": pa.array(agg["n"].to_numpy(np.int64), pa.int64()),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    partials = hash_exchange(
        slim, user_part, num_partitions, transition_partials,
        part_schema.empty_table(),
    )
    return partials.groupby(["from_type", "to_type"]).aggregate(
        Sum("n", alias_name="n")
    )


def user_peak_rate(
    events: ray.data.Dataset,
    bucket_us: int = 60_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Per-user peak event rate: the busiest ``bucket_us`` window
    (tumbling, default 1 minute) for every user — the burst signal
    behind bot/abuse detection and rate-limit sizing.  Output
    ``(user_id, peak_events, peak_bucket_us)``; ties take the earliest
    bucket (= SQL ``ROW_NUMBER ... ORDER BY n DESC, bucket``).

    Shape: per-batch (user, bucket) count partials map-side, ONE
    user-keyed exchange of slim int64 rows, per-partition vectorized
    sum + argmax — the event stream never shuffles."""
    if bucket_us <= 0:
        raise ValueError("bucket_us must be positive")
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")
    B = bucket_us

    slim_schema = pa.schema(
        [("u", pa.int64()), ("b", pa.int64()), ("n", pa.int64())]
    )
    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("peak_events", pa.int64()),
            ("peak_bucket_us", pa.int64()),
        ]
    )

    def count_partials(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return slim_schema.empty_table()
        ts_us = pc.cast(
            pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy()
        u = batch["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        b = (ts_us // B) * B
        agg = (
            pd.DataFrame({"u": u, "b": b})
            .groupby(["u", "b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "u": pa.array(agg["u"].to_numpy(np.int64)),
                "b": pa.array(agg["b"].to_numpy(np.int64)),
                "n": pa.array(agg["n"].to_numpy(np.int64)),
            }
        )

    slim = events.select_columns(["user_id", "ts"]).map_batches(
        count_partials, batch_format="pyarrow"
    )

    def user_part(tbl: pa.Table, p: int) -> np.ndarray:
        u = tbl.column("u").to_numpy().astype(np.uint64)
        return (pd.util.hash_array(u.copy()) % np.uint64(p)).astype(np.int64)

    def peak_per_user(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return out_schema.empty_table()
        df = (
            tbl.to_pandas()
            .groupby(["u", "b"], sort=False)["n"]
            .sum()
            .reset_index()
        )
        # argmax per user, ties → earliest bucket: sort by
        # (u, -n, b) and keep each user's first row
        df = df.sort_values(["u", "n", "b"], ascending=[True, False, True])
        first = df.groupby("u", sort=False).head(1)
        return pa.table(
            {
                "user_id": pa.array(first["u"].to_numpy(np.int64)),
                "peak_events": pa.array(first["n"].to_numpy(np.int64)),
                "peak_bucket_us": pa.array(first["b"].to_numpy(np.int64)),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    return hash_exchange(
        slim, user_part, num_partitions, peak_per_user,
        out_schema.empty_table(),
    )


def session_cooccurrence(
    events: ray.data.Dataset,
    gap_us: int = 1_800_000_000,
    num_partitions: int = 16,
) -> ray.data.Dataset:
    """Market-basket analysis over sessions: for every unordered pair
    of event types, the number of SESSIONS (cut at ``gap_us``
    inactivity, the engine's sessionize convention) in which both
    occur.  Output (type_a, type_b, n_sessions) with type_a < type_b —
    the co-occurrence matrix behind "users who do X in a visit also do
    Y" product analytics.

    One user-keyed exchange of slim rows; per partition: session
    boundaries (lexsort + gap diff + cumsum), distinct
    (session, type), and a vectorized predecessor pair expansion over
    the type-sorted session runs (sessions hold at most |event types|
    distinct types, so the expansion is bounded per session).  The
    final aggregate is |types|² rows."""
    if gap_us <= 0:
        raise ValueError("gap_us must be positive")
    if num_partitions <= 0:
        raise ValueError("num_partitions must be positive")
    G = np.int64(gap_us)

    slim_schema = pa.schema(
        [
            ("u", pa.int64()),
            ("eid", pa.int64()),
            ("t", pa.int64()),
            ("event_type", pa.string()),
        ]
    )
    part_schema = pa.schema(
        [
            ("type_a", pa.string()),
            ("type_b", pa.string()),
            ("n", pa.int64()),
        ]
    )

    def slim(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return slim_schema.empty_table()
        return pa.table(
            {
                "u": pc.cast(batch["user_id"], pa.int64()),
                "eid": pc.cast(batch["event_id"], pa.int64()),
                "t": pc.cast(
                    pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()
                ),
                "event_type": batch["event_type"],
            }
        )

    slim_ds = events.select_columns(
        ["user_id", "event_id", "ts", "event_type"]
    ).map_batches(slim, batch_format="pyarrow")

    def user_part(tbl: pa.Table, p: int) -> np.ndarray:
        u = tbl.column("u").to_numpy().astype(np.uint64)
        return (pd.util.hash_array(u.copy()) % np.uint64(p)).astype(np.int64)

    def cooccur_partition(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return part_schema.empty_table()
        u = tbl.column("u").to_numpy().astype(np.int64)
        eid = tbl.column("eid").to_numpy().astype(np.int64)
        t = tbl.column("t").to_numpy().astype(np.int64)
        codes, types = pd.factorize(
            np.asarray(tbl.column("event_type").to_pylist(), dtype=object)
        )
        order = np.lexsort((eid, t, u))
        u, t, codes = u[order], t[order], codes[order]
        new_sess = np.r_[True, (u[1:] != u[:-1]) | ((t[1:] - t[:-1]) > G)]
        sid = np.cumsum(new_sess) - 1
        # distinct (session, type), type-sorted within session — sort
        # by the type STRING so pair order is lexicographic like SQL
        df = pd.DataFrame(
            {"sid": sid, "type": np.asarray(types, dtype=object)[codes]}
        ).drop_duplicates()
        df = df.sort_values(["sid", "type"], kind="mergesort")
        s = df["sid"].to_numpy()
        ty = df["type"].to_numpy(dtype=object)
        starts = np.r_[True, s[1:] != s[:-1]]
        start_pos = np.nonzero(starts)[0]
        gidx = np.cumsum(starts) - 1
        n_pred = np.arange(len(s)) - start_pos[gidx]
        total = int(n_pred.sum())
        if total == 0:
            return part_schema.empty_table()
        b_idx = np.repeat(np.arange(len(s)), n_pred)
        run_start = np.repeat(np.cumsum(n_pred) - n_pred, n_pred)
        offset = np.arange(total) - run_start
        a_idx = np.repeat(start_pos[gidx], n_pred) + offset
        agg = (
            pd.DataFrame({"a": ty[a_idx], "b": ty[b_idx]})
            .groupby(["a", "b"], sort=False)
            .size()
            .reset_index(name="n")
        )
        return pa.table(
            {
                "type_a": pa.array(agg["a"], pa.string()),
                "type_b": pa.array(agg["b"], pa.string()),
                "n": pa.array(agg["n"].to_numpy(np.int64)),
            }
        )

    from duplicate_finder_ray.stages.exchange import hash_exchange

    partials = hash_exchange(
        slim_ds, user_part, num_partitions, cooccur_partition,
        part_schema.empty_table(),
    )
    return partials.groupby(["type_a", "type_b"]).aggregate(
        Sum("n", alias_name="n_sessions")
    )

def watermark_audit(
    events: ray.data.Dataset,
    max_delay_s: int = 600,
    allowed_lateness_s: int = 300,
) -> ray.data.Dataset:
    """Watermark accounting for a streaming ingest: per tumbling hour
    of EVENT time, how many rows arrived in time versus after the
    window's watermark closed, and the worst arrival delay — the audit
    that decides whether a pipeline's allowed-lateness budget actually
    covers its delivery tail.

    Arrival time is synthesized deterministically (no arrival column
    in the table): ``arrival = ts + (event_id % max_delay_s)`` —
    row-local, so the DuckDB twin reproduces it exactly. A row is LATE
    when ``arrival > window_end + allowed_lateness_s``. Output:
    (window_start_us, n_on_time, n_late, max_delay_s_seen). One slim
    hours-cardinality groupby; everything upstream is a scan-side map."""
    if max_delay_s <= 0 or allowed_lateness_s < 0:
        raise ValueError("max_delay_s must be > 0, allowed_lateness_s >= 0")

    def audit(batch: pa.Table) -> pa.Table:
        ts_us = pc.cast(
            pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()
        ).to_numpy()
        eid = batch["event_id"].to_numpy()
        delay_s = eid % np.int64(max_delay_s)
        window = ts_us // _HOUR_US * _HOUR_US
        arrival_us = ts_us + delay_s * np.int64(1_000_000)
        close_us = window + _HOUR_US + np.int64(allowed_lateness_s) * np.int64(
            1_000_000
        )
        late = arrival_us > close_us
        return pa.table(
            {
                "window_start_us": pa.array(window, pa.int64()),
                "on_time": pa.array((~late).astype(np.int64)),
                "late": pa.array(late.astype(np.int64)),
                "delay_s": pa.array(delay_s.astype(np.int64)),
            }
        )

    return (
        events.select_columns(["event_id", "ts"])
        .map_batches(audit, batch_format="pyarrow")
        .groupby("window_start_us")
        .aggregate(
            Sum("on_time", alias_name="n_on_time"),
            Sum("late", alias_name="n_late"),
            Max("delay_s", alias_name="max_delay_s_seen"),
        )
    )


def anomalous_hours(events: ray.data.Dataset, k_sigma: int = 3) -> ray.data.Dataset:
    """Hours whose event count exceeds mean + k_sigma·stddev over the
    DENSE hourly series (zero-count outage hours included — a sparse
    groupby would bias the mean upward and hide burst anomalies next
    to outages). The monitoring primitive behind "page when traffic
    spikes": output (hour_us, n_events) of anomalous hours only.

    EXACT INTEGER TEST — no float mean/stddev anywhere: with
    S = Σx, Q = Σx², H = number of hours, the population test
    x > S/H + k·sqrt(Q/H − (S/H)²) is equivalent (both sides
    non-negative, multiply through by H²) to

        H·x − S > 0  AND  (H·x − S)² > k²·(H·Q − S²)

    which distributed partial sums reproduce bit-for-bit on any
    partitioning, and a HUGEINT SQL twin states verbatim — float
    variance would hash-drift under reduction reordering.

    Scale shape: rides hourly_dense (per-batch count partials, one
    hours-cardinality groupby — the event stream never shuffles); the
    dense series is hours-cardinality-tiny (8 760 rows/year), so the
    moment fold and the final filter run in ONE remote task over
    arbitrary-precision Python ints (squares exceed int64 once
    S ~ 3e9; big ints cost nothing at this cardinality)."""
    if k_sigma <= 0:
        raise ValueError("k_sigma must be positive")
    dense = hourly_dense(events).materialize()
    out_schema = pa.schema([("hour_us", pa.int64()), ("n_events", pa.int64())])

    @ray.remote
    def fold_and_filter(*blocks: pa.Table) -> pa.Table:
        blocks = tuple(b for b in blocks if len(b) and "hour_us" in b.column_names)
        if not blocks:
            return out_schema.empty_table()
        tbl = pa.concat_tables(blocks)
        x = tbl.column("n_events").to_numpy().astype(np.int64)
        h = int(len(x))
        s = int(x.sum())
        q = int((x.astype(object) * x.astype(object)).sum())  # exact Σx²
        k2 = k_sigma * k_sigma
        rhs = k2 * (h * q - s * s)
        lhs = [h * int(v) - s for v in x]
        keep = np.array([d > 0 and d * d > rhs for d in lhs], dtype=bool)
        return pa.table(
            {
                "hour_us": tbl.column("hour_us").filter(pa.array(keep)),
                "n_events": tbl.column("n_events").filter(pa.array(keep)),
            }
        )

    refs = dense.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_arrow_refs([fold_and_filter.remote(*refs)])


def daily_new_users(events: ray.data.Dataset, n_parts: int = 16) -> ray.data.Dataset:
    """Adoption curve: per UTC day, the number of users whose FIRST
    event ever falls on that day, plus the running total of users seen
    so far (the "cumulative distinct users" series a naive
    count(DISTINCT) OVER cannot stream). Output
    (day_us, n_new_users, cum_users), days with zero first-timers
    omitted (join hourly_dense-style gap filling downstream if a dense
    axis is needed).

    Scale shape: per-batch (user → min day) partials collapse each
    block to its distinct users BEFORE the shuffle; ONE user-keyed
    hash exchange (slim 16-byte rows) makes the global per-user min
    partition-local; per-partition day-count partials then fold into a
    days-cardinality groupby-sum, and the cumulative sum runs in one
    task over the tiny day table. The event stream itself never
    shuffles; no task ever holds more than its partition's distinct
    users."""
    from duplicate_finder_ray.stages.exchange import hash_exchange

    if n_parts <= 0:
        raise ValueError("n_parts must be positive")
    _DAY_US = 86_400_000_000
    slim_schema = pa.schema([("user_id", pa.int64()), ("day_us", pa.int64())])
    part_schema = pa.schema([("day_us", pa.int64()), ("n", pa.int64())])
    out_schema = pa.schema(
        [("day_us", pa.int64()), ("n_new_users", pa.int64()), ("cum_users", pa.int64())]
    )

    def user_min_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return slim_schema.empty_table()
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
        day = (ts_us // _DAY_US) * _DAY_US
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        firsts = np.r_[True, uid[1:] != uid[:-1]]
        return pa.table(
            {
                "user_id": pa.array(uid[firsts], pa.int64()),
                "day_us": pa.array(day[firsts], pa.int64()),
            }
        )

    slim = events.select_columns(["user_id", "ts"]).map_batches(
        user_min_partial, batch_format="pyarrow"
    )

    def by_user(tbl: pa.Table, p: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy().astype(np.uint64)
        return (u % np.uint64(p)).astype(np.int64)

    def day_counts(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return part_schema.empty_table()
        uid = tbl.column("user_id").to_numpy().astype(np.int64)
        day = tbl.column("day_us").to_numpy().astype(np.int64)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        firsts = np.r_[True, uid[1:] != uid[:-1]]
        days, counts = np.unique(day[firsts], return_counts=True)
        return pa.table(
            {
                "day_us": pa.array(days, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    per_day = (
        hash_exchange(slim, by_user, n_parts, day_counts, part_schema.empty_table())
        .groupby("day_us")
        .aggregate(Sum("n", alias_name="n_new_users"))
        .materialize()  # days-cardinality tiny
    )

    @ray.remote
    def cumulate(*blocks: pa.Table) -> pa.Table:
        blocks = tuple(b for b in blocks if len(b) and "day_us" in b.column_names)
        if not blocks:
            return out_schema.empty_table()
        tbl = pa.concat_tables(blocks).sort_by("day_us")
        n = tbl.column("n_new_users").to_numpy().astype(np.int64)
        return pa.table(
            {
                "day_us": tbl.column("day_us"),
                "n_new_users": pa.array(n, pa.int64()),
                "cum_users": pa.array(np.cumsum(n), pa.int64()),
            }
        )

    refs = per_day.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(out_schema.empty_table())
    return ray.data.from_arrow_refs([cumulate.remote(*refs)])


def inactive_users(
    events: ray.data.Dataset, cutoff_s: int, n_parts: int = 16
) -> ray.data.Dataset:
    """Churned users: everyone whose LAST event is more than
    ``cutoff_s`` seconds before the corpus's newest event — the
    retention/hygiene complement of daily_new_users (stale accounts,
    dead devices, abandoned sessions). Output (user_id, last_ts_us),
    ordered nowhere (sort downstream if needed).

    Scale shape: per-batch (user → max ts) partials collapse each
    block to its distinct users BEFORE the shuffle; ONE slim user-keyed
    exchange takes the global per-user max partition-local. The corpus
    max rides a SEPARATE per-block scalar fold (one int64 per block) so
    the per-user table — users-cardinality, potentially huge — is
    filtered map-side against a broadcast scalar and never funnels into
    one task."""
    from duplicate_finder_ray.stages.exchange import hash_exchange

    if cutoff_s < 0:
        raise ValueError("cutoff_s must be non-negative")
    if n_parts <= 0:
        raise ValueError("n_parts must be positive")
    slim_schema = pa.schema([("user_id", pa.int64()), ("last_ts_us", pa.int64())])

    def user_max_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return slim_schema.empty_table()
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        order = np.lexsort((ts_us, uid))
        uid, ts_us = uid[order], ts_us[order]
        lasts = np.r_[uid[1:] != uid[:-1], True]
        return pa.table(
            {
                "user_id": pa.array(uid[lasts], pa.int64()),
                "last_ts_us": pa.array(ts_us[lasts], pa.int64()),
            }
        )

    slim = events.select_columns(["user_id", "ts"]).map_batches(
        user_max_partial, batch_format="pyarrow"
    ).materialize()

    corpus_max = slim.max("last_ts_us")
    if corpus_max is None:
        return ray.data.from_arrow(slim_schema.empty_table())
    threshold = int(corpus_max) - cutoff_s * 1_000_000

    def by_user(tbl: pa.Table, p: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy().astype(np.uint64)
        return (u % np.uint64(p)).astype(np.int64)

    def user_max(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return slim_schema.empty_table()
        uid = tbl.column("user_id").to_numpy().astype(np.int64)
        ts = tbl.column("last_ts_us").to_numpy().astype(np.int64)
        order = np.lexsort((ts, uid))
        uid, ts = uid[order], ts[order]
        lasts = np.r_[uid[1:] != uid[:-1], True]
        uid, ts = uid[lasts], ts[lasts]
        keep = ts < threshold
        return pa.table(
            {
                "user_id": pa.array(uid[keep], pa.int64()),
                "last_ts_us": pa.array(ts[keep], pa.int64()),
            }
        )

    return hash_exchange(slim, by_user, n_parts, user_max, slim_schema.empty_table())


def hourly_autocorr(events: ray.data.Dataset, lag: int = 1) -> ray.data.Dataset:
    """Lag-k autocorrelation of the DENSE hourly event-count series —
    the seasonality/self-similarity scalar monitoring reads before
    fitting anything (lag 1: smoothness; lag 24: daily cycle). Output
    one row (lag, n_rows, corr_micro) in half-up micro-units, the same
    representation (and zero-variance convention r = 0) as
    stats.grouped_corr, whose moment kernel this composes.

    Scale shape: all heavy lifting is hourly_dense's (per-batch count
    partials; events never shuffle); the dense series is
    hours-cardinality tiny, so consecutive-hour pairing runs in ONE
    remote task and the Pearson moments ride the existing distributed
    kernel over the tiny pair table."""
    from duplicate_finder_ray.stages.stats import grouped_corr

    if lag <= 0:
        raise ValueError("lag must be positive")
    dense = hourly_dense(events).materialize()
    pair_schema = pa.schema(
        [("lag", pa.int64()), ("x", pa.int64()), ("y", pa.int64())]
    )

    @ray.remote
    def make_pairs(*blocks: pa.Table) -> pa.Table:
        blocks = tuple(b for b in blocks if len(b) and "hour_us" in b.column_names)
        if not blocks:
            return pair_schema.empty_table()
        tbl = pa.concat_tables(blocks).sort_by("hour_us")
        x = tbl.column("n_events").to_numpy().astype(np.int64)
        if len(x) <= lag:
            return pair_schema.empty_table()
        return pa.table(
            {
                "lag": pa.array(np.full(len(x) - lag, lag, dtype=np.int64)),
                "x": pa.array(x[:-lag], pa.int64()),
                "y": pa.array(x[lag:], pa.int64()),
            }
        )

    refs = dense.to_arrow_refs()
    if not refs:
        return ray.data.from_arrow(
            pa.schema(
                [("lag", pa.int64()), ("n_rows", pa.int64()), ("corr_micro", pa.int64())]
            ).empty_table()
        )
    pairs = ray.data.from_arrow_refs([make_pairs.remote(*refs)])
    return grouped_corr(pairs, "lag", "x", "y")


def rolling_active_users(
    events: ray.data.Dataset, window_days: int = 7, n_parts: int = 16
) -> ray.data.Dataset:
    """Trailing-window distinct active users per day — the WAU/MAU
    product metric a naive count(DISTINCT) OVER RANGE cannot stream.
    For each day d in the corpus span, n_active = distinct users with
    >= 1 event in [d − window_days + 1, d]. Output (day_us, n_active),
    days beyond the corpus max omitted.

    Scale shape: per-batch DISTINCT (user, day) partials collapse each
    block before the shuffle; ONE slim user-keyed exchange makes each
    user's days partition-local, where the ×window_days fan-out and
    the (user, window-day) dedupe both happen WITHOUT re-shuffling
    (a user's expanded rows are co-located by construction); what
    leaves each partition is (window-day, count) partials — days
    cardinality — folded by a tiny groupby-sum. The raw event stream
    never shuffles and the fan-out never crosses the wire."""
    from duplicate_finder_ray.stages.exchange import hash_exchange

    if window_days <= 0:
        raise ValueError("window_days must be positive")
    if n_parts <= 0:
        raise ValueError("n_parts must be positive")
    _DAY_US = 86_400_000_000
    slim_schema = pa.schema([("user_id", pa.int64()), ("day_us", pa.int64())])
    part_schema = pa.schema([("day_us", pa.int64()), ("n", pa.int64())])

    def user_day_partial(batch: pa.Table) -> pa.Table:
        if len(batch) == 0:
            return slim_schema.empty_table()
        ts_us = pc.cast(pc.cast(batch["ts"], pa.timestamp("us")), pa.int64()).to_numpy()
        day = (ts_us // _DAY_US) * _DAY_US
        uid = batch.column("user_id").to_numpy().astype(np.int64)
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        firsts = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        return pa.table(
            {
                "user_id": pa.array(uid[firsts], pa.int64()),
                "day_us": pa.array(day[firsts], pa.int64()),
            }
        )

    slim = events.select_columns(["user_id", "ts"]).map_batches(
        user_day_partial, batch_format="pyarrow"
    ).materialize()

    corpus_max = slim.max("day_us")
    if corpus_max is None:
        return ray.data.from_arrow(
            pa.schema([("day_us", pa.int64()), ("n_active", pa.int64())]).empty_table()
        )
    max_day = int(corpus_max)

    def by_user(tbl: pa.Table, p: int) -> np.ndarray:
        u = tbl.column("user_id").to_numpy().astype(np.uint64)
        return (u % np.uint64(p)).astype(np.int64)

    def window_counts(p: int, tbl: pa.Table) -> pa.Table:
        if len(tbl) == 0:
            return part_schema.empty_table()
        uid = tbl.column("user_id").to_numpy().astype(np.int64)
        day = tbl.column("day_us").to_numpy().astype(np.int64)
        # global dedupe of (user, day): the exchange co-located users
        order = np.lexsort((day, uid))
        uid, day = uid[order], day[order]
        firsts = np.r_[True, (uid[1:] != uid[:-1]) | (day[1:] != day[:-1])]
        uid, day = uid[firsts], day[firsts]
        # fan out to the trailing windows this activity keeps alive
        w = np.arange(window_days, dtype=np.int64) * _DAY_US
        wday = (day[:, None] + w[None, :]).ravel()
        wuid = np.repeat(uid, window_days)
        keep = wday <= max_day
        wday, wuid = wday[keep], wuid[keep]
        # dedupe (user, window-day): one user active twice in a window
        # counts once
        order = np.lexsort((wday, wuid))
        wuid, wday = wuid[order], wday[order]
        firsts = np.r_[True, (wuid[1:] != wuid[:-1]) | (wday[1:] != wday[:-1])]
        days, counts = np.unique(wday[firsts], return_counts=True)
        return pa.table(
            {
                "day_us": pa.array(days, pa.int64()),
                "n": pa.array(counts.astype(np.int64), pa.int64()),
            }
        )

    return (
        hash_exchange(slim, by_user, n_parts, window_counts, part_schema.empty_table())
        .groupby("day_us")
        .aggregate(Sum("n", alias_name="n_active"))
    )
