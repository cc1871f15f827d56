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
  together and time-ordered ⇒ ONE groupby(user_id).map_groups with an
  in-group vectorized gap scan (numpy diff > gap ⇒ cumsum session ids).
  Skew note: the hottest user's event count bounds a group; user_id
  cardinality ≫ cores keeps partitions balanced.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray.data
from ray.data.aggregate import Count, Sum

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
    events: ray.data.Dataset, gap_minutes: int = 30
) -> ray.data.Dataset:
    """Gap-based sessions per user: a new session starts when the time
    since the user's previous event exceeds ``gap_minutes``. Output one
    row per session: (user_id, session_id, n_events, session_start_us,
    session_end_us); session_id is 1-based in time order per user."""
    gap_us = gap_minutes * 60_000_000

    out_schema = pa.schema(
        [
            ("user_id", pa.int64()),
            ("session_id", pa.int64()),
            ("n_events", pa.int64()),
            ("session_start_us", pa.int64()),
            ("session_end_us", pa.int64()),
        ]
    )

    def make_sessions(group: pd.DataFrame) -> pa.Table:
        g = group.sort_values(["ts", "event_id"], kind="mergesort")
        # normalize to µs regardless of the column's datetime64 unit
        ts_us = g["ts"].to_numpy(dtype="datetime64[us]").astype(np.int64)
        new_session = np.ones(len(ts_us), dtype=np.int64)
        if len(ts_us) > 1:
            new_session[1:] = (np.diff(ts_us) > gap_us).astype(np.int64)
        session_id = np.cumsum(new_session)
        df = pd.DataFrame(
            {
                "user_id": g["user_id"].to_numpy(),
                "session_id": session_id,
                "ts_us": ts_us,
            }
        )
        agg = df.groupby("session_id", sort=True).agg(
            user_id=("user_id", "first"),
            n_events=("ts_us", "size"),
            session_start_us=("ts_us", "min"),
            session_end_us=("ts_us", "max"),
        )
        agg = agg.reset_index()
        return pa.Table.from_pandas(
            agg[[f.name for f in out_schema]], schema=out_schema, preserve_index=False
        )

    return (
        events.select_columns(["event_id", "ts", "user_id"])
        .groupby("user_id")
        .map_groups(make_sessions, batch_format="pandas")
    )
