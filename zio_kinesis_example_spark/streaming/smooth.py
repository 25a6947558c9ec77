"""Streaming recursive smoothers (round 10): the applyInPandasWithState
twin that q_ts_ewma's and q_ts_holt's docstrings promise — "unbounded
series stream through applyInPandasWithState carrying the smoother
state" — now implemented rather than claimed.

The batch queries collect each bounded series and fold it with an
`aggregate` HOF; that is exact but O(series) state per key. Here the
SAME recurrences (EWMA: s = α·x + (1−α)·s, s₀ = x₀; Holt: l = α·x +
(1−α)(l+b), b = β(l−l_prev) + (1−β)b, seeded l₁ = x₁, b₁ = x₂ − x₁)
carry O(1) state per key in Spark's state store — checkpointed with the
batch offsets, restored on restart, so a kill/replay resumes from the
pre-batch state and refolding the replayed batch is exact (the
reference's durable-state contract,
CheckpointOnChunkEndStreamClient.scala:31-44, applied to smoother
state).

ORDER CONTRACT (ENFORCED, r11 — the r10 verdict's documented-but-
unchecked assumption): rows fold in ascending ``order_col`` within each
micro-batch, and state carries a high-watermark ``last_ord`` — a row
arriving in a later micro-batch with ord ≤ the watermark is DROPPED and
COUNTED (``n_late`` in every emitted row), dead-letter style, exactly
the truthfulness rule the poison guard applies to NaN values. Without
the watermark a late row would silently fold as if newest, corrupting
the recurrence. ``order_col`` must be numeric (epoch micros, seq no —
the batch twins' shape) and exactly representable as float64 (the
watermark lives in a DoubleType state slot: |ord| < 2^53 — epoch
MICROS stay inside that to year ~2255, epoch NANOS do not; feed
micros); ords must be strictly increasing per key across batches
(equal ords in ONE batch fold in stable sort order).

Scale shape: state is 4 doubles per key regardless of series length —
the whole point versus the batch collect; one row per touched key per
micro-batch in update mode.

CHECKPOINT BREAK (r11): the state schema grew from 6 to 8 fields
(``last_ord``/``n_late``); a checkpoint written before r11 cannot be
resumed — the update function detects the 6-field state and raises a
descriptive error instead of an opaque tuple-unpack failure. Use a
fresh checkpointLocation after upgrading.
"""

from __future__ import annotations

from typing import Any, Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    DoubleType, LongType, StringType, StructField, StructType,
)

_SMOOTH_OUT = StructType([
    StructField("series_key", StringType()),
    StructField("n_points", LongType()),
    StructField("level", DoubleType()),
    StructField("trend", DoubleType()),
    StructField("forecast_next", DoubleType()),
    StructField("n_late", LongType()),
])
#: (n_points, level, trend, first_x, alpha, beta, last_ord, n_late) —
#: first_x parks x₁ until Holt's two-point seed is complete; EWMA
#: ignores trend/first_x. alpha/beta are RECORDED IN STATE (r10
#: review): restarting from a checkpoint with different coefficients
#: (or switching EWMA↔Holt) would otherwise silently continue the fold
#: as a mixed model; the mismatch now fails loudly instead. beta = −1.0
#: encodes EWMA. last_ord is the order-contract high-watermark and
#: n_late the running dead-letter count of dropped late rows (r11).
_SMOOTH_STATE = StructType([
    StructField("n", LongType()),
    StructField("level", DoubleType()),
    StructField("trend", DoubleType()),
    StructField("first_x", DoubleType()),
    StructField("alpha", DoubleType()),
    StructField("beta", DoubleType()),
    StructField("last_ord", DoubleType()),
    StructField("n_late", LongType()),
])


def smooth_stateful(series: DataFrame, alpha: float,
                    beta: float | None = None,
                    key_col: str = "series_key",
                    order_col: str = "ord",
                    value_col: str = "x") -> DataFrame:
    """EWMA (``beta=None``) or Holt two-state smoothing per key as a
    custom stateful streaming operator. Emits one
    (series_key, n_points, level, trend, forecast_next) row per touched
    key per micro-batch; for EWMA trend is 0.0 and forecast = level."""

    beta_tag = -1.0 if beta is None else float(beta)

    def update(key: Tuple[str], pdfs: Iterator[pd.DataFrame],
               state: Any) -> Iterator[pd.DataFrame]:
        if state.exists and len(state.get) != 8:
            raise ValueError(
                f"smooth_stateful state has {len(state.get)} fields but "
                "this version expects 8 (last_ord/n_late were added to "
                "the state schema in r11) — a checkpoint written by an "
                "older version cannot be resumed; use a fresh "
                "checkpointLocation")
        n, level, trend, first_x, s_alpha, s_beta, last_ord, n_late = (
            state.get if state.exists
            else (0, 0.0, 0.0, 0.0, float(alpha), beta_tag,
                  float("-inf"), 0))
        if (s_alpha, s_beta) != (float(alpha), beta_tag):
            raise ValueError(
                f"smooth_stateful checkpoint was written with "
                f"alpha={s_alpha}, beta={'None' if s_beta == -1.0 else s_beta}"
                f" but restarted with alpha={alpha}, beta={beta} — "
                "continuing would silently fold a mixed model; use a "
                "fresh checkpointLocation to change coefficients")
        chunks = [pdf for pdf in pdfs if len(pdf)]
        if not chunks:
            return
        rows = pd.concat(chunks)
        # poison guard (the streaming-ANN rule): one NaN/null value —
        # or a null ORDER key, which pandas would sort LAST and fold in
        # the wrong position (r10 review) — would corrupt the key's
        # state FOREVER; a malformed record costs its own row, never
        # the series. A non-finite ORDER key is poison too (r12): an
        # ord of +inf would otherwise pass the ok filter and set the
        # persisted watermark to +inf, dropping every later row for the
        # key as "late" forever, and an ord of -inf on a fresh key
        # would be mis-dropped against the -inf initial watermark.
        # value guard = the BATCH twins' measure-domain contract
        # (operators.exact.MEASURE_ABS_MAX, r13): q_ts_ewma/q_ts_holt
        # exclude |x| >= 9e11, and the streaming twin must judge
        # in-domain identically or a restarted pipeline and its batch
        # backfill would disagree on the same series. The bound
        # subsumes the old NaN/inf check for values (NaN/inf fail it);
        # order keys only need finiteness (watermark slot is float64).
        ok = (~rows[value_col].isna() & ~rows[order_col].isna()
              & (rows[value_col].astype(float).abs() < 9.0e11)
              & (rows[order_col].astype(float).abs() != float("inf")))
        rows = rows[ok]
        # ORDER-CONTRACT ENFORCEMENT (r11, the r10 verdict item): a row
        # at or below the high-watermark arrived in the wrong
        # micro-batch — folding it "as if newest" would corrupt the
        # recurrence for every later point, so it is dropped and
        # counted like a poison value. Its row costs itself, never the
        # series.
        late = rows[order_col].astype(float) <= last_ord
        n_late += int(late.sum())
        rows = rows[~late].sort_values(order_col)
        if not len(rows) and n == 0:
            return            # all-poison first batch: no fabricated row
        for x in rows[value_col].astype(float):
            n += 1
            if beta is None:                       # EWMA
                level = x if n == 1 else alpha * x + (1 - alpha) * level
            elif n == 1:                           # Holt: park x₁
                first_x = x
            elif n == 2:                           # two-point seed …
                level, trend = first_x, x - first_x
                l_new = alpha * x + (1 - alpha) * (level + trend)
                trend = beta * (l_new - level) + (1 - beta) * trend
                level = l_new                      # … plus the i=2 step
            else:
                l_new = alpha * x + (1 - alpha) * (level + trend)
                trend = beta * (l_new - level) + (1 - beta) * trend
                level = l_new
        if len(rows):
            last_ord = float(rows[order_col].iloc[-1])
        state.update((n, level, trend, first_x, float(alpha), beta_tag,
                      last_ord, n_late))
        # Holt with one point so far: the seed is provisional — emit
        # l₁ = x₁ with zero trend (the batch twin omits n<2 series;
        # a stream must still say something truthful for the key)
        lv = first_x if (beta is not None and n == 1) else level
        yield pd.DataFrame({
            "series_key": [key[0]],
            "n_points": [n],
            "level": [lv],
            "trend": [0.0 if beta is None else trend],
            "forecast_next": [lv if beta is None else lv + trend],
            "n_late": [n_late],
        })

    return series.groupBy(key_col).applyInPandasWithState(
        update,
        outputStructType=_SMOOTH_OUT,
        stateStructType=_SMOOTH_STATE,
        outputMode="update",
        timeoutConf="NoTimeout",
    )
