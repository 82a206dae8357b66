"""Small Ray Data context helpers."""

from __future__ import annotations

import logging
from collections import OrderedDict
from contextlib import contextmanager

#: per-process memo for task-pool stage state (the task-pool analogue of
#: an actor's __init__): small keyed LRU, NOT clear-on-miss — concurrent
#: queries interleaving batches with different keys in one worker must
#: each keep their entry, or every batch re-pays the setup the memo
#: exists to avoid
_WORKER_MEMO: OrderedDict = OrderedDict()
_WORKER_MEMO_MAX = 8


def worker_memo(key, factory):
    """Process-level memoized construction keyed by ``key`` (e.g. an
    ObjectRef hex + params). Bounded LRU so a long-lived worker serving
    many queries doesn't grow without bound."""
    try:
        val = _WORKER_MEMO[key]
        _WORKER_MEMO.move_to_end(key)
        return val
    except KeyError:
        # cache miss — observable when diagnosing per-batch re-setup
        logging.getLogger("dcpray.rayutil").debug(
            "worker_memo miss (building): %r", key)
    val = factory()
    _WORKER_MEMO[key] = val
    if len(_WORKER_MEMO) > _WORKER_MEMO_MAX:
        _WORKER_MEMO.popitem(last=False)
    return val


class _EmptySchemaWarningFilter(logging.Filter):
    """Drop Ray's once-per-operator "RefBundle with a different schema …
    new schema: ." warning — and ONLY that one.

    Root cause (verified against ray 2.49: the sort AND hash exchanges
    both materialize an empty output partition as a ZERO-FIELD block,
    ``pa.table({})``): any ``groupby().map_groups`` pipeline whose
    partition count exceeds its non-empty partition count therefore
    emits one schema-less bundle, and
    ``streaming_executor_state.py:793`` logs a divergence warning even
    though Ray keeps the previous (correct) schema and the zero-field
    block carries no rows. Nothing our operators return is schema-less
    — every empty table we build is typed — so the message is pure
    noise for these bundles. A divergence between two NON-empty schemas
    prints the real schema text and does NOT match this filter."""

    def filter(self, record: logging.LogRecord) -> bool:  # pragma: no cover - trivial
        msg = record.getMessage()
        return not ("RefBundle with a different schema" in msg
                    and "new schema: ." in msg)


def quiet_empty_schema_warnings() -> None:
    """Install the empty-schema noise filter (idempotent). Called by the
    driver entry points and ``bench.py`` so benign zero-row partition
    bundles don't spray warnings into user-facing run logs."""
    lg = logging.getLogger(
        "ray.data._internal.execution.streaming_executor_state"
    )
    if not any(isinstance(f, _EmptySchemaWarningFilter) for f in lg.filters):
        lg.addFilter(_EmptySchemaWarningFilter())


@contextmanager
def push_based_shuffle():
    """Scope Ray Data's push-based sort shuffle over a block of dataset
    EXECUTIONS (datasets are lazy — the strategy is consulted when an
    all-to-all op runs, so wrap the .to_pandas()/take_all/iter call, not
    the pipeline construction). Measured ~2× on banded-LSH groupbys and
    the salted merge; pull-based remains the default because it wins on
    some small aggregations (see bench notes in pipelines/replay.py)."""
    from ray.data import DataContext
    from ray.data.context import ShuffleStrategy

    ctx = DataContext.get_current()
    saved = ctx.shuffle_strategy
    ctx.shuffle_strategy = ShuffleStrategy.SORT_SHUFFLE_PUSH_BASED
    try:
        yield
    finally:
        ctx.shuffle_strategy = saved
