"""Small Ray Data context helpers."""

from __future__ import annotations

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
        pass
    val = factory()
    _WORKER_MEMO[key] = val
    if len(_WORKER_MEMO) > _WORKER_MEMO_MAX:
        _WORKER_MEMO.popitem(last=False)
    return val


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
