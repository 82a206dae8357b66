"""Small Ray Data context helpers."""

from __future__ import annotations

from contextlib import contextmanager


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
