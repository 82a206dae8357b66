"""The benign 'new schema: .' noise (VERDICT r3 #3).

Ray 2.49 materializes EMPTY sort/hash-exchange partitions as zero-field
blocks, so any groupby().map_groups plan with more partitions than
non-empty groups logs a once-per-operator schema-divergence warning.
None of our operators emit schema-less tables — the fix is a
surgically-scoped logging filter that drops exactly that message while
keeping real (non-empty) schema divergences loud.
"""

import logging

import pyarrow as pa
import ray.data as rd

from dcpray.rayutil import _EmptySchemaWarningFilter, quiet_empty_schema_warnings

_LOGGER = "ray.data._internal.execution.streaming_executor_state"


def _rec(msg: str) -> logging.LogRecord:
    return logging.LogRecord(_LOGGER, logging.WARNING, __file__, 1, msg, (), None)


def test_filter_drops_only_empty_schema_divergence():
    f = _EmptySchemaWarningFilter()
    empty = ("Operator produced a RefBundle with a different schema than "
             "the previous one. Previous schema: x: int64, new schema: . "
             "This may lead to unexpected behavior.")
    real = ("Operator produced a RefBundle with a different schema than "
            "the previous one. Previous schema: x: int64, new schema: "
            "y: string. This may lead to unexpected behavior.")
    assert not f.filter(_rec(empty))          # the noise: dropped
    assert f.filter(_rec(real))               # real divergence: kept
    assert f.filter(_rec("unrelated warning"))


def test_map_groups_empty_partitions_run_quiet(caplog):
    """A map_groups plan with far more partitions than groups (the shape
    that produced the r3 bench-tail warnings) must run without any
    schema-divergence warning once the filter is installed."""
    quiet_empty_schema_warnings()
    quiet_empty_schema_warnings()  # idempotent — no duplicate filters
    lg = logging.getLogger(_LOGGER)
    assert sum(isinstance(f, _EmptySchemaWarningFilter)
               for f in lg.filters) == 1

    t = pa.table({"g": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([1.0, 2.0, 3.0])})
    ds = rd.from_arrow(t).repartition(8).groupby("g").map_groups(
        lambda b: b, batch_format="pyarrow"
    )
    with caplog.at_level(logging.WARNING, logger=_LOGGER):
        assert ds.count() == 3
    noisy = [r for r in caplog.records
             if "different schema" in r.getMessage()]
    assert noisy == []
