"""Property-based check of the order-free LWW core (hypothesis).

Invariants (SURVEY §4 ordering row): for ANY multiset of change events
and ANY partition of it into blocks in ANY order,
``lww_filter(concat(lww_filter(block_i)))`` equals the sequential
dictionary applier — commutativity + associativity of max-seqno reduce,
which is what makes the parallel merge safe under arbitrary Ray block
arrival order."""

import numpy as np
import pyarrow as pa
from hypothesis import given, settings
from hypothesis import strategies as st

from dcpray.schema import OP_DELETION, OP_EXPIRATION, OP_MUTATION
from dcpray.stages.merge import lww_filter

OPS = [OP_MUTATION, OP_DELETION, OP_EXPIRATION]

events_strategy = st.lists(
    st.tuples(
        st.integers(0, 5),      # conv ordinal
        st.integers(0, 3),      # turn
        st.sampled_from(OPS),   # op
    ),
    min_size=1,
    max_size=60,
)


def _table(rows):
    # seqno = 1-based position: unique, so LWW winner is deterministic
    return pa.table(
        {
            "conv_id": pa.array([f"conv-{c:04d}" for c, _, _ in rows], pa.string()),
            "turn_idx": pa.array([t for _, t, _ in rows], pa.int32()),
            "seqno": pa.array(np.arange(1, len(rows) + 1, dtype=np.uint64)),
            "op": pa.array([o for _, _, o in rows], pa.string()),
            "text": pa.array([f"v{i}" for i in range(len(rows))], pa.string()),
        }
    )


def _sequential_apply(rows):
    state = {}
    for i, (c, t, o) in enumerate(rows):
        key = (f"conv-{c:04d}", t)
        if o == OP_MUTATION:
            state[key] = f"v{i}"
        else:
            state.pop(key, None)
    return state


@settings(max_examples=200, deadline=None)
@given(events=events_strategy, data=st.data())
def test_blocked_lww_equals_sequential(events, data):
    table = _table(events)
    n = table.num_rows
    # random block partition + random arrival order
    n_blocks = data.draw(st.integers(1, min(5, n)))
    cuts = sorted(data.draw(st.lists(st.integers(0, n), min_size=n_blocks - 1,
                                     max_size=n_blocks - 1)))
    bounds = [0] + cuts + [n]
    perm = data.draw(st.permutations(range(len(bounds) - 1)))
    blocks = [table.slice(bounds[i], bounds[i + 1] - bounds[i]) for i in perm]
    blocks = [lww_filter(b) for b in blocks if b.num_rows]

    merged = lww_filter(pa.concat_tables(blocks))
    live = merged.filter(pa.compute.equal(merged["op"], OP_MUTATION))
    got = {
        (c, t): x
        for c, t, x in zip(live["conv_id"].to_pylist(),
                           live["turn_idx"].to_pylist(),
                           live["text"].to_pylist())
    }
    assert got == _sequential_apply(events)
