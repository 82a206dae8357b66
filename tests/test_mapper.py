"""Mapper (flat-map/filter/project UDF) parity — reference mapper.go:8-20."""

import os

import pyarrow as pa
import pyarrow.compute as pc

from dcpray import Lake, ReplayConfig, replay
from dcpray.oracle import naive_final_state, read_wal_pandas
from dcpray.stages.mapper import default_kafka_mapper, route_column, split_by_route
from tests.util import assert_final_state_equal, normalize


def test_projection_mapper(tiny_fixture, tmp_path):
    """A mapper that rewrites the payload (project) flows through the
    merge; the oracle applies the same per-event transform."""

    def upper(batch: pa.Table) -> pa.Table:
        i = batch.schema.get_field_index("text")
        return batch.set_column(i, "text", pc.utf8_upper(batch["text"]))

    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    replay(lake, wal, mapper=upper, config=ReplayConfig(num_buckets=16))
    oracle = naive_final_state(wal, None)
    oracle["text"] = oracle["text"].str.upper()
    assert_final_state_equal(lake.to_pandas_sorted(), oracle)


def test_filter_mapper(tiny_fixture, tmp_path):
    """Returning fewer rows = ack-and-skip filter (connector.go:98-101)."""

    def drop_tool_turns(batch: pa.Table) -> pa.Table:
        keep = pc.or_kleene(
            pc.not_equal(batch["op"], "mutation"),  # keep tombstones
            pc.invert(pc.equal(batch["role"], "tool")),
        )
        return batch.filter(pc.fill_null(keep, True))

    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    replay(lake, wal, mapper=drop_tool_turns, config=ReplayConfig(num_buckets=16))
    df = lake.to_pandas_sorted()
    assert (df["role"] != "tool").all()


def test_fanout_mapper(tiny_fixture, tmp_path):
    """1→N fan-out (README.md:16): clone every mutation into a shadow
    turn at turn_idx+10000; final table has the clone keys too."""

    def fanout(batch: pa.Table) -> pa.Table:
        muts = batch.filter(pc.equal(batch["op"], "mutation"))
        i = muts.schema.get_field_index("turn_idx")
        clone = muts.set_column(
            i, "turn_idx", pc.add(muts["turn_idx"], pa.scalar(10000, pa.int32()))
        )
        return pa.concat_tables([batch, clone])

    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    replay(lake, wal, mapper=fanout, config=ReplayConfig(num_buckets=16))
    df = lake.to_pandas_sorted()
    shadows = df[df["turn_idx"] >= 10000]
    assert len(shadows) > 0
    # a shadow exists iff its original key's winner is a mutation OR the
    # key's mutations were superseded by a tombstone (shadow keeps last
    # mutation since tombstones weren't cloned) — so shadows ⊇ originals
    originals = df[df["turn_idx"] < 10000]
    orig_keys = set(zip(originals["conv_id"], originals["turn_idx"]))
    for c, t in zip(shadows["conv_id"], shadows["turn_idx"] - 10000):
        pass  # structural: every original live key must have a shadow
    shadow_keys = set(zip(shadows["conv_id"], shadows["turn_idx"] - 10000))
    assert orig_keys <= shadow_keys


def test_default_kafka_mapper_parity(tiny_fixture, tmp_path):
    """DefaultMapper drops deletes/expiries (mapper.go:11-13): with it, the
    lake keeps the last MUTATION per key (no tombstoning)."""
    lake = Lake(str(tmp_path / "lake"))
    wal = os.path.join(tiny_fixture, "wal")
    replay(lake, wal, mapper=default_kafka_mapper, config=ReplayConfig(num_buckets=16))
    df = lake.to_pandas_sorted()

    w = read_wal_pandas(wal)
    w = w[w["conv_id"].notna() & (w["turn_idx"] >= 0) & (w["op"] == "mutation")]
    w = w.sort_values("seqno", kind="stable")
    exp = w.drop_duplicates(subset=["conv_id", "turn_idx"], keep="last")
    exp = exp[["conv_id", "turn_idx", "role", "text", "tool", "ts", "tool_version"]]
    assert_final_state_equal(df, exp)
    # and it keeps MORE keys than the tombstoning replay
    full = naive_final_state(wal, None)
    assert len(df) >= len(full)


def test_route_and_split():
    t = pa.table(
        {
            "collection": pa.array(["a", "b", "a"]),
            "x": pa.array([1, 2, 3]),
        }
    )
    routed = route_column(t, {"a": "t_a", "b": "t_b"})
    assert routed["route"].to_pylist() == ["t_a", "t_b", "t_a"]

    import ray.data as rd

    ds = rd.from_arrow(routed)
    parts = split_by_route(ds, ["t_a", "t_b"])
    assert parts["t_a"].count() == 2
    assert parts["t_b"].count() == 1

    try:
        route_column(t, {"a": "t_a"})
        raise AssertionError("expected KeyError for unmapped collection")
    except KeyError:
        pass


def test_aligned_mapper_column_guard(tiny_fixture, tmp_path):
    """A mapper that drops required CDC columns must fail loudly in the
    aligned path too (same guard as the shuffle path)."""
    import pytest

    from dcpray import Lake, ReplayConfig, replay

    def bad(batch):
        return batch.drop_columns(["seqno"])

    with pytest.raises(Exception, match="required CDC columns"):
        replay(Lake(str(tmp_path / "lake")), os.path.join(tiny_fixture, "wal"),
               config=ReplayConfig(num_buckets=16), mapper=bad)


def test_headers_roundtrip_through_replay(tiny_fixture, tmp_path):
    """Explicit message headers (KafkaMessage.Headers parity,
    message.go:5-10): a mapper attaches a map<string,string> headers
    column; it survives merge + schema unification into the lake and
    reads back per row."""
    import pyarrow.parquet as pq

    from dcpray import Lake, ReplayConfig, replay
    from dcpray.stages.mapper import HEADERS_COL, header_value, with_headers

    def add_hdrs(batch):
        return with_headers(batch, {
            "origin": "wal",
            "conv": batch["conv_id"],
        })

    lake = Lake(str(tmp_path / "lake"))
    res = replay(lake, os.path.join(tiny_fixture, "wal"),
                 base_snapshot_dir=os.path.join(tiny_fixture, "base"),
                 config=ReplayConfig(num_buckets=16), mapper=add_hdrs)
    assert res.committed
    files = [lake.abspath(f["path"]) for f in lake.current_files()]
    tabs = [pq.read_table(f) for f in files if HEADERS_COL in pq.read_schema(f).names]
    assert tabs, "headers column did not reach the lake"
    import pyarrow as pa

    t = pa.concat_tables(tabs, promote_options="permissive")
    delta_rows = t.filter(pa.compute.is_valid(t[HEADERS_COL]))
    assert delta_rows.num_rows > 0
    origin = header_value(delta_rows, "origin").to_pylist()
    assert set(origin) == {"wal"}
    conv = header_value(delta_rows, "conv").to_pylist()
    assert conv == delta_rows["conv_id"].to_pylist()


def test_with_headers_nonstring_column():
    """Per-row header values from a non-string (int) column stringify —
    and ChunkedArray input (the normal map_batches case) works."""
    import pyarrow as pa

    from dcpray.stages.mapper import header_value, with_headers

    t = pa.table({"conv_id": ["a", "b"], "turn_idx": pa.array([5, 7], pa.int64())})
    out = with_headers(t, {"turn": t["turn_idx"], "tag": "x"})
    assert header_value(out, "turn").to_pylist() == ["5", "7"]
    assert header_value(out, "tag").to_pylist() == ["x", "x"]
