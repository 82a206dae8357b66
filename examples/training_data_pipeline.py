"""End-to-end training-data pipeline on dcpray.

The composition a real user runs: CDC-replay a change-event WAL into a
committed transcript lake, then refine the corpus — exact + near-dup
dedup, quality/language filtering, deterministic train/val/test
splitting — and write partitioned Parquet, all as ONE lazy Ray Data
flow per stage (each stage streams; nothing materializes the corpus on
the driver).

Run standalone (owns its Ray session):

    PYTHONPATH=. python examples/training_data_pipeline.py \
        --wal /tmp/dcpray_fixtures/sf0.001/wal \
        --base /tmp/dcpray_fixtures/sf0.001/base \
        --out /tmp/dcpray_example

or call :func:`run_pipeline` from code/tests with Ray already up.
"""

from __future__ import annotations

import os

import pyarrow as pa
import pyarrow.compute as pc


def run_pipeline(wal_dir: str, base_dir: str | None, out_dir: str,
                 *, num_buckets: int = 16, dedup_threshold: float = 0.7,
                 min_quality: float = 0.3, max_dup_frac: float = 0.5,
                 cluster: str = "auto",
                 benchmark_texts: list[str] | None = None) -> dict:
    """Returns per-stage row counts. Stages:

    1. CDC replay → committed lake (exactly-once manifest commit).
    2. Lake → documents: one text doc per conversation turn.
    3. Exact dedup (content hash, keep min key).
    4. MinHash near-dup pairs → drop non-representatives.
    5. Quality + language + repetition filter (vectorized scorers;
       the Gopher repetition rule drops docs whose duplicate-word
       fraction exceeds ``max_dup_frac``).
    5b. Benchmark decontamination (optional): drop docs sharing any
        word-8-gram with ``benchmark_texts`` — the eval set must not
        leak into the training corpus.
    6. Deterministic 8/1/1 split by content hash.
    7. Partitioned Parquet per split (resumable layout).
    """
    from dcpray import Lake, ReplayConfig, replay
    from dcpray.functions.dedup import exact_dedup, minhash_dedup
    from dcpray.functions.sample import hash_split
    from dcpray.functions.textstats import (
        lang_id_batch,
        quality_score_batch,
        repetition_stats,
    )

    counts: dict = {}

    # 1. ingest
    lake = Lake(os.path.join(out_dir, "lake"))
    res = replay(lake, wal_dir, base_snapshot_dir=base_dir,
                 config=ReplayConfig(num_buckets=num_buckets))
    counts["replay_rows_out"] = int(res.metrics.get("rows_out", 0)) \
        if res.committed else 0

    # 2. lake -> documents (doc_id = stable hash of (conv, turn))
    from dcpray.hashing import key_hash

    def to_docs(t: pa.Table) -> pa.Table:
        import numpy as np

        ids = key_hash(t["conv_id"], t["turn_idx"]).view(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "text": pc.fill_null(t["text"], ""),
        })

    docs = (lake.read_current()
            .select_columns(["conv_id", "turn_idx", "text"])
            .map_batches(to_docs, batch_format="pyarrow"))

    # 3. exact dedup — MATERIALIZE the result (object store, not the
    # driver): three downstream consumers (count, the near-dup pair
    # pass + its verify corpus pass, the final split) would otherwise
    # each re-run the lake scan and the dedup exchange, since Ray Data
    # recomputes lineage per consumer
    docs = exact_dedup(docs, key_col="doc_id", text_col="text").materialize()
    counts["after_exact_dedup"] = docs.count()

    # 4. near-dup dedup: LSH candidate pairs -> distributed exact-
    # Jaccard verification -> clustering (cluster="distributed" keeps
    # even the pair set off the driver) -> drop non-representatives
    # (the drop set travels as a broadcast ObjectRef, not a closure)
    labels, docs = minhash_dedup(docs, threshold=dedup_threshold,
                                 cluster=cluster)
    lab = labels.to_pandas()  # pa.Table or Dataset — both expose it
    counts["near_dup_dropped"] = int((lab["doc_id"] != lab["rep_id"]).sum())

    # 5. quality + language filter (task-pool scorers, joined per batch
    # — each batch scores itself, no exchange)
    def refine(t: pa.Table) -> pa.Table:
        q = quality_score_batch(t)
        lang = lang_id_batch(t)
        rep = repetition_stats(t, sep=" ")
        keep = pc.and_(
            pc.and_(
                pc.greater_equal(q["quality_score"],
                                 pa.scalar(min_quality, pa.float64())),
                pc.is_in(lang["lang_pred"],
                         value_set=pa.array(["en", "de", "fr", "es"])),
            ),
            # Gopher repetition gate (dup_seg_frac is null only for
            # NULL text — fill to 1.0 so null-text docs fail the gate;
            # empty-string docs get 0.0 here and are left to the
            # quality gate)
            pc.less_equal(pc.fill_null(rep["dup_seg_frac"], 1.0),
                          pa.scalar(max_dup_frac, pa.float64())),
        )
        return t.append_column("quality_score", q["quality_score"]) \
                .append_column("lang_pred", lang["lang_pred"]) \
                .append_column("dup_seg_frac", rep["dup_seg_frac"]) \
                .filter(keep)

    docs = docs.map_batches(refine, batch_format="pyarrow")

    # 5b. benchmark decontamination: the small benchmark side's 8-gram
    # hashes broadcast once; the corpus streams with zero exchange, and
    # only the O(#contaminated) id set returns to the driver
    if benchmark_texts:
        import numpy as np
        import ray
        import ray.data as rd

        from dcpray.functions.decontam import ngram_contamination

        bench = rd.from_arrow(pa.table({"text": pa.array(benchmark_texts)}))
        bad = ngram_contamination(docs, bench, n=8).to_pandas()
        counts["decontaminated"] = len(bad)
        bad_ids = ray.put(np.sort(bad["doc_id"].to_numpy().astype(np.int64)))

        def drop_contaminated(t: pa.Table, r) -> pa.Table:
            from dcpray.rayutil import worker_memo

            arr = worker_memo(("example_decontam", r.hex()),
                              lambda: ray.get(r))
            if len(arr) == 0:
                return t
            ids = t["doc_id"].to_numpy(zero_copy_only=False)
            pos = np.searchsorted(arr, ids)
            hit = (pos < len(arr)) & (arr[np.minimum(pos, len(arr) - 1)]
                                      == ids)
            return t.filter(pa.array(~hit))

        docs = docs.map_batches(drop_contaminated, fn_args=(bad_ids,),
                                batch_format="pyarrow")

    # 6. deterministic split + 7. partitioned write (one dir per split —
    # a failed run reruns a split without touching the others)
    split = hash_split(docs, col="text").materialize()
    counts["after_filters"] = split.count()
    for name in ("train", "val", "test"):
        part = split.map_batches(
            lambda t, _n=name: t.filter(pc.equal(t["split"], _n)),
            batch_format="pyarrow",
        ).materialize()  # one filter pass feeds both write and count
        part.write_parquet(os.path.join(out_dir, "corpus", f"split={name}"))
        counts[f"split_{name}"] = part.count()
    return counts


def main() -> None:
    import argparse

    import ray

    ap = argparse.ArgumentParser()
    ap.add_argument("--wal", required=True)
    ap.add_argument("--base", default=None)
    ap.add_argument("--out", required=True)
    ap.add_argument("--cluster", default="auto",
                    choices=("auto", "driver", "distributed"),
                    help="where near-dup connected components run")
    args = ap.parse_args()

    from dcpray.rayutil import quiet_empty_schema_warnings

    quiet_empty_schema_warnings()
    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False)
    try:
        counts = run_pipeline(args.wal, args.base, args.out,
                              cluster=args.cluster)
        for k, v in counts.items():
            print(f"{k}: {v}")
    finally:
        ray.shutdown()


if __name__ == "__main__":
    main()
