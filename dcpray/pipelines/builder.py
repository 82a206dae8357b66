"""Builder-pattern pipeline API — parity with the reference's connector
builder surface (/root/reference/connector.go:259-312:
``NewConnectorBuilder(cfg).SetMapper(m).SetSinkResponseHandler(h)
.SetCompletionHandler(f).SetLogger(l).Build()``).

The user-extension points map 1:1:

| reference                        | dcpray                               |
|----------------------------------|--------------------------------------|
| Mapper (mapper.go:8)             | set_mapper(fn: pa.Table -> pa.Table) |
| SinkResponseHandler              | set_sink_response_handler(h)         |
|   (kafka/sink_response_handler.go:20-24: OnInit/OnSuccess/OnError)     |
| completion handler               | set_completion_handler(fn)           |
|   (connector.go:309-312)         |   called once per committed run      |
| logger (connector.go:289-294)    | set_logger(logging.Logger)           |
| metadata store (connector.go:226-229) | the lake's ManifestStore        |
"""

from __future__ import annotations

import logging
from typing import Any, Callable

from dcpray.config import ReplayConfig
from dcpray.pipelines.replay import RunResult, replay
from dcpray.state.checkpoint import Lake


class SinkResponseHandler:
    """Per-bucket sink fan-out, the table analogue of the per-message
    success/error fan-out (producer_batch.go:125-137). ``on_success``
    receives each committed bucket's stats row; ``on_error`` the
    exception of a failed run (after Ray's task retries are exhausted —
    the reference's panic-and-replay, producer_batch.go:117-121,
    becomes raise-after-handler)."""

    def on_init(self, lake: Lake) -> None:  # pragma: no cover - hook
        pass

    def on_success(self, bucket_stats: dict[str, Any]) -> None:
        pass

    def on_error(self, error: BaseException) -> None:
        pass


class Pipeline:
    """A configured CDC replay pipeline bound to one lake."""

    def __init__(self, lake: Lake, config: ReplayConfig, mapper, handler,
                 completion, logger, metrics_handler=None, views=(),
                 changefeed=False):
        from dcpray.state.views import IncrementalView

        self.lake = lake
        self.config = config
        self.mapper = mapper
        self.handler = handler
        self.completion = completion
        self.changefeed = changefeed
        self.log = logger
        self.metrics_handler = metrics_handler
        self.views = [IncrementalView(lake, spec) for spec in views]
        self._pool = None

    def _merge_pool(self):
        """Lazily create (and keep, across run/tail calls) the stateful
        merge-applier actor pool when configured."""
        if not self.config.merge_actor_pool:
            return None
        if self._pool is None:
            from dcpray.stages.aligned import make_merge_pool

            self._pool = make_merge_pool(
                max(self.config.merge_concurrency),
                self.config.merge_cache_rows,
            )
        return self._pool

    def close(self) -> None:
        """Release the actor pool (the analogue of connector.Close,
        connector.go:58-64). Safe to call multiple times."""
        if self._pool is not None:
            import ray

            for a in self._pool:
                ray.kill(a)
            self._pool = None

    def tail(self, wal_dir: str, *, base_snapshot_dir: str | None = None,
             poll_interval_s: float = 2.0, max_polls: int | None = None,
             idle_polls_to_stop: int | None = None, **kwargs) -> list[RunResult]:
        """Continuous mode — the analogue of the reference's blocking
        ``connector.Start()`` stream (connector.go:50-56): poll the WAL
        directory and incrementally replay whatever new segments landed,
        committing a manifest per batch of arrivals. Stops after
        ``max_polls`` polls or ``idle_polls_to_stop`` consecutive empty
        polls (both None = run forever); each committed run is
        checkpointed, so a killed tail resumes exactly."""
        import time as _time

        results: list[RunResult] = []
        idle = 0
        polls = 0
        while True:
            res = self.run(wal_dir, base_snapshot_dir=base_snapshot_dir, **kwargs)
            if res.committed:
                results.append(res)
                idle = 0
            else:
                idle += 1
                if idle_polls_to_stop is not None and idle >= idle_polls_to_stop:
                    break
            polls += 1
            if max_polls is not None and polls >= max_polls:
                break
            _time.sleep(poll_interval_s)
        return results

    def run(self, wal_dir: str, *, base_snapshot_dir: str | None = None,
            **kwargs) -> RunResult:
        """One bounded replay of the WAL's unprocessed tail (the
        bounded-stream analogue of connector.Start/WaitUntilReady,
        connector.go:50-56). Idempotent: rerun after success is a no-op."""
        if self.handler:
            self.handler.on_init(self.lake)
        try:
            res = replay(
                self.lake, wal_dir,
                config=self.config,
                mapper=self.mapper,
                base_snapshot_dir=base_snapshot_dir,
                merge_pool=self._merge_pool(),
                **kwargs,
            )
        except BaseException as e:
            if self.handler:
                self.handler.on_error(e)
            raise
        if res.committed:
            self.log.info(
                "run %s committed: %s events in, %s rows out, %s rejected",
                res.run_id, res.metrics.get("events_in"),
                res.metrics.get("rows_out"), res.metrics.get("rejected_rows"),
            )
            # live metrics (X2 full parity): append one line per commit
            # to <lake>/metrics/stream.jsonl so a tail-mode scraper sees
            # gauges move DURING the stream (reference: Prometheus
            # collector, /root/reference/metric/collector.go:9-56), and
            # fan out to the optional callback. BEST-EFFORT: the commit
            # is already durable — an observability write must not turn
            # a committed run into an apparent failure or suppress sink
            # acks
            try:
                self.lake.append_stream_metrics(res.run_id, res.metrics)
            except OSError as e:
                self.log.warning("stream metrics append failed: %s", e)
            if self.metrics_handler:
                # same best-effort contract as the jsonl append: a user
                # callback that raises must not turn a durably committed
                # run into an apparent failure or suppress sink acks
                try:
                    self.metrics_handler(res)
                except Exception as e:
                    self.log.warning("metrics handler raised: %s", e)
            if self.handler:
                # per-bucket STATS rows of buckets written THIS run —
                # not manifest file entries, which include carry-forward
                # buckets (an incremental run touching 1 of 256 buckets
                # must not re-ack the other 255 every commit, r5 review)
                for s in res.bucket_stats:
                    self.handler.on_success(s)
            # attached incremental views: one cheap refresh per commit
            # (cost = rewritten buckets). BEST-EFFORT like the metrics
            # fan-out — the run is already durably committed, refresh is
            # idempotent/healing, and a stale view raises loudly at
            # read() — so a refresh failure logs instead of turning the
            # committed run into an apparent failure
            for v in self.views:
                try:
                    vm = v.refresh()
                    self.log.info(
                        "view %s refreshed at seq %s: %s/%s buckets",
                        v.spec.name, vm["seq"], vm["buckets_computed"],
                        vm["buckets_total"])
                except Exception as e:
                    self.log.warning("view %s refresh failed (stale until "
                                     "next refresh): %s", v.spec.name, e)
            # persisted change feed: one <lake>/changefeed/seq=N/ dir
            # per commit — the durable analogue of the reference
            # producing each change to its topic (connector.go:103-123).
            # BEST-EFFORT like views: write_changefeed is idempotent, a
            # missing feed raises loudly at read_changefeed, and the
            # run itself is already durably committed
            if self.changefeed:
                try:
                    from dcpray.functions.history import write_changefeed

                    cm = write_changefeed(self.lake, res.manifest.seq)
                    self.log.info("changefeed seq=%s written%s",
                                  res.manifest.seq,
                                  " (already present)"
                                  if cm.get("skipped") else "")
                except Exception as e:
                    self.log.warning("changefeed write failed (recover "
                                     "with write_changefeed): %s", e)
        if self.completion:
            self.completion(res)
        return res


class PipelineBuilder:
    def __init__(self, lake_dir: str, config: ReplayConfig | None = None):
        self._lake_dir = lake_dir
        self._config = config or ReplayConfig()
        self._mapper = None
        self._handler: SinkResponseHandler | None = None
        self._completion: Callable[[RunResult], None] | None = None
        self._logger = logging.getLogger("dcpray")
        self._store = None
        self._metrics_handler: Callable[[RunResult], None] | None = None
        self._views: list = []
        self._changefeed = False

    def set_metadata_store(self, store) -> "PipelineBuilder":
        """Swap the manifest backend (reference: the Kafka metadata store
        is swapped in when metadata.type == 'kafka',
        connector.go:173-175, :226-229) — e.g.
        ``CasManifestStore(lake_dir)`` for object-store deployments."""
        self._store = store
        return self

    def set_mapper(self, mapper) -> "PipelineBuilder":
        self._mapper = mapper
        return self

    def set_sink_response_handler(self, h: SinkResponseHandler) -> "PipelineBuilder":
        self._handler = h
        return self

    def set_completion_handler(self, fn: Callable[[RunResult], None]) -> "PipelineBuilder":
        self._completion = fn
        return self

    def set_logger(self, logger: logging.Logger) -> "PipelineBuilder":
        self._logger = logger
        return self

    def set_metrics_handler(self, fn: Callable[[RunResult], None]) -> "PipelineBuilder":
        """Per-commit metrics callback — the live-gauge hook for
        deployments that scrape a collector instead of tailing
        ``metrics/stream.jsonl``."""
        self._metrics_handler = fn
        return self

    def attach_view(self, spec) -> "PipelineBuilder":
        """Attach an incrementally-maintained aggregate view
        (``ViewSpec``): every committed run (including each tail-mode
        commit) triggers one cheap ``refresh()`` whose cost is the
        number of REWRITTEN buckets — the commit → downstream-state
        propagation a CDC consumer otherwise builds by hand.
        Repeatable for multiple views."""
        self._views.append(spec)
        return self

    def attach_changefeed(self) -> "PipelineBuilder":
        """Persist a change feed per commit (incl. each tail-mode
        commit) under ``<lake>/changefeed/seq=N/`` — the downstream-
        consumer surface: read with ``read_changefeed(lake, a, b)``
        instead of recomputing diffs (the reference's Kafka-topic
        output, made durable as Parquet)."""
        self._changefeed = True
        return self

    def build(self) -> Pipeline:
        return Pipeline(
            Lake(self._lake_dir, store=self._store), self._config, self._mapper,
            self._handler, self._completion, self._logger,
            metrics_handler=self._metrics_handler, views=self._views,
            changefeed=self._changefeed,
        )
