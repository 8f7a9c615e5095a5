"""Streaming bench lane gate (VERDICT r9 task 4).

``STREAM_BENCH.json`` (written by ``tools/bench_stream.py`` /
``python bench.py --streaming``) times the FULL streaming lifecycles
that bench.py excludes because their cost is per-micro-batch fixed
machinery, not row work. This gate pins the committed artifact:

- every lifecycle stays under a written budget (~2x the r10 measured
  time at sf0.1 on local[32], so a machinery regression — slower
  state-store commits, extra checkpoint IO, a lost warm-up — fails
  the suite the same way auto-benching caught q_cdc_chunks in r9);
- the micro-batch counts stay at their pinned minimums, so a time
  change can be attributed: same batches = slower machinery,
  different batches = a different execution shape (e.g. the
  session-evict sentinels stopped splitting into their own batches,
  which would silently stop exercising timer eviction);
- the restart-with-no-input lifecycle stays near-zero: it is the
  exactly-once surface (offsets replay, empty plan) and the purest
  measure of fixed overhead.

Regenerate after streaming-stack changes:
    python bench.py --streaming
"""

from __future__ import annotations

import json
import os

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_ARTIFACT = os.path.join(_REPO, "STREAM_BENCH.json")

# lifecycle -> (budget_sec, min_microbatches). Budgets ~2x the round-10
# measurement (stream_join 13.1, session_evict 24.8, dedup_memory 4.5,
# static_enrich 2.4, dedup_file_sink 10.6, restart 0.15, zset 2.6).
_BUDGETS = {
    "stream_join": (30.0, 2),          # two sides share one source dir
    "session_evict": (50.0, 4),        # data batches + >=3 sentinel
    "dedup_memory": (12.0, 1),
    "static_enrich": (8.0, 1),
    "dedup_file_sink": (25.0, 1),
    "dedup_restart_noinput": (5.0, 0),  # no new input => no new batch
    "zset_fold": (10.0, 4),            # maxFilesPerTrigger=1, 4 files
}


def _load() -> dict:
    assert os.path.exists(_ARTIFACT), (
        "STREAM_BENCH.json missing — run python bench.py --streaming"
    )
    with open(_ARTIFACT) as fh:
        return json.load(fh)


def test_every_lifecycle_present_and_under_budget():
    data = _load()
    lanes = data["lifecycles"]
    assert set(lanes) == set(_BUDGETS), (
        f"lifecycle set drifted: {sorted(lanes)} vs {sorted(_BUDGETS)}"
    )
    over = {
        name: (rec["sec"], _BUDGETS[name][0])
        for name, rec in lanes.items()
        if rec["sec"] > _BUDGETS[name][0]
    }
    assert not over, f"streaming lifecycles over budget: {over}"


def test_microbatch_counts_stay_pinned():
    data = _load()
    thin = {
        name: (rec["microbatches"], _BUDGETS[name][1])
        for name, rec in data["lifecycles"].items()
        if rec["microbatches"] < _BUDGETS[name][1]
    }
    assert not thin, (
        f"micro-batch structure changed (fewer batches than pinned):"
        f" {thin} — the lifecycle no longer exercises what it claims"
    )


def test_restart_is_machinery_only():
    data = _load()
    restart = data["lifecycles"]["dedup_restart_noinput"]
    full = data["lifecycles"]["dedup_file_sink"]
    # the restart does no data work; it must cost well under the full
    # lifecycle or exactly-once replay has started re-reading input
    assert restart["sec"] < full["sec"] / 2, (restart, full)
