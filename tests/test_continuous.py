"""Continuous-crawl composition: crawl -> incremental dedup ->
persisted-IVF append -> merge_runs across 3 epochs of an evolving web,
with a kill in the most adversarial window (dedup append committed, no
verdicts, no IVF run, no epoch marker) — the resumed run must converge
to the same final verdicts and ANN results as the uninterrupted run."""

from __future__ import annotations

import os
from dataclasses import replace

import pandas as pd
import pytest

from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray.pipelines import continuous, incdedup
from azure_blob_crawler_ray.pipelines.crawl import run_crawl
from azure_blob_crawler_ray.storage import committed_runs

CFG = CrawlConfig(
    universe=1500,
    n_hosts=10,
    max_waves=2,
    wave_budget=300,
    max_fetches_per_host_per_wave=48,
    seeds_per_host=2,
    emit_index=False,
    inject_faults=False,
    change_every=3,  # ~1/3 of content changes each epoch
    out_dir="",  # per-epoch dirs are derived from state_dir
)
EPOCHS = 3


def _run(state_dir: str) -> continuous.ContinuousResult:
    return continuous.continuous_crawl(
        CFG, state_dir, epochs=EPOCHS, num_shards=8, num_centroids=8
    )


def _verdicts(state_dir: str) -> pd.DataFrame:
    return (
        continuous.continuous_verdicts(state_dir, EPOCHS)
        .to_pandas()
        .sort_values(["epoch", "doc_id"])
        .reset_index(drop=True)
    )


def _search(state_dir: str) -> pd.DataFrame:
    return (
        continuous.continuous_search(CFG, state_dir, num_queries=6, k=10)
        .to_pandas()
        .sort_values(["query_id", "rank"])
        .reset_index(drop=True)
    )


@pytest.fixture(scope="module")
def oneshot(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("cont") / "oneshot")
    res = _run(d)
    return d, res


def test_three_epochs_accumulate(oneshot):
    d, res = oneshot
    assert res.epochs_run == [0, 1, 2] and res.epochs_skipped == []
    v = _verdicts(d)
    assert sorted(v["epoch"].unique()) == [0, 1, 2]
    # unchanged re-crawls are caught against PRIOR epochs: exact-content
    # dups at est 1.0 whose keeper lives in an earlier epoch namespace
    import numpy as np

    later = v[v["epoch"] > 0]
    dup_epoch = later["dup_of"].to_numpy(np.int64) >> 28
    cross = later[
        later["is_dup"].to_numpy() & (dup_epoch < later["epoch"].to_numpy())
    ]
    assert len(cross) > 0, "no cross-epoch dups — evolving web broken"
    assert (cross["est_jaccard"] == 1.0).any()
    # the evolving web also yields genuinely new docs each epoch
    assert (~later["is_dup"]).any()
    # compaction ran after epoch 1 and epoch 2 appended on top of it:
    # exactly [run-0002, run-merged-*] remain committed
    runs = [os.path.basename(r) for r in committed_runs(os.path.join(d, "dedup_index"))]
    assert len(runs) == 2 and any(r.startswith("run-merged-") for r in runs)
    assert len(res.compactions) == 1


def test_kill_and_resume_equals_oneshot(oneshot, tmp_path):
    d_one, _ = oneshot
    d = str(tmp_path / "resumed")
    # epochs 0 and 1 complete (incl. the compaction after epoch 1) ...
    continuous.continuous_crawl(
        CFG, d, epochs=2, num_shards=8, num_centroids=8
    )
    # ... then the driver dies mid-epoch-2, in the worst window: the
    # crawl ran and the dedup append COMMITTED, but verdicts, the IVF
    # run, and the epoch marker never landed
    ecfg = replace(
        CFG, content_epoch=2, out_dir=os.path.join(d, "epoch-0002", "crawl")
    )
    run_crawl(ecfg)
    waves = sorted(
        int(w.split("-")[1])
        for w in os.listdir(os.path.join(ecfg.out_dir, "documents"))
    )
    docs = continuous._epoch_docs(ecfg.out_dir, waves, 2)
    incdedup.minhash_index_append(
        os.path.join(d, "dedup_index"), "0002", docs, num_shards=8
    )
    assert not os.path.exists(
        os.path.join(d, "epoch-0002", continuous._EPOCH_OK)
    )

    # resume: epochs 0/1 skipped, epoch 2 redone idempotently
    res = _run(d)
    assert res.epochs_skipped == [0, 1] and res.epochs_run == [2]
    pd.testing.assert_frame_equal(_verdicts(d_one), _verdicts(d))
    pd.testing.assert_frame_equal(_search(d_one), _search(d))


def test_rerun_is_noop(oneshot):
    d, _ = oneshot
    res = _run(d)
    assert res.epochs_run == [] and res.epochs_skipped == [0, 1, 2]
