"""301-redirect semantics: a redirecting URL is a fetch (crawl order)
but not a document; its Location target enters the frontier at depth+1
through the same explode -> seen anti-join path as in-content links.
Engine must equal oracle/frontier_sim with redirect_every on, and the
default (off) digests must be untouched."""

from __future__ import annotations

import shutil

import numpy as np
import pytest

from azure_blob_crawler_ray.config import CrawlConfig
from azure_blob_crawler_ray import synth
from azure_blob_crawler_ray.oracle.frontier_sim import simulate_crawl
from azure_blob_crawler_ray.pipelines.crawl import (
    read_crawl_order,
    read_dead_letter,
    read_documents,
    run_crawl,
)
from azure_blob_crawler_ray.storage import read_table_arrow


def _raw_docs(out_dir, waves):
    import os

    import pyarrow as pa

    return pa.concat_tables(
        read_table_arrow(os.path.join(out_dir, "documents", f"wave-{w:04d}"))
        for w in waves
    ).to_pandas()


def _cfg(out, **kw):
    base = dict(
        universe=1200,
        n_hosts=12,
        max_waves=3,
        wave_budget=250,
        max_fetches_per_host_per_wave=48,
        seeds_per_host=2,
        out_dir=out,
        emit_index=False,
        redirect_every=5,
    )
    base.update(kw)
    return CrawlConfig(**base)


@pytest.fixture(scope="module")
def run_pair():
    out = "/tmp/abc_test_redirects"
    shutil.rmtree(out, ignore_errors=True)
    cfg = _cfg(out)
    return cfg, run_crawl(cfg), simulate_crawl(cfg)


def test_redirect_crawl_order_and_digest(run_pair):
    cfg, r, sim = run_pair
    order = read_crawl_order(cfg.out_dir, r.waves_run).to_pandas()
    assert list(zip(order["wave"], order["url"])) == [
        (w, u) for (w, _ms, u) in sim.order
    ]
    assert np.array_equal(r.seen_digest, sim.seen_digest)


def test_redirect_metrics_match_and_fire(run_pair):
    _cfg_, r, sim = run_pair
    eng = [m["redirected"] for m in r.metrics]
    ref = [m["redirected"] for m in sim.metrics]
    assert eng == ref
    assert sum(eng) > 0  # the config must actually exercise redirects


def test_redirects_never_dead_letter_or_document(run_pair):
    cfg, r, sim = run_pair
    dl = read_dead_letter(cfg.out_dir, r.waves_run).to_pandas()
    assert not (dl["status"] == 301).any()
    docs = _raw_docs(cfg.out_dir, r.waves_run)
    redirected = docs[docs["status"] == 301]
    assert len(redirected) == sum(m["redirected"] for m in r.metrics)
    assert redirected["skipped"].all()
    # documents proper (read_documents drops skipped) match the sim
    assert read_documents(cfg.out_dir, r.waves_run).num_rows == len(sim.documents)


def test_redirect_target_reachable(run_pair):
    cfg, r, sim = run_pair
    # at least one redirect target that was never linked otherwise must
    # have been fetched in a later wave — proves the 301 target actually
    # feeds the frontier
    order = read_crawl_order(cfg.out_dir, r.waves_run).to_pandas()
    fetched = set(order["url"])
    docs = _raw_docs(cfg.out_dir, r.waves_run)
    rdocs = docs[docs["status"] == 301]
    uids = np.array(
        [int(u.rsplit("/", 1)[1].split(".")[0]) for u in rdocs["url"]], dtype=np.int64
    )
    targets = synth.urls_for(synth.redirect_target_uids(uids, cfg), cfg)[0]
    assert any(t in fetched for t in targets)


def test_redirect_mask_off_is_all_false():
    cfg = CrawlConfig(out_dir="/tmp/unused", redirect_every=0)
    uids = np.arange(1000, dtype=np.int64)
    assert not synth.redirect_mask(uids, cfg).any()
    cfg5 = CrawlConfig(out_dir="/tmp/unused", redirect_every=5)
    frac = synth.redirect_mask(uids, cfg5).mean()
    assert 0.1 < frac < 0.3  # ~1/5 of the universe
    t = synth.redirect_target_uids(uids, cfg5)
    assert (t != uids).all() and (t >= 0).all() and (t < cfg5.universe).all()


def test_max_depth_caps_frontier():
    out = "/tmp/abc_test_maxdepth"
    shutil.rmtree(out, ignore_errors=True)
    cfg = _cfg(out, redirect_every=0, max_depth=1, max_waves=3)
    r = run_crawl(cfg)
    sim = simulate_crawl(cfg)
    order = read_crawl_order(cfg.out_dir, r.waves_run).to_pandas()
    assert list(zip(order["wave"], order["url"])) == [
        (w, u) for (w, _ms, u) in sim.order
    ]
    assert np.array_equal(r.seen_digest, sim.seen_digest)
    docs = _raw_docs(cfg.out_dir, r.waves_run)
    assert (docs["depth"] <= 1).all()
    assert (docs["depth"] == 1).any()  # depth-1 links were crawled
    assert sorted(sim.final_frontier) == sorted(
        read_table_arrow(
            f"{out}/ckpt/wave-{r.waves_run[-1]:04d}/frontier"
        ).to_pandas()["url"]
    )
