"""CLI entrypoint — the ``ray job submit`` surface (north_rule):

  ray job submit -- python -m azure_blob_crawler_ray crawl \\
      --universe 2000000 --hosts 1000 --waves 2 --budget 300000 \\
      --out /data/crawl_run1

Subcommands:
  crawl    run the wave loop (resumes from the out dir's checkpoint)
  ingest   run parse->chunk->embed->index over a parquet blob table
  bench    print the headline crawl throughput line
  serve    the reference's HTTP surface (/health /ready /process
           /webhook) over a parquet blob table

Owns a Ray session only when none exists (``ray job submit`` runs the
driver inside the cluster; local invocation initialises local mode)."""

from __future__ import annotations

import argparse
import json
import sys


def _ensure_ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="auto" if _in_cluster() else "local", include_dashboard=False)
    import ray.data

    ray.data.DataContext.get_current().enable_progress_bars = False
    return ray


def _in_cluster() -> bool:
    import os

    return bool(os.environ.get("RAY_ADDRESS") and os.environ["RAY_ADDRESS"] != "local")


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(prog="azure_blob_crawler_ray")
    sub = ap.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("crawl", help="run the crawl wave loop")
    c.add_argument("--universe", type=int, default=100_000)
    c.add_argument("--hosts", type=int, default=200)
    c.add_argument("--waves", type=int, default=3)
    c.add_argument("--budget", type=int, default=30_000)
    c.add_argument("--host-cap", type=int, default=512)
    c.add_argument("--seeds-per-host", type=int, default=4)
    c.add_argument("--wave-ms", type=int, default=600_000)
    c.add_argument("--seed", type=int, default=42)
    c.add_argument("--out", required=True)
    c.add_argument("--emit-index", action="store_true")
    c.add_argument("--no-faults", action="store_true")

    i = sub.add_parser("ingest", help="parse->chunk->embed->index a blob table")
    i.add_argument("--input", required=True, help="parquet dir/file with blob_name,payload[,url]")
    i.add_argument("--out", required=True)
    i.add_argument("--embed-dim", type=int, default=64)

    sub.add_parser("bench", help="headline crawl throughput (one JSON line)")

    m = sub.add_parser(
        "merge-index",
        help="compact an incremental index's run dirs (MinHash dedup / "
        "persisted IVF) into one merged run",
    )
    m.add_argument("--uri", required=True, help="index root directory")

    s = sub.add_parser("serve", help="HTTP surface over a parquet blob table")
    s.add_argument("--input", required=True,
                   help="parquet dir/file with blob_name,payload columns")
    s.add_argument("--host", default="127.0.0.1")
    s.add_argument("--port", type=int, default=8080)
    s.add_argument("--embed-dim", type=int, default=64)

    args = ap.parse_args(argv)
    if args.cmd == "serve":
        # the serving surface is single-blob request/response — no Ray
        # session needed; blobs come from the parquet table
        return _serve_cmd(args)
    ray = _ensure_ray()

    if args.cmd == "crawl":
        from .config import CrawlConfig
        from .pipelines.crawl import run_crawl

        cfg = CrawlConfig(
            universe=args.universe,
            n_hosts=args.hosts,
            max_waves=args.waves,
            wave_budget=args.budget,
            max_fetches_per_host_per_wave=args.host_cap,
            seeds_per_host=args.seeds_per_host,
            wave_duration_ms=args.wave_ms,
            seed=args.seed,
            out_dir=args.out,
            emit_index=args.emit_index,
            inject_faults=not args.no_faults,
        )
        res = run_crawl(cfg)
        print(json.dumps({"waves_run": res.waves_run, "metrics": res.metrics}))
    elif args.cmd == "ingest":
        import ray.data

        from .pipelines.ingest import ingest
        from .storage import write_table

        blobs = ray.data.read_parquet(args.input)
        write_table(ingest(blobs, embed_dim=args.embed_dim), args.out)
        print(json.dumps({"out": args.out}))
    elif args.cmd == "bench":
        import os

        from bench import run_crawl_bench  # repo-root bench harness

        print(json.dumps(run_crawl_bench(int(ray.cluster_resources().get("CPU", 8)))))
    elif args.cmd == "merge-index":
        from .storage import merge_runs

        print(json.dumps(merge_runs(args.uri)))
    return 0


def _serve_cmd(args) -> int:
    import pyarrow.parquet as pq

    from .serving import ApiHandlers, ProcessorCore, serve

    t = pq.read_table(args.input, columns=["blob_name", "payload"])
    store = dict(zip(t["blob_name"].to_pylist(), t["payload"].to_pylist()))

    def fetch(blob_name: str, container: str) -> bytes:
        try:
            return store[blob_name]
        except KeyError:
            raise FileNotFoundError(f"BlobNotFound: {container}/{blob_name}")

    handlers = ApiHandlers(ProcessorCore(fetch_fn=fetch, embed_dim=args.embed_dim))
    server = serve(handlers, host=args.host, port=args.port)
    print(json.dumps({"listening": f"http://{args.host}:{server.server_address[1]}"}))
    try:
        server.serve_forever()
    except KeyboardInterrupt:
        server.shutdown()
    return 0


if __name__ == "__main__":
    sys.exit(main())
