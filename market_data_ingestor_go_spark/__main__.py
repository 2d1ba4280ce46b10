"""``python -m market_data_ingestor_go_spark`` — the binary twin.

The reference ships one binary: load .env, bootstrap, run until
SIGINT (cmd/app/main.go:22-87). This module is the same entry point
for the engine: env/.env config with the reference's variable names,
the full live stack via ``run_app``, block until interrupted.

Dimension tables come from env-pointed parquet paths (the engine's
catalog form of the reference's PG dims):

- ``SYMBOLS_DIM_PATH``   (required) parquet with (name, exchange)
- ``API_KEYS_PATH``      (optional) parquet api_keys → enables serving
- ``CLIENT_CONFIGS_PATH``(optional) parquet clients_configs
- ``ENGINE_BASE_DIR``    (default ./engine_state) checkpoint + sinks
- ``METRICS_PORT``       (default 9090, main.go:56)
"""

from __future__ import annotations

import os
import signal
import threading


def main(block: bool = True):
    from .app import load_config, run_app
    from .session import get_spark

    cfg = load_config()
    spark = get_spark("market_data_ingestor_go_spark")
    symbols_dim = spark.read.parquet(os.environ["SYMBOLS_DIM_PATH"])
    api_keys = (spark.read.parquet(os.environ["API_KEYS_PATH"])
                if os.environ.get("API_KEYS_PATH") else None)
    client_configs = (spark.read.parquet(os.environ["CLIENT_CONFIGS_PATH"])
                      if os.environ.get("CLIENT_CONFIGS_PATH") else None)
    handle = run_app(
        spark, cfg, os.environ.get("ENGINE_BASE_DIR", "./engine_state"),
        symbols_dim, api_keys=api_keys, client_configs=client_configs,
        metrics_port=int(os.environ.get("METRICS_PORT", "9090")))
    print(f"engine up: metrics at {handle.metrics_server.url}"
          + (f", serving at {handle.publisher.url}" if handle.publisher
             else ""))
    if not block:
        return handle

    stop = threading.Event()
    signal.signal(signal.SIGINT, lambda *_: stop.set())   # main.go:45
    signal.signal(signal.SIGTERM, lambda *_: stop.set())
    stop.wait()
    print("Shutting down...")                              # main.go:85
    handle.stop()
    spark.stop()
    return None


if __name__ == "__main__":
    main()
