"""Server entry point: `python -m typesense_tpu.server_main --data-dir ... --api-key ...`

Boot order mirrors run_server (/root/reference/src/typesense_server_utils.cpp:471):
config -> store -> managers.init(store) -> CollectionManager.load (startup
index rebuild from the doc store) -> HTTP serve.
"""

from __future__ import annotations

import sys

from typesense_tpu.api.auth import AuthManager
from typesense_tpu.api.http import HttpServer
from typesense_tpu.core.config import Config
from typesense_tpu.core.store import Store
from typesense_tpu.manager import CollectionManager
from typesense_tpu.utils.sysmetrics import AppMetrics


def make_server(argv: list[str] | None = None) -> HttpServer:
    cfg = Config.load(argv if argv is not None else sys.argv[1:])
    if not cfg.data_dir:
        print("Error: data_dir is required (--data-dir or TYPESENSE_DATA_DIR)",
              file=sys.stderr)
        raise SystemExit(1)
    if not cfg.api_key:
        print("Error: api_key is required (--api-key or TYPESENSE_API_KEY)",
              file=sys.stderr)
        raise SystemExit(1)

    store = Store(cfg.data_dir + "/db")
    meta_store = Store(cfg.data_dir + "/meta")
    manager = CollectionManager(store)
    manager.load()
    auth = AuthManager(meta_store, bootstrap_key=cfg.api_key)
    auth.load()
    server = HttpServer(manager, auth, host=cfg.api_address, port=cfg.api_port,
                        num_threads=min(cfg.thread_pool_size, 64))
    server.metrics = AppMetrics()
    server.skip_writes = cfg.skip_writes
    server.meta_store = meta_store
    server.config = cfg
    from typesense_tpu.analytics import AnalyticsManager
    from typesense_tpu.ratelimit import RateLimitManager
    server.analytics = AnalyticsManager(meta_store, manager)
    server.analytics.load()
    server.ratelimits = RateLimitManager(meta_store)
    server.ratelimits.load()
    from typesense_tpu.models.llm import (
        ConversationModelManager, NLSearchModelManager,
        PersonalizationModelManager,
    )
    server.conv_models = ConversationModelManager(meta_store, manager)
    server.conv_models.load()
    server.nl_models = NLSearchModelManager(meta_store)
    server.nl_models.load()
    server.pers_models = PersonalizationModelManager(meta_store,
                                                     manager.embedders)
    server.pers_models.load()
    manager.stemmers.load()

    # boot-time shape precompile (background): the common kernel grid
    # compiles while the server is already serving, so first real queries
    # hit warm programs instead of ~40 s tunnel compiles
    import threading

    def _precompile():
        import time as _t
        for name in list(manager.collections):
            try:
                coll = manager.get_collection(name)
            except Exception:  # noqa: BLE001
                continue
            took = coll.warmup(log=lambda m: print(f"[precompile] {m}",
                                                   flush=True))
            if took:
                print(f"[precompile] {name} done in {took:.1f}s", flush=True)
    if cfg.data_dir:
        threading.Thread(target=_precompile, daemon=True).start()

    def _housekeeping():
        import time as _t
        interval = max(min(cfg.analytics_flush_interval, 3600), 10)
        while True:
            _t.sleep(interval)
            try:
                repl = server.replication
                if repl is None or repl.is_leader:
                    # followers never flush locally; replicated doc ops +
                    # the flush op clear their buffers (leader-driven)
                    from typesense_tpu.api.handlers import do_analytics_flush
                    do_analytics_flush(server)
                    if repl is not None and repl.is_leader:
                        repl.log_write({"method": "POST",
                                        "path": "/analytics/flush",
                                        "query": {}, "body": ""})
            except Exception:  # noqa: BLE001 — destination may not exist yet
                pass
            try:
                now = _t.time()
                for key in list(auth.keys.values()):
                    if getattr(key, "autodelete", False) and \
                            key.expires_at < now:
                        auth.delete_key(key.id)
            except Exception:  # noqa: BLE001
                pass
    threading.Thread(target=_housekeeping, daemon=True).start()

    # clustering (raft_server.h equivalent): --nodes file of host:port peers
    if cfg.nodes:
        from typesense_tpu.parallel.replication import NodesFile, ReplicationState
        nf = NodesFile(path=cfg.nodes if "/" in cfg.nodes else None,
                       inline=None if "/" in cfg.nodes else cfg.nodes)
        def _reload_after_snapshot():
            # in-memory index state is derived; rebuild from the replaced
            # stores (on_snapshot_load -> init_db -> CollectionManager::load)
            manager.collections.clear()
            manager.aliases.clear()
            manager.presets.clear()
            manager.load()
            auth.keys.clear()
            auth.load()
            server.analytics.load()
            server.ratelimits.load()

        repl = ReplicationState(
            meta_store, server.apply_replicated, nf,
            (cfg.api_address if cfg.api_address != "0.0.0.0" else "127.0.0.1",
             cfg.api_port), api_key=cfg.api_key,
            healthy_read_lag=cfg.healthy_read_lag,
            healthy_write_lag=cfg.healthy_write_lag,
            data_store=store, reload_fn=_reload_after_snapshot)
        repl.refresh_leader()
        repl.run_loop()
        server.replication = repl
    return server


def main():
    server = make_server()
    print(f"typesense-tpu {sys.version.split()[0]} listening on "
          f"{server.host}:{server.port}")
    server.run()


if __name__ == "__main__":
    main()
