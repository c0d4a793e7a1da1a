"""Server configuration.

Behavior contract: /root/reference/include/tsconfig.h + src/main/
typesense_server.cpp:194-197 — precedence env (TYPESENSE_*) < ini config
file < CLI args; ~60 options, dashes in CLI map to underscores, env vars are
TYPESENSE_UPPER_SNAKE.
"""

from __future__ import annotations

import argparse
import configparser
import os

OPTIONS: dict[str, dict] = {
    # name: {type, default, help}
    "data_dir": {"type": str, "default": "", "help": "Directory for state"},
    "api_key": {"type": str, "default": "", "help": "Bootstrap admin API key"},
    "api_address": {"type": str, "default": "0.0.0.0"},
    "api_port": {"type": int, "default": 8108},
    "peering_address": {"type": str, "default": ""},
    "peering_port": {"type": int, "default": 8107},
    "nodes": {"type": str, "default": ""},
    "log_dir": {"type": str, "default": ""},
    "ssl_certificate": {"type": str, "default": ""},
    "ssl_certificate_key": {"type": str, "default": ""},
    "ssl_refresh_interval_seconds": {"type": int, "default": 8 * 60 * 60},
    "enable_cors": {"type": bool, "default": True},
    "cors_domains": {"type": str, "default": ""},
    "thread_pool_size": {"type": int, "default": max(8, (os.cpu_count() or 4) * 8)},
    "num_collections_parallel_load": {"type": int, "default": (os.cpu_count() or 4) * 4},
    "num_documents_parallel_load": {"type": int, "default": 1000},
    "cache_num_entries": {"type": int, "default": 1000},
    "snapshot_interval_seconds": {"type": int, "default": 3600},
    "snapshot_max_byte_count_per_rpc": {"type": int, "default": 4194304},
    "healthy_read_lag": {"type": int, "default": 1000},
    "healthy_write_lag": {"type": int, "default": 500},
    "log_slow_requests_time_ms": {"type": int, "default": -1},
    "log_slow_searches_time_ms": {"type": int, "default": 30000},
    "max_per_page": {"type": int, "default": 250},
    "reset_peers_on_error": {"type": bool, "default": False},
    "skip_writes": {"type": bool, "default": False},
    "memory_used_max_percentage": {"type": int, "default": 100},
    "disk_used_max_percentage": {"type": int, "default": 100},
    "filter_by_max_ops": {"type": int, "default": 100},
    "max_candidates": {"type": int, "default": 4},
    "enable_search_analytics": {"type": bool, "default": False},
    "analytics_flush_interval": {"type": int, "default": 3600},
    "analytics_dir": {"type": str, "default": ""},
    "model_dir": {"type": str, "default": ""},
}


class Config:
    _instance = None

    def __init__(self):
        for name, spec in OPTIONS.items():
            setattr(self, name, spec["default"])

    @classmethod
    def get_instance(cls) -> "Config":
        if cls._instance is None:
            cls._instance = cls()
        return cls._instance

    def _coerce(self, name: str, value):
        t = OPTIONS[name]["type"]
        if t is bool and isinstance(value, str):
            return value.lower() in ("true", "1", "yes")
        return t(value)

    def load_env(self):
        for name in OPTIONS:
            env = "TYPESENSE_" + name.upper()
            if env in os.environ:
                setattr(self, name, self._coerce(name, os.environ[env]))

    def load_file(self, path: str):
        cp = configparser.ConfigParser()
        cp.read(path)
        if "server" in cp:
            for name in OPTIONS:
                key = name.replace("_", "-")
                if key in cp["server"]:
                    setattr(self, name, self._coerce(name, cp["server"][key]))
                elif name in cp["server"]:
                    setattr(self, name, self._coerce(name, cp["server"][name]))

    def load_args(self, argv: list[str]):
        p = argparse.ArgumentParser(prog="typesense-tpu-server", add_help=True)
        p.add_argument("--config", default="")
        for name, spec in OPTIONS.items():
            flag = "--" + name.replace("_", "-")
            if spec["type"] is bool:
                p.add_argument(flag, default=None)
            else:
                p.add_argument(flag, type=spec["type"], default=None,
                               help=spec.get("help", ""))
        ns, _rest = p.parse_known_args(argv)
        if ns.config:
            self.load_file(ns.config)
        for name in OPTIONS:
            v = getattr(ns, name, None)
            if v is not None:
                setattr(self, name, self._coerce(name, v))
        return self

    @classmethod
    def load(cls, argv: list[str] | None = None) -> "Config":
        """env < config file < CLI (typesense_server.cpp:194-197)."""
        cfg = cls.get_instance()
        cfg.__init__()   # reset to defaults: options from a previous
        # make_server (e.g. --nodes in a multi-server test process) must not
        # leak into this load
        cfg.load_env()
        cfg.load_args(argv or [])
        return cfg
