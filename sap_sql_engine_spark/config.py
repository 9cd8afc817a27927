"""Config source (SURVEY §2.1 S10) — load/save of the engine's config.json.

Same contract as the reference's ``load_config``/``save_config``
(reference ``sap_sql_engine.py:41-67``): a JSON file next to the engine,
missing file -> defaults, atomic-enough overwrite on save. The Spark
rebuild adds the session knobs so one file describes a deployment.
"""

from __future__ import annotations

import json
import os

DEFAULT_CONFIG = {
    "sf_dir": "/root/testdata/sf0.001",
    "max_rows": 200,
    "server_port": 8080,
    "shuffle_partitions": None,  # None -> session default (cores)
    "model_path": None,  # None -> vendored in-package model assembly
    # LLM settings (reference config keys, sap_sql_engine.py:41-67)
    "anthropic_api_key": "",
    "model": "claude-sonnet-4-5-20250929",
}

CONFIG_PATH = os.path.join(os.path.dirname(os.path.dirname(__file__)), "config.json")


def load_config(path: str = CONFIG_PATH) -> dict:
    cfg = dict(DEFAULT_CONFIG)
    try:
        with open(path) as f:
            cfg.update(json.load(f))
    except FileNotFoundError:
        pass
    except json.JSONDecodeError:
        pass  # corrupt config falls back to defaults, like the reference
    return cfg


def save_config(cfg: dict, path: str = CONFIG_PATH) -> None:
    known = {k: v for k, v in cfg.items() if k in DEFAULT_CONFIG}
    with open(path, "w") as f:
        json.dump(known, f, indent=2)
