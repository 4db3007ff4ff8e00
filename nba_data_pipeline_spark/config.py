"""SRC9: config/env resolution chain.

The reference resolves runtime settings (credentials, output dirs, league
parameters) through a precedence chain — CLI argument, then environment
variable, then ``config.json``, then a built-in default
(ctg_export_league.py:96-101,633-641). This module is the engine-side
restatement: one resolved, typed dict that feeds ``session.get_spark``'s
``extra_conf`` and the readers' options. No secrets are ever baked in —
exactly like the reference, values arrive from the operator's environment.

Precedence (highest wins): explicit ``cli`` dict > ``$SPARK_GRAFT_<KEY>``
env vars > JSON config file > ``DEFAULTS``.
"""

from __future__ import annotations

import json
import os

ENV_PREFIX = "SPARK_GRAFT_"

# Every knob the engine reads, with its parsed type and default. Adding a
# key here is all that's needed for it to participate in the full chain.
DEFAULTS: dict[str, object] = {
    "sf_dir": "/root/testdata/sf0.1",  # input table directory
    "cpus": 0,  # 0 = all cores (session.py resolves)
    "shuffle_partitions": 0,  # 0 = match cpus
    "sink_mode": "combined",  # SNK3: combined | by_key
    "output_dir": "",  # sink root ("" = caller must supply)
    "checkpoint_dir": "",  # streaming checkpoint root
}


def _coerce(key: str, raw: str) -> object:
    """Parse a string (env/file) value to the type of the key's default."""
    default = DEFAULTS[key]
    if isinstance(default, bool):
        return raw.strip().lower() in ("1", "true", "yes", "on")
    if isinstance(default, int):
        return int(raw)
    return raw


def resolve_config(
    cli: dict[str, object] | None = None,
    config_path: str | None = None,
    env: dict[str, str] | None = None,
) -> dict[str, object]:
    """Resolve every known key through the CLI > env > file > default chain.

    ``env`` defaults to ``os.environ`` (injectable for tests). Unknown keys
    in ``cli`` or the config file are rejected loudly — a typo'd setting
    silently falling back to a default is the failure mode the reference's
    chain suffers from, and the engine refuses to reproduce it.
    """
    env = os.environ if env is None else env
    from_file: dict[str, object] = {}
    if config_path and os.path.exists(config_path):
        with open(config_path, encoding="utf-8") as fh:
            from_file = json.load(fh)

    for source_name, source in (("cli", cli or {}), ("config file", from_file)):
        unknown = sorted(set(source) - set(DEFAULTS))
        if unknown:
            raise ValueError(f"unknown config keys from {source_name}: {unknown}")

    resolved: dict[str, object] = {}
    for key, default in DEFAULTS.items():
        if cli and key in cli:
            resolved[key] = cli[key]
        elif (raw := env.get(ENV_PREFIX + key.upper())) is not None:
            resolved[key] = _coerce(key, raw)
        elif key in from_file:
            resolved[key] = from_file[key]
        else:
            resolved[key] = default
    return resolved


def session_kwargs(cfg: dict[str, object]) -> dict[str, object]:
    """The subset of a resolved config that ``session.get_spark`` accepts."""
    out: dict[str, object] = {}
    if cfg.get("cpus"):
        out["cpus"] = cfg["cpus"]
    if cfg.get("shuffle_partitions"):
        out["shuffle_partitions"] = cfg["shuffle_partitions"]
    return out
