"""Engine configuration — the flock.toml / FLOCK_CONF analogue.

Reference: flock/src/configs/{flock.rs,mod.rs,flock.toml} — a compiled-in TOML
exposed as typed lazy globals (granule sizes, concurrency, thresholds).  Here:
a frozen dataclass with the same knobs (TPU-flavored), loadable from a TOML
file and overridable via FLOCK_TPU_* environment variables.
"""

from __future__ import annotations

import os
import tomllib
from dataclasses import dataclass, fields, replace


@dataclass(frozen=True)
class EngineConfig:
    # data plane (granule analogues: flock.toml:59-61 sync/async payload rows)
    sync_granule: int = 74_304        # rows per host→device feed slice
    async_granule: int = 3_096
    # execution
    target_partitions: int = 8        # default mesh width (flock.toml:113)
    agg_span_margin: int = 8_192      # dense-key span headroom (generator striping)
    join_span_margin: int = 8_192
    capacity_round: int = 128         # batch capacity rounding (tile-aligned)
    # windows (per-query defaults mirror create_nexmark_source)
    session_gap_s: int = 10
    ptime_window_s: int = 10
    # fault tolerance
    max_retries: int = 200            # aws/lambda.rs:104 invoke retry budget
    state_dir: str = "/tmp/flock_tpu_state"
    # persistence codec (encoding.rs Encoding analogue):
    # zstd (reference default) | zlib | lz4 | snappy | none
    payload_codec: str = "zstd"
    # bench
    events_per_second: int = 10_000
    seconds: int = 10


def load_config(path: str | None = None) -> EngineConfig:
    cfg = EngineConfig()
    if path and os.path.exists(path):
        with open(path, "rb") as f:
            data = tomllib.load(f)
        known = {f.name for f in fields(EngineConfig)}
        cfg = replace(cfg, **{k: v for k, v in data.items() if k in known})
    env_over = {}
    for f in fields(EngineConfig):
        v = os.environ.get(f"FLOCK_TPU_{f.name.upper()}")
        if v is not None:
            env_over[f.name] = type(getattr(cfg, f.name))(v)
    return replace(cfg, **env_over) if env_over else cfg


CONFIG = load_config(os.environ.get("FLOCK_TPU_CONFIG"))
