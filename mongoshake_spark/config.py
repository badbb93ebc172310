"""M5 — pipeline configuration with cross-option validation.

Reference: cmd/collector/sanitize.go (482 lines of option cross-checks and
defaulting over conf/collector.conf). The Spark engine needs far fewer
knobs — most reference options (queue depths, worker counts, serializer
threads) collapse into Spark scheduling — but the surviving surface keeps
the same semantics and the same validation failures.
"""

from __future__ import annotations

from dataclasses import dataclass, field


class ConfigError(ValueError):
    pass


@dataclass
class SyncConfig:
    """The engine's option surface (reference option in parens).

    sync_mode           (sync_mode = all|full|incr, conf/collector.conf:56)
    batch_rows          (incr_sync.adaptive.batching_max_size, :290)
    files_per_trigger   (incr_sync.fetch/worker admission; B7 rate limit)
    shard_key           (incr_sync.shard_key = auto|id|collection, :266)
    workers             (incr_sync.worker, :270)
    ns_whitelist/blacklist (filter.namespace.white/black, :120-125)
    gids                (oplog.gids, :108)
    ddl_enable          (filter.ddl_enable, :131)
    target_delay_sec    (incr_sync.target_delay, :283)
    checkpoint_interval_ms (checkpoint.interval, sanitize.go:148-149)
    txn_timeout_ms      (txn buffer TTL — our addition; None = no eviction)
    """

    sync_mode: str = "all"
    batch_rows: int = 1024
    files_per_trigger: int = 1
    shard_key: str = "auto"
    workers: int = 8
    ns_whitelist: tuple = ()
    ns_blacklist: tuple = ()
    gids: tuple = ()
    ddl_enable: bool = True
    target_delay_sec: int = 0
    checkpoint_interval_ms: int = 5000
    txn_timeout_ms: int | None = None

    def validate(self) -> "SyncConfig":
        """Cross-option checks, mirroring sanitize.go's rules that still
        apply to the Spark engine."""
        if self.sync_mode not in ("all", "full", "incr"):
            raise ConfigError(f"sync_mode must be all|full|incr, got {self.sync_mode!r}")
        if self.shard_key not in ("auto", "id", "collection"):
            raise ConfigError(f"shard_key must be auto|id|collection, got {self.shard_key!r}")
        if self.workers < 1:
            raise ConfigError("workers must be >= 1")
        if self.batch_rows < 1:
            raise ConfigError("batch_rows must be >= 1")
        if self.files_per_trigger < 1:
            raise ConfigError("files_per_trigger must be >= 1")
        if self.target_delay_sec < 0:
            raise ConfigError("target_delay_sec must be >= 0")
        # sanitize.go: gid filtering requires namespace filtering off for
        # DDL correctness; we keep the weaker, still-true invariant:
        if set(self.ns_whitelist) & set(self.ns_blacklist):
            raise ConfigError("namespace white and black lists overlap")
        if self.gids and not self.ddl_enable:
            # reference: gid replication cannot drop DDL silently
            raise ConfigError("gid filtering requires ddl_enable=true")
        if self.checkpoint_interval_ms < 100:
            raise ConfigError("checkpoint_interval_ms too small (<100ms)")
        return self
