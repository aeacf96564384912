"""YAML configuration model.

Re-expresses the reference's config surface (reference:
config/config.go:14-66 — MainConfig{PluginSpec, Databases, MySQL}) as
dataclasses. The reference fills zero-valued pool fields with defaults
via reflection (config/config.go:54-88); dataclass defaults plus an
explicit zero-means-default normalization give identical semantics
(config/config_test.go:107-117 fixture: 0 -> 25/25/3600, explicit
values kept).

The pool knobs map onto Spark JDBC writer/reader options rather than a
client-side connection pool (Spark opens connections per partition
task): max_open_conns bounds writer numPartitions, batch size is the
JDBC `batchsize` option.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any, Optional

try:
    import yaml
except ImportError:  # pragma: no cover - pyyaml is available in this env
    yaml = None

DEFAULT_MAX_OPEN_CONNS = 25
DEFAULT_MAX_IDLE_CONNS = 25
DEFAULT_CONN_MAX_LIFETIME = 3600


@dataclass
class AuthConfig:
    username: str = ""
    password: str = ""


@dataclass
class PluginSpec:
    """reference: api_plugins/api_plugin.go:8-11 + config.yaml:2-8."""

    name: str = ""
    auth: AuthConfig = field(default_factory=AuthConfig)
    interval: int = 60
    fetch_workers: int = 1
    config: dict[str, Any] = field(default_factory=dict)


@dataclass
class ExtraDatabase:
    """reference: config/config.go:27-29 (tables per extra DB)."""

    tables: int = 1


@dataclass
class DatabasesConfig:
    """reference: config/config.go:14-21."""

    prefix: str = "auto_"
    table_prefix: str = "data"
    copies: int = 1
    extra: dict[str, ExtraDatabase] = field(default_factory=dict)
    write_workers: int = 5


@dataclass
class PoolConfig:
    """reference: config/config.go:31-38; zero means 'use default'
    (config/config.go:69-88)."""

    max_open_conns: int = 0
    max_idle_conns: int = 0
    conn_max_lifetime: int = 0

    def normalized(self) -> "PoolConfig":
        return PoolConfig(
            max_open_conns=self.max_open_conns or DEFAULT_MAX_OPEN_CONNS,
            max_idle_conns=self.max_idle_conns or DEFAULT_MAX_IDLE_CONNS,
            conn_max_lifetime=self.conn_max_lifetime or DEFAULT_CONN_MAX_LIFETIME,
        )


@dataclass
class TLSConfig:
    """reference: database/db_manager.go:60-113 (CA + client cert pair)."""

    enabled: bool = False
    ca_cert: Optional[str] = None
    client_cert: Optional[str] = None
    client_key: Optional[str] = None


@dataclass
class MySQLConfig:
    """reference: config/config.go:23-38 + DSN build database/db_manager.go:37-49."""

    host: str = "localhost"
    port: int = 3306
    username: str = ""
    password: str = ""
    pool: PoolConfig = field(default_factory=PoolConfig)
    tls: TLSConfig = field(default_factory=TLSConfig)

    def jdbc_url(self) -> str:
        params = ["useSSL=true"] if self.tls.enabled else []
        qs = ("?" + "&".join(params)) if params else ""
        return f"jdbc:mysql://{self.host}:{self.port}{qs}"


@dataclass
class MainConfig:
    """reference: config/config.go:62-66."""

    plugin_spec: PluginSpec = field(default_factory=PluginSpec)
    databases: DatabasesConfig = field(default_factory=DatabasesConfig)
    mysql: MySQLConfig = field(default_factory=MySQLConfig)


def _build(cls, data: dict[str, Any]):
    """Minimal nested-dataclass hydration (keys match field names)."""
    import dataclasses

    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in data:
            continue
        v = data[f.name]
        t = f.type if not isinstance(f.type, str) else None
        # resolve the concrete nested type from the default factory
        default = f.default_factory() if f.default_factory is not dataclasses.MISSING else None
        if dataclasses.is_dataclass(default) and isinstance(v, dict):
            kwargs[f.name] = _build(type(default), v)
        elif f.name == "extra" and isinstance(v, dict):
            kwargs[f.name] = {k: _build(ExtraDatabase, ev or {}) for k, ev in v.items()}
        else:
            kwargs[f.name] = v
    return cls(**kwargs)


def load_config(path: str) -> MainConfig:
    """Load + validate a YAML config file (reference: config/config.go:91-108)."""
    if yaml is None:  # pragma: no cover
        raise RuntimeError("pyyaml not available")
    with open(path) as f:
        raw = yaml.safe_load(f) or {}
    cfg = _build(MainConfig, raw)
    cfg.mysql.pool = cfg.mysql.pool.normalized()
    return cfg


def loads_config(text: str) -> MainConfig:
    if yaml is None:  # pragma: no cover
        raise RuntimeError("pyyaml not available")
    cfg = _build(MainConfig, yaml.safe_load(text) or {})
    cfg.mysql.pool = cfg.mysql.pool.normalized()
    return cfg
