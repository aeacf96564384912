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
    """reference: database/db_manager.go:60-113 — custom cert pool (CA
    file), client cert pair, InsecureSkipVerify, ServerName, registered
    as the DSN's ``tls=custom`` config. Re-expressed as MySQL
    Connector/J URL options (see ``MySQLConfig.jdbc_url``)."""

    enabled: bool = False
    ca_cert: Optional[str] = None
    client_cert: Optional[str] = None
    client_key: Optional[str] = None
    insecure_skip_verify: bool = False
    server_name: Optional[str] = None

    @property
    def active(self) -> bool:
        """Reference semantics (db_manager.go:60-63): TLS is on iff
        explicitly enabled OR any cert material is configured."""
        return bool(self.enabled or self.ca_cert or self.client_cert or self.client_key)


@dataclass
class MySQLConfig:
    """reference: config/config.go:23-38 + DSN build database/db_manager.go:37-49."""

    host: str = "localhost"
    port: int = 3306
    username: str = ""
    password: str = ""
    dbname: str = ""
    pool: PoolConfig = field(default_factory=PoolConfig)
    tls: TLSConfig = field(default_factory=TLSConfig)

    def jdbc_url(self) -> str:
        """Connector/J URL with the TLS mapping of the reference's
        custom tls.Config (db_manager.go:60-113):

        - CA file          -> sslMode=VERIFY_CA (VERIFY_IDENTITY when a
                              ServerName is pinned) + trustCertificateKeyStoreUrl
        - client cert pair -> clientCertificateKeyStoreUrl
        - InsecureSkipVerify -> sslMode=REQUIRED (encrypt, skip verify)
        - enabled, no certs  -> sslMode=REQUIRED
        """
        params: list[str] = []
        tls = self.tls
        if tls.active:
            if tls.insecure_skip_verify or not tls.ca_cert:
                ssl_mode = "REQUIRED"
            elif tls.server_name:
                ssl_mode = "VERIFY_IDENTITY"
            else:
                ssl_mode = "VERIFY_CA"
            params.append(f"sslMode={ssl_mode}")
            if tls.ca_cert and not tls.insecure_skip_verify:
                params.append(f"trustCertificateKeyStoreUrl=file:{tls.ca_cert}")
            if tls.client_cert and tls.client_key:
                params.append(f"clientCertificateKeyStoreUrl=file:{tls.client_cert}")
        qs = ("?" + "&".join(params)) if params else ""
        db = f"/{self.dbname}" if self.dbname else ""
        return f"jdbc:mysql://{self.host}:{self.port}{db}{qs}"


@dataclass
class MainConfig:
    """reference: config/config.go:62-66."""

    plugin_spec: PluginSpec = field(default_factory=PluginSpec)
    databases: DatabasesConfig = field(default_factory=DatabasesConfig)
    mysql: MySQLConfig = field(default_factory=MySQLConfig)


# Reference-format key names accepted as aliases (reference
# config/config.go yaml tags; TLSConfig has no tags, so go-yaml derives
# lowercased field names — both the documented *_file spelling and the
# actual lowercased one are accepted).
_KEY_ALIASES: dict[type, dict[str, str]] = {}


def _register_aliases() -> None:
    _KEY_ALIASES.update(
        {
            AuthConfig: {"user": "username", "pass": "password"},
            MySQLConfig: {"user": "username", "connection_pool": "pool", "tls_config": "tls"},
            TLSConfig: {
                "ca_file": "ca_cert",
                "cafile": "ca_cert",
                "cert_file": "client_cert",
                "certfile": "client_cert",
                "key_file": "client_key",
                "keyfile": "client_key",
                "insecureskipverify": "insecure_skip_verify",
                "servername": "server_name",
            },
        }
    )


_register_aliases()


def _build(cls, data: dict[str, Any], path: str = ""):
    """Nested-dataclass hydration: reference key names are accepted as
    aliases, and unrecognized keys RAISE — format drift fails loudly
    instead of yielding silently-default config (the reference's
    yaml.Unmarshal also ignores unknowns, but its fields carry explicit
    yaml tags; here the alias table plays that role)."""
    import dataclasses

    aliases = _KEY_ALIASES.get(cls, {})
    field_names = {f.name for f in dataclasses.fields(cls)}
    canonical: dict[str, Any] = {}
    for key, v in (data or {}).items():
        name = aliases.get(key, key)
        if name not in field_names:
            raise ValueError(
                f"unrecognized config key {path + key!r} for {cls.__name__} "
                f"(known: {sorted(field_names | set(aliases))})"
            )
        canonical[name] = v

    # reference plugin format nests auth/interval/fetch_workers inside
    # the opaque `config` map (api_plugins/api_plugin.go:8-11,
    # config.yaml plugin_spec.config.*) — hoist them into the typed
    # fields and keep the remainder opaque.
    if cls is PluginSpec and isinstance(canonical.get("config"), dict):
        nested = dict(canonical["config"])
        for hoist in ("auth", "interval", "fetch_workers"):
            if hoist in nested and hoist not in canonical:
                canonical[hoist] = nested.pop(hoist)
        canonical["config"] = nested

    kwargs = {}
    for f in dataclasses.fields(cls):
        if f.name not in canonical:
            continue
        v = canonical[f.name]
        # resolve the concrete nested type from the default factory
        default = f.default_factory() if f.default_factory is not dataclasses.MISSING else None
        if dataclasses.is_dataclass(default) and isinstance(v, dict):
            kwargs[f.name] = _build(type(default), v, path=f"{path}{f.name}.")
        elif f.name == "extra" and isinstance(v, dict):
            kwargs[f.name] = {
                k: _build(ExtraDatabase, ev or {}, path=f"{path}extra.{k}.") for k, ev in v.items()
            }
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
