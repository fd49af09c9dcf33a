"""Run-config model — the "query language" of the engine.

The reference's query language is a YAML config deserialized by serde into
RavenConfig (config.rs:18-35, raven_request.rs:8-30) with strict type
checking (raven_request.rs:36-91 accepts scalar/array/object nodes,
rejects everything else). We mirror that as dataclasses + a strict
validator. Defaults match the reference exactly:

- timeout_s   = 1   (raven_request.rs:32-34)
- max_retry   = 0   (raven_request.rs:25-26; attempts = max_retry + 1)
- max_threads = 1   (config.rs:37-39) -> here `parallelism`, which on
  Spark means "politeness budget x partitions", not a thread pool
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Any

try:  # yaml is optional in the sandbox; dict-configs always work
    import yaml  # type: ignore
except ImportError:  # pragma: no cover
    yaml = None


class ConfigError(ValueError):
    """Strict-parse failure, analogous to a serde type error."""


VarMaps = list[dict[str, list[str]]]


def _as_value_list(node: Any, key: str) -> list[str]:
    """serde-equivalent of raven_request.rs:36-91: accept scalar or array
    of scalars; reject maps/None/nested arrays."""
    if isinstance(node, (str, int, float, bool)):
        return [str(node).lower() if isinstance(node, bool) else str(node)]
    if isinstance(node, list):
        out: list[str] = []
        for v in node:
            if not isinstance(v, (str, int, float, bool)):
                raise ConfigError(f"var/param {key!r}: list values must be scalars, got {type(v).__name__}")
            out.append(str(v).lower() if isinstance(v, bool) else str(v))
        return out
    raise ConfigError(f"var/param {key!r}: expected scalar or array, got {type(node).__name__}")


def _parse_var_maps(node: Any, what: str) -> VarMaps:
    if node is None:
        return []
    if isinstance(node, dict):  # single map accepted like a 1-list
        node = [node]
    if not isinstance(node, list):
        raise ConfigError(f"{what}: expected list of maps, got {type(node).__name__}")
    out: VarMaps = []
    for m in node:
        if not isinstance(m, dict):
            raise ConfigError(f"{what}: list elements must be maps, got {type(m).__name__}")
        out.append({str(k): _as_value_list(v, str(k)) for k, v in m.items()})
    return out


@dataclass(frozen=True)
class PersistMethod:
    """Sink spec (persist_method.rs:7-17). kind: 'local_file' | 's3' |
    'parquet' | 'iceberg' (the last two are Spark-native additions —
    the engine's default sinks are table appends, see sources/catalog.py)."""

    kind: str
    path: str  # file_path / object_key / table path
    region: str | None = None
    bucket: str | None = None


NOTIFY_LEVELS = ("trace", "debug", "info", "warn", "error")  # logger.rs LogLevel


@dataclass(frozen=True)
class NotifyMethod:
    """Notify sink spec (notify_method.rs:8-15): where run events go.
    ``level`` is an EXACT-match filter — a method fires only for events
    of its own level (instances.rs:93-100), so level=error means
    'failures only' and level=info means 'completions only'."""

    kind: str  # 'slack'
    url: str
    channel: str
    mention: str | None = None
    level: str = "info"

    def __post_init__(self) -> None:
        if self.level not in NOTIFY_LEVELS:
            raise ConfigError(f"notify level must be one of {NOTIFY_LEVELS}, got {self.level!r}")


@dataclass(frozen=True)
class RavenRequest:
    """raven_request.rs:8-30."""

    url: str
    method: str = "GET"
    headers: dict[str, str] = field(default_factory=dict)
    vars: VarMaps = field(default_factory=list)
    params: VarMaps = field(default_factory=list)
    encoding_in: str | None = None
    encoding_out: str = "utf-8"
    timeout_s: int = 1
    max_retry: int = 0

    def __post_init__(self) -> None:
        if self.method not in ("GET", "POST"):  # request.rs:18-22
            raise ConfigError(f"method must be GET or POST, got {self.method!r}")
        if self.timeout_s < 0 or self.max_retry < 0:
            raise ConfigError("timeout_s/max_retry must be >= 0")


@dataclass(frozen=True)
class RavenConfig:
    """config.rs:18-35 (+ Spark-scale knobs replacing max_threads)."""

    name: str
    request: RavenRequest
    sinks: tuple[PersistMethod, ...] = ()
    notify_methods: tuple[NotifyMethod, ...] = ()  # config.rs:18-35 `notify`
    parallelism: int = 1  # config.rs:37-39 default 1
    sleep_s: int | None = None  # politeness (config.rs:32)
    # Spark-scale additions (BASELINE.json north_rule):
    host_budget_per_round: int | None = None  # None -> derived from sleep_s
    salt_buckets: int = 256
    max_rounds: int = 1
    max_depth: int | None = None

    def effective_host_budget(self) -> int:
        """Reference politeness is `sleep sleep_s` before every attempt
        (crawler.rs:42-45) — i.e. at most round_duration/sleep_s requests
        per host per worker. The scale-out equivalent is an explicit
        per-host-per-round budget; default derives one request-per-host
        'slot' per configured second of sleep, floor 1."""
        if self.host_budget_per_round is not None:
            return max(1, self.host_budget_per_round)
        if self.sleep_s:
            return max(1, 60 // max(1, self.sleep_s))
        return 1_000_000_000  # effectively unlimited


def parse_config(doc: dict[str, Any] | str) -> RavenConfig:
    """YAML string or dict -> RavenConfig, with serde-strict errors
    (main.rs:25 / config.rs:18-35)."""
    if isinstance(doc, str):
        if yaml is None:
            raise ConfigError("yaml module unavailable; pass a dict")
        doc = yaml.safe_load(doc)
    if not isinstance(doc, dict):
        raise ConfigError("config root must be a mapping")
    try:
        name = doc["name"]
        req = doc["request"]
    except KeyError as e:
        raise ConfigError(f"missing required field {e.args[0]!r}") from e
    if not isinstance(req, dict) or "url" not in req:
        raise ConfigError("request must be a mapping with a url")
    enc = req.get("encoding") or {}
    request = RavenRequest(
        url=str(req["url"]),
        method=str(req.get("method", "GET")).upper(),
        headers={str(k): str(v) for k, v in (req.get("headers") or {}).items()},
        vars=_parse_var_maps(req.get("vars"), "vars"),
        params=_parse_var_maps(req.get("params"), "params"),
        encoding_in=enc.get("input"),
        encoding_out=enc.get("output", "utf-8"),
        timeout_s=int(req.get("timeout_in_seconds", 1)),
        max_retry=int(req.get("max_retry", 0)),
    )
    sinks: list[PersistMethod] = []
    for o in doc.get("output", []) or []:
        if "local_file" in o:
            sinks.append(PersistMethod(kind="local_file", path=str(o["local_file"]["file_path"])))
        elif "amazon_s3" in o:
            s3 = o["amazon_s3"]
            sinks.append(
                PersistMethod(kind="s3", path=str(s3["object_key"]), region=s3.get("region"), bucket=s3.get("bucket_name"))
            )
        elif "table" in o:
            sinks.append(PersistMethod(kind=str(o["table"].get("format", "parquet")), path=str(o["table"]["path"])))
        else:
            raise ConfigError(f"unknown output sink: {sorted(o)}")
    notify_methods: list[NotifyMethod] = []
    for nm in doc.get("notify", []) or []:
        if not isinstance(nm, dict) or "slack" not in nm:
            raise ConfigError(f"unknown notify method: {sorted(nm) if isinstance(nm, dict) else nm}")
        sl = nm["slack"]
        if not isinstance(sl, dict):
            raise ConfigError(
                f"notify slack: expected a mapping with url/channel, got {type(sl).__name__}"
            )
        try:
            notify_methods.append(
                NotifyMethod(
                    kind="slack", url=str(sl["url"]), channel=str(sl["channel"]),
                    mention=(str(sl["mention"]) if sl.get("mention") is not None else None),
                    level=str(sl.get("level", "info")).lower(),
                )
            )
        except KeyError as e:
            raise ConfigError(f"notify slack: missing required field {e.args[0]!r}") from e
    return RavenConfig(
        name=str(name),
        request=request,
        sinks=tuple(sinks),
        notify_methods=tuple(notify_methods),
        parallelism=int(doc.get("max_threads", 1)),
        sleep_s=doc.get("sleep"),
        host_budget_per_round=doc.get("host_budget_per_round"),
        salt_buckets=int(doc.get("salt_buckets", 256)),
        max_rounds=int(doc.get("max_rounds", 1)),
        max_depth=doc.get("max_depth"),
    )
