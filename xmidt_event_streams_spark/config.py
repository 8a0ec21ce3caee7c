"""Routing configuration: the static "filter relation".

Mirrors the semantics of the reference's ``FilterConfig``
(reference: filter/filter_config.go:5-15 and streams_only.yaml:26-77):
each filter names a destination stream, an ordered list of failover
alt-streams, a list of event regexes (matched against the destination
with the ``event:`` prefix stripped), an optional list of device-id
regexes (matched against source OR stripped destination; empty list =
pass-all), and delivery tuning knobs.

Validation reproduces the reference's plan-time checks
(reference: filter/filter_factory.go:129-168): the event matcher list
must be non-empty and every regex must compile; a literal ``.*``
device-id pattern clears the matcher list entirely (the match-all fast
path, filter_factory.go:145-151).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field


class FilterConfigError(ValueError):
    """Raised at plan-compile time for invalid routing config."""


@dataclass(frozen=True)
class FilterConfig:
    stream_name: str
    events: tuple[str, ...]
    device_ids: tuple[str, ...] = ()
    alt_streams: tuple[str, ...] = ()
    dest_type: str = "dir"  # 'dir' | 'kinesis' (reference has only kinesis)
    batch_size: int = 100
    queue_size: int = 1000
    max_workers: int = 1000
    stream_version: str = "1.0"
    options: dict = field(default_factory=dict, hash=False, compare=False)

    def __post_init__(self):
        if not self.stream_name:
            raise FilterConfigError("stream_name must be non-empty")
        # reference: filter/filter_factory.go:140-142 -- empty event
        # matcher list is a construction error.
        if not self.events:
            raise FilterConfigError(
                f"filter {self.stream_name!r}: events regex list must be non-empty"
            )
        for pat in tuple(self.events) + tuple(self.device_ids):
            try:
                re.compile(pat)
            except re.error as exc:  # filter_factory.go:134-136
                raise FilterConfigError(
                    f"filter {self.stream_name!r}: invalid regex {pat!r}: {exc}"
                ) from exc

    @property
    def effective_device_ids(self) -> tuple[str, ...]:
        """Device-id matchers after the ``.*`` wildcard-elision fast path.

        reference: filter/filter_factory.go:145-151 -- a literal ".*"
        pattern anywhere in the list means match-everything, so the
        whole predicate is elided (constant-folding at plan time).
        """
        if any(p == ".*" for p in self.device_ids):
            return ()
        return tuple(self.device_ids)

    @property
    def streams_in_order(self) -> tuple[str, ...]:
        """Primary stream then failover alts, in delivery order
        (reference: filter/stream_dispatcher.go:39-82)."""
        return (self.stream_name, *self.alt_streams)


def load_filter_configs(obj, defaults: dict | None = None) -> list[FilterConfig]:
    """Compile a config mapping (parsed YAML/JSON/dict) to FilterConfigs.

    Accepts the shape of the reference's config document
    (streams_only.yaml:26-77, unmarshalled by
    internal/install/config.go:99-151):

      * a full document with ``filter_manager`` carrying
        ``default_queue_size`` / ``default_batch_size`` /
        ``default_max_workers`` (applied to filters that don't
        override them) and a ``filters`` list;
      * each filter item's ``stream`` either a plain name or the
        nested dict ``{stream_name, config_items: [{key, value}]}``
        (config_items land in ``options`` -- endpoint, region,
        credentials...);
      * ``events`` regex list, ``metadata.device_ids`` regex list,
        ``alt_streams``, ``dest_type``, ``stream_version``, and the
        per-filter ``queue_size``/``batch_size``/``max_workers``
        tuning knobs.

    Unknown dest types fail eagerly
    (reference: filter/dispatcher_factory.go:115-118).
    """
    defaults = dict(defaults or {})
    if isinstance(obj, dict):
        fm = obj.get("filter_manager", obj)
        if isinstance(fm, dict):
            for src, dst in (
                ("default_queue_size", "queue_size"),
                ("default_batch_size", "batch_size"),
                ("default_max_workers", "max_workers"),
            ):
                if src in fm:
                    defaults.setdefault(dst, fm[src])
            obj = fm.get("filters", obj.get("filters"))
        else:
            obj = None
    if not isinstance(obj, (list, tuple)):
        raise FilterConfigError("expected a list of filter configs")
    out = []
    for raw in obj:
        dest_type = str(raw.get("dest_type", "dir")).lower()
        if dest_type not in ("dir", "kinesis", "memory"):
            raise FilterConfigError(f"unknown dest_type {dest_type!r}")
        stream = raw.get("stream", "")
        options = dict(raw.get("options", {}))
        if isinstance(stream, dict):
            # nested reference shape: stream.stream_name + config_items
            stream_name = stream.get("stream_name", "")
            for item in stream.get("config_items") or ():
                options[item["key"]] = item["value"]
        else:
            stream_name = raw.get("stream_name", stream)
        metadata = raw.get("metadata", {})
        device_ids = tuple(
            raw.get(
                "device_ids",
                (metadata or {}).get("device_ids", ())
                if isinstance(metadata, dict)
                else (),
            )
            or ()
        )
        out.append(
            FilterConfig(
                stream_name=stream_name,
                events=tuple(raw.get("events") or ()),
                device_ids=device_ids,
                alt_streams=tuple(raw.get("alt_streams") or ()),
                dest_type=dest_type,
                batch_size=int(raw.get("batch_size", defaults.get("batch_size", 100))),
                queue_size=int(raw.get("queue_size", defaults.get("queue_size", 1000))),
                max_workers=int(
                    raw.get("max_workers", defaults.get("max_workers", 1000))
                ),
                stream_version=str(raw.get("stream_version", "1.0")),
                options=options,
            )
        )
    return out


def load_filter_configs_yaml(path) -> list[FilterConfig]:
    """File entry point: the reference's query language IS its YAML
    config (streams_only.yaml, loaded by internal/install/config.go:
    99-151) -- parse it with ``yaml.safe_load`` and compile to
    FilterConfigs, defaults and validation included."""
    try:
        import yaml
    except ImportError as exc:  # pragma: no cover
        raise FilterConfigError(
            "PyYAML is required for load_filter_configs_yaml"
        ) from exc
    with open(path) as f:
        doc = yaml.safe_load(f)
    return load_filter_configs(doc)


# A default config used by tests / the flagship query: two realistic
# routes plus a catch-all, echoing streams_only.yaml:26-77.
DEFAULT_FILTERS: tuple[FilterConfig, ...] = (
    FilterConfig(
        stream_name="purchases-stream",
        events=("purchase.*", "checkout"),
        device_ids=(),
    ),
    FilterConfig(
        stream_name="engagement-stream",
        events=("click", "view"),
        device_ids=("user-1.*",),
        alt_streams=("engagement-stream-alt",),
    ),
    FilterConfig(
        stream_name="firehose-stream",
        events=(".*",),
        device_ids=(".*",),  # wildcard -> elided (R4)
    ),
)
