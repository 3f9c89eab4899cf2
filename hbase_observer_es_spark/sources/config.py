"""Sync-job configuration: the reference's coprocessor attributes, re-homed.

Reference A1 (SURVEY.md §2-A): on coprocessor start the observer reads four
table-attributes — `cluster.name`, `indexName`, `indexType`, `esClientInfo` —
and parses the host list by splitting entries on ``-`` and host:port on ``:``
(HbaseDataSyncEsObserver.java:36-59, split at :54; pool side at
ElasticsearchPoolUtil.java:55 in /root/reference). In the Spark engine the same
facts arrive as job conf / reader options; this module owns the parsing and
validation so every entry point shares one implementation.

Parsing semantics kept from the reference: entries split on ``-``, host:port on
``:``. Deliberately FIXED here (divergence log): the reference silently drops a
malformed entry's port via array indexing errors swallowed upstream; we raise,
because a half-configured sink is the worst failure mode a sync pipeline has.
"""

from __future__ import annotations

from dataclasses import dataclass, field


@dataclass(frozen=True)
class SyncConfig:
    """The reference's four coprocessor attributes (README.md:32-35)."""

    cluster_name: str
    index_name: str
    index_type: str
    hosts: tuple[tuple[str, int], ...] = field(default_factory=tuple)

    @classmethod
    def from_attrs(cls, attrs: dict[str, str]) -> "SyncConfig":
        missing = [k for k in ("cluster.name", "indexName", "indexType", "esClientInfo") if k not in attrs]
        if missing:
            raise KeyError(f"missing sync attributes: {missing}")
        return cls(
            cluster_name=attrs["cluster.name"],
            index_name=attrs["indexName"],
            index_type=attrs["indexType"],
            hosts=tuple(parse_client_info(attrs["esClientInfo"])),
        )


def parse_client_info(info: str) -> list[tuple[str, int]]:
    """``host1:9300-host2:9300`` → [("host1", 9300), ("host2", 9300)].

    The '-'/':' split grammar of HbaseDataSyncEsObserver.java:54 — which means
    hostnames containing '-' are unrepresentable; that is the reference's
    documented config format, kept verbatim.
    """
    if not info or not info.strip():
        raise ValueError("esClientInfo is empty")
    hosts: list[tuple[str, int]] = []
    for entry in info.split("-"):
        parts = entry.split(":")
        if len(parts) != 2 or not parts[0]:
            raise ValueError(f"malformed host entry {entry!r} in {info!r}")
        try:
            port = int(parts[1])
        except ValueError as exc:
            raise ValueError(f"malformed port in {entry!r}") from exc
        if not 0 < port < 65536:
            raise ValueError(f"port out of range in {entry!r}")
        hosts.append((parts[0], port))
    return hosts
