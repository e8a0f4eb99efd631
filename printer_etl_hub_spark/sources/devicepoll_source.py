"""Custom Python DataSource: the device-poll source (batch + streaming).

SURVEY §4 flags a "device-poll" DataSourceV2 as the one custom-source
candidate in the whole design: the reference's operating model is "each run
re-polls the fleet" (`plugins/base.py:19-43`, adapters S7-S10). Spark 4's
Python DataSource API expresses that natively:

- ``format("devicepoll")`` batch read = one poll cycle, fleet split across
  input partitions (each partition polls its devices inside the executor —
  the parallelism the reference lacks);
- ``readStream.format("devicepoll")`` = an unbounded sequence of poll
  cycles; each micro-batch covers the cycle range ``(start, end]`` so every
  trigger re-polls the whole fleet exactly once per cycle (the reference's
  loop, with exactly-once offsets + replayable cycles).

Transports are injected (here: a deterministic fake keyed on (ip, cycle) —
the same canned-transport seam as ``sources/fetch.py``; a live SNMP/HTTP
transport would drop into ``_probe`` unchanged). Offline-default semantics
match the reference: a probe "failure" yields status=offline +
severity=critical, never a dropped row.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    InputPartition,
)

SCHEMA = "cycle bigint, ip string, status string, severity string, toner_pct int"

_SEVERITIES = ("ok", "warning", "critical")


def _probe(ip: str, cycle: int) -> tuple[int, str, str, str, int]:
    """Deterministic fake device probe (stub transport, stable per (ip, cycle))."""
    h = hashlib.md5(f"{ip}:{cycle}".encode()).digest()
    offline = h[0] % 8 == 0  # ~12% of probes time out → offline default
    if offline:
        return (cycle, ip, "offline", "critical", 0)
    return (cycle, ip, "online", _SEVERITIES[h[1] % 3], h[2] % 101)


class _FleetPartition(InputPartition):
    def __init__(self, ips: list[str], cycle: int):
        self.ips = ips
        self.cycle = cycle


def _fleet(options: dict) -> list[str]:
    raw = options.get("fleet_ips", "")
    ips = [s.strip() for s in raw.split(",") if s.strip()]
    if not ips:
        raise ValueError("devicepoll requires option fleet_ips=ip1,ip2,…")
    return ips


def _chunk(ips: list[str], n: int) -> list[list[str]]:
    n = max(1, min(n, len(ips)))
    size = (len(ips) + n - 1) // n
    return [ips[i : i + size] for i in range(0, len(ips), size)]


class DevicePollReader(DataSourceReader):
    def __init__(self, options: dict):
        self.ips = _fleet(options)
        self.num_partitions = int(options.get("num_partitions", 4))

    def partitions(self) -> Sequence[InputPartition]:
        return [_FleetPartition(c, 0) for c in _chunk(self.ips, self.num_partitions)]

    def read(self, partition: _FleetPartition) -> Iterator[tuple]:
        for ip in partition.ips:
            yield _probe(ip, partition.cycle)


class DevicePollStreamReader(DataSourceStreamReader):
    def __init__(self, options: dict):
        self.ips = _fleet(options)
        self.num_partitions = int(options.get("num_partitions", 4))
        self.max_cycles = int(options.get("max_cycles", 0))  # 0 = unbounded
        self._latest = 0

    def initialOffset(self) -> dict:
        return {"cycle": 0}

    def latestOffset(self) -> dict:
        self._latest += 1
        if self.max_cycles:
            self._latest = min(self._latest, self.max_cycles)
        return {"cycle": self._latest}

    def partitions(self, start: dict, end: dict) -> Sequence[InputPartition]:
        return [
            _FleetPartition(chunk, cycle)
            for cycle in range(start["cycle"] + 1, end["cycle"] + 1)
            for chunk in _chunk(self.ips, self.num_partitions)
        ]

    def read(self, partition: _FleetPartition) -> Iterator[tuple]:
        for ip in partition.ips:
            yield _probe(ip, partition.cycle)

    def commit(self, end: dict) -> None:
        pass  # probes are stateless; nothing to clean up


class DevicePollDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "devicepoll"

    def schema(self) -> str:
        return SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return DevicePollReader(self.options)

    def streamReader(self, schema) -> DataSourceStreamReader:
        return DevicePollStreamReader(self.options)


def register(spark) -> None:
    """Idempotent registration of the ``devicepoll`` format."""
    spark.dataSource.register(DevicePollDataSource)
