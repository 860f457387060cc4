"""Source/Sink ABCs — generalization of the reference's de-facto
connector API: standalone ``(config, start, end)`` functions
(elasticsearch_counter.py:162-166, stage/ingestion_engine.py:238-241,
target/ingestion_engine.py:89-116, target/audit_counter.py:7).

A Source answers *count* (S1) and *extract* (S2) for a half-open
window; a Sink answers *load* (S5), *count* (A4), *exists* (S3/S6)
and *clean* (S4/S7). Everything takes/returns DataFrames so the whole
window pipeline stays one lazy Spark plan until the sink action.
"""

from __future__ import annotations

from abc import ABC, abstractmethod
from datetime import datetime

from pyspark.sql import DataFrame


class Source(ABC):
    """Windowed data source (reference: source/elasticsearch_counter.py)."""

    @abstractmethod
    def count(self, start: datetime, end: datetime) -> int:
        """S1: record count in [start, end)."""

    @abstractmethod
    def extract(self, start: datetime, end: datetime) -> DataFrame:
        """S2: all records in [start, end) as a DataFrame (lazy)."""


class Sink(ABC):
    """Windowed data sink (reference: stage/ & target/ ingestion engines)."""

    @abstractmethod
    def load(self, df: DataFrame, start: datetime, end: datetime) -> None:
        """S5: write the window's records idempotently."""

    @abstractmethod
    def count(self, start: datetime, end: datetime) -> int:
        """A4: record count in the window (audit recount)."""

    @abstractmethod
    def exists(self, start: datetime, end: datetime) -> bool:
        """S3/S6: has this window already been written?"""

    @abstractmethod
    def clean(self, start: datetime, end: datetime) -> None:
        """S4/S7: remove the window's output before re-ingest."""
