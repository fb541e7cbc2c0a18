"""Structured Streaming queries (batch-equivalence oracles where the
aggregation is SQL-expressible).  Filled out alongside ``streaming/``."""

from __future__ import annotations
