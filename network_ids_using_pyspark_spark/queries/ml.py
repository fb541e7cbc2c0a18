"""ML-pipeline queries (rows-only checks — model internals are not
SQL-expressible; metric floors are asserted in tests instead,
SURVEY.md §5.2 #3).  Filled out alongside ``ml/pipeline.py``."""

from __future__ import annotations
