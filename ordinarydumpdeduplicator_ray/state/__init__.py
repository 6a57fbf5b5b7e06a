"""Shared state: union-find clustering + checkpoint/lineage manifests."""
