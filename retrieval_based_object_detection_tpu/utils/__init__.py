"""Shared utilities: content hashing, config, logging, dataset tree walking."""
